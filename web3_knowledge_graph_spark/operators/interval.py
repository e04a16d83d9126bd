"""Interval (range-containment) join: match each point to every interval
that contains its timestamp, optionally within an equi-key.

Reference context: windowed containment reads — events inside a holding
window (/root/reference/pipelines/postProcessing/tokenHolders/cypher.py:
104-148 HOLDS vs HELD snapshots), activity inside a follower-check window
(postProcessing/twitterFollowers/process.py:121-127) — which the reference
does row-by-row in Python. Spark's own answer to a non-equi time predicate
is BroadcastNestedLoopJoin (fine only when one side is tiny) or a cartesian
product: both are scale killers.

Physical design — bucketed equi-join with a long-interval escape hatch:

* Pick a bucket width W. Each interval explodes to one row per covered
  bucket (ceil(span/W) rows); each point maps to exactly ONE bucket, so a
  (key, bucket) equi-join finds every candidate exactly once — no
  post-join dedup — and the refine filter (start <= ts <= end) keeps true
  containment. Shuffle volume: points + Σ ceil(span/W), linear.
* Intervals spanning more than ``long_bucket_limit`` buckets would bloat
  the explode (one viral interval covering the whole corpus timeline =
  the skew this operator exists to avoid). They split off into a small
  relation that BROADCASTS and nested-loop-refines — the classic
  short/long split: short intervals pay shuffle, the few long ones pay
  broadcast, nobody pays cartesian.

W trades explode factor against candidate precision: W ≈ median interval
span keeps both the explode (≤2 rows/interval) and the false-candidate
rate (≈1 wasted bucket per point) small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    key: str | None = None,
    bucket_width_s: int = 3600,
    long_bucket_limit: int = 64,
) -> DataFrame:
    """Inner containment join: rows = (point columns..., interval columns
    except ``key``) for every (point, interval) pair with
    start <= ts <= end (closed both ends) and, if ``key`` given, equal key
    values. Intervals with end < start are dropped (invalid, and a naive
    bucket sequence would DESCEND through them).
    """
    w_us = int(bucket_width_s) * 1_000_000

    def us(col: str):
        # unix_micros rejects TIMESTAMP_NTZ (parquet default); the cast is a
        # no-op reinterpretation under the session's fixed UTC timezone
        return F.unix_micros(F.col(col).cast("timestamp"))

    iv_cols = [c for c in intervals.columns if c != key]
    clash = set(iv_cols) & set(points.columns)
    if clash:
        raise ValueError(f"interval columns collide with point columns: {sorted(clash)}")
    reserved = {"_b", "_s", "_e", "_nb"} & (
        set(points.columns) | set(intervals.columns)
    )
    if reserved:
        raise ValueError(f"reserved working columns present in input: {sorted(reserved)}")

    # floor, not cast-truncation: cast("long") truncates toward zero, which
    # mis-buckets pre-1970 (negative-micros) timestamps
    p = points.withColumn("_b", F.floor(us(point_ts) / w_us))
    iv = (
        intervals.withColumn("_s", us(start_col))
        .withColumn("_e", us(end_col))
        .where(F.col("_s") <= F.col("_e"))
        .withColumn(
            "_nb", F.floor(F.col("_e") / w_us) - F.floor(F.col("_s") / w_us) + 1
        )
    )
    refine = (us(point_ts) >= F.col("_s")) & (us(point_ts) <= F.col("_e"))
    keys = [key] if key else []

    short = iv.where(F.col("_nb") <= long_bucket_limit).withColumn(
        "_b",
        F.explode(
            F.sequence(F.floor(F.col("_s") / w_us), F.floor(F.col("_e") / w_us))
        ),
    )
    matched_short = p.join(short, keys + ["_b"], "inner").where(refine)

    long_iv = iv.where(F.col("_nb") > long_bucket_limit).drop("_nb")
    if keys:
        matched_long = p.join(F.broadcast(long_iv), keys, "inner").where(refine)
    else:
        matched_long = p.crossJoin(F.broadcast(long_iv)).where(refine)

    out_cols = points.columns + iv_cols
    return matched_short.select(*out_cols).unionByName(matched_long.select(*out_cols))
