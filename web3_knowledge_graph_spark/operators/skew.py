"""Skew handling: salted two-phase aggregation + hot-key join splitting.

Reference context: hub entities (popular tokens, exchanges, viral pages)
concentrate a huge fraction of rows on one key. The reference sidesteps the
problem operationally by restricting scans to curated hot sets
(/root/reference/pipelines/scraping/tokenHolders/scrape.py:23,37-41;
postProcessing/twitterFollowers/process.py:97-108). At 10^12-document scale
the engine must absorb hubs instead:

* salted_agg — groupBy(key ⊕ salt) partial → groupBy(key) final, so one hot
  key fans out over ``buckets`` reducers. Semantically identical to a plain
  groupBy for algebraic aggregates (count/sum/min/max) — proven by the
  DuckDB oracle on the driver query that uses it.
* split_hot_keys — partitions a relation into (hot, rest) by key frequency
  so callers can broadcast-join the hot slice and shuffle-join the rest
  (the manual analog of AQE's skew-join splitting, for the cases AQE can't
  see, e.g. aggregations and non-join operators).

AQE's runtime skew-join splitting (spark.sql.adaptive.skewJoin.*, enabled
in session.py) remains the first line of defense for joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
_PHASE1 = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: (keys + salt) partial → (keys) final.

    ``aggs``: (column, fn, alias) with fn ∈ {count, sum, min, max} —
    the algebraic aggregates, whose partials merge exactly.

    The salt is derived from the full row content (xxhash64 over every input
    column), NOT from monotonically_increasing_id(): a nondeterministic salt
    feeding a shuffle means a shuffle-fetch failure re-executes lost map
    tasks with *different* salts than the attempt already consumed by
    completed reducers — rows double-counted or dropped, silently, exactly
    in the at-scale scenario this operator exists for. Content-derived salt
    is stable across task retries; identical duplicate rows share a bucket,
    which still fans a hot key out as long as its rows differ in any column
    (the usual case — hub keys have many distinct payloads).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[_PHASE1[fn](F.col(c) if fn != "count" else F.lit(1)).alias(f"_p_{alias}")
               for c, fn, alias in aggs])
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[fn](F.col(f"_p_{alias}")).alias(alias) for _c, fn, alias in aggs]
    )


def split_hot_keys(
    df: DataFrame, key: str, hot_threshold: int = 1_000_000
) -> tuple[DataFrame, DataFrame]:
    """(hot, rest) split by key frequency — hot keys join via broadcast of
    the other side's matching slice; rest takes the normal shuffle join."""
    freq = df.groupBy(key).agg(F.count(F.lit(1)).alias("_f"))
    hot_keys = F.broadcast(freq.where(F.col("_f") > hot_threshold).select(key))
    hot = df.join(hot_keys, key, "left_semi")
    rest = df.join(hot_keys, key, "left_anti")
    return hot, rest
