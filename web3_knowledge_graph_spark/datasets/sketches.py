"""Count-min sketch: fixed-size frequency summaries for heavy-hitter
detection over unbounded key domains.

At 10^12 rows an exact per-key count is itself a large relation; a
count-min sketch (Cormode & Muthukrishnan 2005) compresses the whole
frequency distribution into d×w counters — a table that fits in one
broadcast — at the cost of one-sided error: estimates only ever
OVER-count (by at most N·e/w with probability 1−(1/2)^d for the classic
parameterization). The reference has nothing like it (its counting is
pandas Counter over full scans, e.g. /root/reference/pipelines/
postProcessing/twitterRelations/process.py); this is the streaming/
memory-constrained upgrade a web-scale pipeline needs for "which keys are
hot" questions — skew detection feeding operators/skew.py, trending
candidates, dictionary pruning.

Determinism contract (same as the minhash family): the d hash rows use
the engine-agnostic md5-based _hash60, so the DuckDB oracle replays the
EXACT sketch — buckets, counters, estimates — not a statistical
approximation of it.

Scale shape: building is one partial-agg shuffle of (row, d) int-only
pairs onto at most d×w grouping keys — counters combine map-side, the
exchange moves at most d×w×partitions rows regardless of input size.
Estimation broadcasts the (tiny) sketch and joins it d times against the
probe keys — no shuffle of the probe relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash60


def _bucket(key: F.Column, i: int, w: int) -> F.Column:
    """Row-i bucket of ``key``: md5-derived, engine-agnostic, non-negative."""
    return F.pmod(_hash60(F.concat(F.lit(f"{i}:"), key)), F.lit(w))


def cms_build(
    df: DataFrame, key_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies: (i, bucket, c) with
    one row per NON-EMPTY counter (absent ⇒ 0). d hash rows × w buckets."""
    key = F.col(key_col).cast("string")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _bucket(key, i, w).alias("bucket")
                    )
                    for i in range(d)
                ]
            )
        ).alias("s")
    )
    return (
        rows.select("s.i", "s.bucket")
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Estimate each probe key's frequency from the sketch: the MIN over
    its d counters (missing counter = 0). Returns (key_col, est).
    ``d``/``w`` must match cms_build. The probe relation never shuffles:
    the sketch is broadcast d times."""
    key = F.col(key_col).cast("string")
    out = probes.select(F.col(key_col))
    for i in range(d):
        s_i = sketch.where(F.col("i") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("c").alias(f"_c{i}")
        )
        out = out.withColumn(f"_b{i}", _bucket(key, i, w)).join(
            F.broadcast(s_i), f"_b{i}", "left"
        )
    est = F.least(*[F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(d)])
    return out.select(F.col(key_col), est.cast("long").alias("est"))


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    d: int = 4,
    w: int = 1024,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Keys whose sketch estimate reaches ``threshold``, with the exact
    count alongside: (key, est, exact, is_true_hitter). CMS never
    under-counts, so every true hitter IN THE PROBED SET survives — the
    exact-count column exposes the (bounded) false positives instead of
    hiding them.

    ``candidates``: the keys to probe. At scale this is where the sketch
    earns its keep — a sampled/external/prior-window candidate stream
    probed against a sketch built in one bounded shuffle, never an
    enumeration of the full key domain. The default (None) probes
    df's DISTINCT keys, which is only honest for small domains: that
    distinct() moves the same exchange volume as an exact
    groupBy().count() would, so with it the sketch demonstrates the
    machinery rather than beating the naive plan.

    The exact-verify groupBy runs over sketch-qualified candidates only.
    """
    sketch = cms_build(df, key_col, d=d, w=w)
    if candidates is None:
        candidates = df.select(key_col).distinct()
    est = cms_estimate(sketch, candidates, key_col, d=d, w=w).where(
        F.col("est") >= threshold
    )
    exact = (
        df.join(F.broadcast(est.select(key_col)), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return est.join(exact, key_col).select(
        key_col,
        "est",
        "exact",
        (F.col("exact") >= threshold).alias("is_true_hitter"),
    )
