"""As-of (point-in-time) join: enrich each probe row with the most recent
state row at-or-before its timestamp, per key.

Reference context: the reference repeatedly needs "the latest known X for
this account as of time T" — token balances as of a snapshot
(/root/reference/pipelines/postProcessing/curatedTokenHolding/process.py:22-51),
follower counts as of the last check
(postProcessing/twitterFollowers/process.py:121-127) — and resolves it
operationally by re-scanning and overwriting. A warehouse engine needs it
as a relational operator: Spark has no ASOF JOIN, and the naive spellings
are wrong at scale (a range join explodes into O(probe × state-per-key)
candidates; a per-row subquery is a driver loop).

Physical design — the union trick, one shuffle total:

    state(key, ts, values)  tagged _side=0
    probe(key, ts, ...)     tagged _side=1
    UNION → window over (partitionBy key, orderBy ts, _side, tiebreak)
          → last(state_struct, ignorenulls=True)
    keep _side=1 rows.

One Exchange on the key plus one in-partition sort — the same cost as a
co-partitioned merge join, independent of how many state rows precede each
probe row. State values travel as ONE struct column so null-valued state
attributes cannot leak older values through ``last(ignorenulls)``
per-column. At equal timestamps state sorts before probe (a state change
AT the probe instant is visible — "at-or-before"); ties among state rows
resolve by ``tiebreak`` ascending with the LAST one winning, i.e. max
tiebreak, which keeps the result deterministic and SQL-replayable.

Hot keys: one key's rows sort within a single partition. For a key whose
history exceeds a partition, pre-bucket by coarse time range and carry the
last state of bucket i into bucket i+1 as a synthetic opening row — the
standard two-level refinement; not needed at reference scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    state: DataFrame,
    key: str | list[str],
    probe_ts: str,
    state_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: all probe columns + ``value_cols`` from the latest
    state row (per ``key``) with ``state_ts`` <= ``probe_ts``; NULLs when
    no state row precedes the probe (left-join semantics).

    ``tiebreak``: state column ordering equal-timestamp state rows; the
    max wins. Required for determinism when (key, state_ts) is not unique.
    """
    keys = [key] if isinstance(key, str) else list(key)
    clash = set(value_cols) & set(probe.columns)
    if clash:
        raise ValueError(f"value_cols collide with probe columns: {sorted(clash)}")
    reserved = {"_ts", "_side", "_tb", "_state", "_last"} & (
        set(probe.columns) | set(state.columns)
    )
    if reserved:
        raise ValueError(f"reserved working columns present in input: {sorted(reserved)}")

    s = state.where(F.col(state_ts).isNotNull()).select(
        # NULL-ts state rows would sort NULLS FIRST and become "the latest
        # state" for probes preceding any real state — a row that was never
        # at-or-before anything. A timestamp-less state row is meaningless
        # under as-of semantics; drop it (matching the SQL replay, where
        # `state_ts <= probe_ts` excludes NULLs).
        *keys,
        F.col(state_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tb"),
        F.struct(*value_cols).alias("_state"),
    )
    p = probe.select(
        *probe.columns,
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
    )
    u = s.unionByName(p, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("_last", F.last("_state", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(
            *probe.columns,
            *[F.col("_last")[c].alias(c) for c in value_cols],
        )
    )
