"""Recheck scheduling: TTL filters over last-checked timestamps.

The reference re-scrapes an account only when its ``last_checked`` mark is
older than a per-source interval: Twitter profiles
(/root/reference/pipelines/postProcessing/twitter/process.py:18,73),
follower counts (postProcessing/twitterFollowers/process.py:25-27), and
per-token holder cadences (postProcessing/curatedTokenHolding/process.py:
22-51). That scheduling decision is a pure filter over the entity table —
at 10^9 accounts it must run as a pushed-down predicate scan, never a
driver-side loop, so it is exposed here as a one-expression operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stale_entities(
    df: DataFrame,
    last_checked: str = "last_checked",
    ttl: str = "7 days",
    now: str | None = None,
) -> DataFrame:
    """Rows due a recheck: ``last_checked < now - ttl``.

    ``now`` is an ISO timestamp string for reproducible runs (tests,
    oracles); None → current_timestamp(). NULL last_checked (never checked)
    is always due, mirroring the reference's never-scraped default.
    The predicate is a plain column comparison — Catalyst pushes it into
    the scan, and date-partitioned entity tables prune partitions on it.
    """
    now_expr = (
        F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    )
    cutoff = now_expr - F.expr(f"INTERVAL {ttl}")
    lc = F.col(last_checked).cast("timestamp")
    return df.where(lc.isNull() | (lc < cutoff))
