"""HITS (hubs & authorities) as deterministic fixed-point iteration.

Beyond-reference graph analytics in the operators.pagerank family: on the
KG's directed mention/holding edges, PageRank answers "which node matters
overall" while HITS separates "which accounts point at everything important"
(hubs — curator/aggregator wallets, directory pages) from "which entities
everything points at" (authorities — the tokens/contracts worth labeling).
The reference computes neither (its analytics stop at communities and
reputation sums — analytics/helpers/networks.py, wicScore/analyze.py).

Same exact-replayability contract as operators.pagerank (see its module
docstring for the full argument):

  * fixed-point BIGINT micro-units — long sums are exact and
    order-independent where double sums are not;
  * per-round MAX normalization with integer division (HITS diverges
    without normalization; max is the norm that stays in integers — the
    classic L2 norm would need a square root). The per-round max is a
    one-row aggregate crossJoined back (broadcast by AQE), the SQL replay
    is a scalar subquery;
  * fixed round count so the DuckDB oracle unrolls identical rounds.

Scale: per round, one join of edges with the O(nodes) score relation and
one groupBy — co-partitioned exchanges on node ids — plus a one-row max
aggregate. localCheckpoint per round cuts the growing lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # score micro-units; init hub = auth = 1.0 per node


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """edges(src, dst) directed, deduplicated internally → (id, hub_micro,
    auth_micro) for every node appearing as either endpoint, after
    ``rounds`` mutually-recursive updates:

        auth'(v) = Σ_{u→v} hub(u),  renormalized to max = SCALE
        hub'(u)  = Σ_{u→v} auth'(v), renormalized to max = SCALE

    Nodes with no in-edges hold authority 0; nodes with no out-edges hold
    hub 0 (after the first round).

    Range: the normalization multiplies a raw sum (≤ n·SCALE) by SCALE, so
    graphs beyond ~10^6 nodes need a smaller SCALE to stay inside BIGINT —
    both engines run ANSI/checked arithmetic, so an overflow is loud.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("s").alias("id"))
        .unionByName(e.select(F.col("d").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    scores = nodes.select(
        "id", F.lit(SCALE).cast("long").alias("h"), F.lit(SCALE).cast("long").alias("a")
    )

    def _norm(raw: DataFrame, col: str) -> DataFrame:
        """raw(id, col) → coalesced over all nodes, scaled to max = SCALE
        (integer division; max 0 — empty edge set — maps everything to 0)."""
        full = nodes.join(raw, "id", "left").select(
            "id", F.coalesce(col, F.lit(0)).cast("long").alias("v")
        )
        mx = full.agg(F.max("v").alias("mx"))
        return full.crossJoin(mx).select(
            "id",
            F.when(F.col("mx") > 0, F.expr(f"(v * {SCALE}) div mx"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(col),
        )

    for _ in range(rounds):
        auth_raw = (
            e.join(scores.select(F.col("id").alias("s"), "h"), "s")
            .groupBy(F.col("d").alias("id"))
            .agg(F.sum("h").alias("a"))
        )
        auth = _norm(auth_raw, "a")
        hub_raw = (
            e.join(auth.select(F.col("id").alias("d"), "a"), "d")
            .groupBy(F.col("s").alias("id"))
            .agg(F.sum("a").alias("h"))
        )
        hub = _norm(hub_raw, "h")
        scores = (
            nodes.join(hub, "id", "left")
            .join(auth, "id", "left")
            .select(
                "id",
                F.coalesce("h", F.lit(0)).alias("h"),
                F.coalesce("a", F.lit(0)).alias("a"),
            )
            .localCheckpoint()
        )
    return scores.select(
        "id", F.col("h").alias("hub_micro"), F.col("a").alias("auth_micro")
    )


def hits_oracle_sql(edges_cte: str, rounds: int = 4) -> str:
    """DuckDB SQL replaying ``hits`` verbatim: ``edges_cte`` must define a
    deduplicated directed relation ``ed(s, d)``. Rounds are unrolled
    (generated — the oracle can never drift from the configured count);
    the per-round max is a scalar subquery. Every CTE is MATERIALIZED:
    DuckDB's default inlining re-expands each reference (the scalar max
    alone reads its round twice), which compounds per unrolled round into
    exponentially many base-table opens (same fix as the kcore oracle)."""
    parts = [
        edges_cte.replace(" AS (", " AS MATERIALIZED (", 1),
        "nodes AS MATERIALIZED (SELECT s AS id FROM ed UNION SELECT d FROM ed)",
        f"h0 AS MATERIALIZED (SELECT id, CAST({SCALE} AS BIGINT) AS h FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"ar{r} AS MATERIALIZED (SELECT n.id, COALESCE(SUM(h.h), 0) AS v FROM nodes n\n"
            f"  LEFT JOIN ed ON ed.d = n.id LEFT JOIN h{r - 1} h ON h.id = ed.s\n"
            f"  GROUP BY n.id)"
        )
        parts.append(
            # outer CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas would
            # surface as float — pin every round back to BIGINT
            f"a{r} AS MATERIALIZED (SELECT id, CAST(CASE WHEN (SELECT MAX(v) FROM ar{r}) > 0\n"
            f"  THEN CAST(v * {SCALE} AS BIGINT) // (SELECT MAX(v) FROM ar{r})\n"
            f"  ELSE 0 END AS BIGINT) AS a FROM ar{r})"
        )
        parts.append(
            f"hr{r} AS MATERIALIZED (SELECT n.id, COALESCE(SUM(a.a), 0) AS v FROM nodes n\n"
            f"  LEFT JOIN ed ON ed.s = n.id LEFT JOIN a{r} a ON a.id = ed.d\n"
            f"  GROUP BY n.id)"
        )
        parts.append(
            f"h{r} AS MATERIALIZED (SELECT id, CAST(CASE WHEN (SELECT MAX(v) FROM hr{r}) > 0\n"
            f"  THEN CAST(v * {SCALE} AS BIGINT) // (SELECT MAX(v) FROM hr{r})\n"
            f"  ELSE 0 END AS BIGINT) AS h FROM hr{r})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT h{rounds}.id, h{rounds}.h AS hub_micro, a{rounds}.a AS auth_micro"
        + f"\nFROM h{rounds} JOIN a{rounds} USING (id)"
    )
