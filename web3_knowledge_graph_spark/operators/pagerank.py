"""PageRank as deterministic fixed-point power iteration over DataFrames.

Beyond-reference graph analytics (the reference computes reputation and
community scores — analytics/helpers/networks.py, wallet_communities/
analyze.py — but no centrality); PageRank is the canonical "which wallet /
token hub matters" measure a KG user asks for next, so it ships as a
first-class operator in the same style as operators.communities.

Design choices, all made for exact replayability at any parallelism:

  * FIXED-POINT LONGS, not doubles. Distributed SUM over doubles is
    order-dependent (different partitioning => different last-ulp results),
    which would break both the DuckDB value-hash oracle and run-to-run
    determinism on a real cluster. Ranks are micro-units (SCALE = 1e6) in
    BIGINT; per-edge contribution is integer division rank div out_degree,
    and the damping update is (15 * SCALE + 85 * sum_contrib) div 100 for
    d = 0.85. Long sums are exact and order-independent.
  * FIXED ROUND COUNT, so the DuckDB oracle unrolls the identical K rounds
    (the pattern proven by operators.communities.label_propagation).
  * DANGLING MASS LEAKS (no teleport redistribution from sink nodes): the
    redistribution term needs a global scalar per round; omitting it keeps
    every round a pure join+groupBy pair and is a standard variant. The
    docstring is the contract — callers wanting strict PageRank normalize
    afterwards.

Scale: per round, one join of edges with the (one-row-per-node) rank
relation keyed on src, one groupBy on dst — both co-partitioned exchanges
on node ids; state is O(nodes), never O(nodes^2). Lineage is cut with
localCheckpoint per round as in operators.canon / operators.communities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # rank micro-units; init rank = 1.0 per node


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
) -> DataFrame:
    """edges(src, dst) directed, deduplicated internally → (id, rank_micro,
    rank) for every node appearing as either endpoint after ``rounds``
    damped (d=0.85) power-iteration rounds in exact fixed-point arithmetic.

    ``rank`` is rank_micro / SCALE as double — computed once at the end
    from the same long, so it is as deterministic as the integer it mirrors.
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
    outd = e.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.withColumn("r", F.lit(SCALE).cast("long"))
    for _ in range(rounds):
        contribs = (
            e.join(outd, "s")
            .join(ranks.select(F.col("id").alias("s"), "r"), "s")
            .groupBy(F.col("d").alias("id"))
            .agg(F.sum(F.expr("r div od")).alias("c"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                F.expr(f"(15 * {SCALE} + 85 * coalesce(c, 0)) div 100")
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "id",
        F.col("r").alias("rank_micro"),
        (F.col("r") / F.lit(SCALE)).alias("rank"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "id",
    rounds: int = 6,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns ONLY to the ``seeds``
    node set, so ranks measure relevance RELATIVE to the seeds (e.g.
    "importance in the neighborhood of known-good wallets" — the
    seed-based sibling of the reference's reputation scores,
    analytics/wicScore). Same exact fixed-point arithmetic and fixed
    round count as ``pagerank``: init r = SCALE for seeds else 0; update
    r = (15·SCALE·is_seed + 85·Σ contrib) div 100. Non-seed nodes
    unreachable from any seed stay at exactly 0.

    The seed relation is typically tiny (a curated list) — broadcast into
    the per-round node update; everything else shares pagerank's
    per-round join+groupBy shape and cost.
    Returns (id, rank_micro, rank)."""
    e = (
        edges.select(F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d"))
        .distinct()
        .localCheckpoint()
    )
    sd = F.broadcast(
        seeds.select(F.col(seed_col).cast("long").alias("id")).distinct()
    )
    nodes = (
        e.select(F.col("s").alias("id"))
        .unionByName(e.select(F.col("d").alias("id")))
        .distinct()
        .join(sd.withColumn("_seed", F.lit(1)), "id", "left")
        .select("id", F.coalesce("_seed", F.lit(0)).cast("long").alias("seed"))
        .localCheckpoint()
    )
    outd = e.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.select("id", (F.col("seed") * SCALE).cast("long").alias("r"))
    for _ in range(rounds):
        contribs = (
            e.join(outd, "s")
            .join(ranks.select(F.col("id").alias("s"), "r"), "s")
            .groupBy(F.col("d").alias("id"))
            .agg(F.sum(F.expr("r div od")).alias("c"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                F.expr(f"(15 * {SCALE} * seed + 85 * coalesce(c, 0)) div 100")
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "id",
        F.col("r").alias("rank_micro"),
        (F.col("r") / F.lit(SCALE)).alias("rank"),
    )


def personalized_pagerank_oracle_sql(
    edges_cte: str, seeds_sql: str, rounds: int = 6
) -> str:
    """DuckDB replay of personalized_pagerank. ``edges_cte`` defines
    ``ed(s, d)`` as in pagerank_oracle_sql; ``seeds_sql`` is a SELECT
    yielding one BIGINT column ``id``."""
    parts = [
        edges_cte,
        f"sd AS (SELECT DISTINCT id FROM ({seeds_sql}))",
        "nodes AS (SELECT id, CASE WHEN sd.id IS NOT NULL THEN 1 ELSE 0 END AS seed"
        " FROM (SELECT s AS id FROM ed UNION SELECT d FROM ed)"
        " LEFT JOIN sd USING (id))",
        "outd AS (SELECT s, COUNT(*) AS od FROM ed GROUP BY s)",
        f"p0 AS (SELECT id, CAST(seed * {SCALE} AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"c{k} AS (SELECT ed.d AS id, SUM(p.r // o.od) AS c\n"
            f"  FROM ed JOIN outd o USING (s) JOIN p{k - 1} p ON p.id = ed.s\n"
            f"  GROUP BY ed.d)"
        )
        parts.append(
            f"p{k} AS (SELECT n.id,\n"
            f"  CAST((15 * {SCALE} * n.seed + 85 * COALESCE(c.c, 0)) // 100 AS BIGINT) AS r\n"
            f"  FROM nodes n LEFT JOIN c{k} c USING (id))"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id, r AS rank_micro, CAST(r AS DOUBLE) / {SCALE} AS rank"
        + f"\nFROM p{rounds}"
    )


def pagerank_oracle_sql(edges_cte: str, rounds: int = 6) -> str:
    """DuckDB SQL replaying pagerank verbatim. ``edges_cte`` must define a
    deduplicated directed relation ``ed(s, d)`` with BIGINT endpoints; the
    rounds are unrolled as K join+aggregate CTE pairs (generated, so the
    oracle can never drift from the configured round count)."""
    parts = [
        edges_cte,
        "nodes AS (SELECT s AS id FROM ed UNION SELECT d FROM ed)",
        "outd AS (SELECT s, COUNT(*) AS od FROM ed GROUP BY s)",
        f"p0 AS (SELECT id, CAST({SCALE} AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"c{k} AS (SELECT ed.d AS id, SUM(p.r // o.od) AS c\n"
            f"  FROM ed JOIN outd o USING (s) JOIN p{k - 1} p ON p.id = ed.s\n"
            f"  GROUP BY ed.d)"
        )
        parts.append(
            f"p{k} AS (SELECT n.id,\n"
            f"  CAST((15 * {SCALE} + 85 * COALESCE(c.c, 0)) // 100 AS BIGINT) AS r\n"
            f"  FROM nodes n LEFT JOIN c{k} c USING (id))"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id, r AS rank_micro, CAST(r AS DOUBLE) / {SCALE} AS rank"
        + f"\nFROM p{rounds}"
    )
