"""Community detection: deterministic synchronous label propagation.

Reference: /root/reference/pipelines/analytics/helpers/networks.py:48-59 runs
sknetwork Louvain over a dense projection adjacency, and the driver
analytics/wallet_communities/analyze.py:28-90 builds a wallet-wallet
co-occurrence adjacency and persists (wallet, partition) rows (cyphers
helpers/queries.py:186-234 → Partition nodes + HAS_PARTITION edges).

Louvain itself is driver-bound in the reference (dense numpy matrix, global
modularity optimization) and nondeterministic across library versions, so
the Spark-native stand-in is *synchronous weighted label propagation* with a
min-label tie-break and a fixed round count:

  * label(v) starts as v's own id;
  * each round, every node simultaneously adopts the label with the highest
    total incident edge weight among its neighbors' previous-round labels,
    ties broken by the smallest label;
  * after ``rounds`` rounds, the label is the community id.

This is deterministic (no RNG, no update-order dependence), one
join + groupBy shuffle per round (both keyed on the node id, so a
co-partitioned exchange), and exactly SQL-replayable — the DuckDB oracle
unrolls the same K rounds. The semantic divergence from Louvain (no
modularity objective; LPA finds denser local majorities) is documented in
COVERAGE.md §2.10.

Scale: state per round is one row per node plus one row per (node, candidate
label) vote — bounded by the edge count, never quadratic. Lineage is cut
with localCheckpoint per round as in operators.canon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    rounds: int = 4,
) -> DataFrame:
    """edges(src, dst[, weight]) → (id, community) for every endpoint.

    Undirected: each input edge votes in both directions. ``weight`` (long
    counts; summed exactly) defaults to 1 per edge. ``rounds`` is fixed so
    runs are reproducible and the oracle can unroll the loop.
    """
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    e = (
        half.unionByName(half.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()
    )
    labels = e.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    for _ in range(rounds):
        votes = (
            e.join(labels.select(F.col("id").alias("b"), "label"), "b")
            .groupBy(F.col("a").alias("id"), "label")
            .agg(F.sum("w").alias("wt"))
        )
        # argmax by (wt desc, label asc): max(struct(wt, -label)) — struct
        # comparison is lexicographic, so max weight first, then max(-label)
        # = min label. Exact (long arithmetic), no window needed.
        labels = (
            votes.groupBy("id")
            .agg(F.max(F.struct(F.col("wt"), (-F.col("label")).alias("nl"))).alias("m"))
            .select("id", (-F.col("m.nl")).alias("label"))
            .localCheckpoint()
        )
    return labels.select("id", F.col("label").alias("community"))


def materialize_partitions(labels: DataFrame) -> DataFrame:
    """(id, community) labels → the reference's wallet_communities persist
    shape: one HAS_PARTITION edge per member, annotated with its Partition
    node's member count (helpers/queries.py:186-234 creates Partition nodes
    and (wallet)-[:HAS_PARTITION]->(partition) edges; analyze.py:68-90
    saves the partition table).

    Plan: one groupBy on community for the member counts (the Partition
    node dimension — at most one row per community, tiny), then a
    broadcast-sized join back onto the labels. The labels relation never
    shuffles twice: the count aggregation output is dimension-sized, so
    AQE broadcasts it.
    """
    sizes = labels.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return labels.join(F.broadcast(sizes), "community").select(
        F.col("id").alias("user_id"),
        F.lit("HAS_PARTITION").alias("pred"),
        F.col("community").alias("partition"),
        "n_members",
    )


def partition_modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Per-community Newman modularity terms for a partition.

    The reference's Louvain (analytics/helpers/networks.py:48-59) optimizes
    modularity Q = Σ_c [in_c/(2m) − (tot_c/(2m))²]; the LPA stand-in above
    does not, so this operator QUANTIFIES the divergence: it scores any
    (id, community) assignment against the same graph. Σ q_term over the
    output is the partition's global Q.

    Columns: community, n_members, internal_weight (symmetrized intra-
    community weight = 2× undirected internal weight, exact long),
    total_degree (Σ member degrees, exact long), q_term (double from two
    deterministic scalar divisions — no accumulation-order dependence).

    Plan: the edge relation symmetrizes exactly as label_propagation does,
    then joins the label dimension onto both endpoints (two co-partitioned
    shuffles on node id); everything after is dimension-sized (one row per
    community). Scales with |E|, never |V|².
    """
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    e = (
        half.unionByName(half.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()  # two label joins + degree agg consume it
    )
    memb = labels.select(F.col("id"), F.col("community"))
    two_m = e.agg(F.sum("w").alias("m2"))  # symmetrized total = 2m, one row
    deg = e.groupBy(F.col("a").alias("id")).agg(F.sum("w").alias("deg"))
    in_c = (
        e.join(memb.select(F.col("id").alias("a"), F.col("community").alias("ca")), "a")
        .join(memb.select(F.col("id").alias("b"), F.col("community").alias("cb")), "b")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.sum("w").alias("in_w"))
    )
    stats = (
        memb.join(deg, "id")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("deg").cast("long").alias("total_degree"),
        )
    )
    t = F.col("total_degree").cast("double") / F.col("m2").cast("double")
    return (
        stats.join(in_c, "community", "left")
        .crossJoin(F.broadcast(two_m))
        .select(
            "community",
            "n_members",
            F.coalesce("in_w", F.lit(0)).cast("long").alias("internal_weight"),
            "total_degree",
            (
                F.coalesce("in_w", F.lit(0)).cast("double")
                / F.col("m2").cast("double")
                - t * t
            ).alias("q_term"),
        )
    )


def partition_modularity_oracle_sql(edges_cte: str, rounds: int = 4) -> str:
    """DuckDB replay of label_propagation → partition_modularity over an
    ``e(a, b, w)`` symmetrized edge CTE (same contract as the LPA oracle;
    the label assignment is the unrolled LPA subquery, so the two oracles
    can never disagree on the partition)."""
    lpa = label_propagation_oracle_sql(edges_cte, rounds=rounds)
    return f"""
WITH {edges_cte},
lab AS (SELECT * FROM ({lpa})),
ndeg AS (SELECT a AS id, SUM(w) AS deg FROM e GROUP BY a),
twom AS (SELECT SUM(w) AS m2 FROM e),
in_c AS (
  SELECT x.community AS community, SUM(e.w) AS in_w
  FROM e JOIN lab x ON e.a = x.id JOIN lab y ON e.b = y.id
  WHERE x.community = y.community GROUP BY x.community),
stats AS (
  SELECT m.community, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(d.deg) AS BIGINT) AS total_degree
  FROM lab m JOIN ndeg d USING (id) GROUP BY m.community)
SELECT s.community, n_members,
  CAST(COALESCE(i.in_w, 0) AS BIGINT) AS internal_weight,
  total_degree,
  CAST(COALESCE(i.in_w, 0) AS DOUBLE) / CAST(m2 AS DOUBLE)
    - (CAST(total_degree AS DOUBLE) / CAST(m2 AS DOUBLE))
      * (CAST(total_degree AS DOUBLE) / CAST(m2 AS DOUBLE)) AS q_term
FROM stats s LEFT JOIN in_c i USING (community) CROSS JOIN twom
"""


def label_propagation_oracle_sql(edges_cte: str, rounds: int = 4) -> str:
    """DuckDB SQL replaying label_propagation verbatim: ``edges_cte`` must
    define a relation ``e(a, b, w)`` already symmetrized; the rounds are
    unrolled as K join+window CTE pairs (generated, so the oracle can never
    drift from the configured round count)."""
    parts = [edges_cte, "l0 AS (SELECT DISTINCT a AS id, a AS label FROM e)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"v{r} AS (SELECT e.a AS id, l.label AS label, SUM(e.w) AS wt\n"
            f"  FROM e JOIN l{r - 1} l ON e.b = l.id GROUP BY e.a, l.label)"
        )
        parts.append(
            f"l{r} AS (SELECT id, label FROM (\n"
            f"  SELECT id, label, ROW_NUMBER() OVER (PARTITION BY id ORDER BY wt DESC, label ASC) AS rn\n"
            f"  FROM v{r}) WHERE rn = 1)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT id, label AS community FROM l{rounds}"
    )
