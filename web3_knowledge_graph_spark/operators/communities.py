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
