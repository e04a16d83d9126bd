"""Bounded multi-source shortest paths — iterative frontier expansion.

Reference: shortestPath((w1)-[r*..4]-(w2)) over all relationship types
(/root/reference/pipelines/analytics/wallet_communities/cyphers.py:22-35,
bounded to 4 hops, excluding MultiSig endpoints). Neo4j evaluates this as a
graph traversal; the Spark restatement is level-synchronous BFS: one
self-join per hop level, with a visited-set anti-join so each (source,
node) pair keeps its first (= minimum) hop count.

Scale notes: each round shuffles frontier ∪ edges on the node id; the
frontier shrinks geometrically on most real graphs. max_hops bounds the
round count (4 here, per the reference), and localCheckpoint per round
cuts the iterative lineage exactly like operators/canon.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """edges(src,dst) undirected × sources(id) → (source, node, hops) with
    hops = min #edges from source to node, 0 ≤ hops ≤ max_hops."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    reached = sources.select(
        F.col(id_col).alias("source"), F.col(id_col).alias("node"), F.lit(0).alias("hops")
    ).localCheckpoint()
    frontier = reached
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["a"])
            .select("source", F.col("b").alias("node"), F.lit(hop).alias("hops"))
            .distinct()
            .join(reached.select("source", "node"), ["source", "node"], "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return reached