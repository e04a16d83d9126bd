"""Triangle enumeration over the undirected entity graph.

Graph-quality analytics (clustering coefficient, community cohesion,
spam-ring detection) start from triangles. The reference's analytics
pipelines stop at communities/centrality (no triangle pass), so this is
new surface following the same graph-over-DataFrames style as
operators/pagerank.py and operators/canon.py.

Algorithm: DEGREE-ORDERED ORIENTATION (the MapReduce-classic from Suri &
Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
WWW'11). Each undirected edge {u, v} is directed from the endpoint with
the smaller (degree, id) to the larger; every triangle then appears
exactly once as a path a→b→c plus the closing edge a→c. The orientation
is the skew guard: out-degree in the oriented DAG is O(sqrt(m)) even when
a hub's raw degree is huge, so the wedge self-join — the quadratic term —
is bounded per node by sqrt(m), not by hub degree. A plain adjacency
self-join on a 10^8-degree hub is the "last reducer" that never finishes;
oriented, that hub contributes almost no wedges.

Shuffles: degree agg (node-keyed), orientation join (edge ⋈ degree,
node-keyed), wedge join (mid-vertex-keyed), closing-edge join (pair-keyed)
— all linear in edges + wedges, AQE-skew-split for residual heavy keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonicalize to distinct undirected edges (u < v, self-loops
    dropped): one (u, v) exchange."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """All triangles of the undirected graph, one row each, corners sorted
    ascending: (node_a < node_b < node_c)."""
    und = undirected_edges(edges, src, dst)
    deg = (
        und.select(F.col("u").alias("n"))
        .unionByName(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    # orient by (degree, id): lower endpoint of the total order points to
    # the higher one
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )
    # wedges a→b→c, then close with the oriented edge a→c
    wedge = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c")
        )
    )
    closing = oriented.select(F.col("a"), F.col("b").alias("c"))
    tri = wedge.join(closing, ["a", "c"])
    srt = F.array_sort(F.array("a", "b", "c"))
    return tri.select(
        srt[0].alias("node_a"), srt[1].alias("node_b"), srt[2].alias("node_c")
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation count (the local clustering
    numerator): explode each triangle's three corners, count per node."""
    tri = triangles(edges, src, dst)
    return (
        tri.select(
            F.explode(F.array("node_a", "node_b", "node_c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri_count"))
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core membership after a FIXED number of peeling rounds: each
    round recomputes degrees over the surviving subgraph and drops nodes
    with degree < k (spam/bot-ring detection and graph-denoising both
    start from the core). The fixed round count is what makes the loop a
    static job graph — deterministic, resumable, and replayable as an
    unrolled CTE chain by the DuckDB oracle (the pagerank/kmeans
    convention); peeling converges in far fewer rounds on real graphs
    (pytest pins convergence on small fixtures), and the partial result
    after R rounds is well-defined either way: a SUPERSET of the true
    k-core that shrinks monotonically.

    Per round: one degree aggregation (node-keyed) + two semi-joins to
    drop edges touching peeled nodes — all linear in surviving edges;
    localCheckpoint cuts the iterative lineage exactly as in
    connected_components. Returns (node, deg) of the surviving nodes with
    their degree in the surviving subgraph.
    """
    und = undirected_edges(edges, src, dst).localCheckpoint()
    deg = None
    for _ in range(rounds):
        deg = (
            und.select(F.col("u").alias("node"))
            .unionByName(und.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        alive = deg.where(F.col("deg") >= k).select("node")
        und = (
            und.join(alive.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return deg.where(F.col("deg") >= k)


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node: 2·tri / (deg·(deg−1)),
    0.0 for degree-1 nodes. One row per node of the undirected graph.

    The double is a single division of exact integers (both engines
    evaluate the identical IEEE expression) — no accumulated float sums,
    so the value is bit-reproducible like every other op here."""
    und = undirected_edges(edges, src, dst)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = triangle_counts(edges, src, dst)
    return deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce("tri_count", F.lit(0)).cast("long").alias("tri_count"),
        F.when(
            F.col("deg") > 1,
            F.coalesce("tri_count", F.lit(0)).cast("double")
            * F.lit(2.0)
            / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )
