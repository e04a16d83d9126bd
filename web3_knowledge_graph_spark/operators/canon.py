"""Canonicalization: connected components over identity edges.

The reference never computes CC explicitly — Neo4j stores identity clusters
implicitly as subgraphs of HAS_ACCOUNT/HAS_ALIAS edges built by
/root/reference/pipelines/postProcessing/accounts/cyphers.py (whole file).
Emitting canonical triples from columnar tables requires materializing the
cluster id, so this module implements the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) as pure DataFrame ops:

  large-star: for each node u, connect every strictly-larger neighbor v>u to
              min(N(u) ∪ {u})
  small-star: for each node u, connect every neighbor v<=u (v!=u) and u
              itself to min(N(u) ∪ {u}) over neighbors <= u

Converges in O(log n) rounds; each round is one groupBy shuffle on the node
id. Lineage is cut with localCheckpoint every round (iterative plans
otherwise grow unboundedly — SURVEY.md §4). Hub skew (one identity hub with
millions of neighbors) is absorbed by AQE skew handling on the groupBy; the
canonical id is the component-minimum, so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.select("src", "dst").unionByName(rev).where(
        F.col("src") != F.col("dst")
    ).distinct()


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (large=True) or small-star round.

    Input and output are undirected edge sets encoded as (src, dst) pairs;
    after convergence every edge is (node, component_min).
    """
    neighbors = _symmetrize(edges)
    if large:
        # min over the full neighborhood incl. self; emit (v, m) for v > u
        m = neighbors.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        out = (
            neighbors.where(F.col("dst") > F.col("src"))
            .join(m, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
    else:
        smaller = neighbors.where(F.col("dst") <= F.col("src"))
        m = smaller.groupBy("src").agg(F.min("dst").alias("m"))
        out = (
            smaller.join(m, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(m.select(F.col("src"), F.col("m").alias("dst")))
        )
    return out.where(F.col("src") != F.col("dst")).distinct()


def _driver_union_find(spark, pairs: list[tuple[int, int]], node_ids) -> DataFrame:
    """Union-find on the driver for small edge sets (same asymptotics any
    production CC takes when the deduped identity graph fits one machine —
    the corpus can be 100 TB while the identity graph is thousands of
    edges). Returns the same (id, component=min id) contract."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so roots stay the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in node_ids]
    return spark.createDataFrame(rows, "id long, component long")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """edges(src,dst) → assignments(id, component) with component = min id.

    Every node mentioned in ``edges`` (including via self-loops) gets an
    assignment; nodes absent from ``edges`` entirely are the caller's to
    default (see canonical_ids).

    Edge sets at or below ``driver_threshold`` (after dedup) solve with
    driver-side union-find — O(E α(E)) beats log-rounds of distributed
    shuffles by orders of magnitude there; above it, the alternating
    large-star/small-star loop runs. Set driver_threshold=0 to force the
    distributed path (tests exercise both).
    """
    raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    all_nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    e = raw.where(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    if driver_threshold > 0:
        n_edges = e.count()
        if n_edges <= driver_threshold:
            pairs = [(r[0], r[1]) for r in e.collect()]
            nodes = [r[0] for r in all_nodes.collect()]
            return _driver_union_find(edges.sparkSession, pairs, nodes)

    def _sig(df: DataFrame):
        # order-independent edge-set signature: one cheap agg instead of two
        # exceptAll anti-joins per iteration (collision odds ~2^-64)
        return df.agg(
            F.count(F.lit(1)).alias("c"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).first()

    prev = _sig(e)
    for _ in range(max_iter):
        e2 = _star_round(e, large=True)
        e2 = _star_round(e2, large=False).localCheckpoint()
        cur = _sig(e2)
        e = e2
        if cur == prev:
            break
        prev = cur
    # e is (node, min) for every non-min node; min nodes and isolated nodes
    # (self-loop-only) map to themselves via the all_nodes union
    assigned = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    selves = all_nodes.select("id", F.col("id").alias("component"))
    return (
        assigned.unionByName(selves)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


def canonical_ids(nodes: DataFrame, identity_edges: DataFrame) -> DataFrame:
    """Assign canonical_id to every node: CC over identity edges; nodes not
    in any identity cluster are their own canonical node (SURVEY.md §2.10)."""
    assign = connected_components(identity_edges)
    return (
        nodes.join(assign, nodes["id"] == assign["id"], "left")
        .select(
            nodes["*"],
            F.coalesce(assign["component"], nodes["id"]).alias("_canon"),
        )
        .withColumn("canonical_id", F.col("_canon"))
        .drop("_canon")
    )
