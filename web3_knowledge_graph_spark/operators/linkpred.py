"""Link-prediction features over the undirected entity graph.

The reference's linking rules (accounts/cyphers.py — two-hop, same-key,
scored) DECIDE links; this operator SCORES candidate pairs with the
classic topological features those decisions can be weighed against:

  * common_neighbors — |N(a) ∩ N(b)|
  * jaccard          — |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
  * resource_alloc_micro — Σ_{z ∈ N(a)∩N(b)} (10^6 div deg(z)), the
    Resource Allocation index (Zhou, Lü & Zhang 2009) in exact integer
    micro-units. RA is the determinism-friendly sibling of Adamic-Adar
    (1/log deg needs floats whose cross-row sums are order-dependent;
    1/deg in fixed-point sums exactly in any order).

Candidate pairs are WEDGE-GENERATED (share ≥1 neighbor), never the
all-pairs product. The quadratic term is Σ deg(z)² over middle vertices —
a mega-hub mediates deg² pairs carrying ~no signal (everyone co-occurs
through it), so middles with deg > ``max_hub`` are excluded from pair
generation (the documented recall contract every hot-key guard in this
repo uses: visible cap over silent blowup). Residual skew AQE-splits.

Shuffles: degree agg (node), wedge join (middle-vertex-keyed), pair agg
((a, b)-keyed with map-side partial sums), existing-edge left join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import undirected_edges

RA_SCALE = 1_000_000


def link_prediction(
    edges: DataFrame,
    max_hub: int = 1_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Score every node pair sharing at least one (non-hub) neighbor.
    Returns (node_a, node_b, common_neighbors, jaccard,
    resource_alloc_micro, already_linked), node_a < node_b.

    With hubs excluded, common_neighbors counts non-hub middles while the
    jaccard denominator keeps FULL degrees — the score is conservative
    (never inflated) for hub-adjacent pairs; below ``max_hub`` degree the
    features are exact."""
    und = undirected_edges(edges, src, dst)
    adj = und.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        und.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # adjacency annotated with the MIDDLE vertex's degree, hubs excluded
    adj_z = (
        adj.join(deg.select(F.col("a").alias("b"), F.col("deg").alias("zdeg")), "b")
        .where(F.col("zdeg") <= max_hub)
    )
    wedges = (
        adj_z.alias("x")
        .join(adj_z.alias("y"), F.col("x.b") == F.col("y.b"))
        .where(F.col("x.a") < F.col("y.a"))
        .select(
            F.col("x.a").alias("node_a"),
            F.col("y.a").alias("node_b"),
            F.col("x.zdeg").alias("zdeg"),
        )
    )
    pairs = wedges.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum(F.expr(f"{RA_SCALE} div zdeg")).cast("long").alias(
            "resource_alloc_micro"
        ),
    )
    da = deg.select(F.col("a").alias("node_a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("a").alias("node_b"), F.col("deg").alias("_db"))
    linked = und.select(
        F.col("u").alias("node_a"), F.col("v").alias("node_b"), F.lit(True).alias("_l")
    )
    return (
        pairs.join(da, "node_a")
        .join(db, "node_b")
        .join(linked, ["node_a", "node_b"], "left")
        .select(
            "node_a",
            "node_b",
            "common_neighbors",
            (
                F.col("common_neighbors").cast("double")
                / (F.col("_da") + F.col("_db") - F.col("common_neighbors")).cast(
                    "double"
                )
            ).alias("jaccard"),
            "resource_alloc_micro",
            F.coalesce("_l", F.lit(False)).alias("already_linked"),
        )
    )
