"""Embedding-space clustering: deterministic Lloyd's k-means.

Training-data pipelines cluster document embeddings to stratify corpora
(topic balancing, SemDeDup cells, curriculum buckets). No reference analog
(the reference has no vector ops); the codebook shape matches ivf_topk /
semantic_dedup in similarity.py, which consume exactly this kind of
clustering as their "trained codebook in production".

Determinism contract (the same one every dataset op here follows): every
cross-row reduction is exact integer arithmetic, because float sums across
rows are order-dependent under Spark's nondeterministic partition merge
order. Embeddings are floored to fixed-point micro-units once
(floor(x * 1e6) — floor, not round: IEEE round-half ties differ across
engines, floor cannot); distances are long folds; centroid means are
floor(sum / count) — each piece bit-reproducible in DuckDB for the oracle.

Scale shape:
  * centroids are driver-sized by contract (k × dim ≤ thousands) —
    broadcast as literal expression trees; assignment is ONE corpus scan
    per iteration with zero shuffle.
  * the update is a (cluster, dim) partial-aggregated exchange of
    k × dim × n_partitions rows — independent of corpus size after
    map-side combine.
  * iterations are fixed (no data-dependent convergence test), so the job
    graph is static — resumable and replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def to_micro(vec_col: F.Column) -> F.Column:
    """array<float> → array<long> fixed-point micro-units (floor)."""
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * F.lit(float(MICRO))).cast("long")
    )


def _dist2(vm: F.Column, cent: list[int]) -> F.Column:
    """Exact squared L2 distance (long fold) to a literal centroid."""
    c = F.array(*[F.lit(int(v)).cast("long") for v in cent])
    return F.aggregate(
        F.zip_with(vm, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means with deterministic init (the k smallest ids — the
    same id-sample codebook ivf_topk uses) and a fixed iteration count.

    Each iteration: assign every vector to the argmin-distance centroid
    (ties → smallest centroid id, via min over (dist, cid) structs), then
    recompute centroids as the per-dimension floored mean of members.
    Clusters that lose all members drop out (standard Lloyd's; the oracle
    replays the same rule). Returns (vec_id, cluster, dist) after the
    final assignment.

    The per-iteration collect is k × dim longs — codebook-sized, bounded
    by contract (same driver-side budget as the broadcast alias
    dictionaries); the corpus itself never leaves the executors.
    """
    v = vecs.select(
        F.col(id_col).alias("vec_id"), to_micro(F.col(vec_col)).alias("_vm")
    ).localCheckpoint()  # floor once; iterations re-scan this, not the source

    init = (
        v.orderBy("vec_id")
        .limit(k)
        .select("vec_id", "_vm")
        .collect()
    )
    centroids: list[tuple[int, list[int]]] = [
        (int(r.vec_id), list(r._vm)) for r in init
    ]

    def assign(cents: list[tuple[int, list[int]]]) -> DataFrame:
        scored = F.array(
            *[
                F.struct(
                    _dist2(F.col("_vm"), cv).alias("d"),
                    F.lit(int(cid)).cast("long").alias("cid"),
                )
                for cid, cv in cents
            ]
        )
        best = F.array_min(scored)
        return v.select(
            "vec_id",
            "_vm",
            best["cid"].alias("cluster"),
            best["d"].alias("dist"),
        )

    for _ in range(iters):
        assigned = assign(centroids)
        upd = (
            assigned.select("cluster", F.posexplode("_vm").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(
                F.floor(
                    F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")
                )
                .cast("long")
                .alias("cx")
            )
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in upd:
            by_cid.setdefault(int(r.cluster), {})[int(r.i)] = int(r.cx)
        centroids = [
            (cid, [dims[i] for i in range(len(dims))])
            for cid, dims in sorted(by_cid.items())
        ]

    return assign(centroids).select("vec_id", "cluster", "dist")
