"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline; the scale path buckets
vectors with random-hyperplane LSH (sign bits of deterministic pseudo-random
projections) so candidate generation is a bucket-local join instead of a
full cross product. No reference analog (the reference has no vector ops);
this is the training-data-pipeline surface of the engine.

Numerical contract: all arithmetic in float64, accumulated left-to-right over
the array (F.aggregate is a sequential fold), which matches DuckDB's
list_* semantics — oracle results are bit-identical, not just close.

Scale notes: queries are broadcast (top-k serves a small probe set against a
huge corpus). For all-pairs near-dup at 10^9 vectors, only the LSH-bucketed
variant survives; bucket skew (dense regions) is absorbed by AQE skew-join
splitting plus the hot-bucket cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def with_norm(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return vecs.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query set,
    score every corpus vector JVM-side, rank per query. Returns
    (query_id, neighbor_id, rank, cosine). Self-matches excluded.

    The corpus side never shuffles for scoring — only the final per-query
    top-k ranks shuffle, and that is bounded by |queries| × |corpus| rows
    pre-filtered per-partition via the window rank.
    """
    q = F.broadcast(
        with_norm(queries, vec_col).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.col("_norm").alias("_qn"),
        )
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    scored = (
        c.crossJoin(q)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _projection(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component c_j = ±1 by parity
    of an md5-derived integer — reproducible in SQL for the oracle."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"proj:{bit}:{j}".encode()).hexdigest()[:8], 16) % 2 else -1.0
        for j in range(dim)
    ]


def lsh_buckets(
    vecs: DataFrame,
    dim: int,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    first_bit: int = 0,
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) bucket id per vector:
    bit b = sign(v · p_{first_bit+b}). Returns (vec_id, bucket).
    Cosine-similar vectors collide with probability 1 − θ/π per bit;
    ``first_bit`` selects a disjoint hyperplane set per band so OR-ing
    bands raises recall (see cosine_neardup_pairs)."""
    out = vecs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    bucket = F.lit(0).cast("long")
    for b in range(n_bits):
        proj = F.array(*[F.lit(x) for x in _projection(dim, first_bit + b)])
        bit = (_dot(F.col("_v"), proj) > 0).cast("long")
        bucket = bucket + bit * (1 << b)
    return out.select("vec_id", bucket.alias("bucket"))


def cosine_neardup_pairs(
    vecs: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    n_bits: int = 0,
    n_bands: int = 1,
    max_bucket: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a<b) with cosine ≥ threshold.

    n_bits=0 → exact all-pairs (correctness baseline; quadratic — small
    inputs only). n_bits>0 → banded LSH: ``n_bands`` independent bucketings
    of ``n_bits`` hyperplanes each (disjoint hyperplane sets); a pair is a
    candidate if it collides in ANY band (OR over bands — the textbook
    recall lever: P(candidate) = 1 − (1 − p^n_bits)^n_bands for per-bit
    collision p = 1 − θ/π). Candidates are deduped across bands, then exact
    cosine verifies each candidate once. Cost per band is bucket-local —
    never all-pairs; viral buckets are dropped by ``max_bucket`` and the
    intra-bucket join skew is AQE-split.
    """
    v = with_norm(vecs, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"), F.col("_norm").alias("_n")
    )
    if n_bits > 0:
        assert dim is not None, "dim required for LSH bucketing"
        cand = None
        for band in range(n_bands):
            bk = lsh_buckets(
                vecs, dim, n_bits, id_col, vec_col, first_bit=band * n_bits
            )
            ok = (
                bk.groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") <= max_bucket)
                .select("bucket")
            )
            bkf = bk.join(ok, "bucket")
            p = (
                bkf.alias("x")
                .join(
                    bkf.alias("y"),
                    (F.col("x.bucket") == F.col("y.bucket"))
                    & (F.col("x.vec_id") < F.col("y.vec_id")),
                )
                .select(
                    F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
                )
            )
            cand = p if cand is None else cand.unionByName(p)
        pairs = cand.distinct()
        return (
            pairs.join(
                v.select(
                    F.col("vec_id").alias("vec_a"),
                    F.col("_v").alias("_va"),
                    F.col("_n").alias("_na"),
                ),
                "vec_a",
            )
            .join(
                v.select(
                    F.col("vec_id").alias("vec_b"),
                    F.col("_v").alias("_vb"),
                    F.col("_n").alias("_nb"),
                ),
                "vec_b",
            )
            .select(
                "vec_a",
                "vec_b",
                (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                    "cosine"
                ),
            )
            .where(F.col("cosine") >= threshold)
        )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n"))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: deterministic centroid set (every
    corpus vector with id % ceil(N/n_centroids) == 0 at small scale; a
    trained codebook in production), assign each corpus vector to its
    nearest centroid (broadcast centroids), probe the n_probe nearest cells
    per query. Returns (query_id, neighbor_id, rank, cosine) — approximate:
    misses neighbors outside probed cells.
    """
    cents = F.broadcast(
        with_norm(
            corpus.orderBy(id_col).limit(n_centroids), vec_col
        ).select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("_pv"),
            F.col("_norm").alias("_pn"),
        )
    )

    def assign(df: DataFrame, out: str, n: int) -> DataFrame:
        scored = df.crossJoin(cents).select(
            df["*"],
            F.col("cent_id"),
            (_dot(F.col("_v"), F.col("_pv")) / (F.col("_n") * F.col("_pn"))).alias("_cs"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("_cs").desc(), F.col("cent_id"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= n)
            .select(df["*"], F.col("cent_id").alias(out))
        )

    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"), F.col("_norm").alias("_n")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"), F.col("_norm").alias("_n")
    )
    c_cells = assign(c, "cell", 1)
    q_cells = assign(q, "cell", n_probe)
    qq = q_cells.select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
        "cell",
    )
    cand = qq.join(c_cells, "cell").where(F.col("query_id") != F.col("vec_id"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_n"))).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.8,
    n_centroids: int = 16,
    cell_cap: int = 100_000,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space, then WITHIN each cluster drop every vector lying
    within cosine >= ``threshold`` of a lower-id vector (the kept
    representative). The paper keeps a random representative per
    epsilon-ball; id order makes the same decision deterministically.

    ``n_probes`` > 1 is the multi-probe recall lever (the IVF-probes idea
    applied to SemDeDup's cell locality): each vector participates in
    pairing under its top-``n_probes`` cells, so near-duplicate pairs
    straddling a cell boundary are still found when ANY probed cell is
    shared. Reported ``cell`` stays the top-1 assignment; cost grows by
    at most n_probes^2 in the within-cell join, still never
    corpus-quadratic.

    Plan: the centroid set is the deterministic id-sample ivf_topk uses (a
    trained codebook in production) — broadcast, so assignment is one scan
    + a per-vector rank window. Candidate pairs come from a shared-probe-
    cell self-join only: cost is sum(cell_size^2) over probe cells,
    bounded by the codebook granularity, never corpus-quadratic; cells
    larger than ``cell_cap`` are excluded from pairing (members all kept —
    the hot-bucket guard lsh_buckets uses, recall loss documented over
    silent blowup). Pairs sharing two probe cells dedupe BEFORE the
    cosine verify, so each candidate is scored once.

    Returns (vec_id, cell, dup_of, keep) for EVERY input vector;
    ``dup_of`` is the smallest shared-cell id within threshold (-1 for
    keepers — sentinel, not NULL, for oracle hash stability). NOTE:
    dup_of is NOT necessarily itself a keeper — greedy chains occur
    (A keeps, B dups-to-A, C dups-to-B while outside threshold of A),
    a deliberate divergence from SemDeDup's one-representative-per-
    epsilon-ball: chains strictly decrease in id so a consumer needing
    the ball representative can resolve dup_of transitively, and the
    keep/drop DECISION (what dedup actually consumes) is identical
    either way for the kept set.
    """
    cents = F.broadcast(
        with_norm(corpus.orderBy(id_col).limit(n_centroids), vec_col).select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("_pv"),
            F.col("_norm").alias("_pn"),
        )
    )
    v = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"), F.col("_norm").alias("_n")
    )
    scored = v.crossJoin(cents).select(
        v["*"],
        F.col("cent_id"),
        (_dot(F.col("_v"), F.col("_pv")) / (F.col("_n") * F.col("_pn"))).alias("_cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_cs").desc(), F.col("cent_id"))
    probed = (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= n_probes)
        .select("vec_id", "_v", "_n", F.col("cent_id").alias("cell"), "_r")
        .localCheckpoint()
    )
    cells = probed.where(F.col("_r") == 1).select("vec_id", "cell")
    ok = probed.groupBy("cell").agg(F.count(F.lit(1)).alias("_sz")).where(
        F.col("_sz") <= cell_cap
    )
    pairable = probed.select("vec_id", "cell").join(
        F.broadcast(ok.select("cell")), "cell"
    )
    a, b = pairable.alias("a"), pairable.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("cand"), F.col("b.vec_id").alias("vec_id")
        )
        .distinct()  # a pair sharing several probe cells verifies once
    )
    vv = probed.where(F.col("_r") == 1).select("vec_id", "_v", "_n")
    dup_of = (
        cand.join(
            vv.select(
                F.col("vec_id").alias("cand"),
                F.col("_v").alias("_va"),
                F.col("_n").alias("_na"),
            ),
            "cand",
        )
        .join(vv, "vec_id")
        .select(
            "vec_id",
            "cand",
            (_dot(F.col("_va"), F.col("_v")) / (F.col("_na") * F.col("_n"))).alias(
                "_cos"
            ),
        )
        .where(F.col("_cos") >= threshold)
        .groupBy("vec_id")
        .agg(F.min("cand").cast("long").alias("dup_of"))
    )
    return (
        cells.join(dup_of, "vec_id", "left")
        .select(
            F.col("vec_id"),
            F.col("cell").cast("long").alias("cell"),
            F.coalesce("dup_of", F.lit(-1)).cast("long").alias("dup_of"),
            F.col("dup_of").isNull().alias("keep"),
        )
    )
