"""Deduplication operators for web-scale text corpora.

The reference dedups only on exact natural keys (pandas ``drop_duplicates``
— /root/reference/pipelines/ingestion/tokenHolders/ingest.py:31,
snapshot/ingest.py:143) before Neo4j MERGE absorbs the rest. A 10^12-doc
training corpus needs content-level dedup as well; this module supplies the
standard ladder — exact hash, n-gram Jaccard, MinHash-LSH, SimHash — as
native DataFrame ops (JVM-side codegen; engine-agnostic md5-derived hashes
so a DuckDB oracle can replay every step bit-for-bit).

Scale notes (100 TB):
  * exact_dedup: one shuffle on a 128-bit fingerprint — uniform keys, no skew.
  * shingle/jaccard: the shingle self-join explodes quadratically inside hot
    shingle blocks, so hot shingles (df > max_doc_freq) are dropped — they
    carry no discriminative signal (same motivation as stopword removal).
  * minhash_lsh: cost is linear in docs × num_hashes; the band self-join
    shuffles on the bucket key, AQE skew-split handles viral buckets.
  * simhash: linear; one shuffle per doc for the bit-majority fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.charclass import ASCII_LOWER, DIGITS, positive_complement_class

# Complement of [a-z0-9] written as positive ranges: identical split
# semantics to "[^a-z0-9]+" (the DuckDB-oracle spelling) but ~20x faster
# on this JVM (functions/charclass.py — negated-class pathology).
TOKEN_SPLIT_RE = positive_complement_class(ASCII_LOWER + DIGITS) + "+"


def _hash60(col: F.Column) -> F.Column:
    """Deterministic 60-bit int from a string: first 15 hex chars of md5.
    Engine-agnostic (DuckDB: ('0x'||substr(md5(x),1,15))::ubigint)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens_col(text: F.Column) -> F.Column:
    """Lowercased word tokens (array<string>), empties removed."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: F.length(t) > 0
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact content dedup: fingerprint = md5(lower(text)); canonical doc =
    min(id) per fingerprint. Returns (doc_id, fingerprint, canonical_doc_id,
    is_dup). One hash-partitioned shuffle on the fingerprint."""
    # NULL text coalesces to '' BEFORE hashing: md5(NULL) is NULL, and a
    # NULL fingerprint matches nothing in the null-unsafe equi-join below
    # — the doc would silently vanish from the output instead of landing
    # in the empty-content group, breaking the one-row-per-input-doc
    # audit contract every sibling operator upholds.
    fp = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "fingerprint"
        ),
    )
    canon = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("canonical_doc_id"))
    return (
        fp.join(canon, "fingerprint")
        .select(
            "doc_id",
            "fingerprint",
            "canonical_doc_id",
            (F.col("doc_id") != F.col("canonical_doc_id")).alias("is_dup"),
        )
    )


def shingle_array_of(toks: F.Column, k: int = 3) -> F.Column:
    """Distinct word k-shingles over an ALREADY-MATERIALIZED token-array
    column; k=1 is the unigram/bag-of-words case.

    The column contract matters: if ``toks`` is the raw tokenizer
    EXPRESSION (filter∘split∘lower) rather than a projected column,
    Spark re-evaluates the whole tokenizer for EVERY lambda element of
    the transform below — measured 4.8× slower on the sf0.1 corpus.
    Callers must project the tokens once per row first (see shingles)."""
    if k == 1:
        return F.array_distinct(toks)
    # guard: Spark sequence(1, n) with n<1 yields a DESCENDING sequence,
    # so short docs must produce an explicitly empty shingle set
    return F.when(F.size(toks) >= k, F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )).otherwise(F.array().cast("array<string>"))


def shingle_array(text: F.Column, k: int = 3) -> F.Column:
    """Distinct word k-shingles of a raw text column. Expression-level
    convenience — inside a plan, prefer projecting tokens_col to a real
    column and calling shingle_array_of (see its docstring)."""
    return shingle_array_of(tokens_col(text), k)


def shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word k-shingles per doc, exploded: (doc_id, shingle).
    Two-step projection: the token array materializes as a real column
    BEFORE the shingle transform references it (shingle_array_of)."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    return toked.select(
        "doc_id", F.explode(shingle_array_of(F.col("_toks"), k)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame,
    k: int = 1,
    threshold: float = 0.8,
    max_doc_freq: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-k-shingle Jaccard ≥ threshold.

    Two modes, one verification core:

    * ``candidates`` given — VERIFICATION SUBROUTINE (the at-scale mode):
      exact Jaccard is computed only for the supplied (doc_a, doc_b) pairs
      (e.g. from lsh_candidate_pairs); cost is O(candidates × shingles),
      never all-pairs. near_dedup routes through this path. No hot-shingle
      guard: candidate count, not shingle df, bounds the join.
    * ``candidates`` None — exact all-pairs baseline: self-join on shingle
      (a<b) with hot shingles dropped (df > max_doc_freq). Total cost is
      Σ df² over shingles — fine as a small-corpus recall baseline and as
      the oracle-checkable ground truth, but the WRONG plan at web scale;
      use the LSH-candidate mode (or near_dedup) there.

    Returns (doc_a, doc_b, jaccard) with J = |A∩B| / (|A|+|B|−|A∩B|).
    """
    sh = shingles(docs, k, id_col, text_col)
    if candidates is None:
        df_per_shingle = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            df_per_shingle.where(F.col("df") <= max_doc_freq).select("shingle"),
            "shingle",
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is None:
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle"))
        sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle"))
        inter = (
            candidates.select("doc_a", "doc_b")
            .join(sa, "doc_a")
            .join(sb, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) permutation coefficients, md5-derived so the
    DuckDB oracle can inline the identical constants."""
    import hashlib

    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"mha:{i}".encode()).hexdigest()[:8], 16) % (MINHASH_P - 1) + 1
        b = int(hashlib.md5(f"mhb:{i}".encode()).hexdigest()[:8], 16) % MINHASH_P
        out.append((a, b))
    return out


def minhash_wide(
    docs: DataFrame,
    k: int = 1,
    num_hashes: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signatures in wide form: (doc_id, mh0..mh{n-1}), one column
    per permutation. One md5 per shingle in a plain codegen'd projection,
    then a SINGLE groupBy(doc_id) carrying num_hashes min-aggregates — the
    map-side partial agg reduces every doc to one row of longs before the
    exchange, so the shuffle is O(docs), not O(docs × num_hashes). An
    all-array-domain fold (aggregate over transform(md5)) looks shuffle-free
    but runs entirely in interpreted higher-order functions — measured 3-8x
    slower; a seed-index explode multiplies the pre-agg rows by num_hashes
    for no benefit."""
    coeffs = minhash_coeffs(num_hashes)
    sh = shingles(docs, k, id_col, text_col)
    base = sh.select("doc_id", (_hash60(F.col("shingle")) % MINHASH_P).alias("h"))
    # a_i·h < 2^62: pure integer arithmetic, no overflow
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return base.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    docs: DataFrame,
    k: int = 1,
    num_hashes: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signatures: sig_i(doc) = min over shingles of
    h_i(s) = (a_i·h(s) + b_i) mod P with h(s) a 31-bit md5-derived base hash.
    Returns (doc_id, i, minhash) — long form shared with the DuckDB oracle;
    computed as a posexplode of the wide form (minhash_wide), so the only
    exchange is the single per-doc partial-min shuffle."""
    wide = minhash_wide(docs, k, num_hashes, id_col, text_col)
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"mh{i}") for i in range(num_hashes)])),
    ).select("doc_id", F.col("pos").alias("i"), F.col("col").alias("minhash"))


def lsh_candidate_pairs(
    docs: DataFrame,
    k: int = 1,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH blocking: band the signature (num_hashes/rows_per_band
    bands), bucket key = md5(band || minhashes), self-join buckets with a<b.
    Returns distinct candidate pairs (doc_a, doc_b). The classic
    shingle→minhash→band→bucket-join pipeline; candidates are then verified
    with jaccard_pairs semantics on the candidate subset.

    Banding is a pure projection off the wide signature (band bucket =
    md5("band,mh_j,mh_j+1,…") — identical bytes to the long-form
    sort-by-i spelling the DuckDB oracle uses), so the whole candidate
    plan carries exactly two exchanges: the per-doc partial-min shuffle
    and the bucket self-join."""
    wide = minhash_wide(docs, k, num_hashes, id_col, text_col)
    n_bands = (num_hashes + rows_per_band - 1) // rows_per_band
    buckets = [
        F.md5(
            F.concat_ws(
                ",",
                F.lit(str(band)),
                *[
                    F.col(f"mh{i}").cast("string")
                    for i in range(
                        band * rows_per_band,
                        min((band + 1) * rows_per_band, num_hashes),
                    )
                ],
            )
        )
        for band in range(n_bands)
    ]
    banded = wide.select("doc_id", F.explode(F.array(*buckets)).alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def near_dedup(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full near-duplicate pipeline: MinHash-LSH candidate generation →
    exact Jaccard verification on candidates only → connected components
    over verified pairs → canonical doc = min(doc_id) per duplicate
    cluster. Returns (doc_id, canonical_doc_id, is_dup) for every doc.

    This is the standard web-corpus dedup recipe: candidate cost is
    LSH-bounded (never all-pairs), verification touches only candidates,
    and transitive duplicates collapse to one canonical via CC.
    """
    from ..operators.canon import connected_components

    cand = lsh_candidate_pairs(docs, k, num_hashes, rows_per_band, id_col, text_col)
    verified = jaccard_pairs(
        docs, k, jaccard_threshold, id_col=id_col, text_col=text_col,
        candidates=cand,
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    assign = connected_components(verified)
    out = docs.select(F.col(id_col).alias("doc_id")).join(
        assign.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    )
    return out.select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("canonical_doc_id"),
        (F.coalesce("component", F.col("doc_id")) != F.col("doc_id")).alias("is_dup"),
    )


def simhash(
    docs: DataFrame,
    bits: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash fingerprints: per token (with multiplicity) take a 60-bit md5
    hash; for each bit j the doc accumulates +count if set else −count; the
    fingerprint sets bit j where the sum is positive. Returns (doc_id,
    simhash). Near-dups then differ in few bits (Hamming ball search).
    Work = tokens × bits rows through one partial-aggregated shuffle."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    )
    counted = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    hashed = counted.withColumn("h", _hash60(F.col("tok")))
    per_bit = (
        hashed.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
            F.when(
                F.expr("(h >> j) & 1") == 1, F.col("cnt")
            ).otherwise(-F.col("cnt")).alias("v"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("v").alias("s"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, j)")).otherwise(F.lit(0))
        ).alias("simhash")
    )


def dup_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring duplication profile, the distributed stand-in for
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better": remove any ≥50-token span occurring
    twice in the corpus). A suffix array is a global sequential structure;
    the scalable relational equivalent hashes every k-token SLIDING window
    (stride 1 — unlike ``shingle_array`` these keep multiplicity and
    position count, since a span duplicated inside one doc still counts)
    and marks windows whose hash occurs ≥2 times corpus-wide.

    Returns one row per doc: (doc_id, n_windows, n_dup_windows, dup_frac).
    Callers drop/trim docs above a dup_frac threshold.

    Scale shape (the minhash recipe): windows explode as (long, long) rows
    ≈ one per corpus token; occurrence counts partial-aggregate map-side
    before one shuffle on the window hash; the mark join is co-partitioned
    on that same key; the final per-doc rollup is the second (small)
    shuffle. No pairwise comparisons anywhere — cost is linear in corpus
    tokens at any duplication rate.
    """
    # tokens materialize as a real column BEFORE the window transform
    # references them (see shingle_array_of: a raw tokenizer expression
    # inside the lambda re-evaluates per element)
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    # guard: Spark sequence(1, n) with n < 1 DESCENDS instead of yielding
    # empty — short docs need an explicit empty window set
    wins = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: _hash60(F.concat_ws(" ", F.slice(toks, i, k))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    base = toked.select("doc_id", F.explode(wins).alias("wh"))
    occ = base.groupBy("wh").agg(F.count(F.lit(1)).alias("occ"))
    per_doc = (
        base.join(occ, "wh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("occ") >= 2, 1).otherwise(0)).alias("n_dup_windows"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("n_dup_windows").cast("double") / F.col("n_windows")
            )
            .alias("dup_frac"),
        )
    )
