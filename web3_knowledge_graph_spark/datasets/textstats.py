"""Text analysis for training-data curation: language-ID, quality scoring,
token counting, document fingerprinting.

Reference analog: the WIC fulltext keyword rules (/root/reference/pipelines/
analytics/wic/interests/cyphers.py:33-43 — dictionary containment over bios)
are the same tokenize+dictionary-join shape as the stopword language-ID here;
everything else is new training-pipeline surface. All operators are native
column expressions / broadcast dictionary joins — zero Python in the row
path, so plans stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..fixtures.dictionaries import LANGS, STOPWORDS
from ..functions.charclass import (
    ASCII_LOWER,
    ASCII_UPPER,
    DIGITS,
    JAVA_WS,
    positive_complement_class,
)
from .dedup import tokens_col

# BPE-ish lexer: letter runs | digit runs | any single non-space symbol.
# The symbol class is the positive complement of [A-Za-z0-9\s] (the
# DuckDB-oracle spelling) — same codepoint set, ~20x faster on this JVM
# (functions/charclass.py negated-class pathology).
_SYMBOL_CLASS = positive_complement_class(
    ASCII_UPPER + ASCII_LOWER + DIGITS + JAVA_WS
)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|" + _SYMBOL_CLASS
PUNCT_RE = _SYMBOL_CLASS


def ws_token_array(text: F.Column) -> F.Column:
    """The whitespace word ARRAY behind ws_token_count — the ONE tokenizer
    spelling (see ws_token_count); gopher_rules consumes the array form."""
    return F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)


def ws_token_count(text: F.Column) -> F.Column:
    """Whitespace token count — the ONE spelling (ws_token_array) shared by
    token_counts, length_quantiles, gopher_rules, curation.sequence_pack,
    curation.token_budget_sample and curation.unimax_sample, and mirrored
    by every oracle as
    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)).
    A tokenization fix applied anywhere else silently breaks cross-op and
    Spark/DuckDB consistency; change it HERE (ws_token_array) only. NULL
    text → NULL (the callers decide drop-vs-zero)."""
    return F.size(ws_token_array(text))


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-hit language ID: per-language stopword-occurrence counts
    folded ROW-LOCALLY (one filter over the materialized token array per
    language — the dictionary is 5 langs × 10 words, a literal), argmax
    per doc with ties broken by lang ascending — deterministic. Docs with
    zero hits in every language → 'und'. Returns (doc_id, guessed_lang,
    hits).

    Scale shape: a PURE MAP. The former explode → broadcast-join →
    groupBy(doc, lang) spelling shuffled O(corpus tokens) rows for what
    is logically a per-row computation; this plan has zero exchanges and
    scales with scan bandwidth alone. The argmax fold iterates languages
    in ascending order and replaces only on STRICTLY greater hits, which
    reproduces the join plan's ORDER BY hits DESC, lang ASC exactly."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks")
    )

    def _in(words: list[str]):
        arr = F.array(*[F.lit(w) for w in sorted(words)])
        # one-arg closure (see bm25's _eq): a two-arg lambda would receive
        # the element index as its second argument
        return lambda t: F.array_contains(arr, t)

    counted = toked.select(
        "doc_id",
        *[
            F.size(F.filter(F.col("_toks"), _in(STOPWORDS[lang])))
            .cast("long")
            .alias(f"_h_{lang}")
            for lang in sorted(LANGS)
        ],
    )
    best_lang, best_hits = F.lit("und"), F.lit(0).cast("long")
    for lang in sorted(LANGS):  # ascending: first strict max wins ties
        h = F.col(f"_h_{lang}")
        gt = h > best_hits
        best_lang = F.when(gt, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(gt, h).otherwise(best_hits)
    return counted.select(
        "doc_id",
        best_lang.alias("guessed_lang"),
        best_hits.alias("hits"),
    )


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features + a composite score, all closed-form:

      n_chars, n_tokens, n_stopwords, stopword_ratio (any language),
      punct_ratio, digit_ratio,
      quality = 0.4·min(n_tokens/100,1) + 0.4·min(stopword_ratio·5,1)
              + 0.2·(1 − min(punct_ratio·10,1))

    Heuristic mirrors common CCNet/Gopher-style length+stopword+symbol
    filters. Ratios are exact rational values of integer counts — oracle-
    stable across engines.
    """
    # tokens materialize once per row before the multi-reference scalar
    # expressions below (each reference to a raw tokenizer expression
    # re-evaluates the whole split/filter)
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    text = F.col("_text")
    toks = F.col("_toks")
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_arr = F.array(*[F.lit(w) for w in all_stop])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(f"({PUNCT_RE})"), 1))
    n_digit = F.size(F.regexp_extract_all(text, F.lit("([0-9])"), 1))
    n_chars = F.length(text)
    stopword_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    quality = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.4 * F.least(stopword_ratio * 5.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0)))
    )
    return toked.select(
        F.col("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        stopword_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        quality.alias("quality"),
    )


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + BPE-ish lexer token count per doc —
    the cost denominators of a training-data pipeline.
    Returns (doc_id, ws_tokens, bpe_tokens)."""
    text = F.col(text_col)
    ws = ws_token_count(text)
    bpe = F.size(F.regexp_extract_all(text, F.lit(f"({BPE_TOKEN_RE})"), 1))
    return docs.select(
        F.col(id_col).alias("doc_id"), ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
    )


def content_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set (catches shuffled/reordered plagiarism that exact_dedup
    misses) plus the exact md5. Returns (doc_id, exact_md5, bag_md5)."""
    toks = tokens_col(F.col(text_col))
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.lower(F.col(text_col))).alias("exact_md5"),
        F.md5(bag).alias("bag_md5"),
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, §A1.1), adapted to
    word tokens: documents dominated by repeated tokens or by one repeated
    bigram are generation/boilerplate artifacts and poison training data.

      dup_word_frac   = 1 - distinct_tokens / tokens
      top_bigram_frac = occurrences of the most frequent word bigram
                        / total bigrams
      keep            = both under their thresholds (Gopher drops at 0.30
                        duplicate fraction / 0.20 top-2-gram fraction)

    Plan: per-doc scalars (token counts) are pure projections; the bigram
    mode needs one explode + two aggregations BOTH keyed by doc_id, so the
    second reuses the first's partitioning (no extra exchange), and the
    final join is doc_id-to-doc_id co-partitioned. Cost is O(tokens) rows
    through one shuffle — linear, no self-joins, safe at any corpus size.

    Returns (doc_id, n_tokens, dup_word_frac, top_bigram_frac, keep).
    """
    # tokens materialize as a real column first (dedup.shingle_array_of:
    # a raw tokenizer expression inside the lambda re-evaluates per element)
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    base = toked.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        # guard: Spark sequence(1, n) with n<1 yields a DESCENDING sequence
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_bigrams"),
    )
    bi = (
        base.select("doc_id", F.explode("_bigrams").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top_c"), F.sum("c").cast("long").alias("n_bigrams"))
    )
    dup_frac = F.when(
        F.col("n_tokens") > 0,
        F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        F.col("n_bigrams") > 0,
        F.col("top_c").cast("double") / F.col("n_bigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        base.drop("_bigrams")
        .join(bi, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            dup_frac.alias("dup_word_frac"),
            top_frac.alias("top_bigram_frac"),
            (
                (dup_frac <= F.lit(max_dup_word_frac))
                & (top_frac <= F.lit(max_top_bigram_frac))
            ).alias("keep"),
        )
    )


# Gopher's eight English "stop words" (Rae et al. 2021, §A1.1 last rule) —
# a doc must contain at least GOPHER_MIN_STOP_TYPES distinct ones.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_TYPES = 2
# documented line-structure markers: a line "starts with a bullet" when its
# space-left-trimmed form begins with one of these (the '- '/'* ' forms
# require the trailing space so '-5 degrees' is not a bullet), and "ends
# with an ellipsis" when its space-right-trimmed form ends with '...'/'…'.
GOPHER_BULLET_PREFIXES = ("•", "‣", "▪", "- ", "* ")
GOPHER_ELLIPSIS_SUFFIXES = ("...", "…")


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The COMPLETE Gopher §A1.1 document-quality rule battery (Rae et al.
    2021, arXiv:2112.11446 Appendix A1.1 — the canonical LLM-corpus filter
    list; its repetition half lives in repetition_stats). One row per doc
    with every measured quantity, one boolean per rule, and the composite
    keep:

      ok_word_count     50 ≤ n_words ≤ 100,000        (whitespace words)
      ok_word_len       3 ≤ mean word length ≤ 10     (inclusive)
      ok_symbol_ratio   symbol-to-word ratio ≤ 0.1    ('#' + '...'/'…')
      ok_bullet         ≤ 90% of lines start with a bullet
      ok_ellipsis       ≤ 30% of lines end with an ellipsis
      ok_alpha          ≥ 80% of words contain ≥ 1 [A-Za-z] character
                        (ASCII alphabetic: Java \\p{L} and RE2 unicode
                        classes disagree at the edges — documented
                        divergence from the paper's unstated alphabet)
      ok_stopwords      ≥ 2 distinct GOPHER_STOPWORDS present
                        (exact lowercase whitespace-token match)

    Every flag is an EXACT INTEGER comparison (3·n_words ≤ word_chars,
    10·n_symbols ≤ n_words, …) so no engine's float rounding can flip a
    boundary doc; the double ratio columns are display-only divisions of
    the same integers (exactly-rounded IEEE in both engines). NULL text is
    treated as '' (the curation convention: audit rows never drop).

    Plan: a PURE MAP — one projection, zero exchanges; everything folds
    row-locally over the materialized word/line arrays, so the operator
    scales with scan bandwidth alone at any corpus size.

    Returns (doc_id, n_words, n_lines, word_chars, n_symbols,
    n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_types,
    mean_word_len, symbol_word_ratio, bullet_line_ratio,
    ellipsis_line_ratio, alpha_word_ratio, ok_* ×7, keep).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    # word/line arrays materialize once per row (the HOF-lambda column
    # contract, dedup.shingle_array_of) — every scalar below folds over
    # these columns, not over re-evaluated tokenizer expressions.
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        text.alias("_text"),
        # the shared tokenizer contract (ws_token_count's docstring)
        ws_token_array(text).alias("_words"),
        # \r?\n: the CRLF rationale of curation.c4_line_filter
        F.split(text, "\r?\n").alias("_lines"),
    )
    words, lines = F.col("_words"), F.col("_lines")
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("long")
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = (
        F.size(F.regexp_extract_all(F.col("_text"), F.lit("(#|\\.\\.\\.|…)"), 1))
        .cast("long")
    )

    def _starts_bullet(line: F.Column) -> F.Column:
        lt = F.ltrim(line)
        cond = F.lit(False)
        for p in GOPHER_BULLET_PREFIXES:
            cond = cond | lt.startswith(p)
        return cond

    def _ends_ellipsis(line: F.Column) -> F.Column:
        rt = F.rtrim(line)
        cond = F.lit(False)
        for s in GOPHER_ELLIPSIS_SUFFIXES:
            cond = cond | rt.endswith(s)
        return cond

    n_bullet = F.size(F.filter(lines, _starts_bullet)).cast("long")
    n_ellipsis = F.size(F.filter(lines, _ends_ellipsis)).cast("long")
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    low_words = F.transform(words, F.lower)
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop_types = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(low_words, s))
    ).cast("long")

    scalars = base.select(
        "doc_id",
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        word_chars.alias("word_chars"),
        n_symbols.alias("n_symbols"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
        n_alpha.alias("n_alpha_words"),
        n_stop_types.alias("n_stop_types"),
    )
    nw = F.col("n_words")
    nl = F.col("n_lines")

    def _ratio(num: F.Column, den: F.Column) -> F.Column:
        return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
            F.lit(0.0)
        )

    ok_word_count = (nw >= 50) & (nw <= 100_000)
    ok_word_len = (F.col("word_chars") >= 3 * nw) & (
        F.col("word_chars") <= 10 * nw
    ) & (nw > 0)
    ok_symbol_ratio = (10 * F.col("n_symbols") <= nw)
    ok_bullet = 10 * F.col("n_bullet_lines") <= 9 * nl
    ok_ellipsis = 10 * F.col("n_ellipsis_lines") <= 3 * nl
    ok_alpha = (5 * F.col("n_alpha_words") >= 4 * nw) & (nw > 0)
    ok_stopwords = F.col("n_stop_types") >= GOPHER_MIN_STOP_TYPES
    return scalars.select(
        "*",
        _ratio(F.col("word_chars"), nw).alias("mean_word_len"),
        _ratio(F.col("n_symbols"), nw).alias("symbol_word_ratio"),
        _ratio(F.col("n_bullet_lines"), nl).alias("bullet_line_ratio"),
        _ratio(F.col("n_ellipsis_lines"), nl).alias("ellipsis_line_ratio"),
        _ratio(F.col("n_alpha_words"), nw).alias("alpha_word_ratio"),
        ok_word_count.alias("ok_word_count"),
        ok_word_len.alias("ok_word_len"),
        ok_symbol_ratio.alias("ok_symbol_ratio"),
        ok_bullet.alias("ok_bullet"),
        ok_ellipsis.alias("ok_ellipsis"),
        ok_alpha.alias("ok_alpha"),
        ok_stopwords.alias("ok_stopwords"),
        (
            ok_word_count
            & ok_word_len
            & ok_symbol_ratio
            & ok_bullet
            & ok_ellipsis
            & ok_alpha
            & ok_stopwords
        ).alias("keep"),
    )


def boilerplate_ngrams(
    docs: DataFrame,
    k: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document repeated k-gram discovery — the C4/RefinedWeb-style
    boilerplate detector: a long word n-gram appearing verbatim in many
    documents is template/navigation text, not content, and its doc list
    seeds line-level cleaning.

    Plan: distinct k-shingles per doc (dedup.shingle_array — the same
    shingling the MinHash path uses), explode, then ONE count aggregation
    on the shingle key with map-side partial aggregation. Linear in total
    tokens; the skewed keys (the most common shingles) are exactly the
    rows the operator exists to return, and partial agg collapses them
    map-side before the exchange.

    Returns (shingle, n_docs) for shingles in ≥ min_docs documents.
    """
    from .dedup import shingles

    return (
        shingles(docs, k=k, id_col=id_col, text_col=text_col)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def lm_surprisal(
    docs: DataFrame,
    reference: DataFrame,
    min_count: int = 1,
    threshold_micro: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM quality scoring: fit a bigram model on a trusted
    ``reference`` corpus (CCNet trains KenLM on Wikipedia — ccnet §3.3),
    then score every document by how surprising its bigrams are under that
    model; high-surprisal docs are the low-quality tail a pipeline drops.

    DIVERGENCE from CCNet, on purpose: the score is the mean INVERSE
    PROBABILITY (arithmetic mean of 1/p in exact integer micro-units), not
    log-perplexity (geometric). Cross-engine `ln` is not bit-stable
    (JVM Math.log vs libm), so a log-based score could never pass a
    value-hash oracle; inverse probability needs only integer arithmetic
    — (2*c_uni + V) scaled by 1e6, integer-divided by (2*c_bi + 1), i.e.
    add-1/2 smoothing — and orders documents by the same "how well does
    the reference LM predict this text" signal.

    Plan: reference bigram/unigram counts are vocab-sized aggregates →
    explicit broadcasts (bigrams pruned to count >= min_count, the KenLM
    pruning analog); the corpus side is one scan exploding bigrams, two
    broadcast joins, one doc_id-keyed exact long sum. The corpus never
    shuffles its text. Returns (doc_id, n_bigrams, surprisal_micro,
    mean_inverse_prob, keep) for EVERY input doc; ``keep`` is NULL-safe
    false when threshold_micro is None.
    """
    def bigrams(df: DataFrame) -> DataFrame:
        # tokens materialize as a real column first (dedup.shingle_array_of:
        # a raw tokenizer expression inside the lambda — here two
        # element_at calls per element — re-evaluates per element)
        toked = df.select(
            F.col(id_col).alias("doc_id"),
            tokens_col(F.col(text_col)).alias("_toks"),
        )
        toks = F.col("_toks")
        pairs = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array())
        return toked.select("doc_id", F.explode(pairs).alias("bg")).select(
            "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )

    ref_bi = bigrams(reference)
    bi_counts = (
        ref_bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_bi"))
        .where(F.col("c_bi") >= min_count)
    )
    uni_counts = (
        reference.select(F.explode(tokens_col(F.col(text_col))).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("long").alias("c_uni"))
    )
    vocab = F.broadcast(uni_counts.agg(F.count(F.lit(1)).cast("long").alias("v")))

    scored = (
        bigrams(docs)
        .join(F.broadcast(bi_counts), ["w1", "w2"], "left")
        .join(F.broadcast(uni_counts), ["w1"], "left")
        .crossJoin(vocab)
        .select(
            "doc_id",
            F.expr(
                "CAST(1000000 * (2 * coalesce(c_uni, 0) + v) AS BIGINT)"
                " div CAST(2 * coalesce(c_bi, 0) + 1 AS BIGINT)"
            ).alias("ip_micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("ip_micro").cast("long").alias("surprisal_micro"),
        )
    )
    # threshold_micro=None means NO selection was requested: every
    # scoreable doc keeps (same contract as curation.dsir_weights —
    # an all-False default is indistinguishable from "every doc failed")
    keep = (
        F.lit(True)
        if threshold_micro is None
        else (F.col("surprisal_micro") <= F.lit(threshold_micro) * F.col("n_bigrams"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("surprisal_micro", F.lit(0)).cast("long").alias("surprisal_micro"),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                F.col("surprisal_micro") / (F.col("n_bigrams") * F.lit(1_000_000.0)),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_inverse_prob"),
            F.coalesce(keep & (F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0), F.lit(False)).alias("keep"),
        )
    )


def distinctive_terms(
    docs: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k distinctive terms per document by tf × inverse document
    frequency — the corpus-exploration op behind keyword extraction and
    topic labeling.

    DIVERGENCE from textbook TF-IDF, on purpose: idf is the exact integer
    rarity ratio (1e6 * N_docs div df), not ln(N/df) — cross-engine ``ln``
    is not bit-stable (see lm_surprisal), and for a fixed tf both order
    terms identically (monotone decreasing in df). Across mixed tf the
    log-damped and linear scores can rank differently; this op surfaces
    doc-discriminative vocabulary, it does not feed cosine scoring.

    Plan: one explode → per-doc tf (one (doc_id, term) exchange); the df
    relation is vocab-sized → broadcast join back on term; N_docs is a
    1-row broadcast cross join; top-k per doc via row_number, which Spark 4
    executes as WindowGroupLimit BELOW the exchange (only k rows per doc
    travel). Ties break on term asc — fully deterministic.
    Returns (doc_id, term, tf, df, score_micro, rnk).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = F.broadcast(
        docs.agg(F.countDistinct(F.col(id_col)).cast("long").alias("n_docs"))
    )
    scored = (
        # NO broadcast hint on dfreq: it is the full corpus vocabulary —
        # unbounded at web scale (the long tail of hashes/typos), exactly
        # what tfidf_similar_pairs refuses to broadcast. The equi-join on
        # term shuffles tf (already aggregated) instead; AQE still
        # broadcasts when the vocabulary turns out small.
        tf.join(dfreq, "term")
        .crossJoin(n)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr(
                "CAST(tf * (CAST(1000000 * n_docs AS BIGINT) div df) AS BIGINT)"
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def length_quantiles(
    docs: DataFrame,
    qs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT token-length quantiles — the corpus statistic behind choosing
    length-filter thresholds (Gopher/C4 pick min/max doc lengths from
    exactly this distribution). approx_quantile's sketch merge is
    partition-order-dependent; filters built on it drift run to run.

    Exactness without a global sort: token counts are a SMALL-CARDINALITY
    long (distinct values bounded by the max document length, never by
    corpus size), so the full histogram — groupBy(n_tokens) count — is a
    one-exchange aggregation whose result is collected to the driver
    (bounded rows), cumulated there, and each quantile read off as the
    value at rank ceil(q·N) (lower-rounding "inverted CDF" definition,
    the same one DuckDB's quantile_disc uses). Returns (q, n_tokens),
    one row per requested quantile.
    """
    # NULL text → NULL count, dropped here (and by the oracle's matching
    # WHERE): a None in the histogram breaks the driver-side sort, and
    # "no text" is absence from the length distribution, not length 0
    hist = sorted(
        (r.v, r.c)
        for r in docs.select(
            ws_token_count(F.col(text_col)).cast("long").alias("v")
        )
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    from fractions import Fraction

    n = sum(c for _, c in hist)
    if n == 0:
        # empty (or all-NULL-text) corpus: no length distribution exists —
        # return zero rows, matching the oracle's rank join (a row per
        # quantile with n_tokens=NULL would be a Spark/oracle mismatch)
        return docs.sparkSession.createDataFrame([], "q double, n_tokens long")
    out, cum, i = [], 0, 0
    for q in sorted(qs):
        # exact ceil(q·N): Fraction(str(q)) reads the decimal as written —
        # IEEE ceil(0.1 * 500) is 51, not 50 (same bug class as
        # curation.mixture_targets); the oracle uses DECIMAL for the same
        # reason
        fq = Fraction(str(q)) * n
        rank = max(1, -(-fq.numerator // fq.denominator))
        while i < len(hist) and cum + hist[i][1] < rank:
            cum += hist[i][1]
            i += 1
        out.append((float(q), int(hist[i][0]) if i < len(hist) else None))
    return docs.sparkSession.createDataFrame(out, "q double, n_tokens long")


TFIDF_SCALE = 100_000


def tfidf_similar_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    max_df: int = 1_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """All document pairs (a<b) with tf-idf cosine >= threshold, via a
    df-pruned INVERTED INDEX — the classic sparse-vector similarity join
    (term-partitioned posting lists), never an all-pairs product.

    Weights are exact integers so every cross-row sum is order-free (long
    addition is associative; float groupBy sums are not — the same
    bit-stability contract as lm_surprisal/distinctive_terms):
    w = tf * (TFIDF_SCALE div df). The linear integer idf diverges from
    textbook ln(N/df) deliberately (cross-engine ln is not bit-stable);
    N cancels out of cosine entirely, so it is dropped. Magnitudes:
    w <= tf * 1e5, dot-product partials <= ~1e17 — inside long range.

    Plan shape and why it scales:
      * terms with df > max_df are pruned BEFORE the self-join — posting
        lists are the join blocks, so cost is sum(df^2) over surviving
        terms; unpruned stopword lists are the quadratic blowup. This is
        the standard recall contract of df-pruned indexes (ubiquitous
        terms carry ~no cosine signal; documented, not silent — the df
        relation is emitted by the same aggregation).
      * the df join is a SHUFFLE equi-join on term, NOT a broadcast: the
        pruned vocabulary keeps the rare-term long tail (hashes, typos) —
        unbounded at web scale, unlike the driver-sized codebooks
        elsewhere. The term exchange it costs is the same partitioning
        the posting-list self-join needs anyway, so it adds no exchange
        the plan didn't already require.
      * norms fold per doc from exact integer sum-of-squares, one
        (doc_id) exchange; the pair dot product is one (term) exchange +
        one (doc_a, doc_b) exchange with map-side partial sums.
      * residual hot terms under the cap are AQE-skew-split.

    Returns (doc_a, doc_b, dot, cosine).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if max_df_frac is not None:
        # fractional cap resolved INSIDE the plan: df <= floor(frac·N)
        # ⟺ df·den <= num·N for integer df (exact — no float rounding,
        # no driver-side count() job at plan-construction time; the
        # one-row corpus count broadcasts into the df filter)
        from fractions import Fraction

        fr = Fraction(str(max_df_frac))
        ncorp = F.broadcast(docs.agg(F.count(F.lit(1)).alias("_ncorp")))
        pruned = dfreq.crossJoin(ncorp).where(
            F.col("df") * F.lit(fr.denominator)
            <= F.lit(fr.numerator) * F.col("_ncorp")
        ).select("term", "df")
    else:
        pruned = dfreq.where(F.col("df") <= max_df)
    w = (
        tf.join(pruned, "term")
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.expr(f"{TFIDF_SCALE} div df")).cast("long").alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("ssq")
    )
    a = w.select(F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("ssq").alias("_sa"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("ssq").alias("_sb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "dot",
            (
                F.col("dot")
                / F.sqrt(F.col("_sa").cast("double") * F.col("_sb").cast("double"))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25-style relevance of every document against a fixed query-term
    set — the retrieval-grade ranking a corpus pipeline uses for quality
    probes and eval-set mining (complements tfidf_similar_pairs, which
    ranks doc-doc, and distinctive_terms, which ranks term-doc).

    Determinism contract (the lm_surprisal/distinctive_terms argument):
    the classic log-idf is replaced by its LINEAR core
    (N − df + 0.5) / (df + 0.5) — the same per-term monotone ordering,
    but every input is an integer-derived double and the whole score is
    a chain of exactly-rounded IEEE +,*,/ — bit-identical on any engine
    and any row order, where ln() differs in the last ulp between libm
    implementations. Documented divergence: absolute scores are NOT
    textbook-BM25 comparable across terms with very different df.

    Scale shape: terms are a literal broadcast; per-doc tf comes from the
    one tokenize pass (array HOFs, row-local); N and df are one tiny
    global aggregate crossJoined back (AQE broadcasts the one-row side).
    No shuffle carries corpus text.

    Returns (doc_id, score) for docs matching ≥1 term, score descending
    ties broken by doc_id via the caller's sort.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        # an empty query has no defined ranking; fail loudly instead of
        # letting `sum(() ) > 0` hand DataFrame.where a Python bool
        raise ValueError("bm25_scores: query_terms must be non-empty")
    # tokens materialize once per row: the raw tokenizer expression would
    # otherwise re-evaluate for every per-term filter reference
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")

    def _eq(term: str):
        # one-arg closure: a two-arg lambda (x, t=term) would make Spark
        # pass the ELEMENT INDEX as the second argument, silently shadowing
        # the term
        return lambda x: x == F.lit(term)

    base = toked.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, _eq(t))).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl") / F.col("_n")
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        idf = (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        sat = (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * (F.col("dl") / avgdl))
        )
        score = score + idf * sat
    return (
        j.withColumn("score", score)
        .where(sum(F.col(f"_tf{i}") for i in range(len(terms))) > 0)
        .select("doc_id", "score")
    )
