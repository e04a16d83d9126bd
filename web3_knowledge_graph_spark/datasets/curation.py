"""Corpus-curation operators a web-scale training-data pipeline needs on
top of dedup/similarity/textstats: PII scan + redaction, C4-style line
filtering, deterministic per-host downsampling, and a global token-budget
sample.

These are beyond-reference surface (the reference KG pipeline has no
curation stage); the designs follow the published web-corpus recipes —
C4 (Raffel et al. 2020, §2.2 line rules), Gopher (Rae et al. 2021, §A1),
RefinedWeb (Penedo et al. 2023) — re-expressed as native Spark column
expressions so the row path stays inside whole-stage codegen.

Scale notes per operator:
  * PII scan/redact — per-row regexp only; embarrassingly parallel,
    no shuffle, no Python.
  * C4 line filter — array higher-order functions over split lines.
    The HOF runs interpreted (no codegen), but the alternative
    (posexplode -> filter -> groupBy(doc) -> re-join) shuffles the FULL
    corpus text; at 100 TB the per-row interpreted lambda is far cheaper
    than a corpus-wide exchange, the opposite call from dict-mentions
    (functions/mentions.py) where a codegen'd regex alternation existed.
  * host downsample — one shuffle on the host key (row_number window);
    the deterministic md5 order makes reruns/retries byte-stable.
  * token-budget sample — a global prefix sum computed scale-correctly in
    two passes: per-bucket subtotals (256 md5-prefix buckets) are
    collected to the driver (bounded: exactly <=256 rows at any corpus
    size), turned into broadcast offsets, then a window partitioned BY
    BUCKET adds within-bucket running sums. No global sort, no single
    reducer; the same plan holds at 10^12 docs.
  * line dedup — lines are aggregated by content (one partial-agg count
    shuffle), only the duplicated subset joins back (build side =
    boilerplate lines, tiny relative to the corpus), and each doc is
    reassembled with one doc_id-keyed aggregation. Never quadratic.
  * decontamination — the benchmark side is small by definition (eval
    suites are KB-MB against a TB corpus), so its distinct shingles are
    an explicit broadcast; the corpus side is one scan + one doc_id agg
    of the (tiny) hit set. The corpus never shuffles its text.

All regex patterns are restricted to the Java-regex / RE2 intersection
(no lookaround, no backreference) so the DuckDB oracles run the literal
same patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col

# PII patterns (Java + RE2 compatible).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9][0-9 ]{6,14}[0-9]"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

# C4 §2.2 line rules (terminal punctuation; >=5 words; no "javascript").
C4_TERMINAL_RE = "[.!?\"']$"
C4_MIN_WORDS = 5


def pii_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII counts (emails, phone numbers, IPv4 addresses) and
    a has_pii flag — the audit pass a corpus runs before release.
    Pure regexp_extract_all projections; no shuffle.
    Returns (doc_id, n_emails, n_phones, n_ipv4, has_pii)."""
    text = F.col(text_col)
    n_em = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).cast("long")
    n_ph = F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)).cast("long")
    n_ip = F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        n_ip.alias("n_ipv4"),
        ((n_em > 0) | (n_ph > 0) | (n_ip > 0)).alias("has_pii"),
    )


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Replace every email/phone/IPv4 occurrence with a typed placeholder
    (applied in that order — placeholders contain no digits, so later
    passes cannot re-match earlier replacements).
    Returns (doc_id, clean_text)."""
    clean = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, PHONE_RE, "<PHONE>")
    clean = F.regexp_replace(clean, IPV4_RE, "<IP>")
    return docs.select(F.col(id_col).alias("doc_id"), clean.alias("clean_text"))


def c4_line_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation, have >= 5 words, and do not
    mention "javascript"; drop the whole document when it contains
    "lorem ipsum" or a curly brace, or when no line survives.
    (C4's >=3-sentence doc rule is relaxed to >=1 kept line — the
    threshold is a constant, not a structural difference.)

    Emits EVERY input doc with its keep decision (callers filter on
    keep_doc) so the decision itself is auditable.
    Returns (doc_id, n_lines, n_kept, keep_doc, kept_text)."""
    text = F.col(text_col)
    # \r?\n: CRLF text must not leave \r on each line — Java's $ matches
    # before a trailing \r while RE2's (the DuckDB oracle) does not, so
    # a bare \n split would silently break cross-engine parity AND embed
    # stray \r bytes in kept_text
    lines = F.split(text, "\r?\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike(C4_TERMINAL_RE)
        & (F.size(F.split(F.trim(l), " +")) >= C4_MIN_WORDS)
        & ~F.lower(l).contains("javascript"),
    )
    n_kept = F.size(kept).cast("long")
    keep_doc = (
        (n_kept >= 1)
        & ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept"),
        keep_doc.alias("keep_doc"),
        F.when(keep_doc, F.array_join(kept, "\n")).alias("kept_text"),
    )


def host_downsample(
    docs: DataFrame,
    cap: int,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-host quota sampling: keep at most `cap` docs per
    host, chosen by md5(doc_id) order — a stable pseudo-random draw that
    is identical across reruns and task retries (RefinedWeb-style
    over-represented-host control). One shuffle on the host key; a
    hot host costs one window partition, never a cross-join.
    Returns (source, doc_id, pick) with pick in [1, cap]."""
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(key_col).orderBy(order, F.col(id_col))
    return (
        docs.select(F.col(key_col).alias("source"), F.col(id_col).alias("doc_id"))
        .withColumn("pick", F.row_number().over(w))
        .where(F.col("pick") <= cap)
    )


def _bucket_subtotals(
    base: DataFrame, value_col: str, group_cols: tuple[str, ...] = ()
) -> list:
    """The pass-1 (group, md5-prefix-bucket) subtotal rows of
    _bucketed_running_total, exposed so a caller that ALSO needs per-group
    totals (unimax_sample) can derive them from the same collect instead
    of paying a second corpus aggregation scan."""
    return (
        base.withColumn("_bucket", F.substring("_key", 1, 2))
        .groupBy(*group_cols, "_bucket")
        .agg(F.sum(value_col).cast("long").alias("_s"))
        .collect()
    )


def _bucketed_running_total(
    base: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    subtotals: list | None = None,
) -> DataFrame:
    """Distributed prefix sum of ``value_col`` in (group_cols, md5-key)
    order WITHOUT a single-reducer global sort — the shared machinery of
    token_budget_sample and mixture_sample.

    ``base`` must carry ``doc_id`` and ``_key`` (the md5 order key).
    Pass 1 aggregates per (group, 256 md5-prefix buckets) subtotals —
    collected to the driver (bounded: |groups| × 256 rows at any corpus
    size) and turned into per-group cumulative offsets. Pass 2 broadcasts
    the offsets back and windows WITHIN each bucket, so running total =
    bucket offset + within-bucket cumsum, with 256-way parallelism per
    group. Adds column ``_running``; ordering is (_key, doc_id), and
    because _bucket is a prefix of _key, per-bucket order + offsets ==
    the global per-group order.
    """
    spark = base.sparkSession
    if subtotals is None:
        subtotals = _bucket_subtotals(base, value_col, group_cols)
    base = base.withColumn("_bucket", F.substring("_key", 1, 2))
    gcols = list(group_cols)
    by_grp: dict[tuple, list] = {}
    for r in subtotals:
        by_grp.setdefault(tuple(r[g] for g in gcols), []).append(
            (r["_bucket"], r["_s"])
        )
    offsets = []
    for gkey, rows in by_grp.items():
        running = 0
        for b, s in sorted(rows):
            offsets.append((*gkey, b, running))
            # a NULL subtotal (every value_col in the bucket NULL, e.g.
            # NULL-text docs whose token count is NULL) contributes 0,
            # mirroring F.sum's null-skip inside the window below
            running += s or 0
    schema = ", ".join(
        [f"{g} string" for g in gcols] + ["_bucket string", "_offset long"]
    )
    off = F.broadcast(spark.createDataFrame(offsets, schema))
    w = (
        Window.partitionBy(*gcols, "_bucket")
        .orderBy("_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(off, gcols + ["_bucket"])
        .withColumn("_running", F.sum(value_col).over(w) + F.col("_offset"))
    )


def mixture_targets(weights: dict[str, float], budget: int) -> dict[str, int]:
    """floor(weights[g] · budget) computed EXACTLY: Fraction(str(w))
    reads the weight as the decimal the caller wrote, so 0.58 × 50 is
    29, not int(28.999999999999996) — IEEE double truncation would
    silently short a group by one doc. Shared by the operator and the
    DuckDB oracle so both sides agree by construction."""
    from fractions import Fraction

    return {g: int(Fraction(str(w)) * budget) for g, w in weights.items()}


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic data-mixture sampling: draw a ``budget``-doc corpus
    whose group composition matches target ``weights`` (the mixing-ratio
    step of every LLM training-data recipe — e.g. 40% en / 20% de / …).

    Per group g the target is floor(weights[g] · budget) docs (exact
    decimal arithmetic — see mixture_targets), drawn in md5(doc_id)
    order — a stable pseudo-random draw, identical across reruns and task
    retries (same contract as host_downsample). A group with fewer docs
    than its target contributes everything it has (under-fill is visible
    in the output counts, never silently rebalanced — remixing weights is
    the caller's policy decision).

    Plan: _bucketed_running_total ranks each group in md5 order with
    256-way parallelism — equivalent to ROW_NUMBER() OVER (PARTITION BY
    group ORDER BY md5) but a 10^11-doc group never hits a single-reducer
    sort. Returns (doc_id, grp, grp_rank) for the kept rows.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.md5(F.col(id_col).cast("string")).alias("_key"),
        F.lit(1).cast("long").alias("_one"),
    ).where(F.col("grp").isin(list(weights)))
    targets = F.create_map(
        *[
            x
            for g, t in sorted(mixture_targets(weights, budget).items())
            for x in (F.lit(g), F.lit(t).cast("long"))
        ]
    )
    return (
        _bucketed_running_total(base, "_one", group_cols=("grp",))
        .withColumn("grp_rank", F.col("_running"))
        .where(F.col("grp_rank") <= F.element_at(targets, F.col("grp")))
        .select("doc_id", "grp", "grp_rank")
    )


def unimax_budgets(
    group_totals: DataFrame, budget: int, epoch_cap: int
) -> DataFrame:
    """UniMax per-language budget allocation (Chung et al. 2023,
    arXiv:2304.09151 Alg. 1): distribute a total token ``budget`` across
    languages as uniformly as possible, capping each language at
    ``epoch_cap`` epochs of its own corpus — the principled alternative to
    temperature sampling for multilingual pretraining mixes.

    Input ``group_totals(grp, total)`` (total = the group's corpus token
    count); returns (grp, total, cap, alloc) with cap = epoch_cap·total.

    The paper's sequential loop (ascending corpus size, each language gets
    min(cap, remaining/left)) is restated as its closed-form waterfill in
    EXACT INTEGER arithmetic so Spark and the DuckDB oracle agree bit-for-
    bit: sorted by (cap, grp) ascending with prefix sums, row i (of n) is
    CAPPED iff cap_i·(n−i+1) ≤ budget − prefix_{i−1} (capped rows form a
    prefix — standard waterfill monotonicity); the spill
    S = budget − Σ capped caps divides among the m uncapped rows as
    S div m, with the S mod m remainder going one token each to the first
    uncapped rows in the same order. Every uncapped row's cap exceeds
    base+1 by construction, Σ alloc = min(budget, Σ caps), and an
    over-generous budget leaves the shortfall VISIBLE (every row capped),
    never silently rebalanced — the mixture_sample under-fill convention.

    Scale: the window runs over the LANGUAGE DIMENSION (hundreds of rows
    at internet scale), not the corpus — the single-partition sort is
    bounded by |languages| regardless of corpus size.
    """
    b = F.lit(int(budget)).cast("long")
    w_all = Window.orderBy("cap", "grp")
    w_full = w_all.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # ONE window pass over the language dimension: the capped-set scalars
    # (_k, _csum) come from full-partition window sums on the same sort,
    # not a separate agg + crossJoin — that shape re-derived the whole
    # input subtree twice (at scale: two extra corpus scans per consumer).
    ranked = (
        group_totals.select(
            "grp",
            F.col("total").cast("long").alias("total"),
            (F.lit(int(epoch_cap)).cast("long") * F.col("total")).alias("cap"),
        )
        .withColumn("_i", F.row_number().over(w_all))
        .withColumn(
            "_prefix",
            F.coalesce(
                F.sum("cap").over(w_all.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(w_full))
        .withColumn(
            "_capped",
            F.col("cap") * (F.col("_n") - F.col("_i") + 1) <= b - F.col("_prefix"),
        )
        .withColumn(
            "_k",
            F.coalesce(
                F.sum(F.when(F.col("_capped"), 1).cast("long")).over(w_full),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "_csum",
            F.coalesce(
                F.sum(F.when(F.col("_capped"), F.col("cap"))).over(w_full),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("_spill", b - F.col("_csum"))
        # when every row is capped m = 0 and no row reaches the div/mod
        # branches below, but ANSI mode (Spark 4 default) evaluates them —
        # clamp the divisor to 1 (the clamped value is never selected)
        .withColumn(
            "_m",
            F.greatest(
                (F.col("_n") - F.col("_k")).cast("long"),
                F.lit(1).cast("long"),
            ),
        )
    )
    base = F.expr("_spill div _m")
    extra = F.col("_spill") % F.col("_m")
    return ranked.select(
        "grp",
        "total",
        "cap",
        F.when(F.col("_capped"), F.col("cap"))
        .when(F.col("_i") - F.col("_k") <= extra, base + 1)
        .otherwise(base)
        .cast("long")
        .alias("alloc"),
    )


def unimax_sample(
    docs: DataFrame,
    budget: int,
    epoch_cap: int = 2,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """UniMax corpus draw: allocate the token ``budget`` across languages
    with unimax_budgets, then realize each language's allocation as
    f = alloc div total FULL EPOCHS of every doc plus a PARTIAL epoch —
    the md5(doc_id)-ordered prefix whose running token total stays within
    r = alloc mod total (the token_budget_sample walk, per group; the
    partial epoch exists only when r > 0). A doc's epoch count depends
    only on its group's totals and its own hash position — deterministic
    across reruns, retries, and partitionings.

    Plan: the corpus is scanned exactly TWICE — the two-pass
    _bucketed_running_total contract shared with token_budget_sample.
    Per-language totals fall out of pass 1's already-collected (group,
    bucket) subtotals (driver-side sum over ≤ |languages|·256 rows), so
    the budget dimension costs NO extra corpus scan; the language-
    dimension window of unimax_budgets runs over a |languages|-row
    createDataFrame and broadcast-joins back. The corpus text itself
    never shuffles.

    Returns (doc_id, grp, n_tokens, n_epochs) for docs with n_epochs ≥ 1.
    """
    from .textstats import ws_token_count

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        # NULL text = 0 tokens, the token_budget_sample convention
        F.coalesce(ws_token_count(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_key"),
    ).where(
        # a NULL group can never appear in the output (the budget equi-join
        # drops NULL keys), so it must not consume waterfill budget either —
        # exclude up front (oracle carries the matching IS NOT NULL), which
        # also keeps the driver-side per-group sum sortable
        F.col("grp").isNotNull()
    )
    sub = _bucket_subtotals(base, "n_tokens", ("grp",))
    per_grp: dict[str, int] = {}
    for r in sub:
        per_grp[r["grp"]] = per_grp.get(r["grp"], 0) + (r["_s"] or 0)
    totals = docs.sparkSession.createDataFrame(
        sorted(per_grp.items()), "grp string, total long"
    )
    budgets = unimax_budgets(totals, budget, epoch_cap).select(
        "grp",
        F.when(F.col("total") > 0, F.expr("alloc div total"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_f"),
        F.when(F.col("total") > 0, F.col("alloc") % F.col("total"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_r"),
    )
    ranked = _bucketed_running_total(
        base, "n_tokens", group_cols=("grp",), subtotals=sub
    )
    out = ranked.join(F.broadcast(budgets), "grp").withColumn(
        "n_epochs",
        (
            F.col("_f")
            + F.when(
                (F.col("_r") > 0) & (F.col("_running") <= F.col("_r")), 1
            ).otherwise(0)
        ).cast("long"),
    )
    return out.where(F.col("n_epochs") >= 1).select(
        "doc_id", "grp", "n_tokens", "n_epochs"
    )


def hash_split_cuts(fractions: dict[str, float]) -> tuple[list[str], list[int]]:
    """(sorted split names, cumulative integer cuts over the 2^32 md5
    space), computed with exact decimal arithmetic. Shared by the operator
    and the DuckDB oracle so both sides agree by construction (the
    mixture_targets convention)."""
    from fractions import Fraction

    assert sum(Fraction(str(f)) for f in fractions.values()) == 1
    names = sorted(fractions)
    space = 1 << 32
    cuts, acc = [], Fraction(0)
    for n in names[:-1]:
        acc += Fraction(str(fractions[n])) * space
        cuts.append(int(acc))
    return names, cuts


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: the first 8 hex chars of
    md5(doc_id) land each doc in a 2^32-bucket space, carved into
    contiguous ranges per split (splits processed in sorted-name order;
    integer cuts computed with exact decimal arithmetic — the
    mixture_targets IEEE-truncation lesson; the rounding slack, < 1
    bucket per split, goes to the last range). Membership depends only on
    the doc's own id: stable under reruns, retries, corpus growth, and
    re-partitioning — a doc never migrates between splits when new data
    arrives, which is THE property a random split lacks.
    Returns (doc_id, split). Pure map, zero shuffle."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    names, cuts = hash_split_cuts(fractions)
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    expr = F.lit(names[-1])
    for n, cut in reversed(list(zip(names[:-1], cuts))):
        expr = F.when(h < cut, F.lit(n)).otherwise(expr)
    return docs.select(F.col(id_col).alias("doc_id"), expr.alias("split"))


def sequence_pack(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): walk the corpus in md5(doc_id) order, concatenate token
    counts, and cut fixed ``seq_len`` windows — each doc lands at a
    deterministic (pack_id, offset) with docs spanning pack boundaries,
    exactly like a tokenizer pipeline packing examples into training
    sequences.

    Plan: one _bucketed_running_total pass (256-way-parallel prefix sum —
    no global sort), then pack_id/offset are pure row-local arithmetic on
    the running total. Deterministic across reruns, retries, and
    parallelism; replayable as a single SQL window for the oracle.
    Returns (doc_id, n_tokens, pack_id, offset) for every doc with
    n_tokens > 0; pack_id = floor(start / seq_len), offset = start mod
    seq_len, where start is the doc's first token position in the global
    concatenation.
    """
    from .textstats import ws_token_count

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        ws_token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_key"),
    ).where(F.col("n_tokens") > 0)  # projected column: tokenize ONCE per row
    # integer DIV, not floor(double /): token positions at 10^12-doc scale
    # exceed 2^53, where double division silently loses exactness
    return (
        _bucketed_running_total(base, "n_tokens")
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"CAST((_running - n_tokens) DIV {int(seq_len)} AS BIGINT)").alias(
                "pack_id"
            ),
            F.pmod(F.col("_running") - F.col("n_tokens"), F.lit(int(seq_len)))
            .cast("long")
            .alias("offset"),
        )
    )


def token_budget_sample(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic token-budget subset: walk the corpus in md5(doc_id)
    order and keep docs while the running whitespace-token total stays
    within `budget` ("give me a 10B-token sample" without a global sort).

    Two-pass distributed prefix sum (_bucketed_running_total): equivalent
    to SUM() OVER (ORDER BY md5 key) but with 256-way parallelism and no
    single-reducer global sort.
    Returns (doc_id, n_tokens, cum_tokens) for the kept prefix."""
    from .textstats import ws_token_count

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        # NULL text counts as 0 tokens: the doc stays in the walk and
        # consumes no budget (and cannot NULL-poison the bucket
        # subtotals of the prefix sum)
        F.coalesce(ws_token_count(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_key"),
    )
    return (
        _bucketed_running_total(base, "n_tokens")
        .withColumn("cum_tokens", F.col("_running"))
        .where(F.col("cum_tokens") <= budget)
        .select("doc_id", "n_tokens", "cum_tokens")
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide duplicated-line removal (RefinedWeb §3.2 / CCNet-style):
    a line that appears verbatim in >= ``min_docs`` distinct documents is
    template/boilerplate text (navigation, cookie banners, footers) and is
    struck from every document that contains it.

    Plan: posexplode lines -> count distinct docs per line (partial-agg
    shuffle on the line content) -> keep only the duplicated subset (small:
    boilerplate lines, not the corpus) -> left-join it back onto the
    exploded lines (AQE broadcasts the duplicated subset) -> reassemble
    each doc with one doc_id-keyed aggregation, restoring original line
    order via the carried position. Cost is linear in total lines; the
    hottest line keys are collapsed map-side by the partial aggregation.

    Returns (doc_id, n_lines, n_dropped, clean_text) for EVERY input doc
    (drop decisions stay auditable; callers filter/replace text).
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        # \r?\n: same CRLF rationale as c4_line_filter
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias("pos", "line"),
    )
    # blank lines are STRUCTURE (paragraph separators), not boilerplate
    # content — without the guard any two docs with a blank paragraph
    # break would strike every blank line corpus-wide and collapse
    # paragraph structure everywhere
    dups = (
        lines.select("line", "doc_id")
        .where(F.length("line") > 0)
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_docs)
        .select("line", F.lit(True).alias("_dup"))
    )
    tagged = lines.join(dups, "line", "left")
    kept_struct = F.when(
        ~F.coalesce(F.col("_dup"), F.lit(False)),
        F.struct(F.col("pos"), F.col("line")),
    )
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.coalesce(F.col("_dup"), F.lit(False)).cast("long"))
        .cast("long")
        .alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.filter(
                        F.collect_list(kept_struct), lambda s: s.isNotNull()
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination by word k-gram overlap (GPT-3 appendix C /
    Gopher §A2 style, where k=13): a training document sharing any length-k
    word n-gram with an eval-suite document is flagged so it can be dropped
    before training.

    Plan: the benchmark is small by definition, so its distinct k-shingles
    are collected into an explicit broadcast; the corpus side is one scan
    producing distinct per-doc shingles (dedup.shingle_array, the same
    shingling MinHash uses), an inner join against the broadcast, and one
    doc_id-keyed count of the (tiny) hit set, left-joined back so every
    input doc is emitted with its decision. The corpus text itself never
    shuffles.

    Returns (doc_id, n_hits, contaminated) for EVERY input doc.
    """
    from .dedup import shingles

    bench_grams = F.broadcast(
        shingles(benchmark, k=k, id_col=id_col, text_col=text_col)
        .select("shingle")
        .distinct()
    )
    hits = (
        shingles(docs, k=k, id_col=id_col, text_col=text_col)
        .join(bench_grams, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    min_docs: int = 3,
    k: int = 5,
    budget: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full curation recipe COMPOSED into one DAG — the order real
    corpus pipelines use (C4 -> RefinedWeb -> GPT-3 app. C -> budget):

      1. C4 line filtering (c4_line_filter) — doc survives on keep_doc
      2. exact dedup over the C4-kept text (dedup.exact_dedup) — only the
         canonical doc of each fingerprint group continues
      3. corpus-wide line dedup (line_dedup, >= min_docs docs share a line)
      4. benchmark decontamination (decontaminate, word k-grams vs the
         ``benchmark`` relation's text)
      5. deterministic token-budget selection (token_budget_sample)

    Emits ONE AUDIT ROW PER INPUT DOC — the decision of every stage is
    visible (dropped docs carry -1 sentinels past their exit stage), so the
    pipeline's yield is queryable at each step, not just the final subset.

    Scale: each stage is the already-audited linear plan (PLANS.md); the
    stages hand off (doc_id, text) relations and the final audit assembly
    is doc_id-keyed left joins, co-partitioned after the first exchange.
    Returns (doc_id, c4_keep, is_canonical, n_dropped_lines, contaminated,
    selected, n_tokens, cum_tokens).
    """
    from .dedup import exact_dedup

    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    # benchmark gets the same renaming — decontaminate reads its text
    # under the DEFAULT column names, so a caller's custom id_col/text_col
    # must not leak through to it
    bench = benchmark.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    # Every stage output below feeds BOTH the next stage and the final audit
    # join — without a materialization boundary the audit's six-way fan-out
    # would recompute stage i's whole upstream chain once per downstream
    # branch (measured 30s vs 8s at sf0.1). localCheckpoint pins each stage
    # to one computation; a persistent deployment would write each handoff
    # to a checkpoint table instead (plans/pipeline.py does exactly that).
    c4 = c4_line_filter(base).localCheckpoint()
    s1 = (
        c4.where(F.col("keep_doc"))
        .select("doc_id", F.col("kept_text").alias("text"))
    )
    ex = exact_dedup(s1).localCheckpoint()
    s2 = s1.join(
        ex.where(~F.col("is_dup")).select("doc_id"), "doc_id"
    )
    ld = line_dedup(s2, min_docs=min_docs).localCheckpoint()
    s3 = ld.select("doc_id", F.col("clean_text").alias("text"))
    dc = decontaminate(s3, bench, k=k).localCheckpoint()
    s4 = s3.join(dc.where(~F.col("contaminated")).select("doc_id"), "doc_id")
    tb = token_budget_sample(s4, budget=budget)
    return (
        base.select("doc_id")
        .join(c4.select("doc_id", "keep_doc"), "doc_id", "left")
        .join(
            ex.select("doc_id", (~F.col("is_dup")).alias("is_canonical")),
            "doc_id",
            "left",
        )
        .join(ld.select("doc_id", "n_dropped"), "doc_id", "left")
        .join(dc.select("doc_id", "contaminated"), "doc_id", "left")
        .join(tb.select("doc_id", "n_tokens", "cum_tokens"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("keep_doc", F.lit(False)).alias("c4_keep"),
            F.coalesce("is_canonical", F.lit(False)).alias("is_canonical"),
            F.coalesce("n_dropped", F.lit(-1)).cast("long").alias("n_dropped_lines"),
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
            F.col("cum_tokens").isNotNull().alias("selected"),
            F.coalesce("n_tokens", F.lit(-1)).cast("long").alias("n_tokens"),
            F.coalesce("cum_tokens", F.lit(-1)).cast("long").alias("cum_tokens"),
        )
    )


def overlapping_chunks(
    docs: DataFrame,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document overlapping token windows — the long-document
    counterpart to ``sequence_pack`` (which packs across docs): each doc
    splits into chunks of ``size`` tokens every ``stride`` tokens
    (overlap = size − stride), the layout long-context training and
    retrieval pipelines feed downstream. The final partial window is kept
    (a tail shorter than ``size`` is still data); a doc shorter than
    ``size`` yields exactly one chunk.

    Returns (doc_id, chunk_id, n_tokens, chunk_text): chunk_id is the
    0-based window index — (doc_id, chunk_id) is the deterministic
    global key.

    Pure map over the corpus: tokenization, window arithmetic, and the
    slice/join all happen row-locally inside codegen — zero shuffles, so
    the operator scales with scan bandwidth alone.
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    # tokens materialize as a real column first (dedup.shingle_array_of:
    # a raw tokenizer expression inside the lambda re-evaluates per window)
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    # number of windows: 1 + ceil(max(0, n - size) / stride); short docs → 1
    n_win = F.lit(1) + F.ceil(
        F.greatest(n - size, F.lit(0)) / F.lit(stride)
    ).cast("long")
    starts = F.sequence(F.lit(0), (n_win - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.slice(toks, s + 1, size).alias("w"),
        ),
    )
    return toked.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.w").alias("n_tokens"),
        F.concat_ws(" ", "c.w").alias("chunk_text"),
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    threshold_micro: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weighting for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): fit hashed-bigram bag distributions on a small
    ``target`` corpus (the distribution you want more of) and on the raw
    ``docs`` corpus, then weight every raw document by how target-like
    its bigrams are — the per-bucket likelihood ratio p_target/p_raw
    summed over the document's bigram occurrences.

    DIVERGENCES from the paper, on purpose and in the repo's established
    exact-arithmetic convention (see textstats.lm_surprisal, bm25_scores):

      * per-bucket weight is the add-1-smoothed COUNT ratio in exact
        integer micro-units — lr_micro = (1e6 * (c_target + 1)) div
        (c_raw + 1) — not exp(log p - log q). The dropped normalizer
        (n_raw + B) / (n_target + B) is bucket-independent: it rescales
        every document's weight by the same positive constant, so any
        top-k or threshold selection is invariant (rescale the threshold
        accordingly). Cross-engine ln/exp are not bit-stable; integer
        div is, so the oracle can value-hash the result.
      * selection is a deterministic threshold on the mean per-bigram
        weight (``keep``), not Gumbel-noised resampling — same
        determinism choice as mixture_sample/hash_split.

    Plan shape at 100 TB: both distributions are n_buckets-bounded
    partial aggregations (map-side combine; the exchange carries at most
    B rows per partition). The scoring pass joins the corpus's exploded
    bigram buckets against an explicitly broadcast B-row dimension and
    folds with one doc_id-keyed exact long sum — the corpus text itself
    never shuffles, and the raw-side fit + scoring are two scans of the
    corpus with no materialization between them. Integer bound: the
    micro-unit numerator needs c_target < 2^63/1e6 per bucket (~9.2e12
    bigrams in ONE bucket) — the target is small by construction in DSIR
    (a trusted subset), so the bound is never near at sane B.

    Returns one row per input doc: (doc_id, n_bigrams, weight_micro,
    mean_weight, keep); docs with < 2 tokens get zero weight and
    keep = false. With ``threshold_micro=None`` (the default) no
    selection is applied: keep is true for every doc with at least one
    bigram — pass a threshold to actually drop documents.
    """
    from .dedup import _hash60

    def bigram_buckets(df: DataFrame) -> DataFrame:
        toked = df.select(
            F.col(id_col).alias("doc_id"),
            tokens_col(F.col(text_col)).alias("_toks"),
        )
        toks = F.col("_toks")
        grams = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array())
        return toked.select(
            "doc_id",
            F.explode(grams).alias("bg"),
        ).select("doc_id", (_hash60(F.col("bg")) % n_buckets).alias("bucket"))

    raw_counts = (
        bigram_buckets(docs)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c_raw"))
    )
    tgt_counts = (
        bigram_buckets(target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c_tgt"))
    )
    dim = F.broadcast(
        raw_counts.join(tgt_counts, "bucket", "left").select(
            "bucket",
            F.expr(
                "CAST(1000000 * (coalesce(c_tgt, 0) + 1) AS BIGINT)"
                " div CAST(c_raw + 1 AS BIGINT)"
            ).alias("lr_micro"),
        )
    )
    scored = (
        bigram_buckets(docs)
        .join(dim, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("lr_micro").cast("long").alias("weight_micro"),
        )
    )
    # threshold_micro=None means NO selection was requested: every
    # scoreable doc keeps (callers read the weights and select
    # themselves). Only an explicit threshold drops documents — the
    # previous all-False default was indistinguishable from "every doc
    # failed the threshold".
    keep = (
        F.lit(True)
        if threshold_micro is None
        else (F.col("weight_micro") >= F.lit(threshold_micro) * F.col("n_bigrams"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("weight_micro", F.lit(0)).cast("long").alias("weight_micro"),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                F.col("weight_micro") / (F.col("n_bigrams") * F.lit(1_000_000.0)),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_weight"),
            F.coalesce(
                keep & (F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0), F.lit(False)
            ).alias("keep"),
        )
    )
