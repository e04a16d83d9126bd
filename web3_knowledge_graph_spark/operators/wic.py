"""WIC ("wallet in context") conditions→contexts tree over behavioral data.

Reference: each WIC analyzer declares a nested conditions tree whose leaves
are weighted contexts backed by one rule query each
(/root/reference/pipelines/analytics/wic/traders/analyze.py:12-92 declares
the tree; WICAnalysis.py:22-35 walks it; interests/cyphers.py:10-80 are
example rule queries; ~120 rule sites across 9 analyzer categories). The
engine restates the tree as data + pure DataFrame rule builders: every leaf
produces (entity_id, condition, context, weight) rows; the union is the
labels relation; mark-sweep refresh becomes an idempotent overwrite.

The concrete tree below mirrors the SHAPE of the reference's trader tree
(condition groups → weighted leaf contexts) over the driver's events table;
rule semantics are simple behavioral predicates so the DuckDB oracle can
replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (condition, context, weight, kind, param) — the declarative tree.
# kind ∈ {type_count: ≥param events of the context's event type,
#         type_value: summed cents of that type > param,
#         active_days: ≥param distinct active days,
#         burst: ≥param events inside one hour}
WIC_TREE = [
    ("engagement", "clicker", 1.0, "type_count", ("click", 10)),
    ("engagement", "viewer", 0.5, "type_count", ("view", 10)),
    ("engagement", "chronically_online", 2.0, "active_days", (None, 20)),
    ("spending", "buyer", 2.0, "type_count", ("purchase", 5)),
    ("spending", "whale", 4.0, "type_value", ("purchase", 50000)),
    ("reliability", "error_prone", 1.5, "type_count", ("error", 8)),
    ("reliability", "burst_user", 1.0, "burst", (None, 5)),
    ("growth", "new_signup", 0.5, "type_count", ("signup", 1)),
    ("growth", "serial_signup", 2.0, "type_count", ("signup", 15)),
]


# Interests analyzer tree — ALL 12 reference contexts
# (analytics/wic/interests/analyze.py:11-89 declares category → context,
# every weight 0; the keyword lists restate the per-context fulltext
# OR-lists in interests/cyphers.py, cited per row). The batcher joins on
# single tokens, so multi-word phrase keywords ('video games',
# 'cultural commentary', 'decentralized science', …) fold to their
# distinctive token — a documented approximation of queryNodes' phrase
# matching.
INTERESTS_TREE = [
    # cyphers.py:33-57: 'music' OR 'album' OR 'musician' (+ 'concert')
    ("ArtCultureEntertainment", "Music", 0.0,
     ("music", "album", "musician", "concert")),
    # :84-120: 'gaming' OR 'video games' OR 'gamer'. The phrase
    # 'video games' folds to BOTH its tokens ('video', 'games') — the
    # tokenizer splits on [^a-z0-9]+ so a one-word 'videogames' spelling
    # could never be produced from the reference phrase.
    ("ArtCultureEntertainment", "Gaming", 0.0,
     ("gaming", "gamer", "video", "games")),
    # :137-174: 'outdoors' OR 'nature'
    ("ArtCultureEntertainment", "Outdoors", 0.0, ("outdoors", "nature")),
    # :191-227: 'movies' OR 'cinema'
    ("ArtCultureEntertainment", "FilmVideo", 0.0, ("movies", "cinema")),
    # :244-280: 'photography' OR 'photographer'
    ("ArtCultureEntertainment", "Photography", 0.0,
     ("photography", "photographer")),
    # :297-333: 'cultural commentary' OR 'web3 culture'
    ("ArtCultureEntertainment", "CultureCommentary", 0.0, ("commentary",)),
    # :375-387: 'writing at' OR 'substack' OR 'author' OR 'newsletter'
    ("ArtCultureEntertainment", "WritingPublishing", 0.0,
     ("writing", "substack", "author", "newsletter")),
    # :404-440: 'data science' OR 'data scientist' OR 'machine learning
    # engineer'
    ("ScienceTech", "DataScience", 0.0, ("data", "scientist")),
    # :457-493: 'desci' OR 'decentralized science'
    ("ScienceTech", "DeSci", 0.0, ("desci",)),
    # :510-546: 'diversity equity and inclusion' OR 'dei'
    ("SocialJustice", "DiversityEquityInclusion", 0.0, ("dei", "diversity")),
    # :563-599: 'regen' OR 'refi'
    ("SocialJustice", "RegenerativeSystems", 0.0, ("regen", "refi")),
    # :616-652: 'education' OR 'educator' OR 'teacher'
    ("SocialJustice", "Education", 0.0, ("education", "educator", "teacher")),
]

# Collectors analyzer tree (analytics/wic/collectors/analyze.py:12-39:
# context → weight; seed CSVs under collectors/data/*.csv). "kind" picks the
# rule shape: seed-list holdings membership or the 3-letter-ENS predicate.
COLLECTORS_TREE = [
    ("Collectors", "Web3WritingCollector", 0.8, "writing_tokens"),
    ("Collectors", "BlueChipNftCollector", 0.85, "seed_tokens"),
    ("Collectors", "ThreeLetterEnsName", 0.25, "short_ens"),
    ("Collectors", "Web3MusicCollector", 0.8, "music_tokens"),
]


def _dedup_labels(df: DataFrame) -> DataFrame:
    """Deterministic (entity_id, context) label dedup: keep the MINIMUM
    struct of every value column instead of an arbitrary shuffle
    survivor. Every in-repo tree maps a context to exactly one
    (condition, weight), so this equals dropDuplicates there — but a
    caller-supplied tree (or theme_context/collector_threshold argument)
    may give one context two weights, and dropDuplicates on a key subset
    would then flip the surviving row between runs (the same
    nondeterminism class the link-rule _prio min-struct fixes in
    plans/pipeline.py)."""
    val_cols = [c for c in df.columns if c not in ("entity_id", "context")]
    return (
        df.groupBy("entity_id", "context")
        .agg(F.min(F.struct(*val_cols)).alias("_m"))
        .select("entity_id", "context", *[F.col(f"_m.{c}").alias(c) for c in val_cols])
        .select(*df.columns)
    )


def interest_labels(
    texts: DataFrame, tree: list | None = None
) -> DataFrame:
    """texts(entity_id, text) → interest labels.

    ONE tokenize+explode pass over the corpus joined to a broadcast
    keyword→context dictionary batches every keyword context — the
    reference fires one fulltext index query per context per source
    (interests/cyphers.py:33-43, ~6 queries × 14 contexts). At corpus
    scale the explode is the only wide op and the dictionary is always
    the broadcast side; output is distinct (entity, context).
    """
    tree = INTERESTS_TREE if tree is None else tree
    spark = texts.sparkSession
    kw_rows = [
        (kw, cond, ctx, float(w)) for cond, ctx, w, kws in tree for kw in kws
    ]
    kw_df = spark.createDataFrame(
        kw_rows, "kw string, condition string, context string, weight double"
    )
    toks = texts.select(
        F.col("entity_id"),
        F.explode(
            F.array_distinct(F.split(F.lower("text"), "[^a-z0-9]+"))
        ).alias("kw"),
    ).where(F.length("kw") > 0)
    return _dedup_labels(
        toks.join(F.broadcast(kw_df), "kw")
        .select("entity_id", "condition", "context", "weight")
    )


def collector_labels(
    holdings: DataFrame,
    ens_aliases: DataFrame,
    seed_tokens: list[str],
    writing_tokens: list[str],
    music_tokens: list[str],
    tree: list | None = None,
) -> DataFrame:
    """holdings(entity_id, token) + ens_aliases(entity_id, name) →
    collector labels (collectors/analyze.py:12-39).

    The three curated token lists (the reference's bluechip/blur/music
    seed CSVs, collectors/analyze.py:44-46) resolve in ONE pass over
    holdings via a token→context CASE — seed lists are broadcast-sized by
    construction. ThreeLetterEnsName restates collectors' short-ENS rule
    as a native regex on the alias relation.
    """
    tree = COLLECTORS_TREE if tree is None else tree
    weights = {ctx: float(w) for _, ctx, w, _ in tree}
    cond = {ctx: c for c, ctx, _, _ in tree}
    tok = F.lower(F.col("token"))
    ctx_col = (
        F.when(tok.isin([t.lower() for t in seed_tokens]), "BlueChipNftCollector")
        .when(tok.isin([t.lower() for t in writing_tokens]), "Web3WritingCollector")
        .when(tok.isin([t.lower() for t in music_tokens]), "Web3MusicCollector")
    )
    held = (
        holdings.select("entity_id", ctx_col.alias("context"))
        .where(F.col("context").isNotNull())
    )
    short_ens = ens_aliases.where(
        F.lower(F.col("name")).rlike(r"^[a-z0-9]{3}\.eth$")
    ).select("entity_id", F.lit("ThreeLetterEnsName").alias("context"))
    lab = held.unionByName(short_ens).dropDuplicates(["entity_id", "context"])
    cond_expr = F.col("context")
    for ctx, c in cond.items():
        cond_expr = F.when(F.col("context") == ctx, F.lit(c)).otherwise(cond_expr)
    w_expr = F.lit(None).cast("double")
    for ctx, w in weights.items():
        w_expr = F.when(F.col("context") == ctx, F.lit(w)).otherwise(w_expr)
    return lab.select(
        "entity_id",
        cond_expr.alias("condition"),
        "context",
        w_expr.alias("weight"),
    )


# Interests NON-BIO evidence arms — the reference fires each interest
# context over up to six surfaces, not just account bios
# (interests/cyphers.py, one function per context): an `articleTitle`
# fulltext match lifted to the article's AUTHOR wallet (e.g. music
# :44-56, gaming :95-106), the same match lifted to holders of the
# article's NFT over (article)-[:HAS_NFT]-(nft)-[:HOLDS_TOKEN|HOLDS]-
# (wallet) (music :57-67, gaming :107-118), and a `grantTitle` match
# lifted over ANY (grant)-[]-(wallet) edge (gaming :119-130 and every
# later context). Each row below is ONE reference rule site:
# (condition, context, weight, arm, keywords) with arm ∈
# {articles, collectors, grants}; keyword lists are the per-arm
# OR-lists, which DIFFER per arm where the reference's do (music's bio
# list is 'music/album/musician' but its article list is
# 'music/musician/concert' :44-48,58-60; culture's grant list adds
# 'boys club' :341-343). Two reference quirks are deliberately NOT
# replicated, per-site: writing_publishing's author arm (:350-361) is
# `WHERE cn > 3 AND cn < 3` — a self-contradictory predicate that can
# match nothing, so the arm is omitted rather than restated; music's
# twitter BIO_MENTIONED propagation arm (:66-73) MERGEs onto an UNBOUND
# `context` variable (the MATCH binds `wic`), creating anonymous nodes
# instead of context edges, so it is omitted as unreproducible. Phrase
# keywords fold to distinctive tokens exactly as INTERESTS_TREE does.
INTEREST_EVIDENCE_TREE = [
    # music :44-56 (articles), :57-67 (collectors); no grant arm
    ("ArtCultureEntertainment", "Music", 0.0, "articles",
     ("music", "musician", "concert")),
    ("ArtCultureEntertainment", "Music", 0.0, "collectors",
     ("music", "musician")),
    # gaming :95-130
    ("ArtCultureEntertainment", "Gaming", 0.0, "articles",
     ("gaming", "gamer", "video", "games")),
    ("ArtCultureEntertainment", "Gaming", 0.0, "collectors",
     ("gaming", "gamer", "video", "games")),
    ("ArtCultureEntertainment", "Gaming", 0.0, "grants",
     ("gaming", "gamer", "video", "games")),
    # outdoors :148-183
    ("ArtCultureEntertainment", "Outdoors", 0.0, "articles",
     ("outdoors", "nature")),
    ("ArtCultureEntertainment", "Outdoors", 0.0, "collectors",
     ("outdoors", "nature")),
    ("ArtCultureEntertainment", "Outdoors", 0.0, "grants",
     ("outdoors", "nature")),
    # film/video :202-237
    ("ArtCultureEntertainment", "FilmVideo", 0.0, "articles",
     ("movies", "cinema")),
    ("ArtCultureEntertainment", "FilmVideo", 0.0, "collectors",
     ("movies", "cinema")),
    ("ArtCultureEntertainment", "FilmVideo", 0.0, "grants",
     ("movies", "cinema")),
    # photography :255-290
    ("ArtCultureEntertainment", "Photography", 0.0, "articles",
     ("photography", "photographer")),
    ("ArtCultureEntertainment", "Photography", 0.0, "collectors",
     ("photography", "photographer")),
    ("ArtCultureEntertainment", "Photography", 0.0, "grants",
     ("photography", "photographer")),
    # culture :308-346 (grant list adds 'boys club')
    ("ArtCultureEntertainment", "CultureCommentary", 0.0, "articles",
     ("commentary",)),
    ("ArtCultureEntertainment", "CultureCommentary", 0.0, "collectors",
     ("commentary",)),
    ("ArtCultureEntertainment", "CultureCommentary", 0.0, "grants",
     ("commentary", "boys", "club")),
    # writing/publishing :386-397 — grant arm only (author arm is the
    # contradictory-predicate no-op; the keyword-free collector arm is
    # the separate collector_threshold rule)
    ("ArtCultureEntertainment", "WritingPublishing", 0.0, "grants",
     ("writing", "substack", "author", "newsletter")),
    # data science :415-450
    ("ScienceTech", "DataScience", 0.0, "articles", ("data", "scientist")),
    ("ScienceTech", "DataScience", 0.0, "collectors", ("data", "scientist")),
    ("ScienceTech", "DataScience", 0.0, "grants", ("data", "scientist")),
    # desci :468-503
    ("ScienceTech", "DeSci", 0.0, "articles", ("desci",)),
    ("ScienceTech", "DeSci", 0.0, "collectors", ("desci",)),
    ("ScienceTech", "DeSci", 0.0, "grants", ("desci",)),
    # dei :521-556
    ("SocialJustice", "DiversityEquityInclusion", 0.0, "articles",
     ("dei", "diversity")),
    ("SocialJustice", "DiversityEquityInclusion", 0.0, "collectors",
     ("dei", "diversity")),
    ("SocialJustice", "DiversityEquityInclusion", 0.0, "grants",
     ("dei", "diversity")),
    # regen :574-609 (grant arm queries the wicGrants index, same list)
    ("SocialJustice", "RegenerativeSystems", 0.0, "articles",
     ("regen", "refi")),
    ("SocialJustice", "RegenerativeSystems", 0.0, "collectors",
     ("regen", "refi")),
    ("SocialJustice", "RegenerativeSystems", 0.0, "grants",
     ("regen", "refi")),
    # education :627-662
    ("SocialJustice", "Education", 0.0, "articles",
     ("education", "educator", "teacher")),
    ("SocialJustice", "Education", 0.0, "collectors",
     ("education", "educator", "teacher")),
    ("SocialJustice", "Education", 0.0, "grants",
     ("education", "educator", "teacher")),
]


def _kw_hits(texts: DataFrame, id_col: str, kw_df: DataFrame) -> DataFrame:
    """ONE tokenize+explode pass over ``texts(id_col, text)`` joined to the
    broadcast keyword dictionary ``kw_df(kw, condition, context, weight,
    arm)`` — the shared fulltext-index stand-in for every keyword arm (the
    reference runs one queryNodes call per context per surface)."""
    toks = texts.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.lower("text"), "[^a-z0-9]+"))
        ).alias("kw"),
    ).where(F.length("kw") > 0)
    return (
        toks.join(F.broadcast(kw_df), "kw")
        .select(id_col, "condition", "context", "weight", "arm")
        .dropDuplicates([id_col, "context", "arm"])
    )


def interest_evidence_labels(
    page_texts: DataFrame,
    page_authors: DataFrame,
    article_nfts: DataFrame,
    nft_owners: DataFrame,
    grant_titles: DataFrame,
    grant_wallets: DataFrame,
    tree: list | None = None,
    themed_holders: DataFrame | None = None,
    themed_accounts: DataFrame | None = None,
    theme_context: tuple | None = None,
    collector_threshold: tuple | None = None,
) -> DataFrame:
    """The interests analyzer's NON-BIO evidence arms (see
    INTEREST_EVIDENCE_TREE) → distinct (entity_id, condition, context,
    weight) — the same output relation as interest_labels, so the full
    reference rule is the union of the two (MERGE on the _HAS_CONTEXT
    edge dedups arms in the reference; dropDuplicates here).

    Inputs: page_texts(page_id, text) + page_authors(page_id, entity_id)
    for the articleTitle→AUTHOR arm; article_nfts(page_id, nft_id) +
    nft_owners(nft_id, entity_id) for the article-NFT collector arm (the
    repo's ownership surface for article NFTs is IS_OWNER,
    edge_rules.nft_edges — the reference matches HOLDS_TOKEN|HOLDS, a
    documented surface restatement); grant_titles(grant_id, title) +
    grant_wallets(grant_id, entity_id) for the grantTitle arm, where
    grant_wallets is the union of every (grant)-[]-(wallet)-typed edge
    the caller's graph carries (the reference's bare `-[]-` wildcard).

    Optional rules: theme_context + themed_holders/themed_accounts are
    music's two non-keyword arms (interests/cyphers.py:12-30 — holders
    of :MusicNft-labeled tokens, owners of a :Sound account; seed token
    lists stand in for the MusicNft label, as collector_labels' CSVs
    do); collector_threshold=(condition, context, weight, min_articles)
    is writing_publishing's keyword-free collector rule (:363-372 —
    wallets holding NFTs of > 1 distinct articles).

    Scale: the two tokenize+explodes are the only corpus-wide ops; every
    keyword dictionary is broadcast; the NFT/grant joins are
    page-/grant-dimensional. Nothing collects."""
    tree = INTEREST_EVIDENCE_TREE if tree is None else tree
    spark = page_texts.sparkSession
    kw_df = spark.createDataFrame(
        [
            (kw, cond, ctx, float(w), arm)
            for cond, ctx, w, arm, kws in tree
            for kw in kws
        ],
        "kw string, condition string, context string, weight double,"
        " arm string",
    )
    out_cols = ["entity_id", "condition", "context", "weight"]

    # page_hits feeds BOTH the articles and collectors arms below; a lazy
    # localCheckpoint pins the page-dimensional hit relation (text already
    # dropped) so the corpus-wide tokenize+explode underneath it executes
    # once per action, not once per consuming branch.
    page_hits = _kw_hits(
        page_texts, "page_id", kw_df.where(F.col("arm") != "grants")
    ).localCheckpoint(eager=False)
    authored = page_hits.where(F.col("arm") == "articles").join(
        page_authors, "page_id"
    )
    collected = (
        page_hits.where(F.col("arm") == "collectors")
        .join(article_nfts, "page_id")
        .join(nft_owners, "nft_id")
    )
    grant_hits = _kw_hits(
        grant_titles.select(
            F.col("grant_id"), F.col("title").alias("text")
        ),
        "grant_id",
        kw_df.where(F.col("arm") == "grants"),
    )
    granted = grant_hits.join(grant_wallets, "grant_id")
    out = (
        authored.select(*out_cols)
        .unionByName(collected.select(*out_cols))
        .unionByName(granted.select(*out_cols))
    )
    if theme_context is not None:
        cond, ctx, w = theme_context
        lits = [
            F.lit(cond).alias("condition"),
            F.lit(ctx).alias("context"),
            F.lit(float(w)).alias("weight"),
        ]
        for rel in (themed_holders, themed_accounts):
            if rel is not None:
                out = out.unionByName(rel.select("entity_id", *lits))
    if collector_threshold is not None:
        cond, ctx, w, min_articles = collector_threshold
        prolific = (
            article_nfts.join(nft_owners, "nft_id")
            .groupBy("entity_id")
            .agg(F.countDistinct("page_id").alias("arts"))
            .where(F.col("arts") >= int(min_articles))
            .select(
                "entity_id",
                F.lit(cond).alias("condition"),
                F.lit(ctx).alias("context"),
                F.lit(float(w)).alias("weight"),
            )
        )
        out = out.unionByName(prolific)
    return _dedup_labels(out)


# Professionals: bio-keyword fulltext rules (professionals/analyze.py:9-48
# condition tree, all weight 0; cyphers.py fulltext-queries the wicBios
# index per OR-list, labels the matched account and links wallets over
# HAS_ACCOUNT). Each OR-list is restated as a word-bounded, case-blind
# alternation — plain ASCII literals, identical semantics under Java
# regex (Spark rlike) and RE2 (DuckDB regexp_matches).
# (condition group, context, weight, pattern)
PROFESSIONS_TREE = [
    # professionals/analyze.py:53-56: "'founder' OR 'co-founder'"
    ("Positions", "Founder", 0.0, r"\b(founder|co-founder)\b"),
    # cyphers.py:60-90 identify_investors_bios fulltext OR-list
    ("Positions", "Investor", 0.0,
     r"\b(investment fund|venture capital firm|investing in|vc|"
     r"investment firm|seed stage|pre-seed)\b"),
    # analyze.py:68-71: "'Marketing' OR 'Marketer' OR 'brand'"
    ("Positions", "Marketer", 0.0, r"\b(marketing|marketer|brand)\b"),
    # analyze.py:58-61: "'VP of Sales' or 'BizDev' OR 'business
    # development' OR 'partnerships'"
    ("Positions", "SalesPartnerships", 0.0,
     r"\b(vp of sales|bizdev|business development|partnerships)\b"),
    # analyze.py:73-76: "'community lead' OR 'community manager'"
    ("Positions", "CommunityManager", 0.0,
     r"\b(community lead|community manager)\b"),
    # analyze.py:78-81: "'devrel' OR 'developer relations' OR
    # 'ecosystem lead'"
    ("Positions", "DeveloperRelationsLead", 0.0,
     r"\b(devrel|developer relations|ecosystem lead)\b"),
]


def profession_labels(accounts: DataFrame, tree: list | None = None) -> DataFrame:
    """accounts(address, bio, …) → (entity_id, condition, context, weight)
    professional-position labels.

    The reference runs one fulltext ``db.index.fulltext.queryNodes``
    keyword query per context over account bios, SETs a marker label on
    the matched account, then walks HAS_ACCOUNT to the wallet
    (professionals/cyphers.py:10-32 founders, :60-90 investors, :92-180
    marketers / sales / community / devrel — all weight 0 per the
    analyze.py condition tree). Here every OR-list is a native rlike over
    the lowercased bio and ALL contexts evaluate in ONE scan: each row
    emits an array of matched context structs and explodes — no per-rule
    corpus pass, no UDF. The wallet is the feed row's own address column
    (the HAS_ACCOUNT hop is already materialized on the feed).

    Scale: one projection + explode + dropDuplicates keyed by
    (entity_id, context) — a single exchange on the label key space.
    """
    tree = PROFESSIONS_TREE if tree is None else tree
    bio = F.lower(F.col("bio"))
    structs = [
        F.when(
            bio.rlike(pattern),
            F.struct(
                F.lit(condition).alias("condition"),
                F.lit(context).alias("context"),
                F.lit(float(weight)).alias("weight"),
            ),
        )
        for condition, context, weight, pattern in tree
    ]
    hits = accounts.select(
        F.concat(F.lit("Wallet:"), F.lower(F.trim("address"))).alias("entity_id"),
        F.explode(F.array(*structs)).alias("m"),
    ).where(F.col("m").isNotNull())
    return _dedup_labels(
        hits.select(
            "entity_id",
            F.col("m.condition").alias("condition"),
            F.col("m.context").alias("context"),
            F.col("m.weight").alias("weight"),
        )
    )


# Graph-pattern WIC trees: contexts defined as Cypher MATCHes over the
# knowledge graph itself (not behavioral event streams). Restated as
# declarative patterns over the (subj, pred, obj) triple relation —
# (condition group, context, weight, kind, params):
#   subjects        — distinct subjects of pred (optionally obj-label
#                     scoped): a bare MATCH-exists rule
#   subjects_any    — same over several predicates (the reference's
#                     [:A|B|C] alternation)
#   count_gt        — subjects with > k distinct objects via pred
#   count_gt_child  — ditto, but objects must also have an incoming
#                     child_pred edge (the `(p)<-[:HAS_PROPOSAL]-(e)`
#                     guard in the reference's voting rules)
#   benchmark       — every subject of pred qualifies; metric =
#                     distinct-count / corpus median of the benchmark
#                     predicate set's counts (apoc.agg.percentiles [.5]
#                     → percentile 0.5)
#   benchmark_child — benchmark with the child_pred guard
#   subjects_child_seed — subjects of pred whose object's child_pred
#                     parent is in a seed list (farmers/cyphers.py:12-23:
#                     votes on proposals of a :SuspiciousDao)
#   count_ge_quantile — subjects whose distinct-object count reaches
#                     quantile(q) × multiplier of the corpus distribution
#                     (farmers/cyphers.py:35-51: apoc percentile [.95]
#                     × 1.25 Mirror-article benchmark)
#   seed_subjects   — graph entities named in a seed CSV
#                     (farmers wash-trading address list)
#   subjects_seed_obj — subjects of pred pointing at a seeded object
#                     (farmers/cyphers.py:104-113: DEPLOYED → SpamContract)
#   two_hop_count_gt — subj -predA-> mid <-predB- z with > k distinct z
#                     (influencers/cyphers.py:10-29: article NFTs held by
#                     enough distinct collectors; labels the article node —
#                     the feed surface carries no corpus AUTHOR edge to
#                     lift it to the author wallet)
#   subjects_weight_gt — distinct subjects of pred (obj-label scoped)
#                     where the EDGE WEIGHT exceeds k: the reference's
#                     account-property gates (creators/cyphers.py:49-63
#                     ``WHERE dune.follows > 0``) restated over the
#                     property-as-weight convention of
#                     edge_rules.platform_account_edges
#   count_paradigm  — subjects of pred on objects child_pred-parented by a
#                     PARADIGM entity (an Entity whose name CONTAINS a
#                     seed string); metric = distinct paradigm parents
#                     (publicGoods/cyphers.py:59-87: connect_grants_daos
#                     seeds (wic)-[:_PARADIGM_CASE]->(e) by name-CONTAINS,
#                     connect_grant_dao_wallets then walks
#                     (wallet)-[:VOTED]->(p)<-[:HAS_PROPOSAL]-(e) and sets
#                     con._count = count(distinct e))
#   subjects_paradigm — same walk, bare existence, metric 1.0
#                     (publicGoods/cyphers.py:163-176
#                     connect_incubators_members over the root context's
#                     paradigm incubator entities)
#   subjects_incubated — subjects of pred on objects child_pred-parented
#                     by an entity that is the OBJECT of seed_pred
#                     (publicGoods/cyphers.py:178-191
#                     connect_incubators_participant:
#                     (wallet)-[:VOTED]-(:Proposal)-[]-(incubated)
#                     <-[:INCUBATED]-(incubator))
#   benchmark_two_hop — wallet reached via mid -pred_b-> wallet counts the
#                     mid's distinct pred_a objects; metric = count ÷
#                     corpus median (publicGoods/cyphers.py:89-114
#                     connect_gitcoin_bounty_creators: (bounty)-[:IS_OWNER]
#                     -(github)-[HAS_ACCOUNT/HAS_WALLET]-(wallet) against
#                     the get_gitcoin_bounty_creator_benchmark median; the
#                     github↔wallet hop is this surface's HAS_WALLET link)
# Divergences kept deliberately (documented per rule): MultisigSigner
# drops the reference's extra `(entity)-[:HAS_ACCOUNT]->(multisig)` guard
# (no entity↔multisig fixture surface). The two TRANSFERRED-flow
# daoContributors rules live in context_flow_labels below (a one-step
# post-pass, like the farmers cosigner expansion) because they gate on
# the label relation itself, not only on the triple relation.
GRAPH_WIC_TREE = [
    # daoContributors/analyze.py:11-44 + cyphers.py:12-35,81-95
    ("DaoContributors", "MultisigSigner", 0.85, "subjects", ("IS_SIGNER", None)),
    ("DaoContributors", "SnapshotAdmin", 0.85, "subjects", ("CONTRIBUTOR", "Space")),
    ("DaoContributors", "TechnicalContributor", 0.925, "subjects",
     ("CONTRIBUTOR", "Repository")),
    # publicGoods/analyze.py:10-36 + cyphers.py:8-60. The `> 2` is the
    # reference's hardcoded constant (its computed donation benchmark is
    # unused, cyphers.py:19-30). Fixture donors span up to 10 distinct
    # grants (sources/feeds.DONATIONS_SQL keys valid destinations by the
    # grant's actual admin; 97 donors clear the >2 bar at sf0.01), so
    # this context labels real rows at oracle scale; the rule-kind
    # hand-trace covers the threshold boundary.
    ("Grants", "GitcoinGrantDonor", 0.6, "count_gt", ("DONATION", "Grant", 2)),
    ("Grants", "GitcoinGrantAdmin", 0.825, "benchmark",
     ("IS_ADMIN", ("IS_ADMIN", "MEMBER_OF"), "Grant")),
    # publicGoods/analyze.py:30-37 + cyphers.py:89-114: bounty creators
    # against the corpus-median benchmark; the (bounty)-[:IS_OWNER]-(github)
    # hop lands via edge_rules.bounty_edges, the github↔wallet hop is the
    # same feed's HAS_WALLET link
    ("Bounties", "GitcoinBountyAdmin", 0.75, "benchmark_two_hop",
     ("IS_OWNER", "Bounty", "HAS_WALLET", "Wallet")),
    # protocolPoliticians/analyze.py:9-40 + cyphers.py:9-50
    ("Voting", "EngagedVoter", 0.5, "count_gt_child",
     ("VOTED", "HAS_PROPOSAL", 10)),
    ("Proposals", "ProposalAuthor", 0.6, "benchmark_child",
     ("AUTHOR", "HAS_PROPOSAL")),
    ("Delegation", "Delegate", 0.7, "subjects", ("IS_DELEGATE", None)),
    # protocolPoliticians/analyze.py:33-41 + cyphers.py:67-80
    # connect_dao_admins — weight 0 in the reference tree; metric is the
    # distinct-entity contribution count (con._count); no threshold, so
    # count_gt at k=0 (the Space node is this surface's snapshot-entity
    # stand-in, same as the SnapshotAdmin rule above)
    ("Leadership", "DaoAdmin", 0.0, "count_gt", ("CONTRIBUTOR", "Space", 0)),
    # developers/analyze.py:10-35 + cyphers.py:8-22 (has_github), :100-113
    # (identify_dune_accounts), :23-39 (gitcoin_bounty_fulfill); the
    # github↔wallet hop is the bounty feed's HAS_WALLET link
    ("Web3Developers", "GithubAccount", 0.1, "objects",
     ("HAS_WALLET", "Github")),
    ("Web3Developers", "DuneAccount", 0.2, "subjects",
     ("HAS_ACCOUNT", "Dune")),
    ("Web3Developers", "GitcoinBountyFulfill", 0.75, "subjects_two_hop",
     ("HAS_FULLFILLED", "Bounty", "HAS_WALLET")),
    # developers/analyze.py:38-46 + cyphers.py:40-54 gitcoin_bounty_admin
    # — the developers-side UNBENCHMARKED second rule site for the same
    # context the publicGoods benchmark rule ('Bounties' above) scores
    ("TechnicalEcosystemDevelopment", "GitcoinBountyAdmin", 0.9,
     "subjects_two_hop", ("IS_OWNER", "Bounty", "HAS_WALLET")),
    # influencers/analyze.py:23-28 + cyphers.py:131-149 get_dune_influencers
    # — follows (the platform feed's property-as-edge-weight) above the
    # q95 × .9 corpus benchmark (apoc percentiles index [3] = 0.95, the
    # same reading the MirrorFarmer q95 rule uses)
    ("PopularMirrorAuthor", "DuneWizard", 0.85,
     "subjects_weight_gt_quantile", ("HAS_ACCOUNT", "Dune", 0.95, 0.9)),
    # influencers/analyze.py:36-44 + cyphers.py:111-130
    # identify_twitter_influencers — ≥ 75 distinct follower wallets over
    # the wallet→Twitter-account→FOLLOWS fan-in. 75 is the reference's
    # semantic constant, kept verbatim: the sf0.01 fixture tops out at
    # ~63 wallet-linked Twitter accounts, so the rule correctly labels
    # nothing there (oracle agrees 0≡0; the pytest hand-trace exercises
    # the walk at k=2).
    ("SocialMedia", "TwitterInfluencer", 0.95,
     "fan_in_count_ge", ("HAS_ACCOUNT", "Twitter", "FOLLOWS", 75)),
    # traders/analyze.py:27-90 — NftfiBorrower/NftfiLender are the
    # MATCHes on the Loan relation itself (cyphers.py:191-199 BORROWED,
    # :124-132 LENT); the per-marketplace variants MATCH the
    # (wallet)-[:BORROWER|LENDER]->(:Marketplace {name}) surface
    # (cyphers.py:55-180), one subjects_seed_obj rule per venue.
    ("NftCollateralizedBorrower", "NftfiBorrower", 0.7,
     "subjects", ("BORROWED", "Loan")),
    ("NftCollateralizedLender", "NftfiLender", 0.65,
     "subjects", ("LENT", "Loan")),
    ("NftCollateralizedBorrower", "x2y2Borrower", 0.7,
     "subjects_seed_obj", ("BORROWER", ("Marketplace:x2y2",))),
    ("NftCollateralizedBorrower", "ParaspaceBorrower", 0.7,
     "subjects_seed_obj", ("BORROWER", ("Marketplace:paraspace",))),
    ("NftCollateralizedBorrower", "ArcadeBorrower", 0.7,
     "subjects_seed_obj", ("BORROWER", ("Marketplace:arcade.xyz",))),
    ("NftCollateralizedBorrower", "BendBorrower", 0.7,
     "subjects_seed_obj", ("BORROWER", ("Marketplace:bend",))),
    ("NftCollateralizedLender", "x2y2Lender", 0.65,
     "subjects_seed_obj", ("LENDER", ("Marketplace:x2y2",))),
    ("NftCollateralizedLender", "ParaspaceLender", 0.65,
     "subjects_seed_obj", ("LENDER", ("Marketplace:paraspace",))),
    ("NftCollateralizedLender", "ArcadeLender", 0.65,
     "subjects_seed_obj", ("LENDER", ("Marketplace:arcade.xyz",))),
    ("NftCollateralizedLender", "BendLender", 0.65,
     "subjects_seed_obj", ("LENDER", ("Marketplace:bend",))),
    # creators/analyze.py:11-33 + cyphers.py:10-63 — Web3Writer counts
    # authored articles against the corpus 75th-percentile benchmark
    # (cc_writers: articles_count >= benchmark, apoc percentiles [.75]);
    # the feed surface's AUTHOR relation points at Proposal objects (the
    # Mirror Article stand-in, same relation MirrorFarmer benchmarks at
    # .95 × 1.25). Web3Musician is the bare Sound-account MATCH;
    # Web3DataAnalyst gates on the Dune account's follows property —
    # the edge weight here.
    ("Creators", "Web3Writer", 0.6,
     "count_ge_quantile", ("AUTHOR", "Proposal", 0.75, 1.0)),
    ("Creators", "Web3Musician", 0.8, "subjects", ("HAS_ACCOUNT", "Sound")),
    ("Creators", "Web3DataAnalyst", 0.8,
     "subjects_weight_gt", ("HAS_ACCOUNT", "Dune", 0.0)),
]


def paradigm_entities(triples: DataFrame, seeds: tuple) -> DataFrame:
    """Entities whose name CONTAINS one of the seed strings — the
    reference's ``MATCH (e:Entity) WHERE e.name CONTAINS '{name}'``
    paradigm-case seeding (publicGoods/cyphers.py:59-74
    connect_grants_daos, :146-161 connect_incubators; the per-name loop
    becomes one OR-folded predicate over ONE distinct endpoint scan).
    Returns one column ``e`` of 'Entity:key' node ids.

    Scale: the entity keyspace is the dimension side of every feed rule
    (orgs, communities, protocols), so the distinct union is a small
    relation — always broadcastable to the walk that consumes it."""
    ids = (
        triples.select(F.col("subj").alias("e"))
        .unionByName(triples.select(F.col("obj").alias("e")))
        .where(F.col("e").startswith("Entity:"))
        .dropDuplicates()
    )
    # CONTAINS applies to the entity *name* (the key after the 'Entity:'
    # label prefix), matching the reference's `e.name CONTAINS` exactly —
    # matching the full prefixed id would let a seed that happens to be a
    # substring of the literal 'Entity:' match every entity.
    name = F.expr("substring(e, 8)")
    cond = F.lit(False)
    for s in seeds:
        cond = cond | name.contains(s)
    return ids.where(cond)


def graph_wic_labels(
    triples: DataFrame, tree: list | None = None
) -> DataFrame:
    """triples('Label:key' subj, pred, 'Label:key' obj, …) →
    (entity_id, condition, context, weight, metric) graph-WIC labels.

    The reference fires one Cypher per rule site over the live graph
    (~120 sites across 11 analyzer categories); here every rule is a
    filter/agg over ONE already-built triple relation, so the whole tree
    is a union of small plans over a single scan lineage. ``metric`` is
    the rule's evidence (the reference's `_count` / `_againstBenchmark`
    edge property): distinct-object count for count rules,
    count ÷ corpus-median for benchmark rules, 1.0 for exists rules.

    Scale: per-pred slices are filter+distinct aggregations keyed by
    subject; the child-pred guards semi-join against HAS_PROPOSAL objects
    (dimension-sized → broadcast); medians reduce count relations that
    are already ≤ one row per subject.
    """
    tree = GRAPH_WIC_TREE if tree is None else tree
    # weight is optional on the triple relation (bare (subj, pred, obj)
    # fixtures): rules that never gate on it must not require the column
    has_weight = "weight" in triples.columns

    def obj_label(df: DataFrame, label: str) -> DataFrame:
        return df.where(F.col("obj").startswith(label + ":"))

    def slice_(pred, label=None) -> DataFrame:
        preds = (pred,) if isinstance(pred, str) else tuple(pred)
        out = triples.where(F.col("pred").isin(*preds)).select("subj", "obj")
        return obj_label(out, label) if label else out

    def counts(df: DataFrame) -> DataFrame:
        return df.dropDuplicates(["subj", "obj"]).groupBy("subj").agg(
            F.count(F.lit(1)).alias("c")
        )

    def with_child_guard(df: DataFrame, child_pred: str) -> DataFrame:
        parents = (
            triples.where(F.col("pred") == child_pred)
            .select(F.col("obj").alias("obj"))
            .dropDuplicates()
        )
        return df.join(F.broadcast(parents), "obj")

    parts = []
    # ALL row-local exists kinds (subjects / subjects_any /
    # subjects_weight_gt / objects / seed_subjects / subjects_seed_obj)
    # batch into ONE scan of the triple relation: each rule contributes a
    # when(cond, struct(entity, condition, context, weight)) array
    # element, one explode, one (entity, context) dedup exchange — the
    # profession_labels shape. Contexts are unique per rule, so the
    # single dedup equals the per-rule dedup + union, and ~25 scans of
    # the (checkpointed) relation collapse to 1 — at sf0.01 this cut
    # graph_wic's Spark wall ~2× (stage-count-bound), at 100 TB it is
    # simply 25× less triple-relation traffic.
    row_structs = []

    def _row_struct(entity_col, condition, context, weight):
        return F.struct(
            entity_col.alias("entity_id"),
            F.lit(condition).alias("condition"),
            F.lit(context).alias("context"),
            F.lit(float(weight)).alias("weight"),
        )

    for condition, context, weight, kind, params in tree:
        if kind in ("subjects", "subjects_any"):
            pred, label = params
            preds = (pred,) if isinstance(pred, str) else tuple(pred)
            cond = F.col("pred").isin(*preds)
            if label:
                cond = cond & F.col("obj").startswith(label + ":")
            row_structs.append(
                F.when(cond, _row_struct(F.col("subj"), condition, context, weight))
            )
            continue
        elif kind == "subjects_weight_gt":
            pred, label, k = params
            w = F.col("weight") if has_weight else F.lit(1.0)
            cond = (F.col("pred") == pred) & (w > k)
            if label:
                cond = cond & F.col("obj").startswith(label + ":")
            row_structs.append(
                F.when(cond, _row_struct(F.col("subj"), condition, context, weight))
            )
            continue
        elif kind == "objects":
            # entity = the OBJECT endpoint (developers/cyphers.py:8-22
            # has_github — the repo's Github↔Wallet surface points
            # Github→Wallet, so the labeled wallet is the object)
            pred, slabel = params
            cond = F.col("pred") == pred
            if slabel:
                cond = cond & F.col("subj").startswith(slabel + ":")
            row_structs.append(
                F.when(cond, _row_struct(F.col("obj"), condition, context, weight))
            )
            continue
        elif kind == "seed_subjects":
            (seeds,) = params
            row_structs.append(
                F.when(
                    F.col("subj").isin(*seeds),
                    _row_struct(F.col("subj"), condition, context, weight),
                )
            )
            continue
        elif kind == "subjects_seed_obj":
            pred, seeds = params
            row_structs.append(
                F.when(
                    (F.col("pred") == pred) & F.col("obj").isin(*seeds),
                    _row_struct(F.col("subj"), condition, context, weight),
                )
            )
            continue
        elif kind == "subjects_two_hop":
            # (gh)-[pred_a]->(label_a) ∧ (gh)-[pred_b]->(entity) — the
            # unbenchmarked bounty walks (developers/cyphers.py:23-54)
            pred_a, label_a, pred_b = params
            mids = slice_(pred_b).select(
                F.col("subj").alias("subj"), F.col("obj").alias("wallet")
            )
            src = (
                slice_(pred_a, label_a)
                .join(mids, "subj")
                .select(F.col("wallet").alias("subj"))
                .dropDuplicates()
                .select("subj", F.lit(1.0).alias("metric"))
            )
        elif kind == "subjects_weight_gt_quantile":
            # property > corpus-quantile × mult, the property riding as
            # the edge weight (influencers/cyphers.py:131-149
            # get_dune_influencers: follows > percentiles[3]=q95 × .9)
            pred, label, q, mult = params
            w = F.col("weight") if has_weight else F.lit(1.0)
            rows = triples.where(F.col("pred") == pred).select(
                "subj", "obj", w.alias("w")
            )
            if label:
                rows = obj_label(rows, label)
            rows = rows.dropDuplicates(["subj", "obj", "w"])
            bench = rows.agg((F.percentile("w", F.lit(q)) * mult).alias("b"))
            src = (
                rows.crossJoin(F.broadcast(bench))
                .where(F.col("w") > F.col("b"))
                .select("subj")
                .dropDuplicates()
                .select("subj", F.lit(1.0).alias("metric"))
            )
        elif kind == "fan_in_count_ge":
            # (fw)-[acct]->(fT)-[follow]->(T)<-[acct]-(iw): count distinct
            # follower WALLETS per influencer WALLET ≥ k (influencers/
            # cyphers.py:111-130 — the SET InfluencerWallet marker pass +
            # connect pass collapse into one walk; followers of all of a
            # wallet's accounts aggregate, per the reference's WITH)
            acct_pred, acct_label, follow_pred, k = params
            ha_rel = slice_(acct_pred, acct_label)
            fol = triples.where(F.col("pred") == follow_pred).select(
                F.col("subj").alias("facct"), F.col("obj").alias("tacct")
            )
            fw = ha_rel.select(
                F.col("subj").alias("fw"), F.col("obj").alias("facct")
            )
            src = (
                ha_rel.select(
                    F.col("subj").alias("iw"), F.col("obj").alias("tacct")
                )
                .join(fol, "tacct")
                .join(fw, "facct")
                .dropDuplicates(["iw", "fw"])
                .groupBy("iw")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") >= k)
                .select(F.col("iw").alias("subj"), F.lit(1.0).alias("metric"))
            )
        elif kind == "count_gt":
            pred, label, k = params
            src = counts(slice_(pred, label)).where(F.col("c") > k).select(
                "subj", F.col("c").cast("double").alias("metric")
            )
        elif kind == "count_gt_child":
            pred, child_pred, k = params
            src = counts(with_child_guard(slice_(pred), child_pred)).where(
                F.col("c") > k
            ).select("subj", F.col("c").cast("double").alias("metric"))
        elif kind == "subjects_child_seed":
            pred, child_pred, seeds = params
            parents = (
                triples.where(
                    (F.col("pred") == child_pred)
                    & F.col("subj").isin(*seeds)
                )
                .select("obj")
                .dropDuplicates()
            )
            src = slice_(pred).join(F.broadcast(parents), "obj").select(
                "subj"
            ).dropDuplicates().select("subj", F.lit(1.0).alias("metric"))
        elif kind == "count_ge_quantile":
            pred, label, q, mult = params
            cnt = counts(slice_(pred, label))
            bench = cnt.agg(
                (F.percentile("c", F.lit(q)) * mult).alias("b")
            )
            src = cnt.crossJoin(F.broadcast(bench)).where(
                F.col("c") >= F.col("b")
            ).select("subj", F.col("c").cast("double").alias("metric"))
        elif kind in ("count_paradigm", "subjects_paradigm"):
            pred, child_pred, seeds = params
            ents = paradigm_entities(triples, seeds)
            parents = (
                triples.where(F.col("pred") == child_pred)
                .join(
                    F.broadcast(ents), F.col("subj") == F.col("e")
                )
                .select("obj", F.col("subj").alias("par"))
                .dropDuplicates()
            )
            walked = slice_(pred).join(F.broadcast(parents), "obj")
            if kind == "count_paradigm":
                src = (
                    walked.dropDuplicates(["subj", "par"])
                    .groupBy("subj")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .select(
                        "subj", F.col("c").cast("double").alias("metric")
                    )
                )
            else:
                src = walked.select("subj").dropDuplicates().select(
                    "subj", F.lit(1.0).alias("metric")
                )
        elif kind == "subjects_incubated":
            pred, child_pred, seed_pred = params
            incubated = (
                triples.where(F.col("pred") == seed_pred)
                .select(F.col("obj").alias("ent"))
                .dropDuplicates()
            )
            props = (
                triples.where(F.col("pred") == child_pred)
                .join(F.broadcast(incubated), F.col("subj") == F.col("ent"))
                .select("obj")
                .dropDuplicates()
            )
            src = (
                slice_(pred)
                .join(F.broadcast(props), "obj")
                .select("subj")
                .dropDuplicates()
                .select("subj", F.lit(1.0).alias("metric"))
            )
        elif kind == "benchmark_two_hop":
            pred_a, label_a, pred_b, label_b = params
            mids = slice_(pred_b, label_b).select(
                F.col("subj").alias("subj"), F.col("obj").alias("wallet")
            )
            cnt = counts(
                slice_(pred_a, label_a)
                .join(mids, "subj")
                .select(F.col("wallet").alias("subj"), "obj")
            )
            bench = cnt.agg(F.percentile("c", F.lit(0.5)).alias("b"))
            src = cnt.crossJoin(F.broadcast(bench)).select(
                "subj", (F.col("c") / F.col("b")).alias("metric")
            )
        elif kind == "two_hop_count_gt":
            pred_a, pred_b, k = params
            a = slice_(pred_a)
            b = slice_(pred_b).select(
                F.col("obj").alias("obj"), F.col("subj").alias("z")
            )
            src = (
                a.join(b, "obj")
                .dropDuplicates(["subj", "z"])
                .groupBy("subj")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") > k)
                .select("subj", F.col("c").cast("double").alias("metric"))
            )
        elif kind == "benchmark":
            pred, bench_preds, label = params
            cnt = counts(slice_(pred, label))
            bench = counts(slice_(bench_preds, label)).agg(
                F.percentile("c", F.lit(0.5)).alias("b")
            )
            src = cnt.crossJoin(F.broadcast(bench)).select(
                "subj", (F.col("c") / F.col("b")).alias("metric")
            )
        else:  # benchmark_child
            pred, child_pred = params
            cnt = counts(with_child_guard(slice_(pred), child_pred))
            bench = cnt.agg(F.percentile("c", F.lit(0.5)).alias("b"))
            src = cnt.crossJoin(F.broadcast(bench)).select(
                "subj", (F.col("c") / F.col("b")).alias("metric")
            )
        parts.append(
            src.select(
                F.col("subj").alias("entity_id"),
                F.lit(condition).alias("condition"),
                F.lit(context).alias("context"),
                F.lit(weight).alias("weight"),
                "metric",
            )
        )
    if row_structs:
        parts.append(
            _dedup_labels(
                triples.select(F.explode(F.array(*row_structs)).alias("m"))
                .where(F.col("m").isNotNull())
                .select("m.entity_id", "m.condition", "m.context", "m.weight")
            )
            .select(
                "entity_id", "condition", "context",
                F.col("weight").cast("double").alias("weight"),
                F.lit(1.0).alias("metric"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# The farmers analyzer's OpportunisticUsers contexts — the subgraph whose
# labels seed the cosigner expansion (farmers/analyze.py:12-44)
FARMER_CONTEXTS = (
    "SuspiciousSnapshot", "MirrorFarmer", "NftWashTrading",
    "SpamTokenDeployer",
)

# (condition, context, weight) of the cosigner-expansion label — the
# single source for both cosigner_expansion's defaults and the DuckDB
# oracle (driver_queries replays it), so tuning the documented -0.5
# choice cannot drift the two apart.
COSIGNER_CONTEXT = ("Cosigners", "FarmerCosigner", -0.5)


def _cosigner_pairs(
    labels: DataFrame, triples: DataFrame, farmer_contexts: tuple
) -> DataFrame:
    """(buddy wallet, farmer wallet) pairs sharing a multisig: the 2-hop
    (wallet)-[:IS_SIGNER]-(:MultiSig)-[:IS_SIGNER]-(otherwallet) walk of
    farmers/cyphers.py:115-137, where wallet already holds an
    OpportunisticUsers context and otherwallet holds none
    (``WHERE NOT (otherwallet)-[:_HAS_CONTEXT]->(:_OpportunisticUsers)``).

    Scale: seeds (farmer wallets) are a label aggregate — dimension-sized
    → broadcast; the signer relation joins once on the multisig key and
    once (anti) on the seed key, never self-joining the full corpus."""
    seeds = (
        labels.where(F.col("context").isin(*farmer_contexts))
        .select(F.col("entity_id").alias("w"))
        .dropDuplicates()
    )
    sig = triples.where(F.col("pred") == "IS_SIGNER").select(
        F.col("subj").alias("w"), F.col("obj").alias("m")
    )
    farmer_sig = sig.join(F.broadcast(seeds), "w").select(
        "m", F.col("w").alias("farmer")
    )
    return (
        sig.join(farmer_sig, "m")
        .select(F.col("w").alias("buddy"), "farmer")
        .dropDuplicates()
        .join(
            F.broadcast(seeds.withColumnRenamed("w", "buddy")),
            "buddy",
            "left_anti",
        )
    )


def cosigner_expansion(
    labels: DataFrame,
    triples: DataFrame,
    farmer_contexts: tuple = FARMER_CONTEXTS,
    condition: str = COSIGNER_CONTEXT[0],
    context: str = COSIGNER_CONTEXT[1],
    weight: float = COSIGNER_CONTEXT[2],
) -> DataFrame:
    """Copy the farmers subgraph's context to uncontexted co-signers —
    the (otherwallet)-[:_HAS_CONTEXT]->(FarmerCosigner wic) MERGE of
    farmers/cyphers.py:115-137 connect_cosigner_expansion, as a post-pass
    over the base label relation. The context name restates the
    ``_FarmerCosigner`` wic label the counterparty rule excludes
    (cyphers.py:143); the reference wires no weight for it in the
    analyze.py conditions tree, so the weight here is a documented
    choice keeping the context in the subgraph's negative range."""
    return _cosigner_pairs(labels, triples, farmer_contexts).select(
        F.col("buddy").alias("entity_id"),
        F.lit(condition).alias("condition"),
        F.lit(context).alias("context"),
        F.lit(float(weight)).alias("weight"),
        F.lit(1.0).alias("metric"),
    ).dropDuplicates(["entity_id"])


def cosigner_buddies(
    labels: DataFrame,
    triples: DataFrame,
    farmer_contexts: tuple = FARMER_CONTEXTS,
    context: str = "FarmerCosigner",
) -> DataFrame:
    """The provenance side of the expansion: one
    (buddy)-[:_HAS_CONTEXT_BUDDY {_context}]->(farmer wallet) edge per
    co-signer pair (farmers/cyphers.py:128-133 MERGEs the buddy edge and
    stamps ``conbud._context`` with the context's display name)."""
    return _cosigner_pairs(labels, triples, farmer_contexts).select(
        F.col("buddy").alias("subj"),
        F.lit("_HAS_CONTEXT_BUDDY").alias("pred"),
        F.col("farmer").alias("obj"),
        F.lit(context).alias("context"),
    )


# daoContributors' TRANSFERRED-flow rules (daoContributors/cyphers.py:
# 38-80, wired by analyze.py:28-40 at weights .9/.75): one entry per rule
# site, direction 'out' = get_dao_funding_recipients (entity-linked wallet
# -TRANSFERRED{nb_transfer>=5}-> target), 'in' = get_dao_treasury_funders
# (the reverse arrow). The professionals copies of these functions
# (professionals/cyphers.py:187-228) are dead code — professionals/
# analyze.py wires only the six bio rules — so they mint no rule sites.
DAO_FLOW_TREE = [
    ("DaoContributors", "DaoFundingRecipient", 0.9, "out"),
    ("DaoContributors", "DaoTreasuryFunder", 0.75, "in"),
]

# the account surfaces the reference ingests with the :Entity label (see
# context_flow_labels docstring) — shared with the oracle generator so
# the gate cannot drift between Spark plan and SQL
ENTITY_ACCOUNT_LABELS = ("Dune",)

# TRANSFERRED nb_transfer gate of the daoContributors flow rules
# (cyphers.py:38-80 `trans.nb_transfer >= 5`) — shared with the oracle.
MIN_NB_TRANSFER = 5


def context_flow_labels(
    labels: DataFrame,
    triples: DataFrame,
    tree: list | None = None,
    min_nb_transfer: int = MIN_NB_TRANSFER,
    entity_account_labels: tuple = ENTITY_ACCOUNT_LABELS,
    winners: DataFrame | None = None,
    winner_context: tuple = ("DaoContributors", "DaoFundingRecipient", 0.9),
) -> DataFrame:
    """The daoContributors TRANSFERRED-flow rules (cyphers.py:38-80) →
    (entity_id, condition, context, weight, metric) label rows.

    The reference MATCHes ``(entity:Entity)-[:HAS_ACCOUNT]-(wallet)
    -[trans:TRANSFERRED]->(otherWallet)-[:_HAS_CONTEXT]-(wic:_Context)``
    with ``trans.nb_transfer >= 5`` and ``(otherWallet)-[:HAS_ACCOUNT]-()``
    then labels otherWallet (the treasury-funder rule reverses the
    arrow). Two restatements, both documented: (1) the bare
    ``-[:_HAS_CONTEXT]-`` gate reads whatever context state the live
    graph accumulated across prior analyzer runs — order-dependent — so
    it is evaluated here as ONE synchronous step over this run's base
    label relation (the same choice cosigner_expansion makes; iterating
    would propagate further, which the reference only does across
    repeated pipeline runs); (2) the ``:Entity``-linked-wallet gate
    resolves to the HAS_ACCOUNT surface whose account nodes the
    reference ingests WITH the :Entity label — Dune accounts
    (duneAccounts/cyphers.py:54 ``MERGE (d:Dune:Account:Entity …)``,
    :112 ``(d)-[:HAS_ACCOUNT]->(w:Wallet)``); Sound/Twitter accounts are
    not Entity-labeled, so they gate nothing.

    ``winners`` ('Proposal:key' one-column relation) is the rule's second
    arm: ``(wallet)-[:AUTHOR]->(:Proposal:Winner)`` → DaoFundingRecipient
    unconditionally (cyphers.py:51-60; the Winner label comes from the
    propHouse ingest, ingestion/propHouse/cyphers.py:180-190).

    Scale: every gate relation (entity-linked wallets, any-account
    wallets, contexted wallets, winner proposals) is dimension-sized →
    broadcast; the transfer relation is filtered on nb_transfer before
    any join and never self-joins."""
    tree = DAO_FLOW_TREE if tree is None else tree
    ha = triples.where(F.col("pred") == "HAS_ACCOUNT").select(
        F.col("subj").alias("w"), "obj"
    )
    cond = F.lit(False)
    for lbl in entity_account_labels:
        cond = cond | F.col("obj").startswith(lbl + ":")
    ew = F.broadcast(ha.where(cond).select("w").dropDuplicates())
    any_acct = F.broadcast(ha.select("w").dropDuplicates())
    contexted = F.broadcast(
        labels.select(F.col("entity_id").alias("w")).dropDuplicates()
    )
    # weight is optional on the triple relation (same contract as
    # graph_wic_labels): a bare (subj, pred, obj) relation carries no
    # nb_transfer evidence, so the >= gate passes nothing rather than
    # failing to resolve the column.
    nb_gate = (
        F.col("weight") >= min_nb_transfer
        if "weight" in triples.columns
        else F.lit(False)
    )
    tr = (
        triples.where(
            (F.col("pred") == "TRANSFERRED")
            & nb_gate
            & F.col("subj").startswith("Wallet:")
            & F.col("obj").startswith("Wallet:")
        )
        .select("subj", "obj")
        .dropDuplicates()
    )
    parts = []
    for condition, context, weight, direction in tree:
        src, dst = ("subj", "obj") if direction == "out" else ("obj", "subj")
        hits = (
            tr.join(ew, tr[src] == ew["w"])
            .select(F.col(dst).alias("w"))
            .dropDuplicates()
            .join(any_acct, "w")
            .join(contexted, "w")
        )
        parts.append(
            hits.select(
                F.col("w").alias("entity_id"),
                F.lit(condition).alias("condition"),
                F.lit(context).alias("context"),
                F.lit(float(weight)).alias("weight"),
                F.lit(1.0).alias("metric"),
            )
        )
    if winners is not None:
        cond_, ctx_, w_ = winner_context
        won = (
            triples.where(F.col("pred") == "AUTHOR")
            .join(
                F.broadcast(winners.withColumnRenamed(winners.columns[0], "obj")),
                "obj",
            )
            .select(
                F.col("subj").alias("entity_id"),
                F.lit(cond_).alias("condition"),
                F.lit(ctx_).alias("context"),
                F.lit(float(w_)).alias("weight"),
                F.lit(1.0).alias("metric"),
            )
        )
        parts.append(won)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _dedup_labels(out)


# the is_smart_contract_dev description gate (developers/cyphers.py:57-59
# ``repo.description contains "smart contract" or … "truffle" or
# … "token contract" or … ".sol" or … "solidity"``) — shared with the
# oracle generator so the keyword list cannot drift
SC_DEV_DESC_KEYWORDS = (
    "smart contract", "truffle", "token contract", ".sol", "solidity"
)

# (condition, context, weight) + walk predicates of the SmartContractDev
# rule — shared with the oracle like COSIGNER_CONTEXT above.
SC_DEV_CONTEXT = ("Web3Developers", "SmartContractDev", 0.9)
SC_DEV_ROLE_PREDS = ("CONTRIBUTOR", "OWNER", "SUBSCRIBER")
SC_DEV_WALLET_PRED = "HAS_WALLET"


def smart_contract_dev_labels(
    triples: DataFrame,
    sc_repos: DataFrame,
    condition: str = SC_DEV_CONTEXT[0],
    context: str = SC_DEV_CONTEXT[1],
    weight: float = SC_DEV_CONTEXT[2],
    role_preds: tuple = SC_DEV_ROLE_PREDS,
    wallet_pred: str = SC_DEV_WALLET_PRED,
) -> DataFrame:
    """developers/cyphers.py:55-70 is_smart_contract_dev: repositories
    whose description CONTAINS a solidity-stack keyword
    (SC_DEV_DESC_KEYWORDS) → their CONTRIBUTOR|OWNER|SUBSCRIBER github
    users → the HAS_WALLET-linked wallet, labeled SmartContractDev.

    ``sc_repos`` is the description-gated repository dimension
    ('Repository:key' one-column relation) computed from the repos FEED —
    the triple surface carries no node properties, so the property gate
    becomes a seed dimension exactly like the propHouse Winner arm. A
    repository qualifies if ANY of its feed rows carries a matching
    description (the reference's node property is MERGE last-write; the
    synthetic feed keys description off full_name so the two readings
    coincide). The reference's trailing ``OPTIONAL MATCH … Token`` binds
    nothing the walk keeps — dropped.

    Scale: the seed set and the github→wallet link are dimension-sized →
    broadcast; the role-edge slice filters on pred before any join."""
    seeds = F.broadcast(
        sc_repos.withColumnRenamed(sc_repos.columns[0], "obj").dropDuplicates()
    )
    gh = (
        triples.where(F.col("pred").isin(*role_preds))
        .select("subj", "obj")
        .join(seeds, "obj")
        .select("subj")
        .dropDuplicates()
    )
    wallets = (
        triples.where(F.col("pred") == wallet_pred)
        .select("subj", F.col("obj").alias("wallet"))
        .join(F.broadcast(gh), "subj")
        .select("wallet")
        .dropDuplicates()
    )
    return wallets.select(
        F.col("wallet").alias("entity_id"),
        F.lit(condition).alias("condition"),
        F.lit(context).alias("context"),
        F.lit(float(weight)).alias("weight"),
        F.lit(1.0).alias("metric"),
    )


# influencers' text-evidence arms (influencers/analyze.py:10-35 weights;
# cyphers.py rule sites): one entry per reference MERGE site. Arms:
#   both_platforms — (wallet)-[:HAS_ACCOUNT]-(:Twitter) AND (:Substack)
#                    (cyphers.py:32-44 substackQuery)
#   platform_text  — platform rows where bio OR handle CONTAINS a needle
#                    (cyphers.py:45-67 twitterStuffs/newsy: bio, name,
#                    handle — the feed's account_id carries the
#                    name/handle surface)
#   bio_text       — ANY platform's bio CONTAINS a needle (cyphers.py:
#                    70-84 wicBios fulltext, platform-blind)
#   platform_id_text — handle/name ONLY, bio excluded (cyphers.py:85-95
#                    otherAspects)
#   website_url    — website account url CONTAINS a needle (cyphers.py:
#                    96-106), wallet = the profile's address column
INFLUENCER_TREE = [
    ("PopularMirrorAuthor", "SubstackWriter", 0.3,
     "both_platforms", ("Twitter", "Substack")),
    ("PopularMirrorAuthor", "SubstackWriter", 0.3,
     "platform_text", ("Twitter", ("substack",))),
    ("PopularMirrorAuthor", "SubstackWriter", 0.3,
     "platform_text", ("Twitter", ("newsletter",))),
    ("PopularMirrorAuthor", "Podcaster", 0.3,
     "bio_text", (("podcaster", "podcast"),)),
    ("PopularMirrorAuthor", "Podcaster", 0.3,
     "platform_id_text", ("Twitter", ("podcast",))),
    ("PopularMirrorAuthor", "Podcaster", 0.3,
     "website_url", (("podcast",),)),
]


def influencer_labels(
    accounts: DataFrame,
    websites: DataFrame | None = None,
    tree: list | None = None,
) -> DataFrame:
    """(address, platform, account_id, bio) platform-account rows +
    (website_url, address) profile websites → (entity_id, condition,
    context, weight) influencer labels (influencers/cyphers.py:32-106 —
    the substack / newsletter / podcast text-evidence arms; the
    account-graph arms MirrorInfluencer / DuneWizard / TwitterInfluencer
    live in the graph-WIC tree).

    The reference's ``contains`` gates are case-sensitive over
    mixed-case properties; bios here are matched lowercased (the repo's
    fulltext convention, same as profession_labels) and handles are
    already canonical-lowercase. An account with ANY matching feed row
    qualifies — the reference's MERGE last-write node property read the
    same way on this feed (see the feed comment).

    Scale: one scan of each feed, all arms evaluated as one
    struct-array explode (no per-rule pass), one dedup exchange."""
    tree = INFLUENCER_TREE if tree is None else tree
    bio = F.lower(F.col("bio"))
    acct = F.lower(F.col("account_id"))
    plat = F.col("platform")

    def _contains(col, needles):
        cond = F.lit(False)
        for n in needles:
            cond = cond | col.contains(n)
        return cond

    acc_structs, web_structs = [], []
    for condition, context, weight, arm, params in tree:
        st = F.struct(
            F.lit(condition).alias("condition"),
            F.lit(context).alias("context"),
            F.lit(float(weight)).alias("weight"),
        )
        if arm == "platform_text":
            p, needles = params
            acc_structs.append(
                F.when(
                    (plat == p) & (_contains(bio, needles) | _contains(acct, needles)),
                    st,
                )
            )
        elif arm == "bio_text":
            (needles,) = params
            acc_structs.append(F.when(_contains(bio, needles), st))
        elif arm == "platform_id_text":
            p, needles = params
            acc_structs.append(F.when((plat == p) & _contains(acct, needles), st))
        elif arm == "website_url":
            (needles,) = params
            web_structs.append(
                F.when(_contains(F.lower(F.col("website_url")), needles), st)
            )
        # both_platforms handled below (it is an intersection, not a row gate)
    wallet = F.concat(F.lit("Wallet:"), F.lower(F.trim("address"))).alias(
        "entity_id"
    )
    parts = []
    if acc_structs:
        parts.append(
            accounts.select(wallet, F.explode(F.array(*acc_structs)).alias("m"))
            .where(F.col("m").isNotNull())
        )
    if web_structs and websites is not None:
        parts.append(
            websites.select(wallet, F.explode(F.array(*web_structs)).alias("m"))
            .where(F.col("m").isNotNull())
        )
    for condition, context, weight, arm, params in tree:
        if arm != "both_platforms":
            continue
        pa, pb = params
        wa = accounts.where(plat == pa).select(wallet).dropDuplicates()
        wb = accounts.where(plat == pb).select(wallet).dropDuplicates()
        both = wa.join(wb, "entity_id")
        parts.append(
            both.select(
                "entity_id",
                F.struct(
                    F.lit(condition).alias("condition"),
                    F.lit(context).alias("context"),
                    F.lit(float(weight)).alias("weight"),
                ).alias("m"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _dedup_labels(
        out.select(
            "entity_id",
            F.col("m.condition").alias("condition"),
            F.col("m.context").alias("context"),
            F.col("m.weight").alias("weight"),
        )
    )


def wic_labels(events: DataFrame) -> DataFrame:
    """events → (entity_id, condition, context, weight) label rows, one
    pass per rule kind (not per rule): all type_count/type_value leaves
    share ONE aggregation over (user, type) — the tree walker batches
    rules by shape instead of firing 120 separate queries like the
    reference."""
    cents = F.round(F.col("value") * 100).cast("long")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents")
    )
    days = events.groupBy("user_id").agg(
        F.countDistinct(F.to_date("ts")).alias("active_days")
    )
    bursts = (
        events.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("hn"))
        .groupBy("user_id")
        .agg(F.max("hn").alias("max_burst"))
    )
    parts = []
    for condition, context, weight, kind, (etype, param) in WIC_TREE:
        if kind == "type_count":
            src = per_type.where(
                (F.col("event_type") == etype) & (F.col("n") >= param)
            )
        elif kind == "type_value":
            src = per_type.where(
                (F.col("event_type") == etype) & (F.col("cents") > param)
            )
        elif kind == "active_days":
            src = days.where(F.col("active_days") >= param)
        else:  # burst
            src = bursts.where(F.col("max_burst") >= param)
        parts.append(
            src.select(
                F.col("user_id").alias("entity_id"),
                F.lit(condition).alias("condition"),
                F.lit(context).alias("context"),
                F.lit(weight).alias("weight"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def audience_edges(labels: DataFrame) -> DataFrame:
    """WIC labels → (wallet)-[:IS_PART_OF]->(audience) edges.

    Reference: postProcessing/audiences/cyphers.py:58-67
    (create_audience_by_context: one audience per _Context match) and
    :69-78 (create_audience_by_condition: one per _Condition match). The
    reference's toRemove flag/sweep cycle (cyphers.py:44-56,82-94) is its
    idempotence mechanism for re-runs — restated here by the snapshot
    semantics of the materialized relation (each run emits the full
    current edge set; merge_upsert absorbs re-runs).

    Two distinct projections off ONE pass over the label relation —
    context- and condition-keyed audiences both ride the same scan; the
    union dedups per (wallet, audience) exactly as MERGE does.
    """
    wallet = F.col("entity_id").cast("string")
    by_ctx = labels.select(
        F.lit("Wallet").alias("subj_label"),
        wallet.alias("subj_key"),
        F.lit("IS_PART_OF").alias("pred"),
        F.lit("Audience").alias("obj_label"),
        F.col("context").alias("obj_key"),
        F.lit(1.0).cast("double").alias("weight"),
        F.lit("audience by context (audiences/cyphers.py:58-67)")
        .cast("string").alias("citation"),
    )
    by_cond = labels.select(
        F.lit("Wallet").alias("subj_label"),
        wallet.alias("subj_key"),
        F.lit("IS_PART_OF").alias("pred"),
        F.lit("Audience").alias("obj_label"),
        F.col("condition").alias("obj_key"),
        F.lit(1.0).cast("double").alias("weight"),
        F.lit("audience by condition (audiences/cyphers.py:69-78)")
        .cast("string").alias("citation"),
    )
    return by_ctx.unionByName(by_cond).dropDuplicates(
        ["subj_key", "pred", "obj_key", "citation"]
    )
