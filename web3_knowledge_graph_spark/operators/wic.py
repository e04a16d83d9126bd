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


# Interests analyzer tree (analytics/wic/interests/analyze.py:11-80 declares
# category → context; the keyword lists restate the per-context fulltext
# predicates in interests/cyphers.py:33-43 etc., e.g. Music = 'music' OR
# 'album' OR 'musician'). Reference weight for every interests context is 0
# (analyze.py "weight": 0) — interests label without scoring.
INTERESTS_TREE = [
    ("ArtCultureEntertainment", "Music", 0.0, ("music", "album", "musician", "concert")),
    ("ArtCultureEntertainment", "Gaming", 0.0, ("gaming", "gamer", "videogame")),
    ("ArtCultureEntertainment", "FilmVideo", 0.0, ("film", "video", "cinema")),
    ("ArtCultureEntertainment", "Photography", 0.0, ("photography", "photographer", "camera")),
    ("ArtCultureEntertainment", "WritingPublishing", 0.0, ("writing", "writer", "publishing")),
    ("ScienceTech", "DataScience", 0.0, ("data", "statistics", "analytics")),
    ("ScienceTech", "Engineering", 0.0, ("engineer", "software", "developer")),
    ("Finance", "Defi", 0.0, ("defi", "yield", "liquidity")),
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
    return (
        toks.join(F.broadcast(kw_df), "kw")
        .select("entity_id", "condition", "context", "weight")
        .dropDuplicates(["entity_id", "context"])
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
