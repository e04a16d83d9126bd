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
