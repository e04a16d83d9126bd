"""WIC-style rule labeling + reputation scoring.

Reference: the "wallet in context" analytics layer — a conditions→contexts
tree where every context is one Cypher rule MERGE-ing
(wallet)-[:_HAS_CONTEXT]->(context) with a weight
(/root/reference/pipelines/analytics/wic/WICAnalysis.py:22-35 tree walker,
WICCypher.py:20-62 mark-sweep refresh, example rules
analytics/wic/interests/cyphers.py:10-80, condition trees
analytics/wic/traders/analyze.py:12-92), then a weighted-degree score
normalized by the global min/max ×100
(analytics/wicScore/cyphers.py:17-23, wicScore/analyze.py:16-30).

Spark restatement: a rule is any callable DataFrame→DataFrame(entity_id,
context, weight); the rule set unions into one labels relation (the
mark-sweep refresh becomes an idempotent overwrite); scoring is a groupBy
sum + a global-aggregate broadcast join.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Rule = Callable[[], DataFrame]  # returns (entity_id, context, weight)


def apply_rules(rules: dict[str, Rule]) -> DataFrame:
    """Walk the rule tree (flat here; the reference nests conditions→contexts
    — WICAnalysis.py:22-33) and union the label relations."""
    out: DataFrame | None = None
    for context, rule in rules.items():
        labeled = rule().select(
            F.col("entity_id"),
            F.lit(context).alias("context"),
            F.col("weight").cast("double").alias("weight"),
        )
        out = labeled if out is None else out.unionByName(labeled)
    assert out is not None, "no rules given"
    return out.dropDuplicates(["entity_id", "context"])


def reputation_scores(labels: DataFrame, normalize: str = "max") -> DataFrame:
    """Weighted degree per entity, min/max-normalized ×100.

    wicScore/cyphers.py:18-23: score = sum(weights) per wallet;
    wicScore/analyze.py:16-30: ÷ global max (or min) × 100. The global
    aggregate is a 1-row DataFrame crossJoin-broadcast — no second shuffle
    of the big side.
    """
    deg = labels.groupBy("entity_id").agg(F.sum("weight").alias("raw_score"))
    bound = deg.agg(
        F.max("raw_score").alias("_max"), F.min("raw_score").alias("_min")
    )
    denom = F.col("_max") if normalize == "max" else F.col("_min")
    return (
        deg.crossJoin(F.broadcast(bound))
        .select(
            "entity_id",
            "raw_score",
            (F.col("raw_score") / denom * 100.0).alias("reputation_score"),
        )
    )
