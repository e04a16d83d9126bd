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
    # deterministic survivor: a rule may emit two weights for one
    # (entity_id, context) pair, and dropDuplicates on the key subset
    # would flip the kept row between shuffles (the wic._dedup_labels
    # rationale) — keep the minimum weight
    return (
        out.groupBy("entity_id", "context")
        .agg(F.min("weight").alias("weight"))
        .select("entity_id", "context", "weight")
    )


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


def reputation_scores_signed(labels: DataFrame) -> DataFrame:
    """The reference's FULL sign-dependent normalization
    (wicScore/analyze.py:16-30 compute_score): weighted degree per entity;
    NEGATIVE degrees divide by the global MIN, positive by the global MAX,
    zeros stay 0 — ×100. Reference quirk kept deliberately: deg/min for a
    negative degree is a POSITIVE ratio (both operands negative), so the
    most-negative wallet scores +100 — the reference normalizes MAGNITUDE
    within each sign, it does not produce a signed scale.

    Every rule weight in the trees is an exact multiple of 0.025, so
    degrees fold as fixed-point MILLI-integers (exact, order-free sum —
    the double divisions at the end are single deterministic IEEE ops on
    identical operands in any engine). One shuffle on entity_id; the
    global min/max is a 1-row broadcast.
    """
    milli = F.round(F.col("weight") * 1000).cast("bigint")
    deg = (
        labels.select("entity_id", milli.alias("w"))
        .groupBy("entity_id")
        .agg(F.sum("w").alias("m"))
    )
    bound = deg.agg(F.max("m").alias("_mx"), F.min("m").alias("_mn"))
    return deg.crossJoin(F.broadcast(bound)).select(
        "entity_id",
        (F.col("m") / F.lit(1000.0)).alias("raw_score"),
        F.when(F.col("m") < 0, F.col("m") / F.col("_mn") * 100.0)
        .when(F.col("m") > 0, F.col("m") / F.col("_mx") * 100.0)
        .otherwise(F.lit(0.0))
        .alias("reputation_score"),
    )
