"""Bipartite projection — co-occurrence graph from a (partition, key) relation.

Reference: /root/reference/pipelines/analytics/helpers/networks.py:8-46
builds a dense biadjacency matrix, multiplies it with its transpose, zeroes
the diagonal, thresholds and binarizes. That is O(top² · bottom) dense
matmul on the driver; the Spark restatement is the sparse equivalent — a
self-join on the shared bottom key with a count aggregate — which scales
linearly in the number of co-occurrence pairs and never materializes a
matrix.

Skew note: a viral bottom key (one page mentioning thousands of entities)
makes the self-join quadratic in that key's block; ``max_key_degree`` drops
such keys (they connect everything to everything — no signal), the same
guard as linking.same_key_links.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bipartite_project(
    rel: DataFrame,
    bottom_col: str,
    top_col: str,
    threshold: int = 1,
    max_key_degree: int = 10_000,
) -> DataFrame:
    """rel(bottom, top) → (top_a, top_b, shared) where shared = number of
    distinct bottom keys the pair co-occurs in, shared ≥ threshold, a < b."""
    r = rel.select(
        F.col(bottom_col).alias("b"), F.col(top_col).alias("t")
    ).distinct()
    deg = r.groupBy("b").agg(F.count(F.lit(1)).alias("d"))
    r = r.join(deg.where(F.col("d") <= max_key_degree).select("b"), "b")
    a, c = r.alias("a"), r.alias("c")
    return (
        a.join(c, (F.col("a.b") == F.col("c.b")) & (F.col("a.t") < F.col("c.t")))
        .groupBy(F.col("a.t").alias("top_a"), F.col("c.t").alias("top_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= threshold)
    )


def bipartite_project_oracle_sql(
    rel_cte: str,
    bottom: str,
    top: str,
    threshold: int,
    max_key_degree: int = 10_000,
) -> str:
    """DuckDB CTE chain replaying ``bipartite_project`` plus the undirected
    symmetrization the graph operators expect, ending in ``e(a, b, w)``.
    ``rel_cte`` must define ``rel(<bottom>, <top>)`` already DISTINCT.

    Single source of truth for the replay: before this generator, the
    deg-cap / threshold / symmetrize shape was hand-copied into each
    oracle string, so changing the operator's ``max_key_degree`` default
    could silently desynchronize several oracles at once (the same
    argument as label_propagation_oracle_sql / hits_oracle_sql).
    """
    return f"""{rel_cte},
deg AS (SELECT {bottom} AS bk FROM rel GROUP BY {bottom} HAVING COUNT(*) <= {max_key_degree}),
r2 AS (SELECT rel.* FROM rel JOIN deg ON rel.{bottom} = deg.bk),
e0 AS (
  SELECT x.{top} AS a, y.{top} AS b, CAST(COUNT(*) AS BIGINT) AS w
  FROM r2 x JOIN r2 y ON x.{bottom} = y.{bottom} AND x.{top} < y.{top}
  GROUP BY x.{top}, y.{top} HAVING COUNT(*) >= {threshold}),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0)"""
