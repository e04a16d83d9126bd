"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship KG-construction pipeline on sf0.001:
                pages → extract → mentions → link → canonicalize → triples.
queries()     — one entry per implemented operator family (SURVEY.md §2 +
                training-data ops); each callable: (spark, sf_dir) → DataFrame.
oracle_sql()  — matching DuckDB SQL per query (column names aligned).

Implementation lives in web3_knowledge_graph_spark.driver_queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web3_knowledge_graph_spark.driver_queries import (  # noqa: E402
    all_oracles,
    all_queries,
    flagship_triples,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
