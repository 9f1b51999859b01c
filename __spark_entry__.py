"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``aroa_etl_spark.plans.catalog`` — the engine's query
catalog, where every SURVEY.md §2 operator is registered as a
(spark_builder, duckdb_oracle_sql) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aroa_etl_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return catalog.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
