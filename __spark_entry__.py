"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``analytics_etl_spark.queries`` — the engine's query
registry (one entry per operator in SURVEY.md §2 + scale extensions).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from analytics_etl_spark import queries as q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A3 monthly revenue per location) on sf0.001."""
    return q.REGISTRY["flagship_monthly_revenue"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
