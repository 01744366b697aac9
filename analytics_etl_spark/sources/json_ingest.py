"""Nested-order JSON ingest with quarantine — the schema-on-read path.

The reference parses Square JSON defensively per row with try/except
(reference app/services/etl_service.py:184-215, 282-321). The engine
declares the schema and reads PERMISSIVE: malformed records land in
``_corrupt_record`` instead of raising, and the caller splits them to
a rejects frame (P7). At scale this is one pass, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from analytics_etl_spark.schemas import ORDER_SCHEMA

_READ_SCHEMA = T.StructType(
    ORDER_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
)


def read_orders_json(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """path (JSONL of order documents) → (orders, corrupt_rows)."""
    raw = spark.read.schema(_READ_SCHEMA).option("mode", "PERMISSIVE").json(path)
    # Spark disallows referencing only _corrupt_record from a raw file
    # scan (the parser would have to re-run per filter); caching the
    # parsed frame is the documented pattern and serves both splits.
    raw = raw.cache()
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad


def orders_from_json_strings(spark: SparkSession, df: DataFrame, col: str) -> DataFrame:
    """Parse a string column of order JSON (e.g. off a message bus)
    into the typed nested schema with from_json."""
    return df.select(F.from_json(F.col(col), ORDER_SCHEMA).alias("o")).select("o.*")


def read_evolved_parquet(spark, path: str):
    """Schema-evolution read: union the schemas of all files under
    `path` (mergeSchema), so partitions written before a column
    existed surface it as NULL instead of failing the scan — the
    contract a long-lived 100 TB table needs, since re-writing old
    partitions on every schema change is not an option. Columns can
    be ADDED this way; type CHANGES still (correctly) fail the read.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
