"""Partitioned sink — S8/S9/S10 in SURVEY.md §2.1.

The reference bulk-inserts into PostgreSQL list-partitioned by
location (reference app/services/database_service.py:214-338) and
makes re-runs idempotent by hand: count → confirm → DELETE by
(location_id, month) → reload (database_service.py:415-475). Here:

- S8 batch insert  → ``df.write.partitionBy(...).parquet`` — batching,
  atomic task commits, and speculative-retry safety come from the
  committer; no hand-rolled transactions.
- S9 retry/backoff → Spark task retries (spark.task.maxFailures).
- S10 delete-then-reload → dynamic partition overwrite: ONLY the
  partitions present in the incoming frame are replaced, atomically
  per partition. This is the engine's one real semantic decision
  (SURVEY.md §4 R10).

Partition layout (location_id, month) mirrors the reference's LIST
partitioning + month index (reference README.md:133-141): BI queries
filtered on either key prune directories instead of scanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PARTITION_KEYS = ("location_id", "month")


def append_partitioned(
    df: DataFrame, path: str, partition_keys: tuple[str, ...] = DEFAULT_PARTITION_KEYS
) -> None:
    """S8 — append new rows under the partition layout."""
    df.write.mode("append").partitionBy(*partition_keys).parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_keys: tuple[str, ...] = DEFAULT_PARTITION_KEYS
) -> None:
    """S10 — idempotent re-run: replace exactly the partitions present
    in ``df``, leave all others untouched (delete-then-reload without
    the delete)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_keys).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_sales(spark: SparkSession, path: str) -> DataFrame:
    """Read the sales table back; partition keys become columns and
    filters on them prune directories."""
    return spark.read.parquet(path)
