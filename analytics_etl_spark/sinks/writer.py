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


def overwrite_partitions_gated(
    df: DataFrame,
    path: str,
    partition_keys: tuple[str, ...] = DEFAULT_PARTITION_KEYS,
    confirm: bool = False,
) -> tuple[int, bool]:
    """S10 with the reference's count-first, confirm-gated shape
    (database_service.py:443-464: count → require confirm=True →
    DELETE → reload).

    Returns (rows_that_would_be_replaced, replaced). With
    confirm=False this is a DRY RUN: it counts the existing rows in
    the partitions ``df`` would overwrite and touches nothing. The
    count uses a semi join against df's distinct partition tuples —
    partition-pruned at the scan, no full-table read.
    """
    spark = df.sparkSession
    keys = list(partition_keys)
    try:
        existing = spark.read.parquet(path)
        doomed = existing.join(df.select(*keys).distinct(), on=keys, how="semi")
        count = doomed.count()
    except Exception:  # first load: nothing there to replace
        count = 0
    if not confirm:
        return count, False
    overwrite_partitions(df, path, partition_keys)
    return count, True


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    batchsize: int = 100,
    mode: str = "append",
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """S8 against a real warehouse: batched JDBC insert.

    The reference batch-inserts into PostgreSQL with execute_batch and
    a page_size of 50-100 (database_service.py:251-293); Spark's JDBC
    writer has the same knob (``batchsize``, statements per round
    trip) but executes per-partition on executors — N partitions
    insert concurrently, each its own transaction. That per-partition
    transactionality is the semantic difference from the reference's
    single connection + one commit: a failed task retries its batch
    (idempotent only if the table has a key / the write is append-to-
    staging). ``num_partitions`` caps connection fan-out so 1000
    executors don't open 1000 connections on one warehouse.

    Driver jars: the caller's cluster must carry the JDBC driver
    (tests use Spark's bundled Derby; postgres needs the pgjdbc jar).
    """
    writer = df.repartition(num_partitions) if num_partitions else df
    props = {"batchsize": str(batchsize), **(properties or {})}
    writer.write.mode(mode).jdbc(url, table, properties=props)
