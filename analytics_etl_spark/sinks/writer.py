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
    from pyspark.errors import AnalysisException

    spark = df.sparkSession
    keys = list(partition_keys)
    try:
        existing = spark.read.parquet(path)
        doomed = existing.join(df.select(*keys).distinct(), on=keys, how="semi")
        count = doomed.count()
    except AnalysisException as e:
        # first-load shapes: the path doesn't exist, or exists but
        # holds no parquet yet (pre-created mount dir, died-mid-first-
        # write leftovers) — both mean "nothing to replace". Any OTHER
        # failure (permissions, corrupt footers, transient IO) must
        # propagate: swallowing it would report "0 rows to replace"
        # and let a confirmed overwrite proceed on a table we couldn't
        # even read — the exact blind delete this gate exists to
        # prevent.
        if not any(
            code in str(e) for code in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
        ):
            raise
        count = 0
    if not confirm:
        return count, False
    overwrite_partitions(df, path, partition_keys)
    return count, True


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_keys: tuple[str, ...] = DEFAULT_PARTITION_KEYS,
    files_per_partition: int = 1,
) -> tuple[int, int]:
    """Rewrite a partitioned table with few large files per partition.

    Streaming/incremental writers accrete small files (every
    micro-batch/backfill adds its own), and at scan time each file
    costs a task + footer read — the classic silent scan-throughput
    killer at warehouse scale. Compaction is the maintenance pass:
    read, hash-repartition WITHIN each partition to the target file
    count, dynamic-overwrite the same partitions (so a concurrent
    reader never sees a half-compacted table and untouched partitions
    are untouched). Returns (files_before, files_after).

    Read-then-overwrite-same-path is safe HERE because the repartition
    shuffle materializes every row before the first file is replaced;
    a purely narrow plan would race its own input (Spark rejects the
    direct form). On stores with non-atomic rename (S3 without a
    committer) prefer compact-to-staging + swap — same plan, two paths.
    """
    import glob
    import os

    def count_files() -> int:
        return sum(
            1
            for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            if os.path.isfile(f)
        )

    from pyspark.sql import functions as F

    before = count_files()
    df = spark.read.parquet(path)
    if files_per_partition == 1:
        # hash by the partition keys: each table-partition lands whole
        # in one task (one output file), tasks stay parallel ACROSS
        # partitions — never a global funnel through one task
        compacted = df.repartition(*partition_keys)
    else:
        salt = F.pmod(F.hash(*df.columns), F.lit(files_per_partition)).alias("_salt")
        compacted = df.withColumn("_salt", salt).repartition(
            *partition_keys, "_salt"
        ).drop("_salt")
    overwrite_partitions(compacted, path, partition_keys)
    return before, count_files()


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
    # repartition, not coalesce: coalesce propagates its narrow-
    # dependency collapse UP the plan, so an expensive 200-partition
    # transform upstream would itself run in num_partitions tasks —
    # a wall-clock cliff far costlier than repartition's one shuffle,
    # which keeps upstream wide and delivers exactly num_partitions
    # concurrent connections at the sink.
    writer = df.repartition(num_partitions) if num_partitions else df
    props = {"batchsize": str(batchsize), **(properties or {})}
    writer.write.mode(mode).jdbc(url, table, properties=props)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    partition_keys: tuple[str, ...] | None = None,
) -> None:
    """MERGE (upsert) for plain parquet — keyed row replacement where
    no transaction-log format is available (this environment has no
    Delta/Iceberg jars, declared since round 1).

    Semantics: rows in the target whose key appears in ``updates`` are
    replaced; all other target rows are kept; update rows with new
    keys are inserted. Shape: one anti-join of target against the
    distinct update keys (key-sized build side — AQE broadcasts it
    when small) + unionByName.

    The rewrite goes to a TEMP directory first, then swaps — Spark
    reads lazily, so writing over ``target_path`` while the plan still
    references its files is the classic self-overwrite corruption.
    Swap via rename is atomic on a real filesystem; object stores /
    HDFS deployments do the same dance through their commit protocol
    or a table format's log. This is also the honest cost statement:
    without a log, MERGE IS a full-table rewrite — when the partition
    columns are part of the key, use ``merge_upsert_partitioned``
    below (rewrites only the touched partitions); a table format turns
    it into a file-level operation. Documented trade, not a hidden one.
    """
    import os
    import shutil

    target = spark.read.parquet(target_path)
    keys = [c for c in key_cols]
    keep = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = keep.unionByName(updates)
    tmp = target_path.rstrip("/") + ".__merge_tmp__"
    # partition_keys preserves a partitioned target's layout across
    # the rewrite (a layout-destroying MERGE would silently kill every
    # downstream query's partition pruning); it does NOT scope the
    # rewrite — that's merge_upsert_partitioned below
    writer = merged.repartition(*partition_keys) if partition_keys else merged
    w = writer.write.mode("overwrite")
    if partition_keys:
        w = w.partitionBy(*partition_keys)
    w.parquet(tmp)
    shutil.rmtree(target_path)
    os.rename(tmp, target_path)


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    partition_keys: tuple[str, ...] = DEFAULT_PARTITION_KEYS,
) -> int:
    """Partition-scoped MERGE — the daily keyed-upsert path at scale.

    ``merge_upsert`` above is an honest full-table rewrite; at 100 TB
    a daily upsert that touches 2 of 10,000 partitions cannot afford
    to rewrite the other 9,998. When the partition columns are part of
    the merge key, the touched partitions are derivable from the
    updates alone, and MERGE becomes: scan ONLY those partitions,
    anti-join against the update keys, dynamic-overwrite the same
    partitions. Untouched partition files are never opened, let alone
    rewritten — pinned byte-identical in tests/test_pipeline.py. The
    reference's own idempotency op deletes by (location_id, month) —
    partition values — for exactly this reason
    (database_service.py:415-475).

    Contract: ``partition_keys ⊆ key_cols`` (partition-stable upsert).
    A key's partition columns locate every prior version of that row,
    so no partition outside the updates' own tuples can hold a matched
    row. Without this, an update could silently leave a stale twin in
    a partition the merge never looked at — that shape needs the
    full-table ``merge_upsert`` (documented fallback).

    Safety of overwrite-what-you-read: the terminal
    ``repartition(*partition_keys)`` is a shuffle, so every input row
    (target scan included) is materialized map-side before the write
    stage replaces any file — the same stage-barrier argument as
    ``compact_partitions``; it also lands each rewritten partition as
    one file. The touched-partition list is collected driver-side but
    is bounded by the table's partition count (locations × months),
    not row count.

    Returns the number of partitions rewritten.
    """
    from functools import reduce

    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    missing = [k for k in partition_keys if k not in key_cols]
    if missing:
        raise ValueError(
            f"partition-scoped MERGE requires partition_keys ⊆ key_cols; "
            f"{missing} not in {list(key_cols)} — rows could move partitions "
            f"and leave stale twins. Use merge_upsert (full rewrite) instead."
        )
    pkeys = list(partition_keys)
    touched = [tuple(r) for r in updates.select(*pkeys).distinct().collect()]
    if not touched:
        return 0
    try:
        target = spark.read.parquet(target_path)
    except AnalysisException as e:
        if not any(
            code in str(e) for code in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
        ):
            raise
        # first load: nothing to merge against
        append_partitioned(updates, target_path, partition_keys)
        return len(touched)
    # partition-pruned scan: OR of per-tuple AND predicates on the
    # partition columns only — Catalyst turns this into directory
    # pruning, so the 9,998 untouched partitions are never read
    pred = reduce(
        lambda a, b: a | b,
        [
            reduce(lambda a, b: a & b, [F.col(k) == v for k, v in zip(pkeys, t)])
            for t in touched
        ],
    )
    scoped = target.filter(pred)
    keep = scoped.join(updates.select(*key_cols).distinct(), list(key_cols), "left_anti")
    merged = keep.unionByName(updates).repartition(*pkeys)
    overwrite_partitions(merged, target_path, partition_keys)
    return len(touched)
