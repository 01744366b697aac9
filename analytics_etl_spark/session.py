"""SparkSession factory tuned for the engine.

Scale notes (the settings below are chosen for a real cluster, then
shrunk for local[N] testing):

- AQE on: runtime coalescing of shuffle partitions + skew-join split
  replaces hand-tuned partition counts at 100 TB.
- ``spark.sql.session.timeZone=UTC``: the testdata parquet timestamps
  are NTZ; pinning UTC makes every date function deterministic and
  matches the DuckDB oracle (naive timestamps). Timezone-aware
  semantics (the reference pins America/Chicago at row level,
  reference app/services/etl_service.py:52) are expressed explicitly
  via ``from_utc_timestamp`` in ``functions.datetime_fns`` instead of
  via session state — explicit beats ambient at scale.
- broadcast threshold 64 MB: every dimension in the star schema
  (region/nation/customer/supplier/part at reasonable SF) should
  broadcast; fact-fact joins still sort-merge.
- shuffle partitions default to 2×cores locally; on a cluster AQE
  coalesces from a deliberately high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "analytics-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        # SPARK_GRAFT_MASTER lets the portability harness
        # (tools/local_cluster_check.py) run the same engine under
        # local-cluster[...] — real executor PROCESSES with closure
        # serialization, loopback shuffle, and actually-shipped
        # broadcasts — without touching any call site.
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # r16 (guide §1.2/§4): the unrolled-codegen vector kernels
        # (similarity.dot dim path) generate large classes whose
        # janino compile costs 1-4 s each. The default generated-class
        # cache (100 entries, spark.sql.codegen.cache.maxEntries) is
        # smaller than one bench battery's stage count, so compiles
        # were re-paid on every action (measured: similarity_topk_
        # cosine exec 4.0 s cold -> 0.55 s once cached). 1024 entries
        # holds every stage of the full battery; generated classes
        # are small (the cache stores class references), so the
        # driver-memory cost is negligible. Scale-neutral: a
        # long-running 100 TB driver compiles each plan once, same as
        # here; this is NOT a local[N]-only knob. Read once at first
        # codegen, hence set at session build.
        .config("spark.sql.codegen.cache.maxEntries", "1024")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master.startswith("local-cluster"):
        # executor JVMs must fit the worker memory declared in the
        # master string (local-cluster[n, cores, MEM_MB])
        builder = builder.config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECUTOR_MEMORY", "6g"),
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
