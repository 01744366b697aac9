"""Sinks — partitioned parquet writers with idempotent re-run semantics."""

from analytics_etl_spark.sinks.writer import (  # noqa: F401
    append_partitioned,
    overwrite_partitions,
    read_sales,
)
