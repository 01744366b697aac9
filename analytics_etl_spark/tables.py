"""Table catalog over the parquet testdata star schema.

The reference's "catalog" is a PostgreSQL database with a `sales` fact
list-partitioned by location and a `locations` dimension
(reference README.md:109-141). Here the catalog is a set of parquet
tables (TPC-H-ish star schema + events/documents/embeddings, see
/root/repo/TESTDATA.md); loading is a plain ``spark.read.parquet`` so
Catalyst gets pushdown/pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to always broadcast in joins at any SF we
# target (region/nation are bounded; customer/supplier/part grow with
# SF but stay far below fact size — broadcast decisions for those are
# left to the optimizer via autoBroadcastJoinThreshold).
ALWAYS_BROADCAST = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # Deterministic regardless of the caller's session defaults: UTC
    # session tz (all date functions + the DuckDB oracle assume naive
    # UTC) and nanos-as-long so parquet TIMESTAMP(NANOS) columns load.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in the parquet; Spark surfaces
        # it as long nanos (legacy conf above). Truncate to micros —
        # exactly what DuckDB does when it reads the same file.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a lazy DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for the SQL API surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
