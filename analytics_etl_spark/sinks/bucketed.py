"""Bucketed tables — shuffle-free co-located fact-fact joins.

At 100 TB the one unavoidable shuffle in the flagship query is
lineitem ⋈ orders on the order key. Bucketing BOTH tables on that key
at write time moves the shuffle from every query to the (single)
ingest: subsequent joins read co-located buckets and sort-merge with
NO Exchange. `tests/test_scale_utils.py` asserts exactly that on the
physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, sort: bool = True
) -> None:
    """Persist as a bucketed+sorted managed table (parquet)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
