"""Flat-file CSV ingest with quarantine — the landing-zone format.

Warehouse exports, partner feeds, and hand-maintained dimension files
arrive as CSV. Same defensive contract as the JSON path: a DECLARED
schema read PERMISSIVE, malformed lines captured in
``_corrupt_record`` and split to a rejects frame instead of failing
the load — one pass, no Python, schema errors attributable per line.
At scale CSV is split-table (parallel scan) but schema-blind and
column-prune-blind: the landing pattern is CSV → validate/quarantine →
rewrite parquet, after which every downstream query gets pushdown and
pruning. ``sales_csv_roundtrip`` in tests pins that the parquet
rewrite preserves the rows bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SALES_CSV_SCHEMA = T.StructType(
    [
        T.StructField("item_name", T.StringType()),
        T.StructField("sale_price", T.DoubleType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("month", T.StringType()),
        T.StructField("location_id", T.IntegerType()),
    ]
)


def read_sales_csv(
    spark: SparkSession, path: str, schema: T.StructType = SALES_CSV_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """path (CSV with header) → (valid_rows, corrupt_rows).

    A row is corrupt when it fails to parse against the declared
    schema (wrong arity, untypeable field) — it lands whole in
    ``_corrupt_record`` for the quarantine sink, mirroring
    read_orders_json.
    """
    read_schema = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    raw = raw.cache()  # same parser-rerun constraint as the JSON path
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad


def land_to_parquet(df: DataFrame, path: str) -> None:
    """The second half of the landing pattern: rewrite the validated
    CSV frame as parquet so downstream scans get predicate pushdown,
    column pruning, and real statistics."""
    df.write.mode("overwrite").parquet(path)
