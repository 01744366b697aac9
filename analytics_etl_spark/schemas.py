"""Explicit StructTypes for the reference's data model (SURVEY.md §1.1).

The reference reads Square order JSON schema-on-read with defensive
``.get()`` calls (reference app/services/etl_service.py:184-215); the
engine declares the schema once so Catalyst can prune columns and the
reader can quarantine corrupt records instead of try/except per row.
"""

from __future__ import annotations

from pyspark.sql import types as T

MONEY_STRUCT = T.StructType(
    [
        # integer cents (reference etl_service.py:291)
        T.StructField("amount", T.LongType()),
        T.StructField("currency", T.StringType()),
    ]
)

MODIFIER_STRUCT = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("base_price_money", MONEY_STRUCT),
    ]
)

LINE_ITEM_STRUCT = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("variation_name", T.StringType()),
        # quantity arrives as a STRING (reference etl_service.py:200,285)
        T.StructField("quantity", T.StringType()),
        T.StructField("base_price_money", MONEY_STRUCT),
        T.StructField("gross_sales_money", MONEY_STRUCT),
        T.StructField("modifiers", T.ArrayType(MODIFIER_STRUCT)),
    ]
)

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("location_id", T.StringType()),
        # RFC3339 UTC string (reference etl_service.py:64)
        T.StructField("closed_at", T.StringType()),
        T.StructField("line_items", T.ArrayType(LINE_ITEM_STRUCT)),
    ]
)

LOCATIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), nullable=False),
        T.StructField("name", T.StringType()),
        T.StructField("square_id", T.StringType()),
    ]
)

# Flat sales fact (reference etl_service.py:298-308, README.md:120-133).
SALES_SCHEMA = T.StructType(
    [
        T.StructField("sale_id", T.LongType()),
        T.StructField("item_name", T.StringType(), nullable=False),
        T.StructField("sale_price", T.DecimalType(12, 2)),
        T.StructField("qty", T.IntegerType()),
        T.StructField("sale_timestamp", T.TimestampType()),
        T.StructField("month", T.StringType()),
        T.StructField("day_of_week", T.StringType()),
        T.StructField("item_category", T.StringType()),
        T.StructField("location_id", T.IntegerType()),
        T.StructField("modifiers", T.StringType()),
    ]
)
