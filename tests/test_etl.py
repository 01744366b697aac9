"""Reference-parity transform tests — mirrors the reference's inline
self-tests (app/services/etl_service.py:424-551), asserted properly."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from analytics_etl_spark.operators.etl import (
    denylist_filter,
    explode_line_items,
    project_sales,
    quarantine,
    revenue_filter,
    transform_orders,
    valid_line_item_pred,
    valid_sales_row_pred,
)


def test_explode_skips_missing_line_items(nested_orders):
    exploded = explode_line_items(nested_orders)
    ids = {r["id"] for r in exploded.select("id").distinct().collect()}
    assert "empty" not in ids  # reference etl_service.py:252-254
    assert exploded.count() == 6  # 2 + 1 + 2×1 + 1


def test_revenue_and_denylist_filters(nested_orders):
    exploded = explode_line_items(nested_orders)
    kept = denylist_filter(revenue_filter(exploded))
    names = [r["li"]["name"] for r in kept.collect()]
    assert "To Go Cup" not in names  # denylist (etl_service.py:44-48)
    assert "free water" not in names  # zero-revenue + denylist
    assert "Iced Lavander latte" in names


def test_golden_transform_sale_price_665(nested_orders):
    """Reference golden check: base 565 + paid modifier 100 → 6.65,
    $0 'To Go' modifier excluded (etl_service.py:524-538)."""
    sales = transform_orders(nested_orders)
    golden = sales.filter(F.col("item_name") == "Iced Lavander latte").collect()
    assert len(golden) == 1
    row = golden[0]
    assert row["sale_price"] == Decimal("6.65")
    assert row["modifiers"] == "Oat Milk"
    assert row["item_category"] == "Large"
    assert row["qty"] == 1
    assert row["month"] == "2025-11"
    assert row["day_of_week"] == "Monday"
    # 13:27 UTC → 07:27 CST
    assert row["sale_timestamp"].hour == 7


def test_dst_awareness(nested_orders):
    """UTC→Chicago honors DST: 08:30Z → 02:30 CST (Nov, UTC-6) while
    06:30Z → 01:30 CDT (Jun, UTC-5)."""
    sales = transform_orders(nested_orders)
    by_id = {r["sale_timestamp"]: r for r in sales.filter(F.col("item_name") == "espresso").collect()}
    hours = sorted(ts.hour for ts in by_id)
    assert hours == [1, 2]


def test_invalid_quantity_quarantined(nested_orders):
    exploded = explode_line_items(nested_orders)
    valid, rejects = quarantine(exploded, valid_line_item_pred())
    bad = [r["li"]["name"] for r in rejects.collect()]
    assert "muffin" in bad  # quantity 'two' fails the int cast
    good = [r["li"]["name"] for r in valid.collect()]
    assert "muffin" not in good


def test_sales_row_constraints(spark, nested_orders):
    sales = transform_orders(nested_orders)
    valid, rejects = quarantine(sales, valid_sales_row_pred())
    assert rejects.count() == 0
    assert valid.count() == sales.count()
    # violate the month regex on purpose
    broken = sales.withColumn("month", F.lit("2025/11"))
    _, r2 = quarantine(broken, valid_sales_row_pred())
    assert r2.count() == broken.count()


def test_project_sales_schema(nested_orders):
    sales = transform_orders(nested_orders)
    assert sales.columns == [
        "item_name",
        "sale_price",
        "qty",
        "sale_timestamp",
        "month",
        "day_of_week",
        "item_category",
        "square_location_id",
        "modifiers",
    ]
    assert dict(sales.dtypes)["sale_price"] == "decimal(12,2)"


def test_strip_markup(spark):
    from analytics_etl_spark.functions.text import strip_markup

    rows = [
        (1, "<html><head><style>p{color:red}</style></head>"
            "<body><h1>Title</h1><p>Hello <b>world</b> &amp; friends</p>"
            "<script>var x = '<p>not text</p>';</script></body></html>"),
        (2, "plain text stays"),
        (3, "a &lt;tag&gt; literal and a gt &gt; sign"),
        (4, "<div class='x'>multi\n  line</div>"),
    ]
    df = spark.createDataFrame(rows, ["id", "html"])
    got = {r["id"]: r["t"] for r in df.select("id", strip_markup("html").alias("t")).collect()}
    assert got[1] == "Title Hello world & friends"
    assert got[2] == "plain text stays"
    assert got[3] == 'a <tag> literal and a gt > sign'
    assert got[4] == "multi line"
    # plan stays JVM-only
    plan = df.select(strip_markup("html"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_collated_grouping_matches_lower_normalization(spark):
    """Spark 4 collations: grouping on a UTF8_LCASE-collated column
    equals normalize-then-group — the engine-native form of
    case-insensitive semantics (joins/aggs without materializing a
    lowered copy of the column). Group COUNTS must agree with the
    lower() form; the collated representative is whichever casing was
    seen (engine-chosen), so only sizes are compared."""
    from pyspark.sql import functions as F

    rows = [("Apple",), ("apple",), ("APPLE",), ("pear",), ("Pear",), ("fig",)]
    df = spark.createDataFrame(rows, ["w"])
    collated = {
        r["count"]
        for r in df.groupBy(F.collate(F.col("w"), "UTF8_LCASE").alias("g")).count().collect()
    }
    lowered = {
        r["count"] for r in df.groupBy(F.lower("w").alias("g")).count().collect()
    }
    assert sorted(collated) == sorted(lowered) == [1, 2, 3]
