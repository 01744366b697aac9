"""Aggregation operators — A1-A5 parity + generalized surface (SURVEY.md §2.4).

The reference's aggregates are SQL strings run on PostgreSQL
(reference app/services/database_service.py:341-412 and the BI queries
in README.md:274-288). Here they are hash aggregations with automatic
partial/final (map-side combine) — the shuffle carries one row per
group per task, not the fact table.

Money totals use DECIMAL arithmetic (see functions.money): exact and
associative, so results are identical under any partitioning — the
correctness property that matters on 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from analytics_etl_spark.functions.money import money_amount


def count_by(df: DataFrame, *keys: str, alias: str = "cnt") -> DataFrame:
    """A1 — COUNT(*) per group (reference get_sales_count_by_location,
    database_service.py:341-370)."""
    return df.groupBy(*keys).agg(F.count("*").alias(alias))


def date_range_by(df: DataFrame, ts_col: str, *keys: str) -> DataFrame:
    """A2 — MIN/MAX of a date per group (reference get_sales_date_range,
    database_service.py:373-412)."""
    d = F.to_date(ts_col)
    return df.groupBy(*keys).agg(
        F.min(d).alias("first_sale_date"), F.max(d).alias("last_sale_date")
    )


def revenue_summary(
    sales: DataFrame,
    price_col: str = "sale_price",
    qty_col: str = "qty",
    keys: tuple[str, ...] = ("month", "location_id"),
) -> DataFrame:
    """A3 — the flagship BI aggregate (reference README.md:280-288):

        SELECT month, location_id, COUNT(*) order_count,
               SUM(sale_price * qty) total_revenue
        FROM sales GROUP BY 1,2 ORDER BY month DESC
    """
    revenue = money_amount(price_col) * F.col(qty_col).cast("decimal(12,2)")
    return (
        sales.groupBy(*keys)
        .agg(
            F.count("*").alias("order_count"),
            F.sum(revenue).alias("total_revenue"),
        )
        .orderBy(F.desc(keys[0]), *keys[1:])
    )


def grouped_stats(df: DataFrame, value_col: str, *keys: str) -> DataFrame:
    """Generalized numeric profile per group (extension surface)."""
    v = money_amount(value_col)
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(v).alias("total"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )
