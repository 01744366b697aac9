"""Reference-parity ETL operators: explode / project / filter / validate.

Covers P1-P8 in SURVEY.md §2.2. The reference implements these as a
per-order Python loop with try/except row quarantine
(reference app/services/etl_service.py:218-360); here each is one lazy
DataFrame transformation, so the whole chain fuses into a single
whole-stage-codegen pass with no materialized intermediates. At scale
the chain is shuffle-free: explode/filter/project are narrow, and the
location enrichment join broadcasts (see joins.py).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from analytics_etl_spark.functions.arrays import (
    join_paid_modifier_names,
    modifier_price_total_cents,
)
from analytics_etl_spark.functions.datetime_fns import (
    day_of_week_name,
    month_str,
    parse_rfc3339,
    to_local_time,
)
from analytics_etl_spark.functions.money import cents_to_dollars
from analytics_etl_spark.functions.text import (
    DEFAULT_DENYLIST,
    contains_any,
    is_month_format,
    is_valid_day_name,
)


def explode_line_items(orders: DataFrame) -> DataFrame:
    """P1 — one order row → one row per line_items element.

    Reference loop at etl_service.py:269-321 ("Each line item in an
    order becomes a separate database row", reference README.md:164).
    Orders with null/empty line_items are skipped, matching
    etl_service.py:252-254. Narrow op — no shuffle.
    """
    return orders.select(
        "id",
        "location_id",
        "closed_at",
        F.explode("line_items").alias("li"),
    )


def revenue_filter(exploded: DataFrame) -> DataFrame:
    """P3 — drop non-revenue items (base price <= 0).

    Reference etl_service.py:117-125, applied FIRST for selectivity
    (etl_service.py:270-272) — Catalyst reorders conjunctive predicates
    for us, but we keep the explicit staging for readability.
    """
    return exploded.filter(F.col("li.base_price_money.amount") > 0)


def denylist_filter(
    exploded: DataFrame, denylist: Iterable[str] = DEFAULT_DENYLIST
) -> DataFrame:
    """P4 — drop items whose name contains a denylisted substring.

    Reference IGNORED_ITEMS check, etl_service.py:44-48,127-133.
    """
    return exploded.filter(~contains_any(F.col("li.name"), denylist))


def valid_line_item_pred() -> Column:
    """P5 — structural validation predicate for an exploded line item.

    Reference validate_line_item (etl_service.py:175-215): name
    present, castable qty > 0, price >= 0. try_cast failures become
    nulls and fail the predicate — the vectorized analogue of the
    reference's per-row try/except (ANSI-mode safe).
    """
    qty = F.col("li.quantity").try_cast("int")
    return (
        F.col("li.name").isNotNull()
        & (F.col("li.name") != "")
        & qty.isNotNull()
        & (qty > 0)
        & F.col("li.base_price_money.amount").isNotNull()
        & (F.col("li.base_price_money.amount") >= 0)
    )


def project_sales(exploded: DataFrame, tz: str = "America/Chicago") -> DataFrame:
    """P2 + F1-F9 — project exploded line items to flat sales rows.

    Column mapping per reference etl_service.py:232-241,284-308:
    gross (base+modifiers) cents → decimal dollars; month/day_of_week
    derived AFTER timezone conversion (reference order of operations,
    etl_service.py:256-264).
    """
    local_ts = to_local_time(parse_rfc3339(F.col("closed_at")), tz)
    # gross = base + paid modifiers is the reference's own invariant
    # (etl_service.py:507-512: 565 + 100 → 665); when a feed omits
    # gross_sales_money, reconstruct it instead of nulling the price.
    gross_cents = F.coalesce(
        F.col("li.gross_sales_money.amount"),
        F.col("li.base_price_money.amount")
        + modifier_price_total_cents(F.col("li.modifiers")),
    )
    return exploded.select(
        F.col("li.name").alias("item_name"),
        cents_to_dollars(gross_cents).alias("sale_price"),
        F.col("li.quantity").try_cast("int").alias("qty"),
        local_ts.alias("sale_timestamp"),
        month_str(local_ts).alias("month"),
        day_of_week_name(local_ts).alias("day_of_week"),
        F.coalesce(F.col("li.variation_name"), F.lit("N/A")).alias("item_category"),
        F.col("location_id").alias("square_location_id"),
        join_paid_modifier_names(F.col("li.modifiers")).alias("modifiers"),
    )


def valid_sales_row_pred() -> Column:
    """P6 — output-side constraint predicate on a sales row.

    Reference validate_sales_row (etl_service.py:363-413): required
    fields, price >= 0, qty > 0, month format, day-name whitelist.
    """
    return (
        F.col("item_name").isNotNull()
        & (F.col("sale_price") >= 0)
        & (F.col("qty") > 0)
        & F.col("sale_timestamp").isNotNull()
        & is_month_format(F.col("month"))
        & is_valid_day_name(F.col("day_of_week"))
    )


def quarantine(df: DataFrame, pred: Column) -> tuple[DataFrame, DataFrame]:
    """P7 — split into (valid, rejects) instead of failing the job.

    The reference try/excepts per row and logs the bad ones
    (etl_service.py:282-321); at scale the rejects go to a quarantine
    table. Both frames share one scan — Catalyst handles it.

    A NULL predicate (e.g. a constraint over a null column) counts as
    invalid — otherwise the row would silently vanish from BOTH
    frames (filter(p) and filter(~p) each drop nulls).
    """
    p = F.coalesce(pred, F.lit(False))
    return df.filter(p), df.filter(~p)


def location_filter(df: DataFrame, location_id: int | str | None) -> DataFrame:
    """P8 — optional single-location restriction (reference
    monthly_etl.py:81-104). On partitioned storage this prunes to one
    partition directory."""
    if location_id is None:
        return df
    return df.filter(F.col("location_id") == F.lit(location_id))


def transform_orders(
    orders: DataFrame,
    denylist: Iterable[str] = DEFAULT_DENYLIST,
    tz: str = "America/Chicago",
) -> DataFrame:
    """The reference's full transform stage as one lazy chain.

    explode → revenue filter → denylist → structural validation →
    projection (reference transform_orders_batch,
    etl_service.py:331-360). Returns flat sales rows (without the
    surrogate location join — see plans.pipeline for the full path).
    """
    exploded = explode_line_items(orders)
    filtered = denylist_filter(revenue_filter(exploded), denylist)
    valid = filtered.filter(valid_line_item_pred())
    return project_sales(valid, tz)
