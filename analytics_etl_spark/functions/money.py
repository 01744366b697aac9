"""Money functions — F6 in SURVEY.md §2.5.

The reference stores money as integer cents and converts with
``Decimal(cents) / Decimal(100)`` then *loses exactness* with a float
cast (reference app/services/etl_service.py:291-300). The engine keeps
DecimalType end-to-end: decimal arithmetic in Spark is exact,
associative, and therefore deterministic under any partitioning — a
property float sums do NOT have on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"
MONEY_WIDE = "decimal(18,2)"


def cents_to_dollars(col: Column | str) -> Column:
    """Integer cents → decimal(12,2) dollars."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(14,2)") / F.lit(100)).cast(MONEY)


def money_amount(col: Column | str, money_type: str = MONEY_WIDE) -> Column:
    """Normalize a (possibly double) price column to exact decimal money.

    Aggregations over this are exact and partition-order independent.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(money_type)
