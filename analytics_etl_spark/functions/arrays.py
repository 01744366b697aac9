"""Higher-order array functions — F9 in SURVEY.md §2.5.

The reference's `_parse_modifiers` walks the nested ``modifiers`` array
in Python: keep modifiers with price > 0, take ``.name``, comma-join
(reference app/services/etl_service.py:137-172). That is exactly
filter → transform → array_join — Spark's built-in higher-order
functions, evaluated JVM-side with no UDF and no explode/regroup
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def join_paid_modifier_names(modifiers: Column | str, sep: str = ", ") -> Column:
    """array<struct{name, base_price_money{amount}}> → 'NameA, NameB'.

    Keeps only modifiers whose price amount > 0, mirroring
    etl_service.py:162-169; null array → '' (reference default,
    database_service.py:280).
    """
    c = F.col(modifiers) if isinstance(modifiers, str) else modifiers
    paid = F.filter(c, lambda m: m["base_price_money"]["amount"] > 0)
    names = F.transform(paid, lambda m: m["name"])
    return F.coalesce(F.array_join(names, sep), F.lit(""))


def modifier_price_total_cents(modifiers: Column | str) -> Column:
    """Sum of modifier prices in cents (0 for null/empty arrays).

    Reference adds modifier prices into gross_sales implicitly via
    Square's gross_sales_money; exposed here as an explicit op.
    """
    c = F.col(modifiers) if isinstance(modifiers, str) else modifiers
    return F.coalesce(
        F.aggregate(
            c,
            F.lit(0).cast("long"),
            lambda acc, m: acc + F.coalesce(m["base_price_money"]["amount"], F.lit(0)),
        ),
        F.lit(0).cast("long"),
    )
