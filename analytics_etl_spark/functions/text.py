"""String predicates & defaults — F7, F8, F10, F11 in SURVEY.md §2.5."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference denylist, IGNORED_ITEMS (etl_service.py:44-48).
DEFAULT_DENYLIST = ("dine in", "to go", "free water")

DAY_NAMES = (
    "Monday",
    "Tuesday",
    "Wednesday",
    "Thursday",
    "Friday",
    "Saturday",
    "Sunday",
)

MONTH_RE = r"^\d{4}-\d{2}$"


def contains_any(col: Column | str, needles: Iterable[str]) -> Column:
    """F7 — case-insensitive substring membership against a denylist.

    Reference lowercases and runs ``in`` per needle (etl_service.py:127-133).
    One JVM-side predicate; Catalyst folds the constants.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    pred = F.lit(False)
    for needle in needles:
        pred = pred | c.contains(needle.lower())
    return pred


def coalesce_default(col: Column | str, default: str) -> Column:
    """F8 — null/empty → default (reference `.get(k, default)` / `or 'N/A'`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == ""), F.lit(default)).otherwise(c)


def is_month_format(col: Column | str) -> Column:
    """F10 — 'YYYY-MM' format check (reference regex, etl_service.py:403)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(MONTH_RE)


def is_valid_day_name(col: Column | str) -> Column:
    """F11 — day-name whitelist (reference etl_service.py:408-410)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(*DAY_NAMES)
