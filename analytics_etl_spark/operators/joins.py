"""Join operators — J1-J3 parity plus the full join family (SURVEY.md §2.3).

The reference's only join is a driver-side point lookup
square_id → locations row (reference app/services/database_service.py:171-211),
i.e. a broadcast hash join against a tiny dimension. The engine
generalizes to the whole family; every small-dimension join is
explicitly broadcast so fact scans never shuffle for enrichment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "left",
    hint_broadcast: bool = False,
) -> DataFrame:
    """J1/J2 — enrich a fact frame from a small dimension.

    Broadcast hash join: at 100 TB the fact side never moves; the
    dimension ships to every executor once. Reference parity:
    get_location_by_square_id (database_service.py:171-211) called
    per batch becomes one per-row join with zero extra I/O.

    ``hint_broadcast`` is opt-in and reserved for dimensions with a
    *fixed* row count (region/nation-class tables). For dimensions
    that grow with data volume, leave it False: an explicit hint
    overrides ``autoBroadcastJoinThreshold`` and becomes a driver-OOM
    risk at scale, while the optimizer + AQE still broadcast whenever
    the dimension is genuinely small.
    """
    dim_side = F.broadcast(dim) if hint_broadcast else dim
    return fact.join(dim_side, fact[fact_key] == dim[dim_key], how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS — rows of left with a match in right (no right columns).

    Extension beyond the reference (SURVEY.md §2.3 notes the gap).
    """
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT EXISTS — rows of left without a match in right."""
    return left.join(right, on, "left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Band/range join: left.value ∈ [right.lo, right.hi).

    The right side is expected to be a small band table (price bands,
    time buckets) and is broadcast — the non-equi condition then costs
    one pass over the fact, not a cartesian shuffle. For fact-fact
    range joins, bucketize the range key first and equi-join on the
    bucket (see asof.py for the pattern).
    """
    cond = (left[value_col] >= right[lo_col]) & (left[value_col] < right[hi_col])
    return left.join(F.broadcast(right), cond, how)
