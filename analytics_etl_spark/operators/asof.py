"""As-of (time-travel) join — an operator Spark lacks natively.

Semantics: for each left row (key, t), attach the latest right row
(key, t') with t' <= t. Implemented as a UNION + window backfill —
a composition of built-in operators (no pandas fallback):

    1. tag left/right rows and union them on (key, time);
    2. one window per key ordered by (time, side) computes
       ``last(right_payload, ignorenulls=True)`` — each left row sees
       the most recent right payload at or before its timestamp;
    3. keep the left rows.

Scale: exactly ONE shuffle on the key (the window partition), the
same lower bound any sort-merge as-of would need. No skew beyond the
key's own distribution; no driver collection. This beats per-group
``applyInPandas`` + ``pd.merge_asof`` (which pays Arrow transfer and
Python time) by staying entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Latest-value as-of join, left rows enriched with right payload.

    strict=False → right.time <= left.time (the common "most recent
    observation" semantics, matching DuckDB's ASOF JOIN ... >=).
    strict=True → right.time < left.time.

    NULL-time contract (r7 hostile-data sweep): right rows with a NULL
    timestamp are DROPPED — an observation without a time cannot be
    "the most recent at t", but NULLS-FIRST ordering used to backfill
    it as the match for every early left row (diverging from SQL ASOF,
    where a NULL comparison is simply never true). Left rows with a
    NULL timestamp are kept with a NULL payload, matching ASOF LEFT.
    """
    right = right.filter(F.col(right_time).isNotNull())
    # side ordering makes right rows sort BEFORE a left row with the
    # same timestamp iff non-strict (so equal timestamps match).
    right_tag = 0 if not strict else 1
    left_tag = 1 if not strict else 0

    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(left_tag).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    filled = unioned.select(
        "__side",
        "__left",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in payload_cols
        ],
    )
    out = filled.filter(F.col("__side") == F.lit(left_tag)).select(
        *[F.col("__left")[c].alias(c) for c in left.columns],
        *[F.col(f"__f_{c}").alias(c) for c in payload_cols],
    )
    return out
