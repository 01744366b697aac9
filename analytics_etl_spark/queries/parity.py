"""Reference-parity queries (SURVEY.md §2.1-2.6) restated on the star schema.

Role mapping (FIXTURES.md §4): ``orders``+``lineitem`` play the
order/line_items parent-child, ``nation``/``region`` play the
``locations`` dimension, ``l_extendedprice*(1-l_discount)`` plays the
cents→dollars revenue derivation, ``o_orderdate`` plays ``closed_at``.

Each Spark query is paired with a DuckDB oracle; money math runs in
DECIMAL on both sides and is cast to DOUBLE only at the end, making
the value-hash comparison exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from analytics_etl_spark.functions.datetime_fns import (
    day_of_week_name,
    hour_of_day,
    month_str,
    to_local_time,
)
from analytics_etl_spark.functions.text import contains_any, is_month_format, is_valid_day_name
from analytics_etl_spark.operators.aggregates import count_by, date_range_by
from analytics_etl_spark.operators.joins import lookup_join
from analytics_etl_spark.queries.registry import query, t

# Exact-decimal revenue expression, shared by several queries.
# (18,2) * (1 - (4,2)) stays exact; SUM of decimals is associative.
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _rev(li: DataFrame = None):
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


# ---------------------------------------------------------------------------
# A3 — flagship BI aggregate (reference README.md:280-288):
# monthly revenue per location ⇒ monthly revenue per customer nation.
# Plan at scale: lineitem⋈orders is the only big shuffle (two fact
# tables co-partitioned on orderkey); customer/nation broadcast; agg
# is partial+final hash agg.
# ---------------------------------------------------------------------------
@query(
    "flagship_monthly_revenue",
    oracle=f"""
    SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
           n.n_name AS location_name,
           COUNT(*) AS order_count,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def flagship_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    c, n = t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            month_str("o_orderdate").alias("month"),
            F.col("n_name").alias("location_name"),
        )
        .agg(
            F.count("*").alias("order_count"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
    )


# A1 — COUNT(*) per location (reference database_service.py:341-370).
@query(
    "sales_count_by_location",
    oracle="""
    SELECT c.c_nationkey AS location_id, COUNT(*) AS sales_count
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def sales_count_by_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    joined = lookup_join(o, c, "o_custkey", "c_custkey", how="inner")
    return count_by(joined.select(F.col("c_nationkey").alias("location_id")), "location_id", alias="sales_count")


# A2 — MIN/MAX date per location (reference database_service.py:373-412).
@query(
    "sales_date_range",
    oracle="""
    SELECT c.c_nationkey AS location_id,
           MIN(CAST(o.o_orderdate AS DATE)) AS first_sale_date,
           MAX(CAST(o.o_orderdate AS DATE)) AS last_sale_date
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def sales_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    joined = lookup_join(o, c, "o_custkey", "c_custkey", how="inner").select(
        F.col("c_nationkey").alias("location_id"), "o_orderdate"
    )
    return date_range_by(joined, "o_orderdate", "location_id")


# Sort + limit / top-K (reference README.md:276-278 "last 10 sales").
# Total order (date desc, key desc) so the K rows are deterministic;
# Spark executes this as TakeOrderedAndProject (no full sort at scale).
@query(
    "recent_sales_topk",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 10
    """,
)
def recent_sales_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(10)
    )


# P3 + P4 — revenue filter + denylist substring filter
# (reference etl_service.py:117-133). Predicates reach the parquet scan.
@query(
    "revenue_denylist_filter",
    oracle=f"""
    SELECT l.l_orderkey, l.l_linenumber, p.p_name,
           CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_extendedprice > 0
      AND NOT (lower(p.p_name) LIKE '%blue%' OR lower(p.p_name) LIKE '%cold%')
    """,
)
def revenue_denylist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(F.col("l_extendedprice") > 0)
        .filter(~contains_any(F.col("p_name"), ["blue", "cold"]))
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_name",
            _rev().cast("double").alias("revenue"),
        )
    )


# P1 — explode/unnest (reference etl_service.py:269-321). The star
# schema is flat, so the array is derived (split) then exploded.
@query(
    "explode_words",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part
    """,
)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


# F9 — higher-order filter→transform→array_join per group (reference
# _parse_modifiers, etl_service.py:137-172): per order, the sorted
# comma-joined list of "big ticket" part keys.
@query(
    "modifier_rollup",
    oracle="""
    SELECT l_orderkey,
           COALESCE(array_to_string(
             list(CAST(l_partkey AS VARCHAR) ORDER BY CAST(l_partkey AS VARCHAR))
               FILTER (WHERE l_extendedprice > 50000),
             ','), '') AS big_ticket_parts,
           COUNT(*) AS line_count
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def modifier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    big = F.when(F.col("l_extendedprice") > 50000, F.col("l_partkey").cast("string"))
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.array_sort(F.collect_list(big)), ",").alias("big_ticket_parts"),
        F.count("*").alias("line_count"),
    )


# S7 — dimension scan with sort (reference database_service.py:132-168).
@query(
    "dim_scan",
    oracle="""
    SELECT n.n_nationkey AS id, n.n_name AS name, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY n.n_nationkey
    """,
)
def dim_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, r = t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    return (
        lookup_join(n, r, "n_regionkey", "r_regionkey", how="inner", hint_broadcast=True)
        .select(
            F.col("n_nationkey").alias("id"),
            F.col("n_name").alias("name"),
            F.col("r_name").alias("region_name"),
        )
        .orderBy("id")
    )


# F3/F4/F5 — date-part derivations (reference etl_service.py:89-103).
@query(
    "date_parts",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m') AS month,
           strftime(ts, '%A') AS day_of_week,
           CAST(hour(ts) AS INT) AS hour_of_day
    FROM events
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        month_str("ts").alias("month"),
        day_of_week_name("ts").alias("day_of_week"),
        hour_of_day("ts").cast("int").alias("hour_of_day"),
    )


# F1/F2 — UTC → America/Chicago wall clock, DST-aware
# (reference etl_service.py:56-86; app/utils/date_utils.py:28-66).
@query(
    "tz_convert",
    oracle="""
    SELECT event_id,
           timezone('America/Chicago', ts::TIMESTAMPTZ) AS local_ts,
           strftime(timezone('America/Chicago', ts::TIMESTAMPTZ), '%Y-%m') AS local_month
    FROM events
    """,
)
def tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    local = to_local_time("ts")
    return ev.select(
        "event_id",
        local.alias("local_ts"),
        month_str(local).alias("local_month"),
    )


# J1/J2 — broadcast dimension enrichment (reference
# database_service.py:171-211; FK README.md:132).
@query(
    "broadcast_join_enrich",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def broadcast_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, n, r = t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


# Set op — UNION ALL accumulation (reference etl_service.py:345-349,
# monthly_etl.py:244-253 sequential extend → one unionByName).
@query(
    "union_all_accumulate",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def union_all_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderpriority")
    return o.filter(F.col("o_orderstatus") == "F").unionByName(
        o.filter(F.col("o_orderpriority") == "1-URGENT")
    )


# P7 — quarantine split: the rejects side (reference per-row
# try/except → rejects table; etl_service.py:282-321).
@query(
    "quarantine_rejects",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
           'qty_or_discount_out_of_range' AS reject_reason
    FROM lineitem
    WHERE NOT (l_quantity BETWEEN 1 AND 49 AND l_discount <= 0.08)
    """,
)
def quarantine_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    valid = F.col("l_quantity").between(1, 49) & (F.col("l_discount") <= 0.08)
    return li.filter(~valid).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        F.lit("qty_or_discount_out_of_range").alias("reject_reason"),
    )


# P6 — output-side constraint validation (reference
# validate_sales_row, etl_service.py:363-413): rows passing the
# month-regex + day-whitelist constraints, counted per day.
@query(
    "constraint_validation",
    oracle=r"""
    SELECT strftime(o_orderdate, '%A') AS day_of_week, COUNT(*) AS valid_rows
    FROM orders
    WHERE regexp_matches(strftime(o_orderdate, '%Y-%m'), '^\d{4}-\d{2}$')
      AND strftime(o_orderdate, '%A') IN
          ('Monday','Tuesday','Wednesday','Thursday','Friday','Saturday','Sunday')
    GROUP BY 1
    """,
)
def constraint_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        month_str("o_orderdate").alias("month"),
        day_of_week_name("o_orderdate").alias("day_of_week"),
    )
    return (
        o.filter(is_month_format("month") & is_valid_day_name("day_of_week"))
        .groupBy("day_of_week")
        .agg(F.count("*").alias("valid_rows"))
    )


# F6 — integer cents → decimal dollars (reference etl_service.py:291-300).
@query(
    "cents_to_dollars",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
           CAST(CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS DECIMAL(14,2)) / 100 AS DOUBLE)
             AS price_dollars
    FROM lineitem
    """,
)
def cents_to_dollars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.functions.money import cents_to_dollars

    li = t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        cents.alias("price_cents"),
        cents_to_dollars(cents).cast("double").alias("price_dollars"),
    )


# D1/S2 — month-window incremental scan: pushed date-range predicate
# (reference square_service.py:213-220, monthly_etl.py:52-63).
@query(
    "month_window_scan",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-02-01'
    """,
)
def month_window_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


# JSON extraction from the events props column (schema-on-read, the
# engine analogue of the reference's defensive .get() JSON access).
@query(
    "json_extract_props",
    oracle="""
    -- json_valid + TRY_CAST (r7 hostile sweep): DuckDB's ->> ERRORS on
    -- malformed JSON where Spark's get_json_object returns NULL, and a
    -- strict cast would abort on a non-numeric k in either engine —
    -- defensive extraction must be defensive in BOTH formulations
    SELECT event_id, event_type,
           TRY_CAST(CASE WHEN json_valid(props) THEN props->>'k' END AS INT) AS k_value
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_value"),
    )
