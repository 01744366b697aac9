"""Generalized analytics surface (SURVEY.md §2.3/§2.4/§2.7 extensions).

Operators the reference's SQL-on-Postgres surface implies but never
implements: window functions, rollup/cube, distinct aggregates, the
full join family, as-of joins, sessionization, pivot, and windowed
(tumbling) time aggregation. All built-in Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from analytics_etl_spark.operators.asof import asof_join
from analytics_etl_spark.operators.joins import anti_join, range_join, semi_join
from analytics_etl_spark.queries.registry import query, t

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _rev():
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


# Window: running (cumulative) revenue per customer. Exact-decimal
# running sum over a total order (date, orderkey) ⇒ deterministic.
@query(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      -- NULLS FIRST matches Spark's ascending default;
                      -- DuckDB defaults NULLS LAST (r7 hostile sweep)
                      ORDER BY o_orderdate NULLS FIRST, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_revenue"),
    )


# Window: top-K parts per return flag by revenue (rank over agg).
@query(
    "topk_per_group",
    oracle=f"""
    WITH part_rev AS (
      SELECT l_returnflag, l_partkey, SUM({_REV_SQL}) AS rev
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, l_partkey, CAST(rev AS DOUBLE) AS revenue, rk
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                   ORDER BY rev DESC, l_partkey) AS INT) AS rk
      FROM part_rev
    )
    WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_returnflag", "l_partkey").agg(F.sum(_rev()).alias("rev"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("rev"), F.asc("l_partkey"))
    return (
        part_rev.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select(
            "l_returnflag",
            "l_partkey",
            F.col("rev").cast("double").alias("revenue"),
            "rk",
        )
    )


# ROLLUP region → nation revenue hierarchy with grouping id.
@query(
    "rollup_revenue",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS gid,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    n, r = t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
    )
    return joined.rollup("region_name", "nation_name").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("cnt"),
        F.sum("price").cast("double").alias("revenue"),
    ).select("region_name", "nation_name", "gid", "cnt", "revenue")


# CUBE over (returnflag, linestatus).
@query(
    "cube_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"), F.count("*").alias("cnt")
    ).select("l_returnflag", "l_linestatus", "gid", "cnt")


# DISTINCT aggregate: distinct buyers per nation.
@query(
    "distinct_customers",
    oracle="""
    SELECT c.c_nationkey AS nation_id,
           COUNT(DISTINCT o.o_custkey) AS distinct_buyers
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation_id"))
        .agg(F.count_distinct("o_custkey").alias("distinct_buyers"))
    )


# Approximate distinct (HLL) — no SQL oracle (approximate by design;
# driver records a rows-only check). At 100 TB this replaces exact
# distinct to avoid the full shuffle of the key.
@query(
    "approx_distinct_buyers",
    rows_only="HLL approx_count_distinct: engine-specific sketch, no cross-engine "
    "exact value; 3-sigma error envelope vs exact COUNT(DISTINCT) pinned in "
    "tests/test_sketches.py::test_approx_distinct_buyers_within_envelope",
)
def approx_distinct_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.lit(1).alias("one")).agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_buyers")
    )


# LEFT SEMI — customers with at least one urgent order.
@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi_join(c, urgent, "c_custkey").select("c_custkey", "c_name")


# LEFT ANTI — customers with no 'F'-status order.
@query(
    "anti_join_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    f_orders = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti_join(c, f_orders, "c_custkey").select("c_custkey", "c_name")


# Range (band) join — parts priced into bands via a broadcast band
# table; non-equi join that stays a single fact pass.
@query(
    "range_join_price_bands",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
      VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0), ('premium', 1200.0, 1e9)
    )
    SELECT p.p_partkey, p.p_name, b.band_name
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1e9)],
        "band_name string, lo double, hi double",
    )
    return range_join(p, bands, "p_retailprice", "lo", "hi").select(
        "p_partkey", "p_name", "band_name"
    )


# As-of join — for each purchase, the latest prior click by the same
# user. Engine implementation: union + window backfill (operators.asof)
# — one shuffle, no pandas. Oracle: DuckDB's native ASOF JOIN.
@query(
    "asof_join_last_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.click_id AS last_click_id, c.click_ts AS last_click_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT event_id AS click_id, user_id, ts AS click_ts
          FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("last_click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("ts").alias("last_click_ts"),
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="click_ts",
        payload_cols=["last_click_id", "last_click_ts"],
    )


# Sessionization — gap > 30 min starts a new session; exact bigint
# microsecond arithmetic so both engines agree.
@query(
    "sessionize_events",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_sessions
    FROM ordered
    GROUP BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7 hostile sweep: NULL-ts events cannot be sessionized, and the
    # engines disagree on NULL sort position (Spark NULLS FIRST vs
    # DuckDB NULLS LAST) — excluded explicitly in both formulations
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gapped = ev.select("user_id", "event_id", us.alias("us")).withColumn(
        "prev_us", F.lag("us").over(w)
    )
    new_session = F.when(
        F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > 1_800_000_000), 1
    ).otherwise(0)
    return gapped.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(new_session).alias("n_sessions"),
    )


# Pivot — event-type counts per user as columns.
@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    pivoted = ev.groupBy("user_id").pivot("event_type", types).count()
    return pivoted.select(
        "user_id", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in types]
    )


# Tumbling time window aggregation — the batch form of the streaming
# windowed agg (streaming/ has the readStream version). Sum in exact
# decimal; window start via date_trunc semantics.
@query(
    "tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(CASE WHEN NOT isnan(value) THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7 hostile sweep: Spark's window() silently drops NULL-ts rows
    # while date_trunc groups them — the exclusion is now explicit in
    # both engines; try_cast keeps one corrupt out-of-decimal-range
    # value from aborting the whole aggregate under ANSI
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").try_cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# Intraday histogram (F5 extension, reference date_utils.py:98-102).
@query(
    "hourly_histogram",
    oracle="""
    SELECT CAST(hour(ts) AS INT) AS hour_of_day, COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def hourly_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(F.hour("ts").cast("int").alias("hour_of_day")).agg(
        F.count("*").alias("n_events")
    )


# TPC-H Q1-style pricing summary — the classic partial-agg benchmark
# shape (bench headline query).
@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_REV_SQL} * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    charge = _rev() * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(_rev()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


# TPC-H Q3-style shipping priority (join + filter + agg + top-K).
@query(
    "shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-03-15").cast("timestamp_ntz")
    return (
        o.filter(F.col("o_orderdate") < cutoff)
        .join(li.filter(F.col("l_shipdate") > cutoff), o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# Hypertable family: gap filling + last-observation-carried-forward —
# the time_bucket_gapfill/locf shape continuous dashboards need (a
# missing bucket must render as the last known value, not a hole).
@query(
    "gap_fill_locf",
    oracle="""
    WITH spine AS (
      SELECT t AS bucket, et.event_type
      FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                           TIMESTAMP '2024-01-02 23:00:00',
                           INTERVAL 1 HOUR) s(t)
      CROSS JOIN (SELECT DISTINCT event_type FROM events) et
    ),
    hourly AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
      GROUP BY 1, 2
    )
    SELECT s.bucket, s.event_type,
           COALESCE(h.n, CAST(0 AS BIGINT)) AS n,
           last_value(h.total_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS locf_value
    FROM spine s LEFT JOIN hourly h
      ON h.bucket = s.bucket AND h.event_type = s.event_type
    """,
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly spine (sequence+explode — generated IN the plan,
    no driver loop) left-joined to the sparse aggregates; empty
    buckets carry the last observed value forward via
    last(ignorenulls) over an unbounded-preceding frame. One window
    shuffle on event_type; the spine is rows × types, never data-sized."""
    ev = t(spark, sf_dir, "events")
    spine_hours = F.explode(
        F.sequence(
            F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("2024-01-02 23:00:00").cast("timestamp_ntz"),
            F.expr("INTERVAL 1 HOUR"),
        )
    ).alias("bucket")
    types = ev.select("event_type").distinct()
    spine = spark.range(1).select(spine_hours).crossJoin(types)
    hourly = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz"))
        )
        .groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, ["bucket", "event_type"], "left").select(
        "bucket",
        "event_type",
        F.coalesce("n", F.lit(0).cast("bigint")).alias("n"),
        F.last("total_value", ignorenulls=True).over(w).alias("locf_value"),
    )


# Funnel conversion: ordered-stage progression per user (view →
# click → purchase), each stage's timestamp strictly after the
# previous stage's first occurrence.
@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after_click
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage funnel: users entering each stage strictly after
    completing the previous one (first-occurrence semantics). Each
    stage is one aggregation + one join keyed on user_id; the three
    per-user stage timestamps are assembled with LEFT joins and all
    counts come from ONE conditional aggregation over that single
    lineage — three independent count actions would re-execute the
    shared stage pipelines once per count (measured as 6 event scans
    instead of 3). Returned as one summary row (the funnel chart's
    input)."""
    ev = t(spark, sf_dir, "events")

    def stage(df_prev, etype, tcol_prev, tcol):
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        return (
            e.join(df_prev, "user_id")
            .filter(F.col("ts") > F.col(tcol_prev))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = stage(v, "click", "t_view", "t_click")
    p = stage(c, "purchase", "t_click", "t_purchase")
    return (
        v.join(c.select("user_id", "t_click"), "user_id", "left")
        .join(p.select("user_id", "t_purchase"), "user_id", "left")
        .agg(
            F.count("*").alias("n_view"),
            F.count("t_click").alias("n_click_after_view"),
            F.count("t_purchase").alias("n_purchase_after_click"),
        )
    )


# Cohort retention: users grouped by first-seen week, activity tracked
# by week offset — the retention-matrix input.
@query(
    "cohort_retention",
    oracle="""
    WITH firstw AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS INT)
               AS week_offset
      FROM events e JOIN firstw f ON f.user_id = e.user_id
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,  -- duckdb date_trunc→DATE, spark→TIMESTAMP
           week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
    FROM active GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: (cohort week, week offset) → distinct active
    users. Two aggregations and one join, all keyed on user_id —
    co-partitioned at scale; the matrix itself is weeks², never
    user-sized."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts").cast("timestamp")).alias("w")
    )
    firstw = ev.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    active = (
        ev.join(firstw, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("w"), F.col("cohort_week")) / 7).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return active.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active")
    )
