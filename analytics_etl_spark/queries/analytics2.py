"""Analytics surface, batch 2: SQL API, scalar-function packs, set
ops, window-function family, time bucketing, unpivot, subquery shapes.

Same determinism rules as batch 1 (decimal money math, total orders on
limits, single-op float divisions that reproduce bit-exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from analytics_etl_spark.queries.registry import query, t
from analytics_etl_spark.tables import register_views

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


# The SQL API surface: the same engine accepts SQL text (reference BI
# users speak SQL, reference README.md:274-288).
@query(
    "sql_api_revenue_by_status",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
)
def sql_api_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY o_orderstatus
        """
    )


# AVG without float-sum nondeterminism: exact decimal sum / count.
@query(
    "avg_stats_per_nation",
    oracle="""
    SELECT c.c_nationkey AS nation_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(MIN(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def avg_stats_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation_id"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            F.min(price).cast("double").alias("min_price"),
            F.max(price).cast("double").alias("max_price"),
        )
    )


# Set ops the reference lacks: INTERSECT / EXCEPT.
@query(
    "set_intersect_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersect(b)


@query(
    "set_except_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.subtract(b)  # set semantics, matching SQL EXCEPT


# String-function pack — one projection, all JVM-side.
@query(
    "string_functions_pack",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS upper_name,
           substr(p_name, 2, 4) AS sub_name,
           lpad(p_brand, 12, '*') AS padded_brand,
           replace(p_name, ' ', '_') AS snake_name,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           CAST(length(p_name) AS INT) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
)
def string_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("upper_name"),
        F.substring("p_name", 2, 4).alias("sub_name"),
        F.lpad("p_brand", 12, "*").alias("padded_brand"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


# Math-function pack (IEEE-exact ops only: sqrt/abs/floor/ceil/mod).
@query(
    "math_functions_pack",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000.0) AS abs_dev,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_kilo,
           CAST(mod(CAST(l_quantity AS BIGINT), 5) AS BIGINT) AS qty_mod5,
           CASE WHEN l_quantity >= 0 THEN sqrt(l_quantity) END AS qty_sqrt,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           greatest(l_quantity, 25.0) AS qty_floor25,
           least(l_quantity, 25.0) AS qty_cap25
    FROM lineitem
    """,
)
def math_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        F.floor(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000.0).cast("bigint").alias("price_kilo"),
        (F.col("l_quantity").cast("bigint") % 5).cast("bigint").alias("qty_mod5"),
        # guarded sqrt (r7 hostile sweep): DuckDB ERRORS on a negative
        # argument where Spark yields NaN — NULL in both instead
        F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")).alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_floor25"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_cap25"),
    )


# Conditional pack: CASE / NULLIF / IFNULL.
@query(
    "conditional_pack",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_tier,
           nullif(o_orderstatus, 'O') AS status_or_null,
           ifnull(nullif(o_orderstatus, 'O'), 'open') AS status_label
    FROM orders
    """,
)
def conditional_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
    )
    return o.select(
        "o_orderkey",
        tier.alias("price_tier"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
    )


# Date-arithmetic pack.
@query(
    "date_arithmetic_pack",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS INT) AS days_to_eoy,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(weekofyear(o_orderdate) AS INT) AS wk
    FROM orders
    """,
)
def date_arithmetic_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).cast("timestamp_ntz").alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).cast("int").alias("days_to_eoy"),
        F.year(d).cast("int").alias("yr"),
        F.quarter(d).cast("int").alias("qtr"),
        F.weekofyear(d).cast("int").alias("wk"),
    )


# 15-minute tumbling buckets via exact integer epoch math.
@query(
    "time_bucket_15min",
    oracle="""
    SELECT epoch_us(ts) // 900000000 AS bucket_id,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(CASE WHEN NOT isnan(value) THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1
    """,
)
def time_bucket_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7 hostile sweep: NULL-ts excluded explicitly (no time, no
    # bucket); try_cast survives corrupt out-of-range values
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # true floor division (matches DuckDB // for pre-1970 timestamps too)
    bucket = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 900_000_000).cast(
        "bigint"
    )
    return ev.groupBy(bucket.alias("bucket_id")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").try_cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


# Window family: lag/lead/first/ntile/dense_rank/percent_rank.
@query(
    "window_function_family",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_id)  OVER w AS prev_event,
           LEAD(event_id) OVER w AS next_event,
           FIRST_VALUE(event_id) OVER w AS first_event,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type NULLS FIRST) AS INT) AS type_rank,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM events
    -- NULLS FIRST matches Spark's ascending default; DuckDB defaults
    -- NULLS LAST, which silently diverged on NULL ts/event_type rows
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    """,
)
def window_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id").orderBy("event_type")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.first("event_id").over(w).alias("first_event"),
        F.row_number().over(w).cast("int").alias("rn"),
        F.dense_rank().over(wt).cast("int").alias("type_rank"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


# Unpivot (stack) — wide per-user event counts back to long form.
@query(
    "unpivot_event_counts",
    oracle="""
    WITH wide AS (
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             COUNT(*) FILTER (WHERE event_type = 'view')  AS view
      FROM events GROUP BY user_id
    )
    SELECT user_id, 'click' AS event_type, click AS n FROM wide
    UNION ALL
    SELECT user_id, 'view' AS event_type, view AS n FROM wide
    """,
)
def unpivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view"])
        .count()
        .select(
            "user_id",
            F.coalesce("click", F.lit(0)).alias("click"),
            F.coalesce("view", F.lit(0)).alias("view"),
        )
    )
    return wide.selectExpr(
        "user_id", "stack(2, 'click', click, 'view', view) as (event_type, n)"
    )


# Correlated-subquery shape: each order vs its customer's max order.
@query(
    "latest_order_per_customer",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           CAST(o.o_orderdate = m.max_date AS BOOLEAN) AS is_latest
    FROM orders o
    JOIN (SELECT o_custkey, MAX(o_orderdate) AS max_date
          FROM orders GROUP BY o_custkey) m
      ON o.o_custkey = m.o_custkey
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    m = o.groupBy("o_custkey").agg(F.max("o_orderdate").alias("max_date"))
    return (
        o.join(m.withColumnRenamed("o_custkey", "ck"), o.o_custkey == F.col("ck"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            (F.col("o_orderdate") == F.col("max_date")).alias("is_latest"),
        )
    )


# Conditional aggregation: urgent-order share per nation (single-op
# double division — bit-identical cross-engine).
@query(
    "priority_share_per_nation",
    oracle="""
    SELECT c.c_nationkey AS nation_id,
           COUNT(*) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o.o_orderpriority = '1-URGENT') AS DOUBLE)
             / COUNT(*) AS urgent_share
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def priority_share_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    urgent = F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation_id"))
        .agg(
            F.count("*").alias("n_orders"),
            (urgent.cast("double") / F.count("*")).alias("urgent_share"),
        )
    )


# TPC-H Q5 shape: the 6-table star join (bench headline).
@query(
    "regional_revenue",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, li = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    s, n, r = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# Exact quantiles — Spark `percentile` interpolates identically to
# DuckDB quantile_cont.
@query(
    "quantiles_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.50) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.50).alias("p50"),
        F.percentile("l_extendedprice", 0.95).alias("p95"),
    )


# Approximate quantiles — the 100 TB path (t-digest-style sketch, no
# full sort); approximate by design → rows-only check.
@query(
    "quantiles_approx",
    rows_only="approx_percentile sketch: engine-specific, only exact quantiles are "
    "oracle-checked; decision arm: quantiles_exact — oracle-paired (DuckDB "
    "quantile_cont) over the SAME frame and grouping (lineitem.l_extendedprice "
    "by l_returnflag), so the sketch's error envelope anchors to a hash-checked "
    "frame; per-group rank-error envelope vs exact percentiles pinned in "
    "tests/test_sketches.py::test_quantiles_approx_within_rank_envelope",
)
def quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_approx")
    )


# Explicit GROUPING SETS (finer than rollup/cube).
@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# Session windows (native session_window vs derived sessions):
# Spark merges events whose gap < 30 min; session_end = last + gap.
@query(
    "session_window_agg",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
      FROM events WHERE ts IS NOT NULL
    ),
    marked AS (
      SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ),
    numbered AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n
    FROM numbered GROUP BY user_id, sess_id
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7 hostile sweep: session_window drops NULL-ts rows internally —
    # made explicit so the oracle's derived-session form agrees
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n",
        )
    )


# Sliding windows: 1 h length, 30 min slide — every event lands in
# exactly two windows (oracle: union of both window starts).
@query(
    "sliding_window_agg",
    oracle="""
    WITH b AS (SELECT *, to_timestamp((epoch_us(ts) // 1800000000) * 1800) AS w0
               FROM events WHERE ts IS NOT NULL)
    SELECT window_start, event_type, COUNT(*) AS n FROM (
      SELECT CAST(w0 AS TIMESTAMP) AS window_start, event_type FROM b
      UNION ALL
      SELECT CAST(w0 - INTERVAL 30 MINUTE AS TIMESTAMP) AS window_start, event_type FROM b
    ) GROUP BY 1, 2
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7 hostile sweep: window() drops NULL-ts rows — made explicit
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
        )
    )


# Array-function pack over a derived array column.
@query(
    "array_functions_pack",
    oracle="""
    SELECT p_partkey,
           array_to_string(w, '|') AS words,
           CAST(len(w) AS INT) AS n_words,
           list_contains(w, 'widget') AS has_widget,
           array_to_string(list_sort(w), '|') AS sorted_words,
           array_to_string(list_reverse_sort(w), '|') AS rev_words,
           array_to_string(list_concat(w, ['x']), '-') AS joined_plus
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
    """,
)
def array_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function pack (split/size/contains/sort/reverse/concat).

    The array columns are serialized to '|'-joined strings in the FINAL
    projection only (r6 driver lesson: the harness' pandas canonicalizer
    cannot hash top-level list cells — every window query must emit
    scalar columns). '|' cannot appear in p_name words, so the joined
    form is injective; all array computation still happens on real
    ArrayType columns JVM-side."""
    p = t(spark, sf_dir, "part")
    w = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.array_join(w, "|").alias("words"),
        F.size(w).cast("int").alias("n_words"),
        F.array_contains(w, "widget").alias("has_widget"),
        F.array_join(F.array_sort(w), "|").alias("sorted_words"),
        F.array_join(F.reverse(F.array_sort(w)), "|").alias("rev_words"),
        F.array_join(F.concat(w, F.array(F.lit("x"))), "-").alias("joined_plus"),
    )


# TPC-H Q6 shape: pure scan-filter-aggregate (pushdown showcase).
@query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue_delta,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count("*").alias("n_rows"),
        )
    )


# TPC-H Q12 shape: join + conditional aggregation by category.
@query(
    "shipmode_priority_counts",
    oracle="""
    SELECT l.l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# TPC-H Q14 shape: promo-share ratio of two conditional sums (both
# exact decimal; the final ratio is one double division).
@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
               / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
        )
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"))
            .cast("double")
            .alias("promo_share")
        )
    )


# TPC-H Q18 shape: large-order customers (agg-filter-join pipeline).
@query(
    "large_order_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, o, c = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 120)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


# The reference's FULL transform chain restated on the star schema:
# filter (revenue>0, denylist) → project (rename, cents→dollars-style
# derivation, date parts after tz) → dimension join → constraint check.
# One query exercising every structural element of the reference ETL.
@query(
    "sales_etl_chain",
    oracle=f"""
    SELECT p.p_name AS item_name,
           CAST({_REV_SQL} AS DOUBLE) AS sale_price,
           CAST(l.l_quantity AS INT) AS qty,
           strftime(o.o_orderdate, '%Y-%m') AS month,
           strftime(o.o_orderdate, '%A') AS day_of_week,
           n.n_name AS location_name
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_extendedprice > 0
      AND NOT (lower(p.p_name) LIKE '%blue%')
      AND regexp_matches(strftime(o.o_orderdate, '%Y-%m'), '^\\d{{4}}-\\d{{2}}$')
    """,
)
def sales_etl_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.functions.datetime_fns import day_of_week_name, month_str
    from analytics_etl_spark.functions.text import contains_any, is_month_format

    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    p, c, n = t(spark, sf_dir, "part"), t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    month = month_str("o_orderdate")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(F.col("l_extendedprice") > 0)
        .filter(~contains_any(F.col("p_name"), ["blue"]))
        .filter(is_month_format(month))
        .select(
            F.col("p_name").alias("item_name"),
            rev.cast("double").alias("sale_price"),
            F.col("l_quantity").cast("int").alias("qty"),
            month.alias("month"),
            day_of_week_name("o_orderdate").alias("day_of_week"),
            F.col("n_name").alias("location_name"),
        )
    )


# RANGE-frame window: revenue of all orders within ±15 days of each
# order (value-based frame, not row-based).
@query(
    "range_frame_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                      RANGE BETWEEN INTERVAL 15 DAY PRECEDING
                                AND INTERVAL 15 DAY FOLLOWING) AS DOUBLE)
             AS neighborhood_revenue
    FROM orders
    """,
)
def range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.tables import register_views

    register_views(spark, sf_dir)
    # RANGE frames with date intervals are cleanest in the SQL API.
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                          RANGE BETWEEN INTERVAL 15 DAY PRECEDING
                                    AND INTERVAL 15 DAY FOLLOWING) AS DOUBLE)
                 AS neighborhood_revenue
        FROM orders
        """
    )


# Deterministic mode (most frequent value, ties broken by value) —
# engines' built-in mode() is tie-arbitrary, so build it from
# count + rank, which is exactly reproducible.
@query(
    "mode_order_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS modal_priority, cnt FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY COUNT(*) DESC, o_orderpriority) AS rk
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rk = 1
    """,
)
def mode_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("cnt"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("modal_priority"), "cnt")
    )


# Hypertable-style continuous aggregate: one query maintaining the
# same measure at multiple time granularities (hour/day/month), each
# row tagged with its level — the TimescaleDB rollup shape, done as a
# grouping over a granularity dimension.
@query(
    "hypertable_rollup",
    oracle="""
    SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(CASE WHEN NOT isnan(value) THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 2, 3
    UNION ALL
    SELECT 'day' AS grain, date_trunc('day', ts) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(CASE WHEN NOT isnan(value) THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 2, 3
    UNION ALL
    SELECT 'month' AS grain, date_trunc('month', ts) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(CASE WHEN NOT isnan(value) THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 2, 3
    """,
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At scale the day/month levels re-aggregate the hour level
    (compose from the finer grain) instead of rescanning the facts;
    expressed here as the semantic union the oracle can check."""
    # r7 hostile sweep: NULL-ts excluded (no time, no bucket);
    # try_cast keeps one corrupt out-of-range value from aborting the
    # nightly rollup under ANSI (NULL in both engines instead)
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    v = F.sum(F.col("value").try_cast("decimal(18,6)"))

    hour = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).cast("timestamp_ntz").alias("bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), v.alias("sv"))
    )
    # compose coarser grains FROM the hourly rollup (decimal sums are
    # exactly re-aggregatable) — the hypertable trick: facts scanned once.
    day = (
        hour.groupBy(
            F.date_trunc("day", "bucket").cast("timestamp_ntz").alias("bucket"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    month = (
        day.groupBy(
            F.date_trunc("month", "bucket").cast("timestamp_ntz").alias("bucket"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )

    def out(df, grain):
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket",
            "event_type",
            "n",
            F.col("sv").cast("double").alias("total_value"),
        )

    return out(hour, "hour").unionByName(out(day, "day")).unionByName(out(month, "month"))


# TPC-H Q4 shape: EXISTS subquery with a date window.
@query(
    "orders_with_late_lines",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def orders_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.joins import semi_join

    o, li = t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    windowed = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    # EXISTS with a correlated non-equi condition → left-semi join on
    # the equi key with the extra predicate in the join condition.
    late = windowed.join(
        li,
        (windowed.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# TPC-H Q19 shape: disjunctive multi-clause predicates (OR of ANDs) —
# the optimizer must not lose pushdown on the common conjuncts.
@query(
    "disjunctive_filter_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size <= 5)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size <= 10)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size <= 15)
    """,
)
def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & q.between(1, 11) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#2") & q.between(10, 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#3") & q.between(20, 30) & (F.col("p_size") <= 15))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n"))
    )


# The paginated REST source through the driver contract — rows-only
# (the source is hermetic/synthetic; unit tests assert its pushdown
# and determinism, tests/test_sources.py).
@query(
    "rest_source_scan",
    rows_only="synthetic REST DataSource: no parquet table for DuckDB to mirror",
)
def rest_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.sources.rest import register_rest_source

    register_rest_source(spark)
    raw = (
        spark.read.format("rest_orders")
        .option("locations", "L1,L2,L3")
        .option("pages_per_location", "2")
        .option("start_date", "2025-11-01")
        .option("end_date", "2025-11-30")
        .load()
    )
    return raw.groupBy("location_id", "state").agg(F.count("*").alias("n_orders"))


# TPC-H Q17 shape: correlated scalar subquery (per-part average) —
# Catalyst decorrelates to an aggregate + join; expressed explicitly
# so the plan is the one we'd want at scale.
@query(
    "small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey, AVG(l_quantity) * 0.5 AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
    FROM lineitem l JOIN avg_qty a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < a.half_avg
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # AVG(double) is order-dependent in general; here it only gates a
    # comparison (l_quantity, integer-valued, vs avg/2) so ulp-level
    # differences can't flip the predicate except on exact ties, which
    # integer-valued quantities make impossible off the .5 grid.
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(avg_qty, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.count("*").alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("small_revenue"),
        )
    )


# TPC-H Q22 shape: above-average customers with no RECENT orders
# (aggregate threshold + anti join).
@query(
    "wealthy_inactive_customers",
    oracle="""
    WITH threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1998-01-01')
    """,
)
def wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.joins import anti_join

    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    # exact-decimal sum / count → deterministic threshold. The 1-row
    # aggregate stays IN the plan (cross join → auto-broadcast nested
    # loop): one lazy plan, one Spark job — no driver-side .first().
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    wealthy = (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    ).select(F.col("o_custkey").alias("c_custkey"))
    inactive = anti_join(wealthy, recent, "c_custkey")
    return inactive.select("c_custkey", "c_name", "c_acctbal")


# TPC-H Q10 shape: returned-item reporting (join chain + top-K by measure).
@query(
    "returned_item_reporting",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           n.n_name AS nation_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    li, n = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.filter(F.col("l_returnflag") == "R"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# TPC-H Q7 shape: bi-nation shipping volume by year. The nation-pair
# OR predicate references BOTH sides, so Catalyst can neither push it
# through the joins nor infer per-side residuals — left above the
# 5-way join it would drag 25/2 = 12.5x more customer/supplier (and
# hence fact-join) rows than needed all the way up (VERDICT r5).
# Instead: pre-filter the nation dim to the two nations BEFORE the
# broadcast joins (each side then prunes its fact rows early), join
# the supplier side into lineitem FIRST so the biggest frame shrinks
# at the first join, and keep the pair predicate only for cross-pair
# elimination (N1-N1 / N2-N2) on the already-tiny result.
@query(
    "binational_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def binational_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    c, s = t(spark, sf_dir, "customer"), t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    pair = (
        ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
        | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    )
    supp = s.join(F.broadcast(sn), s.s_nationkey == F.col("sk")).select(
        "s_suppkey", "supp_nation"
    )
    cust = c.join(F.broadcast(cn), c.c_nationkey == F.col("ck")).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(F.sum(rev).cast("double").alias("volume"))
    )


# TPC-H Q8 shape: national market share within a region — two-level
# aggregation where the numerator is a conditional slice of the same
# revenue measure.
@query(
    "market_share",
    oracle=f"""
    WITH region_sales AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             {_REV_SQL} AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM region_sales GROUP BY o_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    c, s = t(spark, sf_dir, "customer"), t(spark, sf_dir, "supplier")
    n, r, p = t(spark, sf_dir, "nation"), t(spark, sf_dir, "region"), t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk"))
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("ck"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("crk") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sk"))
        .join(p.filter(F.col("p_type") == "PROMO"), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return base.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).cast("double").alias("mkt_share")
    )


# TPC-H Q13 shape: customer order-count distribution (left join that
# must KEEP zero-order customers, then a histogram of the counts).
@query(
    "order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# TPC-H Q15 shape: top supplier(s) by quarterly revenue — the scalar
# MAX stays IN the plan (1-row aggregate cross join, auto-broadcast),
# one lazy plan instead of a collect-then-filter two-step.
@query(
    "top_supplier_revenue",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, s = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# TPC-H Q21 shape: sole-late-supplier detection — a semi join (another
# supplier shipped the same order) stacked with an anti join (no OTHER
# supplier was late) on derived per-order facts. The testdata has no
# commit/receipt dates; lateness = shipped > 60 days after order date.
@query(
    "sole_late_supplier",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait FROM (
      SELECT DISTINCT a.l_orderkey, a.l_suppkey FROM li a
      WHERE a.late
        AND EXISTS (SELECT 1 FROM li b
                    WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM li c
                        WHERE c.l_orderkey = a.l_orderkey
                          AND c.l_suppkey <> a.l_suppkey AND c.late)
    ) w
    JOIN supplier s ON w.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    late = base.filter(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    others = base.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"), "late"
    )
    multi = late.join(
        others,
        (late.l_orderkey == others.ok) & (late.l_suppkey != others.sk),
        "semi",
    )
    other_late = others.filter(F.col("late"))
    sole = multi.join(
        other_late,
        (multi.l_orderkey == other_late.ok) & (multi.l_suppkey != other_late.sk),
        "anti",
    )
    return (
        sole.join(s, sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# Fuzzy matching: the edit-distance member of the dedup family —
# near-identical names that hashing can never group (typos, OCR).
@query(
    "fuzzy_name_match",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a JOIN part b
      ON substr(a.p_name, 1, 4) = substr(b.p_name, 1, 4)
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance join: candidates pair only within a
    4-char prefix block (the standard blocking trick that keeps fuzzy
    matching out of O(n²) — at scale the block key is the shuffle key,
    and levenshtein runs only inside blocks)."""
    p = t(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.substring("p_name", 1, 4).alias("blk"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.substring("p_name", 1, 4).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 2)
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )


# Reconciliation diff: the ETL answer to "what changed between loads".
@query(
    "table_diff_reconciliation",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
               WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                 AND o_orderdate <  TIMESTAMP '1997-07-01'),
    b AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-04-01'
            AND o_orderdate <  TIMESTAMP '1997-10-01')
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_orderstatus <> b.o_orderstatus
                  OR a.o_totalprice <> b.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS change_kind
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    """,
)
def table_diff_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff via FULL OUTER join: classify every key as
    added / removed / changed / unchanged between two extract windows
    — the audit step before an idempotent reload, and the only
    registry query exercising the full-outer join path."""
    o = t(spark, sf_dir, "orders")

    def win(lo: str, hi: str) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
        ).select("o_orderkey", "o_orderstatus", "o_totalprice")

    a = win("1997-01-01", "1997-07-01").select(
        F.col("o_orderkey").alias("ka"),
        F.col("o_orderstatus").alias("sa"),
        F.col("o_totalprice").alias("pa"),
    )
    b = win("1997-04-01", "1997-10-01").select(
        F.col("o_orderkey").alias("kb"),
        F.col("o_orderstatus").alias("sb"),
        F.col("o_totalprice").alias("pb"),
    )
    kind = (
        F.when(F.col("ka").isNull(), F.lit("added"))
        .when(F.col("kb").isNull(), F.lit("removed"))
        .when(
            (F.col("sa") != F.col("sb")) | (F.col("pa") != F.col("pb")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        a.join(b, a.ka == b.kb, "full_outer")
        .select(
            F.coalesce("ka", "kb").alias("o_orderkey"),
            kind.alias("change_kind"),
        )
    )


# SCD Type-2 history assembly: periodic snapshots → validity ranges.
# The warehouse-maintenance shape for slowly changing dimensions:
# collapse consecutive identical snapshots, open a new range at each
# change, close it at the next change (NULL = current).
@query(
    "scd2_customer_status_history",
    oracle="""
    WITH snap AS (
      SELECT o_custkey AS custkey,
             strftime(o_orderdate, '%Y-%m') AS snap_month,
             MAX(o_orderstatus) AS status
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2
    ),
    marked AS (
      SELECT custkey, snap_month, status,
             lag(status) OVER (PARTITION BY custkey ORDER BY snap_month) AS prev
      FROM snap
    ),
    changes AS (
      SELECT custkey, snap_month, status FROM marked
      WHERE prev IS NULL OR status <> prev
    )
    SELECT custkey, status,
           snap_month AS valid_from,
           lead(snap_month) OVER (
             PARTITION BY custkey ORDER BY snap_month
           ) AS valid_to,
           CAST(lead(snap_month) OVER (
             PARTITION BY custkey ORDER BY snap_month
           ) IS NULL AS BOOLEAN) AS is_current
    FROM changes
    """,
)
def scd2_customer_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 from monthly snapshots: per customer, the max order status
    per month is the snapshot attribute; consecutive identical
    snapshots collapse, each change opens a validity range closed by
    the next change (NULL valid_to = current row). The snapshot agg
    shuffles on (custkey, month); the lag and lead windows share ONE
    further exchange on custkey (verified: 2 exchanges, 2 windows in
    the plan) — the filter between them does not break the reuse."""
    # r7 hostile sweep: an undated order has no snapshot month (and
    # the engines disagree on NULL sort position in the change window)
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    snap = o.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.date_format("o_orderdate", "yyyy-MM").alias("snap_month"),
    ).agg(F.max("o_orderstatus").alias("status"))
    w = Window.partitionBy("custkey").orderBy("snap_month")
    changes = snap.withColumn("prev", F.lag("status").over(w)).filter(
        F.col("prev").isNull() | (F.col("status") != F.col("prev"))
    )
    nxt = F.lead("snap_month").over(w)
    return changes.select(
        "custkey",
        "status",
        F.col("snap_month").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# Equi-depth histogram: the data-profiling/optimizer-statistics shape
# (equal ROW counts per bucket, boundaries wherever the data is dense).
@query(
    "equi_depth_histogram",
    oracle="""
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM (
      SELECT o_totalprice,
             -- DuckDB ntile yields BIGINT, Spark INT — cast for parity
             CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL
    ) GROUP BY bucket
    """,
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten equal-count buckets over order totals via ntile — a total
    order (price, key tie-break) makes bucket membership exact and
    cross-engine identical. The global sort is the one unavoidable
    shuffle of any exact equi-depth split; the approximate path at
    scale is percentile_approx boundaries (quantiles_approx)."""
    # r7 hostile sweep: a NULL price has no quantile, and its sort
    # position differs between engines — excluded in both
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# MapType surface: build a real map column per user (event_type →
# count), then derive deterministic projections from it. The map is
# constructed from SORTED entries so downstream key/value order is
# engine-independent; the oracle derives the same projections
# relationally (map internals don't hash stably across engines, their
# projections do).
@query(
    "map_event_type_counts",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT user_id,
           string_agg(event_type, '|' ORDER BY event_type) AS type_keys,
           string_agg(CAST(n AS VARCHAR), '|' ORDER BY event_type) AS type_counts,
           MAX(CASE WHEN event_type = 'click' THEN n END) AS n_clicks,
           CAST(COUNT(*) AS INT) AS n_types
    FROM per GROUP BY user_id
    """,
)
def map_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type histogram AS A MAP COLUMN (map_from_entries
    over sorted struct entries), projected back to scalars via
    map_keys / map_values / element_at. Exercises MapType end-to-end
    — construction, lookup, iteration. The key/value projections are
    serialized to '|'-joined strings in the FINAL select (r6 driver
    lesson: top-level array/map columns crash the harness' pandas
    canonicalizer); event_type names contain no '|', and the sorted
    map entries make both joined strings deterministic."""
    # r7 hostile sweep: a NULL event_type is not a countable type and
    # NULL map keys are illegal in Spark (one such row aborted the
    # query) — excluded in both formulations
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("event_type", "n")))
    )
    return (
        per.groupBy("user_id")
        .agg(m.alias("m"))
        .select(
            "user_id",
            F.array_join(F.map_keys("m"), "|").alias("type_keys"),
            F.array_join(
                F.transform(F.map_values("m"), lambda v: v.cast("string")), "|"
            ).alias("type_counts"),
            F.element_at("m", "click").alias("n_clicks"),
            F.size("m").alias("n_types"),
        )
    )


# TPC-H Q9 shape: product-type profit by supplier nation and year.
# The reference schema has no partsupp, so supply cost is proxied by
# p_retailprice·quantity — same plan shape (5-way join, pattern filter
# on part, two-key aggregate), exact decimal arithmetic throughout.
@query(
    "product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM({_REV_SQL}
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per (supplier nation, order year) over parts
    matching a name pattern. Plan: the part-side pattern filter prunes
    lineitem FIRST (the selective join), dims broadcast, one two-key
    aggregate shuffle; money stays DECIMAL until the final cast."""
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    o, s = t(spark, sf_dir, "orders"), t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    cost = F.col("p_retailprice").cast("decimal(18,2)") * F.col("l_quantity").cast(
        "decimal(18,2)"
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_name").like("%red%"))),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(rev - cost).cast("double").alias("profit"))
    )


# TPC-H Q16 shape: supplier diversity per part attribute bucket, with
# a NOT-IN exclusion. partsupp is proxied by the (l_partkey,
# l_suppkey) pairs actually observed in lineitem.
@query(
    "parts_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 2, 3, 4, 5, 11, 28, 37)
      AND p.p_brand <> 'Brand#2'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier count per (brand, type, size) over
    a size whitelist, excluding denylisted suppliers via anti-join
    (the NOT IN compiles to LeftAnti — no per-row subquery). The
    exclusion list is dim-sized and broadcasts; the distinct count is
    the standard two-phase expand."""
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    keep_p = p.filter(
        F.col("p_size").isin(1, 2, 3, 4, 5, 11, 28, 37) & (F.col("p_brand") != "Brand#2")
    )
    return (
        li.join(F.broadcast(keep_p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# TPC-H Q20 shape: nested IN-subqueries — suppliers who moved more
# than a threshold quantity of pattern-matched parts in a year.
@query(
    "excess_quantity_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
          )
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 50
      )
    ORDER BY s.s_suppkey
    """,
)
def excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: two nested IN-subqueries compile to a semi-join
    chain — part pattern list prunes lineitem (broadcast), per-
    supplier quantity HAVING filters, then supplier semi-joins the
    surviving keys; never a correlated per-row subquery. Total order
    on s_suppkey for the stable result."""
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    s, n = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "nation")
    red_parts = p.filter(F.col("p_name").like("%red%")).select("p_partkey")
    movers = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(n.filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# Operational: join-key skew census — the diagnosis you run BEFORE
# choosing a mitigation (salted join/agg in operators/skew.py, AQE
# skew-join). A key holding >1% of a 100 TB fact table is the straggler
# that decides the job's wall clock.
@query(
    "skew_key_census",
    oracle="""
    WITH k AS (SELECT l_suppkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM k)
    SELECT k.key, CAST(k.n AS BIGINT) AS n_rows,
           CAST(k.n AS DOUBLE) / tot.total AS share
    FROM k, tot
    ORDER BY n_rows DESC, k.key
    LIMIT 20
    """,
)
def skew_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest join keys with their share of the fact table.
    One map-side-combined count shuffle + a broadcast 1-row total;
    TakeOrdered for the top-k. Total-ordered (count desc, key) so the
    report is stable run to run."""
    li = t(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(F.count("*").alias("n"))
    tot = k.groupBy().agg(F.sum("n").cast("bigint").alias("total"))
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "key",
            F.col("n").cast("bigint").alias("n_rows"),
            (F.col("n").cast("double") / F.col("total")).alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(20)
    )


# TPC-H Q2 shape: argmin-per-group with join-back — the cheapest
# observed supplier per part (partsupp proxied by lineitem's observed
# (part, supplier, unit price) triples).
@query(
    "cheapest_supplier_per_part",
    oracle="""
    SELECT p.p_partkey, p.p_name, u.l_suppkey AS s_suppkey, u.unit_price
    FROM (
      SELECT l_partkey, l_suppkey,
             l_extendedprice / l_quantity AS unit_price,
             ROW_NUMBER() OVER (
               PARTITION BY l_partkey
               ORDER BY l_extendedprice / l_quantity, l_suppkey
             ) AS rk
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        AND l_suppkey IS NOT NULL
    ) u JOIN part p ON p.p_partkey = u.l_partkey
    WHERE u.rk = 1
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: one window shuffle on the part key picks the argmin
    (price, supplier) — never a correlated per-row MIN subquery; the
    dimension join-back broadcasts. unit_price is one double division
    (identical bits in both engines), ties broken by suppkey."""
    # r7 hostile sweep: a line with NULL price/quantity has no unit
    # price and cannot be the argmin (its NULL otherwise sorts first in
    # Spark and last in DuckDB) — excluded in both engines
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        # nor can a line without a supplier name the cheapest supplier
        # (its NULL key wins price ties in Spark, loses them in DuckDB)
        & F.col("l_suppkey").isNotNull()
    )
    p = t(spark, sf_dir, "part")
    price = F.col("l_extendedprice") / F.col("l_quantity")
    rk = F.row_number().over(
        Window.partitionBy("l_partkey").orderBy(price.asc(), F.col("l_suppkey").asc())
    )
    u = (
        li.select("l_partkey", "l_suppkey", price.alias("unit_price"), rk.alias("rk"))
        .filter(F.col("rk") == 1)
    )
    return u.join(F.broadcast(p), u.l_partkey == p.p_partkey).select(
        "p_partkey", "p_name", F.col("l_suppkey").alias("s_suppkey"), "unit_price"
    )


# Pareto concentration: the 80/20 read-off for revenue — top-100
# customers with cumulative share of TOTAL revenue. Same global-window
# discipline as vocab_coverage_topk: the cumsum runs over the 100
# post-limit rows only; the corpus-sized work is one aggregate.
@query(
    "revenue_pareto",
    oracle="""
    WITH cr AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT SUM(rev) AS t FROM cr),
    top AS (SELECT o_custkey, rev FROM cr ORDER BY rev DESC, o_custkey LIMIT 100)
    SELECT o_custkey,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS INT) AS rank,
           CAST(SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(tot.t AS DOUBLE) AS cum_share
    FROM top, tot
    """,
)
def revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 customers by exact decimal revenue with rank and
    cumulative share of the TOTAL (not just the top-100) — the Pareto
    curve. The partition-less window below is over exactly 100
    post-limit rows by design (see vocab_coverage_topk); total rides
    in as a broadcast 1-row aggregate."""
    o = t(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    tot = cr.groupBy().agg(F.sum("rev").alias("t"))
    top = cr.orderBy(F.desc("rev"), "o_custkey").limit(100)
    w = Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
    return top.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        F.col("rev").cast("double").alias("revenue"),
        F.row_number().over(w).cast("int").alias("rank"),
        (
            F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
            / F.col("t").cast("double")
        ).alias("cum_share"),
    )


# Engagement: daily active users + 7-day rolling activity via a RANGE
# frame keyed on the calendar day. The window input is per-DAY
# aggregates — bounded by the calendar, not the data size, so the
# partition-less range window is safe at any scale.
@query(
    "events_dau",
    # No RANGE+INTERVAL window on the oracle side: DuckDB 1.x's
    # parallel window operator was observed (r12, hostile sweep)
    # returning RUN-TO-RUN DIFFERENT frames for this exact shape —
    # ~1-in-3 executions of the identical SQL on identical data gave
    # five January days ±1 in the 7-day sum and the NULL-day row the
    # wrong frame entirely (values 78 vs 90 for one day across
    # trials, with per-day dau identical). The trailing sum is
    # instead a self-join over the DAILY aggregate (calendar-bounded,
    # ~31 rows — size-irrelevant in any engine), which has no window
    # operator to misbehave; the NULL-day group (hostile unparseable
    # ts) rides a separate branch with frame = itself, matching both
    # engines' defined NULL-peer semantics. The Spark side keeps the
    # real range window — that's the operator under test.
    # The NULL/non-NULL split keys on ts, not on the derived day:
    # day IS NULL ⇔ ts IS NULL (date_trunc never nulls a real ts),
    # and DuckDB 1.0 misevaluates `WHERE CAST(date_trunc(...) AS
    # DATE) IS NULL` to zero rows even when the GROUP BY produces a
    # NULL-day group (isolated r12 — second independent DuckDB
    # defect in this query's shape). HAVING emits the NULL row only
    # when a NULL-ts event exists, matching Spark's grouping.
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    )
    SELECT a.day, CAST(ANY_VALUE(a.dau) AS BIGINT) AS dau,
           CAST(SUM(b.dau) AS BIGINT) AS dau_7d_sum
    FROM d a JOIN d b ON b.day BETWEEN a.day - 6 AND a.day
    GROUP BY a.day
    UNION ALL
    SELECT CAST(NULL AS DATE) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau_7d_sum
    FROM events WHERE ts IS NULL
    HAVING COUNT(*) > 0
    """,
)
def events_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day activity sum: distinct users per day (one
    expand shuffle), then a RANGE window over epoch-days — gaps in the
    calendar are handled by the range frame (a missing day simply
    contributes nothing), which a rows-frame would get wrong."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date(F.col("ts").cast("timestamp")).alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    w = Window.orderBy(F.unix_date("day")).rangeBetween(-6, 0)
    return d.select(
        "day",
        F.col("dau").cast("bigint").alias("dau"),
        F.sum("dau").over(w).cast("bigint").alias("dau_7d_sum"),
    )


# Mergeable-sketch distinct rollup: the incremental form of
# COUNT(DISTINCT) at 100 TB. Daily HLL sketches (the pay-once ingest
# pass you'd persist) are UNIONED per event_type — register-wise max,
# so the result is bit-identical to sketching the whole range directly
# (pinned by tests/test_sketches.py::test_union_equals_direct, along
# with a tolerance bound vs exact). Estimates are engine-specific
# (DataSketches HLL vs DuckDB's HLL differ by construction), hence
# rows_only; the equality + tolerance pins are the correctness
# evidence. Reference analog: monthly_etl.py re-aggregates raw rows on
# every refresh — this is what replaces that at scale.
@query(
    "approx_distinct_sketch_union",
    rows_only="DataSketches HLL estimate is engine-specific; lossless union vs "
    "direct sketch + tolerance vs exact are pinned in tests/test_sketches.py",
)
def approx_distinct_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via union of per-day sketches —
    two shuffles of KB-sized sketches; the raw table is scanned once
    (in deployment: never, the daily sketch table is persisted)."""
    from analytics_etl_spark.operators.sketches import group_sketches, union_rollup

    ev = t(spark, sf_dir, "events")
    daily = group_sketches(
        ev.withColumn("day", F.to_date(F.col("ts").cast("timestamp"))),
        ["event_type", "day"],
        "user_id",
    )
    return union_rollup(daily, ["event_type"]).orderBy("event_type")


# The HLL family's ORACLE-PAIRED guarantee arm (VERDICT r15 item 5,
# the heavy_hitters_guaranteed pattern): the estimate itself is
# engine-specific, but the published error envelope is a deterministic
# per-dataset fact — lg_k=12 has RSE ~1.6%, so |est − exact|/exact ≤
# 5% (~3σ; worst measured across all SFs + hostile is 1.8%) is a
# stable boolean the driver can hash-check. The Spark side runs the
# REAL daily-sketch → union path (group_sketches + union_rollup, the
# queries above) plus an exact COUNT(DISTINCT), and emits
# (stream, grp, exact_distinct, within_5pct); the oracle emits the
# exact counts with TRUE. Any completeness or accuracy bug in the
# sketch path — a dropped day, a lossy union, a register-width error
# — lands outside the envelope and reds the hash, which the
# rows-only estimate queries could never do. NULL group keys are
# excluded in both engines (the inner join on the group key would
# drop them asymmetrically). Two streams keep the guarantee
# non-vacuous at every SF: events user_id per event_type (~6 groups)
# and orders o_custkey per o_orderpriority (5 groups, distinct-to-row
# ratio near 1 at small SF, ~0.6 at sf0.1).
@query(
    "approx_distinct_envelope",
    oracle="""
    WITH e AS (
      SELECT event_type AS grp,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ),
    o AS (
      SELECT o_orderpriority AS grp,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1
    )
    SELECT 'events_user' AS stream, grp, exact_distinct,
           CAST(TRUE AS BOOLEAN) AS within_5pct FROM e
    UNION ALL
    SELECT 'orders_cust' AS stream, grp, exact_distinct,
           CAST(TRUE AS BOOLEAN) AS within_5pct FROM o
    """,
)
def approx_distinct_envelope_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.sketches import group_sketches, union_rollup

    def envelope(df, grp_col, value_col, stream):
        base = df.filter(F.col(grp_col).isNotNull())
        daily = group_sketches(base, [grp_col, "_day"], value_col)
        est = union_rollup(daily, [grp_col])
        exact = base.groupBy(grp_col).agg(
            F.count_distinct(F.col(value_col)).cast("bigint").alias("exact_distinct")
        )
        # 20·|est − exact| ≤ exact ⟺ relerr ≤ 5%, in exact bigint
        return exact.join(est, grp_col).select(
            F.lit(stream).alias("stream"),
            F.col(grp_col).alias("grp"),
            "exact_distinct",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct")) * 20
                <= F.col("exact_distinct")
            ).alias("within_5pct"),
        )

    ev = t(spark, sf_dir, "events").withColumn(
        "_day", F.to_date(F.col("ts").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders").withColumn(
        "_day", F.date_format("o_orderdate", "yyyy-MM")
    )
    return envelope(ev, "event_type", "user_id", "events_user").unionByName(
        envelope(o, "o_orderpriority", "o_custkey", "orders_cust")
    )


# The Bloom family's ORACLE-PAIRED guarantee arm (r16, completing the
# sketch-guarantee set: MG r15, HLL + histogram r16): the probe
# results are xxhash64-dependent and not SQL-replayable, but the
# filter's two contractual properties are deterministic booleans —
# (a) NO FALSE NEGATIVES, ever (the error class operators/bloom.py
# promises never to produce: a member key failing the probe means a
# build/merge/probe bit bug, the one that silently DROPS data in the
# ingest prescreen); (b) the false-positive rate stays under its
# sizing bound (1M bits / k=4 over ≤150k keys → theoretical ~4%;
# worst measured anywhere 3.6%; pinned ≤ 10% as exact integer
# cross-multiply). Build set: distinct orders keys. Non-members:
# (-key - 1), anti-joined against the build set so the disjointness
# is exact by construction, not assumed. The oracle emits the exact
# counts with TRUE — a false negative or an fp explosion (e.g.
# all-true masks) reds the driver hash.
@query(
    "bloom_guarantee_envelope",
    oracle="""
    WITH k AS (
      SELECT DISTINCT o_orderkey AS key FROM orders
      WHERE o_orderkey IS NOT NULL
    ),
    nm AS (
      SELECT DISTINCT -key - 1 AS key FROM k
      WHERE -key - 1 NOT IN (SELECT key FROM k)
    )
    SELECT 'members' AS probe_set, CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(TRUE AS BOOLEAN) AS guarantee_ok
    FROM k
    UNION ALL
    SELECT 'nonmembers' AS probe_set, CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(TRUE AS BOOLEAN) AS guarantee_ok
    FROM nm
    """,
)
def bloom_guarantee_envelope_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.bloom import bloom_build, bloom_might_contain

    NUM_BITS, NUM_HASHES = 1 << 20, 4
    keys = (
        t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .filter(F.col("o_orderkey").isNotNull())
        .distinct()
    )
    bloom = bloom_build(keys, "o_orderkey", NUM_BITS, NUM_HASHES)
    members = keys.select(F.col("o_orderkey").alias("k"))
    nonmembers = (
        keys.select((-F.col("o_orderkey") - 1).alias("k"))
        .distinct()
        .join(keys.select(F.col("o_orderkey").alias("k")), "k", "left_anti")
    )
    hit = F.col("might_contain").cast("int")
    m = bloom_might_contain(members, bloom, "k", NUM_BITS, NUM_HASHES).agg(
        F.lit("members").alias("probe_set"),
        F.count("*").cast("bigint").alias("n_keys"),
        # every member must hit: min(hit) == 1
        (F.min(hit) == 1).alias("guarantee_ok"),
    )
    n = bloom_might_contain(nonmembers, bloom, "k", NUM_BITS, NUM_HASHES).agg(
        F.lit("nonmembers").alias("probe_set"),
        F.count("*").cast("bigint").alias("n_keys"),
        # fp rate <= 10%, exact bigint cross-multiply
        (F.sum(hit).cast("bigint") * 10 <= F.count("*")).alias("guarantee_ok"),
    )
    return m.unionByName(n)


def _pagerank_oracle(iters: int = 3, scale: int = 10**12) -> str:
    """Unrolled integer-PageRank SQL — same fixed-point arithmetic as
    operators/graph.py::pagerank_int, iteration by iteration, so the
    iterative DataFrame loop is held to a bit-exact oracle."""
    base = (15 * scale) // 100
    sql = f"""
    WITH e AS (
      SELECT DISTINCT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      UNION
      SELECT DISTINCT 2 * l.l_suppkey + 1 AS src, 2 * o.o_custkey AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
    n AS (SELECT DISTINCT src AS node FROM e),
    r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM n)"""
    for i in range(iters):
        sql += f""",
    r{i + 1} AS (
      SELECT n.node,
             CAST({base} + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT) AS rank
      FROM n LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank // d.deg) AS in_sum
        FROM e JOIN r{i} r ON r.node = e.src
               JOIN deg d ON d.src = e.src
        GROUP BY 1
      ) s ON s.node = n.node)"""
    sql += f"""
    SELECT (node - 1) // 2 AS supp_id, rank AS pagerank
    FROM r{iters} WHERE node % 2 = 1
    ORDER BY pagerank DESC, supp_id LIMIT 20
    """
    return sql


# Iterative graph centrality: PageRank over the symmetrized
# customer↔supplier purchase graph, EXACT integer fixed-point (see
# operators/graph.py::pagerank_int) — the quality-prior computation a
# crawl-scale corpus runs over its link graph, here held to a bit-exact
# unrolled-SQL oracle (float PageRank could only ever be rows_only).
def _purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer↔supplier purchase graph (2k / 2k+1 node
    encoding). One fact-fact join + distinct, then BOTH directions via
    a 2-element explode. The fwd.union(reversed(fwd)) form compiles to
    two copies of the fact join — locally Spark's ReusedExchange
    deduplicates them (measured parity at sf0.1), but that rescue
    depends on the optimizer recognizing identical subtrees; the
    explode form guarantees one join structurally. Reversed pairs can
    never collide with forward pairs (customer nodes are even,
    supplier nodes odd), so the distinct before the explode is exactly
    pair-level dedup."""
    o, li = t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    fwd = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (2 * F.col("o_custkey")).alias("a"),
            (2 * F.col("l_suppkey") + 1).alias("b"),
        )
        .distinct()
    )
    return fwd.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")



@query("supplier_pagerank", oracle=_pagerank_oracle())
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by purchase-graph PageRank. Edge build: one
    fact-fact join + distinct; then 3 iterations of join+groupBy on
    the edge list (see pagerank_int docstring for the scale story)."""
    from analytics_etl_spark.operators.graph import pagerank_int

    ranks = pagerank_int(_purchase_edges(spark, sf_dir), iters=3)
    return (
        ranks.filter(F.col("node") % 2 == 1)
        .select(
            ((F.col("node") - 1) / 2).cast("bigint").alias("supp_id"),
            F.col("rank").alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), "supp_id")
        .limit(20)
    )


# Statistical anomaly detection with EXACT arithmetic: flag days whose
# revenue sits ≥2σ from the mean. z-scores are the textbook float
# hazard (variance via float sums re-associates), so the test
# z² ≥ k² is cross-multiplied into integers:
#   (n·s_d − T)² ≥ k²·(n·T2 − T²)
# with s in integer cents (FLOOR(x·100) — IEEE-exact in any engine),
# T = Σs, T2 = Σs². Spark computes in DECIMAL(38,0), DuckDB in
# HUGEINT — both exact at these magnitudes (≤10^26 at sf1), so a
# boolean that depends on the 20th digit still hash-matches. The
# global stats ride a broadcast 1-row frame (never a shuffle).
@query(
    "revenue_anomaly_days",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT COUNT(*) AS n, SUM(CAST(revenue_cents AS HUGEINT)) AS t,
             SUM(CAST(revenue_cents AS HUGEINT) * CAST(revenue_cents AS HUGEINT)) AS t2
      FROM d
    )
    SELECT day, revenue_cents,
           (CAST(n AS HUGEINT) * revenue_cents - t)
             * (CAST(n AS HUGEINT) * revenue_cents - t)
             >= 4 * (CAST(n AS HUGEINT) * t2 - t * t) AS is_anomaly
    FROM d, g ORDER BY day
    """,
)
def revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days with |revenue − μ| ≥ 2σ, decided in exact integer
    arithmetic (see comment above): one day-agg shuffle + a broadcast
    1-row global-stats frame; scales as a single pass at any size."""
    o = t(spark, sf_dir, "orders")
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("revenue_cents")
    )
    s = F.col("revenue_cents")
    g = d.agg(
        F.count("*").alias("n"),
        F.sum(d19(s)).alias("t"),
        F.sum(d19(s) * d19(s)).alias("t2"),
    )
    nd = d19(F.col("n"))
    diff = nd * d19(s) - F.col("t")
    rhs = F.lit(4).cast("decimal(19,0)") * (nd * F.col("t2") - F.col("t") * F.col("t"))
    return (
        d.crossJoin(F.broadcast(g))
        .select("day", "revenue_cents", (diff * diff >= rhs).alias("is_anomaly"))
        .orderBy("day")
    )


# Data-quality census: per-column null/distinct/min/max over orders in
# ONE scan — the profiling pass a 100 TB ingest runs before accepting a
# partition (ReadSchema stays full-width here by intent: the profile IS
# about every column). Multiple count_distincts ride Spark's Expand
# (one pass, k-way row expansion), then the 1-row aggregate unpivots
# via stack(). The float column is profiled for nulls/distinct but its
# min/max are left out of the string surface — double→string
# formatting is engine-specific, everything else here is exact.
@query(
    "table_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_val FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR),
           CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR)
    FROM orders
    """,
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    aggs += [
        (F.count("*") - F.count("o_orderdate")).alias("o_orderdate__nulls"),
        F.count_distinct(F.col("o_orderdate")).alias("o_orderdate__distinct"),
        F.min(F.to_date("o_orderdate")).cast("string").alias("o_orderdate__min"),
        F.max(F.to_date("o_orderdate")).cast("string").alias("o_orderdate__max"),
    ]
    one = o.agg(*aggs)
    parts = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols + ["o_orderdate"]
    )
    return one.selectExpr(
        f"stack(5, {parts}) AS (col_name, n_nulls, n_distinct, min_val, max_val)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


# The at-scale variant of the census above (VERDICT r5 item 3): the
# exact profile's multiple COUNT(DISTINCT)s ride an Expand (k-way row
# multiplication) that forces SortAggregate — fine for a nightly audit,
# wrong for a daily/continuous profile of a 100 TB table. Here every
# n_distinct is a DataSketches HLL estimate (lg_k=12, ~1.6% RSE): no
# Expand, no row multiplication, ONE hash-aggregate pass whose partial
# state is 4 KiB per column regardless of cardinality. nulls/min/max
# stay exact — they were always single-pass. rows_only because HLL
# estimates are engine-specific (same declared reason as
# approx_distinct_sketch_union); the estimate-vs-exact envelope is
# pinned in tests/test_sketches.py, and bench pairs it with
# table_profile_orders to measure the Expand tax.
@query(
    "table_profile_sketch",
    rows_only="DataSketches HLL n_distinct estimates are engine-specific; "
    "error envelope vs the exact census pinned in tests/test_sketches.py",
)
def table_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(c).cast("string"), F.lit(12))
            ).cast("bigint").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    aggs += [
        (F.count("*") - F.count("o_orderdate")).alias("o_orderdate__nulls"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.to_date("o_orderdate").cast("string"), F.lit(12))
        ).cast("bigint").alias("o_orderdate__distinct"),
        F.min(F.to_date("o_orderdate")).cast("string").alias("o_orderdate__min"),
        F.max(F.to_date("o_orderdate")).cast("string").alias("o_orderdate__max"),
    ]
    one = o.agg(*aggs)
    parts = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols + ["o_orderdate"]
    )
    return one.selectExpr(
        f"stack(5, {parts}) AS (col_name, n_nulls, n_distinct, min_val, max_val)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


# Provenance census: rows per physical input file via input_file_name()
# — the ingest-governance primitive behind quarantine attribution and
# bad-file rollback ("which file did these rows come from?" must be
# answerable BEFORE a reload); at deployment scale it doubles as the
# small-file/compaction monitor (sinks.writer.compact_partitions).
# rows_only for the driver: its oracle runs against pre-registered
# VIEWS, which hide file identity — but the census IS exactly
# DuckDB-reproducible via read_parquet(filename=true) with a concrete
# path, and tests/test_provenance.py pins that equality per SF dir.
@query(
    "source_file_census",
    rows_only="file identity is invisible through the driver's table views; "
    "exact DuckDB parity via read_parquet(filename=true) is pinned in "
    "tests/test_provenance.py",
)
def source_file_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = []
    for name in ["lineitem", "orders", "events"]:
        df = t(spark, sf_dir, name)
        frames.append(
            df.groupBy(
                F.lit(name).alias("tbl"),
                F.regexp_extract(F.input_file_name(), "([^/]+)$", 1).alias("fname"),
            ).agg(F.count("*").alias("n_rows"))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# Bounded BFS over the purchase graph: shortest hop distance from one
# supplier to every reachable node within 4 hops — "blast radius" /
# reachability analysis (bad-supplier contamination, recall networks).
# Third iterative family next to CC and PageRank; distances are exact
# integers, so the DataFrame loop is held to a recursive-CTE oracle
# (the CTE explores all (node, dist≤4) pairs, MIN collapses to BFS).
@query(
    "purchase_graph_bfs",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT DISTINCT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      UNION
      SELECT DISTINCT 2 * l.l_suppkey + 1, 2 * o.o_custkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    walk(node, dist) AS (
      SELECT CAST(3 AS BIGINT), 0
      UNION
      SELECT e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.node
      WHERE w.dist < 4
    )
    SELECT node, CAST(MIN(dist) AS INT) AS dist FROM walk GROUP BY 1
    """,
)
def purchase_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.graph import bfs_levels

    # seed node 3 = supplier 1 in the 2k+1 encoding
    return bfs_levels(_purchase_edges(spark, sf_dir), seed=3, max_hops=4).select(
        "node", F.col("dist").cast("int").alias("dist")
    )


# Gaps-and-islands: longest consecutive run of error events per user —
# the classic streak analysis (retention streaks, failure bursts, SLA
# runs) via the rn-difference trick: two ROW_NUMBERs (one global per
# user, one per (user, type)) differ by a constant within each
# consecutive island. Ordering is made total with the event_id
# tiebreak, so the islands — and the answer — are deterministic.
# Two window passes + one agg; every shuffle is keyed by user.
@query(
    "longest_error_streak",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS island
      FROM events
    ),
    runs AS (
      SELECT user_id, COUNT(*) AS streak
      FROM seq WHERE event_type = 'error'
      GROUP BY user_id, island
    )
    SELECT user_id, CAST(MAX(streak) AS BIGINT) AS longest_streak
    FROM runs GROUP BY 1
    """,
)
def longest_error_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    runs = (
        seq.filter(F.col("event_type") == "error")
        .groupBy("user_id", "island")
        .agg(F.count("*").alias("streak"))
    )
    return runs.groupBy("user_id").agg(
        F.max("streak").cast("bigint").alias("longest_streak")
    )


# Time-weighted average (TWAP): mean event value weighted by how long
# it was the CURRENT value — the honest aggregate for irregular
# sampling (a price that held for 3 hours must outweigh ten 1-second
# blips; the row-mean gets this exactly backwards). LOCF durations
# come from lead(ts) per event_type with the event_id tiebreak for a
# total order. Exactness: value→integer cents (FLOOR(v·100)), duration
# →integer seconds; the weighted sum is then BIGINT arithmetic, and
# the single final division is one IEEE op — deterministic in any
# engine. One window pass + one agg, both keyed by event_type.
@query(
    "value_twap",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             TRY_CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             epoch_us(LEAD(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)
                      - ts) AS dur_us
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
        AND NOT isnan(value) AND value > -1e15 AND value < 1e15
    )
    SELECT event_type,
           CAST(SUM(cents * dur_us) AS BIGINT) AS weighted_cents_us,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           CAST(SUM(cents * dur_us) AS DOUBLE) / CAST(SUM(dur_us) AS DOUBLE) / 100.0
             AS twap
    FROM seq WHERE dur_us IS NOT NULL AND cents IS NOT NULL
    GROUP BY 1
    """,
)
def value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7 hostile sweep: NULL-ts rows have no place on the time axis
    # (and Spark/DuckDB disagree on NULL sort position); a corrupt
    # value whose cents overflow int64 (or NaN) becomes NULL via
    # try_cast in both engines and its interval is excluded
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        # bounded domain (r7 hostile sweep): Spark's floor(double)
        # yields a SATURATING long (NaN -> 0, ±huge -> Long.MIN/MAX —
        # silent corruption, then decimal->bigint overflow at the end)
        # while DuckDB floors to double and TRY_CASTs to NULL; corrupt
        # magnitudes are excluded identically in both engines instead
        & ~F.isnan("value")
        & (F.col("value") > -1e15)
        & (F.col("value") < 1e15)
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.floor(F.col("value") * 100).try_cast("long").alias("cents"),
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull() & F.col("cents").isNotNull())
    # Accumulate in DECIMAL(38,0), not BIGINT (ADVICE r5): with long
    # LOCF gaps (dur_us ~1e11) and large groups a bigint sum silently
    # wraps in non-ANSI mode while the DuckDB oracle sums in HUGEINT —
    # decimal matches the oracle's widened accumulator exactly (same
    # trick as corpus_checksum); the bigint cast happens once at the end.
    prod = F.col("cents").cast("decimal(19,0)") * F.col("dur_us").cast("decimal(19,0)")
    num = F.sum(prod).cast("decimal(38,0)")
    den = F.sum(F.col("dur_us").cast("decimal(38,0)"))
    return seq.groupBy("event_type").agg(
        num.cast("bigint").alias("weighted_cents_us"),
        den.cast("bigint").alias("total_us"),
        (num.cast("double") / den.cast("double") / F.lit(100.0)).alias("twap"),
    )


# Referential-integrity audit: orphan counts for every FK edge in the
# schema, one row per relationship — the nightly data-quality gate
# that catches a partial load (an orders partition landed but its
# customers didn't). Each edge is one LeftAnti against the parent's
# key projection — at scale the parent side is its key column only,
# and the anti join is the same shuffle class as the enrichment join
# it guards.
@query(
    "fk_integrity_audit",
    oracle="""
    SELECT 'lineitem->orders' AS fk_edge, COUNT(*) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer', COUNT(*)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', COUNT(*)
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'lineitem->supplier', COUNT(*)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'documents->embeddings', COUNT(*)
    FROM documents d WHERE NOT EXISTS
      (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def orphans(child, ckey, parent, pkey, label):
        return (
            child.join(parent.select(F.col(pkey).alias(ckey)), ckey, "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(label).alias("fk_edge"), "n_orphans")
        )

    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    c, n = t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    d, e = t(spark, sf_dir, "documents"), t(spark, sf_dir, "embeddings")
    frames = [
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem->orders"),
        orphans(o, "o_custkey", c, "c_custkey", "orders->customer"),
        orphans(c, "c_nationkey", n, "n_nationkey", "customer->nation"),
        orphans(li, "l_suppkey", s, "s_suppkey", "lineitem->supplier"),
        orphans(d, "doc_id", e.select(F.col("vec_id")), "vec_id", "documents->embeddings"),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# Semi-structured props through Spark 4's VARIANT type: parse once,
# extract with variant path expressions — the open-schema ingest shape
# (new keys appear without migrations; a 100 TB props column stays one
# binary-encoded column, no per-key sparsity). Contrast
# json_extract_props, which string-parses per access: variant parses
# ONCE and every extraction is a binary path lookup. Exact integer
# aggregates; the one division is a single IEEE op.
@query(
    "events_props_variant_stats",
    oracle="""
    -- TRY_CAST, not CAST (ADVICE r5): Spark's try_variant_get(...,
    -- 'long') nulls out non-integer $.k values, so the oracle must
    -- null (and not count) the same rows regardless of data — a
    -- strict CAST would error/diverge on any malformed value.
    SELECT event_type,
           CAST(SUM(TRY_CAST(json_extract_string(j, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(COUNT(TRY_CAST(json_extract_string(j, '$.k') AS BIGINT)) AS BIGINT)
             AS k_count,
           CAST(SUM(TRY_CAST(json_extract_string(j, '$.k') AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(TRY_CAST(json_extract_string(j, '$.k') AS BIGINT)) AS DOUBLE)
             AS k_mean
    FROM (SELECT event_type,
                 CASE WHEN json_valid(props) THEN props END AS j
          FROM events) GROUP BY 1
    """,
)
def events_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # try_parse_json, not parse_json (r7 hostile sweep): one malformed
    # props string aborted the whole aggregate; NULL variant -> NULL k
    # in both engines instead
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    agg = ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("k_sum"),
        F.count("k").cast("bigint").alias("k_count"),
    )
    return agg.select(
        "event_type", "k_sum", "k_count",
        (F.col("k_sum").cast("double") / F.col("k_count").cast("double")).alias("k_mean"),
    )


# Correlated-aggregate comparison: orders priced above their own
# customer's average — decorrelated into one per-customer aggregate +
# a join (how every engine actually executes the correlated subquery).
# The comparison is exact: price > sum/count becomes
# price·count > sum in integer cents (cross-multiplied — the same
# trick as revenue_anomaly_days), so no division appears anywhere.
@query(
    "orders_above_customer_avg",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT o.o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_above
    FROM orders o JOIN s ON s.o_custkey = o.o_custkey
    WHERE CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) * s.n > s.total_cents
    GROUP BY 1
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    s = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(cents).alias("total_cents"), F.count("*").alias("n")
    )
    return (
        o.join(s, o.o_custkey == s.ck)
        .filter(cents * F.col("n") > F.col("total_cents"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").cast("bigint").alias("n_above"))
    )


# Period-over-period: monthly revenue with exact month-over-month
# delta — LAG over the month series in integer cents (the delta of
# two exact sums is exact; a float pct-change would not hash). The
# window input is one row per MONTH — bounded by the calendar, so the
# partition-less ordered window is safe at any scale (same argument
# as events_dau).
@query(
    "monthly_revenue_mom",
    oracle="""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    )
    SELECT month, revenue_cents,
           CAST(revenue_cents - LAG(revenue_cents) OVER (ORDER BY month)
                AS BIGINT) AS mom_delta_cents
    FROM m ORDER BY month
    """,
)
def monthly_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7 hostile sweep: undated orders have no month — excluded in
    # both engines (a NULL month otherwise shifts the whole LAG chain,
    # and its sort position is engine-dependent)
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("bigint")
        .alias("revenue_cents")
    )
    w = Window.orderBy("month")
    return m.select(
        "month",
        "revenue_cents",
        (F.col("revenue_cents") - F.lag("revenue_cents").over(w))
        .cast("bigint")
        .alias("mom_delta_cents"),
    ).orderBy("month")


# Year-to-date running revenue: cumulative window per calendar year in
# exact cents — the fiscal-reporting companion to monthly_revenue_mom
# (partitioned by year, so the running sum never exceeds 12 rows per
# partition regardless of data size).
@query(
    "revenue_ytd",
    oracle="""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y') AS yr,
             strftime(o_orderdate, '%Y-%m') AS month,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, month, revenue_cents,
           CAST(SUM(revenue_cents) OVER (PARTITION BY yr ORDER BY month)
                AS BIGINT) AS ytd_cents
    FROM m ORDER BY month
    """,
)
def revenue_ytd(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format("o_orderdate", "yyyy").alias("yr"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("bigint")
        .alias("revenue_cents")
    )
    w = Window.partitionBy("yr").orderBy("month")
    return m.select(
        "yr",
        "month",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("bigint").alias("ytd_cents"),
    ).orderBy("month")


# Exact triangle count over the co-purchase part graph (parts sharing
# an order) — the graph-structure metric behind clustering-coefficient
# quality priors. Degree-ordered orientation bounds the wedge join at
# O(E^1.5) regardless of hub parts (see operators/graph.py::
# triangle_count); the oracle is the naive a<b<c three-way self-join,
# an honest cross-check of the oriented algorithm against declarative
# SQL. Exact integer count.
# The registered query bounds its input to one ship-year (a pushed
# scan predicate): the full-corpus graph at sf0.1 is already DENSE
# (avg part degree ~120, 1.9M triangles) and the exact count costs
# ~6.5 s there — honest but a demo query shouldn't be the suite's
# slowest entry; the operator itself is size-agnostic and its scaling
# argument (orientation bound) is in the operator docstring.
@query(
    "copurchase_triangles",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                      greatest(x.l_partkey, y.l_partkey) AS b
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
      WHERE x.l_shipdate >= TIMESTAMP '1995-01-01'
        AND x.l_shipdate <  TIMESTAMP '1996-01-01'
        AND y.l_shipdate >= TIMESTAMP '1995-01-01'
        AND y.l_shipdate <  TIMESTAMP '1996-01-01'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM pairs e1
    JOIN pairs e2 ON e2.a = e1.b
    JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.graph import triangle_count

    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    x = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    y = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        x.join(y, "ok")
        .filter(F.col("pa") != F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    return triangle_count(edges)


# Keyed interval-overlap join: per-user error windows [ts, ts+10min)
# overlapping view windows [ts, ts+5min) — "which browsing sessions
# were exposed to an active incident". The naive form is a per-user
# theta join; operators/intervals.py buckets the time axis so it runs
# as ONE hash equi-join on (user, bucket) with build-side dedupe (each
# pair kept only in its overlap-start bucket — no distinct shuffle).
# All integer micros; overlap length exact.
@query(
    "interval_overlap_events",
    oracle="""
    WITH err AS (
      SELECT user_id, event_id AS error_id, epoch_us(ts) AS ls,
             epoch_us(ts) + 600000000 AS le
      FROM events WHERE event_type = 'error'
    ),
    vw AS (
      SELECT user_id, event_id AS view_id, epoch_us(ts) AS rs,
             epoch_us(ts) + 300000000 AS re
      FROM events WHERE event_type = 'view'
    )
    SELECT e.user_id, e.error_id, v.view_id,
           least(e.le, v.re) - greatest(e.ls, v.rs) AS overlap
    FROM err e JOIN vw v
      ON e.user_id = v.user_id AND e.ls < v.re AND v.rs < e.le
    """,
)
def interval_overlap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.intervals import interval_overlap_join

    ev = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        us.alias("ls"),
        (us + F.lit(600_000_000)).alias("le"),
    )
    vw = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        us.alias("rs"),
        (us + F.lit(300_000_000)).alias("re"),
    )
    joined = interval_overlap_join(
        err,
        vw.withColumnRenamed("v_user", "user_id"),
        keys=["user_id"],
        bucket_width=600_000_000,
        l_start="ls",
        l_end="le",
        r_start="rs",
        r_end="re",
    )
    return joined.select("user_id", "error_id", "view_id", "overlap")


@query(
    "k_anonymity_audit",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 6000) AS BIGINT) AS bal_bucket,
           CAST(COUNT(*) AS BIGINT) AS group_n,
           CAST(COUNT(DISTINCT right(c_name, 1)) AS BIGINT) AS l_sensitive,
           COUNT(*) < 10 AS k_at_risk,
           COUNT(DISTINCT right(c_name, 1)) < 2 AS l_at_risk
    FROM customer GROUP BY 1, 2, 3
    """,
)
def k_anonymity_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit for a release candidate: k-anonymity
    and l-diversity over the customer quasi-identifiers
    (nation, market segment, coarse balance bucket). A group smaller
    than k=10 re-identifies its members by QI intersection
    (k_at_risk); a group whose sensitive attribute (last name digit —
    a stand-in for any non-QI sensitive column) takes < 2 distinct
    values discloses that attribute for every member even at safe k
    (l_at_risk). Pure groupBy+count — map-side combined, one shuffle
    keyed on the QI, no skew risk (group count is QI-cardinality-
    bounded). Split calibration: two-sided at sf0.01 (306 at-risk /
    19 safe) and sf0.1 (43/332); at the sf0.001 smoke slice every
    group is genuinely under k (150 customers over ~120 QI cells) —
    the audit reports the fact. Extends the reference's validation/
    audit family (fk_integrity_audit, constraint_validation) to the
    privacy dimension a training-data release needs."""
    c = t(spark, sf_dir, "customer")
    n = F.count("*").cast("bigint")
    l = F.countDistinct(F.substring("c_name", -1, 1)).cast("bigint")
    return c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 6000).cast("bigint").alias("bal_bucket"),
    ).agg(
        n.alias("group_n"),
        l.alias("l_sensitive"),
        (n < 10).alias("k_at_risk"),
        (l < 2).alias("l_at_risk"),
    )


@query(
    "cms_frequency_estimate",
    oracle="""
    WITH tc AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1
    ),
    top AS (SELECT * FROM tc ORDER BY true_n DESC, l_partkey LIMIT 20),
    ck AS (
      SELECT unnest(range(0, 4)) AS r, md5(l_partkey::VARCHAR) AS h, true_n AS kn
      FROM tc
    ),
    cms AS (
      SELECT r,
             ('0x' || substr(h, CAST(1 + 8 * r AS INT), 8))::BIGINT % 2048 AS b,
             CAST(SUM(kn) AS BIGINT) AS cnt
      FROM ck GROUP BY 1, 2
    ),
    pb AS (
      SELECT l_partkey, r,
             ('0x' || substr(md5(l_partkey::VARCHAR), CAST(1 + 8 * r AS INT), 8))::BIGINT % 2048 AS b
      FROM (SELECT l_partkey, unnest(range(0, 4)) AS r FROM top)
    ),
    est AS (
      SELECT l_partkey, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est_n
      FROM pb LEFT JOIN cms USING (r, b) GROUP BY 1
    )
    SELECT top.l_partkey, true_n, est_n FROM top JOIN est USING (l_partkey)
    """,
)
def cms_frequency_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates (operators/cms.py) for
    the 20 highest-frequency parts, next to their exact counts — the
    sketch family's first fully ORACLE-PAIRED member: md5-bucket
    hashing + int64 counters make build, estimate, and the min-over-
    rows reduction bit-identical across engines (the HLL/Misra-Gries
    members are rows-only because their encodings are
    engine-specific; CMS has no such encoding). est_n ≥ true_n always
    (one-sided guarantee — collisions only add); at sf0.01's ~2000
    distinct parts over a 4×2048 grid, several top keys genuinely
    collide, so the overestimate path is exercised, not idle.
    Exact side: one hash-agg; sketch side: explode ×4 → grid-bounded
    agg (≤ 8192 cells, broadcast to the probe join)."""
    from analytics_etl_spark.operators.cms import cms_build, cms_estimate

    li = t(spark, sf_dir, "lineitem")
    tc = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("true_n"))
    )
    top = tc.orderBy(F.desc("true_n"), "l_partkey").limit(20)
    cms = cms_build(li, "l_partkey")
    est = cms_estimate(cms, top.select("l_partkey"), "l_partkey")
    return top.join(est, "l_partkey").select("l_partkey", "true_n", "est_n")


@query(
    "cms_join_size_estimate",
    oracle="""
    WITH lk AS (
      SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS kn
      FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
    ),
    ok AS (
      SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS kn
      FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1
    ),
    lc AS (
      SELECT r, ('0x' || substr(h, CAST(1 + 8 * r AS INT), 8))::BIGINT % 1048576 AS b,
             CAST(SUM(kn) AS BIGINT) AS cnt
      FROM (SELECT unnest(range(0, 4)) AS r, md5(k::VARCHAR) AS h, kn FROM lk)
      GROUP BY 1, 2
    ),
    oc AS (
      SELECT r, ('0x' || substr(h, CAST(1 + 8 * r AS INT), 8))::BIGINT % 1048576 AS b,
             CAST(SUM(kn) AS BIGINT) AS cnt
      FROM (SELECT unnest(range(0, 4)) AS r, md5(k::VARCHAR) AS h, kn FROM ok)
      GROUP BY 1, 2
    ),
    ip AS (
      SELECT lc.r, CAST(SUM(lc.cnt * oc.cnt) AS BIGINT) AS ip
      FROM lc JOIN oc ON lc.r = oc.r AND lc.b = oc.b GROUP BY 1
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey) AS true_join_size,
      (SELECT CAST(CASE WHEN COUNT(*) < 4 THEN 0 ELSE MIN(ip) END AS BIGINT)
         FROM ip) AS est_join_size
    """,
)
def cms_join_size_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join cardinality estimation from sketches
    (operators/cms.py::cms_join_size_estimate, Cormode-Muthukrishnan
    §4.3): size the flagship's one fact-fact join (lineitem ⋈ orders)
    from two kilobyte CMS tables — min over hash rows of the
    cell-wise inner product — next to the true size. The planner
    primitive: estimate BEFORE running, from mergeable
    streaming-maintained sketches, never a table scan. est ≥ true
    always (collision cross terms only add); both numbers int64
    exact, fully oracle-paired. Sizing rule exercised for real: at
    the frequency-estimate default width 2048 the cross terms
    (≈ e·N_a·N_b/w) swamp the 600k-row truth 74× at sf0.1; at
    width 2^20 the measured estimate is 1.01× the truth at sf0.01
    and 1.14× at sf0.1 — the planner-usable regime. The sparse cell
    table stays key-bounded (≤ 4·distinct keys rows), not
    grid-bounded, so the wider grid costs nothing extra."""
    from analytics_etl_spark.operators.cms import cms_build, cms_join_size_estimate

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    est = cms_join_size_estimate(
        cms_build(li, "l_orderkey", width=1_048_576),
        cms_build(o, "o_orderkey", width=1_048_576),
    )
    true_n = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count("*").cast("bigint").alias("true_join_size"))
    )
    return true_n.crossJoin(F.broadcast(est))
