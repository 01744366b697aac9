"""Mergeable-sketch invariants (operators/sketches.py).

The sketch path's correctness story is NOT an oracle hash (estimates
are engine-specific) — it's two pinned properties:

1. union-of-partition-sketches == direct whole-range sketch, EXACTLY
   (HLL union is register-wise max → the incremental rollup IS the
   batch computation, not an approximation of it);
2. the estimate lands within the HLL error envelope of the exact
   COUNT(DISTINCT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from analytics_etl_spark.operators.sketches import (
    distinct_estimate,
    group_sketches,
    union_rollup,
)
from tests.conftest import SF_SMOKE


def _events(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("day", F.to_date(F.col("ts").cast("timestamp")))
    )


def test_union_equals_direct(spark):
    """Lossless merge: rolling daily sketches up to event_type gives the
    SAME estimate as sketching each event_type in one pass."""
    ev = _events(spark)
    daily = group_sketches(ev, ["event_type", "day"], "user_id")
    via_union = {
        r["event_type"]: r["approx_distinct"]
        for r in union_rollup(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in distinct_estimate(ev, ["event_type"], "user_id").collect()
    }
    assert via_union == direct and len(direct) > 0


def test_estimate_within_error_envelope(spark):
    """lg_k=12 → RSE ~1.6%; assert every group within 5% of exact
    (3 standard errors)."""
    ev = _events(spark)
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in distinct_estimate(ev, ["event_type"], "user_id").collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.05 * n), (k, n, approx[k])


def test_union_partition_invariant(spark):
    """Sketching under a DIFFERENT partitioning of the same rows (week
    instead of day, shuffled input) unions to the same estimate — the
    property that makes backfills and re-partitioned ingests safe."""
    ev = _events(spark)
    daily = group_sketches(ev, ["event_type", "day"], "user_id")
    weekly = group_sketches(
        ev.repartition(7).withColumn("wk", F.weekofyear("day")),
        ["event_type", "wk"],
        "user_id",
    )
    a = {r["event_type"]: r["approx_distinct"] for r in union_rollup(daily, ["event_type"]).collect()}
    b = {r["event_type"]: r["approx_distinct"] for r in union_rollup(weekly, ["event_type"]).collect()}
    assert a == b


def test_sketch_plan_is_jvm_aggregate(spark):
    """No Python in the plan; sketch agg is an ObjectHashAggregate with
    a partial pass before the exchange (map-side combine — the shuffle
    moves sketches, not raw rows)."""
    ev = _events(spark)
    plan = union_rollup(
        group_sketches(ev, ["event_type", "day"], "user_id"), ["event_type"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "hll_sketch_agg" in plan and "hll_union_agg" in plan


def test_corpus_checksum_is_mergeable_and_content_sensitive(spark):
    """The checksum is a modular SUM, so it composes: checksum(A ∪ B) ==
    (checksum(A) + checksum(B)) mod 2^61-1 — incremental ingest updates
    it without rescanning the corpus. And single-char content drift
    moves it."""
    from analytics_etl_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    P = 2305843009213693951
    fn = REGISTRY["corpus_checksum"].fn

    full = {r["lang"]: r["content_checksum"] for r in fn(spark, SF_SMOKE).collect()}

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    contrib = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.md5("text"))), 1, 12
        ),
        16,
        10,
    ).cast("long")

    def part_sum(pred):
        return {
            r["lang"]: r["s"]
            for r in docs.filter(pred)
            .groupBy("lang")
            .agg(F.pmod(F.sum(contrib.cast("decimal(38,0)")), F.lit(P)).cast("bigint").alias("s"))
            .collect()
        }

    a = part_sum(F.col("doc_id") % 2 == 0)
    b = part_sum(F.col("doc_id") % 2 == 1)
    merged = {k: (a.get(k, 0) + b.get(k, 0)) % P for k in set(a) | set(b)}
    assert merged == full

    # content sensitivity: flipping one doc's text changes its lang's sum
    drifted = docs.withColumn(
        "text", F.when(F.col("doc_id") == 7, F.concat(F.col("text"), F.lit("x"))).otherwise(F.col("text"))
    )
    lang7 = docs.filter(F.col("doc_id") == 7).first()["lang"]
    after = {
        r["lang"]: r["s"]
        for r in drifted.groupBy("lang")
        .agg(F.pmod(F.sum(contrib.cast("decimal(38,0)")), F.lit(P)).cast("bigint").alias("s"))
        .collect()
    }
    assert after[lang7] != full[lang7]
    assert all(after[k] == full[k] for k in full if k != lang7)


def test_table_profile_sketch_envelope_and_plan(spark):
    """table_profile_sketch (VERDICT r5 item 3): every sketched
    n_distinct lands within the lg_k=12 error envelope of the exact
    census, exact columns (n_rows/nulls/min/max) match the exact
    profile verbatim, and the plan carries NO Expand node — the whole
    point of the sketch variant is dodging the multi-distinct row
    multiplication."""
    import contextlib
    import io

    from analytics_etl_spark.queries import REGISTRY

    exact = {
        r["col_name"]: r
        for r in REGISTRY["table_profile_orders"].fn(spark, SF_SMOKE).collect()
    }
    approx_df = REGISTRY["table_profile_sketch"].fn(spark, SF_SMOKE)
    approx = {r["col_name"]: r for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for col, a in approx.items():
        e = exact[col]
        assert (a["n_rows"], a["n_nulls"]) == (e["n_rows"], e["n_nulls"]), col
        assert (a["min_val"], a["max_val"]) == (e["min_val"], e["max_val"]), col
        # lg_k=12 RSE ~1.04/sqrt(2^12) = 1.6%; allow 5 sigma (and +-1
        # absolute for tiny cardinalities where the sketch is exact-ish)
        tol = max(1.0, 0.081 * e["n_distinct"])
        assert abs(a["n_distinct"] - e["n_distinct"]) <= tol, (
            col, a["n_distinct"], e["n_distinct"])

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        approx_df.explain("formatted")
    assert "Expand" not in buf.getvalue()


def test_misra_gries_guarantees(spark):
    """The two MG theorems, empirically, on a zipf-ish stream split
    across partitions: (1) COMPLETENESS — every item with true
    frequency > n/(k+1) appears in the summary; (2) ERROR ENVELOPE —
    every reported counter underestimates by at most n/(k+1) and
    never overestimates."""
    from analytics_etl_spark.operators.freq import heavy_hitters

    # 3 hot items (~1/4, 1/8, 1/16 of the stream) over a 500-item tail
    rows = []
    i = 0
    for rep, item in ((2500, "hot_a"), (1250, "hot_b"), (625, "hot_c")):
        rows += [(i + j, item) for j in range(rep)]
        i += rep
    rows += [(i + j, f"tail_{j % 500}") for j in range(5000)]
    n = len(rows)
    true = {}
    for _, item in rows:
        true[item] = true.get(item, 0) + 1

    k = 20
    df = spark.createDataFrame(rows, "row_id long, item string").repartition(8)
    got = {r["item"]: r["est"] for r in heavy_hitters(df, "item", k=k).collect()}

    bound = n / (k + 1)
    for item, freq in true.items():
        if freq > bound:
            assert item in got, (item, freq, bound)
    for item, est in got.items():
        assert 0 < est <= true[item], (item, est, true[item])
        assert true[item] - est <= bound, (item, est, true[item], bound)
    assert len(got) <= k


def test_heavy_hitters_guaranteed_projection(spark):
    """The r15 hash-checkable MG arm: (1) the projection equals the
    exact guaranteed set {item: freq > n/(k+1)} with exact counts on
    a planted stream (the semi-join must not drop a guaranteed item
    — MG completeness holds, so nothing disappears); (2) the
    order-dependent tail never appears (items at/below the threshold
    are excluded even when the sketch happens to keep them); (3)
    nulls don't count toward n or appear as items."""
    from analytics_etl_spark.operators.freq import heavy_hitters_guaranteed

    # hot_a 40%, hot_b 30%, tail 30% over 100 items, plus nulls
    rows = (
        [(i, "hot_a") for i in range(4000)]
        + [(4000 + i, "hot_b") for i in range(3000)]
        + [(7000 + i, f"t{i % 100}") for i in range(3000)]
        + [(10000 + i, None) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "row_id long, item string").repartition(8)
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters_guaranteed(df, "item", k=3).collect()
    }
    # threshold n/(k+1) = 10000/4 = 2500: exactly the two hot items
    assert got == {"hot_a": 4000, "hot_b": 3000}
    # k large enough that MG keeps everything exactly: projection
    # still returns ONLY the guaranteed set, not all survivors
    got_k200 = {
        r["item"]: r["cnt"]
        for r in heavy_hitters_guaranteed(df, "item", k=200).collect()
    }
    # threshold n/201 ≈ 49.75: hot items plus the 30-count tail is
    # below it — tail items each appear 30 times < 49.75
    assert got_k200 == {"hot_a": 4000, "hot_b": 3000}


def test_misra_gries_k_bounds_summary(spark):
    """State never exceeds k items per partition summary, and a
    uniform stream (no heavy hitter) yields a small, bounded result."""
    from analytics_etl_spark.operators.freq import heavy_hitters, partition_summaries

    import pytest

    df = spark.range(2000).selectExpr("CAST(id % 700 AS STRING) AS item").repartition(4)
    per_part = partition_summaries(df, "item", k=10)
    import pyspark.sql.functions as F

    sizes = per_part.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert all(r["count"] <= 10 for r in sizes)
    assert heavy_hitters(df, "item", k=10).count() <= 10
    with pytest.raises(ValueError):
        partition_summaries(df, "item", k=0)


def test_approx_distinct_buyers_within_envelope(spark):
    """Envelope pin for the registered rows-only query (VERDICT r8
    item 7): approx_count_distinct(rsd=0.02) must land within 3
    standard errors (6%) of exact COUNT(DISTINCT o_custkey) — the same
    evidence class the sketch-union queries carry, so 'rows-only' for
    this query means 'bounded-error', not 'unchecked'."""
    from analytics_etl_spark.queries import REGISTRY

    approx = REGISTRY["approx_distinct_buyers"].fn(spark, SF_SMOKE).collect()[0][
        "approx_buyers"
    ]
    exact = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert abs(approx - exact) <= 0.06 * exact, (approx, exact)


def test_quantiles_approx_within_rank_envelope(spark):
    """Envelope pin for the registered rows-only query (VERDICT r8
    item 7): percentile_approx(.., accuracy=1000) guarantees rank
    error ≤ n/1000; assert each group's p50_approx lies between the
    exact 0.49 and 0.51 quantiles (rank slack 10× the guarantee, so
    the pin is robust to interpolation-convention differences while
    still catching a broken sketch)."""
    from analytics_etl_spark.queries import REGISTRY

    got = {
        r["l_returnflag"]: r["p50_approx"]
        for r in REGISTRY["quantiles_approx"].fn(spark, SF_SMOKE).collect()
    }
    # the DECISION ARM: quantiles_exact is the oracle-paired sibling
    # over the same frame/grouping — its group keys must be exactly
    # the sketch's, and the sketch p50 must sit inside its exact
    # [p25, p95] (coarse sanity on top of the tight bound below)
    exact = {
        r["l_returnflag"]: (r["p25"], r["p95"])
        for r in REGISTRY["quantiles_exact"].fn(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(got)
    for flag, p50 in got.items():
        assert exact[flag][0] <= p50 <= exact[flag][1], (flag, p50, exact[flag])
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    bounds = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.49).alias("lo"),
            F.percentile("l_extendedprice", 0.51).alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(bounds) and got
    for flag, p50 in got.items():
        lo, hi = bounds[flag]
        assert lo <= p50 <= hi, (flag, p50, lo, hi)
