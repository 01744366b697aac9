"""Mergeable fixed-width histogram (operators/histogram.py): build /
merge / quantile contracts, pinned against exact sorted-order
percentiles and the lossless-merge property."""

from __future__ import annotations

from pyspark.sql import functions as F

from analytics_etl_spark.operators.histogram import (
    histogram_build,
    histogram_merge,
    histogram_quantiles,
)

QS = ((1, 4), (1, 2), (3, 4), (9, 10))


def test_quantile_lower_edge_contract(spark):
    """The returned lo is the lower edge of the first bin whose
    cumulative count reaches q·total — within one bin width of the
    exact percentile, and exactly equal when values are bin edges."""
    vals = [(float(10 * i),) for i in range(1, 101)]  # 10..1000
    df = spark.createDataFrame(vals, "v double")
    out = {
        (r["q_num"], r["q_den"]): r
        for r in histogram_quantiles(histogram_build(df, "v", 10), QS, 10).collect()
    }
    # exact percentiles: p25=250 ... the ceil(q*n)-th value is 10*ceil(q*100)
    for (num, den), want in (((1, 4), 250.0), ((1, 2), 500.0), ((3, 4), 750.0), ((9, 10), 900.0)):
        r = out[(num, den)]
        assert r["lo"] == want, (num, den, r)
        assert r["total_n"] == 100


def test_merge_is_lossless_and_handles_negatives_and_junk(spark):
    """Incremental merges equal the one-shot histogram exactly;
    NULL/NaN/Inf are gated; negative values floor into negative bins."""
    import math

    a = spark.createDataFrame(
        [(-25.0,), (-1.0,), (3.0,), (None,), (float("nan"),)], "v double"
    )
    b = spark.createDataFrame(
        [(3.5,), (99.0,), (float("inf",),)], "v double"
    )
    merged = histogram_merge(
        histogram_build(a, "v", 10), histogram_build(b, "v", 10)
    )
    direct = histogram_build(a.unionByName(b), "v", 10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    bins = {r["bucket"]: r["cnt"] for r in merged.collect()}
    assert bins == {-3: 1, -1: 1, 0: 2, 9: 1}  # -25→-3, -1→-1, 3/3.5→0, 99→9
    assert not any(math.isnan(k) for k in bins)


def test_grouped_quantiles_match_per_group_global_read(spark):
    """Per-group quantiles over a grouped bin table equal the global
    quantiles computed group by group — no cross-group leakage. The
    two groups have deliberately disjoint value ranges so any mixing
    would shift every quantile."""
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(1000 + 10 * i)) for i in range(1, 51)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    hist = histogram_build(df, "v", 10, group_cols=("g",))
    grouped = {
        (r["g"], r["q_num"], r["q_den"]): (r["lo"], r["total_n"])
        for r in histogram_quantiles(hist, QS, 10, group_cols=("g",)).collect()
    }
    for g in ("a", "b"):
        solo = histogram_build(df.filter(F.col("g") == g), "v", 10)
        for r in histogram_quantiles(solo, QS, 10).collect():
            assert grouped[(g, r["q_num"], r["q_den"])] == (
                r["lo"],
                r["total_n"],
            ), (g, r)


def test_quantiles_raise_on_column_mismatch(spark):
    """A grouped bin table handed to an ungrouped read (the pre-r12
    silent-global-mix misuse) raises; so does a misspelled group col."""
    import pytest

    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
    grouped_hist = histogram_build(df, "v", 10, group_cols=("g",))
    with pytest.raises(ValueError, match="group_cols"):
        histogram_quantiles(grouped_hist, QS, 10)
    with pytest.raises(ValueError, match="group_cols"):
        histogram_quantiles(grouped_hist, QS, 10, group_cols=("gg",))


def test_grouped_merge_is_lossless(spark):
    """Incremental grouped merges equal the one-shot grouped histogram
    exactly — histogram_merge keys on every non-cnt column."""
    a = spark.createDataFrame(
        [("x", 3.0), ("x", 15.0), ("y", 3.0)], "g string, v double"
    )
    b = spark.createDataFrame(
        [("x", 3.5), ("y", 99.0), ("y", None)], "g string, v double"
    )
    merged = histogram_merge(
        histogram_build(a, "v", 10, group_cols=("g",)),
        histogram_build(b, "v", 10, group_cols=("g",)),
    )
    direct = histogram_build(a.unionByName(b), "v", 10, group_cols=("g",))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_quantiles_match_exact_percentile_within_one_bin(spark):
    """Against the orders table: each histogram quantile's bin
    contains the exact (sorted-order) percentile value."""
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    hist = histogram_build(o, "o_totalprice", 100)
    out = {
        (r["q_num"], r["q_den"]): r["lo"]
        for r in histogram_quantiles(hist, QS, 100).collect()
    }
    vals = sorted(r["o_totalprice"] for r in o.collect() if r["o_totalprice"] is not None)
    import math
    n = len(vals)
    for (num, den), lo in out.items():
        exact = vals[math.ceil(num * n / den) - 1]
        assert lo <= exact < lo + 100, ((num, den), lo, exact)
