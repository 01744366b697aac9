"""Incremental rollup maintenance (plans/incremental.py).

Pins the three claims: (1) refresh restores exact parity with a full
recompute after a stale month, (2) untouched month partitions are not
rewritten (file listing + mtimes identical), (3) the refresh's fact
scan pushes the month-range predicate into the parquet scan.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from analytics_etl_spark.plans.incremental import (
    build_monthly_rollup,
    changed_months_of,
    month_range_predicate,
    monthly_rollup,
    refresh_monthly_rollup,
)
from analytics_etl_spark.sinks.writer import overwrite_partitions
from analytics_etl_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _snapshot(path: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }


def test_refresh_restores_parity_touching_only_changed_month(spark, tmp_path):
    path = str(tmp_path / "rollup")
    build_monthly_rollup(spark, SF_SMOKE, path)
    truth = {
        (r["month"], r["location_name"]): (r["order_count"], r["total_revenue"])
        for r in spark.read.parquet(path).collect()
    }
    stale_month = min(m for m, _ in truth)

    # simulate a bad/partial load of one month: overwrite that single
    # partition with an aggregate computed from half the lineitems
    li = load_table(spark, SF_SMOKE, "lineitem").filter(F.col("l_linenumber") == 1)
    o = load_table(spark, SF_SMOKE, "orders").filter(
        month_range_predicate([stale_month])
    )
    bad = monthly_rollup(
        li, o, load_table(spark, SF_SMOKE, "customer"), load_table(spark, SF_SMOKE, "nation")
    )
    overwrite_partitions(bad, path, ("month",))
    now = {
        (r["month"], r["location_name"]): (r["order_count"], r["total_revenue"])
        for r in spark.read.parquet(path).collect()
    }
    assert now != truth  # the stale state is actually wrong

    before = _snapshot(path)
    n = refresh_monthly_rollup(spark, SF_SMOKE, path, [stale_month])
    assert n > 0
    after = _snapshot(path)

    # exact parity with the full recompute
    fixed = {
        (r["month"], r["location_name"]): (r["order_count"], r["total_revenue"])
        for r in spark.read.parquet(path).collect()
    }
    assert fixed == truth

    # every file outside the stale month's directory is byte-untouched
    untouched_before = {f: t for f, t in before.items() if f"month={stale_month}" not in f}
    untouched_after = {f: t for f, t in after.items() if f"month={stale_month}" not in f}
    assert untouched_before == untouched_after and untouched_before

    # empty refresh is a zero-scan no-op
    assert refresh_monthly_rollup(spark, SF_SMOKE, path, []) == 0


def test_refresh_scan_pushes_month_predicate(spark):
    o = load_table(spark, SF_SMOKE, "orders").filter(
        month_range_predicate(["1996-03", "1997-11"])
    )
    plan = o._jdf.queryExecution().executedPlan().toString()
    # the raw-date comparisons reach the parquet scan (row-group /
    # partition pruning at scale); a month_str(...).isin form would not
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters", 1)[1][:400]


def test_changed_months_of(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    sub = o.filter(month_range_predicate(["1996-03"]))
    assert changed_months_of(sub) == ["1996-03"]


def test_refresh_removes_partition_of_fully_deleted_month(spark, tmp_path):
    """ADVICE r5 (medium): dynamic partition overwrite only replaces
    partitions present in the written frame — if every fact row of a
    changed month is deleted upstream, the recompute emits zero rows
    for it and the stale rollup partition would survive on disk. The
    refresh must explicitly drop that partition directory."""
    import shutil

    path = str(tmp_path / "rollup")
    build_monthly_rollup(spark, SF_SMOKE, path)
    months = sorted(
        r["month"] for r in spark.read.parquet(path).select("month").distinct().collect()
    )
    doomed = months[0]
    assert os.path.isdir(os.path.join(path, f"month={doomed}"))

    # build a source dir where the doomed month's orders are all gone
    src = tmp_path / "sf_deleted"
    src.mkdir()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "lineitem", "events", "documents", "embeddings"):
        os.symlink(
            os.path.join(SF_SMOKE, f"{name}.parquet"), src / f"{name}.parquet"
        )
    load_table(spark, SF_SMOKE, "orders").filter(
        ~month_range_predicate([doomed])
    ).write.parquet(str(src / "orders.parquet"))

    n = refresh_monthly_rollup(spark, str(src), path, [doomed])
    assert n == 0
    # the stale partition directory is gone, the data reads back clean
    assert not os.path.exists(os.path.join(path, f"month={doomed}"))
    left = sorted(
        r["month"] for r in spark.read.parquet(path).select("month").distinct().collect()
    )
    assert left == months[1:]
    shutil.rmtree(str(src), ignore_errors=True)
