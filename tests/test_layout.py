"""Z-order layout: measured file-level stat pruning (sinks/layout.py).

The claim under test is physical, so the assertion reads the parquet
footers directly: for probe predicates on each dimension, count the
files whose [min, max] admits the probe — exactly the skipping
decision Spark's scan makes from the same stats.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from analytics_etl_spark.sinks.layout import write_sorted, write_zordered
from tests.conftest import SF_SMOKE

FILES = 16


def _files_admitting(path: str, column: str, value: float) -> int:
    """Files whose footer min/max on `column` contains `value`."""
    hit = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == column
            )
            st = col.statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo <= value <= hi:
            hit += 1
    return hit


def test_zorder_prunes_on_both_dims(spark, tmp_path):
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "user_id", "value")
        .filter(F.col("value").isNotNull())
    )
    by_user = str(tmp_path / "by_user")
    by_z = str(tmp_path / "by_z")
    write_sorted(ev, by_user, "user_id", files=FILES)
    write_zordered(ev, by_z, ["user_id", "value"], files=FILES)

    # same data, same file count
    assert len(glob.glob(f"{by_z}/*.parquet")) == FILES
    assert spark.read.parquet(by_z).count() == ev.count()

    stats = ev.agg(
        F.expr("percentile(user_id, 0.5)"), F.expr("percentile(value, 0.5)")
    ).first()
    mid_user, mid_value = float(stats[0]), float(stats[1])

    # single-sort layout: perfect on user_id, ~blind on value
    base_value = _files_admitting(by_user, "value", mid_value)
    assert _files_admitting(by_user, "user_id", mid_user) <= 2
    assert base_value >= (3 * FILES) // 4

    # z-order: BOTH dims prune to a minority of files (~F^(1/2) regime),
    # and the value dim strictly beats the single-sort layout
    z_user = _files_admitting(by_z, "user_id", mid_user)
    z_value = _files_admitting(by_z, "value", mid_value)
    assert z_user <= FILES // 2, z_user
    assert z_value <= FILES // 2, z_value
    assert z_value < base_value


def test_zorder_key_is_jvm_only(spark):
    from analytics_etl_spark.sinks.layout import zorder_key

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    base, z = zorder_key(ev, ["user_id", "value"], bits=6)
    plan = base.withColumn("_z", z)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
