"""Streaming HLL sketch maintenance (streaming/ingest.merge_sketch_batch).

The two properties that make at-least-once streaming EXACT for
sketches: incremental merges equal the batch recompute bit-for-bit,
and replaying a batch changes nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from analytics_etl_spark.operators.sketches import union_rollup
from analytics_etl_spark.streaming.ingest import merge_sketch_batch
from tests.conftest import SF_SMOKE


def _events(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("day", F.to_date(F.col("ts").cast("timestamp")))
    )


def _estimates(spark, path):
    return {
        (r["event_type"], str(r["day"])): r["approx_distinct"]
        for r in union_rollup(
            spark.read.parquet(path), ["event_type", "day"]
        ).collect()
    }


def test_incremental_merges_equal_batch_recompute(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "sketches")
    # stream the table in 3 micro-batches split by event_id
    for epoch, (lo, hi) in enumerate([(0, 3), (3, 6), (6, 10)]):
        batch = ev.filter((F.col("event_id") % 10 >= lo) & (F.col("event_id") % 10 < hi))
        merge_sketch_batch(batch, epoch, path)
    incremental = _estimates(spark, path)

    direct_path = str(tmp_path / "direct")
    merge_sketch_batch(ev, 0, direct_path)  # one batch == direct sketch
    assert incremental == _estimates(spark, direct_path)
    assert len(incremental) > 0


def test_replayed_batch_is_a_noop(spark, tmp_path):
    """At-least-once delivery: merging the same micro-batch twice
    leaves every estimate unchanged (register-wise max is idempotent)
    — no epoch ledger needed, unlike row-data ingest."""
    ev = _events(spark)
    path = str(tmp_path / "sketches")
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    merge_sketch_batch(b0, 0, path)
    merge_sketch_batch(b1, 1, path)
    before = _estimates(spark, path)
    merge_sketch_batch(b1, 1, path)  # replay
    merge_sketch_batch(b0, 2, path)  # even older data re-delivered
    assert _estimates(spark, path) == before
