"""Custom stateful streaming operator + Observation API."""

from __future__ import annotations

from pyspark.sql import functions as F

from analytics_etl_spark.plans.observe import observed_write_stats
from analytics_etl_spark.streaming.events import read_events_stream
from analytics_etl_spark.streaming.stateful import sessionize_stream

SF = "/root/testdata/sf0.001"


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization must converge to the same
    per-user session counts as the batch window implementation."""
    stream = read_events_stream(spark, f"{SF}/events.parquet")
    out = sessionize_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_state")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode emits one row per user per batch; take the last
    streamed = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in spark.sql("SELECT * FROM sess_state").collect()
    }

    from analytics_etl_spark.queries import REGISTRY

    batch = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in REGISTRY["sessionize_events"].fn(spark, SF).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_observation_metrics(spark, nested_orders, locations_dim):
    from analytics_etl_spark.config import PipelineConfig
    from analytics_etl_spark.plans.pipeline import sales_pipeline

    cfg = PipelineConfig(start_date="2025-06-01", end_date="2025-11-30")
    sales, _ = sales_pipeline(nested_orders, locations_dim, cfg)
    observed, obs = observed_write_stats(sales)
    n = observed.count()  # the action that also computes the metrics
    got = obs.get
    assert got["rows"] == n == 3
    assert float(got["total_revenue"]) == 6.65 + 3.00 + 3.00  # sum of sale_price
    assert got["uncategorized"] == 2  # both espressos lack variation_name
