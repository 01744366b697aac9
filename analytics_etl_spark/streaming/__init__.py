"""Structured Streaming surface — the reference's incremental batch
semantics generalized to streams (SURVEY.md §2.7)."""

from analytics_etl_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    windowed_event_counts,
    write_idempotent_partitions,
)
