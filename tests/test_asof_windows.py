"""As-of join semantics + windowed/streaming-adjacent operators."""

from __future__ import annotations

import datetime as dt

from analytics_etl_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),
            (1, _ts("2024-01-01 12:00:00"), "p2"),
            (2, _ts("2024-01-01 09:00:00"), "p3"),  # before any right row
        ],
        "k int, t timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100),
            (1, _ts("2024-01-01 10:00:00"), 150),  # equal-ts case
            (1, _ts("2024-01-01 11:00:00"), 200),
            (2, _ts("2024-01-01 23:00:00"), 999),
        ],
        "k int, rt timestamp_ntz, v int",
    )
    return left, right


def test_asof_join_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, "k", "t", "rt", payload_cols=["v"]).collect()
    }
    assert out["p1"] == 150  # equal timestamp matches (non-strict)
    assert out["p2"] == 200
    assert out["p3"] is None  # nothing at or before


def test_asof_join_strict(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, "k", "t", "rt", payload_cols=["v"], strict=True).collect()
    }
    assert out["p1"] == 100  # equal timestamp excluded
    assert out["p2"] == 200


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, "k", "t", "rt", payload_cols=["v"]).count() == left.count()
