"""Sources: paginated REST DataSource + JSON ingest quarantine."""

from __future__ import annotations

import json

from analytics_etl_spark.sources.json_ingest import orders_from_json_strings, read_orders_json
from analytics_etl_spark.sources.rest import PAGE_SIZE, register_rest_source


def _read_rest(spark, **opts):
    register_rest_source(spark)
    r = spark.read.format("rest_orders")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rest_source_pagination_fanout(spark):
    df = _read_rest(
        spark,
        locations="L1,L2",
        pages_per_location="3",
        start_date="2025-11-01",
        end_date="2025-11-30",
    )
    assert df.count() == 2 * 3 * PAGE_SIZE
    # S6: partition per (location, page) — parallel fan-out
    assert df.rdd.getNumPartitions() == 6
    locs = {r["location_id"] for r in df.select("location_id").distinct().collect()}
    assert locs == {"L1", "L2"}


def test_rest_source_test_mode_caps_pages(spark):
    """S5 — test mode stops after 2 pages (reference square_service.py:201-209)."""
    df = _read_rest(spark, locations="L1", pages_per_location="9", test="true")
    assert df.count() == 2 * PAGE_SIZE


def test_rest_source_pushed_predicates(spark):
    """S2/S3 — date range + state are source options; every produced
    row satisfies them (no client-side filtering needed)."""
    df = _read_rest(
        spark, locations="L1", start_date="2025-10-01", end_date="2025-10-02", state="COMPLETED"
    )
    rows = df.collect()
    assert all(r["state"] == "COMPLETED" for r in rows)
    assert all(r["closed_at"].startswith("2025-10-0") for r in rows)


def test_rest_source_deterministic_pages(spark):
    a = sorted(r["order_id"] for r in _read_rest(spark, locations="L1").collect())
    b = sorted(r["order_id"] for r in _read_rest(spark, locations="L1").collect())
    assert a == b


def test_json_ingest_quarantines_corrupt(spark, tmp_path):
    p = tmp_path / "orders.jsonl"
    good = {
        "id": "o1",
        "location_id": "SQ1",
        "closed_at": "2025-11-24T13:27:45Z",
        "line_items": [
            {
                "name": "latte",
                "variation_name": None,
                "quantity": "1",
                "base_price_money": {"amount": 500, "currency": "USD"},
                "gross_sales_money": {"amount": 500, "currency": "USD"},
                "modifiers": [],
            }
        ],
    }
    p.write_text(json.dumps(good) + "\n" + '{"id": broken!!!\n')
    orders, corrupt = read_orders_json(spark, str(p))
    assert orders.count() == 1
    assert corrupt.count() == 1


def test_orders_from_json_strings(spark):
    payload = json.dumps(
        {"id": "o2", "location_id": "SQ2", "closed_at": "2025-11-01T00:00:00Z", "line_items": []}
    )
    df = spark.createDataFrame([(payload,)], "raw string")
    parsed = orders_from_json_strings(spark, df, "raw")
    assert parsed.columns == ["id", "location_id", "closed_at", "line_items"]
    assert parsed.first()["id"] == "o2"
