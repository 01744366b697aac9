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


def test_rest_cursor_mode_matches_index_mode(spark):
    """pagination=cursor must produce the same rows as the index
    fan-out (same synthetic pages), with one partition per page token."""
    base = dict(
        locations="L1,L2",
        pages_per_location="3",
        start_date="2025-11-01",
        end_date="2025-11-30",
    )
    idx = _read_rest(spark, **base)
    cur = _read_rest(spark, pagination="cursor", **base)
    assert cur.rdd.getNumPartitions() == 6
    assert sorted(r["order_id"] for r in cur.collect()) == sorted(
        r["order_id"] for r in idx.collect()
    )


def test_cursor_walk_is_sequential_and_opaque():
    """The driver walk must follow the cursor CHAIN: each request's
    cursor is exactly the previous response's token (reference
    square_service.py:233-254), and tokens can't be forged."""
    import pytest

    from analytics_etl_spark.sources.rest import (
        SyntheticCursorTransport,
        walk_cursors,
    )

    class Recording(SyntheticCursorTransport):
        def __init__(self, pages):
            super().__init__(pages)
            self.seen = []
            self.returned = []

        def fetch(self, loc, cursor, *a):
            self.seen.append(cursor)
            rows, nxt = super().fetch(loc, cursor, *a)
            self.returned.append(nxt)
            return rows, nxt

    tr = Recording(pages=4)
    tokens = walk_cursors(tr, "L1", "2025-11-01", "2025-11-30", "COMPLETED")
    assert len(tokens) == 4
    # request i used the token returned by response i-1 (None starts)
    assert tr.seen == [None] + tr.returned[:3]
    assert tokens == tr.seen
    # opaque: a forged token is rejected by the server side
    with pytest.raises(ValueError):
        tr.fetch("L1", "2|deadbeefdead", "2025-11-01", "2025-11-30", "COMPLETED")
    # and a token signed for one location is invalid for another
    with pytest.raises(ValueError):
        tr.fetch("L2", tokens[1], "2025-11-01", "2025-11-30", "COMPLETED")


def test_cursor_walk_retries_transient_failures():
    """Retry/backoff: transient errors mid-walk recover without
    breaking the token chain (reference error shape,
    square_service.py:236-270)."""
    from analytics_etl_spark.sources.rest import (
        SyntheticCursorTransport,
        TransientAPIError,
        walk_cursors,
    )

    class Flaky(SyntheticCursorTransport):
        def __init__(self, pages, fail_on):
            super().__init__(pages)
            self.calls = 0
            self.fail_on = set(fail_on)

        def fetch(self, loc, cursor, *a):
            self.calls += 1
            if self.calls in self.fail_on:
                raise TransientAPIError(f"HTTP 503 (call {self.calls})")
            return super().fetch(loc, cursor, *a)

    tr = Flaky(pages=3, fail_on={1, 4})
    tokens = walk_cursors(tr, "L1", "2025-11-01", "2025-11-30", "COMPLETED")
    assert len(tokens) == 3
    assert tr.calls == 5  # 3 successes + 2 retried failures

    class AlwaysDown(SyntheticCursorTransport):
        def fetch(self, *a):
            raise TransientAPIError("HTTP 503")

    import pytest

    with pytest.raises(TransientAPIError):
        walk_cursors(AlwaysDown(3), "L1", "2025-11-01", "2025-11-30", "COMPLETED")


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


def test_source_auth_token_map():
    """The reference's per-location token map shape (config.py:89-152):
    default required (fail-fast), per-location overrides optional,
    fallback to default; bad credentials are NOT retried."""
    import pytest

    from analytics_etl_spark.config import SourceAuth
    from analytics_etl_spark.sources.rest import (
        AuthError,
        SyntheticCursorTransport,
        walk_cursors,
    )

    with pytest.raises(ValueError, match="default source token"):
        SourceAuth(default_token="")
    with pytest.raises(ValueError):
        SourceAuth.from_env({})  # no SOURCE_TOKEN in env

    auth = SourceAuth.from_env(
        {"SOURCE_TOKEN": "tok-default", "SOURCE_TOKEN_L1": "tok-one", "OTHER": "x"}
    )
    # override keys keep their exact casing — L1 (the casing locations
    # use everywhere in this repo) must hit the override, not fall
    # through to the default credential
    assert auth.token_for("L1") == "tok-one"
    assert auth.token_for("L2") == "tok-default"  # fallback

    # authenticated walk works; a location with an empty override 401s
    ok = SyntheticCursorTransport(2, auth=auth)
    assert len(walk_cursors(ok, "L1", "2025-11-01", "2025-11-30", "COMPLETED")) == 2

    class NoTok:
        def token_for(self, loc):
            return ""

    calls = {"n": 0}

    class Counting(SyntheticCursorTransport):
        def fetch(self, *a):
            calls["n"] += 1
            return super().fetch(*a)

    bad = Counting(2, auth=NoTok())
    with pytest.raises(AuthError):
        walk_cursors(bad, "l1", "2025-11-01", "2025-11-30", "COMPLETED")
    assert calls["n"] == 1  # 401 is terminal — no retry storm


def test_csv_ingest_quarantines_and_lands(spark, tmp_path):
    """CSV landing pattern: declared schema, malformed lines
    quarantined whole, validated rows rewritten as parquet with
    identical content (and pushdown-capable from then on)."""
    from pyspark.sql import functions as F

    from analytics_etl_spark.sources.csv_ingest import land_to_parquet, read_sales_csv

    p = tmp_path / "sales.csv"
    p.write_text(
        "item_name,sale_price,qty,month,location_id\n"
        "latte,4.50,2,2025-11,1\n"
        "espresso,3.00,1,2025-11,2\n"
        "broken,not_a_price,x,2025-11,zzz\n"
        "muffin,2.25,3,2025-12,1\n"
    )
    good, bad = read_sales_csv(spark, str(p))
    assert good.count() == 3
    assert bad.count() == 1
    assert "not_a_price" in bad.first()["_corrupt_record"]

    out = str(tmp_path / "landed")
    land_to_parquet(good, out)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, good.collect()))
    # landed parquet scans get pushdown the CSV never had
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("location_id") == 1).explain("formatted")
    assert "PushedFilters: [IsNotNull(location_id), EqualTo(location_id,1)]" in buf.getvalue()


def test_orc_sink_roundtrip(spark, tmp_path):
    """ORC as an alternative columnar sink/source format: write,
    read back, identical rows (S8 format option)."""
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", 3.5)], "id long, name string, v double"
    )
    path = str(tmp_path / "orc_out")
    df.write.format("orc").mode("overwrite").save(path)
    back = spark.read.format("orc").load(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
