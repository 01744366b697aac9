from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from analytics_etl_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="aes_warehouse_"),
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def nested_orders(spark):
    """The reference's sample order + FIXTURES.md edge cases.

    Golden expectation (reference app/services/etl_service.py:496-538):
    a 2-line-item order where one item is denylisted ('To Go Cup') and
    the revenue item costs base 565 + paid modifier 100 cents, with a
    $0 modifier that must NOT appear → exactly 1 sales row,
    sale_price 6.65, modifiers 'Oat Milk'.
    """
    from analytics_etl_spark.schemas import ORDER_SCHEMA

    def li(name, qty, base, gross, mods=None, variation=None):
        return {
            "name": name,
            "variation_name": variation,
            "quantity": qty,
            "base_price_money": {"amount": base, "currency": "USD"},
            "gross_sales_money": {"amount": gross, "currency": "USD"},
            "modifiers": mods or [],
        }

    rows = [
        # golden order: one revenue item w/ paid + free modifiers, one denylisted
        {
            "id": "golden",
            "location_id": "SQ1",
            "closed_at": "2025-11-24T13:27:45.163Z",
            "line_items": [
                li(
                    "Iced Lavander latte",
                    "1",
                    565,
                    665,
                    mods=[
                        {"name": "Oat Milk", "base_price_money": {"amount": 100}},
                        {"name": "To Go", "base_price_money": {"amount": 0}},
                    ],
                    variation="Large",
                ),
                li("To Go Cup", "1", 0, 0),
            ],
        },
        # zero-revenue item only → fully filtered
        {
            "id": "freebie",
            "location_id": "SQ1",
            "closed_at": "2025-11-25T09:00:00Z",
            "line_items": [li("free water", "1", 0, 0)],
        },
        # no line_items → skipped by explode
        {
            "id": "empty",
            "location_id": "SQ2",
            "closed_at": "2025-11-25T10:00:00Z",
            "line_items": None,
        },
        # DST check: 2025-11-02T08:30Z is 02:30 CST (fall-back was at
        # 07:00Z that morning); 2025-06-01T06:30Z is 01:30 CDT
        {
            "id": "dst-nov",
            "location_id": "SQ2",
            "closed_at": "2025-11-02T08:30:00Z",
            "line_items": [li("espresso", "2", 300, 300)],
        },
        {
            "id": "dst-jun",
            "location_id": "SQ2",
            "closed_at": "2025-06-01T06:30:00Z",
            "line_items": [li("espresso", "1", 300, 300)],
        },
        # invalid quantity (cast failure → quarantined by P5)
        {
            "id": "badqty",
            "location_id": "SQ1",
            "closed_at": "2025-11-26T12:00:00Z",
            "line_items": [li("muffin", "two", 400, 400)],
        },
    ]
    return spark.createDataFrame(rows, ORDER_SCHEMA)


@pytest.fixture(scope="session")
def locations_dim(spark):
    from analytics_etl_spark.schemas import LOCATIONS_SCHEMA

    return spark.createDataFrame(
        [(1, "Wrigleyville", "SQ1"), (2, "Southport", "SQ2"), (3, "Unused", "SQ3")],
        LOCATIONS_SCHEMA,
    )
