"""Registry contract smoke: every declared query runs at sf0.001.

Value-level correctness is covered by tools/check_oracle.py (and the
driver's own DuckDB gate); here we assert the contract shape cheaply.
"""

from __future__ import annotations

import pytest

from analytics_etl_spark.queries import REGISTRY, oracle_sql, queries

SF = "/root/testdata/sf0.001"


def test_registry_shape():
    qs, os_ = queries(), oracle_sql()
    assert len(qs) >= 40
    assert set(os_) <= set(qs)
    # the vast majority of the surface must be oracle-checked; the
    # rows-only set is the approximate/hermetic ops (approx distinct,
    # approx quantiles, simhash, the synthetic REST source)
    assert len(os_) >= len(qs) - 5


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    assert df.columns  # non-empty schema
    assert df.count() >= 0
