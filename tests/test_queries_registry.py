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


def test_every_query_is_oracle_paired_or_declared_rows_only():
    """The round-1 lesson: a stale driver artifact hid 34 unevidenced
    queries. The registry itself now refuses silent gaps — every entry
    carries an oracle or an explicit rows-only REASON, never neither
    (also enforced at registration time by queries/registry.py)."""
    for spec in REGISTRY.values():
        assert (spec.oracle is None) != (not spec.rows_only), spec.name
        if spec.rows_only:
            assert len(spec.rows_only) > 10, f"{spec.name}: reason too thin"


def test_all_oracle_sql_executes_in_duckdb():
    """Every oracle string must actually run against the sf0.001
    parquet in DuckDB (cheap, no Spark) — so SQL rot is caught in CI,
    not in the driver's correctness gate."""
    import duckdb

    from analytics_etl_spark.tables import TABLE_NAMES, table_path

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(SF, name)}'"
        )
    for name, sql in oracle_sql().items():
        cols = [d[0] for d in con.execute(sql).description]
        assert cols, name


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    assert df.columns  # non-empty schema
    assert df.count() >= 0
