"""source_file_census: exact DuckDB parity (the query is rows_only at
the driver only because views hide file identity there)."""

from __future__ import annotations

import duckdb

from analytics_etl_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


def test_file_census_matches_duckdb(spark):
    got = {
        (r["tbl"], r["fname"]): r["n_rows"]
        for r in REGISTRY["source_file_census"].fn(spark, SF_SMOKE).collect()
    }
    want = {}
    for tbl in ["lineitem", "orders", "events"]:
        for fname, n in duckdb.sql(
            f"""SELECT regexp_extract(filename, '([^/]+)$', 1), COUNT(*)
                FROM read_parquet('{SF_SMOKE}/{tbl}.parquet', filename=true)
                GROUP BY 1"""
        ).fetchall():
            want[(tbl, fname)] = n
    assert got == want and len(got) >= 3
