"""Sources — parquet catalog (tables.py), JSON ingest, paginated REST."""

from analytics_etl_spark.sources.json_ingest import read_orders_json  # noqa: F401
