"""Pipeline plans — the reference's driver programs as lazy DataFrame chains."""

from analytics_etl_spark.plans.pipeline import run_sales_pipeline, sales_pipeline  # noqa: F401
