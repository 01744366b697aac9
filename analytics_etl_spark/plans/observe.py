"""Observability — O5 in SURVEY.md §2.8, done the Spark way.

The reference accumulates run stats in a Python dict as the loop goes
(reference app/scripts/monthly_etl.py:40-47,255-259). The engine uses
the Observation API: metrics are computed ON the executors DURING the
action that already runs — zero extra passes, zero driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_write_stats(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach row-count / revenue / null-count metrics to a frame.

    Read `observation.get` AFTER an action has consumed the returned
    frame. Works identically under batch and foreachBatch.
    """
    obs = Observation("pipeline_stats")
    metrics = [
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("sale_price").cast("decimal(18,2)")).alias("total_revenue"),
        F.sum(F.when(F.col("item_category") == "N/A", 1).otherwise(0)).alias(
            "uncategorized"
        ),
    ]
    return df.observe(obs, *metrics), obs
