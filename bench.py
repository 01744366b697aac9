"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Timing is per-query wall clock over a full execute-and-consume
(count of the result), after a small warm-up query so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from analytics_etl_spark import get_spark  # noqa: E402
from analytics_etl_spark.queries import REGISTRY  # noqa: E402

HEADLINE = [
    "flagship_monthly_revenue",
    "pricing_summary",
    "shipping_priority",
    "regional_revenue",
    "window_running_revenue",
    "tumbling_window_agg",
    "sessionize_events",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "similarity_topk_cosine",
    "text_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up pass: whole-stage-codegen compilation, parquet footer
    # reads, and broadcast builds are one-time JVM costs — a cluster
    # amortizes them across the job; a benchmark shouldn't bill them
    # to the first query. Timed numbers are the steady-state runs.
    for name in HEADLINE:
        REGISTRY[name].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
