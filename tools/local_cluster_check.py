"""Portability gate: the driver window + the heavy operator families
under ``local-cluster[2, 8, 8192]`` — real executor PROCESSES instead
of local[N]'s threads (VERDICT r13 item 2).

What changes vs local[N], and what this run therefore certifies:
- every task closure is cloudpickled to a separate Python/JVM process
  (flushes accidental driver-state capture in the mapInPandas
  kernels — the multimodal decoders, shingling, winnowing);
- shuffles move over loopback TCP instead of in-process memory;
- broadcasts are actually serialized and shipped to executors;
- ``localCheckpoint`` blocks live on executors, not in the driver.

Results are compared against the same DuckDB oracles as the standard
gate (tools/check_oracle.py is reused verbatim — only the master URL
differs, injected via SPARK_GRAFT_MASTER), so a pass here is the
full hash-equality bar, not a smoke test.

Usage:
    python tools/local_cluster_check.py [sf_dir]     # default sf0.001

Picks DRIVER_WINDOW (the 50 driver-checked queries) + the heavy
families + every Python-kernel query (closure-capture risk) — the
surfaces where a single-process assumption could hide. Run the
UNFILTERED sweep under this master for a full certification:
    SPARK_GRAFT_MASTER='local-cluster[2,8,8192]' \\
        python tools/check_oracle.py /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_GRAFT_MASTER", "local-cluster[2,8,8192]")
# 2 workers x 8 cores = 16 task slots; size shuffle partitions to that
os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analytics_etl_spark.queries import DRIVER_WINDOW, REGISTRY  # noqa: E402
from tests.test_queries_registry import PYTHON_KERNEL_OK  # noqa: E402
from tools import check_oracle  # noqa: E402

# the scale-critical compositions (the 10x-rehearsal families) — kept
# green under process isolation even when rotation moves them out of
# the driver window
HEAVY_FAMILIES = (
    "dedup_minhash_lsh",
    "corpus_build_pipeline",
    "corpus_refresh_pipeline",
    "knn_graph_clusters",
    "text_search_bm25",
    "copurchase_communities",
    "dataset_split_cluster_safe",
    "dedup_substring_remove",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = [
        n
        for n in dict.fromkeys(
            list(DRIVER_WINDOW) + list(HEAVY_FAMILIES) + sorted(PYTHON_KERNEL_OK)
        )
        if n in REGISTRY
    ]
    print(
        f"# local-cluster check: {len(names)} queries on "
        f"{os.environ['SPARK_GRAFT_MASTER']} at {sf_dir}"
    )
    sys.argv = [sys.argv[0], sf_dir, *names]
    return check_oracle.main()


if __name__ == "__main__":
    sys.exit(main())
