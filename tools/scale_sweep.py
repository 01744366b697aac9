"""Cross-SF scaling sweep: how does each operator's runtime grow as
the data grows 10x and 100x?

Absolute timings on this shared host drift ~2x between sessions, but
WITHIN one run the ratio t(sf0.1)/t(sf0.01) for the same plan is the
honest scaling signal: a well-shaped operator grows near-linearly in
its dominant input (ratio ~<= 10 for a 10x fact), while a hidden
quadratic/cartesian blows past it. This is the local stand-in for the
"would this survive 100x?" question — run it per round on the queries
whose shape changed.

Usage: python tools/scale_sweep.py [query ...]   (default: the SWEEP list)

Prints one line per query: t(sf0.001), t(sf0.01), t(sf0.1), and the
0.01->0.1 ratio, plus a JSON tail for the round notes. Medians over 3
steady-state reps after one warm-up, same discipline as bench.py.

Reading the ratio: sub-second sf0.01 numbers carry fixed per-job
overhead (scheduling, codegen reuse, driver round-trips), so healthy
ratios sit well BELOW the 10x data growth; treat ratios NEAR OR ABOVE
10 as the signal to go read the plan, and anything >> 10 as a likely
super-linear shape.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analytics_etl_spark import get_spark  # noqa: E402
from analytics_etl_spark.queries import REGISTRY  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# one representative per family whose cost model matters at 100 TB
SWEEP = [
    "flagship_monthly_revenue",   # fact-fact join + agg
    "dedup_minhash_lsh",          # shingle -> band -> bucket join
    "dedup_substring_spans",      # per-word-position explode
    "dedup_bloom_prescreen",      # r7: bloom build + probe + verify
    "similarity_topk_cosine",     # brute-force rank (linear by design)
    "text_search_bm25",           # postings + doclens join
    "copurchase_triangles",       # degree-oriented adjacency intersect
    "ingest_novelty_score",       # gram anti-join
    "session_window_agg",         # event-time windowing
    "table_profile_sketch",       # HLL profile (no Expand)
    "bpe_learned_merges",         # r7: iterative merge learning
    "value_twap",                 # r7-hardened LOCF window + exact sum
]


def main() -> None:
    names = sys.argv[1:] or SWEEP
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")
    spark = get_spark()
    out: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        times = []
        for sf in SFS:
            fn(spark, sf).count()  # warm-up (codegen, footers)
            reps = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf).count()
                reps.append(time.time() - t0)
            times.append(round(statistics.median(reps), 3))
        ratio = round(times[2] / times[1], 2) if times[1] > 0 else None
        out[name] = {
            "sf0.001": times[0],
            "sf0.01": times[1],
            "sf0.1": times[2],
            "ratio_10x": ratio,
        }
        print(
            f"{name:32s} {times[0]:7.3f}s {times[1]:7.3f}s {times[2]:7.3f}s"
            f"   x{ratio}"
        )
    print(json.dumps({"metric": "scale_sweep", "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
