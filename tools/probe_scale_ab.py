"""Probe-shape unroll crossover at deployment scale (VERDICT r16 item 8).

The r16 per-site rule keeps ``dim`` optional on the probe-shaped
entries (similarity_ann_lsh_indexed / _ivf_indexed) because at sf0.1
the pruned probe scan is a few hundred rows — plan analysis + codegen
of the unrolled chain costs more than its per-row win repays. The
rule predicts the trade FLIPS once a probe scans millions of rows.
This tool measures that crossover instead of predicting it: it
synthesizes an embeddings table of ``--rows`` vectors (deterministic
xxhash-derived components, same 64-dim shape as the testdata), writes
the same LSH and IVF index layouts the bench uses, and times each
probe with fold scoring vs dim-unrolled scoring (5-rep medians,
count() action, same methodology as bench.py).

usage: python tools/probe_scale_ab.py [--rows 200000] [--reps 5]

Results land in SCALING.md (r17 row); this tool is measurement-only
and is not part of any query path.
"""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analytics_etl_spark import get_spark  # noqa: E402


def synth_embeddings(spark, n_rows: int, dim: int = 64):
    """Deterministic synthetic embeddings: component d of row i is
    derived from xxhash64(i, d) scaled into [-1, 1) — fully JVM-side,
    reproducible, no RNG-under-retry hazard (guide §2.5)."""
    cols = [
        (
            (F.xxhash64(F.col("id"), F.lit(d)) % 1000000) / 500000.0
        ).cast("double")
        for d in range(dim)
    ]
    return spark.range(n_rows).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from analytics_etl_spark.operators.ivf import (
        ivf_index_topk,
        kmeans_centroids,
        write_ivf_index,
    )
    from analytics_etl_spark.operators.similarity import (
        lsh_index_topk,
        rademacher_planes,
        write_lsh_index,
    )

    spark = get_spark("probe_scale_ab")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="aes_probe_scale_")
    try:
        emb = synth_embeddings(spark, args.rows).persist()
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        dim = len(qvec)

        print(f"# rows={args.rows} dim={dim}", file=sys.stderr)
        planes = rademacher_planes(dim, 6, 24, seed=7)
        write_lsh_index(emb, os.path.join(base, "lsh"), planes)
        cents = kmeans_centroids(emb, k=16, iters=3, sample_fraction=0.05)
        write_ivf_index(emb, os.path.join(base, "ivf"), cents)
        emb.unpersist()
        lsh = spark.read.parquet(os.path.join(base, "lsh"))
        ivf = spark.read.parquet(os.path.join(base, "ivf"))

        probes = {
            "lsh_fold": lambda: lsh_index_topk(lsh, qvec, planes, k=10, exclude_ids=(0,)),
            "lsh_unrolled": lambda: lsh_index_topk(
                lsh, qvec, planes, k=10, exclude_ids=(0,), dim=dim
            ),
            "ivf_fold": lambda: ivf_index_topk(ivf, qvec, cents, k=10, exclude_ids=(0,)),
            "ivf_unrolled": lambda: ivf_index_topk(
                ivf, qvec, cents, k=10, exclude_ids=(0,), dim=dim
            ),
        }
        results = {}
        for name, fn in probes.items():
            fn().count()  # warm-up (codegen/footers)
            runs = []
            for _ in range(args.reps):
                t0 = time.time()
                fn().count()
                runs.append(time.time() - t0)
            results[name] = round(statistics.median(runs), 3)
            print(
                f"# {name}: median {results[name]:.3f}s "
                f"[{min(runs):.3f}..{max(runs):.3f}]",
                file=sys.stderr,
            )
        # sanity: identical row ids from both scoring forms
        for fam in ("lsh", "ivf"):
            a = [r[0] for r in probes[f"{fam}_fold"]().collect()]
            b = [r[0] for r in probes[f"{fam}_unrolled"]().collect()]
            assert a == b, f"{fam}: fold vs unrolled ids diverge: {a} vs {b}"
        print(results)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
