"""Per-stage wall-clock profile of the CC-backed heavy entries (r17).

Times each stage of dedup_semantic_cc's pipeline in isolation (warm,
repeated) to locate where its ~9.6 s at sf0.1 actually goes, and
specifically A/Bs the connected_components edge-materialization shape:

  current: sym = edges.union(edges.reversed).localCheckpoint(eager)
           -- the edge pipeline appears TWICE under one action
  probe:   e = edges.localCheckpoint(eager); sym = e.union(e.reversed)
           -- the edge pipeline runs once; symmetrize over the
              checkpointed rows

Measurement-only; not part of any query path.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analytics_etl_spark import get_spark  # noqa: E402
from analytics_etl_spark.tables import load_table  # noqa: E402


def timeit(label, fn, reps=3):
    runs = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    med = statistics.median(runs)
    print(f"{label:55s} {med:7.3f}s  [{min(runs):.3f}..{max(runs):.3f}]")
    return med


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from analytics_etl_spark.operators.ivf import (
        _semantic_assigned_pairs,
        kmeans_centroids,
    )
    from analytics_etl_spark.operators.similarity import valid_embeddings

    emb = load_table(spark, sf_dir, "embeddings")

    # warm the JVM + Python workers
    emb.count()
    gated = valid_embeddings(emb, "embedding", 64)
    timeit("gated.count (incl. count job for k)", lambda: gated.count())

    timeit(
        "kmeans_centroids k=4 iters=3",
        lambda: kmeans_centroids(gated, k=4, iters=3),
        reps=3,
    )
    cents = kmeans_centroids(gated, k=4, iters=3)

    def fresh_pairs():
        handles = []
        assigned, pairs = _semantic_assigned_pairs(
            emb, 0.3, None, 3, "vec_id", "embedding", 64, None, 500,
            handles, centroids=cents,
        )
        return assigned, pairs, handles

    def run_pairs_once():
        assigned, pairs, handles = fresh_pairs()
        n = pairs.count()
        for h in handles:
            h.unpersist()
        return n

    timeit("pairs.count (assign + cell self-join, fresh persist)",
           run_pairs_once)

    # current shape: union BEFORE checkpoint
    def sym_union_first():
        assigned, pairs, handles = fresh_pairs()
        sym = (
            pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
            .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
            .localCheckpoint(eager=True)
        )
        n = sym.count()
        for h in handles:
            h.unpersist()
        return n

    timeit("sym checkpoint, union-first (current shape)", sym_union_first)

    # probe shape: checkpoint edges once, then symmetrize
    def sym_ckpt_first():
        assigned, pairs, handles = fresh_pairs()
        e = (
            pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
            .localCheckpoint(eager=True)
        )
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        n = sym.count()
        for h in handles:
            h.unpersist()
        return n

    timeit("sym, edges-checkpoint-first (probe shape)", sym_ckpt_first)

    # full entries end-to-end for context
    from analytics_etl_spark.queries import REGISTRY

    for name in ("dedup_semantic", "dedup_semantic_cc"):
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).count()  # warm
        timeit(f"ENTRY {name}", lambda f=fn: f(spark, sf_dir).count())

    spark.stop()


if __name__ == "__main__":
    main()
