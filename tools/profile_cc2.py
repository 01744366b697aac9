"""Finer r17 profile: kmeans iteration anatomy + CC fixpoint anatomy.

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
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        runs.append(time.time() - t0)
    med = statistics.median(runs)
    print(f"{label:58s} {med:7.3f}s  [{min(runs):.3f}..{max(runs):.3f}]  -> {out}",
          flush=True)
    return med


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from analytics_etl_spark.operators.ivf import (
        _assign_udf,
        _semantic_assigned_pairs,
        kmeans_centroids,
    )
    from analytics_etl_spark.operators.similarity import (
        as_double_array,
        valid_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()
    gated = valid_embeddings(emb, "embedding", 64)
    train = gated.persist()
    train.count()
    v = as_double_array("embedding")

    # --- kmeans anatomy ---
    def seeds():
        from analytics_etl_spark.operators.sampling import hash_bucket
        return len(
            train.select(F.col("vec_id"), v.alias("v"),
                         hash_bucket("vec_id", 1 << 30).alias("hb"))
            .orderBy("hb", "vec_id").limit(4).collect()
        )

    timeit("kmeans: seed collect", seeds)
    cents = kmeans_centroids(gated, k=4, iters=3)

    def one_iter_current():
        assigned = train.select(
            _assign_udf(cents)(v).alias("cell"),
            F.posexplode(v).alias("dim", "x"),
        )
        return len(
            assigned.groupBy("cell", "dim").agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cell", F.col("dm.m").alias("centroid"))
            .collect()
        )

    def one_iter_flat_collect():
        assigned = train.select(
            _assign_udf(cents)(v).alias("cell"),
            F.posexplode(v).alias("dim", "x"),
        )
        return len(
            assigned.groupBy("cell", "dim").agg(F.avg("x").alias("m")).collect()
        )

    def assign_only():
        return train.select(_assign_udf(cents)(v).alias("cell")).filter(
            F.col("cell") >= 0
        ).count()

    timeit("kmeans iter: assign UDF only (count)", assign_only)
    timeit("kmeans iter: current (2 groupBys + collect)", one_iter_current)
    timeit("kmeans iter: flat (1 groupBy + 256-row collect)", one_iter_flat_collect)

    # --- CC anatomy ---
    handles = []
    assigned, pairs = _semantic_assigned_pairs(
        emb, 0.3, None, 3, "vec_id", "embedding", 64, None, 500,
        handles, centroids=cents,
    )
    n_pairs = pairs.count()
    print(f"n_pairs = {n_pairs}", flush=True)

    def sym_ckpt():
        sym = (
            pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
            .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
            .localCheckpoint(eager=True)
        )
        return sym.count()

    timeit("cc: sym checkpoint (warm assigned cache)", sym_ckpt)

    sym = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .localCheckpoint(eager=True)
    )

    def labels_ckpt():
        labels = (
            sym.groupBy("u").agg(F.min("v").alias("mn"))
            .select(F.col("u").alias("doc_id"),
                    F.least(F.col("u"), F.col("mn")).alias("label"))
            .localCheckpoint(eager=True)
        )
        return labels.count()

    timeit("cc: labels seed checkpoint", labels_ckpt)

    labels = (
        sym.groupBy("u").agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("doc_id"),
                F.least(F.col("u"), F.col("mn")).alias("label"))
        .localCheckpoint(eager=True)
    )

    def _step(lbl):
        neigh = (
            sym.join(lbl, sym.v == lbl.doc_id)
            .groupBy("u").agg(F.min("label").alias("nl"))
        )
        nl = F.coalesce("nl", F.col("label"))
        return lbl.join(neigh, lbl.doc_id == neigh.u, "left").select(
            "doc_id",
            F.least(F.col("label"), nl).alias("label"),
            (nl < F.col("label")).alias("chg"),
        )

    def one_round_pair():
        new_labels = _step(_step(labels).drop("chg")).localCheckpoint(eager=True)
        changed = new_labels.filter("chg").limit(1).count()
        return changed

    timeit("cc: ONE composed round (2 steps ckpt + changed count)", one_round_pair)

    # how many rounds does the real fixpoint run?
    lbl = labels
    rounds = 0
    t0 = time.time()
    for _ in range(13):
        new_labels = _step(_step(lbl).drop("chg")).localCheckpoint(eager=True)
        changed = new_labels.filter("chg").limit(1).count()
        lbl = new_labels.drop("chg")
        rounds += 1
        if changed == 0:
            break
    print(f"cc fixpoint: {rounds} composed rounds, {time.time()-t0:.3f}s total",
          flush=True)

    # end-to-end entry again for context
    from analytics_etl_spark.queries import REGISTRY
    fn = REGISTRY["dedup_semantic_cc"].fn
    fn(spark, sf_dir).count()
    timeit("ENTRY dedup_semantic_cc", lambda: fn(spark, sf_dir).count())

    spark.stop()


if __name__ == "__main__":
    main()
