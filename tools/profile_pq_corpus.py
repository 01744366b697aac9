"""r17 per-stage profile: similarity_ann_pq* and corpus_build/refresh.

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
    from analytics_etl_spark.operators.pq import (
        _encode_udf,
        pq_adc_topk,
        pq_train_codebooks,
        unit_vector,
    )
    from analytics_etl_spark.operators.similarity import valid_embeddings
    from analytics_etl_spark.queries.llm import _EMB_DIM, _query_frame

    emb_raw = load_table(spark, sf_dir, "embeddings")
    emb = valid_embeddings(emb_raw, dim=_EMB_DIM)
    emb.count()

    # --- PQ training anatomy ---
    timeit("pq: full train (m=8 ksub=16 iters=3 sample=0.5)",
           lambda: len(pq_train_codebooks(emb, m=8, ksub=16, iters=3,
                                          sample_fraction=0.5)))
    cbs = pq_train_codebooks(emb, m=8, ksub=16, iters=3, sample_fraction=0.5)

    from analytics_etl_spark.operators.sampling import hash_bucket
    n_buckets = 1 << 30
    thresh = int(0.5 * n_buckets)
    sampled = emb.filter(hash_bucket("vec_id", n_buckets) < thresh)
    timeit("pq train: sampled.count guard", lambda: sampled.count())
    train = sampled.select(
        F.col("vec_id").alias("id"),
        unit_vector("embedding").alias("u"),
        hash_bucket("vec_id", 1 << 30).alias("hb"),
    ).persist()
    train.count()
    timeit("pq train: seed collect (warm persisted train)",
           lambda: len(train.orderBy("hb", "id").limit(16).collect()))

    dsub = 8

    def one_iter():
        enc = train.select(F.col("u"), _encode_udf(cbs)(F.col("u")).alias("codes"))
        ex = enc.select(F.posexplode("codes").alias("sub", "code"), "u")
        elems = ex.select(
            "sub", "code",
            F.posexplode(F.slice(F.col("u"), F.col("sub") * dsub + 1, dsub))
            .alias("dim", "x"),
        )
        return len(
            elems.groupBy("sub", "code", "dim")
            .agg(F.avg(F.col("x").cast("decimal(38,20)")).cast("double").alias("mu"))
            .groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mu"))).alias("dm"))
            .select("sub", "code", F.col("dm.mu").alias("cw"))
            .collect()
        )

    def one_iter_flat():
        enc = train.select(F.col("u"), _encode_udf(cbs)(F.col("u")).alias("codes"))
        ex = enc.select(F.posexplode("codes").alias("sub", "code"), "u")
        elems = ex.select(
            "sub", "code",
            F.posexplode(F.slice(F.col("u"), F.col("sub") * dsub + 1, dsub))
            .alias("dim", "x"),
        )
        return len(
            elems.groupBy("sub", "code", "dim")
            .agg(F.avg(F.col("x").cast("decimal(38,20)")).cast("double").alias("mu"))
            .collect()
        )

    def encode_only():
        enc = train.select(_encode_udf(cbs)(F.col("u")).alias("codes"))
        return enc.filter(F.size("codes") > 0).count()

    timeit("pq iter: encode UDF only", encode_only)
    timeit("pq iter: current (2 groupBys + collect)", one_iter)
    timeit("pq iter: flat (1 groupBy + 1024-row collect)", one_iter_flat)
    train.unpersist()

    def adc_query():
        return pq_adc_topk(emb, _query_frame(emb, 0), cbs, k=10,
                           exclude_ids=(0,)).count()

    timeit("pq: ADC query (inline encode, trained cbs)", adc_query)

    # --- entries end-to-end ---
    from analytics_etl_spark.queries import REGISTRY

    for name in ("similarity_ann_pq", "corpus_build_classifier_gated",
                 "corpus_refresh_pipeline"):
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).count()
        timeit(f"ENTRY {name}", lambda f=fn: f(spark, sf_dir).count())

    spark.stop()


if __name__ == "__main__":
    main()
