"""r17 probe: does truncating the corpus_build decision frames' logical
plans (cache + lazy localCheckpoint) cut the driver-side re-analysis
cost, and are the results identical? Measurement-only."""

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


def build(spark, sf, truncate: bool):
    from analytics_etl_spark.operators.dedup import minhash_lsh_dedup, word_shingles
    from analytics_etl_spark.operators.sampling import dataset_split
    from analytics_etl_spark.operators.text_analysis import (
        chunk_documents,
        ngram_contamination,
        repetition_metrics,
    )

    docs = load_table(spark, sf, "documents")
    pool = docs.filter(F.col("doc_id") >= 25).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 25).select("doc_id", "text")

    def decide(df):
        c = df.cache()
        if truncate:
            return c.localCheckpoint(eager=False)
        return c

    m = repetition_metrics(pool, n=2)
    quality_ids = decide(
        m.filter((F.col("n_ngrams") >= 20) & (F.col("dup_ngram_frac") <= 0.05)
                 & (F.col("top_ngram_frac") <= 0.06)).select("doc_id"))
    corpus_grams = word_shingles(pool, n=3, distinct=True)
    bench_grams = word_shingles(bench, n=3, distinct=True)
    contaminated_ids = decide(
        ngram_contamination(corpus_grams, bench_grams)
        .filter(F.col("contamination_frac") > 0.2).select("doc_id"))
    pairs = decide(minhash_lsh_dedup(pool, min_jaccard=0.5)
                   .select("doc_a", "doc_b"))
    surv2_ids = decide(quality_ids.join(contaminated_ids, "doc_id", "left_anti"))
    drop_ids = (
        pairs.join(surv2_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(surv2_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id")).distinct()
    )
    surv3_ids = surv2_ids.join(drop_ids, "doc_id", "left_anti")
    assigned = dataset_split(pool.join(surv3_ids, "doc_id", "left_semi"),
                             splits=(("train", 0.9), ("val", 0.05), ("test", 0.05)))
    chunks = chunk_documents(assigned, chunk_words=50, overlap=10, keep_cols=("split",))
    return chunks.groupBy("split").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, sf, "documents").count()

    r_base = build(spark, sf, truncate=False)
    rows_base = sorted(map(tuple, r_base.collect()))
    timeit("BASE  warm rep (construct + count)",
           lambda: build(spark, sf, truncate=False).count())

    r_tr = build(spark, sf, truncate=True)
    rows_tr = sorted(map(tuple, r_tr.collect()))
    print("results identical:", rows_base == rows_tr, flush=True)
    timeit("TRUNC warm rep (construct + count)",
           lambda: build(spark, sf, truncate=True).count())

    # and alternate to be fair about cache state
    timeit("BASE  warm rep again", lambda: build(spark, sf, truncate=False).count())
    timeit("TRUNC warm rep again", lambda: build(spark, sf, truncate=True).count())

    spark.stop()


if __name__ == "__main__":
    main()
