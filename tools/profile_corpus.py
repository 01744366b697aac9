"""r17 per-stage profile of corpus_build_classifier_gated and
corpus_refresh_pipeline. Sequential cold-cache stage attribution:
each stage's first action materializes it over the already-cached
upstream, so the deltas are per-stage costs.

Measurement-only; not part of any query path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window  # noqa: E402

from analytics_etl_spark import get_spark  # noqa: E402
from analytics_etl_spark.tables import load_table  # noqa: E402


def mark(label, t0):
    t1 = time.time()
    print(f"{label:58s} {t1 - t0:7.3f}s", flush=True)
    return t1


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from analytics_etl_spark.operators.classifier import nb_classifier_scores
    from analytics_etl_spark.operators.dedup import minhash_lsh_dedup, word_shingles
    from analytics_etl_spark.operators.text_analysis import (
        gopher_quality_flags,
        ngram_contamination,
        repetition_metrics,
    )

    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm
    pool = docs.filter(F.col("doc_id") >= 25)

    t0 = time.time()
    g_keep = (
        gopher_quality_flags(pool, stopwords=("the", "a"))
        .filter(F.col("keep")).select("doc_id")
    )
    n = g_keep.count()
    t0 = mark(f"gopher gate count ({n})", t0)

    surv = pool.join(g_keep, "doc_id", "left_semi")
    nb_handles = []
    scored = nb_classifier_scores(
        surv, ref_pred=F.col("lang") == "en", cache_handles=nb_handles
    )
    sb = scored.select("doc_id", F.expr("score_q DIV 16").alias("sbucket")).persist()
    n = sb.count()
    t0 = mark(f"NB classifier + sbucket persist ({n})", t0)

    hist = sb.groupBy("sbucket").agg(F.count("*").cast("bigint").alias("cnt"))
    w_cum = Window.orderBy("sbucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy("sbucket").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select("sbucket", F.sum("cnt").over(w_cum).alias("cum"),
                      F.sum("cnt").over(w_all).alias("n"))
    bounds = cum.agg(F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("sbucket"))).alias("b1"))
    keep_ids = (sb.crossJoin(F.broadcast(bounds))
                .filter(F.col("sbucket") > F.col("b1")).select("doc_id").cache())
    n = keep_ids.count()
    t0 = mark(f"tertile keep_ids ({n})", t0)
    for h in nb_handles:
        h.unpersist()
    sb.unpersist()

    gated_pool = pool.select("doc_id", "text").join(keep_ids, "doc_id", "left_semi")

    # corpus_build stages, manually unrolled
    m = repetition_metrics(gated_pool, n=2)
    quality_ids = (
        m.filter((F.col("n_ngrams") >= 20) & (F.col("dup_ngram_frac") <= 0.05)
                 & (F.col("top_ngram_frac") <= 0.06))
        .select("doc_id").cache()
    )
    n = quality_ids.count()
    t0 = mark(f"cb: repetition_metrics quality_ids ({n})", t0)

    bench = docs.filter(F.col("doc_id") < 25).select("doc_id", "text")
    corpus_grams = word_shingles(gated_pool, n=3, distinct=True)
    bench_grams = word_shingles(bench, n=3, distinct=True)
    contaminated_ids = (
        ngram_contamination(corpus_grams, bench_grams)
        .filter(F.col("contamination_frac") > 0.2).select("doc_id").cache()
    )
    n = contaminated_ids.count()
    t0 = mark(f"cb: contamination ids ({n})", t0)

    pairs = (minhash_lsh_dedup(gated_pool, min_jaccard=0.5)
             .select("doc_a", "doc_b").cache())
    n = pairs.count()
    t0 = mark(f"cb: minhash_lsh pairs ({n})", t0)

    from analytics_etl_spark.operators.sampling import dataset_split
    from analytics_etl_spark.operators.text_analysis import chunk_documents

    surv2_ids = quality_ids.join(contaminated_ids, "doc_id", "left_anti").cache()
    drop_ids = (
        pairs.join(surv2_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(surv2_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id")).distinct()
    )
    surv3_ids = surv2_ids.join(drop_ids, "doc_id", "left_anti")
    assigned = dataset_split(gated_pool.join(surv3_ids, "doc_id", "left_semi"),
                             splits=(("train", 0.9), ("val", 0.05), ("test", 0.05)))
    chunks = chunk_documents(assigned, chunk_words=50, overlap=10, keep_cols=("split",))
    result = chunks.groupBy("split").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )
    n = result.count()
    t0 = mark(f"cb: gate combine + final chunk pass ({n})", t0)

    # refresh profile
    from analytics_etl_spark.queries import REGISTRY
    fn = REGISTRY["corpus_refresh_pipeline"].fn
    t0 = time.time()
    fn(spark, sf_dir).count()
    t0 = mark("ENTRY corpus_refresh_pipeline (cold)", t0)
    fn(spark, sf_dir).count()
    mark("ENTRY corpus_refresh_pipeline (warm)", t0)

    spark.stop()


if __name__ == "__main__":
    main()
