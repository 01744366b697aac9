"""r17 WARM per-stage profile of corpus_build_classifier_gated's final
text pass + the classifier/gate cache-hit overheads, matching the
bench's warm-rep shape. Measurement-only."""

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
    from analytics_etl_spark.queries import REGISTRY

    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    fn = REGISTRY["corpus_build_classifier_gated"].fn
    fn(spark, sf_dir).count()  # cold pass, populates caches
    timeit("ENTRY corpus_build_classifier_gated (warm)",
           lambda: fn(spark, sf_dir).count())

    # now decompose the warm rep: rebuild the same plan objects the
    # entry builds, relying on CacheManager hits for the cached frames
    from analytics_etl_spark.operators.classifier import nb_classifier_scores
    from analytics_etl_spark.operators.sampling import dataset_split
    from analytics_etl_spark.operators.text_analysis import (
        chunk_documents,
        gopher_quality_flags,
    )
    from pyspark.sql import Window

    pool = docs.filter(F.col("doc_id") >= 25)
    g_keep = (gopher_quality_flags(pool, stopwords=("the", "a"))
              .filter(F.col("keep")).select("doc_id"))
    surv = pool.join(g_keep, "doc_id", "left_semi")
    nb_handles = []
    scored = nb_classifier_scores(surv, ref_pred=F.col("lang") == "en",
                                  cache_handles=nb_handles)
    sb = scored.select("doc_id", F.expr("score_q DIV 16").alias("sbucket")).persist()
    hist = sb.groupBy("sbucket").agg(F.count("*").cast("bigint").alias("cnt"))
    w_cum = Window.orderBy("sbucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy("sbucket").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select("sbucket", F.sum("cnt").over(w_cum).alias("cum"),
                      F.sum("cnt").over(w_all).alias("n"))
    bounds = cum.agg(F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("sbucket"))).alias("b1"))
    keep_ids = (sb.crossJoin(F.broadcast(bounds))
                .filter(F.col("sbucket") > F.col("b1")).select("doc_id").cache())

    timeit("warm: keep_ids.count (cache-hit path)", lambda: keep_ids.count())

    gated_pool = pool.select("doc_id", "text").join(keep_ids, "doc_id", "left_semi")

    from analytics_etl_spark.plans.corpus_build import corpus_build
    bench = docs.filter(F.col("doc_id") < 25).select("doc_id", "text")

    def warm_build():
        result, _ = corpus_build(gated_pool, bench)
        return result.count()

    timeit("warm: corpus_build() on gated pool (cached decisions)", warm_build)

    # decompose the final text pass (uncached per rep)
    result, _ = corpus_build(gated_pool, bench)
    result.count()

    # surviving ids after gates (mirrors internals; cache-hit)
    from analytics_etl_spark.operators.dedup import minhash_lsh_dedup, word_shingles
    from analytics_etl_spark.operators.text_analysis import (
        ngram_contamination,
        repetition_metrics,
    )
    m = repetition_metrics(gated_pool, n=2)
    quality_ids = (m.filter((F.col("n_ngrams") >= 20) & (F.col("dup_ngram_frac") <= 0.05)
                            & (F.col("top_ngram_frac") <= 0.06)).select("doc_id").cache())
    corpus_grams = word_shingles(gated_pool, n=3, distinct=True)
    bench_grams = word_shingles(bench, n=3, distinct=True)
    contaminated_ids = (ngram_contamination(corpus_grams, bench_grams)
                        .filter(F.col("contamination_frac") > 0.2).select("doc_id").cache())
    pairs = (minhash_lsh_dedup(gated_pool, min_jaccard=0.5)
             .select("doc_a", "doc_b").cache())
    surv2_ids = quality_ids.join(contaminated_ids, "doc_id", "left_anti").cache()
    drop_ids = (
        pairs.join(surv2_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(surv2_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id")).distinct()
    )
    surv3_ids = surv2_ids.join(drop_ids, "doc_id", "left_anti")

    timeit("warm: surv3_ids.count (gate combine only)",
           lambda: surv3_ids.count())

    joined = gated_pool.join(surv3_ids, "doc_id", "left_semi")
    timeit("warm: pool semi-join survivors (text pass, no chunk)",
           lambda: joined.count())

    assigned = dataset_split(joined, splits=(("train", 0.9), ("val", 0.05), ("test", 0.05)))
    timeit("warm: + dataset_split", lambda: assigned.count())

    chunks = chunk_documents(assigned, chunk_words=50, overlap=10, keep_cols=("split",))
    timeit("warm: + chunk_documents (count only)", lambda: chunks.count())

    result2 = chunks.groupBy("split").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )
    timeit("warm: + final agg (full text pass)", lambda: result2.count())

    spark.stop()


if __name__ == "__main__":
    main()
