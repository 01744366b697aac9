"""Empty-input robustness: every core operator must return an empty
(correctly-schemed) result on empty input, not throw — the first
partition of a new deployment is always empty."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _empty_docs(spark):
    return spark.createDataFrame(
        [], T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ])
    )


def test_dedup_family_on_empty(spark):
    from analytics_etl_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_dedup,
        word_shingles,
    )

    docs = _empty_docs(spark)
    assert exact_dedup(docs).count() == 0
    assert word_shingles(docs, n=3).count() == 0
    assert minhash_lsh_dedup(docs, min_jaccard=0.5).count() == 0


def test_sampling_and_split_on_empty(spark):
    from analytics_etl_spark.operators.sampling import dataset_split, stratified_sample

    docs = _empty_docs(spark)
    assert stratified_sample(docs, {"en": 0.5}).count() == 0
    out = dataset_split(docs)
    assert out.count() == 0 and "split" in out.columns


def test_graph_ops_on_empty_edges(spark):
    from analytics_etl_spark.operators.graph import (
        bfs_levels,
        connected_components,
        pagerank_int,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges, src="src", dst="dst").count() == 0
    assert pagerank_int(edges).count() == 0
    # BFS from a seed with no edges: the seed itself at distance 0
    got = bfs_levels(edges, seed=7).collect()
    assert [(r["node"], r["dist"]) for r in got] == [(7, 0)]


def test_search_and_sketches_on_empty(spark):
    from analytics_etl_spark.operators.search import build_postings, conjunctive_search
    from analytics_etl_spark.operators.sketches import (
        distinct_estimate,
        group_sketches,
        union_rollup,
    )

    docs = _empty_docs(spark)
    postings = build_postings(docs)
    assert conjunctive_search(postings, ["x", "y"]).count() == 0

    ev = spark.createDataFrame([], "event_type string, day date, user_id long")
    sk = group_sketches(ev, ["event_type", "day"], "user_id")
    assert sk.count() == 0
    assert union_rollup(sk, ["event_type"]).count() == 0
    assert distinct_estimate(ev, ["event_type"], "user_id").count() == 0


def test_incremental_refresh_empty_months_is_noop(spark, tmp_path):
    from analytics_etl_spark.plans.incremental import refresh_monthly_rollup

    assert refresh_monthly_rollup(spark, "/root/testdata/sf0.001", str(tmp_path / "r"), []) == 0


def test_round10_operators_on_empty(spark):
    """Gopher flags, NB classifier, unigram metrics, CMS, priority
    samplers, containment pairs, hot-key split join: empty in → empty
    (correctly-schemed) out, no throw."""
    from analytics_etl_spark.operators.classifier import nb_classifier_scores
    from analytics_etl_spark.operators.cms import cms_build, cms_estimate
    from analytics_etl_spark.operators.dedup import containment_pairs, word_shingles
    from analytics_etl_spark.operators.sampling import (
        priority_sample,
        priority_sample_per_stratum,
    )
    from analytics_etl_spark.operators.skew import hot_key_split_join
    from analytics_etl_spark.operators.text_analysis import gopher_quality_flags
    from analytics_etl_spark.operators.unigram import (
        unigram_doc_metrics,
        unigram_word_table,
    )

    docs = _empty_docs(spark)
    assert gopher_quality_flags(docs).count() == 0
    assert nb_classifier_scores(docs, F.col("lang") == "en").count() == 0
    assert unigram_word_table(docs).count() == 0
    assert unigram_doc_metrics(docs).count() == 0
    assert containment_pairs(word_shingles(docs, n=3), 0.2).count() == 0

    empty_keys = spark.createDataFrame([], "k long")
    cms = cms_build(empty_keys, "k")
    assert cms.count() == 0
    assert cms_estimate(cms, empty_keys, "k").count() == 0

    wdocs = spark.createDataFrame([], "doc_id long, w long, lang string")
    assert priority_sample(wdocs, "w", k=5).count() == 0
    assert priority_sample_per_stratum(wdocs, "w", k=5).count() == 0

    right = spark.createDataFrame([], "k long, label string")
    assert hot_key_split_join(
        spark.createDataFrame([], "k long, v string"), right, "k", 10
    ).count() == 0
