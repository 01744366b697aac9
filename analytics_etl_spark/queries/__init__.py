"""Query registry — the engine's declared operator coverage.

Every operator in SURVEY.md §2 (and each scale extension) registers a
named query here: a ``(spark, sf_dir) -> DataFrame`` callable plus,
where SQL-expressible, an equivalent DuckDB oracle SQL string. The
driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json).

Determinism rules every query follows (so the value-hash is stable):
- money math in DECIMAL (exact, associative ⇒ partition-order
  independent), cast to DOUBLE only in the final projection;
- LIMIT queries carry a total order (ties broken by unique keys);
- no floats compared at full precision across engines unless they are
  pass-through column values or derived via exact decimal paths.
"""

from analytics_etl_spark.queries.registry import REGISTRY, QuerySpec, query  # noqa: F401

# import for side effects: each module registers its queries
from analytics_etl_spark.queries import parity  # noqa: F401,E402
from analytics_etl_spark.queries import analytics  # noqa: F401,E402
from analytics_etl_spark.queries import analytics2  # noqa: F401,E402
from analytics_etl_spark.queries import llm  # noqa: F401,E402

# The external correctness harness compares only the FIRST 50 entries of
# queries() (dict insertion order), so window membership is a curated,
# test-pinned artifact — not an accident of module import order. Coverage
# priority: the 17 reference-parity operators, then one representative per
# LLM-pipeline operator family (dedup / similarity / text analysis /
# sampling / chunking / contamination / embeddings / multimodal), then the
# analytics headliners. Everything else stays registered and locally
# oracle-checked (tools/check_oracle.py runs all 114); membership changes
# must update tests/test_queries_registry.py in the same commit.
DRIVER_WINDOW: tuple[str, ...] = (
    # reference parity (SURVEY.md §2.1-2.6) — 17
    "flagship_monthly_revenue",
    "sales_count_by_location",
    "sales_date_range",
    "recent_sales_topk",
    "revenue_denylist_filter",
    "explode_words",
    "modifier_rollup",
    "dim_scan",
    "date_parts",
    "tz_convert",
    "broadcast_join_enrich",
    "union_all_accumulate",
    "quarantine_rejects",
    "constraint_validation",
    "cents_to_dollars",
    "month_window_scan",
    "json_extract_props",
    # LLM-pipeline flagships — 25
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_cluster_canonical",
    "similarity_topk_cosine",
    "similarity_ann_hyperplane",
    "similarity_ann_ivf",
    "text_token_count",
    "text_quality_score",
    "text_langid",
    "doc_fingerprint_winnow",
    "text_repetition_metrics",
    "text_pii_redact",
    "docs_stratified_sample",
    "docs_balanced_topn",
    "docs_chunked_overlap",
    "token_budget_packing",
    "benchmark_contamination",
    "corpus_filter_pipeline",
    "corpus_frequency_score",
    "embedding_norms",
    "embedding_centroids",
    "dedup_embedding_cosine",
    "top_similar_pairs",
    "docs_stats_by_lang",
    "multimodal_binary_meta",
    # analytics headliners — 8
    "window_function_family",
    "rollup_revenue",
    "pricing_summary",
    "quantiles_exact",
    "grouping_sets_revenue",
    "funnel_conversion",
    "sessionize_events",
    "asof_join_last_click",
)


def queries():
    ordered = {name: REGISTRY[name].fn for name in DRIVER_WINDOW}
    ordered.update(
        (name, spec.fn) for name, spec in REGISTRY.items() if name not in ordered
    )
    return ordered


def oracle_sql():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
