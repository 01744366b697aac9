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
from analytics_etl_spark.queries import llm2  # noqa: F401,E402

# The external correctness harness compares only the FIRST 50 entries of
# queries() (dict insertion order), so window membership is a curated,
# test-pinned artifact — not an accident of module import order.
#
# ROTATION POLICY (round 6 revision, per VERDICT r5 item 1): the
# window = FIXED_CORE (10 slots that never leave: the flagship plus
# one representative per parity cluster and per major LLM family) +
# ROTATION (40 slots that change every round). After five all-green
# rounds the 32-slot core was low-information — every member had
# multiple driver rows while 56 oracle-paired queries had none; the
# 10/40 split clears that backlog in two rounds instead of 3+. The
# rotation pool is every oracle-paired query not in the core; each
# round the slots go to the LEAST-RECENTLY driver-checked pool members
# (history = the CORRECTNESS_r{N}.json artifacts; tools/rotate_window.py
# mechanizes the selection). Rows-only queries never occupy a window
# slot (they'd burn the slot on an err:no_oracle row; their evidence
# channel is pytest + the local rows-only check). Membership changes
# must update tests/test_queries_registry.py in the same commit;
# everything outside the window stays locally oracle-checked every
# round (tools/check_oracle.py runs the full registry).
FIXED_CORE: tuple[str, ...] = (
    # flagship (join+agg parity cluster)
    "flagship_monthly_revenue",
    # pushed-predicate scan cluster
    "month_window_scan",
    # top-K / sort-pushdown cluster
    "recent_sales_topk",
    # quarantine / validation clusters
    "quarantine_rejects",
    "constraint_validation",
    # explode + array-HOF cluster
    "modifier_rollup",
    # datetime-function cluster
    "date_parts",
    # dedup family
    "dedup_minhash_lsh",
    # similarity family
    "similarity_topk_cosine",
    # text/chunking family
    "token_budget_packing",
)

# Round-9 rotation (output of tools/rotate_window.py, the steady-state
# least-recently-checked policy finally exercised after r8 reused the
# r7 window verbatim): the 40 stalest oracle-paired non-core queries —
# the 7 remaining r2-row holders (shipping_priority et al.), then the
# r4 cohort (17), then the alphabetically-first r5 fills. Every name
# below last earned a driver row in r2/r4/r5; the r7/r8 window members
# all rotate out with fresh green rows standing.
ROTATION: tuple[str, ...] = (
    "shipping_priority",
    "sql_api_revenue_by_status",
    "string_functions_pack",
    "time_bucket_15min",
    "tumbling_window_agg",
    "unpivot_event_counts",
    "window_running_revenue",
    "asof_join_last_click",
    "corpus_filter_pipeline",
    "corpus_frequency_score",
    "docs_balanced_topn",
    "docs_chunked_overlap",
    "docs_stats_by_lang",
    "embedding_centroids",
    "funnel_conversion",
    "grouping_sets_revenue",
    "pricing_summary",
    "quantiles_exact",
    "rollup_revenue",
    "sessionize_events",
    "text_langid",
    "text_pii_redact",
    "text_repetition_metrics",
    "top_similar_pairs",
    "anti_join_inactive_customers",
    "benchmark_contamination",
    "broadcast_join_enrich",
    "cents_to_dollars",
    "corpus_build_pipeline",
    "cube_counts",
    "dataset_split",
    "dedup_cluster_canonical",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental_batch",
    "dedup_ngram_jaccard",
    "dim_scan",
    "doc_fingerprint_winnow",
    "docs_stratified_sample",
    "embedding_norms",
)

DRIVER_WINDOW: tuple[str, ...] = FIXED_CORE + ROTATION


def queries():
    ordered = {name: REGISTRY[name].fn for name in DRIVER_WINDOW}
    ordered.update(
        (name, spec.fn) for name, spec in REGISTRY.items() if name not in ordered
    )
    return ordered


def oracle_sql():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
