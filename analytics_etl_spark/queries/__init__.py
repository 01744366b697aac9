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
from analytics_etl_spark.queries import llm3  # noqa: F401,E402

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

# Round-13 rotation (output of tools/rotate_window.py, re-run AFTER
# the round's last registry-touching commit — the continuation added
# four more oracle-paired queries after the first r13 rotation, so
# this regeneration supersedes it): the SIX never-driver-checked
# queries lead (the r13 additions: LPA communities, cluster-safe
# split, duplicate-span removal, exact heavy hitters, hard-negative
# mining, the z-order key), then pure LRU — the rest of the r8 cohort
# and the stalest r9 rows.
ROTATION: tuple[str, ...] = (
    "copurchase_communities",  # last driver row: never
    "dataset_split_cluster_safe",  # last driver row: never
    "dedup_substring_remove",  # last driver row: never
    "heavy_hitters_parts_exact",  # last driver row: never
    "knn_hard_negatives",  # last driver row: never
    "zorder_key_orders",  # last driver row: never
    "sole_late_supplier",  # last driver row: r8
    "supplier_pagerank",  # last driver row: r8
    "table_diff_reconciliation",  # last driver row: r8
    "table_profile_orders",  # last driver row: r8
    "temperature_mix_rates",  # last driver row: r8
    "text_search_bm25",  # last driver row: r8
    "text_search_conjunctive",  # last driver row: r8
    "text_search_phrase",  # last driver row: r8
    "text_tfidf_topterms",  # last driver row: r8
    "top_supplier_revenue",  # last driver row: r8
    "value_twap",  # last driver row: r8
    "wealthy_inactive_customers",  # last driver row: r8
    "anti_join_inactive_customers",  # last driver row: r9
    "asof_join_last_click",  # last driver row: r9
    "benchmark_contamination",  # last driver row: r9
    "broadcast_join_enrich",  # last driver row: r9
    "cents_to_dollars",  # last driver row: r9
    "corpus_build_pipeline",  # last driver row: r9
    "corpus_filter_pipeline",  # last driver row: r9
    "corpus_frequency_score",  # last driver row: r9
    "cube_counts",  # last driver row: r9
    "dataset_split",  # last driver row: r9
    "dedup_cluster_canonical",  # last driver row: r9
    "dedup_embedding_cosine",  # last driver row: r9
    "dedup_exact",  # last driver row: r9
    "dedup_incremental_batch",  # last driver row: r9
    "dedup_ngram_jaccard",  # last driver row: r9
    "dim_scan",  # last driver row: r9
    "doc_fingerprint_winnow",  # last driver row: r9
    "docs_balanced_topn",  # last driver row: r9
    "docs_chunked_overlap",  # last driver row: r9
    "docs_stats_by_lang",  # last driver row: r9
    "docs_stratified_sample",  # last driver row: r9
    "embedding_centroids",  # last driver row: r9
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
