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

# Round-15 rotation (output of tools/rotate_window.py, run after the
# round's last registry-touching commit): the THREE never-driver-
# checked queries lead (the r15 additions/conversion: the cluster-
# split nightly refresh, the oracle-paired DoReMi, the hash-checked
# MG guarantee arm), then pure LRU — the r10 remainder and the
# stalest r11 rows.
ROTATION: tuple[str, ...] = (
    "approx_distinct_envelope",  # last driver row: never
    "bloom_guarantee_envelope",  # last driver row: never
    "histogram_quantile_containment",  # last driver row: never
    "knn_join_bucketed",  # last driver row: r11
    "knn_join_exact",  # last driver row: r11
    "large_order_customers",  # last driver row: r11
    "longest_error_streak",  # last driver row: r11
    "market_share",  # last driver row: r11
    "mode_order_priority",  # last driver row: r11
    "monthly_revenue_mom",  # last driver row: r11
    "multimodal_frame_index",  # last driver row: r11
    "order_count_distribution",  # last driver row: r11
    "orders_above_customer_avg",  # last driver row: r11
    "orders_with_late_lines",  # last driver row: r11
    "packed_examples_exact",  # last driver row: r11
    "parts_supplier_count",  # last driver row: r11
    "product_type_profit",  # last driver row: r11
    "promo_revenue_share",  # last driver row: r11
    "purchase_graph_bfs",  # last driver row: r11
    "range_frame_revenue",  # last driver row: r11
    "returned_item_reporting",  # last driver row: r11
    "source_reputation_rank",  # last driver row: r11
    "text_gopher_rules",  # last driver row: r11
    "text_nb_classifier",  # last driver row: r11
    "unigram_tokenize_viterbi",  # last driver row: r11
    "array_functions_pack",  # last driver row: r12
    "avg_stats_per_nation",  # last driver row: r12
    "cohort_retention",  # last driver row: r12
    "conditional_pack",  # last driver row: r12
    "copurchase_triangles",  # last driver row: r12
    "date_arithmetic_pack",  # last driver row: r12
    "dedup_bloom_prescreen",  # last driver row: r12
    "dedup_semantic_knn_graph",  # last driver row: r12
    "dedup_simhash",  # last driver row: r12
    "dedup_substring_stride",  # last driver row: r12
    "distinct_customers",  # last driver row: r12
    "dsir_importance_topk",  # last driver row: r12
    "gap_fill_locf",  # last driver row: r12
    "histogram_quantile_grouped",  # last driver row: r12
    "hourly_histogram",  # last driver row: r12
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
