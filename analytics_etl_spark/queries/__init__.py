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
    "corpus_refresh_clustered",  # last driver row: never
    "doremi_domain_weights",  # last driver row: never
    "heavy_hitters_guaranteed",  # last driver row: never
    "range_join_price_bands",  # last driver row: r10
    "regional_revenue",  # last driver row: r10
    "revenue_denylist_filter",  # last driver row: r10
    "sales_count_by_location",  # last driver row: r10
    "sales_date_range",  # last driver row: r10
    "semi_join_active_customers",  # last driver row: r10
    "similarity_ann_bucketed",  # last driver row: r10
    "similarity_ann_hyperplane",  # last driver row: r10
    "similarity_ann_multiprobe",  # last driver row: r10
    "similarity_topk_int8",  # last driver row: r10
    "text_perplexity_buckets",  # last driver row: r10
    "text_perplexity_gate",  # last driver row: r10
    "text_quality_score",  # last driver row: r10
    "text_token_count",  # last driver row: r10
    "topk_per_group",  # last driver row: r10
    "tz_convert",  # last driver row: r10
    "union_all_accumulate",  # last driver row: r10
    "vocab_coverage_topk",  # last driver row: r10
    "window_function_family",  # last driver row: r10
    "cms_frequency_estimate",  # last driver row: r11
    "cms_join_size_estimate",  # last driver row: r11
    "corpus_build_classifier_gated",  # last driver row: r11
    "corpus_build_paradedup",  # last driver row: r11
    "decontaminate_paragraphs",  # last driver row: r11
    "dedup_minhash_persisted",  # last driver row: r11
    "dedup_ngram_containment",  # last driver row: r11
    "dedup_paragraph_corpus",  # last driver row: r11
    "dedup_paragraph_intradoc",  # last driver row: r11
    "dedup_substring_persisted",  # last driver row: r11
    "docs_priority_sample",  # last driver row: r11
    "docs_priority_sample_stratified",  # last driver row: r11
    "excess_quantity_suppliers",  # last driver row: r11
    "fk_integrity_audit",  # last driver row: r11
    "forecast_revenue_change",  # last driver row: r11
    "fuzzy_name_match",  # last driver row: r11
    "histogram_quantile_sketch",  # last driver row: r11
    "k_anonymity_audit",  # last driver row: r11
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
