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

# Round-10 rotation (output of tools/rotate_window.py): leads with the
# five r9 additions that have NEVER held a driver row (they landed
# after the r9 window was pinned — VERDICT r9 item 1:
# perplexity gate/buckets, bpe_apply_tokens, the two gated corpus
# builds), then the stalest r5-row holders, then the
# alphabetically-first r6 cohort. Every r9 window member rotates out
# with a fresh green row standing (CORRECTNESS_r09.json: 50/50).
ROTATION: tuple[str, ...] = (
    "bpe_apply_tokens",
    "corpus_build_bucket_gated",
    "corpus_build_ppl_gated",
    "text_perplexity_buckets",
    "text_perplexity_gate",
    "embedding_random_projection",
    "explode_words",
    "hypertable_rollup",
    "json_extract_props",
    "latest_order_per_customer",
    "multimodal_binary_meta",
    "pivot_event_counts",
    "range_join_price_bands",
    "regional_revenue",
    "revenue_denylist_filter",
    "sales_count_by_location",
    "sales_date_range",
    "semi_join_active_customers",
    "similarity_ann_bucketed",
    "similarity_ann_hyperplane",
    "similarity_ann_multiprobe",
    "similarity_topk_int8",
    "text_quality_score",
    "text_token_count",
    "topk_per_group",
    "tz_convert",
    "union_all_accumulate",
    "vocab_coverage_topk",
    "window_function_family",
    "binational_volume",
    "cheapest_supplier_per_part",
    "contrastive_triplets",
    "corpus_checksum",
    "dedup_exact_canonical",
    "dedup_substring_spans",
    "deterministic_shuffle",
    "disjunctive_filter_revenue",
    "equi_depth_histogram",
    "events_dau",
    "events_props_variant_stats",
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
