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

# Round-14 rotation (output of tools/rotate_window.py, run after the
# round's last registry-touching commit): the ONE never-driver-checked
# query leads (the r14 addition: the incremental corpus refresh), then
# pure LRU — the full r9 remainder and the stalest r10 rows.
ROTATION: tuple[str, ...] = (
    "corpus_refresh_pipeline",  # last driver row: never
    "embedding_norms",  # last driver row: r9
    "funnel_conversion",  # last driver row: r9
    "grouping_sets_revenue",  # last driver row: r9
    "pricing_summary",  # last driver row: r9
    "quantiles_exact",  # last driver row: r9
    "rollup_revenue",  # last driver row: r9
    "sessionize_events",  # last driver row: r9
    "shipping_priority",  # last driver row: r9
    "sql_api_revenue_by_status",  # last driver row: r9
    "string_functions_pack",  # last driver row: r9
    "text_langid",  # last driver row: r9
    "text_pii_redact",  # last driver row: r9
    "text_repetition_metrics",  # last driver row: r9
    "time_bucket_15min",  # last driver row: r9
    "top_similar_pairs",  # last driver row: r9
    "tumbling_window_agg",  # last driver row: r9
    "unpivot_event_counts",  # last driver row: r9
    "window_running_revenue",  # last driver row: r9
    "binational_volume",  # last driver row: r10
    "bpe_apply_tokens",  # last driver row: r10
    "cheapest_supplier_per_part",  # last driver row: r10
    "contrastive_triplets",  # last driver row: r10
    "corpus_build_bucket_gated",  # last driver row: r10
    "corpus_build_ppl_gated",  # last driver row: r10
    "corpus_checksum",  # last driver row: r10
    "dedup_exact_canonical",  # last driver row: r10
    "dedup_substring_spans",  # last driver row: r10
    "deterministic_shuffle",  # last driver row: r10
    "disjunctive_filter_revenue",  # last driver row: r10
    "embedding_random_projection",  # last driver row: r10
    "equi_depth_histogram",  # last driver row: r10
    "events_dau",  # last driver row: r10
    "events_props_variant_stats",  # last driver row: r10
    "explode_words",  # last driver row: r10
    "hypertable_rollup",  # last driver row: r10
    "json_extract_props",  # last driver row: r10
    "latest_order_per_customer",  # last driver row: r10
    "multimodal_binary_meta",  # last driver row: r10
    "pivot_event_counts",  # last driver row: r10
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
