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

# Round-11 rotation (output of tools/rotate_window.py, re-run AFTER
# the round's last registry-touching commit — the policy revision
# VERDICT r10 item 1 asked for, so in-round additions can't lag a
# round behind the evidence channel): leads with the TWENTY-ONE
# never-driver-checked queries — the eleven r10-session-2 additions
# (gopher rules, NB classifier + gated build, CMS pair, containment,
# priority-sample pair, exact packing, unigram Viterbi, k-anonymity)
# plus this round's ten (paragraph family ×4, persisted arms ×2,
# source reputation, kNN-join pair, histogram quantiles) — then the
# stalest r6 cohort. Every r10 window member rotates out with a
# fresh green row standing (CORRECTNESS_r10.json: 50/50).
ROTATION: tuple[str, ...] = (
    "cms_frequency_estimate",
    "cms_join_size_estimate",
    "corpus_build_classifier_gated",
    "corpus_build_paradedup",
    "decontaminate_paragraphs",
    "dedup_minhash_persisted",
    "dedup_ngram_containment",
    "dedup_paragraph_corpus",
    "dedup_paragraph_intradoc",
    "dedup_substring_persisted",
    "docs_priority_sample",
    "docs_priority_sample_stratified",
    "histogram_quantile_sketch",
    "k_anonymity_audit",
    "knn_join_bucketed",
    "knn_join_exact",
    "packed_examples_exact",
    "source_reputation_rank",
    "text_gopher_rules",
    "text_nb_classifier",
    "unigram_tokenize_viterbi",
    "excess_quantity_suppliers",
    "fk_integrity_audit",
    "forecast_revenue_change",
    "fuzzy_name_match",
    "large_order_customers",
    "longest_error_streak",
    "market_share",
    "mode_order_priority",
    "monthly_revenue_mom",
    "multimodal_frame_index",
    "order_count_distribution",
    "orders_above_customer_avg",
    "orders_with_late_lines",
    "parts_supplier_count",
    "product_type_profit",
    "promo_revenue_share",
    "purchase_graph_bfs",
    "range_frame_revenue",
    "returned_item_reporting",
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
