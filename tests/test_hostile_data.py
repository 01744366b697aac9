"""Hostile-data oracle parity (tools/hostile_data.py).

The document-centric queries run against a corpus salted with the
adversarial rows a real crawl contains (empty / whitespace-only /
NULL / non-ASCII / degenerate docs) and must STILL hash-match their
DuckDB oracles — any divergence is a latent data-dependent bug in one
engine's formulation (r7 found two this way: an ANSI divide-by-zero
in the quality scorer and a UTF-8-vs-codepoint drift in the byte
histogram). The full-registry hostile sweep is the per-round gate;
this subset keeps the most text-exposed pairs honest in CI.
"""

from __future__ import annotations

import subprocess
import sys

# the pairs whose formulations touch raw text / raw events hardest
SUBSET = [
    "text_quality_score",
    "multimodal_byte_histogram",
    "text_token_count",
    "text_langid",
    "dedup_exact_canonical",
    "dedup_substring_spans",
    "ingest_novelty_score",
    "quality_percentile_gate",
    "dedup_bloom_prescreen",
    "corpus_checksum",
    "docs_stats_by_lang",
    "text_pii_redact",
    # the event-side divergence classes r7 found: NULL ts in time
    # windows, NULL sort position, NULL map keys, malformed JSON,
    # NaN/overflow values
    "tumbling_window_agg",
    "session_window_agg",
    "sessionize_events",
    "window_function_family",
    "value_twap",
    "map_event_type_counts",
    "json_extract_props",
    "events_props_variant_stats",
    "asof_join_last_click",
    "hypertable_rollup",
    # the order-side NULL-position/NULL-group classes
    "window_running_revenue",
    "equi_depth_histogram",
    "monthly_revenue_mom",
    "scd2_customer_status_history",
    "fk_integrity_audit",
    # the lineitem-side classes: guarded sqrt, NULL-key argmin
    "math_functions_pack",
    "cheapest_supplier_per_part",
    "pricing_summary",
    # the embedding-side classes (r8): zero-norm cosine, NULL/NaN/Inf
    # components, ragged dims — every family member with a distinct
    # formulation (plain top-k, bucketed ANSI element_at path, Arrow
    # matmul kernel, int8 quantize, full-table per-column contracts)
    "similarity_topk_cosine",
    "similarity_ann_bucketed",
    "similarity_ann_hyperplane",
    "similarity_topk_int8",
    "embedding_norms",
    "embedding_centroids",
    "dedup_embedding_cosine",
    "embedding_random_projection",
    # ADVICE r8: the remaining gated members whose formulations can
    # fail independently on junk vectors — multiprobe neighbor-bucket
    # expansion, quantize-then-rerank two-phase scoring, and the
    # kmeans/IVF assignment path
    "similarity_ann_multiprobe",
    "similarity_topk_rerank",
    "similarity_ann_ivf",
    # r9: the bigram-LM stage tokenizes raw text — the doc-side junk
    # classes (NULL/empty/whitespace/non-ASCII) all flow through it
    "text_perplexity_gate",
    # r9: tertile boundaries from the ppl histogram — a tiny hostile
    # corpus stresses the degenerate-distribution edges (few distinct
    # ppl values, boundary ties spanning whole buckets)
    "text_perplexity_buckets",
    # r9: the merge fold walks every character of every distinct word,
    # incl. non-ASCII and control chars; the oracle replays it with a
    # chr(31)-joined accumulator that junk words could theoretically
    # collide with
    "bpe_apply_tokens",
]


def test_hostile_subset_matches_oracle(tmp_path):
    from tools.hostile_data import build

    hostile = build(str(tmp_path / "hostile_sf"))
    out = subprocess.run(
        [sys.executable, "tools/check_oracle.py", hostile, *SUBSET],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=540,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-1000:]
    assert "failures: []" in out.stdout
