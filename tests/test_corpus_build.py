"""corpus_build composition: funnel observability + bounded scans.

The end-to-end nightly-build plan (plans/corpus_build.py) must (a)
produce the same survivors as applying the gates sequentially — the
oracle pins that cross-engine — (b) report the full per-stage funnel
from ONE action via Observations, and (c) keep the number of corpus
scans CONSTANT in the number of composed gates (the naive nested
composition measured ~100 scan nodes at test scale — a week-long job
at 100 TB; the flat layout holds it at ~18 incl. one copy of each
cached decision's population subplan).
"""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from analytics_etl_spark.plans.corpus_build import corpus_build

SF = "/root/testdata/sf0.001"


def _build(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return corpus_build(
        docs.filter(F.col("doc_id") >= 25).select("doc_id", "text"),
        docs.filter(F.col("doc_id") < 25).select("doc_id", "text"),
    )


def test_scan_count_bounded(spark):
    """The scan census: parquet scans in the operator TREE must stay a
    small constant — quality (1) + contamination (4, incl. the bench
    bank) + LSH (3) + final pass (1) + one copy of each cached
    decision's population plan. A regression to nested-gate replay
    multiplies this several-fold (measured ~100 before the flat
    layout).

    Runs FIRST in this file with a cleared cache: once a prior
    execution has materialized the decision caches, formatted explain
    inlines each cached population plan at every reference, which
    inflates the line count without changing the physical work.
    """
    spark.catalog.clearCache()
    result, _ = _build(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        result.explain("formatted")
    tree = buf.getvalue().split("\n\n(1)")[0]
    n_scans = sum(1 for ln in tree.splitlines() if "Scan parquet" in ln)
    assert 0 < n_scans <= 20, f"documents scan census blew up: {n_scans}"
    # r17: the decision frames are plan-TRUNCATED (cache + lazy
    # localCheckpoint, plans/corpus_build._decide) — they appear as
    # Scan ExistingRDD leaves in the result plan, with the cache one
    # level below (inside each checkpoint's population plan), so the
    # driver never re-analyzes the decision subtrees per action
    assert "Scan ExistingRDD" in tree


def test_persisted_shingles_parity(spark, tmp_path):
    """corpus_build(shingles_col=...) — contamination and LSH reading
    the ingest-persisted 3-gram column instead of running the Arrow
    kernel — must produce the identical result and funnel (the same
    deployment-path equivalence with_shingle_column guarantees for
    the standalone dedup ops)."""
    from analytics_etl_spark.operators.dedup import with_shingle_column

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "shingled")
    with_shingle_column(docs.select("doc_id", "text"), n=3).write.parquet(path)
    shingled = spark.read.parquet(path)

    inline_result, inline_obs = _build(spark)
    pers_result, pers_obs = corpus_build(
        shingled.filter(F.col("doc_id") >= 25),
        shingled.filter(F.col("doc_id") < 25),
        shingles_col="shingles",
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(pers_result) == key(inline_result)
    assert {k: o.get for k, o in pers_obs.items()} == {
        k: o.get for k, o in inline_obs.items()
    }


def test_funnel_counts_from_one_action(spark):
    result, obs = _build(spark)
    rows = {r["split"]: r for r in result.collect()}

    funnel = {name: o.get["n"] for name, o in obs.items()}
    # pinned against independently-computed DuckDB stage counts
    assert funnel["pool"] == 475
    assert funnel["quality_pass"] == 300
    assert funnel["decontaminated"] == 297
    assert funnel["deduped"] == 284
    # monotone: every stage only removes
    assert (
        funnel["pool"]
        >= funnel["quality_pass"]
        >= funnel["decontaminated"]
        >= funnel["deduped"]
    )
    # the split partitions the survivors exactly
    assert sum(r["n_docs"] for r in rows.values()) == funnel["deduped"]
    assert set(rows) == {"train", "val", "test"}
    # chunk accounting is internally consistent
    for r in rows.values():
        assert r["n_chunks"] >= r["n_docs"]
        assert r["total_words"] >= r["n_chunks"]


def test_cache_rotation_bounds_live_caches(spark):
    """ADVICE r11: repeated corpus_build invocations (bench reps call
    the query function once per rep) must not accumulate cached
    corpus-sized pools — entering a new build unpersists the previous
    invocation's cached frames, so exactly one invocation's caches
    are ever live."""
    from analytics_etl_spark.plans import corpus_build as cb_mod

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def run(cut):
        # distinct `cut` per invocation => distinct logical plans, so
        # Spark's cache manager can't serve run 2 from run 1's entry
        # (bench reps DO share plans — there the rotation simply
        # re-registers the same entry instead of stacking copies)
        result, _ = corpus_build(
            docs.filter(F.col("doc_id") >= cut).select("doc_id", "text"),
            docs.filter(F.col("doc_id") < cut).select("doc_id", "text"),
            paragraph_dedup_width=10,
        )
        result.collect()
        return list(cb_mod._LIVE_CACHES)

    first = run(25)
    assert first and all(f.storageLevel.useMemory for f in first)
    second = run(30)
    # the first invocation's frames were unpersisted by the second
    assert all(not f.storageLevel.useMemory for f in first)
    assert all(f.storageLevel.useMemory for f in second)
    assert len(cb_mod._LIVE_CACHES) == len(second)
    # an IDENTICAL repeated build (bench reps) keeps its warm cache:
    # same semanticHash => rotation must NOT evict the shared entry
    third = run(30)
    assert all(f.storageLevel.useMemory for f in second)
    assert all(f.storageLevel.useMemory for f in third)


def test_failed_build_restores_previous_caches(spark):
    """ADVICE r12: _stash_caches() ran before argument validation, so
    a raising corpus_build permanently forgot (and never unpersisted)
    the previous invocation's cached frames — the exact leak rotation
    prevents. A failed build must restore the stale list so the NEXT
    successful build rotates it."""
    import pytest

    from analytics_etl_spark.plans import corpus_build as cb_mod

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pool = docs.filter(F.col("doc_id") >= 25).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 25).select("doc_id", "text")

    result, _ = corpus_build(pool, bench, paragraph_dedup_width=10)
    result.collect()
    first = list(cb_mod._LIVE_CACHES)
    assert first and all(f.storageLevel.useMemory for f in first)

    # invalid argument combination raises at validation time
    with pytest.raises(ValueError, match="paragraph_dedup_width"):
        corpus_build(
            pool, bench, paragraph_dedup_width=10, shingles_col="shingles"
        )
    # the previous build's frames are back on the live list, still warm
    assert all(f.storageLevel.useMemory for f in first)
    for f in first:
        assert any(
            g.semanticHash() == f.semanticHash() for g in cb_mod._LIVE_CACHES
        )

    # and the next SUCCESSFUL build still rotates them out
    result2, _ = corpus_build(
        pool.filter(F.col("doc_id") >= 30), bench, paragraph_dedup_width=10
    )
    result2.collect()
    assert all(not f.storageLevel.useMemory for f in first)
