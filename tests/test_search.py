"""Inverted-index search (operators/search.py): parity between the
inline and persisted-index paths, and the pruning claim on the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from analytics_etl_spark.operators.search import (
    build_postings,
    conjunctive_search,
    read_postings_index,
    write_postings_index,
)
from tests.conftest import SF_SMOKE

TERMS = ["filter", "join", "window"]


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_persisted_index_parity(spark, tmp_path):
    """Same ranked result from the ingest-written index as from the
    inline build — the deployment path can't drift."""
    docs = _docs(spark)
    inline = conjunctive_search(build_postings(docs), TERMS, k=20).collect()
    path = str(tmp_path / "idx")
    write_postings_index(build_postings(docs), path)
    indexed = conjunctive_search(read_postings_index(spark, path), TERMS, k=20).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in indexed]
    assert len(inline) > 0


def test_index_scan_prunes_partitions_and_pushes_term(spark, tmp_path):
    """The persisted-index query reads postings for the query terms
    only: pfx partition filter prunes directories, the term IN
    predicate is pushed to parquet, and every matched doc's terms are
    conjunctively required."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    write_postings_index(build_postings(docs), path)
    q = conjunctive_search(read_postings_index(spark, path), TERMS, k=20)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pfx" in plan
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters", 1)[1][:300]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_stats_exclude_zero_token_docs(spark):
    """ADVICE r6: a doc whose text is non-null but tokenizes to nothing
    (empty/whitespace-only) must not inflate n_docs/avgdl — the DuckDB
    oracle's dl CTE omits such docs, so counting them here silently
    shifted EVERY BM25 score on any corpus containing one. doc_lengths
    must agree with the postings builder about corpus membership, and
    BM25 scores must be invariant to adding degenerate docs."""
    from analytics_etl_spark.operators.search import bm25_rank, doc_lengths

    clean = spark.createDataFrame(
        [(1, "spark join window"), (2, "join filter join"), (3, "window scan")],
        ["doc_id", "text"],
    )
    degenerate = clean.unionByName(
        spark.createDataFrame([(4, ""), (5, "   ")], ["doc_id", "text"])
    )
    dl = doc_lengths(degenerate)
    assert sorted(r["doc_id"] for r in dl.collect()) == [1, 2, 3]

    base = bm25_rank(build_postings(clean), doc_lengths(clean), ["join"], k=10).collect()
    with_junk = bm25_rank(
        build_postings(degenerate), doc_lengths(degenerate), ["join"], k=10
    ).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in with_junk]
    assert len(base) == 2


def test_conjunction_is_exact(spark):
    """Every returned doc really contains every term; a doc missing
    one term never appears (the n_terms == k gate)."""
    docs = _docs(spark)
    res = conjunctive_search(build_postings(docs), TERMS, k=50)
    joined = res.join(docs, "doc_id").select("doc_id", "text").collect()
    assert joined
    for r in joined:
        toks = set(r["text"].split(" "))
        assert all(t0 in toks for t0 in TERMS), r["doc_id"]
