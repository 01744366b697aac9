"""Inverted-index text search — term lookups without scanning documents.

A corpus pipeline needs cheap "find the documents containing these
terms" far more often than full scans: decontamination spot checks,
targeted quality audits, eval-set leak hunts. Scanning 100 TB of text
per lookup is absurd; the standard answer is an ingest-time INVERTED
INDEX: a (term, doc_id, tf) postings table, term-partitioned, so a
query reads only the postings of its terms — MBs, not TBs.

Spark-first shape:
- the index build is one explode + groupBy (a single shuffle keyed by
  (term, doc_id)); written `partitionBy(term-prefix)` + sorted by term,
  a term-equality predicate prunes directories then row groups.
- conjunctive (AND) search is the classic postings intersection, as a
  groupBy: keep doc_ids whose matched DISTINCT term count equals the
  query term count. No joins-per-term (k-way self-join would shuffle k
  times); one filter + one aggregation regardless of k.
- scoring is Σ tf — exact integers, oracle-checkable; ranking variants
  (tfidf) live in operators/text_analysis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc) → (term, doc_id, tf): whitespace tokens, one shuffle."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def write_postings_index(postings: DataFrame, path: str) -> None:
    """Persist term-prefix-partitioned postings: `pfx=<first char>`
    directories prune at the listing, the in-file sort by term gives
    row-group stats a term equality can skip on. One char ≈ tens of
    partitions at any corpus size (term-hash buckets would balance
    better; prefix keeps the demo predicate human-readable)."""
    (
        postings.withColumn("pfx", F.substring("term", 1, 1))
        .repartition("pfx")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(path)
    )


def read_postings_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def conjunctive_search(
    postings: DataFrame, terms: list[str], k: int = 20
) -> DataFrame:
    """Docs containing ALL `terms`, ranked by Σ tf (exact ints).

    Against the persisted index, the term filter (plus the derivable
    prefix filter, added when the `pfx` column exists) reaches the
    scan as partition + pushed predicates — the plan reads postings
    for the query's terms only, never the corpus.
    """
    terms = sorted(set(terms))
    p = postings.filter(F.col("term").isin(terms))
    if "pfx" in postings.columns:
        p = p.filter(F.col("pfx").isin(sorted({t[:1] for t in terms})))
    return (
        p.groupBy("doc_id")
        .agg(
            F.count_distinct("term").alias("n_terms"),
            F.sum("tf").alias("score"),
        )
        .filter(F.col("n_terms") == len(terms))
        .select("doc_id", F.col("score").cast("bigint").alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
