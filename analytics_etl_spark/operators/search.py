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


def doc_lengths(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl): non-empty whitespace token count per doc — the
    BM25 length normalizer. Pure expression (no shuffle); persist next
    to the postings index at ingest.

    Zero-token docs (empty/whitespace-only text) are EXCLUDED, matching
    the postings builder (which tokenizes them to nothing): they can
    never score, and keeping them would inflate n_docs/avgdl — ADVICE
    r6 caught that the DuckDB oracle's dl CTE, built from non-empty
    tokens, already omits them, so including them here was a latent
    data-dependent divergence in every BM25 score."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.size(toks).cast("bigint").alias("dl"))
        .filter(F.col("dl") >= 1)
    )


def bm25_rank(
    postings: DataFrame,
    doclens: DataFrame,
    terms: list[str],
    k1: tuple[int, int] = (6, 5),
    b: tuple[int, int] = (3, 4),
    k: int = 20,
) -> DataFrame:
    """lin-BM25 ranking over the postings index — OR semantics, top-k.

    Classic BM25 with ONE deliberate change: the idf keeps the raw
    odds ratio (N - df + 0.5)/(df + 0.5) instead of its log. The log
    is libm territory (engine-dependent last ulps ⇒ unstable
    rankings); rankings per term are identical (log is monotone),
    relative cross-term weighting is steeper than classic BM25 —
    documented, deterministic, oracle-checkable. The tf saturation is
    textbook: tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).

    DETERMINISM CONSTRUCTION: k1 and b are RATIONALS (the BM25
    defaults 1.2 and 0.75 exactly = 6/5 and 3/4), and with avgdl =
    S/N the per-term score algebraically reduces to a product of two
    INTEGER ratios:

        s = [(2(N−df)+1) · tf · (k1n+k1d) · bd / (2df+1)]
            × [S / (tf·k1d·bd·S + k1n·(bd−bn)·S + k1n·bn·dl·N)]

    — exact int64 arithmetic, then exactly two IEEE divisions and one
    multiplication, each individually correctly rounded and mirrored
    verbatim by the oracle. There is no float a·b+c anywhere, so
    compiler FMA contraction (which costs a last ulp and differs
    between engines; observed against DuckDB on the naive float
    formulation) cannot touch it. The two-ratio split is also what
    keeps int64 safe: the single-ratio numerator would carry a
    2N·tf·44·S product (overflow near 1e6 docs); split, the largest
    term is tf·k1d·bd·S ≈ 2e15 at a 1e9-doc/1e11-word corpus —
    comfortable to ~1e11 docs. The per-doc sum folds the term-SORTED
    score array left-to-right (F.aggregate ≡ DuckDB list_reduce over
    list(... ORDER BY term)) — additions only, nothing fusable.

    Scale shape: postings filtered to the query's terms (partition +
    pushed predicates against the persisted index), df is a
    term-count-sized broadcast, (n_docs, sum_dl) a 1-row broadcast;
    the only corpus-key shuffle is the doclens join on doc_id — and
    doclens is the KB-per-million-docs side table written at ingest.
    """
    (k1n, k1d), (bn, bd) = k1, b
    terms = sorted(set(terms))
    p = postings.filter(F.col("term").isin(terms))
    if "pfx" in postings.columns:
        p = p.filter(F.col("pfx").isin(sorted({t[:1] for t in terms})))
    tdf = p.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    stats = doclens.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    n, s_, df_, tf, dl = (
        F.col("n_docs"), F.col("sum_dl"), F.col("df"), F.col("tf"), F.col("dl"),
    )
    idf_num = (F.lit(2) * (n - df_) + F.lit(1)) * tf * F.lit((k1n + k1d) * bd)
    idf_den = F.lit(2) * df_ + F.lit(1)
    sat_den = (
        tf * F.lit(k1d * bd) * s_ + F.lit(k1n * (bd - bn)) * s_ + F.lit(k1n * bn) * dl * n
    )
    score_term = (idf_num.cast("double") / idf_den.cast("double")) * (
        s_.cast("double") / sat_den.cast("double")
    )
    scored = (
        p.join(F.broadcast(tdf), "term")
        .join(doclens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", score_term.alias("s"))
    )
    arr = F.array_sort(F.collect_list(F.struct("term", "s")))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_terms"),
            F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x["s"]).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
