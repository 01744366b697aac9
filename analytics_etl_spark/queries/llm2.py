"""Round-9 LLM-pipeline additions: perplexity gating, semantic dedup,
BPE application statistics.

Same registry discipline as queries/llm.py: every md5-derived hash is
bit-identical across engines; floats appear only inside quantized
(floor-fixed-point) expressions mirrored verbatim in the oracle; all
compared columns are int64/boolean/string scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from analytics_etl_spark.operators.perplexity import (
    UNSEEN_SURPRISAL_Q,
    VOCAB_BUCKETS,
    perplexity_buckets,
    perplexity_gate,
)
from analytics_etl_spark.operators.similarity import valid_embeddings
from analytics_etl_spark.queries.registry import query, t

# CCNet keeps the low-perplexity head+middle of the distribution; the
# cut here is a pinned literal in 1/256-bit units (2^(3150/256) ≈
# 5100 conventional perplexity), chosen INSIDE the measured ppl_q256
# range at both test SFs (sf0.001: 3090–3287 median 3174; sf0.01:
# 3058–3231 median 3128 — English/in-model docs score ~40 q-units
# lower than the out-of-model tail) so the keep flag is non-trivially
# exercised in both directions. Production calibration would set this
# per-language from a held-out percentile, as CCNet does.
PPL_KEEP_THRESHOLD_Q256 = 3150

_BUCKET = "('0x' || substr(md5({x}), 1, 15))::BIGINT % " + str(VOCAB_BUCKETS)


def _ppl_cte_chain(source_where: str = "", prefix: str = "pp_") -> str:
    """The LM scoring pipeline as a reusable CTE chain (DuckDB mirror
    of operators/perplexity.py): ``source_where`` narrows the scored
    corpus (e.g. " AND doc_id >= 25" for a pool slice); ``prefix``
    namespaces the CTEs so the chain composes into larger oracles
    (corpus_build's CTEs already use `words`/`tok`). Ends with
    ``{prefix}agg (doc_id, n_grams, surprisal_q)``."""
    p = prefix
    return f"""
    {p}words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w
      FROM documents WHERE text IS NOT NULL{source_where}
    ),
    {p}pos AS (
      SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i FROM {p}words
    ),
    {p}grams AS (
      SELECT doc_id, lang,
             {_BUCKET.format(x="w[i]")} AS f1,
             {_BUCKET.format(x="w[i+1]")} AS f2
      FROM {p}pos
    ),
    {p}dc AS (
      SELECT doc_id, f1, f2, CAST(COUNT(*) AS BIGINT) AS c
      FROM {p}grams GROUP BY 1, 2, 3
    ),
    {p}rc2 AS (
      SELECT f1, f2, CAST(COUNT(*) AS BIGINT) AS c2
      FROM {p}grams WHERE lang = 'en' GROUP BY 1, 2
    ),
    {p}rc1 AS (SELECT f1, CAST(SUM(c2) AS BIGINT) AS c1 FROM {p}rc2 GROUP BY 1),
    {p}model AS (
      SELECT {p}rc2.f1, {p}rc2.f2,
             CAST(FLOOR(256.0 * (log2(CAST(c1 + {VOCAB_BUCKETS} AS DOUBLE))
                                 - log2(CAST(c2 + 1 AS DOUBLE)))) AS BIGINT) AS s_q
      FROM {p}rc2 JOIN {p}rc1 USING (f1)
    ),
    {p}backoff AS (
      SELECT f1,
             CAST(FLOOR(256.0 * log2(CAST(c1 + {VOCAB_BUCKETS} AS DOUBLE))) AS BIGINT) AS s1_q
      FROM {p}rc1
    ),
    {p}scored AS (
      SELECT {p}dc.doc_id, {p}dc.c,
             COALESCE(m.s_q, b.s1_q, {UNSEEN_SURPRISAL_Q}) AS s
      FROM {p}dc
      LEFT JOIN {p}model m ON m.f1 = {p}dc.f1 AND m.f2 = {p}dc.f2
      LEFT JOIN {p}backoff b ON b.f1 = {p}dc.f1
    ),
    {p}agg AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
             CAST(SUM(c * s) AS BIGINT) AS surprisal_q
      FROM {p}scored GROUP BY 1
    )"""


@query(
    "text_perplexity_gate",
    oracle=f"""
    WITH {_ppl_cte_chain()}
    SELECT doc_id, n_grams, surprisal_q,
           CAST(surprisal_q // n_grams AS BIGINT) AS ppl_q256,
           (surprisal_q // n_grams) <= {PPL_KEEP_THRESHOLD_Q256} AS keep
    FROM pp_agg ORDER BY doc_id
    """,
)
def text_perplexity_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality gate (operators/perplexity.py): bigram LM
    with add-one smoothing trained on the English reference slice,
    every document scored by quantized mean surprisal, gated at a
    pinned threshold. Fully oracle-paired — the fixed-point surprisal
    quantization makes the geometric-mean statistic hash-exact.

    KNOWN DEGENERACY of the pinned cut (VERDICT r9 item 5): the
    absolute threshold (3150 q-units) splits non-trivially at sf0.001
    (observed ppl range 3090-3287) and sf0.01 (3058-3231), but at
    sf0.1 the bigger reference slice drives almost the whole corpus
    under the cut, so keep ≈ all. That is inherent to ANY absolute
    perplexity cut — more training data lowers scores corpus-wide.
    This query is kept as the oracle-simplest member of the family;
    the PRODUCTION gate is the distribution-relative tertile rule
    (text_perplexity_buckets / corpus_build_bucket_gated — CCNet's
    deployed head+middle retention), which self-calibrates at every
    corpus size."""
    docs = t(spark, sf_dir, "documents")
    return perplexity_gate(
        docs,
        ref_pred=F.col("lang") == "en",
        threshold_q256=PPL_KEEP_THRESHOLD_Q256,
    ).orderBy("doc_id")


@query(
    "text_perplexity_buckets",
    oracle=f"""
    WITH {_ppl_cte_chain()},
    ppl AS (
      SELECT doc_id, n_grams, surprisal_q,
             CAST(surprisal_q // n_grams AS BIGINT) AS ppl_q256
      FROM pp_agg
    ),
    hist AS (
      SELECT ppl_q256, CAST(COUNT(*) AS BIGINT) AS cnt FROM ppl GROUP BY 1
    ),
    cum AS (
      SELECT ppl_q256,
             SUM(cnt) OVER (ORDER BY ppl_q256) AS cum,
             SUM(cnt) OVER () AS n
      FROM hist
    ),
    bounds AS (
      SELECT MIN(CASE WHEN cum * 3 >= n THEN ppl_q256 END) AS b1,
             MIN(CASE WHEN cum * 3 >= 2 * n THEN ppl_q256 END) AS b2
      FROM cum
    )
    SELECT doc_id, n_grams, surprisal_q, ppl_q256,
           CASE WHEN ppl_q256 <= b1 THEN 'head'
                WHEN ppl_q256 <= b2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ppl, bounds ORDER BY doc_id
    """,
)
def text_perplexity_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail tertile bucketing
    (operators/perplexity.py::perplexity_buckets): the same bigram-LM
    score as text_perplexity_gate, but bucketed by tertiles of the
    corpus's OWN ppl distribution instead of the pinned absolute cut —
    self-calibrating at every SF (the pinned 3150 cut keeps ~all docs
    at sf0.1; tertiles split 1/3-1/3-1/3 everywhere). Boundaries come
    from an exact int64 cumsum over the bounded ppl_q256 value
    histogram — no global sort, no float percentile — so the whole
    stage stays hash-exact and fully oracle-paired."""
    docs = t(spark, sf_dir, "documents")
    return perplexity_buckets(docs, ref_pred=F.col("lang") == "en").orderBy(
        "doc_id"
    )


@query(
    "dedup_semantic",
    rows_only=(
        "SemDeDup composes iterative k-means (float centroid means are "
        "not bit-stable across engines) — property evidence in "
        "tests/test_semantic_dedup.py: planted near-dups collapse to "
        "one representative, orthogonal vectors survive, result "
        "invariant under repartitioning"
    ),
)
def dedup_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped embedding-space near-dedup
    (operators/ivf.py::semantic_dedup): cluster with deterministic
    spherical k-means, within-cluster cosine ≥ 0.3 (calibrated to the
    synthetic corpus — the same cut dedup_embedding_cosine uses, so
    the two operators' duplicate sets are comparable), keep the
    smallest id of every duplicate neighborhood. k is derived from the
    corpus size (target ~500 rows/cluster) so the within-cluster pair
    join scales linearly with the corpus, never n²/k."""
    from analytics_etl_spark.operators.ivf import semantic_dedup

    return semantic_dedup(
        # 3 Lloyd iterations, not 5: near-duplicate vectors co-assign
        # at ANY iteration count (they move between cells together),
        # so extra iterations only reshuffle cell borders — measured
        # 4-11% of rows between iters 3 and 5 on this corpus — which
        # touches moderate-similarity pairs, not the ≥threshold pairs
        # dedup acts on; each saved iteration is a full training pass
        t(spark, sf_dir, "embeddings"), threshold=0.3, dim=64, iters=3
    ).orderBy("vec_id")


@query(
    "dedup_semantic_cc",
    rows_only=(
        "same k-means float-mean reason as dedup_semantic, plus the "
        "iterative CC fixpoint; property evidence in "
        "tests/test_semantic_dedup.py: one survivor per planted chain, "
        "witness-drops ⊆ cc-drops on the real corpus, dup_of always "
        "names a kept vector"
    ),
)
def dedup_semantic_cc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semantic_dedup with exact one-survivor-per-connected-component
    semantics (operators/ivf.py::semantic_dedup_cc — the alternative
    rule ADVICE r9 proposed): the same cluster-local cosine pairs,
    resolved through min-label propagation so every near-duplicate
    chain keeps exactly its minimum id and ``dup_of`` always names
    the SURVIVING representative (the witness variant can point at a
    dropped vector). Same parameters as dedup_semantic, so the two
    registered results are directly comparable."""
    from analytics_etl_spark.operators.ivf import semantic_dedup_cc

    return semantic_dedup_cc(
        t(spark, sf_dir, "embeddings"), threshold=0.3, dim=64, iters=3
    ).orderBy("vec_id")


@query(
    "dedup_semantic_incremental",
    rows_only=(
        "same k-means float-mean reason as dedup_semantic; property "
        "evidence in tests/test_semantic_dedup.py: corpus near-dups "
        "drop batch vectors with corpus dup_of, batch-internal dups "
        "resolve to the smallest batch id, novel vectors survive, "
        "corpus rows are never re-judged"
    ),
)
def dedup_semantic_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup at ingest
    (operators/ivf.py::semantic_dedup_incremental): the embedding
    twin of dedup_incremental_batch — judge only the NEW batch
    (vec_id ≥ 400) against the admitted corpus (vec_id < 400) plus
    itself, never re-judging or regenerating corpus-corpus pairs.
    Quantizer trained on the corpus slice only, so cells match what a
    persisted write_ivf_index layout would hold; same 0.3 threshold
    as the rest of the semantic family."""
    from analytics_etl_spark.operators.ivf import semantic_dedup_incremental

    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup_incremental(
        emb.filter(F.col("vec_id") < 400),
        emb.filter(F.col("vec_id") >= 400),
        threshold=0.3,
        dim=64,
        iters=3,
    ).orderBy("vec_id")


@query(
    "similarity_ann_pq",
    rows_only=(
        "PQ codebooks are per-subspace k-means float MEANS — not bit-stable "
        "across engines (the similarity_ann_ivf reason); encode/ADC algebra "
        "is pinned against a NumPy reference in tests/test_pq.py and recall "
        "vs brute force is measured in tests/test_ann_recall.py"
    ),
)
def similarity_ann_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (operators/pq.py): m=8 subspaces × 16
    codewords (32 bits/vector, 64× below float32), ADC top-10 — the
    corpus side is m table lookups + adds per row, no float dot. The
    coarse ranking the rerank variant below refines; at 100 TB the
    codes-only scan is the pass that fits the whole corpus in
    cluster memory."""
    from analytics_etl_spark.operators.pq import pq_adc_topk, pq_train_codebooks
    from analytics_etl_spark.queries.llm import _EMB_DIM, _query_frame

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    cbs = pq_train_codebooks(emb, m=8, ksub=16, iters=3, sample_fraction=0.5)
    return pq_adc_topk(emb, _query_frame(emb, 0), cbs, k=10, exclude_ids=(0,))


@query(
    "similarity_ann_pq_rerank",
    rows_only=(
        "same PQ float-codebook reason as similarity_ann_pq; the rerank "
        "pass's exact-cosine output is pinned against brute force per "
        "returned id in tests/test_pq.py, recall in tests/test_ann_recall.py"
    ),
)
def similarity_ann_pq_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ deployment shape: ADC shortlist of 50 (floats untouched)
    → exact cosine rerank → top-10. Measured on the near-uniform test
    corpus: recall@10 ≈ 0.70 at a 10% float-scan budget vs hyperplane
    LSH's 0.72 at ~34% (tests/test_ann_recall.py) — the best
    recall-per-byte in the ANN family."""
    from analytics_etl_spark.operators.pq import pq_rerank_topk, pq_train_codebooks
    from analytics_etl_spark.queries.llm import _EMB_DIM, _query_frame

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    cbs = pq_train_codebooks(emb, m=8, ksub=16, iters=3, sample_fraction=0.5)
    return pq_rerank_topk(
        emb, _query_frame(emb, 0), cbs, k=10, shortlist=50, exclude_ids=(0,),
        dim=_EMB_DIM,
    )


# The pinned tokenizer artifact for the apply-side BPE query: the
# first 16 merges textbook-greedy BPE learns on the sf0.001 documents
# corpus (learn_bpe_merges, merges_per_round=1 — the exact mode pinned
# against the pure-Python reference in tests/test_bpe.py). Pinned as
# literals because APPLYING a merge table is not iterative: the fold
# over a FIXED rank-ordered list is SQL-replayable, which is what
# finally gives the BPE family a hash-checked oracle row (VERDICT r8
# item 6). Applying this table to other corpora (sf0.01/sf0.1/hostile)
# is exactly how a production tokenizer artifact is used.
BPE_PINNED_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"),
    ("t", "</w>"), ("er", "</w>"), ("o", "w"), ("ow", "</w>"),
    ("l", "u"), ("i", "n"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("g", "</w>"), ("a", "s"), ("h", "</w>"),
)


def _bpe_apply_oracle() -> str:
    """Generate the DuckDB replay of the rank-ordered merge fold.

    One CTE per merge: list_reduce folds the token list into a
    chr(31)-joined string; the running accumulator's last token is
    ``a`` exactly when the acc equals 'a' or ends with sep||'a', and
    merging [.., a] + b into [.., ab] is literally appending ``b``
    WITHOUT a separator. This is the same left-to-right non-overlap
    single-pass semantics as the Spark-side F.aggregate fold
    (operators/bpe.py::_merge_expr), replayed strictly in rank order
    — the sequential contract apply_bpe's batched groups are pinned
    to preserve (tests/test_bpe.py)."""
    sep = "chr(31)"
    sql = """
    WITH words AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL
      ) WHERE word <> '' GROUP BY word
    ),
    p0 AS (
      SELECT word, n,
             list_append(string_split(word, ''), '</w>') AS seq
      FROM words
    )"""
    prev = "p0"
    for i, (a, b) in enumerate(BPE_PINNED_MERGES, start=1):
        qa, qb = a.replace("'", "''"), b.replace("'", "''")
        sql += f""",
    p{i} AS (
      SELECT word, n, string_split(list_reduce(seq, (acc, x) ->
        CASE WHEN x = '{qb}' AND (acc = '{qa}'
                  OR right(acc, {len(a) + 1}) = {sep} || '{qa}')
             THEN acc || '{qb}'
             ELSE acc || {sep} || x END), {sep}) AS seq
      FROM {prev}
    )"""
        prev = f"p{i}"
    sql += f"""
    SELECT token,
           CAST(SUM(n) AS BIGINT) AS total_count,
           CAST(COUNT(*) AS BIGINT) AS n_positions
    FROM (SELECT n, unnest(seq) AS token FROM {prev})
    GROUP BY token
    ORDER BY total_count DESC, token
    LIMIT 50
    """
    return sql


@query("bpe_apply_tokens", oracle=_bpe_apply_oracle())
def bpe_apply_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the pinned BPE merge table to the corpus word table and
    report the top-50 resulting subword tokens: total_count weighs
    each token position by its word's corpus frequency (the quantity
    a tokenizer-compression report uses); n_positions counts distinct
    (word, position) slots. The fold itself is the pure-JVM
    F.aggregate replay (operators/bpe.py::apply_bpe) — word-table-
    sized, one corpus pass for the counts, zero Python nodes."""
    from analytics_etl_spark.operators.bpe import apply_bpe, word_counts

    merges = [(i, a, b, 0) for i, (a, b) in enumerate(BPE_PINNED_MERGES)]
    toks = apply_bpe(word_counts(t(spark, sf_dir, "documents")), merges)
    return (
        toks.select(F.col("n"), F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(
            F.sum("n").cast("bigint").alias("total_count"),
            F.count("*").cast("bigint").alias("n_positions"),
        )
        .orderBy(F.desc("total_count"), F.asc("token"))
        .limit(50)
    )


def _ppl_gated_corpus_oracle() -> str:
    """Compose the LM gate INTO the corpus-build oracle: prepend the
    prefixed LM CTE chain (scored over the pool slice only) and swap
    the pool CTE for its perplexity-kept subset. String surgery on the
    shared oracle constant is anchored on the exact pool CTE text and
    asserted — a drifted anchor fails at import, not silently."""
    from analytics_etl_spark.queries.llm import _CORPUS_BUILD_ORACLE

    anchor = "WITH pool AS (SELECT doc_id, text FROM documents WHERE doc_id >= 25),"
    assert anchor in _CORPUS_BUILD_ORACLE, "corpus_build oracle pool CTE moved"
    replacement = (
        "WITH "
        + _ppl_cte_chain(" AND doc_id >= 25")
        + f""",
    ppl_keep AS (
      SELECT doc_id FROM pp_agg
      WHERE surprisal_q // n_grams <= {PPL_KEEP_THRESHOLD_Q256}
    ),
    pool AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id >= 25 AND doc_id IN (SELECT doc_id FROM ppl_keep)
    ),"""
    )
    return _CORPUS_BUILD_ORACLE.replace(anchor, replacement, 1)


def _bucket_gated_corpus_oracle() -> str:
    """Like _ppl_gated_corpus_oracle, but the keep rule is CCNet's
    deployed one — drop the TAIL tertile of the pool's own perplexity
    distribution (keep head+middle, Wenzek et al. 2020 §4.3) instead
    of a hand-pinned absolute cut. Same anchored string surgery on the
    shared corpus-build oracle; the spliced chain adds the bounded
    value-histogram CTEs and keeps docs with ppl_q256 <= b2."""
    from analytics_etl_spark.queries.llm import _CORPUS_BUILD_ORACLE

    anchor = "WITH pool AS (SELECT doc_id, text FROM documents WHERE doc_id >= 25),"
    assert anchor in _CORPUS_BUILD_ORACLE, "corpus_build oracle pool CTE moved"
    replacement = (
        "WITH "
        + _ppl_cte_chain(" AND doc_id >= 25")
        + """,
    pp_ppl AS (
      SELECT doc_id, CAST(surprisal_q // n_grams AS BIGINT) AS ppl_q256
      FROM pp_agg
    ),
    pp_hist AS (
      SELECT ppl_q256, CAST(COUNT(*) AS BIGINT) AS cnt FROM pp_ppl GROUP BY 1
    ),
    pp_cum AS (
      SELECT ppl_q256,
             SUM(cnt) OVER (ORDER BY ppl_q256) AS cum,
             SUM(cnt) OVER () AS n
      FROM pp_hist
    ),
    pp_bounds AS (
      SELECT MIN(CASE WHEN cum * 3 >= 2 * n THEN ppl_q256 END) AS b2
      FROM pp_cum
    ),
    ppl_keep AS (
      SELECT doc_id FROM pp_ppl, pp_bounds WHERE ppl_q256 <= b2
    ),
    pool AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id >= 25 AND doc_id IN (SELECT doc_id FROM ppl_keep)
    ),"""
    )
    return _CORPUS_BUILD_ORACLE.replace(anchor, replacement, 1)


@query("corpus_build_bucket_gated", oracle=_bucket_gated_corpus_oracle())
def corpus_build_bucket_gated_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SELF-CALIBRATING CCNet build: corpus_build_ppl_gated's
    five-gate composition, but stage 0 drops the tail TERTILE of the
    pool's own perplexity distribution instead of the pinned 3150-q
    cut (which keeps ~everything at sf0.1 — see ROUND9.md). Tertiles
    cut a real ~1/3 at every corpus size, so this is the variant a
    production pipeline would actually schedule. Still fully
    oracle-paired: boundaries come from the exact int64 cumsum over
    the bounded ppl_q256 histogram, so even the distribution-relative
    gate hash-checks."""
    from analytics_etl_spark.plans.corpus_build import corpus_build

    docs = t(spark, sf_dir, "documents")
    pool = docs.filter(F.col("doc_id") >= 25)
    lm_handles: list[DataFrame] = []
    keep_ids = (
        perplexity_buckets(
            pool, ref_pred=F.col("lang") == "en", cache_handles=lm_handles
        )
        .filter(F.col("bucket") != "tail")
        .select("doc_id")
        # same id-sized decision pin + eager populate as
        # corpus_build_ppl_gated: the build plan's ~10 branches would
        # otherwise each replay the LM train+score+histogram subtree
        .cache()
    )
    keep_ids.count()
    # the eager count materialized the id-sized decision; the LM's
    # internal bigram/score caches are dead weight from here (ADVICE
    # r9 — the driver runs 50 queries in one session)
    for h in lm_handles:
        h.unpersist()
    gated_pool = pool.select("doc_id", "text").join(keep_ids, "doc_id", "left_semi")
    result, _ = corpus_build(
        gated_pool, docs.filter(F.col("doc_id") < 25).select("doc_id", "text")
    )
    return result


@query("corpus_build_ppl_gated", oracle=_ppl_gated_corpus_oracle())
def corpus_build_ppl_gated_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet-shaped nightly build: the corpus_build_pipeline
    composition with the LM perplexity gate as stage 0 — train the
    bigram LM on the pool's English slice, keep only docs at or below
    the pinned perplexity cut, then run quality -> decontaminate ->
    near-dedup -> split -> chunk on the survivors. Docs with no
    bigram (one-word/empty) have no defined perplexity and drop at
    the gate, conservatively, in both engines. Fully oracle-paired:
    the whole five-gate composition hash-checks because every stage —
    including the geometric-mean LM score — is exact fixed-point."""
    from analytics_etl_spark.plans.corpus_build import corpus_build

    docs = t(spark, sf_dir, "documents")
    pool = docs.filter(F.col("doc_id") >= 25)
    lm_handles: list[DataFrame] = []
    keep_ids = (
        perplexity_gate(
            pool,
            ref_pred=F.col("lang") == "en",
            threshold_q256=PPL_KEEP_THRESHOLD_Q256,
            cache_handles=lm_handles,
        )
        .filter(F.col("keep"))
        .select("doc_id")
        # id-sized decision frame, cached like corpus_build's own stage
        # decisions: the gated pool is referenced ~10x inside the build
        # plan, and without this pin each reference replays the whole
        # LM train+score subtree (measured 41 s unpinned at sf0.001)
        .cache()
    )
    # populate the cache EAGERLY: the build plan's ~10 branches all sit
    # inside one job, and racing branches each recompute a not-yet-
    # committed cache partition — one id-sized count() up front makes
    # the LM subtree run exactly once (22 s -> ~7 s at sf0.001; same
    # two-action shape as the kmeans/rollup-refresh queries)
    keep_ids.count()
    # the LM's internal bigram cache is dead weight once the id-sized
    # decision is materialized (ADVICE r9)
    for h in lm_handles:
        h.unpersist()
    gated_pool = pool.select("doc_id", "text").join(keep_ids, "doc_id", "left_semi")
    result, _ = corpus_build(
        gated_pool, docs.filter(F.col("doc_id") < 25).select("doc_id", "text")
    )
    return result


# --- round-10 addition: the Gopher/MassiveWeb rule cascade ----------------

def _gopher_cte_chain(source: str = "documents", prefix: str = "gq_") -> str:
    """The Gopher rule cascade as a reusable CTE chain (DuckDB mirror
    of operators/text_analysis.gopher_quality_flags with the corpus-
    calibrated ('the','a') stopword set — see text_gopher_rules_q).
    ``source`` is any relation exposing (doc_id, text); the chain ends
    with ``{prefix}flags`` (doc_id, n_words, f_*, keep). Composes into
    larger oracles the way _ppl_cte_chain does
    (corpus_build_classifier_gated)."""
    p = prefix
    return f"""
    {p}g AS (
      SELECT doc_id, text,
             string_split(text, ' ') AS words,
             string_split(text, chr(10)) AS lines
      FROM {source}
    ), {p}m AS (
      SELECT doc_id, text,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS sum_wlen,
             CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
             CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
             CAST(length(text) - length(replace(text, '...', '')) AS BIGINT) AS n_ell3,
             CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*]'))) AS BIGINT) AS n_bullet,
             CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$'))) AS BIGINT) AS n_ell_lines,
             CAST(len(list_distinct(list_filter(words,
               w -> w IN ('the','a')))) AS BIGINT) AS n_stop
      FROM {p}g
    ),
    {p}flags AS (
      SELECT doc_id, n_words,
             (n_words >= 50 AND n_words <= 100000) AS f_word_count,
             (3*n_words <= sum_wlen AND sum_wlen <= 10*n_words) AS f_mean_word_len,
             (10*(3*n_hash + n_ell3) <= 3*n_words) AS f_symbol_ratio,
             (10*n_bullet < 9*n_lines) AS f_bullet,
             (10*n_ell_lines < 3*n_lines) AS f_ellipsis,
             (5*n_alpha_words >= 4*n_words) AS f_alpha,
             (n_stop >= 2) AS f_stop,
             CASE WHEN text IS NULL THEN FALSE ELSE (
               n_words >= 50 AND n_words <= 100000
               AND 3*n_words <= sum_wlen AND sum_wlen <= 10*n_words
               AND 10*(3*n_hash + n_ell3) <= 3*n_words
               AND 10*n_bullet < 9*n_lines
               AND 10*n_ell_lines < 3*n_lines
               AND 5*n_alpha_words >= 4*n_words
               AND n_stop >= 2
             ) END AS keep
      FROM {p}m
    )"""


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH {_gopher_cte_chain()}
    SELECT doc_id, n_words, f_word_count, f_mean_word_len, f_symbol_ratio,
           f_bullet, f_ellipsis, f_alpha, f_stop, keep
    FROM gq_flags
    """,
)
def text_gopher_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveWeb quality-rule cascade (Rae et al. 2021,
    A1.1) per document: seven published rules as boolean flags plus
    the composite keep — the heuristic stage that runs BEFORE the LM
    perplexity gate in a CCNet/RefinedWeb-shaped pipeline. All rules
    are integer cross-multiplied comparisons (no float ratios), so
    the oracle is a verbatim mirror. The stopword rule runs on the
    corpus-calibrated function-word set ('the','a') — the synthetic
    31-word vocabulary contains exactly one member of Gopher's
    published 8-word list, which would fail EVERY document (the
    absolute-threshold degeneracy VERDICT r9 flagged on the pinned
    perplexity cut); Gopher itself prescribes per-corpus tuning, and
    with this set the keep split is exercised in both directions at
    every SF. One codegen pass over the scan;
    shuffle-free at any corpus size. Reference parity: extends the
    reference's denylist/validation filters
    (transform_service.py-style row gates) to the standard published
    pretraining-quality rule set.
    """
    from analytics_etl_spark.operators.text_analysis import gopher_quality_flags

    return gopher_quality_flags(
        t(spark, sf_dir, "documents"), stopwords=("the", "a")
    )


# --- round-10 addition: fastText-shaped NB quality classifier -------------

def _nb_cte_chain(source: str = "documents", prefix: str = "nb") -> str:
    """The hashed-NB classifier as a reusable CTE chain (DuckDB
    mirror of operators/classifier.nb_classifier_scores with the
    lang='en' reference labeling). ``source`` is any relation
    exposing (doc_id, lang, text); ends with ``{prefix}score``
    (doc_id, is_ref, n_tokens, score_q). Composes into larger
    oracles (corpus_build_classifier_gated)."""
    p = prefix
    return f"""
    {p}w AS (
      SELECT doc_id, COALESCE(lang = 'en', FALSE) AS is_ref,
             string_split(text, ' ') AS w
      FROM {source} WHERE text IS NOT NULL
    ),
    {p}tok AS (SELECT doc_id, is_ref, unnest(w) AS word FROM {p}w),
    {p}dc AS (
      SELECT doc_id, is_ref, {_BUCKET.format(x="word")} AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM {p}tok GROUP BY 1, 2, 3
    ),
    {p}cb AS (
      SELECT b,
             CAST(COALESCE(SUM(CASE WHEN is_ref THEN c END), 0) AS BIGINT) AS c_pos,
             CAST(COALESCE(SUM(CASE WHEN NOT is_ref THEN c END), 0) AS BIGINT) AS c_neg
      FROM {p}dc GROUP BY 1
    ),
    {p}model AS (
      SELECT b,
             CAST(FLOOR(256.0 * log2(CAST(c_pos + 1 AS DOUBLE)))
                  - FLOOR(256.0 * log2(CAST(c_neg + 1 AS DOUBLE))) AS BIGINT) AS w_q
      FROM {p}cb
    ),
    {p}norm AS (
      SELECT CAST(FLOOR(256.0 * log2(CAST(SUM(c_pos) + COUNT(*) AS DOUBLE))) AS BIGINT) AS q_npos,
             CAST(FLOOR(256.0 * log2(CAST(SUM(c_neg) + COUNT(*) AS DOUBLE))) AS BIGINT) AS q_nneg
      FROM {p}cb
    ),
    {p}prior AS (
      SELECT CAST(FLOOR(256.0 * log2(CAST(COALESCE(SUM(CASE WHEN is_ref THEN 1 END), 0) + 1 AS DOUBLE))) AS BIGINT) AS q_dpos,
             CAST(FLOOR(256.0 * log2(CAST(COALESCE(SUM(CASE WHEN NOT is_ref THEN 1 END), 0) + 1 AS DOUBLE))) AS BIGINT) AS q_dneg
      FROM (SELECT DISTINCT doc_id, is_ref FROM {p}dc)
    ),
    {p}doc AS (
      SELECT doc_id, is_ref,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(SUM(c * COALESCE(w_q, 0)) AS BIGINT) AS w_sum
      FROM {p}dc LEFT JOIN {p}model USING (b) GROUP BY 1, 2
    ),
    {p}score AS (
      SELECT doc_id, is_ref, n_tokens,
             CAST(w_sum + n_tokens * (q_nneg - q_npos) + (q_dpos - q_dneg) AS BIGINT) AS score_q
      FROM {p}doc, {p}norm, {p}prior
    )"""


@query(
    "text_nb_classifier",
    oracle=f"""
    WITH {_nb_cte_chain()}
    SELECT doc_id, is_ref, n_tokens, score_q, score_q > 0 AS pred_ref
    FROM nbscore
    """,
)
def text_nb_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped quality classifier (operators/classifier.py):
    hashed bag-of-words multinomial Naive Bayes, trained in-corpus to
    separate the English reference slice from the rest (the CCNet
    §4.4 / LLaMA "Wikipedia-reference classifier" stage, with NB's
    closed-form count weights replacing iterative training so the
    stage is engine-exact). score_q is the quantized log-odds in
    1/256-bit units; pred_ref = score_q > 0. Self-calibrating: the
    zero cut is the Bayes decision boundary of the learned model, not
    an absolute corpus-size-dependent threshold (the VERDICT r9
    degeneracy class); predictions split both ways at every test SF.
    Honest caveat on MEASURED accuracy here: the synthetic corpus
    draws every document's words from one shared 31-word pool at
    lang-independent rates (verified: 'the'/'a' rates are ~3% in all
    five langs), so in-corpus accuracy vs the lang label is ≈ the
    majority baseline BY CONSTRUCTION — there is no signal to find.
    The registered query exercises the exact model/scoring machinery;
    learnability on separable data is pinned in
    tests/test_classifier.py (planted two-vocabulary corpus →
    accuracy 1.0). Model is vocab-bounded (≤ 65536 rows), one corpus
    explode, everything int64 after per-term quantization."""
    from analytics_etl_spark.operators.classifier import nb_classifier_scores

    return nb_classifier_scores(
        t(spark, sf_dir, "documents"), ref_pred=F.col("lang") == "en"
    )


# --- round-10 addition: unigram-LM Viterbi tokenizer ----------------------

def _unigram_oracle() -> str:
    """DuckDB replay of the unigram Viterbi DP (operators/unigram.py):
    the same best[j] = min_i best[i] + metric(word[i..j]) fold,
    expressed with list_reduce over a [position] list whose [0]-seed
    is prepended (DuckDB's reduce has no init value; a single-element
    list returns the seed unreduced, which is exactly best=[0] for
    the impossible empty word). Piece lookup mirrors Spark's
    array_position semantics: both return 0/absent -> the > 0 guard
    takes the UNK/INF branch identically."""
    from analytics_etl_spark.operators.unigram import (
        INF_Q,
        MAX_WORD_LEN,
        TIE_K,
        UNIGRAM_PIECES,
        UNK_COST_Q,
    )

    pieces = "[" + ", ".join(f"'{p}'" for p, _ in UNIGRAM_PIECES) + "]"
    costs = "[" + ", ".join(
        f"CAST({c} AS BIGINT)" for _, c in UNIGRAM_PIECES
    ) + "]"
    sub = f"substr(substr(word, 1, {MAX_WORD_LEN}), CAST(i+1 AS INT), CAST(x[1]-i AS INT))"
    return f"""
    WITH ugocc AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL)
      WHERE word <> ''
    ),
    ugw AS (SELECT word FROM ugocc GROUP BY 1),
    ugdp AS (
      SELECT word,
        list_reduce(
          list_prepend([CAST(0 AS BIGINT)],
            list_transform(range(1, length(substr(word, 1, {MAX_WORD_LEN})) + 1),
                           j -> [CAST(j AS BIGINT)])),
          (acc, x) -> list_append(acc,
            list_min(list_transform(range(0, CAST(x[1] AS INT)), i ->
              acc[i+1] + {TIE_K} * (CASE
                WHEN list_position({pieces}, {sub}) > 0
                  THEN {costs}[list_position({pieces}, {sub})]
                WHEN x[1] - i = 1 THEN CAST({UNK_COST_Q} AS BIGINT)
                ELSE CAST({INF_Q} AS BIGINT) END) + 1))
          )
        )[-1] AS m,
        CAST(greatest(length(word) - {MAX_WORD_LEN}, 0) AS BIGINT) AS tl
      FROM ugw
    ),
    ugtab AS (
      SELECT word, m // {TIE_K} + tl * {UNK_COST_Q} AS cost_q,
             m % {TIE_K} + tl AS n_pieces
      FROM ugdp
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
           CAST(SUM(cost_q) AS BIGINT) AS cost_q
    FROM ugocc JOIN ugtab USING (word) GROUP BY 1
    """


@query("unigram_tokenize_viterbi", oracle=_unigram_oracle())
def unigram_tokenize_viterbi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style unigram tokenizer decode
    (operators/unigram.py): per-document word/piece/cost accounting of
    the min-cost Viterbi segmentation under the PINNED piece table —
    the tokenizer family's second algorithm next to BPE, and its
    second hash-checked member. The O(L²) per-word DP runs entirely
    in built-in higher-order functions (aggregate fold + array_min
    sweep, whole-stage codegen, zero Python nodes), once per DISTINCT
    word; the int64 tie-break metric (cost·64 + pieces) makes the
    decode deterministic in both engines without a float anywhere."""
    from analytics_etl_spark.operators.unigram import unigram_doc_metrics

    return unigram_doc_metrics(t(spark, sf_dir, "documents"))


# --- round-10 addition: RefinedWeb-shaped classifier-gated build ----------

def _classifier_gated_corpus_oracle() -> str:
    """Compose the heuristic + classifier cascade INTO the corpus
    build: Gopher rules over the pool slice, the NB classifier scored
    on the survivors, drop the bottom score TERTILE (distribution-
    relative — the CCNet bucket rule applied to classifier scores,
    exact int64 histogram cumsum, no float percentile), then the
    standard five-gate build on what remains. Same anchored string
    surgery on the shared oracle as the perplexity-gated builds."""
    from analytics_etl_spark.queries.llm import _CORPUS_BUILD_ORACLE

    anchor = "WITH pool AS (SELECT doc_id, text FROM documents WHERE doc_id >= 25),"
    assert anchor in _CORPUS_BUILD_ORACLE, "corpus_build oracle pool CTE moved"
    replacement = (
        "WITH cg_pool AS (SELECT doc_id, lang, text FROM documents"
        " WHERE doc_id >= 25),"
        + _gopher_cte_chain(source="cg_pool", prefix="cgq_")
        + """,
    cg_surv AS (
      SELECT p.doc_id, p.lang, p.text
      FROM cg_pool p JOIN cgq_flags f ON f.doc_id = p.doc_id
      WHERE f.keep
    ),"""
        + _nb_cte_chain(source="cg_surv", prefix="cnb")
        + """,
    cg_sb AS (SELECT doc_id, score_q // 16 AS sbucket FROM cnbscore),
    cg_hist AS (
      SELECT sbucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM cg_sb GROUP BY 1
    ),
    cg_cum AS (
      SELECT sbucket,
             SUM(cnt) OVER (ORDER BY sbucket) AS cum,
             SUM(cnt) OVER () AS n
      FROM cg_hist
    ),
    cg_bounds AS (
      SELECT MIN(CASE WHEN cum * 3 >= n THEN sbucket END) AS b1 FROM cg_cum
    ),
    cg_keep AS (SELECT doc_id FROM cg_sb, cg_bounds WHERE sbucket > b1),
    pool AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id >= 25 AND doc_id IN (SELECT doc_id FROM cg_keep)
    ),"""
    )
    return _CORPUS_BUILD_ORACLE.replace(anchor, replacement, 1)


@query("corpus_build_classifier_gated", oracle=_classifier_gated_corpus_oracle())
def corpus_build_classifier_gated_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RefinedWeb-shaped nightly build: heuristic rules first,
    model filter second, then the standard five-gate composition —

        Gopher rule cascade (text_gopher_rules' calibrated set)
        → NB classifier score, drop the bottom TERTILE of the
          survivors' own score distribution (distribution-relative,
          so the gate cuts a real ~1/3 at every corpus size — the
          VERDICT r9 degeneracy lesson applied to a classifier)
        → quality → decontaminate → near-dedup → split → chunk.

    Fully oracle-paired end to end: the rules are integer-exact, the
    classifier is fixed-point NB, and the tertile boundary is an
    exact int64 cumsum over the bounded score-bucket histogram
    (score_q DIV 16 — 1/16-bit buckets: measured 34-81 distinct
    buckets across SFs where 1-bit buckets collapsed to 2 at sf0.1
    and the tertile degenerated to keep-nothing; the bucket domain
    stays doc-length-bounded, never corpus-bounded, so the histogram
    window is safe at scale. Spark DIV and DuckDB // both truncate
    toward zero — verified on negatives). Same id-sized decision pin +
    eager-populate + unpersist discipline as the perplexity-gated
    builds (ADVICE r9)."""
    from analytics_etl_spark.operators.classifier import nb_classifier_scores
    from analytics_etl_spark.operators.text_analysis import gopher_quality_flags
    from analytics_etl_spark.plans.corpus_build import corpus_build

    docs = t(spark, sf_dir, "documents")
    pool = docs.filter(F.col("doc_id") >= 25)
    g_keep = (
        gopher_quality_flags(pool, stopwords=("the", "a"))
        .filter(F.col("keep"))
        .select("doc_id")
    )
    surv = pool.join(g_keep, "doc_id", "left_semi")
    nb_handles: list[DataFrame] = []
    scored = nb_classifier_scores(
        surv, ref_pred=F.col("lang") == "en", cache_handles=nb_handles
    )
    sb = scored.select(
        "doc_id", F.expr("score_q DIV 16").alias("sbucket")
    ).persist()
    hist = sb.groupBy("sbucket").agg(F.count("*").cast("bigint").alias("cnt"))
    w_cum = Window.orderBy("sbucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("sbucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "sbucket",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    bounds = cum.agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("n"), F.col("sbucket"))
        ).alias("b1")
    )
    keep_ids = (
        sb.crossJoin(F.broadcast(bounds))
        .filter(F.col("sbucket") > F.col("b1"))
        .select("doc_id")
        .cache()
    )
    keep_ids.count()
    for h in nb_handles:
        h.unpersist()
    sb.unpersist()
    gated_pool = pool.select("doc_id", "text").join(keep_ids, "doc_id", "left_semi")
    result, _ = corpus_build(
        gated_pool, docs.filter(F.col("doc_id") < 25).select("doc_id", "text")
    )
    return result


# --- round-11 additions --------------------------------------------------

@query(
    "dedup_paragraph_corpus",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    p AS (
      SELECT doc_id, t.i AS pos, array_to_string(ws[t.i : t.i + 9], ' ') AS par
      FROM w CROSS JOIN LATERAL (
        SELECT unnest(range(1, greatest(len(ws), 1) + 1, 10)) AS i) t
    ),
    h AS (
      SELECT doc_id, pos, par,
             md5(trim(regexp_replace(lower(par), '[^a-z0-9]+', ' ', 'g'))) AS hh
      FROM p
      WHERE trim(regexp_replace(lower(par), '[^a-z0-9]+', ' ', 'g')) <> ''
    ),
    st AS (SELECT hh, COUNT(DISTINCT doc_id) AS n_docs FROM h GROUP BY 1),
    r AS (
      SELECT h.*, st.n_docs,
             ROW_NUMBER() OVER (PARTITION BY h.hh ORDER BY h.doc_id, h.pos) AS rn
      FROM h JOIN st USING (hh)
    ),
    kept AS (SELECT * FROM r WHERE n_docs < 2 OR rn = 1),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(par, ' ' ORDER BY pos) AS text_dedup
      FROM kept GROUP BY 1
    ),
    base AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pars FROM h GROUP BY 1)
    SELECT b.doc_id, b.n_pars,
           COALESCE(a.n_kept, 0) AS n_kept,
           COALESCE(a.text_dedup, '') AS text_dedup
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_paragraph_corpus_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's per-paragraph cross-corpus dedup (Wenzek et al. 2020
    §4.1; operators/dedup.paragraph_dedup) — the deployed FIRST stage
    of the CCNet pipeline, closing the one dedup granularity VERDICT
    r10 flagged missing: paragraphs duplicated across >= 2 documents
    are boilerplate (headers/footers/banners) and every occurrence
    but the corpus-first is removed, documents reassembled from the
    survivors. The operator's default paragraph is a newline split
    (faithful CCNet semantics for crawl text); the synthetic corpus
    has NO newlines (single-paragraph docs would degrade this to
    exact dedup, evidence-free), so the registered query uses aligned
    10-word chunks (word_chunk_paragraphs) — the planted duplicated
    spans give a genuinely two-sided outcome at every SF (sf0.01:
    47 of 500 docs lose at least one chunk). Scale shape: explode →
    hash-keyed stats groupBy → hash join back → per-doc reassembly;
    linear in paragraph count, boilerplate table is
    |distinct paragraphs|-sized — never pairwise."""
    from analytics_etl_spark.operators.dedup import (
        paragraph_dedup,
        word_chunk_paragraphs,
    )

    return paragraph_dedup(
        t(spark, sf_dir, "documents"),
        paragraphs=word_chunk_paragraphs(width=10),
        joiner=" ",
    )


def _persist_dir(sf_dir: str, name: str) -> str:
    """Per-(process, dataset, artifact) scratch dir for the
    persisted-index deployment-arm queries: the ingest write lands
    here (overwrite — rebuilding each call keeps the query hermetic
    and replay-idempotent), the returned probe plan reads it back.
    The pid is part of the path (ADVICE r11): two processes running
    the same persisted-arm query on the same dataset previously
    shared one dir, so one's overwrite could race the other's read.
    Within a process the path is stable, preserving the
    overwrite-then-read hermetic contract. A real site writes these
    layouts once at table registration; rebuilding per call is the
    correctness-gate analogue."""
    import hashlib
    import os
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), "aes_persist", f"{key}-{os.getpid()}", name
    )


@query(
    "dedup_substring_persisted",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 20
    ),
    s AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 18),
                    i -> md5(array_to_string(w[i:i+19], ' ')))) AS span_hash
      FROM w
    )
    SELECT span_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM s GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dedup_substring_persisted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_substring_spans in its DEPLOYMENT shape (VERDICT r10
    item 4): the rolling span-hash column is written at ingest
    (with_span_hashes — paid once), and the nightly dedup pass reads
    (doc_id, span_hashes) from parquet — no text split/re-hash at
    query time, plan asserted Python-free and column-pruned in
    tests/test_dedup_similarity.py. Output identical BY CONSTRUCTION
    to the inline form, so it shares dedup_substring_spans' oracle —
    which is exactly the point: the pay-once-at-ingest path now earns
    the same per-round hash-checked evidence as the inline form
    (bench measures it at 1.03 s vs 2.43 s inline at sf0.1)."""
    from analytics_etl_spark.operators.dedup import (
        substring_span_duplicates,
        with_span_hashes,
    )

    path = _persist_dir(sf_dir, "span_hashes")
    with_span_hashes(t(spark, sf_dir, "documents"), span_words=20).write.mode(
        "overwrite"
    ).parquet(path)
    return substring_span_duplicates(
        spark.read.parquet(path), spans_col="span_hashes"
    )


from analytics_etl_spark.queries.llm import _LSH_CTES  # noqa: E402


@query(
    "dedup_minhash_persisted",
    # identical output to dedup_minhash_lsh by construction ⇒ the same
    # oracle, independently hash-checked on the persisted-column path
    oracle=f"WITH {_LSH_CTES} SELECT doc_a, doc_b, jaccard FROM verified",
)
def dedup_minhash_persisted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_lsh_dedup in its DEPLOYMENT shape (VERDICT r10 item 4):
    the distinct-shingle array column is written at ingest
    (with_shingle_column — the Arrow kernel's ONLY run), and the
    query-time pipeline is parquet scan + JVM expressions end to end
    (signatures, banding, bucket join, exact verify — plan asserted
    Python-free in tests/test_dedup_similarity.py on the shingles_col
    path). Output identical BY CONSTRUCTION to dedup_minhash_lsh, so
    it shares that query's oracle; the returned probe plan carries
    zero Python eval nodes, unlike the inline form's declared
    kernel."""
    from analytics_etl_spark.operators.dedup import (
        minhash_lsh_dedup,
        with_shingle_column,
    )

    path = _persist_dir(sf_dir, "shingles")
    with_shingle_column(t(spark, sf_dir, "documents"), n=3).write.mode(
        "overwrite"
    ).parquet(path)
    return minhash_lsh_dedup(
        spark.read.parquet(path),
        num_hashes=12,
        rows_per_band=3,
        shingles_col="shingles",
    )


@query(
    "similarity_ann_ivfpq_persisted",
    rows_only=(
        "same PQ float-codebook reason as similarity_ann_pq (k-means float "
        "means are not bit-stable across engines); the persisted layout's "
        "probe plan is asserted Python-free and partition-pruned in "
        "tests/test_pq.py, recall vs brute force in tests/test_ann_recall.py"
    ),
)
def similarity_ann_ivfpq_persisted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FAISS IVF-PQ deployment shape as a REGISTERED query
    (VERDICT r10 item 4 — previously bench-only): coarse cells +
    PQ codes + float vectors materialized by write_ivfpq_index
    (partitioned by cell), then the probe runs 100% JVM — literal
    cell-probe partition pruning, driver-side ADC LUT, codes-only
    coarse scan, exact-cosine rerank of the 50-row shortlist. The
    quantizer/codebook training here runs inline for hermeticity;
    bench's persisted arm (0.55 s vs 3.1-5.6 s train-inline at sf0.1)
    measures the pay-once split this query evidences for
    correctness."""
    from analytics_etl_spark.operators.ivf import kmeans_centroids
    from analytics_etl_spark.operators.pq import (
        ivfpq_topk,
        pq_train_codebooks,
        write_ivfpq_index,
    )
    from analytics_etl_spark.queries.llm import _EMB_DIM

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = kmeans_centroids(emb, k=16, iters=3, sample_fraction=0.5)
    cbs = pq_train_codebooks(emb, m=8, ksub=16, iters=3, sample_fraction=0.5)
    path = _persist_dir(sf_dir, "ivfpq")
    write_ivfpq_index(emb, path, cents, cbs)
    return ivfpq_topk(
        spark.read.parquet(path),
        qvec,
        cents,
        cbs,
        k=10,
        n_probe=4,
        rerank=50,
        exclude_ids=(0,),
    )


# Stage-0 paragraph dedup composed into the corpus build: the full
# CCNet order (boilerplate paragraphs removed BEFORE quality gating).
# The oracle replays all six stages over the REWRITTEN pool text —
# paragraph chunks (width 10), corpus-first survivor selection,
# reassembly, then the corpus_build_pipeline chain (quality 2-grams,
# decontamination vs the ORIGINAL bench bank, MinHash-LSH dedup,
# salted split, chunk stats) — so the composition, not just the new
# stage, is hash-checked.
_PARADEDUP_BUILD_ORACLE = """
    WITH rawpool AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 25 AND text IS NOT NULL
    ),
    pdw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM rawpool),
    pdp AS (
      SELECT doc_id, t.i AS pos, array_to_string(ws[t.i : t.i + 9], ' ') AS par
      FROM pdw CROSS JOIN LATERAL (
        SELECT unnest(range(1, greatest(len(ws), 1) + 1, 10)) AS i) t
    ),
    pdh AS (
      SELECT doc_id, pos, par,
             md5(trim(regexp_replace(lower(par), '[^a-z0-9]+', ' ', 'g'))) AS hh
      FROM pdp
      WHERE trim(regexp_replace(lower(par), '[^a-z0-9]+', ' ', 'g')) <> ''
    ),
    pdst AS (SELECT hh, COUNT(DISTINCT doc_id) AS nd FROM pdh GROUP BY 1),
    pdr AS (
      SELECT pdh.*, pdst.nd,
             ROW_NUMBER() OVER (PARTITION BY pdh.hh ORDER BY pdh.doc_id, pdh.pos) AS rn
      FROM pdh JOIN pdst USING (hh)
    ),
    pool AS (
      SELECT doc_id, string_agg(par, ' ' ORDER BY pos) AS text
      FROM pdr WHERE nd < 2 OR rn = 1 GROUP BY doc_id
    ),
    -- stage 1: quality gate over the REWRITTEN text
    w2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM pool),
    g2 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
      FROM w2
    ),
    pg AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
    m AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ngrams,
             1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_frac,
             CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
      FROM pg GROUP BY doc_id
    ),
    surv1 AS (
      SELECT p.doc_id, p.text FROM pool p JOIN m ON m.doc_id = p.doc_id
      WHERE m.n_ngrams >= 20 AND m.dup_frac <= 0.05 AND m.top_frac <= 0.06
    ),
    -- stage 2: decontamination vs the ORIGINAL bench bank (the eval
    -- suite is never rewritten)
    bw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE doc_id < 25 AND text IS NOT NULL),
    bench AS (
      SELECT DISTINCT unnest(list_transform(range(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      FROM bw
    ),
    sw AS (SELECT doc_id, string_split(text, ' ') AS w FROM surv1),
    cg AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      FROM sw
    ),
    csize AS (SELECT doc_id, COUNT(*) AS n FROM cg GROUP BY doc_id),
    hits AS (
      SELECT cg.doc_id, COUNT(*) AS h FROM cg JOIN bench b ON b.shingle = cg.shingle
      GROUP BY cg.doc_id
    ),
    contaminated AS (
      SELECT s.doc_id FROM csize s JOIN hits h ON h.doc_id = s.doc_id
      WHERE CAST(h.h AS DOUBLE) / s.n > 0.2
    ),
    surv2 AS (
      SELECT doc_id, text FROM surv1
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    -- stage 3: near-dedup over the rewritten survivors
    params(seed, a, b) AS (VALUES __MINHASH_PARAMS__),
    s2w AS (SELECT doc_id, string_split(text, ' ') AS w FROM surv2),
    tok_s AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      FROM s2w
    ),
    base AS (
      SELECT doc_id,
             (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) AS hb
      FROM tok_s
    ),
    mh AS (
      SELECT doc_id, seed, MIN((a * hb + b) % 2147483647) AS h
      FROM base CROSS JOIN params GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, CAST(seed // 3 AS INT) AS band,
             md5(string_agg(h::VARCHAR, '|' ORDER BY seed)) AS bucket
      FROM mh GROUP BY doc_id, CAST(seed // 3 AS INT)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    ssz AS (SELECT doc_id, COUNT(*) AS sz FROM tok_s GROUP BY doc_id),
    common AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS common
      FROM tok_s x JOIN tok_s y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      JOIN cand c ON c.doc_a = x.doc_id AND c.doc_b = y.doc_id
      GROUP BY 1, 2
    ),
    dropped AS (
      SELECT DISTINCT c.doc_b AS doc_id FROM cand c
      JOIN common cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
      JOIN ssz sa ON sa.doc_id = c.doc_a
      JOIN ssz sb ON sb.doc_id = c.doc_b
      WHERE CAST(cm.common AS DOUBLE) / (sa.sz + sb.sz - cm.common) >= 0.5
    ),
    surv3 AS (
      SELECT doc_id, text FROM surv2
      WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    ),
    -- stages 4+5: salted split, chunk stats (corpus_build defaults)
    assigned AS (
      SELECT doc_id, text,
             CASE WHEN b < 9000 THEN 'train'
                  WHEN b < 9500 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id, text,
               CAST((('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
                     % 10000) AS INT) AS b
        FROM surv3
      )
    ),
    cw AS (
      SELECT doc_id, split, string_split(text, ' ') AS words FROM assigned
    ),
    ch AS (
      SELECT doc_id, split,
             unnest(list_transform(
               range(0, CAST(ceil(greatest(len(words) - 10, 1) / 40.0) AS BIGINT)),
               i -> len(words[i*40 + 1 : i*40 + 50]))) AS nw
      FROM cw
    )
    SELECT split,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(nw) AS BIGINT) AS total_words
    FROM ch GROUP BY split
"""


def _paradedup_oracle() -> str:
    from analytics_etl_spark.operators.dedup import minhash_affine_params

    rows = ", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(minhash_affine_params(12))
    )
    return _PARADEDUP_BUILD_ORACLE.replace("__MINHASH_PARAMS__", rows)


@query("corpus_build_paradedup", oracle=_paradedup_oracle())
def corpus_build_paradedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_build_pipeline with CCNet's stage-0 per-paragraph dedup
    enabled (paragraph_dedup_width=10 — the word-chunk paragraph
    notion dedup_paragraph_corpus documents): boilerplate paragraphs
    are removed and pool texts REWRITTEN before the quality gate ever
    scores them, which is the deployed CCNet order — furniture must
    not count toward 2-gram repetition or contamination fractions.
    Six stages, one lazy plan, the decontamination bank still built
    from the ORIGINAL eval texts. The oracle replays the entire
    rewritten-text chain, so this row checks the COMPOSITION — stage
    0's rewrite feeding every downstream decision — not just the new
    operator."""
    from analytics_etl_spark.plans.corpus_build import corpus_build

    docs = t(spark, sf_dir, "documents")
    result, _ = corpus_build(
        docs.filter(F.col("doc_id") >= 25).select("doc_id", "text"),
        docs.filter(F.col("doc_id") < 25).select("doc_id", "text"),
        paragraph_dedup_width=10,
    )
    return result


@query(
    "dedup_paragraph_intradoc",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    p AS (
      SELECT doc_id, t.i AS pos, array_to_string(ws[t.i : t.i + 1], ' ') AS par
      FROM w CROSS JOIN LATERAL (
        SELECT unnest(range(1, greatest(len(ws), 1) + 1, 2)) AS i) t
    ),
    h AS (
      SELECT doc_id, pos, par,
             md5(trim(regexp_replace(lower(par), '[^a-z0-9]+', ' ', 'g'))) AS hh
      FROM p
      WHERE trim(regexp_replace(lower(par), '[^a-z0-9]+', ' ', 'g')) <> ''
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, hh ORDER BY pos) AS rn
      FROM h
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(par, ' ' ORDER BY pos) AS text_dedup
      FROM r WHERE rn = 1 GROUP BY 1
    ),
    base AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pars FROM h GROUP BY 1)
    SELECT b.doc_id, b.n_pars, a.n_kept, a.text_dedup
    FROM base b JOIN agg a USING (doc_id)
    """,
)
def dedup_paragraph_intradoc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document paragraph collapse
    (operators/dedup.paragraph_dedup_intradoc): keep the first
    occurrence of each canonical paragraph WITHIN a doc — the
    repeated-nav-block collapse a crawl pipeline applies inside a
    page before corpus statistics, complementing
    dedup_paragraph_corpus (which keeps intra-doc repeats and targets
    cross-corpus boilerplate). Paragraph notion calibrated to the
    synthetic corpus: aligned 2-word chunks (widths 5/10 produce zero
    intra-doc repeats at any SF — 31-word vocabulary; width 2 splits
    two-sidedly everywhere: 174/500 docs lose a chunk at sf0.001,
    181/500 at sf0.01, 1655/5000 at sf0.1). One (doc_id, hash)
    groupBy with map-side combine + per-doc reassembly — no corpus-
    wide state, embarrassingly parallel."""
    from analytics_etl_spark.operators.dedup import (
        paragraph_dedup_intradoc,
        word_chunk_paragraphs,
    )

    return paragraph_dedup_intradoc(
        t(spark, sf_dir, "documents"),
        paragraphs=word_chunk_paragraphs(width=2),
        joiner=" ",
    )


@query(
    "decontaminate_paragraphs",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    p AS (
      SELECT doc_id, t.i AS pos, array_to_string(ws[t.i : t.i + 9], ' ') AS par
      FROM w CROSS JOIN LATERAL (
        SELECT unnest(range(1, greatest(len(ws), 1) + 1, 10)) AS i) t
    ),
    h AS (
      SELECT doc_id, pos, par,
             md5(trim(regexp_replace(lower(par), '[^a-z0-9]+', ' ', 'g'))) AS hh
      FROM p
      WHERE trim(regexp_replace(lower(par), '[^a-z0-9]+', ' ', 'g')) <> ''
    ),
    bench AS (SELECT DISTINCT hh FROM h WHERE doc_id < 25),
    pool AS (SELECT * FROM h WHERE doc_id >= 25),
    kept AS (
      SELECT * FROM pool WHERE hh NOT IN (SELECT hh FROM bench)
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(par, ' ' ORDER BY pos) AS text_dedup
      FROM kept GROUP BY 1
    ),
    base AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pars FROM pool GROUP BY 1)
    SELECT b.doc_id, b.n_pars,
           COALESCE(a.n_kept, 0) AS n_kept,
           COALESCE(a.text_dedup, '') AS text_dedup
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def decontaminate_paragraphs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level benchmark decontamination
    (operators/dedup.scrub_paragraphs): scrub from every pool doc
    (doc_id >= 25) any paragraph whose canonical hash appears in the
    eval suite (docs 0-24 — the same bank the doc-level
    benchmark_contamination gate uses), keep the rest of the doc.
    The scrub-vs-drop decontamination trade: doc-level gating costs a
    whole page per leaked quote; this removes the quote. Width-10
    chunk paragraphs (the dedup_paragraph_corpus notion); two-sided at
    every SF (7/5/19 pool docs lose a paragraph at sf0.001/0.01/0.1).
    Bench hash set is eval-suite-sized (broadcastable); pool side one
    explode + one left_anti hash join, linear."""
    from analytics_etl_spark.operators.dedup import (
        scrub_paragraphs,
        word_chunk_paragraphs,
    )

    docs = t(spark, sf_dir, "documents")
    return scrub_paragraphs(
        docs.filter(F.col("doc_id") >= 25),
        docs.filter(F.col("doc_id") < 25),
        paragraphs=word_chunk_paragraphs(width=10),
        joiner=" ",
    )


@query(
    "source_reputation_rank",
    oracle=f"""
    WITH {_gopher_cte_chain()},
    src AS (
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM documents d JOIN gq_flags g ON g.doc_id = d.doc_id
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS td, CAST(SUM(n_kept) AS BIGINT) AS tk
      FROM src
    )
    SELECT source, n_docs, n_kept,
           (n_kept * (SELECT td FROM tot) < (SELECT tk FROM tot) * n_docs)
             AS below_corpus
    FROM src
    """,
)
def source_reputation_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/domain-level reputation gating (the RefinedWeb/C4 move:
    judge the DOMAIN, not just the document — a source whose pages
    systematically fail quality rules is dropped wholesale, catching
    the low-quality mass an independent per-doc gate leaks): per
    source, doc count, Gopher-rule keep count (the calibrated
    text_gopher_rules cascade), and a distribution-relative flag —
    below_corpus ⟺ the source's keep-rate is strictly below the
    corpus-pooled rate, evaluated as the INTEGER cross-multiplied
    comparison n_kept·Σdocs < Σkept·n_docs (no float rate ever
    materializes — bit-exact in any engine, the memory-noted
    preference for distribution-relative cuts over absolute ones).
    One codegen pass for the flags + a source-cardinality-sized
    hash-agg + a 1-row broadcast total; NULL sources form their own
    audited group. Scale: shuffle is |sources| rows, nothing
    text-sized crosses the wire after the scan."""
    from analytics_etl_spark.operators.text_analysis import gopher_quality_flags

    docs = t(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs, stopwords=("the", "a")).select(
        "doc_id", "keep"
    )
    src = (
        docs.select("doc_id", "source")
        .join(flags, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
        )
    )
    tot = src.agg(
        F.sum("n_docs").cast("bigint").alias("td"),
        F.sum("n_kept").cast("bigint").alias("tk"),
    )
    return src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_kept",
        (F.col("n_kept") * F.col("td") < F.col("tk") * F.col("n_docs")).alias(
            "below_corpus"
        ),
    )


# --- round-11 wave 3: kNN join + histogram quantile sketch ----------------

from analytics_etl_spark.queries.llm import (  # noqa: E402
    _bucket_sql,
    _COS_SQL,
    _scorable_sql,
)

_KNN_Q_CTE = (
    "q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
    "FROM embeddings WHERE vec_id < 50 AND " + _scorable_sql("embedding") + ")"
)
_KNN_E_CTE = (
    "e AS (SELECT vec_id, embedding FROM embeddings WHERE "
    + _scorable_sql("embedding")
    + ")"
)


@query(
    "knn_join_exact",
    oracle=f"""
    WITH {_KNN_E_CTE},
    {_KNN_Q_CTE},
    s AS (
      SELECT q.query_id, e.vec_id, {_COS_SQL} AS score
      FROM e, q WHERE e.vec_id <> q.query_id
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
      FROM s
    )
    SELECT query_id, vec_id, CAST(rn AS INT) AS knn_rank, score
    FROM r WHERE rn <= 5
    """,
)
def knn_join_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-nearest-neighbor JOIN (operators/similarity.knn_join):
    top-5 cosine neighbors for each of the 50 lowest-id valid vectors
    against the whole corpus — the set-valued primitive behind
    kNN-graph construction (SemDeDup pair discovery, kNN-LM
    datastores), fully hash-checked because cosine over doubles is
    one deterministic expression in both engines (the
    similarity_topk_cosine argument, per-query). The bounded side
    (queries) is broadcast; ranking is a per-query row_number window
    with id tie-break. The exact form is the BOUNDED-QUERY-SET tool;
    full self-kNN at corpus scale goes through knn_join_bucketed."""
    from analytics_etl_spark.operators.similarity import knn_join
    from analytics_etl_spark.queries.llm import _EMB_DIM

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = knn_join(emb, queries, k=5, dim=_EMB_DIM)
    return out.select(
        "query_id", "vec_id", F.col("rank").alias("knn_rank"), "score"
    )


@query(
    "knn_join_bucketed",
    oracle=f"""
    WITH {_KNN_E_CTE},
    {_KNN_Q_CTE},
    s AS (
      SELECT q.query_id, e.vec_id, {_COS_SQL} AS score
      FROM e, q
      WHERE e.vec_id <> q.query_id
        AND {_bucket_sql("e.embedding")} = {_bucket_sql("q.qv")}
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
      FROM s
    )
    SELECT query_id, vec_id, CAST(rn AS INT) AS knn_rank, score
    FROM r WHERE rn <= 5
    """,
)
def knn_join_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE shape of the kNN join: candidates from a sign-bucket
    LSH EQUI-join (shuffle-partitioned by bucket — candidate volume
    Σ|bucket_q|·|bucket_c|, never all-pairs; with the corpus written
    partitioned by bucket, the persisted-index layout), exact cosine
    + per-query window on the candidates only. Deterministic bucket
    (sign pattern of the first 8 dims — the similarity_ann_bucketed
    machinery), so the recall trade is oracle-REPLAYABLE, not just
    measured: a query whose bucket lacks k candidates returns what
    exists, hash-checked. Single-probe recall for this corpus is the
    measured ANN-family number (tests/test_ann_recall.py)."""
    from analytics_etl_spark.operators.similarity import knn_join
    from analytics_etl_spark.queries.llm import _EMB_DIM

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = knn_join(emb, queries, k=5, bucket_bits=8, dim=_EMB_DIM)
    return out.select(
        "query_id", "vec_id", F.col("rank").alias("knn_rank"), "score"
    )


# Per-query probe-set CTE mirroring multiprobe_bucket_set: sort dims
# by |qv[i]| (tie on i), flip the (n_probes-1) lowest-margin bits of
# the sign bucket — the same expression the single-query
# similarity_ann_multiprobe oracle embeds, generalized to one probe
# list PER QUERY ROW.
_KNN_MARGINS = ", ".join(f"{{'m': abs(qv[{i + 1}]), 'i': {i}}}" for i in range(8))
_KNN_PROBES = ", ".join(
    ["qb"] + [f"CAST(xor(qb, (1 << ms[{j + 1}].i)) AS INT)" for j in range(3)]
)
_KNN_P_CTE = f"""
    p AS (
      SELECT query_id, qv, [{_KNN_PROBES}] AS probes
      FROM (SELECT query_id, qv, {_bucket_sql("qv")} AS qb,
                   list_sort([{_KNN_MARGINS}]) AS ms
            FROM q)
    )"""


@query(
    "knn_join_multiprobe",
    oracle=f"""
    WITH {_KNN_E_CTE},
    {_KNN_Q_CTE},
    {_KNN_P_CTE},
    s AS (
      SELECT p.query_id, e.vec_id, {_COS_SQL.replace("q.qv", "p.qv")} AS score
      FROM e, p
      WHERE e.vec_id <> p.query_id
        AND list_contains(p.probes, {_bucket_sql("e.embedding")})
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
      FROM s
    )
    SELECT query_id, vec_id, CAST(rn AS INT) AS knn_rank, score
    FROM r WHERE rn <= 5
    """,
)
def knn_join_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PROBE kNN join (VERDICT r11 item 2): each query probes
    its own sign bucket plus the 3 lowest-margin neighbor buckets
    (multiprobe_bucket_set — flip the bits whose hyperplanes the
    query sits closest to), candidates from the SAME bucket equi-join
    as knn_join_bucketed with the probe set exploded query-side.
    Candidate volume ~4× single-probe, still never all-pairs, and a
    kNN-graph consumer no longer inherits the family's steepest
    recall trade (recall monotone in probes — tests/test_ann_recall.py).
    The probe set is a deterministic function of the query vector, so
    the whole recall trade is oracle-REPLAYABLE: DuckDB computes the
    identical probe list per query and the result is hash-checked."""
    from analytics_etl_spark.operators.similarity import knn_join
    from analytics_etl_spark.queries.llm import _EMB_DIM

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = knn_join(emb, queries, k=5, bucket_bits=8, n_probes=4, dim=_EMB_DIM)
    return out.select(
        "query_id", "vec_id", F.col("rank").alias("knn_rank"), "score"
    )


def _knn_hyperplane_oracle(bits: int, tables: int, planes) -> str:
    """DuckDB mirror of knn_join_hyperplane in its JOIN shape: the
    same md5-derived ±1 planes embedded as one literal, each side's
    per-table SIGNATURES computed row-wise (sign of list_dot_product,
    bit-identical to the Arrow matmul's comparisons), candidates from
    the (table, signature) equi-join with pair DISTINCT before
    scoring — the exact plan the Spark side runs, so the whole
    OR-amplified recall trade is hash-checked. (The single-query
    hyperplane oracle's per-pair ANY-table match would be
    O(pairs·tables·bits) dots here; the signature join is
    O(rows·tables·bits) + a hash join, same as the engine.)"""
    flat = [p for tp in planes for p in tp]
    pl = (
        "["
        + ",".join(
            "[" + ",".join("1.0" if x > 0 else "-1.0" for x in p) + "]"
            for p in flat
        )
        + "]"
    )

    def sig_expr(col: str, t: int) -> str:
        s = " + ".join(
            f"(CASE WHEN list_dot_product({col}, pl[{t * bits + i + 1}]) > 0 "
            f"THEN {2 ** i} ELSE 0 END)"
            for i in range(bits)
        )
        return f"CAST({s} AS INT)"

    def structs(col: str) -> str:
        return ", ".join(
            "{'t': %d, 'b': %s}" % (t, sig_expr(col, t)) for t in range(tables)
        )

    return f"""
    WITH p AS (SELECT {pl} AS pl),
    {_KNN_E_CTE},
    {_KNN_Q_CTE},
    es AS (SELECT vec_id, u.t AS t, u.b AS b FROM (
      SELECT e.vec_id, unnest([{structs("e.embedding::DOUBLE[]")}]) AS u
      FROM e, p)),
    qs AS (SELECT query_id, u.t AS t, u.b AS b FROM (
      SELECT q.query_id, unnest([{structs("q.qv")}]) AS u FROM q, p)),
    cand AS (
      SELECT DISTINCT qs.query_id, es.vec_id
      FROM es JOIN qs ON es.t = qs.t AND es.b = qs.b
      WHERE es.vec_id <> qs.query_id
    ),
    s AS (
      SELECT c.query_id, e.vec_id, {_COS_SQL} AS score
      FROM cand c
      JOIN e ON e.vec_id = c.vec_id
      JOIN q ON q.query_id = c.query_id
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
      FROM s
    )
    SELECT query_id, vec_id, CAST(rn AS INT) AS knn_rank, score
    FROM r WHERE rn <= 5
    """


def _build_hp_oracle():
    # Called EAGERLY at decoration time (module import builds the
    # 24x6x64 plane literal) — named accordingly (ADVICE r12: the old
    # name `_hp_oracle_lazy` implied a deferral that never existed).
    from analytics_etl_spark.queries.llm import _HP_BITS, _HP_PLANES, _HP_TABLES

    return _knn_hyperplane_oracle(_HP_BITS, _HP_TABLES, _HP_PLANES)


@query("knn_join_hyperplane", oracle=_build_hp_oracle())
def knn_join_hyperplane_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RECALL arm of the kNN join family: 24-table × 6-bit
    random-hyperplane LSH (OR-amplification — the knob the
    sign-bucket forms lack) as a (table, signature) equi-join with
    pair-DISTINCT before scoring. Same 50-query set as the other
    join arms, so the three-way recall trade (single-probe →
    multiprobe → OR-amplified) is directly comparable and ALL THREE
    are hash-checked; recall ordering pinned in
    tests/test_ann_recall.py. Signatures ride the declared Arrow
    matmul kernel (at deployment a write-time sig column —
    write_lsh_index's layout); scoring stays on the exact JVM
    cosine fold."""
    from analytics_etl_spark.operators.similarity import knn_join_hyperplane
    from analytics_etl_spark.queries.llm import (
        _EMB_DIM,
        _HP_BITS,
        _HP_PLANES,
        _HP_TABLES,
    )

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = knn_join_hyperplane(
        emb,
        queries,
        dim=_EMB_DIM,
        k=5,
        bits=_HP_BITS,
        tables=_HP_TABLES,
        planes=_HP_PLANES,
    )
    return out.select(
        "query_id", "vec_id", F.col("rank").alias("knn_rank"), "score"
    )


# Self-kNN cosine for the graph query: both sides are the scorable
# corpus, so the CASE guard mirrors similarity.cosine on a/b aliases.
_KNN_SELF_COS = """
    CASE WHEN list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])
              * list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0
         THEN list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              / sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])
                     * list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))
    END
"""

# Planner-sized bucket bits (r15, VERDICT r14 item 1): the DuckDB
# replica of similarity.plan_bucket_bits(count, target=4, max_bits=24)
# — the integer-exact rule "bits >= b iff n^2 >= 16*2^(2b-1) =
# 2^(2b+3)", so the oracle derives the SAME bits the Spark plan got
# from corpus.count() at ANY scale factor (cross-checked value-by-
# value against the Python planner in tests/test_properties.py).
_KNN_NB_CTE = """
    nb AS (
      SELECT GREATEST(1, COALESCE(MAX(b), 1)) AS nbits
      FROM (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM e) t,
           (SELECT unnest(range(1, 25)) AS b) bs
      WHERE t.n * t.n >= CAST(1 AS BIGINT) << (2*b + 3)
    )
"""


def _bucket_sql_dyn(col: str, max_bits: int = 24) -> str:
    """sign_bucket at RUNTIME-VARIABLE bits: the fixed-bits
    _bucket_sql with each term gated on i < nb.nbits (the planner
    CTE), so one static SQL string replays the planner-sized bucket
    at every SF."""
    terms = [
        f"(CASE WHEN {i} < nb.nbits AND {col}[{i + 1}] > 0 "
        f"THEN {2**i} ELSE 0 END)"
        for i in range(max_bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"


# Shared planner-sized self-kNN candidate stages (both graph queries)
_KNN_GRAPH_STAGES = f"""
    {_KNN_NB_CTE},
    eb AS (
      SELECT e.vec_id, e.embedding,
             {_bucket_sql_dyn("e.embedding")} AS bkt
      FROM e, nb
    ),
    s AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid, {_KNN_SELF_COS} AS score
      FROM eb a JOIN eb b
        ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
    ),
    r AS (
      SELECT qid, nid, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY score DESC, nid) AS rn
      FROM s
    ),
    knn AS (SELECT qid, nid FROM r WHERE rn <= 5),
    mutual AS (
      SELECT x.qid AS u, x.nid AS v
      FROM knn x JOIN knn y ON y.qid = x.nid AND y.nid = x.qid
      WHERE x.qid < x.nid
    ),
    edges AS (SELECT u, v FROM mutual UNION SELECT v, u FROM mutual),
    reach(u, v) AS (
      SELECT u, u FROM edges
      UNION SELECT u, v FROM edges
      UNION SELECT r2.u, e2.v FROM reach r2 JOIN edges e2 ON r2.v = e2.u
    )
"""


@query(
    "knn_graph_clusters",
    oracle=f"""
    WITH RECURSIVE {_KNN_E_CTE},
    {_KNN_GRAPH_STAGES}
    SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach GROUP BY u
    """,
)
def knn_graph_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kNN-GRAPH CLUSTERING pipeline end-to-end (VERDICT r11
    item 3) — the SemDeDup/cluster-dedup shape built from this
    round's primitives: bucketed SELF-kNN join over the whole corpus
    (sign-bucket equi-join, PLANNER-SIZED bits since r15 — the r14
    100x rehearsal measured fixed bits=10 going superlinear, exp
    1.31, because candidates grow ~N²/1024; bucket_bits="auto" holds
    expected occupancy constant so candidate volume stays linear,
    and the integer-exact sizing rule is replayed by the oracle's
    nb CTE from the same corpus count) → mutual-kNN edges (u<v kept
    iff each is in the other's top-5 — degree bounded by k, edge set
    ≤ N·k/2) → min-label connected components (operators/graph.py,
    the iterative fixpoint already oracle-matched against recursive
    transitive closure in dedup_cluster_canonical). Every stage is
    deterministic (bucket = sign pattern, planner bits = integer
    rule on a deterministic count, ranking tie-broken on id, CC
    fixpoint unique), so the full composition is hash-checked:
    DuckDB replays planner + self-kNN + mutuality + recursive
    closure. exclude_self=True is the CORRECT usage here — queries
    ARE the corpus (shared id space). Output: (vec_id, cluster_id)
    for every node with ≥1 mutual edge; singletons absent by the
    documented CC contract. Planted-cluster recovery is pinned in
    tests/test_ann_recall.py."""
    from analytics_etl_spark.operators.graph import connected_components
    from analytics_etl_spark.operators.similarity import (
        knn_join,
        mutual_knn_edges,
    )
    from analytics_etl_spark.queries.llm import _EMB_DIM

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    self_q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    knn = knn_join(emb, self_q, k=5, bucket_bits="auto", dim=_EMB_DIM)
    edges = mutual_knn_edges(knn)
    return connected_components(edges, src="u", dst="v").select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@query(
    "dedup_semantic_knn_graph",
    oracle=f"""
    WITH RECURSIVE {_KNN_E_CTE},
    {_KNN_GRAPH_STAGES},
    comp AS (SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach GROUP BY u)
    SELECT vec_id, cluster_id FROM comp WHERE vec_id <> cluster_id
    """,
)
def dedup_semantic_knn_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup DECISION built on the kNN graph: within each
    mutual-kNN component, the min-id vector is canonical and every
    other member is a DROP — output (vec_id, cluster_id) for the
    dropped rows, cluster_id naming the kept canonical. This is the
    hash-checked sibling of the k-means-witness semantic dedups
    (operators/ivf.py — rows-only, float centroid means): the kNN
    graph's stages are all integer/tie-broken-deterministic, so the
    SAME 'drop all but one per tight cluster' decision becomes fully
    oracle-replayable. Shares knn_graph_clusters' plan (the filter
    is the only addition) including the r15 planner-sized bucket
    bits (bucket_bits="auto" — scale-safe as registered), so its
    scale story is that row in SCALING.md; a corpus build would
    anti-join these ids exactly like the near-dup drop stage."""
    from analytics_etl_spark.operators.graph import connected_components
    from analytics_etl_spark.operators.similarity import (
        knn_join,
        mutual_knn_edges,
    )
    from analytics_etl_spark.queries.llm import _EMB_DIM

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    self_q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    comp = connected_components(
        mutual_knn_edges(
            knn_join(emb, self_q, k=5, bucket_bits="auto", dim=_EMB_DIM)
        ),
        src="u",
        dst="v",
    )
    return comp.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@query(
    "histogram_quantile_sketch",
    oracle="""
    WITH h AS (
      SELECT CAST(floor(o_totalprice / 100.0) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders
      WHERE o_totalprice IS NOT NULL AND isfinite(o_totalprice)
      GROUP BY 1
    ),
    c AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum FROM h),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_n FROM h),
    qs(q_num, q_den) AS (VALUES (1, 4), (1, 2), (3, 4), (9, 10), (99, 100)),
    hit AS (
      SELECT q_num, q_den, total_n, MIN(bucket) AS bucket
      FROM c, t, qs
      WHERE cum * q_den >= q_num * total_n
      GROUP BY 1, 2, 3
    )
    SELECT q_num, q_den, bucket,
           CAST(bucket * 100.0 AS DOUBLE) AS lo, total_n
    FROM hit
    """,
)
def histogram_quantile_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value quantiles (p25/p50/p75/p90/p99) from the mergeable
    fixed-width histogram (operators/histogram.py) — the sketch
    family's QUANTILE member: $100 bins of o_totalprice, cumulative
    walk, each quantile the lower edge of the first bin reaching
    q·total under the exact integer cross-multiplied test
    cum·den >= num·total (no float threshold). The bin id is ONE
    IEEE divide + floor — bit-identical across engines — so unlike
    approxQuantile (driver-side, non-mergeable, seed-dependent) this
    is fully hash-checked AND SUM-mergeable across days/batches
    (streaming maintenance under the CMS exactly-once stance). Read
    cost is bin-table-sized: the window runs over ~350 bins, never
    the orders table."""
    from analytics_etl_spark.operators.histogram import (
        histogram_build,
        histogram_quantiles,
    )

    hist = histogram_build(t(spark, sf_dir, "orders"), "o_totalprice", 100)
    return histogram_quantiles(
        hist, ((1, 4), (1, 2), (3, 4), (9, 10), (99, 100)), 100
    )


@query(
    "histogram_quantile_grouped",
    oracle="""
    WITH h AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
             CAST(floor(o_totalprice / 100.0) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders
      WHERE o_totalprice IS NOT NULL AND isfinite(o_totalprice)
        AND o_orderdate IS NOT NULL
      GROUP BY 1, 2
    ),
    c AS (
      SELECT order_month, bucket,
             SUM(cnt) OVER (PARTITION BY order_month ORDER BY bucket) AS cum
      FROM h
    ),
    t AS (
      SELECT order_month, CAST(SUM(cnt) AS BIGINT) AS total_n
      FROM h GROUP BY 1
    ),
    qs(q_num, q_den) AS (VALUES (1, 2), (99, 100)),
    hit AS (
      SELECT c.order_month, q_num, q_den, total_n, MIN(bucket) AS bucket
      FROM c JOIN t ON c.order_month = t.order_month, qs
      WHERE cum * q_den >= q_num * total_n
      GROUP BY 1, 2, 3, 4
    )
    SELECT order_month, q_num, q_den, bucket,
           CAST(bucket * 100.0 AS DOUBLE) AS lo, total_n
    FROM hit
    """,
)
def histogram_quantile_grouped_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP quantiles from the mergeable histogram — the
    module's own headline use case ("p99 of order value per day",
    operators/histogram.py): p50/p99 of o_totalprice per ORDER MONTH
    from one grouped bin table. The cumulative window partitions by
    the group column and each group carries its own total_n, so the
    read stays bin-table-sized per group and no group ever leaks
    into another's quantile (the pre-r12 silent-global-mix misuse now
    raises — see histogram_quantiles' column check). Same exactness
    contract as the global sketch: integer cross-multiplied
    cum·den >= num·total, lo = the bin's lower edge, bit-identical
    across engines; the grouped bin table SUM-merges across
    days/batches exactly like the ungrouped one (histogram_merge
    keys on all non-cnt columns)."""
    from analytics_etl_spark.operators.histogram import (
        histogram_build,
        histogram_quantiles,
    )

    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            "o_totalprice",
        )
    )
    hist = histogram_build(
        o, "o_totalprice", 100, group_cols=("order_month",)
    )
    return histogram_quantiles(
        hist, ((1, 2), (99, 100)), 100, group_cols=("order_month",)
    )


# The histogram family's ORACLE-PAIRED guarantee arm (VERDICT r15
# item 5): the sketch's one-bucket-width exactness contract — the
# returned lower edge BRACKETS the true order-statistic quantile —
# restated purely in counts, so it needs no order statistics and no
# global sort: v_r ∈ [lo, lo+width) ⟺ count(v < lo)·den < num·total
# AND count(v < lo+width)·den ≥ num·total (r = ⌈num·total/den⌉, all
# exact int64 cross-multiplies). The Spark side runs the REAL
# build → SUM-merge → cumulative-walk path (two half-histograms
# split on o_orderkey parity, merged — so the lossless-merge theorem
# is inside the hash check too), then two threshold counts via a
# broadcast of the 2-row quantile frame; the oracle replays the walk
# AND the counts in SQL. A bucket off-by-one, a lossy merge, or a
# broken cumulative walk moves lo — and the containment boolean (or
# lo itself) reds the hash. Scale shape: one extra map-side-combined
# pass over the gated values; the broadcast side is 2 rows.
@query(
    "histogram_quantile_containment",
    oracle="""
    WITH vals AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
      WHERE o_totalprice IS NOT NULL AND isfinite(o_totalprice)
    ),
    h AS (
      SELECT CAST(floor(v / 100.0) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM vals GROUP BY 1
    ),
    c AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum FROM h),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_n FROM h),
    qs(q_num, q_den) AS (VALUES (1, 2), (99, 100)),
    hit AS (
      SELECT q_num, q_den, total_n, MIN(bucket) AS bucket
      FROM c, t, qs
      WHERE cum * q_den >= q_num * total_n
      GROUP BY 1, 2, 3
    ),
    edges AS (
      SELECT q_num, q_den, bucket, total_n,
             CAST(bucket * 100.0 AS DOUBLE) AS lo,
             CAST((bucket + 1) * 100.0 AS DOUBLE) AS hi
      FROM hit
    ),
    counted AS (
      SELECT e.q_num, e.q_den, e.bucket, e.lo, e.total_n,
             CAST(SUM(CASE WHEN vals.v < e.lo THEN 1 ELSE 0 END) AS BIGINT)
               AS below_lo,
             CAST(SUM(CASE WHEN vals.v < e.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS below_hi
      FROM edges e, vals
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT q_num, q_den, bucket, lo, total_n,
           CAST(below_lo * q_den < q_num * total_n
                AND below_hi * q_den >= q_num * total_n AS BOOLEAN) AS contained
    FROM counted
    """,
)
def histogram_quantile_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.histogram import (
        histogram_build,
        histogram_merge,
        histogram_quantiles,
    )

    o = t(spark, sf_dir, "orders")
    # split on o_orderkey parity (never NULL, partitions completely) so
    # the hash check exercises build + merge, not just build
    a = histogram_build(o.filter(F.col("o_orderkey") % 2 == 0), "o_totalprice", 100)
    b = histogram_build(o.filter(F.col("o_orderkey") % 2 != 0), "o_totalprice", 100)
    hist = histogram_merge(a, b)
    sk = histogram_quantiles(hist, ((1, 2), (99, 100)), 100)
    edges = sk.select(
        "q_num",
        "q_den",
        "bucket",
        "lo",
        "total_n",
        (F.col("lo") + F.lit(100.0)).alias("hi"),
    )
    c = F.col("o_totalprice")
    d = c.cast("double")
    vals = o.filter(
        c.isNotNull()
        & ~F.isnan(d)
        & (d != F.lit(float("inf")))
        & (d != F.lit(float("-inf")))
    ).select(d.alias("v"))
    j = vals.crossJoin(F.broadcast(edges))
    counted = j.groupBy("q_num", "q_den", "bucket", "lo", "total_n").agg(
        F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("below_lo"),
        F.sum(F.when(F.col("v") < F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("below_hi"),
    )
    return counted.select(
        "q_num",
        "q_den",
        "bucket",
        "lo",
        "total_n",
        (
            (F.col("below_lo") * F.col("q_den") < F.col("q_num") * F.col("total_n"))
            & (F.col("below_hi") * F.col("q_den") >= F.col("q_num") * F.col("total_n"))
        ).alias("contained"),
    )


# DoReMi-style iterative domain reweighting (operators/doremi.py —
# Xie et al. 2023 in the engine's exact-integer formulation): the
# feedback-driven sibling of the static mixers (temperature_mix_rates,
# sample_budget_allocation). Domains are languages; the per-document
# loss is the CCNet bigram-LM quantized surprisal already shipped by
# the perplexity family (ppl_q256 — integer 1/256-bit units, LM
# trained on the English reference slice, so non-reference domains
# carry genuine excess loss for the update to follow). One
# map-side-combined groupBy is the only corpus-sized work; 8
# multiplicative-weights rounds run on K=|langs| driver-side integers
# with Hamilton re-normalization (weights sum to the ppm budget
# EXACTLY every round).
#
# ORACLE-PAIRED since r15 (VERDICT r14 item 4): with a STATIC loss
# table and a FIXED round count the loop is not a fixpoint (the
# bpe_learned_merges class) but a fixed-depth composition — every
# round is exact integer arithmetic over K rows, so the 8 rounds
# UNROLL into one SQL chain: per-round mixture rate (scalar CTE),
# multiplicative masses, Hamilton largest-remainder re-normalization
# (window: remainder rank vs leftover), uniform smoothing, repeated
# 8x, then the across-round-average Hamilton. Every CTE is
# MATERIALIZED — each Hamilton pass reads its input twice, and 17
# chained passes would otherwise inline 2^17 subtrees. Parity with
# the pure-Python reference is fuzz-pinned over randomized stats
# (incl. NULL domains and all-zero-loss rounds) in
# tests/test_properties.py::test_doremi_oracle_sql_matches_reference.


def _hamilton_cte(inp: str, out: str, carry: list[str], budget: int) -> str:
    """One Hamilton (largest-remainder) apportionment pass as a
    MATERIALIZED CTE: ``inp`` carries (``carry``..., m) non-negative
    HUGEINT masses; ``out`` carries (``carry``..., w) with w summing
    to ``budget`` exactly. Remainder ties break by (domain IS NOT
    NULL, domain) — the operator's _dkey total order (None first)."""
    cols = ", ".join(carry)
    return f"""
    {out} AS MATERIALIZED (
      SELECT {cols},
             flo + CASE WHEN rn <= {budget} - tot THEN 1 ELSE 0 END AS w
      FROM (
        SELECT {cols}, flo, rem, SUM(flo) OVER () AS tot,
               ROW_NUMBER() OVER (
                 ORDER BY rem DESC, (domain IS NOT NULL), domain) AS rn
        FROM (
          SELECT {cols},
                 CAST({budget} AS HUGEINT) * m // tt AS flo,
                 CAST({budget} AS HUGEINT) * m % tt AS rem
          FROM {inp}, (SELECT SUM(m) AS tt FROM {inp}) t
        ) f1
      ) f2
    )"""


def _doremi_rounds_sql(rounds: int, budget: int = 1_000_000) -> str:
    """The unrolled DoReMi chain from a ``dstats (domain, n, s)`` CTE
    (n = docs, s = integer loss sum) to the final SELECT — eta=(1,1),
    smooth=(1,50), mirroring doremi_reweight's defaults: masses
    w*(mix + max(0, rate-mix)) when mix > 0 (else unchanged), then
    smoothing masses 49*w*k + budget, each Hamilton-renormalized."""
    parts = [f"""
    k1 AS MATERIALIZED (SELECT CAST(COUNT(*) AS HUGEINT) AS k FROM dstats),
    base AS MATERIALIZED (
      SELECT domain, n, (CAST(s AS HUGEINT) * 1000000) // n AS rate,
             CAST(n AS HUGEINT) AS m
      FROM dstats
    ),{_hamilton_cte("base", "w0t", ["domain", "n", "rate"], budget)},
    st0 AS MATERIALIZED (
      SELECT domain, n, rate, w AS w0, w, CAST(0 AS HUGEINT) AS hsum
      FROM w0t
    )"""]
    carry = ["domain", "n", "rate", "w0", "hsum"]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f""",
    mix{i} AS MATERIALIZED (
      SELECT SUM(CAST(w AS HUGEINT) * rate) // {budget} AS mix FROM st{p}
    ),
    ma{i} AS MATERIALIZED (
      SELECT domain, n, rate, w0, hsum,
             CAST(w AS HUGEINT) * (CASE WHEN mix > 0
               THEN mix + GREATEST(rate - mix, 0) ELSE 1 END) AS m
      FROM st{p}, mix{i}
    ),{_hamilton_cte(f"ma{i}", f"ha{i}", carry, budget)},
    mb{i} AS MATERIALIZED (
      SELECT domain, n, rate, w0, hsum,
             49 * CAST(w AS HUGEINT) * k + {budget} AS m
      FROM ha{i}, k1
    ),{_hamilton_cte(f"mb{i}", f"hb{i}", carry, budget)},
    st{i} AS MATERIALIZED (
      SELECT domain, n, rate, w0, hsum + w AS hsum, w FROM hb{i}
    )""")
    parts.append(f""",
    fm AS MATERIALIZED (SELECT domain, n, w0, hsum AS m FROM st{rounds}),
    {_hamilton_cte("fm", "fin", ["domain", "n", "w0"], budget)}
    SELECT domain, CAST(n AS BIGINT) AS n_docs,
           CAST(w0 AS BIGINT) AS weight0_ppm, CAST(w AS BIGINT) AS weight_ppm
    FROM fin ORDER BY domain NULLS FIRST""")
    return "".join(parts)


@query(
    "doremi_domain_weights",
    oracle=f"""
    WITH {_ppl_cte_chain()},
    dstats AS MATERIALIZED (
      SELECT d.lang AS domain, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a.surprisal_q // a.n_grams) AS BIGINT) AS s
      FROM pp_agg a JOIN documents d ON d.doc_id = a.doc_id
      GROUP BY 1
    ),
    {_doremi_rounds_sql(8)}
    """,
)
def doremi_domain_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.doremi import (
        domain_loss_stats,
        doremi_reweight,
    )
    from analytics_etl_spark.operators.perplexity import perplexity_gate

    docs = t(spark, sf_dir, "documents")
    scored = perplexity_gate(docs, ref_pred=F.col("lang") == "en")
    losses = scored.join(docs.select("doc_id", "lang"), "doc_id")
    stats = domain_loss_stats(losses, domain_col="lang", loss_col="ppl_q256")
    return doremi_reweight(stats, rounds=8)


# Hard-negative mining — the kNN join family's retrieval-training use
# case (DPR/Contriever-style: for each query, the nearest neighbors
# from a DIFFERENT source than the query's own are the informative
# negatives; same-source neighbors are likely positives/duplicates).
# Composition: embeddings enriched with the documents table's source,
# exact kNN join with the anti_affinity contract — the same-source
# exclusion runs BEFORE the ranking window, so ranks are dense over
# eligible negatives (a post-filter would leave gaps and short lists).
# Fully hash-checked: the source join is a keyed equi-join in both
# engines, the exclusion is IS DISTINCT FROM, scoring is the exact
# cosine. Scale: the anti-affinity filter rides the candidate frame of
# whichever arm generates it — here the contract-gated exact arm (50
# bounded queries); at corpus scale the same knob composes with the
# bucketed/multiprobe/hyperplane arms unchanged.
@query(
    "knn_hard_negatives",
    oracle=f"""
    WITH {_KNN_E_CTE},
    {_KNN_Q_CTE},
    s AS (
      SELECT q.query_id, e.vec_id, {_COS_SQL} AS score
      FROM e, documents de, q, documents dq
      WHERE e.vec_id = de.doc_id AND q.query_id = dq.doc_id
        AND de.source IS DISTINCT FROM dq.source
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
      FROM s
    )
    SELECT query_id, vec_id, CAST(rn AS INT) AS hn_rank, score
    FROM r WHERE rn <= 5
    """,
)
def knn_hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.similarity import knn_join
    from analytics_etl_spark.queries.llm import _EMB_DIM

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    src = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), F.col("source").alias("src")
    )
    corpus = emb.join(src, "vec_id")
    queries = corpus.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("src").alias("qsrc"),
    )
    # exclude_self=False: a query's own row shares its source, so the
    # anti-affinity contract already removes it
    out = knn_join(
        corpus,
        queries,
        k=5,
        exclude_self=False,
        anti_affinity=("src", "qsrc"),
        dim=_EMB_DIM,
    )
    return out.select(
        "query_id", "vec_id", F.col("rank").alias("hn_rank"), "score"
    )
