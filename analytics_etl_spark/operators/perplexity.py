"""CCNet-style n-gram LM perplexity gate — exact fixed-point, JVM-pure.

The standard quality stage next to DSIR importance weighting
(queries/llm.py `dsir_importance_topk`): train a small n-gram language
model on a trusted reference slice, score every document by how well
the model predicts it, and gate out the worst tail (CCNet, Wenzek et
al. 2020, keeps the "head/middle" perplexity buckets; the reference
repo has no LM stage — this is part of the declared LLM-pipeline
extension surface, SURVEY.md §2.7).

Model: a word-BIGRAM LM with add-one smoothing over a HASHED vocab of
``VOCAB_BUCKETS`` buckets (the DSIR trick — md5-bucket hashing bounds
the model size AND is bit-identical in Spark and DuckDB, so the whole
stage oracle-pairs):

    p(f2 | f1) = (c(f1,f2) + 1) / (c(f1) + V)

Exactness: perplexity is a geometric mean, so floats are unavoidable —
but ONLY inside ``log2``. Every count is exact int64; the per-bigram
surprisal is quantized to 1/256-bit units

    s_q = floor(256 · (log2(c1 + V) − log2(c2 + 1)))

and from there everything is exact integer arithmetic again (int64
sums are order-invariant, unlike double sums — the BM25 linearization
discipline, operators/search.py). Cross-engine floor() stability is
PROBABILISTIC, not absolute (ADVICE r9): 256·(log2(c1+V) − log2(c2+1))
lands exactly ON an integer only when the count ratio is a power of
two (where IEEE log2 is exact in both engines and no flip is
possible), but it can land arbitrarily CLOSE to an integer for other
ratios, where a last-ulp libm difference could in principle flip the
floor. For int64 counts the gap to the nearest integer is ≳1e-12 in
all but adversarially-constructed cases vs a libm disagreement of
≤1 ulp (~2e-16 at this magnitude) — a ~1e-4 relative margin per
distinct count pair, so a flip is overwhelmingly improbable but not
guaranteed; the oracle gate would surface one as a hash mismatch.
Per-doc score:

    ppl_q256 = (Σ c·s_q) DIV (Σ c)    -- mean surprisal, 1/256 bits

(2^(ppl_q256/256) is the conventional perplexity; the monotone
transform stays in the report, never in the compared columns.)

100 TB shape: the doc side is one explode → per-doc bigram count
(map-side combined); the model side is bounded by the hashed vocab
(≤ V unigram rows — broadcastable; observed-bigram rows ≤ V², in
practice corpus-vocabulary-sized) and joins on (f1, f2)/f1 key
shuffles or broadcasts at Catalyst's discretion. Nothing is
all-pairs, nothing collects, no Python eval nodes (plan-asserted in
tests/test_perplexity.py).

Hostile-data contract: NULL text filtered at the scan; empty/one-word
docs have no bigram and drop out (no defined perplexity — mirrored
by construction in the oracle, which generates zero bigram rows for
them); every token, including empty-string tokens from whitespace
runs, hashes like any other word.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

VOCAB_BUCKETS = 65536
# floor(256·log2(0 + V)) with V = 2^16: the surprisal of a bigram whose
# prefix bucket was never seen in the reference slice (p = 1/V).
UNSEEN_SURPRISAL_Q = 256 * 16


def vocab_bucket(col: Column) -> Column:
    """md5-bucket word hashing, identical in Spark and DuckDB (the
    dsir_importance_topk pattern): 15 hex digits < 2^60 keeps the
    conv() exact in int64; pmod-free since the value is non-negative."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % VOCAB_BUCKETS
    )


def doc_bigram_buckets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, f1, f2, c): per-document counts of hashed word-bigram
    buckets. Whitespace tokenization (split on single space — the
    corpus convention shared by every text operator here); docs with
    fewer than two tokens yield no rows."""
    w = F.split(F.col(text_col), " ")
    pairs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(1)),
            lambda i: F.struct(
                F.element_at(w, i).alias("w1"),
                F.element_at(w, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select("doc_id", F.explode(pairs).alias("g"))
        .select(
            "doc_id",
            vocab_bucket(F.col("g.w1")).alias("f1"),
            vocab_bucket(F.col("g.w2")).alias("f2"),
        )
        .groupBy("doc_id", "f1", "f2")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def bigram_lm(ref_docs: DataFrame, text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """Train the add-one-smoothed bigram LM on the reference slice.

    Returns (model, backoff):
      model   (f1, f2, s_q)  — quantized surprisal of each OBSERVED
                               bigram bucket pair,
      backoff (f1, s1_q)     — surprisal of an unseen f2 after a SEEN
                               prefix f1 (c2 = 0 ⇒ p = 1/(c1+V)).
    Prefix counts c1 = Σ_f2 c2(f1,·) so the smoothed distribution
    normalizes exactly. Both frames are vocab-bounded: backoff ≤ V
    rows (always broadcastable), model ≤ observed distinct bigrams."""
    grams = doc_bigram_buckets(ref_docs, text_col)
    # c2 feeds BOTH the model projection and the prefix-count rollup;
    # without a pin the reference-slice bigram expansion runs twice
    # (same double-consumption fix as dsir_importance_topk).
    c2 = (
        grams.groupBy("f1", "f2")
        .agg(F.sum("c").alias("c2"))
        .localCheckpoint(eager=False)
    )
    c1 = c2.groupBy("f1").agg(F.sum("c2").alias("c1"))
    v = F.lit(VOCAB_BUCKETS).cast("bigint")
    log_den = F.log2((F.col("c1") + v).cast("double"))
    model = (
        c2.join(c1, "f1")
        .select(
            "f1",
            "f2",
            F.floor(
                F.lit(256.0)
                * (log_den - F.log2((F.col("c2") + F.lit(1)).cast("double")))
            )
            .cast("bigint")
            .alias("s_q"),
        )
    )
    backoff = c1.select(
        "f1",
        F.floor(F.lit(256.0) * log_den).cast("bigint").alias("s1_q"),
    )
    return model, backoff


def perplexity_score(
    docs: DataFrame,
    model: DataFrame,
    backoff: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, surprisal_q, ppl_q256): per-document mean
    quantized surprisal under the LM. Docs with no bigram drop out.
    ppl_q256 is mean surprisal in 1/256-bit units; conventional
    perplexity = 2^(ppl_q256/256)."""
    grams = doc_bigram_buckets(docs, text_col)
    scored = (
        grams.join(model, ["f1", "f2"], "left")
        .join(backoff, "f1", "left")
        .select(
            "doc_id",
            "c",
            F.coalesce(
                F.col("s_q"), F.col("s1_q"), F.lit(UNSEEN_SURPRISAL_Q).cast("bigint")
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.col("s")).cast("bigint").alias("surprisal_q"),
        )
        .select(
            "doc_id",
            "n_grams",
            "surprisal_q",
            F.expr("surprisal_q DIV n_grams").cast("bigint").alias("ppl_q256"),
        )
    )


def perplexity_gate(
    docs: DataFrame,
    ref_docs: DataFrame | None = None,
    threshold_q256: int = UNSEEN_SURPRISAL_Q,
    text_col: str = "text",
    ref_pred: Column | None = None,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """The composed CCNet-style gate: train on the reference slice,
    score ``docs``, and flag ``keep = ppl_q256 <= threshold_q256``
    (CCNet's head+middle retention, as a deterministic integer
    comparison). Returns every scored doc with its flag rather than
    silently dropping rows — the governance convention (quarantine,
    not delete) every filter stage here follows.

    Reference slice, exactly one of:
      ``ref_docs`` — an arbitrary external corpus (its own scan);
      ``ref_pred`` — a predicate over ``docs`` (e.g. lang == 'en').
        This is the CCNet deployment shape AND the fast path: the
        expensive bigram explode+count runs ONCE over the corpus with
        a per-doc reference flag, and the model counts are a rollup of
        the same table the scoring side consumes (persisted — it feeds
        both, and recomputing it means re-exploding the corpus).
    """
    if (ref_docs is None) == (ref_pred is None):
        raise ValueError("pass exactly one of ref_docs / ref_pred")
    if ref_docs is not None:
        model, backoff = bigram_lm(ref_docs, text_col)
        scored = perplexity_score(docs, model, backoff, text_col)
        return scored.select(
            "doc_id",
            "n_grams",
            "surprisal_q",
            "ppl_q256",
            (F.col("ppl_q256") <= F.lit(int(threshold_q256))).alias("keep"),
        )

    # shared-scan form: one explode, per-doc counts carry the ref flag
    w = F.split(F.col(text_col), " ")
    pairs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(1)),
            lambda i: F.struct(
                F.element_at(w, i).alias("w1"),
                F.element_at(w, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    dc = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            "doc_id", F.coalesce(ref_pred, F.lit(False)).alias("is_ref"),
            F.explode(pairs).alias("g"),
        )
        .select(
            "doc_id",
            "is_ref",
            vocab_bucket(F.col("g.w1")).alias("f1"),
            vocab_bucket(F.col("g.w2")).alias("f2"),
        )
        .groupBy("doc_id", "is_ref", "f1", "f2")
        .agg(F.count("*").cast("bigint").alias("c"))
        # dc feeds the model rollup AND the scoring join — persist, or
        # the corpus bigram explode runs twice (measured ~2× at sf0.1).
        # Lifetime (ADVICE r9): the handle must outlive the caller's
        # action, so we cannot unpersist here; callers that run many
        # queries in one session (the driver, bench reps) pass
        # ``cache_handles`` and unpersist after consuming the result —
        # otherwise the entry stays until LRU block eviction (MEMORY_*
        # storage is evictable, so this degrades to recompute, never
        # OOM).
        .persist()
    )
    if cache_handles is not None:
        cache_handles.append(dc)
    c2 = (
        dc.filter(F.col("is_ref"))
        .groupBy("f1", "f2")
        .agg(F.sum("c").alias("c2"))
    )
    c1 = c2.groupBy("f1").agg(F.sum("c2").alias("c1"))
    v = F.lit(VOCAB_BUCKETS).cast("bigint")
    log_den = F.log2((F.col("c1") + v).cast("double"))
    model = c2.join(c1, "f1").select(
        "f1",
        "f2",
        F.floor(
            F.lit(256.0)
            * (log_den - F.log2((F.col("c2") + F.lit(1)).cast("double")))
        )
        .cast("bigint")
        .alias("s_q"),
    )
    backoff = c1.select(
        "f1", F.floor(F.lit(256.0) * log_den).cast("bigint").alias("s1_q")
    )
    scored = (
        dc.join(model, ["f1", "f2"], "left")
        .join(backoff, "f1", "left")
        .select(
            "doc_id",
            "c",
            F.coalesce(
                F.col("s_q"), F.col("s1_q"), F.lit(UNSEEN_SURPRISAL_Q).cast("bigint")
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.col("s")).cast("bigint").alias("surprisal_q"),
        )
        .select(
            "doc_id",
            "n_grams",
            "surprisal_q",
            F.expr("surprisal_q DIV n_grams").cast("bigint").alias("ppl_q256"),
        )
    )
    return scored.select(
        "doc_id",
        "n_grams",
        "surprisal_q",
        "ppl_q256",
        (F.col("ppl_q256") <= F.lit(int(threshold_q256))).alias("keep"),
    )


def perplexity_buckets(
    docs: DataFrame,
    ref_docs: DataFrame | None = None,
    text_col: str = "text",
    ref_pred: Column | None = None,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """CCNet's actual deployment shape: head/middle/tail TERTILES of
    the corpus's own perplexity distribution (Wenzek et al. 2020 §4.3
    keep the head+middle buckets), instead of a hand-pinned absolute
    cut. Self-calibrating by construction — the fixed
    ``PPL_KEEP_THRESHOLD_Q256`` literal in queries/llm2.py splits
    non-trivially at sf0.001/sf0.01 but keeps ~everything at sf0.1
    (noted in ROUND9.md); tertiles of the observed distribution split
    1/3-1/3-1/3 at EVERY corpus size.

    Exact, order-free boundary computation — the 100 TB trick: NTILE
    would need a global sort (one-partition window over every doc).
    Instead, ``ppl_q256`` lives in a TINY bounded integer domain
    (≲ 256·log2(corpus_bigrams + V) — a few thousand distinct values
    even at 2^63 bigrams), so exact tertile boundaries come from a
    value-HISTOGRAM: group docs by ppl_q256 (map-side combined, one
    shuffle of ≤ few-thousand rows), cumulative-sum that driver-bounded
    histogram, and pick

        b1 = min{ p : 3·cum(p) ≥ n },   b2 = min{ p : 3·cum(p) ≥ 2n }

    in pure int64 arithmetic (no percentile float, no sort of the
    corpus). Ties at a boundary VALUE all land in the same bucket —
    value-level assignment is the only deterministic rule both engines
    express identically, so buckets are near-tertiles (exact tertiles
    up to boundary-value ties). Returns every scored doc:
    (doc_id, n_grams, surprisal_q, ppl_q256, bucket).

    The single-partition window runs over the histogram (bounded),
    never the corpus; the boundary frame is a 1-row broadcast.
    """
    scored = perplexity_gate(
        docs, ref_docs=ref_docs, text_col=text_col, ref_pred=ref_pred,
        cache_handles=cache_handles,
    ).drop("keep")
    # scored feeds the histogram AND the final bucket join — persist,
    # or the LM score subtree (joins + two aggregations over the
    # persisted bigram table) replays for each consumer. Same lifetime
    # contract as ``dc`` above: handle exported via cache_handles,
    # else LRU-evictable.
    scored = scored.persist()
    if cache_handles is not None:
        cache_handles.append(scored)
    hist = scored.groupBy("ppl_q256").agg(F.count("*").cast("bigint").alias("cnt"))
    w_cum = Window.orderBy("ppl_q256").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("ppl_q256").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "ppl_q256",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    bounds = cum.agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("n"), F.col("ppl_q256"))
        ).alias("b1"),
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("ppl_q256"))
        ).alias("b2"),
    )
    return scored.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "n_grams",
        "surprisal_q",
        "ppl_q256",
        F.when(F.col("ppl_q256") <= F.col("b1"), F.lit("head"))
        .when(F.col("ppl_q256") <= F.col("b2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
