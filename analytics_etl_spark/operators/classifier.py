"""fastText-shaped quality classifier — hashed bag-of-words Naive
Bayes with exact fixed-point log-odds weights, JVM-pure.

The third standard quality stage of a CCNet/LLaMA-style corpus
pipeline, next to the bigram-LM perplexity gate
(operators/perplexity.py) and DSIR importance weighting
(queries/llm.py): train a linear text classifier that separates a
trusted reference slice from the rest, score every document, and keep
what classifies as reference-like. Production pipelines use a trained
fastText supervised model (Wenzek et al. 2020 §4.4; Touvron et al.
2023 "classify pages used as references in Wikipedia"); its
engine-portable core is exactly a hashed bag-of-words LINEAR model,
which multinomial Naive Bayes gives in closed form from counts — no
iterative float training, so the whole stage oracle-pairs.

Model (add-one smoothing over ``VOCAB_BUCKETS`` hashed unigram
buckets, the perplexity/DSIR md5 trick):

    w(t)   = log2 p(t|pos) − log2 p(t|neg)
           = log2(c_pos(t)+1) − log2(N_pos+V)
             − log2(c_neg(t)+1) + log2(N_neg+V)

    score  = Σ_t c(t)·w(t) + log2 P(pos) − log2 P(neg)

where V is the OBSERVED vocabulary size (distinct buckets seen in
training — standard multinomial-NB practice), not the hash-space
size: smoothing over all 2^16 buckets would swamp a small observed
vocabulary (measured on the synthetic 31-word corpus: every per-token
log-odds went ≈ −0.6 bits and the classifier degenerated to all-
negative; with observed-V smoothing, class-neutral words sit at ≈ 0
and the marker words carry the decision).

Exactness: every log2 is quantized independently to 1/256-bit units,
``q(x) = floor(256·log2(x))`` — the perplexity.py discipline, with
the same probabilistic (not absolute) cross-engine floor() stability
bound documented there — and from then on everything is int64: the
per-bucket weight is ``q(c_pos+1) − q(c_neg+1)`` (an unseen bucket is
exactly 0 — both classes back off to the same smoothed mass, so the
scoring join is a LEFT join with coalesce-to-zero), the per-class
normalizers multiply the doc's token count, and the smoothed
doc-count prior ``q(D_pos+1) − q(D_neg+1)`` is a 1-row constant.
Int64 sums are order-invariant; no float ever crosses an aggregation.

100 TB shape: one corpus explode → per-(doc, bucket) counts
(map-side combined, persisted — the frame feeds the model rollup AND
the scoring join, the perplexity_gate shared-scan pattern); the model
is vocab-bounded (≤ V rows — always broadcastable); the constants
frame is 1 row. Nothing all-pairs, nothing collects, no Python eval
nodes.

Hostile-data contract: NULL text is excluded at the scan (no tokens →
no score, the perplexity convention); NULL lang coalesces to the
negative class; empty-string tokens hash like any other word.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from analytics_etl_spark.operators.perplexity import VOCAB_BUCKETS, vocab_bucket


def _q(col: Column) -> Column:
    """floor(256·log2(x)) as int64 — the shared fixed-point quantizer."""
    return F.floor(F.lit(256.0) * F.log2(col.cast("double"))).cast("bigint")


def nb_classifier_scores(
    docs: DataFrame,
    ref_pred: Column,
    text_col: str = "text",
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Train the hashed-NB model on ``ref_pred`` docs vs the rest and
    score every non-NULL-text document. Returns
    (doc_id, is_ref, n_tokens, score_q, pred_ref) where ``score_q`` is
    the quantized log-odds (positive ⇒ reference-like) and
    ``pred_ref = score_q > 0``.

    Train-on-self shape (CCNet's in-corpus deployment): the expensive
    explode runs ONCE; per-doc bucket counts carry the class flag and
    feed both the count rollup and the scoring join. ``cache_handles``
    follows the perplexity_gate lifetime contract (ADVICE r9).
    """
    dc = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            "doc_id",
            F.coalesce(ref_pred, F.lit(False)).alias("is_ref"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .select("doc_id", "is_ref", vocab_bucket(F.col("w")).alias("b"))
        .groupBy("doc_id", "is_ref", "b")
        .agg(F.count("*").cast("bigint").alias("c"))
        .persist()
    )
    if cache_handles is not None:
        cache_handles.append(dc)

    cb = dc.groupBy("b").agg(
        F.coalesce(F.sum(F.when(F.col("is_ref"), F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("c_pos"),
        F.coalesce(F.sum(F.when(~F.col("is_ref"), F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("c_neg"),
    )
    model = cb.select(
        "b", (_q(F.col("c_pos") + 1) - _q(F.col("c_neg") + 1)).alias("w_q")
    )
    # observed vocabulary size: one cb row per bucket seen in training
    norm = cb.agg(
        _q(F.sum("c_pos") + F.count("*")).alias("q_npos"),
        _q(F.sum("c_neg") + F.count("*")).alias("q_nneg"),
    )
    prior = (
        dc.select("doc_id", "is_ref")
        .distinct()
        .agg(
            _q(
                F.coalesce(F.sum(F.when(F.col("is_ref"), 1)), F.lit(0)) + 1
            ).alias("q_dpos"),
            _q(
                F.coalesce(F.sum(F.when(~F.col("is_ref"), 1)), F.lit(0)) + 1
            ).alias("q_dneg"),
        )
    )
    consts = norm.crossJoin(prior)

    per_doc = (
        dc.join(model, "b", "left")
        .groupBy("doc_id", "is_ref")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.coalesce(F.col("w_q"), F.lit(0)))
            .cast("bigint")
            .alias("w_sum"),
        )
    )
    return per_doc.crossJoin(F.broadcast(consts)).select(
        "doc_id",
        "is_ref",
        "n_tokens",
        (
            F.col("w_sum")
            + F.col("n_tokens") * (F.col("q_nneg") - F.col("q_npos"))
            + (F.col("q_dpos") - F.col("q_dneg"))
        )
        .cast("bigint")
        .alias("score_q"),
    ).select(
        "doc_id",
        "is_ref",
        "n_tokens",
        "score_q",
        (F.col("score_q") > 0).alias("pred_ref"),
    )
