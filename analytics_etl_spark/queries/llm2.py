"""Round-9 LLM-pipeline additions: perplexity gating, semantic dedup,
BPE application statistics.

Same registry discipline as queries/llm.py: every md5-derived hash is
bit-identical across engines; floats appear only inside quantized
(floor-fixed-point) expressions mirrored verbatim in the oracle; all
compared columns are int64/boolean/string scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from analytics_etl_spark.operators.perplexity import (
    UNSEEN_SURPRISAL_Q,
    VOCAB_BUCKETS,
    perplexity_gate,
)
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


@query(
    "text_perplexity_gate",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    pos AS (
      SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i FROM words
    ),
    grams AS (
      SELECT doc_id, lang,
             {_BUCKET.format(x="w[i]")} AS f1,
             {_BUCKET.format(x="w[i+1]")} AS f2
      FROM pos
    ),
    dc AS (
      SELECT doc_id, f1, f2, CAST(COUNT(*) AS BIGINT) AS c
      FROM grams GROUP BY 1, 2, 3
    ),
    rc2 AS (
      SELECT f1, f2, CAST(COUNT(*) AS BIGINT) AS c2
      FROM grams WHERE lang = 'en' GROUP BY 1, 2
    ),
    rc1 AS (SELECT f1, CAST(SUM(c2) AS BIGINT) AS c1 FROM rc2 GROUP BY 1),
    model AS (
      SELECT rc2.f1, rc2.f2,
             CAST(FLOOR(256.0 * (log2(CAST(c1 + {VOCAB_BUCKETS} AS DOUBLE))
                                 - log2(CAST(c2 + 1 AS DOUBLE)))) AS BIGINT) AS s_q
      FROM rc2 JOIN rc1 USING (f1)
    ),
    backoff AS (
      SELECT f1,
             CAST(FLOOR(256.0 * log2(CAST(c1 + {VOCAB_BUCKETS} AS DOUBLE))) AS BIGINT) AS s1_q
      FROM rc1
    ),
    scored AS (
      SELECT dc.doc_id, dc.c,
             COALESCE(m.s_q, b.s1_q, {UNSEEN_SURPRISAL_Q}) AS s
      FROM dc
      LEFT JOIN model m ON m.f1 = dc.f1 AND m.f2 = dc.f2
      LEFT JOIN backoff b ON b.f1 = dc.f1
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
             CAST(SUM(c * s) AS BIGINT) AS surprisal_q
      FROM scored GROUP BY 1
    )
    SELECT doc_id, n_grams, surprisal_q,
           CAST(surprisal_q // n_grams AS BIGINT) AS ppl_q256,
           (surprisal_q // n_grams) <= {PPL_KEEP_THRESHOLD_Q256} AS keep
    FROM agg ORDER BY doc_id
    """,
)
def text_perplexity_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality gate (operators/perplexity.py): bigram LM
    with add-one smoothing trained on the English reference slice,
    every document scored by quantized mean surprisal, gated at a
    pinned threshold. Fully oracle-paired — the fixed-point surprisal
    quantization makes the geometric-mean statistic hash-exact."""
    docs = t(spark, sf_dir, "documents")
    return perplexity_gate(
        docs,
        ref_pred=F.col("lang") == "en",
        threshold_q256=PPL_KEEP_THRESHOLD_Q256,
    ).orderBy("doc_id")


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
