"""LLM training-data pipeline queries: dedup, similarity, text analysis.

Every hash used in dedup is md5 (identical in Spark and DuckDB), so
even MinHash-LSH is oracle-checked end-to-end — candidate generation,
banding, and exact-Jaccard verification all hash-match across engines.
SimHash is registered rows-only (bit-vote arithmetic is not worth
restating in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from analytics_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_dedup,
    simhash_signatures,
    word_shingles,
)
from analytics_etl_spark.operators.multimodal import binary_meta, synthesize_media
from analytics_etl_spark.operators.similarity import (
    bucketed_cosine_topk_join,
    cosine_topk_join,
    finite_vector,
    hyperplane_lsh_topk,
    multiprobe_cosine_topk,
    rademacher_planes,
    valid_embeddings,
)
from analytics_etl_spark.operators.text_analysis import (
    chunk_documents,
    langid_guess,
    quality_features,
    token_count,
    winnowing_fingerprints,
    word_count,
)
from analytics_etl_spark.queries.registry import query, t

# Shared DuckDB CTE: distinct word 3-gram shingles per document
# (mirrors operators.dedup.word_shingles with n=3).
_TOK3_SQL = """
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      FROM words
    )
"""


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint, MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return exact_dedup(docs).select("fingerprint", "kept_doc_id", "n_copies")


# Canonical-form exact dedup: hash AFTER case/punct/whitespace
# normalization — catches the re-rendered-same-article class raw-byte
# hashing misses, still a 32-byte-key groupBy. DuckDB's regexp_replace
# needs the explicit 'g' flag (Spark replaces all matches by default) —
# dialect trap pinned by this oracle pair.
@query(
    "dedup_exact_canonical",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fingerprint,
           MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.functions.text import canonicalize_text

    docs = t(spark, sf_dir, "documents").withColumn(
        "canon", canonicalize_text("text")
    )
    return exact_dedup(docs, text_col="canon").select(
        "fingerprint", "kept_doc_id", "n_copies"
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_TOK3_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT p.doc_a, p.doc_b,
             CAST(p.common AS DOUBLE) / (sa.sz + sb.sz - p.common) AS jaccard
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
    ) WHERE jaccard >= 0.1
    """,
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    shingled = word_shingles(docs, n=3, distinct=True)
    return jaccard_pairs(shingled, min_jaccard=0.1)


def _minhash_params_sql(num_hashes: int = 12) -> str:
    """(seed, a, b) VALUES rows mirroring minhash_affine_params."""
    from analytics_etl_spark.operators.dedup import minhash_affine_params

    rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(minhash_affine_params(num_hashes))
    )
    return f"params(seed, a, b) AS (VALUES {rows})"


_LSH_CTES = f"""{_TOK3_SQL},
    {_minhash_params_sql(12)},
    base AS (
      SELECT doc_id,
             (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) AS hb
      FROM tok
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
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    common AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS common
      FROM tok x JOIN tok y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      JOIN cand c ON c.doc_a = x.doc_id AND c.doc_b = y.doc_id
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             CAST(cm.common AS DOUBLE) / (sa.sz + sb.sz - cm.common) AS jaccard
      FROM cand c
      JOIN common cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
    )"""


@query(
    "dedup_minhash_lsh",
    oracle=f"WITH {_LSH_CTES} SELECT doc_a, doc_b, jaccard FROM verified",
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return minhash_lsh_dedup(docs, num_hashes=12, rows_per_band=3, shingle_n=3)


@query(
    "dedup_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE {_LSH_CTES},
    pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, u FROM edges
      UNION SELECT u, v FROM edges
      UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u
    """,
)
def dedup_cluster_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → CLUSTERS → canonical survivor per doc.

    The last mile of dedup: a chain a~b~c must keep one canonical doc
    (min id of the connected component), not drop both ends of each
    pair independently. Spark side: iterative min-label propagation
    (operators/graph.py, O(diameter) joins); oracle side: the same
    fixpoint as a recursive transitive closure — an honest cross-check
    of an iterative DataFrame algorithm against declarative SQL.
    """
    from analytics_etl_spark.operators.graph import connected_components

    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(
        docs, num_hashes=12, rows_per_band=3, shingle_n=3, min_jaccard=0.5
    )
    return connected_components(pairs)


# SimHash — oracle-paired as of round 6 (VERDICT r5 item 6): the
# declared blocker ("int64 bit ops differ in DuckDB") dissolves for
# THIS signature because every hash is a NON-NEGATIVE 60-bit integer
# (first 15 hex chars of md5), so `>>` and `&` agree between engines —
# two's-complement asymmetry only bites on negative inputs. The
# oracle's 32 per-bit vote columns are generated programmatically
# below; the vote sums land in BIGINT range (docs are ~1e2 shingles),
# and the final signature is an exact integer sum of 2^i terms.
_SIMHASH_VOTE_SQL = ",\n             ".join(
    f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE 0 END) AS o{i}"
    for i in range(32)
)
_SIMHASH_SIG_SQL = "\n             + ".join(
    f"(CASE WHEN o{i} * 2 > n THEN {2**i} ELSE 0 END)" for i in range(32)
)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1])) AS shingle
      FROM words
    ),
    hs AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM tok
    ),
    votes AS (
      SELECT doc_id, COUNT(*) AS n,
             {_SIMHASH_VOTE_SQL}
      FROM hs GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({_SIMHASH_SIG_SQL} AS BIGINT) AS simhash
    FROM votes
    """,
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return simhash_signatures(docs, bits=32, shingle_n=2)


def _query_frame(emb: DataFrame, vec_id: int = 0) -> DataFrame:
    """1-row query-vector frame — stays IN the plan (no driver .first())."""
    return emb.filter(F.col("vec_id") == vec_id).select(F.col("embedding").alias("qv"))


# --- embedding validity contract (r8, hostile-embeddings sweep) ---
#
# Every similarity/ANN query gates its corpus side to SCORABLE vectors
# before any scoring: non-NULL, exactly _EMB_DIM components, every
# component finite (non-NULL, non-NaN, non-±Inf), L2 norm > 0. A real
# crawl-derived table contains all of those failure shapes, and each
# one crashes or diverges some engine path if left in (ANSI element_at
# raise, ragged numpy batch, DuckDB list_dot_product NULL-element
# error, NaN ordering skew, ANSI float-cast aborts in the int8 path).
# The SQL gate lives in a CTE-level WHERE so DuckDB structurally
# filters the rows BEFORE any scoring expression can touch them
# (conjunction order inside one WHERE is not guaranteed; a CTE
# boundary with pushdown-to-scan is). The Spark gate is
# similarity.scorable_vector — all non-raising expressions, so
# Catalyst predicate reordering is safe. No-op on clean data.

_EMB_DIM = 64


def _finite_sql(col: str) -> str:
    """DuckDB: vector non-NULL with every component non-NULL+finite."""
    return (
        f"({col} IS NOT NULL AND len(list_filter({col}, "
        f"x -> x IS NOT NULL AND isfinite(x))) = len({col}))"
    )


def _scorable_sql(col: str, dim: int = _EMB_DIM) -> str:
    """DuckDB mirror of similarity.scorable_vector. The norm check is
    CASE-wrapped behind the finite check: DuckDB's list_dot_product
    ERRORS on NULL elements, so it must be unreachable for them."""
    return (
        f"({_finite_sql(col)} AND len({col}) = {dim} AND "
        f"CASE WHEN {_finite_sql(col)} THEN "
        f"list_dot_product({col}::DOUBLE[], {col}::DOUBLE[]) > 0 "
        f"ELSE FALSE END)"
    )


# gated-CTE corpus side shared by the top-k similarity oracles
_EMB_SCORABLE_CTE = (
    "e AS (SELECT vec_id, embedding FROM embeddings WHERE "
    + _scorable_sql("embedding")
    + ")"
)

# Zero-norm-guarded cosine (CASE mirror of similarity.cosine): pure
# defense in depth after the scorable gate — post-gate both norms are
# positive, so the guard never changes a value on gated rows.
_COS_SQL = """
    CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
              * list_dot_product(q.qv, q.qv) > 0
         THEN list_dot_product(e.embedding::DOUBLE[], q.qv)
              / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                     * list_dot_product(q.qv, q.qv))
    END
"""


@query(
    "similarity_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    {_EMB_SCORABLE_CTE}
    SELECT e.vec_id, {_COS_SQL} AS score
    FROM e, q
    WHERE e.vec_id <> 0
    ORDER BY score DESC, e.vec_id
    LIMIT 10
    """,
)
def similarity_topk_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    return cosine_topk_join(emb, _query_frame(emb, 0), k=10, exclude_ids=(0,))


def _bucket_sql(col: str, bits: int = 8) -> str:
    terms = [
        f"(CASE WHEN {col}[{i + 1}] > 0 THEN {2**i} ELSE 0 END)" for i in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"


@query(
    "similarity_ann_bucketed",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv, {_bucket_sql("embedding")} AS qb
               FROM embeddings WHERE vec_id = 0),
    {_EMB_SCORABLE_CTE}
    SELECT e.vec_id, {_COS_SQL} AS score
    FROM e, q
    WHERE e.vec_id <> 0 AND {_bucket_sql("e.embedding")} = q.qb
    ORDER BY score DESC, e.vec_id
    LIMIT 5
    """,
)
def similarity_ann_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    return bucketed_cosine_topk_join(
        emb, _query_frame(emb, 0), k=5, bits=8, exclude_ids=(0,)
    )


def _multiprobe_sql(bits: int = 8, n_probes: int = 4) -> str:
    """DuckDB probe-set expression mirroring multiprobe_bucket_set:
    sort dims by |qv[i]| (tie-break on i), flip the lowest-margin bits."""
    margins = ", ".join(
        f"{{'m': abs(qv[{i + 1}]), 'i': {i}}}" for i in range(bits)
    )
    probes = ["qb"] + [
        f"CAST(xor(qb, (1 << ms[{j + 1}].i)) AS INT)" for j in range(n_probes - 1)
    ]
    return (
        f"SELECT qv, qb, [{', '.join(probes)}] AS probes "
        f"FROM (SELECT qv, qb, list_sort([{margins}]) AS ms FROM q)"
    )


@query(
    "similarity_ann_multiprobe",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv, {_bucket_sql("embedding")} AS qb
               FROM embeddings WHERE vec_id = 0),
    p AS ({_multiprobe_sql(8, 4)}),
    {_EMB_SCORABLE_CTE}
    SELECT e.vec_id, {_COS_SQL.replace("q.qv", "p.qv")} AS score
    FROM e, p
    WHERE e.vec_id <> 0 AND list_contains(p.probes, {_bucket_sql("e.embedding")})
    ORDER BY score DESC, e.vec_id
    LIMIT 10
    """,
)
def similarity_ann_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: probe the query bucket + 3 lowest-margin
    neighbor buckets at 4/2^8 of the brute-force scan cost. Lifts
    recall over single-probe, but on near-uniform vectors (this
    test data: top-10 neighbors at cosine ≈0.3) both are low —
    measured in tests/test_ann_recall.py; the multi-table hyperplane
    query below is the recall path."""
    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    return multiprobe_cosine_topk(
        emb, _query_frame(emb, 0), k=10, bits=8, n_probes=4, exclude_ids=(0,)
    )


_HP_BITS, _HP_TABLES, _HP_DIM = 6, 24, 64
_HP_PLANES = rademacher_planes(_HP_DIM, _HP_BITS, _HP_TABLES, seed=7)


def _hyperplane_oracle(bits: int, tables: int, planes) -> str:
    """DuckDB mirror of hyperplane_lsh_topk: the SAME ±1 planes are
    embedded as one literal list-of-lists (md5-derived, so both
    engines could equally regenerate them), bucket bit = sign of
    list_dot_product — bit-identical to Spark's F.aggregate fold."""
    flat = [p for tp in planes for p in tp]
    pl = "[" + ",".join(
        "[" + ",".join("1.0" if x > 0 else "-1.0" for x in p) + "]" for p in flat
    ) + "]"
    tables_match = " OR ".join(
        "("
        + " AND ".join(
            f"((list_dot_product(ev, pl[{t * bits + i + 1}]) > 0) = "
            f"(list_dot_product(qv, pl[{t * bits + i + 1}]) > 0))"
            for i in range(bits)
        )
        + ")"
        for t in range(tables)
    )
    return f"""
    WITH p AS (SELECT {pl} AS pl),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    {_EMB_SCORABLE_CTE},
    b AS (SELECT e.vec_id AS vec_id, e.embedding::DOUBLE[] AS ev, qv, pl
          FROM e, q, p WHERE e.vec_id <> 0)
    SELECT vec_id,
           CASE WHEN list_dot_product(ev, ev) * list_dot_product(qv, qv) > 0
                THEN list_dot_product(ev, qv)
                  / sqrt(list_dot_product(ev, ev) * list_dot_product(qv, qv))
           END AS score
    FROM b WHERE {tables_match}
    ORDER BY score DESC, vec_id
    LIMIT 10
    """


@query("similarity_ann_hyperplane", oracle=_hyperplane_oracle(_HP_BITS, _HP_TABLES, _HP_PLANES))
def similarity_ann_hyperplane_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table random-hyperplane LSH ANN (24 tables × 6 bits,
    OR-amplified): the recall knob single-probe bucketing lacks.
    Measured at sf0.01: recall@10 ≈ 0.72 scanning ≈ 1/3 of the table
    (tests/test_ann_recall.py) — on data whose true top-10 sits at
    cosine ≈0.3, where any LSH needs amplification to hit recall."""
    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    return hyperplane_lsh_topk(
        emb,
        _query_frame(emb, 0),
        dim=_HP_DIM,
        k=10,
        bits=_HP_BITS,
        tables=_HP_TABLES,
        exclude_ids=(0,),
        planes=_HP_PLANES,
    )


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_words,
           CAST(length(text) AS INT) AS n_chars_calc
    FROM documents
    """,
)
def text_token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("int").alias("n_tokens"),
        word_count("text").cast("int").alias("n_words"),
        F.length("text").cast("int").alias("n_chars_calc"),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars_text,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CASE WHEN length(text) > 0 THEN
             CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text)
           END AS alpha_ratio,
           CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of'))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stop_ratio,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len,
           CASE WHEN length(text) > 0 THEN
             (CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text)) * 0.7
               + (CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of'))) AS DOUBLE)
                  / len(string_split(text, ' '))) * 0.3
           END AS quality_score
    FROM documents
    """,
)
def text_quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    out = quality_features(docs)
    return out.select(
        "doc_id",
        F.col("n_chars_text").cast("int").alias("n_chars_text"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "alpha_ratio",
        "stop_ratio",
        "avg_token_len",
        "quality_score",
    )


@query(
    "text_langid",
    oracle="""
    WITH h AS (
      SELECT doc_id,
        len(list_filter(string_split(text,' '), w -> w IN ('der','die','und'))) AS hits_de,
        len(list_filter(string_split(text,' '), w -> w IN ('the','a','of')))    AS hits_en,
        len(list_filter(string_split(text,' '), w -> w IN ('el','la','de')))    AS hits_es,
        len(list_filter(string_split(text,' '), w -> w IN ('le','la','et')))    AS hits_fr
      FROM documents
    )
    SELECT doc_id,
           CAST(hits_de AS INT) AS hits_de, CAST(hits_en AS INT) AS hits_en,
           CAST(hits_es AS INT) AS hits_es, CAST(hits_fr AS INT) AS hits_fr,
           CASE
             WHEN hits_de > 0 AND hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
             WHEN hits_en > 0 AND hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
             WHEN hits_es > 0 AND hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
             WHEN hits_fr > 0 AND hits_fr = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'fr'
             ELSE 'unknown'
           END AS lang_guess
    FROM h
    """,
)
def text_langid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    out = langid_guess(docs)
    return out.select(
        "doc_id",
        *[F.col(f"hits_{lang}").cast("int").alias(f"hits_{lang}") for lang in ("de", "en", "es", "fr")],
        "lang_guess",
    )


@query(
    "doc_fingerprint_winnow",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 2),
               i -> struct_pack(pos := i,
                    h := md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3])))) AS s
      FROM words
    ),
    wm AS (
      SELECT doc_id,
             MIN(s.h) OVER (PARTITION BY doc_id ORDER BY s.pos
                            ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
      FROM sh
    )
    SELECT doc_id, COUNT(DISTINCT fp) AS n_fingerprints, MIN(fp) AS min_fp
    FROM wm GROUP BY doc_id
    """,
)
def doc_fingerprint_winnow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, shingle_n=4, window=5)


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def multimodal_binary_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return binary_meta(synthesize_media(docs))


@query(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS INT) AS dims,
           CASE WHEN {_finite_sql("embedding")}
                THEN sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           END AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table diagnostic — keeps EVERY row (it is how junk vectors
    get FOUND), so the validity contract applies per column, not as a
    row filter: dims reports the actual length (NULL for a NULL
    vector), l2_norm is NULL unless the vector is finite (a zero
    vector still reports norm 0.0 — well-defined)."""
    from analytics_etl_spark.operators.similarity import as_double_array, dot

    emb = t(spark, sf_dir, "embeddings")
    e = as_double_array("embedding")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dims"),
        F.when(finite_vector("embedding"), F.sqrt(dot(e, e))).alias("l2_norm"),
    )


@query(
    "embedding_centroids",
    oracle="""
    WITH comp AS (
      SELECT label, u.pos AS pos, u.v AS v
      FROM (
        SELECT label,
               unnest(list_transform(range(1, len(embedding) + 1),
                      i -> struct_pack(pos := i, v := embedding[i]::DOUBLE))) AS u
        FROM embeddings
      )
      WHERE u.v IS NOT NULL AND isfinite(u.v)
    )
    SELECT label, CAST(pos AS INT) AS pos,
           list_reduce(list(v ORDER BY v), (a, b) -> a + b) / COUNT(*) AS centroid_component
    FROM comp
    GROUP BY label, pos
    """,
)
def embedding_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components. The float fold runs in SORTED
    value order on both engines — deterministic under any partitioning
    (the scalable alternative to a partition-order-dependent SUM).
    NULL/NaN/±Inf COMPONENTS are excluded per component (one junk
    component would otherwise poison its whole (label, pos) centroid
    to NaN, and Spark's collect_list silently drops NULLs while
    DuckDB's list() keeps them — a count-vs-fold divergence the
    hostile sweep exposed); a zero vector's 0.0s still contribute."""
    emb = t(spark, sf_dir, "embeddings")
    comp = (
        emb.select(
            "label",
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("p0", "v"),
        )
        .select("label", (F.col("p0") + 1).cast("int").alias("pos"), "v")
        .filter(
            F.col("v").isNotNull()
            & ~F.isnan("v")
            & (F.abs("v") != F.lit(float("inf")))
        )
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list("v")), F.lit(0.0), lambda acc, x: acc + x
    )
    return comp.groupBy("label", "pos").agg(
        (folded / F.count("*")).alias("centroid_component")
    )


@query(
    "top_similar_pairs",
    oracle=f"""
    WITH sub AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
                 WHERE vec_id < 200 AND {_scorable_sql("embedding")})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CASE WHEN list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e) > 0
                THEN list_dot_product(a.e, b.e)
                  / sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e))
           END AS score
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    ORDER BY score DESC, vec_a, vec_b
    LIMIT 20
    """,
)
def top_similar_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine on a bounded subset (the exact kernel that LSH
    candidates feed at scale), top-20."""
    from analytics_etl_spark.operators.similarity import cosine_pre, dot

    emb = valid_embeddings(
        t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200), dim=_EMB_DIM
    )
    # unrolled pair scoring with per-ROW norm² (similarity.cosine_pre):
    # the all-pairs join is the superlinear hot loop; norm² per side
    # is computed once per row, the per-pair expression is one
    # unrolled dot + guard — bit-identical scores
    emb = emb.withColumn("n2", dot("embedding", "embedding", _EMB_DIM))
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("n2").alias("na2"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("n2").alias("nb2"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            cosine_pre("ea", "eb", "na2", "nb2", _EMB_DIM).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(20)
    )


@query(
    "docs_stats_by_lang",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM documents GROUP BY lang, source
    """,
)
def docs_stats_by_lang_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_bucket_sql("embedding")} AS bucket
               FROM embeddings WHERE {_scorable_sql("embedding")})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_dot_product(a.v, b.v)
             / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) AS score
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
            / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) >= 0.3
    """,
)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: sign-bucket LSH candidates → exact
    cosine ≥ 0.3. The same candidate-then-verify shape as MinHash-LSH,
    over vectors: candidate pairs only ever form within a bucket
    (1/2^bits of the all-pairs space). Corpus gated to scorable
    vectors (the per-table gate pushes to the scans, so the join and
    its cosine only ever see valid rows — in both engines)."""
    from analytics_etl_spark.operators.similarity import cosine_pre, dot, sign_bucket

    # cosine_pre form (r16): norm² once per ROW before the bucket
    # join, so the per-pair expression — which Catalyst pushes into
    # the join CONDITION via the score filter — is ONE unrolled dot +
    # guard. The inline 3-chain cosine in that position exceeded the
    # JVM method-size JIT limit and ran the join stage interpreted
    # (measured: 0.94 s → 2.09 s; cosine_pre restores codegen). Scores
    # bit-identical (cosine_pre contract, similarity.py).
    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM).select(
        "vec_id",
        F.col("embedding").alias("v"),
        sign_bucket("embedding", 8).alias("bucket"),
        dot("embedding", "embedding", _EMB_DIM).alias("n2"),
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("n2").alias("na2"), "bucket",
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("n2").alias("nb2"), "bucket",
    )
    score = cosine_pre("va", "vb", "na2", "nb2", _EMB_DIM)
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", score.alias("score"))
        .filter(F.col("score") >= 0.3)
    )


@query(
    "text_repetition_metrics",
    oracle="""
    WITH w2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
      FROM w2
    ),
    pg AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_ngrams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_ngram_frac,
           CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_ngram_frac
    FROM pg GROUP BY doc_id
    """,
)
def text_repetition_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (dup/top 2-gram
    fractions) — the standard low-quality-document detectors for
    pretraining corpora."""
    from analytics_etl_spark.operators.text_analysis import repetition_metrics

    return repetition_metrics(t(spark, sf_dir, "documents"), n=2)


# Synthetic PII is injected deterministically (the corpus itself is
# clean words): every 2nd doc gets an email, every 3rd a phone — so
# the redaction operator and its oracle see real matches.
_PII_AUG_SQL = """
    text
      || CASE WHEN doc_id % 2 = 0
              THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      || CASE WHEN doc_id % 3 = 0
              THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
"""


@query(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+@[a-z]+\\.[a-z]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\\+1-555-[0-9]{{4}}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '[a-z0-9]+@[a-z]+\\.[a-z]+', '[EMAIL]', 'g'),
                              '\\+1-555-[0-9]{{4}}', '[PHONE]', 'g')) AS redacted_fp
    FROM aug
    """,
)
def text_pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count + redact emails/phones, fingerprint the
    redacted text (md5 travels through the hash gate without hauling
    documents)."""
    from analytics_etl_spark.operators.text_analysis import redact_pii

    docs = t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return redact_pii(docs.withColumn("text", aug))


@query(
    "docs_stratified_sample",
    oracle="""
    SELECT doc_id, lang, bucket FROM (
      SELECT doc_id, lang,
             CAST((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000) AS INT) AS bucket
      FROM documents
    )
    WHERE bucket < CASE lang
        WHEN 'en' THEN 5000 WHEN 'de' THEN 2500 WHEN 'es' THEN 2500
        WHEN 'fr' THEN 2500 WHEN 'zh' THEN 1000 ELSE 0 END
    """,
)
def docs_stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: the training-mix primitive
    ("50% en, 25% de/es/fr, 10% zh"). Hash-threshold on md5(doc_id),
    so the subset is a pure function of the data — identical on any
    partitioning/cluster size, reproducible across backfills (unlike
    df.sample, whose kept set changes with partition layout)."""
    from analytics_etl_spark.operators.sampling import hash_bucket, stratified_sample

    docs = t(spark, sf_dir, "documents")
    rates = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.25, "zh": 0.10}
    return stratified_sample(docs, rates).select(
        "doc_id", "lang", hash_bucket("doc_id").alias("bucket")
    )


@query(
    "similarity_ann_ivf",
    rows_only="k-means centroids are float MEANS — not bit-stable across engines; "
    "recall measured vs brute force in tests/test_ann_recall.py instead",
)
def similarity_ann_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means coarse quantizer (trained in 3 deterministic
    Lloyd iterations) + 4-of-16 probed cells → exact cosine top-10.
    The FAISS-IVF shape on Spark: train once at index time, probe at
    query time; with `cell` as a partition column the probe filter is
    partition pruning."""
    from analytics_etl_spark.operators.ivf import ivf_topk, kmeans_centroids

    # gate BEFORE training: one NaN component would poison every
    # centroid mean it touches (same scorable-vector contract as the
    # rest of the family)
    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    # training scan bounded to half the corpus (deterministic
    # md5-threshold sample; see kmeans_centroids) — the index-build
    # budget knob that matters at 100 TB
    cents = kmeans_centroids(emb, k=16, iters=3, sample_fraction=0.5)
    return ivf_topk(emb, _query_frame(emb, 0), cents, k=10, n_probe=4, exclude_ids=(0,))


@query(
    "benchmark_contamination",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      FROM words
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 25),
    corpus AS (SELECT doc_id, g FROM grams WHERE doc_id >= 25),
    sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS n_contaminated
      FROM corpus c JOIN bench b ON c.g = b.g
      GROUP BY c.doc_id
    )
    SELECT h.doc_id,
           s.n_grams,
           h.n_contaminated,
           CAST(h.n_contaminated AS DOUBLE) / s.n_grams AS contamination_frac
    FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
    """,
)
def benchmark_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: per corpus doc, the fraction
    of its 3-grams appearing in the eval set's n-gram bank (docs 0-24
    stand in for the benchmark). The bank join is SIZE-GATED inside
    the operator: broadcast only when the bank is verifiably small
    (counted once at plan-build), shuffle join otherwise — see
    ngram_contamination for the contract."""
    from analytics_etl_spark.operators.text_analysis import ngram_contamination

    docs = t(spark, sf_dir, "documents")
    grams = word_shingles(docs, n=3, distinct=True)
    bench = grams.filter(F.col("doc_id") < 25)
    corpus = grams.filter(F.col("doc_id") >= 25)
    return ngram_contamination(corpus, bench)


@query(
    "corpus_filter_pipeline",
    oracle="""
    WITH w2 AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
      FROM w2
    ),
    pg AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
    m AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_ngrams,
             1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_frac,
             CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
      FROM pg GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN m.doc_id IS NULL OR m.n_ngrams < 20 THEN 'too_short'
                WHEN m.dup_frac > 0.05 THEN 'repetitive'
                WHEN m.top_frac > 0.06 THEN 'degenerate_loop'
                ELSE 'keep' END AS decision
    FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
    """,
)
def corpus_filter_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed quality gate a pretraining pipeline runs per doc:
    length + repetition signals → keep, or the FIRST failing rule as
    the reject reason (the documents analogue of the sales quarantine
    split — every drop is attributable)."""
    from analytics_etl_spark.operators.text_analysis import repetition_metrics

    docs = t(spark, sf_dir, "documents")
    m = repetition_metrics(docs, n=2)
    # LEFT join: a doc too short to produce ANY n-gram has no metrics
    # row, and the contract is that every doc gets a decision — an
    # inner join would silently drop exactly the docs most worth
    # rejecting (the n_ngrams IS NULL arm labels them too_short)
    decision = (
        F.when(F.col("n_ngrams").isNull() | (F.col("n_ngrams") < 20), F.lit("too_short"))
        .when(F.col("dup_ngram_frac") > 0.05, F.lit("repetitive"))
        .when(F.col("top_ngram_frac") > 0.06, F.lit("degenerate_loop"))
        .otherwise(F.lit("keep"))
    )
    return docs.join(m, "doc_id", "left").select("doc_id", decision.alias("decision"))


@query(
    "docs_balanced_topn",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 40
    """,
)
def docs_balanced_topn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count balanced subset: N docs per language, chosen by
    hash rank — the complement of rate-based stratified sampling when
    the mix spec is absolute counts ("exactly 40 per language").
    Deterministic (md5 rank, id tie-break), one window shuffle on the
    stratum key; skewed strata cost nothing extra because only rank
    <= N survives the window."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        docs.withColumn("rk", rk)
        .filter(F.col("rk") <= 40)
        .select("doc_id", "lang")
    )


@query(
    "docs_chunked_overlap",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents
           -- NULL text yields zero chunks in the kernel; without this
           -- filter DuckDB's NULL-ignoring greatest() would emit one
           WHERE text IS NOT NULL),
    c AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(greatest(len(words) - 10, 1) / 40.0) AS BIGINT)),
               i -> struct_pack(
                 chunk_id := i,
                 chunk_text := array_to_string(words[i*40 + 1 : i*40 + 50], ' ')
               ))) AS ch
      FROM w
    )
    SELECT doc_id,
           CAST(ch.chunk_id AS INT) AS chunk_id,
           ch.chunk_text,
           CAST(len(string_split(ch.chunk_text, ' ')) AS INT) AS n_words
    FROM c
    """,
)
def docs_chunked_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 50-word chunks, 10-word overlap
    (stride 40). The number of chunks per doc is
    ceil(max(n_words-overlap, 1)/stride); the oracle reproduces the
    same slicing with DuckDB list ranges (1-based, end-inclusive)."""
    return chunk_documents(
        t(spark, sf_dir, "documents"), chunk_words=50, overlap=10
    )


@query(
    "token_budget_packing",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents
           -- NULL text yields zero chunks in the kernel; without this
           -- filter DuckDB's NULL-ignoring greatest() would emit one
           WHERE text IS NOT NULL),
    c AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(greatest(len(words) - 10, 1) / 40.0) AS BIGINT)),
               i -> struct_pack(
                 chunk_id := i,
                 nw := len(words[i*40 + 1 : i*40 + 50])
               ))) AS ch
      FROM w
    ),
    chunks AS (
      SELECT d.lang, c.doc_id, CAST(c.ch.chunk_id AS INT) AS chunk_id,
             CAST(c.ch.nw AS INT) AS n_words
      FROM c JOIN documents d ON d.doc_id = c.doc_id
    ),
    binned AS (
      SELECT lang,
             CAST((SUM(n_words) OVER (
                     PARTITION BY lang ORDER BY doc_id, chunk_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_words) // 500 AS BIGINT) AS bin,
             n_words
      FROM chunks
    )
    SELECT lang, bin,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM binned GROUP BY 1, 2
    """,
)
def token_budget_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack chunks into ~500-word training examples per language:
    bin = floor(running-word-total-before-this-chunk / 500) over the
    deterministic (doc, chunk) order. Running-total binning is the
    DISTRIBUTED approximation of greedy packing — a bin can overrun by
    at most one chunk (never splits a chunk), which is the standard
    trade for making packing a window function instead of a sequential
    pass. One window shuffle on the stratum key."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_words=50, overlap=10).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = chunks.select(
        "lang",
        "n_words",
        F.floor((F.sum("n_words").over(w) - F.col("n_words")) / 500)
        .cast("bigint")
        .alias("bin"),
    )
    return binned.groupBy("lang", "bin").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )


@query(
    "packed_examples",
    oracle="""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents
           WHERE text IS NOT NULL),
    c AS (
      SELECT doc_id, lang,
             unnest(list_transform(
               range(0, CAST(ceil(greatest(len(words) - 10, 1) / 40.0) AS BIGINT)),
               i -> struct_pack(
                 chunk_id := i,
                 chunk_text := array_to_string(words[i*40 + 1 : i*40 + 50], ' ')
               ))) AS ch
      FROM w
    ),
    chunks AS (
      SELECT lang, doc_id, CAST(ch.chunk_id AS BIGINT) AS chunk_id, ch.chunk_text,
             len(string_split(ch.chunk_text, ' ')) AS n_words
      FROM c
    ),
    binned AS (
      SELECT lang, doc_id, chunk_id, chunk_text, n_words,
             CAST((SUM(n_words) OVER (
                     PARTITION BY lang ORDER BY doc_id, chunk_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_words) // 500 AS BIGINT) AS example_id
      FROM binned_src
    )
    SELECT lang, example_id,
           string_agg(chunk_text, chr(31) ORDER BY doc_id, chunk_id) AS texts,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM binned GROUP BY 1, 2
    """.replace("binned_src", "chunks"),
)
def packed_examples_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed training-example MATERIALIZATION: the token_budget_packing
    bins, but emitting the actual example records — ordered chunk texts
    per ~500-word bin per language — the rows a training loader
    consumes. Deterministic end to end (total (doc, chunk) order fixes
    both bin assignment and within-example order). The ordered texts
    payload keeps its FULL correctness content but ships as ONE string
    joined on chr(31) (unit separator — cannot appear in the
    space-joined word chunks): the r6 driver lesson is that top-level
    array columns crash the harness' pandas canonicalizer, so window
    queries must project to scalars. Training loaders that want the
    array use pack_training_examples directly."""
    from analytics_etl_spark.operators.text_analysis import pack_training_examples

    docs = t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_words=50, overlap=10, keep_cols=("lang",))
    packed = pack_training_examples(chunks, budget_words=500, stratum_col="lang")
    return packed.withColumn("texts", F.array_join("texts", "\x1f"))


@query(
    "packed_examples_exact",
    # Greedy first-fit packing is sequential (bin of chunk i depends on
    # every earlier assignment), so it was rows-only through r9. The
    # oracle below IS the recursive CTE that sequentiality demands —
    # but recursing over pack BOUNDARIES, not chunks: the anchor seeds
    # one start per stratum, each iteration finds every stratum's next
    # boundary (the first chunk whose running total would overflow the
    # open bin) via one scan of the MATERIALIZED cumsum table, and a
    # row's bin is the last start at or before it. Iterations =
    # max packs per stratum (~130 at sf0.1, 3.6 s), not chunk count.
    oracle="""
    WITH RECURSIVE w AS (SELECT doc_id, lang, string_split(text, ' ') AS words
           FROM documents WHERE text IS NOT NULL),
    c AS (
      SELECT doc_id, lang,
             unnest(list_transform(
               range(0, CAST(ceil(greatest(len(words) - 10, 1) / 40.0) AS BIGINT)),
               i -> struct_pack(
                 chunk_id := i,
                 chunk_text := array_to_string(words[i*40 + 1 : i*40 + 50], ' ')
               ))) AS ch
      FROM w
    ),
    chunks AS (
      SELECT lang, doc_id, CAST(ch.chunk_id AS BIGINT) AS chunk_id,
             len(string_split(ch.chunk_text, ' ')) AS n_words
      FROM c
    ),
    -- MATERIALIZED: the recursive step references seq each iteration;
    -- inlined, DuckDB would re-run the whole chunking chain per pack
    -- (measured 19 s -> 3.6 s at sf0.1)
    seq AS MATERIALIZED (
      SELECT lang, n_words,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id, chunk_id) AS rn,
             SUM(n_words) OVER (PARTITION BY lang ORDER BY doc_id, chunk_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM chunks
    ),
    starts AS (
      SELECT lang, CAST(1 AS BIGINT) AS s, CAST(0 AS BIGINT) AS base,
             CAST(0 AS BIGINT) AS example_id
      FROM (SELECT DISTINCT lang FROM seq)
      UNION ALL
      SELECT nxt.lang, nxt.rn, CAST(nxt.cum - nxt.n_words AS BIGINT),
             st.example_id + 1
      FROM starts st
      JOIN seq nxt ON nxt.lang IS NOT DISTINCT FROM st.lang
       AND nxt.rn = (SELECT MIN(s2.rn) FROM seq s2
                     WHERE s2.lang IS NOT DISTINCT FROM st.lang AND s2.rn > st.s
                       AND s2.cum - st.base > 500)
    ),
    assign AS (
      SELECT q.lang, q.rn, q.n_words,
             (SELECT MAX(st.example_id) FROM starts st
              WHERE st.lang IS NOT DISTINCT FROM q.lang AND st.s <= q.rn) AS example_id
      FROM seq q
    )
    SELECT lang, example_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM assign GROUP BY 1, 2
    """,
)
def packed_examples_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT greedy packing (applyInPandas per language): bins never
    overrun the 500-word budget — the ground truth the window-based
    packed_examples approximates (its bins may overrun by one chunk).
    The one legitimate batch applyInPandas in the engine: sequential
    state per stratum, metadata-only rows through the Python
    boundary."""
    from analytics_etl_spark.operators.text_analysis import pack_training_examples_exact

    docs = t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_words=50, overlap=10, keep_cols=("lang",))
    return pack_training_examples_exact(chunks, budget_words=500, stratum_col="lang")


@query(
    "multimodal_frame_index",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(n_chars * 10 AS BIGINT) AS duration_ms
      FROM documents WHERE doc_id % 3 = 2
    ),
    f AS (
      SELECT media_id, n_bytes, duration_ms,
             unnest(range(0, greatest(least(n_bytes // 64, 4), 1))) AS frame_idx
      FROM v
    )
    SELECT media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * 64 AS BIGINT) AS byte_start,
           CAST(duration_ms * (frame_idx * 64) // n_bytes AS BIGINT) AS ts_ms
    FROM f
    """,
)
def multimodal_frame_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-sampling PLAN from metadata alone: per video, the
    sampled frame positions (byte offset + interpolated timestamp)
    as pure integer JVM expressions — demonstrating that the 1→N
    sampling decision never needs the Python boundary; only the
    payload slicing does (operators/multimodal.sample_frames). At
    100 TB this is the pushdown that matters: the planner touches
    metadata columns, the decoder touches exactly the chosen
    byte ranges."""
    media = synthesize_media(t(spark, sf_dir, "documents")).filter(
        F.col("kind") == "video"
    )
    n_bytes = F.length("payload").cast("bigint")
    n_frames = F.greatest(
        F.least(F.floor(n_bytes / 64).cast("bigint"), F.lit(4)), F.lit(1)
    )
    f = media.select(
        "media_id",
        n_bytes.alias("n_bytes"),
        F.col("meta.duration_ms").cast("bigint").alias("duration_ms"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_frames - 1)).alias("frame_idx"),
    )
    return f.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * 64).cast("bigint").alias("byte_start"),
        F.floor(F.col("duration_ms") * (F.col("frame_idx") * 64) / F.col("n_bytes"))
        .cast("bigint")
        .alias("ts_ms"),
    )


@query(
    "corpus_frequency_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE text IS NOT NULL
    ),
    vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY word)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(CAST(SUM(v.freq) AS DECIMAL(28,0)) AS DOUBLE) / COUNT(*) AS mean_freq,
           MIN(v.freq) AS min_freq,
           CAST(SUM(CASE WHEN v.freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
    FROM tok t JOIN vocab v ON v.word = t.word
    GROUP BY t.doc_id
    """,
)
def corpus_frequency_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency scoring — the integer-exact core of a
    perplexity-style quality filter (CCNet shape): score each document
    by how common its words are in the corpus itself. mean_freq low /
    n_hapax high flags gibberish and OOV-heavy docs; production swaps
    the frequency for a log-prob from a trained LM, but ln() is not
    bit-stable across engines, so the oracle-checked form keeps the
    arithmetic exact (decimal sum of bigint frequencies, one double
    division at the end). Two shuffles: vocabulary build and the
    word-keyed join back — the join is on the word key, so the corpus
    streams and only (word, freq) pairs rendezvous."""
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = tok.groupBy("word").agg(F.count("*").alias("freq"))
    return (
        tok.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            (
                F.sum("freq").cast("decimal(28,0)").cast("double") / F.count("*")
            ).alias("mean_freq"),
            F.min("freq").alias("min_freq"),
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
    )


@query(
    "dataset_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN b < 9000 THEN 'train'
                WHEN b < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             CAST((('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
                   % 10000) AS INT) AS b
      FROM documents
    )
    """,
)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5): a document NEVER
    migrates between train and eval across reruns, backfills, or
    cluster resizes — the assignment is md5(salt:id) bucketed into
    cumulative ranges, a pure projection (zero shuffle) that any
    engine reproduces bit-for-bit. The salt decorrelates the split
    hash from the sampling hash so "sample 10%" and "test = 5%"
    compose without biasing either."""
    from analytics_etl_spark.operators.sampling import dataset_split

    docs = t(spark, sf_dir, "documents")
    return dataset_split(docs).select("doc_id", "split")


@query(
    "similarity_topk_int8",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE {_scorable_sql("embedding")}),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
      FROM e
    ),
    q8 AS (
      SELECT vec_id,
             CASE WHEN sc = 0
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x -> CAST(floor(x / sc + 0.5) AS BIGINT))
             END AS q
      FROM s
    ),
    qq AS (SELECT q FROM q8 WHERE vec_id = 0)
    SELECT e8.vec_id,
           CAST(list_sum(list_transform(range(1, len(e8.q) + 1),
                                        i -> e8.q[i] * qq.q[i])) AS BIGINT) AS iscore
    FROM q8 e8, qq
    WHERE e8.vec_id <> 0
    ORDER BY iscore DESC, e8.vec_id
    LIMIT 10
    """,
)
def similarity_topk_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize-then-rank: top-10 by int8-quantized dot product — the
    cheap first pass that reads 4x less than float32 at scan time.
    Symmetric per-vector scalar quantization with floor(x+0.5)
    rounding keeps every step integer-exact and IEEE-identical across
    engines, so unlike float cosine the QUANTIZED ranking is
    oracle-checked to the bit (any quantization divergence flips a
    score)."""
    from analytics_etl_spark.operators.similarity import int8_topk

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    return int8_topk(emb, _query_frame(emb, 0), k=10, exclude_ids=(0,))


@query(
    "vocab_coverage_topk",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS word
      FROM documents WHERE text IS NOT NULL
    ),
    counts AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY word),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
    topn AS (SELECT word, freq FROM counts ORDER BY freq DESC, word LIMIT 200)
    SELECT word, freq,
           CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS INT) AS rank,
           CAST(SUM(freq) OVER (ORDER BY freq DESC, word
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total.n
             AS coverage
    FROM topn, total
    """,
)
def vocab_coverage_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary induction: the 200 most frequent corpus
    words with rank and CUMULATIVE coverage ("how much of the corpus
    does a vocab of size r capture") — the curve a BPE/vocab-size
    decision is read off.

    Scale shape: the only corpus-sized work is one word-count
    aggregation (map-side partial sums, one shuffle). The global
    cumulative window — which would otherwise be a single-partition
    sort of the whole vocabulary — runs AFTER the top-N cut, over
    exactly 200 rows; the corpus total rides in as a broadcast 1-row
    aggregate. Ties broken by word so rank and coverage are total-
    ordered and engine-identical.
    """
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = docs.select(F.explode(F.split("text", " ")).alias("word"))
    counts = tok.groupBy("word").agg(F.count("*").cast("bigint").alias("freq"))
    # total token count straight off the explode — a partial-count
    # global agg (no word-keyed shuffle; summing `counts` instead
    # would re-run the word aggregation, since Spark does not reuse
    # the exchange across differently-shaped branches)
    total = tok.groupBy().agg(F.count("*").cast("bigint").alias("n"))
    topn = counts.orderBy(F.desc("freq"), "word").limit(200)
    # Spark WARNs about the partition-less window below; that is
    # EXPECTED and by design — it runs over the 200 post-limit rows
    # only (plan-tested in tests/test_plans.py), never the corpus.
    # Do not "fix" it by partitioning: coverage is a global cumsum.
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    return topn.crossJoin(F.broadcast(total)).select(
        "word",
        "freq",
        F.row_number().over(w).cast("int").alias("rank"),
        (
            F.sum("freq").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
            / F.col("n")
        ).alias("coverage"),
    )


@query(
    "dedup_incremental_batch",
    oracle=f"""
    WITH {_LSH_CTES},
    cand2 AS (
      SELECT DISTINCT b.doc_id AS batch_doc, c.doc_id AS corpus_doc
      FROM bands b JOIN bands c ON b.band = c.band AND b.bucket = c.bucket
      WHERE b.doc_id >= 450 AND c.doc_id < 450
    ),
    common2 AS (
      SELECT x.doc_id AS batch_doc, y.doc_id AS corpus_doc, COUNT(*) AS common
      FROM tok x JOIN tok y ON x.shingle = y.shingle
      JOIN cand2 c2 ON c2.batch_doc = x.doc_id AND c2.corpus_doc = y.doc_id
      GROUP BY 1, 2
    )
    SELECT c2.batch_doc, c2.corpus_doc,
           CAST(cm.common AS DOUBLE) / (sa.sz + sb.sz - cm.common) AS jaccard
    FROM cand2 c2
    JOIN common2 cm ON cm.batch_doc = c2.batch_doc AND cm.corpus_doc = c2.corpus_doc
    JOIN sizes sa ON sa.doc_id = c2.batch_doc
    JOIN sizes sb ON sb.doc_id = c2.corpus_doc
    WHERE CAST(cm.common AS DOUBLE) / (sa.sz + sb.sz - cm.common) >= 0.5
    """,
)
def dedup_incremental_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: docs arriving today (doc_id >= 450
    stand in for the new batch) checked against the existing corpus —
    the O(batch) daily shape: batch buckets join the corpus bucket
    table on (band, bucket), so batch-batch and corpus-corpus pairs
    are never generated and the corpus contributes only 32-byte
    signature rows to the join (persisted at ingest in deployment;
    see incremental_minhash_dedup)."""
    from analytics_etl_spark.operators.dedup import incremental_minhash_dedup

    docs = t(spark, sf_dir, "documents")
    return incremental_minhash_dedup(
        docs.filter(F.col("doc_id") < 450),
        docs.filter(F.col("doc_id") >= 450),
        min_jaccard=0.5,
    )


def _rp_oracle(d_out: int = 16, dim: int = 64) -> str:
    """Oracle for the random projection: the same md5-derived ±1 plane
    rows embedded as DOUBLE[] literals, the same left-fold dot product
    (DuckDB's list_dot_product matches Spark's F.aggregate fold
    bit-for-bit — verified round 1 for the ANN family)."""
    from analytics_etl_spark.operators.similarity import rademacher_planes

    planes = rademacher_planes(dim, d_out, tables=1, seed=11)[0]
    cols = ",\n           ".join(
        "list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(str(x) for x in plane)
        + f"]::DOUBLE[]) AS p{i}"
        for i, plane in enumerate(planes)
    )
    return (
        f"SELECT vec_id,\n           {cols}\n    FROM embeddings"
        f"\n    WHERE {_scorable_sql('embedding', dim)}"
    )


_CORPUS_BUILD_ORACLE = f"""
    WITH pool AS (SELECT doc_id, text FROM documents WHERE doc_id >= 25),
    -- stage 1: quality gate (word 2-grams, corpus_filter_pipeline rules)
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
    -- stage 2: decontamination (distinct word 3-grams vs the bench bank)
    {_TOK3_SQL},
    bench AS (SELECT DISTINCT shingle FROM tok WHERE doc_id < 25),
    cg AS (SELECT t.doc_id, t.shingle FROM tok t JOIN surv1 s ON s.doc_id = t.doc_id),
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
    -- stage 3: near-dedup (MinHash-LSH + exact verify, drop higher id)
    {_minhash_params_sql(12)},
    tok_s AS (SELECT t.doc_id, t.shingle FROM tok t JOIN surv2 s ON s.doc_id = t.doc_id),
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
    -- stage 4: deterministic salted split (dataset_split bounds)
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
    -- stage 5: chunk (50-word windows, 10 overlap) + per-split stats
    cw AS (
      SELECT doc_id, split, string_split(text, ' ') AS words
      FROM assigned WHERE text IS NOT NULL
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


@query("corpus_build_pipeline", oracle=_CORPUS_BUILD_ORACLE)
def corpus_build_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly corpus build, end to end, as ONE lazy plan: quality
    gate -> benchmark decontamination (docs 0-24 as the eval suite) ->
    MinHash-LSH near-dedup (drop the higher id of each verified pair)
    -> leakage-proof salted split -> chunking -> per-split doc/chunk/
    word counts. Every stage is the already-oracle-checked operator;
    this query checks their COMPOSITION — gates applied to the right
    survivor sets, in order, with per-stage Observation counts riding
    the same action (see plans/corpus_build.py)."""
    from analytics_etl_spark.plans.corpus_build import corpus_build

    docs = t(spark, sf_dir, "documents")
    result, _ = corpus_build(
        docs.filter(F.col("doc_id") >= 25).select("doc_id", "text"),
        docs.filter(F.col("doc_id") < 25).select("doc_id", "text"),
    )
    return result


@query(
    "dedup_substring_spans",
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
def dedup_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT substring-span dedup (Lee et al. 2022): every 20-word
    span occurring verbatim in >= 2 distinct documents — the
    boilerplate/memorization leak that near-dup methods structurally
    miss (two long docs sharing one paragraph are not near-dups).
    Pure JVM rolling-hash expressions, one explode + one groupBy on
    32-char hashes."""
    from analytics_etl_spark.operators.dedup import substring_span_duplicates

    return substring_span_duplicates(t(spark, sf_dir, "documents"), span_words=20)


# The stride=span_words screening form of the exact span dedup: only
# BLOCK-ALIGNED 20-word spans are emitted, cutting the explode/shuffle
# volume 20x. The recall trade is explicit: a copy is caught only when
# both docs emit it at the same alignment (full verbatim doc copies
# and head-anchored boilerplate always are; mid-paragraph splices may
# not be) — the cheap daily screen in front of the stride=1 exact
# nightly pass. Same operator, one parameter.
@query(
    "dedup_substring_stride",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 20
    ),
    s AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 18, 20),
                    i -> md5(array_to_string(w[i:i+19], ' ')))) AS span_hash
      FROM w
    )
    SELECT span_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM s GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dedup_substring_stride_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.dedup import substring_span_duplicates

    return substring_span_duplicates(
        t(spark, sf_dir, "documents"), span_words=20, stride=20
    )


# Bloom-prescreened incremental span membership (operators/bloom.py —
# the third mergeable sketch family after HLL and Misra-Gries): per
# BATCH doc, how many of its 20-word spans already exist in the
# standing corpus. The bloom prescreen (no false negatives) lets the
# ~85%-novel majority of batch spans skip the exact membership join
# entirely; only the maybe-set (true hits + ~fp of the batch) is
# verified, so the final counts are EXACTLY the plain anti-join's —
# the sketch changes cost, never the result, which is why this is
# oracle-pairable while the HLL/MG queries are rows-only. Scale: the
# corpus-side bloom is the persisted ingest artifact (mergeable via
# bit_or, batch-priced to update); every shuffle after the build is
# batch-sized.
@query(
    "dedup_bloom_prescreen",
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
    ),
    corpus AS (SELECT DISTINCT span_hash FROM s WHERE doc_id % 10 <> 0),
    batch AS (SELECT DISTINCT doc_id, span_hash FROM s WHERE doc_id % 10 = 0),
    novel AS (
      SELECT b.doc_id, COUNT(*) AS n_novel FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.span_hash = b.span_hash)
      GROUP BY 1
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM batch GROUP BY 1)
    SELECT t.doc_id, CAST(t.n_spans AS BIGINT) AS n_spans,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel
    FROM tot t LEFT JOIN novel n ON n.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
)
def dedup_bloom_prescreen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.bloom import bloom_prescreened_new_keys
    from analytics_etl_spark.operators.dedup import _spread_small_scan, span_hash_expr

    docs = _spread_small_scan(
        t(spark, sf_dir, "documents").filter(F.col("text").isNotNull()), "doc_id"
    )
    # one span explode shared by corpus build, batch totals, and the
    # prescreen probe — persist()-pinned (without it each consumer
    # re-runs the split/md5 expansion; persist beats a lazy
    # localCheckpoint 0.73 s vs 1.33 s at sf0.1 because checkpoint
    # RDD partitions get doubly computed by sibling branches inside
    # one job while the cache manager shares them)
    spans = docs.select(
        "doc_id", F.explode(span_hash_expr("text", 20)).alias("span_hash")
    ).persist()
    corpus = spans.filter(F.col("doc_id") % 10 != 0).select("span_hash")
    batch = spans.filter(F.col("doc_id") % 10 == 0).distinct()
    novel = bloom_prescreened_new_keys(corpus, batch, "span_hash", num_bits=1 << 21)
    tot = batch.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_spans"))
    n_novel = novel.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_novel")
    )
    return (
        tot.join(n_novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        )
        .orderBy("doc_id")
    )


# DSIR-shaped importance weighting (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling"): score each raw doc
# by how much its hashed n-gram profile looks like a TARGET domain
# (here lang='en' stands in for "high-quality target corpus"). The
# published method weights features by log(p_target/p_raw); logs are
# libm-territory (engine-dependent last ulps ⇒ unstable rankings), so
# this linearizes the ratio into FIXED-POINT integers instead:
# r_f = ((Nt_f+1)·2^20) div (Ns_f+1) — add-one smoothed, exact in any
# engine; a doc's importance is Σ_f count_d(f)·r_f, an exact bigint.
# (Same determinism move as text_tfidf_topterms' linearized idf: keep
# the monotone-per-feature ranking signal, drop the libm.) Scale: the
# bigram expansion is PURE JVM — split once into a column, then a
# transform over adjacent positions (referencing the pre-split column:
# a lambda that re-splits text per element is quadratic per doc, and
# the single-file scan must be spread first — 2.6 s -> 0.55 s
# measured at sf0.1 for the explode); bucket stats are a 1024-row
# frame broadcast back; everything else is two hash aggs.
@query(
    "dsir_importance_topk",
    oracle="""
    WITH words AS (SELECT doc_id, lang, string_split(text, ' ') AS w
                   FROM documents WHERE text IS NOT NULL),
    grams AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1])) AS g
      FROM words
    ),
    counts AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % 1024 AS f,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM grams GROUP BY 1, 2, 3
    ),
    buckets AS (
      SELECT f, SUM(c) AS ns,
             SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS nt
      FROM counts GROUP BY 1
    ),
    r AS (SELECT f, CAST(((nt + 1) * 1048576) // (ns + 1) AS BIGINT) AS r
          FROM buckets)
    SELECT doc_id, CAST(SUM(c * r.r) AS BIGINT) AS importance
    FROM counts JOIN r USING (f)
    GROUP BY doc_id
    ORDER BY importance DESC, doc_id
    LIMIT 100
    """,
)
def dsir_importance_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.dedup import _spread_small_scan

    docs = _spread_small_scan(
        t(spark, sf_dir, "documents").filter(F.col("text").isNotNull()), "doc_id"
    ).withColumn("w", F.split("text", " "))
    grams = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - F.lit(2)),
            lambda i: F.concat(
                F.element_at(F.col("w"), i + 1), F.lit(" "), F.element_at(F.col("w"), i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        docs.select("doc_id", "lang", F.explode(grams).alias("g"))
        .select(
            "doc_id",
            "lang",
            (F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long") % 1024).alias("f"),
        )
        .groupBy("doc_id", "lang", "f")
        .agg(F.count("*").cast("bigint").alias("c"))
        # consumed by BOTH the bucket-stats branch and the scoring
        # join; the lazy checkpoint materializes once during the
        # query's own action and is shared by both consumers instead
        # of re-running the bigram expansion.
        .localCheckpoint(eager=False)
    )
    buckets = counts.groupBy("f").agg(
        F.sum("c").alias("ns"),
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(F.lit(0))).alias("nt"),
    )
    ratios = buckets.select(
        "f", F.expr("CAST(((nt + 1) * 1048576) DIV (ns + 1) AS BIGINT)").alias("r")
    )
    return (
        counts.join(F.broadcast(ratios), "f")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("r")).cast("bigint").alias("importance"))
        .orderBy(F.desc("importance"), F.asc("doc_id"))
        .limit(100)
    )


@query(
    "text_tfidf_topterms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE text IS NOT NULL
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
    d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, d.df,
             CAST(tf.tf AS DOUBLE) * n.n / d.df AS score
      FROM tf JOIN d ON d.term = tf.term, n
    )
    SELECT doc_id, term, tf, df, score, rank FROM (
      SELECT doc_id, term, tf, df, score,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term
             ) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def text_tfidf_topterms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 distinctive terms per document by linearized TF-IDF
    (score = tf·N/df — exact integer product + one IEEE division, so
    the ranking is bit-stable across engines where log-idf's libm
    last-ulp would not be; see tfidf_top_terms)."""
    from analytics_etl_spark.operators.text_analysis import tfidf_top_terms

    return tfidf_top_terms(t(spark, sf_dir, "documents"), top_k=5)


@query(
    "similarity_topk_rerank",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE {_scorable_sql("embedding")}),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
      FROM e
    ),
    q8 AS (
      SELECT vec_id,
             CASE WHEN sc = 0
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x -> CAST(floor(x / sc + 0.5) AS BIGINT))
             END AS q
      FROM s
    ),
    qq AS (SELECT q FROM q8 WHERE vec_id = 0),
    coarse AS (
      SELECT e8.vec_id,
             CAST(list_sum(list_transform(range(1, len(e8.q) + 1),
                                          i -> e8.q[i] * qq.q[i])) AS BIGINT) AS iscore
      FROM q8 e8, qq
      WHERE e8.vec_id <> 0
      ORDER BY iscore DESC, e8.vec_id
      LIMIT 50
    ),
    qv AS (SELECT v FROM e WHERE vec_id = 0)
    SELECT c.vec_id,
           list_dot_product(e.v, qv.v)
             / sqrt(list_dot_product(e.v, e.v) * list_dot_product(qv.v, qv.v))
             AS score
    FROM coarse c JOIN e ON e.vec_id = c.vec_id, qv
    ORDER BY score DESC, c.vec_id
    LIMIT 10
    """,
)
def similarity_topk_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize-then-RERANK, end to end: int8 coarse top-50 (narrow
    codes scan) -> exact float cosine over only the 50 survivors ->
    top-10 by exact score. The full two-pass ANN deployment pattern
    in one oracle-checked plan — both passes deterministic (integer
    dot; left-fold float cosine shared with DuckDB), so unlike most
    rerank pipelines the WHOLE composition hash-matches."""
    from analytics_etl_spark.operators.similarity import int8_rerank_topk

    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    return int8_rerank_topk(
        emb, _query_frame(emb, 0), k=10, shortlist=50, exclude_ids=(0,)
    )


@query("embedding_random_projection", oracle=_rp_oracle())
def embedding_random_projection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss reduction 64 → 16 dims via deterministic
    Rademacher (±1) planes — the preprocessing step that makes every
    downstream distance computation 4× cheaper while approximately
    preserving geometry (JL: distortion ~ sqrt(log n / d')). ±1
    coefficients mean the only float work is the summation, whose
    left-fold order Spark's F.aggregate and DuckDB's list_dot_product
    share — so even this float-valued op is oracle-checked EXACTLY.
    Pure projection: zero shuffle, codegen-friendly, and the output is
    a drop-in `embedding` for every ANN operator in the engine.
    Gated to scorable vectors — junk rows are dropped, not projected
    (a projection of a NULL/ragged vector has no defined value and
    DuckDB's list_dot_product errors on length mismatch)."""
    from analytics_etl_spark.operators.similarity import (
        as_double_array,
        dot,
        rademacher_planes,
    )

    planes = rademacher_planes(64, 16, tables=1, seed=11)[0]
    emb = valid_embeddings(t(spark, sf_dir, "embeddings"), dim=_EMB_DIM)
    # fold dots (r16: measured and deliberately NOT unrolled): 16
    # unrolled 64-term chains cost ~3 s of driver analysis per build
    # (the Catalyst analyzer walks ~10k expression nodes) against a
    # per-row projection that is LINEAR in corpus size — the unrolled
    # form is reserved for the superlinear pair-join hot loops
    v = as_double_array("embedding")
    return emb.select(
        "vec_id",
        *[
            dot(v, F.array(*[F.lit(float(x)) for x in plane])).alias(f"p{i}")
            for i, plane in enumerate(planes)
        ],
    )


# Inverted-index conjunctive search (operators/search.py): postings
# intersection as ONE filter + ONE aggregation regardless of term
# count — never a k-way self-join. The registered form builds postings
# inline for oracle comparability; the deployment form reads the
# ingest-persisted term-partitioned index (bench probe
# text_search_indexed; pruning plan-asserted in tests/test_search.py).
@query(
    "text_search_conjunctive",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    p AS (
      SELECT term, doc_id, COUNT(*) AS tf
      FROM tok WHERE term IN ('filter', 'join', 'window') GROUP BY 1, 2
    )
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score
    FROM p GROUP BY doc_id HAVING COUNT(DISTINCT term) = 3
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def text_search_conjunctive_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing ALL of {filter, join, window}, ranked by exact
    Σ tf — the decontamination/audit lookup pattern."""
    from analytics_etl_spark.operators.search import build_postings, conjunctive_search

    docs = t(spark, sf_dir, "documents")
    return conjunctive_search(build_postings(docs), ["filter", "join", "window"], k=20)


# Phrase search: exact bigram adjacency via positional shingles — the
# semantics substring LIKE gets wrong ('monkey order' contains the
# BYTES 'key order' but not the phrase). Reuses the shingle kernel the
# dedup family runs at ingest (a deployment persists the n=2 column
# the same way it persists the n=3 dedup shingles — one extra array
# column, same write pass); counts are per-occurrence
# (distinct=False), exact integers.
@query(
    "text_search_phrase",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM words
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM bg WHERE bigram = 'key order'
    GROUP BY doc_id ORDER BY n_hits DESC, doc_id LIMIT 20
    """,
)
def text_search_phrase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing the exact phrase 'key order', ranked by
    occurrence count: shingle(n=2, distinct=False) → filter → count.
    The phrase predicate lands BEFORE the aggregation, so only hit
    rows shuffle."""
    from analytics_etl_spark.operators.dedup import word_shingles

    docs = t(spark, sf_dir, "documents")
    bg = word_shingles(docs, n=2, distinct=False)
    return (
        bg.filter(F.col("shingle") == "key order")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
        .orderBy(F.col("n_hits").desc(), "doc_id")
        .limit(20)
    )


# Temperature-weighted dataset mixing (T=2 ⇒ rates ∝ n^(1/2)): the
# standard multilingual rebalancing (sample low-resource languages up,
# high-resource down). α is FIXED at 0.5 because sqrt is IEEE
# correctly-rounded in every engine while pow() is libm-dependent —
# the one-ulp lesson the linearized-idf query already encodes. The
# denominator Σ√n folds over the lang-SORTED array via the same
# left-fold that list_dot_product shares with F.aggregate (verified
# bit-equal for the ANN family), so even this float-valued mix is
# oracle-checked exactly. Languages are few: the global agg is
# index-sized, the heavy work is one count shuffle.
@query(
    "temperature_mix_rates",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    s AS (
      SELECT list_dot_product(
               list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang),
               list_transform(list(n_docs ORDER BY lang), x -> 1.0)) AS denom
      FROM c
    )
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           sqrt(CAST(n_docs AS DOUBLE)) / denom AS mix_rate
    FROM c, s ORDER BY lang
    """,
)
def temperature_mix_rates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    denom_df = c.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("lang"),
                            F.sqrt(F.col("n_docs").cast("double")).alias("s"),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("denom")
    )
    return (
        c.crossJoin(F.broadcast(denom_df))
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            (F.sqrt(F.col("n_docs").cast("double")) / F.col("denom")).alias("mix_rate"),
        )
        .orderBy("lang")
    )


# Deterministic corpus shuffle: global order by a salted hash — the
# reproducible "random" ordering a training run needs (same shuffle on
# any cluster size, any rerun; decorrelated from the sampling and
# split hashes by the salt). Top-100 here keeps the registered result
# compact; the full-scale form is repartitionByRange on the same key.
@query(
    "deterministic_shuffle",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)))
                AS INT) AS position,
           doc_id
    FROM documents
    ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR))
    LIMIT 100
    """,
)
def deterministic_shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    top = docs.select("doc_id", h.alias("h")).orderBy("h").limit(100)
    # window over 100 post-limit rows by design (same shape as
    # vocab_coverage_topk — the WARN is expected, do not "fix")
    w = Window.orderBy("h")
    return top.select(F.row_number().over(w).alias("position"), "doc_id")


# Sample-budget allocation by largest remainder (Hamilton method):
# split a fixed budget of B=10,000 sample slots across languages
# proportionally to corpus counts, EXACTLY — floor(B·n/N) seats first,
# the leftover seats go to the largest remainders (B·n mod N), ties by
# lang for a total order. Everything is integer arithmetic on BIGINTs
# (B·n ≤ 10^4·10^7 at sf1 — no overflow), so the allocation —
# including the tie-broken remainder seats — hash-matches across
# engines. This is the exact-integer counterpart to
# temperature_mix_rates: rates are floats you multiply later; an
# allocation is the final integer contract a sampler must hit.
@query(
    "sample_budget_allocation",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
    tot AS (SELECT SUM(CAST(n AS BIGINT)) AS big_n, CAST(10000 AS BIGINT) AS b FROM c),
    base AS (
      SELECT lang, n, (b * n) // big_n AS floor_seats, (b * n) % big_n AS rem,
             b, big_n
      FROM c, tot
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rr,
             b - SUM(floor_seats) OVER () AS leftover
      FROM base
    )
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           CAST(floor_seats + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS seats
    FROM ranked ORDER BY lang
    """,
)
def sample_budget_allocation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    B = 10_000
    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    tot = c.agg(F.sum(F.col("n").cast("long")).alias("big_n"))
    base = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        F.expr(f"({B}L * n) div big_n").alias("floor_seats"),
        F.expr(f"({B}L * n) % big_n").alias("rem"),
    )
    # the window runs over one row per LANGUAGE — index-sized by
    # construction, the global window WARN is expected here
    w = Window.orderBy(F.col("rem").desc(), "lang")
    ranked = base.select(
        "*",
        F.row_number().over(w).alias("rr"),
        (F.lit(B) - F.sum("floor_seats").over(Window.partitionBy())).alias("leftover"),
    )
    return ranked.select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        (
            F.col("floor_seats")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        ).cast("bigint").alias("seats"),
    ).orderBy("lang")


# Contrastive training-pair construction: (anchor doc, positive vec,
# negative vec) triplets — the dataset-building step for CLIP-style /
# embedding-alignment training. The positive is the anchor's own
# vector (id join); the NEGATIVE must be (a) uniform-ish over the
# corpus, (b) never the anchor itself, (c) reproducible forever — so
# it's derived from the same md5→int machinery as the sampling
# family: neg_id = (id + 1 + h mod (N-1)) mod N, which is exactly
# never-self and hash-exact in any engine. Two broadcast-sized joins
# against embeddings at this shape; at 100 TB the same expressions
# drive a shuffle-hash join on vec_id.
#
# ID-DENSITY CONTRACT (ADVICE r5): the modular arithmetic assumes
# vec_id is exactly the dense range 0..N-1 — if it has holes, the
# inner join on neg_id silently DROPS that anchor (and the oracle
# drops it identically, so parity would hide the loss). The contract
# is asserted by tests/test_properties.py::test_embeddings_vec_id_is_dense;
# a deployment with sparse ids must maintain a dense surrogate id at
# ingest (one zipWithIndex-equivalent pass at write time), NOT a
# query-time global row_number — that is a single-partition sort.
@query(
    "contrastive_triplets",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS big_n FROM embeddings),
    a AS (
      SELECT d.doc_id,
             (d.doc_id + 1 +
              (('0x' || substr(md5('neg:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT)
                % (big_n - 1)) % big_n AS neg_id
      FROM documents d, n WHERE d.doc_id < 100
    )
    SELECT a.doc_id, a.doc_id AS pos_id, a.neg_id,
           p.label AS pos_label, q.label AS neg_label
    FROM a JOIN embeddings p ON p.vec_id = a.doc_id
           JOIN embeddings q ON q.vec_id = a.neg_id
    ORDER BY a.doc_id
    """,
)
def contrastive_triplets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, emb = t(spark, sf_dir, "documents"), t(spark, sf_dir, "embeddings")
    n = emb.agg(F.count("*").alias("big_n"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("neg:"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    a = (
        docs.filter(F.col("doc_id") < 100)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            ((F.col("doc_id") + 1 + h % (F.col("big_n") - 1)) % F.col("big_n")).alias(
                "neg_id"
            ),
        )
    )
    p = emb.select(F.col("vec_id").alias("p_id"), F.col("label").alias("pos_label"))
    q = emb.select(F.col("vec_id").alias("q_id"), F.col("label").alias("neg_label"))
    return (
        a.join(p, a.doc_id == p.p_id)
        .join(q, a.neg_id == q.q_id)
        .select("doc_id", F.col("doc_id").alias("pos_id"), "neg_id", "pos_label", "neg_label")
        .orderBy("doc_id")
    )


# Corpus content checksum: an ORDER-INDEPENDENT exact fingerprint per
# language — the reproducibility primitive behind "run R trained on
# corpus state X". Each doc contributes md5(doc_id || ':' || md5(text))
# truncated to 48 bits; the per-group sum runs in wide arithmetic
# (DECIMAL(38) / HUGEINT — a raw BIGINT sum overflows past ~32k docs,
# ANSI mode caught it) and is folded mod 2^61-1, so the checksum is
# bounded, commutative, and associative: invariant to partitioning,
# file order, and compaction — only CONTENT changes move it. Sum (not
# XOR): duplicate-doc insertions still shift the value (XOR of a pair
# of identical contributions would cancel). The point is drift
# DETECTION, not cryptography.
@query(
    "corpus_checksum",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 12))::BIGINT)
                % 2305843009213693951 AS BIGINT) AS content_checksum
    FROM documents GROUP BY 1
    """,
)
def corpus_checksum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    contrib = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.md5("text"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    mersenne61 = 2305843009213693951
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.pmod(F.sum(contrib.cast("decimal(38,0)")), F.lit(mersenne61))
        .cast("bigint")
        .alias("content_checksum"),
    )


# REAL byte-level multimodal feature (no codec needed, nothing
# stubbed): 16-bin byte-value histogram per media payload — the
# entropy/format-drift screening pass that runs before any decode.
# numpy bincount over zero-copy Arrow buffers (operators/multimodal.
# byte_histogram). Oracle contract: DuckDB can only mirror bytes as
# CHARACTERS, which agrees with UTF-8 bytes exactly on ASCII — so the
# query ENFORCES ascii-only docs in both engines (r7 hostile-data
# sweep: a single 'é' used to silently diverge — codepoint 233 vs its
# two UTF-8 bytes; an enforced contract beats a documented
# assumption). The OPERATOR stays byte-faithful on any payload.
@query(
    "multimodal_byte_histogram",
    oracle=r"""
    WITH b AS (
      SELECT doc_id AS media_id,
             unnest(list_transform(range(1, len(text) + 1),
                    i -> ascii(text[i]) // 16)) AS bin
      FROM documents
      WHERE text IS NOT NULL AND len(text) > 0
        AND regexp_matches(text, '^[\x00-\x7f]*$')
    )
    SELECT media_id, CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_bytes
    FROM b GROUP BY 1, 2
    """,
)
def multimodal_byte_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.multimodal import byte_histogram, synthesize_media

    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("text").rlike(r"^[\x00-\x7F]*$")
    )
    return byte_histogram(synthesize_media(docs), bins=16)


# Ingest novelty scoring — the data-valuation question every corpus
# refresh asks: how much NEW content does this batch actually add?
# Per batch doc: distinct word 3-grams, how many never occur in the
# standing corpus, and the novelty ratio (exact integer counts, one
# final IEEE division). The corpus side collapses to its DISTINCT
# gram set once (at 100 TB that set is the persisted artifact —
# exactly the with_shingle_column family); the batch side is an
# anti-join against it, O(batch) like incremental dedup. Pure JVM
# (pre-split transform, the dsir_importance_topk pattern).
@query(
    "ingest_novelty_score",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE text IS NOT NULL
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
      FROM words
    ),
    corpus AS (SELECT DISTINCT g FROM grams WHERE doc_id < 450),
    batch AS (SELECT doc_id, g FROM grams WHERE doc_id >= 450),
    novel AS (
      SELECT b.doc_id, COUNT(*) AS n_novel
      FROM batch b WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.g = b.g)
      GROUP BY 1
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM batch GROUP BY 1)
    SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(COALESCE(n.n_novel, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
             AS novelty
    FROM tot t LEFT JOIN novel n ON n.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
)
def ingest_novelty_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.dedup import _spread_small_scan

    docs = _spread_small_scan(
        t(spark, sf_dir, "documents").filter(F.col("text").isNotNull()), "doc_id"
    ).withColumn("w", F.split("text", " "))
    g3 = F.when(
        F.size("w") >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - F.lit(3)),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("w"), i + 1),
                    F.element_at(F.col("w"), i + 2),
                    F.element_at(F.col("w"), i + 3),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", F.explode(g3).alias("g"))
    corpus = grams.filter(F.col("doc_id") < 450).select("g").distinct()
    batch = grams.filter(F.col("doc_id") >= 450)
    tot = batch.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_grams"))
    novel = (
        batch.join(corpus, "g", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    return (
        tot.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            (
                F.coalesce("n_novel", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# Percentile-gated quality filtering: keep each source's top half by
# document length — the per-DOMAIN quality gate (an absolute threshold
# over-prunes terse domains and under-prunes verbose ones; the
# percentile form adapts per source). percent_rank = (rank-1)/(n-1)
# is one IEEE division of exact integers — identical in any engine —
# and the (n_words, doc_id) total order makes ranks deterministic.
# One window pass partitioned by source; at 100 TB that is a single
# hash-partition exchange on the domain key.
@query(
    "quality_percentile_gate",
    oracle="""
    WITH wc AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
      FROM documents WHERE text IS NOT NULL
    ),
    ranked AS (
      SELECT doc_id, source, n_words,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY n_words, doc_id) AS pr
      FROM wc
    )
    SELECT doc_id, source, n_words, pr
    FROM ranked WHERE pr >= 0.5
    ORDER BY doc_id
    """,
)
def quality_percentile_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    wc = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
    )
    w = Window.partitionBy("source").orderBy("n_words", "doc_id")
    return (
        wc.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.5)
        .orderBy("doc_id")
    )


# BM25 ranking over the inverted index — OR semantics, top-20. See
# operators/search.bm25_rank for the determinism construction: raw
# odds-ratio idf instead of its log (log is libm), k1=6/5 and b=3/4
# as RATIONALS so the per-term score reduces to an exact int64 ratio
# with ONE final IEEE division — the first float-expression attempt
# here ((1-b) + b·dl/avgdl etc.) hash-mismatched DuckDB by one ulp,
# the signature of compiler FMA contraction on a·b+c shapes; the
# integer form has nothing to fuse. The per-doc sum folds the
# term-sorted score list identically in both engines.
_BM25_TERMS = ("filter", "join", "window")


@query(
    "text_search_bm25",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t AS term FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents WHERE text IS NOT NULL
      ) WHERE t <> ''
    ),
    p AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
      WHERE term IN {_BM25_TERMS!r} GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl
      FROM dl
    ),
    tdf AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM p GROUP BY 1),
    scored AS (
      -- k1 = 6/5, b = 3/4, as TWO integer ratios (int64-safe far past
      -- 1e9 docs — see operators/search.bm25_rank):
      --   [(2(N-df)+1)*tf*44 / (2df+1)] * [S / (tf*20*S + 6*S + 18*dl*N)]
      -- with (k1n+k1d)*bd = 44, k1d*bd = 20, k1n*(bd-bn) = 6, k1n*bn = 18
      SELECT p.doc_id, p.term,
             (CAST((2 * (s.n_docs - tdf.df) + 1) * p.tf * 44 AS DOUBLE)
              / CAST(2 * tdf.df + 1 AS DOUBLE))
             * (CAST(s.sum_dl AS DOUBLE)
                / CAST(p.tf * 20 * s.sum_dl + 6 * s.sum_dl
                       + 18 * dl.dl * s.n_docs AS DOUBLE)) AS s
      FROM p
      JOIN tdf USING (term)
      JOIN dl USING (doc_id), stats s
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_terms,
           list_reduce(list(s ORDER BY term), (a, b) -> a + b) AS score
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def text_search_bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.search import (
        bm25_rank,
        build_postings,
        doc_lengths,
    )

    docs = t(spark, sf_dir, "documents")
    return bm25_rank(
        build_postings(docs),
        doc_lengths(docs),
        list(_BM25_TERMS),
        k1=(6, 5),
        b=(3, 4),
        k=20,
    )


# Heavy-hitter frequency sketch (Misra-Gries, mergeable) — see
# operators/freq.py. Rows-only: MG counters (and which tail items
# survive) depend on partitioning/stream order by construction, so no
# engine-exact oracle exists; the guarantees that actually matter —
# every item with freq > n/(k+1) present, counters within n/(k+1)
# under — are pinned by property tests in tests/test_sketches.py.
@query(
    "heavy_hitters_parts",
    rows_only="Misra-Gries counters are partition/stream-order dependent; "
    "frequency-error envelope and completeness pinned in tests/test_sketches.py",
)
def heavy_hitters_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.freq import heavy_hitters

    li = t(spark, sf_dir, "lineitem")
    return heavy_hitters(li, "l_partkey", k=50)


# The MG guarantee itself, hash-checked (VERDICT r14 item 4): the
# r14 audit confirmed the raw counters CANNOT be oracle-paired — any
# sketch-side est-threshold is ambiguous for items in the
# (n/(k+1), 2n/(k+1)] band — so the family's deterministic decision
# surface is exact-threshold membership: items with exact freq >
# n/(k+1), which the guarantee says must ALL be among the sketch's
# survivors. The Spark side semi-joins the exact guaranteed set
# against the real MG output, so a completeness bug in the sketch
# (partition pass, merge, or trim) surfaces as a missing row = red
# driver hash. Two streams keep it non-vacuous at every SF: document
# language (en ~39-44% > the k=2 threshold of 1/3 everywhere) and
# l_returnflag (whichever flags sit above n/3 — near the boundary,
# but BOTH engines decide by exact count, so membership matches by
# construction). k=2 < the distinct count on both streams, so the
# sketch genuinely evicts.
@query(
    "heavy_hitters_guaranteed",
    oracle="""
    WITH lc AS (SELECT lang AS item, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM documents WHERE lang IS NOT NULL GROUP BY 1),
    lt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM lc),
    rc AS (SELECT l_returnflag AS item, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1),
    rt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM rc)
    SELECT 'doc_lang' AS stream, item, cnt FROM lc, lt WHERE cnt * 3 > n
    UNION ALL
    SELECT 'returnflag' AS stream, item, cnt FROM rc, rt WHERE cnt * 3 > n
    """,
)
def heavy_hitters_guaranteed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.freq import heavy_hitters_guaranteed

    docs = t(spark, sf_dir, "documents")
    li = t(spark, sf_dir, "lineitem")
    a = heavy_hitters_guaranteed(docs, "lang", k=2).select(
        F.lit("doc_lang").alias("stream"), "item", "cnt"
    )
    b = heavy_hitters_guaranteed(li, "l_returnflag", k=2).select(
        F.lit("returnflag").alias("stream"), "item", "cnt"
    )
    return a.unionByName(b)


# The heavy-hitter family's hash-checked DECISION arm (VERDICT r12
# item 4, following the dedup_semantic_knn_graph precedent): the MG
# sketch above answers the one-pass/mergeable/streaming case and is
# rows-only by construction; THIS query is the exact ground truth the
# sketch approximates — same input column, same k — so the family's
# end answer ("which parts are hot") has a fully hash-checked member,
# and the sketch's error envelope (tests/test_sketches.py) is anchored
# to an oracle-checked frame. Plan: map-side-combined groupBy count +
# TakeOrderedAndProject — two keyed exchanges of counter-sized data at
# any corpus size, no sketch state.
@query(
    "heavy_hitters_parts_exact",
    oracle="""
    SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY cnt DESC, item
    LIMIT 50
    """,
)
def heavy_hitters_parts_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("item"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("item"))
        .limit(50)
    )


# BPE vocabulary induction — the tokenizer-learning step of the
# training pipeline, run as a Spark-first iterative operator (see
# operators/bpe.py: ONE corpus pass for word counts, then every round
# is word-table-sized with a driver collect of only the chosen pairs).
# Rows-only: each merge depends on all previous — a recursive fixpoint
# DuckDB SQL cannot express (the connected-components class); the
# evidence is EXACT merge-sequence parity with an independent
# pure-Python textbook-BPE reference (tests/test_bpe.py). The batched
# mode used here (8 symbol-disjoint merges per round) is the at-scale
# form; its one-pass-equals-sequential contract is also pinned there.
@query(
    "bpe_learned_merges",
    rows_only="iterative greedy argmax — each merge depends on every previous "
    "one (recursive fixpoint, not expressible in DuckDB SQL); exact parity "
    "with a pure-Python textbook BPE reference pinned in tests/test_bpe.py",
)
def bpe_learned_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from analytics_etl_spark.operators.bpe import learn_bpe_merges

    merges = learn_bpe_merges(
        t(spark, sf_dir, "documents"), num_merges=24, merges_per_round=8
    )
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    ).orderBy("rank")


@query(
    "dedup_ngram_containment",
    oracle=f"""
    WITH {_TOK3_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, containment FROM (
      SELECT p.doc_a, p.doc_b,
             CAST(p.common AS DOUBLE) / least(sa.sz, sb.sz) AS containment
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
    ) WHERE containment >= 0.2
    """,
)
def dedup_ngram_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle-CONTAINMENT near-dup pairs
    (operators/dedup.py::containment_pairs): |A∩B| / min(|A|,|B|) ≥
    0.2 — the C4/RealNews sub-document measure that catches a short
    doc embedded in a long one (containment 1.0) where Jaccard stays
    near |A|/|B| and dedup_ngram_jaccard's 0.1 cut misses it. Same
    scale shape as the Jaccard member: candidates only via the
    shingle equi-join (never all-pairs), one float division over
    exact int64 counts."""
    from analytics_etl_spark.operators.dedup import containment_pairs, word_shingles

    docs = t(spark, sf_dir, "documents")
    shingled = word_shingles(docs, n=3, distinct=True)
    return containment_pairs(shingled, min_containment=0.2)


@query(
    "docs_priority_sample",
    oracle="""
    WITH psw AS (
      SELECT doc_id, n_chars AS weight FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    psq AS (
      SELECT doc_id, weight,
             CAST(weight AS DOUBLE) * 281474976710656.0
               / CAST(('0x' || substr(md5('ps:' || doc_id::VARCHAR), 1, 12))::BIGINT + 1 AS DOUBLE) AS pri
      FROM psw
    ),
    pstop AS (SELECT * FROM psq ORDER BY pri DESC, doc_id LIMIT 51),
    pstau AS (SELECT MIN(pri) AS tau FROM pstop)
    SELECT doc_id, weight,
           greatest(CAST(weight AS DOUBLE), tau) AS w_est
    FROM pstop, pstau WHERE pri > tau
    """,
)
def docs_priority_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement — priority sampling
    (operators/sampling.py::priority_sample, Duffield-Lund-Thorup
    2007): the 50 docs with highest w/u priority under weight =
    n_chars, each carrying the unbiased subset-sum estimator
    ŵ = max(w, τ). The data-mixing primitive: "sample ∝ length but
    keep corpus statistics estimable from the sample". Fully
    oracle-paired — the priority is one deterministic IEEE expression
    over md5-derived integers, so the selected SET is bit-identical
    across engines (see the operator docstring for why this holds
    exactly, not approximately). Heavy step is a TakeOrdered heap,
    never a global sort."""
    from analytics_etl_spark.operators.sampling import priority_sample

    return priority_sample(t(spark, sf_dir, "documents"), "n_chars", k=50)


@query(
    "docs_priority_sample_stratified",
    oracle="""
    WITH pssw AS (
      SELECT lang AS stratum, doc_id, n_chars AS weight,
             CAST(n_chars AS DOUBLE) * 281474976710656.0
               / CAST(('0x' || substr(md5('ps:' || doc_id::VARCHAR), 1, 12))::BIGINT + 1 AS DOUBLE) AS pri
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    pssr AS (
      SELECT *, row_number() OVER (
        PARTITION BY stratum ORDER BY pri DESC, doc_id) AS rn
      FROM pssw
    ),
    psst AS (SELECT stratum, pri AS tau FROM pssr WHERE rn = 16)
    SELECT r.stratum, r.doc_id, r.weight,
           greatest(CAST(r.weight AS DOUBLE), COALESCE(t.tau, 0.0)) AS w_est
    FROM pssr r LEFT JOIN psst t ON t.stratum IS NOT DISTINCT FROM r.stratum
    WHERE r.rn <= 15
    """,
)
def docs_priority_sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum priority sampling
    (operators/sampling.py::priority_sample_per_stratum): the 15
    highest-priority docs per language with per-stratum thresholds
    and unbiased estimators — "fixed quota per source, statistics
    still estimable per source". Same exact-IEEE priority argument as
    docs_priority_sample; one shuffle on the stratum key, per-stratum
    heap window, NULL-safe stratum join (hostile data has NULL
    langs)."""
    from analytics_etl_spark.operators.sampling import priority_sample_per_stratum

    return priority_sample_per_stratum(
        t(spark, sf_dir, "documents"), "n_chars", k=15
    )
