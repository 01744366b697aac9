"""Text-analysis operators for training-data pipelines.

Token counting, quality scoring, language-ID heuristic, and winnowing
document fingerprints — all built-in expressions (regexp/array ops),
so they run inside whole-stage codegen on the scan, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny marker lexicons for the language-ID heuristic. Real pipelines
# use character-n-gram models; the engine keeps the operator shape
# (per-language evidence scores → argmax) with word markers.
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(c, " "))


def word_count(text: Column | str, pattern: str = "[a-z]+") -> Column:
    """Regex word count (the BPE-ish pre-tokenizer shape)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def marker_hits(text: Column | str, markers: tuple[str, ...]) -> Column:
    """How many whitespace tokens are in the marker set."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(c, " ")
    return F.size(F.filter(words, lambda w: w.isin(*markers)))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / alpha-ratio / stopword-ratio features + linear score.

    The score formula is a fixed-order double expression so any SQL
    engine reproduces it bit-for-bit.

    Empty-text contract (r7 hostile-data sweep): a zero-length doc has
    NO defined char ratios — they are NULL, not a crash. The unguarded
    x/0 was an ANSI-mode DIVIDE_BY_ZERO, i.e. ONE empty document
    anywhere in a 100 TB corpus aborted the whole scoring job.
    (n_tokens needs no guard: split of any non-null text yields >= 1
    token, empty-string tokens included.)
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_alpha = F.length(F.regexp_replace(c, "[^a-z]", ""))
    n_stop = marker_hits(c, LANG_MARKERS["en"])
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars)
    stop_ratio = n_stop.cast("double") / n_tokens
    avg_token_len = n_alpha.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_text"),
        n_tokens.alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"),
        avg_token_len.alias("avg_token_len"),
        (alpha_ratio * 0.7 + stop_ratio * 0.3).alias("quality_score"),
    )


def langid_guess(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-vote language ID: per-language hit counts → argmax.

    Ties break by language code order (deterministic).
    """
    hits = {lang: marker_hits(F.col(text_col), m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    guess = F.lit("unknown")
    # reversed so the FIRST language in sorted order wins ties
    for lang in sorted(hits, reverse=True):
        guess = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(guess)
    return docs.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in sorted(hits)],
        guess.alias("lang_guess"),
    )


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 4,
    window: int = 5,
) -> DataFrame:
    """Winnowing (rolling-hash document fingerprinting).

    Positional word shingles → md5 → min over each sliding window of
    `window` positions → the distinct window-minima are the doc's
    fingerprints. Guarantees shared fingerprints for long-enough
    shared substrings (the MOSS algorithm). One window shuffle on
    doc_id; everything else narrow.
    """
    # One Arrow-batched kernel per doc — the fingerprint computation
    # is wholly row-local, so the posexplode + window-over-doc_id +
    # groupBy formulation (one shuffle, plus interpreted HOF shingle
    # construction) buys nothing but cost: measured 4.4s → ~0.4s at
    # sf0.1. md5 hex and lexicographic string-min are identical in
    # Python, Spark, and DuckDB, so the unchanged SQL oracle still
    # hash-matches (window semantics: min over hs[i:i+window], tail
    # windows truncated — exactly ROWS BETWEEN CURRENT ROW AND w-1
    # FOLLOWING).
    import hashlib

    import pandas as pd

    def _fp(texts):
        ns, mins = [], []
        for txt in texts:
            w = txt.split(" ") if txt is not None else []
            hs = [
                hashlib.md5(" ".join(w[i : i + shingle_n]).encode()).hexdigest()
                for i in range(len(w) - shingle_n + 1)
            ]
            if not hs:
                ns.append(None)
                mins.append(None)
                continue
            fps = {min(hs[i : i + window]) for i in range(len(hs))}
            ns.append(len(fps))
            mins.append(min(fps))
        return pd.DataFrame({"n_fingerprints": ns, "min_fp": mins})

    _fp.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    fp_udf = F.pandas_udf(_fp, "n_fingerprints bigint, min_fp string")
    return (
        docs.select(F.col(id_col).alias("doc_id"), fp_udf(F.col(text_col)).alias("r"))
        .where(F.col("r.n_fingerprints").isNotNull())
        .select("doc_id", "r.n_fingerprints", "r.min_fp")
    )


def repetition_metrics(docs: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition signals per document.

    Heavily repetitive text is the classic low-quality signature in
    pretraining corpora (boilerplate, keyword stuffing, generation
    loops). Per doc over word n-grams:
    - dup_ngram_frac: 1 - distinct/total n-grams (how much of the doc
      is re-used phrasing);
    - top_ngram_frac: occurrences of the most frequent n-gram / total
      (degenerate-loop detector).

    Relational shape: explode n-grams → count per (doc, gram) → one
    re-aggregation per doc. Two hash-agg shuffles keyed on the doc id
    (+gram), fully codegen'd — at corpus scale this is the same cost
    profile as the dedup shingle pass it usually runs beside.
    """
    from analytics_etl_spark.operators.dedup import word_shingles

    grams = word_shingles(docs, text_col=text_col, n=n, distinct=False)
    per_gram = grams.groupBy("doc_id", "shingle").agg(F.count("*").alias("c"))
    total = F.sum("c")
    distinct_ = F.count("*")
    top = F.max("c")
    return per_gram.groupBy("doc_id").agg(
        total.cast("bigint").alias("n_ngrams"),
        distinct_.cast("bigint").alias("n_distinct"),
        (F.lit(1.0) - distinct_.cast("double") / total).alias("dup_ngram_frac"),
        (top.cast("double") / total).alias("top_ngram_frac"),
    )


PII_EMAIL = "[a-z0-9]+@[a-z]+\\.[a-z]+"
PII_PHONE = "\\+1-555-[0-9]{4}"


def redact_pii(
    docs: DataFrame, text_col: str = "text", email: str = PII_EMAIL, phone: str = PII_PHONE
) -> DataFrame:
    """Count and redact PII patterns (emails, phone numbers).

    Pure JVM regex — one narrow pass, no shuffle. Returns match
    counts plus an md5 of the redacted text (the fingerprint travels
    through correctness checks without hauling full documents).
    """
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(c, email, "[EMAIL]"), phone, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(c, F.lit(email)).cast("bigint").alias("n_emails"),
        F.regexp_count(c, F.lit(phone)).cast("bigint").alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 50,
    overlap: int = 10,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into overlapping word chunks — the context-
    window preparation step for training/RAG pipelines.

    Chunk i covers words [i·stride, i·stride + chunk_words) with
    stride = chunk_words - overlap; the final chunk may be short, and
    a doc shorter than one chunk yields itself. Same Arrow-kernel
    shape as shingling (per-row tight loop; HOF lambdas are
    interpreted) — one narrow pass, the explode happens JVM-side
    after the kernel so the Python boundary moves arrays, not rows.
    """
    import pandas as pd

    stride = chunk_words - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_words")

    def _chunks(texts):
        out = []
        for txt in texts:
            if txt is None:
                out.append([])
                continue
            w = txt.split(" ")
            starts = range(0, max(len(w) - overlap, 1), stride)
            out.append([" ".join(w[s : s + chunk_words]) for s in starts])
        return pd.Series(out)

    _chunks.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_chunks, "array<string>")
    # keep_cols ride through the kernel projection so a consumer that
    # needs (chunk, label) — e.g. per-split packing — doesn't have to
    # join back to the source and replay its upstream plan
    extra = [F.col(c) for c in keep_cols]
    return (
        docs.select(F.col(id_col).alias("doc_id"), *extra, udf(F.col(text_col)).alias("cs"))
        .select("doc_id", *keep_cols, F.posexplode("cs").alias("chunk_id", "chunk_text"))
        .withColumn("n_words", token_count("chunk_text"))
    )


def pack_training_examples(
    chunks: DataFrame,
    budget_words: int = 500,
    stratum_col: str = "split",
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    text_col: str = "chunk_text",
    n_col: str = "n_words",
) -> DataFrame:
    """Materialize packed training EXAMPLES: chunks greedily binned to
    ~``budget_words`` per example (the token_budget_packing window,
    same running-total bin rule), then each bin collapsed to ONE row —
    (stratum, example_id, texts array, n_chunks, total_words) — the
    record a training loader actually reads.

    Determinism: bin assignment and within-bin order both follow the
    total (doc, chunk) order, so the written examples are byte-stable
    across reruns/partitionings (array_sort on the position-keyed
    structs fixes collect_list's arrival order). Two shuffles per
    stratum: the packing window and the example groupBy — both keyed
    on (stratum, bin), never wider than the chunk table.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col, chunk_id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = chunks.withColumn(
        "example_id",
        F.floor((F.sum(n_col).over(w) - F.col(n_col)) / budget_words).cast("bigint"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(id_col), F.col(chunk_id_col), F.col(text_col)))
    )
    return (
        binned.groupBy(stratum_col, "example_id")
        .agg(
            F.transform(ordered, lambda s: s[text_col]).alias("texts"),
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(n_col).cast("bigint").alias("total_words"),
        )
    )


def pack_training_examples_exact(
    chunks: DataFrame,
    budget_words: int = 500,
    stratum_col: str = "split",
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    n_col: str = "n_words",
) -> DataFrame:
    """EXACT greedy sequential packing per stratum — the ground truth
    the window-based ``pack_training_examples`` approximates.

    Greedy first-fit is inherently sequential (bin of chunk i depends
    on every earlier assignment), so it cannot be a window function;
    this is the legitimate use of ``applyInPandas``: one Arrow batch
    per stratum, a tight Python loop over the stratum's chunks in
    total (doc, chunk) order. Difference from the window form: a bin
    CLOSES when the next chunk would overflow (never overruns), where
    the window form lets the last chunk of a bin overrun. Both are
    deterministic; the window form scales to strata of any size (no
    single-group materialization), this one is exact — a training
    build picks per its tokenizer tolerance.

    Returns (stratum, example_id, n_chunks, total_words) per bin.
    Scale note: each stratum's chunk METADATA (ids + counts, not
    text) must fit one task — fine for per-language strata; for
    unbounded strata, pre-split by a hash prefix and accept bin
    breaks at the seams (documented trade).
    """
    import pandas as pd

    out_schema = (
        f"{stratum_col} string, example_id bigint, n_chunks bigint, total_words bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([id_col, chunk_id_col])
        bins, cur_id, cur_n, cur_w = [], 0, 0, 0
        for n in pdf[n_col]:
            n = int(n)
            if cur_n > 0 and cur_w + n > budget_words:
                bins.append((cur_id, cur_n, cur_w))
                cur_id, cur_n, cur_w = cur_id + 1, 0, 0
            cur_n += 1
            cur_w += n
        if cur_n:
            bins.append((cur_id, cur_n, cur_w))
        stratum = pdf[stratum_col].iloc[0]
        return pd.DataFrame(
            {
                stratum_col: [stratum] * len(bins),
                "example_id": [b[0] for b in bins],
                "n_chunks": [b[1] for b in bins],
                "total_words": [b[2] for b in bins],
            }
        )

    return (
        chunks.select(stratum_col, id_col, chunk_id_col, n_col)
        .groupBy(stratum_col)
        .applyInPandas(pack, out_schema)
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Per-document distinctive terms by corpus-weighted frequency —
    TF-IDF with a LINEARIZED idf: score = tf · N / df instead of
    tf · log(N/df).

    Why linear: log()'s last ulp differs across libm implementations,
    which would make the ranking engine-dependent exactly at ties —
    the one thing a correctness-gated operator can't have. tf·N/df is
    a single exact integer product and one IEEE division (bit-stable
    everywhere), preserves the "frequent here, rare in the corpus"
    ordering within a document for fixed tf or fixed df, and keeps
    the oracle exact. Production scoring swaps in log-idf (or a real
    LM) the same way corpus_frequency_score documents for ln().

    Returns (doc_id, term, tf, df, score, rank), top_k terms per doc,
    rank total-ordered (score desc, term asc). Shuffle census: one
    (doc, term) count, one term-keyed df agg + join, one window on
    the doc key; the corpus-sized frames carry counts, never text.
    """
    from pyspark.sql import Window

    tok = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(text_col, " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").cast("bigint").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n = tok.select("doc_id").distinct().groupBy().agg(
        F.count("*").cast("bigint").alias("n")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf").cast("double") * F.col("n") / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


def ngram_contamination(
    corpus_grams: DataFrame,
    bench_grams: DataFrame,
    gram_col: str = "shingle",
    id_col: str = "doc_id",
    broadcast_bench_limit: int | None = 2_000_000,
    bench_count: int | None = None,
) -> DataFrame:
    """Per corpus doc: fraction of its n-grams found in a benchmark's
    n-gram bank (the decontamination gate every pretraining pipeline
    runs before training).

    Inputs are already-shingled frames: ``corpus_grams`` (id, gram)
    distinct per doc, ``bench_grams`` (gram, ...) for the eval suite.
    Output: (doc_id, n_grams, n_contaminated, contamination_frac) for
    docs with >= 1 hit.

    Join strategy is SIZE-GATED, not assumed: eval suites are bounded
    in practice (thousands of docs → at most a few million distinct
    grams) which makes a broadcast semi-join the right plan — the
    corpus side streams through the scan and never shuffles, at any
    corpus size. But "bounded in practice" is a contract the API
    cannot see, so the bank is counted ONCE at plan-build time
    (driver action, bank-sized — the same legitimate class as the
    IVF centroid collect) and the broadcast hint is applied only
    below ``broadcast_bench_limit`` distinct grams. Above it — or
    with the limit set to None — the hint is dropped and the join
    shuffles both sides on the gram key, with AQE free to pick a
    better strategy at runtime. Correctness is identical either way;
    only the exchange layout changes.

    Callers that already know the bank size (e.g. an eval-suite
    registry) pass ``bench_count`` and the gate costs zero jobs; when
    it must be counted, the distinct bank is CACHED first so the scan
    (including any Python shingling feeding it) runs once and the join
    reuses the materialized bank instead of recomputing it.
    """
    bench = bench_grams.select(gram_col).distinct()
    if broadcast_bench_limit is not None:
        n = bench_count
        if n is None:
            bench = bench.cache()
            n = bench.count()
        if n <= broadcast_bench_limit:
            bench = F.broadcast(bench)
    sizes = corpus_grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (
        corpus_grams.join(bench, gram_col)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return hits.join(sizes, id_col).select(
        id_col,
        "n_grams",
        "n_contaminated",
        (F.col("n_contaminated").cast("double") / F.col("n_grams")).alias(
            "contamination_frac"
        ),
    )


# The Gopher/MassiveWeb stopword list (Rae et al. 2021, appendix A1.1):
# a document must contain at least two DISTINCT members to pass.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stopwords: int = 2,
) -> DataFrame:
    """The Gopher/MassiveWeb quality-rule cascade (Rae et al. 2021,
    appendix A1.1) as per-document boolean flags plus the composite
    keep decision — the published rule set deployed (with per-corpus
    threshold tuning) by Gopher, RefinedWeb, Dolma, and FineWeb:

    - word count in [50, 100000];
    - mean word length in [3, 10] characters;
    - symbol-to-word ratio (``#`` chars + ``...`` runs) <= 0.1;
    - < 90% of lines start with a bullet (``-``/``*``);
    - < 30% of lines end with an ellipsis;
    - >= 80% of words contain at least one alphabetic character;
    - at least ``min_stopwords`` distinct ``stopwords`` present
      (Gopher's list and 2 by default; the paper itself tunes the
      list per corpus — pass the target corpus' function words).

    Every threshold is evaluated as an INTEGER cross-multiplied
    comparison (mean-word-length in [3,10] is ``3*n_words <= sum_len
    AND sum_len <= 10*n_words``; the ellipsis count stays in 3x units
    so no division happens at all) — no float ratio ever
    materializes, so the flags are bit-exact across engines and
    immune to summation-order drift at any scale.

    NULL text -> NULL flags, keep=false (the quality_features
    empty-text contract: degenerate input is a decision, not a crash).
    All expressions are built-in array/regexp ops — whole-stage
    codegen on the scan, shuffle-free, one pass over the corpus.
    """
    c = F.col(text_col)
    words = F.split(c, " ")
    lines = F.split(c, "\n")
    n_words = F.size(words).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    sum_wlen = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast(
        "bigint"
    )
    n_hash = (F.length(c) - F.length(F.regexp_replace(c, "#", ""))).cast("bigint")
    # non-overlapping '...' runs, kept in 3x units (length delta of a
    # literal-replace) so the ratio rule below needs no division
    n_ell3 = (F.length(c) - F.length(F.regexp_replace(c, "\\.\\.\\.", ""))).cast(
        "bigint"
    )
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike("^[-*]"))).cast("bigint")
    n_ell_lines = F.size(F.filter(lines, lambda l: l.rlike("\\.\\.\\.$"))).cast(
        "bigint"
    )
    n_stop = F.size(
        F.array_distinct(F.filter(words, lambda w: w.isin(*stopwords)))
    ).cast("bigint")

    f_word_count = (n_words >= 50) & (n_words <= 100000)
    f_mean_word_len = (3 * n_words <= sum_wlen) & (sum_wlen <= 10 * n_words)
    f_symbol_ratio = 10 * (3 * n_hash + n_ell3) <= 3 * n_words
    f_bullet = 10 * n_bullet < 9 * n_lines
    f_ellipsis = 10 * n_ell_lines < 3 * n_lines
    f_alpha = 5 * n_alpha_words >= 4 * n_words
    f_stop = n_stop >= min_stopwords
    keep = F.when(
        c.isNotNull(),
        f_word_count
        & f_mean_word_len
        & f_symbol_ratio
        & f_bullet
        & f_ellipsis
        & f_alpha
        & f_stop,
    ).otherwise(F.lit(False))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        f_word_count.alias("f_word_count"),
        f_mean_word_len.alias("f_mean_word_len"),
        f_symbol_ratio.alias("f_symbol_ratio"),
        f_bullet.alias("f_bullet"),
        f_ellipsis.alias("f_ellipsis"),
        f_alpha.alias("f_alpha"),
        f_stop.alias("f_stop"),
        keep.alias("keep"),
    )
