"""Text-analysis operators for training-data pipelines.

Token counting, quality scoring, language-ID heuristic, and winnowing
document fingerprints — all built-in expressions (regexp/array ops),
so they run inside whole-stage codegen on the scan, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_alpha = F.length(F.regexp_replace(c, "[^a-z]", ""))
    n_stop = marker_hits(c, LANG_MARKERS["en"])
    alpha_ratio = n_alpha.cast("double") / n_chars
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
    words = F.split(F.col(text_col), " ")
    k = F.size(words) - (shingle_n - 1)
    idx = F.sequence(F.lit(0), k - 1)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j + 1) for j in range(shingle_n)]
    )
    shingles = F.when(k >= 1, F.transform(idx, shingle_at)).otherwise(
        F.array().cast("array<string>")
    )
    positioned = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(shingles).alias("pos", "shingle")
    ).select("doc_id", "pos", F.md5("shingle").alias("h"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        positioned.select("doc_id", F.min("h").over(w).alias("fp"))
        .groupBy("doc_id")
        .agg(
            F.count_distinct("fp").alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
        )
    )
