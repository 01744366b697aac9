"""Unigram-LM (SentencePiece-style) Viterbi segmentation — JVM-pure
dynamic programming, fully oracle-paired.

The tokenizer family's second algorithm next to BPE
(operators/bpe.py): where BPE replays a learned MERGE sequence, the
unigram model (Kudo 2018, SentencePiece) segments each word into the
MIN-COST sequence of vocabulary pieces under per-piece surprisal
costs — the Viterbi decode of a unigram language model over pieces.
Production tokenizers ship the trained piece table as an artifact;
here the table is PINNED integer literals (the BPE_PINNED_MERGES
convention), so the whole stage is deterministic and cross-engine
exact.

The decode is an O(L²) per-word DP:

    best[0] = 0
    best[j] = min_{i<j} best[i] + metric(word[i..j])

expressed ENTIRELY in built-in higher-order functions — an
``aggregate`` fold over positions whose accumulator is the growing
``best`` array, with an ``array_min ∘ transform`` inner sweep — so it
runs inside whole-stage codegen with zero Python nodes, and DuckDB
replays it verbatim with ``list_reduce``/``list_min``
(queries/llm2.py). No UDF, no collect, no shuffle beyond the word
table.

Deterministic tie-breaking without a float in sight: the DP metric is
``cost_q·K + 1`` per piece with ``K = 64 > max pieces per word``, so
minimizing the single int64 metric minimizes (total cost, then piece
count) — ties beyond that are METRIC-IDENTICAL segmentations and
cannot differ in any output column. Unknown single chars cost
``UNK_COST_Q``; unknown multi-char spans are infeasible (``INF_Q``).

Scale + hostile contract: the DP runs once per DISTINCT word (the
word-table shape every tokenizer stage here uses — vocabulary-
bounded, Heaps-law growth, not corpus-bounded), then joins back to
per-doc occurrence counts. Adversarially long tokens are capped: only
the first ``MAX_WORD_LEN`` chars are segmented (O(MAX²) worst case
per word) and the tail is accounted at the char-fallback rate —
exact, documented, and mirrored in the oracle. Empty words and NULL
text are excluded (the BPE word-table convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pinned piece table (piece, cost_q in 1/256-bit surprisal units) —
# a hand-trained stand-in for a SentencePiece model artifact, chosen
# so the synthetic corpus vocabulary exercises multi-piece decodes,
# piece-vs-char tradeoffs, and the UNK path. PINNED: changing entries
# changes hashes; treat like BPE_PINNED_MERGES.
UNIGRAM_PIECES: tuple[tuple[str, int], ...] = (
    ("the", 800),
    ("tch", 1400),
    ("eam", 1350),
    ("dow", 1400),
    ("ble", 1350),
    ("ind", 1300),
    ("sc", 1100),
    ("an", 1000),
    ("jo", 1150),
    ("in", 950),
    ("ha", 1100),
    ("sh", 1150),
    ("er", 900),
    ("or", 950),
    ("ar", 1000),
    ("st", 1000),
    ("re", 1000),
    ("ow", 1100),
    ("ta", 1100),
    ("le", 1000),
    ("ue", 1200),
    ("ry", 1200),
    ("up", 1200),
    ("am", 1150),
    ("a", 900),
    ("e", 1000),
    ("r", 1100),
    ("t", 1050),
    ("s", 1100),
    ("o", 1100),
    ("w", 1250),
)
UNK_COST_Q = 1600
INF_Q = 1 << 40
TIE_K = 64  # > MAX_WORD_LEN: metric = cost_q*K + 1 per piece
MAX_WORD_LEN = 32


def _piece_metric(piece: Column, plen: Column) -> Column:
    """metric contribution of one candidate piece (cost_q·K + 1)."""
    pieces_lit = F.array(*[F.lit(p) for p, _ in UNIGRAM_PIECES])
    costs_lit = F.array(*[F.lit(c) for _, c in UNIGRAM_PIECES])
    idx = F.array_position(pieces_lit, piece)
    cost = (
        F.when(idx > 0, F.element_at(costs_lit, idx.cast("int")))
        .when(plen == 1, F.lit(UNK_COST_Q))
        .otherwise(F.lit(INF_Q))
    )
    return cost.cast("bigint") * TIE_K + 1


def viterbi_word_metric(word: Column) -> Column:
    """The combined int64 DP metric for the first MAX_WORD_LEN chars
    of one word: total_cost_q·K + n_pieces of the min-(cost, pieces)
    segmentation. cost_q = metric DIV K; n_pieces = metric % K —
    sound because head pieces ≤ MAX_WORD_LEN < K. The capped TAIL is
    deliberately NOT folded into the packed metric: a tail's piece
    count is unbounded (an adversarial 10k-char token would overflow
    the mod-K field and carry into the cost), so callers account it
    separately at the char-fallback rate (unigram_word_table)."""
    head = F.substring(word, 1, MAX_WORD_LEN)
    hlen = F.length(head)
    best = F.aggregate(
        F.sequence(F.lit(1), hlen),
        F.array(F.lit(0).cast("bigint")),
        lambda acc, j: F.concat(
            acc,
            F.array(
                F.array_min(
                    F.transform(
                        F.sequence(F.lit(0), j - 1),
                        lambda i: F.element_at(acc, (i + 1).cast("int"))
                        + _piece_metric(
                            F.substring(head, (i + 1).cast("int"), (j - i).cast("int")),
                            j - i,
                        ),
                    )
                )
            ),
        ),
    )
    # hlen >= 1 is guaranteed by callers excluding empty words, but a
    # guard keeps the expression total: sequence(1, 0) would count DOWN
    # in Spark ([1, 0]) — never let it run.
    return F.when(hlen >= 1, F.element_at(best, -1)).otherwise(
        F.lit(0).cast("bigint")
    )


def unigram_word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n, cost_q, n_pieces): the distinct-word Viterbi table —
    the DP runs once per vocabulary entry, never once per occurrence."""
    words = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tail_len = F.greatest(
        F.length(F.col("word")) - MAX_WORD_LEN, F.lit(0)
    ).cast("bigint")
    return words.select(
        "word",
        "n",
        viterbi_word_metric(F.col("word")).alias("m"),
        tail_len.alias("tl"),
    ).select(
        "word",
        "n",
        (F.expr(f"m DIV {TIE_K}") + F.col("tl") * UNK_COST_Q)
        .cast("bigint")
        .alias("cost_q"),
        (F.col("m") % TIE_K + F.col("tl")).cast("bigint").alias("n_pieces"),
    )


def unigram_doc_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_pieces, cost_q): per-document tokenization
    accounting under the pinned unigram model — the corpus-level
    compression/cost report a tokenizer stage emits. One explode for
    doc↔word occurrences joined against the vocabulary-sized DP table
    (broadcast or shuffle at Catalyst's discretion)."""
    table = unigram_word_table(docs, text_col)
    occ = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    return (
        occ.join(table.drop("n"), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.sum("cost_q").cast("bigint").alias("cost_q"),
        )
    )
