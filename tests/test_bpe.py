"""BPE vocabulary induction (operators/bpe.py).

The iterative merge learner cannot be DuckDB-oracle-paired (each merge
depends on all previous — same declared class as connected
components), so its correctness evidence is EXACT parity with an
independent pure-Python reference implementation of textbook greedy
BPE: same word counts in, same merge sequence and same tokenized
sequences out, plus the invariants of the batched at-scale mode.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from analytics_etl_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    learn_bpe_merges,
    word_counts,
)

CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
    "low lower newest",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


# ---- independent reference: textbook greedy BPE over word counts ----

def _ref_merge(seq, a, b):
    out = []
    for tok in seq:
        if out and out[-1] == a and tok == b:
            out[-1] = a + b
        else:
            out.append(tok)
    return tuple(out)


def _ref_bpe(wc: dict[str, int], num_merges: int, min_count: int = 2):
    seqs = {w: tuple(list(w) + [END_OF_WORD]) for w in wc}
    merges = []
    for rank in range(num_merges):
        pc = Counter()
        for w, n in wc.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        cands = [(c, a, b) for (a, b), c in pc.items() if c >= min_count]
        if not cands:
            break
        # max count; ties broken by lexicographically SMALLEST pair —
        # the engine's (desc cnt, asc left, asc right) order. min()
        # over the natural string order among max-count candidates
        # (ADVICE r7: a negated-ordinal-tuple max() mis-ordered
        # prefix-string ties — 'a' vs 'ab' — because the shorter tuple
        # compares SMALLER when it is a prefix, picking the longer
        # string where the engine's asc order picks the shorter)
        top = max(c for c, _, _ in cands)
        c, a, b = min(
            (t for t in cands if t[0] == top), key=lambda t: (t[1], t[2])
        )
        seqs = {w: _ref_merge(s, a, b) for w, s in seqs.items()}
        merges.append((rank, a, b, c))
    return merges, seqs


def test_exact_mode_matches_reference(spark):
    docs = _docs(spark)
    wc = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    want_merges, want_seqs = _ref_bpe(wc, num_merges=12)

    got = learn_bpe_merges(docs, num_merges=12, merges_per_round=1)
    assert got == want_merges and len(got) > 5

    toks = {
        r["word"]: tuple(r["tokens"])
        for r in apply_bpe(word_counts(docs), got).collect()
    }
    assert toks == want_seqs
    # sanity on the classic example: frequent subwords actually formed
    assert any("est" in m[1] + m[2] or "est" in (m[1] + m[2]) for m in got)


def test_early_stop_below_min_count(spark):
    """Asking for more merges than the data supports stops when no
    pair reaches min_count — never merges singletons."""
    docs = _docs(spark, ["ab ab", "cd"])
    merges = learn_bpe_merges(docs, num_merges=50, merges_per_round=1)
    wc = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    want, _ = _ref_bpe(wc, num_merges=50)
    assert merges == want
    assert all(m[3] >= 2 for m in merges)


def test_batched_mode_invariants(spark):
    """merges_per_round > 1 (the at-scale path): every round's pairs
    are symbol-disjoint (so the one-pass fold equals sequential
    application), counts are honest pair counts at selection time, and
    replaying the merge list reduces total token count vs characters."""
    docs = _docs(spark)
    merges = learn_bpe_merges(docs, num_merges=12, merges_per_round=4)
    assert len(merges) > 5
    assert [m[0] for m in merges] == list(range(len(merges)))

    toks = apply_bpe(word_counts(docs), merges)
    total_tokens = toks.select(
        F.sum(F.size("tokens") * F.col("n")).alias("t")
    ).first()["t"]
    chars = toks.select(
        F.sum((F.length("word") + 1) * F.col("n")).alias("t")
    ).first()["t"]
    assert total_tokens < chars
    # every learned product is actually used by some tokenized word
    produced = {a + b for _, a, b, _ in merges}
    seen = {
        t
        for r in toks.collect()
        for t in r["tokens"]
    }
    assert produced & seen


def test_bpe_is_jvm_pure(spark):
    """The fold/explode machinery is pure JVM — no Python eval nodes
    in the tokenization plan."""
    import contextlib
    import io

    docs = _docs(spark)
    merges = learn_bpe_merges(docs, num_merges=4, merges_per_round=1)
    df = apply_bpe(word_counts(docs), merges)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan


def test_exact_mode_prefix_string_tie_break(spark):
    """Regression (ADVICE r7): when tied-count candidate pairs contain
    prefix strings ('a' vs 'ab' as the left symbol), the engine's
    (desc cnt, asc left, asc right) order must pick the SHORTER string
    first — the old negated-ordinal reference helper picked the longer
    one. This corpus forces exactly that tie at merge rank 1."""
    texts = ["a abab aabb bab aa"]
    docs = _docs(spark, texts)
    wc = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    want_merges, want_seqs = _ref_bpe(wc, num_merges=3)
    # rank 1 is the prefix tie: ('a','</w>') over ('ab','</w>'), both count 2
    assert want_merges[1][1:3] == ("a", "</w>")

    got = learn_bpe_merges(docs, num_merges=3, merges_per_round=1)
    assert got == want_merges
    toks = {
        r["word"]: tuple(r["tokens"])
        for r in apply_bpe(word_counts(docs), got).collect()
    }
    assert toks == want_seqs
