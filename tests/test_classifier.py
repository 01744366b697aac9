"""Hashed-NB quality classifier (operators/classifier.py).

Contract pins: the model actually learns when the classes are
separable (planted two-vocabulary corpus → perfect split — the
registered query's in-corpus accuracy is chance BY CONSTRUCTION, see
its docstring, so learnability must be pinned here), the fixed-point
weight of a hand-countable cell matches the formula, a novel-vocab
doc's score is exactly the smoothed singleton terms, degenerate
inputs follow the house contracts (NULL
text excluded, NULL label → negative class), and the whole stage is
JVM-pure.
"""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import functions as F

from analytics_etl_spark.operators.classifier import nb_classifier_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _sep_corpus(spark):
    """Two disjoint vocabularies: en docs speak {aa,bb,cc}, others
    {xx,yy,zz} — fully separable."""
    rows = [(i, "aa bb cc aa bb", "en") for i in range(6)]
    rows += [(10 + i, "xx yy zz xx yy", "xx") for i in range(6)]
    return _docs(spark, rows)


def test_separable_corpus_classifies_perfectly(spark):
    out = nb_classifier_scores(_sep_corpus(spark), F.col("lang") == "en")
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert r["pred_ref"] is (r["is_ref"] is True)
        # separable classes: scores are strictly signed, not boundary
        assert (r["score_q"] > 0) == r["is_ref"]


def test_weight_formula_hand_checked(spark):
    """One pos doc 'a a a', one neg doc 'b': V_obs=2, N_pos=3,
    N_neg=1, D_pos=D_neg=1. Score of a one-token doc 'a' in the pos
    class: c('a')=3 pos / 0 neg, so
    score = [q(4)-q(1)] + 1·[q(N_neg+V)-q(N_pos+V)] + [q(2)-q(2)]."""
    corpus = _docs(spark, [(0, "a a a", "en"), (1, "b", "xx")])
    out = {
        r["doc_id"]: r
        for r in nb_classifier_scores(corpus, F.col("lang") == "en").collect()
    }

    def q(x):
        return math.floor(256.0 * math.log2(x))

    # doc 1 = the single token 'b': c_pos=0, c_neg=1
    want_b = (q(1) - q(2)) + 1 * (q(1 + 2) - q(3 + 2)) + (q(2) - q(2))
    assert out[1]["score_q"] == want_b
    assert out[1]["n_tokens"] == 1
    # doc 0 = 'a a a': per-token w = q(4)-q(1), 3 tokens
    want_a = 3 * (q(4) - q(1)) + 3 * (q(3) - q(5)) + (q(2) - q(2))
    assert out[0]["score_q"] == want_a


def test_novel_vocab_doc_exact_score(spark):
    """Train-on-self: a doc whose words appear nowhere else still
    contributes its own tokens to the (negative-class) counts, so each
    carries exactly the smoothed singleton weight q(1)−q(2); the rest
    of the score is the normalizer and prior terms, hand-computed."""
    corpus = _sep_corpus(spark).unionByName(
        _docs(spark, [(99, "qq ww ee rr tt", None)])
    )
    out = {
        r["doc_id"]: r
        for r in nb_classifier_scores(corpus, F.col("lang") == "en").collect()
    }
    q = lambda x: math.floor(256.0 * math.log2(x))  # noqa: E731
    # V_obs counts buckets seen in EITHER class incl. doc 99's own
    # tokens; N_neg includes them too
    n_pos, n_neg, v_obs = 30, 35, 11
    d_pos, d_neg = 6, 7
    want = (
        5 * (q(1) - q(2))
        + 5 * (q(n_neg + v_obs) - q(n_pos + v_obs))
        + (q(d_pos + 1) - q(d_neg + 1))
    )
    assert out[99]["score_q"] == want
    # NULL lang coalesced to the negative class
    assert out[99]["is_ref"] is False


def test_null_text_excluded_and_plan_purity(spark):
    corpus = _sep_corpus(spark).unionByName(_docs(spark, [(50, None, "en")]))
    out = nb_classifier_scores(corpus, F.col("lang") == "en")
    assert out.filter(F.col("doc_id") == 50).count() == 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    for node in (
        "ArrowEvalPython",
        "BatchEvalPython",
        "MapInPandas",
        "FlatMapGroupsInPandas",
    ):
        assert node not in plan


def test_cache_handles_lifetime_hook(spark):
    handles = []
    out = nb_classifier_scores(
        _sep_corpus(spark), F.col("lang") == "en", cache_handles=handles
    )
    out.count()
    assert len(handles) == 1 and handles[0].is_cached
    handles[0].unpersist()
    assert not handles[0].is_cached


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_token = st.sampled_from(["aa", "bb", "cc", "xx", "yy", "the", "", "zz1"])


def _ref_nb_scores(rows):
    """Pure-Python replay of the fixed-point NB formula (md5 buckets,
    per-term floor-quantized log2, observed-V smoothing)."""
    import hashlib
    import math
    from collections import Counter

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 65536

    def q(x):
        return math.floor(256.0 * math.log2(x))

    cb = Counter()
    docs = []
    for doc_id, text, is_ref in rows:
        if text is None:
            continue
        toks = [bucket(w) for w in text.split(" ")]
        docs.append((doc_id, is_ref, toks))
        for b in toks:
            cb[(is_ref, b)] += 1
    vocab = {b for _, b in cb}
    n_pos = sum(n for (ref, _), n in cb.items() if ref)
    n_neg = sum(n for (ref, _), n in cb.items() if not ref)
    d_pos = sum(1 for _, is_ref, _ in docs if is_ref)
    d_neg = len(docs) - d_pos
    w_q = {
        b: q(cb.get((True, b), 0) + 1) - q(cb.get((False, b), 0) + 1)
        for b in vocab
    }
    out = {}
    for doc_id, is_ref, toks in docs:
        score = (
            sum(w_q[b] for b in toks)
            + len(toks) * (q(n_neg + len(vocab)) - q(n_pos + len(vocab)))
            + (q(d_pos + 1) - q(d_neg + 1))
        )
        out[doc_id] = score
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.lists(_token, min_size=1, max_size=10),
            st.booleans(),
        ),
        min_size=2,
        max_size=10,
    ).filter(lambda rs: any(r[1] for r in rs) and any(not r[1] for r in rs))
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_nb_scores_match_reference_on_random_corpora(spark, rows):
    data = [
        (i, " ".join(toks), "en" if is_ref else "xx")
        for i, (toks, is_ref) in enumerate(rows)
    ]
    want = _ref_nb_scores([(i, t, lang == "en") for i, t, lang in data])
    got = {
        r["doc_id"]: r["score_q"]
        for r in nb_classifier_scores(
            _docs(spark, data), F.col("lang") == "en"
        ).collect()
    }
    assert got == want
