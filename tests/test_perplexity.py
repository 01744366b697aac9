"""CCNet-style perplexity gate (operators/perplexity.py).

Contract pins: the LM actually separates in-model from out-of-model
text (lower mean surprisal on reference-like docs), unseen-prefix
bigrams cost exactly the add-one floor (256·log2(V)), degenerate docs
(NULL text, <2 tokens) drop out, and the whole stage is JVM-pure —
no Python eval node anywhere in the plan.
"""

from __future__ import annotations

import contextlib
import io

from analytics_etl_spark.operators.perplexity import (
    UNSEEN_SURPRISAL_Q,
    VOCAB_BUCKETS,
    bigram_lm,
    doc_bigram_buckets,
    perplexity_gate,
    perplexity_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_in_model_text_scores_lower_than_unseen(spark):
    """A doc made of reference bigrams must have lower mean surprisal
    than a doc of bigrams the model never saw — the separation the
    gate exists to exploit."""
    ref = _docs(spark, [(0, "the cat sat on the mat"), (1, "the dog sat on the rug")])
    model, backoff = bigram_lm(ref)
    scored = perplexity_score(
        _docs(spark, [(10, "the cat sat on the rug"), (11, "zx qv wp lk jh gf")]),
        model,
        backoff,
    )
    got = {r["doc_id"]: r for r in scored.collect()}
    assert got[10]["ppl_q256"] < got[11]["ppl_q256"]
    # the all-unseen doc: every bigram has an unseen PREFIX too, so its
    # mean surprisal is exactly the add-one floor
    assert got[11]["ppl_q256"] == UNSEEN_SURPRISAL_Q
    assert got[11]["surprisal_q"] == got[11]["n_grams"] * UNSEEN_SURPRISAL_Q


def test_surprisal_quantization_matches_hand_formula(spark):
    """One hand-checkable cell: ref corpus 'a a a' has bigrams
    (a,a)×2, so c2=2, c1=2 and a scoring doc's (a,a) surprisal is
    floor(256·(log2(2+V) − log2(3)))."""
    import math

    ref = _docs(spark, [(0, "a a a")])
    model, backoff = bigram_lm(ref)
    scored = perplexity_score(_docs(spark, [(1, "a a")]), model, backoff)
    row = scored.collect()[0]
    want = math.floor(256.0 * (math.log2(2 + VOCAB_BUCKETS) - math.log2(3)))
    assert row["n_grams"] == 1
    assert row["surprisal_q"] == want == row["ppl_q256"]

    # seen prefix, unseen suffix -> the backoff row: floor(256·log2(c1+V))
    scored2 = perplexity_score(_docs(spark, [(2, "a zz")]), model, backoff)
    want2 = math.floor(256.0 * math.log2(2 + VOCAB_BUCKETS))
    assert scored2.collect()[0]["surprisal_q"] == want2


def test_degenerate_docs_drop_out(spark):
    """NULL text, empty text, and one-word docs have no bigram — no
    defined perplexity — and must yield no row (mirrored by
    construction in the DuckDB oracle)."""
    ref = _docs(spark, [(0, "x y z")])
    model, backoff = bigram_lm(ref)
    docs = _docs(spark, [(1, None), (2, ""), (3, "solo"), (4, "x y")])
    got = {r["doc_id"] for r in perplexity_score(docs, model, backoff).collect()}
    assert got == {4}
    # empty text splits to [''] (one token) in both engines -> 0 bigrams
    assert doc_bigram_buckets(_docs(spark, [(2, "")])).count() == 0


def test_gate_flag_and_plan_purity(spark):
    """keep is a pure integer comparison, and no stage of the gate
    plan contains a Python eval node (the family rides md5/log2/floor
    JVM expressions only)."""
    ref = _docs(spark, [(0, "the cat sat on the mat the cat ran")])
    docs = ref.unionByName(_docs(spark, [(1, "qq ww ee rr tt yy")]))
    gated = perplexity_gate(docs, ref, threshold_q256=UNSEEN_SURPRISAL_Q - 1)
    rows = {r["doc_id"]: r["keep"] for r in gated.collect()}
    assert rows[0] is True and rows[1] is False

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gated.explain("formatted")
    plan = buf.getvalue()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan


def test_model_size_is_vocab_bounded(spark):
    """The scale contract: backoff ≤ V rows and model ≤ observed
    distinct bigram buckets — never corpus-row-sized. (On a tiny
    corpus that's just |distinct bigrams|; the pin is that the model
    tables key on hashed buckets, not raw text.)"""
    ref = _docs(spark, [(i, f"w{i} w{i+1} w{i+2}") for i in range(50)])
    model, backoff = bigram_lm(ref)
    assert backoff.count() <= VOCAB_BUCKETS
    # overlapping docs: the distinct bigrams are (w_j, w_j+1) for
    # j = 0..50 — deduped across docs, i.e. model rows ≪ corpus bigrams
    assert model.count() == 51
    assert set(model.columns) == {"f1", "f2", "s_q"}
    assert set(backoff.columns) == {"f1", "s1_q"}


def test_tertile_buckets_partition_and_order(spark):
    """perplexity_buckets: every scored doc gets exactly one bucket,
    buckets are ordered head ≤ middle ≤ tail in ppl, and with all-
    distinct ppl values the split is an exact tertile (ties can only
    widen a bucket, and this corpus has none)."""
    from analytics_etl_spark.operators.perplexity import perplexity_buckets
    from pyspark.sql import functions as F

    # 9 docs with strictly increasing out-of-model content so ppl
    # values are distinct: doc i repeats i in-model bigrams then pads
    # with unseen words (each unseen pad adds the max surprisal)
    ref_text = "the cat sat on the mat"
    rows = [(0, ref_text)]
    for i in range(1, 10):
        pad = " ".join(f"zz{i}x{j}" for j in range(i))
        rows.append((i, ref_text + " " + pad))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(docs, ref_pred=F.col("doc_id") == 0).collect()
    assert len(out) == 10
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["ppl_q256"])
    ppls = sorted(r["ppl_q256"] for r in out)
    if len(set(ppls)) == len(ppls):  # distinct -> exact tertiles
        assert sorted(len(v) for v in by_bucket.values()) == [3, 3, 4]
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_tertile_boundary_ties_share_a_bucket(spark):
    """Value-level assignment: docs with IDENTICAL text (identical
    ppl_q256) must land in the same bucket even when an exact tertile
    cut would split them — the only deterministic cross-engine rule."""
    from analytics_etl_spark.operators.perplexity import perplexity_buckets
    from pyspark.sql import functions as F

    same = "qq ww ee rr"  # all-unseen -> identical ppl for every copy
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat")] + [(i, same) for i in range(1, 7)],
        "doc_id long, text string",
    )
    out = perplexity_buckets(docs, ref_pred=F.col("doc_id") == 0).collect()
    dup_buckets = {r["bucket"] for r in out if r["doc_id"] >= 1}
    assert len(dup_buckets) == 1


def test_buckets_plan_purity_and_no_corpus_sort(spark):
    """No Python eval node, and the only global-window Sort operates
    on the ppl histogram (bounded domain), never the corpus: assert
    the plan's window sits above the ppl_q256 group-by, and the
    boundary join is a broadcast."""
    import contextlib
    import io

    from analytics_etl_spark.operators.perplexity import perplexity_buckets
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "a b c a b"), (1, "x y z")], "doc_id long, text string"
    )
    out = perplexity_buckets(docs, ref_pred=F.lit(True))
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
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bounds frame
    assert "CartesianProduct" not in plan
