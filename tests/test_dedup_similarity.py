"""Dedup + similarity operator unit tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from analytics_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_dedup,
    simhash_signatures,
    word_shingles,
)
from analytics_etl_spark.operators.similarity import (
    bucketed_cosine_topk,
    cosine_topk,
    sign_bucket,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_identical_texts(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "x y z")])
    out = {r["kept_doc_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out == {1: 2, 3: 1}


def test_word_shingles_short_docs(spark):
    docs = _docs(spark, [(1, "a"), (2, "a b"), (3, "a b c d"), (4, "a a a a")])
    rows = word_shingles(docs, n=3).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["shingle"])
    assert 1 not in per_doc and 2 not in per_doc  # too short
    assert sorted(per_doc[3]) == ["a b c", "b c d"]
    assert per_doc[4] == ["a a a"]  # duplicates collapsed per doc


def test_jaccard_pairs_exact_value(spark):
    # doc1: {a b c, b c d}; doc2: {b c d, c d e} → common 1, union 3
    docs = _docs(spark, [(1, "a b c d"), (2, "b c d e")])
    rows = jaccard_pairs(word_shingles(docs, n=3)).collect()
    assert len(rows) == 1
    assert math.isclose(rows[0]["jaccard"], 1 / 3)


def test_minhash_lsh_finds_identical_and_skips_disjoint(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words about spark engines here"),
        ],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in minhash_lsh_dedup(docs).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert all(3 not in k for k in pairs)


def test_lsh_mega_bucket_cap(spark):
    """The hot-bucket guard: a capped mega-bucket contributes ZERO
    pairs (its quadratic expansion is the 100 TB job-killer); small
    buckets are untouched. Default None preserves exact semantics."""
    from analytics_etl_spark.operators.dedup import lsh_candidate_pairs

    rows = [(i, 0, "fat") for i in range(5)] + [(10, 0, "small"), (11, 0, "small")]
    buckets = spark.createDataFrame(rows, "doc_id long, band int, bucket string")
    assert lsh_candidate_pairs(buckets).count() == 10 + 1
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(buckets, max_bucket_size=4).collect()
    }
    assert capped == {(10, 11)}


def test_simhash_identical_docs_equal_signature(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "zeta eta theta iota"),
        ],
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_cosine_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 8).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]

    got = [r["vec_id"] for r in cosine_topk(emb, q, k=5, exclude_ids=(0,)).collect()]

    v = vecs.astype("float64")
    qv = v[0]
    scores = v @ qv / (np.linalg.norm(v, axis=1) * np.linalg.norm(qv))
    expected = [i for i in np.argsort(-scores) if i != 0][:5]
    assert got == [int(i) for i in expected]


def test_bucketed_topk_is_subset_of_bucket(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(64, 16).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]

    got = bucketed_cosine_topk(emb, q, k=5, bits=4, exclude_ids=(0,)).collect()
    # every hit shares the query's sign bucket
    qb = sum(2**i for i in range(4) if q[i] > 0)
    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.select("vec_id", sign_bucket("embedding", 4).alias("b")).collect()
    }
    assert all(buckets[r["vec_id"]] == qb for r in got)


def test_cosine_topk_pandas_matches_jvm(spark):
    """The Pandas-UDF slow path must rank identically to the JVM
    higher-order-function path."""
    import numpy as np

    from analytics_etl_spark.operators.similarity import cosine_topk_pandas

    rng = np.random.RandomState(3)
    vecs = rng.randn(40, 12).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    jvm = [(r["vec_id"], round(r["score"], 9)) for r in cosine_topk(emb, q, 8, exclude_ids=(0,)).collect()]
    pud = [(r["vec_id"], round(r["score"], 9)) for r in cosine_topk_pandas(emb, q, 8, exclude_ids=(0,)).collect()]
    assert jvm == pud


def test_connected_components_chain_and_islands(spark):
    """A chain a~b~c collapses to one cluster (min id canonical);
    disjoint components stay separate; fixpoint is order-independent."""
    from analytics_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_raises_when_unconverged(spark):
    """A chain longer than max_iter must fail loudly, not return a
    silently split component."""
    import pytest

    from analytics_etl_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # converging EXACTLY on the final allowed round is success, not an
    # error (the final probe distinguishes "last round still changed"
    # from "genuinely unconverged")
    got = {r["cluster_id"] for r in connected_components(chain, max_iter=8).collect()}
    assert got == {0}
    # and with headroom the same chain is one cluster
    got = {r["cluster_id"] for r in connected_components(chain, max_iter=10).collect()}
    assert got == {0}


def test_verify_jaccard_tolerates_duplicate_pairs(spark):
    """A duplicated candidate pair must still be scored once — not
    silently dropped by the exactly-two-sides melt check."""
    from analytics_etl_spark.operators.dedup import shingle_arrays, verify_jaccard

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    arrays = shingle_arrays(docs, n=3, distinct=True)
    pairs = spark.createDataFrame([(1, 2), (1, 2)], "doc_a long, doc_b long")
    rows = verify_jaccard(arrays, pairs).collect()
    assert len(rows) == 1
    assert abs(rows[0]["jaccard"] - 1 / 3) < 1e-12  # {abc,bcd}∩{abc,bce}=1 of 3


def test_minhash_lsh_persisted_shingles_single_scan(spark, tmp_path):
    """The ingest-time deployment shape: shingles written as a table
    column once (with_shingle_column), query-time dedup reads them —
    identical pairs to the compute-at-query form, and the query plan
    contains ZERO Python nodes (the Arrow kernel never runs)."""
    import contextlib
    import io

    from analytics_etl_spark.operators.dedup import with_shingle_column

    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with no overlap at all here"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
    )
    path = str(tmp_path / "docs_shingled")
    with_shingle_column(docs, n=3).write.parquet(path)

    persisted = spark.read.parquet(path)
    fresh = minhash_lsh_dedup(docs, min_jaccard=0.5)
    from_col = minhash_lsh_dedup(persisted, min_jaccard=0.5, shingles_col="shingles")

    key = lambda rows: {(r["doc_a"], r["doc_b"]): round(r["jaccard"], 12) for r in rows}  # noqa: E731
    assert key(from_col.collect()) == key(fresh.collect())

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        from_col.explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" not in plan and "Python" not in plan
    # and the fresh form pays the kernel (twice: signatures + verify)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fresh.explain("formatted")
    assert "ArrowEvalPython" in buf.getvalue()


def test_int8_quantization_bounds_and_ranking(spark):
    """Quantization invariants: codes stay in [-127, 127], the max-|v|
    dim hits exactly ±127, reconstruction error per dim is ≤ scale/2,
    and the all-zero vector quantizes to zeros (no NaN from the scale
    guard)."""
    from analytics_etl_spark.operators.similarity import (
        as_double_array,
        int8_quantize,
        int8_scale,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, -0.5, 0.25, 0.1]),
            (1, [-2.0, 2.0, 0.0, 1.99]),
            (2, [0.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    v = as_double_array("embedding")
    sc = int8_scale(v)
    rows = {
        r["vec_id"]: r
        for r in emb.select("vec_id", sc.alias("sc"), int8_quantize(v, sc).alias("q"))
        .collect()
    }
    assert rows[2]["q"] == [0, 0, 0, 0] and rows[2]["sc"] == 0.0
    for vid, vec in ((0, [1.0, -0.5, 0.25, 0.1]), (1, [-2.0, 2.0, 0.0, 1.99])):
        q, s = rows[vid]["q"], rows[vid]["sc"]
        assert max(abs(x) for x in q) == 127
        assert all(-127 <= x <= 127 for x in q)
        assert all(abs(x - qi * s) <= s / 2 + 1e-12 for x, qi in zip(vec, q))


def test_incremental_dedup_batch_vs_corpus_only(spark, tmp_path):
    """Incremental dedup pairs are strictly batch x corpus: identical
    docs WITHIN the batch (3,4) or within the corpus (0,1) never pair;
    the cross duplicate (0~3) does. The persisted-shingles path gives
    identical results with zero query-time Python."""
    from analytics_etl_spark.operators.dedup import (
        incremental_minhash_dedup,
        with_shingle_column,
    )

    same = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely unrelated words with nothing shared at all here okay"
    corpus = _docs(spark, [(0, same), (1, same), (2, other)])
    batch = _docs(spark, [(3, same), (4, same), (5, "entirely novel content never seen before in any document")])

    got = {
        (r["batch_doc"], r["corpus_doc"]): r["jaccard"]
        for r in incremental_minhash_dedup(corpus, batch, min_jaccard=0.5).collect()
    }
    assert set(got) == {(3, 0), (3, 1), (4, 0), (4, 1)}
    assert all(j == 1.0 for j in got.values())

    cpath, bpath = str(tmp_path / "corpus"), str(tmp_path / "batch")
    with_shingle_column(corpus, n=3).write.parquet(cpath)
    with_shingle_column(batch, n=3).write.parquet(bpath)
    got2 = {
        (r["batch_doc"], r["corpus_doc"]): r["jaccard"]
        for r in incremental_minhash_dedup(
            spark.read.parquet(cpath),
            spark.read.parquet(bpath),
            min_jaccard=0.5,
            shingles_col="shingles",
        ).collect()
    }
    assert got2 == got


def test_pagerank_int_partition_invariant_and_sane(spark):
    """Integer fixed-point PageRank: identical bits under a different
    partitioning (the property float PageRank lacks), higher-degree
    hubs outrank leaves, total mass stays near n·scale (truncation
    loses < deg/scale per node per round)."""
    from analytics_etl_spark.operators.graph import pagerank_int

    # star (hub 0 ↔ 1..4) plus a detached pair (10 ↔ 11), symmetrized
    fwd = [(0, i) for i in range(1, 5)] + [(10, 11)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], ["src", "dst"]
    )
    r1 = {r["node"]: r["rank"] for r in pagerank_int(edges, iters=4).collect()}
    r2 = {
        r["node"]: r["rank"]
        for r in pagerank_int(edges.repartition(7), iters=4).collect()
    }
    assert r1 == r2
    assert r1[0] > r1[1]  # hub beats leaf
    assert r1[1] == r1[2] == r1[3] == r1[4]  # symmetric leaves tie exactly
    scale = 10**12
    total = sum(r1.values())
    assert 0 <= (len(r1) * scale - total) < len(r1) * 4 * 10 * 4  # tiny truncation loss


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """Quantified quality of the LSH shortcut: against EXACT pairwise
    Jaccard (the oracle-checked jaccard_pairs), the banded MinHash
    candidate-then-verify pipeline must find every high-similarity
    pair (recall 1.0 at j >= 0.7 on this corpus) and most of the
    borderline band (>= 0.8 at j >= 0.5). Verified pairs carry exact
    Jaccard, so precision is 1.0 by construction — the measured
    quantity is what the BANDING might miss."""
    from analytics_etl_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_dedup,
        word_shingles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(word_shingles(docs, n=3), min_jaccard=0.5).collect()
    }
    found = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_dedup(docs, min_jaccard=0.5).collect()
    }
    assert found <= set(exact)  # precision 1.0: verify step is exact
    high = {p for p, j in exact.items() if j >= 0.7}
    mid = set(exact)
    assert high, "corpus should contain high-similarity pairs"
    assert len(found & high) == len(high), "missed a j>=0.7 pair"
    recall_mid = len(found & mid) / len(mid)
    assert recall_mid >= 0.8, recall_mid


def test_substring_spans_persisted_parity_and_narrow_scan(spark, tmp_path):
    """with_span_hashes (VERDICT r5 item 4): span hashes written once
    at ingest; substring_span_duplicates(spans_col=...) returns
    IDENTICAL rows to the inline form, short docs contribute an empty
    array (never fabricated descending-range spans), and the
    query-time scan reads only (doc_id, span_hashes) — the text column
    is pruned from ReadSchema."""
    import contextlib
    import io

    from analytics_etl_spark.operators.dedup import (
        substring_span_duplicates,
        with_span_hashes,
    )

    boiler = " ".join(f"w{i}" for i in range(20))
    docs = _docs(
        spark,
        [
            (1, boiler + " tail one here"),
            (2, "lead in text " + boiler),
            (3, "completely different body with nothing shared at all " * 3),
            (4, "short doc"),  # < span_words: must contribute nothing
        ],
    )
    path = str(tmp_path / "docs_spanned")
    with_span_hashes(docs, span_words=20).write.parquet(path)
    persisted = spark.read.parquet(path)

    # short doc persisted an EMPTY array, not NULL / bogus spans
    short = persisted.filter(F.col("doc_id") == 4).first()
    assert short["span_hashes"] == []

    fresh = substring_span_duplicates(docs, span_words=20)
    from_col = substring_span_duplicates(persisted, spans_col="span_hashes")
    key = lambda rows: {  # noqa: E731
        r["span_hash"]: (r["n_docs"], r["n_occurrences"]) for r in rows
    }
    got = key(from_col.collect())
    assert got == key(fresh.collect()) and got  # non-empty: the shared span found

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        from_col.explain("formatted")
    plan = buf.getvalue()
    assert "Python" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line and "span_hashes" in line:
            assert "text" not in line
            break
    else:
        import pytest

        pytest.fail("span_hashes ReadSchema not found")


def test_scorable_vector_gate_and_guarded_cosine(spark):
    """The r8 hostile-embeddings contract: scorable_vector admits only
    non-NULL, right-dimension, all-finite, positive-norm vectors; the
    guarded cosine NULLs (never NaNs) a zero-norm score; and the
    Arrow/pandas scoring path survives — and masks — the same junk."""
    from pyspark.sql import functions as F

    from analytics_etl_spark.operators.similarity import (
        as_double_array,
        cosine,
        cosine_topk_pandas,
        scorable_vector,
        valid_embeddings,
    )

    inf, nan = float("inf"), float("nan")
    rows = [
        (0, [1.0, 2.0, 2.0]),        # valid
        (1, [0.0, 0.0, 0.0]),        # zero norm
        (2, None),                   # NULL vector
        (3, [1.0, None, 1.0]),       # NULL component
        (4, [1.0, nan, 1.0]),        # NaN component
        (5, [1.0, inf, 1.0]),        # +Inf component
        (6, [1.0, -inf, 1.0]),       # -Inf component
        (7, [1.0, 1.0]),             # too short
        (8, [1.0, 1.0, 1.0, 1.0]),   # too long
        (9, [3.0, 0.0, 4.0]),        # valid
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {
        r["vec_id"]
        for r in valid_embeddings(emb, dim=3).select("vec_id").collect()
    }
    assert kept == {0, 9}

    # guarded cosine: zero-norm -> NULL (not NaN, not an ANSI abort),
    # and a NaN norm ALSO NULLs (ADVICE r8: NaN > 0 is true in Spark,
    # so the bare > 0 guard used to leak NaN scores from ungated
    # callers while the pandas path masked them — the two scoring
    # paths must agree bit for bit)
    q = F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))
    scored = emb.filter(F.col("vec_id").isin(0, 1, 4)).select(
        "vec_id", cosine(as_double_array("embedding"), q).alias("s")
    )
    got = {r["vec_id"]: r["s"] for r in scored.collect()}
    assert got[1] is None
    assert got[4] is None  # NaN component -> NaN norm -> NULL, not NaN
    assert abs(got[0] - 1.0 / 3.0) < 1e-12

    # pandas path: same masking (needs non-ragged input: gate + known
    # dim first, as every registered query does)
    pdf = cosine_topk_pandas(
        emb.filter(F.col("vec_id").isin(0, 1, 9)), [1.0, 0.0, 0.0], k=3
    ).collect()
    by_id = {r["vec_id"]: r["score"] for r in pdf}
    assert by_id[1] is None
    assert abs(by_id[9] - 0.6) < 1e-12


def test_sign_bucket_never_raises_on_short_vectors(spark):
    """sign_bucket uses get() (NULL past the end), so a ragged hostile
    vector cannot abort the scan under ANSI even if Catalyst evaluates
    the bucket expression before the validity gate."""
    from analytics_etl_spark.operators.similarity import sign_bucket

    emb = spark.createDataFrame(
        [(0, [1.0, -1.0]), (1, [float("nan")] * 2), (2, None)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", sign_bucket("embedding", 8).alias("b")
        ).collect()
    }
    # missing dims contribute 0; NaN > 0 follows Spark's NaN-largest
    # rule in BOTH engines (gated rows never reach scoring anyway)
    assert got[0] == 1 and got[2] == 0


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    """A 5-word doc fully inside a 50-word doc: containment = 1.0,
    Jaccard ≈ |A|/|B| — the asymmetric measure's whole point."""
    from analytics_etl_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        word_shingles,
    )

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i}" for i in range(45))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally unrelated words here")],
        "doc_id long, text string",
    )
    sh = word_shingles(docs, n=3, distinct=True)
    cont = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in containment_pairs(sh, 0.2).collect()}
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in jaccard_pairs(sh, 0.0).collect()}
    assert cont[(1, 2)] == 1.0
    assert jac[(1, 2)] < 0.1  # the symmetric measure under-ranks it
    assert (1, 3) not in cont and (2, 3) not in cont


def test_paragraph_dedup_drops_cross_corpus_boilerplate(spark):
    """CCNet §4.1 semantics on planted newline paragraphs: a footer
    shared by 3 docs survives only at its corpus-first (min doc_id,
    min pos) occurrence; a paragraph repeated only WITHIN one doc is
    kept whole; a doc that is pure boilerplate comes back with
    n_kept=0 and empty text; NULL text and whitespace-only paragraphs
    are excluded."""
    from analytics_etl_spark.operators.dedup import paragraph_dedup

    footer = "copyright acme corp all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha text\n{footer}\nmore alpha prose"),
            (2, f"{footer}\nunique beta text"),
            (3, footer),
            (4, "self repeat\nself repeat\nother line"),
            (5, None),
            (6, "   \n\t"),  # canonical-empty paragraphs only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    # doc 1 holds the corpus-first footer occurrence: keeps all 3
    assert out[1]["n_pars"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["text_dedup"] == f"unique alpha text\n{footer}\nmore alpha prose"
    # docs 2 and 3 lose their footer copy
    assert out[2]["n_pars"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_dedup"] == "unique beta text"
    assert out[3]["n_pars"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["text_dedup"] == ""
    # intra-doc repetition is NOT corpus boilerplate: kept whole
    assert out[4]["n_kept"] == 3
    assert out[4]["text_dedup"] == "self repeat\nself repeat\nother line"
    # NULL text and all-whitespace docs never reach the output
    assert 5 not in out and 6 not in out


def test_word_chunk_paragraphs_lossless_reassembly(spark):
    """Aligned word chunks cover every word exactly once (incl. the
    shorter trailing chunk), so join(chunks, ' ') == original text;
    paragraph_dedup over them with no cross-doc dups keeps every doc
    intact."""
    from analytics_etl_spark.operators.dedup import (
        paragraph_dedup,
        word_chunk_paragraphs,
    )

    texts = [
        " ".join(f"w{i}{j}" for j in range(n))  # unique words per doc
        for i, n in enumerate((1, 9, 10, 11, 25, 30))
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    joined = docs.select(
        "doc_id",
        F.array_join(word_chunk_paragraphs(width=10), " ").alias("re"),
        "text",
    ).collect()
    assert all(r["re"] == r["text"] for r in joined)
    out = paragraph_dedup(
        docs, paragraphs=word_chunk_paragraphs(width=10), joiner=" "
    ).collect()
    assert len(out) == len(texts)
    assert all(r["n_kept"] == r["n_pars"] for r in out)
    by_id = {r["doc_id"]: r["text_dedup"] for r in out}
    assert by_id == {i: t for i, t in enumerate(texts)}


def test_paragraph_dedup_intradoc_collapses_within_doc_only(spark):
    """The complement contract: intra-doc repeats collapse to their
    first occurrence, but paragraphs shared ACROSS docs are untouched
    (no corpus-wide state consulted)."""
    from analytics_etl_spark.operators.dedup import paragraph_dedup_intradoc

    menu = "home products about contact"
    docs = spark.createDataFrame(
        [
            (1, f"{menu}\nreal alpha prose\n{menu}\nmore alpha\n{menu}"),
            (2, f"{menu}\nreal beta prose"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup_intradoc(docs).collect()}
    assert out[1]["n_pars"] == 5 and out[1]["n_kept"] == 3
    assert out[1]["text_dedup"] == f"{menu}\nreal alpha prose\nmore alpha"
    # doc 2's copy of the menu survives — cross-doc sharing is the
    # OTHER operator's job
    assert out[2]["n_kept"] == 2
    assert out[2]["text_dedup"] == f"{menu}\nreal beta prose"
    assert 3 not in out


def test_scrub_paragraphs_removes_eval_text_only(spark):
    """Paragraph-level decontamination: the leaked quote goes, the
    rest of the document stays; a pool doc that IS eval text scrubs
    to empty; bench-internal structure is irrelevant (only pool docs
    are returned)."""
    from analytics_etl_spark.operators.dedup import scrub_paragraphs

    quote = "what is the capital of france"
    bench = spark.createDataFrame(
        [(900, f"{quote}\nparis of course")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, f"long clean prose\n{quote}\nmore clean prose"),
            (2, "totally unrelated text"),
            (3, quote),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_paragraphs(docs, bench).collect()}
    assert out[1]["n_pars"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["text_dedup"] == "long clean prose\nmore clean prose"
    assert out[2]["n_kept"] == 1
    assert out[3]["n_kept"] == 0 and out[3]["text_dedup"] == ""
    assert set(out) == {1, 2, 3}  # bench docs never in the output
