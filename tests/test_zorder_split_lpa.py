"""Round-13 extensions: exact-integer z-order key, cluster-safe
splitting, and deterministic label propagation.

Each operator's oracle-side twin is exercised by check_oracle
(queries/llm3.py); here we pin the CONTRACTS: bit-level parity with
independent pure-Python references, the no-leakage invariant the
cluster-safe split exists for, and LPA's determinism under
repartitioning.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from analytics_etl_spark.operators.layout import quantize, zorder_key, zorder_key_sql
from analytics_etl_spark.operators.sampling import cluster_safe_split, dataset_split


# --- z-order key ---------------------------------------------------------


def _morton_ref(vals: list[int], bits: int) -> int:
    """Independent pure-Python Morton interleave (no shared code)."""
    z = 0
    k = len(vals)
    for d, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * k + d)
    return z


def test_zorder_key_matches_pure_python_exhaustively(spark):
    """Every (x, y) in the full 3-bit grid, plus a 3-dim spot grid."""
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=3).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_ref([x, y], 3), (x, y)
    # 3 dimensions: bit d of dim k lands at i*3 + d
    df3 = spark.createDataFrame([(1, 2, 4)], "a int, b int, c int")
    z3 = df3.select(zorder_key(["a", "b", "c"], bits=3).alias("z")).first().z
    assert z3 == _morton_ref([1, 2, 4], 3)


def test_zorder_key_sql_is_the_same_arithmetic():
    """The DuckDB twin computes the identical integer, including the
    mask that makes stray high/sign bits harmless."""
    import duckdb

    con = duckdb.connect()
    for x, y in [(0, 0), (7, 5), (4095, 1), (5000, -3)]:  # incl. out-of-mask
        got = con.execute(
            f"SELECT {zorder_key_sql([str(x), str(y)], bits=12)}"
        ).fetchone()[0]
        assert got == _morton_ref([x, y], 12), (x, y)


def test_zorder_key_null_dim_yields_null_key(spark):
    df = spark.createDataFrame([(1, None)], "x int, y int")
    assert df.select(zorder_key(["x", "y"], bits=4).alias("z")).first().z is None


def test_zorder_key_validation():
    with pytest.raises(ValueError, match="plain sort"):
        zorder_key(["x"], bits=8)
    with pytest.raises(ValueError, match="63"):
        zorder_key(["a", "b", "c"], bits=32)


def test_quantize_maps_and_clamps(spark):
    df = spark.createDataFrame(
        [(-5,), (0,), (50,), (99,), (100,), (140,)], "v int"
    )
    got = [
        r.b
        for r in df.select(quantize("v", lo=0, hi=99, bits=2).alias("b"))
        .orderBy("v")
        .collect()
    ]
    # [0, 100) in 4 equal buckets of 25; out-of-range clamps to edges
    assert got == [0, 0, 2, 3, 3, 3]
    with pytest.raises(ValueError, match="hi > lo"):
        quantize("v", lo=5, hi=5, bits=4)
    with pytest.raises(ValueError, match="bits"):
        quantize("v", lo=0, hi=9, bits=0)


# --- cluster-safe split --------------------------------------------------


def _naive_splits(spark, ids: list[int]) -> dict[int, str]:
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    return {r.doc_id: r.split for r in dataset_split(df).collect()}


def test_cluster_safe_split_closes_the_leak_naive_split_has(spark):
    """Construct a near-dup pair the NAIVE split provably puts in two
    different splits, then assert cluster_safe_split (a) puts every
    cluster entirely in one split, (b) leaves non-duplicated docs
    bit-identical to plain dataset_split."""
    ids = list(range(1, 4001))
    naive = _naive_splits(spark, ids)
    by_split = defaultdict(list)
    for i, s in naive.items():
        by_split[s].append(i)
    assert by_split["train"] and by_split["test"], "fixture needs both splits"
    # the leaking pair: one train doc ~ one test doc
    a, b = min(by_split["train"]), min(by_split["test"])
    # a second cluster plus a chain, to exercise transitivity
    c1, c2, c3 = by_split["train"][1], by_split["train"][2], by_split["test"][1]
    edges = spark.createDataFrame(
        [(a, b), (c1, c2), (c2, c3)], "doc_a long, doc_b long"
    )
    assert naive[a] != naive[b], "naive split leaks this pair by construction"

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = cluster_safe_split(df, edges).collect()
    split_of = {r.doc_id: r.split for r in out}
    cluster_of = {r.doc_id: r.cluster_id for r in out}

    # (a) no cluster straddles splits — the invariant the op exists for
    per_cluster = defaultdict(set)
    for r in out:
        per_cluster[r.cluster_id].add(r.split)
    assert all(len(s) == 1 for s in per_cluster.values())
    assert split_of[a] == split_of[b]
    assert split_of[c1] == split_of[c2] == split_of[c3]
    # transitive cluster got ONE id: the min member
    assert cluster_of[c1] == cluster_of[c2] == cluster_of[c3] == min(c1, c2, c3)

    # (b) every non-duplicated doc matches plain dataset_split exactly
    clustered = {a, b, c1, c2, c3}
    for i in ids:
        if i not in clustered:
            assert cluster_of[i] == i
            assert split_of[i] == naive[i], i


def test_cluster_safe_split_custom_id_col(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "item_id long")
    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    out = cluster_safe_split(df, edges, id_col="item_id").collect()
    split_of = {r.item_id: r.split for r in out}
    assert split_of[1] == split_of[2]


# --- label propagation ---------------------------------------------------


def _lpa_ref(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Independent pure-Python LPA: synchronous, self-vote, min-label
    ties — naive loops, no shared code with the operator."""
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    nodes = sorted(adj)
    lbl = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            votes = Counter(lbl[m] for m in adj[n])
            votes[lbl[n]] += 1
            new[n] = min(votes, key=lambda x: (-votes[x], x))
        lbl = new
    return lbl


def _run_lpa(spark, edges, rounds=4):
    from analytics_etl_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long")
    out = label_propagation(df, rounds=rounds)
    return {r.node: r.community for r in out.collect()}


def test_lpa_two_triangles_with_bridge(spark):
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    got = _run_lpa(spark, edges)
    assert got == _lpa_ref(edges, 4)
    # qualitative: the triangles resolve to two distinct communities
    assert got[1] == got[2] == got[3]
    assert got[5] == got[6]
    assert got[1] != got[5]


def test_lpa_matches_reference_on_pseudo_random_graph(spark):
    # deterministic fixture: ring + md5-free arithmetic chords
    edges = [(i, (i + 1) % 60) for i in range(60)]
    edges += [(i, (i * 7 + 3) % 60) for i in range(0, 60, 2)]
    edges = [(u, v) for u, v in edges if u != v]
    # dedup undirected duplicates (the operator's documented contract)
    edges = sorted({(min(u, v), max(u, v)) for u, v in edges})
    for rounds in (1, 3, 4):
        assert _run_lpa(spark, edges, rounds) == _lpa_ref(edges, rounds), rounds


def test_lpa_deterministic_under_repartition(spark):
    from analytics_etl_spark.operators.graph import label_propagation

    edges = sorted({(min(u, v), max(u, v)) for u, v in
                    [(i, (i * 11 + 5) % 40) for i in range(40)] if u != v})
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {(r.node, r.community) for r in label_propagation(df, rounds=4).collect()}
    b = {
        (r.node, r.community)
        for r in label_propagation(df.repartition(7), rounds=4).collect()
    }
    assert a == b


def test_lpa_drops_self_loops_and_validates(spark):
    from analytics_etl_spark.operators.graph import label_propagation

    with_loop = spark.createDataFrame(
        [(1, 2), (2, 2), (2, 3)], "src long, dst long"
    )
    without = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got_a = {(r.node, r.community) for r in label_propagation(with_loop).collect()}
    got_b = {(r.node, r.community) for r in label_propagation(without).collect()}
    assert got_a == got_b
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(without, rounds=0)


def test_label_propagation_duplicate_edges_ignored(spark):
    """A duplicated input row must NOT double-weight a neighbor's
    vote: the operator deduplicates the symmetrized edge frame itself
    (r13 advice), so a caller that forgets .distinct() still gets the
    simple-graph answer."""
    from analytics_etl_spark.operators.graph import label_propagation

    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    simple = spark.createDataFrame(edges, "src long, dst long")
    # duplicate the (3,4) bridge 5x, once in reversed orientation —
    # if votes were weighted, node 4's pull on 3 would change rounds
    noisy = spark.createDataFrame(
        edges + [(3, 4)] * 4 + [(4, 3)], "src long, dst long"
    )
    a = {(r.node, r.community) for r in label_propagation(simple, rounds=4).collect()}
    b = {(r.node, r.community) for r in label_propagation(noisy, rounds=4).collect()}
    assert a == b


# --- duplicate-span removal ----------------------------------------------


def test_remove_duplicate_spans_hand_checked(spark):
    """Crafted corpus, span_words=3, every expectation hand-derived:
    cross-doc copy cut (canonical doc untouched), full-doc duplicate
    emptied, within-doc repeat cut, short/NULL docs pass through."""
    from analytics_etl_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "x y a b c z"),
            (3, "q r s"),
            (4, "a b c d e"),
            (5, None),
            (6, "one two"),
            (7, "m n o p m n o"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_duplicate_spans(docs, span_words=3).collect()
    }
    assert out[1] == ("a b c d e", 0)  # canonical occurrences keep their text
    assert out[2] == ("x y z", 3)  # cross-doc copy cut, survivors re-joined
    assert out[3] == ("q r s", 0)  # unique span untouched
    assert out[4] == ("", 5)  # full duplicate of doc 1: all words cut
    assert out[5] == (None, 0)  # NULL text passes through
    assert out[6] == ("one two", 0)  # shorter than a span: no spans, no cuts
    assert out[7] == ("m n o p", 3)  # within-doc repeat: second occurrence cut


def test_remove_duplicate_spans_overlap_not_double_counted(spark):
    """Two overlapping duplicated spans union their covered positions:
    n_removed counts positions once."""
    from analytics_etl_spark.operators.dedup import remove_duplicate_spans

    # doc 2 copies FOUR consecutive words of doc 1 -> two overlapping
    # duplicated 3-spans covering 4 positions, not 6
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "p q a b c d r")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_duplicate_spans(docs, span_words=3).collect()
    }
    assert out[2] == ("p q r", 4)


def test_remove_duplicate_spans_validates(spark):
    from analytics_etl_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        remove_duplicate_spans(docs, stride=0)
    # stride>1 would silently miss duplicated spans at unsampled
    # offsets — a removal operator may not trade recall, so it raises
    with pytest.raises(ValueError, match="stride=1"):
        remove_duplicate_spans(docs, stride=2)


def test_quantize_exact_at_float_breaking_magnitudes(spark):
    """Spark's `/` is DOUBLE division; above 2^53 the quotient guess
    misrounds ((2^60-2)/2^60 rounds UP to 1.0). quantize's integer
    correction must hold the exact floor."""
    hi = (1 << 60) - 1
    df = spark.createDataFrame(
        [((1 << 59) - 1,), (1 << 59,), (hi,), (0,)], "v long"
    )
    got = {
        r.v: r.b
        for r in df.select("v", quantize("v", lo=0, hi=hi, bits=1).alias("b")).collect()
    }
    # bucket = (v * 2) // 2^60: 2^59-1 -> 0 (the float guess says 1)
    assert got[(1 << 59) - 1] == 0
    assert got[1 << 59] == 1
    assert got[hi] == 1
    assert got[0] == 0


def test_cluster_safe_split_rejects_cluster_id_collision(spark):
    df = spark.createDataFrame([(1, 9)], "doc_id long, cluster_id long")
    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="cluster_id"):
        cluster_safe_split(df, edges)
