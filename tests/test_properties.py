"""Property-based invariants (hypothesis) for core operators.

Small example counts — each example is a Spark job; the point is the
generator's edge cases (empty strings, nulls, boundary values), not
volume.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),  # value
    ),
    min_size=0,
    max_size=20,
)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_quarantine_partitions_every_row(spark, rows):
    """valid ∪ rejects == input, disjoint — even with NULL predicates."""
    from analytics_etl_spark.operators.etl import quarantine

    df = spark.createDataFrame(rows, "k int, v int") if rows else spark.createDataFrame(
        [], "k int, v int"
    )
    valid, rejects = quarantine(df, F.col("v") > 0)  # NULL v → reject
    assert valid.count() + rejects.count() == len(rows)
    assert valid.filter(~(F.col("v") > 0)).count() == 0


@given(
    cents=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=15)
)
@settings(**SETTINGS)
def test_cents_to_dollars_roundtrip(spark, cents):
    from analytics_etl_spark.functions.money import cents_to_dollars

    df = spark.createDataFrame([(c,) for c in cents], "cents long")
    out = df.select(
        "cents", (cents_to_dollars("cents") * 100).cast("long").alias("back")
    ).collect()
    assert all(r["back"] == r["cents"] for r in out)


@given(
    left_times=st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=12),
    right_times=st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=12),
)
@settings(**SETTINGS)
def test_asof_join_invariants(spark, left_times, right_times):
    """Left row count preserved; payload is the max right time <= t."""
    import datetime as dt

    from analytics_etl_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, ts(m), i) for i, m in enumerate(left_times)] or [],
        "k int, t timestamp_ntz, idx int",
    )
    right = spark.createDataFrame(
        [(1, ts(m), m) for m in set(right_times)] or [],
        "k int, rt timestamp_ntz, rv int",
    )
    out = asof_join(left, right, "k", "t", "rt", payload_cols=["rv"]).collect()
    assert len(out) == len(left_times)
    by_idx = {r["idx"]: r["rv"] for r in out}
    for i, m in enumerate(left_times):
        eligible = [x for x in set(right_times) if x <= m]
        assert by_idx[i] == (max(eligible) if eligible else None)


@given(
    vals=st.lists(
        st.decimals(
            min_value=Decimal("-9999.99"),
            max_value=Decimal("9999.99"),
            places=2,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_salted_sum_equals_direct(spark, vals):
    from analytics_etl_spark.operators.skew import salted_groupby_sum

    df = spark.createDataFrame([(1, v) for v in vals], "k int, v decimal(12,2)")
    direct = df.groupBy("k").agg(F.sum("v").alias("s")).first()["s"]
    salted = salted_groupby_sum(df, "k", "v", "s", salt=4).first()["s"]
    assert direct == salted


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=15,
)


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """The iterative min-label fixpoint equals a reference union-find
    on arbitrary small graphs (chains, cycles, self-merging shapes the
    generator finds)."""
    from analytics_etl_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b in edges:
        union(a, b)
    nodes = {n for e in edges for n in e}
    expected = {}
    roots: dict[int, int] = {}
    for n in sorted(nodes):
        r = find(n)
        roots.setdefault(r, n)  # min node of the component
        expected[n] = roots[r]

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == expected


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30, unique=True),
    rate_pct=st.integers(min_value=0, max_value=100),
)
@settings(**SETTINGS)
def test_stratified_sample_deterministic_and_monotone(spark, ids, rate_pct):
    """Hash sampling is a pure function of the row: identical subsets
    across runs AND monotone in the rate (raising the rate only ADDS
    rows — the property that makes mix ratios tunable without
    reshuffling what was already kept)."""
    from analytics_etl_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(i, "en") for i in ids], "doc_id long, lang string")
    rate = rate_pct / 100
    kept1 = {r["doc_id"] for r in stratified_sample(df, {"en": rate}).collect()}
    kept2 = {r["doc_id"] for r in stratified_sample(df, {"en": rate}).collect()}
    assert kept1 == kept2
    bigger = {r["doc_id"] for r in stratified_sample(df, {"en": min(1.0, rate + 0.2)}).collect()}
    assert kept1 <= bigger
    if rate == 0:
        assert kept1 == set()


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30, unique=True),
    f1=st.integers(min_value=0, max_value=100),
    f2=st.integers(min_value=0, max_value=100),
)
@settings(**SETTINGS)
def test_dataset_split_partitions_every_row(spark, ids, f1, f2):
    """The split is a PARTITION of the input: every row gets exactly
    one label, labels come only from the declared splits, the
    assignment is rerun-stable, and over-unit fraction sums are
    rejected (the silent eval-truncation hazard)."""
    import pytest as _pytest

    from analytics_etl_spark.operators.sampling import dataset_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    fa, fb = f1 / 100, f2 / 100
    splits = (("train", fa), ("val", fb), ("test", max(0.0, 1.0 - fa - fb)))
    if fa + fb > 1.0 + 1e-9:
        with _pytest.raises(ValueError):
            dataset_split(df, splits=splits)
        return
    out1 = {(r["doc_id"], r["split"]) for r in dataset_split(df, splits=splits).collect()}
    out2 = {(r["doc_id"], r["split"]) for r in dataset_split(df, splits=splits).collect()}
    assert out1 == out2
    assert len(out1) == len(ids)  # exactly one label per row
    assert {s for _, s in out1} <= {"train", "val", "test"}


@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=0, max_size=12
    ),
    span=st.integers(min_value=2, max_value=4),
)
@settings(**SETTINGS)
def test_substring_spans_detects_verbatim_copy(spark, words, span):
    """A doc and its verbatim copy share EVERY span (each flagged with
    n_docs=2); a doc shorter than the span yields no spans at all
    (the sequence-guard edge: no fabricated descending ranges)."""
    from analytics_etl_spark.operators.dedup import substring_span_duplicates

    text = " ".join(words)
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    got = substring_span_duplicates(df, span_words=span, min_docs=2).collect()
    n_spans = max(len(words) - span + 1, 0) if len(words) >= span else 0
    distinct_spans = len(
        {" ".join(words[i : i + span]) for i in range(max(len(words) - span + 1, 0))}
    )
    assert len(got) == (distinct_spans if n_spans else 0)
    assert all(r["n_docs"] == 2 for r in got)


@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=8),
    budget=st.integers(min_value=1, max_value=100_000),
)
@settings(**SETTINGS)
def test_hamilton_allocation_sums_to_budget(spark, counts, budget):
    """Largest-remainder allocation: seats sum EXACTLY to the budget,
    every stratum gets within 1 of its real quota, order-invariant.
    (Mirrors sample_budget_allocation's arithmetic on arbitrary count
    vectors, the registered query pins the Spark plan itself.)"""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(f"s{i}", c) for i, c in enumerate(counts)], "lang string, n long"
    )
    tot = df.agg(F.sum("n").alias("big_n"))
    base = df.crossJoin(F.broadcast(tot)).select(
        "lang", "n",
        F.expr(f"({budget}L * n) div big_n").alias("fs"),
        F.expr(f"({budget}L * n) % big_n").alias("rem"),
        "big_n",
    )
    w = Window.orderBy(F.col("rem").desc(), "lang")
    out = base.select(
        "lang", "n", "big_n", "fs",
        F.row_number().over(w).alias("rr"),
        (F.lit(budget) - F.sum("fs").over(Window.partitionBy())).alias("left"),
    ).select(
        "lang", "n", "big_n",
        (F.col("fs") + F.when(F.col("rr") <= F.col("left"), 1).otherwise(0)).alias("seats"),
    )
    rows = out.collect()
    assert sum(r["seats"] for r in rows) == budget
    total = rows[0]["big_n"]
    for r in rows:
        exact = budget * r["n"] / total
        assert exact - 1 < r["seats"] < exact + 1 + 1e-9  # quota property


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=14,
    )
)
@settings(**SETTINGS)
def test_pagerank_partition_invariance_property(spark, edges):
    """On arbitrary small graphs (symmetrized): repartitioning never
    changes a single bit of the fixed-point ranks, and total mass
    never exceeds n·scale."""
    from analytics_etl_spark.operators.graph import pagerank_int

    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, ["src", "dst"]).distinct()
    r1 = {r["node"]: r["rank"] for r in pagerank_int(df, iters=2).collect()}
    r2 = {
        r["node"]: r["rank"]
        for r in pagerank_int(df.repartition(5), iters=2).collect()
    }
    assert r1 == r2
    scale = 10**12
    assert sum(r1.values()) <= len(r1) * scale


def test_embeddings_vec_id_is_dense(spark):
    """The contrastive_triplets ID-DENSITY CONTRACT (ADVICE r5): the
    modular neg_id arithmetic assumes vec_id is exactly 0..N-1 and
    every anchor doc_id is in that range — any hole silently drops an
    anchor on BOTH engines, so parity alone cannot catch it. Pin the
    contract at every test SF."""
    from analytics_etl_spark.tables import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = load_table(spark, sf, "embeddings")
        row = emb.agg(
            F.count("*").alias("n"),
            F.min("vec_id").alias("lo"),
            F.max("vec_id").alias("hi"),
            F.countDistinct("vec_id").alias("nd"),
        ).collect()[0]
        assert (row["lo"], row["hi"], row["nd"]) == (0, row["n"] - 1, row["n"]), sf
        # anchors (doc_id < 100) all land inside the dense domain
        docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
        bad = docs.filter((F.col("doc_id") < 0) | (F.col("doc_id") >= row["n"])).count()
        assert bad == 0, sf


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=40
    )
)
@settings(**SETTINGS)
def test_triangle_count_matches_bruteforce(spark, edges):
    """triangle_count == brute-force enumeration over all id triples,
    on arbitrary multigraphs with self-loops and reversed duplicates."""
    from itertools import combinations

    from analytics_etl_spark.operators.graph import triangle_count

    adj = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in adj for n in e})
    expected = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if {a, b} in adj and {a, c} in adj and {b, c} in adj
    )
    if edges:
        df = spark.createDataFrame(edges, "src long, dst long")
    else:
        df = spark.range(0).selectExpr("id AS src", "id AS dst")
    assert triangle_count(df).first()["n_triangles"] == expected


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 60), st.integers(0, 60)),
        min_size=0,
        max_size=12,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 60), st.integers(0, 60)),
        min_size=0,
        max_size=12,
    ),
    width=st.sampled_from([1, 7, 10, 64]),
)
@settings(**SETTINGS)
def test_interval_overlap_matches_bruteforce(spark, lefts, rights, width):
    """interval_overlap_join == the quadratic definition, for any
    bucket width (the width is a performance knob, never a semantics
    knob) and any mix of empty/touching/nested intervals."""
    from analytics_etl_spark.operators.intervals import interval_overlap_join

    expected = {}
    for li, (lk, ls, le) in enumerate(lefts):
        for ri, (rk, rs, re) in enumerate(rights):
            if lk == rk and ls < le and rs < re and ls < re and rs < le:
                expected[(li, ri)] = min(le, re) - max(ls, rs)

    ldf = spark.createDataFrame(
        [(i, k, s, e) for i, (k, s, e) in enumerate(lefts)],
        "lid long, k long, l_start long, l_end long",
    )
    rdf = spark.createDataFrame(
        [(i, k, s, e) for i, (k, s, e) in enumerate(rights)],
        "rid long, k long, r_start long, r_end long",
    )
    out = interval_overlap_join(ldf, rdf, keys=["k"], bucket_width=width)
    got = {(r["lid"], r["rid"]): r["overlap"] for r in out.collect()}
    assert got == expected


@given(
    members=st.lists(st.text(min_size=0, max_size=8), min_size=0, max_size=30),
    others=st.lists(st.text(min_size=0, max_size=8), min_size=0, max_size=15),
    bits_pow=st.integers(min_value=6, max_value=12),
    k=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_bloom_no_false_negatives_and_prescreen_exact(
    spark, members, others, bits_pow, k
):
    """The two bloom contracts under adversarial parameters (down to a
    64-bit filter with 6 probes — maximal collision pressure, empty
    strings, duplicate keys): every build key probes True, and
    prescreen+verify equals the plain anti join exactly."""
    from analytics_etl_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_prescreened_new_keys,
    )

    num_bits = 1 << bits_pow
    def frame(keys):
        if not keys:
            return spark.createDataFrame([], "key string")
        return spark.createDataFrame([(x,) for x in keys], ["key"])

    corpus, batch = frame(members), frame(others)

    bloom = bloom_build(corpus, "key", num_bits, num_hashes=k)
    if members:
        probed = bloom_might_contain(corpus, bloom, "key", num_bits, num_hashes=k)
        assert probed.filter(~F.col("might_contain")).count() == 0

    got = sorted(
        r["key"]
        for r in bloom_prescreened_new_keys(
            corpus, batch, "key", num_bits, num_hashes=k
        ).collect()
    )
    want = sorted(r["key"] for r in batch.join(corpus, "key", "left_anti").collect())
    assert got == want


def test_priority_sample_matches_reference_and_is_unbiased(spark):
    """Priority sampling (operators/sampling.py): Spark output equals
    an independent pure-Python replay of the same md5 formula for two
    salts (implementation pin), and over 400 salts of the Python
    reference the subset-sum estimator's mean is within 3% of the true
    total weight (the Duffield-Lund-Thorup unbiasedness — math pin;
    pure-Python so the sweep costs milliseconds, not 400 Spark jobs)."""
    import hashlib

    from analytics_etl_spark.operators.sampling import priority_sample

    rows = [(i, 10 + 37 * (i % 13)) for i in range(40)]
    total = sum(w for _, w in rows)

    def ref(salt, k=8):
        pri = {}
        for i, w in rows:
            hv = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:12], 16)
            pri[i] = float(w) * float(2**48) / float(hv + 1)
        order = sorted(rows, key=lambda t: (-pri[t[0]], t[0]))[: 8 + 1]
        tau = min(pri[i] for i, _ in order)
        return {
            i: max(float(w), tau) for i, w in order if pri[i] > tau
        }

    df = spark.createDataFrame(rows, "doc_id long, w long")
    for salt in ("ps", "other"):
        got = {
            r["doc_id"]: r["w_est"]
            for r in priority_sample(df, "w", k=8, salt=salt).collect()
        }
        assert got == ref(salt), salt

    est_means = [sum(ref(f"s{n}").values()) for n in range(400)]
    mean = sum(est_means) / len(est_means)
    assert abs(mean - total) / total < 0.03
    # heavier items are sampled more often (monotone inclusion)
    heavy = sum(1 for n in range(400) if 12 in ref(f"s{n}"))   # w=10+37*12
    light = sum(1 for n in range(400) if 13 in ref(f"s{n}"))   # w=10
    assert heavy > light * 2


def test_priority_sample_excludes_nonpositive_and_null_weights(spark):
    from analytics_etl_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 7), (6, 9)],
        "doc_id long, w long",
    )
    out = priority_sample(df, "w", k=2).collect()
    assert {r["doc_id"] for r in out} <= {1, 5, 6}
    assert len(out) == 2


def test_priority_sample_plan_uses_take_ordered(spark):
    import contextlib
    import io

    from analytics_etl_spark.operators.sampling import priority_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        priority_sample(df, "w", k=50).explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan


def test_priority_sample_per_stratum_budgets_and_small_strata(spark):
    """Each stratum yields at most k rows; a stratum with <= k rows
    keeps everything at tau=0 (w_est == w); per-stratum selection
    equals running plain priority_sample on that stratum alone."""
    from analytics_etl_spark.operators.sampling import (
        priority_sample,
        priority_sample_per_stratum,
    )

    rows = [(i, 10 + i % 7, "big") for i in range(30)]
    rows += [(100 + i, 5 + i, "small") for i in range(3)]
    rows += [(200, 9, None)]
    df = spark.createDataFrame(rows, "doc_id long, w long, lang string")
    out = priority_sample_per_stratum(df, "w", k=5, stratum_col="lang").collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r["stratum"], []).append(r)
    assert len(by_stratum["big"]) == 5
    # small strata keep everything, estimator = raw weight
    assert len(by_stratum["small"]) == 3
    assert all(r["w_est"] == float(r["weight"]) for r in by_stratum["small"])
    assert len(by_stratum[None]) == 1
    # stratum-restricted plain sample agrees on the selected set
    big_only = priority_sample(
        df.filter(F.col("lang") == "big"), "w", k=5
    ).collect()
    assert {r["doc_id"] for r in big_only} == {
        r["doc_id"] for r in by_stratum["big"]
    }


def test_priority_sample_per_stratum_null_stratum_over_budget(spark):
    """A NULL stratum with MORE than k rows must get its real tau, not
    a coalesced 0 (the tau join is eqNullSafe — ADVICE r10: a
    null-unsafe equi-join dropped the NULL group's tau row, biasing
    every w_est in that group). Pinned against plain priority_sample
    on the NULL slice, which computes tau without any stratum join."""
    from analytics_etl_spark.operators.sampling import (
        priority_sample,
        priority_sample_per_stratum,
    )

    rows = [(i, 10 + 37 * (i % 13), None) for i in range(30)]
    rows += [(100 + i, 7 + i, "en") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, w long, lang string")
    out = priority_sample_per_stratum(df, "w", k=5, stratum_col="lang").collect()
    null_rows = [r for r in out if r["stratum"] is None]
    assert len(null_rows) == 5
    want = {
        (r["doc_id"], r["w_est"])
        for r in priority_sample(df.filter(F.col("lang").isNull()), "w", k=5).collect()
    }
    assert {(r["doc_id"], r["w_est"]) for r in null_rows} == want
    # tau genuinely bites for at least one row (w_est > w) — the case
    # the null-unsafe join silently zeroed
    assert any(r["w_est"] > float(r["weight"]) for r in null_rows)


# --- round-11 family invariants -------------------------------------------

_par_docs = st.lists(
    st.lists(
        st.sampled_from(["alpha beta", "copy right", "menu home", "x y z", "q"]),
        min_size=0,
        max_size=5,
    ),
    min_size=0,
    max_size=8,
)


@given(docs=_par_docs)
@settings(**SETTINGS)
def test_paragraph_dedup_is_idempotent_and_conserves_paragraphs(spark, docs):
    """After one paragraph_dedup pass, every surviving canonical hash
    lives in exactly one doc OR only as intra-doc repeats of its
    first-doc copy — so a SECOND pass removes nothing (idempotence),
    and total kept paragraphs never exceed the input count."""
    from analytics_etl_spark.operators.dedup import paragraph_dedup

    rows = [(i, "\n".join(ps)) for i, ps in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string") if rows else None
    if df is None:
        return
    once = paragraph_dedup(df).collect()
    assert all(r["n_kept"] <= r["n_pars"] for r in once)
    again_in = spark.createDataFrame(
        [(r["doc_id"], r["text_dedup"]) for r in once if r["n_kept"] > 0],
        "doc_id long, text string",
    ) if any(r["n_kept"] > 0 for r in once) else None
    if again_in is None:
        return
    twice = {r["doc_id"]: r for r in paragraph_dedup(again_in).collect()}
    for r in once:
        if r["n_kept"] > 0:
            assert twice[r["doc_id"]]["n_kept"] == r["n_kept"]
            assert twice[r["doc_id"]]["text_dedup"] == r["text_dedup"]


_hist_vals = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40
)


@given(vals=_hist_vals)
@settings(**SETTINGS)
def test_histogram_quantile_brackets_exact_percentile(spark, vals):
    """For every q, the histogram quantile's bin [lo, lo+width)
    contains the exact sorted-order percentile, and splitting the
    input anywhere then merging reproduces the one-shot bins."""
    import math

    from analytics_etl_spark.operators.histogram import (
        histogram_build,
        histogram_merge,
        histogram_quantiles,
    )

    width = 50
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    hist = histogram_build(df, "v", width)
    qs = ((1, 2), (9, 10))
    out = {
        (r["q_num"], r["q_den"]): r["lo"]
        for r in histogram_quantiles(hist, qs, width).collect()
    }
    svals = sorted(vals)
    n = len(svals)
    for (num, den), lo in out.items():
        exact = svals[math.ceil(num * n / den) - 1]
        assert lo <= exact < lo + width, ((num, den), lo, exact, svals)

    cut = len(vals) // 2
    a = spark.createDataFrame([(float(v),) for v in vals[:cut]] or [(None,)], "v double")
    b = spark.createDataFrame([(float(v),) for v in vals[cut:]] or [(None,)], "v double")
    merged = histogram_merge(
        histogram_build(a, "v", width), histogram_build(b, "v", width)
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, hist.collect())
    )


def test_knn_join_is_partition_invariant(spark):
    """The kNN graph is a pure function of the data: repartitioning
    the corpus (both forms) changes nothing — no row-order or
    partition-count dependence anywhere in score or tie-break."""
    from analytics_etl_spark.operators.similarity import knn_join

    rows = [(i, [float(((i * 7 + d * 3) % 13) - 6) for d in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    for bits, probes in ((None, 1), (4, 1), (4, 3)):
        base = sorted(
            map(
                tuple,
                knn_join(
                    df, queries, k=3, bucket_bits=bits, n_probes=probes
                ).collect(),
            )
        )
        shuffled = sorted(
            map(
                tuple,
                knn_join(
                    df.repartition(13),
                    queries.repartition(7),
                    k=3,
                    bucket_bits=bits,
                    n_probes=probes,
                ).collect(),
            )
        )
        assert base == shuffled and len(base) > 0


@given(
    threshold=st.floats(min_value=0.05, max_value=0.95),
    n_perm=st.integers(min_value=4, max_value=64),
)
@settings(max_examples=40, deadline=None)
def test_plan_bands_scurve_properties(threshold, n_perm):
    """The band planner's contract (VERDICT r12 item 3), engine-free
    pure math: (a) the planned config is feasible; (b) the detection
    curve P(s) = 1-(1-s^r)^b is monotone non-decreasing in s; (c) the
    curve's midpoint (1/b)^(1/r) lands within ONE BAND STEP of the
    requested threshold, OR every feasible config whose midpoint is
    strictly closer pays for it with a WORSE weighted FP/FN error —
    the planner never drifts from the threshold for free (the area
    objective legitimately overshoots the midpoint when one error
    interval dominates, e.g. low thresholds push b up for recall)."""
    from analytics_etl_spark.operators.dedup import (
        lsh_detection_probability,
        plan_bands,
    )

    b, r = plan_bands(threshold, n_perm)
    assert 1 <= r <= n_perm and 1 <= b and b * r <= n_perm

    # (b) monotone detection probability over a dense grid
    probs = [lsh_detection_probability(i / 200, b, r) for i in range(201)]
    assert all(x <= y + 1e-12 for x, y in zip(probs, probs[1:]))
    assert probs[0] == 0.0 and probs[-1] == 1.0

    # (c) midpoint within one band step, or drift is bought with error
    def err(bb, rr, grid=400):
        fp = fn = 0.0
        for i in range(grid + 1):
            w = 0.5 if i in (0, grid) else 1.0
            fp += w * lsh_detection_probability(threshold * i / grid, bb, rr)
            fn += w * (
                1.0
                - lsh_detection_probability(
                    threshold + (1.0 - threshold) * i / grid, bb, rr
                )
            )
        return 0.5 * fp * threshold / grid + 0.5 * fn * (1.0 - threshold) / grid

    mid = (1.0 / b) ** (1.0 / r)
    step = max(
        abs((1.0 / max(b - 1, 1)) ** (1.0 / r) - mid),
        abs((1.0 / (b + 1)) ** (1.0 / r) - mid),
    )
    if abs(mid - threshold) > step + 1e-12:
        e_chosen = err(b, r)
        for r2 in range(1, n_perm + 1):
            for b2 in range(1, n_perm // r2 + 1):
                if abs((1.0 / b2) ** (1.0 / r2) - threshold) < abs(mid - threshold):
                    assert e_chosen <= err(b2, r2) + 1e-9, (b, r, b2, r2)


@given(
    threshold=st.floats(min_value=0.1, max_value=0.9),
    n_perm=st.integers(min_value=4, max_value=32),
)
@settings(max_examples=25, deadline=None)
def test_plan_bands_minimizes_independent_integration(threshold, n_perm):
    """Optimality cross-check against an INDEPENDENT error evaluation
    (Simpson's rule at a different grid): no feasible (b, r) beats the
    planner's pick by more than numerical tolerance."""
    from analytics_etl_spark.operators.dedup import (
        lsh_detection_probability,
        plan_bands,
    )

    def simpson(f, lo, hi, n=240):
        h = (hi - lo) / n
        s = f(lo) + f(hi)
        for i in range(1, n):
            s += f(lo + i * h) * (4 if i % 2 else 2)
        return s * h / 3

    def err(b, r):
        fp = simpson(lambda s: lsh_detection_probability(s, b, r), 0.0, threshold)
        fn = simpson(
            lambda s: 1.0 - lsh_detection_probability(s, b, r), threshold, 1.0
        )
        return 0.5 * fp + 0.5 * fn

    b, r = plan_bands(threshold, n_perm)
    got = err(b, r)
    best = min(
        err(b2, r2)
        for r2 in range(1, n_perm + 1)
        for b2 in range(1, n_perm // r2 + 1)
    )
    assert got <= best + 1e-6, (b, r, got, best)


def test_plan_bands_matches_shipped_defaults_and_threshold_path(spark):
    """plan_bands(0.5, 12) == (4, 3) — the registered
    dedup_minhash_lsh banding — and minhash_lsh_dedup's threshold
    path produces EXACTLY the pinned-parameter result (so the
    documented default is the hash-checked behavior). Passing both
    knobs raises."""
    import pytest

    from analytics_etl_spark.operators.dedup import minhash_lsh_dedup, plan_bands

    assert plan_bands(0.5, 12) == (4, 3)

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
    )
    pinned = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_dedup(
            docs, num_hashes=12, rows_per_band=3, min_jaccard=0.5
        ).collect()
    }
    planned = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_dedup(
            docs, num_hashes=12, rows_per_band=None, threshold=0.5, min_jaccard=0.5
        ).collect()
    }
    assert planned == pinned
    with pytest.raises(ValueError, match="not both"):
        minhash_lsh_dedup(docs, rows_per_band=3, threshold=0.5)
    with pytest.raises(ValueError):
        plan_bands(1.5, 12)
    with pytest.raises(ValueError):
        plan_bands(0.5, 1)


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (operators/doremi.py, VERDICT r12
# item 7): the INDEPENDENT pure-Python reference below re-derives the
# whole loop with naive loops and fractions — no code shared with the
# operator beyond the published algorithm.
# ---------------------------------------------------------------------------


def _ref_hamilton(masses, budget):
    names = sorted(masses, key=lambda d: (d is not None, d or ""))
    total = sum(masses.values())
    out = {}
    rems = []
    used = 0
    for d in names:
        q, r = divmod(budget * masses[d], total)
        out[d] = q
        used += q
        rems.append((-r, (d is not None, d or ""), d))
    for _, _, d in sorted(rems)[: budget - used]:
        out[d] += 1
    return out


def _ref_doremi(stats, rounds, budget=1_000_000, eta=(1, 1), smooth=(1, 50)):
    SCALE = 1_000_000
    rate = {d: (s * SCALE) // n for d, n, s in stats}
    w = _ref_hamilton({d: n for d, n, _ in stats}, budget)
    k = len(stats)
    hist = []
    for _ in range(rounds):
        mix = sum(w[d] * rate[d] for d in w) // budget
        if mix > 0:
            raw = {}
            for d in w:
                excess = rate[d] - mix if rate[d] > mix else 0
                raw[d] = w[d] * (eta[1] * mix + eta[0] * excess)
            w = _ref_hamilton(raw, budget)
        if smooth[0]:
            w = _ref_hamilton(
                {d: (smooth[1] - smooth[0]) * w[d] * k + smooth[0] * budget for d in w},
                budget,
            )
        hist.append(dict(w))
    return _ref_hamilton({d: sum(h[d] for h in hist) for d in w}, budget), hist


_domain_stats = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**7),
        st.integers(min_value=0, max_value=10**10),
    ),
    min_size=2,
    max_size=12,
)


def test_doremi_oracle_sql_matches_reference():
    """r15 oracle-pairing pin: the UNROLLED DuckDB chain the
    registered doremi_domain_weights oracle is built from
    (_doremi_rounds_sql — per-round mixture rate, multiplicative
    masses, two Hamilton window passes, 8 rounds, across-round
    average) must match the operator core bit-for-bit on randomized
    stats tables, including a NULL domain (crawl data's real bucket)
    and all-zero-loss rounds (the mix == 0 leave-unchanged branch)."""
    import random

    import duckdb

    from analytics_etl_spark.operators.doremi import (
        doremi_mixture,
        hamilton_allocate,
    )
    from analytics_etl_spark.queries.llm2 import _doremi_rounds_sql

    con = duckdb.connect()
    rng = random.Random(1509)
    chain = _doremi_rounds_sql(8)
    for trial in range(60):
        k = rng.randint(1, 9)
        doms = ([None] if rng.random() < 0.3 else []) + [
            f"d{i}" for i in range(k)
        ]
        stats = [
            (d, rng.randint(1, 10**6), 0 if rng.random() < 0.15 else rng.randint(0, 10**10))
            for d in doms
        ]
        final, _ = doremi_mixture(stats, rounds=8)
        w0 = hamilton_allocate({d: n for d, n, _ in stats}, 1_000_000)
        vals = ", ".join(
            f"({'NULL' if d is None else repr(d)}, {n}, {s})"
            for d, n, s in stats
        )
        rows = con.execute(
            f"WITH dstats(domain, n, s) AS (VALUES {vals}), {chain}"
        ).fetchall()
        got = {r[0]: (r[1], r[2], r[3]) for r in rows}
        want = {d: (n, w0[d], final[d]) for d, n, _ in stats}
        assert got == want, (trial, stats)


@given(stats=_domain_stats, rounds=st.integers(min_value=1, max_value=12))
@settings(max_examples=60, deadline=None)
def test_doremi_exact_sum_and_reference_parity(stats, rounds):
    """(a) every per-round weight vector and the final average sum to
    the budget EXACTLY (Hamilton); (b) the operator core matches the
    independent pure-Python DoReMi reference bit-for-bit."""
    from analytics_etl_spark.operators.doremi import doremi_mixture

    named = [(f"d{i:02d}", n, s) for i, (n, s) in enumerate(stats)]
    final, hist = doremi_mixture(named, rounds=rounds)
    ref_final, ref_hist = _ref_doremi(named, rounds)
    assert len(hist) == rounds
    for h in hist + [final]:
        assert sum(h.values()) == 1_000_000
    assert hist == ref_hist
    assert final == ref_final
    # smoothing guarantees every domain keeps positive mass
    assert all(v > 0 for v in final.values())


@given(
    stats=_domain_stats,
    idx=st.integers(min_value=0),
    bump=st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=60, deadline=None)
def test_doremi_monotone_response_to_excess_loss(stats, idx, bump):
    """Raising ONE domain's total loss (all else equal) never lowers
    that domain's one-round weight beyond integer quantization. On
    exact rationals the update is WEAKLY monotone — a real decrease
    needs w_d*r_d > sum_j w_j*r_j, impossible with non-negative
    rates; the boundary (every other domain at zero loss) makes the
    share EXACTLY invariant, so all that remains is floor noise. The
    fixed-point slack is derived from the update's own sensitivities:
    the mixture rate is floored once (a ±1 micro-unit shift moves
    shares by <= budget/mix seats), rates are floored once, and the
    two Hamilton passes quantize one seat each. Multi-round feedback
    direction is pinned by the deterministic large-bump test."""
    from analytics_etl_spark.operators.doremi import (
        SCALE,
        doremi_mixture,
        hamilton_allocate,
    )

    budget = 1_000_000
    named = [(f"d{i:02d}", n, s) for i, (n, s) in enumerate(stats)]
    i = idx % len(named)
    d, n, s = named[i]
    bumped = list(named)
    bumped[i] = (d, n, s + bump * n)
    base, _ = doremi_mixture(named, rounds=1)
    up, _ = doremi_mixture(bumped, rounds=1)
    # quantization envelope: re-derive the two runs' mixture rates
    w0 = hamilton_allocate({dd: nn for dd, nn, _ in named}, budget)
    mixes = []
    for variant in (named, bumped):
        rate = {dd: ss * SCALE // nn for dd, nn, ss in variant}
        mixes.append(sum(w0[dd] * rate[dd] for dd in w0) // budget)
    min_mix = max(1, min(mixes))
    slack = 4 + 3 * (budget // min_mix)
    assert up[d] >= base[d] - slack, (d, base[d], up[d], slack)


def test_doremi_large_bump_strictly_upweights():
    """Deterministic end-to-end direction check: doubling one domain's
    mean loss strictly increases its final weight and decreases the
    lowest-loss domain's."""
    from analytics_etl_spark.operators.doremi import doremi_mixture

    stats = [("a", 1000, 500_000), ("b", 100, 90_000), ("c", 50, 20_000)]
    base, _ = doremi_mixture(stats, rounds=8)
    stats2 = [("a", 1000, 500_000), ("b", 100, 180_000), ("c", 50, 20_000)]
    up, _ = doremi_mixture(stats2, rounds=8)
    assert up["b"] > base["b"]
    assert up["c"] <= base["c"]


def test_doremi_reweight_spark_matches_core_and_callback_path(spark):
    """The Spark operator == the integer core on the same aggregated
    stats (collect is K-sized), and the per-round-callback path with a
    STATIC callback reproduces the static path exactly. Also pins the
    registered query's contract columns."""
    from analytics_etl_spark.operators.doremi import (
        domain_loss_stats,
        doremi_mixture,
        doremi_reweight,
    )

    rows = [
        ("web", 3), ("web", 7), ("web", 5),
        ("code", 90), ("code", 110),
        ("wiki", 240),
    ]
    losses = spark.createDataFrame(rows, "domain string, loss long")
    stats = domain_loss_stats(losses)
    got = {
        r["domain"]: (r["n_docs"], r["weight0_ppm"], r["weight_ppm"])
        for r in doremi_reweight(stats, rounds=6).collect()
    }
    core_stats = sorted(
        (r["domain"], r["n_docs"], r["sum_loss"]) for r in stats.collect()
    )
    final, _ = doremi_mixture(core_stats, rounds=6)
    from analytics_etl_spark.operators.doremi import hamilton_allocate

    w0 = hamilton_allocate({d: n for d, n, _ in core_stats}, 1_000_000)
    assert got == {
        d: (n, w0[d], final[d]) for d, n, _ in core_stats
    }
    via_callback = {
        r["domain"]: r["weight_ppm"]
        for r in doremi_reweight(lambda t, w: stats, rounds=6).collect()
    }
    assert via_callback == {d: v[2] for d, v in got.items()}
    # the high-loss domain was upweighted relative to its natural share
    assert got["wiki"][2] > got["wiki"][1]


def test_doremi_null_domain_is_first_class(spark):
    """Hostile-data lesson (r13 hostile sweep caught this live): a
    NULL lang/source is a REAL domain bucket in crawl data — the
    reweighting must treat it as its own domain, not crash sorting
    str against None. Exact-sum holds, the None row survives to the
    output, and the core matches the reference with a None label."""
    from analytics_etl_spark.operators.doremi import (
        domain_loss_stats,
        doremi_mixture,
        doremi_reweight,
    )

    stats = [(None, 40, 90_000), ("en", 100, 50_000), ("zh", 20, 30_000)]
    final, hist = doremi_mixture(stats, rounds=6)
    assert sum(final.values()) == 1_000_000
    ref_final, ref_hist = _ref_doremi(stats, 6)
    assert final == ref_final and hist == ref_hist

    rows = [(0, None, 900), (1, None, 800), (2, "en", 100), (3, "zh", 500)]
    losses = spark.createDataFrame(rows, "doc_id long, domain string, loss long")
    out = doremi_reweight(domain_loss_stats(losses), rounds=4).collect()
    assert len(out) == 3
    assert sum(r["weight_ppm"] for r in out) == 1_000_000
    null_row = [r for r in out if r["domain"] is None]
    assert len(null_row) == 1 and null_row[0]["n_docs"] == 2


@given(
    stats=_domain_stats,
    r_hi=st.integers(min_value=0, max_value=10**9),
    r_lo=st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=40, deadline=None)
def test_doremi_within_round_order_preservation(stats, r_hi, r_lo):
    """The exactly-true form of monotone response, WITHIN one run:
    two domains with equal doc counts and hi-loss >= lo-loss end the
    round ordered the same way (Hamilton is order-preserving on
    masses; multipliers are monotone in the rate; smoothing is an
    affine monotone map) — up to the one-seat name tie-breaks."""
    from analytics_etl_spark.operators.doremi import doremi_mixture

    hi, lo = max(r_hi, r_lo), min(r_hi, r_lo)
    named = [(f"d{i:02d}", n, s) for i, (n, s) in enumerate(stats)]
    named += [("zhi", 1000, hi * 1000), ("zlo", 1000, lo * 1000)]
    _, hist = doremi_mixture(named, rounds=1)
    w = hist[0]
    assert w["zhi"] >= w["zlo"] - 3, (w["zhi"], w["zlo"])


@given(
    n=st.integers(min_value=1, max_value=10**12),
    target=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=60, deadline=None)
def test_plan_bucket_bits_linear_candidates(n, target):
    """The sign-LSH bits planner's contract (the r14 knee fix), pure
    math: (a) bits stay in [1, 24]; (b) wherever the clamp is NOT
    binding, the expected per-bucket occupancy n/2^bits lands within
    a factor-of-2 of the target — so expected candidate volume
    n * occupancy is LINEAR in n by construction, never the
    fixed-bits quadratic the 100x rehearsal measured."""
    from analytics_etl_spark.operators.similarity import plan_bucket_bits

    bits = plan_bucket_bits(n, target)
    assert 1 <= bits <= 24
    if 1 < bits < 24:  # clamp not binding -> occupancy pinned
        occupancy = n / (1 << bits)
        # rounding log2 moves occupancy by at most sqrt(2) each way
        assert target / 2 <= occupancy <= target * 2, (bits, occupancy)


def test_plan_bucket_bits_monotone_and_validates():
    from analytics_etl_spark.operators.similarity import plan_bucket_bits

    # monotone non-decreasing in n (more vectors never fewer buckets)
    last = 0
    for exp in range(0, 13):
        bits = plan_bucket_bits(10**exp)
        assert bits >= last
        last = bits
    # the rehearsal sizes: small tier keeps the registered small knob's
    # ballpark, the x100 tier demands ~15-16 bits
    assert plan_bucket_bits(2000) in (9, 10)
    assert plan_bucket_bits(200_000) in (15, 16)
    import pytest

    with pytest.raises(ValueError, match="n_vectors"):
        plan_bucket_bits(0)
    with pytest.raises(ValueError, match="target_occupancy"):
        plan_bucket_bits(100, 0)


def test_plan_bucket_bits_matches_oracle_nb_cte():
    """Cross-engine parity for the r15 planner-sized kNN family: the
    DuckDB nb CTE the registered knn_graph_clusters oracle carries
    must derive EXACTLY the bits plan_bucket_bits derives, for every
    count — checked densely over small n plus every power-of-2
    boundary up to 2^40 ± 1 (the half-bit rounding boundaries are
    irrational, so the integer-exact rule has no ties to disagree
    on). This is the contract that lets bucket_bits='auto' stay
    hash-checked at any SF."""
    import duckdb

    from analytics_etl_spark.operators.similarity import plan_bucket_bits
    from analytics_etl_spark.queries.llm2 import _KNN_NB_CTE

    con = duckdb.connect()
    # the REGISTERED CTE string over a stand-in `e` of n rows (dense
    # small n + every 2^k boundary a local corpus can actually reach)
    for n in list(range(1, 600)) + [2**k + d for k in range(10, 21) for d in (-1, 0, 1)]:
        got = con.execute(
            f"WITH e AS (SELECT * FROM range({n})), {_KNN_NB_CTE} "
            f"SELECT nbits FROM nb"
        ).fetchone()[0]
        assert got == plan_bucket_bits(n), n
    # the arithmetic core at counts too big to materialize: swap the
    # COUNT(*) subquery for a literal, keep the comparison verbatim
    import re

    core = re.sub(
        r"\(SELECT CAST\(COUNT\(\*\) AS HUGEINT\) AS n FROM e\)",
        "(SELECT CAST({n} AS HUGEINT) AS n)",
        _KNN_NB_CTE,
    )
    assert "{n}" in core  # the substitution must have matched
    for n in [2**k + d for k in range(21, 41) for d in (-1, 0, 1)] + [
        10**9,
        3 * 10**9,
    ]:
        got = con.execute(
            f"WITH {core.format(n=n)} SELECT nbits FROM nb"
        ).fetchone()[0]
        assert got == plan_bucket_bits(n), n
