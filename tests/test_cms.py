"""Count-min sketch (operators/cms.py + streaming maintenance).

Contract pins: never an underestimate (one-sided theorem, asserted
over every key of a collision-forcing corpus), exact when the grid is
collision-free, merge is lossless (incremental == one-shot, bit for
bit), the observed overestimate envelope on the fixed corpus is
pinned (the test_sketches.py error-envelope discipline), params are
sidecar-protected, and the family is JVM-pure.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from analytics_etl_spark.operators.cms import (
    check_cms_meta,
    cms_build,
    cms_estimate,
    cms_merge,
)


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k long")


def _corpus(spark, n=500, dom=60):
    # deterministic skewed corpus: key i appears (i % dom) times
    vals = [i % dom for i in range(n)]
    return _keys(spark, vals)


def test_exact_when_collision_free(spark):
    """width >> distinct keys: every estimate equals the true count."""
    df = _corpus(spark)
    true = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    cms = cms_build(df, "k", depth=4, width=4096)
    est = cms_estimate(cms, _keys(spark, sorted(true)), "k", depth=4, width=4096)
    for r in est.collect():
        assert r["est_n"] == true[r["k"]]


def test_one_sided_and_pinned_envelope_under_collisions(spark):
    """width=16 forces heavy collisions over 60 keys: estimates never
    drop below truth (the CMS theorem), and the worst observed
    overestimate on this fixed corpus is pinned so a hashing
    regression moves a number a human can read."""
    df = _corpus(spark)
    true = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    cms = cms_build(df, "k", depth=4, width=16)
    est = {
        r["k"]: r["est_n"]
        for r in cms_estimate(
            cms, _keys(spark, sorted(true)), "k", depth=4, width=16
        ).collect()
    }
    overs = [est[k] - true[k] for k in true]
    assert all(o >= 0 for o in overs), "CMS underestimated"
    assert max(overs) > 0, "width=16 over 60 keys must collide"
    # theorem bound: overestimate <= e/width * N w.h.p.; N=500 tokens
    assert max(overs) <= int(2.72 / 16 * 500) + 1


def test_merge_is_lossless_and_cellwise_exact(spark):
    a, b = _keys(spark, [1, 1, 2, 3]), _keys(spark, [2, 3, 3, 4])
    both = a.unionByName(b)
    merged = cms_merge(cms_build(a, "k"), cms_build(b, "k"))
    oneshot = cms_build(both, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, oneshot.collect())
    )


def test_null_keys_dropped_both_sides(spark):
    df = spark.createDataFrame([(1,), (None,), (1,)], "k long")
    cms = cms_build(df, "k")
    # grid rows only for the non-null key
    assert cms.agg(F.sum("cnt")).first()[0] == 2 * 4  # 2 occurrences x depth
    est = cms_estimate(cms, df, "k")
    rows = est.collect()
    assert len(rows) == 1 and rows[0]["est_n"] == 2


def test_grid_bounded_size(spark):
    """The scale contract: the sparse table never exceeds depth*width
    cells no matter the input size."""
    cms = cms_build(_corpus(spark, n=500, dom=400), "k", depth=3, width=8)
    assert cms.count() <= 3 * 8


def test_streaming_maintenance_matches_oneshot_and_sidecar(spark, tmp_path):
    from analytics_etl_spark.streaming.ingest import merge_cms_batch

    path = str(tmp_path / "cms")
    b1, b2 = _keys(spark, [1, 1, 2]), _keys(spark, [2, 3])
    merge_cms_batch(b1, 0, path, "k", depth=4, width=64)
    merge_cms_batch(b2, 1, path, "k", depth=4, width=64)
    stored = spark.read.parquet(path)
    oneshot = cms_build(b1.unionByName(b2), "k", depth=4, width=64)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, oneshot.collect())
    )
    # param sidecar: mismatched or missing params fail loud
    with pytest.raises(ValueError, match="param mismatch"):
        merge_cms_batch(b1, 2, path, "k", depth=4, width=128)
    check_cms_meta(str(tmp_path / "fresh"), 4, 64)  # absent table is fine


def test_cms_family_is_jvm_pure(spark):
    df = _corpus(spark)
    out = cms_estimate(cms_build(df, "k"), _keys(spark, [1, 2]), "k")
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


def test_join_size_estimate_one_sided_and_exact_when_wide(spark):
    """Inner-product estimate ≥ true join size always; with a wide
    grid (no collisions among these keys) it's exactly Σ cA(k)·cB(k)."""
    from analytics_etl_spark.operators.cms import (
        cms_build,
        cms_join_size_estimate,
    )

    a = _keys(spark, [1, 1, 1, 2, 3])
    b = _keys(spark, [1, 2, 2, 4])
    true_size = a.join(b, "k").count()  # 3*1 + 1*2 = 5
    assert true_size == 5
    wide = cms_join_size_estimate(
        cms_build(a, "k", width=4096), cms_build(b, "k", width=4096)
    ).first()["est_join_size"]
    assert wide == 5
    narrow = cms_join_size_estimate(
        cms_build(a, "k", width=2), cms_build(b, "k", width=2)
    ).first()["est_join_size"]
    assert narrow >= 5


def test_join_size_estimate_disjoint_sketches_returns_zero(spark):
    """ADVICE r10: a hash row whose cells share NO bucket contributes a
    ZERO inner product — the tightest bound. The old inner-join min
    skipped such rows, so two sketches sharing no cells returned NULL
    and partially-disjoint rows overshot. Disjoint key sets on a wide
    grid → est 0, not NULL (true join size is 0)."""
    from analytics_etl_spark.operators.cms import (
        cms_build,
        cms_join_size_estimate,
    )

    a = _keys(spark, [1, 2, 3])
    b = _keys(spark, [101, 102, 103])
    est = cms_join_size_estimate(
        cms_build(a, "k", width=1 << 20), cms_build(b, "k", width=1 << 20)
    ).first()["est_join_size"]
    assert est == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ref_cms_estimates(vals, probe_keys, depth, width):
    """Pure-Python replay of the digest-slice CMS formula."""
    import hashlib
    from collections import Counter

    def buckets(k):
        h = hashlib.md5(str(k).encode()).hexdigest()
        return [int(h[8 * r : 8 * r + 8], 16) % width for r in range(depth)]

    cells = Counter()
    for k, n in Counter(vals).items():
        for r, b in enumerate(buckets(k)):
            cells[(r, b)] += n
    return {
        k: min(cells.get((r, b), 0) for r, b in enumerate(buckets(k)))
        for k in probe_keys
    }


@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
    depth=st.integers(min_value=1, max_value=4),
    width=st.sampled_from([4, 16, 64]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cms_estimates_match_reference_on_random_multisets(
    spark, vals, depth, width
):
    df = _keys(spark, vals)
    keys = sorted(set(vals))
    got = {
        r["k"]: r["est_n"]
        for r in cms_estimate(
            cms_build(df, "k", depth, width), _keys(spark, keys), "k", depth, width
        ).collect()
    }
    assert got == _ref_cms_estimates(vals, keys, depth, width)
