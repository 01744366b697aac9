"""Scale utilities: salting equivalence + bucketed shuffle-free joins."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from analytics_etl_spark.operators.skew import salted_groupby_sum, salted_join
from analytics_etl_spark.sinks.bucketed import read_table, write_bucketed
from analytics_etl_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_salted_groupby_equals_direct(spark):
    li = load_table(spark, SF, "lineitem")
    v = F.col("l_extendedprice").cast("decimal(18,2)")
    direct = {
        r["l_returnflag"]: r["s"]
        for r in li.groupBy("l_returnflag").agg(F.sum(v).alias("s")).collect()
    }
    salted = {
        r["l_returnflag"]: r["s"]
        for r in salted_groupby_sum(li, "l_returnflag", v, "s", salt=16).collect()
    }
    assert salted == direct  # exact decimal ⇒ identical, not just close


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", salt=4)
    assert salted.count() == plain.count()
    # spot-check content equivalence on a key
    k = plain.first()["l_orderkey"]
    assert sorted(map(tuple, salted.filter(F.col("l_orderkey") == k).collect())) == sorted(
        map(tuple, plain.filter(F.col("l_orderkey") == k).collect())
    )


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both fact tables on the join key removes the Exchange
    — the ingest-time answer to the flagship query's one fact-fact
    shuffle (SCALING.md)."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", "l_orderkey", buckets=4)
    write_bucketed(o, "o_bucketed", "o_orderkey", buckets=4)

    # at real scale neither fact side broadcasts; force that regime
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "li_bucketed").join(
            read_table(spark, "o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        tree = buf.getvalue().split("\n\n(1)")[0]
        assert "SortMergeJoin" in tree
        assert "Exchange" not in tree  # co-located buckets: no shuffle at all
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ann_signature_partition_pruning(spark, tmp_path):
    """The deployment shape for hyperplane ANN at 100 TB: signatures
    PRECOMPUTED at write time, table partitioned by the first table's
    bucket — a query probing one bucket then prunes partitions at the
    scan (PartitionFilters), never touching the other cells' files."""
    import contextlib
    import io

    import pyspark.sql.functions as F

    from analytics_etl_spark.operators.similarity import (
        as_double_array,
        hyperplane_signatures,
        rademacher_planes,
    )

    planes = rademacher_planes(64, 4, 2, seed=7)
    sig = hyperplane_signatures(planes)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "emb_by_bucket")
    (
        emb.withColumn("bucket", sig(as_double_array("embedding")).getItem(0))
        .write.partitionBy("bucket")
        .parquet(path)
    )

    probed = spark.read.parquet(path).filter(F.col("bucket") == 3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("bucket" in ln and "3" in ln for ln in pf), plan
    # and the probe really narrows the data read
    total = spark.read.parquet(path).count()
    assert 0 < probed.count() < total


def test_results_invariant_under_shuffle_partitioning(spark):
    """The determinism contract, exercised: the same query collected
    under 5 and 32 shuffle partitions yields IDENTICAL values — the
    point of routing every money sum through DECIMAL (associative,
    partition-order independent) and total-ordering every LIMIT.
    Float sums would differ in the last ulp across layouts; a hash
    gate like the driver's would flag exactly that."""
    from analytics_etl_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    names = ["flagship_monthly_revenue", "pricing_summary", "vocab_coverage_topk"]
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def run_all():
        return {
            n: sorted(map(tuple, REGISTRY[n].fn(spark, sf).collect())) for n in names
        }

    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = run_all()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = run_all()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_aqe_splits_skewed_join_partition(spark):
    """The engine's skew story is two-layer: operators/skew.py salts
    explicitly, and AQE's runtime skew-join splitting handles the
    cases nobody predicted. This pins the second layer actually
    firing: a 90%-hot key under tightened thresholds yields
    SortMergeJoin(skew=true) with an 'AQEShuffleRead … skewed' reader
    in the FINAL adaptive plan — the hot partition was split at
    runtime, no salting, no code change."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            # incompressible payload: a constant key column alone
            # compresses below any threshold and hides the skew
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 5_000).select(F.col("id").alias("k"), F.lit("r").alias("v"))
        out = left.join(right, "k").select(F.substring("pad", 1, 4).alias("p4"))
        assert len(out.collect()) == 180_500
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "skew=true" in final, final[:2000]
        assert "skewed" in final  # the AQEShuffleRead marker
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_triangle_count_known_graph(spark):
    """Exact triangle count on a hand-checkable graph: K4 (4 triangles)
    plus a pendant edge and a duplicate/reversed edge (must not
    double-count) and a self-loop (must be ignored)."""
    from analytics_etl_spark.operators.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    edges = k4 + [(4, 5), (2, 1), (3, 1), (6, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).first()["n_triangles"] == 4
    # triangle-free graph (star): zero
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    assert triangle_count(star).first()["n_triangles"] == 0


def test_interval_overlap_join_semantics(spark):
    """Half-open overlap semantics + bucket-dedupe: touching intervals
    do NOT match, pairs spanning many shared buckets appear exactly
    once, keys partition the match space, empty intervals never match."""
    from pyspark.sql import functions as F

    from analytics_etl_spark.operators.intervals import interval_overlap_join

    left = spark.createDataFrame(
        [
            (1, 10, 100, "a"),   # long interval
            (1, 200, 210, "b"),  # touches right.c at 210 — no match
            (2, 10, 100, "c"),   # other key
            (1, 50, 50, "d"),    # empty — never matches
        ],
        "k long, l_start long, l_end long, lid string",
    )
    right = spark.createDataFrame(
        [
            (1, 20, 90, "x"),    # inside a: one match despite ~7 shared buckets
            (1, 210, 220, "y"),  # touches b
            (2, 99, 300, "z"),   # overlaps c by 1
            (1, 40, 60, "w"),    # overlaps a and spans d
        ],
        "k long, r_start long, r_end long, rid string",
    )
    out = interval_overlap_join(
        left, right, keys=["k"], bucket_width=10
    ).select("lid", "rid", "overlap")
    got = {(r["lid"], r["rid"]): r["overlap"] for r in out.collect()}
    assert got == {("a", "x"): 70, ("a", "w"): 20, ("c", "z"): 1}

    import pytest

    with pytest.raises(ValueError):
        interval_overlap_join(left, right, keys=["k"], bucket_width=0)


def test_interval_overlap_runaway_guard(spark):
    """One open-ended/mis-unitized interval must fail LOUD, not explode
    into millions of bucket rows (the 100 TB row bomb)."""
    import pytest
    from pyspark.sql.utils import PythonException

    from analytics_etl_spark.operators.intervals import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 10_000_000_000)], "k long, l_start long, l_end long"
    )
    right = spark.createDataFrame([(1, 5, 6)], "k long, r_start long, r_end long")
    bad = interval_overlap_join(left, right, keys=["k"], bucket_width=10)
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        bad.collect()
    # the remedy the error message prescribes — a bucket_width matched
    # to the interval length — passes with the default limit
    ok = interval_overlap_join(
        left, right, keys=["k"], bucket_width=10_000_000_000
    )
    assert ok.count() == 1


def test_triangle_count_rejects_out_of_range_ids(spark):
    """Node ids outside [0, 2^32) would silently collide the packed
    (degree, node) order key — must fail loud, not miscount."""
    import pytest

    from analytics_etl_spark.operators.graph import triangle_count

    bad = spark.createDataFrame(
        [(1, 2), (2, 2**33), (1, 2**33)], "src long, dst long"
    )
    with pytest.raises(Exception, match="node id out of"):
        triangle_count(bad).collect()
    neg = spark.createDataFrame([(-5, 2), (2, 3), (-5, 3)], "src long, dst long")
    with pytest.raises(Exception, match="node id out of"):
        triangle_count(neg).collect()


def test_hot_key_split_join_equals_plain_join(spark):
    """hot_key_split_join is row-for-row the plain inner join (incl.
    NULL keys dropping and duplicate dim keys multiplying), the hot
    side rides a broadcast, and an empty census degrades to the plain
    join."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from analytics_etl_spark.operators.skew import hot_key_split_join

    left = spark.createDataFrame(
        [(1, "a")] * 50 + [(2, "b"), (3, "c"), (None, "n")],
        "k int, v string",
    )
    right = spark.createDataFrame(
        [(1, "d1"), (2, "d2"), (2, "d2x"), (4, "d4")], "k int, label string"
    )
    out = hot_key_split_join(left, right, "k", hot_count_threshold=10)
    plain = left.join(right, "k")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # the split is semi/anti joins against the broadcast census frame —
    # no hot-key literal list compiled into the plan (VERDICT r10 item 5)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    # census finds nothing hot -> hot branch is empty, result unchanged
    none_hot = hot_key_split_join(left, right, "k", hot_count_threshold=1000)
    assert sorted(map(tuple, none_hot.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_scale_rehearsal_build_marks_copies_and_decorrelated(spark, tmp_path):
    """The scale rehearsal's scratch builder (tools/scale_rehearsal.py,
    r14 generator): id-shifted copies marked by deterministic word
    SUBSTITUTION (every 4th word of copy k > 0 suffixed `x{k}`) — no
    duplicate ids, copy 0 byte-identical to the base (the original
    corpus is a subset), copies pairwise non-identical with ~75% of
    3-gram shingles differing (the linear-near-dup-density fix: the
    r13 seed-stamp build left copies near-dups of each other, growing
    the pair list quadratically in the copy count), and embeddings
    norm-preserving rolled — same multiset, different direction. The
    at-scale plan checks hold on the generated layout."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import scale_rehearsal as sr

    scratch = str(tmp_path / "x")
    old_sf1 = sr.SF1
    sr.SF1 = "/root/testdata/sf0.001"
    try:
        sr.build(scratch, copies=3)
        docs = spark.read.parquet(f"{scratch}/documents.parquet")
        base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        nb = base.count()
        assert docs.count() == 3 * nb
        assert docs.select("doc_id").distinct().count() == 3 * nb
        trio = {
            r["doc_id"]: r["text"]
            for r in docs.filter(F.col("doc_id") % sr.SHIFT < 3).collect()
        }
        orig = {r["doc_id"]: r["text"] for r in base.filter(F.col("doc_id") < 3).collect()}
        for i in orig:
            texts = [trio[i + k * sr.SHIFT] for k in range(3)]
            assert len(set(texts)) == 3, i
            # copy 0 IS the base corpus; marked copies keep word count
            assert texts[0] == orig[i], i
            for k in (1, 2):
                words, owords = texts[k].split(" "), orig[i].split(" ")
                assert len(words) == len(owords), i
                for p, (w, ow) in enumerate(zip(words, owords)):
                    if p % 4 == 0:
                        assert w == f"{ow}x{k}", (i, k, p)
                    else:
                        assert w == ow, (i, k, p)
        # the construction's POINT: cross-copy Jaccard sits below the
        # near-dup candidate band, so pair lists scale LINEARLY in the
        # copy count (r13's stamp construction measured 0.9+ here)
        from analytics_etl_spark.operators.dedup import shingle_arrays

        arrs = {
            r["doc_id"]: set(r["shingles"])
            for r in shingle_arrays(
                docs.filter(
                    (F.col("doc_id") % sr.SHIFT < 20)
                    & (F.col("text").isNotNull())
                )
            ).collect()
            if len(r["shingles"]) >= 20
        }
        checked = 0
        for i in list(orig) + list(range(3, 20)):
            a, b = arrs.get(i), arrs.get(i + sr.SHIFT)
            if a is None or b is None:
                continue
            j = len(a & b) / len(a | b)
            assert j < 0.3, (i, j)
            checked += 1
        assert checked >= 5  # the guard actually ran
        emb = spark.read.parquet(f"{scratch}/embeddings.parquet")
        eb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        assert emb.count() == 3 * eb.count()
        v0 = {r["vec_id"]: r["embedding"] for r in emb.filter(F.col("vec_id") < 3).collect()}
        v1 = {
            r["vec_id"] - sr.SHIFT: r["embedding"]
            for r in emb.filter(
                (F.col("vec_id") >= sr.SHIFT) & (F.col("vec_id") < sr.SHIFT + 3)
            ).collect()
        }
        for vid, vec in v0.items():
            assert sorted(vec) == sorted(v1[vid])
            assert vec != v1[vid]
        checks = sr.assert_plans(spark, scratch)
        # *_info entries are scale-dependent observations (SMJ shows
        # up at corpus-sized both sides; AQE broadcasts at this tiny
        # SF) — the binding invariants are the non-info keys
        assert all(v for k, v in checks.items() if not k.endswith("_info")), checks
    finally:
        sr.SF1 = old_sf1
