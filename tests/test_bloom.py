"""Bloom membership sketch (operators/bloom.py).

The three contract pins: NO false negatives (the property everything
downstream leans on), exact mergeability (bloom(A ∪ B) == OR of the
parts, bit for bit), and prescreen+verify == plain anti join (the
sketch changes cost, never the result). Plus the plan rule: the whole
family is pure JVM expressions — no Python eval nodes anywhere.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from analytics_etl_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_might_contain,
    bloom_prescreened_new_keys,
)

BITS = 1 << 14  # 16 Kbit — small enough to force a few collisions


def _keys(spark, lo, hi, name="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("key-"), F.col("id").cast("string")).alias(name)
    )


def test_no_false_negatives(spark):
    """Every key that went into the build MUST probe True — with an
    undersized, heavily loaded filter (worst case for bit collisions,
    which only ever cause false POSITIVES)."""
    members = _keys(spark, 0, 2000)
    bloom = bloom_build(members, "k", num_bits=1 << 10)  # ~8 keys/bit!
    probed = bloom_might_contain(members, bloom, "k", num_bits=1 << 10)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_false_positive_rate_is_bounded(spark):
    """At ~10 bits/key, k=4 the textbook fp is ~1.2%; assert < 5% on
    a disjoint probe set (deterministic — xxhash64 with fixed seeds)."""
    bloom = bloom_build(_keys(spark, 0, 1500), "k", num_bits=BITS)
    out = bloom_might_contain(_keys(spark, 10_000, 11_500), bloom, "k", num_bits=BITS)
    fp = out.filter(F.col("might_contain")).count()
    assert fp / 1500 < 0.05


def test_merge_equals_union_build(spark):
    """bloom(A) OR bloom(B) == bloom(A ∪ B), row for row and bit for
    bit — the property that lets daily ingest blooms roll up exactly
    like the HLL sketches."""
    a, b = _keys(spark, 0, 700), _keys(spark, 500, 1200)
    merged = {
        (r["word_idx"], r["bits"])
        for r in bloom_merge(
            bloom_build(a, "k", BITS), bloom_build(b, "k", BITS)
        ).collect()
    }
    direct = {
        (r["word_idx"], r["bits"])
        for r in bloom_build(a.unionByName(b), "k", BITS).collect()
    }
    assert merged == direct and merged


def test_prescreen_equals_plain_anti_join(spark):
    """The composed operator's contract: bloom prescreen + exact
    verify returns EXACTLY the plain anti join — on a batch with true
    dups, novel keys, and enough load for some false positives to
    flow through the verify path."""
    corpus = _keys(spark, 0, 3000)
    batch = _keys(spark, 2000, 5000).withColumn("payload", F.length("k"))
    got = {
        (r["k"], r["payload"])
        for r in bloom_prescreened_new_keys(corpus, batch, "k", num_bits=BITS).collect()
    }
    want = {
        (r["k"], r["payload"])
        for r in batch.join(corpus, "k", "left_anti").collect()
    }
    assert got == want
    assert len(got) == 2000  # keys 3000..4999 are novel


def test_broadcast_verify_matches_and_never_shuffles_corpus(spark, tmp_path):
    """broadcast_verify=True (the design case: maybe-set ≪ corpus)
    must (a) return exactly the default-form result, and (b) scan the
    corpus WITHOUT exchanging it — the corpus-side scan must reach its
    join through zero Exchange nodes (a left-anti can only broadcast
    its right side, so the natural form shuffles the whole corpus key
    set; the flipped semi form is the fix)."""
    import re

    corpus = _keys(spark, 0, 3000)
    batch = _keys(spark, 2000, 5000)
    fast = bloom_prescreened_new_keys(
        corpus, batch, "k", num_bits=BITS, broadcast_verify=True
    )
    slow = bloom_prescreened_new_keys(corpus, batch, "k", num_bits=BITS)
    assert {r["k"] for r in fast.collect()} == {r["k"] for r in slow.collect()}

    # plan check on a parquet-backed corpus so the corpus scan is
    # identifiable: every Exchange in the verify branch must sit on the
    # probe/maybe side, never above the corpus relation
    cpath = str(tmp_path / "corpus")
    corpus.write.parquet(cpath)
    fast_p = bloom_prescreened_new_keys(
        spark.read.parquet(cpath), batch, "k", num_bits=BITS, broadcast_verify=True
    )
    plan = fast_p._jdf.queryExecution().executedPlan().toString()
    # the membership joins must BOTH be broadcast forms: the corpus
    # feeds a broadcast LeftSemi as its streamed (never-exchanged)
    # side, and the final anti rides the broadcast hits — a
    # shuffle-based semi/anti anywhere means the corpus key set got
    # exchanged, the exact cost this mode exists to remove
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan)
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan)
    assert not re.search(r"(SortMergeJoin|ShuffledHashJoin) .*Left(Semi|Anti)", plan)
    # and the default form really does shuffle the corpus for the anti
    # (the contrast that justifies the flag)
    slow_p = bloom_prescreened_new_keys(
        spark.read.parquet(cpath), batch, "k", num_bits=BITS
    )
    splan = slow_p._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin) .*LeftAnti", splan) or re.search(
        r"BroadcastHashJoin .*LeftAnti", splan
    )


def test_prebuilt_bloom_path_matches_inline(spark, tmp_path):
    """The deployment path — a bloom persisted at ingest and passed in
    via `bloom=` — must return exactly the inline-build result (same
    num_bits/num_hashes, same corpus)."""
    corpus = _keys(spark, 0, 3000)
    batch = _keys(spark, 2000, 5000)
    path = str(tmp_path / "bloom")
    bloom_build(corpus, "k", BITS).write.parquet(path)
    persisted = bloom_prescreened_new_keys(
        corpus, batch, "k", num_bits=BITS, bloom=spark.read.parquet(path)
    )
    inline = bloom_prescreened_new_keys(corpus, batch, "k", num_bits=BITS)
    assert {r["k"] for r in persisted.collect()} == {r["k"] for r in inline.collect()}


def test_null_and_validation(spark):
    bloom = bloom_build(
        spark.createDataFrame([("a",), (None,)], ["k"]), "k", num_bits=1 << 10
    )
    probed = bloom_might_contain(
        spark.createDataFrame([("a",), (None,), ("zzz",)], ["k"]),
        bloom,
        "k",
        num_bits=1 << 10,
    )
    got = {r["k"]: r["might_contain"] for r in probed.collect()}
    assert got["a"] is True and got[None] is False
    with pytest.raises(ValueError):
        bloom_build(_keys(spark, 0, 1), "k", num_bits=8)
    with pytest.raises(ValueError):
        bloom_build(_keys(spark, 0, 1), "k", num_bits=64, num_hashes=0)


def test_empty_corpus_and_empty_batch(spark):
    """Empty corpus ⇒ everything is new (and the empty sketch table
    probes all-False); empty batch ⇒ empty result. Both without
    errors — the first-ever ingest and the quiet-night ingest."""
    empty = _keys(spark, 0, 0)
    some = _keys(spark, 0, 50)
    assert bloom_build(empty, "k", num_bits=1 << 10).count() == 0
    out = bloom_prescreened_new_keys(empty, some, "k", num_bits=1 << 10)
    assert out.count() == 50
    assert bloom_prescreened_new_keys(some, empty, "k", num_bits=1 << 10).count() == 0


def test_key_type_mismatch_fails_loud(spark):
    """int 5 and string '5' hash to different bloom bits while a plain
    equi-join would coerce and match them — a silent false negative.
    The prescreen must refuse mismatched key types instead."""
    ints = spark.range(0, 10).select(F.col("id").alias("k"))
    strs = spark.range(0, 10).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(TypeError, match="type mismatch"):
        bloom_prescreened_new_keys(ints, strs, "k", num_bits=1 << 10)


def test_streaming_bloom_maintenance_matches_batch_build(spark, tmp_path):
    """merge_bloom_batch (foreachBatch maintenance): incremental
    merges across micro-batches equal the one-shot corpus build bit
    for bit; replaying a batch changes no bit (at-least-once == exact,
    the same two-property story as the HLL sketch table); an
    interrupted swap recovers the accumulated bloom instead of
    silently degrading to batch-only."""
    import os
    import shutil

    from analytics_etl_spark.streaming.ingest import merge_bloom_batch

    path = str(tmp_path / "bloom")
    b0, b1, b2 = _keys(spark, 0, 400), _keys(spark, 400, 800), _keys(spark, 800, 1000)
    for ep, b in enumerate((b0, b1, b2)):
        merge_bloom_batch(b, ep, path, "k", num_bits=BITS)
    stored = {(r["word_idx"], r["bits"]) for r in spark.read.parquet(path).collect()}
    direct = {
        (r["word_idx"], r["bits"])
        for r in bloom_build(_keys(spark, 0, 1000), "k", BITS).collect()
    }
    assert stored == direct and stored

    merge_bloom_batch(b1, 3, path, "k", num_bits=BITS)  # replay
    after = {(r["word_idx"], r["bits"]) for r in spark.read.parquet(path).collect()}
    assert after == stored

    # interrupted swap: live renamed aside, stale tmp left behind
    os.rename(path, path + ".old")
    shutil.copytree(path + ".old", path + ".tmp")
    merge_bloom_batch(b2, 4, path, "k", num_bits=BITS)  # re-delivery
    recovered = {(r["word_idx"], r["bits"]) for r in spark.read.parquet(path).collect()}
    assert recovered == stored
    assert not os.path.exists(path + ".old")


def test_bloom_family_is_jvm_pure(spark):
    """No Python eval node anywhere in build, probe, or prescreen —
    the sketch family rides codegen'd hash/bit expressions only."""
    corpus, batch = _keys(spark, 0, 100), _keys(spark, 50, 150)
    for df in (
        bloom_build(corpus, "k", BITS),
        bloom_might_contain(batch, bloom_build(corpus, "k", BITS), "k", BITS),
        bloom_prescreened_new_keys(corpus, batch, "k", BITS),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan


def test_bloom_param_sidecar_roundtrip_and_mismatch(spark, tmp_path):
    """The param sidecar contract (ADVICE r8): write_bloom stamps
    _bloom_meta.json; read_bloom with matching params returns the
    exact table; read_bloom (and check_bloom_meta) with MISMATCHED
    params raises — OR-merging or probing across configs is the silent
    false negative this module forbids."""
    import os

    from analytics_etl_spark.operators.bloom import (
        BLOOM_META_FILE,
        check_bloom_meta,
        read_bloom,
        write_bloom,
    )

    path = str(tmp_path / "bloom")
    bloom = bloom_build(_keys(spark, 0, 300), "k", BITS)
    write_bloom(bloom, path, num_bits=BITS)
    assert os.path.exists(os.path.join(path, BLOOM_META_FILE))

    got = {(r["word_idx"], r["bits"]) for r in read_bloom(spark, path, BITS).collect()}
    want = {(r["word_idx"], r["bits"]) for r in bloom.collect()}
    assert got == want and got

    # wrong num_bits and wrong num_hashes both fail loud
    with pytest.raises(ValueError, match="param mismatch"):
        read_bloom(spark, path, num_bits=BITS * 2)
    with pytest.raises(ValueError, match="param mismatch"):
        check_bloom_meta(path, BITS, num_hashes=7)
    # missing table is a clean FileNotFoundError, not a sidecar error
    with pytest.raises(FileNotFoundError):
        read_bloom(spark, str(tmp_path / "nope"), BITS)


def test_bloom_sidecar_missing_rejected(spark, tmp_path):
    """A bare .write.parquet bloom (no sidecar) must be REJECTED by
    read_bloom/check_bloom_meta: its params are unknowable, so probing
    it is a config-drift false negative waiting to happen."""
    from analytics_etl_spark.operators.bloom import check_bloom_meta, read_bloom

    path = str(tmp_path / "bare")
    bloom_build(_keys(spark, 0, 100), "k", BITS).write.parquet(path)
    with pytest.raises(ValueError, match="no _bloom_meta.json sidecar"):
        read_bloom(spark, path, BITS)
    with pytest.raises(ValueError, match="no _bloom_meta.json sidecar"):
        check_bloom_meta(path, BITS, 4)
    # a nonexistent path passes (the caller is about to create it)
    check_bloom_meta(str(tmp_path / "new"), BITS, 4)


def test_merge_bloom_batch_stamps_and_enforces_sidecar(spark, tmp_path):
    """Streaming maintenance end of the same contract: every table
    merge_bloom_batch maintains carries the sidecar (stamped inside
    the crash-safe swap, so it survives every merge), a param change
    against an existing table raises BEFORE any bits are OR-ed, and a
    write_bloom-stamped table keeps its sidecar through a merge."""
    import json
    import os

    from analytics_etl_spark.operators.bloom import BLOOM_META_FILE, write_bloom
    from analytics_etl_spark.streaming.ingest import merge_bloom_batch

    path = str(tmp_path / "bloom")
    merge_bloom_batch(_keys(spark, 0, 200), 0, path, "k", num_bits=BITS)
    meta = json.load(open(os.path.join(path, BLOOM_META_FILE)))
    assert meta == {"num_bits": BITS, "num_hashes": 4}

    # second merge keeps the sidecar; mismatched params fail loud first
    merge_bloom_batch(_keys(spark, 200, 400), 1, path, "k", num_bits=BITS)
    assert os.path.exists(os.path.join(path, BLOOM_META_FILE))
    with pytest.raises(ValueError, match="param mismatch"):
        merge_bloom_batch(_keys(spark, 400, 500), 2, path, "k", num_bits=BITS * 2)
    with pytest.raises(ValueError, match="param mismatch"):
        merge_bloom_batch(
            _keys(spark, 400, 500), 2, path, "k", num_bits=BITS, num_hashes=2
        )

    # a write_bloom table merges cleanly and retains the stamp
    path2 = str(tmp_path / "bloom2")
    write_bloom(bloom_build(_keys(spark, 0, 100), "k", BITS), path2, num_bits=BITS)
    merge_bloom_batch(_keys(spark, 100, 200), 0, path2, "k", num_bits=BITS)
    meta2 = json.load(open(os.path.join(path2, BLOOM_META_FILE)))
    assert meta2 == {"num_bits": BITS, "num_hashes": 4}
    # and the merged bits equal the one-shot build (sidecar changed nothing)
    got = {(r["word_idx"], r["bits"]) for r in spark.read.parquet(path2).collect()}
    want = {
        (r["word_idx"], r["bits"])
        for r in bloom_build(_keys(spark, 0, 200), "k", BITS).collect()
    }
    assert got == want


def test_prescreen_cache_handles_unpersist(spark):
    """The cache_handles hook (ADVICE r7/r8): a long-lived caller
    passes a list, receives the internally persisted probe frame,
    and can unpersist it once the result is consumed — leaving no
    accumulated batch caches to evict deliberately cached artifacts."""
    corpus, batch = _keys(spark, 0, 500), _keys(spark, 250, 750)
    handles: list = []
    novel = bloom_prescreened_new_keys(
        corpus, batch, "k", num_bits=BITS, cache_handles=handles
    )
    assert novel.count() == 250  # result consumed (== plain anti join)
    assert len(handles) == 1
    assert handles[0].storageLevel.useMemory  # persisted while in use
    for h in handles:
        h.unpersist(blocking=True)
    assert not handles[0].storageLevel.useMemory  # storage level cleared
