"""Incremental corpus refresh (plans/incremental_refresh.py): every
disposition hand-derived on a crafted standing-corpus + batch + bench
triple, the split-inheritance contract, and the funnel observations.

The registered query (corpus_refresh_pipeline) is hash-checked against
the DuckDB oracle at three SFs + hostile; these tests pin the
SEMANTICS on inputs small enough to verify by hand — which doc is cut
by which gate, and why the linked doc lands in the standing doc's
split.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from analytics_etl_spark.plans.incremental_refresh import corpus_refresh


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _fixture(spark):
    """One batch doc per disposition (and one per accept reason):
    - 200 near-copy of standing 100      -> dup_corpus
    - 201 15/22-word overlap with 101    -> accepted, LINKED to 101
    - 202 'spam ham' x30                 -> quality (top-2-gram share)
    - 203 three words                    -> quality (too short)
    - 204 24-word prefix of the bench doc-> contaminated
    - 205 unique                         -> accepted
    - 206 near-copy of batch 205         -> dup_batch (higher id cut)
    - 207 unique                         -> accepted, unlinked
    """
    s100, s101 = _words("alpha", 22), _words("beta", 22)
    standing = spark.createDataFrame(
        [(100, s100), (101, s101)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1, _words("bench", 30))], "doc_id long, text string"
    )
    b205 = _words("mike", 22)
    batch = spark.createDataFrame(
        [
            (200, s100.replace("alpha0", "zulu0").replace("alpha1 ", "zulu1 ")),
            (201, " ".join(s101.split()[:15]) + " " + _words("kilo", 7)),
            (202, ("spam ham " * 30).strip()),
            (203, "tiny doc only"),
            (204, _words("bench", 24)),
            (205, b205),
            (206, b205.replace("mike0", "nova0").replace("mike1 ", "nova1 ")),
            (207, _words("oscar", 25)),
        ],
        "doc_id long, text string",
    )
    return standing, batch, bench


def test_corpus_refresh_dispositions_hand_checked(spark):
    standing, batch, bench = _fixture(spark)
    out, _ = corpus_refresh(standing, batch, bench)
    rows = {r.doc_id: r for r in out.collect()}
    assert {d: rows[d].disposition for d in sorted(rows)} == {
        200: "dup_corpus",
        201: "accepted",
        202: "quality",
        203: "quality",
        204: "contaminated",
        205: "accepted",
        206: "dup_batch",
        207: "accepted",
    }
    # rejects carry no split/cluster and zero chunks
    for d in (200, 202, 203, 204, 206):
        assert rows[d].split is None and rows[d].cluster_id is None
        assert rows[d].n_chunks == 0
    # accepted docs are chunked (all fixture docs fit one 50-word chunk)
    for d in (201, 205, 207):
        assert rows[d].n_chunks == 1 and rows[d].split in ("train", "val", "test")


def test_corpus_refresh_link_band_inherits_standing_split(spark):
    """Doc 201's overlap with standing 101 sits in [link, drop): it is
    KEPT but must land in the split the standing doc was assigned by
    the same salted hash — the component's min id is the standing doc
    (monotone-id contract), so cluster_id == 101 and the split equals
    dataset_split's verdict for id 101. Unlinked accepted docs hash
    their own id (plain dataset_split, bit-identical)."""
    from analytics_etl_spark.operators.sampling import dataset_split

    standing, batch, bench = _fixture(spark)
    out, _ = corpus_refresh(standing, batch, bench)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[201].cluster_id == 101
    standing_splits = {
        r.doc_id: r.split for r in dataset_split(standing.select("doc_id")).collect()
    }
    assert rows[201].split == standing_splits[101]
    # unlinked accepted docs: own id, plain dataset_split equivalence
    own = {
        r.doc_id: r.split
        for r in dataset_split(
            spark.createDataFrame([(205,), (207,)], "doc_id long")
        ).collect()
    }
    assert rows[205].cluster_id == 205 and rows[205].split == own[205]
    assert rows[207].cluster_id == 207 and rows[207].split == own[207]


def test_corpus_refresh_funnel_observations(spark):
    standing, batch, bench = _fixture(spark)
    out, obs = corpus_refresh(standing, batch, bench)
    out.count()  # one action populates every stage count
    got = {name: o.get["n"] for name, o in obs.items()}
    assert got == {
        "batch": 8,
        "quality_pass": 6,  # 202, 203 cut
        "decontaminated": 5,  # 204 cut
        "survived_corpus_dedup": 4,  # 200 cut
        "accepted": 3,  # 206 cut
    }


def test_corpus_refresh_standing_clusters_route_inheritance(spark):
    """A CLUSTER-SPLIT nightly: standing doc 101 belonged to nightly
    cluster 77, so its split is hash('split:77'), not hash of its own
    id. Passing the nightly (doc_id, cluster_id) frame routes the
    link edge to the cluster id — batch doc 201 lands in exactly the
    standing doc's actual split (the r14 review's straddle scenario,
    closed). Without the frame the refresh reproduces the PLAIN
    dataset_split nightly (corpus_build's convention), covered by
    test_corpus_refresh_link_band_inherits_standing_split."""
    from analytics_etl_spark.operators.sampling import dataset_split

    standing, batch, bench = _fixture(spark)
    nightly = spark.createDataFrame(
        [(100, 77), (101, 77)], "doc_id long, cluster_id long"
    )
    out, _ = corpus_refresh(standing, batch, bench, standing_clusters=nightly)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[201].cluster_id == 77
    cluster_split = {
        r.doc_id: r.split
        for r in dataset_split(
            spark.createDataFrame([(77,)], "doc_id long")
        ).collect()
    }
    assert rows[201].split == cluster_split[77]
    # docs with no standing link are untouched by the mapping
    assert rows[205].cluster_id == 205 and rows[207].cluster_id == 207
    import pytest

    with pytest.raises(ValueError, match="standing_clusters"):
        corpus_refresh(
            standing, batch, bench,
            standing_clusters=nightly.withColumnRenamed("cluster_id", "cid"),
        )


def test_corpus_refresh_validates_thresholds(spark):
    standing, batch, bench = _fixture(spark)
    with pytest.raises(ValueError, match="link_jaccard"):
        corpus_refresh(standing, batch, bench, link_jaccard=0.6, drop_jaccard=0.5)


def test_corpus_refresh_persisted_shingles_identical(spark):
    """The deployment form: with the ingest-persisted shingle column
    on all three frames, the result is BIT-IDENTICAL to the inline
    form (same 3-gram definition), and the decision stages run no
    shingling kernel — refresh-time Python shrinks to quality +
    chunking."""
    import contextlib
    import io

    from analytics_etl_spark.operators.dedup import with_shingle_column

    standing, batch, bench = _fixture(spark)
    inline, _ = corpus_refresh(standing, batch, bench)
    # PERSIST the shingle column (localCheckpoint = the test's stand-in
    # for the parquet ingest layout) — lazily-computed shingles would
    # just re-run the kernel per branch, which is exactly the trade the
    # persisted column exists to avoid
    persisted, _ = corpus_refresh(
        with_shingle_column(standing).localCheckpoint(eager=True),
        with_shingle_column(batch).localCheckpoint(eager=True),
        with_shingle_column(bench).localCheckpoint(eager=True),
        shingles_col="shingles",
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, persisted.collect())
    )
    # the persisted DECISION pipelines carry FEWER Python eval nodes
    # (the shingle kernels are gone; quality metrics + chunking
    # remain). r17: the refresh result plan is truncated at the
    # decision frames (plans/incremental_refresh._decide), so the
    # census must look at the pair pipeline itself — the stage the
    # persisted column de-Pythonizes — not the (now leaf-only) result.
    def n_python(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        return sum(p.count(k) for k in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"))

    from analytics_etl_spark.operators.dedup import minhash_lsh_dedup

    pairs_inline = minhash_lsh_dedup(batch, min_jaccard=0.3)
    pairs_persisted = minhash_lsh_dedup(
        with_shingle_column(batch).localCheckpoint(eager=True),
        min_jaccard=0.3,
        shingles_col="shingles",
    )
    assert n_python(pairs_persisted) == 0
    assert n_python(pairs_inline) > 0


def test_corpus_refresh_empty_batch(spark):
    """An empty ingest day is a no-op, not an error."""
    standing, batch, bench = _fixture(spark)
    out, _ = corpus_refresh(standing, batch.filter(F.lit(False)), bench)
    assert out.count() == 0


# --- streaming attribution maintenance (VERDICT r14 item 8) -------------


def _attr_rows(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path)
        .select("epoch", "doc_id", "disposition", "cluster_id", "split", "n_chunks")
        .collect()
    )


def test_refresh_attribution_replay_is_a_noop(spark, tmp_path):
    """At-least-once delivery: re-delivering an epoch re-runs the
    (deterministic) refresh and REPLACES that epoch's rows with
    value-identical ones — the stored attribution table is unchanged,
    and other epochs are never touched."""
    from analytics_etl_spark.streaming.ingest import refresh_attribution_batch

    standing, batch, bench = _fixture(spark)
    b0 = batch.filter(F.col("doc_id") <= 203)
    b1 = batch.filter(F.col("doc_id") > 203)
    path = str(tmp_path / "attr")
    refresh_attribution_batch(b0, 0, standing, bench, path)
    refresh_attribution_batch(b1, 1, standing, bench, path)
    before = _attr_rows(spark, path)
    assert len(before) == 8 and {e for e, *_ in before} == {0, 1}
    refresh_attribution_batch(b1, 1, standing, bench, path)  # replay
    refresh_attribution_batch(b0, 0, standing, bench, path)  # older replay
    assert _attr_rows(spark, path) == before


def test_refresh_attribution_interrupted_swap_recovers(spark, tmp_path):
    """The sketch/bloom crash-recovery protocol on the attribution
    table: a crash between old-aside and tmp-in leaves only the .old
    copy; the next merge must restore it before reading — never fall
    back to a batch-only table and rmtree the sole surviving copy of
    the accumulated attributions."""
    import os
    import shutil

    from analytics_etl_spark.streaming.ingest import refresh_attribution_batch

    standing, batch, bench = _fixture(spark)
    b0 = batch.filter(F.col("doc_id") <= 203)
    b1 = batch.filter(F.col("doc_id") > 203)
    path = str(tmp_path / "attr")
    refresh_attribution_batch(b0, 0, standing, bench, path)

    # simulate the interrupted swap: live renamed aside, stale tmp left
    os.rename(path, path + ".old")
    shutil.copytree(path + ".old", path + ".tmp")

    refresh_attribution_batch(b1, 1, standing, bench, path)
    assert not os.path.exists(path + ".old")

    clean = str(tmp_path / "clean")
    refresh_attribution_batch(b0, 0, standing, bench, clean)
    refresh_attribution_batch(b1, 1, standing, bench, clean)
    assert _attr_rows(spark, path) == _attr_rows(spark, clean)


def test_refresh_attribution_equals_direct_recompute(spark, tmp_path):
    """Each epoch's stored rows are exactly the direct corpus_refresh
    of that batch — the maintenance adds bookkeeping, never drift."""
    from analytics_etl_spark.streaming.ingest import refresh_attribution_batch

    standing, batch, bench = _fixture(spark)
    b1 = batch.filter(F.col("doc_id") > 203)
    path = str(tmp_path / "attr")
    refresh_attribution_batch(
        batch.filter(F.col("doc_id") <= 203), 0, standing, bench, path
    )
    refresh_attribution_batch(b1, 1, standing, bench, path)
    direct, _ = corpus_refresh(standing, b1, bench)
    want = sorted(
        (1, r.doc_id, r.disposition, r.cluster_id, r.split, r.n_chunks)
        for r in direct.collect()
    )
    got = [r for r in _attr_rows(spark, path) if r[0] == 1]
    assert got == want


def test_real_stream_maintains_attribution_table(spark, tmp_path):
    """End-to-end under Structured Streaming (file source →
    foreachBatch refresh): after two micro-batches the attribution
    table holds one row per arrived doc with the same dispositions
    the batch pipeline derives."""
    import shutil

    from analytics_etl_spark.streaming.ingest import streaming_corpus_refresh

    standing, batch, bench = _fixture(spark)
    landing = tmp_path / "landing"
    landing.mkdir()
    path = str(tmp_path / "attr")

    def stage(df, name):
        d = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, landing / name)

    stage(batch.filter(F.col("doc_id") <= 203), "f1.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(landing)
    )
    q = streaming_corpus_refresh(
        stream, standing, bench, path, str(tmp_path / "ck")
    ).start()
    try:
        q.processAllAvailable()
        stage(batch.filter(F.col("doc_id") > 203), "f2.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r[1]: r[2] for r in _attr_rows(spark, path)}
    assert rows == {
        200: "dup_corpus",
        201: "accepted",
        202: "quality",
        203: "quality",
        204: "contaminated",
        205: "accepted",
        206: "dup_batch",
        207: "accepted",
    }


# --- the multi-split link boundary (ADVICE r14, documented + audited) ----


def test_multi_split_link_boundary_and_audit(spark):
    """The documented KNOWN BOUNDARY end-to-end: batch doc 300
    bridges standing 100 (train: md5('split:100') bucket < 9000) and
    standing 118 (test bucket >= 9500) with link-band Jaccard 0.436
    on both edges (verified candidates under the default 12x3
    banding — deterministic md5 minhash). The component min is 100,
    so 300 inherits 'train' — its near-dup pair with 118 STILL
    straddles train/test (inherent: standing assignments are never
    reassigned between nightlies). multi_split_link_flags must flag
    exactly this doc with both splits."""
    from analytics_etl_spark.operators.dedup import incremental_minhash_dedup
    from analytics_etl_spark.plans.incremental_refresh import (
        multi_split_link_flags,
    )

    sA, sB = _words("hotel", 22), _words("tango", 22)
    standing = spark.createDataFrame(
        [(100, sA), (118, sB)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1, _words("bench", 30))], "doc_id long, text string"
    )
    bridge = " ".join(sA.split()[:19]) + " " + " ".join(sB.split()[:19])
    batch = spark.createDataFrame([(300, bridge)], "doc_id long, text string")

    out, _ = corpus_refresh(standing, batch, bench)
    row = out.collect()[0]
    assert (row.disposition, row.cluster_id, row.split) == (
        "accepted",
        100,
        "train",
    )
    # the boundary is real: 118's own split is 'test' (salted hash),
    # so the (300, 118) near-dup pair straddles until the nightly
    # rebuild merges the bridged component
    import hashlib

    b118 = int(hashlib.md5(b"split:118").hexdigest()[:15], 16) % 10000
    assert b118 >= 9500  # 118 is a test-split doc

    pairs = incremental_minhash_dedup(standing, batch, min_jaccard=0.3)
    standing_splits = spark.createDataFrame(
        [(100, "train"), (118, "test")], "doc_id long, split string"
    )
    flags = multi_split_link_flags(pairs, standing_splits).collect()
    assert len(flags) == 1
    assert flags[0]["batch_doc"] == 300
    assert flags[0]["n_link_splits"] == 2
    assert list(flags[0]["link_splits"]) == ["test", "train"]


def test_multi_split_link_flags_unit(spark):
    """The audit in isolation: only docs whose LINK-band (< drop)
    edges span >1 standing split are flagged; drop-band edges and
    single-split link sets are not."""
    from analytics_etl_spark.plans.incremental_refresh import (
        multi_split_link_flags,
    )

    pairs = spark.createDataFrame(
        [
            (300, 100, 0.4),   # train
            (300, 118, 0.4),   # test -> 300 spans {train, test}
            (301, 100, 0.4),   # train
            (301, 101, 0.45),  # train -> single split, not flagged
            (302, 118, 0.9),   # drop band -> not a link edge
            (302, 100, 0.4),   # single link split, not flagged
        ],
        "batch_doc long, corpus_doc long, jaccard double",
    )
    splits = spark.createDataFrame(
        [(100, "train"), (101, "train"), (118, "test")],
        "doc_id long, split string",
    )
    got = {
        r["batch_doc"]: list(r["link_splits"])
        for r in multi_split_link_flags(pairs, splits).collect()
    }
    assert got == {300: ["test", "train"]}


def test_nightly_rebuild_heals_multi_split_bridge(spark):
    """VERDICT r15 item 4 — the healing half of the documented
    boundary: the bridge scenario's straddle (batch 300 links
    standing 100=train and 118=test) is resolved by the NEXT nightly
    rebuild, whose connected-components pass merges the bridged
    component {100, 118, 300} and re-hashes it as ONE unit. Pins:
    (a) the nightly assigns all three docs one cluster and one split,
    (b) the edge-level straddle audit over the nightly assignment is
    empty, and (c) multi_split_link_flags re-run against the
    POST-nightly standing splits returns empty — the refresh-time
    flag was transient, exactly as the module docstring promises."""
    from analytics_etl_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_dedup,
    )
    from analytics_etl_spark.operators.sampling import (
        cluster_safe_split,
        split_straddle_audit,
    )
    from analytics_etl_spark.plans.incremental_refresh import (
        multi_split_link_flags,
    )

    sA, sB = _words("hotel", 22), _words("tango", 22)
    standing = spark.createDataFrame(
        [(100, sA), (118, sB)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1, _words("bench", 30))], "doc_id long, text string"
    )
    bridge = " ".join(sA.split()[:19]) + " " + " ".join(sB.split()[:19])
    batch = spark.createDataFrame([(300, bridge)], "doc_id long, text string")

    # ingest day: 300 accepted, straddle flagged (boundary test above)
    out, _ = corpus_refresh(standing, batch, bench)
    assert out.collect()[0].disposition == "accepted"

    # nightly rebuild over the post-ingest corpus: full-corpus LSH at
    # the link threshold, then the cluster-hashed split
    corpus = standing.unionByName(batch)
    edges = minhash_lsh_dedup(corpus, min_jaccard=0.3).select("doc_a", "doc_b")
    nightly = cluster_safe_split(corpus.select("doc_id"), edges)

    rows = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in nightly.collect()}
    # (a) the bridged component merged and re-hashed as one unit
    assert rows[100] == rows[118] == rows[300] == (100, "train")
    # (b) zero straddling near-dup pairs under the nightly assignment
    assert split_straddle_audit(nightly, edges).count() == 0
    # (c) the refresh-time flag resolves against the post-nightly splits
    pairs = incremental_minhash_dedup(standing, batch, min_jaccard=0.3)
    post_splits = nightly.select("doc_id", "split")
    assert multi_split_link_flags(pairs, post_splits).count() == 0


def test_split_straddle_audit_unit(spark):
    """The audit in isolation: plain dataset_split on a near-dup pair
    that hashes apart IS a straddle; cluster_safe_split on the same
    edge set is clean."""
    from analytics_etl_spark.operators.sampling import (
        cluster_safe_split,
        dataset_split,
        split_straddle_audit,
    )

    # 118 buckets test (>=9500), 100 buckets train — verified in the
    # boundary test above
    docs = spark.createDataFrame([(100,), (118,)], "doc_id long")
    edges = spark.createDataFrame([(100, 118)], "doc_a long, doc_b long")

    naive = dataset_split(docs)
    bad = split_straddle_audit(naive, edges).collect()
    assert len(bad) == 1 and {bad[0]["split_a"], bad[0]["split_b"]} == {
        "train",
        "test",
    }

    safe = cluster_safe_split(docs, edges)
    assert split_straddle_audit(safe, edges).count() == 0
