"""Streaming HLL sketch maintenance (streaming/ingest.merge_sketch_batch).

The two properties that make at-least-once streaming EXACT for
sketches: incremental merges equal the batch recompute bit-for-bit,
and replaying a batch changes nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from analytics_etl_spark.operators.sketches import union_rollup
from analytics_etl_spark.streaming.ingest import merge_sketch_batch
from tests.conftest import SF_SMOKE


def _events(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("day", F.to_date(F.col("ts").cast("timestamp")))
    )


def _estimates(spark, path):
    return {
        (r["event_type"], str(r["day"])): r["approx_distinct"]
        for r in union_rollup(
            spark.read.parquet(path), ["event_type", "day"]
        ).collect()
    }


def test_incremental_merges_equal_batch_recompute(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "sketches")
    # stream the table in 3 micro-batches split by event_id
    for epoch, (lo, hi) in enumerate([(0, 3), (3, 6), (6, 10)]):
        batch = ev.filter((F.col("event_id") % 10 >= lo) & (F.col("event_id") % 10 < hi))
        merge_sketch_batch(batch, epoch, path)
    incremental = _estimates(spark, path)

    direct_path = str(tmp_path / "direct")
    merge_sketch_batch(ev, 0, direct_path)  # one batch == direct sketch
    assert incremental == _estimates(spark, direct_path)
    assert len(incremental) > 0


def test_replayed_batch_is_a_noop(spark, tmp_path):
    """At-least-once delivery: merging the same micro-batch twice
    leaves every estimate unchanged (register-wise max is idempotent)
    — no epoch ledger needed, unlike row-data ingest."""
    ev = _events(spark)
    path = str(tmp_path / "sketches")
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    merge_sketch_batch(b0, 0, path)
    merge_sketch_batch(b1, 1, path)
    before = _estimates(spark, path)
    merge_sketch_batch(b1, 1, path)  # replay
    merge_sketch_batch(b0, 2, path)  # even older data re-delivered
    assert _estimates(spark, path) == before


def test_interrupted_swap_recovers_accumulated_sketches(spark, tmp_path):
    """ADVICE r6 (medium): a crash between old-aside and tmp-in leaves
    only the .old copy on disk. The next merge must RESTORE it before
    reading — not fall back to a batch-only table and then rmtree the
    sole surviving copy of the accumulated (non-reconstructible)
    sketches."""
    import os
    import shutil

    ev = _events(spark)
    path = str(tmp_path / "sketches")
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    merge_sketch_batch(b0, 0, path)

    # simulate the interrupted swap: live table renamed aside, a stale
    # tmp left behind, nothing at the live path
    os.rename(path, path + ".old")
    shutil.copytree(path + ".old", path + ".tmp")

    merge_sketch_batch(b1, 1, path)
    recovered = _estimates(spark, path)
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".tmp") or os.path.exists(path)

    # ground truth: both batches merged with no crash anywhere
    clean = str(tmp_path / "clean")
    merge_sketch_batch(b0, 0, clean)
    merge_sketch_batch(b1, 1, clean)
    assert recovered == _estimates(spark, clean)


def test_read_corpus_asof_prunes_epochs(spark, tmp_path):
    """As-of reads see exactly the committed-through-epoch state, via
    a partition predicate (PartitionFilters, zero data-file reads of
    later epochs)."""
    from analytics_etl_spark.streaming.ingest import read_corpus_asof

    base = str(tmp_path / "corpus")
    for ep, ids in [(0, [1, 2]), (1, [3]), (2, [4, 5])]:
        spark.createDataFrame([(i, f"doc {i}") for i in ids], ["doc_id", "text"]) \
            .write.mode("overwrite").parquet(f"{base}/epoch={ep}")
    asof1 = read_corpus_asof(spark, base, 1)
    assert sorted(r["doc_id"] for r in asof1.collect()) == [1, 2, 3]
    plan = asof1._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "epoch" in plan


def test_schema_evolution_merge(spark, tmp_path):
    """Old partitions without a later-added column read as NULL under
    mergeSchema; a type CHANGE on an existing column still fails."""
    import pytest

    from analytics_etl_spark.sources.json_ingest import read_evolved_parquet

    base = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.parquet(f"{base}/p=old")
    spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "score"]).write.parquet(
        f"{base}/p=new"
    )
    df = read_evolved_parquet(spark, base)
    rows = {r["id"]: (r["v"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}

    spark.createDataFrame([(3, 7)], ["id", "v"]).write.parquet(f"{base}/p=bad")
    with pytest.raises(Exception):
        read_evolved_parquet(spark, base).collect()


def test_real_stream_maintains_sketch_table(spark, tmp_path):
    """End-to-end under Structured Streaming (file source → foreachBatch
    merge): after two micro-batches the stored sketch table's estimates
    equal the direct batch sketch over all rows — bit-for-bit, because
    union is lossless."""
    import shutil

    import pyspark.sql.types as T

    from analytics_etl_spark.operators.sketches import distinct_estimate
    from analytics_etl_spark.streaming.ingest import streaming_sketch_maintenance

    ev = _events(spark).select("event_id", "ts", "user_id", "event_type", "day")
    landing = tmp_path / "landing"
    landing.mkdir()
    sketch_path = str(tmp_path / "sketches")

    def stage(df, name):
        d = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, landing / name)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("day", T.DateType()),
        ]
    )
    stage(ev.filter(F.col("event_id") % 2 == 0), "f1.parquet")
    stream = spark.readStream.schema(schema).parquet(str(landing))
    q = streaming_sketch_maintenance(stream, sketch_path, str(tmp_path / "ck")).start()
    try:
        q.processAllAvailable()
        stage(ev.filter(F.col("event_id") % 2 == 1), "f2.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = _estimates(spark, sketch_path)
    direct = {
        (r["event_type"], str(r["day"])): r["approx_distinct"]
        for r in distinct_estimate(ev, ["event_type", "day"], "user_id").collect()
    }
    assert streamed == direct and len(direct) > 0


def test_priority_sample_maintenance_equals_batch_and_replays(spark, tmp_path):
    """Streaming-maintained weighted sample == the batch priority
    sample over everything seen (priorities are pure functions of the
    row, so top-k merges losslessly), and a replayed batch is a no-op
    (id-dedup before ranking)."""
    from analytics_etl_spark.operators.sampling import priority_sample
    from analytics_etl_spark.streaming.ingest import (
        merge_priority_sample_batch,
        read_priority_sample,
    )

    path = str(tmp_path / "sample")
    b1 = spark.createDataFrame(
        [(i, 10 + 37 * (i % 13)) for i in range(25)], "doc_id long, w long"
    )
    b2 = spark.createDataFrame(
        [(100 + i, 5 + 11 * (i % 17)) for i in range(25)], "doc_id long, w long"
    )
    merge_priority_sample_batch(b1, 0, path, "w", k=8)
    merge_priority_sample_batch(b2, 1, path, "w", k=8)

    got = {
        (r["sample_id"], r["weight"], r["w_est"])
        for r in read_priority_sample(spark, path).collect()
    }
    want = {
        (r["doc_id"], r["weight"], r["w_est"])
        for r in priority_sample(b1.unionByName(b2), "w", k=8).collect()
    }
    assert got == want and len(got) == 8

    # failure replay: re-deliver batch 1 — byte-identical state
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    merge_priority_sample_batch(b2, 1, path, "w", k=8)
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert before == after


def test_priority_sample_maintenance_intrabatch_dups_and_double_weights(
    spark, tmp_path
):
    """ADVICE r10 regressions: (a) duplicate ids INSIDE one micro-batch
    must not occupy multiple top-(k+1) slots and evict a distinct row
    (dedup now precedes the batch ranking); (b) fractional double
    weights survive storage un-truncated (the stored weight kept its
    bigint cast, breaking w_est = max(w, tau) for double weights)."""
    from analytics_etl_spark.operators.sampling import priority_sample
    from analytics_etl_spark.streaming.ingest import (
        merge_priority_sample_batch,
        read_priority_sample,
    )

    path = str(tmp_path / "sample_dup")
    # 12 distinct ids, each delivered 3x in the same batch, double weights
    rows = [(i, 0.5 + 1.37 * (i % 9)) for i in range(12)] * 3
    b1 = spark.createDataFrame(rows, "doc_id long, w double")
    merge_priority_sample_batch(b1, 0, path, "w", k=8)

    stored = spark.read.parquet(path)
    assert stored.count() == 9  # k+1 DISTINCT rows, no duplicate ids
    assert stored.select("sample_id").distinct().count() == 9

    got = {
        (r["sample_id"], r["weight"], r["w_est"])
        for r in read_priority_sample(spark, path).collect()
    }
    want = {
        (r["doc_id"], r["weight"], r["w_est"])
        for r in priority_sample(b1.dropDuplicates(["doc_id"]), "w", k=8).collect()
    }
    assert got == want and len(got) == 8
    # fractional weights un-truncated
    assert any(r[1] != int(r[1]) for r in got)


def test_priority_sample_updated_weight_survivor_is_deterministic(
    spark, tmp_path
):
    """ADVICE r11: the same id arriving with DIFFERENT weights
    (intra-batch or across batches) must yield a deterministic
    survivor — the (pri, weight)-max version — regardless of arrival
    order. dropDuplicates kept an arbitrary row."""
    from analytics_etl_spark.streaming.ingest import merge_priority_sample_batch

    lo = spark.createDataFrame(
        [(i, 1.0 + (i % 5)) for i in range(10)], "doc_id long, w double"
    )
    hi = spark.createDataFrame(
        [(i, 100.0 + (i % 5)) for i in range(10)], "doc_id long, w double"
    )

    def run(order, sub):
        path = str(tmp_path / sub)
        for epoch, b in enumerate(order):
            merge_priority_sample_batch(b, epoch, path, "w", k=6)
        return sorted(map(tuple, spark.read.parquet(path).collect()))

    a = run([lo, hi], "a")  # low weights first, then the update
    b = run([hi, lo], "b")  # update first, stale version second
    c = run([lo.unionByName(hi)], "c")  # both versions in ONE batch
    assert a == b == c, "survivor depends on arrival order"
    # the higher-priority (here: higher-weight) version won
    weights = {r[0]: r[1] for r in a}
    assert all(w >= 100.0 for w in weights.values()), weights


def test_paragraph_hash_maintenance_equals_batch_and_replays(spark, tmp_path):
    """The maintained paragraph-hash table + batch decision reproduce
    operators/dedup.paragraph_dedup over the FULL history exactly
    (ingest-then-decide), and a replayed micro-batch is a no-op —
    min/max extrema merge idempotently where an n_docs count would
    double (the design point documented at the merge)."""
    from analytics_etl_spark.operators.dedup import paragraph_dedup
    from analytics_etl_spark.streaming.ingest import (
        merge_paragraph_hashes_batch,
        paragraph_dedup_vs_corpus,
    )

    path = str(tmp_path / "par_hashes")
    footer = "copyright acme corp"
    b1 = spark.createDataFrame(
        [
            (1, f"alpha prose one\n{footer}"),
            (2, f"{footer}\nbeta prose two"),
        ],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [
            (3, f"gamma prose three\n{footer}\ngamma tail"),
            (4, "delta prose four\ndelta prose four"),  # intra-doc only
        ],
        "doc_id long, text string",
    )
    merge_paragraph_hashes_batch(b1, 0, path)
    merge_paragraph_hashes_batch(b2, 1, path)

    # decide batch 2 against the maintained table == batch operator on
    # the full history, restricted to batch-2 docs
    got = {
        (r["doc_id"], r["n_pars"], r["n_kept"], r["text_dedup"])
        for r in paragraph_dedup_vs_corpus(spark, path, b2).collect()
    }
    want = {
        (r["doc_id"], r["n_pars"], r["n_kept"], r["text_dedup"])
        for r in paragraph_dedup(b1.unionByName(b2)).collect()
        if r["doc_id"] >= 3
    }
    assert got == want
    # doc 3 lost the footer (corpus-first lives in doc 1); doc 4's
    # intra-doc repeat survived (single-doc hash is not boilerplate)
    by_id = {r[0]: r for r in got}
    assert by_id[3][3] == "gamma prose three\ngamma tail"
    assert by_id[4][2] == 2

    # failure replay: re-deliver batch 2 — byte-identical state
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    merge_paragraph_hashes_batch(b2, 1, path)
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert before == after


def test_real_stream_maintains_paragraph_table(spark, tmp_path):
    """End-to-end under Structured Streaming (file source →
    foreachBatch merge): after two micro-batches the paragraph-hash
    table drives decisions identical to the batch operator over all
    docs seen — the same lossless+idempotent story as the sketch
    table, via min/max extrema instead of register maxima."""
    import shutil

    import pyspark.sql.types as T

    from analytics_etl_spark.operators.dedup import paragraph_dedup
    from analytics_etl_spark.streaming.ingest import (
        paragraph_dedup_vs_corpus,
        streaming_paragraph_maintenance,
    )

    footer = "copyright acme corp"
    all_docs = spark.createDataFrame(
        [
            (1, f"alpha prose\n{footer}"),
            (2, f"{footer}\nbeta prose"),
            (3, f"gamma prose\n{footer}"),
            (4, "delta prose\ndelta prose"),
        ],
        "doc_id long, text string",
    )
    landing = tmp_path / "landing"
    landing.mkdir()
    table_path = str(tmp_path / "par_hashes")

    def stage(df, name):
        d = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, landing / name)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stage(all_docs.filter(F.col("doc_id") <= 2), "f1.parquet")
    stream = spark.readStream.schema(schema).parquet(str(landing))
    q = streaming_paragraph_maintenance(
        stream, table_path, str(tmp_path / "ck")
    ).start()
    try:
        q.processAllAvailable()
        stage(all_docs.filter(F.col("doc_id") >= 3), "f2.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["doc_id"], r["n_kept"], r["text_dedup"])
        for r in paragraph_dedup_vs_corpus(spark, table_path, all_docs).collect()
    }
    want = {
        (r["doc_id"], r["n_kept"], r["text_dedup"])
        for r in paragraph_dedup(all_docs).collect()
    }
    assert got == want and len(got) == 4


def test_histogram_maintenance_equals_batch(spark, tmp_path):
    """Incrementally merged histogram bins equal the one-shot build
    over all rows (lossless int64 SUM; the exactly-once/ledger stance
    is the CMS contract, declared at the merge)."""
    from analytics_etl_spark.operators.histogram import histogram_build
    from analytics_etl_spark.streaming.ingest import merge_histogram_batch

    ev = _events(spark)
    path = str(tmp_path / "hist")
    for epoch, m in enumerate(range(3)):
        merge_histogram_batch(
            ev.filter(F.col("event_id") % 3 == m), epoch, path, "value", 5
        )
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    want = sorted(map(tuple, histogram_build(ev, "value", 5).collect()))
    assert got == want and len(got) > 0


def test_grouped_histogram_maintenance_equals_batch(spark, tmp_path):
    """The GROUPED bin table maintains identically: per-event-type
    bins merged over micro-batches equal the one-shot grouped build
    (histogram_merge keys on all non-cnt columns, so group_cols ride
    along with zero extra merge logic), and the per-group quantile
    read works off the maintained table."""
    from analytics_etl_spark.operators.histogram import (
        histogram_build,
        histogram_quantiles,
    )
    from analytics_etl_spark.streaming.ingest import merge_histogram_batch

    ev = _events(spark)
    path = str(tmp_path / "ghist")
    for epoch, m in enumerate(range(3)):
        merge_histogram_batch(
            ev.filter(F.col("event_id") % 3 == m),
            epoch,
            path,
            "value",
            5,
            group_cols=("event_type",),
        )
    stored = spark.read.parquet(path)
    got = sorted(map(tuple, stored.collect()))
    want = sorted(
        map(
            tuple,
            histogram_build(ev, "value", 5, group_cols=("event_type",)).collect(),
        )
    )
    assert got == want and len(got) > 0
    q_stored = sorted(
        map(
            tuple,
            histogram_quantiles(
                stored, ((1, 2),), 5, group_cols=("event_type",)
            ).collect(),
        )
    )
    assert len(q_stored) > 0


def test_domain_stats_maintenance_equals_batch_and_feeds_doremi(spark, tmp_path):
    """The DoReMi domain-stats table maintains losslessly: per-domain
    (n_docs, sum_loss) merged over micro-batches equals the one-shot
    aggregation (int64 SUM; exactly-once stance declared at the
    merge), and doremi_reweight over the MAINTAINED table equals the
    reweighting over the one-shot stats — the loop never rescans the
    corpus."""
    from analytics_etl_spark.operators.doremi import (
        domain_loss_stats,
        doremi_reweight,
    )
    from analytics_etl_spark.streaming.ingest import merge_domain_stats_batch

    rows = [(i, ["web", "code", "wiki"][i % 3], (i * 37) % 900) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, domain string, loss long")
    path = str(tmp_path / "dstats")
    for epoch in range(3):
        merge_domain_stats_batch(
            docs.filter(F.col("doc_id") % 3 == epoch), epoch, path
        )
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    want = sorted(map(tuple, domain_loss_stats(docs).collect()))
    assert got == want and len(got) == 3
    w_maintained = sorted(
        map(tuple, doremi_reweight(spark.read.parquet(path), rounds=5).collect())
    )
    w_oneshot = sorted(
        map(tuple, doremi_reweight(domain_loss_stats(docs), rounds=5).collect())
    )
    assert w_maintained == w_oneshot
