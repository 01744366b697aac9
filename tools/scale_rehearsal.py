"""Scale rehearsal: 10x AND 100x tiers (VERDICT r12 item 2, r13 item 1)
— empirically test the SCALING.md ledger's 100 TB-design claims two
decades up from the sf0.1 scale gate, without touching the read-only
/root/testdata.

Corpus construction (round-14 revision). The r13 generator stamped
one seed token per copy, which left copies of the same document
NEAR-DUPLICATES of each other (measured: 224,361 of the 10x tier's
250,300 LSH pairs were cross-copy self-pairs) — so the near-dup pair
list grew QUADRATICALLY in the copy count (C(copies,2) per base doc).
At 10 copies that was survivable (250k pairs); at 100 copies it would
be 24.75M pairs — an artifact of the synthetic construction, not a
property of a 100x-bigger corpus (a real corpus's near-dup density is
roughly linear in its size). The r14 generator instead marks copies
by DETERMINISTIC WORD SUBSTITUTION: every 4th word of copy k > 0 gets
an ``x{k}`` suffix, so ~75% of a copy's 3-gram shingles differ from
every other copy's (cross-copy Jaccard ~0.14 — below the 0.3 link
band and far below minhash banding's effective candidate range),
while WITHIN-copy near-dup structure (the real signal) is preserved
exactly. Embeddings: norm-preserving roll by k mod dim, negated for
k >= dim (distinct transforms for 100 copies at dim 64). Lineitem:
both graph keys shifted per copy — 100 disjoint co-purchase graphs.

Both tiers are built by the same generator, so the 1x->10x and
10x->100x decades are comparable; the 10x->100x exponent is the
honest one (fixed overheads stop flattering the curve).

Usage:
    python tools/scale_rehearsal.py build10  [/tmp/scale10x]
    python tools/scale_rehearsal.py build100 [/tmp/scale100x]
    python tools/scale_rehearsal.py run      [/tmp/scale10x /tmp/scale100x]
    python tools/scale_rehearsal.py all

Output: one JSON line per family with per-decade wall-time exponents
(log10 of adjacent-tier ratios) + the at-scale plan re-assertions on
the 100x data (paste into SCALING.md's measured-at-scale table).
"""

from __future__ import annotations

import contextlib
import io
import json
import math
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
SHIFT = 10_000_000

FAMILIES = (
    "knn_graph_clusters",
    "corpus_build_pipeline",
    "corpus_build_paradedup",
    "dedup_paragraph_corpus",
    "dedup_minhash_lsh",
    "text_search_bm25",
    "dataset_split_cluster_safe",
    "copurchase_communities",
    # round-14: the daily-ingest composition — its batch is the top
    # 20% of ids, so the tiers scale batch AND standing together
    "corpus_refresh_pipeline",
)


def get_spark(memory: str = "24g", event_log_dir: str | None = None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", memory)
        .config("spark.sql.session.timeZone", "UTC")
    )
    if event_log_dir is not None:
        os.makedirs(event_log_dir, exist_ok=True)
        b = (
            b.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.dir", event_log_dir)
        )
    return b.getOrCreate()


def build(scratch: str, copies: int) -> None:
    """One pass per table: cross join with a broadcast copy-index
    frame (k = 0..copies-1), id-shift by k*SHIFT, mark copy k's text
    by suffixing every 4th word — a single scan however many copies,
    no 100-way union plan."""
    import pyspark.sql.functions as F

    spark = get_spark()
    os.makedirs(scratch, exist_ok=True)
    ks = F.broadcast(spark.range(copies).select(F.col("id").alias("k")))

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    w = F.split(F.col("text"), " ")
    marked = F.array_join(
        F.zip_with(
            w,
            F.sequence(F.lit(0), F.greatest(F.size(w) - 1, F.lit(0))),
            lambda word, i: F.when(
                (F.col("k") > 0) & (i % 4 == 0),
                F.concat(word, F.lit("x"), F.col("k").cast("string")),
            ).otherwise(word),
        ),
        " ",
    )
    (
        docs.crossJoin(ks)
        .select(
            (F.col("doc_id") + F.col("k") * SHIFT).alias("doc_id"),
            F.when(F.col("text").isNull(), F.lit(None).cast("string"))
            .otherwise(marked)
            .alias("text"),
            "lang",
            "source",
            "k",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("k")
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{scratch}/documents.parquet")
    )

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    roll = F.col("k") % dim
    rolled = F.when(F.col("k") % dim == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice("embedding", roll + 1, F.lit(dim) - roll),
            F.slice("embedding", 1, roll),
        )
    )
    signed = F.when(
        F.col("k") >= dim, F.transform(rolled, lambda x: -x)
    ).otherwise(rolled)
    (
        emb.crossJoin(ks)
        .select(
            (F.col("vec_id") + F.col("k") * SHIFT).alias("vec_id"),
            signed.alias("embedding"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{scratch}/embeddings.parquet")
    )

    li = spark.read.parquet(f"{SF1}/lineitem.parquet")
    (
        li.crossJoin(ks)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("k") * SHIFT)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("k") * SHIFT)
        .drop("k")
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{scratch}/lineitem.parquet")
    )

    for name in "region nation customer supplier part orders events".split():
        src, dst = f"{SF1}/{name}.parquet", f"{scratch}/{name}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)
    n_docs = spark.read.parquet(f"{scratch}/documents.parquet").count()
    n_vecs = spark.read.parquet(f"{scratch}/embeddings.parquet").count()
    n_li = spark.read.parquet(f"{scratch}/lineitem.parquet").count()
    print(
        json.dumps(
            {
                "built": scratch,
                "copies": copies,
                "n_docs": n_docs,
                "n_vecs": n_vecs,
                "n_lineitem": n_li,
            }
        ),
        flush=True,
    )


def assert_plans(spark, scratch: str) -> dict:
    """At-scale plan invariants on the LARGEST tier: the kNN candidate
    join stays a keyed equi-join (no broadcast flip to NestedLoop),
    LSH dedup / LPA / cluster-safe split carry no nested-loop shapes."""
    import pyspark.sql.functions as F

    from analytics_etl_spark.operators.similarity import knn_join, valid_embeddings
    from analytics_etl_spark.queries import REGISTRY

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    emb = valid_embeddings(
        spark.read.parquet(f"{scratch}/embeddings.parquet"), dim=64
    )
    self_q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    knn_plan = plan_of(knn_join(emb, self_q, k=5, bucket_bits=8))
    checks = {
        "knn_bucketed_keyed_equijoin": any(
            j in knn_plan
            for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        ),
        "knn_bucketed_sortmerge_info": "SortMergeJoin" in knn_plan,
        "knn_bucketed_no_bnl": "BroadcastNestedLoopJoin" not in knn_plan,
        "knn_bucketed_no_cartesian": "CartesianProduct" not in knn_plan,
    }
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big_plan = plan_of(knn_join(emb, self_q, k=5, bucket_bits=8))
        checks["knn_bucketed_smj_when_unbroadcastable"] = (
            "SortMergeJoin" in big_plan
        )
        checks["knn_bucketed_no_bnl_when_unbroadcastable"] = (
            "BroadcastNestedLoopJoin" not in big_plan
            and "CartesianProduct" not in big_plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    lsh_plan = plan_of(REGISTRY["dedup_minhash_lsh"].fn(spark, scratch))
    checks["lsh_no_cartesian"] = "CartesianProduct" not in lsh_plan
    checks["lsh_no_bnl"] = "BroadcastNestedLoopJoin" not in lsh_plan
    from analytics_etl_spark.operators.graph import label_propagation
    from analytics_etl_spark.queries.llm3 import copurchase_edges

    lpa_plan = plan_of(label_propagation(copurchase_edges(spark, scratch), rounds=1))
    checks["lpa_round_no_nested_loop"] = (
        "CartesianProduct" not in lpa_plan
        and "BroadcastNestedLoopJoin" not in lpa_plan
    )
    checks["lpa_round_windowed_vote"] = "Window" in lpa_plan
    split_plan = plan_of(REGISTRY["dataset_split_cluster_safe"].fn(spark, scratch))
    checks["cluster_split_no_nested_loop"] = (
        "CartesianProduct" not in split_plan
        and "BroadcastNestedLoopJoin" not in split_plan
    )
    return checks


def run(
    tiers: list[tuple[str, str]],
    reps: int = 3,
    families: tuple[str, ...] = FAMILIES,
) -> None:
    """Interleaved A/B/C across all tiers in ONE session (the
    bench-host-variance rule: only same-run ratios are trustworthy).
    ``families`` narrows the sweep — e.g. re-measuring one family
    after a fix (the r15 planner-default exponent row) without paying
    for the other eight."""
    from analytics_etl_spark.queries import REGISTRY

    spark = get_spark()
    times: dict[str, dict[str, list[float]]] = {
        f: {label: [] for label, _ in tiers} for f in families
    }
    for f in families:
        for _, sf in tiers:
            REGISTRY[f].fn(spark, sf).count()  # warm-up, untimed
    for rep in range(reps):
        for f in families:
            for label, sf in tiers:
                t0 = time.monotonic()
                REGISTRY[f].fn(spark, sf).count()
                times[f][label].append(time.monotonic() - t0)
        print(json.dumps({"rep": rep, "done": True}), flush=True)

    summary = {}
    labels = [label for label, _ in tiers]
    for f in families:
        med = {lb: statistics.median(times[f][lb]) for lb in labels}
        entry = {f"{lb}_s": round(med[lb], 3) for lb in labels}
        for a, b in zip(labels, labels[1:]):
            # adjacent tiers are one decade apart -> log10 of the ratio
            entry[f"exp_{a}_to_{b}"] = round(math.log10(med[b] / med[a]), 3)
        entry["spreads"] = {
            lb: [round(min(times[f][lb]), 3), round(max(times[f][lb]), 3)]
            for lb in labels
        }
        summary[f] = entry
        print(json.dumps({f: entry}), flush=True)
    checks = assert_plans(spark, tiers[-1][1]) if families == FAMILIES else {}
    print(
        json.dumps(
            {
                "summary": summary,
                "plan_checks": checks,
                "load_avg": [round(x, 2) for x in os.getloadavg()],
                "reps": reps,
                "tiers": dict(tiers),
            }
        ),
        flush=True,
    )
    failed = [k for k, v in checks.items() if not v and not k.endswith("_info")]
    if failed:
        print(f"PLAN CHECKS FAILED: {failed}", file=sys.stderr)
        sys.exit(1)


def knee(scratch: str, reps: int = 3) -> None:
    """The r14 knee follow-up: knn_graph_clusters went SUPERLINEAR
    over the second decade (bucket_bits=10 fixed → candidates
    ~N²/1024). Measure the remedy on the x100 tier in one session:

    - bits=10 (the registered small-SF knob — the knee itself);
    - bits=plan_bucket_bits(N) (constant occupancy → linear
      candidates);
    - scaled bits + n_probes=4 (multiprobe recall recovery at
      ~4× linear cost).

    Alongside wall time, record the mutual-edge count and the
    fraction of the bits-10 edge set each scaled variant retains —
    bits-10 collides the most, so retention against it is the
    honest recall proxy at a size where exact ground truth (N² =
    4·10^10 cosines) is off the table."""
    import pyspark.sql.functions as F

    from analytics_etl_spark.operators.similarity import (
        knn_join,
        mutual_knn_edges,
        plan_bucket_bits,
        valid_embeddings,
    )

    spark = get_spark()
    emb = valid_embeddings(
        spark.read.parquet(f"{scratch}/embeddings.parquet"), dim=64
    ).localCheckpoint(eager=True)
    n = emb.count()
    scaled = plan_bucket_bits(n)
    self_q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # labels are structurally distinct even when the planner lands on
    # 10 bits (small corpora): a duplicate dict key would silently
    # collapse the scaled arm into the fixed arm
    variants = {
        "fixed_bits10": dict(bucket_bits=10),
        f"planned_bits{scaled}": dict(bucket_bits=scaled),
        f"planned_bits{scaled}_probes4": dict(bucket_bits=scaled, n_probes=4),
    }

    def edges_of(kw):
        return mutual_knn_edges(knn_join(emb, self_q, k=5, **kw))

    out: dict[str, dict] = {}
    edge_sets: dict[str, object] = {}
    for name, kw in variants.items():
        edges_of(kw).count()  # warm-up
    for name, kw in variants.items():
        runs = []
        for _ in range(reps):
            t0 = time.monotonic()
            n_edges = edges_of(kw).count()
            runs.append(time.monotonic() - t0)
        edge_sets[name] = edges_of(kw).localCheckpoint(eager=True)
        out[name] = {
            "median_s": round(statistics.median(runs), 3),
            "spread": [round(min(runs), 3), round(max(runs), 3)],
            "n_mutual_edges": n_edges,
        }
    ref = edge_sets["fixed_bits10"]
    for name in variants:
        if name == "fixed_bits10":
            out[name]["retained_vs_bits10"] = 1.0
            continue
        kept = edge_sets[name].join(ref, ["u", "v"], "left_semi").count()
        out[name]["retained_vs_bits10"] = round(
            kept / max(out["fixed_bits10"]["n_mutual_edges"], 1), 3
        )
    print(
        json.dumps(
            {
                "knee_followup": out,
                "n_vectors": n,
                "planned_bits": scaled,
                "load_avg": [round(x, 2) for x in os.getloadavg()],
            }
        ),
        flush=True,
    )


def spill(family: str, scratch: str, memory: str, reps: int = 2) -> None:
    """Memory-pressure probe (VERDICT r14 item 3): run ONE registered
    family over the x100 tier in a session whose driver JVM is capped
    at ``memory`` (the r14 rehearsal sat in 128 GiB comfort — this
    finds where the spill knee actually is), and report wall times
    plus the run's total shuffle/agg/sort spill from the event log.

    One family per PROCESS on purpose: spark.driver.memory binds at
    JVM launch, so memory tiers cannot share a session; and parsing
    our own (uncompressed, stopped) event log sidesteps the flush
    races a live statusStore read would have. An OOM-killed or
    aborted run is itself a finding — the wrapper records the
    exception instead of dying (exit stays 0 so the sweep continues;
    the JSON carries completed=false)."""
    import glob

    from analytics_etl_spark.queries import REGISTRY

    ev_dir = f"/tmp/aes_spill_events_{os.getpid()}"
    spark = get_spark(memory=memory, event_log_dir=ev_dir)
    app_id = spark.sparkContext.applicationId
    jvm_max = int(
        spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    )
    runs: list[float] = []
    err = None
    try:
        REGISTRY[family].fn(spark, scratch).count()  # warm-up, untimed
        for _ in range(reps):
            t0 = time.monotonic()
            REGISTRY[family].fn(spark, scratch).count()
            runs.append(time.monotonic() - t0)
    except BaseException as e:  # noqa: BLE001 — an OOM/abort IS the datum
        err = f"{type(e).__name__}: {str(e)[:200]}"
    finally:
        try:
            spark.stop()
        except BaseException as e:  # noqa: BLE001 — a heap-OOM'd JVM
            # drops the py4j socket, so stop() itself raises; the
            # probe must still report (first observed: paradedup @2g)
            err = err or f"stop after JVM death: {type(e).__name__}"
    mem_spill = disk_spill = 0
    for f in glob.glob(f"{ev_dir}/*{app_id}*/events_*") + glob.glob(
        f"{ev_dir}/*{app_id}*"
    ):
        if os.path.isdir(f):
            continue
        with open(f, errors="ignore") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:  # noqa: BLE001 — partial tail line
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    mem_spill += m.get("Memory Bytes Spilled", 0)
                    disk_spill += m.get("Disk Bytes Spilled", 0)
    shutil.rmtree(ev_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "spill_probe": {
                    "family": family,
                    "memory": memory,
                    "jvm_max_mb": jvm_max // 2**20,
                    "median_s": round(statistics.median(runs), 3) if runs else None,
                    "runs_s": [round(r, 3) for r in runs],
                    "mem_spill_mb": mem_spill // 2**20,
                    "disk_spill_mb": disk_spill // 2**20,
                    "completed": err is None,
                    "error": err,
                    "load_avg": [round(x, 2) for x in os.getloadavg()],
                }
            }
        ),
        flush=True,
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "build10":
        build(sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x", 10)
    elif mode == "build100":
        build(sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100x", 100)
    elif mode == "run":
        ten = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x"
        hundred = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale100x"
        fams = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else FAMILIES
        run([("sf0.1", SF1), ("x10", ten), ("x100", hundred)], families=fams)
    elif mode == "knee":
        knee(sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100x")
    elif mode == "spill":
        spill(
            sys.argv[2],
            sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale100x",
            sys.argv[4] if len(sys.argv) > 4 else "8g",
        )
    elif mode == "all":
        build("/tmp/scale10x", 10)
        build("/tmp/scale100x", 100)
        run([("sf0.1", SF1), ("x10", "/tmp/scale10x"), ("x100", "/tmp/scale100x")])
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
