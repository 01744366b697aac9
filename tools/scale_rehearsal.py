"""10x scale rehearsal (VERDICT r12 item 2): empirically test the
SCALING.md ledger's 100x-design claims one decade up from the sf0.1
scale gate, without touching the read-only /root/testdata.

Builds a deterministic sf1-equivalent in scratch — a 10-way
id-shifted self-union of sf0.1 with a per-copy SEED STAMP so the
copies are not exact duplicates (a stamp token prefixes every
document text; embeddings are rolled by the copy index, a
norm-preserving permutation that decorrelates the copies). Then runs
the heavy registered families interleaved A/B at sf0.1 and 10x in
ONE session (the bench-host-variance rule: only same-run ratios are
trustworthy), reports median wall times, the 1x->10x ratio and the
implied scaling exponent log10(t10/t1), and re-asserts the at-scale
plan invariants on the 10x data (candidate joins stay keyed
equi-joins — no broadcast flipping to NestedLoop, no
CartesianProduct).

Usage: python tools/scale_rehearsal.py [build|run|all] [scratch_dir]
Output: one JSON line per family + a summary block (paste into
SCALING.md's "measured at 10x" column).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
SHIFT = 10_000_000
COPIES = 10

FAMILIES = (
    "knn_graph_clusters",
    "corpus_build_pipeline",
    "corpus_build_paradedup",
    "dedup_paragraph_corpus",
    "dedup_minhash_lsh",
    "text_search_bm25",
    # round-13 continuation: the LSH->CC->split composition (documents
    # 10x) and fixed-round LPA over the co-purchase graph (lineitem is
    # 10x'd as disjoint graph copies — see build())
    "dataset_split_cluster_safe",
    "copurchase_communities",
)


def get_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def build(scratch: str) -> None:
    import pyspark.sql.functions as F

    spark = get_spark()
    os.makedirs(scratch, exist_ok=True)
    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    parts = []
    for k in range(COPIES):
        stamped = docs.select(
            (F.col("doc_id") + F.lit(k * SHIFT)).alias("doc_id"),
            F.concat(F.lit(f"seed{k}tok "), F.col("text")).alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text").cast("long"))
        parts.append(stamped)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{scratch}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    eparts = []
    for k in range(COPIES):
        if k == 0:
            rolled = F.col("embedding")
        else:
            rolled = F.concat(
                F.slice("embedding", k + 1, dim - k), F.slice("embedding", 1, k)
            )
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * SHIFT)).alias("vec_id"),
                rolled.alias("embedding"),
            )
        )
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(32).write.mode("overwrite").parquet(
        f"{scratch}/embeddings.parquet"
    )

    # lineitem 10x: id-shift BOTH graph keys, producing 10 disjoint
    # copies of the co-purchase graph — 10x the edges with the same
    # per-copy structure (copurchase_communities' scale input; the
    # disjointness is fine, LPA/CC cost is driven by |E|, not by
    # whether components touch)
    li = spark.read.parquet(f"{SF1}/lineitem.parquet")
    lparts = []
    for k in range(COPIES):
        lparts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * SHIFT))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * SHIFT))
        )
    lout = lparts[0]
    for p in lparts[1:]:
        lout = lout.unionByName(p)
    lout.repartition(32).write.mode("overwrite").parquet(
        f"{scratch}/lineitem.parquet"
    )

    # remaining tables: the heavy families above never read them, but
    # copying keeps the dir a complete sf layout for any t() load
    for name in (
        "region nation customer supplier part orders events".split()
    ):
        src = f"{SF1}/{name}.parquet"
        dst = f"{scratch}/{name}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)
    n_docs = spark.read.parquet(f"{scratch}/documents.parquet").count()
    n_vecs = spark.read.parquet(f"{scratch}/embeddings.parquet").count()
    print(json.dumps({"built": scratch, "n_docs": n_docs, "n_vecs": n_vecs}))


def assert_plans(spark, scratch: str) -> dict:
    """At-scale plan invariants on the 10x data: the kNN candidate
    join stays a SortMergeJoin on the bucket key (no broadcast flip to
    NestedLoop at 20k vectors), and the LSH dedup plan carries no
    CartesianProduct / BroadcastNestedLoopJoin anywhere."""
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
        # the invariant: the candidate join is a KEYED equi-join of
        # some physical flavor (SMJ at corpus-sized both sides; AQE
        # may pick a hash join when one side is genuinely small) and
        # NEVER degrades to a nested-loop/cartesian shape
        "knn_bucketed_keyed_equijoin": any(
            j in knn_plan
            for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        ),
        "knn_bucketed_sortmerge_info": "SortMergeJoin" in knn_plan,
        "knn_bucketed_no_bnl": "BroadcastNestedLoopJoin" not in knn_plan,
        "knn_bucketed_no_cartesian": "CartesianProduct" not in knn_plan,
    }
    # the 100x simulation: when NO side fits a broadcast (the true
    # corpus regime — disable the threshold to force the planner's
    # hand), the candidate join must fall back to SortMergeJoin on the
    # bucket key, never to a nested-loop shape
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
    # LPA: one un-checkpointed round over the 10x co-purchase edges —
    # the per-round work must stay keyed (edge join + vote groupBy +
    # rank window), never a nested-loop shape. The edge list comes
    # from the SAME helper the registered query runs (queries/llm3.py
    # copurchase_edges), so this certifies the production plan, not a
    # hand-copied twin.
    from analytics_etl_spark.operators.graph import label_propagation
    from analytics_etl_spark.queries.llm3 import copurchase_edges

    lpa_plan = plan_of(label_propagation(copurchase_edges(spark, scratch), rounds=1))
    checks["lpa_round_no_nested_loop"] = (
        "CartesianProduct" not in lpa_plan
        and "BroadcastNestedLoopJoin" not in lpa_plan
    )
    checks["lpa_round_windowed_vote"] = "Window" in lpa_plan
    # cluster-safe split: CC truncates its own lineage; what remains
    # must be the ONE corpus-side equi-join + a pure projection
    split_plan = plan_of(REGISTRY["dataset_split_cluster_safe"].fn(spark, scratch))
    checks["cluster_split_no_nested_loop"] = (
        "CartesianProduct" not in split_plan
        and "BroadcastNestedLoopJoin" not in split_plan
    )
    return checks


def run(scratch: str, reps: int = 3) -> None:
    from analytics_etl_spark.queries import REGISTRY

    spark = get_spark()
    # warm the JVM/codegen once per family per SF outside timing
    times: dict[str, dict[str, list[float]]] = {
        f: {"sf0.1": [], "x10": []} for f in FAMILIES
    }
    for f in FAMILIES:
        for sf in (SF1, scratch):
            REGISTRY[f].fn(spark, sf).count()
    for rep in range(reps):
        for f in FAMILIES:
            for label, sf in (("sf0.1", SF1), ("x10", scratch)):
                t0 = time.monotonic()
                REGISTRY[f].fn(spark, sf).count()
                times[f][label].append(time.monotonic() - t0)
        print(json.dumps({"rep": rep, "done": True}), flush=True)
    import math

    summary = {}
    for f in FAMILIES:
        t1 = statistics.median(times[f]["sf0.1"])
        t10 = statistics.median(times[f]["x10"])
        summary[f] = {
            "sf0.1_s": round(t1, 3),
            "x10_s": round(t10, 3),
            "ratio": round(t10 / t1, 2),
            "exponent": round(math.log10(t10 / t1), 3),
            "spread_sf0.1": [round(min(times[f]["sf0.1"]), 3), round(max(times[f]["sf0.1"]), 3)],
            "spread_x10": [round(min(times[f]["x10"]), 3), round(max(times[f]["x10"]), 3)],
        }
        print(json.dumps({f: summary[f]}), flush=True)
    checks = assert_plans(spark, scratch)
    load = os.getloadavg()
    print(
        json.dumps(
            {
                "summary": summary,
                "plan_checks": checks,
                "load_avg": [round(x, 2) for x in load],
                "reps": reps,
            }
        ),
        flush=True,
    )
    failed = [k for k, v in checks.items() if not v and not k.endswith("_info")]
    if failed:
        print(f"PLAN CHECKS FAILED: {failed}", file=sys.stderr)
        sys.exit(1)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x"
    if mode in ("build", "all"):
        build(scratch)
    if mode in ("run", "all"):
        run(scratch)


if __name__ == "__main__":
    main()
