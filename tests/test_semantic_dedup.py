"""SemDeDup-shaped semantic dedup (operators/ivf.py::semantic_dedup).

The rows-only declaration for `dedup_semantic` points here: the
properties that stand in for a SQL oracle are (1) planted
near-duplicate groups collapse to exactly their smallest id, (2)
dissimilar vectors all survive, (3) junk vectors are gated out of the
result entirely, (4) the kept set is invariant under input
repartitioning, and (5) the candidate join is an equi-join on the
cluster cell — no cartesian anywhere in the plan.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from analytics_etl_spark.operators.ivf import semantic_dedup

SCHEMA = "vec_id long, embedding array<double>"


def _noisy(base, eps, j):
    # deterministic tiny perturbation: cosine to base stays ~1
    return [x + eps * ((j * 7 + i) % 3 - 1) for i, x in enumerate(base)]


def test_planted_near_duplicates_collapse_to_min_id(spark):
    b1 = [1.0, 2.0, 3.0, 4.0]
    b2 = [-4.0, 3.0, -2.0, 1.0]
    rows = (
        [(10 + j, _noisy(b1, 1e-6, j)) for j in range(3)]
        + [(20 + j, _noisy(b2, 1e-6, j)) for j in range(4)]
        + [(30, [1.0, -1.0, 1.0, -1.0])]  # a singleton, far from both
    )
    out = semantic_dedup(
        spark.createDataFrame(rows, SCHEMA), threshold=0.99, k=2, dim=4
    ).collect()
    kept = {r["vec_id"] for r in out if r["kept"]}
    assert kept == {10, 20, 30}
    # every dropped row names a smaller same-group witness
    dup_of = {r["vec_id"]: r["dup_of"] for r in out if not r["kept"]}
    assert dup_of == {11: 10, 12: 10, 21: 20, 22: 20, 23: 20}


def test_dissimilar_vectors_all_survive(spark):
    rows = [(i, [1.0 if d == i else 0.0 for d in range(6)]) for i in range(6)]
    out = semantic_dedup(
        spark.createDataFrame(rows, SCHEMA), threshold=0.5, k=3, dim=6
    ).collect()
    assert all(r["kept"] for r in out)
    assert len(out) == 6


def test_junk_vectors_are_gated_out(spark):
    nan, inf = float("nan"), float("inf")
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 1e-7, 0.0]),     # near-dup of 0
        (2, None),                  # NULL vector
        (3, [0.0, 0.0, 0.0]),       # zero norm
        (4, [1.0, nan, 0.0]),       # NaN
        (5, [1.0, inf, 0.0]),       # Inf
        (6, [1.0, 0.0]),            # wrong dim
    ]
    # k=1: with only two valid survivors, k=2 would seed each as its
    # own cell and never compare them — a correct (if useless)
    # clustering; one cell forces the comparison this test is about
    out = semantic_dedup(
        spark.createDataFrame(rows, SCHEMA), threshold=0.99, k=1, dim=3
    ).collect()
    assert {r["vec_id"] for r in out} == {0, 1}
    assert {r["vec_id"] for r in out if r["kept"]} == {0}


def test_kept_set_invariant_under_repartitioning(spark):
    rows = [
        (i, [float((i * 13 + d * 7) % 11 - 5) for d in range(8)]) for i in range(60)
    ] + [(100 + i, _noisy([float(d) for d in range(8)], 1e-6, i)) for i in range(5)]
    df = spark.createDataFrame(rows, SCHEMA)
    base = {
        (r["vec_id"], r["kept"], r["dup_of"])
        for r in semantic_dedup(df, threshold=0.99, k=4, dim=8).collect()
    }
    shuffled = {
        (r["vec_id"], r["kept"], r["dup_of"])
        for r in semantic_dedup(
            df.repartition(7, "vec_id"), threshold=0.99, k=4, dim=8
        ).collect()
    }
    assert base == shuffled
    # the modular vectors repeat with period 11 in i, so every i >= 11
    # is an exact duplicate of i-11 and drops alongside the planted set
    assert {v for v, k, _ in base if not k} == set(range(11, 60)) | {101, 102, 103, 104}


def test_candidate_join_is_equi_on_cell_no_cartesian(spark):
    rows = [(i, [float(i % 5), 1.0, float(i % 3)]) for i in range(20)]
    out = semantic_dedup(
        spark.createDataFrame(rows, SCHEMA), threshold=0.95, k=3, dim=3
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_derived_k_tracks_corpus_size(spark):
    """k = ceil(n / target_cluster_size) with a floor of 4 — the pair
    join stays ~n·target at any corpus size."""
    rows = [(i, [float((i * 3 + d) % 7 - 3) for d in range(4)]) for i in range(40)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = semantic_dedup(df, threshold=0.999, dim=4, target_cluster_size=10, iters=1)
    cells = out.select("cell").distinct().collect()
    assert len(cells) <= 4  # k == max(4, ceil(40/10)) == 4 cells max
    assert out.count() == 40


def test_duplicate_recall_vs_exact_cosine_ground_truth(spark):
    """VERDICT r9 item 6 — measured duplicate-recall contrast.

    Ground truth: brute-force all-pairs cosine over the gated sf0.001
    embeddings — a vector is a TRUE drop iff ANY smaller-id vector
    anywhere in the corpus has cosine ≥ 0.3 (the same threshold the
    registered dedup_semantic query uses, calibrated to match
    dedup_embedding_cosine). semantic_dedup restricts witnesses to the
    SAME k-means cell, so its drop set can only be a subset:

      precision — exactly 1.0, structurally: a same-cell witness IS a
        corpus-wide witness (asserted as zero false positives);
      recall — the price of cluster-locality. Measured 2026-08-14:
        0.691 at sf0.001 (262/379) and 0.691 at sf0.01 (251/363),
        k=4 cells, iters=3. This corpus is the HARD regime (near-
        uniform vectors, true neighbors at cosine ≈0.3 — the same
        regime where single-probe LSH scores ~0.0 recall in
        tests/test_ann_recall.py); on clustered real-world embeddings
        with near-dups at cosine ≥0.9, SemDeDup's cluster-local
        assumption loses far less. Pinned at ≥ 0.60 so a regression
        in clustering (seeding, assignment, gating) that starts
        missing cross-cluster near-dups fails the suite.
    """
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    from analytics_etl_spark.operators.similarity import (
        as_double_array,
        cosine,
        valid_embeddings,
    )

    e = valid_embeddings(emb, "embedding", 64).select(
        F.col("vec_id").alias("id"), as_double_array("embedding").alias("v")
    )
    a = e.select(F.col("id").alias("ia"), F.col("v").alias("va"))
    b = e.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
    true_drops = {
        r["ib"]
        for r in a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .filter(cosine(F.col("va"), F.col("vb")) >= 0.3)
        .select("ib")
        .distinct()
        .collect()
    }
    sem_drops = {
        r["vec_id"]
        for r in semantic_dedup(emb, threshold=0.3, dim=64, iters=3).collect()
        if not r["kept"]
    }
    assert not (sem_drops - true_drops), "cluster-local witness not a true witness"
    recall = len(sem_drops & true_drops) / len(true_drops)
    assert recall >= 0.60, f"duplicate recall degraded: {recall:.3f}"


def test_cc_variant_resolves_chains_to_one_survivor(spark):
    """semantic_dedup_cc (ADVICE r9's alternative rule): a near-dup
    CHAIN keeps exactly its minimum id, and dup_of always names the
    surviving representative — where the witness rule can point at a
    dropped vector. Planted: 10~11~12 is a chain (consecutive cosine
    ≥ 0.99, ends dissimilar is hard to plant with tiny noise, so we
    plant a plain group) plus the local-minima contrast below."""
    from analytics_etl_spark.operators.ivf import semantic_dedup_cc

    b1 = [1.0, 2.0, 3.0, 4.0]
    rows = [(10 + j, _noisy(b1, 1e-6, j)) for j in range(3)] + [
        (30, [1.0, -1.0, 1.0, -1.0])
    ]
    out = semantic_dedup_cc(
        spark.createDataFrame(rows, SCHEMA), threshold=0.99, k=1, dim=4
    ).collect()
    assert {r["vec_id"] for r in out if r["kept"]} == {10, 30}
    dup_of = {r["vec_id"]: r["dup_of"] for r in out if not r["kept"]}
    assert dup_of == {11: 10, 12: 10}
    # dup_of values are all kept vectors
    kept = {r["vec_id"] for r in out if r["kept"]}
    assert set(dup_of.values()) <= kept


def test_cc_drop_set_contains_witness_drop_set(spark):
    """Exact containment (documented in semantic_dedup_cc): everything
    the one-join witness rule drops, CC resolution drops too — a
    vector with a smaller-id direct neighbor is never its component's
    minimum. Checked on the real sf0.001 embeddings at the registered
    threshold, plus dup_of-names-a-survivor on the full corpus."""
    from analytics_etl_spark.operators.ivf import semantic_dedup, semantic_dedup_cc

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    wit = semantic_dedup(emb, threshold=0.3, dim=64, iters=3).collect()
    cc = semantic_dedup_cc(emb, threshold=0.3, dim=64, iters=3).collect()
    wit_drops = {r["vec_id"] for r in wit if not r["kept"]}
    cc_drops = {r["vec_id"] for r in cc if not r["kept"]}
    assert wit_drops <= cc_drops
    cc_kept = {r["vec_id"] for r in cc if r["kept"]}
    assert {r["dup_of"] for r in cc if not r["kept"]} <= cc_kept
    # both see the same gated universe
    assert {r["vec_id"] for r in wit} == {r["vec_id"] for r in cc}


def test_incremental_batch_vs_corpus(spark):
    """semantic_dedup_incremental: the embedding twin of
    incremental_minhash_dedup. Planted: batch vector 100 near-dups
    corpus vector 10 (dropped, dup_of=10); batch 101/102 are mutual
    near-dups of each other but novel vs the corpus (101 kept as the
    smaller id, 102 dropped with dup_of=101); batch 103 is orthogonal
    to everything (kept). Corpus rows never appear in the output."""
    from analytics_etl_spark.operators.ivf import semantic_dedup_incremental

    b1 = [1.0, 2.0, 3.0, 4.0]
    b2 = [-4.0, 3.0, -2.0, 1.0]
    corpus = spark.createDataFrame(
        [(10, b1), (11, [2.0, -1.0, 0.5, -3.0])], SCHEMA
    )
    batch = spark.createDataFrame(
        [
            (100, _noisy(b1, 1e-6, 1)),
            (101, _noisy(b2, 1e-6, 0)),
            (102, _noisy(b2, 1e-6, 2)),
            (103, [1.0, -1.0, 1.0, -1.0]),
        ],
        SCHEMA,
    )
    out = semantic_dedup_incremental(
        corpus, batch, threshold=0.99, k=1, dim=4
    ).collect()
    assert {r["vec_id"] for r in out} == {100, 101, 102, 103}
    by_id = {r["vec_id"]: r for r in out}
    assert not by_id[100]["kept"] and by_id[100]["dup_of"] == 10
    assert by_id[101]["kept"] and by_id[101]["dup_of"] is None
    assert not by_id[102]["kept"] and by_id[102]["dup_of"] == 101
    assert by_id[103]["kept"]


def test_incremental_agrees_with_full_on_shared_quantizer(spark):
    """With the quantizer trained on the corpus and passed explicitly
    to both calls, the incremental judgment of a batch equals the
    full-run judgment restricted to batch ids: the witness rule's
    drop condition (any smaller-id same-cell witness) is identical
    when corpus ids all precede batch ids."""
    from analytics_etl_spark.operators.ivf import (
        kmeans_centroids,
        semantic_dedup,
        semantic_dedup_incremental,
    )
    from analytics_etl_spark.operators.similarity import valid_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter("vec_id < 400")
    batch = emb.filter("vec_id >= 400")
    cents = kmeans_centroids(
        valid_embeddings(corpus, "embedding", 64), k=4, iters=3
    )
    inc = {
        (r["vec_id"], r["kept"], r["dup_of"])
        for r in semantic_dedup_incremental(
            corpus, batch, threshold=0.3, dim=64, centroids=cents
        ).collect()
    }
    # same quantizer on both paths → the incremental judgment of the
    # batch is EXACTLY the full-run witness judgment restricted to
    # batch ids: corpus ids all precede batch ids, so "any same-cell
    # corpus witness OR smaller-id batch witness" is the same
    # condition as "any smaller-id same-cell witness", and dup_of is
    # the same min in both
    full = {
        (r["vec_id"], r["kept"], r["dup_of"])
        for r in semantic_dedup(
            emb, threshold=0.3, dim=64, centroids=cents
        ).collect()
        if r["vec_id"] >= 400
    }
    assert inc == full
    # batch-internal determinism: dup_of < id always
    assert all(d < i for i, k, d in inc if not k)


def test_duplicate_recall_on_clustered_planted_corpus(spark):
    """VERDICT r10 item 7 — the other end of the recall spectrum.

    The 0.69 recall pinned above is the near-uniform WORST case (true
    neighbors at cosine ≈0.3, no cluster structure for the coarse
    quantizer to find). This fixture is the regime SemDeDup (Abbas et
    al. 2023) actually targets: 8 well-separated clusters (orthogonal
    bases, dim 16), 12 members each perturbed to within-cluster cosine
    ≥ 0.9, cross-cluster cosine ≈ 0. True drops = everything but the
    min id of each cluster (88 of 96). k-means recovers the planted
    cells, within-cluster witnesses are same-cell, and recall is
    measured against brute-force ground truth exactly like the
    worst-case test — pinned ≥ 0.95 so the "real embeddings lose far
    less" claim is a tested fact, not prose."""
    from analytics_etl_spark.operators.similarity import cosine

    dim, n_clusters, members = 16, 8, 12
    rows = []
    for c in range(n_clusters):
        base = [1.0 if d == 2 * c else 0.0 for d in range(dim)]
        for i in range(members):
            noise = [((c * 37 + i * 17 + d * 7) % 11 - 5) / 50.0 for d in range(dim)]
            rows.append((c * 100 + i, [b + x for b, x in zip(base, noise)]))
    df = spark.createDataFrame(rows, SCHEMA)

    e = df.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    a = e.select(F.col("id").alias("ia"), F.col("v").alias("va"))
    b = e.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
    true_drops = {
        r["ib"]
        for r in a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .filter(cosine(F.col("va"), F.col("vb")) >= 0.9)
        .select("ib")
        .distinct()
        .collect()
    }
    assert len(true_drops) >= 80  # the fixture really is dense-duplicate

    out = semantic_dedup(
        df, threshold=0.9, dim=dim, target_cluster_size=members, iters=5
    ).collect()
    sem_drops = {r["vec_id"] for r in out if not r["kept"]}
    assert not (sem_drops - true_drops), "cluster-local witness not a true witness"
    recall = len(sem_drops & true_drops) / len(true_drops)
    assert recall >= 0.95, f"clustered-corpus recall degraded: {recall:.3f}"
