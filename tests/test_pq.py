"""Product quantization: encode/ADC algebra pinned against a NumPy
reference, persisted-codes plan hygiene, IVF-PQ index parity.

Recall vs brute force is measured alongside the other ANN strategies
in tests/test_ann_recall.py; here we pin the deterministic algebra
(codes, LUT sums, rerank exactness) that the rows-only registered
queries rest on.
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pyspark.sql.functions as F
import pytest

from analytics_etl_spark.operators.pq import (
    ivfpq_topk,
    pq_adc_topk,
    pq_rerank_topk,
    pq_train_codebooks,
    with_pq_codes,
    write_ivfpq_index,
)
from analytics_etl_spark.operators.similarity import cosine_topk_join, valid_embeddings

SF = "/root/testdata/sf0.001"
M, KSUB, K = 8, 16, 10


@pytest.fixture(scope="module")
def emb(spark):
    df = valid_embeddings(
        spark.read.parquet(f"{SF}/embeddings.parquet"), dim=64
    ).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def cbs(emb):
    return pq_train_codebooks(emb, m=M, ksub=KSUB, iters=2, sample_fraction=0.5)


def _qf(emb, vid):
    return emb.filter(F.col("vec_id") == vid).select(F.col("embedding").alias("qv"))


def _np_unit(rows):
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def test_codebook_shape_and_partition_invariance(emb):
    cbs1 = pq_train_codebooks(emb, m=M, ksub=KSUB, iters=2, sample_fraction=0.5)
    cbs2 = pq_train_codebooks(
        emb.repartition(7), m=M, ksub=KSUB, iters=2, sample_fraction=0.5
    )
    assert len(cbs1) == M and len(cbs1[0]) == KSUB and len(cbs1[0][0]) == 64 // M
    # md5-seeded init + DECIMAL-sum mean updates: the codebook is a
    # pure function of the data, bit-identical under any partitioning
    # (float avg would drift in the last ulp with the partial-merge
    # order; pq_train_codebooks sums decimals exactly instead)
    assert cbs1 == cbs2


def test_encode_matches_numpy_reference(emb, cbs):
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in with_pq_codes(emb, cbs).select("vec_id", "pq_codes").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    X = _np_unit(rows)
    C = np.array(cbs)
    dsub = 64 // M
    cn2 = (C**2).sum(axis=2)
    Xs = X.reshape(X.shape[0], M, dsub)
    for i, r in enumerate(rows):
        want = [
            int((cn2[j] - 2.0 * (Xs[i, j] @ C[j].T)).argmin()) for j in range(M)
        ]
        assert got[r["vec_id"]] == want, r["vec_id"]
    # every code addresses a real codeword
    flat = [c for codes in got.values() for c in codes]
    assert min(flat) >= 0 and max(flat) < KSUB


def test_adc_score_matches_numpy_lut(emb, cbs):
    n = emb.count()
    got = {
        r["vec_id"]: r["score"]
        for r in pq_adc_topk(emb, _qf(emb, 0), cbs, k=n).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    X = _np_unit(rows)
    q = X[[i for i, r in enumerate(rows) if r["vec_id"] == 0][0]]
    C = np.array(cbs)
    dsub = 64 // M
    lut = np.einsum("jkd,jd->jk", C, q.reshape(M, dsub))
    cn2 = (C**2).sum(axis=2)
    Xs = X.reshape(X.shape[0], M, dsub)
    for i, r in enumerate(rows):
        codes = [int((cn2[j] - 2.0 * (Xs[i, j] @ C[j].T)).argmin()) for j in range(M)]
        want = float(sum(lut[j][codes[j]] for j in range(M)))
        assert got[r["vec_id"]] == pytest.approx(want, abs=1e-9), r["vec_id"]


def test_persisted_codes_plan_is_python_free_and_narrow(emb, cbs, spark, tmp_path):
    """The deployment shape: codes written at ingest, query plan 100%
    JVM, scan reads (vec_id, pq_codes) only — the float embedding
    column is column-pruned out of the parquet read entirely."""
    path = str(tmp_path / "coded")
    with_pq_codes(emb, cbs).select("vec_id", "embedding", "pq_codes").write.parquet(
        path
    )
    coded = spark.read.parquet(path)
    top = pq_adc_topk(
        coded.select("vec_id", "pq_codes"),
        _qf(emb, 0),
        cbs,
        k=K,
        codes_col="pq_codes",
        exclude_ids=(0,),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        top.explain("formatted")
    plan = buf.getvalue()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan
    scan_schema = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln and "pq_codes" in ln
    ]
    assert scan_schema and all("embedding" not in ln for ln in scan_schema), plan
    # and the persisted path returns exactly the inline result
    inline = pq_adc_topk(emb, _qf(emb, 0), cbs, k=K, exclude_ids=(0,))
    key = lambda df: [(r["vec_id"], round(r["score"], 9)) for r in df.collect()]  # noqa: E731
    assert key(top) == key(inline)


def test_rerank_scores_are_exact_cosine(emb, cbs):
    got = pq_rerank_topk(
        emb, _qf(emb, 0), cbs, k=K, shortlist=50, exclude_ids=(0,)
    ).collect()
    exact = {
        r["vec_id"]: r["score"]
        for r in cosine_topk_join(
            emb, _qf(emb, 0), k=emb.count(), exclude_ids=(0,)
        ).collect()
    }
    assert len(got) == K
    for r in got:
        assert r["score"] == pytest.approx(exact[r["vec_id"]], abs=1e-9)
    # descending by exact score
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_ivfpq_index_parity_and_partition_pruning(emb, cbs, spark, tmp_path):
    from analytics_etl_spark.operators.ivf import kmeans_centroids

    cents = kmeans_centroids(emb, k=8, iters=2, sample_fraction=0.5)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, cents, cbs)
    index = spark.read.parquet(path)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 17).first()["embedding"]]

    # probing ALL cells makes the index path exactly the inline ADC
    full = ivfpq_topk(index, qvec, cents, cbs, k=K, n_probe=8, exclude_ids=(17,))
    inline = pq_adc_topk(emb, _qf(emb, 17), cbs, k=K, exclude_ids=(17,))
    key = lambda df: [(r["vec_id"], round(r["score"], 9)) for r in df.collect()]  # noqa: E731
    assert key(full) == key(inline)

    probed = ivfpq_topk(
        index, qvec, cents, cbs, k=K, n_probe=2, rerank=30, exclude_ids=(17,)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cell" in ln for ln in pf), plan
    assert "Python" not in plan
    # rerank output is exact cosine for the returned ids
    exact = {
        r["vec_id"]: r["score"]
        for r in cosine_topk_join(
            emb, _qf(emb, 17), k=emb.count(), exclude_ids=(17,)
        ).collect()
    }
    for r in probed.collect():
        assert r["score"] == pytest.approx(exact[r["vec_id"]], abs=1e-9)


def test_junk_vectors_are_gated_before_training(spark, emb, cbs):
    """NaN / wrong-dim / zero rows must not shift the codebook: train
    on a corpus WITH planted junk gated by valid_embeddings and
    expect the identical codebook (the kmeans_centroids contract)."""
    from pyspark.sql import Row

    junk = spark.createDataFrame(
        [
            Row(vec_id=90001, embedding=[float("nan")] * 64, label=0),
            Row(vec_id=90002, embedding=[0.0] * 64, label=0),
            Row(vec_id=90003, embedding=[1.0] * 8, label=0),
        ]
    )
    dirty = emb.unionByName(junk)
    cbs2 = pq_train_codebooks(
        valid_embeddings(dirty, dim=64), m=M, ksub=KSUB, iters=2, sample_fraction=0.5
    )
    assert cbs2 == cbs
