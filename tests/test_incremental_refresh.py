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
    # the persisted plan carries FEWER Python eval nodes (the
    # shingle kernels are gone; quality metrics + chunking remain)
    def n_python(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        return sum(p.count(k) for k in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"))

    assert n_python(persisted) < n_python(inline)


def test_corpus_refresh_empty_batch(spark):
    """An empty ingest day is a no-op, not an error."""
    standing, batch, bench = _fixture(spark)
    out, _ = corpus_refresh(standing, batch.filter(F.lit(False)), bench)
    assert out.count() == 0
