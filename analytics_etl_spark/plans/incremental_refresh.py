"""Incremental corpus refresh — the DAILY-ingest shape of the corpus
build, as ONE lazy Spark plan with attributable rejects.

``corpus_build`` (plans/corpus_build.py) is the nightly full rebuild:
every gate re-scores the whole pool. A production training-data
pipeline runs that once, then ingests BATCHES against the standing
corpus — and every corpus-sized step in the daily loop is a bug. This
module composes the engine's existing incremental arms into that
loop:

    quality gate (batch)  ->  decontaminate (batch vs bench bank)
      ->  near-dedup vs STANDING corpus (incremental LSH — O(batch))
      ->  near-dedup within the batch
      ->  cluster-safe split assignment for the survivors
      ->  chunk counts for the accepted docs

Output: ONE ROW PER BATCH DOC — ``(doc_id, disposition, cluster_id,
split, n_chunks)`` — the attribution record a daily ingest must
produce (every rejected doc says WHY it was rejected; every accepted
doc says where it landed and how much training signal it adds).
``disposition`` is the FIRST failing gate in pipeline order:
``quality`` | ``contaminated`` | ``dup_corpus`` | ``dup_batch`` |
``accepted``.

Split-assignment semantics (the leakage contract, continuing
``cluster_safe_split``): a batch doc whose Jaccard overlap with ANY
standing doc reaches ``drop_jaccard`` is rejected outright
(``dup_corpus`` — the corpus copy wins); one whose overlap lands in
the LINK band ``[link_jaccard, drop_jaccard)`` is kept but must not
straddle splits with its standing near-dup, so split assignment
hashes the connected-component id over all link edges
(batch<->corpus and batch<->batch). Under the monotone-id contract
(new docs get ids above the standing corpus) a linked component's
min id is a STANDING id, so the batch doc inherits exactly the split
the standing doc was assigned by the same salted hash — no standing
assignment is ever touched. Unlinked docs hash their own id,
bit-identical to plain ``dataset_split``.

KNOWN BOUNDARY — the multi-split link component (ADVICE r14): a
batch doc whose link edges reach standing docs in TWO OR MORE
different splits inherits only the component-min standing split, so
its near-dup pair with the other standing doc(s) still straddles
train/test. This is inherent to any refresh that never reassigns
standing docs — the two standing docs were themselves split apart by
the nightly (their mutual Jaccard was below the nightly's link
threshold; the batch doc is the first bridge between them) — and is
resolved only by the next nightly rebuild, whose cluster pass merges
the bridged component and re-hashes it as one unit (that healing is
pinned end-to-end in tests/test_incremental_refresh.py: post-nightly,
the ``split_straddle_audit`` over the rebuilt assignment is empty and
the refresh-time flag resolves). Operators who
need the strict no-straddle invariant BETWEEN rebuilds should audit
accepted docs with ``multi_split_link_flags`` (below) and hold the
flagged handful out of eval sets until the rebuild lands; the flag
frame is link-edge-sized, never corpus-sized. The boundary and the
audit are pinned by tests/test_incremental_refresh.py.

Which standing id gets hashed depends on how the NIGHTLY build split
the standing corpus, and the refresh must match it:

- plain ``dataset_split`` (per-doc salted hash — what
  ``corpus_build`` ships): the default is exact as-is, the standing
  doc's own id IS its split hash input;
- ``cluster_safe_split`` (cluster-hashed): a standing doc that
  belonged to a multi-doc nightly cluster was assigned
  hash(cluster_id), NOT hash(its own id) — pass the nightly
  ``standing_clusters`` frame (doc_id, cluster_id) and the refresh
  routes link edges to the standing doc's CLUSTER id, so the batch
  doc lands in the cluster's split exactly. Omitting it under a
  cluster-split nightly would re-open the straddle for clustered
  standing docs (caught in the r14 review; pinned by
  tests/test_incremental_refresh.py).

Scale shape (the whole point): the standing corpus is touched by
exactly ONE pass — ``incremental_minhash_dedup``'s signature build —
and at deployment even that is the PERSISTED ingest artifact (the
``write_lsh_index`` bucket table; the bench's
``dedup_incremental_persisted`` entry measures that probe), so a
batch arrival costs O(batch x collision rate): batch-sized gates,
batch-sized pair lists, component finding over link edges bounded by
near-dup density, one batch-sized left join per decision. No stage
is corpus-sized at refresh time.

Reference scope: the reference has no incremental path at all — its
ETL re-reads the month and DELETEs+reINSERTs (monthly_etl.py,
README.md "idempotent reload"); this is the extension surface a
100 TB training-data pipeline needs (SURVEY.md §2 extension families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from analytics_etl_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_lsh_dedup,
    word_shingles,
)
from analytics_etl_spark.operators.sampling import cluster_safe_split
from analytics_etl_spark.operators.text_analysis import (
    chunk_documents,
    ngram_contamination,
    repetition_metrics,
)

DEFAULT_SPLITS = (("train", 0.9), ("val", 0.05), ("test", 0.05))

# Cache rotation — same contract as plans/corpus_build.py (ADVICE
# r11/r12 lineage): exactly one invocation's id-/pair-sized decision
# frames stay cached; entering a refresh stashes the previous
# invocation's frames and finishing it unpersists every stashed frame
# the new refresh did not re-register (semanticHash match = shared
# cache entry). A separate list from corpus_build's on purpose: the
# two plans rotate independently, so a refresh never evicts a
# build's warm frames mid-session (bench interleaves both).
_LIVE_CACHES: list[DataFrame] = []


# Derived decision frames (id-sized joins over the truncated base
# decisions, r17): their plans embed per-invocation LogicalRDD leaves,
# so no later invocation can ever share their cache entries — rotation
# unpersists them UNCONDITIONALLY instead of semanticHash-matching.
_LIVE_DERIVED: list[DataFrame] = []


def _stash_caches() -> tuple[list[DataFrame], list[DataFrame]]:
    stale, _LIVE_CACHES[:] = _LIVE_CACHES[:], []
    stale_d, _LIVE_DERIVED[:] = _LIVE_DERIVED[:], []
    return stale, stale_d


def _drop_stale(stale: tuple[list[DataFrame], list[DataFrame]]) -> None:
    stale_base, stale_derived = stale
    fresh = {df.semanticHash() for df in _LIVE_CACHES}
    for df in stale_base:
        if df.semanticHash() not in fresh:
            df.unpersist()
    for df in stale_derived:
        df.unpersist()


def _decide(df: DataFrame) -> DataFrame:
    """Register an id-/pair-sized decision frame: cache (cross-rep
    reuse, rotation contract above) + a LAZY localCheckpoint whose
    LogicalRDD is what downstream plans reference (r17, guide §7.3
    "materialise intermediates to truncate the plan"): the assembled
    attribution record used to carry every decision's full
    text-bearing subtree — a 38k-line physical plan (5,777 Exchange
    nodes) that Catalyst re-analyzed and AQE re-optimized on EVERY
    action, measured as ~6 s of driver gaps between sub-second jobs.
    The checkpoint materializes from the cache inside the first
    consuming action (id-sized rows, no extra job), so per-rep work
    is unchanged; only the plan the driver must chew shrinks."""
    c = df.cache()
    _LIVE_CACHES.append(c)
    return c.localCheckpoint(eager=False)


def _derive(df: DataFrame) -> DataFrame:
    """_decide for DERIVED decisions (built from other decisions'
    truncated frames): same cache + lazy-checkpoint shape — the cache
    both serves this invocation's multiple references and is what
    makes the frame's Observations report (metrics fire on the cache
    population pass; a bare checkpoint-RDD materialization inside a
    downstream action does not report them) — but registered for
    UNCONDITIONAL rotation, because the plan embeds this invocation's
    LogicalRDD leaves and can never be shared."""
    c = df.cache()
    _LIVE_DERIVED.append(c)
    return c.localCheckpoint(eager=False)


def corpus_refresh(
    standing: DataFrame,
    batch: DataFrame,
    bench: DataFrame,
    *,
    quality_min_ngrams: int = 20,
    quality_max_dup_frac: float = 0.05,
    quality_max_top_frac: float = 0.06,
    contamination_threshold: float = 0.2,
    drop_jaccard: float = 0.5,
    link_jaccard: float = 0.3,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    chunk_words: int = 50,
    overlap: int = 10,
    shingles_col: str | None = None,
    standing_clusters: DataFrame | None = None,
) -> tuple[DataFrame, dict[str, Observation]]:
    """Run one ingest batch against the standing corpus; see module
    docstring for semantics. All three inputs are (doc_id, text)
    frames. Returns ``(result, observations)``: result has one row
    per batch doc (doc_id, disposition, cluster_id, split, n_chunks);
    observations carry the funnel counts (batch, quality_pass,
    decontaminated, survived_corpus_dedup, accepted) on the same
    action that consumes the result.

    ``shingles_col`` is the DEPLOYMENT form (corpus_build's
    convention): when set, all three frames carry the ingest-persisted
    word-3-gram column (``with_shingle_column``), and both the
    contamination gate and BOTH dedup arms read it instead of running
    the Arrow shingling kernel — the standing corpus contributes its
    persisted index, so refresh-time Python cost is batch-quality +
    chunking only. Results are identical by construction (same 3-gram
    definition; equality pinned in tests/test_incremental_refresh.py).

    ``standing_clusters``: the nightly build's (doc_id, cluster_id)
    frame, REQUIRED for split parity when the standing corpus was
    split with ``cluster_safe_split`` (see module docstring); omit for
    a plain-``dataset_split`` nightly (corpus_build's convention).

    Gate rules are corpus_build's exactly (same thresholds, same
    operators), so a doc accepted by the nightly rebuild and the same
    doc arriving in a batch face one policy. Every decision is
    deterministic integer/md5/exact-double arithmetic — the whole
    result hash-checks against a DuckDB oracle.
    """
    if not (0.0 <= link_jaccard <= drop_jaccard):
        raise ValueError(
            f"need 0 <= link_jaccard <= drop_jaccard, got "
            f"link={link_jaccard}, drop={drop_jaccard}"
        )
    if standing_clusters is not None and not {"doc_id", "cluster_id"} <= set(
        standing_clusters.columns
    ):
        raise ValueError(
            "standing_clusters needs (doc_id, cluster_id) columns, got "
            f"{standing_clusters.columns}"
        )
    _stale = _stash_caches()
    try:
        return _refresh_body(
            standing,
            batch,
            bench,
            quality_min_ngrams=quality_min_ngrams,
            quality_max_dup_frac=quality_max_dup_frac,
            quality_max_top_frac=quality_max_top_frac,
            contamination_threshold=contamination_threshold,
            drop_jaccard=drop_jaccard,
            link_jaccard=link_jaccard,
            splits=splits,
            chunk_words=chunk_words,
            overlap=overlap,
            shingles_col=shingles_col,
            standing_clusters=standing_clusters,
            _stale=_stale,
        )
    except BaseException:
        # a failed refresh must not orphan the previous invocation's
        # cached frames (the corpus_build ADVICE r12 lesson)
        _LIVE_CACHES[:] = _stale[0] + _LIVE_CACHES
        _LIVE_DERIVED[:] = _stale[1] + _LIVE_DERIVED
        raise


def _refresh_body(
    standing: DataFrame,
    batch: DataFrame,
    bench: DataFrame,
    *,
    quality_min_ngrams: int,
    quality_max_dup_frac: float,
    quality_max_top_frac: float,
    contamination_threshold: float,
    drop_jaccard: float,
    link_jaccard: float,
    splits: tuple[tuple[str, float], ...],
    chunk_words: int,
    overlap: int,
    shingles_col: str | None,
    standing_clusters: DataFrame | None,
    _stale: tuple[list[DataFrame], list[DataFrame]],
) -> tuple[DataFrame, dict[str, Observation]]:
    obs = {
        name: Observation(f"corpus_refresh_{name}")
        for name in (
            "batch",
            "quality_pass",
            "decontaminated",
            "survived_corpus_dedup",
            "accepted",
        )
    }
    count_n = F.count(F.lit(1)).alias("n")
    keep = ["doc_id", "text"] + ([shingles_col] if shingles_col else [])
    pool = batch.select(*keep).observe(obs["batch"], count_n)

    # --- per-doc decisions, each computed ONCE off the batch pool ----
    # (the corpus_build flat layout: decision frames are id-/pair-
    # sized, cached, and combined with id-sized joins — never a
    # replay of a text-bearing subtree per gate)
    m = repetition_metrics(pool, n=2)
    quality_ids = (
        m.filter(
            (F.col("n_ngrams") >= quality_min_ngrams)
            & (F.col("dup_ngram_frac") <= quality_max_dup_frac)
            & (F.col("top_ngram_frac") <= quality_max_top_frac)
        )
        .select("doc_id")
        .observe(obs["quality_pass"], count_n)
    )
    quality_ids = _decide(quality_ids)
    if shingles_col is not None:
        # the persisted-index form: the same column serves the
        # contamination gate and both dedup arms (one 3-gram
        # definition by design — corpus_build's convention)
        def _grams(df: DataFrame) -> DataFrame:
            return df.select(
                "doc_id",
                F.explode(F.array_distinct(F.col(shingles_col))).alias("shingle"),
            )

        corpus_grams, bench_grams = _grams(pool), _grams(bench)
    else:
        corpus_grams = word_shingles(pool, n=3, distinct=True)
        bench_grams = word_shingles(bench, n=3, distinct=True)
    contaminated_ids = (
        ngram_contamination(corpus_grams, bench_grams)
        .filter(F.col("contamination_frac") > contamination_threshold)
        .select("doc_id")
    )
    contaminated_ids = _decide(contaminated_ids)
    # ONE incremental pass at the LINK threshold yields both decisions:
    # pairs >= drop_jaccard reject the batch doc (corpus copy wins);
    # pairs in [link, drop) become split-linkage edges. The standing
    # corpus is touched only here.
    inc_pairs = _decide(incremental_minhash_dedup(
        standing, pool, min_jaccard=link_jaccard, shingles_col=shingles_col
    ))
    batch_pairs = _decide(
        minhash_lsh_dedup(pool, min_jaccard=link_jaccard, shingles_col=shingles_col)
        .select("doc_a", "doc_b", "jaccard")
    )

    # --- gate combine: id-sized joins over the cached decisions ------
    # DERIVED decisions below (dup_corpus/surv3/dup_batch/accepted):
    # cheap id-joins over the truncated base decisions — see _derive
    dup_corpus_ids = _derive(
        inc_pairs.filter(F.col("jaccard") >= drop_jaccard)
        .select(F.col("batch_doc").alias("doc_id"))
        .distinct()
    )
    surv2 = quality_ids.join(contaminated_ids, "doc_id", "left_anti").observe(
        obs["decontaminated"], count_n
    )
    surv3 = _derive(
        surv2.join(dup_corpus_ids, "doc_id", "left_anti")
        .observe(obs["survived_corpus_dedup"], count_n)
    )
    # batch-internal drop: greedy keep-first among docs alive after the
    # corpus-facing gates (corpus_build's drop rule, batch-scoped)
    dup_batch_ids = (
        batch_pairs.filter(F.col("jaccard") >= drop_jaccard)
        .join(surv3.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(surv3.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    dup_batch_ids = _derive(dup_batch_ids)
    accepted_ids = _derive(
        surv3.join(dup_batch_ids, "doc_id", "left_anti")
        .observe(obs["accepted"], count_n)
    )

    # --- split assignment over link edges (cluster-safe) -------------
    link_bc = (
        inc_pairs.filter(F.col("jaccard") < drop_jaccard)
        .join(
            accepted_ids.withColumnRenamed("doc_id", "batch_doc"),
            "batch_doc",
            "left_semi",
        )
        .select(F.col("batch_doc").alias("doc_a"), F.col("corpus_doc").alias("doc_b"))
    )
    if standing_clusters is not None:
        # route the edge to the standing doc's NIGHTLY cluster id —
        # that id is what the nightly cluster_safe_split hashed, so
        # the component min reproduces the standing doc's actual split
        sc = standing_clusters.select(
            F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("_sc")
        )
        link_bc = link_bc.join(sc, "doc_b", "left").select(
            "doc_a", F.coalesce(F.col("_sc"), F.col("doc_b")).alias("doc_b")
        )
    link_bb = (
        batch_pairs.filter(F.col("jaccard") < drop_jaccard)
        .join(accepted_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(accepted_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select("doc_a", "doc_b")
    )
    assigned = cluster_safe_split(
        accepted_ids, link_bc.unionByName(link_bb), splits=splits
    ).select("doc_id", "cluster_id", "split")

    # --- one text-bearing pass for the packing volume -----------------
    n_chunks = (
        chunk_documents(
            pool.join(accepted_ids, "doc_id", "left_semi"),
            chunk_words=chunk_words,
            overlap=overlap,
        )
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_chunks"))
    )

    # --- assemble the per-doc attribution record ----------------------
    flag = F.lit(1)
    out = (
        pool.select("doc_id")
        .join(quality_ids.withColumn("_q", flag), "doc_id", "left")
        .join(contaminated_ids.withColumn("_c", flag), "doc_id", "left")
        .join(dup_corpus_ids.withColumn("_dc", flag), "doc_id", "left")
        .join(dup_batch_ids.withColumn("_db", flag), "doc_id", "left")
        .join(assigned, "doc_id", "left")
        .join(n_chunks, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_q").isNull(), F.lit("quality"))
            .when(F.col("_c").isNotNull(), F.lit("contaminated"))
            .when(F.col("_dc").isNotNull(), F.lit("dup_corpus"))
            .when(F.col("_db").isNotNull(), F.lit("dup_batch"))
            .otherwise(F.lit("accepted"))
            .alias("disposition"),
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            "split",
            F.coalesce(F.col("n_chunks"), F.lit(0).cast("bigint")).alias("n_chunks"),
        )
    )
    _drop_stale(_stale)
    return out, obs


def multi_split_link_flags(
    corpus_pairs: DataFrame,
    standing_splits: DataFrame,
    drop_jaccard: float = 0.5,
) -> DataFrame:
    """Audit for the KNOWN BOUNDARY in the module docstring (ADVICE
    r14): batch docs whose LINK-band edges reach standing docs in
    more than one distinct split. Such a doc inherits only the
    component-min standing split, so its near-dup pair with the
    other standing doc(s) still straddles splits until the next
    nightly rebuild merges the bridged component.

    ``corpus_pairs``: incremental_minhash_dedup output
    (batch_doc, corpus_doc, jaccard) — the deployment already has
    this frame from the refresh run. ``standing_splits``: the
    nightly's (doc_id, split) assignment. Returns one row per
    flagged batch doc: (batch_doc, n_link_splits, link_splits) with
    link_splits sorted for determinism. Link-edge-sized throughout
    (one keyed join + one counter-sized groupBy), never corpus-sized.
    Under a cluster_safe_split nightly, pass the CLUSTER-routed
    splits — standing docs of one nightly cluster share a split by
    construction, so routing cannot create false flags."""
    link = corpus_pairs.filter(F.col("jaccard") < drop_jaccard).select(
        "batch_doc", "corpus_doc"
    )
    sp = standing_splits.select(
        F.col("doc_id").alias("corpus_doc"), "split"
    )
    return (
        link.join(sp, "corpus_doc")
        .groupBy("batch_doc")
        .agg(F.array_sort(F.collect_set("split")).alias("link_splits"))
        .filter(F.size("link_splits") > 1)
        .select(
            "batch_doc",
            F.size("link_splits").cast("int").alias("n_link_splits"),
            "link_splits",
        )
    )
