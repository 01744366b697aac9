"""Round-13 extension queries: multi-dimensional data layout,
leakage-safe dataset splitting, and graph community detection.

Three capabilities a 100 TB training-data pipeline needs beyond the
reference surface (the reference has no layout, split, or graph
operator at all — its sink is row-at-a-time INSERT,
``app/services/database_service.py``, and its only grouping is SQL
GROUP BY, ``README.md:274-288``):

- ``zorder_key_orders`` — the Morton key behind Delta/Iceberg-style
  ``OPTIMIZE ZORDER``: the z-order family's hash-checked decision arm
  (the write path, sinks/layout.py, shares this exact interleave; its
  measured footer-stat pruning is pinned in tests/test_layout.py).
- ``dataset_split_cluster_safe`` — train/test splitting where verified
  near-duplicate CLUSTERS, not documents, are the unit of assignment;
  closes the dedup-aware-eval contamination hole.
- ``copurchase_communities`` — deterministic fixed-round synchronous
  label propagation (Raghavan et al. 2007) over the co-purchase
  graph; the community sibling of connected_components.

All three are fully hash-checked: every step is integer/md5/string
arithmetic both engines compute bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from analytics_etl_spark.operators.layout import zorder_key, zorder_key_sql
from analytics_etl_spark.queries.llm import _LSH_CTES
from analytics_etl_spark.queries.registry import query, t

# --- z-order layout key -------------------------------------------------

# orders spans [1995-01-01, 2001-08-01] (~2400 days) and o_totalprice
# < 500k (so floor(price/128) < 4096): both dimensions fit 12 bits
# without clamping at every SF. price/128 is a power-of-two scale —
# exact in IEEE double, so floor() agrees across engines.
_Z_DAY_SQL = "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)"
_Z_PRICE_SQL = "CAST(floor(o_totalprice / 128) AS BIGINT)"


@query(
    "zorder_key_orders",
    oracle=f"""
    SELECT o_orderkey,
           {_Z_DAY_SQL} AS day_bucket,
           {_Z_PRICE_SQL} AS price_bucket,
           CAST({zorder_key_sql([_Z_DAY_SQL, _Z_PRICE_SQL], bits=12)} AS BIGINT) AS zkey
    FROM orders
    """,
)
def zorder_key_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) layout key over (order day, price bucket).

    The key itself is the oracle-checkable core of the layout op: a
    pure shift/and/or expression tree in whole-stage codegen (no UDF,
    no shuffle). Sorting a table by this key makes parquet row groups
    tile small rectangles of the (date, price) plane, so min/max stats
    prune scans filtered on EITHER or BOTH dimensions — write path and
    measured pruning: sinks/layout.py + tests/test_layout.py (which
    share this exact interleave arithmetic).
    """
    orders = t(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    )
    pb = F.floor(F.col("o_totalprice") / F.lit(128)).cast("long")
    return orders.select(
        "o_orderkey",
        day.alias("day_bucket"),
        pb.alias("price_bucket"),
        zorder_key([day, pb], bits=12).alias("zkey"),
    )


# --- cluster-safe dataset split -----------------------------------------


@query(
    "dataset_split_cluster_safe",
    oracle=f"""
    WITH RECURSIVE {_LSH_CTES},
    pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5),
    e2 AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, u FROM e2
      UNION SELECT u, v FROM e2
      UNION SELECT r.u, e.v FROM reach r JOIN e2 e ON r.v = e.u
    ),
    cc AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
    assigned AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN b < 9000 THEN 'train'
                WHEN b < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, cluster_id,
             CAST((('0x' || substr(md5('split:' || cluster_id::VARCHAR), 1, 15))::BIGINT
                   % 10000) AS INT) AS b
      FROM assigned
    )
    """,
)
def dataset_split_cluster_safe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cluster-safe train/val/test split: verified MinHash
    pairs → connected components → the split hashes the CLUSTER id,
    so a near-duplicate pair can never straddle train and test (with
    independent per-doc hashing, ~1 in 10 near-dup pairs would leak
    across the 5% test boundary and the eval would measure
    memorization). Docs with no near-dup fall back to their own id —
    bit-identical to plain dataset_split for the whole non-duplicated
    corpus. The no-straddle invariant is pinned by
    tests/test_zorder_split_lpa.py on a crafted corpus where the
    naive split provably leaks.
    """
    from analytics_etl_spark.operators.dedup import minhash_lsh_dedup
    from analytics_etl_spark.operators.sampling import cluster_safe_split

    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(
        docs, num_hashes=12, rows_per_band=3, shingle_n=3, min_jaccard=0.5
    )
    return cluster_safe_split(docs.select("doc_id"), pairs).select(
        "doc_id", "cluster_id", "split"
    )


# --- label-propagation communities --------------------------------------


def _lpa_oracle(rounds: int) -> str:
    """Unrolled fixed-round synchronous LPA as chained CTEs — the same
    simhash-vote-SQL trick: the iteration count is a compile-time
    constant, so the 'iterative' algorithm is honestly expressible as
    one declarative query and the whole result hash-checks."""
    ctes = [
        """pairs AS (
      SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                      greatest(x.l_partkey, y.l_partkey) AS b
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
      WHERE x.l_shipdate >= TIMESTAMP '1995-01-01'
        AND x.l_shipdate <  TIMESTAMP '1995-07-01'
        AND y.l_shipdate >= TIMESTAMP '1995-01-01'
        AND y.l_shipdate <  TIMESTAMP '1995-07-01'
    )""",
        "e2 AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs)",
        "r0 AS (SELECT DISTINCT u AS node, u AS lbl FROM e2)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(f"""votes{i} AS (
      SELECT node, lbl, COUNT(*) AS c FROM (
        SELECT e.u AS node, p.lbl FROM e2 e JOIN r{i - 1} p ON p.node = e.v
        UNION ALL
        SELECT node, lbl FROM r{i - 1}
      ) GROUP BY node, lbl
    ),
    r{i} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
        FROM votes{i}
      ) WHERE rn = 1
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node AS part_id, lbl AS community FROM r{rounds}"
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-purchase edge list (6-month window, distinct undirected
    part pairs) — the ONE construction shared by the registered query
    and the 10x rehearsal's plan assertions, so the rehearsal
    certifies the plan the production query actually runs (a
    hand-duplicated pipeline would silently keep certifying a stale
    shape after a query change)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp_ntz"))
    )
    x = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    y = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    return (
        x.join(y, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )


@query("copurchase_communities", oracle=_lpa_oracle(rounds=4))
def copurchase_communities_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product communities in the co-purchase graph via deterministic
    4-round synchronous label propagation (operators/graph.py) —
    the finer-grained sibling of connected_components for graphs
    whose giant component hides internal structure. Every degree of
    freedom LPA leaves open is pinned (fixed synchronous rounds,
    self-vote, min-label ties), so the result is a pure function of
    the edge set and hash-checks against the unrolled SQL fixpoint."""
    from analytics_etl_spark.operators.graph import label_propagation

    out = label_propagation(copurchase_edges(spark, sf_dir), rounds=4)
    return out.select(F.col("node").alias("part_id"), "community")


# --- duplicate-span REMOVAL (Lee et al. 2022, the transformation) ---------

# The detection arms (dedup_substring_spans/_stride/_persisted) report
# which spans are duplicated; this is the step that actually EDITS the
# corpus — keep each duplicated 20-word span's smallest-(doc, pos)
# occurrence, cut every other occurrence's words, re-join survivors.
# Fully hash-checked: canonical choice is a total order, hashes are
# md5, the rebuild is pure array arithmetic in both engines (DuckDB
# side works in 1-based positions, Spark in 0-based — each engine
# internally consistent, the TEXTS must match bit-for-bit).
@query(
    "dedup_substring_remove",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 20
    ),
    s0 AS (
      SELECT doc_id, unnest(list_transform(range(1, len(w) - 18),
             i -> {'pos': i, 'h': md5(array_to_string(w[i:i+19], ' '))})) AS sp
      FROM w
    ),
    s AS (SELECT doc_id, sp.pos AS pos, sp.h AS h FROM s0),
    canon AS (
      SELECT h, doc_id AS cd, pos AS cp FROM (
        SELECT h, doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        FROM s
      ) WHERE rn = 1
    ),
    dup AS (
      SELECT s.doc_id, s.pos FROM s JOIN canon c ON c.h = s.h
      WHERE s.doc_id <> c.cd OR s.pos <> c.cp
    ),
    cov AS (
      SELECT doc_id,
             list_distinct(flatten(list(range(pos, pos + 20)))) AS covp
      FROM dup GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                WHEN c.covp IS NULL THEN d.text
                -- COALESCE: DuckDB's array_to_string([]) is NULL, but a
                -- fully-cut document is the EMPTY STRING (Spark
                -- array_join semantics, and the honest answer)
                ELSE COALESCE(array_to_string(
                  list_filter(
                    list_transform(range(1, len(string_split(d.text, ' ')) + 1),
                      i -> CASE WHEN NOT list_contains(c.covp, i)
                                THEN string_split(d.text, ' ')[i] END),
                    x -> x IS NOT NULL), ' '), '')
           END AS clean_text,
           CAST(COALESCE(len(c.covp), 0) AS BIGINT) AS n_removed
    FROM documents d LEFT JOIN cov c ON c.doc_id = d.doc_id
    """,
)
def dedup_substring_remove_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-SPAN removal: every verbatim 20-word span keeps
    one corpus-wide occurrence (smallest (doc_id, position)); all
    other occurrences are cut from their documents and the surviving
    words re-joined. Completes the Lee et al. pipeline whose detection
    half is dedup_substring_spans — detection tells you the leak
    exists, this produces the training corpus without it."""
    from analytics_etl_spark.operators.dedup import remove_duplicate_spans

    return remove_duplicate_spans(t(spark, sf_dir, "documents"), span_words=20)


# --- incremental corpus refresh (round 14) ---------------------------------

# The daily-ingest composition (plans/incremental_refresh.py): batch
# docs against the standing corpus — gate, decontaminate, incremental
# LSH dedup (corpus touched once), cluster-safe split assignment over
# the LINK band, chunk counts — one row per batch doc with the FIRST
# failing gate as its disposition. Slicing: bench = doc_id < 25 (the
# corpus_build convention), the newest 20% of ids (exact-integer
# cutoff (8*max) div 10, broadcast 1-row cross join — stays one lazy
# plan, no driver collect) are the arriving batch, the rest is the
# standing corpus. Every decision is integer/md5/exact-double
# arithmetic; the oracle unrolls the same pipeline in SQL, with the
# split-linkage components via a recursive transitive closure.
def _refresh_oracle(clustered: bool = False) -> str:
    from analytics_etl_spark.queries.llm import _minhash_params_sql

    tok3 = (
        "SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1), "
        "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle"
    )
    ver = """
    common_{s} AS (
      SELECT c.u, c.v, COUNT(*) AS cm
      FROM cand_{s} c
      JOIN alltok x ON x.doc_id = c.u
      JOIN alltok y ON y.doc_id = c.v AND y.shingle = x.shingle
      GROUP BY 1, 2
    ),
    ver_{s} AS (
      SELECT c.u, c.v, CAST(cm.cm AS DOUBLE) / (sa.sz + sb.sz - cm.cm) AS j
      FROM cand_{s} c
      JOIN common_{s} cm ON cm.u = c.u AND cm.v = c.v
      JOIN sizes sa ON sa.doc_id = c.u
      JOIN sizes sb ON sb.doc_id = c.v
      WHERE CAST(cm.cm AS DOUBLE) / (sa.sz + sb.sz - cm.cm) >= 0.3
    )"""
    if clustered:
        # the cluster-split nightly (VERDICT r14 item 5): standing-
        # standing LSH pairs at the drop threshold -> connected
        # components = the nightly cluster table; every standing doc
        # maps to its nightly cluster id (own id when unclustered),
        # and batch->corpus link edges route to THAT id, reproducing
        # the split the nightly cluster_safe_split actually hashed.
        ss_cands = f""",
    cand_ss AS (
      SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
      JOIN standing s1 ON s1.doc_id = x.doc_id
      JOIN standing s2 ON s2.doc_id = y.doc_id
    ),
    {ver.format(s="ss")},
    sdup AS (SELECT u, v FROM ver_ss WHERE j >= 0.5),
    se2 AS (SELECT u, v FROM sdup UNION SELECT v, u FROM sdup),
    sreach(u, v) AS (
      SELECT u, u FROM se2
      UNION SELECT u, v FROM se2
      UNION SELECT sr.u, se.v FROM sreach sr JOIN se2 se ON sr.v = se.u
    ),
    scc AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM sreach GROUP BY u),
    snightly AS (
      SELECT s.doc_id, COALESCE(scc.cluster_id, s.doc_id) AS cluster_id
      FROM standing s LEFT JOIN scc ON scc.doc_id = s.doc_id
    )"""
        bc_edge = """
      SELECT v.u, COALESCE(sn.cluster_id, v.v) AS v
      FROM ver_bc v JOIN acc ON acc.doc_id = v.u
      LEFT JOIN snightly sn ON sn.doc_id = v.v
      WHERE v.j < 0.5"""
    else:
        ss_cands = ""
        bc_edge = """
      SELECT v.u, v.v FROM ver_bc v JOIN acc ON acc.doc_id = v.u WHERE v.j < 0.5"""
    return f"""
    WITH RECURSIVE
    cut AS (SELECT (8 * MAX(doc_id)) // 10 AS c FROM documents),
    batch AS (SELECT d.doc_id, d.text FROM documents d, cut WHERE d.doc_id > cut.c),
    standing AS (
      SELECT d.doc_id, d.text FROM documents d, cut
      WHERE d.doc_id >= 25 AND d.doc_id <= cut.c
    ),
    benchd AS (SELECT doc_id, text FROM documents WHERE doc_id < 25),
    -- quality gate on the batch (word 2-grams, corpus_build rules)
    w2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM batch),
    g2 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
      FROM w2
    ),
    pg AS (SELECT doc_id, gram, COUNT(*) AS cg FROM g2 GROUP BY 1, 2),
    m AS (
      SELECT doc_id, CAST(SUM(cg) AS BIGINT) AS n_ngrams,
             1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cg) AS DOUBLE) AS dup_frac,
             CAST(MAX(cg) AS DOUBLE) / CAST(SUM(cg) AS DOUBLE) AS top_frac
      FROM pg GROUP BY doc_id
    ),
    q AS (
      SELECT doc_id FROM m
      WHERE n_ngrams >= 20 AND dup_frac <= 0.05 AND top_frac <= 0.06
    ),
    -- distinct word 3-grams per side
    wb AS (SELECT doc_id, string_split(text, ' ') AS w FROM batch),
    tok_b AS ({tok3} FROM wb),
    ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM standing),
    tok_s AS ({tok3} FROM ws),
    we AS (SELECT doc_id, string_split(text, ' ') AS w FROM benchd),
    tok_e AS ({tok3} FROM we),
    -- decontamination: batch 3-gram overlap with the bench bank
    bank AS (SELECT DISTINCT shingle FROM tok_e),
    csize AS (SELECT doc_id, COUNT(*) AS n FROM tok_b GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS h FROM tok_b t JOIN bank USING (shingle)
      GROUP BY t.doc_id
    ),
    contaminated AS (
      SELECT s.doc_id FROM csize s JOIN hits h USING (doc_id)
      WHERE CAST(h.h AS DOUBLE) / s.n > 0.2
    ),
    -- MinHash bands over batch + standing (per-doc, so one CTE serves
    -- both the incremental and the batch-internal candidate joins)
    {_minhash_params_sql(12)},
    alltok AS (
      SELECT doc_id, shingle FROM tok_b
      UNION ALL SELECT doc_id, shingle FROM tok_s
    ),
    base AS (
      SELECT doc_id,
             (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) AS hb
      FROM alltok
    ),
    mh AS (
      SELECT doc_id, seed, MIN((a * hb + b) % 2147483647) AS h
      FROM base CROSS JOIN params GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, CAST(seed // 3 AS INT) AS band,
             md5(string_agg(h::VARCHAR, '|' ORDER BY seed)) AS bucket
      FROM mh GROUP BY doc_id, CAST(seed // 3 AS INT)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM alltok GROUP BY doc_id),
    -- candidates: batch vs standing (u = batch side), batch vs batch
    cand_bc AS (
      SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
      FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
      JOIN batch b1 ON b1.doc_id = x.doc_id
      JOIN standing s1 ON s1.doc_id = y.doc_id
    ),
    cand_bb AS (
      SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
      JOIN batch b1 ON b1.doc_id = x.doc_id
      JOIN batch b2 ON b2.doc_id = y.doc_id
    ),
    {ver.format(s="bc")},
    {ver.format(s="bb")}{ss_cands},
    -- gate combine (pipeline order; dispositions attribute the FIRST cut)
    dc AS (SELECT DISTINCT u AS doc_id FROM ver_bc WHERE j >= 0.5),
    s2 AS (
      SELECT doc_id FROM q
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    s3 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM dc)),
    db AS (
      SELECT DISTINCT v.v AS doc_id FROM ver_bb v
      JOIN s3 xa ON xa.doc_id = v.u
      JOIN s3 xb ON xb.doc_id = v.v
      WHERE v.j >= 0.5
    ),
    acc AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM db)),
    -- split-linkage components over the [0.3, 0.5) link band
    e_raw AS ({bc_edge}
      UNION ALL
      SELECT v.u, v.v FROM ver_bb v
      JOIN acc xa ON xa.doc_id = v.u
      JOIN acc xb ON xb.doc_id = v.v
      WHERE v.j < 0.5
    ),
    e2 AS (SELECT u, v FROM e_raw UNION SELECT v, u FROM e_raw),
    reach(u, v) AS (
      SELECT u, u FROM e2
      UNION SELECT u, v FROM e2
      UNION SELECT r.u, e.v FROM reach r JOIN e2 e ON r.v = e.u
    ),
    cc AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
    assigned AS (
      SELECT a.doc_id, COALESCE(c.cluster_id, a.doc_id) AS cluster_id
      FROM acc a LEFT JOIN cc c ON c.doc_id = a.doc_id
    ),
    sp AS (
      SELECT doc_id, cluster_id,
             CASE WHEN bkt < 9000 THEN 'train'
                  WHEN bkt < 9500 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id, cluster_id,
               CAST((('0x' || substr(md5('split:' || cluster_id::VARCHAR), 1, 15))::BIGINT
                     % 10000) AS INT) AS bkt
        FROM assigned
      )
    ),
    -- chunk counts (50-word windows, 10 overlap) for accepted docs
    cw AS (
      SELECT b.doc_id, string_split(b.text, ' ') AS words
      FROM batch b JOIN acc USING (doc_id) WHERE b.text IS NOT NULL
    ),
    nch AS (
      SELECT doc_id,
             CAST(ceil(greatest(len(words) - 10, 1) / 40.0) AS BIGINT) AS n_chunks
      FROM cw
    )
    SELECT b.doc_id,
           CASE WHEN q.doc_id IS NULL THEN 'quality'
                WHEN con.doc_id IS NOT NULL THEN 'contaminated'
                WHEN dc.doc_id IS NOT NULL THEN 'dup_corpus'
                WHEN db.doc_id IS NOT NULL THEN 'dup_batch'
                ELSE 'accepted' END AS disposition,
           CAST(sp.cluster_id AS BIGINT) AS cluster_id,
           sp.split,
           COALESCE(nch.n_chunks, 0) AS n_chunks
    FROM batch b
    LEFT JOIN q ON q.doc_id = b.doc_id
    LEFT JOIN contaminated con ON con.doc_id = b.doc_id
    LEFT JOIN dc ON dc.doc_id = b.doc_id
    LEFT JOIN db ON db.doc_id = b.doc_id
    LEFT JOIN sp ON sp.doc_id = b.doc_id
    LEFT JOIN nch ON nch.doc_id = b.doc_id
    """


@query("corpus_refresh_pipeline", oracle=_refresh_oracle())
def corpus_refresh_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus refresh (plans/incremental_refresh.py): one
    ingest batch (the newest 20% of doc ids) against the standing
    corpus, as ONE lazy plan — quality gate, bench decontamination,
    incremental LSH dedup vs the corpus (the O(batch) arm: the corpus
    is touched once, by the signature build that at deployment is the
    persisted ingest index), batch-internal dedup, cluster-safe split
    assignment over the [link, drop) Jaccard band, chunk counts.
    Returns the per-doc attribution record every daily ingest must
    produce: (doc_id, disposition, cluster_id, split, n_chunks) with
    disposition = the first failing gate or 'accepted'."""
    from analytics_etl_spark.plans.incremental_refresh import corpus_refresh

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    cut = docs.agg(F.expr("(8 * max(doc_id)) div 10").alias("c"))
    base = docs.crossJoin(F.broadcast(cut))
    bench = base.filter(F.col("doc_id") < 25).select("doc_id", "text")
    standing = base.filter(
        (F.col("doc_id") >= 25) & (F.col("doc_id") <= F.col("c"))
    ).select("doc_id", "text")
    batch = base.filter(F.col("doc_id") > F.col("c")).select("doc_id", "text")
    result, _ = corpus_refresh(standing, batch, bench)
    return result


@query("corpus_refresh_clustered", oracle=_refresh_oracle(clustered=True))
def corpus_refresh_clustered_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLUSTER-SPLIT nightly end-to-end (VERDICT r14 item 5): the
    standing corpus was split by cluster_safe_split (so a standing
    doc in a multi-doc near-dup cluster was assigned
    hash(cluster_id), not hash(own id)), and the refresh receives the
    nightly's (doc_id, cluster_id) table so batch->corpus link edges
    route to the standing doc's CLUSTER id — the inheritance routing
    the r14 review fixed, previously pinned only by unit tests, now
    hash-checked as a full pipeline: the oracle replays the nightly
    clustering (standing-standing LSH pairs -> recursive-closure
    components) AND the routed refresh, so an accepted batch doc
    linked to a clustered standing doc must land in exactly the split
    the nightly hashed for that cluster. Same slicing and gates as
    corpus_refresh_pipeline; the only delta is standing_clusters."""
    from analytics_etl_spark.operators.dedup import minhash_lsh_dedup
    from analytics_etl_spark.operators.sampling import cluster_safe_split
    from analytics_etl_spark.plans.incremental_refresh import corpus_refresh

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    cut = docs.agg(F.expr("(8 * max(doc_id)) div 10").alias("c"))
    base = docs.crossJoin(F.broadcast(cut))
    bench = base.filter(F.col("doc_id") < 25).select("doc_id", "text")
    standing = base.filter(
        (F.col("doc_id") >= 25) & (F.col("doc_id") <= F.col("c"))
    ).select("doc_id", "text")
    batch = base.filter(F.col("doc_id") > F.col("c")).select("doc_id", "text")
    nightly = cluster_safe_split(
        standing.select("doc_id"),
        minhash_lsh_dedup(
            standing, num_hashes=12, rows_per_band=3, shingle_n=3, min_jaccard=0.5
        ),
    ).select("doc_id", "cluster_id")
    result, _ = corpus_refresh(
        standing, batch, bench, standing_clusters=nightly
    )
    return result
