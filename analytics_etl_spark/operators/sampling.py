"""Deterministic sampling — reproducible subsets at any scale.

`df.sample()` is seed-and-partitioning dependent: the same call on a
repartitioned table keeps different rows, which poisons reproducibility
of training mixes. Hash sampling keys the decision on the ROW (md5 of
a stable id), so the sample is a pure function of the data — identical
on 4 threads or 1000 executors, expressible in any engine
(oracle-checked), and stable across reruns/backfills. This is how
training-data pipelines pin "10% of C4-en, 50% of books" mixes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, buckets: int = HASH_BUCKETS) -> Column:
    """Stable per-row bucket in [0, buckets): md5(id) as int mod n.

    Same md5-hex→int path as the minhash family — bit-identical in
    Spark, DuckDB, Python.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return (h % buckets).cast("int")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Keep each row iff hash_bucket(id) < rate[stratum]·buckets.

    Exact expected rates per stratum, zero shuffle (a filter), fully
    deterministic. Rows in strata missing from `rates` fall back to
    default_rate.
    """
    b = hash_bucket(id_col, buckets)
    thr = F.lit(int(default_rate * buckets))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(int(rate * buckets))).otherwise(thr)
    return df.filter(b < thr)


def dataset_split(
    df: DataFrame,
    splits: tuple[tuple[str, float], ...] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    id_col: str = "doc_id",
    salt: str = "split",
    buckets: int = HASH_BUCKETS,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — every row gets exactly
    one split label, forever.

    The other half of the sampling story: a training pipeline must
    guarantee that a document NEVER migrates between train and eval
    across reruns, backfills, or cluster resizes (train→test leakage
    invalidates the eval). Same mechanism as stratified_sample —
    md5-bucket the id, carve [0, buckets) into cumulative ranges per
    split fraction — so the assignment is a pure function of the row.
    The id is SALTED first: the split hash must be independent of the
    sampling hash (otherwise "keep 10%" and "test = top 5%" would
    correlate and the test set would be sampled at a different rate).

    Zero shuffle — a projection. Fractions must sum to ≤ 1; any
    remainder falls into the LAST split (so (0.9, 0.05, 0.05) is
    airtight against rounding).
    """
    total = sum(frac for _, frac in splits)
    if total > 1.0 + 1e-9:
        raise ValueError(
            f"split fractions sum to {total}, must be <= 1 — later splits would be "
            "silently swallowed (an eval-set-construction hazard, not a rounding issue)"
        )
    salted = F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    b = hash_bucket(salted, buckets)
    names = [n for n, _ in splits]
    cum, bounds = 0.0, []
    for _, frac in splits:
        cum += frac
        bounds.append(int(round(cum * buckets)))
    # cumulative CASE, first matching range wins; remainder → last split
    case = None
    lo = 0
    for name, hi in zip(names, bounds):
        cond = (b >= lo) & (b < hi)
        case = F.when(cond, F.lit(name)) if case is None else case.when(cond, F.lit(name))
        lo = hi
    case = case.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, case)


PRIORITY_HASH_SCALE = float(2**48)  # u ~ (h+1)/2^48 with a 48-bit hash


def priority_expr(weight_col: str, id_col: str, salt: str) -> Column:
    '''The DLT priority q = w/u as ONE deterministic IEEE expression
    over md5-derived integers — shared by the batch samplers and the
    streaming maintenance (a stored row's priority must be
    recomputable bit-for-bit from (salt, id, w) forever).'''
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return (
        F.col(weight_col).cast("double")
        * F.lit(PRIORITY_HASH_SCALE)
        / (hv + 1).cast("double")
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ps",
) -> DataFrame:
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield, Lund & Thorup, JACM 2007): priority q_i = w_i / u_i
    with u_i a per-row hash-uniform in (0, 1]; keep the k highest
    priorities; the (k+1)-th priority is the threshold τ and
    ŵ_i = max(w_i, τ) is the UNBIASED per-row estimator whose sums
    estimate any subset-sum of the full table — the primitive behind
    "sample 10k docs ∝ quality weight and still report unbiased
    corpus statistics from the sample".

    Deterministic and oracle-exact: u derives from md5(salt:id)
    (bit-identical in any engine) and the priority is ONE double
    multiply + ONE correctly-rounded IEEE division of exact-integer
    operands — both engines compute the identical bit pattern, so the
    top-k SET (ordered by priority, id-tiebroken) is identical, not
    merely close. No floats cross an aggregation.

    Scale shape: the heavy step is top-(k+1) — a TakeOrdered heap per
    partition, never a global sort; everything after operates on the
    (k+1)-row frame (τ is a 1-row broadcast). Zero/negative/NULL
    weights are excluded (they have no defined priority).

    Rows with tied priorities at τ resolve by the strict ``pri > τ``
    rule, identically in both engines; with distinct ids and a 48-bit
    hash the tie is a measure-zero event, and a sub-(k+1)-row input
    degrades to n−1 sampled rows by the same rule (documented, not
    special-cased).
    """
    w = F.col(weight_col)
    base = df.filter(w.isNotNull() & (w > 0)).select(
        F.col(id_col),
        w.alias("weight"),
        priority_expr(weight_col, id_col, salt).alias("pri"),
    )
    topk1 = base.orderBy(F.desc("pri"), id_col).limit(k + 1)
    tau = topk1.agg(F.min("pri").alias("tau"))
    return (
        topk1.crossJoin(F.broadcast(tau))
        .filter(F.col("pri") > F.col("tau"))
        .select(
            id_col,
            "weight",
            F.greatest(F.col("weight").cast("double"), F.col("tau")).alias(
                "w_est"
            ),
        )
    )


def priority_sample_per_stratum(
    df: DataFrame,
    weight_col: str,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "ps",
) -> DataFrame:
    """Priority sampling with a PER-STRATUM budget: the k highest
    priorities within each stratum, each with its stratum's threshold
    τ_s and estimator ŵ = max(w, τ_s) — "5k docs per source, still
    unbiased per-source statistics". Same exact-IEEE priority as
    priority_sample; the heavy step is one shuffle on the stratum key
    + a per-stratum heap window (rows beyond k+1 never survive the
    rank filter), never a global sort. A stratum with ≤ k rows keeps
    everything at τ_s = 0 (ŵ = w — the Duffield-Lund-Thorup
    convention when nothing is excluded). NULL strata form their own
    group (kept: a real mix must account unlabeled rows)."""
    from pyspark.sql import Window

    w = F.col(weight_col)
    base = df.filter(w.isNotNull() & (w > 0)).select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col),
        w.alias("weight"),
        priority_expr(weight_col, id_col, salt).alias("pri"),
    )
    win = Window.partitionBy("stratum").orderBy(F.desc("pri"), F.col(id_col))
    ranked = base.withColumn("rn", F.row_number().over(win)).filter(
        F.col("rn") <= k + 1
    )
    tau = ranked.filter(F.col("rn") == k + 1).select(
        F.col("stratum").alias("tau_stratum"), F.col("pri").alias("tau")
    )
    # eqNullSafe: a NULL stratum is a real group here, and a null-unsafe
    # equi-join would drop its tau row, silently coalescing tau to 0 and
    # biasing w_est for every sampled row of that group (ADVICE r10).
    # tau is one row per stratum — broadcastable by construction.
    return (
        ranked.filter(F.col("rn") <= k)
        .join(F.broadcast(tau), F.col("stratum").eqNullSafe(F.col("tau_stratum")), "left")
        .select(
            "stratum",
            id_col,
            "weight",
            F.greatest(
                F.col("weight").cast("double"), F.coalesce(F.col("tau"), F.lit(0.0))
            ).alias("w_est"),
        )
    )


def cluster_safe_split(
    df: DataFrame,
    dup_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    splits: tuple[tuple[str, float], ...] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """dataset_split with the near-duplicate leakage hole closed: the
    split is assigned per DUPLICATE CLUSTER, never per document.

    Hashing raw ids (plain dataset_split) guarantees a document never
    migrates between splits — but two NEAR-DUPLICATES hash
    independently, so with 5% test odds roughly 1 in 10 near-dup pairs
    straddles train/test and the eval silently measures memorization
    (the GPT-2/GPT-3-era contamination lesson that made cluster-level
    splitting the published standard for dedup-aware corpora). The fix:
    connected-components over the verified near-dup pairs, then hash
    the CLUSTER id into split buckets — every member of a cluster
    lands in the same split by construction, and docs with no near-dup
    (the vast majority) fall back to their own id, reproducing plain
    dataset_split exactly.

    ``dup_edges`` is the verified near-dup pair list (e.g.
    minhash_lsh_dedup(..., min_jaccard=...)). Output: df's columns +
    ``cluster_id`` + ``out_col``.

    Scale shape: components cost O(pair-list) joins (pairs are bounded
    by near-dup density, not corpus size); attaching them to the corpus
    is ONE left equi-join on the id; the split itself stays a pure
    projection. Determinism: cluster_id = min doc id of the component
    (unique fixpoint), md5 bucketing — the assignment is a pure
    function of (corpus, edge set), bit-stable across engines.
    """
    from analytics_etl_spark.operators.graph import connected_components

    if "cluster_id" in df.columns:
        raise ValueError(
            "df already has a 'cluster_id' column — the split would silently "
            "join/overwrite it; rename it first (raise-instead-of-misbehave)"
        )
    cc = connected_components(dup_edges, src=src, dst=dst)
    if id_col != "doc_id":
        cc = cc.withColumnRenamed("doc_id", id_col)
    assigned = df.join(cc, id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    return dataset_split(
        assigned,
        splits=splits,
        id_col="cluster_id",
        salt=salt,
        out_col=out_col,
    )


def split_straddle_audit(
    assignment: DataFrame,
    dup_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    split_col: str = "split",
) -> DataFrame:
    """Edge-level leakage audit: the near-dup pairs whose two
    endpoints were assigned DIFFERENT splits — each returned row is a
    train/test straddle the eval would silently memorize through.

    ``cluster_safe_split`` guarantees this is empty by construction
    for the edge set it was given; the audit exists for the seams
    where that guarantee can't hold — the incremental refresh's
    multi-split link boundary (a batch doc bridging two standing docs
    that the nightly split apart; see plans/incremental_refresh.py),
    or an assignment produced by plain ``dataset_split``. The nightly
    rebuild heals the bridge (its connected-components pass merges the
    straddling component and re-hashes it as one unit) — pinned
    end-to-end in tests/test_incremental_refresh.py.

    Scale shape: two keyed equi-joins of the edge list against the
    id-sized assignment — edge-list-sized, never corpus-sized.
    Returns (src, dst, split_a, split_b).
    """
    a = assignment.select(F.col(id_col).alias(src), F.col(split_col).alias("split_a"))
    b = assignment.select(F.col(id_col).alias(dst), F.col(split_col).alias("split_b"))
    return (
        dup_edges.select(src, dst)
        .join(a, src)
        .join(b, dst)
        .filter(F.col("split_a") != F.col("split_b"))
    )
