"""Deduplication operators for training-data pipelines.

Four strategies, all built from DataFrame primitives (no Python UDFs):

- exact: md5-fingerprint groupBy — one shuffle on the fingerprint.
- n-gram Jaccard: shingle explode + pair join on shared shingles —
  the exact-verification kernel; quadratic in *colliding* docs only.
- MinHash + LSH: shingle → k minhashes → banded buckets → candidate
  pairs → exact Jaccard verify. The 100 TB path: candidate generation
  is linear scans + shuffles on (band, bucket); only near-duplicates
  ever meet in a join.
- SimHash: 64-bit signature via per-shingle md5 bit-votes; bucket by
  signature prefix.

Hashes are md5 (identical across Spark, DuckDB, and any other engine),
which keeps every stage oracle-checkable and deterministic — a
property xxhash64/murmur do NOT have across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_arrays(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, text) → (doc_id, shingles: array<string>) — NOT exploded.

    Keeping shingles as a per-row array lets downstream minhashing run
    as pure projections (array_min over transform) with ZERO shuffle;
    explode only where a relational shape is genuinely needed
    (word_shingles / the Jaccard verify join).
    """
    # Shingling fans out ~tokens× per row; if the source arrived in
    # fewer *files* than cores (small file, coalesced scan), spread it
    # first so downstream array work parallelizes. File count is a
    # driver-cheap proxy for scan tasks that avoids touching df.rdd
    # (which forces a plan conversion); at real scale the scan has
    # >= cores partitions and this is a no-op. Non-file sources
    # (in-memory test frames) report no files and are left alone.
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(docs.inputFiles())
    except Exception:
        n_files = 0
    if 0 < n_files < parallelism:
        docs = docs.repartition(parallelism, id_col)

    words = F.split(F.col(text_col), " ")
    k = F.size(words) - (n - 1)  # number of shingles
    idx = F.sequence(F.lit(0), k - 1)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j + 1) for j in range(n)]
    )
    shingles = F.when(k >= 1, F.transform(idx, shingle_at)).otherwise(
        F.array().cast("array<string>")
    )
    if distinct:
        # distinctness is per-document — array_distinct inside the row
        # does it with zero shuffle (vs a corpus-wide DISTINCT).
        shingles = F.array_distinct(shingles)
    return docs.select(F.col(id_col).alias("doc_id"), shingles.alias("shingles"))


def word_shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, text) → (id, shingle): word n-gram shingles, exploded."""
    arr = shingle_arrays(docs, text_col, id_col, n=n, distinct=distinct)
    return arr.select("doc_id", F.explode("shingles").alias("shingle"))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group identical texts by md5, keep the min id.

    Hash-groupBy on the 32-char fingerprint instead of the full text —
    the shuffle carries 32 bytes per row, not the document.
    """
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count("*").alias("n_copies"))
    )


def jaccard_pairs(shingled: DataFrame, min_jaccard: float = 0.0) -> DataFrame:
    """Exact pairwise Jaccard over docs sharing ≥1 shingle.

    shingled: distinct (doc_id, shingle). Returns (doc_a, doc_b,
    jaccard) with doc_a < doc_b. The join key is the shingle, so only
    docs with actual overlap are ever paired.
    """
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = shingled.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingled.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def minhash_signatures(shingled: DataFrame, num_hashes: int = 12) -> DataFrame:
    """(doc_id, shingle) → (doc_id, h0..h{k-1}): wide minhash signature.

    h_i(doc) = min over shingles of md5(i || ':' || shingle) — md5 hex
    compared lexicographically. All k minhashes are k MIN aggregates
    in ONE groupBy: no k× row fan-out, one shuffle, and partial
    aggregation means one row per (doc, task) crosses the wire.

    Prefer minhash_signatures_from_arrays when the shingles are still
    per-row arrays — that variant needs no shuffle at all.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy("doc_id").agg(*aggs)


def minhash_signatures_from_arrays(
    shingle_arr: DataFrame, num_hashes: int = 12
) -> DataFrame:
    """(doc_id, shingles array) → wide minhash signature, ZERO shuffle.

    h_i = array_min(transform(shingles, s -> md5(i:s))) — a pure
    per-row projection that fuses into the scan under whole-stage
    codegen. Identical values to the groupBy formulation (array_min
    == MIN over the same md5 strings). Docs with no shingles get null
    signatures and are dropped (they can't pair anyway).
    """
    cols = [
        F.array_min(
            F.transform(F.col("shingles"), lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingle_arr.filter(F.size("shingles") >= 1).select("doc_id", *cols)


def lsh_band_buckets(
    signatures: DataFrame, rows_per_band: int = 3, num_hashes: int = 12
) -> DataFrame:
    """Wide minhash signatures → (doc_id, band, bucket) LSH buckets.

    bucket = md5 of the band's rows_per_band minhashes joined in seed
    order. Docs agreeing on ALL rows of some band share a bucket.
    Pure projection + explode — no extra shuffle.
    """
    n_bands = num_hashes // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct candidate pairs from shared (band, bucket)."""
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def verify_jaccard(shingled: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for a GIVEN pair set only (the LSH verify stage).

    Unlike jaccard_pairs, this never forms the all-colliding-pairs
    join: the candidate set is equi-joined onto doc_a's shingles,
    then matched against doc_b's — cost is
    O(|pairs| · shingles/doc), independent of corpus-wide collisions.

    No broadcast hint: the candidate frame is unbounded (hot LSH
    buckets can make it large), so a forced broadcast is a driver-OOM
    risk. The joins are keyed (doc_a, then (doc_b, shingle)); the
    optimizer/AQE still broadcasts when the pair set is genuinely
    small, and falls back to a shuffle join when it isn't.
    """
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ta = shingled.select(F.col("doc_id").alias("doc_a"), "shingle")
    tb = shingled.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        pairs.join(ta, "doc_a")
        .join(tb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    rows_per_band: int = 3,
    shingle_n: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates + exact verify.

    Returns (doc_a, doc_b, jaccard) for LSH-candidate pairs. At scale:
    shingle explode (narrow) → minhash agg (shuffle on doc) → bucket
    join (shuffle on bucket) → exact-Jaccard verify restricted to the
    candidate pairs (never corpus-wide).
    """
    # The shingle arrays feed BOTH signature building and the exact
    # verify stage. Deliberately NOT cached: pinning corpus-sized
    # shingle arrays in executor memory is itself a hazard at scale,
    # and recomputing them is a narrow scan+projection that fuses into
    # each consumer under codegen. (A caller who wants reuse across
    # *multiple* actions can shingle once, persist, and unpersist on
    # their own lifecycle.) Signatures + band buckets are pure
    # projections: candidate generation costs ONE shuffle (the
    # band/bucket self-join).
    arrays = shingle_arrays(docs, text_col, id_col, n=shingle_n, distinct=True)
    sigs = minhash_signatures_from_arrays(arrays, num_hashes)
    cands = lsh_candidate_pairs(lsh_band_buckets(sigs, rows_per_band, num_hashes))
    shingled = arrays.select("doc_id", F.explode("shingles").alias("shingle"))
    return verify_jaccard(shingled, cands).filter(F.col("jaccard") >= min_jaccard)


def simhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    shingle_n: int = 2,
) -> DataFrame:
    """SimHash: per-doc `bits`-bit signature from shingle-hash bit votes.

    bit_i(doc) = 1 iff more shingles have bit i set than not in their
    md5-derived integer hash. Like the minhash path, the whole
    computation is per-row array algebra — shingle → hash-int array →
    per-bit vote counts via size(filter(...)) — ZERO shuffle.
    Hamming-distance buckets via signature prefix.
    """
    arrays = shingle_arrays(docs, text_col, id_col, n=shingle_n, distinct=False)
    # 60-bit integer per shingle from the first 15 hex chars of md5.
    hashes = F.transform(
        F.col("shingles"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    n = F.size("shingles")
    withh = arrays.filter(n >= 1).select("doc_id", hashes.alias("hs"), n.alias("n"))
    # bit i wins if set-count > n/2 (strictly more set than unset)
    sig = None
    for i in range(bits):
        ones = F.size(
            F.filter(F.col("hs"), lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1)
        )
        bit = F.when(ones * 2 > F.col("n"), F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return withh.select("doc_id", sig.alias("simhash"))
