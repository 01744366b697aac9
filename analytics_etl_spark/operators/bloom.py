"""Bloom membership sketch — set membership at 100 TB, JVM-pure.

The third mergeable sketch family next to HLL (distinct counts,
operators/sketches.py) and Misra-Gries (heavy hitters,
operators/freq.py): a Bloom filter answers "might this key be in the
corpus?" with NO false negatives and a tunable false-positive rate.
The at-scale use is the INGEST PRESCREEN (reference analog: the
reference re-queries its store per batch to decide inserts,
`/root/reference/etl_service.py` + `database_service.py` upsert loop):
before the exact batch-vs-corpus membership join, probe a corpus-built
bloom — every "definitely new" row (the overwhelming majority of a
healthy ingest) skips the exact join entirely, and only the maybe-set
(true dups + ~fp_rate of the batch) pays for verification. Because a
bloom has no false negatives, prescreen + exact-verify returns EXACTLY
the plain join's answer — the sketch changes the cost, never the
result, which is what makes the composed operator oracle-pairable.

Representation: a SPARSE TABLE of (word_idx, bits) int64 rows — the
non-zero 64-bit words of an m-bit filter — rather than one giant
array cell. Three reasons:
* it is built by `explode(bit positions) -> groupBy(word_idx) ->
  bit_or` — ordinary map-side-combined aggregation, never a single
  task holding the whole filter;
* it merges by the same `groupBy(word_idx).bit_or` (union of blooms
  is bitwise OR — associative/commutative, partition-order
  invariant);
* probing is a plain equi-join on word_idx, so Catalyst broadcasts a
  small filter (a 1M-bit bloom is 16 K rows ≈ 128 KiB) and shuffles a
  big one (a 10-bits/key filter over 10^9 keys is ~1.25 GiB — far too
  big to broadcast, but the probe join then shuffles only the
  batch-sized probe rows against it).

Hash construction: position_i = xxhash64(key, seed=i) mod m via
pmod — deterministic across engines/partitionings (no Python, no
libm). k independent seeds give the standard k-probe bloom; with
m/n = 10 bits/key and k = 4, fp ≈ 1.2 %.

Everything here is pure `pyspark.sql.functions` — zero Python eval
nodes in any plan (plan-asserted in tests/test_bloom.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 4

# Sidecar carrying the (num_bits, num_hashes) a persisted bloom was
# built with. The sparse (word_idx, bits) table itself is
# parameter-blind: OR-merging or probing it with DIFFERENT params
# silently yields FALSE NEGATIVES — the one error class this module
# promises never to produce (ADVICE r7; the same reason the prescreen
# fails loud on key-type mismatch). The leading underscore keeps
# Spark's parquet reader from treating it as data, and living INSIDE
# the table directory means the crash-safe swap moves data + meta
# atomically together.
BLOOM_META_FILE = "_bloom_meta.json"


def bloom_meta_json(num_bits: int, num_hashes: int) -> str:
    return json.dumps({"num_bits": num_bits, "num_hashes": num_hashes})


def check_bloom_meta(path: str, num_bits: int, num_hashes: int) -> None:
    """Raise unless the persisted bloom at ``path`` (if any) declares
    exactly (num_bits, num_hashes). A table WITHOUT a sidecar also
    raises: its parameters are unknowable, so merging/probing it is a
    config-drift false negative waiting to happen — rebuild it (or
    stamp it via write_bloom) rather than guess. Local-filesystem
    check, same documented scope as the swap helper that maintains
    these tables (streaming.ingest._merge_swap_table)."""
    if not os.path.isdir(path):
        return  # no table yet — the caller is about to create it
    meta_path = os.path.join(path, BLOOM_META_FILE)
    if not os.path.exists(meta_path):
        raise ValueError(
            f"bloom table {path} has no {BLOOM_META_FILE} sidecar — its "
            "(num_bits, num_hashes) are unknown, and merging or probing "
            "with mismatched params yields silent false negatives; "
            "rebuild it via write_bloom/merge_bloom_batch"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    if (meta.get("num_bits"), meta.get("num_hashes")) != (num_bits, num_hashes):
        raise ValueError(
            f"bloom param mismatch at {path}: stored (num_bits="
            f"{meta.get('num_bits')}, num_hashes={meta.get('num_hashes')}) "
            f"vs requested ({num_bits}, {num_hashes}) — OR-merging or "
            "probing across configs breaks the no-false-negative contract"
        )


def write_bloom(
    bloom: DataFrame, path: str, num_bits: int, num_hashes: int = DEFAULT_NUM_HASHES
) -> None:
    """Persist a bloom WITH its parameter sidecar (the only supported
    way to write one — a bare .write.parquet loses the params). An
    overwrite is an authoritative rebuild, so no mismatch check: the
    new sidecar replaces the old contract."""
    bloom.write.mode("overwrite").parquet(path)
    with open(os.path.join(path, BLOOM_META_FILE), "w") as f:
        f.write(bloom_meta_json(num_bits, num_hashes))


def read_bloom(
    spark, path: str, num_bits: int, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """Read a persisted bloom, raising unless its sidecar matches the
    params the caller is about to probe/merge with."""
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no bloom table at {path}")
    check_bloom_meta(path, num_bits, num_hashes)
    return spark.read.parquet(path)


def _positions(col, num_bits: int, num_hashes: int):
    """Array of k bit positions for a key — xxhash64 with seed=i,
    pmod m (pmod, not %, so negative hashes land in [0, m))."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Build the sparse bloom table (word_idx, bits) over df[key_col].

    One explode of k positions per row, one map-side-combined bit_or
    aggregate — the sketch build is a single shuffle of at most
    k·rows (word_idx, mask) pairs that combine down to ≤ m/64 output
    rows. Rebuilding nightly is corpus-priced; merging an ingest
    batch's bloom via `bloom_merge` is batch-priced (union == OR).
    NULL keys are skipped (membership of NULL is meaningless)."""
    if num_bits < 64:
        raise ValueError(f"num_bits must be >= 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    pos = F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("pos")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("bigint").alias("word_idx"),
            # F.shiftleft only takes a literal shift; the SQL form
            # accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union of blooms built with the SAME (num_bits, num_hashes):
    bitwise OR word-by-word. Associative and commutative, so daily
    blooms roll up to monthly exactly like the HLL sketches."""
    if not blooms:
        raise ValueError("bloom_merge needs at least one bloom")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
    out_col: str = "might_contain",
) -> DataFrame:
    """probe + a boolean `out_col`: False ⇒ the key is DEFINITELY not
    in the bloom's build set (no false negatives); True ⇒ maybe.

    Shape: membership is a function of the KEY, so the probe runs
    over `probe[key_col].distinct()` (not per row — also what keeps
    every intermediate deterministic; a row-id scheme via
    monotonically_increasing_id would be recompute-unstable across
    the two consumers). Each distinct key's k positions group to ≤ k
    (word_idx, mask) pairs (bit_or folds same-word probes); LEFT join
    the bloom on word_idx (broadcast when small, shuffle when
    corpus-sized — Catalyst's call); a word absent from the sparse
    table means all its bits are 0. might_contain = every probed word
    has every probed bit set; NULL keys get False (a NULL is never a
    member). All shuffles are batch-key-sized, never corpus-sized."""
    keys = probe.select(key_col).filter(F.col(key_col).isNotNull()).distinct()
    pairs = (
        keys.select(
            key_col,
            F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("pos"),
        )
        .select(
            key_col,
            (F.col("pos") / 64).cast("bigint").alias("word_idx"),
            # F.shiftleft only takes a literal shift; the SQL form
            # accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy(key_col, "word_idx")
        .agg(F.bit_or("mask").alias("mask"))
    )
    checked = (
        pairs.join(bloom, "word_idx", "left")
        .select(
            key_col,
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                == F.col("mask")
            ).alias("ok"),
        )
        .groupBy(key_col)
        .agg(F.min("ok").alias(out_col))
    )
    return probe.join(checked, key_col, "left").select(
        *probe.columns, F.coalesce(F.col(out_col), F.lit(False)).alias(out_col)
    )


def bloom_prescreened_new_keys(
    corpus: DataFrame,
    batch: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bloom: DataFrame | None = None,
    broadcast_verify: bool = False,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Batch rows whose key_col is NOT present in corpus[key_col] —
    EXACTLY `batch ANTI JOIN corpus ON key` (the oracle), computed as
    bloom-prescreen + exact-verify:

      might_contain == False  -> definitely new, emitted with ZERO
                                 join work (the common case at a
                                 healthy dedup rate);
      might_contain == True   -> maybe-dup (true dups + ~fp of the
                                 batch) -> exact LEFT ANTI join
                                 against the corpus keys.

    No false negatives ⇒ result == plain anti join, bit for bit; the
    sketch only shrinks the exact join's probe side by ~(1 − fp) of
    the novel rows. At 100 TB the verify side stays a full corpus-key
    scan either way; whether the corpus also SHUFFLES is the
    ``broadcast_verify`` choice below — a LEFT ANTI join can only
    broadcast its right side, so the natural `maybe ANTI corpus` form
    exchanges the full corpus key set, and Catalyst will not flip the
    join direction for you.
    NULL-key batch rows are dropped, matching anti-join-on-equality
    semantics (NULL = NULL is never true, so a NULL key never matches
    and plain anti join would KEEP it; callers wanting NULL rows
    filter them through separately — documented divergence kept
    deliberately, since a NULL dedup key upstream is a bug to surface,
    and the registered query feeds md5(text) which is never NULL).

    ``bloom``: a prebuilt sketch over the SAME corpus/(num_bits,
    num_hashes) — the deployment path, where the bloom is the
    persisted, bit_or-mergeable ingest artifact and each batch pays
    only the probe + maybe-set verify (same pay-once-at-ingest
    pattern as the shingle/span-hash columns and the ANN indexes).
    Correctness requires the sketch to COVER the corpus it screens
    for: a superset bloom only costs extra verifies (still exact),
    but a bloom missing corpus keys breaks the no-false-negative
    contract — merge each batch's own bloom in before the next batch
    arrives, never lazily."""
    ct = corpus.schema[key_col].dataType
    bt = batch.schema[key_col].dataType
    if ct != bt:
        # a plain equi-join COERCES mismatched key types, but xxhash64
        # hashes the raw typed value — int 5 and string "5" probe
        # different bits, so a coercible match could sail through the
        # prescreen as "definitely new": a silent false negative, the
        # one error class this operator promises never to produce.
        # Fail loud instead (same policy as triangle_count's guards).
        raise TypeError(
            f"bloom prescreen key type mismatch: corpus {key_col} is "
            f"{ct.simpleString()}, batch {key_col} is {bt.simpleString()} "
            "— cast both sides to one type first"
        )
    probed = bloom_might_contain(
        batch.filter(F.col(key_col).isNotNull()),
        bloom if bloom is not None else bloom_build(corpus, key_col, num_bits, num_hashes),
        key_col,
        num_bits,
        num_hashes,
    )
    # probed feeds BOTH branches below; Catalyst has no cross-branch
    # CSE, so without this pin the whole explode/groupBy/join probe
    # runs twice. persist() beats localCheckpoint(eager=False) here —
    # measured same-run at sf0.1: 0.80 s vs 1.95 s vs 2.24 s unpinned
    # (checkpoint RDD partitions get raced/doubly computed by the two
    # union branches inside one job; the cache manager shares them).
    # The batch-sized cache entry lives until LRU eviction unless the
    # caller passes ``cache_handles`` (ADVICE r7): long-lived callers —
    # per-batch streaming loops, repeated bench reps — receive the
    # persisted handle there and unpersist() it once the result is
    # consumed, so accumulated batch caches cannot evict deliberately
    # cached ingest artifacts under memory pressure.
    probed = probed.persist()
    if cache_handles is not None:
        cache_handles.append(probed)
    definitely_new = probed.filter(~F.col("might_contain")).drop("might_contain")
    maybe = probed.filter(F.col("might_contain")).drop("might_contain")
    if broadcast_verify:
        # Corpus-shuffle-FREE verify for the design case (maybe-set ≪
        # corpus): a LEFT ANTI join can only broadcast its right side,
        # so `maybe ANTI corpus` inevitably shuffles the corpus keys.
        # Flip it: semi-join the CORPUS against the broadcast maybe-set
        # (corpus is scanned once, never exchanged; hits is
        # maybe-set-sized), then a tiny broadcast anti against hits.
        # Caller asserts the maybe-set is broadcastable — it is bounded
        # by true-dups + fp·batch, so this is safe whenever the batch
        # itself is broadcast-scale; for corpus-scale batches keep the
        # default shuffle form.
        hits = corpus.select(key_col).join(
            F.broadcast(maybe.select(key_col).distinct()), key_col, "left_semi"
        ).distinct()
        verified_new = maybe.join(F.broadcast(hits), key_col, "left_anti")
    else:
        verified_new = maybe.join(
            corpus.select(F.col(key_col)).distinct(), key_col, "left_anti"
        )
    return definitely_new.unionByName(verified_new)
