"""Count-min sketch — mergeable frequency estimates, fully hash-exact.

Completes the sketch family (HLL distinct counts `sketches.py`,
Misra-Gries heavy hitters `freq.py`, bloom membership `bloom.py`) with
the classic frequency estimator (Cormode & Muthukrishnan 2005): a
``depth × width`` grid of int64 counters; each key increments one
counter per row via an independent hash; an estimate is the MIN over
the key's ``depth`` counters. Guarantees: never an underestimate
(every counter the key touches holds its full count plus collisions),
and overestimate ≤ ⌈e·N/width⌉ with probability 1−e^−depth.

Unlike the HLL family, every CMS operation is EXACT integer
arithmetic over md5-derived buckets (the perplexity/DSIR hashing — no
platform-specific sketch encoding), so the whole family oracle-pairs:
DuckDB reproduces build, estimate, and merge bit for bit.

Relational encoding: the sketch is a sparse (r, b, cnt) table —
zero-count cells are absent; estimates LEFT-join and coalesce to 0,
which is exactly what a dense grid would hold. Bounded size:
≤ depth·width rows regardless of input (collisions merge; the table
never grows past the grid) — always broadcastable at the defaults
(4 × 2048 = ≤ 8192 rows).

100 TB shape: build is one explode (×depth) → groupBy(r, b) with
map-side combine, so the shuffle moves ≤ depth·width partial cells
per mapper, never raw keys. Merge is cell-wise SUM (lossless AND
commutative: merged sketches equal the one-shot sketch of the
concatenated input EXACTLY — integer addition, no register
saturation), so per-partition/per-day sketches roll up like the HLL
table. Same param-safety contract as bloom.py: estimating against or
merging into a sketch built with different (depth, width) is silent
garbage, so persisted sketches carry a meta sidecar checked at entry
(streaming/ingest.py `merge_cms_batch`).

NULL contract: NULL keys are dropped at build AND estimate (a NULL
key has no frequency; mirrors exact GROUP BY semantics where the
NULL group is reported separately, which a frequency sketch does not
model).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 2048
CMS_META_FILE = "_cms_meta.json"


def cms_bucket_array(key: Column, depth: int, width: int) -> Column:
    """The key's ``depth`` bucket indices as an array: ONE md5 per
    key, with each hash row reading a disjoint 8-hex-digit (32-bit)
    slice of the digest — pairwise independence from digest slicing
    instead of ``depth`` salted digests (the first cut salted one md5
    per row and measured md5-bound at sf0.1: 4.8 s → one digest cuts
    the hash work ×depth). 8 hex digits < 2^32 keeps conv() exact in
    int64. depth ≤ 4 because md5 yields four disjoint 32-bit slices."""
    if not 1 <= depth <= 4:
        raise ValueError(f"depth must be in [1, 4], got {depth}")
    h = F.md5(key.cast("string"))
    return F.array(
        *[
            F.conv(F.substring(h, 1 + 8 * r, 8), 16, 10).cast("long")
            % F.lit(width).cast("long")
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Sparse CMS table (r, b, cnt) over ``df[key_col]`` occurrences.

    Two-level build: per-key exact counts first (map-side combined —
    the same shuffle any exact groupBy pays), THEN hash/explode the
    key-cardinality table into grid cells. Exploding occurrence rows
    directly measured 2.3 s at sf0.1 (×depth row blowup through the
    Generate node before any combine); exploding the distinct-key
    table is ~free and the cell counts are identical by construction
    (Σ over a key's occurrences commutes with the per-key rollup)."""
    per_key = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count("*").cast("bigint").alias("kn"))
    )
    return (
        per_key.select(
            F.posexplode(
                cms_bucket_array(F.col(key_col), depth, width)
            ).alias("r", "b"),
            "kn",
        )
        .groupBy("r", "b")
        .agg(F.sum("kn").cast("bigint").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — lossless: merge(build(X), build(Y)) equals
    build(X ∪ Y) exactly (pinned in tests/test_cms.py). NOT
    idempotent (counts double on replay, unlike bloom's OR) — replay
    protection is the epoch ledger's job, not the sketch's."""
    return (
        a.unionByName(b)
        .groupBy("r", "b")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    est_col: str = "est_n",
) -> DataFrame:
    """Point estimates for ``keys[key_col]``: min over the key's
    ``depth`` counters, absent cells = 0. The sketch side is grid-
    bounded (≤ depth·width rows) so Catalyst broadcasts it; the probe
    explode is ×depth on the KEYS side only."""
    probes = keys.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col),
        F.posexplode(
            cms_bucket_array(F.col(key_col), depth, width)
        ).alias("r", "b"),
    )
    return (
        probes.join(F.broadcast(cms), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias(est_col)
        )
    )


def cms_meta_json(depth: int, width: int) -> str:
    return json.dumps({"depth": int(depth), "width": int(width)})


def check_cms_meta(cms_path: str, depth: int, width: int) -> None:
    """Fail loud if a persisted sketch declares different (depth,
    width) — or none. The bloom.py param-safety contract: cross-param
    cells are silent garbage, an unstamped table's params are
    unknowable."""
    meta_path = os.path.join(cms_path, CMS_META_FILE)
    if not os.path.isdir(cms_path):
        return  # first write: nothing to contradict
    if not os.path.exists(meta_path):
        raise ValueError(
            f"CMS table at {cms_path} has no {CMS_META_FILE} sidecar; "
            "its (depth, width) are unknowable — refusing to touch it"
        )
    with open(meta_path) as f:
        stored = json.load(f)
    if stored != {"depth": int(depth), "width": int(width)}:
        raise ValueError(
            f"CMS param mismatch at {cms_path}: stored {stored}, "
            f"caller depth={depth} width={width}"
        )


def cms_join_size_estimate(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimation from two CMS tables (Cormode &
    Muthukrishnan 2005 §4.3): |A ⋈_k B| = Σ_k cA(k)·cB(k) is
    estimated by min over hash rows of the cell-wise inner product
    Σ_b cmsA[r,b]·cmsB[r,b]. One-sided like the point estimate
    (collisions only add cross terms, so est ≥ truth), and the
    primitive a planner uses to size a join BEFORE running it from
    two kilobyte sketches instead of two table scans. Both sketches
    must share (depth, width) — the caller's sidecar contract.

    Returns a 1-row frame (est_join_size bigint). Grid-bounded work:
    the join/aggregation touches ≤ depth·width cells per side."""
    prod = (
        cms_a.alias("a")
        .join(cms_b.alias("b"), ["r", "b"])
        .groupBy("r")
        .agg(
            F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("bigint").alias("ip")
        )
    )
    # A hash row whose cells overlap in NO bucket contributes a ZERO
    # inner product — the tightest bound — but the inner join drops it
    # entirely; min over the surviving rows then overshoots, and two
    # fully-disjoint sketches would return NULL instead of 0. Coalesce
    # the final min to 0 whenever fewer than `depth` rows survive
    # (row count of `prod` vs the depth recorded on the sketch itself).
    depth_rows = cms_a.select(F.countDistinct("r").alias("d"))
    return (
        prod.agg(
            F.min("ip").alias("min_ip"), F.count(F.lit(1)).alias("rows_present")
        )
        .crossJoin(F.broadcast(depth_rows))
        .select(
            F.when(F.col("rows_present") < F.col("d"), F.lit(0))
            .otherwise(F.coalesce(F.col("min_ip"), F.lit(0)))
            .cast("bigint")
            .alias("est_join_size")
        )
    )
