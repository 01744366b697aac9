"""Mergeable heavy-hitter (frequency) sketch — Misra-Gries.

Completes the engine's sketch family: HLL answers "how many distinct"
(operators/sketches.py), Misra-Gries answers "which items are
frequent" in FIXED memory. The exact answer (groupBy + count) is fine
when the key space fits aggregation state; at 100 TB with
trillions-of-distinct keys (URLs, n-grams, user agents) even
partial-agg hash tables blow up — the MG summary holds exactly k
counters per partition no matter what flows through, with the classic
guarantee: every item with true frequency > n/(k+1) SURVIVES, and
every kept counter underestimates by at most n/(k+1) (Misra & Gries
1982; merge-preserves-guarantee per Agarwal et al. 2012, "Mergeable
Summaries").

Distributed shape (one pass + a bounded reduce):
1. per-PARTITION MG via mapInPandas — the counter dict lives across
   the partition's Arrow batches, so each task summarizes its whole
   partition in O(k) memory; decrement-all events amortize to O(1)
   per row (each arrival adds one unit of total count, each event
   retires k units, so there are at most n/k events of cost k).
2. merge: pointwise sum of the per-partition summaries (a
   (num_partitions × k)-row frame — KBs), then ONE trim: subtract the
   (k+1)-th largest merged counter and drop non-positives, which
   leaves ≤ k items and preserves the error bound. The (k+1)-th
   value is an index-sized driver collect (same class as the IVF
   centroid collects).

Counters are partition/stream-order DEPENDENT (two runs over
different partitionings keep different tail items), so queries built
on this are rows-only for the driver; the guarantees themselves are
pinned by property tests in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_summaries(df: DataFrame, col: str, k: int = 50) -> DataFrame:
    """Stage 1: one Misra-Gries summary (≤ k rows) per partition."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    # self-contained closure: cloudpickle ships it by value, workers
    # never import this package
    def run(batches):
        import pandas as _pd

        counters: dict = {}
        for pdf in batches:
            for item in pdf[col]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield _pd.DataFrame(
            {"item": list(counters.keys()), "est": list(counters.values())}
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        run, "item string, est long"
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 50) -> DataFrame:
    """(item, est) for the ≤ k heaviest items of ``df[col]``.

    est is a LOWER bound on the true frequency; true − est ≤ n/(k+1).
    Any item with true frequency > n/(k+1) is guaranteed present.
    Ordered by est desc, item asc (deterministic given the summaries).

    The merged summary is pinned with an eager localCheckpoint before
    use (ADVICE r6): Misra-Gries counters are partition/stream-order
    dependent, and the frame is consumed twice — once by the driver
    collect that picks the trim value d, once by the returned filtered
    frame. Without the checkpoint a recomputation under a different
    partitioning (task retry, upstream shuffle nondeterminism) could
    trim with a d inconsistent with the counters being trimmed. The
    checkpoint is ≤ k·partitions rows — index-sized."""
    merged = (
        partition_summaries(df, col, k)
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
        .localCheckpoint(eager=True)
    )
    top = merged.orderBy(F.desc("est"), F.asc("item")).limit(k + 1).collect()
    if len(top) <= k:
        d = 0
    else:
        d = top[-1]["est"]
    return (
        merged.filter(F.col("est") > F.lit(d))
        .select("item", (F.col("est") - F.lit(d)).alias("est"))
        .orderBy(F.desc("est"), F.asc("item"))
    )


def heavy_hitters_guaranteed(df: DataFrame, col: str, k: int = 50) -> DataFrame:
    """The MG COMPLETENESS guarantee made hash-checkable (VERDICT r14
    item 4): the items the sketch contract says MUST survive — exact
    frequency strictly above n/(k+1) over the non-null stream —
    emitted with their exact counts, LEFT-SEMI-joined against the
    sketch's actual survivors.

    Why this projection and not a sketch-side one: the raw counters
    are irreducibly order-dependent, and ANY est-threshold cut is
    ambiguous for items whose true frequency sits in the
    (n/(k+1), 2n/(k+1)] band — there est ranges over
    [f - n/(k+1), f], which straddles every fixed threshold — so the
    one DECISION surface that IS deterministic is exact-threshold
    membership. The semi-join makes the guarantee itself the thing
    under test: if the sketch ever drops a guaranteed item (a
    completeness bug in the partition pass, the merge, or the trim),
    the row disappears and the driver's hash check goes red; the
    order-dependent tail survivors never appear on either side.

    The exact counts make this the AUDIT arm — run it on a golden
    slice or a bounded column, not the trillion-key stream; the
    sketch arm (``heavy_hitters``) remains the fixed-memory
    production path. Cost: the sketch pass plus one map-side-combined
    groupBy on the audited column, both counter-sized outputs; the
    total-count frame is one row, broadcast."""
    survivors = heavy_hitters(df, col, k).select("item")
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("item"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("n"))
    guaranteed = counts.crossJoin(F.broadcast(total)).filter(
        F.col("cnt") * (k + 1) > F.col("n")
    )
    return guaranteed.join(survivors, "item", "left_semi").select("item", "cnt")
