"""Z-order write layout — multi-dimensional data skipping.

Parquet scans prune files and row groups from min/max statistics, but
stats only help if the write layout makes them TIGHT. Sorting by one
column gives perfect pruning on that column and none on any other: in
a layout sorted by user_id, every file's (value_min, value_max) spans
the whole domain, so a `value BETWEEN ...` predicate reads every file.
At 100 TB, "the second predicate column reads everything" is the
difference between a 30-second and a 3-hour query.

Z-ordering (Morton order — the technique behind Delta Lake's
`OPTIMIZE ZORDER BY`, here as plain Spark expressions over plain
parquet) interleaves the bits of several columns into one sort key, so
files end up covering small HYPER-RECTANGLES of the combined key space:
every z-ordered column gets usefully tight min/max stats, at the cost
of none of them being perfectly clustered. With F files, a point/range
predicate on any one of k dims touches ~F^(1-1/k) files instead of F —
the right trade whenever queries filter on more than one column.

Mechanics, all JVM codegen (no UDFs):
1. per-column EQUI-DEPTH bucketing to `bits` bits: approxQuantile
   boundaries (an index-sized driver list — the same sampling
   repartitionByRange itself does) turned into the branch-free
   expression `bucket = Σ_t (col > t)`. Equi-depth is load-bearing:
   real columns are skewed (here `value` is log-normal-ish and
   user_id has few distinct values), and equi-width bucketing
   collapses most rows into a handful of buckets, which silently
   degrades the Morton key to a single-column sort.
2. bit-interleave the bucket ids into the Morton key (shift/or chain).
3. `repartitionByRange(z)` + `sortWithinPartitions(z)` → each output
   file owns one contiguous z-range.

tests/test_layout.py measures the actual effect on parquet footer
stats: probe predicates on EACH dim touch a fraction of z-ordered
files but ~all files of a single-column-sorted layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from analytics_etl_spark.operators.layout import zorder_key as interleave_buckets


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 6
) -> tuple[DataFrame, Column]:
    """Returns (df, morton_key_column) for `cols` (numeric/date/ts).

    One approxQuantile pass per column yields 2^bits-1 boundary
    scalars (driver-side, index-sized); the key itself is pure
    branch-free expressions over those literals: bucket = Σ_t (col>t),
    then the shared exact-integer bit interleave
    (operators/layout.py — the oracle-checked arithmetic).
    """
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    buckets: list[Column] = []
    for c in cols:
        boundaries = df.approxQuantile(c, probs, 1.0 / (4 * n_buckets))
        col = F.col(c).cast("double")
        b = F.lit(0).cast("long")
        for t0 in boundaries:
            b = b + (col > F.lit(float(t0))).cast("long")
        buckets.append(b)
    if len(buckets) == 1:
        # one column: the Morton key degenerates to the bucket itself
        # (a plain bucketed sort) — preserved sink behavior; the shared
        # interleave deliberately rejects k=1 at the operator level
        return df, buckets[0]
    return df, interleave_buckets(buckets, bits=bits)


def write_zordered(
    df: DataFrame, path: str, cols: list[str], bits: int = 6, files: int = 16
) -> None:
    """Write `df` as `files` parquet files, each owning a contiguous
    Morton-key range over `cols` — the layout pass an ingest pipeline
    runs once so that every later scan filtering on ANY of `cols`
    skips most of the table from footer stats alone."""
    base, z = zorder_key(df, cols, bits=bits)
    (
        base.withColumn("_z", z)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_sorted(df: DataFrame, path: str, col: str, files: int = 16) -> None:
    """Single-column range-sorted layout (the comparison baseline:
    perfect pruning on `col`, none on anything else)."""
    df.repartitionByRange(files, col).sortWithinPartitions(col).write.mode(
        "overwrite"
    ).parquet(path)
