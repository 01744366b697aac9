"""Mergeable fixed-width value histograms — the QUANTILE member of the
sketch family (HLL distincts, Misra-Gries heavy hitters, Bloom
membership, CMS frequencies, and now value distributions).

Spark's approxQuantile is driver-side, non-mergeable, and
seed/partition dependent; the production answer for "p99 of order
value per day, maintainable as data arrives" is the same shape every
metrics store uses: bucket values into fixed-width bins at ingest,
SUM-merge bins across batches/partitions/days, and read any quantile
as a cumulative walk over the bin table. Exactness contract: the
returned quantile is the LOWER EDGE of the first bucket whose
cumulative count reaches q·total — error bounded by one bucket width,
deterministic in any engine (the bucket id is ONE IEEE divide +
floor; cumulative logic is pure int64). The bin table is
value-range/width-sized (thousands of rows for any real metric),
broadcastable, and NEVER touches raw history on read.

At 100 TB: build is one map-side-combined groupBy per batch; merge is
bin-keyed SUM (lossless — int64 addition — but NOT replay-idempotent,
so streaming maintenance runs under the same exactly-once
foreachBatch stance as the CMS table, declared at the merge);
quantile read is a window over the bin table only.

Reference parity: extends the reference's aggregate surface
(database_service.py MIN/MAX/COUNT shapes) with the distribution
summary its operational dashboards would need at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_bucket(value_col, width: int | float):
    """bucket = floor(value / width) as bigint — ONE double divide +
    floor, bit-identical across engines. Exact for integer inputs up
    to ~2^52 (an integer lands off its true bucket only if the
    rounded quotient crosses an integer, which for |v| < 2^52 and
    moderate widths requires v to BE the exact boundary — where the
    quotient is representable and floor is exact)."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.floor(c.cast("double") / F.lit(float(width))).cast("bigint")


def histogram_build(
    df: DataFrame,
    value_col: str,
    width: int | float,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group_cols..., bucket, cnt): fixed-width histogram of the
    non-NULL, finite values. One map-side-combined groupBy; output is
    range/width-sized per group."""
    c = F.col(value_col)
    d = c.cast("double")
    gated = df.filter(
        c.isNotNull()
        & ~F.isnan(d)
        & (d != F.lit(float("inf")))
        & (d != F.lit(float("-inf")))
    )
    return gated.groupBy(
        *group_cols, value_bucket(value_col, width).alias("bucket")
    ).agg(F.count("*").cast("bigint").alias("cnt"))


def histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bin-keyed SUM — lossless (incremental merges equal the one-shot
    histogram exactly; int64 addition is associative), NOT idempotent
    (a replayed batch double-counts — the CMS stance: run under
    exactly-once foreachBatch, the checkpoint is the epoch ledger)."""
    keys = [col for col in a.columns if col != "cnt"]
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: tuple[tuple[int, int], ...],
    width: int | float,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quantiles from the bin table alone: for each q = num/den (exact
    integers — no float threshold ever materializes), the smallest
    bucket whose cumulative count satisfies cum·den >= num·total —
    per GROUP when ``group_cols`` is set ("p99 of order value per
    day", the module's headline use case).

    Output (group_cols..., q_num, q_den, bucket, lo, total_n): ``lo``
    = bucket·width, the bucket's lower edge — the deterministic
    one-bucket-width answer. ``total_n`` is the GROUP's total, so a
    grouped read is self-describing. Grouped or not, read cost is
    bin-table-sized, never data-sized: the cumulative window
    partitions by the group columns (ungrouped = the one declared
    single-partition window, same stance as the perplexity tertile
    cut), and the per-group totals frame joins group-keyed with NO
    forced broadcast — |groups| can be per-user-sized at 100 TB, so
    the hint would be a driver OOM; AQE upgrades the join to
    broadcast at runtime whenever the totals actually are small.

    The bin table's columns must be EXACTLY group_cols + (bucket,
    cnt) — a grouped histogram handed to an ungrouped read (or a
    group column misspelled) raises instead of silently mixing
    groups into one global quantile."""
    expected = set(group_cols) | {"bucket", "cnt"}
    got = set(hist.columns)
    if got != expected or len(hist.columns) != len(expected):
        raise ValueError(
            f"histogram_quantiles: bin table columns {sorted(got)} != "
            f"expected {sorted(expected)} — pass group_cols matching "
            "histogram_build's, so grouped bins are never silently "
            "collapsed into a global quantile"
        )
    gcols = [F.col(g) for g in group_cols]
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        *gcols, "bucket", F.sum("cnt").over(w_cum).alias("cum")
    )
    spark = hist.sparkSession
    qdf = spark.createDataFrame(list(qs), "q_num int, q_den int")
    if group_cols:
        tot = hist.groupBy(*gcols).agg(
            F.sum("cnt").cast("bigint").alias("total_n")
        )
        joined = cum.join(tot, list(group_cols))
    else:
        tot = hist.agg(F.sum("cnt").cast("bigint").alias("total_n"))
        joined = cum.crossJoin(F.broadcast(tot))
    hit = (
        joined.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") * F.col("q_den") >= F.col("q_num") * F.col("total_n"))
        .groupBy(*gcols, "q_num", "q_den", "total_n")
        .agg(F.min("bucket").alias("bucket"))
    )
    return hit.select(
        *gcols,
        "q_num",
        "q_den",
        "bucket",
        (F.col("bucket") * F.lit(float(width))).alias("lo"),
        "total_n",
    )
