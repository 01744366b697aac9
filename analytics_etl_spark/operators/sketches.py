"""Mergeable sketches — incremental distinct counts at 100 TB.

COUNT(DISTINCT user) over a petabyte re-scans everything on every
refresh. The at-scale pattern (reference analog: the nightly rollup in
`/root/reference/monthly_etl.py`, which re-aggregates from raw rows each
run) is to pay the scan ONCE per ingest partition and persist a
fixed-size *mergeable* sketch per (group, day); any later rollup —
month, quarter, ad-hoc date range — unions kilobyte sketches instead of
re-reading terabytes of raw rows.

Spark 3.5+ ships Apache DataSketches HLL natively
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), all
JVM-side codegen aggregates. Two properties make this deployable:

* **Lossless union at equal precision**: HLL union is register-wise
  max, so `estimate(union(daily sketches)) == estimate(direct sketch
  over the whole range)` EXACTLY — pinned by
  `tests/test_sketches.py::test_union_equals_direct`. The incremental
  path is not an approximation OF the batch path; it IS the batch path.
* **Bounded error vs exact**: relative standard error ≈ 1.04/√(2^lg_k)
  (~1.6% at lg_k=12); tolerance vs exact COUNT(DISTINCT) asserted in
  the same test.

Estimates are engine-specific (DuckDB's approx_count_distinct uses a
different HLL construction), so sketch queries register rows_only; the
mergeability + tolerance pins above are the correctness evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 4 KiB per sketch, ~1.6% RSE — the DataSketches default


def group_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch per group — the ingest-time pass.

    This is the expensive scan you pay once per arriving partition; the
    output is group-cardinality-sized (KBs per row), the thing you
    persist next to the rollup table. Single shuffle on the group key,
    map-side partial sketches combine before the exchange (ObjectHashAgg
    partial_merge), so the shuffle moves sketches, not raw rows.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias(sketch_col)
    )


def union_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grouping and estimate.

    Union is register-wise max: exact w.r.t. the direct sketch at equal
    lg_k, and reorder/repartition-invariant. The scan here is the sketch
    table (KBs per fine-grained group), never the raw fact table —
    that's the entire point at 100 TB.
    """
    # allowDifferentLgConfigK=False: the lossless-union guarantee holds
    # only at EQUAL precision — a stray sketch written at another lg_k
    # must raise here, not silently degrade every estimate it touches
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(False))
        ).cast("long").alias(estimate_col)
    )


def distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Direct one-shot estimate over raw rows (the non-incremental form).

    Exists mostly as the equality baseline for union_rollup — and as the
    cheap alternative to exact COUNT(DISTINCT) when a single pass is
    acceptable: one shuffle of fixed-size partial sketches instead of a
    shuffle of every distinct value (the exact form's cost at scale).
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k))
        ).cast("long").alias(estimate_col)
    )
