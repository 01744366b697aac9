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
