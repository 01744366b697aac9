"""Registry plumbing for the declared query surface."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from analytics_etl_spark.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    rows_only: str = ""  # reason the query is deliberately oracle-less


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = "", rows_only: str = ""):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under `name`.

    Every query carries an oracle OR an explicit ``rows_only`` reason —
    never silently neither (pinned by tests/test_queries_registry.py,
    so a stale driver artifact can't hide unevidenced queries).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if (oracle is None) == (not rows_only):
            raise ValueError(
                f"query {name!r} needs exactly one of: an oracle, or a rows_only reason"
            )
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or fn.__doc__ or "",
            rows_only=rows_only,
        )
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used by query definitions."""
    return load_table(spark, sf_dir, name)
