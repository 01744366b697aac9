"""Query registry — the engine's declared operator coverage.

Every operator in SURVEY.md §2 (and each scale extension) registers a
named query here: a ``(spark, sf_dir) -> DataFrame`` callable plus,
where SQL-expressible, an equivalent DuckDB oracle SQL string. The
driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json).

Determinism rules every query follows (so the value-hash is stable):
- money math in DECIMAL (exact, associative ⇒ partition-order
  independent), cast to DOUBLE only in the final projection;
- LIMIT queries carry a total order (ties broken by unique keys);
- no floats compared at full precision across engines unless they are
  pass-through column values or derived via exact decimal paths.
"""

from analytics_etl_spark.queries.registry import REGISTRY, QuerySpec, query  # noqa: F401

# import for side effects: each module registers its queries
from analytics_etl_spark.queries import parity  # noqa: F401,E402
from analytics_etl_spark.queries import analytics  # noqa: F401,E402
from analytics_etl_spark.queries import analytics2  # noqa: F401,E402
from analytics_etl_spark.queries import llm  # noqa: F401,E402


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
