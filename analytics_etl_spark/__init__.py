"""analytics_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query & data-processing capabilities of the
reference ETL pipeline (rromero09/analytics-etl, studied read-only at
/root/reference), re-expressed Spark-first:

- the reference's row-loop ETL dataflow becomes lazy DataFrame chains
  optimized by Catalyst (see ``plans.pipeline``),
- its hand-placed optimizations (pushdown, batching, partition pruning)
  are delegated to Catalyst/Tungsten (SURVEY.md §4),
- its analytics SQL surface is generalized into an operator library
  (``operators``), and
- large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) are added as first-class
  components designed for 100 TB scale.

Everything here is public-knowledge PySpark; no proprietary systems.
"""

__version__ = "0.1.0"

from analytics_etl_spark.session import get_spark  # noqa: F401
from analytics_etl_spark.tables import load_tables  # noqa: F401
