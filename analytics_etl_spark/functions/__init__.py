"""Scalar / higher-order function library (SURVEY.md §2.5-2.6).

Everything is built-in Spark expressions — JVM-side, codegen-friendly.
No Python UDFs appear anywhere in the reference-parity surface.
"""

from analytics_etl_spark.functions.datetime_fns import (  # noqa: F401
    day_of_week_name,
    hour_of_day,
    month_str,
    parse_rfc3339,
    previous_month_range,
    time_of_day,
    to_local_time,
)
from analytics_etl_spark.functions.money import cents_to_dollars, money_amount  # noqa: F401
from analytics_etl_spark.functions.text import (  # noqa: F401
    coalesce_default,
    contains_any,
    is_month_format,
    is_valid_day_name,
)
from analytics_etl_spark.functions.arrays import join_paid_modifier_names  # noqa: F401
