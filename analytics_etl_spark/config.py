"""Pipeline configuration — O2 in SURVEY.md §2.8.

The reference resolves env vars with fail-fast validation
(reference app/utils/config.py:38-114). The engine's config is a
plain dataclass: explicit, testable, no ambient state. Secrets and
token maps are out of engine scope.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from analytics_etl_spark.functions.datetime_fns import previous_month_range, validate_date_range


@dataclass(frozen=True)
class PipelineConfig:
    """Parameters of a pipeline run (reference entry point 3.2).

    start_date/end_date: inclusive ISO dates bounding the extract
    (reference START_DATE/END_DATE env, monthly_etl.py:66-78);
    location_filter: restrict to one location (LOCATION_FILTER,
    monthly_etl.py:81-104); test_limit: row cap in test mode
    (square_service.py:201-209); tz: row-level display timezone.
    """

    start_date: str
    end_date: str
    location_filter: int | None = None
    test_limit: int | None = None
    tz: str = "America/Chicago"
    sales_path: str | None = None
    denylist: tuple[str, ...] = field(
        default=("dine in", "to go", "free water")
    )

    def __post_init__(self) -> None:
        if not validate_date_range(self.start_date, self.end_date):
            raise ValueError(
                f"start_date {self.start_date!r} must be <= end_date {self.end_date!r}"
            )

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "PipelineConfig":
        """Resolve like the reference driver: env override else
        previous calendar month (monthly_etl.py:52-78)."""
        env = dict(os.environ if env is None else env)
        start, end = previous_month_range()
        loc = env.get("LOCATION_FILTER")
        return cls(
            start_date=env.get("START_DATE", start),
            end_date=env.get("END_DATE", end),
            location_filter=int(loc) if loc else None,
            test_limit=200 if env.get("TEST", "").lower() in ("1", "true") else None,
            sales_path=env.get("SALES_PATH"),
        )
