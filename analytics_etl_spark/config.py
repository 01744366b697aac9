"""Pipeline configuration — O2 in SURVEY.md §2.8.

The reference resolves env vars with fail-fast validation
(reference app/utils/config.py:38-114). The engine's config is a
plain dataclass: explicit, testable, no ambient state. Secret VALUES
stay out of the engine (ship them via your secret manager); the
token-map SHAPE — per-location credential with a default fallback and
fail-fast validation (config.py:89-152) — is `SourceAuth` below.
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


@dataclass(frozen=True)
class SourceAuth:
    """Per-location source credentials — the reference's token map
    (config.py:89-152: SQUARE_ACCESS_TOKEN + optional per-location
    overrides → LOCATION_TOKEN_MAP, default-token fallback, fail-fast
    when the default is absent).

    Only the SHAPE lives here; values arrive from env/secret manager.
    Tokens never appear in Spark plans or logs — `token_for` is called
    at transport level (the driver cursor walk / executor fetch).
    """

    default_token: str
    location_tokens: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.default_token:
            raise ValueError(
                "missing default source token (reference: SQUARE_ACCESS_TOKEN "
                "is required; per-location tokens are optional overrides)"
            )

    def token_for(self, location_id: str) -> str:
        """Location override if present, else the default — the
        reference's _get_headers_for_location (square_service.py:66-90)."""
        return self.location_tokens.get(location_id, self.default_token)

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None, prefix: str = "SOURCE_TOKEN") -> "SourceAuth":
        """Fail-fast resolution: `SOURCE_TOKEN` required, any
        `SOURCE_TOKEN_<LOCATION>` becomes a per-location override.
        The location key keeps its exact casing — lookups are
        case-sensitive, and silently normalizing here would make an
        override for location "L1" vanish into a key "l1" that
        token_for never matches (returning the default credential)."""
        env = dict(os.environ if env is None else env)
        default = env.get(prefix, "")
        overrides = {
            k[len(prefix) + 1 :]: v
            for k, v in env.items()
            if k.startswith(prefix + "_") and v
        }
        return cls(default_token=default, location_tokens=overrides)
