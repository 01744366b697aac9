"""Paginated REST source — S1-S6 in SURVEY.md §2.1, as a Spark 4
Python DataSource.

The reference fetches completed orders from a REST search endpoint in
cursor pages of 100, sequentially, per location (reference
app/services/square_service.py:138-276, fan-out :317-360). The engine
models the same contract as a ``pyspark.sql.datasource.DataSource``:

- one InputPartition per (location, page-range) → pages fetch in
  PARALLEL across executors instead of a driver loop;
- ``pagination=cursor`` reproduces the reference's real opaque-cursor
  contract: a driver-side sequential walk (with retry/backoff)
  enumerates the signed page tokens, then one partition per token
  re-requests its page in parallel — see the cursor section below;
- the date-range/state predicates and the test-mode page cap are
  source options, i.e. pushed INTO the source exactly like the
  reference serializes them into the request body (S2/S3/S5);
- the transport is pluggable: this in-repo implementation generates
  deterministic synthetic pages (seeded by location/page) so tests
  run hermetically; a real deployment swaps `_fetch_page` for an
  HTTP call — the partition planning, option plumbing, and schema
  stay identical.

Register + read:

    spark.dataSource.register(RestOrdersDataSource)
    df = (spark.read.format("rest_orders")
          .option("locations", "L1,L2,L3")
          .option("start_date", "2025-11-01").option("end_date", "2025-11-30")
          .option("pages_per_location", "5").load())
"""

from __future__ import annotations

import datetime as _dt
import json
import random

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

ORDER_DDL = (
    "order_id string, location_id string, closed_at string, state string, "
    "line_items_json string"
)

PAGE_SIZE = 100  # reference page size (square_service.py:230)


def _fetch_page(location_id: str, page: int, start_date: str, end_date: str, state: str):
    """Deterministic synthetic 'page of orders' (the pluggable transport).

    Seeded by (location, page) so every executor/retry sees identical
    data — the property a cursor-paginated API gives you per page.
    """
    rng = random.Random(f"{location_id}:{page}")
    start = _dt.date.fromisoformat(start_date)
    span = max((_dt.date.fromisoformat(end_date) - start).days, 1)
    rows = []
    for i in range(PAGE_SIZE):
        day = start + _dt.timedelta(days=rng.randrange(span))
        ts = f"{day.isoformat()}T{rng.randrange(24):02d}:{rng.randrange(60):02d}:00Z"
        items = [
            {
                "name": rng.choice(["latte", "espresso", "dine in fee", "muffin"]),
                "quantity": str(rng.randrange(1, 4)),
                "base_price_money": {"amount": rng.randrange(0, 1500), "currency": "USD"},
            }
            for _ in range(rng.randrange(1, 4))
        ]
        rows.append(
            (
                f"{location_id}-p{page}-o{i}",
                location_id,
                ts,
                state,
                json.dumps(items),
            )
        )
    return rows


class _RestPartition(InputPartition):
    def __init__(self, location_id: str, page: int):
        self.location_id = location_id
        self.page = page


# --- cursor pagination (the reference's REAL contract) -----------------
#
# The reference walks an OPAQUE cursor sequentially: request → response
# carries `cursor` → next request echoes it → absent cursor ends the
# walk (square_service.py:233-254). That gives no random access, so the
# page-index fan-out above is only valid for APIs with offset
# pagination. The cursor mode reproduces the real contract:
#
# 1. a DRIVER-SIDE sequential walk follows the cursor chain once and
#    records every page token (the only way to learn them);
# 2. one InputPartition per recorded token — executors then re-request
#    their page BY TOKEN in parallel (stored cursors are random access);
# 3. both the walk and the per-partition fetch retry with exponential
#    backoff (the engine analogue of the reference's per-request error
#    handling + SquareAPIError, square_service.py:236-270).
#
# The walk fetches page bodies it then discards; if the API supports a
# fields/limit probe the walk is metadata-cheap, and if not, the
# landing-zone pattern (walk once, spill raw pages to files, point
# spark.read at the landing dir) trades the refetch for local IO. Both
# end in the same place: parallel decode/transform on executors.


def _with_retries(fn, attempts: int = 3, backoff: float = 0.05):
    """Call fn(); on transient failure retry with exponential backoff.

    Mirrors the reference's request error wrapping — the last error
    propagates (the reference raises SquareAPIError; Spark task retry
    is the outer layer on a cluster).
    """
    import time

    last = None
    for i in range(attempts):
        try:
            return fn()
        except TransientAPIError as e:  # noqa: PERF203
            last = e
            if i < attempts - 1:
                time.sleep(backoff * (2**i))
    raise last


class TransientAPIError(Exception):
    """Retryable transport failure (HTTP 429/5xx/timeout analogue)."""


class AuthError(Exception):
    """Non-retryable credential failure (HTTP 401/403 analogue) —
    deliberately NOT caught by _with_retries: retrying a bad token
    hammers the API for nothing; fail fast like the reference's
    config validation (config.py:118-124)."""


class SyntheticCursorTransport:
    """Opaque-cursor transport over the synthetic page generator.

    Tokens are SIGNED, not enumerable: ``page|md5(loc:page:salt)`` —
    the 'server' (this class) validates the signature, so a client can
    only obtain valid cursors from previous responses, exactly like a
    real cursor API. Stateless, so it pickles cleanly to executors.

    ``auth`` (a config.SourceAuth) reproduces the reference's
    per-location token map: each request carries the location's token
    (square_service.py:66-90); the synthetic server accepts any
    non-empty bearer and 401s an empty one.
    """

    def __init__(self, pages_per_location: int = 3, auth=None):
        self.pages = pages_per_location
        self.auth = auth

    @staticmethod
    def _sign(location_id: str, page: int) -> str:
        import hashlib

        mac = hashlib.md5(f"{location_id}:{page}:rest-cursor-salt".encode()).hexdigest()[:12]
        return f"{page}|{mac}"

    def _decode(self, location_id: str, cursor: str) -> int:
        page_s, _, mac = cursor.partition("|")
        if self._sign(location_id, int(page_s)) != cursor or not mac:
            raise ValueError(f"invalid cursor for {location_id}: {cursor!r}")
        return int(page_s)

    def fetch(
        self,
        location_id: str,
        cursor: str | None,
        start_date: str,
        end_date: str,
        state: str,
    ):
        """One request: (rows, next_cursor). next_cursor=None ends."""
        if self.auth is not None and not self.auth.token_for(location_id):
            raise AuthError(f"401 for location {location_id}: empty bearer token")
        page = 0 if cursor is None else self._decode(location_id, cursor)
        rows = _fetch_page(location_id, page, start_date, end_date, state)
        nxt = self._sign(location_id, page + 1) if page + 1 < self.pages else None
        return rows, nxt


def walk_cursors(
    transport,
    location_id: str,
    start_date: str,
    end_date: str,
    state: str,
    max_pages: int | None = None,
    attempts: int = 3,
) -> list[str | None]:
    """Driver-side sequential cursor walk → the page-token list.

    Returns [None, c1, c2, ...]: one entry per page, each learned from
    the previous response — the sequential dependency a cursor API
    imposes lives HERE and only here; everything downstream is
    parallel.
    """
    tokens: list[str | None] = []
    cursor: str | None = None
    while True:
        tokens.append(cursor)
        _, cursor = _with_retries(
            lambda c=cursor: transport.fetch(location_id, c, start_date, end_date, state),
            attempts=attempts,
        )
        if cursor is None or (max_pages is not None and len(tokens) >= max_pages):
            return tokens


class _CursorPartition(InputPartition):
    def __init__(self, location_id: str, cursor: str | None):
        self.location_id = location_id
        self.cursor = cursor


class RestOrdersReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.options = options
        self.locations = [
            s for s in options.get("locations", "L1").split(",") if s
        ]
        self.start_date = options.get("start_date", "2025-11-01")
        self.end_date = options.get("end_date", "2025-11-30")
        self.state = options.get("state", "COMPLETED")
        pages = int(options.get("pages_per_location", "3"))
        # S5: test mode caps pagination at 2 pages (reference
        # square_service.py:201-209)
        if options.get("test", "false").lower() == "true":
            pages = min(pages, 2)
        self.pages = pages
        # pagination=cursor reproduces the reference's opaque-cursor
        # contract; index (default) is the offset-API fast path.
        self.pagination = options.get("pagination", "index")
        if self.pagination == "cursor":
            self.transport = SyntheticCursorTransport(pages_per_location=self.pages)

    def partitions(self):
        if self.pagination == "cursor":
            # driver-side sequential walk per location enumerates the
            # opaque tokens; the fan-out below is then parallel again.
            return [
                _CursorPartition(loc, cur)
                for loc in self.locations
                for cur in walk_cursors(
                    self.transport,
                    loc,
                    self.start_date,
                    self.end_date,
                    self.state,
                    max_pages=self.pages,
                )
            ]
        # S6: locations × pages fan-out — parallel, not a driver loop.
        return [
            _RestPartition(loc, page)
            for loc in self.locations
            for page in range(self.pages)
        ]

    def read(self, partition):
        if isinstance(partition, _CursorPartition):
            rows, _ = _with_retries(
                lambda: self.transport.fetch(
                    partition.location_id,
                    partition.cursor,
                    self.start_date,
                    self.end_date,
                    self.state,
                )
            )
            yield from rows
            return
        yield from _fetch_page(
            partition.location_id,
            partition.page,
            self.start_date,
            self.end_date,
            self.state,
        )


class RestOrdersDataSource(DataSource):
    """format("rest_orders") — paginated order-search source."""

    @classmethod
    def name(cls) -> str:
        return "rest_orders"

    def schema(self) -> str:
        return ORDER_DDL

    def reader(self, schema: StructType) -> RestOrdersReader:
        return RestOrdersReader(schema, self.options)


def register_rest_source(spark) -> None:
    """Register the source AND ship this package to the Python workers.

    Unlike closures (shipped by value), a DataSource CLASS is pickled
    by module reference — workers must be able to import
    ``analytics_etl_spark``. On a cluster that's a --py-files deploy;
    here we addPyFile a zip of the package so registration works no
    matter what cwd/sys.path the host session has.
    """
    import os
    import shutil
    import tempfile

    import analytics_etl_spark

    pkg_dir = os.path.dirname(os.path.abspath(analytics_etl_spark.__file__))
    zip_base = os.path.join(tempfile.gettempdir(), "analytics_etl_spark_pkg")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    ):
        shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir), "analytics_etl_spark")
    spark.sparkContext.addPyFile(zip_path)
    spark.dataSource.register(RestOrdersDataSource)
