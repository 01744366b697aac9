"""String predicates & defaults — F7, F8, F10, F11 in SURVEY.md §2.5."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference denylist, IGNORED_ITEMS (etl_service.py:44-48).
DEFAULT_DENYLIST = ("dine in", "to go", "free water")

DAY_NAMES = (
    "Monday",
    "Tuesday",
    "Wednesday",
    "Thursday",
    "Friday",
    "Saturday",
    "Sunday",
)

MONTH_RE = r"^\d{4}-\d{2}$"


def contains_any(col: Column | str, needles: Iterable[str]) -> Column:
    """F7 — case-insensitive substring membership against a denylist.

    Reference lowercases and runs ``in`` per needle (etl_service.py:127-133).
    One JVM-side predicate; Catalyst folds the constants.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    pred = F.lit(False)
    for needle in needles:
        pred = pred | c.contains(needle.lower())
    return pred


def coalesce_default(col: Column | str, default: str) -> Column:
    """F8 — null/empty → default (reference `.get(k, default)` / `or 'N/A'`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == ""), F.lit(default)).otherwise(c)


def is_month_format(col: Column | str) -> Column:
    """F10 — 'YYYY-MM' format check (reference regex, etl_service.py:403)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(MONTH_RE)


def is_valid_day_name(col: Column | str) -> Column:
    """F11 — day-name whitelist (reference etl_service.py:408-410)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(*DAY_NAMES)


def canonicalize_text(col: Column | str) -> Column:
    """Dedup-grade text canonicalization: lowercase, strip everything
    but [a-z0-9], collapse whitespace runs, trim.

    Exact dedup on raw bytes misses the web's trivial variants —
    case, punctuation, whitespace/formatting churn (the same article
    re-rendered by two CMSes). Canonical-form hashing catches that
    whole class for the cost of three codegen string expressions,
    BEFORE the expensive near-dup machinery runs; at 100 TB every
    document removed here is one that never reaches shingling.
    Deliberately ASCII-scoped: [^a-z0-9] on lowered text is
    locale-independent and reproduces bit-identically in any engine
    (a Unicode-class form would hash differently per ICU version).
    """
    c = F.col(col) if isinstance(col, str) else col
    squashed = F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")
    return F.trim(squashed)


def strip_markup(col: Column | str) -> Column:
    """Web-text boilerplate removal, pure codegen: drop <script>/<style>
    blocks wholesale (their text content is never prose), strip
    remaining tags, decode the five core HTML entities, collapse
    whitespace. The first cleanup pass of any crawl pipeline — cheap
    enough to run inline at ingest, before language-id or quality
    scoring ever see the text. Regex-only by design (a full HTML5
    parser is a Python kernel this engine doesn't need for corpus
    text); pathological markup degrades to extra whitespace, never to
    dropped prose.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_blocks = F.regexp_replace(c, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    no_tags = F.regexp_replace(no_blocks, r"(?s)<[^>]+>", " ")
    decoded = no_tags
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]:
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(decoded, r"\s+", " "))
