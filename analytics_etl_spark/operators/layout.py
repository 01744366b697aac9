"""Exact-integer Morton (z-order) key arithmetic.

The SINGLE bit-interleave implementation behind the engine's z-order
family: ``sinks/layout.py`` (the write path — equi-depth bucketing via
approxQuantile, measured footer-stat pruning in tests/test_layout.py)
delegates its interleave step here, and the oracle-paired
``zorder_key_orders`` query (queries/llm3.py) checks the arithmetic
itself hash-for-hash against DuckDB via the ``zorder_key_sql`` twin.

The split of responsibilities mirrors the heavy-hitters precedent: the
production write path uses float quantile boundaries (inherently
pytest-evidenced — approxQuantile is engine-specific), while THIS
module's exact-integer formulation (``quantize`` equal-width buckets +
masked shift/and/or interleave) is the family's hash-checked decision
arm — the two share the interleave, so the oracle exercises the same
bit arithmetic the sink writes with.

Everything here is exact integer arithmetic on non-negative masked
buckets (values < 2^bits), compiles to JVM expressions inside
whole-stage codegen — no UDF, no shuffle, engine-exact by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_TOTAL_BITS = 63  # z-key must fit a signed 64-bit long


def quantize(col: Column | str, lo: int, hi: int, bits: int) -> Column:
    """Map an integer-valued column from [lo, hi] into [0, 2^bits) by
    equal-width buckets, clamping out-of-range values to the edge
    buckets (a layout key must never reject rows — a clamped outlier
    just lands in the first/last bucket and costs only locality).

    Integer arithmetic throughout: (v - lo) * 2^bits / (hi - lo + 1)
    with BIGINT multiply-before-divide, exact in any engine.
    """
    if hi <= lo:
        raise ValueError(f"quantize needs hi > lo, got [{lo}, {hi}]")
    if not (1 <= bits <= 32):
        raise ValueError(f"quantize bits must be in [1, 32], got {bits}")
    span = hi - lo + 1
    # capacity guard: every intermediate below is bounded by
    # span * 2^bits, which must fit a signed long — otherwise the
    # multiply wraps (non-ANSI) or throws (ANSI) and the documented
    # clamping/exactness contracts silently break
    if span > ((1 << 63) - 1) >> bits:
        raise ValueError(
            f"span {span} * 2^{bits} exceeds a signed long — lower bits or "
            "narrow the [lo, hi] range"
        )
    c = F.col(col) if isinstance(col, str) else col
    # clamp BEFORE the multiply: an out-of-range value must land in an
    # edge bucket (the contract), and clamping first also keeps the
    # product inside the capacity bound above no matter the input
    c = F.greatest(F.lit(lo), F.least(F.lit(hi), c.cast("long")))
    x = (c - F.lit(lo)) * F.lit(1 << bits)
    # exact integer floor division: Spark's `/` is DOUBLE division,
    # which misrounds once x exceeds 2^53 — so take the float quotient
    # as a GUESS and correct it with exact long arithmetic (the guess
    # is within ±1 of the true floor, and q*span / (q+1)*span compare
    # exactly). Same trick as the fixed-point operators: floats may
    # propose, integers decide.
    q0 = F.floor(x / F.lit(span)).cast("long")
    q = (
        q0
        - F.when(q0 * F.lit(span) > x, F.lit(1)).otherwise(F.lit(0))
        + F.when((q0 + F.lit(1)) * F.lit(span) <= x, F.lit(1)).otherwise(F.lit(0))
    )
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q))


def zorder_key(cols: list[Column | str], bits: int = 12) -> Column:
    """Bit-interleave k bucketized dimensions into one Morton key.

    ``cols`` must already be non-negative integers < 2^bits (use
    ``quantize``); each input is masked to ``bits`` so a stray high
    bit can only cost locality, never corrupt neighbouring dimensions'
    bit positions. Bit i of dimension d lands at position i*k + d, so
    dimensions alternate from the least-significant bit up — the
    standard Morton layout where truncating the key from the top
    coarsens every dimension equally.

    Pure shift/and/or expression tree (2*k*bits leaf terms), evaluated
    inside whole-stage codegen; NULL in any dimension → NULL key
    (callers decide the null bucket, same stance as hash_bucket).
    """
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key needs >= 2 dimensions — one dimension is a plain sort")
    if k * bits > MAX_TOTAL_BITS:
        raise ValueError(
            f"{k} dims x {bits} bits = {k * bits} key bits > {MAX_TOTAL_BITS} "
            "(the key must fit a signed long); lower bits or drop a dimension"
        )
    mask = (1 << bits) - 1
    terms: list[Column] = []
    for d, col in enumerate(cols):
        c = (F.col(col) if isinstance(col, str) else col).cast("long").bitwiseAND(
            F.lit(mask)
        )
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * k + d))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key_sql(cols: list[str], bits: int = 12) -> str:
    """The ANSI-SQL twin of ``zorder_key`` for oracle construction —
    same masked shift/and arithmetic, generated term by term so the
    two engines compute literally the same integer expression.
    Safe because all inputs are masked non-negative (``>>``/``&``
    agree across engines only off the sign bit)."""
    k = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for d, col in enumerate(cols):
        masked = f"(CAST({col} AS BIGINT) & {mask})"
        for i in range(bits):
            terms.append(f"((({masked} >> {i}) & 1) << {i * k + d})")
    return "(" + "\n + ".join(terms) + ")"


