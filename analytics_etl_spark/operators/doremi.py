"""DoReMi-style iterative domain reweighting — the feedback-driven
step the static mixing family (temperature_mix_rates,
sample_budget_allocation) lacks.

Published method (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures
Speeds Up Language Model Pretraining"): run multiplicative-weights
updates on domain mixture weights driven by each domain's EXCESS loss
under a proxy model, then train on the AVERAGE of the per-round
weights. The engine formulation keeps the published shape — natural
distribution as the starting mixture, multiplicative update
proportional to excess loss, per-round re-normalization, final
across-round average — but makes every step exact integer arithmetic
so the result is deterministic and engine-portable (the BPE/Hamilton
stance: fixed-point integers where floats would be libm-dependent):

- weights live in parts-per-``budget`` (default ppm) and are
  re-normalized each round by HAMILTON (largest-remainder) rounding,
  so they sum to the budget EXACTLY every round;
- per-domain loss rates are integer micro-units
  (``sum_loss * SCALE // n_docs``);
- the update multiplier is the scale-invariant rational
  ``1 + eta * excess_d / mixture_rate`` applied as one integer
  product ``w_d * (eta_den * mix + eta_num * excess_d)`` — no
  exp(), no floats anywhere;
- DoReMi's uniform smoothing ``(1-c)*w + c*u`` runs as a second
  exact Hamilton pass, keeping every domain's weight positive.

Scale shape (the BPE pattern, the iterative-operator class): the
corpus is touched ONLY by the per-domain stats aggregation — ONE
map-side-combined groupBy emitting K = |domains| rows; the iteration
itself is K-sized driver arithmetic per round. At deployment the
loss table CHANGES between rounds (the proxy model is re-evaluated),
so ``doremi_reweight`` also accepts a per-round stats callback; with
a static frame the aggregation runs once. Registered rows-only
(iterative-fixpoint class, the bpe_learned_merges reason); an
independent pure-Python reference pin plus the exact-sum and
monotone-response properties live in tests/test_properties.py.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SCALE = 1_000_000


def _dkey(d):
    """Total order over domain labels INCLUDING None (hostile-data
    lesson, r13: a NULL lang/source is a real domain bucket in crawl
    data — None sorts first, everything else by value)."""
    return (d is not None, d if d is not None else "")


def hamilton_allocate(masses: dict[str, int], budget: int) -> dict[str, int]:
    """Largest-remainder (Hamilton) apportionment of ``budget`` seats
    proportional to non-negative integer ``masses`` — exact integer
    arithmetic, remainder ties broken by domain name ascending with
    None FIRST (a total order over labels including the NULL domain
    crawl data really contains, so the allocation hash-matches
    anywhere). The same
    method sample_budget_allocation ships SQL-side; this is the
    driver-side form the reweighting loop uses on K-sized state."""
    if not masses:
        raise ValueError("empty mass table")
    if any(m < 0 for m in masses.values()):
        raise ValueError("negative mass")
    total = sum(masses.values())
    if total == 0:
        raise ValueError("zero total mass")
    floor = {d: budget * m // total for d, m in masses.items()}
    leftover = budget - sum(floor.values())
    order = sorted(
        masses, key=lambda d: (-(budget * masses[d] % total), _dkey(d))
    )
    for d in order[:leftover]:
        floor[d] += 1
    return floor


def _validate_stats(stats: list[tuple[str, int, int]]) -> None:
    seen = set()
    for d, n, s in stats:
        if d in seen:
            raise ValueError(f"duplicate domain {d!r}")
        seen.add(d)
        if n <= 0 or s < 0:
            raise ValueError(f"bad stats row ({d!r}, {n}, {s})")


def _one_round(
    stats: list[tuple[str, int, int]],
    w: dict[str, int],
    budget: int,
    eta: tuple[int, int],
    smooth: tuple[int, int],
) -> dict[str, int]:
    """One multiplicative-weights round from weight vector ``w``:
    mixture rate = w-weighted mean of per-domain integer loss rates;
    excess_d = max(0, rate_d - mix); w_d *= (1 + eta*excess_d/mix);
    Hamilton re-normalize; uniform-smooth as a second Hamilton pass.
    A round with zero mixture rate (all losses zero) leaves weights
    unchanged — there is no signal to follow."""
    eta_num, eta_den = eta
    c_num, c_den = smooth
    k = len(stats)
    rate = {d: s * SCALE // n for d, n, s in stats}
    mix = sum(w[d] * rate[d] for d in w) // budget
    if mix > 0:
        w = hamilton_allocate(
            {
                d: w[d] * (eta_den * mix + eta_num * max(0, rate[d] - mix))
                for d in w
            },
            budget,
        )
    if c_num:
        w = hamilton_allocate(
            {d: (c_den - c_num) * w[d] * k + c_num * budget for d in w}, budget
        )
    return w


def doremi_mixture(
    stats: list[tuple[str, int, int]],
    rounds: int = 10,
    budget: int = SCALE,
    eta: tuple[int, int] = (1, 1),
    smooth: tuple[int, int] = (1, 50),
) -> tuple[dict[str, int], list[dict[str, int]]]:
    """The integer DoReMi core on K-sized state: ``stats`` rows are
    (domain, n_docs, sum_loss) with n_docs > 0 and sum_loss >= 0.
    Starts at the natural distribution (Hamilton over n_docs), runs
    ``rounds`` multiplicative-weights rounds against a STATIC loss
    table, and returns (final_weights, per_round_weights) where the
    final weights are the Hamilton-rounded across-round average
    (DoReMi's alpha-bar). Every dict sums to ``budget`` exactly."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    eta_num, eta_den = eta
    c_num, c_den = smooth
    if eta_num < 0 or eta_den <= 0 or not 0 <= c_num <= c_den:
        raise ValueError(f"bad eta/smooth: {eta}, {smooth}")
    _validate_stats(stats)
    w = hamilton_allocate({d: n for d, n, _ in stats}, budget)
    history: list[dict[str, int]] = []
    for _ in range(rounds):
        w = _one_round(stats, w, budget, eta, smooth)
        history.append(dict(w))
    final = hamilton_allocate(
        {d: sum(h[d] for h in history) for d in w}, budget
    )
    return final, history


def domain_loss_stats(
    losses: DataFrame,
    domain_col: str = "domain",
    loss_col: str = "loss",
) -> DataFrame:
    """Per-domain (domain, n_docs, sum_loss) from a per-document
    integer loss frame — the ONE corpus-sized pass of a reweighting
    round (map-side-combined groupBy; K rows cross the wire)."""
    return losses.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col(loss_col).cast("bigint")).cast("bigint").alias("sum_loss"),
    )


def doremi_reweight(
    stats: DataFrame | Callable[[int, dict[str, int]], DataFrame],
    rounds: int = 10,
    budget: int = SCALE,
    eta: tuple[int, int] = (1, 1),
    smooth: tuple[int, int] = (1, 50),
) -> DataFrame:
    """Run the reweighting loop against Spark-aggregated domain stats
    and return one row per domain: (domain, n_docs, weight0_ppm,
    weight_ppm) — the natural-distribution start and the final
    averaged DoReMi weight, both in parts-per-``budget`` (n_docs and
    the start refer to the FIRST round's stats).

    ``stats`` is either a static (domain, n_docs, sum_loss) frame
    (aggregated once — the registered-query shape) or a callback
    ``(round_idx, current_weights) -> stats frame`` re-evaluated per
    round (the deployment shape: the proxy model's loss table changes
    between rounds; domains must stay fixed across rounds). Every
    collect here is K = |domains| rows — index-sized by construction,
    the BPE collect policy."""
    static = not callable(stats)
    first = stats if static else stats(0, {})
    first_rows = [
        (r["domain"], int(r["n_docs"]), int(r["sum_loss"]))
        for r in first.collect()
    ]
    _validate_stats(first_rows)
    w0 = hamilton_allocate({d: n for d, n, _ in first_rows}, budget)
    if static:
        final, _ = doremi_mixture(
            first_rows, rounds=rounds, budget=budget, eta=eta, smooth=smooth
        )
    else:
        if rounds < 1:
            raise ValueError(f"rounds must be >= 1, got {rounds}")
        rows, w, history = first_rows, dict(w0), []
        for t in range(rounds):
            if t > 0:
                rows = [
                    (r["domain"], int(r["n_docs"]), int(r["sum_loss"]))
                    for r in stats(t, dict(w)).collect()
                ]
                _validate_stats(rows)
                if {d for d, _, _ in rows} != set(w):
                    raise ValueError("domain set changed between rounds")
            w = _one_round(rows, w, budget, eta, smooth)
            history.append(dict(w))
        final = hamilton_allocate(
            {d: sum(h[d] for h in history) for d in w}, budget
        )
    spark = first.sparkSession
    n_by_d = {d: n for d, n, _ in first_rows}
    out = [
        (d, int(n_by_d[d]), int(w0[d]), int(final[d]))
        for d in sorted(final, key=_dkey)
    ]
    return spark.createDataFrame(
        out,
        "domain string, n_docs bigint, weight0_ppm bigint, weight_ppm bigint",
    ).orderBy("domain")
