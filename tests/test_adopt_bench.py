"""The bench adoption gate (tools/adopt_bench.py + bench.py's
self-adoption): quiet controls adopt, loaded-host controls refuse —
the executable form of the host-contention adjudication that r11-r13
did in prose while the driver's loaded re-runs kept dirtying the
tree."""

from __future__ import annotations

from bench import CONTROLS, CONTROLS_BINDING
from tools.adopt_bench import TOLERANCE, check

GATE = [c for c in CONTROLS_BINDING if c != "round"]


def _artifact(scale: float, sf: float = 0.1) -> dict:
    return {
        "value": 150.0,
        "queries": {},
        "sf": sf,
        "noise_floor": {
            "controls": {
                c: round(CONTROLS_BINDING[c] * scale, 3) for c in GATE
            },
        },
    }


def test_quiet_run_passes():
    assert check(_artifact(1.0)) == []
    assert check(_artifact(1.05)) == []  # inside the 110% envelope


def test_loaded_run_refused_per_control():
    problems = check(_artifact(1.25))  # the documented contention signature
    assert len(problems) == len(GATE)
    for c in GATE:
        assert any(c in p for p in problems)


def test_gate_includes_a_multisecond_control():
    """VERDICT r14 item 2: the r14 battery passed the gate with a
    uniform 1.155x drift because all three controls were ~0.2 s
    queries dominated by fixed overhead. The envelope must include at
    least one multi-second entry that rides the same 32-core
    contention the heavy entries do — while the NORMALIZATION basis
    (CONTROLS) stays the fixed sub-second trio."""
    heavy = [c for c in GATE if CONTROLS_BINDING[c] >= 1.0]
    assert "dedup_minhash_lsh" in heavy
    assert set(CONTROLS) < set(GATE)  # gate strictly wider than basis
    assert "dedup_minhash_lsh" not in CONTROLS  # basis unchanged


def test_uniform_15pct_drift_refused():
    """The exact r14 blind spot, synthesized: every control (including
    the multi-second one) inflated by a uniform 15% — the gate must
    refuse it."""
    problems = check(_artifact(1.15))
    assert problems, "a 15%-inflated battery must not adopt"
    assert any("dedup_minhash_lsh" in p for p in problems)


def test_control_falls_back_to_queries_map():
    """Batteries adopted before a control was promoted carry the
    timing only in `queries` — the gate reads it from there instead
    of calling the artifact malformed."""
    art = _artifact(1.0)
    del art["noise_floor"]["controls"]["dedup_minhash_lsh"]
    art["queries"]["dedup_minhash_lsh"] = CONTROLS_BINDING["dedup_minhash_lsh"]
    assert check(art) == []
    art["queries"]["dedup_minhash_lsh"] = round(
        CONTROLS_BINDING["dedup_minhash_lsh"] * 1.2, 3
    )
    assert any("dedup_minhash_lsh" in p for p in check(art))


def test_wrong_sf_refused_even_when_quiet():
    """A quiet run at a smaller SF has FASTER controls (it would pass
    the 110% rule trivially) but is not a binding battery."""
    assert any("sf=" in p for p in check(_artifact(0.5, sf=0.001)))


def test_missing_control_refused():
    art = _artifact(1.0)
    del art["noise_floor"]["controls"]["dedup_exact"]
    assert any("missing" in p for p in check(art))


def test_tolerance_is_the_verdict_rule():
    # VERDICT r13 item 4: refuse when controls exceed the prior
    # binding medians by >10%
    assert TOLERANCE == 1.10


def test_committed_artifact_is_quiet():
    """The tree's BENCH_FULL_latest.json must always be an adopted
    (quiet-host) battery — a loaded run sitting here means the gate
    was bypassed."""
    import json

    from tools.adopt_bench import BINDING

    with open(BINDING) as f:
        assert check(json.load(f)) == []
