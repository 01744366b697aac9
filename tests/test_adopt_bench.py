"""The bench adoption gate (tools/adopt_bench.py + bench.py's
self-adoption): quiet controls adopt, loaded-host controls refuse —
the executable form of the host-contention adjudication that r11-r13
did in prose while the driver's loaded re-runs kept dirtying the
tree."""

from __future__ import annotations

from bench import CONTROLS, CONTROLS_PREV_ROUND
from tools.adopt_bench import TOLERANCE, check


def _artifact(scale: float, sf: float = 0.1) -> dict:
    return {
        "value": 150.0,
        "queries": {},
        "sf": sf,
        "noise_floor": {
            "controls": {
                c: round(CONTROLS_PREV_ROUND[c] * scale, 3) for c in CONTROLS
            },
        },
    }


def test_quiet_run_passes():
    assert check(_artifact(1.0)) == []
    assert check(_artifact(1.05)) == []  # inside the 110% envelope


def test_loaded_run_refused_per_control():
    problems = check(_artifact(1.25))  # the documented contention signature
    assert len(problems) == len(CONTROLS)
    for c in CONTROLS:
        assert any(c in p for p in problems)


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
