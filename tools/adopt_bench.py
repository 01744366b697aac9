"""Bench-battery adoption gate (VERDICT r13 item 4), standalone form.

``bench.py`` self-adopts a run into ``BENCH_FULL_latest.json`` only
when its code-stable controls — three sub-second (dedup_exact,
dataset_split, corpus_checksum) plus, since r15, one multi-second
(dedup_minhash_lsh, which rides the same 32-core contention the
heavy entries do and closes the sub-second envelope's blind spot to
uniform ambient drift) — sit within 110% of the committed binding
battery's medians (bench.CONTROLS_BINDING). The documented
host-contention signature is controls and heavy entries inflating
TOGETHER under ambient load, so quiet controls certify a comparable
battery and noisy controls convict the host, not the code. This tool
re-runs the same check standalone:

    python tools/adopt_bench.py                    # validate the tree's artifact
    python tools/adopt_bench.py BENCH_CANDIDATE.json          # adopt if quiet
    python tools/adopt_bench.py BENCH_CANDIDATE.json --force  # deliberate re-baseline

Exit 0 = adopted/valid, 1 = refused (controls outside the envelope).
--force exists for a deliberate re-baseline (e.g. a code change that
genuinely alters a control's plan) and should be accompanied by a
ROUND{N}.md note; it is never the path for "the host was busy".
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINDING = os.path.join(REPO, "BENCH_FULL_latest.json")
TOLERANCE = 1.10


def check(artifact: dict) -> list[str]:
    """Controls vs the CURRENT binding reference (bench.CONTROLS_
    BINDING — the code constant, not the artifact's own stamp, so
    validating a legitimately-adopted prior battery doesn't re-litigate
    the round that adopted it). A control absent from the artifact's
    noise_floor stamp falls back to its `queries` median (batteries
    adopted before a control was promoted still carry the timing).
    Returns the violations, empty = quiet."""
    sys.path.insert(0, REPO)
    from bench import CONTROLS_BINDING

    controls = artifact.get("noise_floor", {}).get("controls", {})
    queries = artifact.get("queries", {})
    problems = []
    if artifact.get("sf") != 0.1:
        # control medians are only comparable at the binding SF — a
        # quiet sf0.001 run would pass the 110% rule trivially
        problems.append(f"sf={artifact.get('sf')} != 0.1 (binding batteries are sf0.1)")
    for name, prev_median in CONTROLS_BINDING.items():
        if name == "round":
            continue
        got = controls.get(name, queries.get(name))
        if got is None:
            problems.append(f"{name}: missing from candidate controls")
        elif got > TOLERANCE * prev_median:
            problems.append(
                f"{name}: {got:.3f} > {TOLERANCE:.2f} x {prev_median:.3f} "
                f"(r{CONTROLS_BINDING.get('round', '?')} binding)"
            )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    candidate_path = args[0] if args else BINDING
    with open(candidate_path) as f:
        artifact = json.load(f)
    problems = check(artifact)
    verdict = "QUIET" if not problems else "NOISY"
    print(
        f"{verdict}: {candidate_path} "
        f"(total {artifact.get('value')}s, {len(artifact.get('queries', {}))} entries, "
        f"load {artifact.get('noise_floor', {}).get('load_avg_start')})"
    )
    for p in problems:
        print(f"  {p}")
    if os.path.abspath(candidate_path) == os.path.abspath(BINDING):
        # validation mode: report only (a dirty/loaded artifact in the
        # tree means a loaded run slipped past the gate — investigate)
        return 0 if not problems else 1
    if problems and not force:
        print("refused — re-run on a quiet host, or --force for a deliberate re-baseline")
        return 1
    shutil.copyfile(candidate_path, BINDING)
    print(f"adopted -> {BINDING}" + (" (FORCED)" if problems else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
