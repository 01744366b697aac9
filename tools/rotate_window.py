"""Compute the next round's DRIVER_WINDOW rotation.

The policy (queries/__init__.py): the FIXED_CORE slots never move; the
remaining rotation slots (50 - len(FIXED_CORE)) go to the
LEAST-RECENTLY driver-checked oracle-paired queries, using the
CORRECTNESS_r{N}.json artifacts as the history.
This tool makes the policy mechanical: run it at the start of a round,
paste the printed tuple over ROTATION, update the pinned test if core
families changed (they shouldn't).

Usage: python tools/rotate_window.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, root)
    from analytics_etl_spark.queries import FIXED_CORE, REGISTRY

    # history: the most recent round in which each query had a USABLE
    # driver row. An `err` row carries no evidence (r6: the harness'
    # canonicalizer crashed on array columns before comparing anything),
    # so err-only queries stay at the front of the rotation queue until
    # they earn a real row — green OR red both count as "checked".
    last_checked: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                if isinstance(row, dict) and row.get("err"):
                    continue
                last_checked[name] = max(last_checked.get(name, -1), rnd)

    pool = [
        name
        for name, spec in REGISTRY.items()
        if spec.oracle is not None and name not in FIXED_CORE
    ]
    # least-recently checked first (never-checked = -1 wins), then by
    # name for a stable, reviewable ordering
    pool.sort(key=lambda n: (last_checked.get(n, -1), n))
    rotation = pool[: 50 - len(FIXED_CORE)]

    never = [n for n in rotation if n not in last_checked]
    print(f"# pool={len(pool)} oracle-paired non-core; {len(never)} never checked")
    print("ROTATION: tuple[str, ...] = (")
    for name in rotation:
        tag = "never" if n_last(last_checked, name) is None else f"r{last_checked[name]}"
        print(f'    "{name}",  # last driver row: {tag}')
    print(")")


def n_last(last_checked: dict[str, int], name: str):
    return last_checked.get(name)


if __name__ == "__main__":
    main()
