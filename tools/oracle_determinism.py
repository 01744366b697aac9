"""Oracle DETERMINISM stress: run every registered oracle N times on
one DuckDB connection and diff sorted results across trials.

Why this gate exists (round 12): the events_dau oracle had been flaky
since ~r7 — DuckDB 1.0's parallel RANGE+INTERVAL window returned
run-to-run different frames when a NULL ordering key was present
(~1-in-3 executions), and `WHERE CAST(date_trunc(...) AS DATE) IS
NULL` misevaluated to zero rows. A green driver row against a flaky
oracle is luck, not evidence, and the driver runs oracle SQL on ITS
OWN DuckDB — so mitigations must live in the SQL itself, and this
tool is how a new oracle earns trust. Run it on the HOSTILE variant
(tools/hostile_data.py), where NULL/degenerate rows exercise the
paths clean data never hits.

Usage: python tools/oracle_determinism.py [sf_dir] [trials]
Exit 1 if any oracle produced two different result sets or errored.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from analytics_etl_spark.queries import REGISTRY  # noqa: E402
from analytics_etl_spark.tables import TABLE_NAMES, table_path  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostile_sf"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    flaky, errs, n_checked = [], [], 0
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            continue
        n_checked += 1
        try:
            base = sorted(map(repr, con.execute(spec.oracle).fetchall()))
            for _ in range(trials - 1):
                cur = sorted(map(repr, con.execute(spec.oracle).fetchall()))
                if cur != base:
                    flaky.append(name)
                    print(f"FLAKY {name}: trial differs from base")
                    break
        except Exception as e:  # noqa: BLE001 — report, don't die mid-sweep
            errs.append(name)
            print(f"ERROR {name}: {str(e)[:120]}")
    print(
        f"\n{n_checked - len(flaky) - len(errs)}/{n_checked} deterministic "
        f"over {trials} trials; flaky: {flaky}; errors: {errs}"
    )
    return 1 if (flaky or errs) else 0


if __name__ == "__main__":
    sys.exit(main())
