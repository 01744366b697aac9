"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark AND its oracle SQL on DuckDB at
the given sf dir, then compares row count, column names, and values
(order-insensitive, exact). Exit code 1 if anything mismatches.

Usage: python tools/check_oracle.py [sf_dir] [query ...]

STANDING GATES (run both before ending a round; record the tallies in
ROUND{N}.md):

    python tools/check_oracle.py /root/testdata/sf0.01   # driver SF
    python tools/check_oracle.py /root/testdata/sf0.1    # 10x scale

The sf0.1 sweep is the scale gate: same bit-exact hash comparison at
10x the driver's data (catches size-dependent nondeterminism — float
summation order, LIMIT ties, hash collisions — that sf0.01 can miss).
Takes ~15 min; named-subset runs print the FULL registry size as the
denominator (historical quirk) — only an unfiltered run's tally is a
sweep.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from analytics_etl_spark import get_spark  # noqa: E402
from analytics_etl_spark.queries import REGISTRY  # noqa: E402
from analytics_etl_spark.tables import TABLE_NAMES, table_path  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )

    spark = get_spark("oracle-check")
    failures = []
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"ok?  {name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            s = canon([tuple(r) for r in srows], scols)
            o = canon(orows, ocols)
            if s != o:
                ndiff = sum(1 for a, b in zip(s, o) if a != b)
                problems.append(f"values differ ({ndiff} of {len(s)} rows)")
                for a, b in list(zip(s, o))[:2000]:
                    if a != b:
                        problems.append(f"  spark : {a}\n  oracle: {b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    spark.stop()
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
