"""Dump every rows-only registered query's exact output to JSON for
old-vs-new bit-identity diffs (r17 verification harness).

usage: python tools/dump_rows_only.py <sf_dir> <out.json> [names...]

Rows are collected, converted with repr (doubles keep full precision
via repr of float), sorted, and hashed; the JSON holds both the sorted
rows and a sha256 per query so diffs are trivial.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analytics_etl_spark import get_spark  # noqa: E402


def main():
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    only = sys.argv[3:] or None
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from analytics_etl_spark.queries import REGISTRY

    names = [n for n, s in REGISTRY.items() if not s.oracle]
    if only:
        names = [n for n in names if n in only]
    out = {}
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        rows = sorted(repr(tuple(r)) for r in df.collect())
        h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
        out[name] = {"n": len(rows), "sha256": h, "rows": rows}
        print(f"{name}: {len(rows)} rows {h[:16]}", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
