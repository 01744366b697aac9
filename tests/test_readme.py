"""README's stated correctness contract must match the registry.

Round-1 lesson: hand-maintained counts rot (the README claimed 82/78
and 44/44 while the registry shipped 84/80). The counts now live in
one sentence that this test regenerates from the registry.
"""

from __future__ import annotations

import re

from analytics_etl_spark.queries import REGISTRY, oracle_sql


def test_readme_counts_match_registry():
    text = open("/root/repo/README.md").read()
    m = re.search(r"(\d+) named queries, (\d+) paired", text)
    assert m, "README lost its query-count sentence"
    assert (int(m.group(1)), int(m.group(2))) == (len(REGISTRY), len(oracle_sql()))

    m = re.search(r"check_oracle\.py /root/testdata/sf0\.01\s+# (\d+)/(\d+) vs DuckDB", text)
    assert m, "README lost its check_oracle line"
    n = len(REGISTRY)
    assert (int(m.group(1)), int(m.group(2))) == (n, n)
