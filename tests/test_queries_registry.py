"""Registry contract smoke: every declared query runs at sf0.001.

Value-level correctness is covered by tools/check_oracle.py (and the
driver's own DuckDB gate); here we assert the contract shape cheaply.
"""

from __future__ import annotations

import pytest

from analytics_etl_spark.queries import REGISTRY, oracle_sql, queries

SF = "/root/testdata/sf0.001"


def test_registry_shape():
    qs, os_ = queries(), oracle_sql()
    # EXACT pins (VERDICT r9 item 3): a silently dropped or
    # deregistered query family must fail the suite, not shrink the
    # denominator. Update both numbers INTENTIONALLY, in the same
    # commit that changes the registry.
    assert len(qs) == 210, f"registry count changed: {len(qs)}"
    assert set(os_) <= set(qs)
    # the rows-only set, pinned BY NAME with its declared reason
    # category (VERDICT r12 item 4) — the set cannot silently grow,
    # and each member's registered reason must still claim the
    # category pinned here. History: simhash left in r6 (non-negative
    # 60-bit hashes made the bit ops portable); BPE gained
    # bpe_apply_tokens in r9; exact greedy packing left in r10
    # (recursive-CTE oracle); semantic dedup gained the hash-checked
    # dedup_semantic_knn_graph arm in r12; heavy hitters gained the
    # exact oracle-paired sibling heavy_hitters_parts_exact in r13;
    # r15 CONVERTED doremi_domain_weights to oracle-paired (fixed
    # round count + static stats = unrollable, not a fixpoint) and
    # gave the heavy-hitter family the hash-checked guarantee arm
    # (heavy_hitters_guaranteed) — the raw MG counters stay rows-only
    # because ANY est-threshold projection is ambiguous for items in
    # the (n/(k+1), 2n/(k+1)] band (r15 audit, ROUND15.md).
    ROWS_ONLY_REASONS = {
        # engine-specific sketch estimates (no cross-engine exact value)
        "approx_distinct_buyers": "sketch",
        "approx_distinct_sketch_union": "engine-specific",
        "table_profile_sketch": "engine-specific",
        # decision arm: quantiles_exact, oracle-paired on the same
        # frame/grouping (the r13 heavy-hitters pattern)
        "quantiles_approx": "sketch",
        # partition/stream-order dependent counters (decision arms:
        # heavy_hitters_parts_exact + heavy_hitters_guaranteed, both
        # oracle-paired)
        "heavy_hitters_parts": "partition/stream-order",
        # iterative fixpoints DuckDB SQL cannot express
        "bpe_learned_merges": "fixpoint",
        # k-means float means are not bit-stable across engines
        # (decision arm: dedup_semantic_knn_graph, oracle-paired)
        "dedup_semantic": "k-means",
        "dedup_semantic_cc": "k-means",
        "dedup_semantic_incremental": "k-means",
        "similarity_ann_ivf": "centroids are float MEANS",
        "similarity_ann_ivfpq_persisted": "float-codebook",
        "similarity_ann_pq": "float MEANS",
        "similarity_ann_pq_rerank": "float-codebook",
        # environment-hermetic surfaces DuckDB cannot see
        "rest_source_scan": "synthetic REST",
        "source_file_census": "file identity",
    }
    rows_only = set(qs) - set(os_)
    assert rows_only == set(ROWS_ONLY_REASONS), (
        f"rows-only set changed: +{rows_only - set(ROWS_ONLY_REASONS)} "
        f"-{set(ROWS_ONLY_REASONS) - rows_only}"
    )
    for name, category in ROWS_ONLY_REASONS.items():
        assert category.lower() in (REGISTRY[name].rows_only or "").lower(), (
            f"{name}: declared reason no longer claims '{category}'"
        )


def test_driver_window_is_curated_and_pinned():
    """The external harness compares only the FIRST 50 entries of
    queries(). Round 2's lesson: module import order silently decided
    which operators got correctness evidence, and three previously-green
    queries fell out of the window. Round 5 adds ROTATION (VERDICT r4
    item 2): fixed-core slots never leave; the rest rotate each
    round through the least-recently-driver-checked oracle-paired
    queries, so the whole registry earns driver rows over ~4 rounds.
    Round 6 shrank the core 32 -> 10 (VERDICT r5 item 1): after five
    all-green rounds the wide core was low-information — every member
    had multiple driver rows while 56 oracle-paired queries had none.
    This test pins size, core membership, and the rotation rules."""
    from analytics_etl_spark.queries import DRIVER_WINDOW, FIXED_CORE, ROTATION

    assert len(FIXED_CORE) == 10
    assert len(ROTATION) == 40
    assert DRIVER_WINDOW == FIXED_CORE + ROTATION
    assert len(set(DRIVER_WINDOW)) == 50
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    # dict insertion order of queries() must lead with the window
    assert tuple(queries())[:50] == DRIVER_WINDOW
    # the fixed core: the flagship + one representative per parity
    # cluster and per major LLM family — these names may NEVER leave
    # (each is its cluster's standing driver evidence)
    assert FIXED_CORE == (
        "flagship_monthly_revenue",   # join+agg flagship
        "month_window_scan",          # pushed-predicate scan
        "recent_sales_topk",          # top-K / sort pushdown
        "quarantine_rejects",         # error quarantine
        "constraint_validation",      # validation / regex / set membership
        "modifier_rollup",            # explode + array HOFs
        "date_parts",                 # datetime functions
        "dedup_minhash_lsh",          # dedup family
        "similarity_topk_cosine",     # similarity family
        "token_budget_packing",       # text/chunking family
    )
    # rotation slots must be ORACLE-PAIRED (a rows-only query would
    # burn its slot on an err:no_oracle row — the r4 lesson from
    # similarity_ann_ivf) ... and so must the core
    rows_only_in_window = [n for n in DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert rows_only_in_window == []


def test_driver_window_has_only_scalar_columns(spark):
    """r6 driver lesson: the harness canonicalizes results with pandas
    sort_values/factorize, which raises `TypeError: unhashable type:
    'list'` on any top-level array/map cell — an array-returning window
    query can NEVER earn a green driver row (r6: array_functions_pack,
    map_event_type_counts, packed_examples all went `err` with right
    answers). Standing guard: every DRIVER_WINDOW query must project
    complex payloads to scalars (array_join / to_json) in its final
    select. Schema analysis only — nothing executes."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from analytics_etl_spark.queries import DRIVER_WINDOW

    bad = []
    for name in DRIVER_WINDOW:
        for f in REGISTRY[name].fn(spark, SF).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"non-scalar top-level columns in driver window: {bad}"


def test_every_query_is_oracle_paired_or_declared_rows_only():
    """The round-1 lesson: a stale driver artifact hid 34 unevidenced
    queries. The registry itself now refuses silent gaps — every entry
    carries an oracle or an explicit rows-only REASON, never neither
    (also enforced at registration time by queries/registry.py)."""
    for spec in REGISTRY.values():
        assert (spec.oracle is None) != (not spec.rows_only), spec.name
        if spec.rows_only:
            assert len(spec.rows_only) > 10, f"{spec.name}: reason too thin"


def test_all_oracle_sql_executes_in_duckdb():
    """Every oracle string must actually run against the sf0.001
    parquet in DuckDB (cheap, no Spark) — so SQL rot is caught in CI,
    not in the driver's correctness gate."""
    import duckdb

    from analytics_etl_spark.tables import TABLE_NAMES, table_path

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(SF, name)}'"
        )
    for name, sql in oracle_sql().items():
        cols = [d[0] for d in con.execute(sql).description]
        assert cols, name


# The complete set of queries allowed to carry Python eval nodes: the
# Arrow text kernels (shingling and its dependents: minhash/LSH,
# n-gram jaccard, simhash, contamination, the corpus builds, phrase
# search), winnowing/repetition kernels, chunking/packing, and the
# declared-sequential exact packer. Everything else must stay 100%
# JVM — enforced per query below. Deployment note: the shingle-based
# entries run Python ONLY in their inline oracle-comparable form; the
# persisted-column paths (shingles_col=...) are plan-asserted
# Python-free in their own tests.
PYTHON_KERNEL_OK = {
    "benchmark_contamination",
    "corpus_build_pipeline",
    "corpus_build_bucket_gated",  # composes corpus_build's declared kernels
    "corpus_build_ppl_gated",  # composes corpus_build's declared kernels
    "corpus_build_classifier_gated",  # composes corpus_build's declared kernels
    "corpus_build_paradedup",  # composes corpus_build's declared kernels
    "corpus_filter_pipeline",
    "corpus_refresh_pipeline",  # composes the same declared shingle kernels
    "corpus_refresh_clustered",  # same kernels + the nightly LSH shingling
    "dedup_incremental_batch",
    "dedup_minhash_lsh",
    "dedup_ngram_containment",
    "dedup_ngram_jaccard",
    "dedup_semantic",  # k-means cell assignment is the declared Arrow matmul
    "dedup_semantic_cc",  # same Arrow assignment kernel, CC resolution
    "dedup_semantic_incremental",  # same Arrow assignment kernel, batch side
    "dedup_simhash",
    "doc_fingerprint_winnow",
    "heavy_hitters_parts",
    "docs_chunked_overlap",
    "multimodal_byte_histogram",
    "packed_examples",
    "packed_examples_exact",
    "knn_join_hyperplane",  # same Arrow signature matmul as similarity_ann_hyperplane, join-shaped
    "similarity_ann_hyperplane",
    "similarity_ann_ivf",
    "similarity_ann_pq",  # inline PQ encode kernel (persisted-codes path is plan-asserted Python-free in test_pq.py)
    "similarity_ann_pq_rerank",
    "text_repetition_metrics",
    "text_search_phrase",
    "token_budget_packing",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    assert df.columns  # non-empty schema
    assert df.count() >= 0
    # global plan hygiene: no query may compile to an unbounded
    # cartesian — every intentional cross join in the engine rides a
    # broadcast 1-row/dim frame (BroadcastNestedLoopJoin), so a bare
    # CartesianProduct is always an accident that explodes at scale
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, name
    # second global rule: Python in a query plan is opt-in, not drift.
    # Only the declared Arrow-kernel queries (text shingling/chunking,
    # winnowing, the sequential exact packer, multimodal decode) may
    # carry Python eval nodes; anything else sprouting one is a hot-path
    # regression (the round-N promise: no row-at-a-time UDFs anywhere,
    # and pandas kernels only where JVM expressions genuinely can't).
    if name not in PYTHON_KERNEL_OK:
        assert (
            "ArrowEvalPython" not in plan
            and "BatchEvalPython" not in plan
            and "FlatMapGroupsInPandas" not in plan
            and "MapInPandas" not in plan
        ), f"{name}: unexpected Python eval node in plan"


def test_oracle_types_match_spark_types(spark):
    """Type parity for EVERY oracle pair — the round-1 red row was a
    DuckDB HUGEINT vs Spark BIGINT mismatch invisible to value
    comparison (the driver hashes typed values). Schema analysis only:
    neither engine executes anything here."""
    import duckdb

    from analytics_etl_spark.tables import TABLE_NAMES, table_path

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{table_path(SF, name)}'")

    duck_map = {
        "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
        "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str", "BOOLEAN": "bool",
        "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "DATE": "date",
        "VARCHAR[]": "array<str>",
        "BIGINT[]": "array<i64>",
        "INTEGER[]": "array<i32>",
        "DOUBLE[]": "array<f64>",
    }
    spark_map = {
        "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
        "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
        "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
        "array<string>": "array<str>",
        "array<bigint>": "array<i64>",
        "array<int>": "array<i32>",
        "array<double>": "array<f64>",
    }
    bad = []
    for name, spec in sorted(REGISTRY.items()):
        if not spec.oracle:
            continue
        rel = con.sql(spec.oracle)
        dd = dict(zip(rel.columns, [duck_map.get(str(t).upper(), str(t)) for t in rel.types]))
        ss = {
            f.name: spark_map.get(f.dataType.simpleString(), f.dataType.simpleString())
            for f in spec.fn(spark, SF).schema.fields
        }
        if set(dd) != set(ss):
            bad.append((name, "columns", sorted(set(dd) ^ set(ss))))
            continue
        bad.extend((name, c, f"duck={dd[c]} spark={ss[c]}") for c in dd if dd[c] != ss[c])
    assert not bad, bad


def test_bench_headline_names_are_registered():
    """bench.py's HEADLINE list must reference real registry entries —
    a typo would silently drop a family from the per-round numbers."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing


def test_rotate_window_tool_produces_valid_rotation(tmp_path):
    """tools/rotate_window.py must emit 18 oracle-paired, non-core,
    registered names — the r6 rotation is machine-generated, so the
    generator itself is under test."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/rotate_window.py", "/root/repo"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    import re

    from analytics_etl_spark.queries import FIXED_CORE

    names = re.findall(r'^\s+"([a-z0-9_]+)",', out.stdout, re.M)
    assert len(names) == 50 - len(FIXED_CORE), out.stdout
    for n in names:
        assert n in REGISTRY and REGISTRY[n].oracle is not None
        assert n not in FIXED_CORE
