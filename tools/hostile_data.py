"""Build a HOSTILE variant of a testdata SF dir: same tables, plus a
handful of adversarial document rows — the data shapes a 100 TB crawl
corpus WILL contain and the clean synthetic testdata never exercises.

Why this exists (r7): running the full oracle sweep against this dir
immediately found two latent bugs the clean sweeps could never catch —
an ANSI DIVIDE_BY_ZERO in text_quality_score on empty text (one empty
doc would abort an entire production scoring job) and a silent
Spark-vs-oracle divergence in multimodal_byte_histogram on non-ASCII
text (UTF-8 bytes vs codepoints). Both were exactly the class the r6
ADVICE found by hand in BM25 (zero-token docs skewing avgdl); this
tool makes that hunt mechanical.

The hostile rows: empty text, whitespace-only, NULL text, a single
word, non-ASCII (accents + CJK), extreme repetition, NULL lang/source,
double-space tokens — plus hostile EVENTS (NULL ts, NULL user, NULL /
empty event_type, NULL value, NaN, out-of-decimal-range value, NULL /
empty / malformed JSON props). The events batch found TEN more latent
divergences on its first run (r7): NULL-ts rows silently dropped by
Spark's window()/session_window but grouped by DuckDB's date_trunc;
NULL sort position (Spark NULLS FIRST vs DuckDB NULLS LAST) skewing
every windowed ranking; a NULL event_type aborting map_from_entries;
malformed JSON aborting parse_json on one side and ->> on the other;
DuckDB's TRY_CAST(NaN AS DECIMAL) raising instead of NULLing; and
Spark's floor(double) SATURATING to Long.MIN on huge values where
DuckDB floors to double — every one now pinned by an explicit
contract in both formulations. Round 8 added HOSTILE_EMBEDDINGS
(zero-norm, NULL vector/component, NaN/±Inf components, wrong
dimension, NULL label) — the one table the r7 sweep symlinked clean;
the similarity/ANN family now admits only scorable vectors (see the
validity contract in queries/llm.py). Remaining dimension tables are
symlinked unchanged.

Usage:
    python tools/hostile_data.py [out_dir] [src_sf_dir]   # build
    python tools/check_oracle.py <out_dir>                 # the sweep

STANDING GATE (per round): the full sweep against this dir must be as
green as against the clean dir — any divergence is a latent
data-dependent bug in one engine's formulation, never acceptable
drift. tests/test_hostile_data.py runs the document-centric subset in
CI; run the full sweep once per round.
"""

from __future__ import annotations

import os
import sys

HOSTILE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (9001, "", "en", "hostile", 0),
    (9002, "   ", "en", "hostile", 3),
    (9003, None, "en", "hostile", None),
    (9004, "word", "en", "hostile", 4),
    (9005, "ému naïve übermensch 漢字 emoji", "xx", "hostile", 30),
    (
        9006,
        " ".join(["dup"] * 22),
        "en",
        "hostile",
        87,
    ),
    (9007, "a b", None, None, 3),
    (9008, "x  y", "en", "hostile", 4),
]

HOSTILE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (9001, None, 5, "click", 1.0, '{"k": 1}'),
    (9002, "2024-01-15T12:00:00", None, "click", 2.0, '{"k": 2}'),
    (9003, "2024-01-15T12:00:00", 6, None, 3.0, '{"k": 3}'),
    (9004, "2024-01-15T12:00:00", 6, "", 4.0, "{}"),
    (9005, "2024-01-15T12:00:00", 7, "click", None, None),
    (9006, "2024-01-15T12:00:00", 7, "click", float("nan"), "not json"),
    (9007, "2024-01-15T12:00:00", 8, "click", -1e100, '{"k": -5}'),
]

# (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
#  o_orderpriority) — NULL join key, NULL/negative/NULL price, NULL
# date, NULL priority, dangling FK. Found four more NULL-position /
# NULL-group divergences in the windowed order analytics on first run.
HOSTILE_ORDERS_SQL = """
    (99001, NULL, 'O', 100.0, TIMESTAMP '1996-06-15', '3-MEDIUM'),
    (99002, 7, NULL, 200.0, TIMESTAMP '1996-06-15', '3-MEDIUM'),
    (99003, 7, 'O', NULL, TIMESTAMP '1996-06-15', '3-MEDIUM'),
    (99004, 7, 'O', -50.0, TIMESTAMP '1996-06-15', '3-MEDIUM'),
    (99005, 7, 'O', 300.0, NULL, '3-MEDIUM'),
    (99006, 7, 'O', 400.0, TIMESTAMP '1996-06-15', NULL),
    (99007, 999999999, 'O', 500.0, TIMESTAMP '1996-06-15', '1-URGENT')
"""

# NULL part/supp keys, NULL numerics, NULL flags, NULL shipdate,
# negative quantity/price + out-of-domain discount. Found sqrt-of-
# negative (DuckDB errors / Spark NaN) and NULL-key argmin tie
# divergences on first run.
HOSTILE_LINEITEM_SQL = """
    (99101, NULL, 3, 1, 5.0, 100.0, 0.05, 0.02, 'N', 'O', TIMESTAMP '1996-06-20'),
    (99102, 3, NULL, 1, 5.0, 100.0, 0.05, 0.02, 'N', 'O', TIMESTAMP '1996-06-20'),
    (99103, 3, 3, 1, NULL, NULL, NULL, NULL, 'N', 'O', TIMESTAMP '1996-06-20'),
    (99104, 3, 3, 1, 5.0, 100.0, 0.05, 0.02, NULL, NULL, TIMESTAMP '1996-06-20'),
    (99105, 3, 3, 1, 5.0, 100.0, 0.05, 0.02, 'N', 'O', NULL),
    (99106, 3, 3, 1, -5.0, -100.0, 1.5, 0.02, 'N', 'O', TIMESTAMP '1996-06-20')
"""

# Hostile embeddings (r8, VERDICT r7 lead item): every junk-vector
# shape a crawl-derived embedding table accumulates — zero-norm rows
# (failed encoder calls), NULL vectors and NULL components (schema
# drift), NaN/±Inf components (overflowed float16 exports), wrong
# dimensions (model-version mixes), and a NULL label. First run
# found: unguarded cosine 0.0/0.0 → NaN, ANSI element_at aborting
# sign_bucket on short vectors, ragged numpy batches crashing the
# hyperplane kernel, DuckDB list_dot_product erroring on NULL
# elements, Spark collect_list-vs-DuckDB list() NULL-element drift in
# the centroid fold, and the int8 path's floor(NaN) saturation vs
# DuckDB CAST(NaN) raise — all now pinned by the scorable-vector
# gate + per-column contracts in queries/llm.py.
_DIM = 64
HOSTILE_EMBEDDINGS = [
    # (vec_id, embedding, label)
    (9101, [0.0] * _DIM, 0),                                  # zero-norm
    (9102, None, 1),                                          # NULL vector
    (9103, [0.25] * 32 + [None] + [0.25] * 31, 0),            # NULL component
    (9104, [0.25] * 16 + [float("nan")] + [0.25] * 47, 1),    # NaN component
    (9105, [0.25] * 8 + [float("inf")] + [0.25] * 55, 0),     # +Inf component
    (9106, [0.25] * 4 + [float("-inf")] + [0.25] * 59, 1),    # -Inf component
    (9107, [1.0, -2.0], 0),                                   # too short
    (9108, [], 1),                                            # empty vector
    (9109, [0.5] * (_DIM + 8), 0),                            # too long
    (9110, [0.125] * _DIM, None),                             # NULL label
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
]


def build(out_dir: str, src_dir: str = "/root/testdata/sf0.001") -> str:
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src_dir, f"{name}.parquet"), dst)

    # events appended via pyarrow so the ts column keeps the source
    # file's exact physical timestamp type
    t = pq.read_table(os.path.join(src_dir, "events.parquet"))
    rows = [
        (
            i,
            None if ts is None else datetime.datetime.fromisoformat(ts),
            u, et, v, pr,
        )
        for i, ts, u, et, v, pr in HOSTILE_EVENTS
    ]
    extra = pa.table(
        {
            n: [r[j] for r in rows]
            for j, n in enumerate(
                ["event_id", "ts", "user_id", "event_type", "value", "props"]
            )
        },
        schema=pa.schema([f.remove_metadata() for f in t.schema]),
    )
    pq.write_table(
        pa.concat_tables([t.replace_schema_metadata(None), extra]),
        os.path.join(out_dir, "events.parquet"),
    )

    # embeddings appended via pyarrow so the list<float> element type
    # (and the NaN/Inf payloads SQL literals can't spell portably)
    # survive exactly
    et = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    extra_e = pa.table(
        {
            "vec_id": [r[0] for r in HOSTILE_EMBEDDINGS],
            "embedding": [r[1] for r in HOSTILE_EMBEDDINGS],
            "label": [r[2] for r in HOSTILE_EMBEDDINGS],
        },
        schema=pa.schema([f.remove_metadata() for f in et.schema]),
    )
    pq.write_table(
        pa.concat_tables([et.replace_schema_metadata(None), extra_e]),
        os.path.join(out_dir, "embeddings.parquet"),
    )

    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src_dir}/orders.parquet'
          UNION ALL
          SELECT * FROM (VALUES {HOSTILE_ORDERS_SQL})
            AS t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 o_orderdate, o_orderpriority)
        ) TO '{out_dir}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src_dir}/lineitem.parquet'
          UNION ALL
          SELECT * FROM (VALUES {HOSTILE_LINEITEM_SQL})
            AS t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus, l_shipdate)
        ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    values = ", ".join(
        "({}, {}, {}, {}, {})".format(
            i,
            "NULL" if t is None else "'" + t.replace("'", "''") + "'",
            "NULL" if lang is None else f"'{lang}'",
            "NULL" if srcv is None else f"'{srcv}'",
            "NULL" if n is None else n,
        )
        for i, t, lang, srcv, n in HOSTILE_DOCS
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src_dir}/documents.parquet'
          UNION ALL
          SELECT * FROM (VALUES {values})
            AS t(doc_id, text, lang, source, n_chars)
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostile_sf"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    print(build(out, src))
