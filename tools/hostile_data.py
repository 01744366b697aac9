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
double-space tokens. All other tables are symlinked unchanged.

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

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
]


def build(out_dir: str, src_dir: str = "/root/testdata/sf0.001") -> str:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src_dir, f"{name}.parquet"), dst)
    con = duckdb.connect()
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
