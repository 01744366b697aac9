"""Raw media ingest via the binaryFile source (sources/binary.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from analytics_etl_spark.sources.binary import (
    ingest_media,
    read_binary_files,
    write_media_table,
)


def _make_files(root) -> dict[str, bytes]:
    files = {
        "a/img1.jpg": b"\xff\xd8\xff" + b"j" * 100,
        "a/img2.png": b"\x89PNG" + b"p" * 50,
        "b/clip.wav": b"RIFF" + b"w" * 200,
        "b/movie.mp4": b"\x00\x00\x00 ftyp" + b"v" * 300,
        "b/notes.txt": b"not media",
        "a/huge.jpg": b"x" * 5000,
    }
    for rel, payload in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(payload)
    return files


def test_glob_filters_at_listing(spark, tmp_path):
    files = _make_files(tmp_path)
    jpgs = read_binary_files(spark, str(tmp_path), glob="*.jpg")
    got = sorted(os.path.basename(r["path"]) for r in jpgs.select("path").collect())
    assert got == ["huge.jpg", "img1.jpg"]
    # content round-trips byte-exact
    row = jpgs.filter(F.col("path").endswith("img1.jpg")).first()
    assert bytes(row["content"]) == files["a/img1.jpg"]


def test_ingest_media_normalizes_and_gates_size(spark, tmp_path):
    _make_files(tmp_path)
    media = ingest_media(spark, str(tmp_path), max_bytes=1000)
    rows = {os.path.basename(r["source_path"]): r for r in media.collect()}
    # txt dropped (unknown kind), huge.jpg dropped (size gate on the
    # length METADATA column, before content ships)
    assert set(rows) == {"img1.jpg", "img2.png", "clip.wav", "movie.mp4"}
    assert rows["img1.jpg"]["kind"] == "image"
    assert rows["clip.wav"]["kind"] == "audio"
    assert rows["movie.mp4"]["kind"] == "video"
    assert rows["img2.png"]["n_bytes"] == 54
    # media_id is a stable function of the path: re-ingest == same ids
    again = {
        os.path.basename(r["source_path"]): r["media_id"]
        for r in ingest_media(spark, str(tmp_path), max_bytes=1000).collect()
    }
    assert again == {k: v["media_id"] for k, v in rows.items()}


def test_media_table_feeds_multimodal_operators(spark, tmp_path):
    """The ingested table drops straight into the existing multimodal
    pipeline (schema-compatible with MEDIA_SCHEMA's operator surface)."""
    from analytics_etl_spark.operators.multimodal import extract_features

    _make_files(tmp_path)
    out = str(tmp_path / "media_table")
    write_media_table(ingest_media(spark, str(tmp_path), max_bytes=1000), out)
    table = spark.read.parquet(out)
    # partitioned by kind → a kind predicate prunes directories
    assert sorted(r["kind"] for r in table.select("kind").distinct().collect()) == [
        "audio", "image", "video",
    ]
    feats = extract_features(table.select("media_id", "kind", "payload", "meta"))
    got = feats.collect()
    assert len(got) == 4 and all(len(r["feature"]) > 0 for r in got)
