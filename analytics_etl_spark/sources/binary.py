"""Raw media file ingest via Spark's built-in `binaryFile` source.

The multimodal tables (operators/multimodal.py) assume media payloads
already live in a parquet column. This is the step BEFORE that: a
bucket/directory of raw image/audio/video files becomes a DataFrame of
(path, modificationTime, length, content) with zero custom code —
`spark.read.format("binaryFile")` is a first-class distributed source
(file listing is parallelized on the driver+executors, each file is one
row, splits never cut a file in half).

At 100 TB of media this is the ingest pattern:

* `pathGlobFilter` limits the listing to one modality per read — the
  filter applies during file listing, so a `*.jpg` read over a mixed
  bucket never even stats the audio files.
* `modifiedAfter`/`modifiedBefore` give incremental ingest windows
  without a manifest (the listing itself is the predicate).
* size gating happens on the `length` column Spark fills in from the
  file status — BEFORE `content` is materialized. Dropping the
  oversized 1% of files costs a metadata comparison, not a read.
* the normalized output (media_id = xxhash of path, payload, kind from
  the extension) lands in the MEDIA_SCHEMA shape and is written to
  parquet once; every downstream pass reads the columnar table, never
  the raw bucket again.

Spark caps single-row size via `spark.sql.sources.binaryFile.maxLength`
(Int.MaxValue default); real media pipelines should gate far below that
with `max_bytes` here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXT_KIND = {
    "jpg": "image", "jpeg": "image", "png": "image", "webp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "webm": "video", "mkv": "video",
}


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    modified_after: str | None = None,
) -> DataFrame:
    """Distributed listing+read of raw files: one row per file with
    (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    return reader.load(path)


def ingest_media(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int = 64 * 1024 * 1024,
    modified_after: str | None = None,
) -> DataFrame:
    """Raw files → MEDIA_SCHEMA-shaped frame (media_id, kind, payload,
    meta). Oversize files are dropped on the `length` metadata column
    before content is read into the row; kind derives from the
    extension; media_id is a stable 64-bit hash of the relative path
    (re-ingest of the same file is the same id — dedup/idempotent
    reload come free downstream).

    meta width/height/duration are NULL here by design: they come from
    the decode stage (operators/multimodal.py), not the byte stream.
    """
    raw = read_binary_files(spark, path, glob=glob, modified_after=modified_after)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind_expr = F.lit(None).cast("string")
    for e, k in sorted(EXT_KIND.items()):
        kind_expr = F.when(ext == e, F.lit(k)).otherwise(kind_expr)
    return (
        raw.filter(F.col("length") <= max_bytes)
        .select(
            F.xxhash64(F.col("path")).alias("media_id"),
            kind_expr.alias("kind"),
            F.col("content").alias("payload"),
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
                F.lit(None).cast("string").alias("mime"),
            ).alias("meta"),
            F.col("path").alias("source_path"),
            F.col("length").alias("n_bytes"),
        )
        .filter(F.col("kind").isNotNull())
    )


def write_media_table(df: DataFrame, path: str) -> None:
    """Persist the normalized media table partitioned by kind — the
    columnar home every downstream pass reads instead of the raw
    bucket. Payload stays a parquet binary column; metadata predicates
    (kind, n_bytes) prune without touching payload bytes."""
    df.write.mode("overwrite").partitionBy("kind").parquet(path)
