"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns next to typed
metadata. The Spark-side machinery here — schema, batch iteration,
partition sizing — is real and tested; the actual media decoding is
STUBBED (the image/audio libraries are not in this container) behind
``decode_stub``/NotImplementedError with a deterministic fake, so the
pipeline shape is verifiable end-to-end.

Scale notes: media rows are large and variable — keep
``spark.sql.files.maxPartitionBytes`` moderate, never collect payloads,
and push metadata-only predicates BEFORE any decode (`mapInPandas`
sees only surviving rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("mime", T.StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

REAL_DECODERS_AVAILABLE = False  # PIL / torchaudio / decord not in this image


def decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake 'decode → feature' for pipeline testing.

    Real deployments replace this with PIL/ffmpeg decode + model
    features. Raises if someone flips the flag without wiring a
    decoder.
    """
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire a real decoder here")
    # 8 deterministic pseudo-features from payload bytes
    n = len(payload)
    return [float((payload[i % n] if n else 0) + i) for i in range(8)]


def binary_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata pass that never leaves the JVM: size + digest."""
    return df.select(
        "media_id",
        "kind",
        F.octet_length(payload_col).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas.

    Batch shape: the iterator yields pandas frames sized by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — decoding is
    amortized per batch, payloads never hit the driver.
    """

    # NOTE: `run` must be fully self-contained (no references to
    # module-level names): cloudpickle ships closures by value, so the
    # Python workers never need this package on their sys.path. The
    # inline decode mirrors decode_stub — keep them in sync.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def decode(payload: bytes) -> list[float]:
            n = len(payload)
            return [float((payload[i % n] if n else 0) + i) for i in range(8)]

        for pdf in batches:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": [decode(b or b"") for b in payloads],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize — Spark-side plumbing real, pixel work stubbed.

    Filters to kind='image' BEFORE the Python boundary (metadata
    pushdown), then maps each payload to a fake resized payload of
    deterministic size with updated meta. A real deployment replaces
    the inner `resize` with PIL/opencv.
    """
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def resize(payload: bytes) -> bytes:
            # stub: deterministic byte fold to width*height "pixels"
            n = max(len(payload), 1)
            return bytes((payload[i % n] if payload else 0) for i in range(width * height))

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [resize(b or b"") for b in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Video frame sampling — one output row per sampled frame.

    Demonstrates the 1→N shape (posexplode after a batch map): frame
    extraction is stubbed as byte-strided slices; a real deployment
    decodes keyframes. Metadata filter precedes the Python boundary.
    """
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                for i in range(min(max_frames, max(len(payload) // every_n_bytes, 1))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield _pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.filter(F.col("kind") == "video").mapInPandas(run, out_schema)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents corpus (text → bytes),
    so the multimodal path is exercised on real testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


HISTOGRAM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def byte_histogram(df: DataFrame, bins: int = 16) -> DataFrame:
    """REAL byte-level feature extraction (not a stub): per-payload
    histogram of byte values bucketed into ``bins`` equal ranges —
    the entropy/magic-byte-style screening feature a media pipeline
    runs BEFORE any codec touches the data (corrupt-file triage,
    format drift detection, dedup pre-grouping). Unlike the decode
    path there is nothing to stub: the bytes are right there.

    numpy-vectorized inside mapInPandas: np.frombuffer is zero-copy
    over the Arrow buffer, one bincount per payload, only NON-EMPTY
    bins emitted (output is at most ``bins`` rows per media row —
    media-count-sized, never byte-sized). 256 % bins must be 0 so
    every bin covers an equal byte range.
    """
    if bins <= 0 or 256 % bins:
        raise ValueError(f"bins must divide 256, got {bins}")
    shift = (256 // bins).bit_length() - 1

    # self-contained closure (cloudpickle ships it by value; workers
    # never import this package)
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, out_bins, counts = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not payload:
                    continue
                arr = _np.frombuffer(payload, dtype=_np.uint8) >> shift
                bc = _np.bincount(arr, minlength=bins)
                nz = _np.nonzero(bc)[0]
                ids.extend([mid] * len(nz))
                out_bins.extend(nz.tolist())
                counts.extend(bc[nz].tolist())
            yield _pd.DataFrame(
                {"media_id": ids, "bin": out_bins, "n_bytes": counts}
            )

    return df.select("media_id", "payload").mapInPandas(run, HISTOGRAM_SCHEMA)
