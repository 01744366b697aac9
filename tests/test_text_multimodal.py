"""Text-analysis + multimodal plumbing unit tests."""

from __future__ import annotations

import hashlib
import math

from analytics_etl_spark.operators.multimodal import (
    binary_meta,
    extract_features,
    synthesize_media,
)
from analytics_etl_spark.operators.text_analysis import (
    langid_guess,
    quality_features,
    winnowing_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_features_values(spark):
    docs = _docs(spark, [(1, "the cat sat")])
    r = quality_features(docs).first()
    assert r["n_tokens"] == 3
    assert r["n_chars_text"] == 11
    # 9 alpha chars of 11; 1 stopword of 3 tokens
    assert math.isclose(r["alpha_ratio"], 9 / 11)
    assert math.isclose(r["stop_ratio"], 1 / 3)
    assert math.isclose(r["quality_score"], (9 / 11) * 0.7 + (1 / 3) * 0.3)


def test_langid_votes(spark):
    docs = _docs(
        spark,
        [
            (1, "the cat of a house"),
            (2, "el gato de la casa"),
            (3, "der hund und die katze"),
            (4, "xyz qqq www"),
        ],
    )
    out = {r["doc_id"]: r["lang_guess"] for r in langid_guess(docs).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "unknown"}


def test_winnowing_shared_fingerprints_for_shared_text(spark):
    shared = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [(1, shared + " tail a"), (2, shared + " tail b"), (3, "totally different words here " * 3)])
    rows = {r["doc_id"]: r for r in winnowing_fingerprints(docs).collect()}
    assert rows[1]["n_fingerprints"] >= 1
    # identical long prefix → identical minimum fingerprint
    assert rows[1]["min_fp"] == rows[2]["min_fp"]
    assert rows[1]["min_fp"] != rows[3]["min_fp"]


def test_multimodal_meta_and_features(spark):
    docs = spark.createDataFrame(
        [(0, "hello world", 11), (1, "spark", 5), (2, "engine", 6)],
        "doc_id long, text string, n_chars long",
    )
    media = synthesize_media(docs)
    assert media.columns == ["media_id", "kind", "payload", "meta"]
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert kinds == {0: "image", 1: "audio", 2: "video"}

    meta = {r["media_id"]: r for r in binary_meta(media).collect()}
    assert meta[0]["n_bytes"] == 11
    assert meta[0]["sha256"] == hashlib.sha256(b"hello world").hexdigest()

    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(feats[1]["feature"]) == 8
    assert feats[1]["sha256"] == hashlib.sha256(b"spark").hexdigest()
    # deterministic fake decode
    assert feats[1]["feature"] == feats[1]["feature"]


def test_resize_and_frame_sample(spark):
    from analytics_etl_spark.operators.multimodal import resize_images, sample_frames

    docs = spark.createDataFrame(
        [(0, "x" * 100, 100), (1, "y" * 100, 100), (2, "z" * 300, 300)],
        "doc_id long, text string, n_chars long",
    )
    media = synthesize_media(docs)  # 0=image, 1=audio, 2=video

    resized = resize_images(media, width=8, height=8).collect()
    assert [r["media_id"] for r in resized] == [0]  # only images pass
    assert len(resized[0]["payload"]) == 64
    assert resized[0]["width"] == 8

    frames = sample_frames(media, every_n_bytes=64, max_frames=4).collect()
    assert {r["media_id"] for r in frames} == {2}  # only videos pass
    assert [r["frame_idx"] for r in frames] == [0, 1, 2, 3]
    assert all(len(r["frame"]) <= 64 for r in frames)


def test_ngram_contamination_size_gate(spark):
    """The bench-bank broadcast is gated on a measured count, not an
    assumed contract: under the limit the plan carries the broadcast
    hint (corpus side never shuffles); over it (or with the gate
    disabled via limit=0) the hint is dropped and the join shuffles —
    same rows either way."""
    from analytics_etl_spark.operators.text_analysis import ngram_contamination

    corpus = spark.createDataFrame(
        [(10, "a b"), (10, "b c"), (10, "x y"), (11, "q r")],
        "doc_id long, shingle string",
    )
    bench = spark.createDataFrame([("a b",), ("b c",)], "shingle string")

    bcast = ngram_contamination(corpus, bench, broadcast_bench_limit=1000)
    shuffled = ngram_contamination(corpus, bench, broadcast_bench_limit=0)

    import contextlib
    import io

    def plan(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue().split("\n\n(1)")[0]

    assert "BroadcastHashJoin" in plan(bcast)
    # gate disabled -> no broadcast HINT survives to the gram join; at
    # these row counts AQE may still broadcast at runtime, so assert on
    # the static plan's lack of a hint-forced broadcast over the bench
    assert "ResolvedHint" not in shuffled._jdf.queryExecution().analyzed().toString()

    rows = {(r["doc_id"], r["n_grams"], r["n_contaminated"]) for r in bcast.collect()}
    assert rows == {(10, 3, 2)}
    assert rows == {
        (r["doc_id"], r["n_grams"], r["n_contaminated"]) for r in shuffled.collect()
    }


def test_exact_packing_invariants_vs_window_form(spark):
    """The exact greedy packer (applyInPandas) against the window
    approximation: exact bins NEVER overrun the budget (chunks are
    <= 50 words, so no single-chunk exception here), both conserve
    chunks and words exactly, and exact produces at least as many
    bins (it closes early instead of overrunning). Deterministic
    across runs."""
    import pyspark.sql.functions as F

    from analytics_etl_spark.operators.text_analysis import (
        chunk_documents,
        pack_training_examples,
        pack_training_examples_exact,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents(docs, chunk_words=50, overlap=10, keep_cols=("lang",))
    window_form = pack_training_examples(chunks, budget_words=500, stratum_col="lang")
    exact = pack_training_examples_exact(chunks, budget_words=500, stratum_col="lang")

    ex_rows = exact.collect()
    assert all(r["total_words"] <= 500 for r in ex_rows)

    def per_lang(df, col):
        return {
            r["lang"]: r["s"]
            for r in df.groupBy("lang").agg(F.sum(col).alias("s")).collect()
        }

    assert per_lang(exact, "n_chunks") == per_lang(window_form, "n_chunks")
    assert per_lang(exact, "total_words") == per_lang(window_form, "total_words")

    n_bins = lambda df: {  # noqa: E731
        r["lang"]: r["n"] for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    nb_exact, nb_window = n_bins(exact), n_bins(window_form)
    assert all(nb_exact[lang] >= nb_window[lang] for lang in nb_window)

    again = sorted(map(tuple, pack_training_examples_exact(
        chunks, budget_words=500, stratum_col="lang"
    ).collect()))
    assert sorted(map(tuple, ex_rows)) == again


def test_byte_histogram_counts_and_guards(spark):
    """byte_histogram: per-payload counts sum to the byte length,
    bins reflect value>>4, empty payloads emit nothing, and non-
    divisor bin counts are rejected."""
    import pytest

    from analytics_etl_spark.operators.multimodal import byte_histogram

    rows = [
        (1, bytes([0, 1, 15, 16, 255])),  # bins 0,0,0,1,15
        (2, b""),                         # empty: no rows
        (3, bytes(range(256))),           # every bin exactly 16
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["media_id"], r["bin"]): r["n_bytes"]
        for r in byte_histogram(df, bins=16).collect()
    }
    assert got[(1, 0)] == 3 and got[(1, 1)] == 1 and got[(1, 15)] == 1
    assert not any(mid == 2 for mid, _ in got)
    assert all(got[(3, b)] == 16 for b in range(16))
    with pytest.raises(ValueError):
        byte_histogram(df, bins=100)


def test_media_kernels_survive_empty_and_null_payloads(spark):
    """r8 hostile-media contract: every mapInPandas media kernel must
    survive NULL and zero-length payloads (np.frombuffer on an empty
    buffer, len(None), modulo-by-zero in the stub decoders) — one
    corrupt upload must never abort a 100 TB feature pass."""
    from pyspark.sql import Row

    from analytics_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        byte_histogram,
        extract_features,
        resize_images,
        sample_frames,
    )

    meta = {"width": 1, "height": 1, "duration_ms": 1, "mime": "x"}
    rows = [
        Row(media_id=1, kind="image", payload=b"abc", meta=Row(**meta)),
        Row(media_id=2, kind="image", payload=b"", meta=Row(**meta)),
        Row(media_id=3, kind="video", payload=None, meta=Row(**meta)),
        Row(media_id=4, kind="audio", payload=b"\x00", meta=Row(**meta)),
        Row(media_id=5, kind="video", payload=b"z" * 130, meta=Row(**meta)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in extract_features(df).collect()}
    assert set(feats) == {1, 2, 3, 4, 5}
    assert feats[2]["n_bytes"] == 0 and len(feats[2]["feature"]) == 8
    assert feats[3]["n_bytes"] == 0  # NULL payload treated as empty

    resized = {r["media_id"]: r for r in resize_images(df, 2, 2).collect()}
    assert set(resized) == {1, 2}
    assert len(resized[2]["payload"]) == 4  # empty in, fixed-size out

    frames = sample_frames(df, every_n_bytes=64, max_frames=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    # NULL-payload video yields one empty frame; 130 bytes at a
    # 64-byte stride yields floor(130/64) = 2 frames
    assert len(by_media[3]) == 1 and by_media[3][0]["frame"] == b""
    assert len(by_media[5]) == 2

    hist = byte_histogram(df, bins=16).collect()
    ids = {r["media_id"] for r in hist}
    assert ids == {1, 4, 5}  # empty/NULL payloads contribute nothing


def test_gopher_flags_planted_rules(spark):
    from analytics_etl_spark.operators.text_analysis import gopher_quality_flags

    good = " ".join(["the", "have", "word"] * 20)  # 60 words, 2 stopwords
    rows = [
        (1, good),
        (2, "the have short doc"),  # fails word count only
        (3, " ".join(["the", "have"] * 30) + " ###### ...... ......"),  # symbols
        (4, "\n".join(["- bullet"] * 10)),  # 100% bullet lines
        (5, "\n".join(["line one...", "line two...", "x"] * 5)),  # 2/3 ellipsis
        (6, " ".join(["the", "have"] * 15 + ["123", "456", "789"] * 8)),  # alpha
        (7, " ".join(["word"] * 60)),  # no stopwords
        (8, None),  # NULL text
        (9, ""),  # empty text
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["keep"] is True and all(
        out[1][f] for f in ("f_word_count", "f_mean_word_len", "f_symbol_ratio",
                            "f_bullet", "f_ellipsis", "f_alpha", "f_stop")
    )
    assert out[2]["keep"] is False and out[2]["f_word_count"] is False
    assert out[3]["f_symbol_ratio"] is False
    assert out[4]["f_bullet"] is False
    assert out[5]["f_ellipsis"] is False
    assert out[6]["f_alpha"] is False and out[6]["keep"] is False
    assert out[7]["f_stop"] is False
    # NULL text: flags NULL, keep decided false (not a crash)
    assert out[8]["f_word_count"] is None and out[8]["keep"] is False
    # empty text: one empty token, mean-word-length floor fails
    assert out[9]["f_mean_word_len"] is False and out[9]["keep"] is False


def test_gopher_stopword_calibration(spark):
    from analytics_etl_spark.operators.text_analysis import gopher_quality_flags

    docs = _docs(spark, [(1, " ".join(["the", "a", "word"] * 20))])
    # published list: only 'the' present -> f_stop False
    assert gopher_quality_flags(docs).first()["f_stop"] is False
    # corpus-calibrated set: both present -> True
    assert (
        gopher_quality_flags(docs, stopwords=("the", "a")).first()["f_stop"] is True
    )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_gopher_text = st.text(
    alphabet="abcdefgh the.#*-\n", min_size=0, max_size=400
)


def _ref_gopher(text, stopwords=("the", "be", "to", "of", "and", "that", "have", "with")):
    """Independent Python replay of the integer rule cascade."""
    if text is None:
        return None
    words = text.split(" ")
    lines = text.split("\n")
    n_words, n_lines = len(words), len(lines)
    sum_wlen = sum(len(w) for w in words)
    n_alpha = sum(1 for w in words if any(c.isascii() and c.isalpha() for c in w))
    n_hash = text.count("#")
    n_ell3 = len(text) - len(text.replace("...", ""))
    n_bullet = sum(1 for l in lines if l[:1] in ("-", "*"))
    n_ell_lines = sum(1 for l in lines if l.endswith("..."))
    n_stop = len({w for w in words if w in stopwords})
    return (
        50 <= n_words <= 100000,
        3 * n_words <= sum_wlen <= 10 * n_words,
        10 * (3 * n_hash + n_ell3) <= 3 * n_words,
        10 * n_bullet < 9 * n_lines,
        10 * n_ell_lines < 3 * n_lines,
        5 * n_alpha >= 4 * n_words,
        n_stop >= 2,
    )


@given(texts=st.lists(_gopher_text, min_size=1, max_size=8))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gopher_flags_match_reference_on_random_text(spark, texts):
    from analytics_etl_spark.operators.text_analysis import gopher_quality_flags

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    flags = (
        "f_word_count", "f_mean_word_len", "f_symbol_ratio",
        "f_bullet", "f_ellipsis", "f_alpha", "f_stop",
    )
    for i, txt in enumerate(texts):
        want = _ref_gopher(txt)
        got = tuple(out[i][f] for f in flags)
        assert got == want, (txt, got, want)
        assert out[i]["keep"] is all(want)


# --- real built-in decoders (round 13): PCM16 WAV + P6 PPM ----------------


def _make_wav(rate=8000, freq=440, n=800, channels=1, amp=12000, extra_chunk=False):
    """Pure-stdlib PCM16 WAV builder (sine tone) — independent of the
    operator's parser; optionally inserts an odd-sized LIST chunk
    before data to exercise the RIFF chunk walk + pad rule."""
    import math
    import struct

    frames = b""
    for i in range(n):
        v = int(amp * math.sin(2 * math.pi * freq * i / rate))
        frames += struct.pack("<h", v) * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    chunks += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _make_ppm(arr, comment=False):
    head = b"P6\n"
    if comment:
        head += b"# netpbm comment\n"
    head += b"%d %d\n255\n" % (arr.shape[1], arr.shape[0])
    return head + arr.tobytes()


def test_decode_wav_matches_stdlib_wave():
    """The operator's RIFF walk against the stdlib `wave` parser on
    the same bytes — two independent implementations, one answer."""
    import io
    import wave

    import numpy as np

    from analytics_etl_spark.operators.multimodal import decode_wav

    payload = _make_wav(rate=8000, n=640, channels=2, extra_chunk=True)
    rate, channels, samples = decode_wav(payload)
    with wave.open(io.BytesIO(payload)) as ref:
        assert rate == ref.getframerate()
        assert channels == ref.getnchannels()
        assert samples.shape[0] == ref.getnframes()
        assert samples.astype("<i2").tobytes() == ref.readframes(ref.getnframes())
    assert samples.dtype == np.dtype("<i2")


def test_wav_features_physical_values():
    import numpy as np

    from analytics_etl_spark.operators.multimodal import wav_features

    f = wav_features(_make_wav(rate=8000, freq=440, n=800, amp=12000))
    dur, rate, ch, rms, peak, zcr, lo, hi = f
    assert dur == 800 / 8000 and rate == 8000.0 and ch == 1.0
    # sine RMS = amp/sqrt(2); integer rounding keeps it within 1%
    assert abs(rms - 12000 / np.sqrt(2)) < 120
    assert 11900 <= peak <= 12000
    # a 440 Hz tone at 8 kHz crosses zero ~2*440/8000 of samples
    assert abs(zcr - 2 * 440 / 8000) < 0.02
    # pure low tone: energy concentrated in the low half-spectrum
    assert lo > 0.9 and abs((lo + hi) - 1.0) < 1e-9


def test_decode_ppm_roundtrip_and_features():
    import numpy as np

    from analytics_etl_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        image_features,
    )

    arr = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    assert np.array_equal(decode_ppm(_make_ppm(arr, comment=True)), arr)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    w, h, mr, mg, mb, sl, lmin, lmax = image_features(encode_ppm(arr))
    assert (w, h) == (4.0, 2.0)
    a = arr.astype(np.float64)
    assert mr == a[:, :, 0].mean() and mg == a[:, :, 1].mean() and mb == a[:, :, 2].mean()
    luma = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    assert sl == luma.std() and lmin == luma.min() and lmax == luma.max()


# --- real PNG decoder (round 14): stdlib zlib + numpy unfilter ------------


def _ff_scanlines(flat, ch, ftypes):
    """INDEPENDENT per-spec forward filter: applies the RFC 2083 §6
    equations byte-at-a-time in pure Python over a (h, stride) int
    array — the reference the engine's vectorized unfilter must
    invert. `ch` is the filter byte-lag (bytes per pixel)."""
    h, stride = flat.shape
    raw = bytearray()
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        raw.append(f)
        for i in range(stride):
            x = int(flat[y, i])
            left = int(flat[y, i - ch]) if i >= ch else 0
            up = int(flat[y - 1, i]) if y > 0 else 0
            ul = int(flat[y - 1, i - ch]) if (y > 0 and i >= ch) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            raw.append((x - pred) % 256)
    return raw


def _png_chunk(ctype, body):
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + zlib.crc32(ctype + body).to_bytes(4, "big")
    )


_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _build_png(arr, ftypes, interlace=0, plte=None):
    """INDEPENDENT per-spec PNG builder: truecolor (arr is (h, w,
    3|4)) or paletted (arr is (h, w) indices with `plte` bytes),
    interlace 0 or Adam7 — passes split per §8.2, each forward
    filtered byte-at-a-time by the §6 reference equations."""
    import zlib

    if plte is not None:
        h, w = arr.shape[:2]
        ch, color = 1, 3
        planes = arr.reshape(h, w, 1)
    else:
        h, w, ch = arr.shape
        color = 2 if ch == 3 else 6
        planes = arr
    raw = bytearray()
    passes = (
        [(0, 0, 1, 1)] if not interlace else list(_ADAM7)
    )
    for x0, y0, dx, dy in passes:
        sub = planes[y0:h:dy, x0:w:dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw += _ff_scanlines(
            sub.reshape(sub.shape[0], sub.shape[1] * ch), ch, ftypes
        )
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color, 0, 0, interlace])
    )
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(plte))
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _filter_png(arr, ftypes):
    """Truecolor non-interlaced shorthand for _build_png (the round-14
    helper's original surface — many tests use it)."""
    return _build_png(arr, ftypes, interlace=0, plte=None)


def _huge_ihdr_png(w=40000, h=20000, idat_plain=bytes(4096)):
    """The ADVICE r14 attack shape: valid-CRC IHDR declaring a multi-
    GB raster over a small compressed-zeros IDAT — every decode site
    must reject it on declared geometry BEFORE any inflate."""
    import zlib

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(idat_plain, 9))
        + _png_chunk(b"IEND", b"")
    )


def _demo_rgb(h=7, w=5, ch=3):
    """Deterministic high-variance pixels (neighbor deltas exercise
    every mod-256 wrap in the filters)."""
    import numpy as np

    n = h * w * ch
    return ((np.arange(n) * 97 + (np.arange(n) ** 2) * 31) % 256).astype(
        np.uint8
    ).reshape(h, w, ch)


def test_decode_png_roundtrip_rgb_and_rgba():
    import numpy as np

    from analytics_etl_spark.operators.multimodal import decode_png, encode_png

    for ch in (3, 4):
        arr = _demo_rgb(6, 4, ch)
        assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_png_unfilter_inverts_per_spec_reference_filters():
    """Every filter type (0..4, cycled per scanline, plus an all-Paeth
    and an all-Average image) built by the independent byte-at-a-time
    reference — the engine's vectorized unfilter must recover the
    exact pixels. This is the §16 golden-evidence pattern: two
    implementations from the spec, one answer."""
    import numpy as np

    from analytics_etl_spark.operators.multimodal import decode_png

    for ch in (3, 4):
        arr = _demo_rgb(11, 6, ch)
        for ftypes in ([0, 1, 2, 3, 4], [4], [3], [1, 4, 2]):
            got = decode_png(_filter_png(arr, ftypes))
            assert np.array_equal(got, arr), (ch, ftypes)


def test_decode_png_rejects_malformed():
    import zlib

    import numpy as np
    import pytest

    from analytics_etl_spark.operators.multimodal import decode_png, encode_png

    good = encode_png(_demo_rgb(4, 4, 3))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + good[4:])
    # flip one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # unsupported flavors: grayscale(0), 16-bit, interlace value > 1
    def mutate(depth=8, color=2, interlace=0):
        ihdr = (
            (4).to_bytes(4, "big")
            + (4).to_bytes(4, "big")
            + bytes([depth, color, 0, 0, interlace])
        )
        body = (
            len(ihdr).to_bytes(4, "big")
            + b"IHDR"
            + ihdr
            + zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big")
        )
        return good[:8] + body + good[8 + len(body) :]

    for kw in ({"color": 0}, {"depth": 16}, {"interlace": 2}):
        with pytest.raises(ValueError, match="supported"):
            decode_png(mutate(**kw))
    # palette (3) is SUPPORTED since r15 — but only with a PLTE chunk
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(mutate(color=3))
    # Adam7 flag over non-interlaced data: pass layout disagrees (55
    # filtered bytes expected for 4x4 RGB Adam7 vs the 52 present)
    with pytest.raises(ValueError, match="size"):
        decode_png(mutate(interlace=1))
    # inflated size disagreeing with IHDR geometry
    arr = _demo_rgb(4, 4, 3)
    truncated = np.zeros((3, 1 + 4 * 3), dtype=np.uint8)  # one row short
    import analytics_etl_spark.operators.multimodal as mm

    payload = (
        good[: 8 + 25]  # magic + IHDR chunk (13 + 12)
        + (lambda b: len(b).to_bytes(4, "big") + b"IDAT" + b + zlib.crc32(b"IDAT" + b).to_bytes(4, "big"))(zlib.compress(truncated.tobytes()))
        + (0).to_bytes(4, "big") + b"IEND" + zlib.crc32(b"IEND").to_bytes(4, "big")
    )
    with pytest.raises(ValueError, match="size"):
        decode_png(payload)
    # all of the above must reach the FALLBACK through dispatch
    assert mm.dispatch_features(bytes(bad)) == mm.decode_stub(bytes(bad))


def test_decode_png_bounds_inflation_zip_bomb():
    """A hostile IDAT declaring a tiny IHDR but inflating to hundreds
    of MB must raise (→ fallback) WITHOUT materializing the inflated
    stream — an OOM kill is not an exception the total-fallback stance
    could catch, so the inflate is capped at expected+1 bytes."""
    import tracemalloc
    import zlib

    import pytest

    from analytics_etl_spark.operators import multimodal as mm

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(200 * 1024 * 1024), 9))  # ~200 KB -> 200 MB
        + chunk(b"IEND", b"")
    )
    assert len(bomb) < 1024 * 1024  # the payload itself is small
    tracemalloc.start()
    with pytest.raises(ValueError, match="size"):
        mm.decode_png(bomb)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 16 * 1024 * 1024, peak  # nowhere near the 200 MB
    # and through dispatch it lands on the deterministic fallback
    assert mm.dispatch_features(bomb) == mm.decode_stub(bomb)


def test_decode_png_huge_ihdr_rejected_before_inflate():
    """r15 advice close: the bounded-inflate cap alone guards too
    late — need = h*(stride+1) comes from the attacker-controlled
    IHDR, and zlib materializes up to that cap inside ONE
    decompress() call, so a valid-CRC 40000x20000 IHDR (a ~2.4 GB
    raster) must be rejected BEFORE any inflate, on declared
    geometry alone. Also covers the under-cap variant: a raster no
    DEFLATE stream of this IDAT's size could produce (max ~1032x)
    is rejected without touching zlib."""
    import tracemalloc

    import pytest

    from analytics_etl_spark.operators import multimodal as mm

    # the ADVICE attack shape: huge valid-CRC IHDR, small IDAT — the
    # old guard would have asked zlib for 2.4 GB before any check
    huge = _huge_ihdr_png()
    assert len(huge) < 8192
    # sane geometry but an IDAT far too small to ever inflate to it
    implausible = _huge_ihdr_png(1000, 1000, bytes(64))
    tracemalloc.start()
    with pytest.raises(ValueError, match="cap"):
        mm.decode_png(huge)
    with pytest.raises(ValueError, match="implausible"):
        mm.decode_png(implausible)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 * 1024 * 1024, peak
    # both land on the deterministic fallback through dispatch
    assert mm.dispatch_features(huge) == mm.decode_stub(huge)
    assert mm.dispatch_features(implausible) == mm.decode_stub(implausible)
    # ... and through the worker closures (extract_features/resize
    # mirror the guard; behavioral sync is pinned separately)


def test_decode_png_palette_per_spec():
    """Color type 3 (r15): indices forward-filtered by the
    independent byte-at-a-time reference (filter byte-lag 1), PLTE
    lookup must yield exactly pal[idx] as (h, w, 3)."""
    import numpy as np
    import pytest

    from analytics_etl_spark.operators.multimodal import decode_png

    h, w = 9, 7
    idx = ((np.arange(h * w) * 13 + 5) % 16).astype(np.uint8).reshape(h, w)
    pal = bytes(((np.arange(48) * 37 + 11) % 256).astype(np.uint8))
    pal_arr = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
    for ftypes in ([0, 1, 2, 3, 4], [4], [3, 1]):
        got = decode_png(_build_png(idx, ftypes, plte=pal))
        assert got.shape == (h, w, 3)
        assert np.array_equal(got, pal_arr[idx]), ftypes
    # malformed PLTE (not a multiple of 3) and out-of-range index
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_build_png(idx, [0], plte=pal[:-1]))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_build_png(idx, [0], plte=pal[:9]))  # 3 entries < max 15


def test_decode_png_adam7_inverts_per_spec_reference():
    """Adam7 (r15): the independent builder splits the image into §8.2
    passes and forward-filters EACH pass with the byte-at-a-time
    reference; the engine must reassemble the exact pixels. Geometries
    cover w/h below the 8x8 grid (empty passes), odd sizes, and the
    1x1 corner (only pass 1 non-empty); filters cycle per scanline."""
    import numpy as np

    from analytics_etl_spark.operators.multimodal import decode_png

    for (h, w) in [(11, 6), (8, 8), (5, 3), (1, 1), (2, 9), (16, 16), (7, 1)]:
        for ch in (3, 4):
            arr = _demo_rgb(h, w, ch)
            for ftypes in ([0, 1, 2, 3, 4], [4], [2, 3]):
                got = decode_png(_build_png(arr, ftypes, interlace=1))
                assert np.array_equal(got, arr), (h, w, ch, ftypes)
    # paletted + interlaced combined: both r15 features in one payload
    idx = ((np.arange(10 * 9) * 7 + 3) % 8).astype(np.uint8).reshape(10, 9)
    pal = bytes(((np.arange(24) * 53 + 29) % 256).astype(np.uint8))
    got = decode_png(_build_png(idx, [1, 4, 0], interlace=1, plte=pal))
    assert np.array_equal(
        got, np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx]
    )


def test_image_features_png_matches_ppm_and_ignores_alpha():
    """The same pixels through PPM and PNG payloads must yield the
    SAME feature vector (codec-independent stats), and an RGBA PNG's
    alpha channel must not leak into the color stats."""
    import numpy as np

    from analytics_etl_spark.operators.multimodal import encode_png, image_features

    arr = _demo_rgb(8, 5, 3)
    assert image_features(_make_ppm(arr)) == image_features(encode_png(arr))
    rgba = np.dstack([arr, np.full((8, 5), 77, np.uint8)])
    assert image_features(encode_png(rgba)) == image_features(encode_png(arr))


def test_resize_images_real_png(spark):
    import numpy as np

    from analytics_etl_spark.operators.multimodal import (
        decode_png,
        resize_images,
    )

    arr = _demo_rgb(8, 8, 3)
    # multi-filter payload: the worker's inline unfilter runs for real
    payload = _filter_png(arr, [0, 1, 2, 3, 4])
    # r15: paletted Adam7 input — worker must decode (lookup to RGB)
    idx = (np.arange(64, dtype=np.uint8) % 11).reshape(8, 8)
    pal = bytes(((np.arange(33) * 41 + 7) % 256).astype(np.uint8))
    pal_payload = _build_png(idx, [1, 4, 2], interlace=1, plte=pal)
    df = spark.createDataFrame(
        [
            (1, "image", payload),
            (2, "image", b"\x89PNG\r\n\x1a\njunk"),
            (3, "image", pal_payload),
            (4, "image", _huge_ihdr_png()),  # guard -> byte-fold
        ],
        "media_id long, kind string, payload binary",
    )
    got = {r.media_id: r.payload for r in resize_images(df, 4, 4).collect()}
    yi, xi = (np.arange(4) * 8) // 4, (np.arange(4) * 8) // 4
    assert np.array_equal(decode_png(bytes(got[1])), arr[yi][:, xi])
    assert len(got[2]) == 16  # corrupt -> byte-fold fallback
    rgb = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx]
    assert np.array_equal(decode_png(bytes(got[3])), rgb[yi][:, xi])
    assert len(got[4]) == 16  # geometry bomb -> byte-fold fallback


def test_dispatch_falls_back_on_unknown_or_corrupt():
    from analytics_etl_spark.operators.multimodal import (
        decode_stub,
        dispatch_features,
    )

    text = "just a document".encode()
    assert dispatch_features(text) == decode_stub(text)
    corrupt_wav = b"RIFF\x00\x00\x00\x00WAVEjunk"  # magic ok, chunks absent
    assert dispatch_features(corrupt_wav) == decode_stub(corrupt_wav)
    corrupt_ppm = b"P6\n9 9\n255\nxx"  # truncated raster
    assert dispatch_features(corrupt_ppm) == decode_stub(corrupt_ppm)


def test_dispatch_falls_back_on_non_valueerror(monkeypatch):
    """The totality claim covers exception classes the decoders did
    not anticipate (r13 advice): a magic-matching payload whose decode
    raises anything — not just ValueError — must still yield the
    deterministic fallback row, never abort the task."""
    from analytics_etl_spark.operators import multimodal as mm

    def boom(payload):
        raise MemoryError("hostile header")

    monkeypatch.setattr(mm, "wav_features", boom)
    wav_magic = b"RIFF\x00\x00\x00\x00WAVEjunk"
    assert mm.dispatch_features(wav_magic) == mm.decode_stub(wav_magic)
    monkeypatch.setattr(mm, "image_features", boom)
    ppm_magic = b"P6\n2 2\n255\n" + bytes(12)
    assert mm.dispatch_features(ppm_magic) == mm.decode_stub(ppm_magic)


def test_real_decoders_closure_in_sync(spark):
    """extract_features' self-contained worker closure must compute
    EXACTLY what the module-level dispatch does (the keep-in-sync
    contract, enforced): WAV, PPM, fallback and corrupt rows through
    Spark vs dispatch_features, equal after the schema's float32 cast."""
    import numpy as np

    from analytics_etl_spark.operators.multimodal import (
        dispatch_features,
        extract_features,
    )

    arr = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3)
    payloads = {
        1: _make_wav(extra_chunk=True),
        2: _make_ppm(arr),
        3: "plain text payload".encode(),
        4: b"P6\n2 2\n255\nxy",  # corrupt -> fallback
        5: _filter_png(_demo_rgb(6, 4, 3), [0, 1, 2, 3, 4]),  # all filters
        6: _filter_png(_demo_rgb(5, 3, 4), [4, 3]),  # RGBA
        7: b"\x89PNG\r\n\x1a\njunk",  # corrupt PNG -> fallback
        # r15 surface: paletted, Adam7-interlaced, and the huge-IHDR
        # geometry bomb (must hit the worker's pre-inflate guard and
        # land on the fallback, matching the module dispatch)
        8: _build_png(
            (np.arange(42, dtype=np.uint8) % 7).reshape(6, 7),
            [1, 4],
            plte=bytes(range(21)),
        ),
        9: _build_png(_demo_rgb(9, 6, 3), [0, 1, 2, 3, 4], interlace=1),
        10: _build_png(_demo_rgb(5, 5, 4), [4, 2], interlace=1),
        11: _huge_ihdr_png(),
        # r16 surface: baseline JPEG (4:4:4, 4:2:0 with restart,
        # grayscale), a corrupt JPEG (-> fallback), and the huge-SOF
        # geometry bomb (must hit the worker's pre-alloc guard)
        12: _encode_jpeg(_demo_rgb(17, 13, 3)),
        13: _encode_jpeg(_demo_rgb(32, 32, 3), subsampling="420", restart=2),
        14: _encode_jpeg(_demo_rgb(9, 9, 3)[:, :, 0], gray=True),
        15: b"\xff\xd8\xffgarbage",
        16: _huge_sof_jpeg(),
    }
    df = spark.createDataFrame(
        [(k, "audio" if k == 1 else "image", v, None) for k, v in payloads.items()],
        "media_id long, kind string, payload binary, meta struct<width:int,height:int,duration_ms:int,mime:string>",
    )
    got = {r.media_id: r.feature for r in extract_features(df).collect()}
    for k, payload in payloads.items():
        expect = [np.float32(v) for v in dispatch_features(payload)]
        assert got[k] == expect, k


def test_resize_images_real_ppm_nearest_neighbor(spark):
    import numpy as np

    from analytics_etl_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_images,
    )

    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        [(1, "image", encode_ppm(arr)), (2, "image", b"not an image")],
        "media_id long, kind string, payload binary",
    )
    out = {r.media_id: r for r in resize_images(df, width=2, height=2).collect()}
    # nearest-neighbor index map: yi = xi = [0, 2]
    expect = arr[[0, 2]][:, [0, 2]]
    assert np.array_equal(decode_ppm(bytes(out[1].payload)), expect)
    assert (out[1].width, out[1].height) == (2, 2)
    # non-PPM payload still yields the deterministic fold of w*h bytes
    assert len(bytes(out[2].payload)) == 4


# --- baseline JPEG: independent per-spec encoder + goldens (r16) ------
#
# The §16 golden-evidence pattern, JPEG edition: the forward pipeline
# below (BT.601 transform, box-mean subsampling, FDCT, quantization,
# zigzag, DC-diff/AC-RLE canonical-Huffman entropy coding, byte
# stuffing, restart markers) is written per T.81 with no code shared
# with operators/multimodal.decode_jpeg; the reconstruction the
# decoder must produce is computed by the same independent module
# (dequantize -> IDCT -> replicate-upsample -> color convert) and
# compared BIT-EXACTLY.

_JZIG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jq_tables():
    import numpy as np

    ql = np.array(  # Annex K luminance
        [
            [16, 11, 10, 16, 24, 40, 51, 61],
            [12, 12, 14, 19, 26, 58, 60, 55],
            [14, 13, 16, 24, 40, 57, 69, 56],
            [14, 17, 22, 29, 51, 87, 80, 62],
            [18, 22, 37, 56, 68, 109, 103, 77],
            [24, 35, 55, 64, 81, 104, 113, 92],
            [49, 64, 78, 87, 103, 121, 120, 101],
            [72, 92, 95, 98, 112, 100, 103, 99],
        ],
        dtype=np.int32,
    )
    qc = np.array(  # Annex K chrominance
        [
            [17, 18, 24, 47, 99, 99, 99, 99],
            [18, 21, 26, 66, 99, 99, 99, 99],
            [24, 26, 56, 99, 99, 99, 99, 99],
            [47, 66, 99, 99, 99, 99, 99, 99],
            [99, 99, 99, 99, 99, 99, 99, 99],
            [99, 99, 99, 99, 99, 99, 99, 99],
            [99, 99, 99, 99, 99, 99, 99, 99],
            [99, 99, 99, 99, 99, 99, 99, 99],
        ],
        dtype=np.int32,
    )
    return ql, qc


def _jdct_basis():
    import numpy as np

    xs = np.arange(8).reshape(8, 1)
    us = np.arange(8).reshape(1, 8)
    M = 0.5 * np.cos((2 * xs + 1) * us * np.pi / 16)
    M[:, 0] *= 1 / np.sqrt(2)
    return M


def _jpeg_forward(img, subsampling="444", gray=False):
    """-> (factors, qsel, per-component quantized int blocks,
    (mcus_x, mcus_y)) — the shared forward half of encoder and
    reference reconstruction."""
    import numpy as np

    ql, qc = _jq_tables()
    M = _jdct_basis()
    h, w = img.shape[:2]

    def pad_to(plane, bh, bw):
        ph, pw = plane.shape
        return np.pad(plane, ((0, bh - ph), (0, bw - pw)), mode="edge")

    def subsample(plane, fx, fy):
        if fx == 1 and fy == 1:
            return plane
        ph = -(-plane.shape[0] // fy) * fy
        pw = -(-plane.shape[1] // fx) * fx
        p = pad_to(plane, ph, pw)
        return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))

    if gray:
        a = img.astype(np.float64)
        y = (
            a
            if img.ndim == 2
            else 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
        )
        factors, planes, qsel = [(1, 1)], [y], [0]
    else:
        a = img.astype(np.float64)
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        factors = {
            "444": [(1, 1), (1, 1), (1, 1)],
            "420": [(2, 2), (1, 1), (1, 1)],
            "422": [(2, 1), (1, 1), (1, 1)],
        }[subsampling]
        hmax = max(f[0] for f in factors)
        vmax = max(f[1] for f in factors)
        planes = [
            y,
            subsample(cb, hmax // factors[1][0], vmax // factors[1][1]),
            subsample(cr, hmax // factors[2][0], vmax // factors[2][1]),
        ]
        qsel = [0, 1, 1]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    blocks = []
    for ci, ((fx, fy), plane) in enumerate(zip(factors, planes)):
        bx, by = mcus_x * fx, mcus_y * fy
        p = pad_to(plane, by * 8, bx * 8)
        blk = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(by * bx, 8, 8)
        coef = np.einsum("xu,nxy,yv->nuv", M, blk - 128.0, M)
        q = (ql, qc)[qsel[ci]]
        blocks.append(np.round(coef / q[None, :, :]).astype(np.int64))
    return factors, qsel, blocks, (mcus_x, mcus_y)


def _jhuffman(freqs):
    """Per-stream optimal canonical Huffman; a dummy symbol pinned at
    max depth reserves the all-ones code (T.81 C.2) and keeps the
    Kraft sum < 1 so canonical reconstruction from (counts, symbols)
    is exact."""
    import heapq
    import itertools

    f = dict(freqs)
    f[256] = 0
    heap = [(max(c, 1), i, [s]) for i, (s, c) in enumerate(f.items())]
    heapq.heapify(heap)
    ticket = itertools.count(len(heap))
    depth = {s: 0 for s in f}
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, next(ticket), s1 + s2))
    if max(depth.values()) > 16:
        depth = {s: 9 for s in f}
    depth[256] = max(depth.values())
    order = sorted(f, key=lambda s: (depth[s], s))
    counts, symbols, codes = [0] * 16, [], {}
    code, prev = 0, depth[order[0]]
    for s in order:
        code <<= depth[s] - prev
        prev = depth[s]
        if s != 256:
            codes[s] = (code, depth[s])
            counts[depth[s] - 1] += 1
            symbols.append(s)
        code += 1
    return codes, counts, symbols


def _encode_jpeg(img, subsampling="444", restart=0, gray=False):
    """Independent baseline JFIF encoder (per-image optimal tables)."""
    import numpy as np

    ql, qc = _jq_tables()
    h, w = img.shape[:2]
    factors, qsel, comp_blocks, (mcus_x, mcus_y) = _jpeg_forward(
        img, subsampling, gray
    )
    ncomp = len(factors)
    n_mcus = mcus_x * mcus_y

    def magnitude(v):
        return 0 if v == 0 else int(abs(v)).bit_length()

    def mag_bits(v, t):
        return v if v >= 0 else v + (1 << t) - 1

    stream, preds = [], [0] * ncomp
    for mcu in range(n_mcus):
        if restart and mcu and mcu % restart == 0:
            stream.append(("RST", (mcu // restart - 1) % 8))
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for ci, (fx, fy) in enumerate(factors):
            bx = mcus_x * fx
            for byy in range(fy):
                for bxx in range(fx):
                    zz = comp_blocks[ci][
                        (my * fy + byy) * bx + (mx * fx + bxx)
                    ].reshape(64)[_JZIG]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    t = magnitude(diff)
                    acs, run = [], 0
                    last = 63
                    while last >= 1 and zz[last] == 0:
                        last -= 1
                    for k in range(1, last + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            acs.append((0xF0, 0, 0))
                            run -= 16
                        s = magnitude(v)
                        acs.append(((run << 4) | s, mag_bits(v, s), s))
                        run = 0
                    if last < 63:
                        acs.append((0x00, 0, 0))
                    stream.append(("BLK", ci, (t, mag_bits(diff, t), t), acs))

    fr = {(k, c): {} for k in ("dc", "ac") for c in (0, 1)}
    for item in stream:
        if item[0] != "BLK":
            continue
        _, ci, dc, acs = item
        c = 0 if ci == 0 else 1
        fr[("dc", c)][dc[0]] = fr[("dc", c)].get(dc[0], 0) + 1
        for sym, _, _ in acs:
            fr[("ac", c)][sym] = fr[("ac", c)].get(sym, 0) + 1

    tables, dht = {}, b""
    for cls in (0, 1) if ncomp == 3 else (0,):
        for kind, tc in (("dc", 0), ("ac", 1)):
            codes, counts, symbols = _jhuffman(fr[(kind, cls)])
            tables[(kind, cls)] = codes
            dht += bytes([(tc << 4) | cls]) + bytes(counts) + bytes(symbols)

    out_bits, acc, nb = bytearray(), 0, 0

    def put(code, n):
        nonlocal acc, nb
        if n == 0:
            return
        acc = (acc << n) | (code & ((1 << n) - 1))
        nb += n
        while nb >= 8:
            b = (acc >> (nb - 8)) & 0xFF
            out_bits.append(b)
            if b == 0xFF:
                out_bits.append(0x00)
            nb -= 8
        acc &= (1 << nb) - 1

    def flush():
        nonlocal acc, nb
        if nb:
            put((1 << (8 - nb)) - 1, 8 - nb)

    ecs = bytearray()
    for item in stream:
        if item[0] == "RST":
            flush()
            ecs += out_bits
            ecs += bytes([0xFF, 0xD0 + item[1]])
            out_bits.clear()
            continue
        _, ci, dc, acs = item
        c = 0 if ci == 0 else 1
        code, n = tables[("dc", c)][dc[0]]
        put(code, n)
        put(dc[1], dc[2])
        for sym, bits_v, nbits in acs:
            code, n = tables[("ac", c)][sym]
            put(code, n)
            put(bits_v, nbits)
    flush()
    ecs += out_bits

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = bytes([0]) + bytes(int(ql.reshape(64)[_JZIG][k]) for k in range(64))
    if ncomp == 3:
        dqt += bytes([1]) + bytes(int(qc.reshape(64)[_JZIG][k]) for k in range(64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci, (fx, fy) in enumerate(factors):
        sof += bytes([ci + 1, (fx << 4) | fy, qsel[ci]])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        c = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (c << 4) | c])
    sos += bytes([0, 63, 0])
    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, dqt)
    out += seg(0xC0, sof)
    out += seg(0xC4, dht)
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))
    out += seg(0xDA, sos)
    return out + bytes(ecs) + b"\xff\xd9"


def _jpeg_reference_reconstruct(img, subsampling="444", gray=False):
    """What the decoder MUST produce: dequantize the independent
    forward pipeline's coefficients, IDCT, replicate-upsample, color
    convert — all in this module's own code."""
    import numpy as np

    ql, qc = _jq_tables()
    M = _jdct_basis()
    h, w = img.shape[:2]
    factors, qsel, comp_blocks, (mcus_x, mcus_y) = _jpeg_forward(
        img, subsampling, gray
    )
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    planes = []
    for ci, (fx, fy) in enumerate(factors):
        bx, by = mcus_x * fx, mcus_y * fy
        q = (ql, qc)[qsel[ci]]
        deq = comp_blocks[ci].astype(np.float64) * q[None, :, :]
        spatial = np.einsum("xu,nuv,yv->nxy", M, deq, M) + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // fy, axis=0), hmax // fx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        yy = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([yy, yy, yy], axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _huge_sof_jpeg():
    """Valid-marker stream whose SOF0 claims 65500x65500 (~12.9 GB
    RGB) — the JPEG geometry bomb for the guard tests."""
    import numpy as np

    good = bytearray(_encode_jpeg(np.full((8, 8, 3), 90, dtype=np.uint8)))
    sof_at = good.index(b"\xff\xc0", 2)
    good[sof_at + 5 : sof_at + 7] = (65500).to_bytes(2, "big")
    good[sof_at + 7 : sof_at + 9] = (65500).to_bytes(2, "big")
    return bytes(good)


def test_decode_jpeg_matches_independent_reference():
    """Bit-exact golden across geometries (block-aligned, MCU-padded,
    odd) and every supported subsampling — two independent
    implementations of the same T.81 reconstruction."""
    import numpy as np

    from analytics_etl_spark.operators.multimodal import decode_jpeg

    rng = np.random.default_rng(7)
    for (h, w) in [(8, 8), (24, 24), (17, 23), (33, 31)]:
        for sub in ("444", "420", "422"):
            img = (rng.integers(0, 256, (h, w, 3), dtype=np.uint8) // 2 + 64).astype(
                np.uint8
            )
            got = decode_jpeg(_encode_jpeg(img, subsampling=sub))
            ref = _jpeg_reference_reconstruct(img, subsampling=sub)
            assert got.shape == (h, w, 3)
            assert np.array_equal(got, ref), (h, w, sub)


def test_decode_jpeg_restart_grayscale_and_fidelity():
    import numpy as np

    from analytics_etl_spark.operators.multimodal import decode_jpeg

    rng = np.random.default_rng(11)
    # restart intervals: predictors reset per RST, byte-realigned
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    got = decode_jpeg(_encode_jpeg(img, subsampling="420", restart=2))
    ref = _jpeg_reference_reconstruct(img, subsampling="420")
    assert np.array_equal(got, ref)
    # grayscale single-component stream, replicated to 3 channels
    g = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    got = decode_jpeg(_encode_jpeg(g, gray=True))
    ref = _jpeg_reference_reconstruct(g, gray=True)
    assert np.array_equal(got, ref)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])
    # physical fidelity on a flat image: only DC survives
    # quantization, so reconstruction error is bounded by one half
    # quantizer step through the color transform (~ a few codes)
    flat = np.full((16, 16, 3), (120, 80, 200), dtype=np.uint8)
    got = decode_jpeg(_encode_jpeg(flat, subsampling="444"))
    assert int(np.ptp(got[..., 0])) == 0  # flat stays flat per channel
    assert np.abs(got.astype(int) - flat.astype(int)).max() <= 12


def test_decode_jpeg_rejects_malformed():
    import numpy as np
    import pytest

    from analytics_etl_spark.operators.multimodal import decode_jpeg

    img = np.full((16, 16, 3), 90, dtype=np.uint8)
    good = _encode_jpeg(img)

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")
    # progressive frame: flip SOF0 marker to SOF2
    prog = bytearray(good)
    prog[prog.index(b"\xff\xc0", 2) + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(prog))
    # truncated entropy segment
    with pytest.raises(ValueError, match="truncated|invalid|no SOS"):
        decode_jpeg(good[: len(good) - (len(good) - good.index(b"\xff\xda")) // 2])
    # missing Huffman tables: excise the DHT segment
    i = good.index(b"\xff\xc4")
    ln = int.from_bytes(good[i + 2 : i + 4], "big")
    with pytest.raises(ValueError, match="missing"):
        decode_jpeg(good[:i] + good[i + 2 + ln :])
    # sampling factor 3 in SOF
    bad = bytearray(good)
    sof_at = bad.index(b"\xff\xc0", 2)
    bad[sof_at + 11] = 0x33  # comp 1 H=3,V=3
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(bad))


def test_decode_jpeg_huge_sof_rejected_before_alloc():
    """The PNG geometry-bomb stance for JPEG: a valid-marker SOF0
    claiming 65500x65500 (~12.9 GB of RGB) must be rejected at header
    parse, before any plane or coefficient allocation."""
    import tracemalloc

    import numpy as np
    import pytest

    from analytics_etl_spark.operators.multimodal import decode_jpeg

    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = bytearray(_encode_jpeg(img))
    sof_at = good.index(b"\xff\xc0", 2)
    good[sof_at + 5 : sof_at + 7] = (65500).to_bytes(2, "big")
    good[sof_at + 7 : sof_at + 9] = (65500).to_bytes(2, "big")
    payload = bytes(good)
    tracemalloc.start()
    with pytest.raises(ValueError, match="exceeds decode cap"):
        decode_jpeg(payload)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 << 20, f"allocated {peak} B on a rejected geometry"


def test_image_features_jpeg_and_dispatch_fallback():
    import numpy as np

    from analytics_etl_spark.operators.multimodal import (
        decode_stub,
        dispatch_features,
        image_features,
    )

    img = np.full((16, 16, 3), (120, 80, 200), dtype=np.uint8)
    payload = _encode_jpeg(img)
    feats = image_features(payload)
    assert feats[0] == 16.0 and feats[1] == 16.0
    assert abs(feats[2] - 120) <= 12 and abs(feats[4] - 200) <= 12
    assert dispatch_features(payload) == feats
    # corrupt JPEG magic -> deterministic fallback, never an abort
    junk = b"\xff\xd8\xffgarbage"
    assert dispatch_features(junk) == decode_stub(junk)
