"""Synthetic image+caption payload table (FIXTURES.md §B; BASELINE.json
input_hint schema verbatim):

    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)

Pixels are a pure function of the row index (np.random.default_rng(seed
+ i)), encoded per-fmt by the codecs in functions/imaging.py. Generated
via ``spark.range(n).mapInPandas`` — Arrow-batched, partition-parallel,
no driver loop — so the stub fetcher can "download" by joining this
table keyed on image_id = accession instead of the network.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

DEFAULT_SEED = 42


def make_payload_row(i: int, seed: int = DEFAULT_SEED) -> dict:
    """Pure (seed, i) → payload row. Shared by the Spark generator and
    the tests' reference oracle (both call this exact function, so the
    per-row invariant check is against the true generator output).

    Memoized per worker process (bounded LRU): the simulated origin
    serves IDENTICAL bytes for a URL on every fetch — exactly like a
    real origin serving stored files — so the synthesis encode runs
    once per (i, seed) per worker instead of once per fetch. The
    engine-side decode+validate path still pays per fetch; only the
    bench harness's encode-side simulation cost is amortized (the r04
    verdict explicitly separates the two). Callers get a shallow copy;
    the bytes objects are immutable."""
    return dict(_payload_row_memo(int(i), int(seed)))


@lru_cache(maxsize=4096)  # rows carry image bytes: 64k entries × 32
# workers pinned multi-GB of resident cache at the 1M-URL bench
def _payload_row_memo(i: int, seed: int) -> dict:
    from edgar_crawler_spark.functions.imaging import average_hash, encode_image

    rng = np.random.default_rng(seed + i)
    w = 16 + int(i % 3) * 8  # 16/24/32 px
    h = 16 + int(i % 5) * 4
    # lossy rows are 1 in 3; of those, every 7th is REAL JPEG — half
    # baseline (functions/jpegcodec.py), half progressive/SOF2
    # (functions/jpegprog.py; same quantized coefficients, so the same
    # PSNR contract) — and the rest the cheap QNT stand-in: the frontier
    # fetch benchmark pays this codec per URL, so the bulk stays on the
    # ~50x-cheaper path while both real decoders run end-to-end.  Of the
    # lossless majority, sparse deterministic slices are BMP and GIF
    # (functions/gifcodec.py; pixels posterized to <= 216 colors so the
    # palette is exact and the round-trip lossless — matching how real
    # GIFs are born palettized, and keeping the PSNR >= 40 dB contract).
    if i % 3 == 0:
        fmt = "jpeg" if i % 21 == 0 else "qnt"
    elif i % 11 == 4:
        fmt = "bmp"
    elif i % 13 == 6:
        fmt = "gif"
    elif i % 17 == 8:
        fmt = "webp"  # lossless VP8L (functions/webpcodec.py)
    else:
        fmt = "png"
    pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if fmt == "gif":
        pixels = pixels - pixels % 51
    if fmt == "jpeg" and i % 42 == 0:
        from edgar_crawler_spark.functions.jpegprog import encode_jpeg_progressive

        data = encode_jpeg_progressive(pixels)
    else:
        data = encode_image(pixels, fmt)
    cik = 100000 + i % 997
    image_id = f"{cik:0>10}-22-{i:06d}"  # = accession in seed_index
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": f"image {image_id} {w}x{h} {fmt}",
        "phash": average_hash(pixels),
    }


def payload_df(spark: SparkSession, n: int = 1000, seed: int = DEFAULT_SEED) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([make_payload_row(int(i), seed) for i in pdf["id"]])

    # repartition so generation parallelizes even for small n
    return spark.range(n).repartition(8).mapInPandas(gen, PAYLOAD_SCHEMA)


def reference_pixels(i: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """The oracle's source pixels for row i (pre-encode). Mirrors
    :func:`make_payload_row` exactly — including the GIF rows'
    posterization, which happens BEFORE encode and so is part of the
    reference, not codec loss."""
    rng = np.random.default_rng(seed + i)
    w = 16 + int(i % 3) * 8
    h = 16 + int(i % 5) * 4
    pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if i % 3 != 0 and i % 11 != 4 and i % 13 == 6:
        pixels = pixels - pixels % 51
    return pixels


def audio_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic WAV corpus: PCM-16 sine clips whose
    frequency/duration/amplitude are pure functions of the row id
    (every 13th blob is poisoned — truncated RIFF — to exercise the
    never-throws contract). Generated partition-parallel via
    mapInPandas, like :func:`payload_df`."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = {"media_id": [], "bytes": []}
            for i in pdf["id"]:
                i = int(i)
                rows["media_id"].append(f"clip{i:05d}")
                if i % 13 == 5:
                    rows["bytes"].append(b"RIFFbroken-not-a-wav")
                    continue
                rate = 8000
                freq = 110.0 * (1 + i % 8)
                dur = 0.1 + (i % 4) * 0.05
                amp = 0.2 + (i % 5) * 0.15
                t = np.arange(int(rate * dur)) / rate
                sig = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(rate)
                    wf.writeframes(sig.tobytes())
                rows["bytes"].append(buf.getvalue())
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(8).mapInPandas(gen, "media_id string, bytes binary")


def make_video_frames(i: int) -> "np.ndarray":
    """Pure row-id → (n_frames, h, w, 3) uint8 frames. Shared by the
    Spark generator and the tests' reference oracle (same contract as
    :func:`make_payload_row`). Widths include non-multiple-of-4 strides
    so DIB scanline padding is exercised.

    Frames are TEMPORALLY CORRELATED like real video: smooth sinusoid
    'scenes' whose phase drifts slowly frame-to-frame (camera motion),
    with a hard SCENE CUT halfway through every even-id clip.  So
    within-scene consecutive frames are perceptual near-duplicates and
    cut boundaries are not — the signal the frame-dedup /
    scene-detection composite consumes."""
    rng = np.random.default_rng(7000 + i)
    n_frames = 4 + i % 5
    w = 10 + (i % 3) * 2  # 10/12/14 px → stride padding on 10 & 14
    h = 8 + (i % 4) * 2

    def scene_params():
        return (
            rng.uniform(0.5, 2.0, size=3),  # fy per channel
            rng.uniform(0.5, 2.0, size=3),  # fx per channel
            rng.uniform(0.0, 1.0, size=3),  # phase per channel
        )

    ys = np.linspace(0.0, 1.0, h)[:, None]
    xs = np.linspace(0.0, 1.0, w)[None, :]
    fy, fx, ph = scene_params()
    cut_at = n_frames // 2 if i % 2 == 0 and n_frames >= 4 else None
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    drift = 0.0
    for k in range(n_frames):
        if k == cut_at:
            fy, fx, ph = scene_params()  # hard cut: new scene
            drift = 0.0
        px = np.empty((h, w, 3))
        for c in range(3):
            px[:, :, c] = 128 + 110 * np.sin(
                2 * np.pi * (fy[c] * ys + fx[c] * xs + ph[c] + drift)
            )
        frames[k] = np.clip(px, 0, 255).astype(np.uint8)
        drift += 0.01
    return frames


def video_df(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic synthetic video corpus: clips whose frames are
    a pure function of the row id — most uncompressed-RGB24 AVI, every
    7th REAL MJPEG (per-frame baseline JPEG at quality 98, the lossy
    decode path through functions/jpegcodec.py), every 9th an ANIMATED
    GIF (functions/gifcodec.py; the sinusoid frames have <= h*w <= 256
    distinct colors, so the palette is exact and decode lossless),
    every 8th an ANIMATED WEBP (functions/webpcodec.py — lossless
    VP8L frames with dirty-rect delta ANMF sub-rectangles, 40 ms ≈
    25 fps).
    Every 13th blob is poisoned (truncated RIFF) and every 11th is
    patched to an UNSUPPORTED compressed fourcc (H264) — exercising
    both recorded-error paths of
    :func:`~edgar_crawler_spark.operators.multimodal.sample_video_frames`."""

    def gen(batches):
        from edgar_crawler_spark.functions.gifcodec import encode_gif_frames
        from edgar_crawler_spark.functions.imaging import encode_avi_mjpg, encode_avi_rgb
        from edgar_crawler_spark.functions.webpcodec import encode_webp_anim

        for pdf in batches:
            rows = {"media_id": [], "bytes": []}
            for i in pdf["id"]:
                i = int(i)
                rows["media_id"].append(f"vid{i:05d}")
                if i % 13 == 5:
                    rows["bytes"].append(b"RIFF\x10\x00\x00\x00AVI truncated")
                    continue
                if i % 11 != 3 and i % 7 == 1:
                    rows["bytes"].append(
                        encode_avi_mjpg(make_video_frames(i), fps=24, quality=98)
                    )
                    continue
                if i % 11 != 3 and i % 9 == 2:
                    # delay 4 cs ≈ 25 fps — the GIF time base can't hit 24
                    rows["bytes"].append(
                        encode_gif_frames(make_video_frames(i), delay_cs=4)
                    )
                    continue
                if i % 11 != 3 and i % 8 == 4:
                    rows["bytes"].append(
                        encode_webp_anim(make_video_frames(i), durations_ms=40)
                    )
                    continue
                data = encode_avi_rgb(make_video_frames(i), fps=24)
                if i % 11 == 3:  # byte-surgery: claim an unsupported codec
                    data = bytearray(data)
                    at = bytes(data).find(b"strf")
                    data[at + 8 + 16 : at + 8 + 20] = b"H264"
                    data = bytes(data)
                rows["bytes"].append(data)
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(8).mapInPandas(gen, "media_id string, bytes binary")


def mixed_audio_df(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic mixed-container audio corpus for the header probe:
    rows cycle WAV (real PCM, the only decodable container here) with
    structurally-valid MP3 / FLAC / Ogg-Opus / Ogg-Vorbis stub headers
    (functions/audioprobe.py writers — probe fixtures, no decode
    claim); every 13th blob is poisoned. All parameters are pure
    functions of the row id so tests and the catalog row can assert
    field-level parity."""
    import io
    import wave

    def gen(batches):
        from edgar_crawler_spark.functions.audioprobe import (
            encode_flac_stub,
            encode_mp3_stub,
            encode_ogg_stub,
        )

        for pdf in batches:
            rows = {"media_id": [], "bytes": []}
            for i in pdf["id"]:
                i = int(i)
                rows["media_id"].append(f"au{i:05d}")
                if i % 13 == 5:
                    rows["bytes"].append(b"\x89PNG not audio")
                    continue
                k = i % 5
                if k == 0:
                    rate = 8000 * (1 + i % 3)
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wf:
                        wf.setnchannels(1 + i % 2)
                        wf.setsampwidth(2)
                        wf.setframerate(rate)
                        wf.writeframes(b"\x00\x00" * (1 + i % 2) * (rate // 4))
                    rows["bytes"].append(buf.getvalue())
                elif k == 1:
                    rows["bytes"].append(
                        encode_mp3_stub(
                            n_frames=10 + i % 30,
                            sample_rate=[44100, 48000, 32000][i % 3],
                            kbps=[64, 128, 192][i % 3],
                            channels=1 + i % 2,
                        )
                    )
                elif k == 2:
                    rows["bytes"].append(
                        encode_flac_stub(
                            sample_rate=[22050, 44100, 48000][i % 3],
                            channels=1 + i % 2,
                            n_samples=4000 * (1 + i % 7),
                        )
                    )
                else:
                    rows["bytes"].append(
                        encode_ogg_stub(
                            "opus" if k == 3 else "vorbis",
                            sample_rate=48000 if k == 3 else [44100, 48000][i % 2],
                            channels=1 + i % 2,
                            n_samples=9600 * (1 + i % 5),
                        )
                    )
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(8).mapInPandas(gen, "media_id string, bytes binary")
