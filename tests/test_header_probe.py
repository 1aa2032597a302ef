"""image_header_probe: JVM-only header sniff + fixed-offset dims.

The probe must agree with the real encoders byte-for-byte (every
codec in functions/imaging.py round-trips), catch corruption the
stored metadata hides, return NULLs for truncated/foreign blobs
instead of throwing, and keep the whole plan Python-free (that IS the
operator's reason to exist — assert it)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from edgar_crawler_spark.operators.multimodal import image_header_probe


def _rgb(h, w, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _probe(spark, rows):
    df = spark.createDataFrame(rows, ["image_id", "bytes"])
    out = image_header_probe(df)
    return {r.image_id: r for r in out.collect()}


def test_every_fixture_codec_roundtrips(spark):
    """Odd, non-square, >255-px dims exercise every multi-byte branch
    (PNG/QNT big-endian u32, GIF little-endian u16, BMP little-endian
    i32, VP8L 14-bit packed spanning the byte-23 split)."""
    from edgar_crawler_spark.functions.imaging import encode_image

    rows, want = [], {}
    for fmt in ("png", "gif", "bmp", "qnt", "webp"):
        for h, w in ((16, 16), (21, 37), (300, 259)):
            px = _rgb(h, w)
            if fmt == "gif":
                px = px - px % 51
            rows.append((f"{fmt}-{w}x{h}", bytearray(encode_image(px, fmt))))
            want[f"{fmt}-{w}x{h}"] = (fmt, w, h)
    got = _probe(spark, rows)
    for k, (fmt, w, h) in want.items():
        r = got[k]
        assert (r.fmt_sniffed, r.hdr_w, r.hdr_h) == (fmt, w, h), k


def test_jpeg_sniffed_dims_null(spark):
    from edgar_crawler_spark.functions.imaging import encode_image
    from edgar_crawler_spark.functions.jpegprog import encode_jpeg_progressive

    px = _rgb(24, 32)
    got = _probe(
        spark,
        [
            ("base", bytearray(encode_image(px, "jpeg"))),
            ("prog", bytearray(encode_jpeg_progressive(px))),
        ],
    )
    for r in got.values():
        assert r.fmt_sniffed == "jpeg" and r.hdr_w is None and r.hdr_h is None


def test_corruption_and_truncation(spark):
    """A flipped size field must surface through hdr_w (the stored-
    metadata mismatch the probe exists to catch); truncated and
    foreign blobs yield NULLs, never errors."""
    from edgar_crawler_spark.functions.imaging import encode_image

    good = bytearray(encode_image(_rgb(16, 24), "png"))
    lied = bytearray(good)
    lied[16:20] = (9999).to_bytes(4, "big")  # overwrite IHDR width
    got = _probe(
        spark,
        [
            ("good", good),
            ("lied", lied),
            ("trunc", good[:12]),  # magic survives, IHDR gone
            ("foreign", bytearray(b"\x00\x01\x02\x03" * 8)),
            ("empty", bytearray(b"")),
        ],
    )
    assert (got["good"].hdr_w, got["good"].hdr_h) == (24, 16)
    assert got["lied"].hdr_w == 9999 and got["lied"].hdr_h == 16
    assert got["trunc"].fmt_sniffed is None and got["trunc"].hdr_w is None
    assert got["foreign"].fmt_sniffed is None
    assert got["empty"].fmt_sniffed is None and got["empty"].hdr_w is None


def test_bmp_topdown_negative_height(spark):
    """Real-world BMPs may store a negative (top-down) height; the
    probe reports magnitude."""
    from edgar_crawler_spark.functions.imaging import encode_image

    data = bytearray(encode_image(_rgb(20, 30), "bmp"))
    data[22:26] = (-20 & 0xFFFFFFFF).to_bytes(4, "little")
    got = _probe(spark, [("td", data)])
    assert (got["td"].hdr_w, got["td"].hdr_h) == (30, 20)


def test_vp8x_canvas_dims(spark):
    """Animated WebP (VP8X) canvas size at the 24-bit fixed offsets."""
    from edgar_crawler_spark.functions.webpcodec import encode_webp_anim

    frames = [_rgb(18, 26, seed=s) for s in range(3)]
    got = _probe(spark, [("anim", bytearray(encode_webp_anim(frames)))])
    r = got["anim"]
    assert (r.fmt_sniffed, r.hdr_w, r.hdr_h) == ("webp", 26, 18)


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([("a", bytearray(b"x"))], ["image_id", "bytes"])
    plan = image_header_probe(df)._jdf.queryExecution().executedPlan().toString()
    for marker in ("Python", "MapInPandas", "ArrowEval", "BatchEval"):
        assert marker not in plan, marker


def test_tiff_sniffed_dims_null(spark):
    from edgar_crawler_spark.functions.tiffcodec import encode_tiff

    px = _rgb(12, 9)
    got = _probe(spark, [("t", bytearray(encode_tiff(px)))])
    r = got["t"]
    assert r.fmt_sniffed == "tiff" and r.hdr_w is None and r.hdr_h is None
