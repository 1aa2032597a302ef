"""Metadata scrub: segment surgery must drop EXIF/comment/text blocks
while keeping the entropy-coded pixels byte-identical — across JPEG,
PNG, and GIF (static + animated), through both the pure functions and
the Spark operator (recorded errors, never thrown)."""

import numpy as np
import pandas as pd
import pytest

from edgar_crawler_spark.functions.gifcodec import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_frames,
)
from edgar_crawler_spark.functions.imaging import (
    decode_image,
    encode_image,
    encode_png,
)
from edgar_crawler_spark.functions.metadata import (
    add_gif_comment,
    add_jpeg_app1_exif,
    add_jpeg_comment,
    add_png_text,
    strip_image_metadata,
)

rng = np.random.default_rng(99)


def test_jpeg_scrub_drops_exif_and_comment():
    px = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    blob = encode_image(px, "jpeg")
    tagged = add_jpeg_comment(
        add_jpeg_app1_exif(blob, b"GPS\x00" + b"\x01" * 64), "shot on X"
    )
    clean, removed = strip_image_metadata(tagged)
    assert removed == ["COM", "APP1"]  # insertion order: COM was added last, sits first
    assert np.array_equal(decode_image(clean), decode_image(blob))
    # our encoder writes no strippable segments: scrub is a no-op on it
    assert strip_image_metadata(blob) == (blob, [])
    # idempotent
    assert strip_image_metadata(clean) == (clean, [])


def test_png_scrub_drops_text_chunk():
    px = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    blob = encode_png(px)
    tagged = add_png_text(blob, "Author", "someone@example.com")
    clean, removed = strip_image_metadata(tagged)
    assert removed == ["tEXt"]
    assert clean == blob  # exact byte restoration
    assert np.array_equal(decode_image(clean), px)


def test_gif_scrub_static_comment():
    px = (rng.integers(0, 6, size=(12, 9, 3)) * 51).astype(np.uint8)
    blob = encode_gif(px)
    tagged = add_gif_comment(blob, "made by someone")
    clean, removed = strip_image_metadata(tagged)
    assert removed == ["comment"]
    assert clean == blob
    assert np.array_equal(decode_gif(clean), px)


def test_gif_scrub_animated_keeps_netscape_loop():
    frames = (rng.integers(0, 4, size=(3, 8, 8, 3)) * 80).astype(np.uint8)
    blob = encode_gif_frames(frames, delay_cs=6)
    tagged = add_gif_comment(blob, "watermark")
    clean, removed = strip_image_metadata(tagged)
    assert removed == ["comment"]
    assert b"NETSCAPE2.0" in clean  # loop behavior survives the scrub
    fps, dec = decode_gif_frames(clean)
    assert np.array_equal(dec, frames)


def test_gif_scrub_drops_foreign_app_extension():
    px = (rng.integers(0, 6, size=(6, 6, 3)) * 51).astype(np.uint8)
    blob = encode_gif(px)
    # XMP-style application extension after the header (13-byte LSD, no GCT)
    app = b"\x21\xff\x0bXMP DataXMP" + b"\x05hello" + b"\x00"
    tagged = blob[:13] + app + blob[13:]
    clean, removed = strip_image_metadata(tagged)
    assert removed == ["app:XMP DataXMP"]
    assert clean == blob


def test_passthrough_containers():
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    for fmt in ("bmp", "qnt"):
        blob = encode_image(px, fmt)
        assert strip_image_metadata(blob) == (blob, [])
    with pytest.raises(ValueError):
        strip_image_metadata(b"not an image at all")


def test_scrub_operator(spark):
    """End-to-end over a tagged corpus: every clean row scrubbed with
    pixels intact, poisoned rows pass the ORIGINAL bytes through with
    the error class recorded."""
    from edgar_crawler_spark.fixtures.payload import payload_df, reference_pixels
    from edgar_crawler_spark.operators.multimodal import scrub_image_metadata

    pdf = payload_df(spark, 48).toPandas().sort_values("image_id").reset_index(drop=True)
    ids = {r.image_id: i for i, r in pdf.iterrows()}

    def tag(row):
        data = bytes(row["bytes"])
        if row.fmt == "jpeg":
            return add_jpeg_app1_exif(data, b"\x01" * 32)
        if row.fmt == "png":
            return add_png_text(data, "GPS", "1.23,4.56")
        if row.fmt == "gif":
            return add_gif_comment(data, "camera xyz")
        return data

    pdf["bytes"] = pdf.apply(tag, axis=1)
    poisoned = pdf.image_id.iloc[0]
    pdf.loc[0, "bytes"] = b"\xff\xd8garbage-jpeg-no-sos"
    out = (
        scrub_image_metadata(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("image_id")
    )
    assert len(out) == 48
    bad = out.loc[poisoned]
    assert bad.scrub_ok == "ValueError"
    assert bytes(bad.scrubbed) == b"\xff\xd8garbage-jpeg-no-sos"  # pass-through
    clean = out.drop(poisoned)
    assert (clean.scrub_ok == "ok").all()
    for image_id, r in clean.iterrows():
        i = int(image_id.split("-")[-1])
        expected = {"jpeg": ["APP1"], "png": ["tEXt"], "gif": ["comment"]}.get(
            r.fmt, []
        )
        assert list(r.removed_segments) == expected
        assert r.saved_bytes > 0 if expected else r.saved_bytes == 0
        px = decode_image(bytes(r.scrubbed))
        ref = reference_pixels(i)
        if r.fmt in ("png", "gif", "bmp"):
            assert np.array_equal(px, ref)
