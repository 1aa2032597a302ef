"""EXIF build/parse (functions/metadata.py) and the
extract_image_metadata operator: typed camera/GPS columns with the
has_gps PII gate, per-row error recording."""

import struct

import numpy as np
import pytest

from edgar_crawler_spark.functions.jpegcodec import encode_jpeg
from edgar_crawler_spark.functions.metadata import (
    add_jpeg_app1_exif,
    build_exif,
    extract_jpeg_exif,
    parse_exif,
    strip_jpeg_metadata,
)


def test_build_parse_roundtrip_all_fields():
    p = build_exif(
        make="maker1",
        model="modelX",
        orientation=6,
        datetime="2022:01:05 12:00:00",
        gps=(12.5, -101.25),
    )
    d = parse_exif(p)
    assert d == {
        "make": "maker1",
        "model": "modelX",
        "orientation": 6,
        "datetime": "2022:01:05 12:00:00",
        "gps_lat": 12.5,
        "gps_lon": -101.25,
    }


def test_build_parse_partial_fields():
    assert parse_exif(build_exif(make="m", orientation=1)) == {
        "make": "m",
        "orientation": 1,
    }
    assert parse_exif(build_exif()) == {}


def test_gps_sign_conventions():
    d = parse_exif(build_exif(gps=(-33.5, 151.25)))
    assert d["gps_lat"] == -33.5 and d["gps_lon"] == 151.25


def test_big_endian_payload():
    mm = (
        struct.pack(">2sHI", b"MM", 42, 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHI", 0x0112, 3, 1)
        + struct.pack(">H", 5)
        + b"\x00\x00"
        + struct.pack(">I", 0)
    )
    assert parse_exif(mm) == {"orientation": 5}


def test_truncated_payload_partial_not_throw():
    """Crawled EXIF is routinely cut short: truncation yields partial
    results (never an exception past the 8-byte header)."""
    p = build_exif(make="maker1", model="modelX", gps=(1.5, 2.25))
    with pytest.raises(ValueError):
        parse_exif(p[:4])
    for cut in range(8, len(p)):
        r = parse_exif(p[:cut])
        assert isinstance(r, dict)
    # cutting the GPS rationals drops GPS but keeps IFD0 strings
    r = parse_exif(p[: len(p) - 5])
    assert r.get("make") == "maker1" and "gps_lon" not in r


def test_jpeg_extract_and_scrub_removes():
    img = encode_jpeg(np.zeros((16, 16, 3), np.uint8))
    assert extract_jpeg_exif(img) is None
    tagged = add_jpeg_app1_exif(img, build_exif(make="cam", gps=(10.5, 20.25)))
    meta = extract_jpeg_exif(tagged)
    assert meta["make"] == "cam" and meta["gps_lat"] == 10.5
    scrubbed, removed = strip_jpeg_metadata(tagged)
    assert "APP1" in removed
    assert extract_jpeg_exif(scrubbed) is None


def test_webp_exif_roundtrip_and_scrub():
    """Extended-WebP EXIF: tag → decode still works (chunk walk) →
    extract parses → scrub restores the simple file byte-identically
    and clears the VP8X wrapper."""
    from edgar_crawler_spark.functions.metadata import (
        add_webp_exif,
        extract_webp_exif,
        strip_image_metadata,
        strip_webp_metadata,
    )
    from edgar_crawler_spark.functions.webpcodec import decode_webp, encode_webp

    px = np.random.default_rng(2).integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
    simple = encode_webp(px)
    assert extract_webp_exif(simple) is None
    assert strip_webp_metadata(simple) == (simple, [])

    tagged = add_webp_exif(simple, build_exif(make="cam", orientation=6, gps=(1.5, 2.25)))
    assert np.array_equal(decode_webp(tagged), px)
    meta = extract_webp_exif(tagged)
    assert meta["make"] == "cam" and meta["gps_lat"] == 1.5
    scrubbed, removed = strip_image_metadata(tagged)
    assert removed == ["EXIF"] and scrubbed == simple
    # the 'Exif\0\0'-prefixed payload form some writers emit
    prefixed = add_webp_exif(simple, b"Exif\x00\x00" + build_exif(model="m2"))
    assert extract_webp_exif(prefixed) == {"model": "m2"}


def test_extract_image_metadata_operator(spark):
    """Mixed corpus: tagged JPEG (with/without GPS), untagged JPEG,
    PNG, poisoned blob — per-row statuses, typed values, has_gps."""
    from edgar_crawler_spark.functions.imaging import encode_png
    from edgar_crawler_spark.operators.multimodal import extract_image_metadata

    from edgar_crawler_spark.functions.metadata import add_webp_exif
    from edgar_crawler_spark.functions.webpcodec import encode_webp

    img = encode_jpeg(np.zeros((16, 16, 3), np.uint8))
    webp = encode_webp(np.zeros((16, 16, 3), np.uint8))
    rows = [
        ("gps", add_jpeg_app1_exif(img, build_exif(make="cam0", orientation=3, gps=(42.5, -7.25)))),
        ("nogps", add_jpeg_app1_exif(img, build_exif(make="cam1", model="m9"))),
        ("plain", img),
        ("png", encode_png(np.zeros((8, 8, 3), np.uint8))),
        ("badexif", add_jpeg_app1_exif(img, b"\x01" * 16)),
        ("poisoned", b"\xff\xd8\xff"),
        ("webpgps", add_webp_exif(webp, build_exif(model="w1", gps=(3.5, 4.25)))),
        ("webpplain", webp),
    ]
    out = {
        r.image_id: r
        for r in extract_image_metadata(
            spark.createDataFrame(rows, ["image_id", "bytes"])
        ).collect()
    }
    assert out["gps"].exif_ok == "ok" and out["gps"].has_gps
    assert out["gps"].exif_make == "cam0" and out["gps"].exif_orientation == 3
    assert out["gps"].gps_lat == 42.5 and out["gps"].gps_lon == -7.25
    assert out["nogps"].exif_ok == "ok" and out["nogps"].has_gps is False
    assert out["nogps"].exif_model == "m9" and out["nogps"].gps_lat is None
    assert out["plain"].exif_ok == "none"
    assert out["png"].exif_ok == "none"
    assert out["badexif"].exif_ok == "ValueError"
    assert out["poisoned"].exif_ok == "none"  # header walk finds no APP1
    assert out["webpgps"].exif_ok == "ok" and out["webpgps"].has_gps
    assert out["webpgps"].exif_model == "w1" and out["webpgps"].gps_lon == 4.25
    assert out["webpplain"].exif_ok == "none"
