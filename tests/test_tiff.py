"""Baseline TIFF codec: round-trips, foreign layouts, LZW early change.

The encoder exists so the decoder can be exercised without fixtures —
but foreign-layout tests build their streams by hand (big-endian,
grayscale photometrics, palettes, alpha) so the decoder is not just
validated against its own writer."""

import struct

import numpy as np
import pytest

from edgar_crawler_spark.functions.tiffcodec import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def _rgb(h, w, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
def test_roundtrip_compressions(comp):
    px = _rgb(21, 17)
    data = encode_tiff(px, compression=comp)
    assert data[:4] == b"II*\x00"
    assert np.array_equal(decode_tiff(data), px)


def test_roundtrip_multistrip_and_predictor():
    px = _rgb(30, 13, seed=9)
    multi = encode_tiff(px, compression="packbits", rows_per_strip=7)
    assert np.array_equal(decode_tiff(multi), px)
    pred = encode_tiff(px, compression="lzw", predictor=True)
    assert np.array_equal(decode_tiff(pred), px)
    # predictor turns smooth gradients into tiny deltas → smaller file
    grad = np.tile(np.arange(256, dtype=np.uint8)[None, :, None], (16, 1, 3))
    assert len(encode_tiff(grad, "lzw", predictor=True)) < len(
        encode_tiff(grad, "lzw")
    )


def test_lzw_early_change_width_growth():
    """>510 table entries forces 9→10-bit codes (and the off-by-one
    early switch); >1022 forces 11. A non-repeating byte stream grows
    the table one entry per symbol."""
    rng = np.random.default_rng(4)
    data = bytes(rng.integers(0, 256, 5000, dtype=np.uint8))
    enc = _lzw_encode_tiff(data)
    assert _lzw_decode_tiff(enc, len(data)) == data
    # and a table-reset-sized stream (>4094 entries → CLEAR mid-stream)
    big = bytes(rng.integers(0, 256, 9000, dtype=np.uint8))
    assert _lzw_decode_tiff(_lzw_encode_tiff(big), len(big)) == big


def test_packbits_spec_vectors():
    # the spec's worked example (TIFF 6.0 §9)
    src = bytes.fromhex("aaaaaa80002aaaaaaaaaaa80002a22aaaaaaaaaaaaaaaaaaaa")
    enc = _packbits_encode(src)
    assert _packbits_decode(enc, len(src)) == src
    assert len(enc) < len(src)


def _ifd_entry(tag, typ, count, val4):
    return struct.pack(">HHI", tag, typ, count) + val4


def test_foreign_bigendian_grayscale_miniswhite():
    """Hand-built MM-order grayscale file with PhotometricInterpretation
    0 (MinIsWhite): values must come back inverted, replicated to RGB."""
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    strip = g.tobytes()
    entries = [
        (256, 3, 1, struct.pack(">HH", 6, 0)),
        (257, 3, 1, struct.pack(">HH", 4, 0)),
        (258, 3, 1, struct.pack(">HH", 8, 0)),
        (259, 3, 1, struct.pack(">HH", 1, 0)),
        (262, 3, 1, struct.pack(">HH", 0, 0)),  # MinIsWhite
        (273, 4, 1, struct.pack(">I", 0)),  # patched below
        (277, 3, 1, struct.pack(">HH", 1, 0)),
        (278, 4, 1, struct.pack(">I", 4)),
        (279, 4, 1, struct.pack(">I", len(strip))),
    ]
    ifd = struct.pack(">H", len(entries))
    for t, ty, c, v in entries:
        ifd += _ifd_entry(t, ty, c, v)
    ifd += struct.pack(">I", 0)
    strip_off = 8 + len(ifd)
    ifd = ifd.replace(
        _ifd_entry(273, 4, 1, struct.pack(">I", 0)),
        _ifd_entry(273, 4, 1, struct.pack(">I", strip_off)),
    )
    data = struct.pack(">2sHI", b"MM", 42, 8) + ifd + strip
    out = decode_tiff(data)
    assert out.shape == (4, 6, 3)
    assert np.array_equal(out[:, :, 0], 255 - g)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_foreign_palette_and_alpha():
    """Palette (photometric 3, 16-bit ColorMap) and RGBA (extra sample
    dropped) through the writer's layout with surgical edits."""
    # palette: build by hand on top of the encoder's container
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    cmap = np.zeros((3, 256), dtype=np.uint16)
    cmap[0, :4] = [0, 65535, 0, 30000]
    cmap[1, :4] = [65535, 0, 0, 30000]
    cmap[2, :4] = [0, 0, 65535, 30000]
    entries = [
        (256, 3, 1, struct.pack("<HH", 2, 0)),
        (257, 3, 1, struct.pack("<HH", 2, 0)),
        (258, 3, 1, struct.pack("<HH", 8, 0)),
        (259, 3, 1, struct.pack("<HH", 1, 0)),
        (262, 3, 1, struct.pack("<HH", 3, 0)),  # palette
        (273, 4, 1, None),  # strip offset, laid out below
        (277, 3, 1, struct.pack("<HH", 1, 0)),
        (278, 4, 1, struct.pack("<I", 2)),
        (279, 4, 1, struct.pack("<I", 4)),
        (320, 3, 768, None),  # colormap, out-of-line
    ]
    ifd_size = 2 + 12 * len(entries) + 4
    cmap_off = 8 + ifd_size
    strip_off = cmap_off + 768 * 2
    body = struct.pack("<H", len(entries))
    for t, ty, c, v in entries:
        if t == 273:
            v = struct.pack("<I", strip_off)
        elif t == 320:
            v = struct.pack("<I", cmap_off)
        body += struct.pack("<HHI", t, ty, c) + v
    body += struct.pack("<I", 0)
    data = (
        struct.pack("<2sHI", b"II", 42, 8)
        + body
        + cmap.tobytes()
        + idx.tobytes()
    )
    out = decode_tiff(data)
    assert out.shape == (2, 2, 3)
    assert tuple(out[0, 0]) == (0, 255, 0)
    assert tuple(out[0, 1]) == (255, 0, 0)
    assert tuple(out[1, 1]) == (30000 >> 8,) * 3

    # RGBA: take an encoded RGB file, rewrite spp to 4 with alpha data
    px = _rgb(3, 3, seed=5)
    rgba = np.dstack([px, np.full((3, 3), 200, np.uint8)])
    raw = encode_tiff(px, compression="none")
    patched = raw.replace(
        struct.pack("<HHI", 277, 3, 1) + struct.pack("<HH", 3, 0),
        struct.pack("<HHI", 277, 3, 1) + struct.pack("<HH", 4, 0),
    )
    # swap the strip bytes (same length header; rgba strip is larger so
    # rebuild via the hand path: easiest is appending the rgba strip)
    strip = rgba.tobytes()
    # patch strip offset+count to point at appended data
    old_cnt = struct.pack("<HHI", 279, 4, 1) + struct.pack("<I", 27)
    new_cnt = struct.pack("<HHI", 279, 4, 1) + struct.pack("<I", len(strip))
    assert old_cnt in patched
    patched = patched.replace(old_cnt, new_cnt)
    off_tag = struct.pack("<HHI", 273, 4, 1)
    at = patched.index(off_tag) + 8
    patched = patched[:at] + struct.pack("<I", len(patched)) + patched[at + 4 :]
    patched += strip
    # BitsPerSample stays (8,8,8) count 3 — decoder only requires all-8
    out = decode_tiff(patched)
    assert np.array_equal(out, px)  # alpha dropped


def test_named_unsupported_and_corrupt():
    px = _rgb(4, 4)
    data = bytearray(encode_tiff(px, compression="none"))
    comp_tag = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 1, 0)
    at = bytes(data).index(comp_tag) + 8
    data[at:at + 2] = struct.pack("<H", 3)  # CCITT G4
    with pytest.raises(NotImplementedError, match="CCITT"):
        decode_tiff(bytes(data))
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00" + b"\x00" * 2)
    with pytest.raises(ValueError):
        decode_tiff(encode_tiff(px)[:20])  # truncated strips


def test_dispatch_and_sniff():
    from edgar_crawler_spark.functions.imaging import decode_image, sniff_format

    px = _rgb(8, 10, seed=7)
    data = encode_tiff(px, compression="lzw")
    assert sniff_format(data) == "tiff"
    assert np.array_equal(decode_image(data), px)


def test_tiff_native_exif_extract_and_scrub():
    """TIFF IS the EXIF container: IFD0 camera tags parse directly;
    the scrub removes the entries AND zeroes their out-of-line value
    bytes while pixels survive byte-identically."""
    from edgar_crawler_spark.functions.metadata import (
        parse_exif,
        strip_image_metadata,
    )

    px = _rgb(6, 8, seed=11)
    data = encode_tiff(
        px,
        compression="packbits",
        make="scanmaker",
        model="model-9000",
        datetime="2021:07:01 09:00:00",
        orientation=6,
    )
    meta = parse_exif(data)
    assert meta["make"] == "scanmaker" and meta["model"] == "model-9000"
    assert meta["orientation"] == 6 and meta["datetime"].startswith("2021:07")
    assert np.array_equal(decode_tiff(data), px)

    scrubbed, removed = strip_image_metadata(data)
    assert len(scrubbed) == len(data)
    assert {"Make", "Model", "DateTime"} <= set(removed)
    assert parse_exif(scrubbed) == {}
    assert b"scanmaker" not in scrubbed and b"model-9000" not in scrubbed
    assert np.array_equal(decode_tiff(scrubbed), px)
    # idempotent: nothing left to remove
    again, removed2 = strip_image_metadata(scrubbed)
    assert removed2 == [] and again == scrubbed


def test_tiff_gps_subifd_scrub():
    """A hand-grafted GPS sub-IFD (pointer tag 0x8825): the scrub must
    zero the ENTIRE pointed block including its out-of-line rationals,
    not just drop the pointer."""
    import struct

    from edgar_crawler_spark.functions.metadata import (
        parse_exif,
        strip_image_metadata,
    )

    px = _rgb(4, 4, seed=13)
    base = encode_tiff(px, compression="none", make="gpscam")
    # graft: replace the Make tag (0x010F) with a GPS-IFD pointer to an
    # appended sub-IFD carrying lat/lon rationals
    gps_at = len(base)
    lat = (37, 1, 46, 1, 30, 1)  # 37°46'30"
    lon = (122, 1, 25, 1, 0, 1)
    vals_at = gps_at + 2 + 12 * 4 + 4
    sub = struct.pack("<H", 4)
    sub += struct.pack("<HHI", 1, 2, 2) + b"N\x00\x00\x00"
    sub += struct.pack("<HHI", 2, 5, 3) + struct.pack("<I", vals_at)
    sub += struct.pack("<HHI", 3, 2, 2) + b"W\x00\x00\x00"
    sub += struct.pack("<HHI", 4, 5, 3) + struct.pack("<I", vals_at + 24)
    sub += struct.pack("<I", 0)
    sub += struct.pack("<6I", *lat) + struct.pack("<6I", *lon)
    make_entry_at = base.index(struct.pack("<HHI", 0x010F, 2, len("gpscam") + 1))
    patched = bytearray(base + sub)
    patched[make_entry_at : make_entry_at + 12] = struct.pack(
        "<HHII", 0x8825, 4, 1, gps_at
    )
    meta = parse_exif(bytes(patched))
    assert abs(meta["gps_lat"] - 37.775) < 1e-6 and meta["gps_lon"] < 0
    scrubbed, removed = strip_image_metadata(bytes(patched))
    assert "GPS" in removed
    out = parse_exif(scrubbed)
    assert "gps_lat" not in out and "gps_lon" not in out
    assert scrubbed[vals_at : vals_at + 48] == b"\x00" * 48  # rationals gone
    assert np.array_equal(decode_tiff(scrubbed), px)


def test_tiff_nested_interop_subifd_scrub():
    """An Interop IFD (0xA005) nested INSIDE the Exif IFD (0x8769):
    the scrub must recurse through the inline LONG pointer and zero
    the nested block too, not just the first-level table."""
    import struct

    from edgar_crawler_spark.functions.metadata import strip_image_metadata

    px = _rgb(4, 4, seed=17)
    base = encode_tiff(px, compression="none", make="nestcam")
    # layout appended after the file: [exif IFD][interop IFD][interop value]
    exif_at = len(base)
    exif_size = 2 + 12 * 1 + 4
    interop_at = exif_at + exif_size
    interop_val_at = interop_at + 2 + 12 * 1 + 4
    secret = b"R98-secret\x00\x00"
    exif = struct.pack("<H", 1)
    exif += struct.pack("<HHII", 0xA005, 4, 1, interop_at)
    exif += struct.pack("<I", 0)
    interop = struct.pack("<H", 1)
    interop += struct.pack("<HHII", 0x0001, 2, len(secret), interop_val_at)
    interop += struct.pack("<I", 0)
    make_entry_at = base.index(struct.pack("<HHI", 0x010F, 2, len("nestcam") + 1))
    patched = bytearray(base + exif + interop + secret)
    patched[make_entry_at : make_entry_at + 12] = struct.pack(
        "<HHII", 0x8769, 4, 1, exif_at
    )
    scrubbed, removed = strip_image_metadata(bytes(patched))
    assert "ExifIFD" in removed
    assert b"R98-secret" not in scrubbed
    assert scrubbed[interop_at : interop_at + 18] == b"\x00" * 18
    assert np.array_equal(decode_tiff(scrubbed), px)


def test_tiff_zero_height_named_error():
    """h==0 (no decodable strips) raises the module's named ValueError,
    not a bare IndexError — per-row kernels record the error class."""
    px = _rgb(4, 4)
    data = bytearray(encode_tiff(px, compression="none"))
    len_tag = struct.pack("<HHI", 257, 4, 1) + struct.pack("<I", 4)
    at = bytes(data).index(len_tag) + 8
    data[at : at + 4] = struct.pack("<I", 0)
    with pytest.raises(ValueError, match="no image rows"):
        decode_tiff(bytes(data))
