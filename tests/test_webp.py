"""WebP lossless (VP8L) codec tests — feature-matrix round-trips plus
hand-assembled streams that pin the bit layout to the spec (RFC 9649)
rather than to our own encoder's habits."""

import struct

import numpy as np
import pytest

from edgar_crawler_spark.functions.imaging import (
    decode_image,
    encode_image,
    sniff_format,
)
from edgar_crawler_spark.functions.webpcodec import (
    _BitWriter,
    decode_webp,
    encode_webp,
)

rng = np.random.default_rng(20260818)


@pytest.mark.parametrize("shape", [(8, 8), (13, 7), (1, 1), (32, 32), (5, 40)])
@pytest.mark.parametrize(
    "opts",
    [
        {},
        {"subtract_green": False},
        {"use_lz77": False},
        {"cache_bits": 5},
        {"short_codes": True},
        {"cache_bits": 3, "short_codes": True},
    ],
)
def test_roundtrip_feature_matrix(shape, opts):
    px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    blob = encode_webp(px, **opts)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP" and blob[12:16] == b"VP8L"
    assert np.array_equal(decode_webp(blob), px)


@pytest.mark.parametrize("levels", [2, 4, 13, 200])
def test_palette_packing(levels):
    px = (rng.integers(0, levels, size=(10, 17, 3)) * (255 // max(1, levels - 1))).astype(
        np.uint8
    )
    blob = encode_webp(px, palette=True)
    assert np.array_equal(decode_webp(blob), px)


def test_predictor_all_modes():
    # every predictor mode appears in the per-block mode image
    px = rng.integers(0, 256, size=(33, 39, 3), dtype=np.uint8)
    modes = (np.arange(5 * 5).reshape(5, 5) % 14).astype(np.uint8)
    blob = encode_webp(px, predictor_modes=modes, predictor_size_bits=3)
    assert np.array_equal(decode_webp(blob), px)


def test_color_transform_and_stacking():
    px = rng.integers(0, 256, size=(21, 19, 3), dtype=np.uint8)
    elems = (rng.integers(-16, 17, size=(2, 2, 3)) & 0xFF).astype(np.uint8)
    modes = rng.integers(0, 14, size=(2, 2)).astype(np.uint8)
    blob = encode_webp(
        px, color_elems=elems, predictor_modes=modes, subtract_green=True
    )
    assert np.array_equal(decode_webp(blob), px)


def test_meta_prefix_groups():
    px = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    blob = encode_webp(px, subtract_green=False, meta_group_bits=3)
    assert np.array_equal(decode_webp(blob), px)


def test_long_run_splits_at_4096():
    # one flat 70x70 image → a >4900-pixel run → multiple max-length refs
    px = np.full((70, 70, 3), 77, np.uint8)
    assert np.array_equal(decode_webp(encode_webp(px)), px)


def test_header_bit_layout_hand_checked():
    # w=17, h=5: payload bits after the 0x2f signature are, LSB-first:
    # (w-1)=16 in 14 bits, (h-1)=4 in 14 bits, alpha=0, version=000
    blob = encode_webp(np.zeros((5, 17, 3), np.uint8))
    payload = blob[20:]
    assert payload[0] == 0x2F
    acc = payload[1] | (payload[2] << 8) | (payload[3] << 16) | (payload[4] << 24)
    assert (acc & 0x3FFF) == 16
    assert ((acc >> 14) & 0x3FFF) == 4
    assert ((acc >> 28) & 1) == 0  # alpha hint
    assert ((acc >> 29) & 7) == 0  # version


def test_hand_assembled_single_pixel_stream():
    """1x1 image built bit-by-bit from the spec: five 'simple' prefix
    codes each with a single (hence zero-bit) symbol — the decoder
    must produce exactly that ARGB pixel."""
    bw = _BitWriter()
    bw.bits(0, 14)  # w-1
    bw.bits(0, 14)  # h-1
    bw.bits(0, 1)  # alpha
    bw.bits(0, 3)  # version
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no meta prefix image
    bw.bits(0, 1)  # no color cache
    for sym in (10, 200, 30, 255, 0):  # green, red, blue, alpha, dist
        bw.bits(1, 1)  # simple code
        bw.bits(0, 1)  # one symbol
        bw.bits(1, 1)  # 8-bit first symbol
        bw.bits(sym, 8)
    vp8l = b"\x2f" + bw.bytes()
    if len(vp8l) % 2:
        chunk = struct.pack("<4sI", b"VP8L", len(vp8l)) + vp8l + b"\x00"
    else:
        chunk = struct.pack("<4sI", b"VP8L", len(vp8l)) + vp8l
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    out = decode_webp(blob)
    assert out.shape == (1, 1, 3)
    assert tuple(out[0, 0]) == (200, 10, 30)  # RGB of ARGB(255,200,10,30)


def test_lossy_and_extended_raise_named():
    fake_vp8 = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(fake_vp8)
    # a VP8X wrapper is fine when it holds a VP8L image (metadata
    # chunks are walked past) — but lossy/animated payloads still raise
    fake_vp8x_lossy = (
        b"RIFF" + struct.pack("<I", 24) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 0)
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(fake_vp8x_lossy)
    fake_anim = (
        b"RIFF" + struct.pack("<I", 20) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 0)
        + b"ANIM" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="animated"):
        decode_webp(fake_anim)
    # VP8X with no image chunk at all is malformed, not unsupported
    fake_vp8x = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8X" + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        decode_webp(fake_vp8x)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE")
    with pytest.raises(ValueError):
        decode_webp(encode_webp(np.zeros((2, 2, 3), np.uint8))[:25])


def test_imaging_dispatch():
    px = rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
    blob = encode_image(px, "webp")
    assert sniff_format(blob) == "webp"
    assert np.array_equal(decode_image(blob), px)
    # WAV/AVI are RIFF too — no sniff collision
    from edgar_crawler_spark.functions.imaging import encode_avi_rgb

    avi = encode_avi_rgb(px[None], fps=10)
    assert sniff_format(avi) is None
