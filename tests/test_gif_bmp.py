"""GIF + BMP codec tests — round-trips through our writer AND foreign
streams crafted by hand from the GIF89a / BMP specs (global color
tables, positioned sub-rect frames, transparency, disposal methods,
comment extensions, palettized / 32-bit / top-down BMPs), so the
decoder is pinned to the spec rather than to our own encoder's habits.
"""

import struct

import numpy as np
import pytest

from edgar_crawler_spark.functions.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_frames,
)
from edgar_crawler_spark.functions.imaging import (
    decode_bmp,
    decode_image,
    encode_bmp,
    encode_image,
    psnr,
    sniff_format,
)

rng = np.random.default_rng(20260817)


def posterized(h, w, levels=6):
    return (rng.integers(0, levels, size=(h, w, 3)) * (255 // (levels - 1))).astype(
        np.uint8
    )


# --------------------------------------------------------------------------
# LZW


def test_lzw_hand_packed_example():
    # indices 0,1,0,1,0,1 at min_code_size=2: codes 4(clear) 0 1 6 6 5(EOI);
    # width grows 3->4 after table entry 8 is added (hand-derived from the
    # GIF89a spec, Appendix F) — pins both the code sequence and the
    # LSB-first bit packing.
    enc = _lzw_encode(np.array([0, 1, 0, 1, 0, 1], np.uint8), 2)
    acc = n = 0
    expect = bytearray()
    for code, w in [(4, 3), (0, 3), (1, 3), (6, 3), (6, 4), (5, 4)]:
        acc |= code << n
        n += w
        while n >= 8:
            expect.append(acc & 255)
            acc >>= 8
            n -= 8
    if n:
        expect.append(acc & 255)
    assert enc == bytes(expect)
    assert list(_lzw_decode(enc, 2, 6)) == [0, 1, 0, 1, 0, 1]


def test_lzw_kwkwk_case():
    # aabab... produces the code-equals-table-size (KwKwK) special case
    idx = np.array([0, 0, 0, 0, 0, 0, 0, 1], np.uint8)
    assert list(_lzw_decode(_lzw_encode(idx, 2), 2, 8)) == list(idx)


def test_lzw_truncated_raises():
    enc = _lzw_encode(np.zeros(100, np.uint8), 2)
    with pytest.raises(ValueError):
        _lzw_decode(enc[:2], 2, 100)


# --------------------------------------------------------------------------
# GIF round-trips through our writer


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("shape", [(8, 8), (17, 31), (33, 10), (1, 1)])
def test_gif_lossless_roundtrip(shape, interlace):
    px = posterized(*shape)
    blob = encode_gif(px, interlace=interlace)
    assert blob[:6] == b"GIF89a" and blob[-1:] == b"\x3b"
    assert np.array_equal(decode_gif(blob), px)


def test_gif_code_growth_and_table_reset():
    # 128x128 posterized noise exceeds 4096 LZW entries -> clear/reset path
    px = posterized(128, 128)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_gif_median_cut_above_256_colors():
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    blob = encode_gif(px)
    out = decode_gif(blob)
    assert len(np.unique(out.reshape(-1, 3), axis=0)) <= 256
    assert psnr(px, out) > 20.0  # quantized, not garbage
    assert blob == encode_gif(px)  # deterministic palette + assignment


def test_gif_animated_roundtrip_and_fps():
    frames = (rng.integers(0, 4, size=(5, 12, 10, 3)) * 80).astype(np.uint8)
    fps, dec = decode_gif_frames(encode_gif_frames(frames, delay_cs=5))
    assert np.array_equal(dec, frames)
    assert fps == pytest.approx(20.0)


# --------------------------------------------------------------------------
# Foreign GIF streams (hand-assembled, not produced by our encoder)


def _gce(disposal=0, delay=0, transparent=None):
    packed = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    return struct.pack(
        "<BBBBHBB", 0x21, 0xF9, 4, packed, delay, transparent or 0, 0
    )


def _img(left, top, idx2d, mcs=2, lct=None, interlace=False):
    fh, fw = idx2d.shape
    packed = (0x80 if lct is not None else 0) | (0x40 if interlace else 0)
    if lct is not None:
        size_bits = max(1, (len(lct) - 1).bit_length())
        packed |= size_bits - 1
        padded = np.zeros((1 << size_bits, 3), np.uint8)
        padded[: len(lct)] = lct
        lct_raw = padded.tobytes()
    else:
        lct_raw = b""
    lzw = _lzw_encode(idx2d.reshape(-1).astype(np.uint8), mcs)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        struct.pack("<BHHHHB", 0x2C, left, top, fw, fh, packed)
        + lct_raw
        + bytes([mcs])
        + bytes(blocks)
    )


def test_foreign_gif_gct_subrect_transparency_disposal():
    # 4x4 screen, global color table [black, red, green, blue], bg=0.
    gct = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    lsd = struct.pack("<HHBBB", 4, 4, 0x80 | 0x01, 0, 0)  # GCT, 4 entries
    f1 = np.full((4, 4), 1, np.uint8)  # all red, full screen
    # frame 2: 2x2 green square at (1,1) with index 3 transparent,
    # disposal 2 (restore to background) afterwards
    f2 = np.array([[2, 3], [3, 2]], np.uint8)
    f3 = np.full((4, 4), 2, np.uint8)  # all green after restore
    comment = b"\x21\xfe\x05hello\x00"  # comment ext: skipped
    data = (
        b"GIF89a"
        + lsd
        + gct.tobytes()
        + comment
        + _gce(disposal=1, delay=10)
        + _img(0, 0, f1)
        + _gce(disposal=2, delay=10, transparent=3)
        + _img(1, 1, f2)
        + _gce(disposal=0, delay=10)
        + _img(0, 0, f3)
        + b"\x3b"
    )
    fps, frames = decode_gif_frames(data)
    assert fps == pytest.approx(10.0)
    assert frames.shape == (3, 4, 4, 3)
    red, green = gct[1], gct[2]
    assert np.array_equal(frames[0], np.tile(red, (4, 4, 1)))
    # frame 2 composites onto frame 1: green at (1,1) and (2,2),
    # transparent holes keep red at (1,2) and (2,1)
    assert np.array_equal(frames[1][1, 1], green)
    assert np.array_equal(frames[1][2, 2], green)
    assert np.array_equal(frames[1][1, 2], red)
    assert np.array_equal(frames[1][2, 1], red)
    # disposal 2 restored the rect to bg (black) before frame 3 drew green
    assert np.array_equal(frames[2], np.tile(green, (4, 4, 1)))


def test_foreign_gif_disposal_previous():
    gct = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8)
    lsd = struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)
    base = np.full((2, 2), 1, np.uint8)
    overlay = np.full((1, 1), 2, np.uint8)
    tail = np.full((1, 1), 3, np.uint8)  # drawn at (0,0) AFTER restore
    data = (
        b"GIF89a"
        + lsd
        + gct.tobytes()
        + _gce(disposal=1)
        + _img(0, 0, base)
        + _gce(disposal=3)  # restore-previous after the overlay frame
        + _img(1, 1, overlay)
        + _gce()
        + _img(0, 0, tail)
        + b"\x3b"
    )
    _, frames = decode_gif_frames(data)
    assert np.array_equal(frames[1][1, 1], gct[2])  # overlay visible in frame 2
    assert np.array_equal(frames[2][1, 1], gct[1])  # restored in frame 3
    assert np.array_equal(frames[2][0, 0], gct[3])


def test_foreign_gif_interlaced_rows():
    # 8 rows, one color per row, written in interlace order by hand
    gct = np.stack([np.arange(8) * 30] * 3, axis=1).astype(np.uint8)
    idx = np.repeat(np.arange(8, dtype=np.uint8)[:, None], 4, axis=1)
    order = [0, 4, 2, 6, 1, 3, 5, 7]  # GIF 4-pass interlace for h=8
    lsd = struct.pack("<HHBBB", 4, 8, 0x80 | 0x02, 0, 0)  # GCT 8 entries
    data = (
        b"GIF89a"
        + lsd
        + gct.tobytes()
        + _img(0, 0, idx[order], mcs=3, interlace=True)
        + b"\x3b"
    )
    out = decode_gif(data)
    assert np.array_equal(out, gct[idx])


def test_gif87a_header_accepted():
    px = posterized(6, 6)
    blob = bytearray(encode_gif(px))
    blob[:6] = b"GIF87a"
    assert np.array_equal(decode_gif(bytes(blob)), px)


def test_gif_garbage_raises():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")


# --------------------------------------------------------------------------
# BMP


@pytest.mark.parametrize("shape", [(13, 7), (8, 8), (5, 1)])
def test_bmp_roundtrip(shape):
    px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    blob = encode_bmp(px)
    assert blob[:2] == b"BM"
    assert np.array_equal(decode_bmp(blob), px)


def _bmp(raw, w, h, bitcount, palette=b"", colors_used=0):
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bitcount, 0, len(raw), 0, 0, colors_used, 0
    )
    offset = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", offset + len(raw), 0, 0, offset)
    return header + info + palette + raw


def test_foreign_bmp_32bit_and_topdown():
    px = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    bgra = np.concatenate(
        [px[::-1, :, ::-1], np.full((4, 3, 1), 0xAA, np.uint8)], axis=2
    )
    assert np.array_equal(decode_bmp(_bmp(bgra.tobytes(), 3, 4, 32)), px)
    # top-down: negative height, rows not flipped
    bgra_td = np.concatenate(
        [px[:, :, ::-1], np.full((4, 3, 1), 0, np.uint8)], axis=2
    )
    assert np.array_equal(decode_bmp(_bmp(bgra_td.tobytes(), 3, -4, 32)), px)


def test_foreign_bmp_8bit_palette():
    pal = np.zeros((16, 4), np.uint8)
    pal[:, 0] = np.arange(16) * 17  # blue channel
    pal[:, 2] = 255 - np.arange(16) * 17  # red channel
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4) % 16
    stride = (4 + 3) & ~3
    rows = np.zeros((3, stride), np.uint8)
    rows[:, :4] = idx[::-1]
    blob = _bmp(rows.tobytes(), 4, 3, 8, palette=pal.tobytes(), colors_used=16)
    out = decode_bmp(blob)
    expect = pal[idx][:, :, 2::-1]
    assert np.array_equal(out, expect)


def test_bmp_rle_raises():
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 1, 0, 0, 0, 0, 0)
    blob = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + info
    with pytest.raises(NotImplementedError):
        decode_bmp(blob)


# --------------------------------------------------------------------------
# Dispatch integration


def test_sniff_and_dispatch():
    px = posterized(9, 9)
    for fmt in ("gif", "bmp"):
        blob = encode_image(px, fmt)
        assert sniff_format(blob) == fmt
        assert np.array_equal(decode_image(blob), px)
