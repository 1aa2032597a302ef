"""Baseline JPEG codec (functions/jpegcodec.py) — pure numpy/stdlib.

Covers the round-trip PSNR invariant, every encoder mode (4:2:0,
grayscale, restart markers), foreign-stream decoding conventions
(missing-DHT fallback), and the error contract (ValueError on corrupt,
NotImplementedError naming non-baseline frame types) that the per-row
error recording in operators/multimodal.py relies on.
"""

import numpy as np
import pytest

from edgar_crawler_spark.functions.imaging import (
    decode_image,
    encode_image,
    psnr,
    sniff_format,
)
from edgar_crawler_spark.functions.jpegcodec import decode_jpeg, encode_jpeg


def _smooth(h=57, w=71):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                127 + 120 * np.sin(xx / 11.0 + yy / 17.0),
                127 + 120 * np.cos(xx / 7.0),
                127 + 120 * np.sin(yy / 13.0),
            ],
            axis=2,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


def _noise(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


def test_default_quality_holds_psnr_40_even_on_noise():
    for seed, (h, w) in enumerate([(16, 16), (33, 31), (64, 64), (9, 17)]):
        px = _noise(h, w, seed)
        dec = decode_jpeg(encode_jpeg(px))
        assert dec.shape == px.shape
        assert psnr(px, dec) >= 40.0


def test_smooth_image_high_quality():
    px = _smooth()
    assert psnr(px, decode_jpeg(encode_jpeg(px, quality=98))) >= 50.0


def test_quality_knob_monotone_in_size_and_psnr():
    px = _smooth()
    blobs = {q: encode_jpeg(px, quality=q) for q in (50, 75, 98)}
    assert len(blobs[50]) < len(blobs[75]) < len(blobs[98])
    p = {q: psnr(px, decode_jpeg(b)) for q, b in blobs.items()}
    assert p[50] < p[75] < p[98]


def test_420_subsampling_smaller_and_reasonable():
    px = _smooth(64, 64)
    full = encode_jpeg(px, quality=90)
    sub = encode_jpeg(px, quality=90, subsampling="4:2:0")
    assert len(sub) < len(full)
    dec = decode_jpeg(sub)
    assert dec.shape == px.shape
    assert psnr(px, dec) >= 28.0  # chroma is box-filtered, luma intact
    # luma plane barely moves
    gray = px.astype(np.float64) @ [0.299, 0.587, 0.114]
    gdec = dec.astype(np.float64) @ [0.299, 0.587, 0.114]
    assert psnr(gray.clip(0, 255).astype(np.uint8), gdec.clip(0, 255).astype(np.uint8)) >= 40.0


def test_422_subsampling_between_444_and_420():
    px = _smooth(64, 64)
    b444 = encode_jpeg(px, quality=90)
    b422 = encode_jpeg(px, quality=90, subsampling="4:2:2")
    b420 = encode_jpeg(px, quality=90, subsampling="4:2:0")
    assert len(b420) < len(b422) < len(b444)
    d = decode_jpeg(b422)
    assert d.shape == px.shape
    assert psnr(px, decode_jpeg(b420)) <= psnr(px, d) <= psnr(px, b444 and decode_jpeg(b444))
    # odd dims through the 2x1 grid
    o = _smooth(9, 15)
    assert decode_jpeg(encode_jpeg(o, quality=95, subsampling="4:2:2")).shape == o.shape


def test_sof1_extended_sequential_decodes():
    """SOF1 streams are baseline-compatible at 8-bit precision; foreign
    writers emit them."""
    px = _smooth(16, 16)
    blob = bytearray(encode_jpeg(px, quality=90))
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC1
    assert np.array_equal(decode_jpeg(bytes(blob)), decode_jpeg(encode_jpeg(px, quality=90)))


def test_16bit_dqt_decodes():
    """Foreign writers may emit pq=1 (16-bit) quantization tables."""
    px = _smooth(16, 16)
    blob = encode_jpeg(px, quality=90)
    out = bytearray()
    pos = 0
    while pos < len(blob):
        if blob[pos] == 0xFF and pos + 1 < len(blob) and blob[pos + 1] == 0xDB:
            seg_len = int.from_bytes(blob[pos + 2 : pos + 4], "big")
            body = blob[pos + 4 : pos + 2 + seg_len]
            tq = body[0] & 0x0F
            vals = body[1:65]
            wide = b"".join(v.to_bytes(2, "big") for v in vals)
            payload = bytes([(1 << 4) | tq]) + wide
            out += b"\xff\xdb" + (2 + len(payload)).to_bytes(2, "big") + payload
            pos += 2 + seg_len
            continue
        out.append(blob[pos])
        pos += 1
    assert np.array_equal(decode_jpeg(bytes(out)), decode_jpeg(blob))


def test_420_odd_dimensions():
    px = _smooth(19, 23)
    dec = decode_jpeg(encode_jpeg(px, quality=95, subsampling="4:2:0"))
    assert dec.shape == px.shape


def test_grayscale_mode():
    g = _smooth()[:, :, 0]
    blob = encode_jpeg(g, quality=95)
    dec = decode_jpeg(blob)
    ref = np.repeat(g[:, :, None], 3, axis=2)
    assert dec.shape == ref.shape
    assert psnr(ref, dec) >= 45.0
    assert len(blob) < len(encode_jpeg(ref, quality=95))  # 1 component < 3


def test_restart_markers_roundtrip_and_present():
    px = _smooth(48, 48)
    blob = encode_jpeg(px, quality=90, restart_interval=3)
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
    assert psnr(px, decode_jpeg(blob)) >= 40.0
    # same pixels as the unsegmented stream
    plain = decode_jpeg(encode_jpeg(px, quality=90))
    assert np.array_equal(plain, decode_jpeg(blob))


def test_missing_dht_falls_back_to_annex_k():
    """MJPEG convention: streams without DHT decode with the K.3 tables."""
    px = _smooth(24, 24)
    blob = encode_jpeg(px, quality=90)
    out = bytearray()
    pos = 0
    while pos < len(blob):
        if blob[pos] == 0xFF and pos + 1 < len(blob) and blob[pos + 1] == 0xC4:
            seg_len = int.from_bytes(blob[pos + 2 : pos + 4], "big")
            pos += 2 + seg_len
            continue
        out.append(blob[pos])
        pos += 1
    stripped = bytes(out)
    assert b"\xff\xc4" not in stripped[:200]
    assert np.array_equal(decode_jpeg(blob), decode_jpeg(stripped))


def test_lossless_sof_raises_not_implemented():
    px = _smooth(16, 16)
    blob = bytearray(encode_jpeg(px, quality=90))
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC3  # SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(blob))


def test_progressive_dispatches_to_jpegprog():
    from edgar_crawler_spark.functions.jpegprog import encode_jpeg_progressive

    px = _smooth(24, 17)
    blob = encode_jpeg_progressive(px, quality=90)
    assert b"\xff\xc2" in blob
    # decode_jpeg transparently handles SOF2 and matches the baseline
    # decode of the same quantized coefficients
    assert np.array_equal(decode_jpeg(blob), decode_jpeg(encode_jpeg(px, quality=90)))


def test_corrupt_streams_raise_value_error():
    px = _smooth(16, 16)
    blob = encode_jpeg(px, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02\x03")  # no SOI
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])  # truncated entropy data
    with pytest.raises(ValueError):
        decode_jpeg(blob[:20])  # truncated before SOF


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), np.float32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 4), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), np.uint8), subsampling="4:1:1")


def test_mjpeg_avi_roundtrip():
    """MJPEG AVI: per-frame baseline JPEG in '00dc' chunks, fourcc MJPG."""
    from edgar_crawler_spark.functions.imaging import decode_avi_rgb, encode_avi_mjpg

    frames = np.stack([_smooth(16, 18), _smooth(16, 18)[::-1], _noise(16, 18, 1)])
    blob = encode_avi_mjpg(frames, fps=12, quality=98)
    assert blob[:4] == b"RIFF" and b"MJPG" in blob and b"00dc" in blob
    fps, out = decode_avi_rgb(blob)
    assert fps == 12.0 and out.shape == frames.shape
    assert psnr(frames, out) >= 40.0


def test_imaging_dispatch_real_jpeg():
    """encode_image('jpeg') now emits real SOI-magic JPEG; decode_image
    and sniff_format route it; 'qnt' stays available for bulk fixtures."""
    px = _noise(20, 24, 5)
    blob = encode_image(px, "jpeg")
    assert blob[:2] == b"\xff\xd8" and blob.endswith(b"\xff\xd9")
    assert sniff_format(blob) == "jpeg"
    assert psnr(px, decode_image(blob)) >= 40.0
    qblob = encode_image(px, "qnt")
    assert sniff_format(qblob) == "qnt"
    assert psnr(px, decode_image(qblob)) >= 40.0
