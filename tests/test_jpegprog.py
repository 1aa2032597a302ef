"""Progressive JPEG codec (functions/jpegprog.py) — pure numpy/stdlib.

The encoder re-encodes the SAME quantized coefficients the baseline
encoder produces, so the headline invariant is BIT-parity: the
progressive decode must equal the baseline decode of the same image at
the same quality/subsampling exactly, not just within PSNR.  Covers
every subsampling mode, grayscale, noise (dense coefficients stress the
refinement correction-bit protocol), restart intervals (predictor/EOB
reset per segment), the decode_jpeg SOF2 dispatch, and the truncation
error contract the per-row error recording relies on.
"""

import numpy as np
import pytest

from edgar_crawler_spark.functions.jpegcodec import decode_jpeg, encode_jpeg
from edgar_crawler_spark.functions.jpegprog import (
    decode_progressive,
    encode_jpeg_progressive,
)


def _smooth(h=41, w=67):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                127 + 120 * np.sin(xx / 9.0 + 0.5),
                127 + 120 * np.cos(yy / 7.0),
                (xx * 3 + yy * 2) % 256,
            ],
            axis=2,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


def _noise(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("q", [50, 90, 98])
def test_bit_parity_with_baseline(sub, q):
    px = _smooth()
    prog = decode_progressive(encode_jpeg_progressive(px, quality=q, subsampling=sub))
    base = decode_jpeg(encode_jpeg(px, quality=q, subsampling=sub))
    assert np.array_equal(prog, base)


def test_grayscale_bit_parity():
    g = (
        (127 + 100 * np.sin(np.add.outer(np.arange(33) / 5.0, np.arange(50) / 8.0)))
        .clip(0, 255)
        .astype(np.uint8)
    )
    prog = decode_progressive(encode_jpeg_progressive(g, quality=85))
    assert np.array_equal(prog, decode_jpeg(encode_jpeg(g, quality=85)))
    assert prog.shape == (33, 50, 3)


def test_noise_stresses_refinement_protocol():
    # dense nonzero coefficients -> long correction-bit runs, EOB runs
    # spanning blocks, ZRL-in-refinement — the Annex-G corner cases
    for seed, (h, w) in enumerate([(24, 31), (16, 16), (64, 64)]):
        px = _noise(h, w, seed)
        prog = decode_progressive(encode_jpeg_progressive(px, quality=98))
        assert np.array_equal(prog, decode_jpeg(encode_jpeg(px, quality=98)))


def test_single_block_and_flat():
    g = np.full((8, 8), 100, np.uint8)
    assert np.array_equal(
        decode_progressive(encode_jpeg_progressive(g, quality=90)),
        decode_jpeg(encode_jpeg(g, quality=90)),
    )
    px = _smooth(8, 8)
    assert np.array_equal(
        decode_progressive(encode_jpeg_progressive(px, quality=90)),
        decode_jpeg(encode_jpeg(px, quality=90)),
    )


@pytest.mark.parametrize("ri", [1, 2, 7])
def test_restart_intervals(ri):
    px = _smooth()
    base = decode_jpeg(encode_jpeg(px, quality=90, subsampling="4:2:0"))
    blob = encode_jpeg_progressive(
        px, quality=90, subsampling="4:2:0", restart_interval=ri
    )
    assert b"\xff\xdd" in blob  # DRI present
    assert np.array_equal(decode_progressive(blob), base)


def test_restart_grayscale_noninterleaved():
    g = (
        (127 + 100 * np.sin(np.add.outer(np.arange(33) / 5.0, np.arange(50) / 8.0)))
        .clip(0, 255)
        .astype(np.uint8)
    )
    blob = encode_jpeg_progressive(g, quality=85, restart_interval=5)
    assert np.array_equal(
        decode_progressive(blob), decode_jpeg(encode_jpeg(g, quality=85))
    )


def test_decode_jpeg_dispatches_sof2():
    px = _smooth()
    blob = encode_jpeg_progressive(px, quality=90)
    assert b"\xff\xc2" in blob
    assert np.array_equal(decode_jpeg(blob), decode_progressive(blob))


def test_truncated_stream_raises_value_error():
    px = _smooth()
    blob = encode_jpeg_progressive(px, quality=90)
    with pytest.raises(ValueError):
        decode_progressive(blob[: len(blob) // 2])
    with pytest.raises(ValueError):
        decode_progressive(b"\x00\x01\x02\x03")


def test_encoder_input_contract():
    with pytest.raises(ValueError):
        encode_jpeg_progressive(np.zeros((4, 4), np.float64))
    with pytest.raises(ValueError):
        encode_jpeg_progressive(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg_progressive(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg_progressive(_smooth(), subsampling="4:1:1")
