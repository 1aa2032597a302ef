import numpy as np

from edgar_crawler_spark.functions.imaging import (
    average_hash,
    decode_image,
    encode_image,
    psnr,
)


def _pixels(i, h=20, w=24):
    return np.random.default_rng(i).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    px = _pixels(1)
    out = decode_image(encode_image(px, "png"))
    assert np.array_equal(px, out)


def test_lossy_codec_psnr_at_least_40db():
    for i in range(5):
        px = _pixels(i)
        out = decode_image(encode_image(px, "jpeg"))
        assert out.shape == px.shape
        assert psnr(px, out) >= 40.0


def test_average_hash_deterministic_and_robust():
    px = _pixels(7)
    h1 = average_hash(px)
    assert h1 == average_hash(px.copy())
    assert -(2**63) <= h1 < 2**63
    # lossy round-trip should barely move the hash (hamming <= 4)
    h2 = average_hash(decode_image(encode_image(px, "jpeg")))
    assert bin((h1 ^ h2) & (2**64 - 1)).count("1") <= 4
