"""DC-thumbnail fast path: 1/8-scale decode without AC storage/IDCT
(functions/imaging.py:decode_thumbnail, jpegcodec/jpegprog dc_only) and
the thumbnail_phash operator built on it."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from edgar_crawler_spark.functions.imaging import (
    average_hash,
    box_downsample8,
    decode_image,
    decode_thumbnail,
    encode_bmp,
    encode_png,
)
from edgar_crawler_spark.functions.jpegcodec import encode_jpeg
from edgar_crawler_spark.functions.jpegprog import encode_jpeg_progressive


def _smooth_blocks(h, w, seed=0):
    """8x8-block-flat image + small noise: JPEG at q98 is near-exact,
    so DC-vs-block-mean comparisons isolate the thumbnail path."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(-(-h // 8), -(-w // 8), 3)).astype(np.float64)
    px = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    return np.clip(px + rng.normal(0, 3, (h, w, 3)), 0, 255).astype(np.uint8)


def _gradient(h, w):
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    return np.stack([100 + 80 * yy, 100 + 80 * xx, 120 + 50 * yy * xx], -1).astype(
        np.uint8
    )


@pytest.mark.parametrize("encode", [encode_jpeg, encode_jpeg_progressive])
@pytest.mark.parametrize("dims", [(64, 64), (48, 40), (50, 43)])
@pytest.mark.parametrize("rst", [0, 2])
def test_dc_thumbnail_is_block_means(encode, dims, rst):
    """4:4:4: each DC coefficient is exactly 8x its block's mean, so the
    thumbnail equals the block-mean downsample of the full decode
    (within rounding; edge blocks are encoder-padded by replication)."""
    px = _smooth_blocks(*dims, seed=dims[0] + rst)
    data = encode(px, restart_interval=rst)
    thumb = decode_thumbnail(data)
    ref = box_downsample8(decode_image(data))
    assert thumb.shape == (-(-dims[0] // 8), -(-dims[1] // 8), 3)
    diff = np.abs(thumb.astype(int) - ref.astype(int))
    # interior blocks are exact-to-rounding; partial edge blocks differ
    # by the encoder's replication padding (DC averages the padded 8x8)
    assert diff[:-1, :-1].max() <= 2
    assert diff.max() <= 4


@pytest.mark.parametrize("encode", [encode_jpeg, encode_jpeg_progressive])
@pytest.mark.parametrize("sub", ["4:2:0", "4:2:2"])
def test_dc_thumbnail_subsampled(encode, sub):
    """Subsampled chroma DC averages the chroma block's (wider) support
    — identical to what libjpeg's 1/8-scale decode produces — so the
    contract on non-flat chroma is smooth-image closeness, not
    bit-equality with the 8x8 box means."""
    px = _gradient(64, 64)
    data = encode(px, subsampling=sub)
    thumb = decode_thumbnail(data)
    ref = box_downsample8(decode_image(data))
    assert np.abs(thumb.astype(int) - ref.astype(int)).max() <= 8


@pytest.mark.parametrize("encode", [encode_jpeg, encode_jpeg_progressive])
def test_dc_thumbnail_grayscale(encode):
    px = _smooth_blocks(56, 48, seed=9)[:, :, 0]
    data = encode(px)
    thumb = decode_thumbnail(data)
    ref = box_downsample8(decode_image(data))
    assert np.abs(thumb.astype(int) - ref.astype(int)).max() <= 2


def test_ahash_parity_with_full_decode():
    """The dedup contract: thumbnail hashes must join against
    full-decode hashes. At 64x64 the thumbnail IS the 8x8 block-mean
    grid aHash reduces to, so the hashes agree to >= 62/64 bits (uint8
    rounding can flip a near-tie bit)."""
    worst = 64
    for seed in range(20):
        px = _smooth_blocks(64, 64, seed=seed)
        data = encode_jpeg(px)
        t = average_hash(decode_thumbnail(data))
        f = average_hash(decode_image(data))
        worst = min(worst, 64 - bin((t ^ f) & ((1 << 64) - 1)).count("1"))
    assert worst >= 62


def _second_sos_entropy_start(data: bytes) -> int:
    import struct

    first = data.find(b"\xff\xda")
    second = data.find(b"\xff\xda", first + 2)
    assert second > 0
    (seglen,) = struct.unpack(">H", data[second + 2 : second + 4])
    return second + 2 + seglen


def test_progressive_ac_bytes_never_decoded():
    """The partial-read guarantee: corrupting an AC scan's entropy
    bytes must not change the DC thumbnail (the AC scans are skipped by
    byte-level marker scan, never Huffman-decoded)."""
    px = np.random.default_rng(3).integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    data = encode_jpeg_progressive(px)
    clean = decode_thumbnail(data)
    e = _second_sos_entropy_start(data)
    corrupt = data[:e] + b"\x55" * 16 + data[e + 16 :]
    assert np.array_equal(decode_thumbnail(corrupt), clean)
    # while the FULL decode does consume those bytes
    full_clean = decode_image(data)
    try:
        full_corrupt = decode_image(corrupt)
    except ValueError:
        return
    assert not np.array_equal(full_corrupt, full_clean)


@pytest.mark.parametrize("encode", [encode_png, encode_bmp])
def test_non_jpeg_containers_box_downsample(encode):
    px = np.random.default_rng(5).integers(0, 256, size=(30, 30, 3), dtype=np.uint8)
    data = encode(px)
    assert np.array_equal(decode_thumbnail(data), box_downsample8(px))


def test_small_thumbnail_hash_not_degenerate():
    """Thumbnails of small images are under 8px — aHash must upsample,
    not divide by zero-area bins; different images must hash apart."""
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    b = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    ha, hb = average_hash(a), average_hash(b)
    assert ha == average_hash(a)
    assert ha != hb


_INVERSE = {
    1: lambda a: a,
    2: lambda a: a[:, ::-1],
    3: lambda a: a[::-1, ::-1],
    4: lambda a: a[::-1],
    5: lambda a: a.swapaxes(0, 1),
    6: lambda a: np.rot90(a, 1),
    7: lambda a: a[::-1, ::-1].swapaxes(0, 1),
    8: lambda a: np.rot90(a, -1),
}


@pytest.mark.parametrize("k", list(range(1, 9)))
def test_apply_exif_orientation_restores_upright(k):
    from edgar_crawler_spark.functions.imaging import apply_exif_orientation

    upright = np.random.default_rng(k).integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    stored = _INVERSE[k](upright)
    assert np.array_equal(apply_exif_orientation(stored, k), upright)


def test_orientation_normalized_hash_dedups_rotated_copies(spark):
    """The same photo stored rotated (EXIF orientation 2-8) must hash
    with the upright copy under normalize_orientation=True — and must
    NOT without it (that's the recall the flag buys)."""
    from edgar_crawler_spark.functions.metadata import add_jpeg_app1_exif, build_exif
    from edgar_crawler_spark.operators.multimodal import thumbnail_phash

    upright = _smooth_blocks(64, 48, seed=77)
    rows = [("k1", encode_jpeg(upright))]
    for k in range(2, 9):
        stored = np.ascontiguousarray(_INVERSE[k](upright))
        rows.append(
            (f"k{k}", add_jpeg_app1_exif(encode_jpeg(stored), build_exif(orientation=k)))
        )
    df = spark.createDataFrame(rows, ["image_id", "bytes"])

    def hashes(normalize):
        return {
            r.image_id: r.phash
            for r in thumbnail_phash(df, normalize_orientation=normalize).collect()
        }

    norm, raw = hashes(True), hashes(False)
    for k in range(2, 9):
        d_norm = bin((norm["k1"] ^ norm[f"k{k}"]) & ((1 << 64) - 1)).count("1")
        assert d_norm <= 3, (k, d_norm)
    # rotations (not mere flips) scramble the un-normalized hash
    for k in (5, 6, 8):
        d_raw = bin((raw["k1"] ^ raw[f"k{k}"]) & ((1 << 64) - 1)).count("1")
        assert d_raw > 10, (k, d_raw)


def test_thumb_near_dup_catalog_recall(spark):
    """The image_thumb_near_dup composite (DC-thumbnail hash → banded
    Hamming): every JPEG-transcoded copy must pair with its original."""
    from edgar_crawler_spark.catalog import CATALOG

    rows = CATALOG["image_thumb_near_dup"][0](spark, "").collect()
    twins = {(r.image_a, r.image_b) for r in rows}
    hit = sum(1 for a, b in twins if b == a + "#jpg")
    assert hit == 200
    assert all(r.hamming <= 1 for r in rows if r.image_b == r.image_a + "#jpg")


def test_pipeline_prep_corpus_v5(spark):
    """Image capstone invariants: every engineered JPEG twin collapses
    into its original (no #jpg id survives, all twin stems do), the
    GPS-tagged originals are gone, and packing output is complete."""
    from edgar_crawler_spark.catalog import CATALOG

    rows = CATALOG["pipeline_prep_corpus_v5"][0](spark, "").collect()
    ids = [r.image_id for r in rows]
    assert len(ids) == len(set(ids))
    assert not any(i.endswith("#jpg") for i in ids)
    stems = [i for i in ids if int(i[-6:]) % 15 == 1]
    assert len(stems) == 40  # every twin group survives via its original
    # GPS privacy gate: original JPEGs at even stems were tagged
    assert not any(int(i[-6:]) % 21 == 0 and int(i[-6:]) % 2 == 0 for i in ids)
    assert all(r.batch_idx >= 0 and r.target_w * r.target_h <= 8192 for r in rows)


def test_thumbnail_phash_operator(spark):
    """Operator end-to-end over the payload fixture + a poisoned row:
    per-row error recording, and fast-path hashes agree with full-path
    hashes well inside a Hamming-dedup threshold."""
    from edgar_crawler_spark.fixtures.payload import payload_df
    from edgar_crawler_spark.operators.multimodal import (
        decode_and_validate,
        thumbnail_phash,
    )

    src = payload_df(spark, 60).select("image_id", "bytes").unionByName(
        spark.createDataFrame([("poisoned", b"not an image")], ["image_id", "bytes"])
    )
    fast = thumbnail_phash(src)
    rows = {r.image_id: r for r in fast.collect()}
    assert rows["poisoned"].decode_ok == "ValueError"
    assert rows["poisoned"].phash is None
    ok = [r for k, r in rows.items() if k != "poisoned"]
    assert len(ok) == 60 and all(r.decode_ok == "ok" for r in ok)

    # the dedup-join parity contract needs real image sizes (thumbnail
    # >= 8x8): 64x64 images, mixed containers
    big = spark.createDataFrame(
        [
            (f"big{i:02d}-{fmt}", enc(_smooth_blocks(64, 64, seed=i)))
            for i in range(8)
            for fmt, enc in (
                ("jpg", encode_jpeg),
                ("prog", encode_jpeg_progressive),
                ("png", encode_png),
            )
        ],
        ["image_id", "bytes"],
    )
    joined = (
        thumbnail_phash(big)
        .select("image_id", F.col("phash").alias("thumb_phash"))
        .join(
            decode_and_validate(big)
            .select("image_id", F.col("phash").alias("full_phash"))
            .hint("shuffle_hash"),
            "image_id",
        )
        .select(
            (
                64 - F.bit_count(F.col("full_phash").bitwiseXOR(F.col("thumb_phash")))
            ).alias("agree")
        )
        .collect()
    )
    assert len(joined) == 24
    assert min(r.agree for r in joined) >= 62
