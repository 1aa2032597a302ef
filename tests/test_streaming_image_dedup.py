"""Streaming image near-dup: crawled payload micro-batches against the
persisted banded-Hamming index — the image-axis twin of the LSH
streaming leg (tests/test_streaming_dedup.py)."""

import pyspark.sql.functions as F

from edgar_crawler_spark.frontier.state import SnapshotTable
from edgar_crawler_spark.operators.dedup import phash_near_dup_pairs
from edgar_crawler_spark.streaming.stream_frontier import run_streaming_image_near_dup


def _hashes(spark, lo, hi):
    """Engineered sketches: xxhash64-spread anchors (bits across all 3
    bands — low-bit-only anchors would make the high bands one
    degenerate all-zero bucket that bucket_cap rightly drops), every
    3rd id a single-bit twin of its triple's anchor — twins cross the
    50-boundary micro-batch split."""
    anchor = F.xxhash64(F.floor(F.col("id") / 3))
    return spark.range(lo, hi).select(
        F.concat(F.lit("img"), F.col("id").cast("string")).alias("image_id"),
        F.when(F.col("id") % 3 == 2, anchor.bitwiseXOR(F.lit(1)))
        .otherwise(anchor)
        .alias("phash"),
    )


def test_streaming_image_near_dup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "payload")
    _hashes(spark, 0, 50).coalesce(1).write.mode("overwrite").parquet(src)
    _hashes(spark, 50, 100).coalesce(1).write.mode("append").parquet(src)

    kw = dict(
        index_path=str(tmp_path / "idx"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ck"),
        max_hamming=2,
    )
    _, n1 = run_streaming_image_near_dup(
        spark, src, "image_id string, phash long", **kw
    )
    assert n1 > 0
    expected = {
        (r.image_a, r.image_b, r.hamming)
        for r in phash_near_dup_pairs(_hashes(spark, 0, 100), max_hamming=2).collect()
    }
    got = {
        (r.image_a, r.image_b, r.hamming)
        for r in SnapshotTable(str(tmp_path / "pairs")).read(spark).collect()
    }
    assert got == expected

    # later drop-in only pays for the new slice; cross-slice twins found
    _hashes(spark, 100, 130).coalesce(1).write.mode("append").parquet(src)
    _, n2 = run_streaming_image_near_dup(
        spark, src, "image_id string, phash long", **kw
    )
    assert n2 > 0
    got2 = {
        (r.image_a, r.image_b, r.hamming)
        for r in SnapshotTable(str(tmp_path / "pairs")).read(spark).collect()
    }
    expected2 = {
        (r.image_a, r.image_b, r.hamming)
        for r in phash_near_dup_pairs(_hashes(spark, 0, 130), max_hamming=2).collect()
    }
    assert got2 == expected2


def test_streaming_image_near_dup_from_bytes(spark, tmp_path):
    """A stream carrying only raw bytes is hashed on the fly through
    the DC-thumbnail fast path; exact-duplicate pixels pair at hamming
    0 across the micro-batch boundary, and a poisoned blob is skipped,
    never thrown."""
    import numpy as np

    from edgar_crawler_spark.functions.imaging import encode_image

    def rows(ids, seeds):
        data = []
        for i, s in zip(ids, seeds):
            px = np.random.default_rng(s).integers(0, 256, (16, 16, 3), dtype=np.uint8)
            data.append((f"img{i}", bytearray(encode_image(px, "png"))))
        return data

    # img0/img2 share pixels (seed 1) but land in DIFFERENT batches
    batch1 = rows([0, 1], [1, 2]) + [("poison", bytearray(b"\x89PNGgarbage"))]
    batch2 = rows([2, 3], [1, 3])
    src = str(tmp_path / "payload")
    spark.createDataFrame(batch1, ["image_id", "bytes"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(batch2, ["image_id", "bytes"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    _, n = run_streaming_image_near_dup(
        spark,
        src,
        "image_id string, bytes binary",
        index_path=str(tmp_path / "idx"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ck"),
        max_hamming=0,
    )
    assert n >= 1
    got = {
        (r.image_a, r.image_b)
        for r in SnapshotTable(str(tmp_path / "pairs")).read(spark).collect()
    }
    assert ("img0", "img2") in got
    assert all("poison" not in pair for pair in got)
