"""Content-based image retrieval: color embedding → exact cosine top-k.

Twins (same pixels, different container / lossy re-encode) must
retrieve each other at rank 1 with cosine ≈ 1; unrelated noise images
must not; poisoned blobs drop out instead of throwing."""

import numpy as np

from edgar_crawler_spark.operators.multimodal import (
    image_embeddings,
    image_similarity_topk,
)


def _corpus(spark):
    from edgar_crawler_spark.functions.imaging import encode_image

    rng = np.random.default_rng(5)
    rows = []
    pixels = {}
    for i in range(20):
        px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        pixels[i] = px
        rows.append((f"img{i:02d}", bytearray(encode_image(px, "png"))))
    # twins: same pixels re-encoded lossily (QNT step 3 ≈ 50 dB) and
    # as real JPEG — the content-dup case retrieval must collapse
    rows.append(("twin05", bytearray(encode_image(pixels[5], "qnt"))))
    rows.append(("twin11", bytearray(encode_image(pixels[11], "jpeg"))))
    rows.append(("poison", bytearray(b"\x89PNGnope")))
    return spark.createDataFrame(rows, ["image_id", "bytes"])


def test_twins_retrieve_originals(spark):
    out = image_similarity_topk(
        _corpus(spark), ["twin05", "twin11", "img00"], k=3
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    top05 = min(by_q["twin05"], key=lambda r: r.rnk)
    top11 = min(by_q["twin11"], key=lambda r: r.rnk)
    assert top05.neighbor_id == "img05" and top05.cos > 0.99
    assert top11.neighbor_id == "img11" and top11.cos > 0.98
    # an untwinned noise image's best match scores clearly below the
    # lossy-twin matches (64-bin histograms of 576-px noise are all
    # near-uniform, so the unrelated baseline is high but separable)
    top00 = min(by_q["img00"], key=lambda r: r.rnk)
    assert top00.cos < min(top05.cos, top11.cos) - 0.001
    assert all("poison" != r.neighbor_id for rs in by_q.values() for r in rs)


def test_embedding_contract(spark):
    out = {r.image_id: r for r in image_embeddings(_corpus(spark)).collect()}
    ok = out["img00"]
    assert ok.emb_ok == "ok" and len(ok.embedding) == 64
    assert abs(sum(v * v for v in ok.embedding) - 1.0) < 1e-9  # L2-normalized
    bad = out["poison"]
    assert bad.emb_ok != "ok" and bad.embedding is None
