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


def test_image_embeddings_through_persisted_ivf(spark, tmp_path):
    """The interchange claim, proven: the image-derived embedding
    column flows through the persisted IVF index unchanged — ingest
    the corpus, serve the lossy twins, originals come back at rank 1
    (nprobe = all cells ⇒ exact)."""
    import pyspark.sql.functions as F

    from edgar_crawler_spark.operators.similarity import IncrementalIVFIndex

    emb = image_embeddings(_corpus(spark)).filter(F.col("emb_ok") == "ok")
    # numeric vec ids: imgNN → NN, twinNN → 100 + NN
    vec_id = F.when(
        F.col("image_id").startswith("twin"),
        F.substring("image_id", 5, 2).cast("long") + 100,
    ).otherwise(F.substring("image_id", 4, 2).cast("long"))
    emb = emb.select(vec_id.alias("vec_id"), "embedding")
    idx = IncrementalIVFIndex(spark, str(tmp_path / "ivf"), n_cells=4, dim=64)
    idx.add(emb)
    got = {
        r.query_id: r
        for r in idx.topk(
            emb.filter(F.col("vec_id") >= 100), k=1, nprobe=4
        ).collect()
    }
    assert got[105].neighbor_id == 5 and got[105].cos > 0.99
    assert got[111].neighbor_id == 11 and got[111].cos > 0.98
