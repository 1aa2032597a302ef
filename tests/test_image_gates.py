"""image_caption_gates: LAION-style metadata pre-filters must stay
pure JVM column predicates (no Python stage — they run before any
decode at 100 TB) and gate exactly per their documented thresholds."""

import pandas as pd

from edgar_crawler_spark.operators.multimodal import (
    image_caption_gates,
    pack_image_batches,
)


def test_gate_semantics_and_jvm_only_plan(spark):
    rows = pd.DataFrame(
        {
            "image_id": ["a", "b", "c", "d", "e"],
            "w": [32, 16, 64, 32, 32],
            "h": [32, 32, 16, 24, 32],
            "fmt": ["png", "png", "jpeg", "qnt", "gif"],
            "caption": [
                "a cat on a mat",
                "tiny image thumb nail",
                "very wide banner image",
                "stand in codec row here",
                "x " * 60,  # 120 chars > 80 cap
            ],
        }
    )
    df = image_caption_gates(spark.createDataFrame(rows))
    out = df.toPandas().set_index("image_id")
    assert out.loc["a"].tolist()[-5:] == [1, 1, 1, 1, 1]
    assert out.loc["b"].size_ok == 0 and out.loc["b"].passes == 0  # min side 16
    assert out.loc["c"].aspect_ok == 0 and out.loc["c"].passes == 0  # 64/16 = 4
    assert out.loc["d"].fmt_ok == 0 and out.loc["d"].passes == 0  # qnt dropped
    assert out.loc["e"].caption_ok == 0 and out.loc["e"].passes == 0  # too long
    # the whole gate stack must be JVM-side: no Python map nodes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "mapInPandas" not in plan


def test_pack_image_batches_semantics(spark):
    rows = pd.DataFrame(
        {
            "image_id": [f"img{i:03d}" for i in range(40)],
            "w": [16 + (i % 3) * 8 for i in range(40)],
            "h": [16 + (i % 5) * 4 for i in range(40)],
        }
    )
    buckets = [(32, 32), (32, 16), (16, 32)]
    df = pack_image_batches(
        spark.createDataFrame(rows), buckets, batch_px_budget=4096, n_shards=4
    )
    out = df.toPandas().set_index("image_id").sort_index()
    # bucket assignment: rational-distance argmin, tie → lowest index
    for img, r in out.iterrows():
        i = int(img[3:])
        w, h = 16 + (i % 3) * 8, 16 + (i % 5) * 4
        dists = [(abs(w * bh - h * bw) / (h * bh), bi) for bi, (bw, bh) in enumerate(buckets)]
        assert r.bucket_idx == min(dists)[1]
        assert (r.target_w, r.target_h) == buckets[r.bucket_idx]
    # capacity: batch b for (bucket, shard) holds <= floor(budget/px) rows
    for (b, s), grp in out.groupby(["bucket_idx", "shard"]):
        cap = max(1, 4096 // (buckets[b][0] * buckets[b][1]))
        counts = grp.groupby("batch_idx").size()
        assert (counts <= cap).all()
        # batches fill in order: all but the last are full
        assert (counts.iloc[:-1] == cap).all()
    # deterministic across runs
    again = df.toPandas().set_index("image_id").sort_index()
    assert out.equals(again)
    # scale shape: the sort is per (bucket, shard) window, never global
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
