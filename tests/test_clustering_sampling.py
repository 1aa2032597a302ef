"""Connected-components dedup clustering + deterministic sampling."""

import pyspark.sql.functions as F

from edgar_crawler_spark.operators.dedup import (
    connected_components,
    dedup_representatives,
)
from edgar_crawler_spark.operators.sampling import (
    deterministic_sample,
    stratified_topk,
)


def test_connected_components_chain_converges(spark):
    """A 9-node chain has diameter 8 — label propagation must iterate
    past one round, and every node must land in the min-id component."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)] + [(100, 101), (103, 101)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert all(got[i] == 0 for i in range(9))
    assert got[100] == got[101] == got[103] == 100


def test_connected_components_two_clusters_and_order_insensitivity(spark):
    pairs = spark.createDataFrame(
        [("d9", "d2"), ("d2", "d5"), ("d7", "d8")], "doc_a string, doc_b string"
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {"d9": "d2", "d2": "d2", "d5": "d2", "d7": "d7", "d8": "d7"}


def test_dedup_representatives_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "doc_a long, doc_b long")
    kept = sorted(r.doc_id for r in dedup_representatives(docs, pairs).collect())
    # component {1,4,5} -> keep 1; 0,2,3 are singletons
    assert kept == [0, 1, 2, 3]


def test_deterministic_sample_reproducible_and_proportional(spark):
    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 100).collect())
    b = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 100).collect())
    assert a == b  # exactly reproducible
    assert 0.06 < len(a) / 2000 < 0.14  # ~10%
    # supersampling is monotone: the 10% sample nests inside the 20%
    big = set(r.doc_id for r in deterministic_sample(docs, "doc_id", 200).collect())
    assert set(a) <= big


def test_stratified_topk_exact_k_per_group(spark):
    docs = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(300)],
        "doc_id long, lang string",
    )
    out = stratified_topk(docs, "lang", "doc_id", 7)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 7, "de": 7, "fr": 7}
    # deterministic across runs
    again = stratified_topk(docs, "lang", "doc_id", 7)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_ivf_nprobe_recall_monotone(spark):
    """nprobe is the recall knob: recall vs brute force must be
    monotone in nprobe, and nprobe=n_cells recovers brute force."""
    from edgar_crawler_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qids = [0, 1, 2, 3, 4, 5, 6, 7]
    truth = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, qids, k=5).collect()
    }

    def recall(nprobe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, qids, k=5, nprobe=nprobe).collect()
        }
        return len(got & truth) / len(truth)

    r1, r3, r8 = recall(1), recall(3), recall(8)
    assert r1 <= r3 <= r8
    assert r8 == 1.0  # probing every cell IS brute force
    assert r3 > r1 or r1 == 1.0  # the knob actually does something here


def test_connected_components_vs_union_find(spark):
    """Randomized cross-check against a pure-python union-find on 6
    seeded graphs (driver-side oracle, no Spark in the reference)."""
    import random

    def uf_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        groups = {}
        for n in nodes:
            groups.setdefault(find(n), []).append(n)
        return {n: min(g) for g in groups.values() for n in g}

    for seed in range(6):
        rng = random.Random(seed)
        n_nodes = rng.randint(5, 40)
        n_edges = rng.randint(1, 60)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        expected = uf_components(edges, nodes)
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r.node: r.component for r in connected_components(pairs).collect()}
        assert got == expected, f"seed={seed}"


def test_connected_components_long_path_log_rounds(spark):
    """VERDICT r02 item 4: pointer doubling makes a 1,000-node path
    graph (diameter 999) converge in ~log2(diameter) rounds, not 999."""
    n = 1000
    pairs = spark.range(n - 1).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    stats = {}
    got = connected_components(pairs, stats=stats).toPandas()
    assert (got.component == 0).all() and len(got) == n
    assert stats["converged"] and stats["iterations"] <= 12


def test_connected_components_raises_on_non_convergence(spark):
    import pytest

    n = 64
    pairs = spark.range(n - 1).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=2)


def test_phash_near_dup_pairs_matches_bruteforce(spark):
    """Image near-dup via the 64-bit perceptual hash: the banded
    Hamming join must find EXACTLY the pairs a brute-force O(n²)
    cross-join finds (pigeonhole recall guarantee), on real payload
    fixture hashes plus engineered near-duplicates."""
    import pyspark.sql.functions as F

    from edgar_crawler_spark.fixtures.payload import make_payload_row
    from edgar_crawler_spark.operators.dedup import phash_near_dup_pairs

    rows = []
    for i in range(60):
        r = make_payload_row(i)
        rows.append((r["image_id"], int(r["phash"])))
    # engineered near-dups: flip 1..6 bits of row 0's hash
    base = rows[0][1]
    for b in range(6):
        flipped = base
        for j in range(b + 1):
            flipped ^= 1 << (j * 9)
        rows.append((f"dup{b}", flipped))
    df = spark.createDataFrame(rows, "image_id string, phash long")

    got = {
        (r.image_a, r.image_b, r.hamming)
        for r in phash_near_dup_pairs(df, max_hamming=6).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r.image_a, r.image_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("image_a"),
            F.col("b.image_id").alias("image_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
        .collect()
    }
    assert got == brute and len(got) >= 6  # all engineered dups found


def test_kmeans_refine_improves_quantizer(spark):
    """Lloyd rounds must not worsen the objective (mean winning dot),
    and refined centroids slot into ivf_topk via the cents hook."""
    import pyspark.sql.functions as F

    from edgar_crawler_spark.operators.similarity import ivf_topk, kmeans_refine

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def mean_score(it):
        _, assigned = kmeans_refine(emb, iterations=it)
        return assigned.agg(F.avg("score")).collect()[0][0]

    # spherical k-means: every centroid lives on the unit sphere (seed
    # included), so the dot objective is monotone non-decreasing
    scores = [mean_score(it) for it in range(4)]
    for a, b in zip(scores, scores[1:]):
        assert b >= a - 1e-9, scores

    cents, _ = kmeans_refine(emb, iterations=2)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    qids = [r.vec_id for r in emb.select("vec_id").limit(3).collect()]
    out = ivf_topk(emb, qids, k=3, cents=cents)
    got = out.groupBy("query_id").count().collect()
    assert {r.query_id for r in got} == set(qids)
    assert all(r["count"] <= 3 for r in got)


def test_semantic_dedup_clusters_within_cells(spark):
    """SemDeDup: rep_id is the component minimum, every vec appears
    exactly once, clusters never span quantizer cells, and a trained
    quantizer (kmeans cents hook) slots in."""
    import pyspark.sql.functions as F

    from edgar_crawler_spark.operators.similarity import (
        kmeans_refine_minibatch,
        semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(emb, threshold=0.25, n_cells=8, dim=64).toPandas()
    assert len(out) == emb.count() and out.vec_id.is_unique
    # rep is a member of the same cluster and is its minimum id
    by_rep = out.groupby("rep_id")
    for rep, grp in by_rep:
        assert rep == grp.vec_id.min()
        assert grp.cell.nunique() == 1  # clusters never span cells
    # survivors = one per cluster
    assert (out.rep_id == out.vec_id).sum() == out.rep_id.nunique()
    # dedup actually merged something at this threshold
    assert out.rep_id.nunique() < len(out)

    cents, _ = kmeans_refine_minibatch(emb, iterations=2, fraction=0.5)
    trained = semantic_dedup(emb, threshold=0.25, cents=cents)
    assert trained.count() == len(out)


def test_kmeans_minibatch_deterministic_and_improves_seed(spark):
    """Mini-batch spherical k-means: deterministic across runs, beats
    the unrefined seed's objective on the embeddings table, assignments
    are consistent with the returned centroids, and each round's sample
    really is a strict subset (fraction < 1)."""
    import pyspark.sql.functions as F
    import pytest

    from edgar_crawler_spark.operators.similarity import (
        assign_cells_broadcast,
        ivf_centroids,
        kmeans_refine_minibatch,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    cents1, out1 = kmeans_refine_minibatch(emb, iterations=3, fraction=0.4)
    cents2, out2 = kmeans_refine_minibatch(emb, iterations=3, fraction=0.4)
    assert cents1 == cents2
    rows1 = sorted((r.vec_id, r.cell, r.score) for r in out1.collect())
    assert rows1 == sorted((r.vec_id, r.cell, r.score) for r in out2.collect())
    assert len(rows1) == emb.count()

    # objective vs the raw seed (iterations=0 via fraction-only train skip)
    seed_cents = []
    for c in ivf_centroids(8, 64):
        nrm = sum(x * x for x in c) ** 0.5
        seed_cents.append([x / nrm for x in c])
    seed_score = (
        assign_cells_broadcast(emb, seed_cents)
        .select(F.avg(F.col("scores")[0]).alias("s"))
        .collect()[0]["s"]
    )
    mb_score = out1.agg(F.avg("score")).collect()[0][0]
    assert mb_score >= seed_score - 1e-9

    # assignments match a fresh assign pass under the returned centroids
    fresh = {
        r.vec_id: r.cells[0]
        for r in assign_cells_broadcast(emb, cents1).collect()
    }
    assert all(fresh[v] == c for v, c, _ in rows1)

    with pytest.raises(ValueError, match="fraction"):
        kmeans_refine_minibatch(emb, fraction=0.0)


def test_dedup_representatives_by_keeps_best_scorer(spark):
    """Quality-aware representative: the argmax-score member survives
    (NOT the min id), ties break to the lowest id, singletons pass."""
    from edgar_crawler_spark.operators.dedup import dedup_representatives_by

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 8)], ["doc_id", "text"]
    )
    # components: {1,2,3} and {5,6}; 4 and 7 are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["doc_a", "doc_b"]
    )
    scores = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.5), (4, 0.0), (5, 0.7), (6, 0.7), (7, 0.2)],
        ["doc_id", "score"],
    )
    kept = sorted(
        r.doc_id
        for r in dedup_representatives_by(docs, pairs, scores).collect()
    )
    # 2 wins {1,2,3} on score; 5 wins {5,6} on the id tie-break
    assert kept == [2, 4, 5, 7]


def test_image_dedup_representatives_resolution_aware(spark):
    """Image-axis dedup end-to-end: phash pairs → components → one
    survivor per visual cluster; with a resolution score the SHARPEST
    copy survives instead of the lexicographically-first id."""
    from edgar_crawler_spark.fixtures.payload import make_payload_row
    from edgar_crawler_spark.operators.dedup import image_dedup_representatives

    rows = []
    for i in range(40):
        r = make_payload_row(i)
        rows.append((r["image_id"], int(r["phash"]), 64, 64))
    # a visual cluster: 2 near-copies of image 0's hash, one hi-res
    base = rows[0][1]
    rows.append(("zcopy_lo", base ^ 1, 32, 32))
    rows.append(("zcopy_hi", base ^ (1 << 20), 512, 512))
    df = spark.createDataFrame(rows, "image_id string, phash long, w int, h int")

    kept_min = {r.image_id for r in image_dedup_representatives(df).collect()}
    assert rows[0][0] in kept_min  # min-id representative
    assert "zcopy_lo" not in kept_min and "zcopy_hi" not in kept_min

    scores = df.selectExpr("image_id", "CAST(w AS BIGINT) * h AS score")
    kept_best = {
        r.image_id
        for r in image_dedup_representatives(df, scores=scores).collect()
    }
    assert "zcopy_hi" in kept_best  # sharpest copy survives
    assert rows[0][0] not in kept_best and "zcopy_lo" not in kept_best
    # cluster-external images are untouched either way
    assert len(kept_best) == len(kept_min) == len(rows) - 2


def test_broadcast_centroids_bit_identical_to_literal(spark):
    """The broadcast-numpy quantizer path (the 100 TB shape: centroids
    shipped once per executor, mapInPandas argmax, no plan literals)
    must be BIT-identical to the literal-expression path — the kernel
    accumulates dots in F.aggregate's left-fold order, so auto-routing
    can never flip an argmax on a near-tie."""
    from edgar_crawler_spark.operators.similarity import ivf_topk, kmeans_refine

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3]
    lit = sorted(
        map(tuple, ivf_topk(emb, qids, k=5, nprobe=2, broadcast_centroids=False).collect())
    )
    bc = sorted(
        map(tuple, ivf_topk(emb, qids, k=5, nprobe=2, broadcast_centroids=True).collect())
    )
    assert lit == bc and len(lit) == 20

    c_lit, a_lit = kmeans_refine(emb, iterations=2, broadcast_centroids=False)
    c_bc, a_bc = kmeans_refine(emb, iterations=2, broadcast_centroids=True)
    # training MEANS are float-summation-order dependent in any
    # distributed engine (partial sums vs avg-merge) — compare to
    # tolerance; the tie-sensitive operation (assignment under given
    # centroids) is the bit-exact one and is compared exactly below
    # and in the ivf_topk check above
    import numpy as np

    assert np.allclose(np.asarray(c_lit), np.asarray(c_bc), rtol=0, atol=1e-12)
    assert sorted(map(tuple, a_lit.collect())) == sorted(map(tuple, a_bc.collect()))


def test_broadcast_centroids_production_cell_count(spark):
    """End-to-end at a REAL IVF cell count (n_cells=1024, dim=64 —
    65,536 centroid components; a literal plan would embed them all as
    expression nodes and fail to analyze at 10⁴+ cells). Auto-routing
    must pick the broadcast kernel, train, assign, and serve a probed
    search; assignments cross-checked against a local numpy argmax."""
    import numpy as np

    from edgar_crawler_spark.operators.similarity import (
        LITERAL_PLAN_MAX_TERMS,
        ivf_topk,
        kmeans_refine,
    )

    assert 1024 * 64 > LITERAL_PLAN_MAX_TERMS  # auto-route engages
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, assigned = kmeans_refine(emb, n_cells=1024, dim=64, iterations=1)
    rows = assigned.collect()
    assert len(rows) == emb.count()

    m = np.asarray(cents)
    pdf = emb.toPandas()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    expected = dict(zip(pdf["vec_id"], (vecs @ m.T).argmax(axis=1)))
    assert all(expected[r.vec_id] == r.cell for r in rows)

    topk = ivf_topk(emb, [0, 1, 2, 3], k=5, cents=cents, nprobe=8)
    # repo rule: joins whose big side is a Python-map node carry an
    # explicit shuffle_hash hint (Catalyst inherits the slim child's
    # stats and AQE would mis-broadcast the wrong side)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    out = topk.collect()
    assert {r.query_id for r in out} == {0, 1, 2, 3}
    for r in out:
        assert 1 <= r.rnk <= 5 and -1.0001 <= r.cos <= 1.0001


def test_mixture_sample_quotas_and_shortfall(spark):
    """Largest-remainder quotas sum exactly to n; per-group counts
    match quotas; an undersized group contributes all it has WITHOUT
    silently shifting the mix; the sample is rerun-stable."""
    from edgar_crawler_spark.operators.sampling import mixture_quotas, mixture_sample

    q = mixture_quotas({"a": 1, "b": 1, "c": 1}, 100)
    assert sum(q.values()) == 100 and sorted(q.values()) == [33, 33, 34]
    # deterministic remainder tie-break by group name
    assert mixture_quotas({"a": 1, "b": 1, "c": 1}, 100) == q

    rows = [(i, "web") for i in range(200)] + [(1000 + i, "code") for i in range(200)]
    rows += [(2000 + i, "ref") for i in range(5)]  # undersized group
    docs = spark.createDataFrame(rows, "doc_id long, grp string")
    out = mixture_sample(docs, "grp", {"web": 0.6, "code": 0.3, "ref": 0.1}, 100, "doc_id")
    counts = {r.grp: r.n for r in out.groupBy("grp").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"web": 60, "code": 30, "ref": 5}  # shortfall visible, not shifted
    again = mixture_sample(docs, "grp", {"web": 0.6, "code": 0.3, "ref": 0.1}, 100, "doc_id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # groups outside the weight spec are excluded entirely
    extra = docs.union(spark.createDataFrame([(9999, "junk")], "doc_id long, grp string"))
    out2 = mixture_sample(extra, "grp", {"web": 0.6, "code": 0.3, "ref": 0.1}, 100, "doc_id")
    assert out2.filter("grp = 'junk'").count() == 0
