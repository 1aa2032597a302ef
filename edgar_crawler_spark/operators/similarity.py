"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk``   — exact cosine top-k: query×candidate join,
  dot products via zip_with/aggregate (JVM higher-order functions, no
  Python), window top-k. O(Q·N) — the correctness baseline.
* ``lsh_bucketed_topk``  — the scale path: random-hyperplane LSH.
  Each vector gets a ``bucket`` = sign bits of dots with a fixed ±1
  hyperplane matrix; candidates are joined per bucket only. At 100 TB
  the bucket join replaces the full cross join with a key-equality
  shuffle; recall is tuned by n_planes (fewer planes → bigger buckets).

Determinism: the hyperplane matrix is a pure function of
(n_planes, dim) — the same literals are injected into the DuckDB
oracle, so results match exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 matrix (no RNG: pure index arithmetic)."""
    return [
        [1 if ((d * (j + 3) + 7 * j + d // 7) % 5) < 2 else -1 for d in range(dim)]
        for j in range(n_planes)
    ]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k neighbours for each query id.
    Returns (query_id, neighbor_id, rnk, cos)."""
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 4).alias("cos"))
    )


def bucket_col(vec: Column, planes: list[list[int]]) -> Column:
    """LSH bucket id = Σ_j (dot(v, plane_j) > 0) << j."""
    out = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        dot_j = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        out = out + F.when(dot_j > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def lsh_bucketed_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Same output shape as brute_force_topk."""
    planes = hyperplanes(n_planes, dim)
    withb = emb.withColumn("bucket", bucket_col(F.col(vec_col), planes))
    q = withb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    c = withb.select(F.col("vec_id").alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket")
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 4).alias("cos"))
    )


def ivf_centroids(n_cells: int, dim: int) -> list[list[int]]:
    """Deterministic integer coarse centroids (pure index arithmetic —
    a trained k-means would slot in identically; only direction
    matters for assignment)."""
    return [
        [((d * (c + 2) + 11 * c + d // 5) % 7) - 3 for d in range(dim)]
        for c in range(n_cells)
    ]


def _cell_col(vec: Column, cents: list[list[int]]) -> Column:
    """argmax_c dot(v, centroid_c); ties → lowest cell index."""
    dots = [
        _dot(vec, F.array(*[F.lit(float(x)) for x in c])) for c in cents
    ]
    best = F.greatest(*dots)
    cell = F.lit(len(cents) - 1).cast("int")
    for j in range(len(cents) - 2, -1, -1):
        cell = F.when(dots[j] == best, F.lit(j)).otherwise(cell)
    return cell


def _probe_cells_col(vec: Column, cents: list[list[int]], nprobe: int) -> Column:
    """Array of the nprobe best cell ids for a query vector, ranked by
    centroid dot product (ties → lower index), as a JVM-side
    sort_array over (−dot, index) structs — no Python."""
    entries = F.array(
        *[
            F.struct(
                (-_dot(vec, F.array(*[F.lit(float(x)) for x in c]))).alias("nd"),
                F.lit(j).cast("int").alias("j"),
            )
            for j, c in enumerate(cents)
        ]
    )
    ranked = F.sort_array(entries)  # ascending (−dot, j) == dot desc, j asc
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["j"])


def kmeans_refine(
    emb: DataFrame,
    n_cells: int = 8,
    dim: int = 64,
    iterations: int = 2,
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """Spherical k-means from the deterministic :func:`ivf_centroids`
    seed — the 'trained quantizer' the IVF docstring promises. The
    assignment rule is IDENTICAL to :func:`_cell_col` (argmax centroid
    dot, ties → lowest cell); the update is mean-then-L2-normalize,
    which makes the dot objective monotone non-decreasing between
    refined rounds (Dhillon & Modha 2001) and keeps argmax-dot
    assignment meaningful, so the refined centroids drop straight into
    :func:`ivf_topk` via its ``cents=`` hook.

    Distributed shape per round: one map-side-combined groupBy — each
    executor partial-aggregates k×(dim+1) doubles, the shuffle carries
    only those partials, and the driver collects k rows (model state is
    broadcast-scale by definition; this is the canonical Spark k-means
    loop). Empty or zero-mean cells keep their previous centroid.
    Returns (refined_centroids, assignments) where assignments is
    (vec_id, cell, score) under the final centroids — score = the
    winning centroid dot, the spherical-k-means objective.

    The seed is the L2-NORMALIZED :func:`ivf_centroids` matrix: the
    monotonicity argument needs every centroid on the unit sphere
    (replacing a norm-16 integer seed row with a unit mean could
    *lower* the dot objective)."""
    cents = []
    for c in ivf_centroids(n_cells, dim):
        nrm = sum(float(x) * float(x) for x in c) ** 0.5 or 1.0
        cents.append([float(x) / nrm for x in c])
    df = emb.select("vec_id", F.col(vec_col).alias("v"))
    for _ in range(iterations):
        assigned = df.withColumn("cell", _cell_col(F.col("v"), cents))
        rows = assigned.groupBy("cell").agg(
            *[F.avg(F.col("v")[d].cast("double")).alias(f"m{d}") for d in range(dim)]
        ).collect()
        new = {}
        for r in rows:
            m = [r[f"m{d}"] for d in range(dim)]
            nrm = sum(x * x for x in m) ** 0.5
            if nrm > 0:
                new[r["cell"]] = [x / nrm for x in m]
        cents = [new.get(j, cents[j]) for j in range(n_cells)]
    out = df.withColumn("cell", _cell_col(F.col("v"), cents)).select(
        "vec_id",
        "cell",
        F.round(
            F.greatest(*[_dot(F.col("v"), F.array(*[F.lit(x) for x in c])) for c in cents]), 4
        ).alias("score"),
    )
    return cents, out


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    nprobe: int = 1,
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    centroid cell; a query probes its ``nprobe`` best cells (the
    standard recall knob — nprobe=n_cells degrades gracefully to
    brute force). At scale the cell id is the shuffle/bucketing key —
    the cross join becomes a key-equality join, exactly like the LSH
    path but with a learned/structured quantizer; probing explodes
    each QUERY nprobe× (queries are the small side), candidates keep
    one cell each, so a (query, candidate) pair appears at most once
    and needs no dedup. Same output shape as brute_force_topk.
    ``cents`` injects a trained quantizer (see :func:`kmeans_refine`);
    default is the deterministic seed."""
    if cents is None:
        cents = ivf_centroids(n_cells, dim)
    withc = emb.withColumn("cell", _cell_col(F.col(vec_col), cents))
    queries = emb.filter(F.col("vec_id").isin(query_ids))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(_probe_cells_col(F.col(vec_col), cents, nprobe)).alias("cell"),
    )
    c = withc.select(F.col("vec_id").alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell")
    scored = (
        q.join(c, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 4).alias("cos"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, n_planes: int = 4, dim: int = 64
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets:
    (vec_a, vec_b, cos) with cos >= threshold, vec_a < vec_b."""
    planes = hyperplanes(n_planes, dim)
    withb = emb.withColumn("bucket", bucket_col(F.col("embedding"), planes))
    a = withb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"), "bucket")
    b = withb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"), "bucket")
    return (
        a.join(b, on="bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
    )
