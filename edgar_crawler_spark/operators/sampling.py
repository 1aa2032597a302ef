"""Deterministic sampling for training-data curation.

Production pipelines never use ``rand()`` sampling — results must be
reproducible across reruns, resumable mid-job, and consistent between
engines. The standard trick is hash-bucket membership: a row is in the
k%-sample iff ``hash(key) mod buckets < k·buckets``. Pure JVM
expressions (whole-stage codegen), no shuffle, filter pushes to the
scan; the same H48 hash runs in DuckDB so every variant is
oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from edgar_crawler_spark.operators.hashing import h48_col

BUCKETS = 1000


def deterministic_sample(
    df: DataFrame, key_col: str, keep_buckets: int, buckets: int = BUCKETS
) -> DataFrame:
    """Rows whose hash bucket < keep_buckets (≈ keep_buckets/buckets of
    the data, exactly reproducible). No shuffle; predicate stays next
    to the scan."""
    key = F.col(key_col).cast("string")  # md5 is over the decimal text form
    return df.filter(F.pmod(h48_col(key), F.lit(buckets)) < keep_buckets)


def stratified_topk(
    df: DataFrame, strata_col: str, key_col: str, k: int
) -> DataFrame:
    """Exactly k rows per stratum, chosen by hash order (deterministic
    'random' within each group) — the balanced-subset primitive for
    training-mix curation. One shuffle on the strata key; ties broken
    by the key itself so the result is total-order stable."""
    h = h48_col(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_quotas(weights: dict[str, float], n: int) -> dict[str, int]:
    """Deterministic largest-remainder seat allocation: per-group
    quotas proportional to ``weights`` summing exactly to ``n``
    (remainder seats go to the largest fractional parts, ties broken
    by group name). Pure driver-side arithmetic over the (small, given)
    weight spec — no data-dependent input, so both engines can inline
    identical quota literals."""
    total = float(sum(weights.values()))
    exact = {g: n * w / total for g, w in weights.items()}
    base = {g: int(exact[g]) for g in weights}
    leftover = n - sum(base.values())
    by_frac = sorted(weights, key=lambda g: (-(exact[g] - base[g]), g))
    for g in by_frac[:leftover]:
        base[g] += 1
    return base


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    n: int,
    key_col: str,
) -> DataFrame:
    """Training-data MIXING: draw ≈n rows with per-group proportions
    fixed by ``weights`` (the domain/source-mixing step of corpus
    curation — e.g. 60% web, 30% code, 10% reference). Quotas come from
    :func:`mixture_quotas`; rows within each group are chosen by hash
    order (deterministic, rerun-stable, engine-portable), so the sample
    is exactly reproducible and nests consistently as n grows within a
    group. A group smaller than its quota contributes everything it has
    (no reallocation — the shortfall is visible to the caller rather
    than silently shifting the mix). Groups outside ``weights`` are
    excluded.

    Scale shape: one shuffle on the group key for the rank window; the
    quota table is groups-sized and broadcast."""
    spark = df.sparkSession
    quotas = mixture_quotas(weights, n)
    qdf = spark.createDataFrame(
        sorted(quotas.items()), f"{group_col} string, __quota int"
    )
    h = h48_col(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.join(F.broadcast(qdf), group_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )
