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
