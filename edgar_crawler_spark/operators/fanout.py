"""Scale-adaptive scan fan-out (guide §2.5 input skew / §1.2).

Single-row-group parquet files (the driver's testdata tables are one
file with 1-6 row groups) cap scan parallelism far below the core
count, so per-row-expensive pipelines (md5 token hashing, regexp
feature extraction, 64-dim dot products) run nearly serial at
local[32]. ``fanout`` inserts ONE round-robin repartition to
``defaultParallelism`` — but only when the source's native parallelism
is actually short, so at 100 TB (thousands of splits) it is a no-op
and nothing ever shuffles a wide table for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition to ``factor * defaultParallelism`` iff the frame's
    current partitioning is below that (narrow inputs feeding expensive
    per-row work); pass through untouched otherwise."""
    par = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
