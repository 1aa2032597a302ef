"""Scale-adaptive scan fan-out (guide §2.5 input skew / §1.2).

Single-row-group parquet files (the driver's testdata tables are one
file with 1-6 row groups) cap scan parallelism far below the core
count, so per-row-expensive pipelines (md5 token hashing, regexp
feature extraction, 64-dim dot products) run nearly serial at
local[32]. ``fanout`` inserts ONE round-robin repartition to
``defaultParallelism`` — but only when the source is a NARROW frame
(scans/projects/filters/generators) whose native parallelism is
actually short, so at 100 TB (thousands of splits) it is a no-op and
nothing ever shuffles a wide table for free.

Why the plan walk: ``df.rdd.getNumPartitions()`` under AQE eagerly
materializes every shuffle/broadcast stage in the frame at
DataFrame-CONSTRUCTION time (verified: 2 jobs launched for a
join-bearing frame before any action), and that work is re-run at
execution because stage reuse does not cross QueryExecutions. So the
partition probe is only taken for exchange-free plans — where it is
job-free — and any frame that already contains a join/aggregate/
window/repartition/sort is returned untouched (its output is already
at shuffle parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: logical-plan node prefixes that imply an exchange (or an explicit
#: partitioning) upstream — such frames are already parallel AND
#: probing .rdd on them would eagerly execute those stages under AQE
_WIDE_NODES = (
    "Join ",
    "Aggregate ",
    "Window ",
    "Sort ",
    "Deduplicate ",
    "RepartitionByExpression",
    "Repartition ",
    "GlobalLimit",
)


def _has_wide_node(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return any(
        line.lstrip(" +-:").startswith(_WIDE_NODES)
        for line in plan.splitlines()
    )


def fanout(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition to ``factor * defaultParallelism`` iff the frame is
    a narrow (exchange-free) pipeline whose current partitioning is
    below that; pass wide frames through untouched."""
    if _has_wide_node(df):
        return df
    par = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
