"""Bucketed tables for co-located joins (SURVEY.md §1.3/§4.3).

At 100 TB the URL-seen and payload tables are joined by url_hash /
image_id every wave; bucketing both sides on the join key at write
time makes every subsequent join shuffle-free (bucket-pruned reads,
no Exchange in the plan). The frontier's SnapshotTable keeps plain
parquet for snapshot semantics; this module is the catalog-table
variant used when a metastore is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    path: str | None = None,
) -> None:
    w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, merge_hint: bool = False
) -> DataFrame:
    """Join two tables bucketed on the same key with matching bucket
    counts — Catalyst elides both shuffle exchanges. ``merge_hint``
    forces sort-merge (useful when one side is small enough that the
    planner would rather broadcast, hiding the bucketing effect)."""
    right = spark.table(right_table)
    if merge_hint:
        right = right.hint("merge")
    return spark.table(left_table).join(right, on=key)
