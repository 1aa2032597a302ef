"""Skew-handling join strategies (SURVEY.md §4.3 / §2.3 note).

AQE's skew-join split handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); this module
provides the explicit salting strategy for the cases AQE can't fix —
e.g. a broadcast-ineligible dimension hit by one hot key:

    left (skewed fact)  : salt = pmod(xxhash64(<row identity>), S)
    right (hot dim side): exploded ×S (each row replicated per salt)
    join on (key, salt) → the hot key's rows spread over S tasks.

Result-identical to the plain join (verified against the DuckDB
oracle, which runs the unsalted SQL).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    salt_by: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left⋈right on ``on`` with the right side exploded across
    ``salt_buckets`` salts. ``salt_by`` must be a deterministic
    expression over LEFT's columns (defaults to xxhash64 of all left
    columns) so the same row always lands in the same salt bucket."""
    if salt_by is None:
        salt_by = F.xxhash64(*[F.col(c) for c in left.columns])
    lhs = left.withColumn("__salt", F.pmod(salt_by, F.lit(salt_buckets)).cast("int"))
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return lhs.join(rhs, on=[on, "__salt"], how=how).drop("__salt")
