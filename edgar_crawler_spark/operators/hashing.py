"""Portable 48-bit token hash: H48(s) = first 12 hex chars of md5(s)
interpreted little-endian base-16.

Why not xxhash64: the DuckDB oracle has no xxhash64, and hash-based
operators (MinHash, SimHash, exact dedup buckets) are only
oracle-checkable if BOTH engines compute the identical hash. md5 is
bit-identical everywhere; 48 bits fit a signed BIGINT exactly in both.
Inside the engine proper (URL-seen), we still use Spark's native
xxhash64 — this helper exists for the verifiable dedup operators.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column

_HEX = "0123456789abcdef"


def h48_col(c: Column) -> Column:
    """Spark column: H48 of a string column (JVM-side md5 + arithmetic).

    The little-endian per-char weighting (char i worth 16^(i-1)) is one
    ``conv`` over the REVERSED 12-char prefix — identical value to the
    12-term instr/substring sum it replaces, at a fraction of the
    expression cost (one string reverse + one base conversion instead
    of 12 substring+instr+multiply nodes per hash)."""
    return F.conv(F.reverse(F.substring(F.md5(c), 1, 12)), 16, 10).cast("long")


def h48_sql(expr: str) -> str:
    """The same H48 as DuckDB SQL text over an arbitrary expression."""
    terms = [
        f"(instr('{_HEX}', substring(md5({expr}), {i + 1}, 1)) - 1) * {16**i}::BIGINT"
        for i in range(12)
    ]
    return "(" + " + ".join(terms) + ")"


def h48_py(s: str) -> int:
    """Python reference (tests)."""
    md5 = hashlib.md5(s.encode()).hexdigest()
    return sum(_HEX.index(md5[i]) * 16**i for i in range(12))
