"""URL canonicalization + identity hashing — all JVM-side column
expressions (whole-stage codegen; no Python in the hot path).

The reference dedups on the raw ``html_index`` string
(download_filings.py:151-158). At 10^10-URL scale we canonicalize
first (scheme/host lowercasing, default-port strip, fragment strip,
trailing-slash normalization) and key everything on
``xxhash64(canonical_url)`` (north_rule), keeping the exact string for
the FP-recheck join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def canonical_url_col(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    # strip fragment
    c = F.regexp_replace(c, r"#.*$", "")
    # lowercase scheme+host (group 1), keep path case (group 2)
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)),
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$", 1),
    )
    # default ports
    c = F.regexp_replace(c, r"^(https://[^/:]+):443(/|$)", r"$1$2")
    c = F.regexp_replace(c, r"^(http://[^/:]+):80(/|$)", r"$1$2")
    # collapse duplicate slashes in path (not the scheme's //)
    c = F.regexp_replace(c, r"(?<!:)//+", "/")
    # trailing slash on non-root path
    c = F.regexp_replace(c, r"(.+[^/])/$", r"$1")
    return c


def host_col(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:]+)", 1))


def with_url_identity(df: DataFrame, url_col: str = "html_index") -> DataFrame:
    """Adds canonical_url, url_hash (xxhash64), host columns."""
    return (
        df.withColumn("canonical_url", canonical_url_col(url_col))
        .withColumn("url_hash", F.xxhash64("canonical_url"))
        .withColumn("host", host_col("canonical_url"))
    )
