"""S10: raw filing scan — binaryFile source + errors='backslashreplace'
decode inside Arrow batches (the reference's per-file open(...,
errors='backslashreplace').read(), extract_items.py:998-1000)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

RAW_SCHEMA = StructType(
    [StructField("path", StringType()), StructField("filename", StringType()), StructField("content", StringType())]
)


def read_raw_filings(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Directory of raw filing blobs → (path, filename, content)."""
    binf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "filename": pdf["path"].str.rsplit("/", n=1).str[-1],
                    "content": [
                        bytes(b).decode("utf-8", "backslashreplace") for b in pdf["content"]
                    ],
                }
            )

    return binf.mapInPandas(decode, RAW_SCHEMA)
