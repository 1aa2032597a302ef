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


def decode_content(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add a ``content`` string column decoded from raw bytes with the
    reference's errors='backslashreplace' semantics
    (extract_items.py:998-1000) — Python-codec behavior, so it runs as
    an Arrow-batched mapInPandas over (the projection of) the input.
    All input columns pass through."""
    from pyspark.sql.types import StructType

    out_schema = StructType(df.schema.fields + [StructField("content", StringType())])
    cols = [f.name for f in df.schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out["content"] = [
                bytes(b).decode("utf-8", "backslashreplace") if b is not None else None
                for b in pdf[bytes_col]
            ]
            yield out

    return df.mapInPandas(decode, out_schema)


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
