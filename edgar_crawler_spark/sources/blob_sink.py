"""Folder-of-files sinks matching the reference's on-disk layouts.

S7 (raw blobs): the reference writes each fetched filing as
``{raw_filings_folder}/{Type}/{CIK}_{TYPE}_{YEAR}_{accession}.{ext}``
(download_filings.py:716-729).  S11 (extracted JSON): one
``{extracted_filings_folder}/{Type}/{basename}.json`` per filing,
``json.dump(indent=4, ensure_ascii=False)`` (extract_items.py:1160-1186).

These sinks exist for *interchange parity* — stage-1 output written here
is directly consumable by the reference's own ``extract_items.py``, and
our stage-2 CLI consumes/produces the same layout.  The engine's native
state remains the snapshot tables (payload/log/extracted); a
folder-of-files layout is inherently the non-scale path (one file per
row), so these run as ``foreachPartition`` side-effect writers: each
task writes only its partition's rows, filenames are unique per row
(P5 derivation), and the target must be shared storage on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_raw_filing_files(df: DataFrame, root: str) -> None:
    """S7 layout: one ``{root}/{Type}/{filename}`` file per row.

    Expects columns (``type``, ``filename``, ``bytes``).  Idempotent:
    rewriting an existing file yields identical content (deterministic
    inputs), so a retried task is safe.
    """
    rows = df.select("type", "filename", "bytes")

    def write_partition(it):
        for row in it:
            if row.filename is None or row.bytes is None:
                continue
            d = os.path.join(root, row.type)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, row.filename), "wb") as f:
                f.write(bytes(row.bytes))

    os.makedirs(root, exist_ok=True)
    rows.foreachPartition(write_partition)


def write_filing_json_files(df: DataFrame, root: str) -> None:
    """S11 layout: ``{root}/{Type}/{basename}.json`` per row, exact
    reference serialization (the ``json`` column is pre-serialized by
    the extraction kernel with indent=4 / ensure_ascii=False so key
    order survives — a MapType round-trip would lose it)."""
    rows = df.select("filing_type", "filename", "json")

    def write_partition(it):
        for row in it:
            if row.json is None or row.filename is None:
                continue
            d = os.path.join(root, row.filing_type)
            os.makedirs(d, exist_ok=True)
            base = row.filename.split(".")[0]
            with open(os.path.join(d, f"{base}.json"), "w", encoding="utf-8") as f:
                f.write(row.json)

    os.makedirs(root, exist_ok=True)
    rows.foreachPartition(write_partition)


def list_extracted_basenames(spark: SparkSession, root: str) -> DataFrame:
    """J5 key set for the folder layout: basenames (sans .json) of the
    already-extracted files under ``{root}/{Type}/``.  The engine's
    native J5 anti-joins against the extracted snapshot table; this is
    the folder-compat variant — a directory listing, parallelized via
    the binaryFile source's driver-side file index (content is never
    read: we select only ``path``)."""
    from pyspark.sql import functions as F

    subdirs = [
        os.path.join(root, d)
        for d in (os.listdir(root) if os.path.isdir(root) else [])
        if os.path.isdir(os.path.join(root, d))
    ]
    if not subdirs:
        return spark.createDataFrame([], "basename string")
    paths = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.json")
        .load(subdirs)
        .select("path")
    )
    return paths.select(
        F.regexp_extract(F.col("path"), r"/([^/]+)\.json$", 1).alias("basename")
    )
