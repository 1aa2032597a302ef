"""Extraction parity vs the reference's golden fixtures (byte-exact,
same discipline as the reference's own tests). The full 553-file sweep
lives in tools/golden_check.py (0 failures); here a deterministic
sample keeps pytest fast, plus the Spark mapInPandas path is checked
for agreement with the plain kernel."""

import json
import zipfile

import numpy as np
import pandas as pd
import pytest

from edgar_crawler_spark.extract.extractor import extract_filing

FIX = "/root/reference/tests/fixtures"
ITEMS_8K_NEW = [
    "1.01", "1.02", "1.03", "1.04", "1.05", "2.01", "2.02", "2.03", "2.04",
    "2.05", "2.06", "3.01", "3.02", "3.03", "4.01", "4.02", "5.01", "5.02",
    "5.03", "5.04", "5.05", "5.06", "5.07", "5.08", "6.01", "6.02", "6.03",
    "6.04", "6.05", "7.01", "8.01", "9.01",
]
ITEMS_8K_OLD = [str(i) for i in range(1, 13)]
SAMPLE_EVERY = 4  # 553 / 4 ≈ 138 files in pytest; tools/golden_check.py sweeps all 553


@pytest.fixture(scope="module")
def corpus():
    df = pd.read_csv(f"{FIX}/FILINGS_METADATA_TEST.csv", dtype=str)
    df = df[df["Type"] == "8-K"].replace({np.nan: None})
    meta = {row["filename"]: dict(row) for _, row in df.iterrows()}
    zr = zipfile.ZipFile(f"{FIX}/RAW_FILINGS/8-K.zip")
    ze = zipfile.ZipFile(f"{FIX}/EXTRACTED_FILINGS/8-K.zip")
    names = sorted(n for n in zr.namelist() if n.endswith((".htm", ".txt")))
    return meta, zr, ze, names


def _items_for(md):
    return ITEMS_8K_NEW if (md["Date"] and md["Date"] > "2004-08-23") else ITEMS_8K_OLD


def test_golden_byte_exact_sample(corpus):
    meta, zr, ze, names = corpus
    checked = 0
    for name in names[::SAMPLE_EVERY]:
        fname = name.split("/", 1)[1]
        md = meta[fname]
        raw = zr.read(name).decode("utf-8", "backslashreplace")
        got = extract_filing(raw, md, items_to_extract=_items_for(md), remove_tables=True)
        gold = json.loads(ze.read(name.rsplit(".", 1)[0] + ".json"))
        # the reference's own test backfills golden keys missing for
        # empty items (tests/test_extract_items.py:303-306)
        for k in set(gold) | set(got or {}):
            assert (got or {}).get(k, "") == gold.get(k, ""), f"mismatch {fname} {k}"
        checked += 1
    assert checked >= 130


def test_spark_extract_agrees_with_kernel(spark, corpus):
    meta, zr, ze, names = corpus
    from edgar_crawler_spark.extract.spark_extract import extract_records, items_long

    rows = []
    for name in names[:: SAMPLE_EVERY * 2]:
        fname = name.split("/", 1)[1]
        md = dict(meta[fname])
        md["content"] = zr.read(name).decode("utf-8", "backslashreplace")
        rows.append(md)
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    # 8-K new/obsolete differ per row; the kernel dispatches on Date itself
    recs = extract_records(df, items_to_extract=None, remove_tables=True).collect()
    assert len(recs) == len(rows)
    by_name = {r["filename"]: r for r in recs}
    for row in rows:
        r = by_name[row["filename"]]
        assert r["error"] is None, f"{row['filename']}: {r['error']}"
        gold = json.loads(
            ze.read(f"8-K/{row['filename'].rsplit('.', 1)[0]}.json")
        )
        # spark path extracts ALL items (items_to_extract=None) incl.
        # metadata keys; golden item values must agree
        for k, v in gold.items():
            assert r["items"].get(k) == v, f"{row['filename']} {k}"

    long_df = items_long(
        extract_records(df, items_to_extract=None, remove_tables=True)
    )
    assert long_df.filter("item_key like 'item_%'").count() > 0
