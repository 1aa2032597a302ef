"""The full 553-file golden corpus through the DISTRIBUTED extraction
path: load every raw 8-K into a DataFrame, run extract_records
(mapInPandas), compare every emitted item against the reference's
golden JSONs. The single-process sweep lives in tools/golden_check.py;
this asserts the Spark path preserves byte-exact parity at full scale."""

import json
import zipfile

import numpy as np
import pandas as pd

FIX = "/root/reference/tests/fixtures"


def test_full_corpus_through_spark(spark):
    from edgar_crawler_spark.extract.spark_extract import extract_records

    meta_df = pd.read_csv(f"{FIX}/FILINGS_METADATA_TEST.csv", dtype=str)
    meta_df = meta_df[meta_df["Type"] == "8-K"].replace({np.nan: None})
    meta = {r["filename"]: dict(r) for _, r in meta_df.iterrows()}

    zr = zipfile.ZipFile(f"{FIX}/RAW_FILINGS/8-K.zip")
    names = [n for n in zr.namelist() if n.endswith((".htm", ".txt"))]
    rows = []
    for name in names:
        fname = name.split("/", 1)[1]
        md = dict(meta[fname])
        md["content"] = zr.read(name).decode("utf-8", "backslashreplace")
        rows.append(md)
    df = spark.createDataFrame(pd.DataFrame(rows))

    recs = extract_records(df, remove_tables=True).collect()
    assert len(recs) == len(rows)
    by_name = {r["filename"]: r for r in recs}

    ze = zipfile.ZipFile(f"{FIX}/EXTRACTED_FILINGS/8-K.zip")
    n_checked = n_bad = 0
    for name in names:
        fname = name.split("/", 1)[1]
        gold = json.loads(ze.read(name.rsplit(".", 1)[0] + ".json"))
        got = by_name[fname]["items"] or {}
        for k, v in gold.items():
            n_checked += 1
            if got.get(k, "") != v:
                n_bad += 1
    assert n_bad == 0, f"{n_bad}/{n_checked} golden fields mismatched"
    assert n_checked > 20000
