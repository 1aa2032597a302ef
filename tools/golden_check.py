"""Iterate the extraction kernel against the reference's golden 8-K
fixture corpus (553 raw .htm + golden .json) WITHOUT Spark — plain
Python, for fast parity debugging.

Usage: python tools/golden_check.py [limit] [-v filename]
"""

from __future__ import annotations

import json
import sys
import zipfile

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from edgar_crawler_spark.extract.extractor import extract_filing  # noqa: E402

FIX = "/root/reference/tests/fixtures"
ITEMS_8K_NEW = [
    "1.01", "1.02", "1.03", "1.04", "1.05", "2.01", "2.02", "2.03", "2.04",
    "2.05", "2.06", "3.01", "3.02", "3.03", "4.01", "4.02", "5.01", "5.02",
    "5.03", "5.04", "5.05", "5.06", "5.07", "5.08", "6.01", "6.02", "6.03",
    "6.04", "6.05", "7.01", "8.01", "9.01",
]
ITEMS_8K_OLD = [str(i) for i in range(1, 13)]


def load_metadata() -> dict[str, dict]:
    df = pd.read_csv(f"{FIX}/FILINGS_METADATA_TEST.csv", dtype=str)
    df = df[df["Type"] == "8-K"].replace({np.nan: None})
    return {row["filename"]: dict(row) for _, row in df.iterrows()}


def main() -> int:
    limit = None
    verbose_file = None
    args = sys.argv[1:]
    if "-v" in args:
        verbose_file = args[args.index("-v") + 1]
    elif args:
        limit = int(args[0])

    meta = load_metadata()
    zr = zipfile.ZipFile(f"{FIX}/RAW_FILINGS/8-K.zip")
    ze = zipfile.ZipFile(f"{FIX}/EXTRACTED_FILINGS/8-K.zip")
    names = [n for n in zr.namelist() if n.endswith((".htm", ".txt"))]
    if verbose_file:
        names = [n for n in names if verbose_file in n]
    elif limit:
        names = names[:limit]

    n_ok = n_fail = n_skip = 0
    fail_items: dict[str, int] = {}
    fail_files = []
    for name in names:
        fname = name.split("/", 1)[1]
        if fname not in meta:
            n_skip += 1
            continue
        md = meta[fname]
        items = ITEMS_8K_NEW if (md["Date"] and md["Date"] > "2004-08-23") else ITEMS_8K_OLD
        raw = zr.read(name).decode("utf-8", "backslashreplace")
        try:
            got = extract_filing(raw, md, items_to_extract=items, remove_tables=True)
        except Exception as e:
            print(f"ERROR {fname}: {type(e).__name__}: {e}")
            n_fail += 1
            fail_files.append(fname)
            continue
        gold_name = name.rsplit(".", 1)[0] + ".json"
        gold = json.loads(ze.read(gold_name))
        if got is None:
            got = {}
        bad = []
        for k in set(gold) | set(got):
            if gold.get(k, "") != got.get(k, ""):
                bad.append(k)
                fail_items[k] = fail_items.get(k, 0) + 1
        if bad:
            n_fail += 1
            fail_files.append(fname)
            if verbose_file:
                for k in sorted(bad):
                    print(f"--- {k} ---")
                    print("GOLD:", repr(gold.get(k, ""))[:2000])
                    print("GOT :", repr(got.get(k, ""))[:2000])
        else:
            n_ok += 1
    print(f"\nOK {n_ok}  FAIL {n_fail}  SKIP {n_skip}")
    if fail_items:
        print("mismatched keys:", dict(sorted(fail_items.items(), key=lambda x: -x[1])[:15]))
    if fail_files and not verbose_file:
        print("first failures:", fail_files[:10])
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
