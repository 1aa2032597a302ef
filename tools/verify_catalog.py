"""Local stand-in for the driver's correctness gate: run every catalog
query in Spark AND its oracle SQL in DuckDB at sf0.01, compare
row-count + column names + order-insensitive values.

Usage: python tools/verify_catalog.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from edgar_crawler_spark.catalog import CATALOG  # noqa: E402
from edgar_crawler_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main(names: list[str]) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    failures = 0
    todo = names or list(CATALOG)
    for name in todo:
        fn, sql = CATALOG[name]
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            failures += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures += 1
            continue
        a, b = normalize(sdf), normalize(odf)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"OK   {name}: {len(sdf)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:400]}")
            failures += 1
    print(f"\n{len(todo) - failures}/{len(todo)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
