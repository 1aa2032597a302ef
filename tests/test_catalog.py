"""Catalog correctness: every queries() entry vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

import duckdb
import pandas as pd
import pytest

from edgar_crawler_spark.catalog import CATALOG

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, con, name):
    fn, sql = CATALOG[name]
    sdf = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(sdf) >= 0  # rows-only check
        return
    odf = con.execute(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    pd.testing.assert_frame_equal(
        _normalize(sdf), _normalize(odf), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
