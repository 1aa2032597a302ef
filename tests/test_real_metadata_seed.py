"""Frontier integration on the reference's own fixture metadata: the
799-row FILINGS_METADATA_TEST.csv as the seed list — real EDGAR URL
shapes, single real host, crawl-order exact-match against file order."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from edgar_crawler_spark.frontier.frontier import CrawlFrontier

CSV = "/root/reference/tests/fixtures/FILINGS_METADATA_TEST.csv"


def _seed(spark):
    pdf = pd.read_csv(CSV, dtype=str).replace({np.nan: None})
    pdf = pdf[pdf["html_index"].notna()].reset_index(drop=True)
    pdf = pdf.rename(
        columns={"CIK": "cik", "Company": "company", "Type": "type", "Date": "date"}
    )[["cik", "company", "type", "date", "html_index", "complete_text_file_link"]]
    pdf["year"] = 2022
    pdf["quarter"] = 1
    pdf["row_seq"] = range(len(pdf))  # CSV line order = crawl order
    return spark.createDataFrame(pdf), pdf


def test_real_metadata_crawl_order_and_seen(spark, tmp_path):
    seed, pdf = _seed(spark)
    fr = CrawlFrontier(spark, str(tmp_path / "w"), wave_quota=10**9)
    admitted = fr.submit(seed)
    # duplicates within the CSV dedup on admission
    n_unique = pdf["html_index"].nunique()
    assert admitted == n_unique
    fr.run()
    log = fr.fetch_log().toPandas()
    assert len(log) == n_unique
    # every real EDGAR html_index URL fetched by the stub (accession
    # regex matches real accession numbers)
    assert (log.state == "fetched").all()
    # crawl order equals CSV order over the first-seen rows
    first_seen = pdf.drop_duplicates("html_index")
    assert list(log.html_index) == list(first_seen.html_index)
    assert set(fr.seen_set().toPandas().canonical_url) == set(pdf.html_index)
    # single-host politeness: all on www.sec.gov, budget respected
    assert set(log.host) == {"www.sec.gov"}
    assert log.wait_s.sum() >= (n_unique - 10) / 10.0 * 0.99
