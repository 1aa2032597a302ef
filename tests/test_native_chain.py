import pyspark.sql.functions as F

from edgar_crawler_spark.fixtures.seed_index import seed_index_df
from edgar_crawler_spark.frontier.frontier import CrawlFrontier
from edgar_crawler_spark.plans.pipeline import extract_from_frontier


def test_engine_native_two_stage(spark, tmp_path):
    """crawl → payload/log snapshot tables → extract_from_frontier →
    'extracted' snapshot table, all table-native (no folder layout)."""

    def filing_fetcher(url: str, attempt: int):
        # emit synthetic filing HTML keyed by the row index
        import re

        from edgar_crawler_spark.fixtures.raw_documents import make_8k, make_10k, make_10q

        i = int(re.search(r"-(\d{6})-index\.html$", url).group(1))
        mk = [make_10k, make_10q, make_8k][i % 3]
        return 200, mk(i).encode(), None

    wd = str(tmp_path / "w")
    fr = CrawlFrontier(spark, wd, fetcher=filing_fetcher)
    fr.submit(seed_index_df(spark, 24, n_hosts=3, hot_host=False))
    fr.run()

    n_new = extract_from_frontier(spark, wd)
    assert n_new > 0
    from edgar_crawler_spark.frontier.state import SnapshotTable

    tbl = SnapshotTable(wd + "/extracted").read(spark)
    n_docs = tbl.select("filename").distinct().count()
    assert n_docs == 24
    keys = {r.item_key for r in tbl.select("item_key").distinct().collect()}
    assert any(k.startswith("item_") for k in keys)

    # J5: re-run extracts nothing new
    assert extract_from_frontier(spark, wd) == 0
    assert SnapshotTable(wd + "/extracted").read(spark).count() == tbl.count()
