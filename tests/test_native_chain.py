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


def test_extract_drop_near_dups(spark, tmp_path):
    """crawl (duplicate contents) → --caption-dedup pass →
    extract_from_frontier(drop_near_dups=True) extracts ONE filing per
    near-dup cluster, and the skipped members never re-extract."""
    from edgar_crawler_spark.plans.pipeline import caption_near_dups_from_frontier

    def filing_fetcher(url: str, attempt: int):
        import re

        from edgar_crawler_spark.fixtures.raw_documents import make_10k

        i = int(re.search(r"-(\d{6})-index\.html$", url).group(1))
        # 12 docs, 4 contents; captions identical within a cluster and
        # token-disjoint across clusters (LSH candidates are high-recall
        # by design — similar-but-distinct captions would chain)
        cap = " ".join(f"w{(i % 4) * 10 + j}" for j in range(6))
        return 200, make_10k(i % 4).encode(), cap

    wd = str(tmp_path / "w")
    fr = CrawlFrontier(spark, wd, fetcher=filing_fetcher)
    fr.submit(seed_index_df(spark, 12, n_hosts=2, hot_host=False))
    fr.run()
    caption_near_dups_from_frontier(spark, wd)

    n = extract_from_frontier(spark, wd, drop_near_dups=True)
    assert n > 0
    from edgar_crawler_spark.frontier.state import SnapshotTable

    tbl = SnapshotTable(wd + "/extracted").read(spark)
    assert tbl.select("filename").distinct().count() == 4  # one per cluster

    # the skipped duplicates are NOT picked up by a later plain run
    # within this dedup policy; a second dedup run extracts nothing new
    assert extract_from_frontier(spark, wd, drop_near_dups=True) == 0


def test_extract_incremental_payload_cut(spark, tmp_path):
    """A second crawl wave followed by a second extraction scans only
    the NEW payload files (version watermark in the extracted
    manifest) and extracts exactly the new filings."""

    def filing_fetcher(url: str, attempt: int):
        import re

        from edgar_crawler_spark.fixtures.raw_documents import make_8k

        i = int(re.search(r"-(\d{6})-index\.html$", url).group(1))
        return 200, make_8k(i).encode(), None

    wd = str(tmp_path / "w")
    fr = CrawlFrontier(spark, wd, fetcher=filing_fetcher)
    fr.submit(seed_index_df(spark, 10, n_hosts=2, hot_host=False))
    fr.run()
    assert extract_from_frontier(spark, wd) > 0

    from edgar_crawler_spark.frontier.state import SnapshotTable

    v1 = SnapshotTable(wd + "/payload").current_version()
    assert SnapshotTable(wd + "/extracted").latest_metrics()["payload_version"] == v1

    fr2 = CrawlFrontier(spark, wd, fetcher=filing_fetcher)
    fr2.submit(seed_index_df(spark, 25, n_hosts=2, hot_host=False))
    fr2.run()
    n2 = extract_from_frontier(spark, wd)
    assert n2 > 0
    tbl = SnapshotTable(wd + "/extracted").read(spark)
    assert tbl.select("filename").distinct().count() == 25
    # and a third run with nothing new extracts nothing
    assert extract_from_frontier(spark, wd) == 0


def test_filter_change_readmits_skipped_filings(spark, tmp_path):
    """Review regression: a type-filtered extraction must not burn the
    payload watermark for OTHER types — a later unfiltered run
    re-admits the filings the first run filtered out."""

    def filing_fetcher(url: str, attempt: int):
        import re

        from edgar_crawler_spark.fixtures.raw_documents import make_8k, make_10k

        i = int(re.search(r"-(\d{6})-index\.html$", url).group(1))
        return 200, (make_10k if i % 2 else make_8k)(i).encode(), None

    wd = str(tmp_path / "w")
    fr = CrawlFrontier(spark, wd, fetcher=filing_fetcher)
    fr.submit(seed_index_df(spark, 10, n_hosts=2, hot_host=False))
    fr.run()

    n1 = extract_from_frontier(spark, wd, filing_types=["10-K"])
    assert n1 > 0
    from edgar_crawler_spark.frontier.state import SnapshotTable

    tbl = SnapshotTable(wd + "/extracted").read(spark)
    types1 = {r.filing_type for r in tbl.select("filing_type").distinct().collect()}
    assert types1 == {"10-K"}

    # unfiltered run: the 8-Ks below the watermark must still arrive
    n2 = extract_from_frontier(spark, wd)
    assert n2 > 0
    tbl2 = SnapshotTable(wd + "/extracted").read(spark)
    assert tbl2.select("filename").distinct().count() == 10
