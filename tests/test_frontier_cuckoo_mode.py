"""CrawlFrontier with the cuckoo pre-filter: identical results to the
bloom-filtered and exact paths."""

from edgar_crawler_spark.fixtures.seed_index import previously_crawled_df, seed_index_df
from edgar_crawler_spark.frontier.frontier import CrawlFrontier


def test_cuckoo_frontier_matches_bloom(spark, tmp_path):
    seed = seed_index_df(spark, 150)
    old = previously_crawled_df(spark, 150)

    logs = {}
    for kind in ("bloom", "cuckoo"):
        fr = CrawlFrontier(spark, str(tmp_path / kind), filter_kind=kind)
        fr.bootstrap_seen(old)
        fr.submit(seed)
        fr.run()
        logs[kind] = fr.fetch_log().toPandas()

    assert list(logs["bloom"].row_seq) == list(logs["cuckoo"].row_seq)
    assert set(logs["bloom"].html_index) == set(logs["cuckoo"].html_index)
