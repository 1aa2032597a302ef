"""Permanent fetch failures: retried up to max_attempts waves, logged
with a terminal 'failed' disposition, excluded from seen/payload."""

import pyspark.sql.functions as F

from edgar_crawler_spark.fixtures.seed_index import seed_index_df
from edgar_crawler_spark.frontier.fetch import stub_fetcher
from edgar_crawler_spark.frontier.frontier import CrawlFrontier


def test_permanent_failures_terminal(spark, tmp_path):
    # defined as a closure: cloudpickle ships it by value (a test-module
    # top-level function would pickle by reference and fail on workers)
    def flaky_forever_fetcher(url: str, attempt: int):
        import re

        m = re.search(r"-(\d{6})-index\.html$", url)
        if m and int(m.group(1)) % 10 == 0:
            return 503, None, None
        return stub_fetcher(url, attempt)

    n = 60
    fr = CrawlFrontier(
        spark, str(tmp_path / "w"), fetcher=flaky_forever_fetcher, max_attempts=3
    )
    fr.submit(seed_index_df(spark, n))
    waves = fr.run()
    assert len(waves) == 3  # initial + 2 requeue waves
    log = fr.fetch_log().toPandas()
    bad = log[log.row_seq % 10 == 0]
    good = log[log.row_seq % 10 != 0]
    assert (good.state == "fetched").all()
    # each failing URL appears once per attempt wave; final row 'failed'
    assert set(bad.groupby("row_seq").size()) == {3}
    final = bad.sort_values("wave").groupby("row_seq").last()
    assert (final.state == "failed").all()
    # failures never enter seen or payload
    seen = set(fr.seen_set().toPandas().canonical_url)
    assert seen == set(good.html_index)
    payload_n = fr.payload.read(spark).count()
    assert payload_n == len(set(good.row_seq))
