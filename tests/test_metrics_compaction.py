"""Wave metrics accessor + snapshot compaction."""

from edgar_crawler_spark.fixtures.seed_index import seed_index_df
from edgar_crawler_spark.frontier.frontier import CrawlFrontier


def test_metrics_and_compaction(spark, tmp_path):
    fr = CrawlFrontier(spark, str(tmp_path / "f"), wave_quota=4)
    fr.submit(seed_index_df(spark, 60))
    fr.run()
    m = fr.metrics_df().toPandas().sort_values("wave")
    assert len(m) >= 2  # quota forced multiple waves
    assert m.dispatched.sum() == 60
    assert (m.urls_per_s > 0).all()

    # many per-wave appends → compaction folds to one dir, same data
    before_dirs = len(fr.seen._manifest(fr.seen.current_version())["files"])
    assert before_dirs >= 2
    seen_before = set(fr.seen_set().toPandas().canonical_url)
    fr.compact()
    after = fr.seen._manifest(fr.seen.current_version())
    assert len(after["files"]) == 1
    assert set(fr.seen_set().toPandas().canonical_url) == seen_before
    # history retains the pre-compaction snapshots (time travel intact)
    assert len(fr.seen.history()) >= before_dirs
