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


def test_auto_compaction_policy(spark, tmp_path):
    """compact_every=K folds seen/log/payload mid-crawl without
    changing any result: same fetch log, same seen set, and the final
    manifests reference O(1) data dirs instead of one per wave."""
    seeds = seed_index_df(spark, 60)
    ref = CrawlFrontier(spark, str(tmp_path / "ref"), wave_quota=4)
    ref.submit(seeds)
    ref.run()

    fr = CrawlFrontier(spark, str(tmp_path / "auto"), wave_quota=4, compact_every=2)
    fr.submit(seeds)
    fr.run()
    n_waves = len(fr.metrics)
    assert n_waves >= 4  # policy fired at least twice

    # results identical to the uncompacted run
    key = lambda df: [r["canonical_url"] for r in df.collect()]  # noqa: E731
    assert key(fr.fetch_log()) == key(ref.fetch_log())
    assert set(key(fr.seen_set())) == set(key(ref.seen_set()))
    assert fr.payload.read(spark).count() == ref.payload.read(spark).count()

    # scan planning stays O(1): dirs since the last fold, not one/wave
    waves_since_fold = n_waves % 2
    for t in (fr.seen, fr.log, fr.payload):
        files = t._manifest(t.current_version())["files"]
        assert len(files) <= 1 + waves_since_fold
    # compaction commits are visible in history
    assert any(m["metrics"].get("compaction") for m in fr.seen.history())
