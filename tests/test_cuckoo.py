"""Cuckoo filter: no false negatives, bounded FP rate, deletion
support (the capability Bloom lacks), anti-join equivalence."""

import numpy as np
import pyspark.sql.functions as F

from edgar_crawler_spark.fixtures.seed_index import seed_index_df
from edgar_crawler_spark.frontier.canonical import with_url_identity
from edgar_crawler_spark.frontier.cuckoo import CuckooFilterTable, _ShardFilter
from edgar_crawler_spark.frontier.seen import url_seen_anti_join


def _ids(spark, n):
    return with_url_identity(seed_index_df(spark, n))


def test_cuckoo_no_false_negatives(spark):
    df = _ids(spark, 500).select("url_hash").persist()
    filt = CuckooFilterTable.build(df, num_shards=8)
    flagged = filt.maybe_contains(df)
    assert flagged.filter(~F.col("bloom_maybe_seen")).count() == 0


def test_cuckoo_low_false_positive_rate(spark):
    seen = _ids(spark, 300)
    filt = CuckooFilterTable.build(seen.select("url_hash"), num_shards=8)
    unseen = _ids(spark, 600).join(seen.select("url_hash"), "url_hash", "left_anti")
    fp = filt.maybe_contains(unseen).filter(F.col("bloom_maybe_seen")).count()
    assert fp / max(unseen.count(), 1) < 0.05  # 16-bit fingerprints, 2 buckets


def test_cuckoo_anti_join_equals_exact(spark):
    all_rows = _ids(spark, 600)
    seen = all_rows.filter(F.col("row_seq") % 3 == 0)
    filt = CuckooFilterTable.build(seen, num_shards=8)
    with_f = url_seen_anti_join(all_rows, seen, bloom=filt)
    exact = url_seen_anti_join(all_rows, seen, bloom=None)
    assert sorted(r.row_seq for r in with_f.select("row_seq").collect()) == sorted(
        r.row_seq for r in exact.select("row_seq").collect()
    )


def test_cuckoo_deletion_local():
    rng = np.random.default_rng(0)
    filt = _ShardFilter(64)
    hashes = list(rng.integers(-(2**62), 2**62, size=150))
    for h in hashes:
        filt.insert(int(h), rng)
    arr = np.array(hashes, np.int64)
    assert filt.contains(arr).all()
    # delete half; deleted items (mostly) stop matching, kept ones stay
    for h in hashes[:75]:
        assert filt.delete(int(h))
    assert filt.contains(np.array(hashes[75:], np.int64)).all()
    still = filt.contains(np.array(hashes[:75], np.int64)).sum()
    assert still < 10  # only fingerprint collisions may remain


def test_cuckoo_overflow_degrades_safely():
    rng = np.random.default_rng(1)
    filt = _ShardFilter(4)  # 16 slots total
    for h in rng.integers(-(2**62), 2**62, size=200):
        filt.insert(int(h), rng)
    assert filt.overflow
    # degraded mode: answers "maybe" for everything (FP-safe direction)
    assert filt.contains(np.array([123456789], np.int64)).all()
