"""Distributed URL frontier: canonicalize → hash → dedup (partitioned
Bloom pre-filter + exact anti-join) → per-host priority queue →
politeness-gated fetch → snapshot-committed state tables."""

from edgar_crawler_spark.frontier.canonical import canonical_url_col, with_url_identity
from edgar_crawler_spark.frontier.seen import BloomFilterTable, url_seen_anti_join
from edgar_crawler_spark.frontier.priority import with_priority, crawl_order
from edgar_crawler_spark.frontier.state import SnapshotTable

__all__ = [
    "canonical_url_col",
    "with_url_identity",
    "BloomFilterTable",
    "url_seen_anti_join",
    "with_priority",
    "crawl_order",
    "SnapshotTable",
]
