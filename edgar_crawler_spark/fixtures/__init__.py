"""Deterministic synthetic inputs (FIXTURES.md A/B/C): pure functions
of (seed, row index), generated distributed via spark.range — never a
driver-side loop — so the same generator scales from 600 rows to 10^10."""

from edgar_crawler_spark.fixtures.seed_index import seed_index_df, previously_crawled_df
from edgar_crawler_spark.fixtures.payload import payload_df

__all__ = ["seed_index_df", "previously_crawled_df", "payload_df"]
