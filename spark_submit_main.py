"""Cluster entry point: run the crawl frontier via spark-submit.

    zip -r edgar_crawler_spark.zip edgar_crawler_spark/
    spark-submit --py-files edgar_crawler_spark.zip spark_submit_main.py \
        --workdir /data/frontier --seed-parquet /data/seeds \
        [--rate 10] [--wave-quota 100000] [--max-waves 1000]

On a real cluster the SparkSession comes from spark-submit's conf
(master/executors set externally); locally this falls back to
local[$SPARK_GRAFT_CPUS]. The same job runs unchanged at N and 4N
executors — scaling evidence in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from edgar_crawler_spark.frontier.fetch import stub_fetcher
from edgar_crawler_spark.frontier.frontier import CrawlFrontier


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seed-parquet", required=True)
    ap.add_argument("--rate", type=float, default=10.0)
    ap.add_argument(
        "--wave-quota",
        type=int,
        default=100_000,
        help="PER-HOST dispatch cap per wave (a wave carries up to "
        "quota rows from each host's priority queue)",
    )
    ap.add_argument("--max-waves", type=int, default=1000)
    ap.add_argument(
        "--compact-every",
        type=int,
        default=None,
        help="fold seen/log/payload snapshots every K waves (scan-planning "
        "hygiene on long crawls; default off)",
    )
    ap.add_argument("--real-network", action="store_true")
    ap.add_argument("--user-agent", default="edgar-crawler-spark admin@example.com")
    args = ap.parse_args()

    builder = SparkSession.builder.appName("edgar-crawler-spark")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    fetcher = stub_fetcher
    virtual_clock = True
    if args.real_network:
        from edgar_crawler_spark.frontier.fetch import http_fetcher_factory

        fetcher = http_fetcher_factory(args.user_agent)
        virtual_clock = False  # real politeness: wall-clock token buckets

    fr = CrawlFrontier(
        spark,
        args.workdir,
        fetcher=fetcher,
        rate_per_host=args.rate,
        virtual_clock=virtual_clock,
        wave_quota=args.wave_quota,
        compact_every=args.compact_every,
    )
    seed = spark.read.parquet(args.seed_parquet)
    admitted = fr.submit(seed)
    waves = fr.run(max_waves=args.max_waves)
    print(json.dumps({"admitted": admitted, "waves": waves}))


if __name__ == "__main__":
    main()
