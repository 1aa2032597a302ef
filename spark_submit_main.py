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
    ap.add_argument("--seed-parquet")
    ap.add_argument(
        "--config",
        help="reference-format config.json (download_filings keys drive "
        "the index worklist and filters — a copied /root/reference/"
        "config.json works unchanged)",
    )
    ap.add_argument("--start-year", type=int)
    ap.add_argument("--end-year", type=int)
    ap.add_argument("--quarters", type=int, nargs="+")
    ap.add_argument("--filing-types", nargs="+")
    ap.add_argument("--as-of", help="S2 cutoff date override (tests)")
    ap.add_argument(
        "--plan-only",
        action="store_true",
        help="print the quarterly-index worklist + filters this run "
        "would execute, then exit (config/flag parity check)",
    )
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
    ap.add_argument(
        "--synth-rows-per-quarter",
        type=int,
        default=400,
        help="rows per synthetic master.idx in config-driven sandbox mode",
    )
    ap.add_argument(
        "--metadata-csv",
        help="after the crawl, write the fetch log as a reference-shaped "
        "FILINGS_METADATA.csv directory (stage-1 output parity)",
    )
    ap.add_argument("--user-agent", default="edgar-crawler-spark admin@example.com")
    args = ap.parse_args()

    builder = SparkSession.builder.appName("edgar-crawler-spark")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # config.json parity: the reference's download_filings keys drive
    # the same plan the CLI flags do; explicit flags override config
    dl_cfg = None
    if args.config:
        from edgar_crawler_spark.config import load_reference_config

        cfg = load_reference_config(args.config)
        dl_cfg = cfg["download_filings"]
    if args.start_year or args.end_year or args.quarters or args.filing_types:
        from edgar_crawler_spark.config import DOWNLOAD_DEFAULTS

        dl_cfg = dict(dl_cfg or DOWNLOAD_DEFAULTS)
        if args.start_year:
            dl_cfg["start_year"] = args.start_year
        if args.end_year:
            dl_cfg["end_year"] = args.end_year
        if args.quarters:
            dl_cfg["quarters"] = args.quarters
        if args.filing_types:
            dl_cfg["filing_types"] = args.filing_types
        if args.user_agent:
            dl_cfg["user_agent"] = args.user_agent

    if args.plan_only:
        from edgar_crawler_spark.config import config_worklist, split_cik_tickers

        if dl_cfg is None:
            raise SystemExit("--plan-only needs --config or year/quarter flags")
        wl = config_worklist(spark, dl_cfg, as_of=args.as_of)
        ciks, tickers = split_cik_tickers(dl_cfg.get("cik_tickers"))
        plan = {
            "worklist": [
                {"year": r.year, "quarter": r.quarter, "url": r.url}
                for r in wl.orderBy("year", "quarter").collect()
            ],
            "filing_types": list(dl_cfg["filing_types"]),
            "ciks": ciks,
            "tickers": tickers,
            "user_agent": dl_cfg.get("user_agent"),
            "skip_present_indices": bool(dl_cfg.get("skip_present_indices", True)),
        }
        print(json.dumps(plan))
        return

    if not args.seed_parquet and dl_cfg is None:
        raise SystemExit("need --seed-parquet, --config, or year/quarter flags")

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
    report: dict = {}
    if args.seed_parquet:
        seed = spark.read.parquet(args.seed_parquet)
    else:
        # config-driven end-to-end (the reference's download_filings run):
        # worklist → master.zip fetch+unzip+parse (S1–S4) → type/CIK
        # filters (P2/P3) → frontier. Without --real-network the index
        # fetcher serves deterministic synthetic zips (same politeness +
        # retry protocol, zero network).
        from edgar_crawler_spark.config import apply_filing_filters, config_worklist, split_cik_tickers
        from edgar_crawler_spark.sources.index_source import (
            download_quarterly_indices,
            synth_zip_fetcher,
        )

        wl = config_worklist(spark, dl_cfg, as_of=args.as_of)
        idx_fetcher = (
            http_fetcher_factory(dl_cfg.get("user_agent") or args.user_agent)
            if args.real_network
            else synth_zip_fetcher(args.synth_rows_per_quarter)
        )
        index_rows, status = download_quarterly_indices(
            spark, wl, idx_fetcher, virtual_clock=virtual_clock
        )
        ciks, tickers = split_cik_tickers(dl_cfg.get("cik_tickers"))
        ticker_dim = None
        if tickers and args.real_network:
            ticker_dim = _fetch_ticker_dim(
                spark, dl_cfg.get("user_agent") or args.user_agent
            )
        if tickers and ticker_dim is None:
            # sandbox mode can't resolve tickers — report, filter on CIKs only
            report["unresolved_tickers"] = tickers
            cfg_no_tickers = dict(dl_cfg, cik_tickers=ciks or None)
            seed = apply_filing_filters(index_rows, cfg_no_tickers)
        else:
            seed = apply_filing_filters(index_rows, dl_cfg, ticker_dim=ticker_dim)
        report["index_fetch"] = [
            {"year": r.year, "quarter": r.quarter, "state": r.state}
            for r in status.select("year", "quarter", "state").collect()
        ]
        status.unpersist()

    admitted = fr.submit(seed)
    waves = fr.run(max_waves=args.max_waves)

    if args.metadata_csv:
        log = fr.fetch_log()
        if log is not None:
            import pyspark.sql.functions as F

            from edgar_crawler_spark.sources.dims import (
                METADATA_CSV_COLUMNS,
                write_metadata_csv,
            )

            # engine column names (lowercase) → the reference's CSV headers
            renames = {c.lower().replace(" ", "_"): c for c in METADATA_CSV_COLUMNS}
            out = log.select(
                *[F.col(low).alias(ref) for low, ref in renames.items()]
            )
            write_metadata_csv(out, args.metadata_csv)
            report["metadata_csv"] = args.metadata_csv

    print(json.dumps({"admitted": admitted, "waves": waves, **report}))


def _fetch_ticker_dim(spark, user_agent: str):
    """S5 over the real network: company_tickers.json → broadcast dim."""
    import tempfile

    import requests

    r = requests.get(
        "https://www.sec.gov/files/company_tickers.json",
        headers={"User-agent": user_agent},
        timeout=30,
    )
    r.raise_for_status()
    with tempfile.NamedTemporaryFile("wb", suffix=".json", delete=False) as f:
        f.write(r.content)
        path = f.name
    from edgar_crawler_spark.sources.dims import ticker_cik_dim

    return ticker_cik_dim(spark, json_path=path)


if __name__ == "__main__":
    main()
