"""End-to-end plans: index walk → frontier crawl → enrichment →
extraction (the reference's two CLI stages as one dataflow,
SURVEY.md §3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from edgar_crawler_spark.frontier.frontier import CrawlFrontier

COMPANY_DIM_COLS = ["sic", "state_of_inc", "state_location", "fiscal_year_end"]


def company_dim_df(spark: SparkSession, n: int = 997) -> DataFrame:
    """Synthetic company-info dimension (the companies_info.json cache,
    download_filings.py:571-646): one row per CIK."""
    i = F.col("id")
    return spark.range(n).select(
        (F.lit(100000) + i).cast("string").alias("cik"),
        (F.lit(1000) + i % 900).cast("string").alias("sic"),
        F.when(i % 3 == 0, F.lit("DE")).otherwise(F.lit("CA")).alias("state_of_inc"),
        F.when(i % 2 == 0, F.lit("CA")).otherwise(F.lit("NY")).alias("state_location"),
        F.lpad((1 + i % 12).cast("string"), 2, "0").alias("fiscal_year_end"),
    )


def filename_col(df: DataFrame) -> F.Column:
    """P5: {CIK}_{type-sans-special}_{year}_{accession}.{ext}
    (download_filings.py:716-722). Year comes from period_of_report when
    the input carries it and the index-page crawl filled it, else the
    index date (the reference always has a period by this point;
    stub/sandbox rows don't)."""
    accession = F.regexp_extract("complete_text_file_link", r"/([^/]+)\.txt$", 1)
    ext = F.when(F.col("htm_file_link").isNotNull(), F.lit("htm")).otherwise(F.lit("txt"))
    year_src = (
        F.coalesce(F.col("period_of_report"), F.col("date"))
        if "period_of_report" in df.columns
        else F.col("date")
    )
    year = F.substring(year_src, 1, 4)
    return F.concat(
        F.col("cik"),
        F.lit("_"),
        F.regexp_replace(F.col("type"), r"[-/\\]", ""),
        F.lit("_"),
        year,
        F.lit("_"),
        accession,
        F.lit("."),
        ext,
    )


def enrich_metadata(log: DataFrame, dim: DataFrame) -> DataFrame:
    """J4 + P6 + P5: broadcast company-dim join, COALESCE back-fill of
    the null enrichment columns (download_filings.py:649-656), then
    filename derivation (download_filings.py:716-722)."""
    dim_renamed = dim.select(
        "cik", *[F.col(c).alias(f"__dim_{c}") for c in COMPANY_DIM_COLS]
    )
    out = log.join(F.broadcast(dim_renamed), on="cik", how="left")
    for c in COMPANY_DIM_COLS:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__dim_{c}"))).drop(f"__dim_{c}")
    return out.withColumn("filename", filename_col(out))


def crawl(
    spark: SparkSession,
    workdir: str,
    seed: DataFrame,
    previously_crawled: DataFrame | None = None,
    dim: DataFrame | None = None,
    **frontier_kwargs,
) -> tuple[CrawlFrontier, DataFrame]:
    """Stage-1 equivalent: run the frontier to drain, return the
    frontier and the enriched fetch log in reference crawl order."""
    fr = CrawlFrontier(spark, workdir, **frontier_kwargs)
    if previously_crawled is not None:
        fr.bootstrap_seen(previously_crawled)
    fr.submit(seed)
    fr.run()
    log = fr.fetch_log()
    if log is not None and dim is not None:
        log = enrich_metadata(log, dim).orderBy("year", "quarter", "row_seq")
    return fr, log
