"""Quarterly-index sources S1–S4 (SURVEY.md §2.1).

The reference walks (year, quarter) pairs, downloads
``full-index/{y}/QTR{q}/master.zip``, skips 11 header lines, decodes
latin-1, derives ``html_index`` from the ``.txt`` link and writes a
TSV (download_filings.py:226-328). Spark-first equivalents:

* S1 — the (year × quarter) work list is a cross join of two ranges;
  URL generation is a column expression.
* S2 — future-quarter guard is a date predicate (pushed to the scan).
* S3 — skip-present-indices is a left-anti join against the committed
  index inventory.
* S4 — the index file is parsed with an explicit 14-column all-string
  schema; ``row_seq`` is derived from the LINE OFFSET within each
  file (never monotonically_increasing_id — SURVEY.md §4.3.3), which
  is stable at any parallelism because files are processed wholetext.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

EDGAR_INDEX_URL = "https://www.sec.gov/Archives/edgar/full-index/{year}/QTR{quarter}/master.zip"
ARCHIVE_PREFIX = "https://www.sec.gov/Archives/"

# the 14-column index schema (download_filings.py:424-439); first 6
# populated from the index, rest back-filled by the crawl
INDEX_COLUMNS = [
    "cik", "company", "type", "date", "complete_text_file_link", "html_index",
    "filing_date", "period_of_report", "sic", "htm_file_link",
    "state_of_inc", "state_location", "fiscal_year_end", "filename",
]

MASTER_IDX_HEADER_LINES = 11

_IDX_SCHEMA = StructType(
    [StructField(c, StringType()) for c in INDEX_COLUMNS]
    + [
        StructField("year", IntegerType()),
        StructField("quarter", IntegerType()),
        StructField("row_seq", LongType()),
    ]
)


def quarterly_index_worklist(
    spark: SparkSession,
    start_year: int,
    end_year: int,
    quarters: list[int] | None = None,
    as_of: str | None = None,
    present: DataFrame | None = None,
) -> DataFrame:
    """S1+S2+S3: (year, quarter, url) rows still to fetch."""
    years = spark.range(start_year, end_year + 1).select(F.col("id").cast("int").alias("year"))
    qs = spark.createDataFrame([(q,) for q in (quarters or [1, 2, 3, 4])], "quarter int")
    wl = years.crossJoin(qs).withColumn(
        "url",
        F.concat(
            F.lit("https://www.sec.gov/Archives/edgar/full-index/"),
            F.col("year").cast("string"),
            F.lit("/QTR"),
            F.col("quarter").cast("string"),
            F.lit("/master.zip"),
        ),
    )
    # S2: skip quarters beyond 'now' (download_filings.py:264-267)
    cutoff = F.to_date(F.lit(as_of)) if as_of else F.current_date()
    wl = wl.filter(F.make_date(F.col("year"), F.col("quarter") * 3 - 2, F.lit(1)) <= cutoff)
    # S3: skip already-fetched indices (download_filings.py:272-277)
    if present is not None:
        wl = wl.join(present.select("year", "quarter"), on=["year", "quarter"], how="left_anti")
    return wl


def parse_master_idx(
    spark: SparkSession,
    files: DataFrame,
    header_lines: int = MASTER_IDX_HEADER_LINES,
) -> DataFrame:
    """S4: parse master.idx bodies into the 14-column schema.

    ``files`` carries (year int, quarter int, body string) — one row
    per index file (wholetext). Line offsets within each body become
    ``row_seq``; ``html_index`` is derived ``.txt`` → ``-index.html``
    (download_filings.py:305-306); the Archives URL prefix is applied
    (P1, download_filings.py:443-448).
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                lines = rec["body"].split("\n")
                for seq, line in enumerate(lines[header_lines:]):
                    parts = line.split("|")
                    if len(parts) < 5:
                        continue
                    cik, company, ftype, date, txt_link = (p.strip() for p in parts[:5])
                    row = dict.fromkeys(INDEX_COLUMNS)
                    row.update(
                        cik=cik,
                        company=company,
                        type=ftype,
                        date=date,
                        complete_text_file_link=ARCHIVE_PREFIX + txt_link,
                        html_index=ARCHIVE_PREFIX
                        + (txt_link[:-4] + "-index.html" if txt_link.endswith(".txt") else txt_link),
                    )
                    row.update(year=rec["year"], quarter=rec["quarter"], row_seq=seq)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in _IDX_SCHEMA.fields])

    return files.mapInPandas(parse, _IDX_SCHEMA)


def synth_master_idx_body(year: int, quarter: int, n: int, n_hosts: int = 0) -> str:
    """Deterministic master.idx-shaped fixture body (11 header lines +
    pipe-delimited rows), mirroring the EDGAR file format."""
    header = [f"header line {i}" for i in range(MASTER_IDX_HEADER_LINES)]
    rows = []
    for i in range(n):
        cik = 100000 + i % 997
        acc = f"{cik:0>10}-{str(year)[2:]}-{i:06d}"
        ftype = ["10-K", "10-Q", "8-K"][i % 3]
        rows.append(
            f"{cik}|COMPANY {i} INC|{ftype}|{year}-0{quarter}-15|edgar/data/{cik}/{acc}.txt"
        )
    return "\n".join(header + rows) + "\n"
