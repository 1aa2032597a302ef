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


_FETCH_IDX_SCHEMA = StructType(
    [
        StructField("year", IntegerType()),
        StructField("quarter", IntegerType()),
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("attempts", IntegerType()),
        StructField("state", StringType()),
        StructField("body", StringType()),
        StructField("error", StringType()),
    ]
)


def fetch_master_indices(
    worklist: DataFrame,
    fetcher,
    rate_per_host: float = 10.0,
    virtual_clock: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """S1's network leg (download_filings.py:280-301): GET master.zip,
    unzip ``master.idx``, decode latin-1 — one mapInPandas kernel.

    ``worklist`` carries (year, quarter, url) from
    :func:`quarterly_index_worklist`; ``fetcher`` follows the
    ``(url, attempt) -> (status, bytes, caption)`` contract of
    ``frontier.fetch`` (use ``http_fetcher_factory`` for the real
    network), so the full N1 retry + N2 throttle protocol runs around
    every request via the shared ``_fetch_one``. Rows are partitioned
    by host (all EDGAR index URLs share one host → one partition → the
    per-host token bucket enforces the 10 req/s budget exactly as the
    sequential reference does). A body that fails to unzip is emitted
    as ``state='failed'`` with the error recorded — never raised.
    """
    import io
    import zipfile

    from edgar_crawler_spark.frontier.fetch import _fetch_one
    from edgar_crawler_spark.frontier.politeness import TokenBucket, VirtualClock

    if num_partitions is None:
        num_partitions = worklist.sparkSession.sparkContext.defaultParallelism

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buckets: dict[str, tuple] = {}

        def bucket_for(host: str):
            if host not in buckets:
                clk = VirtualClock() if virtual_clock else None
                bk = (
                    TokenBucket(rate_per_host, clock=clk, sleep=clk.sleep)
                    if clk
                    else TokenBucket(rate_per_host)
                )
                buckets[host] = (bk, clk)
            return buckets[host]

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                bucket, clk = bucket_for(rec.host)
                status, attempts, state, _waited, zbody, _cap, err = _fetch_one(
                    fetcher, rec.url, bucket, clk
                )
                text = None
                if state == "fetched" and zbody is not None:
                    try:
                        with zipfile.ZipFile(io.BytesIO(zbody)) as zf:
                            with zf.open("master.idx") as f:
                                text = f.read().decode("latin-1")
                    except Exception as e:  # corrupt zip → failed row, not a crash
                        state, text = "failed", None
                        err = f"bad_zip:{type(e).__name__}"
                rows.append(
                    (rec.year, rec.quarter, rec.url, status, attempts, state, text, err)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FETCH_IDX_SCHEMA.fields]
            )

    slim = worklist.select(
        "year",
        "quarter",
        "url",
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
    )
    partitioned = slim.repartition(num_partitions, F.col("host")).sortWithinPartitions(
        "host", "year", "quarter"
    )
    return partitioned.mapInPandas(run, _FETCH_IDX_SCHEMA)


def download_quarterly_indices(
    spark: SparkSession,
    worklist: DataFrame,
    fetcher,
    rate_per_host: float = 10.0,
    virtual_clock: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """S1 end-to-end: fetch+unzip the worklist's master.zip files and
    parse the successful bodies into 14-column index rows. Returns
    (index_rows, fetch_status); failed (year, quarter) rows stay in
    fetch_status with their attempt counts for non-interactive retry
    (N5 semantics — re-run with the failed subset as the worklist)."""
    fetched = fetch_master_indices(
        worklist, fetcher, rate_per_host=rate_per_host, virtual_clock=virtual_clock
    ).persist()
    bodies = fetched.filter(F.col("state") == "fetched").select(
        "year", "quarter", "body"
    )
    return parse_master_idx(spark, bodies), fetched


def synth_zip_fetcher(rows_per_quarter: int = 400):
    """Network stand-in for the S1 index fetch: serves a deterministic
    synthetic master.zip for any EDGAR full-index URL (same fetcher
    contract as http_fetcher_factory — the retry/throttle protocol and
    zip/latin-1 plumbing run for real, only the socket is fake)."""
    import re

    pat = re.compile(r"/full-index/(\d{4})/QTR(\d)/master\.zip$")

    def fetch(url: str, attempt: int):
        m = pat.search(url)
        if not m:
            return 404, None, None
        return 200, synth_master_idx_zip(int(m.group(1)), int(m.group(2)), rows_per_quarter), None

    return fetch


def synth_master_idx_zip(year: int, quarter: int, n: int) -> bytes:
    """master.zip-shaped fixture: the synthetic idx body zipped under
    the EDGAR member name (for loopback-HTTP and unit tests)."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("master.idx", synth_master_idx_body(year, quarter, n).encode("latin-1"))
    return buf.getvalue()


def synth_master_idx_body(year: int, quarter: int, n: int, n_hosts: int = 0) -> str:
    """Deterministic master.idx-shaped fixture body (11 header lines +
    pipe-delimited rows), mirroring the EDGAR file format."""
    header = [f"header line {i}" for i in range(MASTER_IDX_HEADER_LINES)]
    rows = []
    for i in range(n):
        cik = 100000 + i % 997
        # quarter baked into the accession so multi-quarter worklists
        # yield distinct URLs (the real EDGAR never repeats accessions)
        acc = f"{cik:0>10}-{str(year)[2:]}-{quarter}{i:05d}"
        ftype = ["10-K", "10-Q", "8-K"][i % 3]
        rows.append(
            f"{cik}|COMPANY {i} INC|{ftype}|{year}-0{quarter}-15|edgar/data/{cik}/{acc}.txt"
        )
    return "\n".join(header + rows) + "\n"
