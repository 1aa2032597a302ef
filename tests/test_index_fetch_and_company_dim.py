"""S1's network leg (master.zip fetch → unzip → latin-1 decode →
parse, VERDICT r01 item 6) and S6's lazy company-dim upsert
(VERDICT r01 item 7) — including a real-socket loopback run of the
index fetch through the production http_fetcher_factory.

NB: fetchers are defined INSIDE the tests (cloudpickle serializes
nested functions by value — test modules are not importable inside
Spark workers), and fetch-call counting goes through an append-mode
file (worker-process closure mutations never reach the driver)."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyspark.sql.functions as F

from edgar_crawler_spark.functions.company_page import (
    parse_company_info_page,
    synth_company_page,
)
from edgar_crawler_spark.sources.dims import CompanyDimTable
from edgar_crawler_spark.sources.index_source import (
    download_quarterly_indices,
    fetch_master_indices,
    quarterly_index_worklist,
    synth_master_idx_body,
    synth_master_idx_zip,
)

# ---------------------------------------------------------------- S1 unit


def test_fetch_master_indices_unzip_and_parse(spark):
    def zip_fetcher(url, attempt):
        import re

        m = re.search(r"/full-index/(\d{4})/QTR(\d)/master\.zip$", url)
        if not m:
            return 404, None, None
        y, q = int(m.group(1)), int(m.group(2))
        if (y, q) == (2020, 2) and attempt == 1:
            return 503, None, None  # retried by the N1 protocol
        if (y, q) == (2020, 3):
            return 200, b"this is not a zip", None  # bad_zip -> failed row
        from edgar_crawler_spark.sources.index_source import synth_master_idx_zip

        return 200, synth_master_idx_zip(y, q, 10 + q), None

    wl = quarterly_index_worklist(spark, 2020, 2020, as_of="2021-01-01")
    rows, status = download_quarterly_indices(spark, wl, zip_fetcher)
    st = {(r.year, r.quarter): r for r in status.collect()}
    assert st[(2020, 2)].state == "fetched" and st[(2020, 2)].attempts == 2
    assert st[(2020, 3)].state == "failed" and st[(2020, 3)].error.startswith("bad_zip")
    assert st[(2020, 1)].state == "fetched" and st[(2020, 4)].state == "fetched"

    pdf = rows.toPandas()
    # 3 good quarters parsed: 11 + 12 + 14 rows (q3's zip was corrupt)
    assert len(pdf) == 11 + 12 + 14
    q1 = pdf[pdf.quarter == 1].sort_values("row_seq")
    # row_seq = line offset after the 11 header lines, 0-based
    assert list(q1.row_seq) == list(range(11))
    assert q1.iloc[0].complete_text_file_link.startswith(
        "https://www.sec.gov/Archives/edgar/data/"
    )
    assert q1.iloc[0].html_index.endswith("-index.html")


def test_fetch_master_indices_latin1(spark):
    """EDGAR bodies are latin-1: a 0xC9 byte (É) must round-trip."""
    body = synth_master_idx_body(2019, 1, 2).replace("COMPANY 0", "SOCI\xc9T\xc9 0")
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("master.idx", body.encode("latin-1"))
    blob = buf.getvalue()

    def fetcher(url, attempt, _b=blob):
        return 200, _b, None

    wl = quarterly_index_worklist(spark, 2019, 2019, quarters=[1], as_of="2020-01-01")
    rows, _ = download_quarterly_indices(spark, wl, fetcher)
    names = [r.company for r in rows.collect()]
    assert "SOCI\xc9T\xc9 0 INC" in names


# ----------------------------------------------------------- S1 loopback


class _ZipHandler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        import re

        m = re.search(r"/full-index/(\d{4})/QTR(\d)/master\.zip$", self.path)
        if not m:
            self.send_response(404)
            self.end_headers()
            return
        body = synth_master_idx_zip(int(m.group(1)), int(m.group(2)), 25)
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_index_fetch_over_real_http(spark):
    from edgar_crawler_spark.frontier.fetch import http_fetcher_factory

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ZipHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        wl = quarterly_index_worklist(
            spark, 2022, 2022, quarters=[1, 2], as_of="2022-07-01"
        ).withColumn(
            "url",
            F.regexp_replace("url", r"^https://[^/]+", f"http://127.0.0.1:{port}"),
        )
        fetched = fetch_master_indices(
            wl,
            http_fetcher_factory("edgar-crawler-spark-test test@example.com"),
            virtual_clock=False,
            rate_per_host=10_000.0,
        )
        out = fetched.collect()
        assert len(out) == 2 and all(r.state == "fetched" for r in out)
        assert all(r.body.startswith("header line 0") for r in out)
        assert all(len(r.body.split("\n")) >= 25 + 11 for r in out)
    finally:
        srv.shutdown()
        t.join(timeout=5)


# ---------------------------------------------------------------- S6


def test_parse_company_info_page_fields():
    html = synth_company_page(
        "0000100001", name="ACME CORP", sic="7372",
        state_location="CA", state_of_inc="DE", fye="1231",
    )
    info = parse_company_info_page(html)
    assert info == {
        "company_name": "ACME CORP",
        "sic": "7372",
        "state_location": "CA",
        "state_of_inc": "DE",
        "fiscal_year_end": "1231",
    }


def test_parse_company_info_page_missing_div():
    info = parse_company_info_page("<html><body><p>nothing</p></body></html>")
    assert all(v is None for v in info.values())


def _company_fetcher(count_file: str, fail_ciks: frozenset = frozenset()):
    """Nested-closure fetcher; appends each fetched URL to count_file
    (append-mode writes are how worker-side calls reach the driver)."""

    def fetch(url, attempt, _cf=count_file, _fail=fail_ciks):
        from edgar_crawler_spark.functions.company_page import synth_company_page

        with open(_cf, "a") as f:
            f.write(url + "\n")
        cik = url.rsplit("=", 1)[1]
        if cik in _fail:
            return 500, None, None
        return 200, synth_company_page(cik, name=f"CO {cik}").encode(), None

    return fetch


def _calls(count_file: str) -> list[str]:
    try:
        with open(count_file) as f:
            return [ln for ln in f.read().splitlines() if ln]
    except FileNotFoundError:
        return []


def test_company_dim_lazy_upsert_fetches_each_cik_once(spark, tmp_path):
    dim = CompanyDimTable(str(tmp_path / "dim"))
    needed = spark.createDataFrame([(str(c),) for c in range(101, 109)], "cik string")

    cf1 = str(tmp_path / "calls1")
    assert dim.ensure(needed, _company_fetcher(cf1)) == 8
    # N1 retries can re-hit a URL; distinct URLs is the cache contract
    assert len(set(_calls(cf1))) == 8

    # warm second run: anti-join sees every hit -> ZERO fetches
    cf2 = str(tmp_path / "calls2")
    assert dim.ensure(needed, _company_fetcher(cf2)) == 0
    assert _calls(cf2) == []

    # incremental: 3 new CIKs fetch exactly 3
    more = spark.createDataFrame([(str(c),) for c in range(101, 112)], "cik string")
    cf3 = str(tmp_path / "calls3")
    assert dim.ensure(more, _company_fetcher(cf3)) == 3
    assert len(set(_calls(cf3))) == 3

    cached = dim.read(spark).toPandas().set_index("cik")
    assert len(cached) == 11
    assert cached.loc["105", "company_name"] == "CO 105"
    assert cached.loc["105", "state_of_inc"] == "DE"


def test_company_dim_failed_fetch_not_cached(spark, tmp_path):
    dim = CompanyDimTable(str(tmp_path / "dim"))
    needed = spark.createDataFrame([("201",), ("202",)], "cik string")
    cf = str(tmp_path / "calls")
    assert dim.ensure(needed, _company_fetcher(cf, frozenset({"202"}))) == 1
    cf2 = str(tmp_path / "calls2")
    assert dim.ensure(needed, _company_fetcher(cf2)) == 1  # 202 retried, cached
    assert {u.rsplit("=", 1)[1] for u in _calls(cf2)} == {"202"}
    assert dim.read(spark).count() == 2


def test_company_dim_feeds_enrichment_coalesce(spark, tmp_path):
    """J4+P6: the lazily-built dim back-fills null metadata columns."""
    from edgar_crawler_spark.plans.pipeline import enrich_metadata

    dim = CompanyDimTable(str(tmp_path / "dim"))
    needed = spark.createDataFrame([("301",)], "cik string")
    dim.ensure(needed, _company_fetcher(str(tmp_path / "calls")))

    log = spark.createDataFrame(
        [("301", "10-K", "2021-02-01", "https://x/0000000301-21-000001.txt", None,
          None, None, None, None)],
        "cik string, type string, date string, complete_text_file_link string, "
        "htm_file_link string, sic string, state_of_inc string, "
        "state_location string, fiscal_year_end string",
    )
    out = enrich_metadata(log, dim.read(spark)).collect()[0]
    assert out["sic"] == "7372"
    assert out["state_of_inc"] == "DE"
    assert out["state_location"] == "CA"
    assert out["fiscal_year_end"] == "1231"
    # accession keeps its dashes (reference download_filings.py:718-721)
    assert out["filename"] == "301_10K_2021_0000000301-21-000001.txt"
