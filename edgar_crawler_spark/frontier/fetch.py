"""The fetch scheduler: per-host queues dispatched through token
buckets inside ``groupBy(host).applyInPandas`` — one Arrow batch per
host, the wave's only shuffle.

Design (SURVEY.md §4.3.1): after the salted host-hash repartition a
host's queue lives entirely in one task, so the SEC 10-req/s budget is
enforced by a plain in-process TokenBucket with no global coordinator.
Rows are dispatched in host_rank order (the per-host priority queue);
the reference's retry stack (urllib3 Retry total=5 backoff 0.2,
status forcelist; download_filings.py:805-848) and outer throttle-
banner loop (download_filings.py:486-509) run around every request.

Fetchers are pluggable module-level callables:

* ``stub_fetcher`` — regenerates the synthetic payload row from the
  URL's accession (pure function of the row index; no network, no
  driver-side data). Deterministic failure injection exercises the
  retry + throttle paths.
* ``http_fetcher`` — real requests+Retry, for clusters with network.

Memory at 10^10 scale: a wave never carries a host's whole queue —
the frontier loop caps each wave at ``host_rank <= quota`` first.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from edgar_crawler_spark.frontier.politeness import (
    OUTER_THROTTLE_ATTEMPTS,
    RETRY_TOTAL,
    TokenBucket,
    VirtualClock,
    backoff_seconds,
    is_retryable,
    is_throttled,
)

FETCH_RESULT_FIELDS = [
    StructField("status", IntegerType()),
    StructField("attempts", IntegerType()),
    StructField("state", StringType()),  # fetched | retry | failed
    StructField("wait_s", DoubleType()),
    StructField("dispatch_seq", LongType()),
    StructField("bytes", BinaryType()),
    StructField("caption", StringType()),
    StructField("error", StringType()),
]

_ACCESSION_RE = re.compile(r"/(\d{10}-\d{2}-(\d{6}))(?:-index\.html|\.txt)$")


def stub_fetcher(url: str, attempt: int) -> tuple[int, bytes | None, str | None]:
    """Deterministic network stand-in: payload = pure function of the
    row index embedded in the accession. Injected faults:
    i % 37 == 0 → 503 on first attempt (retry path);
    i % 101 == 0 → throttle banner on first attempt (outer loop)."""
    from edgar_crawler_spark.fixtures.payload import make_payload_row
    from edgar_crawler_spark.frontier.politeness import THROTTLE_BANNER

    m = _ACCESSION_RE.search(url)
    if not m:
        return 404, None, None
    i = int(m.group(2))
    if i % 37 == 0 and i % 101 != 0 and attempt == 1:
        return 503, None, None
    if i % 101 == 0 and attempt == 1:
        return 200, THROTTLE_BANNER.encode(), None
    row = make_payload_row(i)
    return 200, row["bytes"], row["caption"]


def http_fetcher_factory(user_agent: str):
    """Real network path (reference N1: download_filings.py:805-848)."""
    import requests
    from requests.adapters import HTTPAdapter
    from urllib3.util.retry import Retry

    session = requests.Session()
    retries = Retry(
        total=RETRY_TOTAL,
        backoff_factor=0.2,
        status_forcelist=[400, 401, 403, 500, 502, 503, 504, 505],
    )
    session.mount("http://", HTTPAdapter(max_retries=retries))
    session.mount("https://", HTTPAdapter(max_retries=retries))

    def fetch(url: str, attempt: int) -> tuple[int, bytes | None, str | None]:
        r = session.get(url, headers={"User-agent": user_agent}, timeout=30)
        return r.status_code, r.content, None

    return fetch


def fetch_wave(
    frontier: DataFrame,
    fetcher=stub_fetcher,
    rate_per_host: float = 10.0,
    virtual_clock: bool = True,
    order_col: str = "host_rank",
) -> DataFrame:
    """Dispatch one wave. Input must carry host + host_rank (from
    with_priority). Output = input columns + FETCH_RESULT_FIELDS."""
    in_fields = list(frontier.schema.fields)
    out_schema = StructType(in_fields + FETCH_RESULT_FIELDS)
    in_cols = [f.name for f in in_fields]

    def fetch_host(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        clk = VirtualClock() if virtual_clock else None
        bucket = (
            TokenBucket(rate_per_host, clock=clk, sleep=clk.sleep)
            if clk
            else TokenBucket(rate_per_host)
        )
        res = {f.name: [] for f in FETCH_RESULT_FIELDS}
        for seq, row in enumerate(pdf.itertuples(index=False)):
            url = row.canonical_url
            waited = 0.0
            status, body, caption, err = 0, None, None, None
            attempts = 0
            state = "failed"
            for outer in range(OUTER_THROTTLE_ATTEMPTS):  # throttle-banner loop
                for retry_i in range(1, RETRY_TOTAL + 1):  # urllib3-equivalent loop
                    waited += bucket.acquire()
                    b = backoff_seconds(retry_i)
                    if b:
                        bucket.sleep(b) if not clk else clk.sleep(b)
                        waited += b
                    attempts += 1
                    try:
                        status, body, caption = fetcher(url, attempts)
                    except Exception as e:  # fetcher must not kill the task
                        status, body, caption, err = -1, None, None, str(e)[:200]
                    if status == 200 or not (is_retryable(status) or status == -1):
                        break
                if status == 200 and is_throttled(body):
                    # exponential host cool-down, then re-enter (N2)
                    pause = 2.0**outer
                    (clk.sleep if clk else bucket.sleep)(pause)
                    waited += pause
                    continue
                break
            if status == 200 and not is_throttled(body):
                state = "fetched"
            elif is_retryable(status) or status == -1:
                state = "retry"  # back to frontier with attempt counter
            res["status"].append(status)
            res["attempts"].append(attempts)
            res["state"].append(state)
            res["wait_s"].append(waited)
            res["dispatch_seq"].append(seq)
            res["bytes"].append(body if state == "fetched" else None)
            res["caption"].append(caption)
            res["error"].append(err)
        out = pdf[in_cols].copy()
        for k, v in res.items():
            out[k] = pd.Series(v, dtype=object) if k in ("bytes",) else v
        return out

    return frontier.groupBy("host").applyInPandas(fetch_host, out_schema)
