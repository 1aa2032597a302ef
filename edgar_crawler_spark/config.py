"""Reference config.json parity (VERDICT r01 item 10): accept the
reference's configuration keys (/root/reference/config.json,
download_filings.py:71-73, extract_items.py:1196-1197) and translate
them into this engine's plan inputs, so a user can carry their
config.json over unchanged.

Recognized ``download_filings`` keys: start_year, end_year, quarters,
filing_types, cik_tickers (list of CIKs/tickers OR a newline file
path — download_filings.py:356-366), user_agent, skip_present_indices.
Recognized ``extract_items`` keys: filing_types, items_to_extract,
include_signature, remove_tables, skip_extracted_filings. Folder/file
keys (raw_filings_folder, indices_folder, filings_metadata_file,
extracted_filings_folder) map onto the engine's workdir tables and are
accepted-and-recorded rather than used as loose directories."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

DOWNLOAD_DEFAULTS = {
    "start_year": None,
    "end_year": None,
    "quarters": [1, 2, 3, 4],
    "filing_types": ["10-K", "10-Q", "8-K"],
    "cik_tickers": None,
    "user_agent": None,
    "skip_present_indices": True,
}

EXTRACT_DEFAULTS = {
    "filing_types": ["10-K", "10-Q", "8-K"],
    "items_to_extract": [],
    "include_signature": False,
    "remove_tables": True,
    "skip_extracted_filings": True,
}


def load_reference_config(path: str) -> dict:
    """config.json → {'download_filings': {...}, 'extract_items': {...}}
    with defaults filled; unknown keys are preserved (they ride along
    into the run manifest)."""
    with open(path) as f:
        raw = json.load(f)
    dl = {**DOWNLOAD_DEFAULTS, **raw.get("download_filings", {})}
    ex = {**EXTRACT_DEFAULTS, **raw.get("extract_items", {})}
    return {"download_filings": dl, "extract_items": ex}


def split_cik_tickers(cik_tickers) -> tuple[list[str], list[str]]:
    """(ciks, tickers) — digits are CIKs, the rest are tickers needing
    the S5 dimension (download_filings.py:403-411). A string value is a
    file path of newline-separated entries (dl:356-366)."""
    if cik_tickers is None:
        return [], []
    if isinstance(cik_tickers, str):
        if not os.path.isfile(cik_tickers):
            raise FileNotFoundError(f"cik_tickers file not found: {cik_tickers}")
        with open(cik_tickers) as f:
            cik_tickers = [ln.strip() for ln in f if ln.strip()]
    ciks, tickers = [], []
    for c_t in cik_tickers:
        if isinstance(c_t, int) or str(c_t).isdigit():
            ciks.append(str(c_t))
        else:
            tickers.append(str(c_t))
    return ciks, tickers


def config_worklist(
    spark: SparkSession,
    dl_cfg: dict,
    as_of: str | None = None,
    present: DataFrame | None = None,
) -> DataFrame:
    """The S1+S2+S3 quarterly-index worklist a reference config
    describes (same rows whether driven by config or CLI flags)."""
    from edgar_crawler_spark.sources.index_source import quarterly_index_worklist

    return quarterly_index_worklist(
        spark,
        int(dl_cfg["start_year"]),
        int(dl_cfg["end_year"]),
        quarters=[int(q) for q in dl_cfg["quarters"]],
        as_of=as_of,
        present=present if dl_cfg.get("skip_present_indices", True) else None,
    )


def apply_filing_filters(
    index_rows: DataFrame,
    dl_cfg: dict,
    ticker_dim: DataFrame | None = None,
) -> DataFrame:
    """P2 (type filter) + P3 (CIK/ticker filter) from config keys.
    Tickers need the S5 dimension; without one, digit CIKs still
    filter and tickers raise (the reference exits in that case,
    dl:389-390)."""
    import pyspark.sql.functions as F

    from edgar_crawler_spark.sources.dims import resolve_tickers

    out = index_rows.filter(F.col("type").isin(list(dl_cfg["filing_types"])))
    ciks, tickers = split_cik_tickers(dl_cfg.get("cik_tickers"))
    if tickers:
        if ticker_dim is None:
            raise ValueError("ticker entries in cik_tickers require the ticker dim")
        seeds = index_rows.sparkSession.createDataFrame(
            [(t,) for t in tickers], "ticker string"
        )
        resolved, _unmatched = resolve_tickers(seeds, ticker_dim)
        ciks = ciks + [r.cik for r in resolved.select("cik").collect()]
    if ciks or tickers:
        out = out.filter(F.col("cik").isin([str(c) for c in ciks]))
    return out
