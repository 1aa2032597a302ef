"""N3 index-page parse kernel + S10 binaryFile raw scan."""

import pytest

from edgar_crawler_spark.functions.index_page import (
    parse_filing_index_page,
    synth_index_page,
)


def test_parse_index_page_happy_path():
    html = synth_index_page()
    out = parse_filing_index_page(html, ["10-K", "10-Q", "8-K"], "1000180", "8-K", complete_text_file_link="https://www.sec.gov/Archives/edgar/data/1000180/0000950123-10-078896.txt")
    assert out["filing_date"] == "2010-08-18"
    assert out["period_of_report"] == "2010-08-18"
    assert out["sic"] == "3572"
    assert out["state_of_inc"] == "DE"
    assert out["fiscal_year_end"] == "0102"
    assert out["state_location"] is None  # reference bug replicated (dl:556)
    assert out["htm_file_link"].endswith("f56692e8vk.htm")
    assert out["link_to_download"] == out["htm_file_link"]
    assert out["filename"] == "1000180_8K_2010_0000950123-10-078896.htm"


def test_parse_index_page_ixbrl_rewrite():
    html = synth_index_page(ixbrl=True)
    out = parse_filing_index_page(html, ["8-K"], "1000180", "8-K", complete_text_file_link="https://www.sec.gov/Archives/edgar/data/1000180/0000950123-10-078896.txt")
    assert "ix?doc=/" not in out["htm_file_link"]
    assert out["filename"].endswith(".htm")


def test_parse_index_page_missing_period_rejects():
    html = synth_index_page().replace("Period of Report", "Something Else")
    assert parse_filing_index_page(html, ["8-K"], "1000180", "8-K") is None


def test_parse_index_page_txt_fallback():
    # type cell doesn't match the wanted list → complete-text row wins
    html = synth_index_page(filing_type="S-1")
    out = parse_filing_index_page(html, ["10-K", "8-K"], "1000180", "8-K", complete_text_file_link="https://www.sec.gov/Archives/edgar/data/1000180/OLD.txt")
    assert out["htm_file_link"] is None
    assert out["complete_text_file_link"].endswith(".txt")
    assert out["filename"] == "1000180_8K_2010_0000950123-10-078896.txt"


def test_binary_file_scan_backslashreplace(spark, tmp_path):
    from edgar_crawler_spark.sources.raw_scan import read_raw_filings

    p = tmp_path / "raws"
    p.mkdir()
    (p / "a.htm").write_bytes(b"<html>ok \x80 euro-ish</html>")
    (p / "b.txt").write_bytes(b"plain text")
    df = read_raw_filings(spark, str(p)).toPandas().sort_values("filename")
    assert list(df.filename) == ["a.htm", "b.txt"]
    assert "\\x80" in df.iloc[0].content  # invalid UTF-8 byte escaped
