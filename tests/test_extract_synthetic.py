"""Structural tests of the extraction pipeline on synthetic 10-K /
10-Q / 8-K filings (no reference goldens exist for 10-K raw / 10-Q in
this snapshot — .MISSING_LARGE_BLOBS — so these assert structural
invariants instead of byte equality)."""

import pytest

from edgar_crawler_spark.extract.extractor import extract_filing
from edgar_crawler_spark.fixtures.raw_documents import raw_documents_pdf


@pytest.fixture(scope="module")
def docs():
    return raw_documents_pdf(18)


def _extract(row, **kw):
    md = {k: v for k, v in row.items() if k != "content"}
    return extract_filing(row["content"], md, **kw)


def test_10k_items_extracted(docs):
    row = docs[docs["Type"] == "10-K"].iloc[0].to_dict()
    rec = _extract(row, remove_tables=True)
    assert rec is not None
    assert rec["item_1"].startswith("Item 1.")
    assert "The registrant operates" in rec["item_2"]
    # broken 'I T E M' header repaired and matched
    assert rec["item_1B"] != ""
    # styled numeric table removed, unstyled kept
    joined = " ".join(v for k, v in rec.items() if k.startswith("item_"))
    assert "42" not in joined
    assert "kept table text" in joined
    # ToC lines do not leak into item_1
    assert "TABLE OF CONTENTS" not in rec["item_1"]


def test_10q_parts_split(docs):
    row = docs[docs["Type"] == "10-Q"].iloc[0].to_dict()
    rec = _extract(row)
    assert rec is not None
    assert rec["part_1"] != "" and rec["part_2"] != ""
    assert rec["part_1_item_1"].startswith("Item 1.")
    assert rec["part_2_item_1"] != ""
    # part 2's item 1 is distinct content from part 1's
    assert rec["part_1_item_1"] != rec["part_2_item_1"]


def test_8k_html_and_plaintext(docs):
    rows = docs[docs["Type"] == "8-K"]
    html_row = rows.iloc[0].to_dict()
    rec = _extract(html_row)
    assert rec is not None and rec["item_2.02"] != "" and rec["item_9.01"] != ""
    plain = rows[rows["content"].str.contains("<html>") == False]  # noqa: E712
    if len(plain):
        rec2 = _extract(plain.iloc[0].to_dict())
        assert rec2 is not None and rec2["item_2.02"] != ""


def test_signature_included_when_requested(docs):
    row = docs[docs["Type"] == "10-K"].iloc[0].to_dict()
    rec = _extract(row, include_signature=True)
    assert "SIGNATURE" in rec and rec["SIGNATURE"].startswith("SIGNATURE")


def test_spark_long_form(spark, docs):
    from edgar_crawler_spark.extract.spark_extract import extract_records, items_long

    df = spark.createDataFrame(docs)
    recs = extract_records(df)
    long_df = items_long(recs).cache()
    assert long_df.count() > 0
    keys = {r["item_key"] for r in long_df.select("item_key").distinct().collect()}
    assert any(k.startswith("item_") for k in keys)
    assert any(k.startswith("part_1_item_") for k in keys)
    errs = recs.filter("error is not null").count()
    assert errs == 0
