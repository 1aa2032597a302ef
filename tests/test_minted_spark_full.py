"""The minted 10-K / 10-Q / obsolete-8-K corpus through the
DISTRIBUTED extraction path (extract_records mapInPandas) — the Spark
analogue of tests/test_minted_goldens.py's in-process sweep. Verifies
U1 on the form types the 8-K full-corpus test cannot reach (10-Q part
keys especially), byte-exact against the reference-minted goldens."""

import json
import os

import pandas as pd
import pytest

from edgar_crawler_spark.fixtures.filing_corpus import CORPUS_SIZES, corpus_entry

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "minted_goldens")

# the corpus mixes flag combos; group rows by flags since
# extract_records applies one flag set per call
def _entries(form):
    return [corpus_entry(form, i) for i in range(CORPUS_SIZES[form])]


@pytest.mark.parametrize("form", list(CORPUS_SIZES))
def test_minted_corpus_through_spark(spark, form):
    from edgar_crawler_spark.extract.spark_extract import extract_records

    with open(os.path.join(FIX, f"{form}.json")) as f:
        goldens = json.load(f)

    mismatches = []
    checked = 0
    for flags in sorted({(e["remove_tables"], e["include_signature"]) for e in _entries(form)}):
        group = [e for e in _entries(form) if (e["remove_tables"], e["include_signature"]) == flags]
        rows = []
        for e in group:
            md = dict(e["metadata"])
            md["content"] = e["content"]
            rows.append(md)
        df = spark.createDataFrame(pd.DataFrame(rows))
        recs = {
            r["filename"]: r
            for r in extract_records(
                df, remove_tables=flags[0], include_signature=flags[1]
            ).collect()
        }
        assert len(recs) == len(group)
        for e in group:
            fname = e["metadata"]["filename"]
            gold = goldens[fname]
            got = recs[fname]
            if gold is None:
                if got["error"] != "all_items_null":
                    mismatches.append((fname, "expected null record"))
                continue
            assert got["error"] is None, (fname, got["error"])
            items = got["items"] or {}
            # the record map holds item/part/SIGNATURE keys; metadata
            # keys ride as ordinary map entries from extract_filing
            for k, v in gold.items():
                checked += 1
                if (items.get(k) or "") != (v or ""):
                    mismatches.append((fname, k))
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:10]}"
    assert checked > 500
