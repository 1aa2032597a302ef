"""Extraction kernel must never crash on malformed input — a poisoned
document at 100 TB scale is dropped/recorded, never a job failure."""

from hypothesis import given, settings
from hypothesis import strategies as st

from edgar_crawler_spark.extract.extractor import extract_filing

MD = {
    "CIK": "1", "Company": "C", "Type": "8-K", "Date": "2022-01-01",
    "Period of Report": "2022-01-01", "SIC": None, "State of Inc": None,
    "State location": None, "Fiscal Year End": None,
    "html_index": "x", "htm_file_link": None,
    "complete_text_file_link": "x.txt", "filename": "f.htm",
}

html_chunks = st.sampled_from(
    [
        "<DOCUMENT>", "</DOCUMENT>", "<TYPE>8-K\n", "<TYPE>10-K\n",
        "<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>",
        "<span style='margin-left:3pt'>", "</span>", "<div>", "</div>",
        "ITEM 2.02", "ITEM 9.01.", "I T E M 5", "SIGNATURE", "\n", "\t",
        "text &#128; &nbsp; &bogus; <", ">", "<!-- c -->", "<PDF>x</PDF>",
        'style="background: #bgcolor#"', "<p", "PART I",
    ]
)


@given(st.lists(html_chunks, max_size=40))
@settings(max_examples=150, deadline=None)
def test_extract_never_crashes_on_malformed_html(chunks):
    content = "".join(chunks)
    out = extract_filing(content, MD, remove_tables=True)
    assert out is None or isinstance(out, dict)


@given(st.text(max_size=500))
@settings(max_examples=100, deadline=None)
def test_extract_never_crashes_on_arbitrary_text(s):
    out = extract_filing(s, MD, remove_tables=True)
    assert out is None or isinstance(out, dict)
