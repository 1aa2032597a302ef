"""Synthetic raw filings (FIXTURES.md §C): deterministic 10-K / 10-Q /
8-K documents exercising the extraction kernel's hard paths — ToC
skipping, styled-table removal, span handling, broken ``I T E M``
headers, plain-text (non-HTML) fallback. Pure function of (seed, i).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from edgar_crawler_spark.functions.items import ITEMS_8K, ITEMS_10K, ITEMS_10Q

_LOREM = (
    "The registrant operates a diversified business across multiple "
    "segments and geographies, with results discussed in detail below. "
)


def _section(title: str, idx: int) -> str:
    body = _LOREM * (2 + idx % 3)
    return (
        f'<div style="margin-top: 6pt"><b>Item {title}.</b> Section heading {idx}</div>\n'
        f"<div>{body}</div>\n"
    )


def _toc(items: list[str]) -> str:
    rows = "".join(
        f"<tr><td>Item {i}</td><td>{10 + n}</td></tr>\n" for n, i in enumerate(items)
    )
    return (
        '<div align="center">TABLE OF CONTENTS</div>\n'
        f"<table>{rows}</table>\n"
    )


def make_10k(i: int) -> str:
    items = [x for x in ITEMS_10K if x != "SIGNATURE"]
    body = [_toc(items[:6])]
    for n, item in enumerate(items):
        if n == 2:  # broken header exercise (clean_text repair)
            body.append(f"<div>\nI T E M  {item}. Broken header section</div>\n<div>{_LOREM}</div>\n")
        else:
            body.append(_section(item, i + n))
        if n == 0:
            # inside item 1's span: a styled (removable) numeric table
            # and an unstyled (kept) one
            body.append(
                '<table><tr style="background: #cceeff"><td>42</td><td>17</td></tr></table>\n'
            )
            body.append("<table><tr><td>kept</td><td>table text</td></tr></table>\n")
    body.append("<div>\nSIGNATURE</div>\n<div>signed by officer {}</div>".format(i))
    html = "<html><body>" + "".join(body) + "</body></html>"
    return f"<DOCUMENT>\n<TYPE>10-K\n<SEQUENCE>1\n<TEXT>\n{html}\n</TEXT>\n</DOCUMENT>"


def make_10q(i: int) -> str:
    out = []
    for part_no, part_items in (
        (1, [x.split("__")[1] for x in ITEMS_10Q if x.startswith("part_1")]),
        (2, [x.split("__")[1] for x in ITEMS_10Q if x.startswith("part_2")]),
    ):
        out.append(f"<div>\nPART {'I' * part_no}</div>\n")
        for n, item in enumerate(part_items):
            out.append(_section(item, i + n + part_no * 50))
    out.append("<div>\nSIGNATURE</div>\n<div>signed</div>")
    html = "<html><body><table><tr><td>x</td></tr></table>" + "".join(out) + "</body></html>"
    return f"<DOCUMENT>\n<TYPE>10-Q\n<SEQUENCE>1\n<TEXT>\n{html}\n</TEXT>\n</DOCUMENT>"


def make_8k(i: int, plain_text: bool = False) -> str:
    items = ["2.02", "5.02", "9.01"]
    if plain_text:
        body = "".join(
            f"\nITEM {it}. Results heading {i}\n{_LOREM}\n" for it in items
        ) + "\nSIGNATURE\nsigned\n"
        return f"<DOCUMENT>\n<TYPE>8-K\n<SEQUENCE>1\n<TEXT>\n{body}\n</TEXT>\n</DOCUMENT>"
    body = "".join(_section(it, i + n) for n, it in enumerate(items))
    spans = (
        '<div>B</div><span style="margin-left:36pt"></span>'
        "<span>inline text</span>"
    )
    html = f"<html><body><table><tr><td>x</td></tr></table>{body}{spans}<div>\nSIGNATURE</div><div>s</div></body></html>"
    return f"<DOCUMENT>\n<TYPE>8-K\n<SEQUENCE>1\n<TEXT>\n{html}\n</TEXT>\n</DOCUMENT>"


def raw_documents_pdf(n: int = 30) -> pd.DataFrame:
    """n synthetic filings cycling through the form types."""
    rows = []
    for i in range(n):
        ftype = ["10-K", "10-Q", "8-K"][i % 3]
        content = {"10-K": make_10k, "10-Q": make_10q}.get(ftype, lambda j: make_8k(j, plain_text=j % 6 == 5))(i)
        rows.append(
            {
                "CIK": str(100000 + i),
                "Company": f"COMPANY {i} INC",
                "Type": ftype,
                "Date": "2022-02-01",
                "Period of Report": "2022-01-31",
                "SIC": "3572",
                "State of Inc": "DE",
                "State location": "CA",
                "Fiscal Year End": "1231",
                "html_index": f"https://host.test/Archives/{i}-index.html",
                "htm_file_link": f"https://host.test/Archives/{i}.htm",
                "complete_text_file_link": f"https://host.test/Archives/{i}.txt",
                "filename": f"{100000 + i}_{ftype.replace('-', '')}_2022_{i:06d}.htm",
                "content": content,
            }
        )
    return pd.DataFrame(rows)


def raw_documents_df(spark: SparkSession, n: int = 30) -> DataFrame:
    return spark.createDataFrame(raw_documents_pdf(n))
