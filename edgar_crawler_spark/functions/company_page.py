"""S6: the browse-edgar company-page parse — the 5 identInfo fields
the reference caches per CIK in companies_info.json
(download_filings.py:571-646), as a pure kernel over our stdlib DOM.

Reference semantics replicated over the identInfo paragraph's CHILD
LIST (bs4 ``.contents`` walk, dl:631-645):

* a child whose serialized form contains ``;SIC=`` → SIC = its text
  (matches the ``&amp;SIC=`` of the escaped href — same trick bs4's
  str() relies on);
* ``;State=`` → State location = its text;
* ``State of Inc`` in the child → State of Inc = the NEXT child's text;
* ``Fiscal Year End`` in the child → last whitespace token of that
  child's serialized form.

Company Name = first text content of the companyName span, stripped
(dl:624-626). A page without a companyInfo div yields the all-None
record — the reference caches that too (dl:613-620)."""

from __future__ import annotations

from edgar_crawler_spark.functions.htmldom import Element, Text, parse_html

COMPANY_INFO_FIELDS = [
    "company_name",
    "sic",
    "state_location",
    "state_of_inc",
    "fiscal_year_end",
]


def _node_str(node) -> str:
    if isinstance(node, Text):
        return node.data
    return str(node)


def _node_text(node) -> str:
    if isinstance(node, Text):
        return node.data
    if isinstance(node, Element):
        return node.get_text()
    return ""


def parse_company_info_page(html: str) -> dict:
    """The 5-field company record; all-None when the page lacks a
    companyInfo div (cached anyway, matching the reference)."""
    out: dict = dict.fromkeys(COMPANY_INFO_FIELDS)
    dom = parse_html(html)
    infos = dom.find_all("div", class_in=["companyInfo"])
    if not infos:
        return out
    company_info = infos[0]

    names = company_info.find_all("span", class_in=["companyName"])
    if names:
        first_text = next(
            (c.data for c in names[0].children if isinstance(c, Text)), None
        )
        if first_text is not None:
            out["company_name"] = first_text.strip()

    idents = company_info.find_all("p", class_in=["identInfo"])
    if not idents:
        return out
    contents = idents[0].children
    for idx, content in enumerate(contents):
        s = _node_str(content)
        if ";SIC=" in s:
            out["sic"] = _node_text(content)
        if ";State=" in s:
            out["state_location"] = _node_text(content)
        if "State of Inc" in s and idx + 1 < len(contents):
            out["state_of_inc"] = _node_text(contents[idx + 1])
        if "Fiscal Year End" in s:
            out["fiscal_year_end"] = s.split()[-1]
    return out


def synth_company_page(
    cik: str,
    name: str = "ACME CORP",
    sic: str = "7372",
    state_location: str = "CA",
    state_of_inc: str = "DE",
    fye: str = "1231",
) -> str:
    """browse-edgar-shaped fixture page for tests."""
    return f"""<html><body>
<div class="companyInfo">
  <span class="companyName">{name} <acronym title="Central Index Key">CIK</acronym>#: {cik}</span>
  <p class="identInfo"><a href="/cgi-bin/browse-edgar?action=getcompany&amp;SIC={sic}&amp;type=10-K">{sic}</a> - Services |
  <a href="/cgi-bin/browse-edgar?action=getcompany&amp;State={state_location}&amp;type=10-K">{state_location}</a> |
  State of Inc.: <strong>{state_of_inc}</strong> | Fiscal Year End: {fye}</p>
</div>
</body></html>"""
