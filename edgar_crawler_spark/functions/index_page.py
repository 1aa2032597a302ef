"""N3: the per-filing index-page parse — extract Filing Date / Period
of Report / company identifiers and pick the document to download
(reference crawl(), download_filings.py:464-738), as a pure kernel the
fetch stage calls per page inside Arrow batches.

Replicated reference behaviors (goldens/metadata depend on them):
* a missing "Period of Report" rejects the row (dl:529-531);
* the State-location parse compares a string to a LIST and therefore
  never matches (`info_splits[0].strip() == ["State location"]`,
  dl:556) — State location is only ever filled from the company dim;
* document choice: the first row of the "Document Format Files" table
  whose Type matches takes the htm/html link; otherwise the
  "Complete submission text file" row (dl:670-697);
* iXBRL rewrite ``ix?doc=/`` → "" with extension forced to htm
  (P4, dl:700-713);
* filename = {CIK}_{type-sans-specials}_{period[:4]}_{accession}.{ext}
  (P5, dl:716-722).
"""

from __future__ import annotations

import re

from edgar_crawler_spark.functions.htmldom import Element, parse_html

SEC_PREFIX = "https://www.sec.gov"


def _text(el: Element | None) -> str | None:
    return el.get_text() if el is not None else None


def parse_filing_index_page(
    html: str,
    filing_types: list[str],
    cik: str,
    fallback_type: str,
    complete_text_file_link: str | None = None,
) -> dict | None:
    """Returns the enrichment dict, or None when the page lacks a
    Period of Report (row dropped, dl:529-531).

    ``complete_text_file_link`` is the seed row's existing txt link
    (from the index TSV) — the accession in the filename derives from
    it (dl:717-720); the document walk only overrides it on the
    complete-submission fallback path."""
    dom = parse_html(html)
    out: dict = {
        "filing_date": None,
        "period_of_report": None,
        "state_of_inc": None,
        "state_location": None,  # never filled here — see module doc
        "fiscal_year_end": None,
        "sic": None,
        "htm_file_link": None,
        "complete_text_file_link": complete_text_file_link,
        "link_to_download": None,
        "filename": None,
    }

    # 'Filing Date' / 'Period of Report' from infoHead → info pairs
    for form in dom.find_all("div", class_in=["infoHead", "info"]):
        if "infoHead" not in form.attrs.get("class", ""):
            continue
        label = form.get_text()
        nxt = form.next_element_sibling()
        if label == "Filing Date":
            out["filing_date"] = _text(nxt)
        elif label == "Period of Report":
            out["period_of_report"] = _text(nxt)
    if out["period_of_report"] is None:
        return None

    # company identifiers from the identInfo paragraph
    ident = None
    for div in dom.find_all("div", class_in=["companyInfo"]):
        ps = div.find_all("p", class_in=["identInfo"])
        if ps:
            ident = ps[0]
            break
    if ident is not None:
        info_text = ident.get_text()
        for info in info_text.split("|"):
            splits = info.split(":")
            if splits[0].strip() in ("State of Incorp.", "State of Inc.", "State of Incorporation."):
                out["state_of_inc"] = splits[1].strip()
        fye = re.search(r"Fiscal Year End: *(\d{4})", info_text)
        if fye:
            out["fiscal_year_end"] = fye.group(1)
        for a in ident.find_all("a", with_attr="href"):
            if "SIC" in a.attrs.get("href", ""):
                out["sic"] = a.get_text()
                break

    # document table walk
    filing_type = None
    for table in dom.find_all("table", with_attr="summary"):
        if table.attrs.get("summary") != "Document Format Files":
            continue
        for tr in table.find_all("tr")[1:]:
            tds = tr.find_all("td")
            if len(tds) < 4:
                continue
            type_txt = tds[3].get_text()
            links = tds[2].find_all("a", with_attr="href")
            href = links[0].attrs["href"] if links else None
            if type_txt in filing_types and href:
                if href.split(".")[-1] in ("htm", "html"):
                    filing_type = type_txt
                    out["htm_file_link"] = SEC_PREFIX + href
                    break
            elif tds[1].get_text() == "Complete submission text file" and href:
                filing_type = fallback_type
                out["complete_text_file_link"] = SEC_PREFIX + href
                break

    ext = None
    if out["htm_file_link"]:
        if "ix?doc=/" in out["htm_file_link"]:
            out["htm_file_link"] = out["htm_file_link"].replace("ix?doc=/", "")
            out["link_to_download"] = out["htm_file_link"]
            ext = "htm"
        else:
            out["link_to_download"] = out["htm_file_link"]
            ext = out["htm_file_link"].split(".")[-1]
    elif out["complete_text_file_link"]:
        out["link_to_download"] = out["complete_text_file_link"]
        ext = out["complete_text_file_link"].split(".")[-1]

    # accession = basename of the (possibly overridden) txt link
    accession = (
        out["complete_text_file_link"].rsplit("/", 1)[-1].rsplit(".", 1)[0]
        if out["complete_text_file_link"]
        else None
    )

    if out["link_to_download"] and accession and filing_type:
        type_name = re.sub(r"[\-/\\]", "", filing_type)
        out["filename"] = f"{cik}_{type_name}_{out['period_of_report'][:4]}_{accession}.{ext}"
    return out


def synth_index_page(
    cik: str = "1000180",
    filing_type: str = "8-K",
    filing_date: str = "2010-08-18",
    period: str = "2010-08-18",
    sic: str = "3572",
    state_of_inc: str = "DE",
    fye: str = "0102",
    doc_href: str = "/Archives/edgar/data/1000180/000095012310078896/f56692e8vk.htm",
    txt_href: str = "/Archives/edgar/data/1000180/0000950123-10-078896.txt",
    ixbrl: bool = False,
) -> str:
    """EDGAR-index-page-shaped fixture for tests."""
    if ixbrl:
        doc_href = "/ix?doc=" + doc_href
    return f"""
<html><body>
<div class="formContent">
  <div class="formGrouping">
    <div class="infoHead">Filing Date</div>
    <div class="info">{filing_date}</div>
    <div class="infoHead">Period of Report</div>
    <div class="info">{period}</div>
  </div>
</div>
<div class="companyInfo">
  <span class="companyName">SANDISK CORP (Filer)</span>
  <p class="identInfo">
    <a href="/cgi-bin/browse-edgar?action=getcompany&amp;SIC={sic}">{sic}</a>
    | State of Incorp.: {state_of_inc} | Fiscal Year End: {fye}
  </p>
</div>
<table summary="Document Format Files">
  <tr><th>Seq</th><th>Description</th><th>Document</th><th>Type</th><th>Size</th></tr>
  <tr><td>1</td><td>FORM {filing_type}</td><td><a href="{doc_href}">doc.htm</a></td><td>{filing_type}</td><td>11199</td></tr>
  <tr><td>&nbsp;</td><td>Complete submission text file</td><td><a href="{txt_href}">full.txt</a></td><td>&nbsp;</td><td>50000</td></tr>
</table>
</body></html>
"""
