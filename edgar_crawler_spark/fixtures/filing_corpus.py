"""Deterministic synthetic plain-text 10-K / 10-Q / obsolete-8-K
filings for golden-minting (VERDICT r01 item 5).

The reference snapshot is missing the 10-K/10-Q raw fixture zips
(.MISSING_LARGE_BLOBS), so full-replay goldens only exist for 8-K.
This module generates SEC-wrapper plain-text filings — a pure function
of (form, index), no I/O, no randomness source beyond the seeded
Mersenne generator — that exercise the extraction kernels the 8-K
corpus cannot reach:

* T7/T8/T9/T10 on 10-K item grammar (1A/7A/9C letters, 16 items),
* T11's three 10-Q heuristics (no-PART-I backfill, >200-char ToC gap
  re-span, part_2≫part_1 ignore_matches escalation —
  reference extract_items.py:874-897, 940-975),
* T13's obsolete-8-K cutoff (Date <= 2004-08-23 → numeric item list),
* T12's plain-text document selection (wrapped / exhibit-first / bare),
* plain-text table removal and span-margin regexes (is_html=False
  branches of T5/T6).

Plain text by construction: the docs contain no ``<td>``/``<tr>``, so
the reference's HTML sniff always takes the txt path — the only path
that avoids its bs4/cssutils dependencies (absent in this container).
The goldens themselves are minted by ``tools/mint_goldens.py`` running
the REFERENCE implementation over this corpus.
"""

from __future__ import annotations

import random

TITLES_10K = {
    "1": "Business",
    "1A": "Risk Factors",
    "1B": "Unresolved Staff Comments",
    "1C": "Cybersecurity",
    "2": "Properties",
    "3": "Legal Proceedings",
    "4": "Mine Safety Disclosures",
    "5": "Market for Registrant's Common Equity",
    "6": "Selected Financial Data",
    "7": "Management's Discussion and Analysis",
    "7A": "Quantitative and Qualitative Disclosures About Market Risk",
    "8": "Financial Statements and Supplementary Data",
    "9": "Changes in and Disagreements with Accountants",
    "9A": "Controls and Procedures",
    "9B": "Other Information",
    "9C": "Disclosure Regarding Foreign Jurisdictions",
    "10": "Directors, Executive Officers and Corporate Governance",
    "11": "Executive Compensation",
    "12": "Security Ownership of Certain Beneficial Owners",
    "13": "Certain Relationships and Related Transactions",
    "14": "Principal Accountant Fees and Services",
    "15": "Exhibits, Financial Statement Schedules",
    "16": "Form 10-K Summary",
}

TITLES_10Q_P1 = {
    "1": "Financial Statements",
    "2": "Management's Discussion and Analysis of Financial Condition",
    "3": "Quantitative and Qualitative Disclosures About Market Risk",
    "4": "Controls and Procedures",
}
TITLES_10Q_P2 = {
    "1": "Legal Proceedings",
    "1A": "Risk Factors",
    "2": "Unregistered Sales of Equity Securities",
    "3": "Defaults Upon Senior Securities",
    "4": "Mine Safety Disclosures",
    "5": "Other Information",
    "6": "Exhibits",
}

TITLES_8K_OLD = {
    "1": "Changes in Control of Registrant",
    "2": "Acquisition or Disposition of Assets",
    "3": "Bankruptcy or Receivership",
    "4": "Changes in Registrant's Certifying Accountant",
    "5": "Other Events",
    "6": "Resignations of Registrant's Directors",
    "7": "Financial Statements and Exhibits",
    "8": "Change in Fiscal Year",
    "9": "Regulation FD Disclosure",
    "10": "Amendments to the Registrant's Code of Ethics",
    "11": "Temporary Suspension of Trading",
    "12": "Results of Operations and Financial Condition",
}

_WORDS = (
    "the company operations revenue quarter fiscal results segment "
    "product market customers growth margin cash liquidity capital "
    "expenditures contractual obligations material adverse effect "
    "subsidiaries consolidated statements accordance generally accepted "
    "accounting principles management believes estimates assumptions "
    "competitive regulatory environment domestic international"
).split()


def _sentences(rng: random.Random, n: int) -> str:
    out = []
    for _ in range(n):
        k = rng.randint(8, 18)
        words = [rng.choice(_WORDS) for _ in range(k)]
        out.append(" ".join(words).capitalize() + ".")
    return " ".join(out)


def _maybe_mojibake(rng: random.Random, s: str) -> str:
    if rng.random() < 0.4:
        s = s.replace(" the ", "\x93the\x94 ", 1)
    if rng.random() < 0.4:
        s = s.replace(" and ", " \x96 and ", 1)
    if rng.random() < 0.3:
        s = s.replace(" of ", "\xa0of ", 1)
    if rng.random() < 0.3:
        s = s.replace(" market ", " mar–ket ", 1)
    return s


def _spaced(header: str) -> str:
    return " ".join(header)


def _item_header(rng: random.Random, item: str, title: str, spaced: bool) -> str:
    word = rng.choice(["ITEM", "Item", "item"])
    sep = rng.choice([".", ".", ":", " -", "–"])
    if spaced and rng.random() < 0.5:
        word = _spaced(word)
    return f"{word} {item}{sep} {title}"


def _page_break(rng: random.Random, page: int) -> str:
    style = rng.randrange(4)
    if style == 0:
        return f"\n\n-{page}-\n\n"
    if style == 1:
        return f"\n\n{page}\n\n"
    if style == 2:
        return f"\n\nPage {page}\n\n"
    return f"\n\nF-{page}\n\n"


def _table_block(rng: random.Random) -> str:
    rows = "\n".join(
        f"   {rng.randint(1990, 2024)}    {rng.randint(100, 99999):>8}    {rng.randint(100, 99999):>8}"
        for _ in range(rng.randint(2, 5))
    )
    return f"\n<TABLE>\n{rows}\n</TABLE>\n"


def _span_block(rng: random.Random) -> str:
    if rng.random() < 0.5:
        return '<span style="font-weight:normal;margin-left:36pt;"></span>'
    return '<span style="color:#000;margin-top:12.0pt;"></span>'


def _toc_10k(items: list[str]) -> str:
    lines = ["\nTABLE OF CONTENTS\n"]
    for n, it in enumerate(items):
        lines.append(f"Item {it}. {TITLES_10K[it]} {n + 2}")
    return "\n".join(lines) + "\n"


def _signature_block(rng: random.Random) -> str:
    word = rng.choice(["SIGNATURE", "SIGNATURES", "SIGNATURE(S)"])
    return (
        f"\n{word}\n\nPursuant to the requirements of the Securities "
        "Exchange Act of 1934, the registrant has duly caused this "
        "report to be signed on its behalf by the undersigned.\n\n"
        "/s/ JANE Q. OFFICER\nChief Executive Officer\n"
    )


def _wrap(rng: random.Random, body: str, form: str, with_exhibit: bool, bare: bool) -> str:
    if bare:
        return body
    docs = []
    if with_exhibit:
        docs.append(
            "<DOCUMENT>\n<TYPE>EX-99.1\n<SEQUENCE>2\n<TEXT>\n"
            "Press release text that must NOT be selected.\n</TEXT>\n</DOCUMENT>"
        )
    docs.insert(
        0 if rng.random() < 0.5 else len(docs),
        f"<DOCUMENT>\n<TYPE>{form}\n<SEQUENCE>1\n<TEXT>\n{body}\n</TEXT>\n</DOCUMENT>",
    )
    head = "<SEC-DOCUMENT>0000000000-00-000000.txt\n<SEC-HEADER>\n</SEC-HEADER>\n"
    return head + "\n".join(docs) + "\n</SEC-DOCUMENT>\n"


def make_10k(i: int) -> str:
    rng = random.Random(f"10-K-{i}")
    items = [it for it in TITLES_10K if rng.random() > 0.18]
    for core in ("1", "7", "8"):
        if core not in items:
            items.append(core)
    items.sort(key=list(TITLES_10K).index)
    spaced = rng.random() < 0.3
    parts = []
    if rng.random() < 0.5:
        parts.append(_toc_10k(items))
    page = 2
    for it in items:
        parts.append("\n" + _item_header(rng, it, TITLES_10K[it], spaced) + "\n\n")
        body = _maybe_mojibake(rng, _sentences(rng, rng.randint(2, 7)))
        if rng.random() < 0.3:
            body += _table_block(rng)
        if rng.random() < 0.2:
            body += _span_block(rng) + _sentences(rng, 1)
        parts.append(body)
        if rng.random() < 0.5:
            parts.append(_page_break(rng, page))
            page += 1
    parts.append(_signature_block(rng))
    body = "".join(parts)
    return _wrap(rng, body, "10-K", rng.random() < 0.25, rng.random() < 0.2)


def make_10q(i: int) -> str:
    """Scenario rotation exercises T11's heuristics:
    i%4==0 normal, 1 no-PART-I header, 2 PART I only in a long ToC
    (>200-char gap re-span), 3 part_2 ≫ part_1 (>5000-char imbalance
    → ignore_matches escalation)."""
    rng = random.Random(f"10-Q-{i}")
    scenario = i % 4
    spaced = rng.random() < 0.3
    parts = []

    def emit_part(part_no: str, titles: dict, n_sent) -> None:
        hdr = rng.choice(["PART", "Part"])
        if spaced and rng.random() < 0.5:
            hdr = _spaced(hdr)
        parts.append(f"\n{hdr} {part_no}\n\n")
        for it, title in titles.items():
            parts.append("\n" + _item_header(rng, it, title, spaced) + "\n\n")
            parts.append(_maybe_mojibake(rng, _sentences(rng, n_sent())))

    if scenario == 2:
        # PART I/II named in a fat ToC first; true PART I header >200
        # chars after the ToC match
        toc = ["\nTABLE OF CONTENTS\n", "PART I Financial Information 2"]
        for it, t in TITLES_10Q_P1.items():
            toc.append(f"Item {it}. {t} {rng.randint(2, 9)}")
        toc.append("PART II Other Information 12")
        for it, t in TITLES_10Q_P2.items():
            toc.append(f"Item {it}. {t} {rng.randint(12, 29)}")
        parts.append("\n".join(toc) + "\n")
        parts.append(_sentences(rng, 6))  # > 200 chars of preamble

    if scenario != 1:
        emit_part("I", TITLES_10Q_P1, lambda: rng.randint(2, 5))
    else:
        # no PART I header at all — items appear directly
        for it, title in TITLES_10Q_P1.items():
            parts.append("\n" + _item_header(rng, it, title, spaced) + "\n\n")
            parts.append(_sentences(rng, rng.randint(2, 4)))

    n2 = (lambda: rng.randint(40, 60)) if scenario == 3 else (lambda: rng.randint(2, 5))
    emit_part("II", TITLES_10Q_P2, n2)
    parts.append(_signature_block(rng))
    body = "".join(parts)
    return _wrap(rng, body, "10-Q", rng.random() < 0.2, rng.random() < 0.2)


def make_8k_obsolete(i: int) -> str:
    rng = random.Random(f"8K-OLD-{i}")
    items = [it for it in TITLES_8K_OLD if rng.random() > 0.55]
    if not items:
        items = ["5"]
    items.sort(key=list(TITLES_8K_OLD).index)
    parts = []
    for it in items:
        parts.append("\n" + _item_header(rng, it, TITLES_8K_OLD[it], False) + "\n\n")
        parts.append(_maybe_mojibake(rng, _sentences(rng, rng.randint(1, 4))))
    parts.append(_signature_block(rng))
    return _wrap(rng, "".join(parts), "8-K", False, rng.random() < 0.3)


def corpus_entry(form: str, i: int) -> dict:
    """(metadata, content, flags) for corpus doc i of the given form —
    metadata uses the reference's 14 CSV column names."""
    if form == "10-K":
        content = make_10k(i)
        date, period = "2021-02-25", "2020-12-31"
        remove_tables = True
    elif form == "10-Q":
        content = make_10q(i)
        date, period = "2021-05-06", "2021-03-31"
        remove_tables = False
    elif form == "8-K-OLD":
        content = make_8k_obsolete(i)
        date, period = "2003-07-15", "2003-07-15"
        remove_tables = True
    else:
        raise ValueError(form)
    ftype = "8-K" if form == "8-K-OLD" else form
    cik = str(100000 + i)
    year = date[:4]
    acc = f"{int(cik):010d}-{int(year) % 100:02d}-{i:06d}"
    filename = f"{cik}_{ftype.replace('-', '')}_{year}_{acc.replace('-', '')}.txt"
    metadata = {
        "CIK": cik,
        "Company": f"SYNTHETIC CORP {i}",
        "Type": ftype,
        "Date": date,
        "complete_text_file_link": f"https://www.sec.gov/Archives/edgar/data/{cik}/{acc}.txt",
        "html_index": f"https://www.sec.gov/Archives/edgar/data/{cik}/{acc}-index.html",
        "Filing Date": date,
        "Period of Report": period,
        "SIC": "7372",
        "htm_file_link": None,
        "State of Inc": "DE",
        "State location": "CA",
        "Fiscal Year End": "1231",
        "filename": filename,
    }
    include_signature = i % 5 == 0  # cover the SIGNATURE path too
    return {
        "form": form,
        "metadata": metadata,
        "content": content,
        "remove_tables": remove_tables,
        "include_signature": include_signature,
    }


CORPUS_SIZES = {"10-K": 60, "10-Q": 60, "8-K-OLD": 24}


def full_corpus():
    for form, n in CORPUS_SIZES.items():
        for i in range(n):
            yield corpus_entry(form, i)
