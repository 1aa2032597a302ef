"""Text-normalization kernels T1–T3 (SURVEY.md §2.5), re-implemented
from the reference's behavior. The regex constants ARE the behavioral
spec — golden outputs assert byte-exact equality, so they must match
the reference's normalization exactly (strip_html:
/root/reference/extract_items.py:201-221; remove_multiple_lines:
:223-243; clean_text: :245-333). Code structure, parsing machinery and
batch orchestration are this engine's own.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

REGEX_FLAGS = re.IGNORECASE | re.DOTALL | re.MULTILINE


class _TagStripper(HTMLParser):
    """Keep only character data (entity refs decoded by the parser);
    comments/decls/PIs vanish."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []

    def handle_data(self, data: str) -> None:
        self.parts.append(data)


# NB: deliberately case-sensitive — upstream serialization lowercases
# tags, so raw UPPERCASE tags in plain-text docs do NOT get newlines
# (matching the reference's behavior on non-HTML paths).
_CLOSE_BLOCK = re.compile(r"(<\s*/\s*(div|tr|p|li|)\s*>)")
_BR = re.compile(r"(<br\s*>|<br\s*/>)")
_CLOSE_CELL = re.compile(r"(<\s*/\s*(th|td)\s*>)")


def strip_html(html_content: str) -> str:
    """T1: structural tags → whitespace, then drop all tags."""
    html_content = _CLOSE_BLOCK.sub(r"\1\n\n", html_content)
    html_content = _BR.sub(r"\1\n\n", html_content)
    html_content = _CLOSE_CELL.sub(r" \1 ", html_content)
    s = _TagStripper()
    s.feed(html_content)
    return "".join(s.parts)


def remove_multiple_lines(text: str) -> str:
    """T3: collapse blank-line runs to single newlines, spaces to one."""
    text = re.sub(r"(( )*\n( )*){2,}", "#NEWLINE", text)
    text = re.sub(r"\n", " ", text)
    text = re.sub(r"(#NEWLINE)+", "\n", text).strip()
    text = re.sub(r"[ ]{2,}", " ", text)
    return text


_CHAR_SUBS = [
    (re.compile("[\xa0]"), " "),
    (re.compile("[\u200b]"), " "),
    (re.compile("[\x91]"), "\u2018"),
    (re.compile("[\x92]"), "\u2019"),
    (re.compile("[\x93]"), "\u201c"),
    (re.compile("[\x94]"), "\u201d"),
    (re.compile("[\x95]"), "\u2022"),
    (re.compile("[\x96]"), "-"),
    (re.compile("[\x97]"), "-"),
    (re.compile("[\x98]"), "\u02dc"),
    (re.compile("[\x99]"), "\u2122"),
    (re.compile("[\u2010\u2011\u2012\u2013\u2014\u2015]"), "-"),
    (re.compile("[\u2018]"), "\u2018"),
    (re.compile("[\u2019]"), "\u2019"),
    (re.compile("[\u2009]"), " "),
    (re.compile("[\u00ae]"), "\u00ae"),
    (re.compile("[\u201c]"), "\u201c"),
    (re.compile("[\u201d]"), "\u201d"),
]

_WS = r"[^\S\r\n]"
_PART_HDR = re.compile(
    rf"(\n{_WS}*)(P{_WS}*A{_WS}*R{_WS}*T)({_WS}+)((\d{{1,2}}|[IV]{{1,2}})[AB]?)",
    re.IGNORECASE,
)
_ITEM_HDR = re.compile(
    rf"(\n{_WS}*)(I{_WS}*T{_WS}*E{_WS}*M)({_WS}+)(\d{{1,2}}[AB]?)",
    re.IGNORECASE,
)
_SIG_HDR = re.compile(
    rf"(\n{_WS}*)(S{_WS}*I{_WS}*G{_WS}*N{_WS}*A{_WS}*T{_WS}*U{_WS}*R{_WS}*E{_WS}*"
    rf"(S|\({_WS}*s{_WS}*\))?)({_WS}+)({_WS}?)",
    re.IGNORECASE,
)
_ITEM_DASH = re.compile(r"(ITEM|PART)(\s+\d{1,2}[AB]?)([\-•])", re.IGNORECASE)
_HDR_FLAGS = re.IGNORECASE | re.MULTILINE
_TOC_LINE = re.compile(
    rf"\n{_WS}*(TABLE\s+OF\s+CONTENTS|INDEX\s+TO\s+FINANCIAL\s+STATEMENTS|BACK\s+TO\s+CONTENTS|QUICKLINKS){_WS}*\n",
    _HDR_FLAGS,
)
_PAGENUM_DASH = re.compile(rf"\n{_WS}*[-‒–—]*\d+[-‒–—]*{_WS}*\n", _HDR_FLAGS)
_PAGENUM = re.compile(rf"\n{_WS}*\d+{_WS}*\n", _HDR_FLAGS)
_FPAGE = re.compile(r"[\n\s]F[-‒–—]*\d+", _HDR_FLAGS)
_PAGE_WORD = re.compile(rf"\n{_WS}*Page\s[\d*]+{_WS}*\n", _HDR_FLAGS)


def _despace(m: re.Match) -> str:
    return f"{m[1]}{re.sub(_WS, '', m[2])}{m[3]}{m[4]}"


def _despace_sig(m: re.Match) -> str:
    return f"{m[1]}{re.sub(_WS, '', m[2])}{m[4]}{m[5]}"


def clean_text(text: str) -> str:
    """T2: mojibake/char-class canonicalization, broken-header repair
    (``I T E M`` → ``ITEM``), ToC/page-number line removal."""
    for pat, repl in _CHAR_SUBS:
        text = pat.sub(repl, text)
    text = _PART_HDR.sub(_despace, text)
    text = _ITEM_HDR.sub(_despace, text)
    text = _SIG_HDR.sub(_despace_sig, text)
    text = _ITEM_DASH.sub(r"\1\2 \3 ", text)
    text = _TOC_LINE.sub("\n", text)
    text = _PAGENUM_DASH.sub("\n", text)
    text = _PAGENUM.sub("\n", text)
    text = _FPAGE.sub("", text)
    text = _PAGE_WORD.sub("", text)
    return text
