"""Item-section parsing kernels T7–T11 (SURVEY.md §2.5), re-implemented
to match the reference's section-search semantics byte-exactly
(adjust_item_patterns: /root/reference/extract_items.py:523-583;
parse_item: :585-712; get_item_section: :714-775;
get_last_item_section: :777-821; 10-Q part logic: :823-981).

The item enumerations are SEC form structure (public: 10-K Items 1–16,
8-K Items 1.01–9.01 post-2004-08-23 / 1–12 before, 10-Q two-part
items), same as the reference's item_lists.py:7-99.
"""

from __future__ import annotations

import re

REGEX_FLAGS = re.IGNORECASE | re.DOTALL | re.MULTILINE

ITEMS_10K = [
    "1", "1A", "1B", "1C", "2", "3", "4", "5", "6", "7", "7A", "8",
    "9", "9A", "9B", "9C", "10", "11", "12", "13", "14", "15", "16",
    "SIGNATURE",
]
ITEMS_8K = [
    "1.01", "1.02", "1.03", "1.04", "1.05",
    "2.01", "2.02", "2.03", "2.04", "2.05", "2.06",
    "3.01", "3.02", "3.03",
    "4.01", "4.02",
    "5.01", "5.02", "5.03", "5.04", "5.05", "5.06", "5.07", "5.08",
    "6.01", "6.02", "6.03", "6.04", "6.05",
    "7.01", "8.01", "9.01",
    "SIGNATURE",
]
ITEMS_8K_OBSOLETE = [str(i) for i in range(1, 13)] + ["SIGNATURE"]
ITEMS_10Q = [
    "part_1__1", "part_1__2", "part_1__3", "part_1__4",
    "part_2__1", "part_2__1A", "part_2__2", "part_2__3", "part_2__4",
    "part_2__5", "part_2__6",
    "SIGNATURE",
]

OBSOLETE_8K_CUTOFF = "2004-08-23"

ROMAN = {
    "1": "I", "2": "II", "3": "III", "4": "IV", "5": "V", "6": "VI",
    "7": "VII", "8": "VIII", "9": "IX", "10": "X", "11": "XI",
    "12": "XII", "13": "XIII", "14": "XIV", "15": "XV", "16": "XVI",
    "17": "XVII", "18": "XVIII", "19": "XIX", "20": "XX",
}

_WS = r"[^\S\r\n]"


def item_pattern(item_index: str) -> str:
    """Regex for an item header, with the reference's special cases:
    10-Q part headers, letter-gap tolerance (9A(T), 1A…), SIGNATURE
    variants, dot-escape for 8-K indexes, ITEMS? prefix."""
    if "part" in item_index:
        if "__" not in item_index:
            num = item_index.split("_")[1]
            return rf"PART\s*(?:{ROMAN[num]}|{num})"
        item_index = item_index.split("__")[1]

    pattern = item_index
    if item_index == "9A":
        pattern = pattern.replace("A", rf"{_WS}*A(?:\(T\))?")
    elif item_index == "SIGNATURE":
        pass
    elif "A" in item_index:
        pattern = pattern.replace("A", rf"{_WS}*A")
    elif "B" in item_index:
        pattern = pattern.replace("B", rf"{_WS}*B")
    elif "C" in item_index:
        pattern = pattern.replace("C", rf"{_WS}*C")

    if item_index == "SIGNATURE":
        return rf"{item_index}(s|\(s\))?"
    if "." in item_index:
        item_index = item_index.replace(".", r"\.")
    if item_index in ROMAN:
        item_index = f"(?:{ROMAN[item_index]}|{item_index})"
    return rf"ITEMS?\s*{item_index}"


def select_section(candidates: list[tuple[int, list[re.Match]]], text: str, positions: list[int]):
    """T9/A6: among candidate (offset, matches), pick the longest match
    whose start is at/after the last accepted position; append the
    end-of-header cursor to positions."""
    section = ""
    best_len = 0
    best = None
    best_offset = None
    for offset, matches in candidates:
        for m in matches:
            length = m.end() - m.start()
            if positions:
                if length > best_len and offset + m.start() >= positions[-1]:
                    best, best_offset, best_len = m, offset, length
            elif length > best_len:
                best, best_offset, best_len = m, offset, length
    if best:
        if not positions or best_offset + best.start() >= positions[-1]:
            section = text[best_offset + best.start() : best_offset + best.regs[1][0]]
        positions.append(best_offset + best.end() - len(best[1]) - 1)
    return section, positions


def last_section(item_index: str, text: str, positions: list[int]) -> str:
    """T10: tail extraction — from the item header to EOF; for
    SIGNATURE the LAST match wins (ToC mentions come first)."""
    pattern = item_pattern(item_index)
    hits = list(re.finditer(rf"\n{_WS}*{pattern}[.\-:\s].+?", text, flags=REGEX_FLAGS))
    for i, m in enumerate(hits):
        if "SIGNATURE" in item_index and i != len(hits) - 1:
            continue
        if positions:
            if m.start() >= positions[-1]:
                return text[m.start():].strip()
        else:
            return text[m.start():].strip()
    return ""


def parse_item(
    text: str,
    item_index: str,
    next_item_list: list[str],
    positions: list[int],
    items_list: list[str],
    ignore_matches: int = 0,
):
    """T8: find the section between this item's header and the next
    item's header. Two-phase (case-sensitive first) span search;
    ToC skipping via ignore_matches; single-item fallback."""
    flags_ci = re.IGNORECASE | re.DOTALL
    pattern = item_pattern(item_index)

    part_number = None
    if "part" in item_index and "PART" not in pattern:
        part_number = item_index.split("__")[0]

    candidates: list[tuple[int, list[re.Match]]] = []
    impossible_match = None
    last_item = True
    for next_item_index in next_item_list:
        last_item = False
        if candidates:
            break
        if next_item_index == next_item_list[-1]:
            last_item = True

        next_pattern = item_pattern(next_item_index)
        if "part" in next_item_index and "PART" not in next_pattern:
            if next_item_index.split("__")[0] != part_number:
                # next item lives in a later part — extract to part end
                last_item = True
                break

        matches = list(
            re.finditer(rf"\n{_WS}*{pattern}[.*~\-:\s\(]", text, flags=flags_ci)
        )
        for i, match in enumerate(matches):
            if i < ignore_matches:
                continue
            offset = match.start()
            # case-sensitive first: section headers are usually uppercase
            span_re = (
                rf"\n{_WS}*{pattern}[.*~\-:\s\()].+?"
                rf"(\n{_WS}*{next_pattern}[.*~\-:\s\(])"
            )
            possible = list(re.finditer(span_re, text[offset:], flags=re.DOTALL))
            if not possible:
                possible = list(re.finditer(span_re, text[offset:], flags=flags_ci))
            if possible:
                candidates.append((offset, possible))
            elif next_item_index == next_item_list[-1] and not candidates and match:
                impossible_match = match

    section, positions = select_section(candidates, text, positions)

    if positions:
        if item_index in items_list and section == "":
            section = last_section(item_index, text, positions)
        if item_index == "SIGNATURE":
            section = last_section(item_index, text, positions)
    elif impossible_match or last_item:
        if item_index in items_list:
            section = last_section(item_index, text, positions)

    return section, positions
