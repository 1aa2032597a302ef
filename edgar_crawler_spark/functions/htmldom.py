"""Minimal HTML DOM on stdlib ``html.parser`` — a stand-in for the
bs4+lxml layer the reference uses (bs4/cssutils are not available in
this container, and a 100 TB pipeline shouldn't pay for a full parser
anyway).

Behavioral contract (what the extraction kernel downstream relies on,
mirroring BeautifulSoup(doc, "lxml") + str(soup) — reference
extract_items.py:1022-1042, 371-521):

* tag and attribute names lowercased (libxml2 does this; the
  case-SENSITIVE strip regexes downstream depend on it),
* character references decoded at parse time; serialization re-escapes
  only & < > in text and & " in attributes (bs4 "minimal" formatter),
* void elements serialize as ``<br/>``,
* stray end tags dropped; common implied-end-tag rules (p, li, tr,
  td/th, option) applied,
* document-order find_all / get_text / unwrap / decompose /
  replace_with — the exact surface remove_html_tables and handle_spans
  need.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = {
    "area", "base", "basefont", "br", "col", "embed", "frame", "hr",
    "img", "input", "isindex", "link", "meta", "param", "source",
    "track", "wbr",
}

# opening <key> implicitly closes an open <value-set> ancestor-run
_IMPLIED_CLOSERS = {
    "p": {"p"},
    "li": {"li", "p"},
    "tr": {"tr", "td", "th", "p"},
    "td": {"td", "th", "p"},
    "th": {"td", "th", "p"},
    "option": {"option"},
    "table": {"p"},
    "div": {"p"},
    "ul": {"p"},
    "ol": {"p"},
    "h1": {"p"}, "h2": {"p"}, "h3": {"p"}, "h4": {"p"}, "h5": {"p"}, "h6": {"p"},
    "thead": {"tr", "td", "th"},
    "tbody": {"tr", "td", "th"},
    "tfoot": {"tr", "td", "th"},
}


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


class Node:
    parent: "Element | None" = None

    def extract(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    @property
    def next_sibling(self) -> "Node | None":
        if self.parent is None:
            return None
        sibs = self.parent.children
        i = sibs.index(self)
        return sibs[i + 1] if i + 1 < len(sibs) else None

    def next_element_sibling(self) -> "Element | None":
        n = self.next_sibling
        while n is not None and not isinstance(n, Element):
            n = n.next_sibling
        return n


class Text(Node):
    __slots__ = ("data", "parent")

    def __init__(self, data: str):
        self.data = data
        self.parent = None

    def serialize(self, out: list[str]) -> None:
        out.append(_esc_text(self.data))


class Comment(Node):
    __slots__ = ("data", "parent")

    def __init__(self, data: str):
        self.data = data
        self.parent = None

    def serialize(self, out: list[str]) -> None:
        out.append(f"<!--{self.data}-->")


class Element(Node):
    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.parent = None

    # ---- tree surgery ----------------------------------------------------
    def append(self, node: Node) -> None:
        node.parent = self
        self.children.append(node)

    def unwrap(self) -> None:
        """Replace this element by its children (bs4 .unwrap)."""
        if self.parent is None:
            return
        idx = self.parent.children.index(self)
        for i, ch in enumerate(self.children):
            ch.parent = self.parent
            self.parent.children.insert(idx + 1 + i, ch)
        self.children = []
        self.extract()

    def decompose(self) -> None:
        self.extract()

    def replace_with_text(self, text: str) -> None:
        if self.parent is None:
            return
        idx = self.parent.children.index(self)
        t = Text(text)
        t.parent = self.parent
        self.parent.children[idx] = t
        self.parent = None

    def in_tree(self, root: "Element") -> bool:
        n: Node | None = self
        while n is not None:
            if n is root:
                return True
            n = n.parent
        return False

    # ---- queries -----------------------------------------------------------
    def find_all(
        self,
        tag: str,
        with_attr: str | None = None,
        class_in: list[str] | None = None,
    ) -> list["Element"]:
        out: list[Element] = []
        stack: list[Node] = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, Element):
                if (
                    n.tag == tag
                    and (with_attr is None or with_attr in n.attrs)
                    and (
                        class_in is None
                        or any(c in class_in for c in n.attrs.get("class", "").split())
                    )
                ):
                    out.append(n)
                stack.extend(reversed(n.children))
        return out

    def find(self, tag: str) -> "Element | None":
        hits = self.find_all(tag)
        return hits[0] if hits else None

    def get_text(self, strip: bool = False) -> str:
        parts: list[str] = []
        stack: list[Node] = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, Text):
                parts.append(n.data)
            elif isinstance(n, Element):
                stack.extend(reversed(n.children))
        s = "".join(parts)
        return s.strip() if strip else s

    # ---- serialization -----------------------------------------------------
    def serialize(self, out: list[str]) -> None:
        attrs = "".join(
            f' {k}="{_esc_attr(v)}"' if v is not None else f' {k}=""'
            for k, v in self.attrs.items()
        )
        if self.tag in VOID_ELEMENTS:
            out.append(f"<{self.tag}{attrs}/>")
            return
        out.append(f"<{self.tag}{attrs}>")
        for ch in self.children:
            ch.serialize(out)
        out.append(f"</{self.tag}>")

    def __str__(self) -> str:
        out: list[str] = []
        self.serialize(out)
        return "".join(out)


class _DomBuilder(HTMLParser):
    # convert_charrefs=False: Python's converter applies the HTML5
    # windows-1252 remapping (&#128; → €) but libxml2 decodes numeric
    # charrefs literally (&#128; → U+0080) — the goldens contain the
    # literal form, so we decode libxml2-style ourselves.
    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.root = Element("[document]")
        self.stack: list[Element] = [self.root]

    def _append_text(self, data: str) -> None:
        self.stack[-1].append(Text(data))

    def handle_charref(self, name):
        try:
            cp = int(name[1:], 16) if name.lower().startswith("x") else int(name)
            self._append_text(chr(cp))  # bypass blank handling: &#9; is content
        except (ValueError, OverflowError):
            self._append_text(f"&#{name};")

    def handle_entityref(self, name):
        from html.entities import html5

        ch = html5.get(name + ";") or html5.get(name)
        self._append_text(ch if ch is not None else f"&{name};")

    def _in_table(self) -> bool:
        return any(e.tag == "table" for e in self.stack)

    # implied end tags
    def _implied_close(self, tag: str) -> None:
        closers = _IMPLIED_CLOSERS.get(tag)
        if not closers:
            return
        while len(self.stack) > 1 and self.stack[-1].tag in closers:
            self.stack.pop()

    def handle_starttag(self, tag, attrs):
        self._implied_close(tag)
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: dropped (libxml2 behavior)

    # table-structure contexts: libxml2 keeps inter-cell blanks that
    # precede an element tag, but discards blanks that precede a
    # COMMENT (observed empirically against the reference's golden
    # corpus: `</td>\t<!-- colindex -->` tabs vanish, `</td>\n<td>`
    # newlines survive)
    _STRUCT = {"table", "thead", "tbody", "tfoot", "tr"}

    def handle_data(self, data):
        # Tab-indented inter-element blanks inside table subtrees lose
        # their tabs but keep their newlines; space-indented blanks and
        # content-context tabs survive verbatim. Empirical rule,
        # validated against the reference's 553-file golden corpus
        # (see tests/test_extract_golden.py).
        if "\t" in data and not data.strip() and self._in_table():
            data = data.replace("\t", "")
            if not data:
                return
        self.stack[-1].append(Text(data))

    def _drop_blank_before_comment(self):
        top = self.stack[-1]
        if (
            top.tag in self._STRUCT
            and top.children
            and isinstance(top.children[-1], Text)
            and not top.children[-1].data.strip()
        ):
            top.children.pop()

    def handle_comment(self, data):
        self._drop_blank_before_comment()
        self.stack[-1].append(Comment(data))


def parse_html(html: str) -> Element:
    """Parse into a DOM root. Tags/attrs lowercased by HTMLParser."""
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


def serialize(root: Element) -> str:
    """str(soup)-equivalent for a parsed root: children only, no
    synthetic <html><body> wrapper (the wrapper tags would be stripped
    downstream anyway)."""
    out: list[str] = []
    for ch in root.children:
        ch.serialize(out)
    return "".join(out)
