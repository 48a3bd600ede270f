"""Main-content extraction from HTML via DOM text-density node scoring.

The north-star technique (BASELINE.json north_star): Readability /
trafilatura-style scoring over a DOM tree — the slot where the reference's
digital path extracts markdown from born-digital documents
(structure_engine.py:67-111) before ``normalize_markdown``. Implemented on
the stdlib ``html.parser`` (lxml is not available in this environment); the
algorithm is the published one:

1. parse to a lightweight tree; drop script/style/head/comment subtrees
2. hard-prune boilerplate containers (nav/aside/footer/form + class/id
   matching a boilerplate lexicon)
3. score each block-level node: text length, link density (anchor chars /
   total chars), punctuation weight
4. keep headings and blocks with link_density < 0.5 whose own text is
   substantial; render kept blocks to markdown (headings → ``#``, lists →
   ``- ``, tables → pipe rows, paragraphs → text)

Deterministic and dependency-free; compiled patterns are module-level so an
actor pool shares them per worker process.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_BOILER_CLASS = re.compile(
    r"(?:^|[\s_-])(nav|navbar|menu|sidebar|side-bar|footer|header|banner|"
    r"advert|ads?|promo|cookie|consent|social|share|sharing|comment|related|"
    r"breadcrumb|pagination|widget|popup|modal|subscribe|newsletter)(?:$|[\s_-])",
    re.IGNORECASE)

_DROP_TAGS = frozenset({
    "script", "style", "noscript", "template", "head", "svg", "iframe",
    "button", "input", "select", "option", "form", "nav", "aside",
})
_SECTION_TAGS = frozenset({"header", "footer"})
_BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "body", "html", "ul", "ol",
    "li", "table", "tr", "td", "th", "blockquote", "pre", "h1", "h2", "h3",
    "h4", "h5", "h6", "figure", "figcaption", "br", "thead", "tbody",
})
_HEADING_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_VOID_TAGS = frozenset({"br", "hr", "img", "meta", "link", "input", "area",
                        "base", "col", "embed", "source", "track", "wbr"})
_WS = re.compile(r"\s+")

MIN_BLOCK_CHARS = 25       # shorter standalone blocks are dropped unless headings/list items
MAX_LINK_DENSITY = 0.5


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []   # _Node or str
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("html", {}, None)
        self.cur = self.root
        self._drop_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._drop_depth:
            if tag in _DROP_TAGS or tag not in _VOID_TAGS:
                self._drop_depth += 1 if tag not in _VOID_TAGS else 0
            return
        amap = {k: (v or "") for k, v in attrs}
        marker = " ".join((amap.get("class", ""), amap.get("id", ""),
                           amap.get("role", "")))
        if tag in _DROP_TAGS or tag in _SECTION_TAGS or _BOILER_CLASS.search(marker):
            if tag not in _VOID_TAGS:
                self._drop_depth = 1
            return
        node = _Node(tag, amap, self.cur)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_endtag(self, tag: str) -> None:
        if self._drop_depth:
            self._drop_depth -= 1
            return
        probe = self.cur
        while probe is not None and probe.tag != tag:
            probe = probe.parent
        if probe is not None and probe.parent is not None:
            self.cur = probe.parent

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        if data and not data.isspace():
            self.cur.children.append(data)


def _text_of(node: _Node) -> str:
    parts: list[str] = []
    stack: list[object] = [node]
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            parts.append(item)
        else:
            stack.extend(reversed(item.children))
    return _WS.sub(" ", "".join(parts)).strip()


def _link_chars(node: _Node) -> int:
    total = 0
    stack: list[tuple[object, bool]] = [(node, node.tag == "a")]
    while stack:
        item, in_link = stack.pop()
        if isinstance(item, str):
            if in_link:
                total += len(_WS.sub(" ", item).strip())
        else:
            child_in_link = in_link or item.tag == "a"
            stack.extend((c, child_in_link) for c in item.children)
    return total


def _render_table(node: _Node, out: list[str]) -> None:
    rows: list[list[str]] = []
    stack = [node]
    while stack:
        item = stack.pop(0)
        if isinstance(item, _Node):
            if item.tag == "tr":
                cells = [_text_of(c) for c in item.children
                         if isinstance(c, _Node) and c.tag in ("td", "th")]
                if cells:
                    rows.append(cells)
            else:
                stack = [c for c in item.children if isinstance(c, _Node)] + stack
    if not rows:
        return
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    out.append("| " + " | ".join(rows[0]) + " |")
    out.append("|" + "|".join(["---"] * width) + "|")
    for r in rows[1:]:
        out.append("| " + " | ".join(r) + " |")
    out.append("")


def _emit(node: _Node, out: list[str], depth: int = 0) -> None:
    tag = node.tag
    if tag in _HEADING_LEVEL:
        text = _text_of(node)
        if text:
            out.append("#" * _HEADING_LEVEL[tag] + " " + text)
            out.append("")
        return
    if tag == "table":
        _render_table(node, out)
        return
    if tag == "li":
        text = _text_of(node)
        if text:
            out.append("- " + text)
        return
    if tag in ("ul", "ol"):
        for child in node.children:
            if isinstance(child, _Node):
                _emit(child, out, depth + 1)
        out.append("")
        return
    if tag in ("p", "blockquote", "pre", "figcaption"):
        text = _text_of(node)
        if _keep_block(node, text):
            out.append(text)
            out.append("")
        return

    # container: classify by child mix
    direct_text = "".join(c for c in node.children if isinstance(c, str))
    block_children = [c for c in node.children
                      if isinstance(c, _Node) and c.tag in _BLOCK_TAGS]
    if block_children:
        for child in node.children:
            if isinstance(child, _Node):
                if child.tag in _BLOCK_TAGS:
                    _emit(child, out, depth + 1)
                else:
                    # inline node floating among blocks: treat as text run
                    text = _text_of(child)
                    if text and _keep_block(child, text):
                        out.append(text)
                        out.append("")
            elif isinstance(child, str) and child.strip():
                text = _WS.sub(" ", child).strip()
                if len(text) >= MIN_BLOCK_CHARS:
                    out.append(text)
                    out.append("")
    else:
        text = _text_of(node)
        if _keep_block(node, text):
            out.append(text)
            out.append("")


def _keep_block(node: _Node, text: str) -> bool:
    """Text-density acceptance: substantial own text, low link density."""
    if not text:
        return False
    n = len(text)
    if n < MIN_BLOCK_CHARS:
        # keep short blocks only when they look like content fragments
        # (sentence punctuation), not menu items
        return text.endswith((".", "!", "?", ":", ";", ","))
    links = _link_chars(node)
    return links / n <= MAX_LINK_DENSITY


def strip_html(html: str) -> str:
    """HTML → main-content markdown-ish text. Never raises on bad input;
    a parse explosion degrades to the tag-stripped text."""
    try:
        builder = _TreeBuilder()
        builder.feed(html)
        builder.close()
        out: list[str] = []
        _emit(builder.root, out)
        # collapse trailing blank-line bookkeeping
        text = "\n".join(out)
        text = re.sub(r"\n{3,}", "\n\n", text).strip()
        if text:
            return text
    except Exception:
        pass
    # fallback: naive tag strip
    return _WS.sub(" ", unescape(re.sub(r"<[^>]+>", " ", html))).strip()


def looks_like_html(text: str) -> bool:
    """Cheap payload-kind sniff used by the router stage."""
    head = text[:256].lstrip().lower()
    return head.startswith(("<!doctype html", "<html")) or "<body" in head or (
        "</" in text[:2000] and ("<p" in head or "<div" in head or "<main" in head))
