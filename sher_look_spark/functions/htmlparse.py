"""HTML field extraction + section segmentation (SURVEY §2.2 I2/I3).

Reference semantics (indexer/Indexer.java:46-104, stdlib re-implementation —
no Jsoup here):
  * title = <title> text, falling back to the first h1..h6 (:50-54)
  * description = meta[name=description]@content, falling back to the first
    <p> text (:56-63)
  * sections: walk elements in document order; skip <script>/<style>/<title>/
    <meta>; an element contributes iff its OWN text (direct text nodes) is
    non-empty, and then contributes its FULL descendant text; h1-h6 -> 'header',
    everything else -> 'body' (:86-92)
  * the title is tokenized first under section 'title' (:78-81)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

_WS = re.compile(r"\s+")
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


@dataclass
class _Node:
    tag: str
    attrs: dict = field(default_factory=dict)
    children: list = field(default_factory=list)  # _Node | str
    parent: "_Node | None" = None

    def own_text(self) -> str:
        return _WS.sub(" ", " ".join(c for c in self.children if isinstance(c, str))).strip()

    def text(self) -> str:
        parts = []
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                parts.append(c.text())
        return _WS.sub(" ", " ".join(parts)).strip()

    def walk(self):
        for c in self.children:
            if isinstance(c, _Node):
                yield c
                yield from c.walk()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), parent=self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_endtag(self, tag):
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is not self.root:
            self.cur = node.parent

    def handle_data(self, data):
        if data.strip():
            self.cur.children.append(data)


def parse_tree(html: str) -> _Node:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


def extract_fields(html: str) -> tuple[str, str, list[tuple[str, str]]]:
    """-> (title, description, [(section, text), ...]) with title first.

    Sections list replicates the reference's traversal; feed each (section,
    text) pair to the tokenizer in order for reference-exact positions.
    """
    root = parse_tree(html)
    title = ""
    description = ""
    first_header = None
    first_p = None
    meta_desc = None
    for node in root.walk():
        if node.tag == "title" and not title:
            title = node.text()
        elif re.fullmatch(r"h[1-6]", node.tag) and first_header is None:
            first_header = node
        elif node.tag == "p" and first_p is None:
            first_p = node
        elif (
            node.tag == "meta"
            and meta_desc is None
            and node.attrs.get("name") == "description"
        ):
            meta_desc = node
    if not title and first_header is not None:
        title = first_header.text()
    if meta_desc is not None:
        description = meta_desc.attrs.get("content", "")
    elif first_p is not None:
        description = first_p.text()

    sections: list[tuple[str, str]] = []
    if title:
        sections.append(("title", title))
    for node in root.walk():
        if node.tag in ("script", "style", "title", "meta"):
            continue
        if not node.own_text():
            continue
        sec = "header" if re.fullmatch(r"h[1-6]", node.tag) else "body"
        sections.append((sec, node.text()))
    return title, description, sections
