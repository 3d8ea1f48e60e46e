"""Minimal DOM built on stdlib ``html.parser``.

From-scratch replacement for the BeautifulSoup/lxml navigation surface the
reference extractor uses (see /root/reference/src/tableExtract/tableExtractor.py
and table.py): tag tree with ``children`` / ``attrs`` / ``text``, document-order
``find`` / ``find_all`` (by tag name and class-regex), sibling and
``next_element`` navigation, and in-place ``extract`` (node removal).

Only the navigation semantics the extraction core depends on are implemented;
this is NOT a general HTML5 tree builder. Inputs are the pre-treated HTML
fragments produced upstream (``\\r\\t\\n`` already stripped, see
``locate.html_pretreat``), so whitespace-only text nodes between structural
tags are rare by construction.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, Optional, Union

# Elements that never take content (HTML void elements).
VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

Node = Union["Element", "TextNode"]


class TextNode:
    """A text node. ``text`` mirrors bs4 ``NavigableString`` behavior."""

    __slots__ = ("data", "parent")

    def __init__(self, data: str, parent: Optional["Element"] = None):
        self.data = data
        self.parent = parent

    @property
    def text(self) -> str:
        return self.data

    @property
    def name(self) -> None:  # bs4: NavigableString.name is None
        return None

    @property
    def contents(self) -> list:
        return []

    def __str__(self) -> str:
        return self.data

    def __len__(self) -> int:
        return len(self.data)

    def __repr__(self) -> str:
        return f"TextNode({self.data!r})"

    # -- sibling navigation (shared with Element) -------------------------
    @property
    def next_sibling(self) -> Optional[Node]:
        return _sibling(self, +1)

    @property
    def previous_sibling(self) -> Optional[Node]:
        return _sibling(self, -1)

    def extract(self) -> "TextNode":
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None
        return self


class Element:
    """An element node with bs4-Tag-shaped accessors."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None,
                 parent: Optional["Element"] = None):
        self.name = name
        self.attrs: dict = attrs or {}
        self.children: list[Node] = []
        self.parent = parent

    # -- attribute access ---------------------------------------------------
    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    def __getitem__(self, key: str) -> str:
        return self.attrs[key]

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    # -- content ------------------------------------------------------------
    @property
    def contents(self) -> list[Node]:
        return self.children

    @property
    def text(self) -> str:
        """Concatenated descendant text (bs4 ``Tag.text`` semantics)."""
        parts: list[str] = []
        stack: list[Node] = self.children[::-1]
        while stack:
            node = stack.pop()
            if node.__class__ is TextNode:
                parts.append(node.data)
            else:
                cs = node.children
                if cs:
                    stack.extend(cs[::-1])
        return "".join(parts)

    def markup(self) -> str:
        """Outer-HTML rendering (bs4 ``str(tag)`` shape: source-order
        attributes, double quotes, void elements self-closed; text and
        attribute values RE-ESCAPED — the parser unescaped entities at
        parse time, and bs4's formatter re-emits ``&amp;``/``&lt;``/
        ``&gt;`` in text and ``&amp;``/``&quot;`` in attributes). Used
        where the reference str()s a raw Tag — e.g. a two-child title
        node's second child becomes the table CAPTION as markup, not
        inner text (tableExtractor.py:470-471,489-490 assign the node;
        :500 str()s)."""
        def esc_attr(v: str) -> str:
            return v.replace("&", "&amp;").replace('"', "&quot;")

        def esc_text(t: str) -> str:
            return (t.replace("&", "&amp;").replace("<", "&lt;")
                     .replace(">", "&gt;"))

        attrs = "".join(f' {k}="{esc_attr(v)}"'
                        for k, v in self.attrs.items())
        if self.name in VOID_ELEMENTS and not self.children:
            return f"<{self.name}{attrs}/>"
        if self.name in ("script", "style"):
            # raw-text elements: bs4 emits their content verbatim (the
            # parser never entity-decoded it) — escaping would corrupt it
            inner = "".join(c.data if c.__class__ is TextNode else c.markup()
                            for c in self.children)
        else:
            inner = "".join(esc_text(c.data) if c.__class__ is TextNode
                            else c.markup() for c in self.children)
        return f"<{self.name}{attrs}>{inner}</{self.name}>"

    def append(self, node: Node) -> None:
        node.parent = self
        self.children.append(node)

    def extract(self) -> "Element":
        """Remove this element from its parent (bs4 ``Tag.extract``)."""
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None
        return self

    def replace_with_text(self, data: str) -> None:
        """Replace this element in its parent with a text node."""
        if self.parent is None:
            return
        idx = self.parent.children.index(self)
        self.parent.children[idx] = TextNode(data, self.parent)
        self.parent = None

    # -- document-order traversal -------------------------------------------
    def descendants(self) -> Iterator[Node]:
        stack: list[Node] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if isinstance(node, Element):
                stack.extend(reversed(node.children))

    @property
    def next_element(self) -> Optional[Node]:
        """Next node in document order (first child, else next sibling up-chain)."""
        if self.children:
            return self.children[0]
        node: Optional[Node] = self
        while node is not None:
            sib = _sibling(node, +1)
            if sib is not None:
                return sib
            node = node.parent
        return None

    # bs4 spells this ``.next``
    @property
    def next(self) -> Optional[Node]:
        return self.next_element

    @property
    def next_sibling(self) -> Optional[Node]:
        return _sibling(self, +1)

    @property
    def previous_sibling(self) -> Optional[Node]:
        return _sibling(self, -1)

    # -- search -------------------------------------------------------------
    def find_all(self, name: Optional[str] = None, attrs: Optional[dict] = None,
                 class_=None, href: bool = False, limit: Optional[int] = None,
                 ) -> list["Element"]:
        out: list[Element] = []
        stack: list[Node] = self.children[::-1]
        simple = attrs is None and class_ is None and not href
        while stack:
            node = stack.pop()
            if node.__class__ is not Element:
                continue
            if simple:
                if name is None or node.name == name:
                    out.append(node)
                    if limit is not None and len(out) >= limit:
                        return out
            elif _matches(node, name, attrs, class_, href):
                out.append(node)
                if limit is not None and len(out) >= limit:
                    return out
            cs = node.children
            if cs:
                stack.extend(cs[::-1])
        return out

    def find(self, name: Optional[str] = None, attrs: Optional[dict] = None,
             class_=None, href: bool = False) -> Optional["Element"]:
        res = self.find_all(name, attrs, class_, href, limit=1)
        return res[0] if res else None

    def __repr__(self) -> str:
        return f"<{self.name} {self.attrs}>({len(self.children)} children)"


def _sibling(node: Node, step: int) -> Optional[Node]:
    parent = node.parent
    if parent is None:
        return None
    sibs = parent.children
    idx = sibs.index(node)
    j = idx + step
    if 0 <= j < len(sibs):
        return sibs[j]
    return None


def _class_matches(el: Element, want) -> bool:
    raw = el.attrs.get("class")
    if raw is None:
        return False
    if isinstance(want, re.Pattern):
        if want.search(raw):
            return True
        return any(want.search(tok) for tok in raw.split())
    if isinstance(want, str):
        return want == raw or want in raw.split()
    return False


def _matches(el: Element, name, attrs, class_, href: bool) -> bool:
    if name is not None and el.name != name:
        return False
    if href and "href" not in el.attrs:
        return False
    if class_ is not None and not _class_matches(el, class_):
        return False
    if attrs:
        for k, v in attrs.items():
            if k == "class":
                if not _class_matches(el, v):
                    return False
            else:
                got = el.attrs.get(k)
                if got is None:
                    return False
                if isinstance(v, re.Pattern):
                    if not v.search(got):
                        return False
                elif got != v:
                    return False
    return True


class _TreeBuilder(HTMLParser):
    """stdlib-``html.parser`` tree builder — the reference implementation
    used by tests to cross-check the fast tokenizer below.
    ``convert_charrefs=True`` so ``&nbsp;`` arrives as ``\\xa0`` — the
    downstream cleaners strip it, mirroring the reference (table.py:1215)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack: list[Element] = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        # Pop to the matching open tag; ignore stray end tags.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].append(TextNode(data))

    def handle_comment(self, data: str) -> None:  # comments dropped at parse
        pass


def parse_html_stdlib(html: str) -> Element:
    """Parse via stdlib ``html.parser`` (slow reference path)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ---------------------------------------------------------------------------
# Fast regex tokenizer (≈3× the stdlib parser on this workload; the parse
# stage was ~45% of extraction wall time). Produces the same tree as
# parse_html_stdlib for the HTML this engine consumes — equivalence is
# enforced by tests/test_dom.py::test_fast_parser_matches_stdlib and the
# stored goldens.
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"<!--.*?(?:-->|$)"                    # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"          # CDATA
    r"|<!DOCTYPE[^>]*>"                    # doctype
    r"|</([a-zA-Z][-\w:]*)[^>]*>"          # end tag
    r"|<([a-zA-Z][-\w:]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>"  # start tag
    r"|[^<]+"                              # text
    r"|<",                                 # stray '<'
    re.S)
# branch-specific patterns for the find-dispatch loop (same alternatives as
# _TOKEN, tried in the same precedence order at a '<')
_END_TAG = re.compile(r"</([a-zA-Z][-\w:]*)[^>]*>")
_START_TAG = re.compile(
    r"<([a-zA-Z][-\w:]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>")
_COMMENT = re.compile(r"<!--.*?(?:-->|$)", re.S)
_CDATA = re.compile(r"<!\[CDATA\[.*?(?:\]\]>|$)", re.S)
_DOCTYPE = re.compile(r"<!DOCTYPE[^>]*>")
_ATTR = re.compile(
    r"([^\s=/>]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?")
# fast path for the dominant shape ` key="value"` (one double-quoted
# attribute, nothing trailing — so never self-closing): one anchored match
# replaces the finditer scan; anything else falls through to _ATTR
_ONE_ATTR = re.compile(r"\s*([^\s=/>]+)=\"([^\"]*)\"\s*\Z")
_RAW_END = {
    "script": re.compile(r"</script\s*>", re.I),
    "style": re.compile(r"</style\s*>", re.I),
}

_unescape = None  # lazy import of html.unescape (stdlib ``html`` module)


def parse_html(html: str, drop_tags: frozenset[str] = frozenset()) -> Element:
    """Parse an HTML string into a tree rooted at a ``[document]`` element.

    Comments are dropped during parsing (the reference strips them in
    ``htmlPreTreat``, tableExtractor.py:528). ``<script>``/``<style>``
    content is raw text (not tokenized). Entity references are unescaped
    exactly like ``html.parser`` with ``convert_charrefs=True``.

    ``drop_tags``: element names removed from the tree as they close —
    lets ``html_pretreat`` discard script/style/article/code without four
    post-parse full-tree traversals. (A dropped element is always the last
    appended child of its parent when it closes, so removal is O(1).)"""
    global _unescape
    if _unescape is None:
        from html import unescape as _u
        _unescape = _u
    # find-dispatch loop: text runs are located with C-speed str.find and
    # the tag kind is dispatched on the character after '<' (same results
    # as matching the _TOKEN alternation at every position — pinned by the
    # stdlib-equivalence tests); node construction is inlined (parent set
    # at construction, one list.append) — the loop is interpreter-bound,
    # so every avoided method call is measurable
    root = Element("[document]")
    stack = [root]
    cur = root
    cur_children = root.children
    pos = 0
    n = len(html)
    find = html.find
    sm = _START_TAG.match
    em = _END_TAG.match
    unesc = _unescape
    while pos < n:
        lt = find("<", pos)
        if lt != pos:
            if lt < 0:
                tok = html[pos:]
                pos = n
            else:
                tok = html[pos:lt]
                pos = lt
            if "&" in tok:
                tok = unesc(tok)
            cur_children.append(TextNode(tok, cur))
            continue
        c = html[pos + 1] if pos + 1 < n else ""
        if c == "/":
            m = em(html, pos)
            if m is None:                       # lone '<' (e.g. "</3")
                cur_children.append(TextNode("<", cur))
                pos += 1
                continue
            pos = m.end()
            name = m.group(1).lower()
            if name in VOID_ELEMENTS:
                continue
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].name == name:
                    # implicitly-closed descendants may also be dropped tags
                    # (e.g. "<b><article>x</b>" closes the article too) —
                    # each still-open element is the last child of its parent
                    if drop_tags:
                        for el in reversed(stack[i:]):
                            if el.name in drop_tags and el.parent is not None:
                                el.parent.children.remove(el)
                    del stack[i:]
                    cur = stack[-1]
                    cur_children = cur.children
                    break
            continue
        if c == "!":
            m = (_COMMENT.match(html, pos) or _CDATA.match(html, pos)
                 or _DOCTYPE.match(html, pos))
            if m is None:                       # lone '<' (e.g. "<!x")
                cur_children.append(TextNode("<", cur))
                pos += 1
            else:
                pos = m.end()                   # dropped
            continue
        m = sm(html, pos)
        if m is None:                           # lone '<' (no tag follows)
            cur_children.append(TextNode("<", cur))
            pos += 1
            continue
        pos = m.end()
        name = m.group(1).lower()
        attr_str = m.group(2)
        attrs = {}
        self_closing = False
        if attr_str:
            om = _ONE_ATTR.match(attr_str)
            if om is not None:
                val = om.group(2)
                if "&" in val:
                    val = unesc(val)
                attrs[om.group(1).lower()] = val
            else:
                last_end = 0
                for am in _ATTR.finditer(attr_str):
                    key = am.group(1).lower()
                    val = am.group(2) or am.group(3) or am.group(4) or ""
                    if "&" in val:
                        val = unesc(val)
                    attrs[key] = val
                    last_end = am.end()
                # self-closing ONLY when a standalone "/" remains after the
                # attributes — a trailing "/" inside an unquoted value (e.g.
                # href=/item/abc/) is part of the value, exactly as the
                # stdlib parser treats it
                self_closing = attr_str[last_end:].strip() == "/" \
                    and "/" in attr_str[last_end:]
        el = Element(name, attrs, cur)
        cur_children.append(el)
        if name in _RAW_END:
            # raw-text element: scan straight to its close tag
            if not self_closing:
                rm = _RAW_END[name].search(html, pos)
                if rm:
                    raw = html[pos:rm.start()]
                    if raw:
                        el.children.append(TextNode(raw, el))
                    pos = rm.end()
                else:
                    raw = html[pos:]
                    if raw:
                        el.children.append(TextNode(raw, el))
                    pos = n
            if name in drop_tags:
                cur_children.pop()              # el is the last child
        elif name not in VOID_ELEMENTS and not self_closing:
            stack.append(el)
            cur = el
            cur_children = el.children
        elif name in drop_tags:                 # void/self-closing dropped
            cur_children.pop()
    if drop_tags:
        # unclosed dropped elements (e.g. "<article><table>…" with no close
        # tag) are removed at EOF — the reference's post-parse extract()
        # discards them regardless of well-formedness
        for el in reversed(stack[1:]):
            if el.name in drop_tags and el.parent is not None:
                el.parent.children.remove(el)
    return root
