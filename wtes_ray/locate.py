"""Table locators: HTML pre-treatment, non-standard table extraction,
heuristic filtering, caption lookup, DOM→Table conversion.

Re-implements the reference's locator semantics (SURVEY.md §2 M1-M7):
``htmlPreTreat`` (tableExtractor.py:519-537), basic-info box extraction
(tableExtractor.py:258-321), ul-list tables (tableExtractor.py:337-386),
heuristic rules 1-3 (tableExtractor.py:166-256), ``getCaption``
(tableExtractor.py:453-500) and ``changeTig2Table`` (table.py:1179-1286) —
on the stdlib DOM from :mod:`wtes_ray.dom`.

These run per-document inside the Ray ``map_batches`` extraction UDF; all
state (lexicons, site rule, tagger) is passed in, loaded once per actor.
"""

from __future__ import annotations

import re

from .cleaners import clean_cell_text_cached as clean_cell_text
from .dom import Element, TextNode, parse_html
from .lexicons import DEFAULT_SITE_RULE
from .tablemodel import PERSON_INFO, UNNAMED, Cell, Table
from .wordtype import LexiconTagger

_TITLE_CLASS = re.compile(r"^.*title.*$")

# Anchor hrefs are absolutized against the reference's site root
# (table.py:1202: ``'https://baike.baidu.com' + href``).
HREF_PREFIX = "https://baike.baidu.com"


_PRETREAT_DROP = frozenset({"script", "style", "article", "code"})


def html_pretreat(html: str) -> Element:
    """M1 (tableExtractor.py:519-537): strip ``\\r\\t\\n``, parse, drop
    comments + <script>/<style>/<article>/<code> — all during the single
    parse pass (no post-parse tree sweeps)."""
    html = html.replace("\r", "").replace("\t", "").replace("\n", "")
    return parse_html(html, drop_tags=_PRETREAT_DROP)


def _replace_brs(el: Element) -> None:
    """``<br>`` → "/" inside a basic-info cell (tableExtractor.py:306-308)."""
    for br in el.find_all("br"):
        br.replace_with_text("/")


def locate_candidates(root: Element, rule: dict | None
                      ) -> tuple[list[Element], list[Element]]:
    """ONE document-order walk collecting both locator inputs: elements
    whose class matches the site rule (basic-info boxes) and ``<table>``
    tags — replaces two full-tree traversals per document (hot path)."""
    rule = rule if rule is not None else DEFAULT_SITE_RULE
    class_name = rule.get("class")
    pattern = re.compile(class_name) if class_name else None
    boxes: list[Element] = []
    tables: list[Element] = []
    stack = root.children[::-1]
    while stack:
        node = stack.pop()
        if node.__class__ is not Element:
            continue
        if node.name == "table":
            tables.append(node)
        if pattern is not None:
            raw = node.attrs.get("class")
            if raw is not None and (
                    pattern.search(raw)
                    or any(pattern.search(tok) for tok in raw.split())):
                boxes.append(node)
        cs = node.children
        if cs:
            stack.extend(cs[::-1])
    return boxes, tables


def extract_basic_info_tables(root: Element, rule: dict | None,
                              doc_url: str) -> list[Table]:
    """M3 (tableExtractor.py:258-321): per-site rule finds nodes whose class
    matches (default ``basic-info cmn-clearfix``); ``<dt>``/``<dd>`` pairs
    become an n×2 COL-direction table; ``<br>``→"/", NBSP and ``[n]`` refs
    stripped; first property ∈ {本名, 中文名} marks a person-info table and
    maps its subject to the page URL."""
    boxes, _ = locate_candidates(root, rule)
    return basic_info_tables_from_boxes(boxes, doc_url)


def basic_info_tables_from_boxes(boxes: list[Element],
                                 doc_url: str) -> list[Table]:
    tables: list[Table] = []
    for box in boxes:
        dts: list[Element] = []
        dds: list[Element] = []
        for dl in box.find_all("dl"):
            dts.extend(dl.find_all("dt"))
            dds.extend(dl.find_all("dd"))
        if len(dts) != len(dds) or not dts:
            continue
        rows: list[list[Cell]] = []
        for dt, dd in zip(dts, dds):
            row = []
            for item in (dt, dd):
                _replace_brs(item)
                text = clean_cell_text(str(item.text))
                row.append(Cell(text))
            rows.append(row)
        table = Table(rows)
        table.unfold_direction = "COL"
        if str(table.rows[0][0].content) in ("本名", "中文名"):
            table.href_map[str(table.rows[0][1].content)] = doc_url
            table.table_type = PERSON_INFO
        tables.append(table)
    return tables


_TITLE_TD = "normal title-td"


def _span_cell(span: Element) -> Cell | None:
    """One fused subtree walk per ``<span>`` collecting its text, descendant
    ``<a href>``s (raw href keyed by the anchor's subtree text — NO site
    prefix, matches tableExtractor.py:367-371) and ``<img src>``s — replaces
    the original text + find_all("a") + find_all("img") triple walk.
    Returns None for the '▪' bullet spans the reference skips."""
    parts: list[str] = []
    href: dict[str, str] = {}
    img_src: list[str] = []
    stack = span.children[::-1]
    while stack:
        node = stack.pop()
        if node.__class__ is TextNode:
            parts.append(node.data)
            continue
        name = node.name
        if name == "a":
            url = node.attrs.get("href")
            if url is not None:
                href[node.text] = url
        elif name == "img":
            src = node.attrs.get("src")
            if src is not None:
                img_src.append(src)
        cs = node.children
        if cs:
            stack.extend(cs[::-1])
    text = "".join(parts)
    if text == "▪":
        return None
    return Cell(text.strip(), href=href, img=img_src, tag_name="span")


def extract_list_table(tag: Element) -> list[Table]:
    """M4 (tableExtractor.py:337-386): ``<table>`` whose body is
    ``class='normal title-td'`` titles + ``<ul>`` lists; each ``<li>``'s
    ``<span>``s become cells; '▪' bullet spans are skipped. Returns [] when
    the title/ul counts differ (the caller then falls through to the
    heuristic path).

    Hot path: titles and uls are collected in ONE document-order subtree
    walk (``class='normal title-td'`` contains a space, so bs4/`_class_
    matches` semantics reduce to exact attribute equality), and each span
    cell is built by :func:`_span_cell`'s single fused walk — same results
    as the find_all form, pinned by the goldens and the DOM unit tests."""
    tables: list[Table] = []
    titles: list[Element] = []
    uls: list[Element] = []
    stack = tag.children[::-1]
    while stack:
        node = stack.pop()
        if node.__class__ is not Element:
            continue
        if node.name == "ul":
            uls.append(node)
        if node.attrs.get("class") == _TITLE_TD:
            titles.append(node)
        cs = node.children
        if cs:
            stack.extend(cs[::-1])
    if len(titles) != len(uls):
        return tables
    for title, ul in zip(titles, uls):
        caption = title.text
        rows: list[list[Cell]] = []
        for li in ul.children:
            if not isinstance(li, Element):
                continue
            row: list[Cell] = []
            for span in li.find_all("span"):
                cell = _span_cell(span)
                if cell is not None:
                    row.append(cell)
            rows.append(row)
        if rows:
            tables.append(Table(rows, name=str(caption)))
    return tables


def through_heuristic_rule(tag: Element, tagger: LexiconTagger) -> bool:
    """M5 (tableExtractor.py:166-256): the three heuristic filters. Any
    navigation error rejects the table (the reference's ``@except_output``
    swallows the exception and returns a falsy None)."""
    try:
        return (_rule1(tag) and _rule2(tag)
                and _rule3(tag, tagger))
    except (AttributeError, IndexError, TypeError):
        return False


def _rule1(tag: Element) -> bool:
    """Structurally ≥2 rows and ≥2 cols (tableExtractor.py:173-190) —
    mirrors the reference's bs4 walk: first node, skip caption, skip a
    single-cell row, then check the next row/cell widths."""
    if len(tag.contents) < 2:
        return False
    now = tag.next_element
    if now.name == "caption":
        now = now.next_sibling
    if len(now.contents) == 1:
        now = now.next_sibling
    if len(now.next.contents) >= 2 or len(now.contents) >= 2:
        return True
    return False


def _rule2(tag: Element) -> bool:
    """Not link/script/image-dense (tableExtractor.py:192-228). The
    reference's nested-subtable count is always 0 (its descendant probe never
    matches — tableExtractor.py:202-206), so only the href/script/img density
    tests are live. All six of the reference's traversals are fused into one
    subtree walk (this runs per <table> tag — hot)."""
    n_hrefs = n_scripts = n_imgs = 0
    thead = tbody = ul = None
    stack = tag.children[::-1]
    while stack:
        node = stack.pop()
        if node.__class__ is not Element:
            continue
        name = node.name
        if name == "a":
            if "href" in node.attrs:
                n_hrefs += 1
        elif name == "img":
            n_imgs += 1
        elif name == "script":
            n_scripts += 1
        elif name == "thead":
            if thead is None:
                thead = node
        elif name == "tbody":
            if tbody is None:
                tbody = node
        elif name == "ul":
            if ul is None:
                ul = node
        cs = node.children
        if cs:
            stack.extend(cs[::-1])
    if thead and tbody:
        rows = len(thead.contents) + len(tbody.contents)
        cols = len(thead.next.contents)
    elif ul is not None:
        rows = len(ul.contents) + 1
        cols = len(ul.contents) - 1
    else:
        rows = len(tag.contents)
        now = tag.contents[0]
        if now.name == "caption":
            now = now.next_sibling
        cols = len(now.contents)
    if n_hrefs > rows * cols * 2 or n_scripts > 1 or n_imgs > rows * cols / 2:
        return False
    return True


def _rule3(tag: Element, tagger: LexiconTagger) -> bool:
    """A noun occurs in the first 2 rows (tableExtractor.py:230-254);
    HanLP's ``nature == "n"`` count is replaced by the deterministic lexicon
    tagger (SURVEY.md §7.0)."""
    contents = tag.contents
    if len(contents) < 2:
        return False
    for row in contents[0:2]:
        if row.name == "caption":
            continue
        for cell in row.contents:
            if tagger.has_noun(cell.text):
                return True
    return False


def _node_text(node) -> str:
    if isinstance(node, TextNode):
        return node.data
    if isinstance(node, Element):
        return node.text
    return str(node)


def _node_markup(node) -> str:
    """bs4 ``str(node)`` semantics: NavigableString → its text, Tag → its
    outer-HTML markup."""
    if isinstance(node, TextNode):
        return node.data
    if isinstance(node, Element):
        return node.markup()
    return str(node)


def get_caption(tag: Element) -> str:
    """M6 (tableExtractor.py:453-500): caption = ``<caption>`` (extracted and
    removed from the table) else walk up to 2 previous siblings looking for a
    ``class~'title'`` node or a short (<20 chars) single text child."""
    caption = UNNAMED
    temp = tag.find("caption")
    if temp:
        caption = temp.text
        for c in tag.find_all("caption"):
            c.extract()
        return str(caption)
    prev = tag.previous_sibling
    if prev is None:
        return str(caption)
    title = prev.find(attrs={"class": _TITLE_CLASS}) \
        if isinstance(prev, Element) else None
    if title:
        if len(title.contents) == 2:
            # the reference assigns the RAW node and str()s it at the end
            # (tableExtractor.py:470-471, :500) — a Tag child yields its
            # MARKUP string, not its inner text
            caption = _node_markup(title.contents[1])
        elif len(title.contents) == 1:
            # single-child title returns immediately (tableExtractor.py:476)
            return str(_node_text(title.contents[0]))
    else:
        if len(prev.contents) == 1:
            child = prev.contents[0]
            if isinstance(child, TextNode):
                if 0 < len(child.data) < 20:
                    caption = child.data
            else:
                if 0 < len(child.children) < 20:
                    caption = child.text
    prev2 = prev.previous_sibling
    if prev2 is not None and isinstance(prev2, Element):
        title = prev2.find(attrs={"class": _TITLE_CLASS})
        if title:
            if len(title.contents) == 2:
                caption = _node_markup(title.contents[1])   # see above
            elif len(title.contents) == 1:
                caption = _node_text(title.contents[0])
    return str(caption)


def _cell_from_tag(tag: Element) -> Cell:
    """(table.py:1188-1218 ``changeTag2TableItem``) — hrefs (site-prefixed,
    keyed by raw anchor text), img srcs, spans, cleaned text. Single fused
    subtree walk (this runs once per cell — the hot path)."""
    href: dict[str, str] = {}
    img_src: list[str] = []
    cs = tag.children
    if len(cs) == 1 and cs[0].__class__ is TextNode:
        # fast path: <td>text</td> is 76% of cells on the bench corpus —
        # no subtree to walk, no hrefs/imgs possible
        attrs = tag.attrs
        return Cell(clean_cell_text(cs[0].data),
                    rowspan=int(attrs["rowspan"]) if "rowspan" in attrs else 1,
                    colspan=int(attrs["colspan"]) if "colspan" in attrs else 1,
                    href=href, img=img_src, tag_name=tag.name)
    parts: list[str] = []
    stack = cs[::-1]
    while stack:
        node = stack.pop()
        if node.__class__ is TextNode:
            parts.append(node.data)
            continue
        name = node.name
        if name == "a":
            url = node.attrs.get("href")
            if url is not None:
                href[node.text] = HREF_PREFIX + url
        elif name == "img":
            src = node.attrs.get("src")
            if src is not None:
                img_src.append(src)
        cs = node.children
        if cs:
            stack.extend(cs[::-1])
    rowspan = colspan = 1
    attrs = tag.attrs
    if "rowspan" in attrs:
        rowspan = int(attrs["rowspan"])
    if "colspan" in attrs:
        colspan = int(attrs["colspan"])
    content = clean_cell_text("".join(parts))
    return Cell(content, rowspan=rowspan, colspan=colspan, href=href,
                img=img_src, tag_name=tag.name)


def change_tag_to_table(tag: Element, caption: str = UNNAMED,
                        prefix: str | None = None) -> Table:
    """M7 (table.py:1179-1286): ``<thead>/<tbody>``-aware DOM→Table
    conversion; per cell collects hrefs (site-prefixed), image srcs,
    rowspan/colspan and the tag name."""
    rows: list[list[Cell]] = []
    # first thead + first tbody in ONE document-order subtree walk (bs4
    # find() semantics: first match anywhere in the subtree) — tables
    # without sections paid two full walks
    thead = tbody = None
    stack = tag.children[::-1]
    while stack:
        node = stack.pop()
        if node.__class__ is not Element:
            continue
        if node.name == "thead":
            if thead is None:
                thead = node
        elif node.name == "tbody":
            if tbody is None:
                tbody = node
        if thead is not None and tbody is not None:
            break
        cs = node.children
        if cs:
            stack.extend(cs[::-1])
    if thead and tbody:
        sections = (thead, tbody)
    else:
        sections = (tag,)
    for section in sections:
        for row in section.children:
            if not isinstance(row, Element):
                continue
            cells = [_cell_from_tag(c) for c in row.children
                     if isinstance(c, Element)]
            rows.append(cells)
    table = Table(rows, name=str(caption))
    table.prefix = prefix
    return table
