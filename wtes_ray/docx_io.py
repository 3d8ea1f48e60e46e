"""S11/S12: .docx table source and sink — stdlib-only (zipfile + ElementTree).

The reference uses python-docx (tableExtractor.py:503-516 ``extractWordTable``
→ table.py:1289-1310 ``changeWordTable2Table``; table.py:609-647
``writeTable2Doc``); that library is absent here, but a .docx file is a zip
of OOXML parts, so the table layer is implemented directly:

  - **source** (:func:`read_docx_tables`): top-level ``w:tbl`` elements of
    ``word/document.xml``, expanded to a dense grid exactly the way
    python-docx's ``row.cells`` does — ``w:gridSpan`` repeats a cell
    horizontally, ``w:vMerge`` (continue) repeats the restart cell
    vertically. Reference semantics on top (changeWordTable2Table): the
    FIRST row's first cell is the table caption, data rows start at row 1,
    every cell becomes a span-1 Cell (merges arrive pre-expanded).
  - **sink** (:func:`write_table_docx`): the reference's layout — a
    (rows+1) × cols "Table Grid" table whose first row is one cell merged
    across all columns holding the caption (未命名表格 when unnamed),
    data cells at their absolute positions with real gridSpan/vMerge
    merges; appends to an existing document like ``Document(filepath)``.

Batch form for the engine: :func:`docx_tables_to_batch` adapts a .docx into
(doc_id, spans) rows so Word corpora flow through the same Ray extraction
pipeline as HTML (each table re-serialized as an html span).
"""

from __future__ import annotations

import os
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from .tablemodel import UNNAMED, Cell, Table

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _t(name: str) -> str:
    return f"{{{_W}}}{name}"


# ---------------------------------------------------------------------------
# source
# ---------------------------------------------------------------------------

def _cell_text(tc: ET.Element) -> str:
    """python-docx ``_Cell.text``: the cell's DIRECT paragraphs joined by
    newline, runs concatenated — a nested table inside the cell does NOT
    leak its text into the parent cell (matches python-docx, whose
    ``_Cell.paragraphs`` lists only child ``w:p`` elements)."""
    paras = []
    for p in tc.findall(_t("p")):
        paras.append("".join(t.text or "" for t in p.iter(_t("t"))))
    return "\n".join(paras)


def _expand_grid(tbl: ET.Element) -> list[list[str]]:
    """Dense text grid with gridSpan/vMerge expansion (python-docx
    ``row.cells`` view)."""
    grid: list[list[str]] = []
    for tr in tbl.findall(_t("tr")):
        row: list[str] = []
        prev = grid[-1] if grid else []
        for tc in tr.findall(_t("tc")):
            tc_pr = tc.find(_t("tcPr"))
            span, vmerge = 1, None
            if tc_pr is not None:
                gs = tc_pr.find(_t("gridSpan"))
                if gs is not None:
                    span = int(gs.get(_t("val"), "1"))
                vm = tc_pr.find(_t("vMerge"))
                if vm is not None:
                    vmerge = vm.get(_t("val"), "continue")
            if vmerge == "continue":
                # repeat the cell above (same grid column)
                text = prev[len(row)] if len(row) < len(prev) else ""
            else:
                text = _cell_text(tc)
            row.extend([text] * span)
        grid.append(row)
    return grid


def read_docx_tables(path: str) -> list[Table]:
    """S12 (extractWordTable + changeWordTable2Table): every top-level table
    of the document, first row's first cell as caption, data rows from row 1,
    all cells span-1."""
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    body = root.find(_t("body"))
    tables = []
    for tbl in ([] if body is None else body.findall(_t("tbl"))):
        grid = _expand_grid(tbl)
        if not grid:
            continue
        caption = str(grid[0][0]) if grid[0] else UNNAMED
        rows = [[Cell(text, 1, 1) for text in r] for r in grid[1:]]
        tables.append(Table(rows, name=caption))
    return tables


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
    'package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>")

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    "</Relationships>")

_DOC_SHELL = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<w:document xmlns:w="{_W}"><w:body></w:body></w:document>')


def _tc_xml(text: str | None, span: int, vmerge: str | None) -> str:
    pr = ""
    if span > 1 or vmerge:
        pr = "<w:tcPr>"
        if span > 1:
            pr += f'<w:gridSpan w:val="{span}"/>'
        if vmerge == "restart":
            pr += '<w:vMerge w:val="restart"/>'
        elif vmerge == "continue":
            pr += "<w:vMerge/>"
        pr += "</w:tcPr>"
    body = ("<w:p/>" if not text else
            f'<w:p><w:r><w:t xml:space="preserve">{escape(text)}</w:t>'
            "</w:r></w:p>")
    return f"<w:tc>{pr}{body}</w:tc>"


def _table_xml(table: Table) -> str:
    """writeTable2Doc layout: caption row merged across all columns, data
    cells at absolute positions with real merges."""
    n_cols = max(table.col_number, 1)
    caption = (UNNAMED if table.name is None or table.name == "None"
               else str(table.name))
    # absolute-position occupancy grid (same walk as Table.extend_table)
    n_rows = len(table.rows)
    grid: list[list[tuple | None]] = [[None] * n_cols for _ in range(n_rows)]
    for i, row in enumerate(table.rows):
        j = 0
        for cell in row:
            while j < n_cols and grid[i][j] is not None:
                j += 1
            if j >= n_cols:
                break
            rs = min(cell.rowspan, n_rows - i)
            cs = min(cell.colspan, n_cols - j)
            for di in range(rs):
                for dj in range(cs):
                    grid[i + di][j + dj] = (cell, di == 0, dj == 0, cs)
            j += cs
    parts = ['<w:tbl><w:tblPr><w:tblStyle w:val="TableGrid"/></w:tblPr>',
             "<w:tr>", _tc_xml(caption, n_cols, None), "</w:tr>"]
    for i in range(n_rows):
        parts.append("<w:tr>")
        j = 0
        while j < n_cols:
            slot = grid[i][j]
            if slot is None:
                parts.append(_tc_xml("", 1, None))
                j += 1
                continue
            cell, top, left, cs = slot
            if not left:       # horizontally covered — gridSpan emitted it
                j += 1
                continue
            if top:
                vm = "restart" if cell.rowspan > 1 else None
                parts.append(_tc_xml(cell.content, cs, vm))
            else:
                parts.append(_tc_xml(None, cs, "continue"))
            j += cs
        parts.append("</w:tr>")
    parts.append("</w:tbl><w:p/>")
    return "".join(parts)


def write_table_docx(table: Table, filepath: str) -> None:
    """S11 (table.py:609-647 ``writeTable2Doc``): append the table (plus a
    trailing paragraph, as the reference does) to ``filepath``, creating a
    minimal valid .docx when absent. Appending PRESERVES every other part
    of an existing package (styles, images, relationship parts) — only
    ``word/document.xml`` is rewritten, like python-docx's
    ``Document(filepath)`` round-trip."""
    existing: dict[str, bytes] = {}
    if os.path.exists(filepath):
        with zipfile.ZipFile(filepath) as z:
            for name in z.namelist():
                existing[name] = z.read(name)
        doc = existing["word/document.xml"].decode("utf-8")
    else:
        doc = _DOC_SHELL
    tbl = _table_xml(table)
    # insert before the body-level sectPr — always the LAST sectPr in
    # document order (OOXML keeps the final section's properties as the
    # body's last child; earlier w:pPr/w:sectPr section breaks must not
    # capture the insert, which would nest the table inside a paragraph)
    ms = list(re.finditer(r"<w:sectPr[\s/>]", doc))
    insert_at = ms[-1].start() if ms else doc.rindex("</w:body>")
    doc = doc[:insert_at] + tbl + doc[insert_at:]
    parts = dict(existing) if existing else {
        "[Content_Types].xml": _CONTENT_TYPES.encode("utf-8"),
        "_rels/.rels": _RELS.encode("utf-8")}
    parts["word/document.xml"] = doc.encode("utf-8")
    tmp = f"{filepath}.tmp-{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for name, blob in parts.items():
            z.writestr(name, blob)
    os.replace(tmp, filepath)


# ---------------------------------------------------------------------------
# engine adapter
# ---------------------------------------------------------------------------

def table_to_html(table: Table) -> str:
    """Serialize a Table back to minimal HTML (used by the docx→pipeline
    adapter and the S10 debug sink)."""
    rows = []
    for row in table.rows:
        tds = []
        for c in row:
            attrs = ""
            if c.rowspan > 1:
                attrs += f' rowspan="{c.rowspan}"'
            if c.colspan > 1:
                attrs += f' colspan="{c.colspan}"'
            tds.append(f"<td{attrs}>{escape(c.content)}</td>")
        rows.append("<tr>" + "".join(tds) + "</tr>")
    cap = (f"<caption>{escape(str(table.name))}</caption>"
           if table.name and table.name != UNNAMED else "")
    return f"<table>{cap}{''.join(rows)}</table>"


def docx_to_spans_row(path: str, doc_id: str | None = None) -> dict:
    """Adapt one .docx into an interleaved-document row (doc_id, spans):
    each table becomes an html span, so Word corpora run through the SAME
    Ray extraction pipeline as web pages."""
    spans = [{"kind": "html", "text": table_to_html(t), "media_ref": "",
              "offset": i}
             for i, t in enumerate(read_docx_tables(path))]
    return {"doc_id": doc_id or os.path.basename(path), "spans": spans}
