"""S10/S11/S12/S13: docx table source/sink (stdlib OOXML), Tag→HTML debug
sink, ER chart data/report."""

import json
import os
import zipfile

import pytest

from wtes_ray.docx_io import (docx_to_spans_row, read_docx_tables,
                              table_to_html, write_table_docx)
from wtes_ray.report import er_to_chart, write_er_chart_html, write_tag_to_html
from wtes_ray.tablemodel import Cell, Table


def _sample_table():
    return Table([[Cell("姓名"), Cell("年龄", colspan=2)],
                  [Cell("张三", rowspan=2), Cell("30"), Cell("x")],
                  [Cell("31"), Cell("y")]], name="人物表")


def test_docx_roundtrip_with_merges(tmp_path):
    """Write → read: caption row, gridSpan/vMerge expansion identical to
    python-docx row.cells (merged cell text repeats per grid slot —
    reference changeWordTable2Table consumes exactly that view)."""
    path = str(tmp_path / "t.docx")
    write_table_docx(_sample_table(), path)
    tables = read_docx_tables(path)
    assert len(tables) == 1
    t = tables[0]
    assert t.name == "人物表"
    grid = [[c.content for c in row] for row in t.rows]
    assert grid == [["姓名", "年龄", "年龄"],
                    ["张三", "30", "x"],
                    ["张三", "31", "y"]]
    assert all(c.rowspan == 1 and c.colspan == 1
               for row in t.rows for c in row)


def test_docx_append_like_reference(tmp_path):
    """writeTable2Doc appends to an existing document (table.py:615-618)."""
    path = str(tmp_path / "t.docx")
    write_table_docx(_sample_table(), path)
    write_table_docx(Table([[Cell("a"), Cell("b")]], name=None), path)
    tables = read_docx_tables(path)
    assert len(tables) == 2
    # unnamed tables get the reference's 未命名表格 caption (table.py:635)
    assert tables[1].name == "未命名表格"
    assert [[c.content for c in r] for r in tables[1].rows] == [["a", "b"]]


def test_docx_is_valid_zip_package(tmp_path):
    path = str(tmp_path / "t.docx")
    write_table_docx(_sample_table(), path)
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
    assert {"[Content_Types].xml", "_rels/.rels",
            "word/document.xml"} <= names


def test_docx_adapter_feeds_extraction_pipeline(tmp_path):
    """S12 end-to-end: .docx tables → spans row → the same extractor."""
    from wtes_ray.extract import extract_document_safe
    path = str(tmp_path / "t.docx")
    write_table_docx(_sample_table(), path)
    row = docx_to_spans_row(path, doc_id="worddoc")
    assert row["doc_id"] == "worddoc"
    assert len(row["spans"]) == 1
    assert row["spans"][0]["kind"] == "html"
    res = extract_document_safe(row["doc_id"], row["spans"])
    assert res.error == ""
    assert res.n_tables >= 1


def test_table_to_html_preserves_spans():
    html_s = table_to_html(_sample_table())
    assert 'rowspan="2"' in html_s and 'colspan="2"' in html_s
    assert "<caption>人物表</caption>" in html_s


def test_write_tag_to_html_uses_reference_shell(tmp_path):
    from wtes_ray.dom import parse_html
    node = parse_html("<div><tr><td>a</td></tr></div>").find("tr")
    path = str(tmp_path / "debug.html")
    write_tag_to_html(path, node)
    out = open(path, encoding="utf-8").read()
    assert out.startswith("<!DOCTYPE html>")
    assert '<table data-sort="sortDisabled" log-set-param="table_view">' in out
    assert "<tr><td>a</td></tr>" in out


def test_er_chart_dedup_semantics(tmp_path):
    """writeER2Chart: url-seen and name-seen entities are skipped; props
    dump as key:value lines (tableExtractor.py:559-584)."""
    entities = [
        [["张三", "http://a"], {"字": "子房"}],
        [["张三", "http://b"], {}],          # duplicate name → skipped
        [["李四", "http://a"], {}],          # duplicate url → skipped
        [["王五", ""], {"号": "某"}],         # empty url never dedups
    ]
    relations = [[["张三", "http://a"], "友", ["王五", ""]]]
    data = er_to_chart(entities, relations)
    assert [n["name"] for n in data["nodes"]] == ["张三", "王五"]
    assert data["nodes"][0]["value"] == ["字:子房\n"]
    assert data["links"] == [{"source": "张三", "target": "王五",
                              "value": "友"}]

    path = str(tmp_path / "er.html")
    page_data = write_er_chart_html(entities, relations, path, title="测试")
    assert page_data == data
    out = open(path, encoding="utf-8").read()
    assert "张三" in out and "er-data" in out
    embedded = json.loads(
        out.split("id='er-data'>")[1].split("</script>")[0])
    assert embedded == data


def test_graph_report_over_knowledge_graph(ray_session, tmp_path):
    """S13 batch analog: report aggregates over the kg parquet."""
    from wtes_ray.gen import write_documents
    from wtes_ray.pipeline import build_knowledge_graph
    from wtes_ray.report import graph_report

    docs = str(tmp_path / "docs.parquet")
    write_documents(docs, 12)
    out = str(tmp_path / "kg")
    summary = build_knowledge_graph(docs, out, num_partitions=4)
    rep = graph_report(out, top_k=5)
    assert rep["n_nodes"] == summary["n_nodes"] > 0
    assert rep["n_edges"] == summary["n_edges"] > 0
    assert sum(rep["relation_histogram"].values()) == rep["n_edges"]
    assert 0 < len(rep["top_degree"]) <= 5
    degrees = [d for _, d in rep["top_degree"]]
    assert degrees == sorted(degrees, reverse=True)


def test_docx_append_preserves_foreign_parts(tmp_path):
    """Appending must not destroy other package parts (styles, images,
    document rels) of an externally-produced .docx."""
    path = str(tmp_path / "ext.docx")
    write_table_docx(_sample_table(), path)
    # simulate a Word-produced package with extra parts
    with zipfile.ZipFile(path) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    parts["word/styles.xml"] = b"<styles/>"
    parts["word/media/image1.png"] = b"\x89PNGfake"
    parts["word/_rels/document.xml.rels"] = b"<Relationships/>"
    with zipfile.ZipFile(path, "w") as z:
        for n, b in parts.items():
            z.writestr(n, b)
    write_table_docx(Table([[Cell("x")]], name="追加"), path)
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {"word/styles.xml", "word/media/image1.png",
                "word/_rels/document.xml.rels"} <= names
        assert z.read("word/media/image1.png") == b"\x89PNGfake"
    assert len(read_docx_tables(path)) == 2


def test_docx_nested_table_text_stays_out_of_parent_cell(tmp_path):
    """python-docx _Cell.text lists only DIRECT paragraphs — a nested
    table's text must not leak into the parent cell."""
    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W}"><w:body><w:tbl>'
        "<w:tr><w:tc><w:p><w:r><w:t>标题</w:t></w:r></w:p></w:tc></w:tr>"
        "<w:tr><w:tc><w:p><w:r><w:t>outer</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl></w:tc></w:tr>"
        "</w:tbl></w:body></w:document>")
    path = str(tmp_path / "nested.docx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("word/document.xml", doc)
    tables = read_docx_tables(path)
    assert len(tables) == 1
    assert [[c.content for c in r] for r in tables[0].rows] == [["outer"]]


def test_markup_reescapes_entities():
    """bs4 str(tag) re-escapes what the parser unescaped."""
    from wtes_ray.dom import parse_html
    el = parse_html('<div><span class="x" title="a&quot;b">A &amp; B '
                    "&lt;b&gt;</span></div>").find("span")
    assert el.markup() == ('<span class="x" title="a&quot;b">'
                           "A &amp; B &lt;b&gt;</span>")
