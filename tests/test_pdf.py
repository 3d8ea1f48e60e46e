"""pdf_io: stdlib PDF writer/reader, layout walk, quarantine, Ray stages."""
import zlib

import pandas as pd
import pyarrow as pa
import pytest

from wtes_ray.pdf_io import (pdf_content_events, pdf_dataset, pdf_text,
                             pdf_to_spans_row, text_to_pdf,
                             write_documents_pdf)


def test_roundtrip_exact_with_escapes_and_pagination():
    t = ("hello world " * 500                 # multi-page
         + "specials (parens) \\backslash\\ \nnewline\ttab\rcr")
    for compress in (True, False):
        assert pdf_text(text_to_pdf(t, compress=compress)) == t
    # page order matters: a shuffled /Kids walk would permute the chunks
    assert pdf_text(text_to_pdf("A" * 80 * 48 + "B" * 10)) \
        == "A" * 80 * 48 + "B" * 10
    assert pdf_text(text_to_pdf("")) == ""
    # deterministic bytes (fixture contract)
    assert text_to_pdf(t) == text_to_pdf(t)


def test_unicode_roundtrips_via_utf16_hex_strings():
    assert pdf_text(text_to_pdf("café £10")) == "café £10"
    # beyond Latin-1 → BOM-tagged UTF-16BE hex strings (§7.9.2.2)
    t = "中文表格：孔子 𝕏 emoji🎈 mixed ascii"
    assert b"<FEFF" in text_to_pdf(t, compress=False)
    assert pdf_text(text_to_pdf(t)) == t


def test_pdf_adapter_feeds_extraction_pipeline():
    """PDF → spans row → the same extractor (the docx adapter pattern):
    a PDF whose text is baike-style table markup extracts real tables,
    line-sliced hex/literal strings notwithstanding (the extractor joins
    html spans before parsing)."""
    from wtes_ray.extract import extract_document_safe
    from wtes_ray.gen import generate_document

    doc = generate_document(5)
    html = "".join(s["text"] for s in doc["spans"] if s["kind"] == "html")
    row = pdf_to_spans_row(text_to_pdf(html), "pdfdoc")
    assert all(s["kind"] == "html" for s in row["spans"])
    res = extract_document_safe(row["doc_id"], row["spans"])
    ref = extract_document_safe("pdfdoc", [
        {"kind": "html", "text": html, "media_ref": "", "offset": 0}])
    assert res.error == "" and res.n_tables >= 1
    # span-for-span equal to extracting the original markup directly
    assert res.basic_spans + res.tag_spans == ref.basic_spans + ref.tag_spans
    assert res.entities_json == ref.entities_json


def test_media_events_and_spans_row_shape():
    pdf = text_to_pdf("abc", n_images=2)
    assert pdf_content_events(pdf) == [
        ("text", "abc"), ("media", "Im0"), ("media", "Im1")]
    row = pdf_to_spans_row(pdf, "d1")
    assert [s["kind"] for s in row["spans"]] == ["html", "media", "media"]
    assert row["spans"][1]["media_ref"] == "pdf://d1#Im0"
    assert [s["offset"] for s in row["spans"]] == [0, 1, 2]


def _raw_pdf(content: bytes, extra_objs: bytes = b"",
             length_token: bytes = None) -> bytes:
    """Hand-built single-page PDF with an UNCOMPRESSED content stream —
    the third-party-shaped fixture (TJ arrays, hex strings, octal escapes,
    indirect /Length) our writer never emits."""
    ltok = length_token or str(len(content)).encode()
    body = (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> "
            b"endobj\n"
            b"4 0 obj << /Length " + ltok + b" >>\nstream\n" + content
            + b"\nendstream endobj\n" + extra_objs
            + b"trailer << /Size 9 /Root 1 0 R >>\n%%EOF\n")
    return body


def test_tj_arrays_hex_strings_octal_escapes():
    content = (b"BT /F1 10 Tf\n"
               b"[(Wor) -120 (ld)] TJ\n"          # TJ: kerning ignored
               b"<48656C6C 6F> Tj\n"              # hex string with spaces
               b"(\\101\\102\\103) Tj\n"          # octal ABC
               b"(a\\\nb) Tj\n"                   # line continuation
               b"ET")
    assert pdf_text(_raw_pdf(content)) == "WorldHelloABCab"


def test_indirect_length_and_nested_kids():
    content = b"BT (X) Tj ET"
    pdf = _raw_pdf(content,
                   extra_objs=b"5 0 obj 12 endobj\n",
                   length_token=b"5 0 R")
    assert pdf_text(pdf) == "X"
    # nested page-tree node: Pages → Pages → Page
    nested = (b"%PDF-1.4\n"
              b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
              b"2 0 obj << /Type /Pages /Kids [6 0 R] /Count 1 >> endobj\n"
              b"6 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
              b"3 0 obj << /Type /Page /Parent 6 0 R /Contents 4 0 R >> "
              b"endobj\n"
              b"4 0 obj << /Length 12 >>\nstream\nBT (Y) Tj ET\nendstream "
              b"endobj\n"
              b"trailer << /Size 9 /Root 1 0 R >>\n%%EOF\n")
    assert pdf_text(nested) == "Y"


def test_stream_bytes_cannot_shadow_real_objects():
    """Stream bodies are jumped over by /Length during the object walk, so
    payload bytes that spell 'N 0 obj ... endobj' (here shadowing the
    pages root, object 2) can neither create phantom objects nor shadow
    real ones — and '/Encrypt N 0 R' inside a stream body must not
    trigger the encryption quarantine (it is checked only in the trailer
    region)."""
    content = b"BT (2 0 obj shadow endobj /Encrypt 9 0 R) Tj (B) Tj ET"
    assert pdf_text(_raw_pdf(content)) \
        == "2 0 obj shadow endobj /Encrypt 9 0 R" + "B"


def test_gates_encrypted_nonpdf_and_filters():
    with pytest.raises(ValueError, match="missing %PDF"):
        pdf_text(b"not a pdf at all")
    enc = text_to_pdf("x").replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(NotImplementedError, match="encrypted"):
        pdf_text(enc)
    lzw = _raw_pdf(b"", b"").replace(
        b"<< /Length 0 >>", b"<< /Filter /LZWDecode /Length 0 >>")
    with pytest.raises(NotImplementedError, match="LZWDecode"):
        pdf_text(lzw)


def test_ray_sink_source_roundtrip_and_quarantine(ray_session, tmp_path):
    import ray.data

    docs = pd.DataFrame({
        "doc_id": [f"doc{i}" for i in range(6)],
        "text": [f"document {i} body " * 30 for i in range(6)]})
    out_dir = str(tmp_path / "pdfs")
    meta = write_documents_pdf(
        ray.data.from_pandas(docs), out_dir).to_pandas()
    assert len(meta) == 6 and meta["file"].str.endswith(".pdf").all()
    # idempotence: rerun rewrites the same content-named files
    files1 = sorted(meta["file"])
    meta2 = write_documents_pdf(
        ray.data.from_pandas(docs), out_dir).to_pandas()
    assert sorted(meta2["file"]) == files1

    # poison one extra file: the source must quarantine, not die
    (tmp_path / "pdfs" / "broken.pdf").write_bytes(b"%PDF-1.4 garbage")
    got = pdf_dataset(out_dir).to_pandas()
    assert len(got) == 7
    bad = got[got["error"] != ""]
    assert len(bad) == 1 and list(bad["spans"].iloc[0]) == []
    ok = got[got["error"] == ""]
    texts = {"".join(s["text"] for s in spans)
             for spans in ok["spans"]}
    assert texts == set(docs["text"])
