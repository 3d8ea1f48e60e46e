"""PDF text+layout source and sink — stdlib-only (zlib + re).

Covers the north rule's "PDF/layout parse" leg of main-content extraction
(BASELINE.json north_rule; the reference repo itself is HTML-only, so this
is engine surface beyond reference parity, like the training-data op set).
No PDF library exists in this container, so a minimal subset of ISO 32000-1
is implemented directly:

- **writer** (:func:`text_to_pdf`): a valid PDF-1.4 — catalog → page tree →
  per-page FlateDecode content streams of Helvetica ``Tj`` lines, optional
  embedded image XObjects invoked with ``Do``, a correct cross-reference
  table. Deterministic bytes for equal input (fixtures + round-trip tests).
  Text is sliced into fixed-width lines at ARBITRARY character boundaries
  (no whitespace semantics), so the reader reconstructs the original text
  by plain concatenation — lossless by construction for arbitrary Unicode
  (Latin-1 lines as literal strings, others as BOM-tagged UTF-16BE hex
  strings per §7.9.2.2).
- **reader** (:func:`pdf_content_events`): trailer ``/Root`` → catalog →
  ``/Pages`` tree walked in ``/Kids`` order (nested page-tree nodes ok) →
  per-page ``/Contents`` (single ref or array) → stream slicing by
  ``/Length`` (indirect lengths resolved; regex fallback) → FlateDecode →
  a linear scan of the content stream emitting ordered events: ``text``
  for ``Tj`` / ``'`` / ``"`` / ``TJ`` (full literal-string syntax — nested
  parens, ``\\``-escapes, octal, line continuations — and hex strings;
  TJ kerning numbers ignored, standard for text extraction) and ``media``
  for ``Do`` of a ``/Subtype /Image`` XObject, in stream order — the
  interleaved text+media shape of the input table.
- **gating**: encrypted PDFs (``/Encrypt``) and non-Flate filters raise
  ``NotImplementedError``; the Ray source stage quarantines such rows with
  an ``error`` column (the multimodal DecodeStub pattern) instead of
  killing the batch.

Ray plumbing: :func:`pdf_to_spans_row` adapts one PDF into the engine's
input-table shape (doc_id, spans with kind html|media) so PDF corpora flow
through the same extraction pipeline as HTML; :func:`pdf_dataset` is the
directory source (``read_binary_files`` → parse per batch);
:func:`write_documents_pdf` is the sink (one content-named PDF per doc,
written inside ``map_batches`` — no driver-side loop, no shuffle).
"""

from __future__ import annotations

import hashlib
import os
import re
import zlib

import pyarrow as pa

# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_ESC = {ord("\\"): b"\\\\", ord("("): b"\\(", ord(")"): b"\\)",
        0x0A: b"\\n", 0x0D: b"\\r", 0x09: b"\\t", 0x08: b"\\b",
        0x0C: b"\\f"}


def _lit(s: str) -> bytes:
    """PDF string for one text line: a literal string for Latin-1 text, a
    BOM-tagged UTF-16BE hex string beyond it (spec-conformant syntax —
    ISO 32000-1 §7.9.2.2 text string type; rendering CJK would need a CID
    font, but extraction round-trips losslessly, which is this module's
    contract)."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        return b"<FEFF" + s.encode("utf-16-be").hex().upper().encode() + b">"
    return b"(" + b"".join(_ESC.get(b, bytes([b])) for b in raw) + b")"


def _stream_obj(dict_extra: bytes, body: bytes, *, compress: bool) -> bytes:
    if compress:
        body = zlib.compress(body)
        filt = b"/Filter /FlateDecode "
    else:
        filt = b""
    return (b"<< " + dict_extra + filt
            + b"/Length " + str(len(body)).encode() + b" >>\nstream\n"
            + body + b"\nendstream")


def text_to_pdf(text: str, *, chars_per_line: int = 80,
                lines_per_page: int = 48, n_images: int = 0,
                compress: bool = True) -> bytes:
    """One document → one PDF. ``n_images`` embeds that many 1×1 grayscale
    image XObjects, invoked with ``Do`` AFTER the first page's text (the
    interleaved-media fixture for the reader's media events)."""
    lines = ([text[i:i + chars_per_line]
              for i in range(0, len(text), chars_per_line)] or [""])
    pages = [lines[i:i + lines_per_page]
             for i in range(0, len(lines), lines_per_page)]

    bodies: dict[int, bytes] = {}          # obj num → body (sans header)
    n_pages = len(pages)
    # 1 catalog, 2 pages root, 3 font; pages at 4..; contents follow; images last
    page_ids = [4 + i for i in range(n_pages)]
    content_ids = [4 + n_pages + i for i in range(n_pages)]
    image_ids = [4 + 2 * n_pages + i for i in range(n_images)]

    bodies[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(f"{p} 0 R".encode() for p in page_ids)
    bodies[2] = (b"<< /Type /Pages /Kids [" + kids + b"] /Count "
                 + str(n_pages).encode() + b" >>")
    bodies[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    xobj = b""
    if n_images:
        entries = b" ".join(f"/Im{i} {oid} 0 R".encode()
                            for i, oid in enumerate(image_ids))
        xobj = b"/XObject << " + entries + b" >> "
    for i, (pid, cid) in enumerate(zip(page_ids, content_ids)):
        res = (b"<< /Font << /F1 3 0 R >> "
               + (xobj if i == 0 else b"") + b">>")
        bodies[pid] = (b"<< /Type /Page /Parent 2 0 R "
                       b"/MediaBox [0 0 612 792] /Resources " + res
                       + b" /Contents " + str(cid).encode() + b" 0 R >>")
        ops = [b"BT /F1 10 Tf 36 806 Td 14 TL"]
        ops += [_lit(ln) + b" Tj T*" for ln in pages[i]]
        ops.append(b"ET")
        if i == 0:
            for k in range(n_images):
                ops.append(b"q 10 0 0 10 36 40 cm /Im%d Do Q" % k)
        bodies[cid] = _stream_obj(b"", b"\n".join(ops), compress=compress)
    for k, oid in enumerate(image_ids):
        bodies[oid] = _stream_obj(
            b"/Type /XObject /Subtype /Image /Width 1 /Height 1 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 ",
            bytes([k % 256]), compress=False)

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(bodies):
        offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + bodies[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(bodies) + 1
    out += b"xref\n0 " + str(n_objs).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size " + str(n_objs).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

_OBJ_HDR = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_REF = re.compile(rb"(\d+)\s+\d+\s+R\b")
_INT = re.compile(rb"^\s*(\d+)")


class _Obj:
    __slots__ = ("dict_bytes", "stream")

    def __init__(self, dict_bytes: bytes, stream: bytes | None):
        self.dict_bytes, self.stream = dict_bytes, stream


def _index_objects(data: bytes) -> dict[int, _Obj]:
    """Indirect-object index via a SEQUENTIAL walk: after each object, the
    cursor jumps past its stream body (sliced by /Length), so binary
    stream bytes that happen to spell ``N 0 obj`` can never create
    phantom objects or shadow real ones. Indirect /Length values resolve
    through bare-integer objects (deferred slice when the integer object
    appears later in the file); a missing/unresolvable length falls back
    to the next ``endstream``."""
    objs: dict[int, _Obj] = {}
    ints: dict[int, int] = {}
    deferred: list[tuple[int, int, int]] = []  # (num, body_at, len_ref)
    i = 0
    while True:
        m = _OBJ_HDR.search(data, i)
        if not m:
            break
        num, start = int(m.group(1)), m.end()
        sp = data.find(b"stream", start)
        ep = data.find(b"endobj", start)
        if ep == -1:
            break
        if sp == -1 or ep < sp:                  # plain object
            body = data[start:ep].strip()
            objs[num] = _Obj(body, None)
            mi = _INT.match(body)
            if mi and mi.group(1) == body:       # bare integer object
                ints[num] = int(mi.group(1))
            i = ep + len(b"endobj")
            continue
        head = data[start:sp]
        body_at = sp + len(b"stream")
        if data[body_at:body_at + 2] == b"\r\n":
            body_at += 2
        elif data[body_at:body_at + 1] == b"\n":
            body_at += 1
        length = None
        len_ref = None
        ml = re.search(rb"/Length\s+(\d+)(\s+\d+\s+R)?", head)
        if ml:
            if ml.group(2):
                len_ref = int(ml.group(1))
                length = ints.get(len_ref)
            else:
                length = int(ml.group(1))
        if length is None:
            end = data.find(b"endstream", body_at)
            end = len(data) if end == -1 else end
            objs[num] = _Obj(head, data[body_at:end].rstrip(b"\r\n"))
            if len_ref is not None:              # re-slice once resolvable
                deferred.append((num, body_at, len_ref))
            i = end
        else:
            objs[num] = _Obj(head, data[body_at:body_at + length])
            i = body_at + length
    for num, body_at, len_ref in deferred:
        if len_ref in ints:
            objs[num] = _Obj(objs[num].dict_bytes,
                             data[body_at:body_at + ints[len_ref]])
    return objs


def _decode_stream(obj: _Obj) -> bytes:
    mf = re.search(rb"/Filter\s*(/(\w+)|\[([^\]]*)\])", obj.dict_bytes)
    if not mf:
        return obj.stream or b""
    names = ([mf.group(2)] if mf.group(2)
             else re.findall(rb"/(\w+)", mf.group(3) or b""))
    if names == [b"FlateDecode"]:
        return zlib.decompress(obj.stream or b"")
    raise NotImplementedError(
        f"unsupported PDF stream filter(s): {[n.decode() for n in names]}")


def _parse_literal(s: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ( ... ) literal starting at s[i] == '(' — nested parens,
    all spec escapes, octal codes, escaped-EOL line continuations."""
    assert s[i:i + 1] == b"("
    out = bytearray()
    depth, i = 1, i + 1
    esc = {ord("n"): 0x0A, ord("r"): 0x0D, ord("t"): 0x09,
           ord("b"): 0x08, ord("f"): 0x0C}
    while i < len(s) and depth:
        c = s[i]
        if c == 0x5C:                            # backslash
            nxt = s[i + 1] if i + 1 < len(s) else 0
            if nxt in esc:
                out.append(esc[nxt]); i += 2
            elif nxt in (0x28, 0x29, 0x5C):      # \( \) \\
                out.append(nxt); i += 2
            elif 0x30 <= nxt <= 0x37:            # octal, 1-3 digits
                j = i + 1
                while j < min(i + 4, len(s)) and 0x30 <= s[j] <= 0x37:
                    j += 1
                out.append(int(s[i + 1:j], 8) & 0xFF)
                i = j
            elif nxt in (0x0A, 0x0D):            # line continuation
                i += 2
                if nxt == 0x0D and s[i:i + 1] == b"\n":
                    i += 1
            else:                                # lone backslash: dropped
                i += 1
        elif c == 0x28:
            depth += 1; out.append(c); i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c); i += 1
    return bytes(out), i


_OP = re.compile(rb"[A-Za-z'\"*]+")
_NAME = re.compile(rb"/([^\s/\[\]()<>{}%]+)")


def _dec(raw: bytes) -> str:
    """PDF text-string bytes → str: UTF-16BE when BOM-tagged (§7.9.2.2),
    byte-per-char (Latin-1) otherwise."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


def _scan_content(stream: bytes, image_names: set[bytes]):
    """Linear scan → ordered ('text', str) / ('media', name) events."""
    events: list[tuple[str, str]] = []
    last_str: str | None = None
    arr: list[str] | None = None
    pend_arr: list[str] = []
    last_name: bytes | None = None
    i, n = 0, len(stream)
    while i < n:
        c = stream[i:i + 1]
        if c == b"(":
            raw, i = _parse_literal(stream, i)
            if arr is not None:
                arr.append(_dec(raw))
            else:
                last_str = _dec(raw)
        elif c == b"<":
            if stream[i:i + 2] == b"<<":
                i += 2
            else:
                j = stream.find(b">", i)
                j = n if j == -1 else j
                hx = re.sub(rb"\s", b"", stream[i + 1:j])
                if len(hx) % 2:
                    hx += b"0"
                s = _dec(bytes.fromhex(hx.decode("ascii", "ignore")))
                if arr is not None:
                    arr.append(s)
                else:
                    last_str = s
                i = j + 1
        elif c == b"[":
            arr = []; i += 1
        elif c == b"]":
            pend_arr, arr = (arr if arr is not None else []), None
            i += 1
        elif c == b"/":
            m = _NAME.match(stream, i)
            last_name = m.group(1) if m else None
            i = m.end() if m else i + 1
        elif c == b"%":                          # comment to EOL
            j = stream.find(b"\n", i)
            i = n if j == -1 else j + 1
        else:
            m = _OP.match(stream, i)
            if m:
                op = m.group(0)
                if op in (b"Tj", b"'", b'"') and last_str is not None:
                    events.append(("text", last_str))
                elif op == b"TJ":
                    events.append(("text", "".join(pend_arr)))
                elif op == b"Do" and last_name in image_names:
                    events.append(("media", last_name.decode("latin-1")))
                i = m.end()
            else:
                i += 1
    return events


def _kids(objs: dict[int, _Obj], node: int, out: list[int],
          depth: int = 0) -> None:
    if depth > 64:                               # cyclic page tree guard
        raise ValueError("page tree too deep / cyclic")
    if node not in objs:
        raise ValueError(f"dangling page-tree ref: {node} 0 R")
    d = objs[node].dict_bytes
    mk = re.search(rb"/Kids\s*\[([^\]]*)\]", d)
    if mk:
        for r in _REF.finditer(mk.group(1)):
            _kids(objs, int(r.group(1)), out, depth + 1)
    else:
        out.append(node)


def pdf_content_events(data: bytes) -> list[tuple[str, str]]:
    """Ordered ('text', s) / ('media', xobject-name) events for the whole
    document, pages in /Kids order. Raises ``NotImplementedError`` for
    encrypted files or unsupported filters, ``ValueError`` for files this
    subset cannot navigate — the Ray stage maps both to quarantine."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    # /Encrypt lives in the trailer dict; checking only from the last
    # `trailer` keyword (tail fallback for xref-stream files) keeps stream
    # bytes that spell "/Encrypt N 0 R" from triggering a false quarantine
    ti = data.rfind(b"trailer")
    enc_region = data[ti:] if ti != -1 else data[-2048:]
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", enc_region):
        raise NotImplementedError("encrypted PDF")
    objs = _index_objects(data)
    mroot = None
    for mroot in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", data):
        pass                                     # last trailer wins
    if mroot is None:
        raise ValueError("no /Root in trailer")
    cat = objs.get(int(mroot.group(1)))
    mp = cat and re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", cat.dict_bytes)
    if not mp:
        raise ValueError("catalog has no /Pages")
    pages: list[int] = []
    _kids(objs, int(mp.group(1)), pages)

    events: list[tuple[str, str]] = []
    for pg in pages:
        d = objs[pg].dict_bytes
        # image XObjects visible to this page (inline /Resources or ref)
        res = d
        mr = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", d)
        if mr and int(mr.group(1)) in objs:
            res = objs[int(mr.group(1))].dict_bytes
        image_names: set[bytes] = set()
        mx = re.search(rb"/XObject\s*<<(.*?)>>", res, re.S)
        if mx:
            for mn in re.finditer(rb"/([^\s/]+)\s+(\d+)\s+\d+\s+R",
                                  mx.group(1)):
                tgt = objs.get(int(mn.group(2)))
                if tgt is not None and b"/Image" in tgt.dict_bytes:
                    image_names.add(mn.group(1))
        mc = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", d)
        if not mc:
            continue
        content = b"\n".join(
            _decode_stream(objs[int(r.group(1))])
            for r in _REF.finditer(mc.group(1)) if int(r.group(1)) in objs)
        events.extend(_scan_content(content, image_names))
    return events


def pdf_text(data: bytes) -> str:
    """Concatenated text events — exact inverse of :func:`text_to_pdf`."""
    return "".join(t for k, t in pdf_content_events(data) if k == "text")


# ---------------------------------------------------------------------------
# Ray plumbing: input-table adapter, source, sink
# ---------------------------------------------------------------------------

def pdf_to_spans_row(data: bytes, doc_id: str) -> dict:
    """One PDF → one input-table row (doc_id, spans): text events become
    kind="html" spans (plain text is trivial markup — the docx adapter
    pattern), image Do events become kind="media" spans, in stream order."""
    spans = []
    for off, (kind, val) in enumerate(pdf_content_events(data)):
        if kind == "text":
            spans.append({"kind": "html", "text": val, "media_ref": "",
                          "offset": off})
        else:
            spans.append({"kind": "media", "text": "",
                          "media_ref": f"pdf://{doc_id}#{val}",
                          "offset": off})
    return {"doc_id": doc_id, "spans": spans}


def pdf_dataset(paths: str | list[str]):
    """Directory/file-list source: read_binary_files → per-batch parse →
    (doc_id, spans, error) rows. Unparseable/encrypted PDFs quarantine with
    the error message and empty spans — never a dead batch."""
    import ray.data

    from .schema import SPAN_STRUCT

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        ids, spans, errs = [], [], []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            doc_id = os.path.splitext(os.path.basename(path))[0]
            ids.append(doc_id)
            try:
                spans.append(pdf_to_spans_row(data, doc_id)["spans"])
                errs.append("")
            except (NotImplementedError, ValueError, zlib.error) as e:
                spans.append([])
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
            "error": pa.array(errs, pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


def write_documents_pdf(ds, out_dir: str):
    """Sink: one PDF per (doc_id, text) row, written INSIDE map_batches
    (no driver loop, no shuffle). File names are content-derived
    (sha1(doc_id)) so task retries rewrite identical files — the shard
    writer's idempotence rule. Returns per-batch metadata rows."""
    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        names = []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            name = hashlib.sha1(str(doc_id).encode()).hexdigest()[:16]
            tmp = os.path.join(out_dir, f".tmp-{name}-{os.getpid()}")
            with open(tmp, "wb") as f:
                f.write(text_to_pdf(text or ""))
            os.replace(tmp, os.path.join(out_dir, f"{name}.pdf"))
            names.append(f"{name}.pdf")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "file": pa.array(names, pa.string())})

    return ds.map_batches(write, batch_format="pyarrow")
