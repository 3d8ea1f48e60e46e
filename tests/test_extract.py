"""Per-document extraction tests + stored goldens (wtes_ray.extract)."""
import json
import os

from wtes_ray.extract import extract_document_safe, subject_from_doc_id
from wtes_ray.gen import generate_document

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extracted.json")


def test_subject_from_doc_id():
    assert subject_from_doc_id(
        "https://baike.baidu.com/item/%E5%AD%94%E5%AD%90/1584") == "孔子"
    assert subject_from_doc_id(
        "https://baike.baidu.com/item/%E7%9E%BF%E9%A2%96") == "瞿颖"


def test_golden_span_sequences():
    """The north rule's per-row invariant: strict (kind, text, media_ref,
    order) span-sequence equality against the stored goldens."""
    with open(GOLDEN, encoding="utf-8") as f:
        goldens = json.load(f)
    assert len(goldens) == 20
    for g in goldens:
        doc = generate_document(g["index"], giant=g["giant"])
        assert doc["doc_id"] == g["doc_id"]
        r = extract_document_safe(doc["doc_id"], doc["spans"])
        assert [list(s) for s in r.spans] == g["spans"], \
            f"span mismatch doc {g['index']}"
        assert r.entities == g["entities"], f"entity mismatch doc {g['index']}"
        assert r.relations == g["relations"], f"rel mismatch doc {g['index']}"
        assert r.n_tables == g["n_tables"]
        assert r.error == g["error"] == ""
        if "chunked_spans_k5" in g:
            from tests.make_goldens import chunked_spans
            assert chunked_spans(doc, k=5) == g["chunked_spans_k5"], \
                f"chunked span mismatch doc {g['index']}"


def test_chunked_equals_whole():
    """Salted-split invariant: group-wise concatenation of per-chunk results
    (each chunk carrying ≤2 preceding html spans as parse-only context, like
    the pipeline's split stage) equals the whole-document extraction —
    including caption lookups that cross chunk boundaries."""
    for i in (0, 2, 5, 9, 13):
        for k in (3, 5, 7):
            doc = generate_document(i, giant=(i == 5))
            spans = sorted(doc["spans"], key=lambda s: s["offset"])
            whole = extract_document_safe(doc["doc_id"], spans)
            basic, tag, tail = [], [], []
            ents_b, ents_t, rels_b, rels_t = [], [], [], []
            for c in range(0, len(spans), k):
                prefix = [s for s in spans[:c] if s["kind"] == "html"][-2:]
                r = extract_document_safe(doc["doc_id"],
                                          prefix + spans[c:c + k],
                                          n_prefix=len(prefix))
                assert r.error == ""
                basic += r.basic_spans
                tag += r.tag_spans
                tail += r.tail_media
                ents_b += r.basic_entities
                ents_t += r.tag_entities
                rels_b += r.basic_relations
                rels_t += r.tag_relations
            assert basic + tag + tail == \
                whole.content_spans + whole.tail_media, f"doc {i} k={k}"
            assert ents_b + ents_t == whole.entities, f"doc {i} k={k}"
            assert rels_b + rels_t == whole.relations, f"doc {i} k={k}"


def test_quarantine_on_bad_input():
    r = extract_document_safe("u", [{"kind": "html", "text": None,
                                     "media_ref": "", "offset": 0}])
    assert r.error != ""
    assert r.spans == []


def test_media_only_doc():
    r = extract_document_safe(
        "https://x/item/a/1",
        [{"kind": "media", "text": "", "media_ref": "img://1", "offset": 0}])
    assert r.spans == [("media", "", "img://1", 0)]
    assert r.error == ""
