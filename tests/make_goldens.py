"""Regenerate the stored golden outputs (tests/golden/extracted.json).

Run manually after an INTENTIONAL semantics change:
    python tests/make_goldens.py
The goldens are committed so regressions in the shared core are caught even
though oracle and pipeline share code (SURVEY.md §7.3)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wtes_ray.extract import extract_document_safe  # noqa: E402
from wtes_ray.gen import generate_document  # noqa: E402

N_DOCS = 20


def chunked_spans(doc, k=5):
    """Salted-path golden: per-chunk extraction with the pipeline's 2-span
    parse context, group-wise reassembled (captures the chunked code path in
    the golden fingerprint, which also keys the /tmp query caches)."""
    spans = sorted(doc["spans"], key=lambda s: s["offset"])
    basic, tag, tail = [], [], []
    for c in range(0, len(spans), k):
        prefix = [s for s in spans[:c] if s["kind"] == "html"][-2:]
        r = extract_document_safe(doc["doc_id"], prefix + spans[c:c + k],
                                  n_prefix=len(prefix))
        basic += r.basic_spans
        tag += r.tag_spans
        tail += r.tail_media
    seq = basic + tag + tail
    return [[kind, t, m, i] for i, (kind, t, m) in enumerate(seq)]


def build():
    out = []
    for i in range(N_DOCS):
        giant = i in (5, 17)
        doc = generate_document(i, giant=giant)
        r = extract_document_safe(doc["doc_id"], doc["spans"])
        rec = {
            "index": i,
            "giant": giant,
            "doc_id": doc["doc_id"],
            "spans": [list(s) for s in r.spans],
            "entities": r.entities,
            "relations": r.relations,
            "n_tables": r.n_tables,
            "error": r.error,
        }
        if i < 4:
            rec["chunked_spans_k5"] = chunked_spans(doc, k=5)
        out.append(rec)
    return out


if __name__ == "__main__":
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    os.makedirs(golden_dir, exist_ok=True)
    path = os.path.join(golden_dir, "extracted.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(build(), f, ensure_ascii=False, indent=1)
    print(f"wrote {path}")
