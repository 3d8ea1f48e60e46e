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


def build():
    out = []
    for i in range(N_DOCS):
        giant = i in (5, 17)
        doc = generate_document(i, giant=giant)
        r = extract_document_safe(doc["doc_id"], doc["spans"])
        out.append({
            "index": i,
            "giant": giant,
            "doc_id": doc["doc_id"],
            "spans": [list(s) for s in r.spans],
            "entities": r.entities,
            "relations": r.relations,
            "n_tables": r.n_tables,
            "error": r.error,
        })
    return out


if __name__ == "__main__":
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    os.makedirs(golden_dir, exist_ok=True)
    path = os.path.join(golden_dir, "extracted.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(build(), f, ensure_ascii=False, indent=1)
    print(f"wrote {path}")
