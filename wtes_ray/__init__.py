"""wtes_ray — a Ray-Data-native web-table & main-content extraction engine.

From-scratch re-implementation of the extraction *semantics* of
renlongyajin/WebTableExtractionSystem (reference at /root/reference, cited by
file:line throughout) on an idiomatic Ray Data architecture: streaming
Parquet scans (Lance-shaped schema) → zero-copy Arrow ``map_batches`` stages
with actor pools for stateful extraction → explicit doc_id-hash partitioning,
salted-key handling for skewed mega-documents, and per-partition checkpoint
manifests. See SURVEY.md for the blueprint and the operator inventory.
"""

__version__ = "0.1.0"

# Public API (lazy — keep `import wtes_ray` cheap for CLI/worker startup).
__all__ = [
    "extract_document", "extract_document_safe",
    "run_extract_pipeline", "load_extracted", "build_knowledge_graph",
    "entities_dataset", "relations_dataset", "dedup_relations",
    "build_nodes", "Lexicons", "generate_document",
]


def __getattr__(name):
    if name in ("extract_document", "extract_document_safe"):
        from . import extract
        return getattr(extract, name)
    if name in ("run_extract_pipeline", "load_extracted",
                "build_knowledge_graph", "entities_dataset",
                "relations_dataset", "dedup_relations", "build_nodes"):
        from . import pipeline
        return getattr(pipeline, name)
    if name == "Lexicons":
        from .lexicons import Lexicons
        return Lexicons
    if name == "generate_document":
        from .gen import generate_document
        return generate_document
    raise AttributeError(f"module 'wtes_ray' has no attribute {name!r}")
