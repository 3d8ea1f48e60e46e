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
