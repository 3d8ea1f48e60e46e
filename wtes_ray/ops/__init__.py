"""Large-scale training-data operations over Ray Data.

Beyond the reference's operator set (SURVEY.md §2), these are the operations
a 100 TB training-data pipeline needs as first-class components: text
analysis (language id, quality scoring, token counting, fingerprinting),
deduplication (exact, MinHash+LSH, SimHash, char/word n-gram Jaccard,
embedding near-dup — plus streaming first-seen dedup over sharded
shared-index actors, stream.py), similarity search (brute-force, batched
multi-query, LSH-bucketed and IVF-partitioned cosine top-k), multimodal
column plumbing (opaque binary payloads with typed metadata and
actor-pool decode stages), corpus curation (curate.py: deterministic
hash sampling and train/val/test splits, mixtures, per-group quotas,
stratified samples, vocabulary/TF-IDF, posting lists, benchmark
decontamination, token-budget packing, distributed ROW_NUMBER,
exactly-k hash samples, corpus version diffs), graph computation
(graph.py: distributed PageRank), clustering (full-corpus Lloyd's
k-means, SemDeDup semantic dedup, per-label centroids), corpus-level
text signals (Gopher repetition stats, C4 cross-doc n-gram coverage),
exact global quantiles by two-pass range-bucket counting), LM-based
quality filtering (text.py: charset-bounded char-bigram model — the
CCNet shape), context-window chunking and PII redaction (text.py),
embedding compression (similarity.py: product-quantization codebooks),
a bucketed hash join (joins.py) for equi/semi/anti joins whose build
side is too big to broadcast, a Bloom-prefiltered semi join (runtime-
filter pushdown with a constant-size broadcast bitmap), and a global
(non-keyed) as-of join over range buckets.

All stages follow the engine's rules: vectorized map_batches bodies,
actor pools for stateful stages, partial aggregation before any shuffle,
broadcast small sides, deterministic seeds.
"""
