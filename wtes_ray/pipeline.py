"""The Ray Data extraction pipeline.

Physical plan (SURVEY.md §7.2, re-expressing tableExtractor.py's queue-polling
threads as a streaming Dataset pipeline):

    read_parquet(documents)                # Lance-shaped input table
      → map_batches(split_and_key)         # stateless: doc_id-hash part key +
                                           # salted mega-doc split
      → map_batches(extract_chunks_batch)  # extraction tasks; state cached
                                           # per worker (ExtractChunks actor
                                           # pool available for heavy state)
      → map_batches(write_shards)          # SHUFFLE-FREE partitioned write:
                                           # part=NNNNN/shard-<hash>.parquet,
                                           # singles and salted-chunk rows in
                                           # separate files
      → shard metadata (tiny rows) → driver commits per-partition manifests

Scale posture (full analysis: SCALING.md):
  - NO all-to-all exchange anywhere in the extraction path — the resumable
    partitioned layout is produced by direct shard writes with
    content-deterministic names; P (``num_partitions``) controls resume
    granularity, chosen ≈ 4-8× total cores at cluster scale;
  - skewed mega-documents are salted at the split stage: their spans become
    independent chunk rows that extract in parallel; re-stitching happens at
    READ time (`load_extracted`) over only the rare ``n_chunks>1`` rows,
    written to dedicated ``*-chunks.parquet`` files;
  - resume: completed partitions (manifest present) are dropped at the split
    stage before any extraction work; orphan shards of incomplete partitions
    are swept first; retried tasks rewrite byte-identical shard files;
  - downstream triple stages (dedup, fusion) read the checkpoint back instead
    of re-executing extraction (Datasets are single-consumer; the checkpoint
    doubles as the branch point).

Downstream wide ops:
  - relation dedup (D6): per-batch pre-dedup then global groupby on the
    5-tuple — the partial combine keeps the shuffle small;
  - entity fusion (J1/A3): groupby(subject) + the pure group-local fusion in
    :mod:`wtes_ray.fusion`.
"""

from __future__ import annotations

import hashlib
import json
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .extract import extract_document_safe
from .lexicons import DEFAULT_LEXICONS, Lexicons
from .schema import DOCUMENTS, EXTRACTED, SPAN_STRUCT, validate
from .wordtype import LexiconTagger

# chunk-level intermediate schema: EXTRACTED + salting bookkeeping
CHUNKED = pa.schema(
    list(EXTRACTED) + [
        ("chunk", pa.int32()),
        ("n_chunks", pa.int32()),
        ("n_tail", pa.int32()),            # trailing media spans in chunk
        ("n_basic_spans", pa.int32()),     # leading basic-info-table spans
        ("n_basic_entities", pa.int32()),
        ("n_basic_relations", pa.int32()),
    ]
)

DEFAULT_MAX_SPANS_PER_CHUNK = 64

# Checkpoint layout version. Bump whenever the on-disk shard/manifest layout
# changes incompatibly: resume and load_extracted REFUSE silently mixing
# layouts (a v1 checkpoint read by the v2 reader produced duplicate rows —
# chunk rows misread as whole docs). v3: manifests carry shard FILE lists
# in lineage; load_extracted is manifest-driven (no directory listing).
LAYOUT_VERSION = 3


def _part_of(doc_id: str, num_partitions: int) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


def read_documents(path: str, **kwargs) -> ray.data.Dataset:
    """Source: the interleaved documents table (S2), column-pruned to
    (doc_id, spans). A ``.lance`` path streams through
    ``ray.data.read_lance`` (the production north-star format — fragment-
    parallel scans with column projection pushdown); anything else reads
    as Parquet. The Lance branch is import-gated: this container has no
    ``pylance``, so it raises a clear error rather than a deep one."""
    if str(path).rstrip("/").endswith(".lance"):
        try:
            import lance  # noqa: F401 — presence check only
        except ImportError as e:
            raise ImportError(
                "reading a .lance table requires the `pylance` package "
                "(absent in this environment); convert to parquet or "
                "install pylance") from e
        return ray.data.read_lance(path, columns=["doc_id", "spans"],
                                   **kwargs)
    # strip the b'pandas' schema metadata pandas-written input parquet can
    # carry — it makes Schema.__hash__ raise, spamming 'Failed to hash the
    # schemas' warnings from Ray's block-schema dedup (metadata-only
    # zero-copy map, fuses into the read task)
    return ray.data.read_parquet(
        path, columns=["doc_id", "spans"], **kwargs).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")


def split_and_key(batch: pa.Table, *, num_partitions: int,
                  max_spans_per_chunk: int = DEFAULT_MAX_SPANS_PER_CHUNK,
                  skip_parts: frozenset[int] | None = None) -> pa.Table:
    """Stateless pre-pass: assign the doc_id-hash partition key, drop
    already-completed partitions (resume), and salt giant documents by
    splitting their span lists into independent chunk rows (SURVEY.md §4.2).

    Common-case rows (≤ max_spans_per_chunk spans) pass through zero-copy;
    only giants are materialized to Python for slicing.
    """
    batch = validate(batch, DOCUMENTS, "documents read")
    doc_ids = batch.column("doc_id").to_pylist()
    parts = np.fromiter((_part_of(d, num_partitions) for d in doc_ids),
                        dtype=np.int32, count=len(doc_ids))
    keep = np.ones(len(doc_ids), dtype=bool)
    if skip_parts:
        keep = ~np.isin(parts, list(skip_parts))
    lens = pc.list_value_length(batch.column("spans")).to_numpy(
        zero_copy_only=False)
    giant = (lens > max_spans_per_chunk) & keep
    common = keep & ~giant

    out_tables = []
    if common.any():
        idx = np.nonzero(common)[0]
        sub = batch.take(pa.array(idx))
        n = len(idx)
        sub = sub.append_column("part", pa.array(parts[idx], pa.int32()))
        sub = sub.append_column("chunk", pa.array(np.zeros(n, np.int32)))
        sub = sub.append_column("n_chunks", pa.array(np.ones(n, np.int32)))
        sub = sub.append_column("n_prefix", pa.array(np.zeros(n, np.int32)))
        out_tables.append(sub)
    if giant.any():
        rows = {"doc_id": [], "spans": [], "part": [], "chunk": [],
                "n_chunks": [], "n_prefix": []}
        spans_col = batch.column("spans")
        for i in np.nonzero(giant)[0]:
            spans = spans_col[int(i)].as_py()
            spans.sort(key=lambda s: s["offset"])
            n_chunks = -(-len(spans) // max_spans_per_chunk)
            for c in range(n_chunks):
                start = c * max_spans_per_chunk
                own = spans[start:start + max_spans_per_chunk]
                # parse-only context: the last ≤2 html spans before this
                # chunk (getCaption walks ≤2 previous siblings — extract.py)
                prefix = [s for s in spans[:start]
                          if s["kind"] == "html"][-2:]
                rows["doc_id"].append(doc_ids[int(i)])
                rows["spans"].append(prefix + own)
                rows["part"].append(int(parts[int(i)]))
                rows["chunk"].append(c)
                rows["n_chunks"].append(n_chunks)
                rows["n_prefix"].append(len(prefix))
        out_tables.append(pa.table(
            {"doc_id": pa.array(rows["doc_id"], pa.string()),
             "spans": pa.array(rows["spans"], pa.list_(SPAN_STRUCT)),
             "part": pa.array(rows["part"], pa.int32()),
             "chunk": pa.array(rows["chunk"], pa.int32()),
             "n_chunks": pa.array(rows["n_chunks"], pa.int32()),
             "n_prefix": pa.array(rows["n_prefix"], pa.int32())}))
    if not out_tables:
        empty = batch.slice(0, 0)
        for name in ("part", "chunk", "n_chunks", "n_prefix"):
            empty = empty.append_column(name, pa.array([], pa.int32()))
        return empty
    return pa.concat_tables(out_tables, promote_options="default")


class ExtractChunks:
    """Stateful extraction stage (ST1/ST4): an actor-pool ``map_batches``
    class UDF — lexicons and the POS tagger are built ONCE per actor here,
    not per batch (the reference re-reads its lexicon JSONs per cell,
    table.py:713 et al.; see SURVEY.md §2.3)."""

    def __init__(self, lexicons: Lexicons | None = None):
        self.lex = lexicons or DEFAULT_LEXICONS
        self.tagger = LexiconTagger(self.lex)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        prefixes = (batch.column("n_prefix").to_pylist()
                    if "n_prefix" in batch.column_names
                    else [0] * len(doc_ids))

        # flat span columns + list offsets — built directly as Arrow arrays,
        # no per-span dict round-trip (this stage is the hot path; the
        # conversion cost was ~36% of UDF time with from_pylist)
        kinds: list[str] = []
        texts: list[str] = []
        refs: list[str] = []
        offs: list[int] = []
        list_offsets = [0]
        out = {name: [] for name in
               ("entities_json", "relations_json", "n_tables", "n_spans",
                "n_entities", "n_relations", "error", "n_tail",
                "n_basic_spans", "n_basic_entities", "n_basic_relations")}
        for i, doc_id in enumerate(doc_ids):
            res = extract_document_safe(doc_id, spans_col[i], self.lex,
                                        self.tagger, n_prefix=prefixes[i])
            seq = res.basic_spans + res.tag_spans + res.tail_media
            for off, (k, t, m) in enumerate(seq):
                kinds.append(k)
                texts.append(t)
                refs.append(m)
                offs.append(off)
            list_offsets.append(len(kinds))
            out["entities_json"].append(res.entities_json)
            out["relations_json"].append(res.relations_json)
            out["n_tables"].append(res.n_tables)
            out["n_spans"].append(len(seq))
            out["n_entities"].append(
                len(res.basic_entities) + len(res.tag_entities))
            out["n_relations"].append(
                len(res.basic_relations) + len(res.tag_relations))
            out["error"].append(res.error)
            out["n_tail"].append(len(res.tail_media))
            out["n_basic_spans"].append(len(res.basic_spans))
            out["n_basic_entities"].append(len(res.basic_entities))
            out["n_basic_relations"].append(len(res.basic_relations))

        span_struct = pa.StructArray.from_arrays(
            [pa.array(kinds, pa.string()), pa.array(texts, pa.string()),
             pa.array(refs, pa.string()), pa.array(offs, pa.int32())],
            fields=list(SPAN_STRUCT))
        spans_arr = pa.ListArray.from_arrays(
            pa.array(list_offsets, pa.int32()), span_struct)
        passthrough = {
            "doc_id": batch.column("doc_id"),
            "part": batch.column("part"),
            "spans": spans_arr,
            "chunk": batch.column("chunk"),
            "n_chunks": batch.column("n_chunks"),
        }
        cols = {f.name: passthrough[f.name] if f.name in passthrough
                else pa.array(out[f.name], f.type) for f in CHUNKED}
        return pa.table(cols).select(CHUNKED.names).cast(CHUNKED)


_EXTRACTOR_CACHE: dict = {}


def extract_chunks_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task form of the extraction stage (default lexicons).

    The extractor state here (frozen lexicons + tagger) is microseconds to
    build and is cached per worker PROCESS at module level, so plain tasks
    amortize it exactly like an actor pool would — without reserving CPUs
    away from the read/write stages (an actor pool that holds ``ncpu-2``
    CPUs serializes everything else). Use the ``ExtractChunks`` actor-pool
    class instead when the stage state is genuinely expensive (models,
    site-rule packs, big vocabularies) or when per-actor resources (GPUs)
    matter."""
    ex = _EXTRACTOR_CACHE.get("default")
    if ex is None:
        ex = _EXTRACTOR_CACHE["default"] = ExtractChunks()
    return ex(batch)


def _reassemble_doc(rows: list[dict]) -> dict:
    """Re-stitch a salted giant doc from its chunk rows, preserving the
    whole-doc ordering contract (extract.py module docstring): ALL basic-info
    table output (chunk order) precedes ALL tag-table output (chunk order),
    then the input media tail (chunk order). Same grouping for entities and
    relations. Offsets reassigned over the final sequence."""
    rows = sorted(rows, key=lambda r: r["chunk"])
    basic, tag, tail = [], [], []
    basic_ents, tag_ents, basic_rels, tag_rels = [], [], [], []
    n_tables = 0
    errors = []
    for r in rows:
        spans = r["spans"]
        nb, nt = r["n_basic_spans"], r["n_tail"]
        cut = len(spans) - nt
        basic.extend(spans[:nb])
        tag.extend(spans[nb:cut])
        tail.extend(spans[cut:])
        ents = json.loads(r["entities_json"])
        basic_ents.extend(ents[:r["n_basic_entities"]])
        tag_ents.extend(ents[r["n_basic_entities"]:])
        rels = json.loads(r["relations_json"])
        basic_rels.extend(rels[:r["n_basic_relations"]])
        tag_rels.extend(rels[r["n_basic_relations"]:])
        n_tables += r["n_tables"]
        if r["error"]:
            errors.append(r["error"])
    seq = basic + tag + tail
    for off, s in enumerate(seq):
        s["offset"] = off
    entities = basic_ents + tag_ents
    relations = basic_rels + tag_rels
    return {
        "doc_id": rows[0]["doc_id"], "part": rows[0]["part"], "spans": seq,
        "entities_json": json.dumps(entities, ensure_ascii=False),
        "relations_json": json.dumps(relations, ensure_ascii=False),
        "n_tables": n_tables, "n_spans": len(seq),
        "n_entities": len(entities), "n_relations": len(relations),
        "error": "; ".join(errors),
    }


def make_shard_writer(out_dir: str):
    """Shuffle-FREE checkpoint writer: a ``map_batches`` stage that splits
    each extracted batch by ``part`` and appends one shard parquet per
    (part, batch) directly under ``part=NNNNN/`` — no all-to-all exchange.

    Idempotence: shard file names are content-derived (sha1 of the sorted
    (doc_id, chunk) list), so a retried task rewrites the SAME file via
    tmp + atomic rename. The per-part manifest is committed afterwards by
    the driver from the tiny metadata rows this stage emits; orphan shards
    from a crashed run are swept by :func:`clean_incomplete_parts` before a
    resume. Salted chunk rows are written as-is and reassembled at read time
    (:func:`load_extracted`) — only the rare ``n_chunks > 1`` rows pay that
    cost."""

    def write_shards(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        metas = []
        parts = pc.unique(batch.column("part")).to_pylist()
        for part in parts:
            sub = batch.filter(pc.equal(batch.column("part"), part))
            doc_ids = sub.column("doc_id").to_pylist()
            chunks = sub.column("chunk").to_pylist()
            h = hashlib.sha1()
            for d, c in sorted(zip(doc_ids, chunks)):
                h.update(f"{d}#{c}".encode())
            shard_id = h.hexdigest()[:16]
            part_dir = os.path.join(out_dir, f"part={part:05d}")
            os.makedirs(part_dir, exist_ok=True)
            # whole docs and salted chunk rows go to SEPARATE files so the
            # read side never scans singles looking for chunks
            single_mask = pc.equal(sub.column("n_chunks"), 1)
            singles = sub.filter(single_mask).select(EXTRACTED.names) \
                         .cast(EXTRACTED)
            chunked = sub.filter(pc.invert(single_mask))
            files = []
            for tbl, suffix in ((singles, ""), (chunked, "-chunks")):
                if tbl.num_rows == 0:
                    continue
                tmp = os.path.join(part_dir,
                                   f".tmp-{shard_id}{suffix}-{os.getpid()}")
                pq.write_table(tbl, tmp)
                name = f"shard-{shard_id}{suffix}.parquet"
                os.replace(tmp, os.path.join(part_dir, name))
                files.append(name)
            n_whole = int(pc.sum(pc.cast(
                pc.equal(sub.column("chunk"), 0), pa.int64())).as_py() or 0)
            metas.append({
                "part": part,
                "shard_id": shard_id,
                "n_rows": sub.num_rows,
                "n_docs": n_whole,     # chunk==0 rows ⇒ one per document
                "n_spans": int(pc.sum(sub.column("n_spans")).as_py() or 0),
                "n_entities": int(
                    pc.sum(sub.column("n_entities")).as_py() or 0),
                "n_relations": int(
                    pc.sum(sub.column("n_relations")).as_py() or 0),
                "n_errors": int(pc.sum(pc.cast(
                    pc.not_equal(sub.column("error"), ""),
                    pa.int64())).as_py() or 0),
                "doc_id_min": min(doc_ids),
                "doc_id_max": max(doc_ids),
                "content_hash": h.hexdigest(),
                # file basenames written for this shard — folded into the
                # manifest lineage so load_extracted never lists directories
                "files": json.dumps(files),
            })
        return pa.Table.from_pylist(metas)

    return write_shards


def commit_manifests(out_dir: str, shard_metas: list[dict],
                     parts_planned: list[int]) -> list[dict]:
    """Driver-side commit: fold shard metadata into one manifest per
    partition (lineage = shard list + doc_id range). A manifest's existence
    marks the partition complete for resume."""
    man_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(man_dir, exist_ok=True)
    by_part: dict[int, list[dict]] = {p: [] for p in parts_planned}
    for m in shard_metas:
        by_part.setdefault(m["part"], []).append(m)
    manifests = []
    for part, metas in sorted(by_part.items()):
        metas.sort(key=lambda m: m["shard_id"])
        h = hashlib.sha1()
        for m in metas:
            h.update(m["content_hash"].encode())
        manifest = {
            "part": part,
            "n_docs": sum(m["n_docs"] for m in metas),
            "n_spans": sum(m["n_spans"] for m in metas),
            "n_entities": sum(m["n_entities"] for m in metas),
            "n_relations": sum(m["n_relations"] for m in metas),
            "n_errors": sum(m["n_errors"] for m in metas),
            "content_hash": h.hexdigest(),
            "lineage": json.dumps({
                "shards": [m["shard_id"] for m in metas],
                "files": sorted(f for m in metas
                                for f in json.loads(m.get("files", "[]"))),
                "doc_id_min": min((m["doc_id_min"] for m in metas),
                                  default=""),
                "doc_id_max": max((m["doc_id_max"] for m in metas),
                                  default=""),
                "n_chunk_rows": sum(m["n_rows"] for m in metas),
            }),
        }
        tmp = os.path.join(man_dir, f".tmp-{part:05d}-{os.getpid()}")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(man_dir, f"part-{part:05d}.json"))
        manifests.append(manifest)
    return manifests


def clean_incomplete_parts(out_dir: str,
                           num_partitions: int | None = None) -> int:
    """Remove shard files of partitions that have no committed manifest
    (orphans from a crashed run) so a resume starts clean. A checkpoint in a
    different layout version OR with a different partition count is swept
    entirely (its manifests too) — mixing hash mappings duplicates rows."""
    removed = 0
    if not os.path.isdir(out_dir):
        return 0
    marker = _layout_marker(out_dir)
    incompatible = (marker is None or marker[0] != LAYOUT_VERSION
                    or (num_partitions is not None
                        and marker[1] != num_partitions))
    if incompatible:
        man_dir = os.path.join(out_dir, "_manifests")
        if os.path.isdir(man_dir):
            for f in os.listdir(man_dir):
                os.remove(os.path.join(man_dir, f))
                removed += 1
    done = completed_parts(out_dir, num_partitions)
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        part = int(name.split("=")[1])
        if part in done:
            continue
        d = os.path.join(out_dir, name)
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
            removed += 1
        os.rmdir(d)
    return removed


def compact_checkpoint(out_dir: str, *,
                       target_rows_per_file: int = 100_000) -> dict:
    """Coalesce a completed checkpoint's small shard files into
    ~``target_rows_per_file``-row files, in place. This is the repair for
    the small-files failure mode SCALING.md documents (P-way writes from
    small writer batches fan into thousands of tiny row groups; measured
    57 s → ~8 s read-back at 100k docs): run extraction with whatever
    batch size throughput wants, then compact once.

    One Ray task per partition — embarrassingly parallel, no exchange;
    single-doc and ``-chunks`` shard files coalesce separately (the
    reader's fast/slow path split is preserved). Crash-safe per part:
    (1) merged files land via tmp + atomic rename under CONTENT-DERIVED
    names (the writer's rule — a retry rewrites identical bytes), then
    (2) the manifest swaps atomically to the new lineage, then (3) the
    old files unlink. A crash at any point leaves either the old or the
    new lineage fully committed; stray files are invisible to the
    manifest-driven reader (load_extracted never lists directories)."""
    import pyarrow.parquet as pq

    man_dir = os.path.join(out_dir, "_manifests")
    names = (sorted(n for n in os.listdir(man_dir)
                    if n.startswith("part-") and n.endswith(".json"))
             if os.path.isdir(man_dir) else [])

    @ray.remote
    def compact_part(manifest: dict) -> tuple[dict | None, list, int, int]:
        part = manifest["part"]
        lineage = json.loads(manifest["lineage"])
        files = lineage.get("files", [])
        part_dir = os.path.join(out_dir, f"part={part:05d}")
        groups = {
            "": [f for f in files if not f.endswith("-chunks.parquet")],
            "-chunks": [f for f in files if f.endswith("-chunks.parquet")],
        }
        new_files, new_ids, old_files = [], [], []
        changed = False
        for suffix, group in groups.items():
            if len(group) <= 1:
                new_files += group
                new_ids += [f.split("-")[1].split(".")[0] for f in group]
                continue
            tbl = pa.concat_tables(
                [pq.read_table(os.path.join(part_dir, f)) for f in group])
            n_slices = max(1, -(-tbl.num_rows // target_rows_per_file))
            step = -(-tbl.num_rows // n_slices)
            for off in range(0, tbl.num_rows, step):
                sl = tbl.slice(off, step)
                # single-doc shards carry no chunk column (EXTRACTED
                # schema) — their rows are chunk 0 by construction
                cks = (sl.column("chunk").to_pylist()
                       if "chunk" in sl.schema.names
                       else [0] * sl.num_rows)
                h = hashlib.sha1()
                for d, c in sorted(zip(sl.column("doc_id").to_pylist(),
                                       cks)):
                    h.update(f"{d}#{c}".encode())
                sid = h.hexdigest()[:16]
                name = f"shard-{sid}{suffix}.parquet"
                tmp = os.path.join(part_dir, f".tmp-{sid}-{os.getpid()}")
                pq.write_table(sl, tmp)
                os.replace(tmp, os.path.join(part_dir, name))
                new_files.append(name)
                new_ids.append(sid)
            old_files += group
            changed = True
        if not changed:
            return None, [], len(files), len(files)
        h = hashlib.sha1()
        for sid in sorted(new_ids):
            h.update(sid.encode())
        new_manifest = dict(manifest)
        new_manifest["content_hash"] = h.hexdigest()
        lineage["shards"] = sorted(new_ids)
        lineage["files"] = sorted(new_files)
        new_manifest["lineage"] = json.dumps(lineage)
        return (new_manifest,
                [os.path.join(part_dir, f) for f in old_files
                 if f not in new_files],
                len(files), len(new_files))

    manifests = []
    for n in names:
        with open(os.path.join(man_dir, n), encoding="utf-8") as f:
            manifests.append(json.load(f))
    results = ray.get([compact_part.remote(m) for m in manifests])

    parts_compacted = files_before = files_after = 0
    for (new_man, olds, nb, na), name in zip(results, names):
        files_before += nb
        files_after += na
        if new_man is None:
            continue
        tmp = os.path.join(man_dir, f".tmp-{name}-{os.getpid()}")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(new_man, f)
        os.replace(tmp, os.path.join(man_dir, name))   # commit point
        for p in olds:
            try:
                os.remove(p)
            except OSError:
                pass
        parts_compacted += 1
    return {"parts": len(names), "parts_compacted": parts_compacted,
            "files_before": files_before, "files_after": files_after}


def _format_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_format.json")


def _layout_marker(out_dir: str) -> tuple[int, int] | None:
    """(layout_version, num_partitions) of an existing checkpoint, or None."""
    try:
        with open(_format_path(out_dir), encoding="utf-8") as f:
            d = json.load(f)
        return int(d.get("layout_version", 0)), int(d.get("num_partitions", 0))
    except (OSError, ValueError):
        return None


def _write_layout_marker(out_dir: str, num_partitions: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = _format_path(out_dir) + f".tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"layout_version": LAYOUT_VERSION,
                   "num_partitions": num_partitions}, f)
    os.replace(tmp, _format_path(out_dir))


def completed_parts(out_dir: str,
                    num_partitions: int | None = None) -> frozenset[int]:
    """Partitions already checkpointed (manifest exists ⇒ data files were
    renamed into place first). A checkpoint from a different layout version
    — or, when ``num_partitions`` is given, a different partition count
    (the doc_id→part hash mapping would differ, so old skip-sets would
    corrupt a resume with duplicates) — counts as NOTHING completed."""
    marker = _layout_marker(out_dir)
    if marker is None or marker[0] != LAYOUT_VERSION:
        return frozenset()
    if num_partitions is not None and marker[1] != num_partitions:
        return frozenset()
    man_dir = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(man_dir):
        return frozenset()
    parts = set()
    for name in os.listdir(man_dir):
        if name.startswith("part-") and name.endswith(".json"):
            parts.add(int(name[5:-5]))
    return frozenset(parts)


def run_extract_pipeline(input_path: str, out_dir: str, *,
                         num_partitions: int = 64,
                         max_spans_per_chunk: int = DEFAULT_MAX_SPANS_PER_CHUNK,
                         concurrency: int | tuple | None = None,
                         batch_size: int = 16,
                         writer_batch_size: int = 2048,
                         lexicons: Lexicons | None = None,
                         use_actors: bool = False,
                         resume: bool = False) -> dict:
    """Run the full extraction pipeline; returns the rolled-up manifest
    summary. Idempotent per partition; ``resume=True`` skips completed
    partitions (and sweeps orphan shards of incomplete ones) before any
    extraction work. No all-to-all exchange anywhere: the checkpoint layout
    is produced by direct partitioned shard writes.

    ``use_actors=False`` (default) runs extraction as plain tasks with the
    extractor state module-cached per worker — measured faster here because
    an actor pool's CPU reservation starves the read/write stages; flip to
    True (with ``lexicons``/``concurrency``) when the stage state is
    expensive enough to need a dedicated pool."""
    # Ray's per-operator resource reservation holds back ~half the CPUs for
    # downstream operators; on small clusters that throttles the extract
    # stage to <50% utilization (measured 2× slowdown at 4 CPUs). This
    # pipeline's operators are short and non-deadlocking, so disable it.
    ray.data.DataContext.get_current().op_resource_reservation_enabled = False
    skip: frozenset[int] = frozenset()
    if resume:
        clean_incomplete_parts(out_dir, num_partitions)
        skip = completed_parts(out_dir, num_partitions)
    elif os.path.isdir(out_dir):
        # fresh (non-resume) run into an existing dir: sweep the previous
        # checkpoint entirely — stale shards with different batch groupings
        # would otherwise coexist with the new ones and read as duplicates
        for name in os.listdir(out_dir):
            path = os.path.join(out_dir, name)
            if name.startswith("part=") or name == "_manifests":
                for f in os.listdir(path):
                    os.remove(os.path.join(path, f))
                os.rmdir(path)
            elif name == "_format.json":
                os.remove(path)
    ds = read_documents(input_path)
    ds = ds.map_batches(
        split_and_key, batch_format="pyarrow",
        fn_kwargs={"num_partitions": num_partitions,
                   "max_spans_per_chunk": max_spans_per_chunk,
                   "skip_parts": skip})
    if use_actors or lexicons is not None:
        if concurrency is None:
            # leave headroom for the read/split/write stages: an actor pool
            # that reserves every CPU starves them and serializes the rest
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
            concurrency = max(2, n_cpus - 4)
        ds = ds.map_batches(ExtractChunks, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency,
                            num_cpus=1,
                            fn_constructor_kwargs={"lexicons": lexicons})
    else:
        ds = ds.map_batches(extract_chunks_batch, batch_format="pyarrow",
                            batch_size=batch_size)
    # large writer batches → few, large shard files per partition (a shard
    # per (part, batch); small batches fragment into thousands of tiny
    # files); num_cpus=0.5 lets writers interleave with extraction
    metas_ds = ds.map_batches(make_shard_writer(out_dir),
                              batch_format="pyarrow",
                              num_cpus=0.5, batch_size=writer_batch_size)
    metas = metas_ds.take_all()
    try:
        # per-stage wall/cpu breakdown for tuning (ray_guide: measure,
        # don't guess) — best-effort observability, never fails the run
        with open(os.path.join(out_dir, "_stats.txt"), "w",
                  encoding="utf-8") as f:
            f.write(metas_ds.stats())
    except Exception:  # noqa: BLE001 — observability only
        pass
    _write_layout_marker(out_dir, num_partitions)
    parts_planned = [p for p in range(num_partitions) if p not in skip]
    manifests = commit_manifests(out_dir, metas, parts_planned)
    summary = {
        "n_parts": len(manifests) + len(skip),
        "n_parts_skipped": len(skip),
        "n_docs": sum(m["n_docs"] for m in manifests),
        "n_spans": sum(m["n_spans"] for m in manifests),
        "n_entities": sum(m["n_entities"] for m in manifests),
        "n_relations": sum(m["n_relations"] for m in manifests),
        "n_errors": sum(m["n_errors"] for m in manifests),
    }
    return summary


def load_extracted(out_dir: str) -> ray.data.Dataset:
    """Read the extraction checkpoint back as whole documents (EXTRACTED
    schema). Salted chunk rows (``n_chunks > 1``, rare) are reassembled
    lazily with a doc_id groupby over ONLY that subset (parquet filter
    pushdown keeps the common path untouched).

    Manifest-driven: the shard file list comes from the committed
    per-partition manifests (lineage.files) — the driver touches O(#parts)
    manifest files, never lists the shard directories, so a 10⁵⁺-shard
    checkpoint costs the same driver time as a 10-shard one. Orphan shard
    files from a crashed run are invisible by construction (their partition
    has no manifest)."""
    from .schema import EXTRACTED_PARQUET
    marker = _layout_marker(out_dir)
    if marker is None or marker[0] != LAYOUT_VERSION:
        raise ValueError(
            f"checkpoint at {out_dir} has layout version "
            f"{marker[0] if marker else None!r}, reader expects "
            f"{LAYOUT_VERSION} — re-run the extraction (a mixed-layout "
            f"read would produce duplicate rows)")
    single_paths, chunk_paths = [], []
    man_dir = os.path.join(out_dir, "_manifests")
    manifest_names = (sorted(os.listdir(man_dir))
                      if os.path.isdir(man_dir) else [])
    for name in manifest_names:
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(man_dir, name), encoding="utf-8") as f:
            manifest = json.load(f)
        part_dir = os.path.join(out_dir, f"part={manifest['part']:05d}")
        for fn in json.loads(manifest["lineage"]).get("files", []):
            (chunk_paths if fn.endswith("-chunks.parquet")
             else single_paths).append(os.path.join(part_dir, fn))

    def reassemble_group(g: pa.Table) -> pa.Table:
        return pa.Table.from_pylist([_reassemble_doc(g.to_pylist())],
                                    schema=EXTRACTED).cast(EXTRACTED_PARQUET)

    reassembled = None
    if chunk_paths:
        reassembled = ray.data.read_parquet(chunk_paths) \
            .groupby("doc_id").map_groups(reassemble_group,
                                          batch_format="pyarrow")
    if not single_paths:
        # all-chunked corpus (every doc exceeded max_spans_per_chunk) —
        # or an empty one
        if reassembled is not None:
            return reassembled
        return ray.data.from_arrow(
            pa.Table.from_pylist([], schema=EXTRACTED_PARQUET))
    singles = ray.data.read_parquet(single_paths)
    if reassembled is None:
        return singles
    return singles.union(reassembled)


# ---------------------------------------------------------------------------
# Downstream: entities / relations datasets, dedup, fusion
# ---------------------------------------------------------------------------

def _explode_entities(batch: pa.Table) -> pa.Table:
    out = {"doc_id": [], "seq": [], "subject": [], "subject_url": [],
           "props": []}
    for doc_id, ej in zip(batch.column("doc_id").to_pylist(),
                          batch.column("entities_json").to_pylist()):
        for seq, ent in enumerate(json.loads(ej)):
            (name, url), props = ent[0], ent[1]
            out["doc_id"].append(doc_id)
            out["seq"].append(seq)
            out["subject"].append(name)
            out["subject_url"].append(url)
            out["props"].append(list(props.items()))
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.string()),
        "seq": pa.array(out["seq"], pa.int32()),
        "subject": pa.array(out["subject"], pa.string()),
        "subject_url": pa.array(out["subject_url"], pa.string()),
        "props": pa.array(out["props"], pa.map_(pa.string(), pa.string())),
    })


def entities_dataset(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """S5-equivalent: structured entity rows instead of JSON blobs."""
    return extracted.select_columns(["doc_id", "entities_json"]).map_batches(
        _explode_entities, batch_format="pyarrow")


def _explode_relations(batch: pa.Table) -> pa.Table:
    out = {k: [] for k in ("doc_id", "s_name", "s_url", "rel", "o_name",
                           "o_url")}
    for doc_id, rj in zip(batch.column("doc_id").to_pylist(),
                          batch.column("relations_json").to_pylist()):
        for (s_name, s_url), rel, (o_name, o_url) in json.loads(rj):
            out["doc_id"].append(doc_id)
            out["s_name"].append(s_name)
            out["s_url"].append(s_url)
            out["rel"].append(rel)
            out["o_name"].append(o_name)
            out["o_url"].append(o_url)
    return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})


def relations_dataset(extracted: ray.data.Dataset) -> ray.data.Dataset:
    return extracted.select_columns(["doc_id", "relations_json"]).map_batches(
        _explode_relations, batch_format="pyarrow")


_REL_KEY = ["s_name", "s_url", "rel", "o_name", "o_url"]


def _batch_dedup_relations(batch: pa.Table) -> pa.Table:
    """Partial combine before the shuffle: keep the first (min doc_id) row
    per 5-tuple within the batch."""
    df = batch.to_pandas()
    df = df.sort_values("doc_id").drop_duplicates(_REL_KEY, keep="first")
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def dedup_relations(relations: ray.data.Dataset) -> ray.data.Dataset:
    """D6: exact dedup by the 5-tuple — per-batch pre-dedup then a global
    groupby keeping the first (min doc_id) occurrence (the reference freely
    re-creates duplicate Neo4j relationships, peronGraph.py:90-116; dedup is
    the documented correction)."""
    pre = relations.map_batches(_batch_dedup_relations, batch_format="pyarrow")

    def first_row(g):
        return g.sort_values("doc_id").head(1)

    return pre.groupby(_REL_KEY).map_groups(first_row, batch_format="pandas")


def _nodes_table(nodes: list[dict]) -> pa.Table:
    return pa.table({
        "name": pa.array([n["name"] for n in nodes], pa.string()),
        "url": pa.array([n["url"] for n in nodes], pa.string()),
        "props": pa.array([list(n["props"].items()) for n in nodes],
                          pa.map_(pa.string(), pa.string())),
        "n_sources": pa.array([n["n_sources"] for n in nodes], pa.int64())})


def build_nodes(entities: ray.data.Dataset, *,
                salt_buckets: int = 16) -> ray.data.Dataset:
    """J1/A3: entity fusion → nodes Dataset, hot-name-safe.

    Three-stage salted dataflow (SCALING.md hot-key design), EXACTLY
    equivalent to ``fusion.fuse_entity_group`` per subject (equivalence
    derived + property-tested in fusion.py / tests/test_fusion.py):

      1. per-batch ``class_partials``: entities collapse to per-(subject,
         url-class) summaries — a hot subject shrinks to (#batches ×
         #distinct urls) rows before anything shuffles;
      2. ``groupby(subject, salt)`` with ``salt = hash(url) % B`` merges
         partials per class (all rows of one url share a salt, so each
         class completes in one group; a hot NAME spreads over B groups);
      3. ``groupby(subject)`` folds the per-class summaries — group size is
         the subject's DISTINCT-url count, not its row count, which is the
         node count the output carries anyway (irreducible).
    """
    import zlib

    from .fusion import (class_partials, fuse_class_summaries,
                         merge_class_partials)

    def stage1(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        parts = class_partials(rows)
        return pa.table({
            "subject": pa.array([c["subject"] for c in parts], pa.string()),
            "__salt": pa.array(
                [zlib.crc32(c["url"].encode("utf-8")) % salt_buckets
                 for c in parts], pa.int32()),
            "url": pa.array([c["url"] for c in parts], pa.string()),
            "first_doc": pa.array([c["first_doc"] for c in parts],
                                  pa.string()),
            "first_seq": pa.array([c["first_seq"] for c in parts],
                                  pa.int32()),
            "n": pa.array([c["n"] for c in parts], pa.int64()),
            "props_json": pa.array(
                [json.dumps({k: list(v) for k, v in c["props"].items()})
                 for c in parts], pa.string()),
        })

    def _parse(row: dict) -> dict:
        return {"subject": row["subject"], "url": row["url"],
                "first_doc": row["first_doc"],
                "first_seq": row["first_seq"], "n": row["n"],
                "props": {k: tuple(v) for k, v in
                          json.loads(row["props_json"]).items()}}

    def stage2(group: pa.Table) -> pa.Table:
        by_url: dict[str, dict] = {}
        salt = group.column("__salt")[0].as_py()
        for row in group.to_pylist():
            c = _parse(row)
            by_url[c["url"]] = (merge_class_partials(by_url[c["url"]], c)
                                if c["url"] in by_url else c)
        parts = list(by_url.values())
        return pa.table({
            "subject": pa.array([c["subject"] for c in parts], pa.string()),
            "__salt": pa.array([salt] * len(parts), pa.int32()),
            "url": pa.array([c["url"] for c in parts], pa.string()),
            "first_doc": pa.array([c["first_doc"] for c in parts],
                                  pa.string()),
            "first_seq": pa.array([c["first_seq"] for c in parts],
                                  pa.int32()),
            "n": pa.array([c["n"] for c in parts], pa.int64()),
            "props_json": pa.array(
                [json.dumps({k: list(v) for k, v in c["props"].items()})
                 for c in parts], pa.string()),
        })

    def stage3(group: pa.Table) -> pa.Table:
        classes = [_parse(r) for r in group.to_pylist()]
        nodes = fuse_class_summaries(classes[0]["subject"], classes)
        return _nodes_table(nodes)

    partials = entities.map_batches(stage1, batch_format="pyarrow")
    combined = partials.groupby(["subject", "__salt"]).map_groups(
        stage2, batch_format="pyarrow")
    # consolidate between the exchanges: stage2 emits one small block per
    # (subject, salt) group, and Ray's sort reduce pays per (block ×
    # partition) slice — class summaries are bounded by distinct urls,
    # far below the entity rows, so materializing is scale-safe
    # (SCALING.md "exchange-feeding rules")
    return combined.materialize().groupby("subject").map_groups(
        stage3, batch_format="pyarrow")


def build_knowledge_graph(input_path: str, out_dir: str, *,
                          num_partitions: int = 64,
                          resume: bool = False, **kwargs) -> dict:
    """The reference's full end-to-end flow (start.py: spider → tableExtract
    → personGraph) as one batch pipeline: extract (checkpointed) → deduped
    relation triples → fused entity nodes, written as Parquet under
    ``out_dir/{extracted,edges,nodes}``. Returns the rolled-up summary."""
    import shutil

    ext_dir = os.path.join(out_dir, "extracted")
    summary = run_extract_pipeline(input_path, ext_dir,
                                   num_partitions=num_partitions,
                                   resume=resume, **kwargs)
    # edges/nodes are derived wholesale from the checkpoint: always rebuilt
    # (Ray's write_parquet APPENDS uuid-named files — leaving a previous
    # run's files in place would double every row)
    for sub in ("edges", "nodes"):
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
    ext = load_extracted(ext_dir)
    edges = dedup_relations(relations_dataset(ext))
    edges.write_parquet(os.path.join(out_dir, "edges"))
    ext = load_extracted(ext_dir)   # Datasets are single-consumer; re-read
    nodes = build_nodes(entities_dataset(ext))
    nodes.write_parquet(os.path.join(out_dir, "nodes"))
    import pyarrow.dataset as pads

    def _count(path: str) -> int:
        # an all-empty dataset writes no files at all (Ray skips empty
        # blocks) — count that as 0, not FileNotFoundError
        if not os.path.isdir(path):
            return 0
        return pads.dataset(path).count_rows()

    summary["n_edges"] = _count(os.path.join(out_dir, "edges"))
    summary["n_nodes"] = _count(os.path.join(out_dir, "nodes"))
    return summary


def generate_documents_ray(n_docs: int, out_path: str, *, seed: int = 42,
                           giant_fraction: float = 0.0,
                           parallelism: int = 32) -> None:
    """Parallel deterministic input generation for bench-scale inputs (the
    small-test path is gen.write_documents)."""
    from .gen import generate_batch

    def gen(batch: pa.Table) -> pa.Table:
        return generate_batch(batch.column("id").to_pylist(), seed=seed,
                              giant_fraction=giant_fraction)

    ds = ray.data.range(n_docs, override_num_blocks=parallelism)
    ds.map_batches(gen, batch_format="pyarrow").write_parquet(out_path)
