from ._common import *  # noqa: F401,F403
from .tpch import *  # noqa: F401,F403
from .relational import *  # noqa: F401,F403
from .events import *  # noqa: F401,F403
from .text import *  # noqa: F401,F403
from .dedup import *  # noqa: F401,F403
from .ann import *  # noqa: F401,F403



def frontier_buckets(sf_dir: str) -> pd.DataFrame:
    """M20/M21: crawl-frontier URL classification over the synthetic corpus'
    doc_id URLs. The per-URL semantics are pinned by unit tests
    (test_possible_url / classify); the oracle pins the DISTRIBUTION: every
    synthetic URL is a crawlable item page whose subject is not in the
    person lexicon (verified exhaustively over the generator), so the
    result is one ('useless', n_synthetic_docs) row at every sf — which
    the SQL reproduces from the documents row count."""
    from ..ops.frontier import classify_urls
    ext = _extract_synthetic(sf_dir)
    urls = ext.select_columns(["doc_id"]).map_batches(
        lambda t: pa.table({"url": t.column("doc_id")}),
        batch_format="pyarrow")
    out = classify_urls(urls)
    df = out.groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("bucket").reset_index(drop=True)



# n_synthetic_docs = max(60, documents_rows // 4) — _extract_synthetic's
# corpus sizing, restated in SQL
FRONTIER_BUCKETS_SQL = """
SELECT 'useless' AS bucket,
       CAST(greatest(60, (SELECT COUNT(*) FROM documents) // 4) AS BIGINT)
         AS n
"""



def extract_error_stats(sf_dir: str) -> pd.DataFrame:
    """Quarantine surfacing (recorded deviation vs the reference's
    exception-swallowing): per-status doc counts from the flagship output.
    The oracle pins the invariant the query exists to watch — EVERY
    synthetic doc extracts cleanly (single ('ok', n) row, n derived from
    the documents row count); any quarantined doc breaks the hash."""
    ext = _extract_synthetic(sf_dir)

    def status(t: pa.Table) -> pa.Table:
        ok = pc.equal(t.column("error"), "")
        return pa.table({"status": pc.if_else(
            ok, pa.scalar("ok"), pa.scalar("quarantined"))})

    df = ext.select_columns(["error"]) \
            .map_batches(status, batch_format="pyarrow") \
            .groupby("status").aggregate(Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("status").reset_index(drop=True)



EXTRACT_ERROR_STATS_SQL = """
SELECT 'ok' AS status,
       CAST(greatest(60, (SELECT COUNT(*) FROM documents) // 4) AS BIGINT)
         AS n
"""



def _synth_cache_dir(sf_dir: str, n_docs: int) -> str:
    from ..pipeline import LAYOUT_VERSION
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return (f"/tmp/wtes_cache/{tag}-{n_docs}-{_code_fingerprint()}"
            f"-v{LAYOUT_VERSION}")



def _synthetic_docs(n_docs: int):
    from ..gen import generate_batch

    def gen(t: pa.Table) -> pa.Table:
        return generate_batch(t.column("id").to_pylist(),
                              giant_fraction=0.02)

    return rd.range(n_docs, override_num_blocks=max(8, n_docs // 32)) \
             .map_batches(gen, batch_format="pyarrow")



def _extract_synthetic(sf_dir: str) -> "rd.Dataset":
    """Run the flagship extraction over deterministic synthetic interleaved
    docs (scaled off the sf documents row count), checkpointed under /tmp so
    the downstream queries reuse it (resume=True skips finished parts)."""
    from ..pipeline import load_extracted, run_extract_pipeline
    n_docs = max(60, pq.ParquetFile(_t(sf_dir, "documents"))
                 .metadata.num_rows // 4)
    cache = _synth_cache_dir(sf_dir, n_docs)
    docs_path = os.path.join(cache, "docs.parquet")
    done_marker = os.path.join(cache, "_DOCS_COMPLETE")
    if not os.path.exists(done_marker):
        # completion marker: a crashed half-written generation must not be
        # treated as a valid corpus
        import shutil as _shutil
        _shutil.rmtree(docs_path, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        _synthetic_docs(n_docs).write_parquet(docs_path)
        with open(done_marker, "w", encoding="utf-8") as f:
            f.write("ok")
    out = os.path.join(cache, "extracted")
    run_extract_pipeline(docs_path, out, num_partitions=16, resume=True)
    return load_extracted(out)



def extract_spans_synthetic(sf_dir: str) -> pd.DataFrame:
    """Flagship summary: per-doc table/span/entity/relation counts from the
    full Ray pipeline over the interleaved (doc_id, spans) input."""
    ext = _extract_synthetic(sf_dir)
    df = ext.select_columns(["doc_id", "n_tables", "n_spans", "n_entities",
                             "n_relations"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



def extract_relations_dedup(sf_dir: str) -> pd.DataFrame:
    """Downstream D6: deduped relation triples from the flagship output."""
    from ..pipeline import dedup_relations, relations_dataset
    rels = dedup_relations(relations_dataset(_extract_synthetic(sf_dir)))
    df = rels.to_pandas()
    return df.sort_values(["s_name", "rel", "o_name"]).reset_index(drop=True)



def extract_nodes_fused(sf_dir: str) -> pd.DataFrame:
    """Downstream J1/A3: fused entity nodes from the flagship output."""
    from ..pipeline import build_nodes, entities_dataset
    nodes = build_nodes(entities_dataset(_extract_synthetic(sf_dir)))
    df = nodes.to_pandas()
    df["props"] = df["props"].map(
        lambda m: "; ".join(f"{k}={v}" for k, v in sorted(dict(m).items())))
    return df.sort_values(["name", "url"]).reset_index(drop=True)



def neo4j_export_counts(sf_dir: str) -> pd.DataFrame:
    """Neo4j-admin bulk-import export (neo4j_io.py — the reference's live
    Neo4j sink, peronGraph.py:33-139, re-expressed as the batch artifact
    the real graph DB ingests): fused nodes + deduped triples from the
    flagship output render to header files + distributed CSV shards with
    endpoint closure. Pins the CSV shard row counts against the export
    manifest AND the endpoint-closure invariant (every relationship
    endpoint id exists in the node shards)."""
    import tempfile

    from ..neo4j_io import export_neo4j_admin, read_export_csv
    from ..pipeline import (build_nodes, dedup_relations, entities_dataset,
                           relations_dataset)

    ext = _extract_synthetic(sf_dir)
    nodes = build_nodes(entities_dataset(ext))
    edges = dedup_relations(relations_dataset(ext))
    out = tempfile.mkdtemp(prefix="neo4j_export_", dir="/tmp")
    man = export_neo4j_admin(nodes, edges, out)
    ndf = read_export_csv(os.path.join(out, "nodes"),
                          os.path.join(out, "nodes.header.csv"))
    rdf = read_export_csv(os.path.join(out, "relationships"),
                          os.path.join(out, "relationships.header.csv"))
    ids = set(ndf["url:ID"])
    closed = set(rdf[":START_ID"]).issubset(ids) \
        and set(rdf[":END_ID"]).issubset(ids)
    # self-asserting: a rows-only gate run must FAIL on contract breaks
    assert closed, "relationship endpoint missing from node shards"
    assert len(ndf) == man["nodes"] and len(rdf) == man["relationships"]
    return pd.DataFrame({
        "kind": ["nodes", "relationships"],
        "n_csv": [len(ndf), len(rdf)],
        "n_manifest": [man["nodes"], man["relationships"]],
        "endpoints_closed": [closed, closed]})



def extract_flagship_documents(sf_dir: str) -> pd.DataFrame:
    """Adapter path: run the extractor over the driver's plain-text
    documents table (each text wrapped as a single html span — FIXTURES.md
    §4); plain text yields empty span sequences, proving the quarantine-free
    pass-through."""
    from ..pipeline import extract_chunks_batch
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def adapt(t: pa.Table) -> pa.Table:
        ids = [str(d) for d in t.column("doc_id").to_pylist()]
        spans = [[{"kind": "html", "text": txt or "", "media_ref": "",
                   "offset": 0}] for txt in t.column("text").to_pylist()]
        from ..schema import SPAN_STRUCT
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
            "part": pa.array([0] * len(ids), pa.int32()),
            "chunk": pa.array([0] * len(ids), pa.int32()),
            "n_chunks": pa.array([1] * len(ids), pa.int32()),
        })

    out = ds.map_batches(adapt, batch_format="pyarrow") \
            .map_batches(extract_chunks_batch, batch_format="pyarrow",
                         batch_size=64)
    df = out.select_columns(["doc_id", "n_tables", "n_spans",
                             "error"]).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)



# the invariant this adapter query exists to watch: plain text carries no
# tables, so every doc must pass through with zero spans and NO quarantine —
# a non-empty error or a phantom span on any doc breaks the value hash
EXTRACT_FLAGSHIP_SQL = """
SELECT doc_id, '' AS error,
       CAST(0 AS INTEGER) AS n_spans, CAST(0 AS INTEGER) AS n_tables
FROM documents ORDER BY doc_id
"""



def pdf_roundtrip_docs(sf_dir: str) -> pd.DataFrame:
    """PDF source+sink (north rule "PDF/layout parse"): render every
    documents row to a real PDF (catalog → page tree → FlateDecode content
    streams) and parse it back — xref-free object walk, /Kids page order,
    Tj text operators — inside one map_batches stage. The writer slices
    lines at fixed character boundaries, so reader output must equal the
    ORIGINAL text byte-for-byte; the oracle is the identity select, making
    the whole writer→reader composition value-hash-checked through
    distributed stages (pdf_io.py; unit tests cover TJ/hex/octal/nested
    page trees and the encrypted/filter quarantine gates)."""
    from ..pdf_io import pdf_text, text_to_pdf

    def rt(batch: pa.Table) -> pa.Table:
        texts = [pdf_text(text_to_pdf(t or ""))
                 for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    df = ds.map_batches(rt, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



PDF_ROUNDTRIP_SQL = "SELECT doc_id, text FROM documents ORDER BY doc_id"



def jsonl_roundtrip_docs(sf_dir: str) -> pd.DataFrame:
    """JSONL source+sink: the interchange format every scraping/labeling
    stack emits. `Dataset.write_json` shards the corpus to JSON-lines
    files (one per block — the resumable layout), `read_json` streams
    them back; the oracle is the identity select, so the whole
    sink→source composition is value-hash-checked (including None text
    surviving as JSON null, and the lang/source payload columns)."""
    import tempfile
    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "text", "lang", "source"])
    out_dir = tempfile.mkdtemp(prefix="jsonl_rt_", dir="/tmp")
    ds.write_json(out_dir)
    back = rd.read_json(out_dir)
    df = back.to_pandas()[["doc_id", "text", "lang", "source"]]
    return df.sort_values("doc_id").reset_index(drop=True)



JSONL_ROUNDTRIP_SQL = ("SELECT doc_id, text, lang, source FROM documents "
                       "ORDER BY doc_id")



def csv_roundtrip_events(sf_dir: str) -> pd.DataFrame:
    """CSV source+sink (the reference's triple-CSV sink S9, generalized):
    `write_csv` shards a typed subset to CSV files, `read_csv` streams
    them back with type inference, and a per-type aggregate over the
    ROUNDTRIPPED data is value-checked against the same aggregate on the
    original table — so the sink→source composition (including float
    text round-tripping) is what the oracle pins."""
    import tempfile
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["event_id", "event_type", "value"])
    out_dir = tempfile.mkdtemp(prefix="csv_rt_", dir="/tmp")
    ds.write_csv(out_dir)
    back = rd.read_csv(out_dir)
    out = back.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value")).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)



CSV_ROUNDTRIP_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""




def orc_roundtrip_events(sf_dir: str) -> pd.DataFrame:
    """ORC source+sink (columnar interchange beside the parquet/CSV/JSONL
    sinks): the typed event subset shards to one .orc file per block via
    an Arrow-native ``pyarrow.orc`` writer inside ``map_batches`` (the
    same per-block resumable layout as the parquet sinks), then streams
    back with FILE-granular parallelism — a paths dataset fans out and
    each task decodes its own ORC file zero-copy to Arrow. The oracle is
    the identity select, so the whole sink→source composition is
    value-hash-checked (int64/string/double survive exactly; binary
    columnar codec, not a text format)."""
    import tempfile
    import uuid

    import pyarrow.orc  # noqa: F401  (import check at plan time)

    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["event_id", "user_id", "event_type", "value"])
    out_dir = tempfile.mkdtemp(prefix="orc_rt_", dir="/tmp")

    def write_shard(t: pa.Table) -> pa.Table:
        from pyarrow import orc as _orc
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.orc")
        _orc.write_table(t, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([t.num_rows], pa.int64())})

    manifest = ds.map_batches(write_shard,
                              batch_format="pyarrow").to_pandas()

    def read_shard(row_batch: pd.DataFrame) -> pa.Table:
        from pyarrow import orc as _orc
        tabs = [_orc.read_table(p) for p in row_batch["path"]]
        return pa.concat_tables(tabs)

    back = rd.from_pandas(manifest[["path"]]) \
        .map_batches(read_shard, batch_format="pandas", batch_size=1)
    df = back.to_pandas()[["event_id", "user_id", "event_type", "value"]]
    return df.sort_values("event_id").reset_index(drop=True)


ORC_ROUNDTRIP_SQL = ("SELECT event_id, user_id, event_type, value "
                     "FROM events ORDER BY event_id")


__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
