"""Ray pipeline end-to-end tests: pipeline output == single-process oracle,
dedup/fusion correctness, resume idempotence. Uses the session Ray fixture."""
import json
import os
import shutil

import pytest

from wtes_ray import pipeline as P
from wtes_ray.extract import extract_document_safe
from wtes_ray.gen import generate_batch, write_documents

N_DOCS = 30


@pytest.fixture(scope="module")
def docs_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    path = str(d / "docs.parquet")
    write_documents(path, N_DOCS, giant_fraction=0.05)
    return path


@pytest.fixture(scope="module")
def extracted(ray_session, docs_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "extracted")
    summary = P.run_extract_pipeline(docs_path, out, num_partitions=4,
                                     max_spans_per_chunk=8, batch_size=8,
                                     concurrency=2)
    return out, summary


def _oracle_results():
    tbl = generate_batch(range(N_DOCS), giant_fraction=0.05)
    out = {}
    for row in tbl.to_pylist():
        r = extract_document_safe(row["doc_id"], row["spans"])
        out[row["doc_id"]] = r
    return out


def test_pipeline_matches_oracle(extracted):
    """North-rule gate: per-row span-sequence equality (kind, text,
    media_ref, order) between the Ray pipeline and the oracle."""
    out, summary = extracted
    assert summary["n_docs"] == N_DOCS
    assert summary["n_errors"] == 0
    oracle = _oracle_results()
    rows = P.load_extracted(out).take_all()
    assert len(rows) == N_DOCS
    for row in rows:
        exp = oracle[row["doc_id"]]
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in row["spans"]]
        assert got == exp.spans, f"spans differ for {row['doc_id']}"
        assert json.loads(row["entities_json"]) == exp.entities
        assert json.loads(row["relations_json"]) == exp.relations


def test_manifests_written(extracted):
    out, _ = extracted
    parts = P.completed_parts(out)
    assert len(parts) == 4
    man = json.load(open(os.path.join(out, "_manifests", "part-00000.json")))
    assert {"part", "n_docs", "n_spans", "content_hash",
            "lineage"} <= set(man)


def test_resume_skips_and_reproduces(ray_session, docs_path, extracted,
                                     tmp_path):
    out, _ = extracted
    dst = str(tmp_path / "resume")
    shutil.copytree(out, dst)
    before = {r["doc_id"]: r for r in P.load_extracted(dst).take_all()}
    shutil.rmtree(os.path.join(dst, "part=00002"))
    os.remove(os.path.join(dst, "_manifests", "part-00002.json"))
    s = P.run_extract_pipeline(docs_path, dst, num_partitions=4,
                               max_spans_per_chunk=8, batch_size=8,
                               concurrency=2, resume=True)
    assert s["n_parts_skipped"] == 3
    after = {r["doc_id"]: r for r in P.load_extracted(dst).take_all()}
    assert set(after) == set(before)
    for k in after:
        assert after[k]["spans"] == before[k]["spans"]


def test_resume_with_different_partition_count_rebuilds(ray_session,
                                                        docs_path, extracted,
                                                        tmp_path):
    """Resuming with a different num_partitions must NOT trust the old
    skip-set (different doc_id→part mapping ⇒ duplicate rows); the
    checkpoint is swept and rebuilt (review finding, reproduced)."""
    out, _ = extracted                     # built with num_partitions=4
    dst = str(tmp_path / "nparts")
    shutil.copytree(out, dst)
    s = P.run_extract_pipeline(docs_path, dst, num_partitions=8,
                               max_spans_per_chunk=8, batch_size=8,
                               resume=True)
    assert s["n_parts_skipped"] == 0
    assert s["n_docs"] == N_DOCS
    assert P.load_extracted(dst).count() == N_DOCS    # no duplicates


def test_load_extracted_all_chunked(ray_session, docs_path, tmp_path):
    """A corpus where EVERY doc is salted (tiny max_spans_per_chunk) has no
    singles shard files; load_extracted must reassemble, not crash
    (review finding, reproduced)."""
    out = str(tmp_path / "allchunk")
    s = P.run_extract_pipeline(docs_path, out, num_partitions=2,
                               max_spans_per_chunk=2, batch_size=8)
    assert s["n_docs"] == N_DOCS
    assert P.load_extracted(out).count() == N_DOCS


def test_knowledge_graph_rerun_no_duplication(ray_session, docs_path,
                                              tmp_path):
    """build_knowledge_graph rerun into the same out_dir must not append
    duplicate edges/nodes files (review finding, reproduced)."""
    kg = str(tmp_path / "kg")
    s1 = P.build_knowledge_graph(docs_path, kg, num_partitions=4,
                                 max_spans_per_chunk=8, batch_size=8)
    s2 = P.build_knowledge_graph(docs_path, kg, num_partitions=4,
                                 max_spans_per_chunk=8, batch_size=8,
                                 resume=True)
    assert s1["n_edges"] == s2["n_edges"]
    assert s1["n_nodes"] == s2["n_nodes"]


def test_quarantine_rows_flow_through_pipeline(ray_session, tmp_path):
    """A poison document is quarantined (error row in the checkpoint) while
    healthy docs extract normally — no task failure, no dropped rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wtes_ray.gen import generate_batch
    from wtes_ray.schema import SPAN_STRUCT

    good = generate_batch(range(5))
    poison = pa.table({
        "doc_id": pa.array(["https://x/item/poison/1"], pa.string()),
        "spans": pa.array([[{"kind": "html", "text": None,
                             "media_ref": "", "offset": 0}]],
                          pa.list_(SPAN_STRUCT)),
    })
    docs = pa.concat_tables([good, poison])
    path = str(tmp_path / "poison.parquet")
    pq.write_table(docs, path)
    out = str(tmp_path / "out")
    s = P.run_extract_pipeline(path, out, num_partitions=2, batch_size=2)
    assert s["n_docs"] == 6
    assert s["n_errors"] == 1
    rows = {r["doc_id"]: r for r in P.load_extracted(out).take_all()}
    assert rows["https://x/item/poison/1"]["error"] != ""
    assert sum(1 for r in rows.values() if r["error"] == "") == 5
    assert all(r["n_spans"] > 0 for d, r in rows.items()
               if not d.endswith("poison/1"))


def test_actor_pool_path_matches(ray_session, docs_path, extracted, tmp_path):
    """The ExtractChunks actor-pool variant (use_actors=True — for
    expensive-state stages) produces identical output to the task path."""
    out, _ = extracted
    alt = str(tmp_path / "actors")
    P.run_extract_pipeline(docs_path, alt, num_partitions=4,
                           max_spans_per_chunk=8, batch_size=8,
                           use_actors=True, concurrency=2)
    a = {r["doc_id"]: r["spans"] for r in P.load_extracted(out).take_all()}
    b = {r["doc_id"]: r["spans"] for r in P.load_extracted(alt).take_all()}
    assert a == b


def test_rerun_without_resume_overwrites_cleanly(ray_session, docs_path,
                                                 extracted, tmp_path):
    """A fresh (non-resume) run into an existing out_dir must sweep the old
    checkpoint — stale shards from a different batch grouping would read as
    duplicate rows."""
    out, _ = extracted
    dst = str(tmp_path / "rerun")
    shutil.copytree(out, dst)
    # different batch/partition grouping than the fixture run
    s = P.run_extract_pipeline(docs_path, dst, num_partitions=4,
                               max_spans_per_chunk=16, batch_size=4)
    assert s["n_docs"] == N_DOCS
    assert P.load_extracted(dst).count() == N_DOCS


def test_deterministic_across_parallelism(ray_session, docs_path, extracted,
                                          tmp_path):
    """SURVEY §5.2(3): identical per-doc output regardless of batch size /
    chunking / partition count."""
    out, _ = extracted   # P=4, chunk=8, batch=8
    alt = str(tmp_path / "alt")
    P.run_extract_pipeline(docs_path, alt, num_partitions=7,
                           max_spans_per_chunk=5, batch_size=3)
    a = {r["doc_id"]: r for r in P.load_extracted(out).take_all()}
    b = {r["doc_id"]: r for r in P.load_extracted(alt).take_all()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["spans"] == b[k]["spans"]
        assert a[k]["entities_json"] == b[k]["entities_json"]
        assert a[k]["relations_json"] == b[k]["relations_json"]


def test_layout_version_guard(ray_session, docs_path, extracted, tmp_path):
    """A checkpoint from another layout version must not be silently read
    (a v1 checkpoint read by the v2 reader produced duplicate rows) and a
    resume must rebuild it from scratch."""
    import json as _json

    out, _ = extracted
    dst = str(tmp_path / "stale")
    shutil.copytree(out, dst)
    with open(os.path.join(dst, "_format.json"), "w") as f:
        _json.dump({"layout_version": 1}, f)
    with pytest.raises(ValueError, match="layout version"):
        P.load_extracted(dst)
    assert P.completed_parts(dst) == frozenset()
    s = P.run_extract_pipeline(docs_path, dst, num_partitions=4,
                               max_spans_per_chunk=8, batch_size=8,
                               resume=True)
    assert s["n_parts_skipped"] == 0           # nothing trusted, all redone
    assert s["n_docs"] == N_DOCS
    assert P.load_extracted(dst).count() == N_DOCS


def test_relations_dedup(ray_session, extracted):
    out, _ = extracted
    rels = P.relations_dataset(P.load_extracted(out))
    df = rels.to_pandas()
    dd = P.dedup_relations(
        P.relations_dataset(P.load_extracted(out))).to_pandas()
    key = ["s_name", "s_url", "rel", "o_name", "o_url"]
    exp = df.sort_values("doc_id").drop_duplicates(key, keep="first")
    assert len(dd) == len(exp)
    got = dd.sort_values(key).reset_index(drop=True)[key + ["doc_id"]]
    want = exp.sort_values(key).reset_index(drop=True)[key + ["doc_id"]]
    assert got.equals(want)


def test_csv_triple_sink(ray_session, extracted, tmp_path):
    """S9: deduped relation triples → CSV sink (FileIO.writeTriad2csv
    analog, reference FileIO.py:144-155)."""
    import csv
    import os as _os

    out, _ = extracted
    rels = P.dedup_relations(P.relations_dataset(P.load_extracted(out)))
    d = str(tmp_path / "triples")
    rels.write_csv(d)
    rows = []
    for f in _os.listdir(d):
        with open(_os.path.join(d, f), newline="", encoding="utf-8") as fh:
            r = csv.DictReader(fh)
            rows.extend(r)
    assert len(rows) == rels.count()
    assert {"s_name", "rel", "o_name"} <= set(rows[0])


def test_input_schema_validated(ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from wtes_ray.pipeline import split_and_key

    # validate() is validate-AND-CAST: castable drift is repaired, a missing
    # column is a hard stage-boundary error
    bad = pa.table({"doc_id": pa.array(["a"], pa.string())})
    with _pytest.raises(ValueError, match="schema mismatch"):
        split_and_key(bad, num_partitions=4)
    # incompatible nested payload also fails
    bad2 = pa.table({
        "doc_id": pa.array(["a"], pa.string()),
        "spans": pa.array([[{"x": 1}]],
                          pa.list_(pa.struct([("x", pa.int32())])))})
    with _pytest.raises(ValueError, match="schema mismatch"):
        split_and_key(bad2, num_partitions=4)


def test_nodes_fusion(ray_session, extracted):
    out, _ = extracted
    ents = P.entities_dataset(P.load_extracted(out))
    nodes = P.build_nodes(ents).take_all()
    assert len(nodes) > 0
    # driver-side check: group and fuse with the same pure function
    from wtes_ray.fusion import fuse_entity_group
    rows = P.entities_dataset(P.load_extracted(out)).take_all()
    groups = {}
    for r in rows:
        r = dict(r)
        r["props"] = dict(r["props"])
        groups.setdefault(r["subject"], []).append(r)
    expect = []
    for g in groups.values():
        expect.extend(fuse_entity_group(g))
    exp_key = {(n["name"], n["url"]): n["props"] for n in expect}
    got_key = {(n["name"], n["url"]): dict(n["props"]) for n in nodes}
    assert got_key == exp_key


def test_nodes_fusion_hot_subject_across_blocks(ray_session):
    """Hot-name salting: ONE subject spanning many blocks (the 100 TB skew
    case) must fuse identically to the sequential reference fold."""
    import ray.data

    import pandas as _pd
    from wtes_ray.fusion import fuse_entity_group

    rows = []
    # 400 entities for one hot subject over a handful of url classes with
    # interleaved prop priority, plus a cold subject as a control
    urls = ["http://hot/a", "http://hot/a/b", "", "http://other",
            "http://hot"]
    for i in range(400):
        rows.append({"doc_id": f"d{i:04d}", "seq": i, "subject": "热门",
                     "subject_url": urls[i % len(urls)],
                     "props": [(f"k{i % 7}", f"v{i}")]})
    rows.append({"doc_id": "x", "seq": 0, "subject": "冷门",
                 "subject_url": "http://cold", "props": [("a", "1")]})
    ds = ray.data.from_pandas(_pd.DataFrame(rows)).repartition(16)

    got = P.build_nodes(ds, salt_buckets=4).take_all()
    expect = []
    for subj in ("热门", "冷门"):
        g = [dict(r, props=dict(r["props"])) for r in rows
             if r["subject"] == subj]
        expect.extend(fuse_entity_group(g))
    exp_key = {(n["name"], n["url"]): (n["props"], n["n_sources"])
               for n in expect}
    got_key = {(n["name"], n["url"]): (dict(n["props"]), n["n_sources"])
               for n in got}
    assert got_key == exp_key
    assert len(got) == len(expect)


def test_load_extracted_is_manifest_driven(ray_session, extracted):
    """Layout v3: the reader builds its file list from manifest lineage —
    an orphan parquet dropped into a part dir (e.g. from a crashed writer
    that never committed) is INVISIBLE, not double-counted."""
    import pyarrow.parquet as pq

    out, _ = extracted
    n_before = P.load_extracted(out).count()
    part_dir = next(os.path.join(out, d) for d in sorted(os.listdir(out))
                    if d.startswith("part="))
    legit = next(f for f in os.listdir(part_dir) if f.endswith(".parquet")
                 and not f.endswith("-chunks.parquet"))
    orphan = os.path.join(part_dir, "shard-deadbeefdeadbeef.parquet")
    shutil.copyfile(os.path.join(part_dir, legit), orphan)
    try:
        assert P.load_extracted(out).count() == n_before
        # sanity: the orphan rows WOULD have inflated a directory listing
        assert pq.ParquetFile(orphan).metadata.num_rows > 0
    finally:
        os.remove(orphan)


def test_read_documents_lance_gate(ray_session):
    """.lance paths route to the Lance reader; absent pylance → a clear
    ImportError, not a deep stack failure (import-gated source)."""
    try:
        import lance  # noqa: F401
        pytest.skip("pylance present — gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="pylance"):
        P.read_documents("/tmp/whatever.lance")


def test_compact_checkpoint_preserves_reads_and_resume(
        ray_session, docs_path, tmp_path_factory):
    """Compaction must reduce file count, leave load_extracted output
    row-identical (spans, entities, relations), keep the partitions
    'complete' for resume, and be idempotent."""
    dst = str(tmp_path_factory.mktemp("compact") / "ext")
    P.run_extract_pipeline(docs_path, dst, num_partitions=2,
                           max_spans_per_chunk=8, batch_size=4,
                           writer_batch_size=4,
                           concurrency=2)   # tiny writer batches → many shards

    def snapshot():
        rows = P.load_extracted(dst).take_all()
        return sorted(
            ((r["doc_id"],
              tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in r["spans"]),
              r["entities_json"], r["relations_json"]) for r in rows))

    def n_files():
        return sum(len(os.listdir(os.path.join(dst, d)))
                   for d in os.listdir(dst) if d.startswith("part="))

    before = snapshot()
    nf_before = n_files()
    res = P.compact_checkpoint(dst, target_rows_per_file=100_000)
    assert res["parts_compacted"] >= 1
    assert res["files_after"] < res["files_before"]
    assert n_files() < nf_before
    assert snapshot() == before                      # read equality
    assert P.completed_parts(dst, 2) == frozenset({0, 1})   # resume intact

    # idempotent: a second pass finds nothing to merge
    res2 = P.compact_checkpoint(dst)
    assert res2["parts_compacted"] == 0
    assert snapshot() == before

    # target splitting: a tiny target yields multiple content-named files
    res3 = P.compact_checkpoint(dst, target_rows_per_file=5)
    assert res3["files_after"] >= res3["parts"]
    assert snapshot() == before
