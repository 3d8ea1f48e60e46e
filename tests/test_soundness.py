"""One-sided soundness checks for the rows-only queries (VERDICT r4 #3).

The LSH/ANN candidate-set queries can't have full SQL oracles (recall < 1
by construction), but every RETURNED row's reported VALUE is exactly
recomputable from the raw tables. Each test here runs the registry query
at sf0.001 and re-derives each returned row's value independently (pure
numpy/python over the parquet bytes, through the property-pinned scalar
kernels — NOT through the distributed pipeline under test), so a pipeline
that reports a wrong pair, a wrong estimate, or a corrupted row fails
loudly even though the candidate SET is allowed to under-recall.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry(ray_session):
    from wtes_ray.queries import REGISTRY
    return {k: v[0] for k, v in REGISTRY.items()}


@pytest.fixture(scope="module")
def planted_texts():
    """The _docs_with_planted_dups corpus as a plain dict id→text."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    m = dict(zip(ids, texts))
    for i in sorted(ids)[:20]:
        m[i + 10**12] = m[i]
    return m


@pytest.fixture(scope="module")
def embeddings():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    return {v: np.asarray(e, dtype=np.float64)
            for v, e in zip(t.column("vec_id").to_pylist(),
                            t.column("embedding").to_pylist())}


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


# --- pair queries: recompute each returned pair's value ---------------------

def test_minhash_neardup_sound(registry, planted_texts):
    from wtes_ray.ops.dedup import MinHasher
    out = registry["minhash_neardup_docs"](SF)
    assert len(out) > 0                      # planted dups guarantee pairs
    mh = MinHasher(num_perm=64, shingle_k=5, seed=7, mode="char")
    sig = {}
    for _, r in out.iterrows():
        for i in (r["a"], r["b"]):
            if i not in sig:
                sig[i] = mh.signature(planted_texts[i])
        est = float((sig[r["a"]] == sig[r["b"]]).mean())
        assert est >= 0.8                    # the pipeline's threshold
        assert round(est, 6) == r["est_jaccard"]


def test_simhash_neardup_sound(registry, planted_texts):
    from wtes_ray.ops.dedup import SimHasher
    out = registry["simhash_neardup_docs"](SF)
    assert len(out) > 0
    sh = SimHasher()
    fp = {}
    for _, r in out.iterrows():
        for i in (r["a"], r["b"]):
            if i not in fp:
                fp[i] = sh.simhash(planted_texts[i])
        ham = bin(fp[r["a"]] ^ fp[r["b"]]).count("1")
        assert ham <= 2                      # the pipeline's max_hamming
        assert ham == r["hamming"]


def test_jaccard_verified_sound(registry, planted_texts):
    from wtes_ray.ops.dedup import _char_jaccard
    out = registry["jaccard_verified_neardup_docs"](SF)
    assert len(out) > 0
    for _, r in out.iterrows():
        j = _char_jaccard(planted_texts[r["a"]], planted_texts[r["b"]], 5)
        assert j >= 0.95
        assert round(j, 6) == r["jaccard"]


def test_ngram_jaccard_sound(registry, planted_texts):
    from wtes_ray.ops.dedup import _word_jaccard
    out = registry["ngram_jaccard_neardup_docs"](SF)
    assert len(out) > 0
    for _, r in out.iterrows():
        j = _word_jaccard(planted_texts[r["a"]], planted_texts[r["b"]], 3)
        assert j >= 0.7
        assert j == r["jaccard"]             # query reports the raw double


def test_embedding_neardup_sound(registry, embeddings):
    out = registry["embedding_neardup"](SF)
    assert len(out) > 0
    for _, r in out.iterrows():
        va = embeddings[r["a"] % 10**12]     # planted copies share vectors
        vb = embeddings[r["b"] % 10**12]
        c = _cosine(va, vb)
        assert c >= 0.999
        assert round(c, 4) == r["cosine"]


# --- cluster queries: graph-consistency of the reported clustering ----------

def test_neardup_clusters_sound(registry, planted_texts):
    from wtes_ray.ops.dedup import MinHasher
    out = registry["neardup_clusters_docs"](SF)
    by_cluster = out.groupby("cluster_id")["doc_id"].apply(list)
    multi = {c: m for c, m in by_cluster.items() if len(m) > 1}
    assert multi                             # planted dups cluster
    mh = MinHasher(num_perm=64, shingle_k=5, seed=7, mode="char")
    sig = {}

    def s(i):
        if i not in sig:
            sig[i] = mh.signature(planted_texts[i])
        return sig[i]

    for cid, members in multi.items():
        # the representative is a member and the minimum id
        assert cid == min(members)
        # every member of a multi-cluster is a TRUE candidate of at least
        # one other member (clusters are unions of est>=0.8 edges)
        for m in members:
            assert any(float((s(m) == s(o)).mean()) >= 0.8
                       for o in members if o != m), \
                f"doc {m} has no est>=0.8 partner in cluster {cid}"


def test_dedup_filter_sound(registry):
    clusters = registry["neardup_clusters_docs"](SF)
    kept = set(registry["dedup_filter_docs"](SF)["doc_id"])
    drop = set(clusters.loc[clusters["doc_id"] != clusters["cluster_id"],
                            "doc_id"])
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    all_ids = set(t.column("doc_id").to_pylist())
    all_ids |= {i + 10**12 for i in sorted(all_ids)[:20]}
    assert kept == all_ids - drop
    # exactly one representative survives per cluster
    for cid, grp in clusters.groupby("cluster_id"):
        assert set(grp["doc_id"]) & kept == {cid}


# --- ANN top-k queries: reported scores are the exact cosines ---------------

def _check_topk(out: pd.DataFrame, embeddings, planted: bool = False):
    q = embeddings[0]
    assert len(out) == 10
    assert out["vec_id"].is_unique
    cos = []
    for _, r in out.iterrows():
        vid = r["vec_id"] % 10**12 if planted else r["vec_id"]
        c = _cosine(embeddings[vid], q)
        assert round(c, 6) == r["cosine"]
        cos.append(c)
    # reported list is internally sorted best-first
    assert all(cos[i] >= cos[i + 1] - 1e-12 for i in range(len(cos) - 1))


def test_topk_lsh_sound(registry, embeddings):
    _check_topk(registry["topk_cosine_lsh"](SF), embeddings)


def test_topk_ivf_sound(registry, embeddings):
    _check_topk(registry["topk_cosine_ivf"](SF), embeddings)


def test_topk_ivfpq_sound(registry, embeddings):
    _check_topk(registry["topk_cosine_ivfpq"](SF), embeddings)


# --- audio features: recompute from the deterministic synth -----------------

def test_media_audio_features_sound(registry):
    import pyarrow as pa

    from wtes_ray.ops.multimodal import AudioFeatures, synth_audio_batch
    out = registry["media_audio_features"](SF)
    assert len(out) > 0 and out["decoded"].all()
    ids = out["doc_id"].tolist()
    payloads = synth_audio_batch(
        pa.table({"doc_id": pa.array(ids, pa.int64())}))
    af = AudioFeatures()
    for row, p in zip(out.itertuples(),
                      payloads.column("payload").to_pylist()):
        d, r, z = af._features(p)
        assert (d, r, z) == (row.duration_s, row.rms, row.zcr)
