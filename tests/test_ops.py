"""Training-data ops tests (wtes_ray.ops.*) — dedup, similarity, text,
multimodal plumbing."""
import hashlib

import numpy as np
import pandas as pd
import pytest

from wtes_ray.ops import dedup as D
from wtes_ray.ops import similarity as S
from wtes_ray.ops import text as T
from wtes_ray.ops.multimodal import media_feature_pipeline


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep dark forest tonight")
    rows = []
    for i in range(20):
        if i in (5, 6):            # exact duplicates of doc 0
            text = base
        elif i == 7:               # near duplicate (one word changed)
            text = base.replace("dark", "damp")
        elif i == 0:
            text = base
        else:
            text = f"document number {i} " + " ".join(
                f"tok{i}_{j}" for j in range(30))
        rows.append({"doc_id": i, "text": text})
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_exact_dedup(docs_ds):
    out = D.exact_dedup(docs_ds).to_pandas()
    assert len(out) == 18            # 20 docs, 3 identical → keep 1
    assert 0 in set(out["doc_id"])   # min id kept
    assert not {5, 6} & set(out["doc_id"])


def test_exact_dedup_ids(docs_ds):
    out = D.exact_dedup_ids(docs_ds).to_pandas()
    assert len(out) == 18
    assert 0 in set(out["doc_id"]) and not {5, 6} & set(out["doc_id"])
    assert list(out.columns) == ["doc_id"]   # no text in the output/shuffle


def test_verify_pairs_jaccard_missing_text_is_zero(ray_session, docs_ds):
    """Pairs whose ids are absent from the corpus (or empty texts) must
    verify at 0.0, not spuriously at 1.0 (review finding)."""
    import ray.data

    bogus = ray.data.from_pandas(pd.DataFrame(
        {"a": [990], "b": [991], "est_jaccard": [1.0],
         "truncated": [False]}))
    verified = D.verify_pairs_jaccard(bogus, docs_ds,
                                      threshold=0.01).to_pandas()
    assert len(verified) == 0


def test_minhash_lsh_finds_near_dups(docs_ds):
    pairs = D.minhash_lsh_pairs(docs_ds, threshold=0.6,
                                concurrency=1).to_pandas()
    got = {tuple(p) for p in pairs[["a", "b"]].itertuples(index=False)}
    # the exact-dup cluster {0,5,6} must all pair up; near-dup 7 joins it
    assert {(0, 5), (0, 6), (5, 6)} <= got
    assert any(7 in p for p in got)
    # unrelated docs don't pair
    assert all({a, b} <= {0, 5, 6, 7} for a, b in got)


def test_simhash_pairs(docs_ds):
    pairs = D.simhash_pairs(docs_ds, concurrency=1).to_pandas()
    got = {tuple(p) for p in pairs[["a", "b"]].itertuples(index=False)}
    assert {(0, 5), (0, 6), (5, 6)} <= got
    assert all({a, b} <= {0, 5, 6, 7} for a, b in got)


def test_verify_pairs_jaccard(docs_ds):
    pairs = D.minhash_lsh_pairs(docs_ds, threshold=0.6, concurrency=1)
    verified = D.verify_pairs_jaccard(pairs, docs_ds,
                                      threshold=0.9).to_pandas()
    got = {tuple(p) for p in verified[["a", "b"]].itertuples(index=False)}
    assert {(0, 5), (0, 6), (5, 6)} <= got
    exact = verified[(verified.a == 0) & (verified.b == 5)]
    assert float(exact["jaccard"].iloc[0]) == 1.0


def test_verify_paths_equal(docs_ds):
    """The broadcast arm (budget cutover) and the two-join arm of
    verify_pairs_jaccard return the same verified pair set, values and
    columns — including the drop-unverifiable contract (one bogus id)."""
    import ray.data

    pairs = D.minhash_lsh_pairs(docs_ds, threshold=0.6, concurrency=1) \
        .to_pandas()
    pairs = pd.concat([pairs, pd.DataFrame(
        {"a": [990], "b": [991], "est_jaccard": [1.0],
         "truncated": [False]})], ignore_index=True)
    src = ray.data.from_pandas(pairs)

    def run(budget):
        df = D.verify_pairs_jaccard(src, docs_ds, threshold=0.5,
                                    broadcast_rows_budget=budget) \
            .to_pandas()
        return df.sort_values(["a", "b"]).reset_index(drop=True)

    bcast, joined = run(100_000), run(0)
    assert list(bcast.columns) == list(joined.columns)
    pd.testing.assert_frame_equal(bcast, joined)
    assert len(bcast) > 0 and 990 not in set(bcast["a"])


def test_word_jaccard_kernel():
    # bigrams of "the cat sat on the mat" vs "the cat sat on a mat":
    # shared {the cat, cat sat, sat on}, union size 7 → 3/7
    assert D._word_jaccard("the cat sat on the mat",
                           "the cat sat on a mat", 2) == 3 / 7
    # tokenizer is ASCII-pinned + lowercased; punctuation splits tokens
    assert D._word_jaccard("The CAT, sat!", "the cat sat", 2) == 1.0
    # fewer than n words ⇒ empty gram set ⇒ 0.0, never 1.0
    assert D._word_jaccard("one", "one", 2) == 0.0
    assert D._word_jaccard("", "anything at all", 2) == 0.0


def test_word_mode_minhash_estimates_word_jaccard():
    m = D.MinHasher(mode="word", shingle_k=2, num_perm=128)
    ta = "alpha beta gamma delta epsilon zeta eta theta " * 8
    tb = "alpha beta gamma delta epsilon zeta XX theta " * 8
    est = float((m.signature(ta) == m.signature(tb)).mean())
    true = D._word_jaccard(ta, tb, 2)
    assert abs(est - true) < 0.2
    assert (m.signature(ta) == m.signature(ta)).all()
    # short texts have NO word shingles: signature stays all-max
    assert (m.signature("one") == np.iinfo(np.uint64).max).all()


def test_ngram_jaccard_pairs_end_to_end(docs_ds):
    out = D.ngram_jaccard_pairs(docs_ds, n=2, candidate_threshold=0.5,
                                threshold=0.8, concurrency=1).to_pandas()
    got = {tuple(p) for p in out[["a", "b"]].itertuples(index=False)}
    # exact-dup cluster pairs verify at exactly 1.0
    assert {(0, 5), (0, 6), (5, 6)} <= got
    ones = out[out.b.isin([5, 6]) & (out.a == 0)]
    assert (ones["jaccard"] == 1.0).all()
    # near-dup 7 (one word changed) shares most bigrams with the cluster
    assert any(7 in p for p in got)
    # unrelated docs never verify
    assert all({a, b} <= {0, 5, 6, 7} for a, b in got)
    # threshold 1.0 reduces to the exact word-bigram-set matches only
    exact = D.ngram_jaccard_pairs(docs_ds, n=2, candidate_threshold=0.8,
                                  threshold=1.0, concurrency=1).to_pandas()
    assert {tuple(p) for p in exact[["a", "b"]].itertuples(index=False)} \
        == {(0, 5), (0, 6), (5, 6)}


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((50, 16))
    vecs[7] = vecs[3] + 0.01 * rng.standard_normal(16)   # planted near-dup
    return ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(50, dtype=np.int64),
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
    })), vecs


def test_topk_cosine_matches_numpy(emb_ds):
    ds, vecs = emb_ds
    q = vecs[3]
    out = S.topk_cosine(ds, q, k=5).to_pandas()
    mat = np.stack([np.asarray(v, np.float64) for v in
                    ds.to_pandas()["embedding"]])
    qq = q / np.linalg.norm(q)
    cos = (mat @ qq) / np.linalg.norm(mat, axis=1)
    exp = np.argsort(-cos)[:5]
    assert list(out["vec_id"]) == list(exp)
    assert np.allclose(out["cosine"], cos[exp], atol=1e-9)


def test_topk_cosine_multi_matches_single(emb_ds):
    # Batched m-query retrieval must equal m independent single-query
    # runs (same tie-break), one corpus pass or not.
    ds, vecs = emb_ds
    qids = [3, 11, 40]
    out = S.topk_cosine_multi(ds, vecs[qids], qids, k=5)
    for qid in qids:
        single = S.topk_cosine(ds, vecs[qid], k=5).to_pandas()
        got = out[out["query_id"] == qid].reset_index(drop=True)
        assert list(got["vec_id"]) == list(single["vec_id"])
        assert np.allclose(got["cosine"], single["cosine"], atol=1e-12)


def test_lsh_topk_includes_self_and_neardup(emb_ds):
    ds, vecs = emb_ds
    out = S.lsh_topk_cosine(ds, vecs[3], k=5, probe=2).to_pandas()
    assert 3 in set(out["vec_id"])           # query's own bucket
    assert 7 in set(out["vec_id"])           # planted near-dup


def test_embedding_neardup_pairs(emb_ds):
    ds, _ = emb_ds
    pairs = D.embedding_neardup_pairs(ds, threshold=0.99).to_pandas()
    assert (3, 7) in {tuple(p) for p in
                      pairs[["a", "b"]].itertuples(index=False)}


def test_neardup_clusters(ray_session):
    import ray.data

    pairs = ray.data.from_pandas(pd.DataFrame(
        {"a": [1, 2, 10], "b": [2, 3, 11]}))   # chain 1-2-3 and pair 10-11
    out = D.neardup_clusters(pairs)
    by_doc = dict(zip(out["doc_id"], out["cluster_id"]))
    assert by_doc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_neardup_clusters_distributed_chain(ray_session):
    """Min-label propagation: a chain A-B, B-C, C-D whose edges live in
    DIFFERENT blocks must still collapse to one cluster (labels propagate
    across partitions round by round), matching driver union-find."""
    import ray.data

    # chain 1-2-3-4-5 + separate pair 100-101, one edge per block
    edges = pd.DataFrame({"a": [1, 2, 3, 4, 100],
                          "b": [2, 3, 4, 5, 101]})
    pairs = ray.data.from_pandas(edges).repartition(5)
    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 100: 100, 101: 100}

    ds_out = D.neardup_clusters_ds(pairs).to_pandas()
    assert dict(zip(ds_out["doc_id"], ds_out["cluster_id"])) == want

    # dispatch wrapper forced onto the distributed path agrees too
    forced = D.neardup_clusters(pairs, driver_max_pairs=0)
    assert dict(zip(forced["doc_id"], forced["cluster_id"])) == want
    assert list(forced.columns) == ["doc_id", "cluster_id"]
    assert forced["doc_id"].is_monotonic_increasing


def test_text_scorer_and_fingerprints(docs_ds):
    scored = docs_ds.map_batches(T.TextScorer, batch_format="pandas",
                                 concurrency=1).to_pandas()
    assert {"n_tokens", "punct_ratio", "lang_id", "quality"} <= set(scored)
    row0 = scored[scored.doc_id == 0].iloc[0]
    assert row0["lang_id"] == "en"
    assert 0.0 <= row0["quality"] <= 1.0

    fp = T.fingerprints(docs_ds).to_pandas()
    texts = docs_ds.to_pandas().set_index("doc_id")["text"]
    for _, r in fp.iterrows():
        assert r["fp_md5"] == hashlib.md5(
            texts[r["doc_id"]].encode()).hexdigest()
    # identical docs share fingerprints
    assert fp.set_index("doc_id").loc[0, "fp_roll"] == \
        fp.set_index("doc_id").loc[5, "fp_roll"]


def test_token_stats(docs_ds):
    out = T.token_stats(docs_ds).to_pandas().set_index("doc_id")
    texts = docs_ds.to_pandas().set_index("doc_id")["text"]
    for i in (0, 10):
        assert out.loc[i, "n_tokens"] == len(texts[i].split())
        assert out.loc[i, "n_chars"] == len(texts[i])


def test_frontier_classification(ray_session):
    """M20/M21: URL partition semantics (reference UrlExtractor.py:23-78 +
    WebSpider.py:202-216)."""
    import ray.data

    from wtes_ray.ops.frontier import classify_urls, is_possible_url

    urls = [
        "https://baike.baidu.com/item/%E5%AD%94%E4%B8%98/1584",   # person
        "https://baike.baidu.com/item/%E6%9C%9D%E4%BB%A3",        # non-person
        "https://baike.baidu.com/item/pic/x.jpg",                 # extension
        "https://example.com/item/%E5%AD%94%E4%B8%98",            # wrong site
    ]
    assert is_possible_url(urls[0]) and is_possible_url(urls[1])
    assert not is_possible_url(urls[2]) and not is_possible_url(urls[3])
    # reference checks '.' only in the LAST segment (WebSpider.py:205-215)
    assert is_possible_url("https://baike.baidu.com/item/Web2.0/53557")
    assert not is_possible_url("http://baike.baidu.com/item/x")  # https only
    ds = ray.data.from_pandas(pd.DataFrame({"url": urls}))
    out = classify_urls(ds).to_pandas().set_index("url")["bucket"]
    assert out[urls[0]] == "useful"      # 孔丘 is in the name lexicon
    assert out[urls[1]] == "useless"     # 朝代 is a non-name token
    assert out[urls[2]] == "skip"
    assert out[urls[3]] == "skip"


def test_multimodal_pipeline(ray_session):
    import ray.data

    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": range(10)}))
    out = media_feature_pipeline(docs, concurrency=1).to_pandas()
    assert len(out) == 10
    assert out["decoded"].all()
    assert (out["width"] > 0).all()
    for f in out["features"]:
        assert abs(sum(f) - 1.0) < 1e-4   # features rounded to 6 decimals
    # deterministic across runs
    out2 = media_feature_pipeline(docs, concurrency=1).to_pandas()
    assert out.drop(columns=["features"]).equals(
        out2.drop(columns=["features"]))


def test_decode_real_image_via_pil():
    """Real-codec branch with actual PIL (skips where PIL is absent)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from wtes_ray.ops.multimodal import DecodeStub
    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    w, h, c = DecodeStub().decode_meta(buf.getvalue())
    assert (w, h, c) == (12, 7, 3)


def test_decode_pil_branch_wiring(monkeypatch):
    """The PIL dispatch path itself (header sniff → _image_open → w/h/mode),
    exercised without PIL via an injected opener."""
    from wtes_ray.ops.multimodal import DecodeStub

    class FakeImg:
        width, height, mode = 33, 21, "RGBA"

    stub = DecodeStub()
    opened = []
    stub._image_open = lambda f: (opened.append(f.read(4)), FakeImg)[1]
    assert stub.decode_meta(b"\x89PNG\r\n\x1a\nrest") == (33, 21, 4)
    assert opened[0] == b"\x89PNG"   # full payload reaches the codec

    def boom(f):
        raise OSError("cannot identify image file")
    stub._image_open = boom
    with pytest.raises(NotImplementedError, match="could not decode"):
        stub.decode_meta(b"not an image")


def test_ivf_topk_exact_when_probing_all(emb_ds):
    """nprobe == n_centroids scans everything → identical to brute force."""
    ds, vecs = emb_ds
    exact = S.topk_cosine(ds, vecs[3], k=5).to_pandas()
    ivf = S.ivf_topk_cosine(ds, vecs[3], k=5, n_centroids=8,
                            nprobe=8).to_pandas()
    assert list(ivf["vec_id"]) == list(exact["vec_id"])
    assert np.allclose(ivf["cosine"], exact["cosine"], atol=1e-12)


def test_ivf_probe_finds_self_and_neardup(emb_ds):
    ds, vecs = emb_ds
    out = S.ivf_topk_cosine(ds, vecs[3], k=5, n_centroids=8,
                            nprobe=2).to_pandas()
    got = set(out["vec_id"])
    assert 3 in got and 7 in got    # query's own list holds it + near-dup


def test_ivf_assignment_covers_all_rows(emb_ds):
    ds, _ = emb_ds
    cent = S.train_ivf_centroids(ds, n_centroids=8)
    assert cent.shape == (8, 16)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
    tagged = S.assign_ivf(ds, cent).to_pandas()
    assert len(tagged) == 50
    assert tagged["centroid_id"].between(0, 7).all()


def test_neardup_clusters_ds_max_iters_guard(ray_session):
    import ray.data

    pairs = ray.data.from_pandas(pd.DataFrame(
        {"a": [1, 2, 3, 4], "b": [2, 3, 4, 5]}))   # diameter-4 chain
    with pytest.raises(RuntimeError, match="did not converge"):
        D.neardup_clusters_ds(pairs, max_iters=1)


def test_stopword_stats(docs_ds):
    out = T.stopword_stats(docs_ds).to_pandas().set_index("doc_id")
    # doc 0 has 19 word tokens of which the×3 + and×1 are stopwords
    row0 = out.loc[0]
    assert row0["n_words"] == 19
    assert row0["n_stopwords"] == 4
    assert abs(row0["stopword_ratio"] - round(4 / 19, 6)) < 1e-9
    assert (out["n_stopwords"] <= out["n_words"]).all()


def test_video_frame_pipeline(ray_session):
    """Frame-sample → resize → decode over synthetic video payloads: one
    row per sampled frame, all resized to the target and decodable."""
    import ray.data

    from wtes_ray.ops.multimodal import (FrameSampler, ResizeStub,
                                         synth_video_batch,
                                         video_frame_pipeline)
    import pyarrow as pa

    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(12, dtype="int64")}))
    out = video_frame_pipeline(docs, stride=4, target=8,
                               concurrency=1).to_pandas()
    assert len(out) > 0
    assert (out["frame_index"] % 4 == 0).all()
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    assert out["decoded"].all() and out["resized"].all()
    # every doc contributes ceil(n_frames/4) ≥ 1 frames
    assert set(out["doc_id"]) == set(range(12))

    # determinism + per-doc frame counts match the synthetic header
    t = synth_video_batch(pa.table({"doc_id": pa.array([3], pa.int64())}))
    n = int.from_bytes(t.column("payload")[0].as_py()[8:12], "little")
    frames = FrameSampler(stride=4)(t)
    assert frames.num_rows == (n + 3) // 4

    # resize is nearest-neighbor on the synthetic buffer: spot-check shape
    r = ResizeStub(8, 8)(frames)
    p = r.column("payload")[0].as_py()
    assert int.from_bytes(p[8:12], "little") == 8
    assert len(p) == 20 + 8 * 8 * 3


def test_resize_quarantines_undecodable(ray_session):
    import pyarrow as pa

    from wtes_ray.ops.multimodal import ResizeStub
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([b"not media"], pa.binary())})
    out = ResizeStub(8, 8)(batch)
    assert out.column("resized").to_pylist() == [False]
    assert out.column("payload").to_pylist() == [b"not media"]


def test_ivf_assigned_mode_matches_unassigned(emb_ds):
    """Scale path: a pre-assigned centroid_id column gives the same probe
    results as per-batch re-assignment, without the assignment matmul."""
    ds, vecs = emb_ds
    cent = S.train_ivf_centroids(ds, n_centroids=8)
    tagged = S.assign_ivf(ds, cent)
    a = S.ivf_topk_cosine(tagged, vecs[3], k=5, centroids=cent,
                          nprobe=2, assigned=True).to_pandas()
    b = S.ivf_topk_cosine(ds, vecs[3], k=5, centroids=cent,
                          nprobe=2, assigned=False).to_pandas()
    assert list(a["vec_id"]) == list(b["vec_id"])
    assert np.allclose(a["cosine"], b["cosine"], atol=1e-12)


def test_audio_feature_pipeline(ray_session):
    import ray.data

    from wtes_ray.ops.multimodal import audio_feature_pipeline
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(8, dtype="int64")}))
    out = audio_feature_pipeline(docs, concurrency=1).to_pandas()
    assert len(out) == 8
    assert out["decoded"].all()
    # 0.25–1 s clips of a bounded-amplitude tone+noise mix
    assert out["duration_s"].between(0.25, 1.0).all()
    assert (out["rms"] > 0).all() and (out["rms"] < 1).all()
    assert (out["zcr"] > 0).all()
    # deterministic across runs
    again = audio_feature_pipeline(docs, concurrency=1).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))


def test_audio_features_quarantine(ray_session):
    import pyarrow as pa

    from wtes_ray.ops.multimodal import AudioFeatures
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([b"garbage"], pa.binary())})
    out = AudioFeatures()(batch)
    assert out.column("decoded").to_pylist() == [False]


def test_audio_corrupt_header_quarantines(ray_session):
    import pyarrow as pa

    from wtes_ray.ops.multimodal import AudioFeatures
    # magic alone (header parses as sr=0, n=0) must NOT read as a valid
    # silent clip
    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "payload": pa.array([b"WTESAUD1", b"WTESAUD1" + b"\x00" * 8],
                                          pa.binary())})
    out = AudioFeatures()(batch)
    assert out.column("decoded").to_pylist() == [False, False]


def test_ivf_assigned_requires_centroids(emb_ds):
    ds, vecs = emb_ds
    with pytest.raises(ValueError, match="assigned=True requires"):
        S.ivf_topk_cosine(ds, vecs[3], assigned=True)


def test_dedup_filter_join_path_matches_broadcast(ray_session, docs_ds):
    pairs = D.minhash_lsh_pairs(docs_ds, threshold=0.6, concurrency=1)
    pairs = pairs.materialize()
    kept_b = sorted(D.dedup_filter(docs_ds, pairs)
                    .to_pandas()["doc_id"])
    kept_j = sorted(D.dedup_filter(docs_ds, pairs, use_join=True)
                    .to_pandas()["doc_id"])
    assert kept_j == kept_b
    assert 0 in kept_j and not {5, 6} & set(kept_j)


def test_repetition_stats_hand_computed(ray_session):
    import ray.data as rd

    texts = {
        0: "a b a b a b",          # 6 toks, 2 distinct; top bigram "a b"×3/5
        1: "x y z x y z x y z",    # 9 toks; top trigram "x y z"×3/7
        2: "only",                 # 1 token: no n-grams
        3: "",                     # empty
        4: "Mixed CASE mixed case",  # lowercased: 2 distinct of 4
    }
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    out = T.repetition_stats(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 6
    assert out.loc[0, "distinct_ratio"] == round(2 / 6, 6)
    assert out.loc[0, "top_bigram_frac"] == round(3 / 5, 6)
    assert out.loc[0, "top_trigram_frac"] == round(2 / 4, 6)  # "a b a"×2
    assert out.loc[1, "top_trigram_frac"] == round(3 / 7, 6)
    assert out.loc[2].tolist() == [1, 1.0, 0.0, 0.0]
    assert out.loc[3].tolist() == [0, 0.0, 0.0, 0.0]
    assert out.loc[4, "distinct_ratio"] == 0.5


def test_semantic_dedup_keep_rule(ray_session):
    import ray.data as rd

    from wtes_ray.ops.dedup import semantic_dedup

    # two well-separated directions; ids interleaved across the groups so
    # "lowest id survives" is exercised within each cluster
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    rows = [
        (0, a), (2, a * 3.0), (4, a + 1e-9),        # group A: keep 0 only
        (1, b), (3, b * 0.5),                        # group B: keep 1 only
        (5, np.array([0.7, 0.7, 0.0])),              # diagonal: kept
    ]
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1].tolist() for r in rows]}))
    out = semantic_dedup(ds, n_clusters=3, threshold=0.999,
                         train_size=6, seed=3).to_pandas() \
        .set_index("vec_id")
    assert bool(out.loc[0, "keep"]) and bool(out.loc[1, "keep"])
    assert not out.loc[2, "keep"] and not out.loc[4, "keep"]
    assert not out.loc[3, "keep"] or out.loc[3, "centroid_id"] != \
        out.loc[1, "centroid_id"]   # same-direction pair co-clusters here
    assert not out["truncated"].any()
    assert len(out) == 6


def test_semantic_dedup_truncation_flag(ray_session):
    import ray.data as rd

    from wtes_ray.ops.dedup import semantic_dedup

    # 30 identical vectors, one cluster, cap at 10: ids 1..9 drop (dup of
    # 0), ids 10+ are beyond the cap → keep=True but truncated flagged
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(30, dtype=np.int64),
         "embedding": [[1.0, 2.0]] * 30}))
    out = semantic_dedup(ds, n_clusters=1, threshold=0.99,
                         max_cluster=10).to_pandas().set_index("vec_id")
    assert out["truncated"].all()
    assert bool(out.loc[0, "keep"])
    assert not out.loc[1:9, "keep"].any()
    assert out.loc[10:, "keep"].all()


def test_cross_doc_ngram_stats_hand_computed(ray_session):
    import ray.data as rd

    from wtes_ray.ops.text import cross_doc_ngram_stats

    texts = {
        0: "a b c d e x y z w q",        # grams: 6; shares "a b c d e" w/ 1
        1: "p a b c d e r s t",          # 5 grams; 1 shared
        2: "one two three four",         # <5 tokens → no row
        3: "a b c d e a b c d e a",      # overlapping repeats of the gram
    }
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    out = cross_doc_ngram_stats(ds, n=5, min_docs=2).to_pandas() \
        .set_index("doc_id")
    assert 2 not in out.index
    assert out.loc[0, "n_grams"] == 6 and out.loc[0, "n_dup_grams"] == 1
    assert out.loc[1, "n_grams"] == 5 and out.loc[1, "n_dup_grams"] == 1
    # doc 3: 7 gram positions; "a b c d e" occurs at pos 0 and 5 (count 2)
    assert out.loc[3, "n_grams"] == 7 and out.loc[3, "n_dup_grams"] == 2
    assert out.loc[3, "dup_frac"] == round(2 / 7, 6)


def test_label_centroids_match_dense_mean(ray_session):
    import ray.data as rd

    from wtes_ray.ops.similarity import label_centroids

    rng = np.random.RandomState(5)
    labs = rng.randint(0, 3, 40)
    vecs = rng.randn(40, 6)
    ds = rd.from_pandas(pd.DataFrame(
        {"label": labs, "embedding": [v.tolist() for v in vecs]})) \
        .repartition(5)
    out = label_centroids(ds).to_pandas() \
        .sort_values(["label", "dim"]).reset_index(drop=True)
    assert len(out) == 3 * 6
    for lab in range(3):
        want = vecs[labs == lab].mean(axis=0)
        got = out.loc[out["label"] == lab].sort_values("dim")[
            "centroid"].to_numpy()
        np.testing.assert_allclose(got, want, atol=1e-12)
    assert out["dim"].min() == 1 and out["dim"].max() == 6


def test_kmeans_lloyd_matches_dense_reference(ray_session):
    import ray.data as rd

    from wtes_ray.ops.similarity import kmeans_lloyd

    rng = np.random.RandomState(9)
    # three separated blobs + a seed set that starts badly
    vecs = np.concatenate([rng.randn(30, 4) + off
                           for off in (0.0, 6.0, -6.0)])
    ids = np.arange(len(vecs), dtype=np.int64)
    init = vecs[:3].copy()
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": [v.tolist() for v in vecs]})) \
        .repartition(6)
    assign, cent = kmeans_lloyd(ds, init, iterations=3)
    got = assign.to_pandas().sort_values("vec_id")["cluster"].to_numpy()

    # dense reference
    c = init.copy()
    for _ in range(3):
        d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for ci in range(3):
            if (lab == ci).any():
                c[ci] = vecs[lab == ci].mean(axis=0)
    d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)
    assert (got == want).all()
    np.testing.assert_allclose(cent, c, atol=1e-9)


def test_kmeans_lloyd_empty_cluster_keeps_previous_centroid(ray_session):
    import ray.data as rd

    from wtes_ray.ops.similarity import kmeans_lloyd

    vecs = np.array([[0.0, 0.0], [0.1, 0.0], [10.0, 0.0], [10.1, 0.0]])
    init = np.array([[0.0, 0.0], [10.0, 0.0], [99.0, 99.0]])  # c2 never wins
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(4, dtype=np.int64),
         "embedding": [v.tolist() for v in vecs]}))
    _, cent = kmeans_lloyd(ds, init, iterations=2)
    np.testing.assert_allclose(cent[2], [99.0, 99.0])
    np.testing.assert_allclose(cent[0], [0.05, 0.0])
    np.testing.assert_allclose(cent[1], [10.05, 0.0])


def test_chunk_documents_windows(ray_session):
    import ray.data as rd

    from wtes_ray.ops.text import chunk_documents

    docs = pd.DataFrame({
        "doc_id": np.int64([1, 2, 3, 4]),
        "text": ["abcdefghij",  # 10 chars: chunks at 0,4,8
                 "xy",          # shorter than window: one chunk
                 "",            # empty: none
                 None]})        # null: none
    out = chunk_documents(rd.from_pandas(docs), window=6, stride=4) \
        .to_pandas().sort_values(["doc_id", "chunk_id"])
    got = list(zip(out["doc_id"], out["chunk_id"], out["chunk"]))
    assert got == [(1, 0, "abcdef"), (1, 1, "efghij"), (1, 2, "ij"),
                   (2, 0, "xy")]


def test_redact_pii_counts_and_order(ray_session):
    import ray.data as rd

    from wtes_ray.ops.text import redact_pii

    docs = pd.DataFrame({
        "doc_id": np.int64([1, 2, 3]),
        "text": ["mail a.b@c.org and a.b@c.org again",
                 "call +1 555-123-4567 or ping 10.0.0.1",
                 "clean text, no pii"]})
    out = redact_pii(rd.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "clean_text"] == "mail <EMAIL> and <EMAIL> again"
    assert out.loc[0, ["n_email", "n_phone", "n_ip"]].tolist() == [2, 0, 0]
    assert out.loc[1, "clean_text"] == "call <PHONE> or ping <IP>"
    assert out.loc[1, ["n_email", "n_phone", "n_ip"]].tolist() == [0, 1, 1]
    assert out.loc[2, "clean_text"] == "clean text, no pii"


def test_char_bigram_lm_hand_computed(ray_session):
    import math

    import ray.data as rd

    from wtes_ray.ops.text import (score_char_bigram_lm,
                                   train_char_bigram_lm)

    docs = pd.DataFrame({"doc_id": np.int64([1, 2, 3, 4]),
                         "text": ["abab", "ab", "x", None]})
    ds = rd.from_pandas(docs).repartition(2)
    cb, cu, V = train_char_bigram_lm(ds)

    def bid(a, b):
        return ord(a) * 0x110000 + ord(b)

    assert cb == {bid("a", "b"): 3, bid("b", "a"): 1}
    assert cu == {ord("a"): 3, ord("b"): 1}
    assert V == 2

    out = score_char_bigram_lm(ds, (cb, cu, V)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # "x"/None emit nothing (no bigrams)
    assert out["doc_id"].tolist() == [1, 2]
    want_2 = round(math.log(4 / 5), 6)
    want_1 = round((2 * math.log(4 / 5) + math.log(2 / 3)) / 3, 6)
    assert out["logprob"].tolist() == [want_1, want_2]


def test_pq_codes_match_dense_per_subspace(ray_session):
    import ray.data as rd

    from wtes_ray.ops.similarity import pq_codes, pq_decode

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 8)
    ids = np.arange(60, dtype=np.int64)
    init = vecs[:3].copy()
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": [v.tolist() for v in vecs]})) \
        .repartition(5)
    codes_ds, books = pq_codes(ds, init, m=2, iterations=2)
    got = codes_ds.to_pandas().pivot(index="vec_id", columns="sub",
                                     values="code").to_numpy()
    assert books.shape == (2, 3, 4)

    # dense reference: independent Lloyd's per 4-dim subspace
    want = np.zeros((60, 2), dtype=np.int64)
    ref_books = []
    for s in range(2):
        x = vecs[:, s * 4:(s + 1) * 4]
        c = init[:, s * 4:(s + 1) * 4].copy()
        for _ in range(2):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            lab = d.argmin(axis=1)
            for ci in range(3):
                if (lab == ci).any():
                    c[ci] = x[lab == ci].mean(axis=0)
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        want[:, s] = d.argmin(axis=1)
        ref_books.append(c)
    assert (got == want).all()
    np.testing.assert_allclose(books, np.stack(ref_books), atol=1e-9)

    # reconstruction = per-row concatenation of chosen centroids, and it
    # is closer (in its subspace) than any other centroid choice
    rec = pq_decode(want, books)
    assert rec.shape == (60, 8)
    np.testing.assert_allclose(rec[:, :4], books[0][want[:, 0]])


def test_event_transitions_logic_hand_computed(ray_session):
    import ray.data as rd

    from wtes_ray.ops.dedup import _grouped_exchange

    # same block function the event_transitions query uses, pinned on a
    # hand-traced frame: per-user (ts, id)-ordered successor pairs only
    ev = pd.DataFrame({
        "user_id": np.int64([1, 1, 1, 2, 2, 3]),
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:05",
                              "2024-01-01 00:01", "2024-01-01 09:00",
                              "2024-01-01 08:00", "2024-01-01 10:00"]),
        "event_id": np.int64([1, 2, 3, 4, 5, 6]),
        "event_type": ["a", "b", "c", "x", "y", "z"]})

    def block(g):
        import pyarrow as _pa
        g = g.sort_values(["user_id", "ts", "event_id"])
        nxt = g["event_type"].shift(-1)
        same = g["user_id"].eq(g["user_id"].shift(-1))
        p = pd.DataFrame({"event_type": g["event_type"],
                          "next_type": nxt})[same]
        return _pa.Table.from_pandas(
            p.groupby(["event_type", "next_type"], as_index=False)
            .size().rename(columns={"size": "n"}), preserve_index=False)

    out = _grouped_exchange(rd.from_pandas(ev).repartition(3),
                            "user_id", block).to_pandas()
    got = {(r.event_type, r.next_type): r.n for r in out.itertuples()}
    # user 1 ordered by ts: a(00:00) -> c(00:01) -> b(00:05);
    # user 2: y(08:00) -> x(09:00); user 3: single event, no pair
    assert got == {("a", "c"): 1, ("c", "b"): 1, ("y", "x"): 1}
