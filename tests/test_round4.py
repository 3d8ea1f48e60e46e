"""Round-4 pins: MinHash banding-exchange slimming (VERDICT r3 item 3),
the post-combine est_jaccard attach paths, and the derived-partsupp
TPC-H q2/q11 fill-ins."""
import numpy as np
import pandas as pd
import pytest

from wtes_ray.ops import dedup as D

SF0001 = "/root/testdata/sf0.001"


def _duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("part", "supplier", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def test_ps_rows_matches_sql_cte():
    """The derived partsupp must be BIT-EXACT equal to its SQL CTE —
    suppkey rotation, md5-derived availqty and integer-valued supplycost."""
    from wtes_ray.queries import _PS_CTE, _ps_rows

    con = _duck(SF0001)
    want = con.sql(f"WITH {_PS_CTE} SELECT * FROM ps "
                   f"ORDER BY ps_partkey, ps_suppkey").df()
    import pyarrow.parquet as pq
    keys = pq.read_table(f"{SF0001}/part.parquet",
                         columns=["p_partkey"])["p_partkey"].to_numpy()
    s_cnt = pq.ParquetFile(
        f"{SF0001}/supplier.parquet").metadata.num_rows
    got = _ps_rows(keys, s_cnt).sort_values(
        ["ps_partkey", "ps_suppkey"]).reset_index(drop=True)
    got = got[list(want.columns)]
    want = want.astype({c: got[c].dtype for c in want.columns})
    pd.testing.assert_frame_equal(got, want)
    # 4 DISTINCT suppliers per part (the rotation guarantee for S >= 4)
    assert (got.groupby("ps_partkey")["ps_suppkey"].nunique() == 4).all()


def test_duplicate_spans_hand_case(ray_session):
    """Exact substring dedup (ops/substr.py): a 6-token passage planted in
    3 of 10 docs at token position 5 → one merged span [5, 11) of 2
    windows per planted doc; strip removes exactly those tokens."""
    import ray.data as rd

    from wtes_ray.ops.substr import duplicate_spans, strip_duplicate_spans

    passage = "shared passage alpha beta gamma delta".split()
    rows = []
    for i in range(10):
        body = [f"tok{i}_{j}" for j in range(8)]
        if i in (2, 5, 7):
            body = body[:4] + passage + body[4:]
        rows.append({"doc_id": i, "text": " ".join(body)})
    ds = rd.from_pandas(pd.DataFrame(rows))

    sp = duplicate_spans(ds, min_len=5).to_pandas() \
        .sort_values(["doc_id", "start_tok"]).reset_index(drop=True)
    assert sp["doc_id"].tolist() == [2, 5, 7]
    assert sp["start_tok"].tolist() == [5] * 3
    assert sp["end_tok"].tolist() == [11] * 3
    assert sp["n_windows"].tolist() == [2] * 3

    clean = strip_duplicate_spans(ds, min_len=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(clean) == 10     # every doc emits, planted or not
    for i in range(10):
        assert clean.loc[i, "clean_text"] == " ".join(
            f"tok{i}_{j}" for j in range(8))


def test_duplicate_spans_within_doc_repeat(ray_session):
    """Within-doc repeats count toward min_count (Lee et al.: 'appears
    more than once'), and overlapping windows merge into one span."""
    import ray.data as rd

    from wtes_ray.ops.substr import duplicate_spans

    rep = "aa bb cc dd".split()
    toks = rep + ["x1", "x2", "x3"] + rep
    ds = rd.from_pandas(pd.DataFrame(
        [{"doc_id": 0, "text": " ".join(toks)},
         {"doc_id": 1, "text": "unrelated words only here"}]))
    sp = duplicate_spans(ds, min_len=4).to_pandas() \
        .sort_values(["doc_id", "start_tok"]).reset_index(drop=True)
    # the 4-gram "aa bb cc dd" occurs at pos 1 and pos 8 of doc 0 only
    assert sp["doc_id"].tolist() == [0, 0]
    assert sp["start_tok"].tolist() == [1, 8]
    assert sp["end_tok"].tolist() == [5, 12]


@pytest.fixture(scope="module")
def ivfpq_index_dir(ray_session, tmp_path_factory):
    import ray.data

    rng = np.random.RandomState(5)
    vecs = rng.standard_normal((120, 16))
    vecs[7] = vecs[3] + 0.001 * rng.standard_normal(16)
    df = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})
    d = tmp_path_factory.mktemp("ivfpq_idx")
    from wtes_ray.ops.similarity import build_ivfpq_index
    cent, books = build_ivfpq_index(
        ray.data.from_pandas(df), str(d), vecs[:8], n_centroids=4, m=4,
        train_size=120)
    return str(d), cent, books, df


def test_ivfpq_full_probe_full_rerank_equals_bruteforce(ivfpq_index_dir):
    import ray.data

    from wtes_ray.ops.similarity import ivfpq_search_index, topk_cosine

    d, cent, books, df = ivfpq_index_dir
    q = np.asarray(df["embedding"][3], dtype=np.float64)
    got = ivfpq_search_index(d, q, k=5, nprobe=4,
                             shortlist=len(df)).to_pandas()
    ref = topk_cosine(ray.data.from_pandas(df), q, 5).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  ref.reset_index(drop=True))


def test_ivfpq_layout_codes_and_pruned_probe(ivfpq_index_dir):
    import os

    import pyarrow.parquet as pq

    from wtes_ray.ops.similarity import ivfpq_search_index, pq_decode

    d, cent, books, df = ivfpq_index_dir
    assert books.shape == (4, 8, 4)          # m × k × dim/m
    parts = [p for p in os.listdir(d) if p.startswith("centroid_id=")]
    assert len(parts) >= 2
    # codes ride as m int8s per vector; quantization error is bounded
    f = os.path.join(d, parts[0],
                     sorted(os.listdir(os.path.join(d, parts[0])))[0])
    t = pq.read_table(f)
    codes = np.stack(t["codes"].to_numpy(zero_copy_only=False))
    assert codes.dtype == np.int8 and codes.shape[1] == 4
    vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
    err = np.linalg.norm(pq_decode(codes.astype(np.int64), books) - vecs,
                         axis=1)
    assert (err < np.linalg.norm(vecs, axis=1)).all()
    # nprobe=1 + small shortlist still finds the planted near-dup of vec 3
    q = np.asarray(df["embedding"][3], dtype=np.float64)
    got = ivfpq_search_index(d, q, k=2, nprobe=1, shortlist=16).to_pandas()
    assert set(got["vec_id"]) == {3, 7}


def test_neo4j_export_roundtrip(ray_session, tmp_path):
    """Header/ids round-trip of the neo4j-admin export: endpoint closure,
    fused-node-wins-over-stub, url-else-name identity, no-header shards."""
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    from wtes_ray.neo4j_io import export_neo4j_admin, read_export_csv

    nodes = rd.from_arrow(pa.table({
        "name": pa.array(["孔子", "老子"], pa.string()),
        "url": pa.array(["http://a", ""], pa.string()),
        "props": pa.array([[("朝代", "春秋")], []],
                          pa.map_(pa.string(), pa.string())),
        "n_sources": pa.array([2, 1], pa.int64())}))
    edges = rd.from_arrow(pa.table({
        "doc_id": pa.array(["d1", "d2"], pa.string()),
        "s_name": pa.array(["孔子", "孔子"], pa.string()),
        "s_url": pa.array(["http://a", "http://a"], pa.string()),
        "rel": pa.array(["弟子", "父亲"], pa.string()),
        "o_name": pa.array(["颜回", "叔梁纥"], pa.string()),
        "o_url": pa.array(["http://c", ""], pa.string())}))
    d = str(tmp_path / "exp")
    man = export_neo4j_admin(nodes, edges, d)
    assert man["nodes"] == 4 and man["relationships"] == 2

    ndf = read_export_csv(os.path.join(d, "nodes"),
                          os.path.join(d, "nodes.header.csv"))
    rdf = read_export_csv(os.path.join(d, "relationships"),
                          os.path.join(d, "relationships.header.csv"))
    ids = set(ndf["url:ID"])
    # endpoint closure: missing endpoints synthesized as stubs
    assert ids == {"http://a", "http://c", "name:老子", "name:叔梁纥"}
    assert set(rdf[":START_ID"]) <= ids and set(rdf[":END_ID"]) <= ids
    # the fused node (with props) wins over any stub for the same id
    kong = ndf[ndf["url:ID"] == "http://a"].iloc[0]
    assert json.loads(kong["props:string"]) == {"朝代": "春秋"}
    assert kong["n_sources:long"] == "2" and kong[":LABEL"] == "Entity"
    # data shards carry NO header row (the header lives in its own file)
    shard = sorted(p for p in os.listdir(os.path.join(d, "nodes"))
                   if p.endswith(".csv"))[0]
    first = open(os.path.join(d, "nodes", shard), encoding="utf-8") \
        .readline()
    assert "url:ID" not in first
    assert os.path.exists(os.path.join(d, "import.sh"))


def test_q2_q11_match_oracle_sql(ray_session):
    from wtes_ray import queries as Q

    con = _duck(SF0001)
    got2 = Q.q2_min_cost_supplier(SF0001)
    want2 = con.sql(Q.Q2_SQL).df()
    assert len(got2) > 0, "q2 filter is vacuous at sf0.001"
    pd.testing.assert_frame_equal(
        got2.reset_index(drop=True), want2.astype(got2.dtypes.to_dict()))
    got11 = Q.q11_important_stock(SF0001)
    want11 = con.sql(Q.Q11_SQL).df()
    assert len(got11) > 0, "q11 threshold is vacuous at sf0.001"
    pd.testing.assert_frame_equal(
        got11.reset_index(drop=True), want11.astype(got11.dtypes.to_dict()))


@pytest.fixture(scope="module")
def mh_docs(ray_session):
    import ray.data

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep dark forest tonight")
    rows = []
    for i in range(30):
        if i in (0, 5, 6):
            text = base
        elif i == 7:
            text = base.replace("dark", "damp")
        else:
            text = f"document number {i} " + " ".join(
                f"tok{i}_{j}" for j in range(30))
        rows.append({"doc_id": i, "text": text})
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_minhash_exchange_slim():
    """The banding exchange must carry (band, band_hash, id) ONLY — the
    64-lane signature must NOT ride it (it used to replicate ×bands)."""
    m = D.MinHasher(num_perm=64, shingle_k=5)
    batch = pd.DataFrame({"doc_id": [1, 2, 3]})
    batch = m(pd.DataFrame({"doc_id": [1, 2, 3],
                            "text": ["alpha beta gamma " * 5,
                                     "delta epsilon " * 7, "zeta " * 9]}))
    t = D._band_rows(batch, bands=16, rows_per_band=4, id_col="doc_id")
    assert t.column_names == ["band", "band_hash", "doc_id"]
    assert "sig" not in t.column_names
    # 3 fixed-width int64 columns: ~24 B/row on the exchange (the old row
    # carried 8·64 B of signature + a 16-char hex hash ≈ 550 B/row)
    assert t.nbytes / t.num_rows <= 40
    # deterministic: equal band chunks ⇒ equal band_hash
    t2 = D._band_rows(batch, bands=16, rows_per_band=4, id_col="doc_id")
    assert t.equals(t2)


def test_attach_est_driver_matches_join_path(ray_session, mh_docs):
    """est_jaccard attach: broadcast/driver path == bucketed-join path."""
    import ray.data as rd

    sigs = mh_docs.map_batches(D.MinHasher(), batch_format="pandas") \
                  .materialize()
    pairs = rd.from_pandas(pd.DataFrame({
        "a": [0, 0, 5, 0, 1],
        "b": [5, 6, 6, 7, 2],
        "truncated": [False] * 5}))
    got_drv = D._attach_est_jaccard(pairs, sigs, id_col="doc_id",
                                    threshold=0.6).to_pandas()
    got_join = D._attach_est_jaccard(pairs, sigs, id_col="doc_id",
                                     threshold=0.6,
                                     driver_max_rows=0).to_pandas()
    for df in (got_drv, got_join):
        df.sort_values(["a", "b"], inplace=True)
        df.reset_index(drop=True, inplace=True)
        df["a"] = df["a"].astype("int64")
        df["b"] = df["b"].astype("int64")
    pd.testing.assert_frame_equal(got_drv, got_join, check_like=True)
    # exact dups agree on every signature lane; unrelated (1,2) filtered out
    exact = got_drv[(got_drv.a == 0) & (got_drv.b == 5)]
    assert float(exact["est_jaccard"].iloc[0]) == 1.0
    assert not ((got_drv.a == 1) & (got_drv.b == 2)).any()


def test_minhash_broadcast_path_equal(mh_docs):
    """Round-5 cutover: the in-bucket broadcast-signature estimate path
    must produce EXACTLY the pair set + values of the slim post-attach
    path (forced via a zero broadcast budget)."""
    got_bc = D.minhash_lsh_pairs(mh_docs, threshold=0.6,
                                 concurrency=1).to_pandas()
    got_slim = D.minhash_lsh_pairs(mh_docs, threshold=0.6, concurrency=1,
                                   sig_broadcast_budget_bytes=0).to_pandas()
    for df in (got_bc, got_slim):
        df.sort_values(["a", "b"], inplace=True)
        df.reset_index(drop=True, inplace=True)
        df["a"] = df["a"].astype("int64")
        df["b"] = df["b"].astype("int64")
        df["truncated"] = df["truncated"].astype(bool)
    pd.testing.assert_frame_equal(got_bc, got_slim, check_like=True)
    assert len(got_bc) > 0


def test_minhash_pair_set_unchanged(mh_docs):
    """End-to-end pair set identical to the pre-rework semantics: the
    exact-dup triangle plus the near-dup, nothing else."""
    pairs = D.minhash_lsh_pairs(mh_docs, threshold=0.6,
                                concurrency=1).to_pandas()
    got = {tuple(p) for p in pairs[["a", "b"]].itertuples(index=False)}
    assert {(0, 5), (0, 6), (5, 6)} <= got
    assert all({a, b} <= {0, 5, 6, 7} for a, b in got)
    assert (pairs.columns == ["a", "b", "est_jaccard", "truncated"]).all()
    tri = pairs[(pairs.a.isin([0, 5])) & (pairs.b.isin([5, 6]))]
    assert (tri["est_jaccard"] == 1.0).all()


# ---------------------------------------------------------------------------
# Round-4 additions: interval join + linear classifier inference
# ---------------------------------------------------------------------------

def _iv_ds(rows, cols=("interval_id", "lo", "hi")):
    import pyarrow as pa
    import ray.data as rd
    arrs = list(zip(*rows)) if rows else [[], [], []]
    return rd.from_arrow(pa.table(
        {c: pa.array(np.asarray(v, dtype=np.int64))
         for c, v in zip(cols, arrs)}))


def test_interval_join_matches_bruteforce(ray_session):
    """Random points × random (possibly overlapping / empty / point-width)
    intervals: the bucketed stab must equal the O(n·m) reference, closed
    bounds on both ends."""
    import ray.data as rd
    from wtes_ray.ops.joins import interval_join

    rng = np.random.RandomState(11)
    pts = pd.DataFrame({"pid": np.arange(400),
                        "x": rng.randint(0, 1000, size=400).astype(np.int64)})
    ivs = []
    for i in range(60):
        a = int(rng.randint(0, 1000))
        b = a + int(rng.randint(0, 120))       # incl. zero-width
        ivs.append((i, a, b))
    ivs.append((60, 500, 400))                  # lo > hi: matches nothing
    out = interval_join(
        rd.from_pandas(pts).repartition(5), _iv_ds(ivs),
        point_on="x", lo_col="lo", hi_col="hi",
        num_buckets=8).to_pandas()
    got = set(zip(out["pid"], out["interval_id"]))
    want = {(p, i) for p, x in zip(pts["pid"], pts["x"])
            for i, a, b in ivs if a <= x <= b}
    assert got == want
    assert len(out) == len(got)                 # no duplicate pairs
    # payload columns pass through from both sides
    assert {"pid", "x", "interval_id", "lo", "hi"} == set(out.columns)


def test_interval_join_empty_sides_and_collision(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.joins import interval_join

    pts = rd.from_pandas(pd.DataFrame(
        {"pid": np.arange(3), "x": np.array([1, 2, 3], dtype=np.int64)}))
    empty_iv = _iv_ds([])
    out = interval_join(pts, empty_iv, point_on="x",
                        lo_col="lo", hi_col="hi")
    assert out.count() == 0
    assert set(out.schema().names) == {"pid", "x", "interval_id",
                                       "lo", "hi"}
    with pytest.raises(ValueError, match="collide"):
        interval_join(pts, _iv_ds([(1, 0, 5)], cols=("x", "lo", "hi")),
                      point_on="x", lo_col="lo", hi_col="hi")


def test_interval_join_timestamp_points(ray_session):
    """Timestamp point columns cast to epoch-µs int64 — bounds given in µs
    match SQL epoch_us(ts) BETWEEN semantics."""
    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.joins import interval_join

    base = 1704067200 * 10**6
    ts = pa.array(np.array([base, base + 10, base + 20], dtype=np.int64),
                  pa.timestamp("us"))
    pts = rd.from_arrow(pa.table({"pid": pa.array([0, 1, 2]), "ts": ts}))
    out = interval_join(pts, _iv_ds([(7, base + 5, base + 20)]),
                        point_on="ts", lo_col="lo", hi_col="hi").to_pandas()
    assert sorted(out["pid"]) == [1, 2]


def test_linear_classify_tie_breaks_to_lowest_class(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.infer import linear_classify

    # two identical weight rows ⇒ every vector ties classes 0 and 1
    W = np.vstack([np.ones(4), np.ones(4), -np.ones(4)])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0, 0.0, 0.0],
                               [0.5, 0.5, 0.5, 0.5]],
                              pa.list_(pa.float32()))}))
    out = linear_classify(ds, W).to_pandas().sort_values("vec_id")
    assert list(out["pred_class"]) == [0, 0]
    assert list(out["score"]) == [1.0, 2.0]


def test_demo_weights_matches_sql_formula():
    import duckdb
    from wtes_ray.ops.infer import demo_weights

    W = demo_weights(3, 5)
    got = duckdb.sql(
        "SELECT c.c, j.j, ((1009*c.c + 9176*j.j + 31) % 1997)/1997.0 - 0.5"
        " AS w FROM generate_series(0,2) c(c)"
        " CROSS JOIN generate_series(0,4) j(j) ORDER BY c.c, j.j").df()
    np.testing.assert_allclose(W.ravel(), got["w"].to_numpy(), rtol=0, atol=0)


def test_triangle_count_matches_bruteforce(ray_session):
    """Random multigraph with self-loops and duplicate/reversed edges: the
    rank-oriented wedge join must equal the brute-force count over the
    canonical simple graph."""
    import itertools

    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.graph import triangle_count

    rng = np.random.RandomState(7)
    a = rng.randint(0, 60, size=900)
    b = rng.randint(0, 60, size=900)
    ds = rd.from_arrow(pa.table({"src": pa.array(a), "dst": pa.array(b)}))
    got = triangle_count(ds, num_buckets=8)

    edges = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = sum(1 for u, v, w in itertools.combinations(sorted(adj), 3)
               if v in adj[u] and w in adj[u] and w in adj[v])
    assert got == want and got > 0


def test_triangle_count_join_arm_matches_broadcast(ray_session):
    """Forcing the above-budget path (degrees through two bucketed joins)
    must give the same count as the broadcast arm."""
    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.graph import triangle_count

    rng = np.random.RandomState(13)
    a = rng.randint(0, 40, size=400)
    b = rng.randint(0, 40, size=400)
    ds = rd.from_arrow(pa.table({"src": pa.array(a), "dst": pa.array(b)}))
    got_b = triangle_count(ds, num_buckets=8)
    got_j = triangle_count(ds, num_buckets=8, nodes_budget=1)
    assert got_b == got_j > 0


def test_token_pmi_matches_bruteforce(ray_session):
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.text import token_pmi

    rng = np.random.RandomState(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(40)]
    texts += ["new york new york new york"] * 5   # a real collocation
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts))),
        "text": pa.array(texts)}))
    got = token_pmi(ds, min_count=3, k=10)

    uni, bi = Counter(), Counter()
    for t in texts:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    N, M = sum(uni.values()), sum(bi.values())
    rows = [(a, b, c, round(math.log(c * N * N / (M * uni[a] * uni[b])), 6))
            for (a, b), c in bi.items() if c >= 3]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = pd.DataFrame(rows[:10], columns=["a", "b", "c_ab", "pmi"])
    want["c_ab"] = want["c_ab"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    assert got.iloc[0][["a", "b"]].tolist() in (["york", "new"],
                                                ["new", "york"])


def test_bpe_arms_equal_and_greedy_overlap(ray_session):
    """Distributed BPE arm (vocab as Dataset, per-block pair partials,
    local-top1 argmax) must produce the same merge table as the driver
    arm; overlap runs ('aaaa' with lhs==rhs) must merge greedily."""
    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.text import _greedy_merge, bpe_train

    assert _greedy_merge(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert _greedy_merge(list("aaa"), "a", "a", "aa") == ["aa", "a"]
    assert _greedy_merge(["x", "a", "b", "a", "b"], "a", "b", "ab") \
        == ["x", "ab", "ab"]

    texts = ["aaaa aab the the the quick quick brown",
             "the quick brown fox aaaa",
             "aab aab the quick"] * 3
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts))),
        "text": pa.array(texts)}))
    drv = bpe_train(ds, merges=6)
    dist = bpe_train(ds, merges=6, force_distributed=True)
    pd.testing.assert_frame_equal(drv, dist)
    assert len(drv) == 6 and drv["pair_count"].min() > 0


# ---------------------------------------------------------------------------
# round-4 session 2: reshape / skipgram / binary dedup ops
# ---------------------------------------------------------------------------

def test_pivot_counts_and_unpivot_roundtrip(ray_session):
    import ray.data as rd

    from wtes_ray.ops.reshape import pivot_counts, unpivot

    df = pd.DataFrame({"g": ["x", "x", "y", "y", "y"],
                       "s": ["A", "B", "A", "A", "C"]})
    wide = pivot_counts(rd.from_pandas(df), group_col="g", pivot_col="s",
                        values=["A", "B", "C"]).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert wide["cnt_A"].tolist() == [1, 2]
    assert wide["cnt_B"].tolist() == [1, 0]
    assert wide["cnt_C"].tolist() == [0, 1]
    long = unpivot(rd.from_pandas(wide), id_col="g",
                   value_cols=["cnt_A", "cnt_B", "cnt_C"],
                   var_name="s", value_name="cnt",
                   strip_prefix="cnt_").to_pandas()
    long = long[long["cnt"] > 0].sort_values(["g", "s"])
    # round trip reproduces the original group-by counts exactly
    want = df.groupby(["g", "s"]).size().reset_index(name="cnt")
    pd.testing.assert_frame_equal(long.reset_index(drop=True),
                                  want.astype({"cnt": long["cnt"].dtype}))


def test_pivot_counts_ignores_unknown_values(ray_session):
    import ray.data as rd

    from wtes_ray.ops.reshape import pivot_counts

    df = pd.DataFrame({"g": ["x", "x"], "s": ["A", "ZZZ"]})
    wide = pivot_counts(rd.from_pandas(df), group_col="g", pivot_col="s",
                        values=["A"]).to_pandas()
    assert wide["cnt_A"].tolist() == [1]   # ZZZ dropped, not mis-binned


def test_skipgram_window_matches_bruteforce(ray_session):
    import re as _re

    import ray.data as rd

    from wtes_ray.ops.text import skipgram_cooccurrence

    texts = ["the cat sat on the mat", "the cat ran", "on the mat the cat"]
    window = 3
    from collections import Counter
    want: Counter = Counter()
    for t in texts:
        toks = _re.findall(r"[a-z0-9_]+", t.lower())
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window + 1, len(toks))):
                want[(toks[i], toks[j])] += 1
    got = skipgram_cooccurrence(
        rd.from_pandas(pd.DataFrame({"text": texts})),
        window=window, min_count=1).to_pandas()
    got_map = {(r.a, r.b): r.cnt for r in got.itertuples()}
    assert got_map == dict(want)


def test_binary_exact_dedup_groups(ray_session):
    import ray.data as rd

    from wtes_ray.ops.multimodal import binary_exact_dedup

    df = pd.DataFrame({"doc_id": [5, 1, 2, 3, 4],
                       "payload": [b"\x00\xffA", b"\x00\xffA", b"B",
                                   None, b""]})
    out = binary_exact_dedup(rd.from_pandas(df)).to_pandas()
    # A-group, B, NULL sentinel, empty — NULL must NOT merge with b"".
    assert len(out) == 4
    grp = out.set_index("digest")
    import hashlib as _h
    a = _h.md5(b"\x00\xffA").hexdigest()
    assert grp.loc[a, "keeper"] == 1 and grp.loc[a, "n_copies"] == 2
    assert grp.loc[_h.md5(b"").hexdigest(), "keeper"] == 4
    null_rows = out[out["digest"].str.startswith("null:")]
    assert len(null_rows) == 1 and null_rows["keeper"].iloc[0] == 3


def test_phrase_search_counts_occurrences(ray_session):
    import ray.data as rd

    from wtes_ray.ops.curate import phrase_search

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c a b c",        # 2 occurrences of "a b c"
                 "a b x c",            # broken phrase — no match
                 "A B C",              # case-folded match
                 "c b a"]})            # reversed — no match
    out = phrase_search(rd.from_pandas(df), ["a", "b", "c"]).to_pandas()
    got = dict(zip(out["doc_id"], out["n_occ"]))
    assert got == {1: 2, 3: 1}


def test_phrase_search_repeated_term(ray_session):
    import ray.data as rd

    from wtes_ray.ops.curate import phrase_search

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["the cat the dog", "the the cat"]})
    out = phrase_search(rd.from_pandas(df), ["the", "cat", "the"]).to_pandas()
    got = dict(zip(out["doc_id"], out["n_occ"]))
    assert got == {1: 1}           # "the cat the"; doc 2 has "the the cat"


def test_word_containment_subset_scores_one():
    from wtes_ray.ops.dedup import _word_containment

    full = "alpha beta gamma delta epsilon zeta"
    prefix = "alpha beta gamma"
    c_ab, c_ba = _word_containment(full, prefix, 2)
    assert c_ba == 1.0 and 0 < c_ab < 1.0
    assert _word_containment("x", "y z", 2) == (0.0, 0.0)  # empty gram side


def test_morton_roundtrip_and_sql_parity():
    import duckdb

    from wtes_ray.ops.layout import morton2, morton2_sql

    xs = np.arange(8).repeat(8)
    ys = np.tile(np.arange(8), 8)
    z = morton2(xs, ys, 3)
    assert len(set(z.tolist())) == 64          # bijective on the 8×8 grid
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {morton2_sql('x', 'y', 3)} AS z FROM "
        "(SELECT unnest(range(0, 64)) // 8 AS x,"
        " unnest(range(0, 64)) % 8 AS y) ORDER BY x, y").fetchdf()
    want = morton2(np.arange(64) // 8, np.arange(64) % 8, 3)
    assert got["z"].to_numpy().tolist() == want.tolist()


def test_zorder_box_read_prunes_files(ray_session, tmp_path):
    import ray.data as rd

    from wtes_ray.ops.layout import zorder_box_read, zorder_write

    n = 512
    df = pd.DataFrame({"x": np.arange(n) % 32, "y": (np.arange(n) * 7) % 32,
                       "v": np.arange(n, dtype="float64")})
    out = str(tmp_path / "z")
    zorder_write(rd.from_pandas(df), out, x_col="x", y_col="y",
                 wx=4, wy=4, bits=3)
    back = zorder_box_read(out, xb_range=(1, 3), yb_range=(2, 4),
                           bits=3).to_pandas()
    want = df[(df.x // 4 >= 1) & (df.x // 4 < 3)
              & (df.y // 4 >= 2) & (df.y // 4 < 4)]
    assert sorted(back["v"].tolist()) == sorted(want["v"].tolist())
    # and it actually pruned: fewer cell dirs opened than written
    import os
    assert len([d for d in os.listdir(out) if d.startswith("zcell=")]) > 4


def test_equidepth_bucket_rule_matches_case_semantics():
    # bucket = count(edges < v) must equal the SQL CASE chain, including
    # values EQUAL to an edge (lower bucket) and duplicate edges
    edges = np.array([1.0, 1.0, 3.0])
    v = np.array([0.5, 1.0, 2.0, 3.0, 4.0])
    got = np.searchsorted(edges, v, side="left")
    def case(x):
        if x <= 1.0: return 0
        if x <= 1.0: return 1
        if x <= 3.0: return 2
        return 3
    assert got.tolist() == [case(x) for x in v]


def test_bpe_encode_counts_matches_manual(ray_session):
    import ray.data as rd

    from wtes_ray.ops.text import bpe_encode_counts

    # corpus: "ab ab abc"; merge rules trained elsewhere: (a,b) then (ab,</w>)
    docs = pd.DataFrame({"text": ["ab ab abc", "ab"]})
    rules = [("a", "b"), ("ab", "</w>")]
    out = bpe_encode_counts(rd.from_pandas(docs), rules).to_pandas()
    got = dict(zip(out["token"], out["cnt"]))
    # "ab"×3 → [a,b,</w>] → [ab,</w>] → [ab</w>]; "abc" → [ab, c, </w>]
    assert got == {"ab</w>": 3, "ab": 1, "c": 1, "</w>": 1}


def test_levenshtein_matches_duckdb():
    import duckdb

    from wtes_ray.ops.linkage import levenshtein

    words = ["", "a", "ab", "abc", "abcd", "axc", "xabc", "abcx", "bac",
             "Supplier#000000001", "Supplier#000000011", "kitten", "sitting"]
    con = duckdb.connect()
    for a in words:
        for b in words:
            want = con.execute("SELECT levenshtein(?, ?)",
                               [a, b]).fetchone()[0]
            assert levenshtein(a, b) == want, (a, b)


def test_four_pass_blocking_recall_exhaustive():
    """The blocking argument: at edit distance ≤ 1, every pair shares at
    least one of the four block keys (first-2, last-2, (first, last),
    tiny-catch-all) — verified by enumerating ALL single edits of ALL
    strings of length 1..5 over a 2-letter alphabet (plus an edit
    alphabet letter). The naive 2-pass scheme FAILS here ('aaa' vs 'axa'
    breaks both 2-char windows — the counter-example that forced the
    endpoint key)."""
    from itertools import product

    from wtes_ray.ops.linkage import levenshtein

    def keys(x):
        ks = {"p" + x[:2], "s" + x[-2:], "m" + x[:1] + x[-1:]}
        if len(x) <= 2:
            ks.add("t")
        return ks

    alpha = "ab"
    for n in (1, 2, 3, 4, 5):
        for tup in product(alpha, repeat=n):
            s = "".join(tup)
            edits = set()
            for i in range(len(s)):
                for c in alpha + "x":
                    edits.add(s[:i] + c + s[i + 1:])      # substitute
                    edits.add(s[:i] + c + s[i:])          # insert
                edits.add(s[:i] + s[i + 1:])              # delete
            edits.add(s + "x")
            for t in edits:
                if not t:
                    continue
                assert levenshtein(s, t) <= 1
                assert keys(s) & keys(t), (s, t)


def test_fuzzy_self_join_finds_planted_pairs(ray_session):
    import ray.data as rd

    from wtes_ray.ops.linkage import fuzzy_self_join

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "name": ["walnut", "walnot",      # substitution mid-word
                 "xwalnut",               # insertion at front
                 "zebra", "zebra"]})      # exact dup (dist 0)
    out = fuzzy_self_join(rd.from_pandas(df), name_col="name",
                          id_col="id").to_pandas()
    got = {(r.a, r.b): r.dist for r in out.itertuples()}
    assert got == {(1, 2): 1, (1, 3): 1, (4, 5): 0}
    assert not out["truncated"].any()
