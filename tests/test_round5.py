"""Round-5 additions: personalized PageRank (arm equality + teleport
semantics) and the KMV distinct sketch (mergeability + estimator)."""

import numpy as np
import pandas as pd
import pytest


def _edges(rows):
    import pyarrow as pa
    import ray.data as rd
    s, d = zip(*rows) if rows else ([], [])
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(s, dtype=np.int64)),
        "dst": pa.array(np.asarray(d, dtype=np.int64))}))


EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 1), (5, 6), (7, 7),
         (8, 1), (2, 8)]


def test_ppr_arms_equal(ray_session):
    from wtes_ray.ops.graph import personalized_pagerank
    seeds = {1, 4}
    a = personalized_pagerank(_edges(EDGES), seeds, iterations=3) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = personalized_pagerank(_edges(EDGES), seeds, iterations=3,
                              force_distributed=True, num_buckets=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert (a["node"] == b["node"]).all()
    assert np.allclose(a["ppr"], b["ppr"], atol=1e-12, rtol=0)


def test_ppr_teleport_semantics(ray_session):
    from wtes_ray.ops.graph import personalized_pagerank
    out = personalized_pagerank(_edges(EDGES), {1}, iterations=3) \
        .to_pandas().set_index("node")["ppr"]
    # seed-relative: the seed outranks everything, and a node unreachable
    # from the seed (7, a self-loop component) gets no mass at all
    assert out.loc[1] == out.max()
    assert out.loc[7] == 0.0
    # total mass stays ~1 (stochastic with the dangling fix)
    assert abs(out.sum() - 1.0) < 1e-9


def test_ppr_disjoint_teleport_raises(ray_session):
    from wtes_ray.ops.graph import personalized_pagerank
    with pytest.raises(ValueError):
        personalized_pagerank(_edges(EDGES), {999}, iterations=1) \
            .to_pandas()


def test_kmv_merge_and_estimate(ray_session):
    import ray.data as rd

    from wtes_ray.ops.curate import _key_u64
    from wtes_ray.ops.sketch import kmv_estimate, kmv_minima
    keys = [f"user{i % 700}" for i in range(5000)]    # 700 distinct
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))
    k = 64
    minima = kmv_minima(ds, "k", k=k)
    # the sketch is the k smallest distinct hashes — exactly
    want = np.unique(_key_u64(list(set(keys)), "kmv"))[:k]
    assert np.array_equal(minima, want)
    # mergeability: sketch(union) == k-minima of (sketch(A) ∪ sketch(B))
    a = kmv_minima(rd.from_pandas(pd.DataFrame({"k": keys[:2500]})),
                   "k", k=k)
    b = kmv_minima(rd.from_pandas(pd.DataFrame({"k": keys[2500:]})),
                   "k", k=k)
    merged = np.unique(np.concatenate([a, b]))[:k]
    assert np.array_equal(merged, minima)
    # estimator lands near the truth (KMV relative error ~ 1/sqrt(k))
    k_used, kth_frac, est = kmv_estimate(minima, k)
    assert k_used == k
    assert 0 < kth_frac < 1
    assert abs(est - 700) / 700 < 0.5
    # fewer distinct keys than k: k_used shrinks, same expression
    small = kmv_minima(rd.from_pandas(pd.DataFrame({"k": ["a", "b"]})),
                       "k", k=k)
    k_used, kth_frac, est = kmv_estimate(small, k)
    assert k_used == 2 and est == 1 / kth_frac


def test_ddsketch_band_guarantee(ray_session):
    """Every DDSketch estimate must sit within the γ=2 relative band of
    the EXACT PERCENTILE_DISC value (lower bound ≤ exact < 2× bound)."""
    import duckdb

    from wtes_ray.queries.registry import REGISTRY
    out = REGISTRY["ddsketch_quantiles_events"][0]("/root/testdata/sf0.001")
    exact = {
        q: duckdb.sql(
            "SELECT PERCENTILE_DISC(" + repr(q) + ") WITHIN GROUP "
            "(ORDER BY FLOOR(value*100)) "
            "FROM '/root/testdata/sf0.001/events.parquet'").fetchone()[0]
        for q in out["q"]}
    for _, row in out.iterrows():
        lo = row["est"] * 100.0          # bucket lower bound, in cents
        assert lo <= exact[row["q"]] < 2.0 * lo


def test_lsh_recall_bounds_and_determinism(ray_session):
    from wtes_ray.queries.registry import REGISTRY
    fn = REGISTRY["lsh_recall_at_k"][0]
    a = fn("/root/testdata/sf0.001")
    b = fn("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert 0.0 <= a["recall"].iloc[0] <= 1.0
    # vec 0 IS the query: its own bucket always survives the Hamming
    # filter, so the top hit is recalled and recall is strictly positive
    assert a["hits"].iloc[0] >= 1


def test_khop_reach_chain(ray_session):
    # path 0->1->2->3->4 plus an unreachable island (9,9)
    e = _edges([(0, 1), (1, 2), (2, 3), (3, 4), (9, 9)])
    from wtes_ray.ops.graph import khop_reach
    out = khop_reach(e, {0}, 3)
    assert out["hop"].tolist() == [0, 1, 2, 3]
    assert out["n_reached"].tolist() == [1, 2, 3, 4]
    # frontier saturates: extra hops stop growing
    out5 = khop_reach(e, {0}, 5)
    assert out5["n_reached"].tolist() == [1, 2, 3, 4, 5, 5]
    with pytest.raises(ValueError):
        khop_reach(e, set(), 1)


def test_event_value_mad_matches_numpy(ray_session):
    from wtes_ray.queries.registry import REGISTRY
    out = REGISTRY["event_value_mad"][0]("/root/testdata/sf0.001")
    import pyarrow.parquet as _pq
    v = _pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["value"])["value"].to_numpy()
    # PERCENTILE_DISC(0.5) = value at 1-based rank ceil(n/2)
    sv = np.sort(v)
    med = sv[int(np.ceil(0.5 * len(sv))) - 1]
    assert out["median"].iloc[0] == med
    dev = np.sort(np.abs(v - med))
    mad = dev[int(np.ceil(0.5 * len(dev))) - 1]
    assert out["mad"].iloc[0] == mad
    assert out["n_outliers"].iloc[0] == int((np.abs(v - med) > 3 * mad).sum())


def test_mmr_selects_relevant_but_diverse(ray_session):
    from wtes_ray.queries.registry import REGISTRY
    out = REGISTRY["mmr_retrieval_docs"][0]("/root/testdata/sf0.001")
    assert out["rank"].tolist() == list(range(1, 11))
    assert out["vec_id"].nunique() == 10
    # rank 1 is the plain cosine argmax (vec 0 IS the query -> itself)
    top = REGISTRY["topk_cosine_bruteforce"][0]("/root/testdata/sf0.001")
    assert out["vec_id"].iloc[0] == top["vec_id"].iloc[0]
    # the diversity term must actually bite: MMR's tail diverges from
    # the pure-relevance top-10 on this corpus
    assert set(out["vec_id"]) != set(top["vec_id"])


def _wedges(rows):
    import pyarrow as pa
    import ray.data as rd
    s, d, w = zip(*rows)
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(s, dtype=np.int64)),
        "dst": pa.array(np.asarray(d, dtype=np.int64)),
        "w": pa.array(np.asarray(w, dtype=np.float64))}))


def test_weighted_pagerank_arms_equal(ray_session):
    from wtes_ray.ops.graph import weighted_pagerank
    rows = [(1, 2, 3.0), (2, 3, 1.0), (3, 1, 2.0), (3, 4, 5.0),
            (4, 5, 1.0), (6, 1, 4.0), (5, 6, 2.0), (8, 1, 1.0),
            (2, 8, 7.0)]
    a = weighted_pagerank(_wedges(rows), iterations=3) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = weighted_pagerank(_wedges(rows), iterations=3,
                          force_distributed=True, num_buckets=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert (a["node"] == b["node"]).all()
    assert np.allclose(a["pagerank"], b["pagerank"], atol=1e-12, rtol=0)


def test_weighted_pagerank_uniform_equals_unweighted(ray_session):
    from wtes_ray.ops.graph import pagerank, weighted_pagerank
    uni = [(s, d, 1.0) for s, d in EDGES]
    a = weighted_pagerank(_wedges(uni), iterations=3) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = pagerank(_edges(EDGES), iterations=3) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    # w=1 out-strength == outdeg exactly (float sum of ones), so the two
    # recurrences are the SAME doubles, not merely close
    assert (a["node"] == b["node"]).all()
    assert (a["pagerank"].to_numpy() == b["pagerank"].to_numpy()).all()


def test_weighted_pagerank_weight_bias(ray_session):
    from wtes_ray.ops.graph import weighted_pagerank
    # star: 1 points to 2 (weight 9) and 3 (weight 1) -> 2 must outrank 3
    out = weighted_pagerank(_wedges([(1, 2, 9.0), (1, 3, 1.0)]),
                            iterations=2) \
        .to_pandas().set_index("node")["pagerank"]
    assert out.loc[2] > out.loc[3]


SF = "/root/testdata/sf0.001"


def test_ewma_daily_matches_pandas_ewm(ray_session):
    from wtes_ray.queries.events import ewma_daily_events
    out = ewma_daily_events(SF)
    # recompute the recurrence from the query's own daily series with
    # pandas ewm(adjust=False) — the canonical definition
    want = out["daily_value"].ewm(alpha=0.3, adjust=False).mean()
    assert np.allclose(out["ewma"], want, atol=1e-6, rtol=0)
    assert out["day"].is_monotonic_increasing


def test_trimmed_mean_matches_numpy_sort(ray_session):
    import duckdb

    from wtes_ray.queries.events import trimmed_mean_events
    out = trimmed_mean_events(SF)
    v = np.sort(duckdb.sql(
        f"SELECT value FROM '{SF}/events.parquet'").df()["value"])
    k = len(v) // 10
    want = v[k:len(v) - k].sum()
    assert abs(out["trimmed_sum"].iloc[0] - want) < 1e-4
    assert int(out["n_kept"].iloc[0]) == len(v) - 2 * k


def test_event_type_lift_matches_pandas(ray_session):
    import duckdb

    from wtes_ray.queries.events import event_type_lift
    out = event_type_lift(SF)
    ut = duckdb.sql(
        f"SELECT DISTINCT user_id, event_type "
        f"FROM '{SF}/events.parquet'").df()
    nu = ut["user_id"].nunique()
    tc = ut.groupby("event_type").size()
    p = ut.merge(ut, on="user_id")
    p = p[p["event_type_x"] < p["event_type_y"]]
    want = p.groupby(["event_type_x", "event_type_y"]).size()
    assert len(out) == len(want)
    for r in out.itertuples():
        c = int(want.loc[(r.ta, r.tb)])
        assert r.c_ab == c
        assert abs(r.lift - c * nu / (tc[r.ta] * tc[r.tb])) < 1e-5


def test_doc_length_gini_matches_direct(ray_session):
    import duckdb

    from wtes_ray.queries.curation import doc_length_gini
    out = doc_length_gini(SF)
    x = np.sort(duckdb.sql(
        f"SELECT n_chars FROM '{SF}/documents.parquet'").df()["n_chars"]
        .to_numpy(np.float64))
    n = len(x)
    want = 2.0 * (np.arange(1, n + 1) * x).sum() / (n * x.sum()) \
        - (n + 1.0) / n
    assert abs(out["gini"].iloc[0] - want) < 5.1e-7   # 6dp round granularity
    assert int(out["n_docs"].iloc[0]) == n


def test_upsert_merge_semantics(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from wtes_ray.ops.joins import upsert_merge
    base = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"], pa.string())}))
    delta = rd.from_arrow(pa.table({
        "k": pa.array([2, 4, 5], pa.int64()),
        "v": pa.array(["B", "ignored", "E"], pa.string()),
        "op": pa.array(["U", "D", "U"], pa.string())}))
    out = upsert_merge(base, delta, "k", num_buckets=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [1, 2, 3, 5]
    assert list(out["v"]) == ["a", "B", "c", "E"]


def test_global_topn_matches_full_sort(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from wtes_ray.ops.curate import global_topn
    rng = np.random.default_rng(7)
    x = rng.integers(0, 50, size=500)
    key = np.arange(500)
    ds = rd.from_arrow(pa.table({
        "x": pa.array(x, pa.int64()),
        "key": pa.array(key, pa.int64())})).repartition(8)
    out = global_topn(ds, order_cols=["x", "key"],
                      descending=[True, False], n=25)
    want = pd.DataFrame({"x": x, "key": key}) \
        .sort_values(["x", "key"], ascending=[False, True]).head(25)
    assert list(out["x"]) == list(want["x"])
    assert list(out["key"]) == list(want["key"])


def test_upsert_documents_counts(ray_session):
    import duckdb

    from wtes_ray.queries.curation import upsert_documents
    out = upsert_documents(SF)
    n, mx = duckdb.sql(
        f"SELECT COUNT(*), MAX(doc_id) "
        f"FROM '{SF}/documents.parquet'").fetchone()
    n_del = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        f"WHERE doc_id % 13 = 0").fetchone()[0]
    assert len(out) == n - n_del + 500
    assert out["doc_id"].is_unique
    upd = out[out["doc_id"] % 7 == 0]
    upd = upd[upd["doc_id"] % 13 != 0]
    assert (upd["doc_id"] <= mx).sum() == 0 or \
        upd.loc[upd["doc_id"] <= mx, "lang"].eq("xx").all()
    assert (out["doc_id"] % 13 != 0).all() or \
        out.loc[out["doc_id"] % 13 == 0, "doc_id"].gt(mx).all()


def test_bootstrap_weights_distribution_and_ci(ray_session):
    from wtes_ray.queries.events import bootstrap_sums_events, _BOOT_REPS
    out = bootstrap_sums_events(SF)
    assert len(out) == _BOOT_REPS
    # Poisson(1) weights: E[Σw] = n, so each replicate's wn is a
    # binomial-ish count near n (±5 sigma ≈ ±5·sqrt(n))
    import duckdb
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert ((out["wn"] - n).abs() < 5 * np.sqrt(n) + 10).all()
    # replicate means vary but hug the corpus mean
    means = out["wsum"] / out["wn"]
    mu = duckdb.sql(
        f"SELECT AVG(value) FROM '{SF}/events.parquet'").fetchone()[0]
    lo, hi = np.percentile(means, [2.5, 97.5])
    assert lo < mu < hi
    assert means.std() < abs(mu)   # sane spread


def test_lang_jsd_bounds_and_symmetry(ray_session):
    import wtes_ray.queries.curation as cur
    out = cur.lang_jsd_docs(SF)
    j = float(out["jsd"].iloc[0])
    assert 0.0 < j < np.log(2.0) + 1e-9   # JSD (nats) ∈ [0, ln 2]
    # symmetry: swapping the language pair gives the same divergence
    orig = cur._JSD_LANGS
    try:
        cur._JSD_LANGS = (orig[1], orig[0])
        # rebuild is needed because the fn reads the module global
        out2 = cur.lang_jsd_docs(SF)
    finally:
        cur._JSD_LANGS = orig
    assert abs(float(out2["jsd"].iloc[0]) - j) < 2e-6


def test_bm25_ndcg_bounds(ray_session):
    from wtes_ray.queries.curation import bm25_ndcg_docs
    out = bm25_ndcg_docs(SF)
    dcg, idcg, ndcg = (float(out[c].iloc[0]) for c in
                       ("dcg", "idcg", "ndcg"))
    assert 0 < dcg <= idcg + 1e-9
    assert 0 < ndcg <= 1.0 + 1e-9
    assert abs(ndcg - dcg / idcg) < 2e-6


def test_value_psi_semantics(ray_session):
    from wtes_ray.queries.events import value_psi_events
    out = value_psi_events(SF)
    assert list(out["bucket"]) == list(range(10))
    # decile edges from period A: its own counts are ~uniform (n/10 each,
    # PERCENTILE_DISC granularity allows ±1 slop per edge)
    na = out["ca"].sum()
    assert ((out["ca"] - na / 10).abs() <= na / 10 * 0.2 + 2).all()
    # a stationary stream drifts little: PSI below the 0.1 alert line
    psi = out["contrib"].sum()
    assert 0 <= psi < 0.1


def test_signup_latency_nonneg_monotone(ray_session):
    from wtes_ray.queries.events import signup_purchase_latency
    out = signup_purchase_latency(SF)
    assert list(out["q"]) == [0.25, 0.5, 0.75, 0.9]
    assert (out["lat_us"] >= 0).all()
    assert out["lat_us"].is_monotonic_increasing


def test_fk_orphans_audit_values(ray_session):
    import duckdb

    from wtes_ray.queries.relational import fk_orphans_audit
    out = fk_orphans_audit(SF).set_index("fk")
    # the three real FK edges hold on the seeded corpus
    assert out.loc["orders.o_custkey->customer.c_custkey",
                   "n_orphans"] == 0
    assert out.loc["lineitem.l_orderkey->orders.o_orderkey",
                   "n_orphans"] == 0
    # the suspect edge genuinely fires (user ids are not customer keys)
    want = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet' e WHERE NOT EXISTS "
        f"(SELECT 1 FROM '{SF}/customer.parquet' c "
        f" WHERE c.c_custkey = e.user_id)").fetchone()[0]
    assert out.loc["events.user_id->customer.c_custkey",
                   "n_orphans"] == want


def test_set_similarity_join_exact_vs_bruteforce(ray_session):
    """PPJoin prefix filtering is LOSSLESS: the verified pair set equals
    the brute-force all-pairs word-set Jaccard join (values included),
    exercised on a corpus with planted exact dups, overlapping word-soup
    docs, an empty doc and a disjoint doc."""
    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.dedup import _word_jaccard, set_similarity_join

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(8, 30)))
             for _ in range(40)]
    texts += [texts[0], texts[3],              # exact dups
              "", "zz yy xx qq"]               # empty + disjoint
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))

    tau = 0.6
    got = set_similarity_join(ds, threshold=tau, num_buckets=4) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)

    rows = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            jac = _word_jaccard(texts[i], texts[j], 1)
            if jac >= tau:
                rows.append((i, j, jac))
    want = pd.DataFrame(rows, columns=["a", "b", "jaccard"])
    assert len(got) == len(want) and len(want) >= 2
    assert (got["a"].to_numpy() == want["a"].to_numpy()).all()
    assert (got["b"].to_numpy() == want["b"].to_numpy()).all()
    assert np.array_equal(got["jaccard"].to_numpy(),
                          want["jaccard"].to_numpy())  # bit-exact
    assert not got["truncated"].any()


def test_set_similarity_join_bucket_cap_flags(ray_session):
    """A hot prefix token above max_bucket caps-and-flags (never silent)."""
    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.dedup import set_similarity_join

    # 12 identical docs: every token is in every prefix; tiny cap
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array(["alpha beta gamma"] * 12, pa.string())}))
    got = set_similarity_join(ds, threshold=0.9, num_buckets=2,
                              max_bucket=8).to_pandas()
    assert got["truncated"].all() and len(got) > 0


def test_naive_bayes_matches_sklearn_formula(ray_session):
    """Distributed NB train/classify equals a direct dense multinomial-NB
    computation (add-one smoothing, log-space) on a tiny labelled corpus;
    ties break to the lexicographically smallest label on 6dp scores."""
    import pyarrow as pa
    import ray.data as rd
    from wtes_ray.ops.dedup import _word_tokens
    from wtes_ray.ops.infer import naive_bayes_classify, naive_bayes_train

    rows = [(1, "cat dog cat", "en"), (2, "chat chien chat", "fr"),
            (3, "dog dog bird", "en"), (4, "chien oiseau", "fr"),
            (5, "cat bird", "en"), (6, "chat chat", "fr"),
            (7, "???", "en")]  # empty-token doc → skipped
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string())}))
    model = naive_bayes_train(ds, text_col="text", label_col="lang")
    got = naive_bayes_classify(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [1, 2, 3, 4, 5, 6]  # doc 7 skipped

    # direct dense recomputation
    from collections import Counter
    labelled = [(d, _word_tokens(t), l) for d, t, l in rows
                if _word_tokens(t)]
    classes = sorted({l for _, _, l in labelled})
    vocab = sorted({t for _, toks, _ in labelled for t in toks})
    V = len(vocab)
    cnt = {c: Counter() for c in classes}
    nd = Counter()
    for _, toks, l in labelled:
        nd[l] += 1
        cnt[l].update(toks)
    for d, toks, _ in labelled:
        scores = {}
        for c in classes:
            tot = sum(cnt[c].values())
            s = np.log(nd[c] / len(labelled))
            for t in toks:
                s += np.log((cnt[c][t] + 1.0) / (tot + V))
            scores[c] = round(s, 6)
        best = max(classes, key=lambda c: (scores[c], ) + (tuple(
            -ord(ch) for ch in c), ))
        row = got[got["doc_id"] == d].iloc[0]
        assert row["pred_label"] == best
        assert abs(row["score"] - scores[best]) < 1e-9


def test_hits_arms_equal(ray_session):
    from wtes_ray.ops.graph import hits
    a = hits(_edges(EDGES), iterations=3) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = hits(_edges(EDGES), iterations=3,
             force_distributed=True, num_buckets=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert (a["node"] == b["node"]).all()
    assert np.allclose(a["authority"], b["authority"], atol=1e-12, rtol=0)
    assert np.allclose(a["hub"], b["hub"], atol=1e-12, rtol=0)


def test_hits_matches_naive(ray_session):
    from wtes_ray.ops.graph import hits
    out = hits(_edges(EDGES), iterations=3) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    nodes = sorted({u for e in EDGES for u in e})
    ix = {v: i for i, v in enumerate(nodes)}
    es = sorted(set(EDGES))
    h = np.full(len(nodes), 1.0 / len(nodes))
    a = np.zeros(len(nodes))
    for _ in range(3):
        a = np.zeros(len(nodes))
        for u, v in es:
            a[ix[v]] += h[ix[u]]
        if a.sum() > 0:
            a /= a.sum()
        h = np.zeros(len(nodes))
        for u, v in es:
            h[ix[u]] += a[ix[v]]
        if h.sum() > 0:
            h /= h.sum()
    assert np.allclose(out["authority"], a, atol=1e-12, rtol=0)
    assert np.allclose(out["hub"], h, atol=1e-12, rtol=0)


def test_hits_empty(ray_session):
    from wtes_ray.ops.graph import hits
    out = hits(_edges([]), iterations=2)
    assert out.count() == 0
    assert out.schema().names == ["node", "authority", "hub"]


def _ssedges(rows):
    import pyarrow as pa
    import ray.data as rd
    s, d, w = zip(*rows)
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(s, dtype=np.int64)),
        "dst": pa.array(np.asarray(d, dtype=np.int64)),
        "w": pa.array(np.asarray(w, dtype=np.int64))}))


SSSP_EDGES = [(0, 1, 4), (0, 2, 1), (2, 1, 1), (1, 3, 2), (3, 4, 1),
              (5, 6, 1), (2, 3, 7), (4, 0, 1), (0, 2, 9)]


def test_sssp_arms_equal(ray_session):
    from wtes_ray.ops.graph import sssp
    a = sssp(_ssedges(SSSP_EDGES), 0, rounds=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = sssp(_ssedges(SSSP_EDGES), 0, rounds=4,
             force_distributed=True, num_buckets=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert a.equals(b)


def test_sssp_bounded_rounds_semantics(ray_session):
    from wtes_ray.ops.graph import sssp
    out = sssp(_ssedges(SSSP_EDGES), 0, rounds=4) \
        .to_pandas().set_index("node")["dist"].to_dict()
    # parallel edge (0,2) collapses to MIN weight 1; node 4 needs 4 hops;
    # nodes 5,6 unreachable and absent
    assert out == {0: 0, 1: 2, 2: 1, 3: 4, 4: 5}
    two = sssp(_ssedges(SSSP_EDGES), 0, rounds=2) \
        .to_pandas().set_index("node")["dist"].to_dict()
    # synchronous rounds: after round 2 node 3 still reads 6 (via node 1's
    # round-1 dist of 4); node 4 not yet reached
    assert two == {0: 0, 1: 2, 2: 1, 3: 6}


def test_ranksum_auc_matches_pair_counting(ray_session):
    import ray.data as rd
    from wtes_ray.ops.infer import ranksum_auc
    rng = np.random.RandomState(7)
    score = np.round(rng.rand(400), 2)          # coarse rounding → many ties
    pos = (rng.rand(400) < 0.3).astype("int64")
    out = ranksum_auc(rd.from_pandas(pd.DataFrame(
        {"score": score, "pos": pos})))
    # naive O(n^2) pair counting: P(s_pos > s_neg) + 0.5 P(=)
    sp, sn = score[pos == 1], score[pos == 0]
    wins = (sp[:, None] > sn[None, :]).sum()
    ties = (sp[:, None] == sn[None, :]).sum()
    expect = (wins + 0.5 * ties) / (len(sp) * len(sn))
    assert out["n_pos"][0] == int(pos.sum())
    assert out["n_neg"][0] == int((1 - pos).sum())
    assert abs(out["auc"][0] - round(expect, 6)) < 1e-9


def test_ranksum_auc_degenerate_single_class(ray_session):
    import ray.data as rd
    from wtes_ray.ops.infer import ranksum_auc
    out = ranksum_auc(rd.from_pandas(pd.DataFrame(
        {"score": [0.1, 0.2], "pos": [1, 1]})))
    assert np.isnan(out["auc"][0])


def test_orc_roundtrip_identity(ray_session):
    import pyarrow.parquet as _pq

    from wtes_ray.queries.registry import REGISTRY
    out = REGISTRY["orc_roundtrip_events"][0]("/root/testdata/sf0.001")
    want = _pq.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"]) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)


def test_calibration_bins_sum_to_corpus(ray_session):
    from wtes_ray.queries.registry import REGISTRY
    out = REGISTRY["calibration_stopword_en"][0]("/root/testdata/sf0.001")
    assert out["n"].sum() == 500            # sf0.001 corpus size
    assert ((out["p_en"] >= 0) & (out["p_en"] <= 1)).all()
    assert (out["n_pos"] <= out["n"]).all()
    assert out["bin"].between(0, 19).all()


def test_join_skew_profile_matches_pandas(ray_session):
    import pyarrow.parquet as _pq

    from wtes_ray.queries.registry import REGISTRY
    out = REGISTRY["join_skew_profile_events"][0]("/root/testdata/sf0.001")
    u = _pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["user_id"])["user_id"].to_numpy()
    vc = pd.Series(u).value_counts()
    assert out["n_keys"][0] == vc.size
    assert out["selfjoin_size"][0] == int((vc.astype("int64") ** 2).sum())
    assert out["max_mult"][0] == int(vc.max())
    top10 = vc.rename_axis("user_id").reset_index(name="count") \
        .sort_values(["count", "user_id"],
                     ascending=[False, True]).head(10)
    assert out["top10_share"][0] == round(
        float(top10["count"].sum()) / len(u), 6)


def test_hll_window_tracks_exact_7day_distinct(ray_session):
    import pyarrow.parquet as _pq

    from wtes_ray.queries.registry import REGISTRY
    out = REGISTRY["hll_window_users"][0]("/root/testdata/sf0.001")
    t = _pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    t["day"] = t["ts"].dt.floor("D")
    for _, row in out.iterrows():
        d = row["day"]
        lo = d - pd.Timedelta(days=6)
        exact = t.loc[(t["day"] >= lo) & (t["day"] <= d),
                      "user_id"].nunique()
        # HLL with m=4096 registers: σ ≈ 1.04/√4096 ≈ 1.6%; allow 10%
        assert abs(row["approx_users_7d"] - exact) <= max(10, 0.1 * exact)
    # windows only grow or shrink with real data — estimates stay positive
    assert (out["approx_users_7d"] > 0).all()


def test_adamic_adar_hand_graph(ray_session):
    # star: 1-2, 1-3, 2-3 triangle plus pendant 4-1. Non-edge pairs with
    # common neighbors: (2,4),(3,4) via center 1 (deg 3), (1,?) none new.
    # The query is lineitem-bound; test the same shapes via its SQL oracle
    # vs a hand computation through duckdb on a tiny frame.
    import duckdb
    import math

    edges = pd.DataFrame({"a": [1, 1, 2, 1], "b": [2, 3, 3, 4]})
    con = duckdb.connect()
    con.register("e0", edges)
    got = con.execute("""
        WITH adj AS (SELECT a AS c, b AS n FROM e0
                     UNION ALL SELECT b, a FROM e0),
        deg AS (SELECT c, COUNT(*) AS d FROM adj GROUP BY c),
        wed AS (SELECT a2.n AS x, a3.n AS y, 1.0 / LN(dg.d) AS w
                FROM adj a2 JOIN adj a3 ON a3.c = a2.c AND a2.n < a3.n
                JOIN deg dg ON dg.c = a2.c
                WHERE dg.d BETWEEN 2 AND 64),
        sc AS (SELECT x, y, ROUND(SUM(w), 6) AS aa FROM wed GROUP BY x, y),
        ne AS (SELECT s.x AS a, s.y AS b, s.aa FROM sc s
               WHERE NOT EXISTS (SELECT 1 FROM e0 e
                                 WHERE e.a = s.x AND e.b = s.y))
        SELECT a, b, aa FROM ne ORDER BY a, b""").df()
    want = pd.DataFrame({"a": [2, 3], "b": [4, 4],
                         "aa": [round(1 / math.log(3), 6)] * 2})
    pd.testing.assert_frame_equal(got, want)


def _random_edges_df(seed, n_nodes=30, n_edges=80):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame({
        "src": rng.randint(0, n_nodes, n_edges).astype("int64"),
        "dst": rng.randint(0, n_nodes, n_edges).astype("int64")})
    return df[df["src"] != df["dst"]].reset_index(drop=True)


def test_hits_sql_chain_matches_op_on_random_graphs(ray_session):
    """The generated HITS CTE chain == ops.graph.hits on ANY graph, not
    just the lineitem one — the oracle is the algorithm, not the
    dataset."""
    import duckdb
    import ray.data as rd

    from wtes_ray.ops.graph import hits
    from wtes_ray.queries.graphml import _hits_sql
    for seed in (1, 7):
        df = _random_edges_df(seed)
        got = hits(rd.from_pandas(df), iterations=2).to_pandas()
        got["authority"] = got["authority"].round(8)
        got["hub"] = got["hub"].round(8)
        got = got.sort_values("node").reset_index(drop=True)
        con = duckdb.connect()
        con.register("rand_edges", df)
        sql = _hits_sql(iters=2, edges_sql=(
            "SELECT DISTINCT src, dst FROM rand_edges"))
        want = con.execute(sql).df().astype(
            {"node": "int64"}).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_sssp_sql_chain_matches_op_on_random_graphs(ray_session):
    import duckdb
    import ray.data as rd

    from wtes_ray.ops.graph import sssp
    from wtes_ray.queries.graphml import _sssp_sql
    for seed in (3, 11):
        df = _random_edges_df(seed)
        df["w"] = (1 + (df["src"] + df["dst"]) % 9).astype("int64")
        got = sssp(rd.from_pandas(df), 0, rounds=3).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        con = duckdb.connect()
        con.register("rand_edges", df)
        sql = _sssp_sql(rounds=3, edges_sql=(
            "SELECT src, dst, w FROM rand_edges"))
        want = con.execute(sql).df().astype(
            {"node": "int64", "dist": "int64"}).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
