"""Corpus-curation ops (wtes_ray.ops.curate) — deterministic sampling /
splits, per-group quotas, vocabulary/TF-IDF, decontamination, packing."""
import hashlib

import numpy as np
import pandas as pd
import pytest

from wtes_ray.ops import curate as C


def _u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(300):
        n = rng.randint(5, 60)
        text = " ".join(rng.choice(words, size=n))
        rows.append({"doc_id": i, "text": text,
                     "lang": ["en", "de", "fr"][i % 3],
                     "n_chars": len(text)})
    df = pd.DataFrame(rows)
    return ray.data.from_pandas(df), df


def test_hash_sample_matches_reference_and_is_stable(corpus):
    ds, df = corpus
    out = C.hash_sample(ds, permille=250, key_col="doc_id",
                        salt="s1").to_pandas()
    exp = [i for i in df["doc_id"] if _u64(f"s1:{i}") % 1000 < 250]
    assert sorted(out["doc_id"]) == exp
    # stable under repartition (content-addressed, not positional)
    out2 = C.hash_sample(ds.repartition(7), permille=250, key_col="doc_id",
                         salt="s1").to_pandas()
    assert sorted(out2["doc_id"]) == exp
    # and roughly the requested rate
    assert 0.15 < len(out) / len(df) < 0.35


def test_hash_split_assignment(corpus):
    ds, df = corpus
    out = C.hash_split(ds, splits=(("train", 800), ("val", 100),
                                   ("test", 100)),
                       key_col="doc_id", salt="sp").to_pandas()
    assert len(out) == len(df)
    for _, r in out.iterrows():
        h = _u64(f"sp:{r.doc_id}") % 1000
        exp = "train" if h < 800 else ("val" if h < 900 else "test")
        assert r.split == exp
    with pytest.raises(ValueError):
        C.hash_split(ds, splits=(("a", 500), ("b", 400)))


def test_quota_cap_matches_pandas_window(corpus):
    ds, df = corpus
    out = C.quota_cap(ds, group_col="lang", score_col="n_chars",
                      n=7).to_pandas()
    exp = df.sort_values(["n_chars", "doc_id"], ascending=[False, True]) \
            .groupby("lang").head(7)
    assert sorted(out["doc_id"]) == sorted(exp["doc_id"])
    assert out.groupby("lang").size().max() == 7


def test_stratified_sample_deterministic_per_group(corpus):
    ds, df = corpus
    out = C.stratified_sample(ds, group_col="lang", n=5,
                              salt="st").to_pandas()
    assert sorted(out.columns) == sorted(df.columns)   # __h dropped
    assert (out.groupby("lang").size() == 5).all()
    # expected = first 5 per lang by (md5 hash asc, doc_id asc)
    h = df["doc_id"].map(lambda i: _u64(f"st:{i}"))
    exp = df.assign(__h=h).sort_values(["__h", "doc_id"]) \
            .groupby("lang").head(5)
    assert sorted(out["doc_id"]) == sorted(exp["doc_id"])


def test_term_stats_and_top_terms(ray_session):
    import ray.data

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["Alpha beta ALPHA, gamma", "beta beta!", None]})
    ds = ray.data.from_pandas(df).repartition(2)
    stats = C.term_stats(ds).to_pandas().set_index("term")
    assert stats.loc["alpha", "tf"] == 2 and stats.loc["alpha", "df"] == 1
    assert stats.loc["beta", "tf"] == 3 and stats.loc["beta", "df"] == 2
    assert stats.loc["gamma", "df"] == 1

    top = C.top_terms(ds, k=2, n_docs=3)
    assert list(top["term"]) == ["beta", "alpha"]    # tf desc, term asc
    assert top["idf"].iloc[0] == round(np.log(3 / 2), 6)


def test_posting_lists(corpus):
    ds, df = corpus
    out = C.posting_lists(ds, ["w0", "w17"], cap=10)
    for term in ["w0", "w17"]:
        exp = sorted(i for i, t in zip(df["doc_id"], df["text"])
                     if term in t.split())[:10]
        got = out.loc[out["term"] == term, "docs"].iloc[0]
        assert got == ",".join(str(i) for i in exp)


def test_decontaminate_flag_and_drop(ray_session):
    import ray.data

    bench = ["the quick brown fox jumps over the lazy"]
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "prefix The quick BROWN fox; jumps over the lazy dog",  # hit
            "the quick brown fox sleeps all day long today",        # miss
            "quick brown fox jumps over the lazy",                  # 7 toks
            None,                                                   # null
        ]})
    ds = ray.data.from_pandas(df)
    flagged = C.decontaminate(ds, bench, n=8).to_pandas() \
                                             .set_index("doc_id")
    assert list(flagged["contaminated"]) == [True, False, False, False]
    kept = C.decontaminate(ds, bench, n=8, mode="drop").to_pandas()
    assert sorted(kept["doc_id"]) == [1, 2, 3]
    with pytest.raises(ValueError):
        C.decontaminate(ds, ["too short"], n=8)


def test_size_dispatched_paths_agree(corpus):
    """driver_max_rows=0 forces the DISTRIBUTED finish (bucketed group
    exchange / Sum aggregate / map_groups scan); results must be
    row-identical to the driver path the gate-scale inputs take."""
    ds, df = corpus
    a = C.quota_cap(ds, group_col="lang", score_col="n_chars",
                    n=7).to_pandas()
    b = C.quota_cap(ds, group_col="lang", score_col="n_chars", n=7,
                    driver_max_rows=0).to_pandas()
    key = ["lang", "doc_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[sorted(a.columns)],
        b.sort_values(key).reset_index(drop=True)[sorted(b.columns)])

    sa = C.term_stats(ds).to_pandas().sort_values("term") \
          .reset_index(drop=True)
    sb = C.term_stats(ds, driver_max_rows=0).to_pandas() \
          .sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(sa[sorted(sa.columns)],
                                  sb[sorted(sb.columns)],
                                  check_dtype=False)

    pa_ = C.pack_by_budget(ds, budget=500, weight_col="n_chars",
                           num_buckets=8).to_pandas() \
           .sort_values("doc_id").reset_index(drop=True)
    pb = C.pack_by_budget(ds, budget=500, weight_col="n_chars",
                          num_buckets=8, driver_max_rows=0).to_pandas() \
          .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_[sorted(pa_.columns)],
                                  pb[sorted(pb.columns)],
                                  check_dtype=False)


def test_mixture_sample_rates(corpus):
    ds, df = corpus
    out = C.mixture_sample(ds, {"en": 500, "de": 100},
                           group_col="lang", salt="mx").to_pandas()
    rates = {"en": 500, "de": 100}
    exp = [i for i, g in zip(df["doc_id"], df["lang"])
           if _u64(f"mx:{i}") % 1000 < rates.get(g, 0)]
    assert sorted(out["doc_id"]) == exp
    assert "fr" not in set(out["lang"])          # absent group → rate 0


def test_cluster_consistent_split(ray_session):
    import ray.data

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["aaa", "bbb", "aaa", "ccc", "aaa"]})
    out = C.cluster_consistent_split(
        ray.data.from_pandas(df).repartition(3), salt="z").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # identical texts share the min-id cluster...
    assert list(out["cluster"]) == [0, 1, 0, 3, 0]
    # ...and therefore the split label
    assert out.loc[0, "split"] == out.loc[2, "split"] == out.loc[4, "split"]
    h = _u64("z:1") % 1000
    assert out.loc[1, "split"] == (
        "train" if h < 900 else ("val" if h < 950 else "test"))


def test_global_rank_is_row_number(corpus):
    ds, df = corpus
    for dmr in (200_000, 0):     # driver finish AND distributed scan
        out = C.global_rank(ds, order_cols=["n_chars", "doc_id"],
                            num_buckets=8, driver_max_rows=dmr) \
               .to_pandas().sort_values("doc_id").reset_index(drop=True)
        exp = df.sort_values(["n_chars", "doc_id"]).reset_index()
        exp["rank"] = np.arange(1, len(exp) + 1)
        exp = exp.sort_values("doc_id")
        assert list(out["rank"]) == list(exp["rank"])


def test_pack_by_budget_matches_window(corpus):
    ds, df = corpus
    out = C.pack_by_budget(ds, budget=500, weight_col="n_chars",
                           num_buckets=8).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    exp_before = df.sort_values("doc_id")["n_chars"].cumsum().shift(
        1, fill_value=0).to_numpy()
    assert list(out["bin"]) == list(exp_before // 500)
    # by construction, everything packed through bin k weighs >= (k+1)*
    # budget (the next bin only opens once the running total crosses it)
    sizes = out.groupby("bin")["n_chars"].sum().sort_index()
    cum = sizes.cumsum().iloc[:-1].to_numpy()
    assert (cum >= 500 * (np.arange(len(cum)) + 1)).all()
    # explicit key_range path agrees
    out2 = C.pack_by_budget(ds, budget=500, weight_col="n_chars",
                            key_range=(0, 299), num_buckets=8).to_pandas()
    assert out2.sort_values("doc_id")["bin"].tolist() == out["bin"].tolist()


def test_priority_sample_invariants(corpus):
    """Priority sampling: selected set == global top-k by (priority desc,
    key asc); est_w == max(w, tau) with tau the (k+1)-th priority; sum of
    est_w over the sample is within sampling error of the true sum(w)."""
    import hashlib

    ds, df = corpus
    k = 25
    out = C.priority_sample(ds, k, weight_col="n_chars", key_col="doc_id",
                            salt="t")

    def pri(row):
        h = int.from_bytes(hashlib.md5(
            f"t:{row.doc_id}".encode()).digest()[8:16], "little")
        return float(row.n_chars) / ((float(h) + 1.0) * 2.0 ** -64)

    ref = df.copy()
    ref["priority"] = [pri(r) for r in ref.itertuples()]
    ref = ref.sort_values(["priority", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    want = ref.head(k)
    tau = ref["priority"].iloc[k]
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
    got = out.set_index("doc_id")
    for r in want.itertuples():
        assert got.loc[r.doc_id, "priority"] == r.priority
        assert got.loc[r.doc_id, "est_w"] == max(float(r.n_chars), tau)
    # Horvitz-Thompson: the estimator should land near the true total
    assert abs(out["est_w"].sum() - df["n_chars"].sum()) \
        / df["n_chars"].sum() < 0.5


def test_priority_sample_small_corpus_tau_zero(ray_session):
    """k >= corpus: everything selected, tau=0, est_w == w."""
    import ray.data

    df = pd.DataFrame({"doc_id": [1, 2, 3], "w0": [5, 1, 9]})
    out = C.priority_sample(ray.data.from_pandas(df), 10,
                            weight_col="w0", key_col="doc_id")
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["est_w"]) == [5.0, 1.0, 9.0]


def test_bm25_topk_matches_local_reference(corpus):
    """Distributed two-pass BM25 == single-process textbook scoring."""
    import math
    import re

    ds, df = corpus
    q = ["w1", "w2", "w7"]
    k1, b = 1.2, 0.75
    out = C.bm25_topk(ds, q, 8)

    word = re.compile(r"[a-z0-9_]+")
    toks = {r.doc_id: word.findall(r.text.lower()) for r in df.itertuples()}
    n = len(df)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {t: sum(1 for ts in toks.values() if t in ts) for t in q}
    scores = {}
    for d, ts in toks.items():
        s, hit = 0.0, False
        for t in sorted(set(q)):
            tf = ts.count(t)
            if tf:
                hit = True
                idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
                               + 1.0)
                s += idf * tf * (k1 + 1.0) \
                    / (tf + k1 * (1.0 - b + b * len(ts) / avgdl))
        if hit:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    want = sorted(want)
    assert list(out["doc_id"]) == [d for d, _ in want]
    assert list(out["score"]) == [s for _, s in want]


def test_uniform_sample_k_exact_and_extensible(ray_session):
    import ray.data as rd

    from wtes_ray.ops.curate import uniform_sample_k

    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "val": np.arange(200) * 2})
    ds = rd.from_pandas(df).repartition(7)
    s10 = uniform_sample_k(ds, 10, key_col="doc_id").to_pandas()
    s25 = uniform_sample_k(ds, 25, key_col="doc_id").to_pandas()
    assert len(s10) == 10 and len(s25) == 25
    # prefix property: smaller samples are subsets of larger ones
    assert set(s10["doc_id"]).issubset(set(s25["doc_id"]))
    # deterministic across partitionings
    s10b = uniform_sample_k(rd.from_pandas(df).repartition(3), 10,
                            key_col="doc_id").to_pandas()
    assert s10["doc_id"].tolist() == s10b["doc_id"].tolist()
    # payload columns ride along untouched
    assert (s10["val"] == s10["doc_id"] * 2).all()
    # salt changes the permutation
    s10c = uniform_sample_k(ds, 10, key_col="doc_id",
                            salt="other").to_pandas()
    assert s10["doc_id"].tolist() != s10c["doc_id"].tolist()


def test_corpus_diff_hand_computed(ray_session):
    import ray.data as rd

    from wtes_ray.ops.curate import corpus_diff

    old = pd.DataFrame({"doc_id": np.int64([1, 2, 3, 4]),
                        "text": ["a", "b", "c", None]})
    new = pd.DataFrame({"doc_id": np.int64([2, 3, 4, 9]),
                        "text": ["b CHANGED", "c", None, "fresh"]})
    out = corpus_diff(rd.from_pandas(old), rd.from_pandas(new)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(out["doc_id"], out["change"]))
    # 1 removed, 2 changed, 3 unchanged (absent), 4 None==None (absent),
    # 9 added
    assert got == {1: "removed", 2: "changed", 9: "added"}


def test_exact_quantiles_match_sorted_rank(ray_session):
    import ray.data as rd

    from wtes_ray.ops.curate import exact_quantiles

    rng = np.random.default_rng(7)
    v = rng.normal(100.0, 25.0, size=5003)
    v[::37] = v[0]  # ties, including at a probable bucket boundary
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(9)
    qs = [0.01, 0.25, 0.5, 0.9, 0.999, 1.0]
    got = exact_quantiles(ds, "x", qs, num_buckets=64)
    s = np.sort(v)
    import math
    want = [float(s[max(1, math.ceil(q * len(v))) - 1]) for q in qs]
    assert got["q"].tolist() == sorted(qs)
    assert got["value"].tolist() == [w for _, w in
                                     sorted(zip(qs, want))]


def test_exact_quantiles_constant_column(ray_session):
    import ray.data as rd

    from wtes_ray.ops.curate import exact_quantiles

    ds = rd.from_pandas(pd.DataFrame({"x": np.full(100, 3.5)}))
    got = exact_quantiles(ds, "x", [0.5, 1.0], num_buckets=16)
    assert got["value"].tolist() == [3.5, 3.5]


def test_corpus_diff_identical_corpora_is_empty(ray_session):
    import ray.data as rd

    from wtes_ray.ops.curate import corpus_diff

    docs = pd.DataFrame({"doc_id": np.int64([1, 2, 3]),
                         "text": ["a", None, "c"]})
    out = corpus_diff(rd.from_pandas(docs), rd.from_pandas(docs))
    assert out.count() == 0
    # schema survives emptiness (the 0-row to_pandas column-drop gotcha)
    assert set(out.schema().names) == {"doc_id", "change"}


def test_exact_quantiles_skewed_into_one_bucket(ray_session):
    import math

    import ray.data as rd

    from wtes_ray.ops.curate import exact_quantiles

    # 99% of mass collapses into the lowest bucket; a lone outlier
    # stretches the range — the skew case the docstring promises stays
    # correct (pass-2 filtrate just gets bigger)
    v = np.concatenate([np.linspace(0.0, 1.0, 999), [1e9]])
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(7)
    got = exact_quantiles(ds, "x", [0.5, 0.999, 1.0], num_buckets=32)
    s = np.sort(v)
    want = [float(s[max(1, math.ceil(q * len(v))) - 1])
            for q in [0.5, 0.999, 1.0]]
    assert got["value"].tolist() == want


def test_validate_rows_flag_and_drop(ray_session):
    import ray.data as rd

    from wtes_ray.ops.curate import validate_rows

    df = pd.DataFrame({"x": np.int64([1, -2, 3, -4, 500]),
                       "y": ["a", "b", "a", "b", "c"]})
    rules = [("neg", lambda t: t["x"].to_numpy() < 0),
             ("big", lambda t: t["x"].to_numpy() > 100)]
    ds = rd.from_pandas(df).repartition(2)
    flagged = validate_rows(ds, rules).to_pandas().sort_values("x")
    assert flagged["bad_neg"].sum() == 2
    assert flagged["bad_big"].sum() == 1
    assert (flagged["n_bad"] == flagged["bad_neg"].astype(int)
            + flagged["bad_big"].astype(int)).all()
    clean = validate_rows(ds, rules, mode="drop").to_pandas()
    assert sorted(clean["x"]) == [1, 3]
