"""Round-3 additions: sort-within-partition window forms (tested equal to
the per-group map_groups references), the IVF partitioned-index path,
er_to_chart link canonicalization (changeRList2linkList parity), string-id
connected components on the forced-distributed path, and left-join block
schema homogeneity."""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def events_dir(ray_session, tmp_path_factory):
    """A small synthetic events table exercising the window edge cases:
    multi-session users, same-ts click/purchase pairs, purchase-first
    users, click-only users, and a click exactly 1 h before a purchase."""
    rng = np.random.RandomState(42)
    rows = []
    eid = 0
    t0 = pd.Timestamp("2025-06-01 00:00:00")
    for uid in range(17):
        n = int(rng.randint(1, 25))
        ts = t0
        for _ in range(n):
            ts = ts + pd.Timedelta(seconds=int(rng.randint(1, 4000)))
            rows.append({"event_id": eid, "user_id": uid,
                         "event_type": str(rng.choice(
                             ["click", "view", "purchase"])),
                         "ts": ts})
            eid += 1
    # same-timestamp click+purchase (click's event_id sorts first)
    rows.append({"event_id": eid, "user_id": 100, "event_type": "click",
                 "ts": t0}); eid += 1
    rows.append({"event_id": eid, "user_id": 100, "event_type": "purchase",
                 "ts": t0}); eid += 1
    # click exactly 1 h before a purchase (>= bound must count it)
    rows.append({"event_id": eid, "user_id": 101, "event_type": "click",
                 "ts": t0}); eid += 1
    rows.append({"event_id": eid, "user_id": 101, "event_type": "purchase",
                 "ts": t0 + pd.Timedelta(hours=1)}); eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path_factory.mktemp("events_sf")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "events.parquet"))
    return str(d)


def test_sessionize_matches_map_groups_reference(events_dir):
    from wtes_ray import queries as Q
    got = Q.sessionize_events(events_dir)
    ref = Q.sessionize_events_map_groups(events_dir)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  ref.reset_index(drop=True))


def test_last_click_matches_map_groups_reference(events_dir):
    from wtes_ray import queries as Q
    got = Q.last_click_before_purchase(events_dir)
    ref = Q.last_click_before_purchase_map_groups(events_dir)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  ref.reset_index(drop=True))


def test_clicks_1h_matches_map_groups_reference(events_dir):
    from wtes_ray import queries as Q
    got = Q.clicks_before_purchase_1h(events_dir)
    ref = Q.clicks_before_purchase_1h_map_groups(events_dir)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  ref.reset_index(drop=True))
    # the >=-bound edge: user 101's purchase must count the click at
    # exactly ts - 1h
    u101 = got[got["event_id"] == got["event_id"].max()]
    assert u101["n_clicks_1h"].iloc[0] == 1


@pytest.fixture(scope="module")
def emb_index_dir(ray_session, tmp_path_factory):
    import ray.data
    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((120, 16))
    vecs[7] = vecs[3] + 0.001 * rng.standard_normal(16)   # planted near-dup
    df = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})
    d = tmp_path_factory.mktemp("ivf_idx")
    ds = ray.data.from_pandas(df)
    from wtes_ray.ops.similarity import build_ivf_index
    cent = build_ivf_index(ds, str(d), n_centroids=4, train_size=120)
    return str(d), cent, df


def test_ivf_index_full_probe_equals_bruteforce(emb_index_dir):
    import ray.data
    from wtes_ray.ops.similarity import ivf_search_index, topk_cosine
    d, cent, df = emb_index_dir
    q = np.asarray(df["embedding"][3], dtype=np.float64)
    got = ivf_search_index(d, q, k=5, nprobe=4).to_pandas()
    ref = topk_cosine(ray.data.from_pandas(df), q, 5).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  ref.reset_index(drop=True))


def test_ivf_index_prunes_partitions_and_persists_centroids(emb_index_dir):
    from wtes_ray.ops.similarity import ivf_search_index, load_ivf_centroids
    d, cent, df = emb_index_dir
    # centroids persisted next to the data
    np.testing.assert_array_equal(load_ivf_centroids(d), cent)
    # hive layout: one directory per non-empty list
    parts = [p for p in os.listdir(d) if p.startswith("centroid_id=")]
    assert len(parts) >= 2
    # nprobe=1 scans a strict subset yet still finds the planted near-dup
    # of vec 3 when probing around vec 3's own centroid
    q = np.asarray(df["embedding"][3], dtype=np.float64)
    got = ivf_search_index(d, q, k=2, nprobe=1).to_pandas()
    assert set(got["vec_id"]) == {3, 7}


def test_er_chart_links_canonicalize_through_url2name():
    from wtes_ray.report import er_to_chart
    entities = [
        [["Alice", "http://a"], {"age": "30"}],
        [["A. Liddell", "http://a"], {}],      # dup url → node skipped
        [["Bob", ""], {}],
    ]
    relations = [
        # endpoint cites the dup url with the NON-canonical name: the link
        # must attach to the surviving node "Alice"
        [["A. Liddell", "http://a"], "knows", ["Bob", ""]],
        # url seen first in the RELATION loop is recorded, then reused
        [["Carol", "http://c"], "likes", ["Alice", "http://a"]],
        [["C2", "http://c"], "hates", ["Bob", ""]],
    ]
    data = er_to_chart(entities, relations)
    names = [n["name"] for n in data["nodes"]]
    assert names == ["Alice", "Bob"]
    links = [(l["source"], l["value"], l["target"]) for l in data["links"]]
    assert links == [("Alice", "knows", "Bob"),
                     ("Carol", "likes", "Alice"),
                     ("Carol", "hates", "Bob")]


def test_neardup_clusters_string_ids_forced_distributed(ray_session):
    import ray.data
    from wtes_ray.ops.dedup import neardup_clusters
    pairs = pd.DataFrame({
        "a": ["d1", "d2", "x9"],
        "b": ["d2", "d3", "x10"],
    })
    got = neardup_clusters(ray.data.from_pandas(pairs),
                           driver_max_pairs=1)   # force distributed path
    assert list(got["doc_id"]) == ["d1", "d2", "d3", "x10", "x9"]
    assert list(got["cluster_id"]) == ["d1", "d1", "d1", "x10", "x10"]


def test_left_join_blocks_share_one_pinned_schema(ray_session):
    """Unmatched left rows NULL-pad int columns; every output block must
    still carry the same pinned Arrow schema (no per-bucket float64
    fallback → heterogeneous blocks)."""
    import ray
    import ray.data
    from wtes_ray.ops.joins import bucketed_hash_join
    left = pd.DataFrame({"k": np.arange(40, dtype=np.int64),
                         "lv": np.arange(40, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 40, 2, dtype=np.int64),
                          "rv": np.arange(20, dtype=np.int64)})
    out = bucketed_hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), "k",
        how="left", num_buckets=4,
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]))
    blocks = [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
    schemas = {b.schema.to_string() for b in blocks}
    assert len(schemas) == 1, schemas
    tbl = pa.concat_tables(blocks)
    assert tbl.schema.field("rv").type == pa.int64()
    df = tbl.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["rv"].isna().sum() == 20     # unmatched odd keys → NULL
    assert len(df) == 40


SF0001 = "/root/testdata/sf0.001"


@pytest.mark.parametrize("qname", ["q3_shipping_priority",
                                   "revenue_by_nation", "part_brand_qty"])
def test_broadcast_join_cutover_paths_agree(ray_session, qname):
    """The size-budget cutover must be invisible in the result: forcing the
    bucketed-join path (budget=0) returns exactly what the broadcast path
    (budget=huge) returns on the same input."""
    from wtes_ray import queries as Q
    fn = getattr(Q, qname)
    broadcast = fn(SF0001, broadcast_rows_budget=10**9)
    joined = fn(SF0001, broadcast_rows_budget=0)
    pd.testing.assert_frame_equal(broadcast.reset_index(drop=True),
                                  joined.reset_index(drop=True))


def test_combine_pairs_driver_and_distributed_paths_agree(ray_session):
    """_combine_pairs' size dispatch must be invisible in the result: the
    driver-side combine (pair count under the cap) and the bucketed
    exchange (cap forced to 0) return the same deduped pairs."""
    import ray.data

    from wtes_ray.ops.dedup import _combine_pairs

    # pair (1,2) collides in three source buckets with truncation flags
    # that must any-combine; (3,4) and (1,9) are singletons
    raw = pd.DataFrame({
        "a": [1, 1, 1, 3, 1],
        "b": [2, 2, 2, 4, 9],
        "est_jaccard": [0.9, 0.9, 0.9, 0.8, 0.7],
        "truncated": [False, True, False, False, False]})
    ds = ray.data.from_pandas(raw).repartition(3)
    want = pd.DataFrame({
        "a": [1, 1, 3], "b": [2, 9, 4],
        "est_jaccard": [0.9, 0.7, 0.8],
        "truncated": [True, False, False]})

    got_driver = _combine_pairs(ds, "est_jaccard").to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    got_dist = _combine_pairs(ds, "est_jaccard", driver_max_rows=0) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)

    want = want.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_driver, want, check_like=True)
    pd.testing.assert_frame_equal(got_dist, want, check_like=True)


def test_empty_schema_warning_filter_is_selective():
    """The log filter drops ONLY Ray's empty-new-schema RefBundle warning
    (spurious: emitted for every groupby().aggregate() with fewer groups
    than sort partitions); a real schema divergence still logs."""
    import logging

    from wtes_ray.ops.runtime import (_EmptySchemaDivergenceFilter,
                                      quiet_empty_schema_warnings)

    f = _EmptySchemaDivergenceFilter()

    def rec(msg):
        return logging.LogRecord("ray.data", logging.WARNING, __file__, 1,
                                 msg, None, None)

    spurious = ("Operator produced a RefBundle with a different schema "
                "than the previous one. Previous schema: a: int64, "
                "new schema: . This may lead to unexpected behavior.")
    real = ("Operator produced a RefBundle with a different schema "
            "than the previous one. Previous schema: a: int64, "
            "new schema: b: string. This may lead to unexpected behavior.")
    assert not f.filter(rec(spurious))
    assert f.filter(rec(real))
    assert f.filter(rec("some other warning"))

    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    quiet_empty_schema_warnings()
    quiet_empty_schema_warnings()  # idempotent
    assert sum(isinstance(x, _EmptySchemaDivergenceFilter)
               for x in lg.filters) == 1


# ---------------------------------------------------------------------------
# PageRank (ops/graph.py)
# ---------------------------------------------------------------------------

def _dense_pagerank(edges, iters=3, d=0.85):
    """Dense numpy reference: damped power iteration with uniform
    dangling-mass redistribution over the distinct edge set."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[ix[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[ix[v]] += r[ix[u]] / outdeg[ix[u]]
        dangling = r[outdeg == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return dict(zip(nodes, r))


def test_pagerank_matches_dense_reference_with_dangling(ray_session):
    """Graph with a dangling node (3), a multi-edge (0→1 twice, must
    collapse), a self-loop and an isolated sink."""
    import ray.data as rd

    from wtes_ray.ops.graph import pagerank

    raw = [(0, 1), (0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 4), (5, 3)]
    ds = rd.from_pandas(pd.DataFrame(raw, columns=["src", "dst"]))
    got = pagerank(ds, iterations=3).to_pandas() \
        .set_index("node")["pagerank"].to_dict()
    want = _dense_pagerank(raw)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # total rank is conserved by the dangling redistribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_distributed_path_equals_driver_path(ray_session):
    import ray.data as rd

    from wtes_ray.ops.graph import pagerank

    rng = np.random.RandomState(7)
    raw = list(zip(rng.randint(0, 40, 300), rng.randint(0, 45, 300)))
    ds = rd.from_pandas(pd.DataFrame(raw, columns=["src", "dst"]))
    a = pagerank(ds, iterations=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = pagerank(ds, iterations=2, force_distributed=True,
                 num_buckets=8).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert a["node"].tolist() == b["node"].tolist()
    np.testing.assert_allclose(a["pagerank"], b["pagerank"], atol=1e-12)


def test_pagerank_empty_edges(ray_session):
    import ray.data as rd

    from wtes_ray.ops.graph import pagerank

    ds = rd.from_pandas(pd.DataFrame(
        {"src": pd.Series([], dtype="int64"),
         "dst": pd.Series([], dtype="int64")}))
    out = pagerank(ds, iterations=2)
    # NB: Ray's to_pandas() drops columns for 0-row datasets; the schema
    # (the Dataset contract) is what downstream stages consume
    assert out.count() == 0
    assert out.schema().names == ["node", "pagerank"]
