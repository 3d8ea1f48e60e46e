"""Iterative graph computation over edge Datasets: distributed PageRank.

The reference system materializes an entity-relation graph (Neo4j sink /
pyecharts chart, ``src/IO/neo4jExecutor.py``); a training-data engine built
on that graph needs graph-wide scores, and PageRank is the canonical one
(used in practice for web-corpus quality weighting, e.g. Common-Crawl-style
harmonic/PageRank centrality filters).

Shape per iteration (classic power iteration, damping ``d``):

    rank'(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} rank(u)/outdeg(u)
                               + dangling_mass/N )

where ``dangling_mass`` is the total rank sitting on nodes with no
out-edges (redistributed uniformly — the standard stochastic-matrix fix).

Two execution paths, size-dispatched like the rest of the repo
(queries.BROADCAST_ROWS_BUDGET pattern):

- **driver-vector path** (node count ≤ ``nodes_budget``): the rank vector
  is node-sized state, broadcast once per iteration via ``ray.put`` as a
  pandas Series; EDGES stream through ``map_batches`` (never materialized)
  with per-block partial sums per dst, finished by one small
  ``groupby(dst).sum`` exchange. This is the realistic single-cluster
  shape for up to ~10^8 nodes (a float64 vector), even when the edge set
  is 100 TB.
- **distributed path** (above budget, or ``force_distributed``): the rank
  vector itself is a Dataset co-partitioned with the edges through the
  bucketed hash join (ops/joins.py) — nothing node-sized ever lands on
  the driver. Kept exactly result-equivalent to the driver path
  (tests/test_round3.py pins equality to 1e-12).

Both paths make one streaming pass over the edges per iteration — the
information-theoretic minimum for power iteration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from .joins import bucketed_hash_join


def _arrow(df: pd.DataFrame) -> pa.Table:
    # arrow blocks into every exchange; strip the b'pandas' metadata dict
    # that breaks Schema.__hash__ (see queries._arrow)
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def distinct_edges(edges: ray.data.Dataset, *, src: str = "src",
                   dst: str = "dst") -> ray.data.Dataset:
    """Collapse multi-edges to the distinct (src, dst) set.

    Per-block ``drop_duplicates`` partials shrink the exchange (a block
    rarely holds the same pair twice more than once), then one
    groupby-count finishes globally; the count column is dropped."""

    def local(t: pa.Table) -> pa.Table:
        df = t.select([src, dst]).to_pandas().drop_duplicates()
        return _arrow(df)

    from ray.data.aggregate import Count
    return edges.map_batches(local, batch_format="pyarrow") \
        .groupby([src, dst]).aggregate(Count()) \
        .map_batches(lambda t: t.select([src, dst]), batch_format="pyarrow")


def out_degrees(edges: ray.data.Dataset, *, src: str = "src",
                dst: str = "dst") -> ray.data.Dataset:
    """(node, outdeg) over the DISTINCT edge set — one row per node that
    has at least one out-edge."""
    from ray.data.aggregate import Count

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "outdeg"])

    return edges.groupby(src).aggregate(Count()) \
        .map_batches(rename, batch_format="pyarrow")


def _node_set(edges: ray.data.Dataset, src: str, dst: str) -> ray.data.Dataset:
    """Distinct (node) Dataset = src ∪ dst. Per-block Arrow distinct
    partials, finished by one groupby-count (NOT per-group map_groups —
    the ~50 µs/group dispatch trap, see ops.dedup._grouped_exchange)."""
    from ray.data.aggregate import Count

    def both(t: pa.Table) -> pa.Table:
        col = pa.concat_arrays([
            c.combine_chunks() for c in (t.column(src).cast(pa.int64()),
                                         t.column(dst).cast(pa.int64()))])
        u = pa.Table.from_arrays([col], names=["node"])
        return u.group_by("node").aggregate([])

    return edges.map_batches(both, batch_format="pyarrow") \
        .groupby("node").aggregate(Count()) \
        .map_batches(lambda t: t.select(["node"]), batch_format="pyarrow")


def pagerank(edges: ray.data.Dataset, *, iterations: int = 3,
             damping: float = 0.85, src: str = "src", dst: str = "dst",
             dedupe: bool = True, nodes_budget: int = 1_000_000,
             force_distributed: bool = False,
             num_buckets: int = 32) -> ray.data.Dataset:
    """Distributed PageRank over an edge Dataset; returns (node, pagerank).

    ``dedupe=False`` asserts the input is already a distinct edge set and
    skips the collapse exchange. Path dispatch: driver-vector when the
    node count fits ``nodes_budget``, bucketed-join otherwise (see module
    docstring)."""
    from .dedup import _consolidate
    e = distinct_edges(edges, src=src, dst=dst) if dedupe else edges
    # ~iterations passes read the edge set; pin the blocks once, and
    # coalesce the groupby's many tiny output blocks (sort-slice trap,
    # see ops.dedup._consolidate) before the per-iteration exchanges
    e = _consolidate(e)

    nodes = _node_set(e, src, dst).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(_arrow(
            pd.DataFrame({"node": pd.Series([], dtype="int64"),
                          "pagerank": pd.Series([], dtype="float64")})))
    base = (1.0 - damping) / n

    if not force_distributed and n <= nodes_budget:
        return _pagerank_driver_vector(e, nodes, n, base, damping,
                                       iterations, src, dst)
    return _pagerank_distributed(e, nodes, n, base, damping, iterations,
                                 src, dst, num_buckets)


def _pagerank_driver_vector(e, nodes, n, base, damping, iterations,
                            src, dst) -> ray.data.Dataset:
    deg = out_degrees(e, src=src, dst=dst).to_pandas()
    node_ids = nodes.to_pandas()["node"].to_numpy()
    outdeg = pd.Series(0, index=node_ids, dtype="int64")
    outdeg.loc[deg["node"].to_numpy()] = deg["outdeg"].to_numpy()
    rank = pd.Series(1.0 / n, index=node_ids, dtype="float64")
    dangling_ix = outdeg.index[outdeg.to_numpy() == 0]

    for _ in range(iterations):
        w = rank[outdeg > 0] / outdeg[outdeg > 0]
        w_ref = ray.put(w)

        def partial(t: pa.Table, *, _w=w_ref) -> pa.Table:
            ws = ray.get(_w) if isinstance(_w, ray.ObjectRef) else _w
            df = t.select([src, dst]).to_pandas()
            c = ws.reindex(df[src].to_numpy()).to_numpy()
            out = (pd.DataFrame({"dst": df[dst].to_numpy(), "contrib": c})
                   .groupby("dst", as_index=False)["contrib"].sum())
            return _arrow(out)

        contrib = e.map_batches(partial, batch_format="pyarrow") \
            .groupby("dst").aggregate(Sum("contrib", alias_name="contrib")) \
            .to_pandas()
        dangling = float(rank[dangling_ix].sum())
        new = pd.Series(base + damping * dangling / n, index=node_ids,
                        dtype="float64")
        new.loc[contrib["dst"].to_numpy()] += \
            damping * contrib["contrib"].to_numpy()
        rank = new

    out = pd.DataFrame({"node": node_ids, "pagerank": rank.to_numpy()})
    return ray.data.from_arrow(_arrow(out))


def _pagerank_distributed(e, nodes, n, base, damping, iterations,
                          src, dst, num_buckets) -> ray.data.Dataset:
    deg = out_degrees(e, src=src, dst=dst)
    state_schema = pa.schema([("node", pa.int64()), ("outdeg", pa.int64()),
                              ("rank", pa.float64())])

    def seed(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["outdeg"] = df["outdeg"].fillna(0).astype("int64")
        df["rank"] = 1.0 / n
        return _arrow(df[["node", "outdeg", "rank"]])

    state = bucketed_hash_join(
        nodes, deg, on="node", how="left", num_buckets=num_buckets) \
        .map_batches(seed, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        def weights(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["outdeg"] > 0]
            out = pd.DataFrame({src: df["node"].to_numpy(),
                                "w": (df["rank"] / df["outdeg"]).to_numpy()})
            return _arrow(out)

        w = state.map_batches(weights, batch_format="pyarrow")
        joined = bucketed_hash_join(
            e, w, on=src, num_buckets=num_buckets,
            right_schema=pa.schema([(src, pa.int64()), ("w", pa.float64())]))

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            out = (pd.DataFrame({"node": df[dst].to_numpy(),
                                 "contrib": df["w"].to_numpy()})
                   .groupby("node", as_index=False)["contrib"].sum())
            return _arrow(out)

        contrib = joined.map_batches(partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("contrib", alias_name="contrib"))

        def dangling_partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            s = float(df.loc[df["outdeg"] == 0, "rank"].sum())
            return _arrow(pd.DataFrame({"d": [s]}))

        dangling = state.map_batches(
            dangling_partial, batch_format="pyarrow").sum("d") or 0.0

        def advance(t: pa.Table, *, _dg=dangling) -> pa.Table:
            df = t.to_pandas()
            c = df["contrib"].fillna(0.0) if "contrib" in df.columns else 0.0
            df["rank"] = base + damping * (c + _dg / n)
            return _arrow(df[["node", "outdeg", "rank"]])

        state = bucketed_hash_join(
            state, contrib, on="node", how="left", num_buckets=num_buckets,
            left_schema=state_schema,
            right_schema=pa.schema([("node", pa.int64()),
                                    ("contrib", pa.float64())])) \
            .map_batches(advance, batch_format="pyarrow").materialize()

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _arrow(pd.DataFrame({"node": df["node"].to_numpy(),
                                    "pagerank": df["rank"].to_numpy()}))

    return state.map_batches(finish, batch_format="pyarrow")


def personalized_pagerank(edges: ray.data.Dataset, teleport, *,
                          iterations: int = 3, damping: float = 0.85,
                          src: str = "src", dst: str = "dst",
                          dedupe: bool = True,
                          nodes_budget: int = 1_000_000,
                          force_distributed: bool = False,
                          num_buckets: int = 32) -> ray.data.Dataset:
    """Personalized PageRank: teleportation lands on the seed set
    ``teleport`` (uniformly over its members that exist in the graph)
    instead of all nodes — the standard seed-relative relevance score
    (used in practice to rank a crawl frontier or corpus relative to a
    trusted seed set).

        r'(v) = (1-d)·t(v) + d·(Σ_{(u,v)} r(u)/outdeg(u)
                                + dangling_mass·t(v))

    with ``t(v) = 1/|S∩V|`` on the seed set, 0 elsewhere, and
    ``r0 = t``. Dangling mass returns to the seeds (the personalized
    stochastic fix). Same two size-dispatched arms as :func:`pagerank`
    (driver-vector / bucketed-join), pinned result-equal in tests. The
    arithmetic is grouped exactly as the unrolled SQL oracle groups it
    ((1-d)·t + d·(c + dg·t)) so 8dp rounding absorbs only ULP noise."""
    from .dedup import _consolidate
    e = distinct_edges(edges, src=src, dst=dst) if dedupe else edges
    e = _consolidate(e)
    nodes = _node_set(e, src, dst).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(_arrow(
            pd.DataFrame({"node": pd.Series([], dtype="int64"),
                          "ppr": pd.Series([], dtype="float64")})))
    tset = set(int(x) for x in teleport)

    if not force_distributed and n <= nodes_budget:
        return _ppr_driver_vector(e, nodes, tset, damping, iterations,
                                  src, dst)
    return _ppr_distributed(e, nodes, tset, damping, iterations, src, dst,
                            num_buckets)


def _ppr_driver_vector(e, nodes, tset, damping, iterations, src, dst
                       ) -> ray.data.Dataset:
    deg = out_degrees(e, src=src, dst=dst).to_pandas()
    node_ids = nodes.to_pandas()["node"].to_numpy()
    tele_mask = np.isin(node_ids, np.fromiter(tset, dtype=np.int64))
    n_t = int(tele_mask.sum())
    if n_t == 0:
        raise ValueError("teleport set does not intersect the graph")
    tele = pd.Series(np.where(tele_mask, 1.0 / n_t, 0.0), index=node_ids)
    outdeg = pd.Series(0, index=node_ids, dtype="int64")
    outdeg.loc[deg["node"].to_numpy()] = deg["outdeg"].to_numpy()
    dangling_ix = outdeg.index[outdeg.to_numpy() == 0]
    rank = tele.copy()

    for _ in range(iterations):
        w = rank[outdeg > 0] / outdeg[outdeg > 0]
        w_ref = ray.put(w)

        def partial(t: pa.Table, *, _w=w_ref) -> pa.Table:
            ws = ray.get(_w) if isinstance(_w, ray.ObjectRef) else _w
            df = t.select([src, dst]).to_pandas()
            c = ws.reindex(df[src].to_numpy()).to_numpy()
            out = (pd.DataFrame({"dst": df[dst].to_numpy(), "contrib": c})
                   .groupby("dst", as_index=False)["contrib"].sum())
            return _arrow(out)

        contrib = e.map_batches(partial, batch_format="pyarrow") \
            .groupby("dst").aggregate(Sum("contrib", alias_name="contrib")) \
            .to_pandas()
        dangling = float(rank[dangling_ix].sum())
        c_full = pd.Series(0.0, index=node_ids, dtype="float64")
        c_full.loc[contrib["dst"].to_numpy()] = contrib["contrib"].to_numpy()
        # grouped EXACTLY as the SQL oracle groups it
        rank = (1.0 - damping) * tele + damping * (c_full + dangling * tele)

    out = pd.DataFrame({"node": node_ids, "ppr": rank.to_numpy()})
    return ray.data.from_arrow(_arrow(out))


def _ppr_distributed(e, nodes, tset, damping, iterations, src, dst,
                     num_buckets) -> ray.data.Dataset:
    deg = out_degrees(e, src=src, dst=dst)
    # |S ∩ V| via one streaming pass (the seed set is small — broadcast)
    tref = ray.put(tset)

    def tcount(t: pa.Table) -> pa.Table:
        ts = ray.get(tref) if isinstance(tref, ray.ObjectRef) else tref
        m = pd.Index(t.column("node").to_numpy()).isin(ts)
        return _arrow(pd.DataFrame({"c": [int(m.sum())]}))

    n_t = int(nodes.map_batches(tcount, batch_format="pyarrow").sum("c")
              or 0)
    if n_t == 0:
        raise ValueError("teleport set does not intersect the graph")
    state_schema = pa.schema([("node", pa.int64()), ("outdeg", pa.int64()),
                              ("tele", pa.float64()),
                              ("rank", pa.float64())])

    def seed(t: pa.Table) -> pa.Table:
        ts = ray.get(tref) if isinstance(tref, ray.ObjectRef) else tref
        df = t.to_pandas()
        df["outdeg"] = df["outdeg"].fillna(0).astype("int64")
        df["tele"] = np.where(pd.Index(df["node"]).isin(ts),
                              1.0 / n_t, 0.0)
        df["rank"] = df["tele"]
        return _arrow(df[["node", "outdeg", "tele", "rank"]])

    state = bucketed_hash_join(
        nodes, deg, on="node", how="left", num_buckets=num_buckets) \
        .map_batches(seed, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        def weights(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["outdeg"] > 0]
            out = pd.DataFrame({src: df["node"].to_numpy(),
                                "w": (df["rank"] / df["outdeg"]).to_numpy()})
            return _arrow(out)

        w = state.map_batches(weights, batch_format="pyarrow")
        joined = bucketed_hash_join(
            e, w, on=src, num_buckets=num_buckets,
            right_schema=pa.schema([(src, pa.int64()), ("w", pa.float64())]))

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            out = (pd.DataFrame({"node": df[dst].to_numpy(),
                                 "contrib": df["w"].to_numpy()})
                   .groupby("node", as_index=False)["contrib"].sum())
            return _arrow(out)

        contrib = joined.map_batches(partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("contrib", alias_name="contrib"))

        def dangling_partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            s = float(df.loc[df["outdeg"] == 0, "rank"].sum())
            return _arrow(pd.DataFrame({"d": [s]}))

        dangling = state.map_batches(
            dangling_partial, batch_format="pyarrow").sum("d") or 0.0

        def advance(t: pa.Table, *, _dg=dangling) -> pa.Table:
            df = t.to_pandas()
            c = (df["contrib"].fillna(0.0).to_numpy()
                 if "contrib" in df.columns else 0.0)
            tele = df["tele"].to_numpy()
            df["rank"] = ((1.0 - damping) * tele
                          + damping * (c + _dg * tele))
            return _arrow(df[["node", "outdeg", "tele", "rank"]])

        state = bucketed_hash_join(
            state, contrib, on="node", how="left", num_buckets=num_buckets,
            left_schema=state_schema,
            right_schema=pa.schema([("node", pa.int64()),
                                    ("contrib", pa.float64())])) \
            .map_batches(advance, batch_format="pyarrow").materialize()

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _arrow(pd.DataFrame({"node": df["node"].to_numpy(),
                                    "ppr": df["rank"].to_numpy()}))

    return state.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact triangle counting (rank-oriented wedge join)
# ---------------------------------------------------------------------------

def triangle_count(edges: ray.data.Dataset, *, src: str = "src",
                   dst: str = "dst", num_buckets: int = 64,
                   nodes_budget: int = 5_000_000) -> int:
    """EXACT triangle count of the undirected simple graph underlying
    ``edges`` (direction/multi-edges/self-loops collapsed) — the classic
    MR algorithm (Suri & Vassilvitskii's node-iterator with degree
    orientation):

    1. canonicalize + distinct (one groupby over (min, max) endpoint
       pairs, self-loops dropped);
    2. undirected degrees (one groupby over both endpoints);
    3. orient every edge low→high by TOTAL rank (degree, node) — each
       triangle then has exactly ONE node with out-edges to both others,
       and every node's out-degree is O(√m), which bounds the wedge set
       (Σ outdeg² ≤ m^1.5) independent of hub skew;
    4. wedges (all out-neighbor pairs, rank-ordered) co-partition with
       the oriented edges by a deterministic hash of the (x, y) pair;
       each bucket merges on the REAL pair columns (the hash only routes)
       and counts matches — wedges and edges each cross the exchange
       exactly once.

    Degrees attach to edges through two bucketed hash joins (edge-sized
    exchanges; nothing node-sized lands on the driver). Returns the count
    (a driver int — the one scalar the job produces)."""
    from .joins import bucketed_hash_join

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        keep = u != v
        df = pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()
        return _arrow(df)

    from ray.data.aggregate import Count
    e = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby(["u", "v"]).aggregate(Count()) \
        .map_batches(lambda t: t.select(["u", "v"]),
                     batch_format="pyarrow").materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        col = pa.concat_arrays([t.column("u").combine_chunks(),
                                t.column("v").combine_chunks()])
        return pa.Table.from_arrays([col], names=["node"])

    deg = e.map_batches(both_ends, batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="deg")).materialize()

    # size dispatch (the repo's broadcast-cutover pattern): degrees are
    # NODE-sized — below the budget they broadcast once (ray.put of two
    # numpy arrays + searchsorted lookup per batch, zero exchanges);
    # above it they attach through two bucketed hash joins (edge-sized
    # exchanges, nothing node-sized on the driver)
    if deg.count() <= nodes_budget:
        dpd = deg.to_pandas().sort_values("node")
        ref = ray.put((dpd["node"].to_numpy().astype(np.int64),
                       dpd["deg"].to_numpy().astype(np.int64)))

        def attach_deg(df: pd.DataFrame) -> pd.DataFrame:
            nodes, degs = ray.get(ref)
            df = df.copy()
            df["__du"] = degs[np.searchsorted(
                nodes, df["u"].to_numpy().astype(np.int64))]
            df["__dv"] = degs[np.searchsorted(
                nodes, df["v"].to_numpy().astype(np.int64))]
            return df

        with_deg = e.map_batches(attach_deg, batch_format="pandas")
    else:
        du = deg.map_batches(lambda t: t.rename_columns(["u", "__du"]),
                             batch_format="pyarrow")
        dv = deg.map_batches(lambda t: t.rename_columns(["v", "__dv"]),
                             batch_format="pyarrow")
        with_du = bucketed_hash_join(e, du, "u", num_buckets=num_buckets)
        with_deg = bucketed_hash_join(with_du, dv, "v",
                                      num_buckets=num_buckets)

    def orient(df: pd.DataFrame) -> pa.Table:
        # low→high by (degree, node); carry the head's degree so wedge
        # generation can rank-order neighbor pairs without another join
        lo_first = (df["__du"] < df["__dv"]) | (
            (df["__du"] == df["__dv"]) & (df["u"] < df["v"]))
        s = np.where(lo_first, df["u"], df["v"])
        d = np.where(lo_first, df["v"], df["u"])
        dd = np.where(lo_first, df["__dv"], df["__du"])
        return _arrow(pd.DataFrame({
            "s": s.astype(np.int64), "d": d.astype(np.int64),
            "dd": dd.astype(np.int64)}))

    oriented = with_deg.map_batches(orient,
                                    batch_format="pandas").materialize()

    def pair_key(x: pd.Series, y: pd.Series) -> np.ndarray:
        # deterministic 64-bit routing hash of the pair (SipHash via
        # pandas' fixed key, x and y mixed) — co-partition only; buckets
        # match on the real columns, so collisions cannot miscount
        hx = pd.util.hash_pandas_object(x, index=False).to_numpy()
        hy = pd.util.hash_pandas_object(y, index=False).to_numpy()
        with np.errstate(over="ignore"):
            return ((hx * np.uint64(0x9E3779B97F4A7C15)) ^ hy).astype(
                np.int64)

    def wedges(df: pd.DataFrame) -> pa.Table:
        # one bucket of sources (co-partitioned by s): per node, all
        # rank-ordered out-neighbor pairs
        xs, ys = [], []
        for _, grp in df.groupby("s", sort=False):
            if len(grp) < 2:
                continue
            order = np.lexsort((grp["d"].to_numpy(),
                                grp["dd"].to_numpy()))
            nb = grp["d"].to_numpy()[order]
            i, j = np.triu_indices(len(nb), k=1)
            xs.append(nb[i])
            ys.append(nb[j])
        if not xs:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "__k": pa.array([], pa.int64())})
        # pre-reduce before the exchange: a pair wedged by many apexes in
        # this bucket rides once with a count, not once per apex
        red = pd.DataFrame({"x": np.concatenate(xs),
                            "y": np.concatenate(ys)}) \
            .groupby(["x", "y"], as_index=False).size() \
            .rename(columns={"size": "cnt"})
        return pa.table({"x": pa.array(red["x"].to_numpy()),
                         "y": pa.array(red["y"].to_numpy()),
                         "cnt": pa.array(red["cnt"].to_numpy()
                                         .astype(np.int64)),
                         "__k": pa.array(pair_key(red["x"], red["y"]))})

    from .dedup import _grouped_exchange

    wedge_rows = _grouped_exchange(oriented, "s", wedges,
                                   num_buckets=num_buckets)

    def edge_rows(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "x": pa.array(df["s"].to_numpy()),
            "y": pa.array(df["d"].to_numpy()),
            "cnt": pa.array(np.zeros(len(df), dtype=np.int64)),
            "__k": pa.array(pair_key(df["s"], df["d"])),
            "__e": pa.array(np.ones(len(df), dtype=np.int8))})

    tagged_e = oriented.map_batches(edge_rows, batch_format="pandas")

    def add_side(t: pa.Table) -> pa.Table:
        if "__e" in t.schema.names:
            return t
        return t.append_column("__e", pa.nulls(t.num_rows, pa.int8()))

    unioned = wedge_rows.map_batches(add_side, batch_format="pyarrow") \
        .union(tagged_e)

    def count_bucket(df: pd.DataFrame) -> pa.Table:
        em = df["__e"].notna()
        ed = df[em][["x", "y"]].drop_duplicates()
        wd = df[~em]
        n = int(wd.merge(ed, on=["x", "y"], how="inner")["cnt"].sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    counts = _grouped_exchange(unioned, "__k", count_bucket,
                               num_buckets=num_buckets)
    out = counts.aggregate(Sum("n", alias_name="n"))
    return int(out["n"]) if out["n"] is not None else 0


def khop_reach(edges: ray.data.Dataset, seeds, hops: int, *,
               src: str = "src", dst: str = "dst") -> pd.DataFrame:
    """Bounded-round BFS reachability from a seed set: the cumulative
    reached-node count after each hop (hop 0 = the seeds themselves).

    Each hop is ONE streaming pass over the edge Dataset: the visited-id
    array broadcasts via ``ray.put``, every block emits the unique dst
    ids whose src is visited (a sorted ``np.isin`` probe — edges never
    materialize), and one small groupby dedups the frontier before it
    lands on the driver. Driver state is the visited id vector —
    node-sized, the same budget argument as the PageRank driver-vector
    arm (int64 ids for 10^8 nodes ≈ 800 MB; beyond that the expansion
    becomes a bucketed semi join per hop, the ops/joins machinery the
    distributed PPR arm already uses)."""
    from ray.data.aggregate import Count

    visited = np.unique(np.asarray(sorted(seeds), dtype=np.int64))
    if len(visited) == 0:
        raise ValueError("khop_reach needs a non-empty seed set")
    out_hops, out_n = [0], [len(visited)]
    for h in range(1, hops + 1):
        ref = ray.put(visited)

        def expand(t: pa.Table) -> pa.Table:
            vis = ray.get(ref)
            s = t.column(src).to_numpy(zero_copy_only=False)
            d = t.column(dst).to_numpy(zero_copy_only=False)
            nd = np.unique(d[np.isin(s, vis)]).astype(np.int64)
            return pa.table({"node": pa.array(nd, pa.int64())})

        new = edges.map_batches(expand, batch_format="pyarrow") \
            .groupby("node").aggregate(Count()).to_pandas()
        if len(new):
            visited = np.union1d(visited, new["node"].to_numpy())
        out_hops.append(h)
        out_n.append(len(visited))
    return pd.DataFrame({"hop": pd.Series(out_hops, dtype="int64"),
                         "n_reached": pd.Series(out_n, dtype="int64")})


def weighted_pagerank(edges: ray.data.Dataset, *, weight: str = "w",
                      iterations: int = 3, damping: float = 0.85,
                      src: str = "src", dst: str = "dst",
                      nodes_budget: int = 1_000_000,
                      force_distributed: bool = False,
                      num_buckets: int = 32) -> ray.data.Dataset:
    """Edge-weighted PageRank: contribution rank(u)·w_uv / W_u with
    out-strength W_u = Σ_v w_uv — the weighted-graph generalization used
    for citation/click graphs where edge multiplicity is signal.

    The input must already be the AGGREGATED edge list (one row per
    (src, dst) with its combined weight): unlike :func:`pagerank` there
    is no dedupe pass here, because how multi-edge weights combine (sum,
    max, …) is a semantic choice the caller owns. Weights are assumed
    positive, so dangling (zero out-strength) coincides with no-out-edge
    nodes. Same dual driver-vector / bucketed-join arms as
    :func:`pagerank`, dispatched on the node budget and pinned
    result-equal in tests. Parity note for oracles: contributions are
    computed as (rank / W_u) · w_uv — keep that association order."""
    from .dedup import _consolidate
    e = _consolidate(edges)
    nodes = _node_set(e, src, dst).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(_arrow(
            pd.DataFrame({"node": pd.Series([], dtype="int64"),
                          "pagerank": pd.Series([], dtype="float64")})))
    base = (1.0 - damping) / n
    if not force_distributed and n <= nodes_budget:
        return _wpr_driver_vector(e, nodes, n, base, damping, iterations,
                                  src, dst, weight)
    return _wpr_distributed(e, nodes, n, base, damping, iterations,
                            src, dst, weight, num_buckets)


def _wpr_driver_vector(e, nodes, n, base, damping, iterations,
                       src, dst, weight) -> ray.data.Dataset:
    ws = e.groupby(src).aggregate(Sum(weight, alias_name="wsum")) \
        .to_pandas()
    node_ids = nodes.to_pandas()["node"].to_numpy()
    wsum = pd.Series(0.0, index=node_ids, dtype="float64")
    wsum.loc[ws[src].to_numpy()] = ws["wsum"].to_numpy()
    rank = pd.Series(1.0 / n, index=node_ids, dtype="float64")
    dangling_ix = wsum.index[wsum.to_numpy() == 0.0]

    for _ in range(iterations):
        rw = rank[wsum > 0] / wsum[wsum > 0]
        w_ref = ray.put(rw)

        def partial(t: pa.Table, *, _w=w_ref) -> pa.Table:
            rws = ray.get(_w) if isinstance(_w, ray.ObjectRef) else _w
            df = t.select([src, dst, weight]).to_pandas()
            c = rws.reindex(df[src].to_numpy()).to_numpy() \
                * df[weight].to_numpy()
            out = (pd.DataFrame({"dst": df[dst].to_numpy(), "contrib": c})
                   .groupby("dst", as_index=False)["contrib"].sum())
            return _arrow(out)

        contrib = e.map_batches(partial, batch_format="pyarrow") \
            .groupby("dst").aggregate(Sum("contrib", alias_name="contrib")) \
            .to_pandas()
        dangling = float(rank[dangling_ix].sum())
        new = pd.Series(base + damping * dangling / n, index=node_ids,
                        dtype="float64")
        new.loc[contrib["dst"].to_numpy()] += \
            damping * contrib["contrib"].to_numpy()
        rank = new

    out = pd.DataFrame({"node": node_ids, "pagerank": rank.to_numpy()})
    return ray.data.from_arrow(_arrow(out))


def _wpr_distributed(e, nodes, n, base, damping, iterations,
                     src, dst, weight, num_buckets) -> ray.data.Dataset:
    ws = e.groupby(src).aggregate(Sum(weight, alias_name="wsum"))

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "wsum"])

    ws = ws.map_batches(rename, batch_format="pyarrow")
    state_schema = pa.schema([("node", pa.int64()), ("wsum", pa.float64()),
                              ("rank", pa.float64())])

    def seed(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["wsum"] = df["wsum"].fillna(0.0).astype("float64")
        df["rank"] = 1.0 / n
        return _arrow(df[["node", "wsum", "rank"]])

    state = bucketed_hash_join(
        nodes, ws, on="node", how="left", num_buckets=num_buckets) \
        .map_batches(seed, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        def weights_stage(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["wsum"] > 0]
            out = pd.DataFrame({src: df["node"].to_numpy(),
                                "rw": (df["rank"] / df["wsum"]).to_numpy()})
            return _arrow(out)

        w = state.map_batches(weights_stage, batch_format="pyarrow")
        joined = bucketed_hash_join(
            e, w, on=src, num_buckets=num_buckets,
            right_schema=pa.schema([(src, pa.int64()),
                                    ("rw", pa.float64())]))

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            out = (pd.DataFrame({
                "node": df[dst].to_numpy(),
                "contrib": df["rw"].to_numpy() * df[weight].to_numpy()})
                .groupby("node", as_index=False)["contrib"].sum())
            return _arrow(out)

        contrib = joined.map_batches(partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("contrib", alias_name="contrib"))

        def dangling_partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            s = float(df.loc[df["wsum"] == 0.0, "rank"].sum())
            return _arrow(pd.DataFrame({"d": [s]}))

        dangling = state.map_batches(
            dangling_partial, batch_format="pyarrow").sum("d") or 0.0

        def advance(t: pa.Table, *, _dg=dangling) -> pa.Table:
            df = t.to_pandas()
            c = df["contrib"].fillna(0.0) if "contrib" in df.columns else 0.0
            df["rank"] = base + damping * (c + _dg / n)
            return _arrow(df[["node", "wsum", "rank"]])

        state = bucketed_hash_join(
            state, contrib, on="node", how="left", num_buckets=num_buckets,
            left_schema=state_schema,
            right_schema=pa.schema([("node", pa.int64()),
                                    ("contrib", pa.float64())])) \
            .map_batches(advance, batch_format="pyarrow").materialize()

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _arrow(pd.DataFrame({"node": df["node"].to_numpy(),
                                    "pagerank": df["rank"].to_numpy()}))

    return state.map_batches(finish, batch_format="pyarrow")


def hits(edges: ray.data.Dataset, *, iterations: int = 2,
         src: str = "src", dst: str = "dst", dedupe: bool = True,
         nodes_budget: int = 1_000_000, force_distributed: bool = False,
         num_buckets: int = 32) -> ray.data.Dataset:
    """HITS hubs/authorities over an edge Dataset; returns
    ``(node, authority, hub)``.

    Kleinberg's iteration, L1-normalized (divide by the score sum — keeps
    every step a plain SUM/JOIN, so the unrolled-CTE oracle in
    queries/graphml.py evaluates the exact same recurrence in ANSI SQL;
    L2 would work too but buys nothing and costs a SQRT per step):

        a_k(v) = Σ_{(u,v)∈E} h_{k-1}(u)   then  a_k /= Σ_v a_k(v)
        h_k(u) = Σ_{(u,v)∈E} a_k(v)       then  h_k /= Σ_u h_k(u)

    Nodes with no in-edges get authority 0; no out-edges → hub 0. Same
    size-dispatched dual arms as :func:`pagerank` (driver-vector when the
    node count fits ``nodes_budget``, bucketed-join otherwise), pinned
    result-equal in tests/test_round5.py. Two streaming edge passes per
    iteration — the information-theoretic minimum for the two half-steps.

    Reference tie-in: the ER graph the reference ships to Neo4j
    (src/IO/neo4jExecutor.py) is a hub-shaped web graph (subject pages
    fan out to property values); HITS is the classic score pair for
    exactly that topology.
    """
    from .dedup import _consolidate
    e = distinct_edges(edges, src=src, dst=dst) if dedupe else edges
    e = _consolidate(e)

    nodes = _node_set(e, src, dst).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(_arrow(
            pd.DataFrame({"node": pd.Series([], dtype="int64"),
                          "authority": pd.Series([], dtype="float64"),
                          "hub": pd.Series([], dtype="float64")})))

    if not force_distributed and n <= nodes_budget:
        return _hits_driver_vector(e, nodes, n, iterations, src, dst)
    return _hits_distributed(e, nodes, n, iterations, src, dst, num_buckets)


def _hits_half_step(e, w_series, key_in, key_out) -> pd.DataFrame:
    """One HITS half-step: stream the edges, weight each edge by the
    broadcast score of its ``key_in`` endpoint, partial-sum per
    ``key_out`` endpoint inside the block, finish with one small
    node-keyed groupby. Returns the UNNORMALIZED (node, v) frame."""
    w_ref = ray.put(w_series)

    def partial(t: pa.Table, *, _w=w_ref) -> pa.Table:
        ws = ray.get(_w) if isinstance(_w, ray.ObjectRef) else _w
        df = t.select([key_in, key_out]).to_pandas()
        c = ws.reindex(df[key_in].to_numpy()).to_numpy()
        out = (pd.DataFrame({"node": df[key_out].to_numpy(), "v": c})
               .groupby("node", as_index=False)["v"].sum())
        return _arrow(out)

    return e.map_batches(partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("v", alias_name="v")).to_pandas()


def _hits_driver_vector(e, nodes, n, iterations, src, dst):
    node_ids = nodes.to_pandas()["node"].to_numpy()
    h = pd.Series(1.0 / n, index=node_ids, dtype="float64")
    a = pd.Series(0.0, index=node_ids, dtype="float64")

    for _ in range(iterations):
        ar = _hits_half_step(e, h, src, dst)
        a = pd.Series(0.0, index=node_ids, dtype="float64")
        a.loc[ar["node"].to_numpy()] = ar["v"].to_numpy()
        s = float(a.sum())
        if s > 0:
            a /= s
        hr = _hits_half_step(e, a, dst, src)
        h = pd.Series(0.0, index=node_ids, dtype="float64")
        h.loc[hr["node"].to_numpy()] = hr["v"].to_numpy()
        s = float(h.sum())
        if s > 0:
            h /= s

    out = pd.DataFrame({"node": node_ids, "authority": a.to_numpy(),
                        "hub": h.to_numpy()})
    return ray.data.from_arrow(_arrow(out))


def _hits_distributed(e, nodes, n, iterations, src, dst, num_buckets):
    """State dataset (node, a, h) co-partitioned with the edges through
    the bucketed hash join; the L1 normalizer is the only driver-side
    value per half-step (one scalar ``Dataset.sum``)."""
    state_schema = pa.schema([("node", pa.int64()), ("a", pa.float64()),
                              ("h", pa.float64())])

    def seed(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _arrow(pd.DataFrame({"node": df["node"].to_numpy(),
                                    "a": 0.0, "h": 1.0 / n}))

    state = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    def half(state, score_col, key_in, key_out, out_col):
        def weights(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            return _arrow(pd.DataFrame({key_in: df["node"].to_numpy(),
                                        "w": df[score_col].to_numpy()}))

        w = state.map_batches(weights, batch_format="pyarrow")
        joined = bucketed_hash_join(
            e, w, on=key_in, num_buckets=num_buckets,
            right_schema=pa.schema([(key_in, pa.int64()),
                                    ("w", pa.float64())]))

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            out = (pd.DataFrame({"node": df[key_out].to_numpy(),
                                 "v": df["w"].to_numpy()})
                   .groupby("node", as_index=False)["v"].sum())
            return _arrow(out)

        raw = joined.map_batches(partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("v", alias_name="v")) \
            .materialize()
        s = raw.sum("v") or 0.0

        def advance(t: pa.Table, *, _s=s) -> pa.Table:
            df = t.to_pandas()
            v = df["v"].fillna(0.0) if "v" in df.columns else 0.0
            df[out_col] = (v / _s) if _s > 0 else 0.0
            return _arrow(df[["node", "a", "h"]])

        return bucketed_hash_join(
            state, raw, on="node", how="left", num_buckets=num_buckets,
            left_schema=state_schema,
            right_schema=pa.schema([("node", pa.int64()),
                                    ("v", pa.float64())])) \
            .map_batches(advance, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        state = half(state, "h", src, dst, "a")
        state = half(state, "a", dst, src, "h")

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _arrow(df[["node", "a", "h"]].rename(
            columns={"a": "authority", "h": "hub"}))

    return state.map_batches(finish, batch_format="pyarrow")


_SSSP_INF = 1 << 60         # integer infinity sentinel (shared with the SQL)


def sssp(edges: ray.data.Dataset, source: int, *, rounds: int = 4,
         src: str = "src", dst: str = "dst", weight: str = "w",
         nodes_budget: int = 1_000_000, force_distributed: bool = False,
         num_buckets: int = 32) -> ray.data.Dataset:
    """Bounded-round single-source shortest paths (synchronous
    Bellman-Ford) over a weighted edge Dataset; returns ``(node, dist)``
    for every node reachable from ``source`` within ``rounds`` hops.

    Relaxation per round (min is order-independent, and the weights are
    integers, so BOTH arms and the unrolled-CTE SQL oracle are bit-exact
    — no rounding needed, unlike the float iterations):

        dist_k(v) = min( dist_{k-1}(v),
                         min_{(u,v,w)∈E, dist_{k-1}(u) finite}
                             dist_{k-1}(u) + w )

    Parallel edges collapse to their MIN weight first (one groupby).
    Unreached nodes carry the ``_SSSP_INF`` sentinel internally and are
    dropped from the output. Same size-dispatched dual arms as
    :func:`pagerank`; one streaming edge pass per round.
    """
    from ray.data.aggregate import Min

    e = edges.groupby([src, dst]).aggregate(Min(weight, alias_name=weight))
    from .dedup import _consolidate
    e = _consolidate(e)

    nodes = _node_set(e, src, dst).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(_arrow(
            pd.DataFrame({"node": pd.Series([], dtype="int64"),
                          "dist": pd.Series([], dtype="int64")})))

    if not force_distributed and n <= nodes_budget:
        return _sssp_driver_vector(e, nodes, source, rounds, src, dst,
                                   weight)
    return _sssp_distributed(e, nodes, source, rounds, src, dst, weight,
                             num_buckets)


def _sssp_driver_vector(e, nodes, source, rounds, src, dst, weight):
    from ray.data.aggregate import Min

    node_ids = nodes.to_pandas()["node"].to_numpy()
    dist = pd.Series(_SSSP_INF, index=node_ids, dtype="int64")
    if source in dist.index:
        dist.loc[source] = 0

    for _ in range(rounds):
        d_ref = ray.put(dist)

        def partial(t: pa.Table, *, _d=d_ref) -> pa.Table:
            dv = ray.get(_d) if isinstance(_d, ray.ObjectRef) else _d
            df = t.select([src, dst, weight]).to_pandas()
            du = dv.reindex(df[src].to_numpy()).to_numpy()
            fin = du < _SSSP_INF
            if not fin.any():
                return _arrow(pd.DataFrame(
                    {"node": pd.Series([], dtype="int64"),
                     "m": pd.Series([], dtype="int64")}))
            cand = du[fin] + df[weight].to_numpy()[fin]
            out = (pd.DataFrame({"node": df[dst].to_numpy()[fin],
                                 "m": cand})
                   .groupby("node", as_index=False)["m"].min())
            return _arrow(out)

        relax = e.map_batches(partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Min("m", alias_name="m")).to_pandas()
        if len(relax):
            cur = dist.loc[relax["node"].to_numpy()].to_numpy()
            dist.loc[relax["node"].to_numpy()] = np.minimum(
                cur, relax["m"].to_numpy())

    out = pd.DataFrame({"node": node_ids, "dist": dist.to_numpy()})
    out = out[out["dist"] < _SSSP_INF].reset_index(drop=True)
    return ray.data.from_arrow(_arrow(out))


def _sssp_distributed(e, nodes, source, rounds, src, dst, weight,
                      num_buckets):
    """State dataset (node, dist) co-partitioned with the edges; the
    relaxation join and the state merge are both bucketed — nothing
    node-sized on the driver."""
    from ray.data.aggregate import Min

    state_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])

    def seed(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        d = np.full(len(df), _SSSP_INF, dtype=np.int64)
        d[df["node"].to_numpy() == source] = 0
        return _arrow(pd.DataFrame({"node": df["node"].to_numpy(),
                                    "dist": d}))

    state = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    for _ in range(rounds):
        def frontier(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["dist"] < _SSSP_INF]
            return _arrow(pd.DataFrame({src: df["node"].to_numpy(),
                                        "du": df["dist"].to_numpy()}))

        f = state.map_batches(frontier, batch_format="pyarrow")
        joined = bucketed_hash_join(
            e, f, on=src, num_buckets=num_buckets,
            right_schema=pa.schema([(src, pa.int64()),
                                    ("du", pa.int64())]))

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            out = (pd.DataFrame({
                "node": df[dst].to_numpy(),
                "m": df["du"].to_numpy() + df[weight].to_numpy()})
                .groupby("node", as_index=False)["m"].min())
            return _arrow(out)

        relax = joined.map_batches(partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Min("m", alias_name="m"))

        def advance(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            m = (df["m"].fillna(_SSSP_INF).astype("int64")
                 if "m" in df.columns
                 else pd.Series(_SSSP_INF, index=df.index, dtype="int64"))
            df["dist"] = np.minimum(df["dist"].to_numpy(), m.to_numpy())
            return _arrow(df[["node", "dist"]])

        state = bucketed_hash_join(
            state, relax, on="node", how="left", num_buckets=num_buckets,
            left_schema=state_schema,
            right_schema=pa.schema([("node", pa.int64()),
                                    ("m", pa.int64())])) \
            .map_batches(advance, batch_format="pyarrow").materialize()

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _arrow(df[df["dist"] < _SSSP_INF][["node", "dist"]])

    return state.map_batches(finish, batch_format="pyarrow")
