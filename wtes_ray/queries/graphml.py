from ._common import *  # noqa: F401,F403
from .tpch import *  # noqa: F401,F403
from .relational import *  # noqa: F401,F403
from .events import *  # noqa: F401,F403
from .text import *  # noqa: F401,F403
from .dedup import *  # noqa: F401,F403
from .ann import *  # noqa: F401,F403
from .extraction import *  # noqa: F401,F403
from .media import *  # noqa: F401,F403
from .curation import *  # noqa: F401,F403



def degree_assortativity_lineitem(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity of the order–part graph (node = key mod 1000):
    Pearson correlation of endpoint degrees over the DIRECTED edge
    multiset (each undirected edge contributes both orientations — the
    standard Newman definition). Shape: distinct-undirected-edge groupby →
    degree groupby (node-sized) → degrees broadcast (node table ≤ 1000 —
    above a node budget this becomes two bucketed joins) → one streaming
    moment pass (5 doubles per block) → driver close. SQL computes the
    SAME uncentered formula over the mirrored edge list."""
    import ray as _ray
    from ray.data.aggregate import Count
    from ray.data.aggregate import Sum as _Sum

    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey",
                                                   "l_partkey"])

    def mk_edges(t: pa.Table) -> pa.Table:
        a = t.column("l_orderkey").to_numpy() % _PR_MOD
        b = t.column("l_partkey").to_numpy() % _PR_MOD
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table({"a": pa.array(lo[keep], pa.int64()),
                         "b": pa.array(hi[keep], pa.int64())})

    from ..ops.dedup import _consolidate
    edges = _consolidate(ds.map_batches(mk_edges, batch_format="pyarrow")
                         .groupby(["a", "b"]).aggregate(Count())
                         .select_columns(["a", "b"]))

    def deg_partial(t: pa.Table) -> pd.DataFrame:
        nodes = np.concatenate([t.column("a").to_numpy(),
                                t.column("b").to_numpy()])
        ns, cnt = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": ns, "deg": cnt.astype("int64")})

    # node-bounded (mod-1000) -> per-block partials + driver combine
    # (the Aggregate pathology note in SCALING.md)
    deg = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .to_pandas().groupby("node", as_index=False)["deg"].sum()
    dmap = dict(zip(deg["node"], deg["deg"].astype("float64")))
    ref = _ray.put(dmap)

    def moments(t: pa.Table) -> pa.Table:
        dm = _ray.get(ref)
        da = np.array([dm[v] for v in t.column("a").to_pylist()])
        db = np.array([dm[v] for v in t.column("b").to_pylist()])
        # both orientations: x = concat(da, db), y = concat(db, da)
        x = np.concatenate([da, db])
        y = np.concatenate([db, da])
        return pa.table({"n": pa.array([float(len(x))]),
                         "sx": pa.array([float(x.sum())]),
                         "sxx": pa.array([float((x * x).sum())]),
                         "sxy": pa.array([float((x * y).sum())])})

    m = edges.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    num = m["n"] * m["sxy"] - m["sx"] * m["sx"]   # sy == sx by symmetry
    den = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    return pd.DataFrame({"assortativity": [round(num / den, 6)]})



# Shared graph-synthesis modulus: node id = key % _PR_MOD for every
# lineitem-derived graph query (assortativity, CC, PageRank). Defined here,
# BEFORE the SQL builders, so the oracle strings interpolate the same value
# the Ray side reads — no hand-sync.
_PR_MOD = 1000


DEGREE_ASSORT_SQL = """
WITH e0 AS (
  SELECT LEAST(l_orderkey % {{mod}}, l_partkey % {{mod}}) AS a,
         GREATEST(l_orderkey % {{mod}}, l_partkey % {{mod}}) AS b
  FROM lineitem
  WHERE l_orderkey % {{mod}} <> l_partkey % {{mod}}),
e AS (SELECT DISTINCT a, b FROM e0),
d AS (SELECT node, CAST(COUNT(*) AS DOUBLE) AS deg FROM (
        SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
      GROUP BY node),
pairs AS (
  SELECT da.deg AS x, db.deg AS y
  FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b
  UNION ALL
  SELECT db.deg AS x, da.deg AS y
  FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy FROM pairs)
SELECT ROUND((n * sxy - sx * sx) / (n * sxx - sx * sx), 6)
         AS assortativity
FROM m
""".replace("{{mod}}", str(_PR_MOD))



_CC_ROUNDS = 4



def cc_labels_lineitem(sf_dir: str) -> pd.DataFrame:
    """Min-label propagation over the order–part graph (node = key mod
    1000), exactly ``_CC_ROUNDS`` synchronized rounds — the bounded-round
    form of connected components (the converged form backs
    ops/dedup.neardup_clusters_ds; fixing the round count makes the
    ITERATION ITSELF value-checkable against an unrolled CTE chain, the
    5th oracled iterative algorithm beside PageRank / k-means / PQ /
    BPE). One streaming pass per round: per-block min-label partials per
    destination + one node-keyed groupby; the node-sized label vector
    broadcasts (mod-1000 graph; the >budget path is the bucketed-join
    arm of neardup_clusters_ds). Integer math — bit-exact by
    construction."""
    import ray as _ray
    from ray.data.aggregate import Count
    from ray.data.aggregate import Min as _Min

    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey",
                                                   "l_partkey"])

    def mk_sym(t: pa.Table) -> pa.Table:
        a = t.column("l_orderkey").to_numpy() % _PR_MOD
        b = t.column("l_partkey").to_numpy() % _PR_MOD
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({
            "u": pa.array(np.concatenate([a, b]), pa.int64()),
            "v": pa.array(np.concatenate([b, a]), pa.int64())})

    from ..ops.dedup import _consolidate
    sym = _consolidate(ds.map_batches(mk_sym, batch_format="pyarrow")
                       .groupby(["u", "v"]).aggregate(Count())
                       .select_columns(["u", "v"]))

    def node_partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"u": np.unique(
            t.column("u").to_numpy(zero_copy_only=False))})

    nodes = sorted(set(sym.map_batches(
        node_partial, batch_format="pyarrow").to_pandas()["u"]))
    labels = {n: n for n in nodes}
    for _ in range(_CC_ROUNDS):
        ref = _ray.put(labels)

        def contrib(t: pa.Table) -> pd.DataFrame:
            lm = _ray.get(ref)
            df = pd.DataFrame({
                "node": t.column("u").to_numpy(zero_copy_only=False),
                "lab": [lm[v] for v in t.column("v").to_pylist()]})
            return df.groupby("node", as_index=False)["lab"].min()

        # node-bounded (mod-1000) -> per-block partials + driver combine
        # (the Aggregate pathology note in SCALING.md)
        mins = sym.map_batches(contrib, batch_format="pyarrow") \
            .to_pandas().groupby("node", as_index=False)["lab"].min()
        new = dict(labels)
        for node, lab in zip(mins["node"], mins["lab"]):
            if lab < new[node]:
                new[node] = lab
        labels = new

    return pd.DataFrame({"node": list(labels.keys()),
                         "label": list(labels.values())}) \
        .astype("int64").sort_values("node").reset_index(drop=True)



def _cc_sql(rounds: int = _CC_ROUNDS) -> str:
    ctes = [f"""e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(l_orderkey % {_PR_MOD}, l_partkey % {_PR_MOD}) AS a,
         GREATEST(l_orderkey % {_PR_MOD}, l_partkey % {_PR_MOD}) AS b
  FROM lineitem
  WHERE l_orderkey % {_PR_MOD} <> l_partkey % {_PR_MOD})""",
            """sym AS MATERIALIZED (
  SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b AS u, a AS v FROM e0)""",
            """l0 AS MATERIALIZED (
  SELECT DISTINCT u AS node, u AS lab FROM sym)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""l{r} AAS (
  SELECT n.node,
         LEAST(n.lab, COALESCE(m.minlab, n.lab)) AS lab
  FROM l{r - 1} n LEFT JOIN (
    SELECT s.u AS node, MIN(p.lab) AS minlab
    FROM sym s JOIN l{r - 1} p ON p.node = s.v GROUP BY s.u) m
  USING (node))""".replace("AAS (", "AS MATERIALIZED ("))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, lab AS label FROM l{rounds} ORDER BY node")



_KCORE_K = 5

_KCORE_ROUNDS = 3

_KCORE_MOD = 8192



def kcore_lineitem(sf_dir: str) -> pd.DataFrame:
    """Bounded-round k-core peeling (k=5, 3 synchronized rounds) over the
    mod-8192 order–part graph (this modulus thins the graph so the peel
    genuinely removes nodes at every test scale — mod-1000 is too dense
    to bite): each round drops nodes whose CURRENT degree — over
    edges with both endpoints still alive — is below k. The bounded-round
    form makes the peeling itself oracle-checkable (unrolled CTE chain,
    like cc_labels_lineitem). One streaming degree pass per round against
    the broadcast alive set (node-sized; the >budget arm is a bucketed
    semi join). Output: surviving nodes with their within-core degree."""
    import ray as _ray
    from ray.data.aggregate import Count
    from ray.data.aggregate import Sum as _Sum

    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey",
                                                   "l_partkey"])

    def mk_edges(t: pa.Table) -> pa.Table:
        a = t.column("l_orderkey").to_numpy() % _KCORE_MOD
        b = t.column("l_partkey").to_numpy() % _KCORE_MOD
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table({"a": pa.array(lo[keep], pa.int64()),
                         "b": pa.array(hi[keep], pa.int64())})

    from ..ops.dedup import _consolidate
    edges = _consolidate(
        ds.map_batches(mk_edges, batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Count())
        .select_columns(["a", "b"]))

    alive: set | None = None          # None = all alive (round 0)
    deg_df = None
    for _ in range(_KCORE_ROUNDS):
        ref = _ray.put(alive)

        def deg_partial(t: pa.Table) -> pd.DataFrame:
            al = _ray.get(ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            if al is not None:
                m = (np.fromiter((x in al for x in a), bool, len(a))
                     & np.fromiter((x in al for x in b), bool, len(b)))
                a, b = a[m], b[m]
            ns, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
            return pd.DataFrame({"node": ns, "deg": cnt.astype("int64")})

        # per-block partials + driver combine: the node table is
        # _KCORE_MOD-bounded (a dimension), and Ray's sort-based
        # Aggregate measured ~15 s/round on this many-tiny-block layout
        # vs <1 s here (see SCALING.md round-5 aggregate-pathology note)
        deg_df = edges.map_batches(deg_partial, batch_format="pyarrow") \
            .to_pandas().groupby("node", as_index=False)["deg"].sum()
        alive = set(deg_df[deg_df["deg"] >= _KCORE_K]["node"])

    out = deg_df[deg_df["node"].isin(alive)].copy()
    out["deg"] = out["deg"].astype("int64")
    out["node"] = out["node"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)



def _kcore_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    ctes = [f"""e AS MATERIALIZED (
  SELECT DISTINCT LEAST(l_orderkey % {_KCORE_MOD},
                        l_partkey % {_KCORE_MOD}) AS a,
         GREATEST(l_orderkey % {_KCORE_MOD},
                  l_partkey % {_KCORE_MOD}) AS b
  FROM lineitem
  WHERE l_orderkey % {_KCORE_MOD} <> l_partkey % {_KCORE_MOD})""",
            """a0 AS MATERIALIZED (
  SELECT DISTINCT a AS node FROM e UNION SELECT DISTINCT b FROM e)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(f"""d{r} AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT e.a AS node FROM e
    JOIN a{p} x ON x.node = e.a JOIN a{p} y ON y.node = e.b
    UNION ALL
    SELECT e.b AS node FROM e
    JOIN a{p} x ON x.node = e.a JOIN a{p} y ON y.node = e.b)
  GROUP BY node)""")
        ctes.append(f"""a{r} AS MATERIALIZED (
  SELECT node FROM d{r} WHERE deg >= {k})""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT d.node, d.deg FROM d{rounds} d"
            + f" JOIN a{rounds} USING (node) ORDER BY node")



# ---------------------------------------------------------------------------
# Graph: distributed PageRank (ops/graph.py)
# ---------------------------------------------------------------------------

# _PR_MOD (node id = key % _PR_MOD) is defined up by DEGREE_ASSORT_SQL so
# every graph oracle interpolates the same literal.
_PR_ITERS = 3

_PR_DAMPING = "0.85"    # literal text shared by both sides: float('0.85')

                        # and DuckDB's 0.85 cast to DOUBLE are the same bits


def pagerank_lineitem(sf_dir: str) -> pd.DataFrame:
    """PageRank over the order→part graph (node = key mod 1000): 3 damped
    power iterations with dangling-mass redistribution, each one streaming
    pass over the distinct edge set with per-block partial sums (ops/
    graph.pagerank — driver-vector path at this node count; the bucketed
    fully-distributed path is pinned result-equal in tests)."""
    from ..ops.graph import pagerank

    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("l_orderkey").to_numpy() % _PR_MOD,
            "dst": t.column("l_partkey").to_numpy() % _PR_MOD})

    out = pagerank(ds.map_batches(edges, batch_format="pyarrow"),
                   iterations=_PR_ITERS,
                   damping=float(_PR_DAMPING)).to_pandas()
    out["pagerank"] = out["pagerank"].round(8)
    return out.sort_values("node").reset_index(drop=True)



def triangle_count_lineitem(sf_dir: str) -> pd.DataFrame:
    """Exact triangle count of the order–part graph (node = key mod 5000)
    via ops/graph.triangle_count: degree-oriented wedge join (Suri &
    Vassilvitskii) — each triangle counted at its lowest-rank apex, wedge
    volume bounded by m^1.5 regardless of hub skew, wedges and oriented
    edges co-partitioned by a routing hash and matched on the real pair
    columns."""
    from ..ops.graph import triangle_count

    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(t.column("l_orderkey"), pa.int64()),
            "dst": pc.cast(t.column("l_partkey"), pa.int64())})

    def mod(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("src").to_numpy() % 5000,
            "dst": t.column("dst").to_numpy() % 5000})

    n = triangle_count(
        ds.map_batches(edges, batch_format="pyarrow")
          .map_batches(mod, batch_format="pyarrow"))
    return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})



TRIANGLE_COUNT_SQL = """
WITH e AS (SELECT DISTINCT least(l_orderkey % 5000, l_partkey % 5000) AS u,
                  greatest(l_orderkey % 5000, l_partkey % 5000) AS v
           FROM lineitem WHERE l_orderkey % 5000 <> l_partkey % 5000)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
          JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""



def _pagerank_sql(iters: int = _PR_ITERS, damping: str = _PR_DAMPING,
                  mod: int = _PR_MOD) -> str:
    """Unrolled-CTE PageRank oracle: r{k} references r{k-1}, so DuckDB
    evaluates the exact same power iteration (incl. dangling mass) in
    plain ANSI SQL. 8dp rounding kills summation-order ULP drift (ranks
    are O(1e-3); per-iteration float error is O(1e-16))."""
    d = f"CAST({damping} AS DOUBLE)"
    ctes = [f"""edges AS (
  SELECT DISTINCT l_orderkey % {mod} AS src, l_partkey % {mod} AS dst
  FROM lineitem)""",
            """nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst FROM edges)""",
            """deg AS (SELECT src AS node, COUNT(*) AS outdeg
         FROM edges GROUP BY src)""",
            """nd AS (SELECT n.node, COALESCE(d.outdeg, 0) AS outdeg
        FROM nodes n LEFT JOIN deg d USING (node))""",
            "cnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
            """r0 AS (SELECT node, outdeg, 1.0 / (SELECT n FROM cnt) AS rank
        FROM nd)"""]
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        ctes.append(f"""r{k} AS (
  SELECT nd.node, nd.outdeg,
         (1 - {d}) / (SELECT n FROM cnt)
         + {d} * (COALESCE(c.contrib, 0)
                  + (SELECT COALESCE(SUM(rank), 0) FROM {prev}
                     WHERE outdeg = 0) / (SELECT n FROM cnt)) AS rank
  FROM nd
  LEFT JOIN (SELECT e.dst AS node, SUM(r.rank / r.outdeg) AS contrib
             FROM edges e JOIN {prev} r ON e.src = r.node
             GROUP BY e.dst) c USING (node))""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, ROUND(rank, 8) AS pagerank FROM r{iters}"
            + "\nORDER BY node")



PAGERANK_SQL = _pagerank_sql()


_PPR_TELE_MOD = 50          # teleport seeds: node % 50 == 0 (20 of 1000)


def personalized_pagerank_lineitem(sf_dir: str) -> pd.DataFrame:
    """Personalized PageRank over the order→part graph: teleportation
    lands uniformly on the seed set {node : node % 50 == 0} — the
    seed-relative relevance score (crawl-frontier / corpus weighting
    relative to trusted seeds). Same dangling fix and iteration count as
    pagerank_lineitem; ops/graph.personalized_pagerank, driver-vector arm
    at this node count with the bucketed arm pinned result-equal in
    tests. Oracle: the unrolled r{k} CTE chain with a per-node teleport
    column."""
    from ..ops.graph import personalized_pagerank

    ds = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_orderkey", "l_partkey"])

    def edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("l_orderkey").to_numpy() % _PR_MOD,
            "dst": t.column("l_partkey").to_numpy() % _PR_MOD})

    seeds = range(0, _PR_MOD, _PPR_TELE_MOD)
    out = personalized_pagerank(
        ds.map_batches(edges, batch_format="pyarrow"), seeds,
        iterations=_PR_ITERS, damping=float(_PR_DAMPING)).to_pandas()
    out["ppr"] = out["ppr"].round(8)
    return out.sort_values("node").reset_index(drop=True)


def _ppr_sql(iters: int = _PR_ITERS, damping: str = _PR_DAMPING,
             mod: int = _PR_MOD, tmod: int = _PPR_TELE_MOD) -> str:
    """Unrolled-CTE personalized-PageRank oracle: the pagerank chain with
    a teleport column t(v) = 1/|S∩V| on node %% tmod == 0, r0 = t, and the
    dangling mass redistributed onto t — the same ((1-d)·t + d·(c + dg·t))
    grouping the Ray side computes (8dp rounding kills ULP drift)."""
    d = f"CAST({damping} AS DOUBLE)"
    ctes = [f"""edges AS (
  SELECT DISTINCT l_orderkey % {mod} AS src, l_partkey % {mod} AS dst
  FROM lineitem)""",
            """nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst FROM edges)""",
            """deg AS (SELECT src AS node, COUNT(*) AS outdeg
         FROM edges GROUP BY src)""",
            """nd AS (SELECT n.node, COALESCE(d.outdeg, 0) AS outdeg
        FROM nodes n LEFT JOIN deg d USING (node))""",
            f"""tcnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nt
          FROM nodes WHERE node % {tmod} = 0)""",
            f"""tl AS (SELECT node,
          CASE WHEN node % {tmod} = 0
               THEN 1.0 / (SELECT nt FROM tcnt) ELSE 0.0 END AS t
        FROM nodes)""",
            """r0 AS (SELECT nd.node, nd.outdeg, tl.t, tl.t AS rank
        FROM nd JOIN tl USING (node))"""]
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        ctes.append(f"""r{k} AS (
  SELECT nd.node, nd.outdeg, tl.t,
         (1 - {d}) * tl.t
         + {d} * (COALESCE(c.contrib, 0)
                  + (SELECT COALESCE(SUM(rank), 0) FROM {prev}
                     WHERE outdeg = 0) * tl.t) AS rank
  FROM nd
  JOIN tl USING (node)
  LEFT JOIN (SELECT e.dst AS node, SUM(r.rank / r.outdeg) AS contrib
             FROM edges e JOIN {prev} r ON e.src = r.node
             GROUP BY e.dst) c USING (node))""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, ROUND(rank, 8) AS ppr FROM r{iters}"
            + "\nORDER BY node")


PPR_SQL = _ppr_sql()



def weighted_pagerank_lineitem(sf_dir: str) -> pd.DataFrame:
    """Edge-WEIGHTED PageRank over the order→part graph, weight = total
    quantity shipped across the pair's lineitems (ops/graph.
    weighted_pagerank): contribution rank·w/W_u with out-strength W_u.
    Per-block (src,dst,Σw) partials shrink the one aggregation exchange;
    integer-valued quantities make every weight and out-strength sum
    EXACT regardless of summation order, so only the rank recurrence
    itself needs the 8dp rounding (same argument as pagerank_lineitem).
    The bucketed-join distributed arm is pinned result-equal in tests."""
    from ..ops.graph import weighted_pagerank

    ds = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_orderkey", "l_partkey", "l_quantity"])

    def mk_edges(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "src": t.column("l_orderkey").to_numpy() % _PR_MOD,
            "dst": t.column("l_partkey").to_numpy() % _PR_MOD,
            "w": t.column("l_quantity").to_numpy().astype(np.float64)})
        out = df.groupby(["src", "dst"], as_index=False)["w"].sum()
        return _arrow(out)

    edges = ds.map_batches(mk_edges, batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(Sum("w", alias_name="w"))
    out = weighted_pagerank(edges, iterations=_PR_ITERS,
                            damping=float(_PR_DAMPING)).to_pandas()
    out["pagerank"] = out["pagerank"].round(8)
    return out.sort_values("node").reset_index(drop=True)



def _wpr_sql(iters: int = _PR_ITERS, damping: str = _PR_DAMPING,
             mod: int = _PR_MOD) -> str:
    """Unrolled weighted-PageRank oracle — the _pagerank_sql chain with
    outdeg → out-strength and the Ray side's exact association order
    ((rank / wsum) * w)."""
    d = f"CAST({damping} AS DOUBLE)"
    ctes = [f"""edges AS MATERIALIZED (
  SELECT l_orderkey % {mod} AS src, l_partkey % {mod} AS dst,
         CAST(SUM(l_quantity) AS DOUBLE) AS w
  FROM lineitem GROUP BY 1, 2)""",
            """nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst FROM edges)""",
            """stw AS (SELECT src AS node, SUM(w) AS wsum
         FROM edges GROUP BY src)""",
            """nd AS (SELECT n.node, COALESCE(s.wsum, 0.0) AS wsum
        FROM nodes n LEFT JOIN stw s USING (node))""",
            "cnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
            """r0 AS (SELECT node, wsum, 1.0 / (SELECT n FROM cnt) AS rank
        FROM nd)"""]
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        ctes.append(f"""r{k} AS (
  SELECT nd.node, nd.wsum,
         (1 - {d}) / (SELECT n FROM cnt)
         + {d} * (COALESCE(c.contrib, 0)
                  + (SELECT COALESCE(SUM(rank), 0) FROM {prev}
                     WHERE wsum = 0.0) / (SELECT n FROM cnt)) AS rank
  FROM nd
  LEFT JOIN (SELECT e.dst AS node,
                    SUM((r.rank / r.wsum) * e.w) AS contrib
             FROM edges e JOIN {prev} r ON e.src = r.node
             GROUP BY e.dst) c USING (node))""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, ROUND(rank, 8) AS pagerank FROM r{iters}"
            + "\nORDER BY node")



WEIGHTED_PAGERANK_SQL = _wpr_sql()



_KHOP_HOPS = 3

_KHOP_QTY = 2     # edge sparsifier: only lineitem rows with quantity ≤ this



def khop_reach_lineitem(sf_dir: str) -> pd.DataFrame:
    """Bounded-round BFS from node 0 over a SPARSIFIED order→part graph
    (only lineitem rows with l_quantity ≤ 2 contribute edges — the full
    mod-1000 graph saturates in one hop): cumulative reached count per
    hop (ops/graph.khop_reach — one streaming edge pass per hop, visited
    set broadcast, per-block unique-dst partials, groupby-deduped
    frontier). Oracle: unrolled frontier-union CTE chain (the cc_labels
    generator pattern)."""
    from ..ops.graph import khop_reach

    ds = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_orderkey", "l_partkey", "l_quantity"])

    def mk_edges(t: pa.Table) -> pa.Table:
        keep = t.column("l_quantity").to_numpy() <= _KHOP_QTY
        return pa.table({
            "src": t.column("l_orderkey").to_numpy()[keep] % _PR_MOD,
            "dst": t.column("l_partkey").to_numpy()[keep] % _PR_MOD})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    return khop_reach(edges, {0}, _KHOP_HOPS)



def _khop_sql(hops: int = _KHOP_HOPS) -> str:
    ctes = [f"""edges AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {_PR_MOD} AS src,
         l_partkey % {_PR_MOD} AS dst
  FROM lineitem WHERE l_quantity <= {_KHOP_QTY})""",
            "r0 AS (SELECT CAST(0 AS BIGINT) AS node)"]
    for h in range(1, hops + 1):
        p = h - 1
        ctes.append(f"""r{h} AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT node FROM r{p}
    UNION ALL
    SELECT e.dst AS node FROM edges e JOIN r{p} r ON e.src = r.node))""")
    sels = "\nUNION ALL ".join(
        f"SELECT CAST({h} AS BIGINT) AS hop,"
        f" CAST((SELECT COUNT(*) FROM r{h}) AS BIGINT) AS n_reached"
        for h in range(hops + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sels + "\nORDER BY hop"



KHOP_SQL = _khop_sql()





_HITS_ITERS = 2


def hits_lineitem(sf_dir: str) -> pd.DataFrame:
    """HITS hubs/authorities over the order→part graph (node = key mod
    1000): 2 L1-normalized Kleinberg iterations, two streaming edge
    passes each with per-block partial sums (ops/graph.hits —
    driver-vector arm at this node count; the bucketed fully-distributed
    arm is pinned result-equal in tests/test_round5.py). 8dp rounding
    kills summation-order ULP drift, same argument as pagerank_lineitem
    (scores are O(1e-3), per-step float error O(1e-15))."""
    from ..ops.graph import hits

    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("l_orderkey").to_numpy() % _PR_MOD,
            "dst": t.column("l_partkey").to_numpy() % _PR_MOD})

    out = hits(ds.map_batches(edges, batch_format="pyarrow"),
               iterations=_HITS_ITERS).to_pandas()
    out["authority"] = out["authority"].round(8)
    out["hub"] = out["hub"].round(8)
    return out.sort_values("node").reset_index(drop=True)


def _hits_sql(iters: int = _HITS_ITERS, mod: int = _PR_MOD,
              edges_sql: str | None = None) -> str:
    """Unrolled-CTE HITS oracle: a{k}/h{k} reference h{k-1}/a{k} — DuckDB
    evaluates the exact same L1-normalized iteration in plain ANSI SQL
    (generated chain, the same device as _pagerank_sql/_kmeans_sql).
    ``edges_sql`` overrides the edge source (a SELECT yielding src, dst)
    so the property test can run the SAME chain over ANY graph —
    tests/test_round5.py pins the chain == ops.graph.hits on a random
    edge table, generalizing the oracle beyond the lineitem graph."""
    if edges_sql is None:
        edges_sql = (f"SELECT DISTINCT l_orderkey % {mod} AS src, "
                     f"l_partkey % {mod} AS dst FROM lineitem")
    ctes = [f"""edges AS ({edges_sql})""",
            """nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst FROM edges)""",
            "cnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
            """h0 AS (SELECT node, 1.0 / (SELECT n FROM cnt) AS h
         FROM nodes)"""]
    for k in range(1, iters + 1):
        hp = f"h{k - 1}"
        ctes.append(f"""a{k}r AS (
  SELECT e.dst AS node, SUM(s.h) AS v
  FROM edges e JOIN {hp} s ON e.src = s.node GROUP BY e.dst)""")
        ctes.append(f"""a{k} AS (
  SELECT n.node,
         COALESCE(r.v, 0) / (SELECT SUM(v) FROM a{k}r) AS a
  FROM nodes n LEFT JOIN a{k}r r USING (node))""")
        ctes.append(f"""h{k}r AS (
  SELECT e.src AS node, SUM(s.a) AS v
  FROM edges e JOIN a{k} s ON e.dst = s.node GROUP BY e.src)""")
        ctes.append(f"""h{k} AS (
  SELECT n.node,
         COALESCE(r.v, 0) / (SELECT SUM(v) FROM h{k}r) AS h
  FROM nodes n LEFT JOIN h{k}r r USING (node))""")
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT a.node, ROUND(a.a, 8) AS authority, ROUND(h.h, 8) AS hub
FROM a{iters} a JOIN h{iters} h USING (node)
ORDER BY a.node""")


HITS_SQL = _hits_sql()


_SSSP_ROUNDS = 4


def sssp_lineitem(sf_dir: str) -> pd.DataFrame:
    """Bounded-round single-source shortest paths over the weighted
    order→part graph (node = key mod 1000, integer weight
    ``1 + (orderkey+partkey) % 9``, parallel edges collapsed to MIN
    weight), 4 synchronous Bellman-Ford rounds from node 0 (ops/
    graph.sssp — driver-vector arm here; the bucketed fully-distributed
    arm is pinned result-equal in tests/test_round5.py). All-integer
    min/plus relaxation ⇒ BIT-EXACT vs the unrolled-CTE oracle, no
    rounding anywhere — the 2nd integer-exact iterative surface beside
    cc_labels_lineitem."""
    from ..ops.graph import sssp

    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey",
                                                   "l_partkey"])

    def edges(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy()
        pk = t.column("l_partkey").to_numpy()
        return pa.table({
            "src": pa.array(ok % _PR_MOD, pa.int64()),
            "dst": pa.array(pk % _PR_MOD, pa.int64()),
            "w": pa.array(1 + (ok + pk) % 9, pa.int64())})

    out = sssp(ds.map_batches(edges, batch_format="pyarrow"), 0,
               rounds=_SSSP_ROUNDS).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _sssp_sql(rounds: int = _SSSP_ROUNDS, mod: int = _PR_MOD,
              edges_sql: str | None = None) -> str:
    """Unrolled-CTE Bellman-Ford oracle; the _SSSP_INF sentinel literal
    is shared with ops/graph.sssp, and relaxation only reads finite
    frontier rows — identical to both Ray arms. ``edges_sql`` overrides
    the weighted edge source (SELECT yielding src, dst, w) for the
    any-graph property test in tests/test_round5.py."""
    from ..ops.graph import _SSSP_INF as INF
    if edges_sql is None:
        edges_sql = (f"SELECT l_orderkey % {mod} AS src, "
                     f"l_partkey % {mod} AS dst, "
                     f"1 + (l_orderkey + l_partkey) % 9 AS w FROM lineitem")
    ctes = [f"""e0 AS ({edges_sql})""",
            """edges AS (SELECT src, dst, MIN(w) AS w FROM e0
          GROUP BY src, dst)""",
            """nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst FROM edges)""",
            f"""d0 AS (SELECT node,
         CASE WHEN node = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST({INF} AS BIGINT) END AS dist
         FROM nodes)"""]
    for k in range(1, rounds + 1):
        prev = f"d{k - 1}"
        ctes.append(f"""d{k} AS (
  SELECT n.node, LEAST(p.dist, COALESCE(r.m, CAST({INF} AS BIGINT))) AS dist
  FROM nodes n
  JOIN {prev} p USING (node)
  LEFT JOIN (SELECT e.dst AS node, MIN(p2.dist + e.w) AS m
             FROM edges e JOIN {prev} p2 ON e.src = p2.node
             WHERE p2.dist < {INF} GROUP BY e.dst) r USING (node))""")
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}
WHERE dist < {INF} ORDER BY node""")


SSSP_SQL = _sssp_sql()




_AA_MOD = 5000        # node synthesis modulus (shared with triangle_count)
_AA_DEG_CAP = 64      # wedge centers above this degree are skipped (their
                      # 1/ln(deg) contribution is the smallest; the cap is
                      # the standard candidate-generation bound that keeps
                      # wedge volume <= cap^2 per center at any scale)
_AA_TOPK = 100


def adamic_adar_lineitem(sf_dir: str) -> pd.DataFrame:
    """Adamic-Adar link prediction over the order–part graph (node = key
    mod 5000): for every NON-edge pair (x, y) sharing a common neighbor
    of degree ≤ _AA_DEG_CAP, score = Σ_w 1/ln(deg(w)); top-100 by
    (rounded score DESC, x, y).

    Shape: canon distinct edges → adjacency (2 rows/edge) → ONE bucketed
    per-center exchange (ops/dedup._grouped_exchange) where the group
    SIZE is the degree and pair emission is numpy index arithmetic,
    bounded cap² per center → (x, y) groupby sum → pair-keyed ANTI join
    against the edge set (bucketed, the scale-safe NOT IN) → per-block
    partial top-k + bounded driver finish. Round-BEFORE-rank at 6dp makes
    the cut ULP-stable vs the SQL (scores O(1), float error O(1e-14));
    a common neighbor has degree ≥ 2 so ln(deg) is never 0."""
    from ray.data.aggregate import Sum as _Sum
    from ..ops.dedup import _grouped_exchange
    from ..ops.joins import bucketed_hash_join

    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey",
                                                   "l_partkey"])

    def canon(t: pa.Table) -> pa.Table:
        a = t.column("l_orderkey").to_numpy() % _AA_MOD
        b = t.column("l_partkey").to_numpy() % _AA_MOD
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table({"a": pa.array(lo[keep], pa.int64()),
                         "b": pa.array(hi[keep], pa.int64())})

    edges = ds.map_batches(canon, batch_format="pyarrow") \
        .groupby(["a", "b"]).count().select_columns(["a", "b"]) \
        .materialize()

    def adj(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        return pa.table({
            "c": pa.array(np.concatenate([a, b]), pa.int64()),
            "n": pa.array(np.concatenate([b, a]), pa.int64())})

    def wedges(g: pd.DataFrame) -> pa.Table:
        out_x, out_y, out_w = [], [], []
        for _, grp in g.groupby("c"):
            d = len(grp)
            if d < 2 or d > _AA_DEG_CAP:
                continue
            nb = np.sort(grp["n"].to_numpy())
            ix, iy = np.triu_indices(d, k=1)
            out_x.append(nb[ix])
            out_y.append(nb[iy])
            out_w.append(np.full(len(ix), 1.0 / np.log(d)))
        if not out_x:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64())})
        return pa.table({"x": pa.array(np.concatenate(out_x), pa.int64()),
                         "y": pa.array(np.concatenate(out_y), pa.int64()),
                         "w": pa.array(np.concatenate(out_w),
                                       pa.float64())})

    wd = _grouped_exchange(
        edges.map_batches(adj, batch_format="pyarrow"), "c", wedges)

    # pair aggregation: fuse (x, y) into ONE int64 key and run the sum as
    # a second bucketed exchange — Ray's sort-based 2-key groupby measured
    # 38 s on the 2M-wedge sf0.01 graph vs ~2 s for this shape
    def fuse_pk(t: pa.Table) -> pa.Table:
        return t.append_column("pk", pa.array(
            t.column("x").to_numpy() * _AA_MOD + t.column("y").to_numpy(),
            pa.int64()))

    def sum_pairs(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("pk", as_index=False)["w"].sum()
        pk = out["pk"].to_numpy()
        return pa.table({"x": pa.array(pk // _AA_MOD, pa.int64()),
                         "y": pa.array(pk % _AA_MOD, pa.int64()),
                         "aa": pa.array(out["w"].to_numpy(), pa.float64()),
                         "pk": pa.array(pk, pa.int64())})

    scored = _grouped_exchange(
        wd.map_batches(fuse_pk, batch_format="pyarrow"), "pk", sum_pairs)

    def ekey(t: pa.Table) -> pa.Table:
        return t.append_column("pk", pa.array(
            t.column("a").to_numpy() * _AA_MOD + t.column("b").to_numpy(),
            pa.int64()))

    non_edges = bucketed_hash_join(
        scored,
        edges.map_batches(ekey, batch_format="pyarrow"),
        on="pk", how="anti",
        left_schema=pa.schema([("x", pa.int64()), ("y", pa.int64()),
                               ("aa", pa.float64()), ("pk", pa.int64())]),
        right_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("pk", pa.int64())]))

    def block_topk(t: pa.Table) -> pa.Table:
        # empty buckets surface as schemaless 0-row blocks (the known Ray
        # empty-block gotcha) — emit the typed empty frame instead
        if t.num_rows == 0 or "aa" not in t.column_names:
            return _arrow(pd.DataFrame({
                "x": pd.Series([], dtype="int64"),
                "y": pd.Series([], dtype="int64"),
                "aa": pd.Series([], dtype="float64")}))
        df = t.to_pandas()
        df["aa"] = df["aa"].round(6)
        df = df.sort_values(["aa", "x", "y"],
                            ascending=[False, True, True]).head(_AA_TOPK)
        return _arrow(df[["x", "y", "aa"]])

    parts = non_edges.map_batches(block_topk,
                                  batch_format="pyarrow").to_pandas()
    if parts.empty:
        # a graph whose every center exceeds _AA_DEG_CAP yields an empty
        # candidate set BY DESIGN (the SQL returns 0 rows too); Ray's
        # all-empty to_pandas drops columns, so rebuild the typed frame
        parts = pd.DataFrame({"x": pd.Series([], dtype="int64"),
                              "y": pd.Series([], dtype="int64"),
                              "aa": pd.Series([], dtype="float64")})
    out = parts.sort_values(["aa", "x", "y"],
                            ascending=[False, True, True]) \
               .head(_AA_TOPK).reset_index(drop=True)
    return out.rename(columns={"x": "a", "y": "b"})


ADAMIC_ADAR_SQL = f"""
WITH e0 AS (
  SELECT DISTINCT LEAST(l_orderkey % {_AA_MOD}, l_partkey % {_AA_MOD}) AS a,
         GREATEST(l_orderkey % {_AA_MOD}, l_partkey % {_AA_MOD}) AS b
  FROM lineitem
  WHERE l_orderkey % {_AA_MOD} <> l_partkey % {_AA_MOD}),
adj AS (SELECT a AS c, b AS n FROM e0
        UNION ALL SELECT b AS c, a AS n FROM e0),
deg AS (SELECT c, COUNT(*) AS d FROM adj GROUP BY c),
wed AS (
  SELECT a2.n AS x, a3.n AS y, 1.0 / LN(dg.d) AS w
  FROM adj a2
  JOIN adj a3 ON a3.c = a2.c AND a2.n < a3.n
  JOIN deg dg ON dg.c = a2.c
  WHERE dg.d BETWEEN 2 AND {_AA_DEG_CAP}),
sc AS (
  SELECT x, y, ROUND(SUM(w), 6) AS aa FROM wed
  GROUP BY x, y),
ne AS (
  SELECT s.x AS a, s.y AS b, s.aa FROM sc s
  WHERE NOT EXISTS (SELECT 1 FROM e0 e
                    WHERE e.a = s.x AND e.b = s.y))
SELECT a, b, aa FROM ne
ORDER BY aa DESC, a, b
LIMIT {_AA_TOPK}
"""


__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
