from ._common import *  # noqa: F401,F403
from .tpch import *  # noqa: F401,F403



def part_brand_qty(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """Dimension join with a size-budget cutover: part shipped once via
    ray.put and looked up per batch while it fits ``broadcast_rows_budget``;
    above it, lineitem's per-batch (partkey, sum_qty, n) partials meet part
    in a bucketed hash join on partkey — part scales with sf, so the join
    path is the 100 TB one. Grouped sum of quantities by brand either way."""
    ds = _read_pq(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_quantity"])

    if _n_rows(sf_dir, "part") <= broadcast_rows_budget:
        part = pq.read_table(_t(sf_dir, "part"),
                             columns=["p_partkey", "p_brand"])
        brand_of = dict(zip(part["p_partkey"].to_pylist(),
                            part["p_brand"].to_pylist()))
        ref = ray.put(brand_of)

        def add_brand(df: pd.DataFrame) -> pa.Table:
            lut = ray.get(ref)
            df["p_brand"] = df["l_partkey"].map(lut)
            return _arrow(df.groupby("p_brand", as_index=False).agg(
                sum_qty=("l_quantity", "sum"), n=("l_quantity", "size")))

        per_brand = ds.map_batches(add_brand, batch_format="pandas")
    else:
        from ..ops.joins import bucketed_hash_join

        def li_partial(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("l_partkey", as_index=False).agg(
                sum_qty=("l_quantity", "sum"), n=("l_quantity", "size"))

        li_p = ds.map_batches(li_partial, batch_format="pandas")
        part_b = _read_pq(_t(sf_dir, "part"),
                                 columns=["p_partkey", "p_brand"]) \
            .map_batches(lambda t: pa.table({"l_partkey": t["p_partkey"],
                                             "p_brand": t["p_brand"]}),
                         batch_format="pyarrow")
        joined = bucketed_hash_join(
            li_p, part_b, "l_partkey", num_buckets=32,
            left_prepare=lambda l: l.groupby("l_partkey", as_index=False)
                                    .agg(sum_qty=("sum_qty", "sum"),
                                         n=("n", "sum")),
            left_schema=pa.schema([("l_partkey", pa.int64()),
                                   ("sum_qty", pa.float64()),
                                   ("n", pa.int64())]),
            right_schema=pa.schema([("l_partkey", pa.int64()),
                                    ("p_brand", pa.string())]))
        per_brand = joined.map_batches(
            lambda df: _arrow(df.groupby("p_brand", as_index=False)
                              .agg(sum_qty=("sum_qty", "sum"),
                                   n=("n", "sum"))),
            batch_format="pandas")

    agg = _for_agg(per_brand).groupby("p_brand").aggregate(
        Sum("sum_qty", alias_name="sum_qty"), Sum("n", alias_name="n"))
    df = agg.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["n"] = df["n"].astype("int64")
    return df.sort_values("p_brand").reset_index(drop=True)



PART_BRAND_SQL = """
SELECT p_brand, ROUND(SUM(l_quantity), 2) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""



def orders_priority_count(sf_dir: str) -> pd.DataFrame:
    ds = _read_pq(_t(sf_dir, "orders"), columns=["o_orderpriority"])
    df = ds.groupby("o_orderpriority").aggregate(
        Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("o_orderpriority").reset_index(drop=True)



ORDERS_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n FROM orders
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""



def revenue_by_nation(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q5-shaped. Scale shape: nation (25 rows, a TRUE dimension) is
    always a broadcast dict; customer gets a size-budget cutover —
    collapsed into a broadcast custkey→nation dict while it fits
    ``broadcast_rows_budget``, else orders ⋈ customer run through the
    bucketed hash join on custkey (only (custkey, n_name) leaves the
    customer scan). Either way orders carries a nation name per row and
    meets lineitem's per-batch (orderkey, revenue) partials in a bucketed
    hash join; per-bucket partial sums by nation feed a 25-row global
    combine. The orders-sized orderkey→nation map of round 1 never exists
    anywhere."""
    from ..ops.joins import bucketed_hash_join
    nation = pq.read_table(_t(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"])
    n_name = dict(zip(nation["n_nationkey"].to_pylist(),
                      nation["n_name"].to_pylist()))

    if _n_rows(sf_dir, "customer") <= broadcast_rows_budget:
        cust = pq.read_table(_t(sf_dir, "customer"),
                             columns=["c_custkey", "c_nationkey"])
        cust_nation = {c: n_name[n] for c, n in
                       zip(cust["c_custkey"].to_pylist(),
                           cust["c_nationkey"].to_pylist())}
        ref = ray.put(cust_nation)

        def orders_side(df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(ref)
            return pd.DataFrame({"l_orderkey": df["o_orderkey"],
                                 "n_name": df["o_custkey"].map(lut)})

        orders_n = _read_pq(_t(sf_dir, "orders"),
                                   columns=["o_orderkey", "o_custkey"]) \
                     .map_batches(orders_side, batch_format="pandas")
    else:
        # customer too big to broadcast: bucketed join on custkey; only
        # nation (25 rows) rides along as a broadcast dict
        nref = ray.put(n_name)

        def cust_side(df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(nref)
            return pd.DataFrame({"o_custkey": df["c_custkey"],
                                 "n_name": df["c_nationkey"].map(lut)})

        cust_n = _read_pq(_t(sf_dir, "customer"),
                                 columns=["c_custkey", "c_nationkey"]) \
                   .map_batches(cust_side, batch_format="pandas")
        orders_ds = _read_pq(_t(sf_dir, "orders"),
                                    columns=["o_orderkey", "o_custkey"])
        orders_n = bucketed_hash_join(
            orders_ds, cust_n, "o_custkey", num_buckets=32,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_custkey", pa.int64())]),
            right_schema=pa.schema([("o_custkey", pa.int64()),
                                    ("n_name", pa.string())])) \
            .map_batches(
                lambda t: pa.table({"l_orderkey": t["o_orderkey"],
                                    "n_name": t["n_name"]}),
                batch_format="pyarrow")

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.groupby("l_orderkey", as_index=False)["revenue"].sum()

    li_p = _read_pq(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_extendedprice",
                                    "l_discount"]) \
             .map_batches(li_partial, batch_format="pandas")

    joined = bucketed_hash_join(
        li_p, orders_n, "l_orderkey", num_buckets=32,
        left_prepare=lambda l: l.groupby("l_orderkey", as_index=False)
                                ["revenue"].sum(),
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("revenue", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("n_name", pa.string())]))
    per_nation = joined.map_batches(
        lambda df: _arrow(df.groupby("n_name", as_index=False)
                          ["revenue"].sum()),
        batch_format="pandas")
    df = _for_agg(per_nation).groupby("n_name").aggregate(
        Sum("revenue", alias_name="revenue")).to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df.sort_values("n_name").reset_index(drop=True)



REVENUE_BY_NATION_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""



def top_orders_per_customer(sf_dir: str) -> pd.DataFrame:
    """Per-group top-k (window function shape): top-2 orders by totalprice
    per customer, deterministic tiebreak. Per-batch LOCAL top-2 per
    customer first (top-2 of the union of per-batch top-2s = the global
    top-2), so the groupby exchange carries ≤ 2·blocks rows per customer
    instead of every order."""
    ds = _read_pq(_t(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def local_top2(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True])
        return _arrow(df.groupby("o_custkey", as_index=False).head(2))

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(2).copy()
        g["rn"] = range(1, len(g) + 1)
        return g

    df = ds.map_batches(local_top2, batch_format="pandas") \
           .groupby("o_custkey").map_groups(
        top2, batch_format="pandas").to_pandas()
    df["rn"] = df["rn"].astype("int64")
    return df.sort_values(["o_custkey", "rn"]).reset_index(drop=True)



TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 2 ORDER BY o_custkey, rn
"""



def orders_without_lineitems(sf_dir: str) -> pd.DataFrame:
    """Anti-join at scale: orders with no lineitems, counted per priority.
    Both sides are big, so this is a bucketed hash ANTI join — lineitem
    contributes per-batch-distinct orderkeys only (finished per bucket by
    ``right_prepare``); the round-1 driver-materialized lineitem key set is
    gone. Per-bucket priority counts feed a 5-row global combine."""
    from ..ops.joins import bucketed_hash_join
    orders = _read_pq(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    li_keys = _read_pq(_t(sf_dir, "lineitem"),
                              columns=["l_orderkey"]) \
        .map_batches(lambda df: pd.DataFrame(
            {"o_orderkey": df["l_orderkey"].unique()}),
            batch_format="pandas")

    anti = bucketed_hash_join(
        orders, li_keys, "o_orderkey", how="anti", num_buckets=32,
        right_prepare=lambda r: r.drop_duplicates("o_orderkey"),
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_orderpriority", pa.string())]),
        right_schema=pa.schema([("o_orderkey", pa.int64())]))
    partials = anti.map_batches(
        lambda df: _arrow(df.groupby("o_orderpriority", as_index=False).agg(
            n=("o_orderkey", "size"))), batch_format="pandas")
    df = _for_agg(partials).groupby("o_orderpriority").aggregate(
        Sum("n", alias_name="n")).to_pandas()
    if "n" not in df.columns:   # no such orders → empty result
        return pd.DataFrame({"o_orderpriority": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    df["n"] = df["n"].astype("int64")
    return df.sort_values("o_orderpriority").reset_index(drop=True)



ORDERS_WITHOUT_LINEITEMS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""



def _orders_with_year(sf_dir: str) -> rd.Dataset:
    ds = _read_pq(_t(sf_dir, "orders"),
                  columns=["o_orderdate", "o_orderstatus"])

    def add_year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_year": df["o_orderdate"].dt.year.astype("int64"),
            "o_orderstatus": df["o_orderstatus"]})

    return ds.map_batches(add_year, batch_format="pandas")



def orders_pivot_status(sf_dir: str) -> pd.DataFrame:
    """Long→wide pivot (ops/reshape.pivot_counts): order counts per year ×
    status as a wide conditional aggregation — per-block crosstab partials,
    ONE year-keyed groupby-sum; no row-level data on the exchange."""
    from ..ops.reshape import pivot_counts
    wide = pivot_counts(_orders_with_year(sf_dir), group_col="o_year",
                        pivot_col="o_orderstatus", values=["F", "O", "P"])
    df = wide.to_pandas()
    for c in ("cnt_F", "cnt_O", "cnt_P"):
        df[c] = df[c].astype("int64")
    return df.sort_values("o_year").reset_index(drop=True)



ORDERS_PIVOT_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS "cnt_F",
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
         AS "cnt_O",
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
         AS "cnt_P"
FROM orders GROUP BY 1 ORDER BY 1
"""



def orders_pivot_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Pivot → unpivot round-trip: the wide table melts back per block
    (ops/reshape.unpivot) and zero cells (year×status combinations absent
    from the data) are dropped, so the result must equal the plain long
    GROUP BY — both reshape directions checked by one full-value oracle."""
    from ..ops.reshape import pivot_counts, unpivot
    wide = pivot_counts(_orders_with_year(sf_dir), group_col="o_year",
                        pivot_col="o_orderstatus", values=["F", "O", "P"])
    long = unpivot(wide, id_col="o_year",
                   value_cols=["cnt_F", "cnt_O", "cnt_P"],
                   var_name="o_orderstatus", value_name="cnt",
                   strip_prefix="cnt_")
    df = long.to_pandas()
    df = df[df["cnt"] > 0].copy()
    df["cnt"] = df["cnt"].astype("int64")
    return df.sort_values(["o_year", "o_orderstatus"]).reset_index(drop=True)



ORDERS_PIVOT_ROUNDTRIP_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""



def lineitem_correlations(sf_dir: str) -> pd.DataFrame:
    """Pairwise Pearson correlation matrix of the four lineitem measures in
    ONE streaming pass: each block emits a single partial-moment row (n,
    Σx, Σx² per column, Σxy per pair — 15 doubles regardless of block
    size); the driver sums block partials and finishes the ratio. The SQL
    oracle computes the SAME uncentered-moment formula (not DuckDB's
    corr()) so both sides round identically at 6dp."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read_pq(_t(sf_dir, "lineitem"), columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        arrs = [t.column(c).to_numpy(zero_copy_only=False) for c in cols]
        row: dict = {"n": [float(len(arrs[0]))]}
        for i, c in enumerate(cols):
            row[f"s_{i}"] = [float(arrs[i].sum())]
            row[f"ss_{i}"] = [float((arrs[i] * arrs[i]).sum())]
        for i in range(len(cols)):
            for j in range(i + 1, len(cols)):
                row[f"sp_{i}_{j}"] = [float((arrs[i] * arrs[j]).sum())]
        return pa.table(row)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    m = parts.sum()            # one row per block — driver state is tiny
    n = m["n"]
    out = []
    for i, a in enumerate(cols):
        for j in range(i + 1, len(cols)):
            b = cols[j]
            num = n * m[f"sp_{i}_{j}"] - m[f"s_{i}"] * m[f"s_{j}"]
            den = np.sqrt((n * m[f"ss_{i}"] - m[f"s_{i}"] ** 2)
                          * (n * m[f"ss_{j}"] - m[f"s_{j}"] ** 2))
            out.append((a, b, round(num / den, 6)))
    return pd.DataFrame(out, columns=["x", "y", "corr"]) \
        .sort_values(["x", "y"]).reset_index(drop=True)



_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

LINEITEM_CORR_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{a}' AS x, '{b}' AS y,
  ROUND((COUNT(*) * SUM({a} * {b}) - SUM({a}) * SUM({b}))
        / SQRT((COUNT(*) * SUM({a} * {a}) - SUM({a}) * SUM({a}))
             * (COUNT(*) * SUM({b} * {b}) - SUM({b}) * SUM({b}))), 6)
    AS corr FROM lineitem"""
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1:]) + "\nORDER BY x, y"



_Z_BITS = 3            # 8 buckets per dimension → ≤ 64 Morton cells

_Z_CELLS = 1 << _Z_BITS



def _zorder_widths(sf_dir: str) -> tuple[int, int]:
    """Integer bucket widths for (l_partkey, l_suppkey) — max//8+1 via one
    Max aggregate each, the same two integer divisions the SQL runs."""
    from ..ops.layout import dim_width
    ds = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_partkey", "l_suppkey"])
    return (dim_width(ds, "l_partkey", _Z_CELLS),
            dim_width(ds, "l_suppkey", _Z_CELLS))



_Z_WX_SQL = f"(SELECT MAX(l_partkey) // {_Z_CELLS} + 1 FROM lineitem)"

_Z_WY_SQL = f"(SELECT MAX(l_suppkey) // {_Z_CELLS} + 1 FROM lineitem)"



def zorder_cells_lineitem(sf_dir: str) -> pd.DataFrame:
    """Morton-cell population of lineitem under the (partkey, suppkey)
    Z-order layout (ops/layout.morton2): per-block cell tags + one
    cell-keyed count — the clustering-key computation is pure per-row
    arithmetic, checked bit-exactly against the unrolled integer-SQL
    interleave (ops/layout.morton2_sql)."""
    from ray.data.aggregate import Count
    from ..ops.layout import morton2
    wx, wy = _zorder_widths(sf_dir)
    ds = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_partkey", "l_suppkey"])

    def tag(t: pa.Table) -> pa.Table:
        x = t.column("l_partkey").to_numpy(zero_copy_only=False)
        y = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table({"zcell": pa.array(morton2(x // wx, y // wy,
                                                   _Z_BITS), pa.int64())})

    out = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("zcell").aggregate(Count(alias_name="cnt")).to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("zcell").reset_index(drop=True)



def _zorder_cells_sql() -> str:
    from ..ops.layout import morton2_sql
    z = morton2_sql(f"l_partkey // {_Z_WX_SQL}",
                    f"l_suppkey // {_Z_WY_SQL}", _Z_BITS)
    return (f"SELECT {z} AS zcell, CAST(COUNT(*) AS BIGINT) AS cnt\n"
            f"FROM lineitem GROUP BY 1 ORDER BY zcell")



def zorder_range_pruned(sf_dir: str) -> pd.DataFrame:
    """Z-order layout write + 2-D box read (ops/layout.zorder_write /
    zorder_box_read): lineitem lands hive-partitioned by Morton cell, then
    a bucket-aligned (partkey, suppkey) box query reads ONLY the 9 covered
    cell directories — the two-dimensional generalization of the year
    zone-map in range_export_pruned. The predicate is implemented entirely
    by directory selection; the oracle's WHERE runs it as a plain scan."""
    import shutil
    import tempfile

    from ..ops.layout import zorder_box_read, zorder_write
    wx, wy = _zorder_widths(sf_dir)
    ds = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_partkey", "l_suppkey",
                           "l_extendedprice", "l_discount"])
    out_dir = tempfile.mkdtemp(prefix="wtes_zorder_")
    try:
        zorder_write(ds, out_dir, x_col="l_partkey", y_col="l_suppkey",
                     wx=wx, wy=wy, bits=_Z_BITS)
        back = zorder_box_read(out_dir, xb_range=(2, 5), yb_range=(3, 6),
                               bits=_Z_BITS)

        def partial(t: pa.Table) -> pa.Table:
            v = (t["l_extendedprice"].to_numpy()
                 * (1.0 - t["l_discount"].to_numpy()))
            return pa.table({"revenue": pa.array([float(v.sum())],
                                                 pa.float64()),
                             "n": pa.array([len(v)], pa.int64())})

        parts = back.map_batches(partial, batch_format="pyarrow") \
            .to_pandas().sum()
        return pd.DataFrame({"revenue": [round(float(parts["revenue"]), 2)],
                             "n": [int(parts["n"])]})
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)



ZORDER_RANGE_SQL = f"""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_partkey // {_Z_WX_SQL} BETWEEN 2 AND 4
  AND l_suppkey // {_Z_WY_SQL} BETWEEN 3 AND 5
"""



def lineitem_profile(sf_dir: str) -> pd.DataFrame:
    """Dataset profiling (the ingest-time stats report): per-column
    row/null counts and min/max for lineitem's numeric measures, all in
    ONE streaming pass of per-batch partials (4 columns × blocks rows
    reach the combine). Min/max compare STORED values — no arithmetic —
    so the profile is bit-exact against SQL."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read_pq(_t(sf_dir, "lineitem"), columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        rows = {"col_name": [], "n": [], "n_null": [], "mn": [],
                "mx": []}
        for c in cols:
            col = t[c]
            rows["col_name"].append(c)
            rows["n"].append(len(col))
            rows["n_null"].append(col.null_count)
            rows["mn"].append(pc.min(col).as_py())
            rows["mx"].append(pc.max(col).as_py())
        return pa.table({"col_name": pa.array(rows["col_name"],
                                              pa.string()),
                         "n": pa.array(rows["n"], pa.int64()),
                         "n_null": pa.array(rows["n_null"], pa.int64()),
                         "mn": pa.array(rows["mn"], pa.float64()),
                         "mx": pa.array(rows["mx"], pa.float64())})

    from ray.data.aggregate import Max as _Max, Min as _Min
    df = _for_agg(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("col_name").aggregate(
            Sum("n", alias_name="n"), Sum("n_null", alias_name="n_null"),
            _Min("mn", alias_name="mn"), _Max("mx", alias_name="mx")) \
        .to_pandas()
    df["n"] = df["n"].astype(np.int64)
    df["n_null"] = df["n_null"].astype(np.int64)
    return df.sort_values("col_name").reset_index(drop=True)



LINEITEM_PROFILE_SQL = """
SELECT 'l_discount' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(l_discount) AS BIGINT) AS n_null,
       MIN(l_discount) AS mn, MAX(l_discount) AS mx FROM lineitem
UNION ALL
SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
       MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem
UNION ALL
SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
       MIN(l_quantity), MAX(l_quantity) FROM lineitem
UNION ALL
SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(l_tax) AS BIGINT),
       MIN(l_tax), MAX(l_tax) FROM lineitem
ORDER BY col_name
"""



def price_percentiles_lineitem(sf_dir: str) -> pd.DataFrame:
    """Exact GLOBAL percentiles of l_extendedprice (PERCENTILE_DISC at
    0.25/0.5/0.75/0.95) via ops/curate.exact_quantiles — the two-pass
    range-bucket counting scheme: pass 1 reduces to 256 bucket counts,
    pass 2 moves only the ≤4 probed buckets' values. No global sort, no
    per-row ranks."""
    from ..ops.curate import exact_quantiles
    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_extendedprice"])
    df = exact_quantiles(ds, "l_extendedprice",
                         [0.25, 0.5, 0.75, 0.95])
    df["value"] = df["value"].round(2)
    return df.reset_index(drop=True)



PRICE_PERCENTILES_SQL = """
SELECT CAST(0.25 AS DOUBLE) AS q, ROUND(PERCENTILE_DISC(0.25) WITHIN GROUP
       (ORDER BY l_extendedprice), 2) AS value FROM lineitem
UNION ALL
SELECT CAST(0.5 AS DOUBLE), ROUND(PERCENTILE_DISC(0.5) WITHIN GROUP
       (ORDER BY l_extendedprice), 2) FROM lineitem
UNION ALL
SELECT CAST(0.75 AS DOUBLE), ROUND(PERCENTILE_DISC(0.75) WITHIN GROUP
       (ORDER BY l_extendedprice), 2) FROM lineitem
UNION ALL
SELECT CAST(0.95 AS DOUBLE), ROUND(PERCENTILE_DISC(0.95) WITHIN GROUP
       (ORDER BY l_extendedprice), 2) FROM lineitem
ORDER BY q
"""



def bloom_semi_revenue(sf_dir: str) -> pd.DataFrame:
    """Runtime-filter pushdown (the distributed-SQL bloom-join pattern,
    ops/joins.bloom_semi_prefilter): revenue by returnflag over lineitems
    of URGENT orders. The urgent orderkeys build a CONSTANT-size Bloom
    bitmap (broadcast once); lineitem drops definite non-matches BEFORE
    any exchange (~4/5 of the table at ~0.1% fp), then the exact bucketed
    SEMI join removes false positives — the result is exactly the plain
    join's, the Bloom only cut the exchange volume."""
    from ..ops.joins import bloom_semi_prefilter, bucketed_hash_join

    urgent = _read_pq(_t(sf_dir, "orders"),
                      columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(lambda t: pa.table(
            {"l_orderkey": t.filter(pc.equal(
                t["o_orderpriority"],
                pa.scalar("1-URGENT")))["o_orderkey"]}),
            batch_format="pyarrow").materialize()

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.groupby(["l_orderkey", "l_returnflag"],
                          as_index=False)["revenue"].sum()

    li = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_orderkey", "l_returnflag",
                           "l_extendedprice", "l_discount"])
    li_f = bloom_semi_prefilter(li, "l_orderkey", urgent, "l_orderkey") \
        .map_batches(li_partial, batch_format="pandas")

    sj = bucketed_hash_join(
        li_f, urgent, "l_orderkey", how="semi", num_buckets=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_returnflag", pa.string()),
                               ("revenue", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64())]))

    df = _for_agg(sj.map_batches(
        lambda d: _arrow(d.groupby("l_returnflag", as_index=False)
                         ["revenue"].sum()), batch_format="pandas")) \
        .groupby("l_returnflag") \
        .aggregate(Sum("revenue", alias_name="revenue")).to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df.sort_values("l_returnflag").reset_index(drop=True)



BLOOM_SEMI_SQL = """
SELECT l_returnflag, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
       AS revenue
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def global_topn_lineitem(sf_dir: str) -> pd.DataFrame:
    """Global ORDER BY … LIMIT 100 (the take-ordered shape) via
    :func:`ops.curate.global_topn` — per-block local top-100 prune +
    bounded driver merge, NO sort exchange. Total order:
    (l_extendedprice DESC, l_orderkey, l_linenumber)."""
    from ..ops.curate import global_topn
    ds = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_orderkey", "l_linenumber",
                           "l_extendedprice"])
    out = global_topn(ds,
                      order_cols=["l_extendedprice", "l_orderkey",
                                  "l_linenumber"],
                      descending=[True, False, False], n=100)
    out["l_extendedprice"] = out["l_extendedprice"].round(2)
    return out[["l_orderkey", "l_linenumber", "l_extendedprice"]]



GLOBAL_TOPN_SQL = """
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2)
         AS l_extendedprice
FROM (SELECT * FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 100)
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
"""



def fk_orphans_audit(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit (the data-contract check across
    tables): orphan counts for three real FK edges plus one deliberately
    suspect edge (events.user_id → customer.c_custkey) that actually
    fires on this corpus. Each edge is ONE bucketed anti-join — the
    scale-safe NOT IN: keys-only on both sides, no driver set."""
    from ..ops.joins import bucketed_hash_join

    def _keys(table: str, col: str, as_name: str):
        ds = _read_pq(_t(sf_dir, table), columns=[col])
        if col == as_name:
            return ds

        def ren(t: pa.Table) -> pa.Table:
            return t.rename_columns([as_name])

        return ds.map_batches(ren, batch_format="pyarrow")

    edges = [
        ("orders.o_custkey->customer.c_custkey",
         ("orders", "o_custkey"), ("customer", "c_custkey")),
        ("lineitem.l_orderkey->orders.o_orderkey",
         ("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
        ("customer.c_nationkey->nation.n_nationkey",
         ("customer", "c_nationkey"), ("nation", "n_nationkey")),
        ("events.user_id->customer.c_custkey",
         ("events", "user_id"), ("customer", "c_custkey")),
    ]
    rows = []
    for name, (lt, lc), (rt, rc) in edges:
        left = _keys(lt, lc, lc)
        right = _keys(rt, rc, lc)
        orphans = bucketed_hash_join(left, right, lc, how="anti").count()
        rows.append((name, int(orphans), _n_rows(sf_dir, lt)))
    return pd.DataFrame(rows, columns=["fk", "n_orphans", "n_rows"]) \
        .astype({"n_orphans": "int64", "n_rows": "int64"}) \
        .sort_values("fk").reset_index(drop=True)



FK_ORPHANS_SQL = """
SELECT * FROM (
  SELECT 'orders.o_custkey->customer.c_custkey' AS fk,
         (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
           AS n_orphans,
         (SELECT COUNT(*) FROM orders) AS n_rows
  UNION ALL
  SELECT 'lineitem.l_orderkey->orders.o_orderkey',
         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'customer.c_nationkey->nation.n_nationkey',
         (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM nation n
             WHERE n.n_nationkey = c.c_nationkey)),
         (SELECT COUNT(*) FROM customer)
  UNION ALL
  SELECT 'events.user_id->customer.c_custkey',
         (SELECT COUNT(*) FROM events e WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)),
         (SELECT COUNT(*) FROM events))
ORDER BY fk
"""





_CF_TOPK = 100
_CF_FUSE = 1 << 21        # fused pair key stride (partkeys < 2^21 at any sf
                          # this repo tests; asserted in the block fn)


def item_cf_similarity(sf_dir: str) -> pd.DataFrame:
    """Item-item collaborative filtering over order baskets: for every
    unordered part pair co-purchased in ≥1 order, support = number of
    co-occurring orders and cosine = support / √(orders(a)·orders(b));
    top-100 by (rounded cosine DESC, pa, pb) — the classic
    neighborhood-method recommender precompute (Sarwar et al. 2001,
    item-based CF).

    Shape: ONE order-keyed bucketed exchange (orders are disjoint across
    buckets) distinct-ifies each basket and emits its C(k,2) pair rows
    PLUS per-item sentinel rows (b = -1) in the same stream; pair
    partials reduce through a second fused-key exchange (the
    _grouped_exchange pair-sum rule — Ray's sort-based 2-key groupby is
    ~20× slower here); the part-cardinality-bounded item-count table
    broadcasts via ray.put for the cosine attach; per-block top-k +
    bounded driver finish. Round-BEFORE-rank at 6dp (integer support and
    counts ⇒ the only float is one √ and one ÷, identical operands both
    sides)."""
    import ray as _ray
    from ..ops.dedup import _grouped_exchange

    ds = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey",
                                                   "l_partkey"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"o": pc.cast(t.column("l_orderkey"), pa.int64()),
                         "p": pc.cast(t.column("l_partkey"), pa.int64())})

    def baskets(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates()
        assert g["p"].max() < _CF_FUSE
        out_a, out_b = [], []
        for _, grp in g.groupby("o"):
            ps = np.sort(grp["p"].to_numpy())
            if len(ps) >= 2:
                ix, iy = np.triu_indices(len(ps), k=1)
                out_a.append(ps[ix])
                out_b.append(ps[iy])
        items = g["p"].to_numpy()
        a = (np.concatenate(out_a) if out_a
             else np.array([], dtype=np.int64))
        b = (np.concatenate(out_b) if out_b
             else np.array([], dtype=np.int64))
        return pa.table({
            "a": pa.array(np.concatenate([a, items]), pa.int64()),
            "b": pa.array(np.concatenate(
                [b, np.full(len(items), -1, dtype=np.int64)]), pa.int64()),
            "c": pa.array(np.ones(len(a) + len(items), dtype=np.int64))})

    stream = _grouped_exchange(
        ds.map_batches(project, batch_format="pyarrow"), "o", baskets) \
        .materialize()

    # item counts: per-block pre-reduce, then a DRIVER combine — the
    # partial table is part-cardinality-bounded (a dimension, like the
    # other broadcast sides), and Ray's sort-based Aggregate measured a
    # 90 s pathology on this 64-block × 20k-key layout vs 0.8 s here
    def item_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df = df[df["b"] == -1]
        return df.groupby("a", as_index=False)["c"].sum()

    ic = stream.map_batches(item_partial, batch_format="pyarrow") \
        .to_pandas().groupby("a", as_index=False)["c"].sum()
    ic_ref = _ray.put(dict(zip(ic["a"].astype("int64"),
                               ic["c"].astype("int64"))))

    def fuse(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["b"] >= 0]
        return _arrow(pd.DataFrame({
            "pk": df["a"].to_numpy() * _CF_FUSE + df["b"].to_numpy(),
            "c": df["c"].to_numpy()}))

    def pair_topk(g: pd.DataFrame, *, _ic=ic_ref) -> pa.Table:
        import ray as _r
        counts = _r.get(_ic) if not isinstance(_ic, dict) else _ic
        s = g.groupby("pk", as_index=False)["c"].sum()
        pk = s["pk"].to_numpy()
        pa_, pb_ = pk // _CF_FUSE, pk % _CF_FUSE
        ca = np.array([counts[v] for v in pa_], dtype=np.float64)
        cb = np.array([counts[v] for v in pb_], dtype=np.float64)
        sup = s["c"].to_numpy()
        cos = np.round(sup / np.sqrt(ca * cb), 6)
        out = pd.DataFrame({"pa": pa_, "pb": pb_,
                            "support": sup.astype("int64"),
                            "cosine": cos}) \
            .sort_values(["cosine", "pa", "pb"],
                         ascending=[False, True, True]).head(_CF_TOPK)
        return _arrow(out)

    parts = _grouped_exchange(
        stream.map_batches(fuse, batch_format="pyarrow"), "pk",
        pair_topk).to_pandas()
    return parts.sort_values(["cosine", "pa", "pb"],
                             ascending=[False, True, True]) \
        .head(_CF_TOPK).reset_index(drop=True)


ITEM_CF_SQL = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
ic AS (SELECT p, COUNT(*) AS c FROM op GROUP BY p),
pcnt AS (SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS support
         FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
         GROUP BY a.p, b.p)
SELECT pa, pb, support,
       ROUND(support / SQRT(ia.c * ib.c), 6) AS cosine
FROM pcnt JOIN ic ia ON ia.p = pcnt.pa JOIN ic ib ON ib.p = pcnt.pb
ORDER BY cosine DESC, pa, pb
LIMIT {_CF_TOPK}
"""


__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
