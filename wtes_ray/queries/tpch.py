from ._common import *  # noqa: F401,F403



# ---------------------------------------------------------------------------
# Relational core (groupby / broadcast join / sort / limit / window)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped grouped aggregate over lineitem (vectorized arrow
    filter + computed columns, hash aggregate, tiny result to pandas)."""
    ds = _read_pq(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount", "l_tax",
                                  "l_shipdate"])

    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), t["l_tax"]))
        return (t.append_column("disc_price", disc)
                 .append_column("charge", charge))

    agg = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Sum("charge", alias_name="sum_charge"),
            Mean("l_quantity", alias_name="avg_qty"),
            Mean("l_extendedprice", alias_name="avg_price"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"))
    df = agg.to_pandas()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        df[c] = df[c].round(2)
    for c in ("avg_qty", "avg_price", "avg_disc"):
        df[c] = df[c].round(6)
    df["count_order"] = df["count_order"].astype("int64")
    return df.sort_values(["l_returnflag", "l_linestatus"]) \
             .reset_index(drop=True)



Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  ROUND(AVG(l_quantity), 6) AS avg_qty,
  ROUND(AVG(l_extendedprice), 6) AS avg_price,
  ROUND(AVG(l_discount), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""



def q3_shipping_priority(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q3-shaped. Scale shape: the customer segment filter is a
    size-budget cutover — broadcast set while customer fits
    ``broadcast_rows_budget``, bucketed SEMI join on custkey above it (a
    customer table at the 100 TB design point is not a broadcastable
    dimension); orders and lineitem — the big sides — meet in a bucketed
    hash join on orderkey (ops/joins.py), with lineitem pre-aggregated to
    one (orderkey, revenue) partial per batch so the exchange never carries
    raw line items; the top-10 is per-block top-k then a ≤10×blocks driver
    finish. Nothing orders/lineitem-sized ever materializes on the driver."""
    from ..ops.joins import bucketed_hash_join
    date = pd.Timestamp("1995-03-15")
    cutoff = pa.scalar(date, pa.timestamp("us"))

    if _n_rows(sf_dir, "customer") <= broadcast_rows_budget:
        cust = pq.read_table(_t(sf_dir, "customer"),
                             columns=["c_custkey", "c_mktsegment"])
        building = set(
            cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))
            ["c_custkey"].to_pylist())
        bref = ray.put(building)

        def orders_side(t: pa.Table) -> pa.Table:
            keys = ray.get(bref)
            t = t.filter(pc.less(t["o_orderdate"], cutoff))
            mask = pd.Index(t["o_custkey"].to_numpy(zero_copy_only=False)) \
                     .isin(keys)
            t = t.filter(pa.array(mask))
            return pa.table({"l_orderkey": t["o_orderkey"],
                             "o_orderdate": t["o_orderdate"],
                             "o_orderpriority": t["o_orderpriority"]})

        orders_f = _read_pq(
            _t(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"]) \
            .map_batches(orders_side, batch_format="pyarrow")
    else:
        # bucketed semi join: only (custkey) leaves the customer scan
        def cust_side(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
            return pa.table({"o_custkey": t["c_custkey"]})

        cust_b = _read_pq(_t(sf_dir, "customer"),
                                 columns=["c_custkey", "c_mktsegment"]) \
                   .map_batches(cust_side, batch_format="pyarrow")

        def orders_date(t: pa.Table) -> pa.Table:
            return t.filter(pc.less(t["o_orderdate"], cutoff))

        orders_d = _read_pq(
            _t(sf_dir, "orders"),
            columns=["o_custkey", "o_orderkey", "o_orderdate",
                     "o_orderpriority"]) \
            .map_batches(orders_date, batch_format="pyarrow")
        orders_semi = bucketed_hash_join(
            orders_d, cust_b, "o_custkey", how="semi", num_buckets=32,
            left_schema=pa.schema([
                ("o_custkey", pa.int64()), ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string())]),
            right_schema=pa.schema([("o_custkey", pa.int64())]))
        orders_f = orders_semi.map_batches(
            lambda t: pa.table({"l_orderkey": t["o_orderkey"],
                                "o_orderdate": t["o_orderdate"],
                                "o_orderpriority": t["o_orderpriority"]}),
            batch_format="pyarrow")

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        sub = pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})
        # per-batch partial combine → the join exchange carries one row per
        # (batch, key)
        return pa.Table.from_pandas(
            sub.to_pandas().groupby("l_orderkey", as_index=False)
            ["revenue"].sum(), preserve_index=False) \
            .replace_schema_metadata(None)

    li_p = _read_pq(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_extendedprice",
                                    "l_discount", "l_shipdate"]) \
             .map_batches(li_partial, batch_format="pyarrow")

    joined = bucketed_hash_join(
        li_p, orders_f, "l_orderkey", num_buckets=32,
        left_prepare=lambda l: l.groupby("l_orderkey", as_index=False)
                                ["revenue"].sum(),
        # static side schemas: skip the schema-inference probe, which would
        # execute the upstream read+map once more just to sample types
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("revenue", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.string())]))

    # rank by the ROUNDED value — the SQL ORDER BY resolves to the rounded
    # alias, so boundary ties must break identically on both sides
    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["revenue"].round(2)
        return _topk(df, ["revenue", "l_orderkey"], [False, True], 10)

    df = _topk(joined.map_batches(block_topk, batch_format="pandas")
               .to_pandas(), ["revenue", "l_orderkey"], [False, True], 10)
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    return df[["l_orderkey", "revenue", "o_orderdate",
               "o_orderpriority"]].reset_index(drop=True)



Q3_SQL = """
SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""



def q12_priority_lines(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12-shaped (adapted to the schema: no shipmode column, so
    the line group is l_returnflag): big-big join of per-batch lineitem
    COUNT partials with a projected orders side on the bucketed hash
    join, then conditional priority counts. The final aggregate is
    flags × blocks partial rows — a bounded driver finish."""
    from ..ops.joins import bucketed_hash_join

    def li_partial(t: pa.Table) -> pa.Table:
        return _arrow(pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_pandas(),
            "l_returnflag": t["l_returnflag"].to_pandas()})
            .groupby(["l_orderkey", "l_returnflag"], as_index=False)
            .size().rename(columns={"size": "cnt"}))

    li_p = _read_pq(_t(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_returnflag"]) \
        .map_batches(li_partial, batch_format="pyarrow")

    def orders_side(t: pa.Table) -> pa.Table:
        hi = pc.is_in(t["o_orderpriority"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({"l_orderkey": t["o_orderkey"],
                         "is_high": pc.cast(hi, pa.int64())})

    orders_p = _read_pq(_t(sf_dir, "orders"),
                        columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(orders_side, batch_format="pyarrow")

    joined = bucketed_hash_join(
        li_p, orders_p, "l_orderkey", num_buckets=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_returnflag", pa.string()),
                               ("cnt", pa.int64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("is_high", pa.int64())]))

    def agg_partial(df: pd.DataFrame) -> pd.DataFrame:
        df["high_line_count"] = df["cnt"] * df["is_high"]
        df["low_line_count"] = df["cnt"] * (1 - df["is_high"])
        return df.groupby("l_returnflag", as_index=False) \
                 .agg({"high_line_count": "sum", "low_line_count": "sum"})

    out = joined.map_batches(agg_partial, batch_format="pandas") \
        .to_pandas().groupby("l_returnflag", as_index=False) \
        .agg({"high_line_count": "sum", "low_line_count": "sum"})
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)



Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
ORDER BY l_returnflag
"""



def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18-shaped: per-order quantity totals (per-batch partials →
    one groupby over pre-reduced rows) filtered by HAVING > 300, then
    the surviving keys — orders of magnitude fewer than the table —
    attach order columns through the bucketed hash join; top-100 by
    (o_totalprice desc, o_orderkey) via per-block heads + a bounded
    driver finish."""
    from ..ops.joins import bucketed_hash_join

    def li_partial(t: pa.Table) -> pa.Table:
        return _arrow(pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_pandas(),
            "total_qty": t["l_quantity"].to_pandas()})
            .groupby("l_orderkey", as_index=False)["total_qty"].sum())

    sums = _for_agg(_read_pq(_t(sf_dir, "lineitem"),
                             columns=["l_orderkey", "l_quantity"])
                    .map_batches(li_partial, batch_format="pyarrow")) \
        .groupby("l_orderkey") \
        .aggregate(Sum("total_qty", alias_name="total_qty"))
    big = sums.map_batches(
        lambda t: t.filter(pc.greater(t["total_qty"], 300.0)),
        batch_format="pyarrow")

    orders_p = _read_pq(_t(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_totalprice"]) \
        .map_batches(lambda t: t.rename_columns(
            ["l_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
            batch_format="pyarrow")

    joined = bucketed_hash_join(
        big, orders_p, "l_orderkey", num_buckets=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("total_qty", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_totalprice", pa.float64())]))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df["o_totalprice"] = df["o_totalprice"].round(2)
        return _topk(df, ["o_totalprice", "l_orderkey"], [False, True], 100)

    df = _topk(joined.map_batches(block_topk, batch_format="pandas")
               .to_pandas(),
               ["o_totalprice", "l_orderkey"], [False, True], 100)
    df = df.rename(columns={"l_orderkey": "o_orderkey"})
    df["total_qty"] = df["total_qty"].round(2)
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    return df[["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
               "total_qty"]].reset_index(drop=True)



Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
SELECT o_orderkey, o_custkey, o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey
LIMIT 100
"""



def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6-shaped scalar aggregate: fully-vectorized arrow filter +
    per-batch partial sums, one global combine."""
    ds = _read_pq(_t(sf_dir, "lineitem"),
                         columns=["l_shipdate", "l_discount", "l_quantity",
                                  "l_extendedprice"])
    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                        pc.less_equal(t["l_discount"], pa.scalar(0.07))),
                pc.less(t["l_quantity"], pa.scalar(24.0))))
        t = t.filter(mask)
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        return pa.table({"revenue": pa.array([rev.as_py() or 0.0],
                                             pa.float64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .aggregate(Sum("revenue", alias_name="revenue"))
    return pd.DataFrame({"revenue": [round(agg["revenue"], 2)]})



Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""



def q14_promo_revenue_ratio(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14-shaped conditional aggregate over a broadcast join: promo
    parts' share of revenue in one month."""
    part = pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_type"])
    promo = {k for k, t_ in zip(part["p_partkey"].to_pylist(),
                                part["p_type"].to_pylist())
             if str(t_).startswith("PROMO")}
    ref = ray.put(promo)
    lo = pa.scalar(pd.Timestamp("1996-03-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-04-01"), pa.timestamp("us"))

    ds = _read_pq(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        pk = t["l_partkey"].to_numpy()
        is_promo = pd.Index(pk).isin(keys)
        rev_np = rev.to_numpy(zero_copy_only=False)
        return pa.table({
            "promo_rev": pa.array([float(rev_np[is_promo].sum())]),
            "total_rev": pa.array([float(rev_np.sum())])})

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("promo_rev", alias_name="promo_rev"),
        Sum("total_rev", alias_name="total_rev"))
    total = agg["total_rev"] or 0.0
    ratio = (100.0 * agg["promo_rev"] / total) if total else 0.0
    return pd.DataFrame({"promo_ratio": [round(ratio, 6)]})



Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_ratio
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""



def q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10-shaped: revenue lost to returns per customer (top 20).
    Scale shape: lineitem's R-filtered per-batch (orderkey, revenue)
    partials meet orders' (orderkey, custkey) projection in a bucketed hash
    join; per-bucket custkey partials feed a customer-sized global groupby,
    then per-block top-k with a ≤20×blocks driver finish. The final
    name/acctbal attach reads customer with a custkey pushdown filter —
    only row groups that can contain the 20 winners are ever decoded, so
    no customer-sized structure exists anywhere at any sf."""
    from ..ops.joins import bucketed_hash_join

    orders_k = _read_pq(_t(sf_dir, "orders"),
                               columns=["o_orderkey", "o_custkey"]) \
        .map_batches(lambda df: pd.DataFrame(
            {"l_orderkey": df["o_orderkey"], "c_custkey": df["o_custkey"]}),
            batch_format="pandas")

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_returnflag"] == "R"].copy()
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.groupby("l_orderkey", as_index=False)["revenue"].sum()

    li_p = _read_pq(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_returnflag",
                                    "l_extendedprice", "l_discount"]) \
             .map_batches(li_partial, batch_format="pandas")

    joined = bucketed_hash_join(
        li_p, orders_k, "l_orderkey", num_buckets=32,
        left_prepare=lambda l: l.groupby("l_orderkey", as_index=False)
                                ["revenue"].sum(),
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("revenue", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("c_custkey", pa.int64())]))
    per_cust = joined.map_batches(
        lambda df: _arrow(df.groupby("c_custkey", as_index=False)
                          ["revenue"].sum()),
        batch_format="pandas")
    agg = _for_agg(per_cust).groupby("c_custkey").aggregate(
        Sum("revenue", alias_name="revenue"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["revenue"].round(2)   # rank by the rounded value
        return _topk(df, ["revenue", "c_custkey"], [False, True], 20)

    df = _topk(agg.map_batches(block_topk, batch_format="pandas")
               .to_pandas(), ["revenue", "c_custkey"], [False, True], 20)
    winners = [int(k) for k in df["c_custkey"]]
    cust = pq.read_table(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_name", "c_acctbal"],
                         filters=[("c_custkey", "in", winners)])
    cust_info = {k: (n, b) for k, n, b in
                 zip(cust["c_custkey"].to_pylist(),
                     cust["c_name"].to_pylist(),
                     cust["c_acctbal"].to_pylist())}
    df["c_name"] = df["c_custkey"].map(lambda k: cust_info[k][0])
    df["c_acctbal"] = df["c_custkey"].map(lambda k: round(cust_info[k][1], 2))
    df["c_custkey"] = df["c_custkey"].astype("int64")
    return df[["c_custkey", "c_name", "c_acctbal",
               "revenue"]].reset_index(drop=True)



Q10_SQL = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal
ORDER BY revenue DESC, c_custkey LIMIT 20
"""



# --- late TPC-H fill-ins (rounds 3-5) ---------------------------------------

def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join (adapted: no commitdate column, so
    the existence predicate is 'order has a returned line'): the date
    window prunes orders at the scan; lineitem reduces to per-batch
    DISTINCT returned orderkeys (keys only — never full lines) and meets
    orders in a bucketed SEMI join; the priority counts finish as
    per-block partials → a 5-row combine."""
    from ..ops.joins import bucketed_hash_join
    lo = pa.scalar(pd.Timestamp("1996-07-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-10-01"), pa.timestamp("us"))

    def orders_side(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        t = t.filter(m)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderpriority": t["o_orderpriority"]})

    orders = _read_pq(_t(sf_dir, "orders"),
                      columns=["o_orderkey", "o_orderdate",
                               "o_orderpriority"]) \
        .map_batches(orders_side, batch_format="pyarrow")

    def returned_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        return pa.table({"o_orderkey": pc.unique(t["l_orderkey"])})

    rkeys = _read_pq(_t(sf_dir, "lineitem"),
                     columns=["l_orderkey", "l_returnflag"]) \
        .map_batches(returned_keys, batch_format="pyarrow")

    sj = bucketed_hash_join(
        orders, rkeys, "o_orderkey", how="semi", num_buckets=32,
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_orderpriority", pa.string())]),
        right_schema=pa.schema([("o_orderkey", pa.int64())]))

    def cnt_partial(df: pd.DataFrame) -> pa.Table:
        return _arrow(df.groupby("o_orderpriority", as_index=False)
                      .size().rename(columns={"size": "order_count"}))

    df = _for_agg(sj.map_batches(cnt_partial, batch_format="pandas")) \
        .groupby("o_orderpriority") \
        .aggregate(Sum("order_count", alias_name="order_count")).to_pandas()
    df["order_count"] = df["order_count"].astype(np.int64)
    return df.sort_values("o_orderpriority").reset_index(drop=True)



Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""



def q7_volume_shipping(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q7-shaped 4-way join: revenue flowing between two nations
    (supplier side vs customer side) by ship year. Scale shape: nation is
    a true 25-row broadcast; supplier and customer each get the
    size-budget cutover (broadcast suppkey/custkey→nation dicts under
    ``broadcast_rows_budget``, bucketed hash joins above it); lineitem
    pre-reduces to (orderkey, supp_nation, year, volume) partials — the
    pair-nation filter drops ~23/25 of rows BEFORE the orderkey exchange
    where it meets the orders→cust_nation side."""
    from ..ops.joins import bucketed_hash_join
    pair = ("NATION_1", "NATION_2")
    nation = pq.read_table(_t(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"])
    n_name = {k: v for k, v in zip(nation["n_nationkey"].to_pylist(),
                                   nation["n_name"].to_pylist())
              if v in pair}
    lo = pa.scalar(pd.Timestamp("1995-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def li_partial(t: pa.Table) -> pd.DataFrame:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_pandas(),
            "l_suppkey": t["l_suppkey"].to_pandas(),
            "l_year": pc.year(t["l_shipdate"]).to_pandas().astype(np.int64),
            "volume": (t["l_extendedprice"].to_numpy()
                       * (1.0 - t["l_discount"].to_numpy()))})
        return df

    li = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_orderkey", "l_suppkey", "l_shipdate",
                           "l_extendedprice", "l_discount"])

    if _n_rows(sf_dir, "supplier") <= broadcast_rows_budget:
        sup = pq.read_table(_t(sf_dir, "supplier"),
                            columns=["s_suppkey", "s_nationkey"])
        s_nat = {s: n_name[n] for s, n in
                 zip(sup["s_suppkey"].to_pylist(),
                     sup["s_nationkey"].to_pylist()) if n in n_name}
        sref = ray.put(s_nat)

        def li_supp(t: pa.Table) -> pa.Table:
            lut = ray.get(sref)
            df = li_partial(t)
            df["supp_nation"] = df["l_suppkey"].map(lut)
            df = df[df["supp_nation"].notna()]
            return _arrow(df.groupby(
                ["l_orderkey", "supp_nation", "l_year"], as_index=False)
                ["volume"].sum())

        li_n = li.map_batches(li_supp, batch_format="pyarrow")
    else:
        nref = ray.put(n_name)

        def sup_side(df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(nref)
            df = pd.DataFrame({"l_suppkey": df["s_suppkey"],
                               "supp_nation": df["s_nationkey"].map(lut)})
            return df[df["supp_nation"].notna()]

        sup_n = _read_pq(_t(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"]) \
            .map_batches(sup_side, batch_format="pandas")
        li_n = bucketed_hash_join(
            li.map_batches(lambda t: _arrow(li_partial(t)),
                           batch_format="pyarrow"),
            sup_n, "l_suppkey", num_buckets=32,
            left_schema=pa.schema([("l_suppkey", pa.int64()),
                                   ("l_orderkey", pa.int64()),
                                   ("l_year", pa.int64()),
                                   ("volume", pa.float64())]),
            right_schema=pa.schema([("l_suppkey", pa.int64()),
                                    ("supp_nation", pa.string())])) \
            .map_batches(
                lambda df: _arrow(df.groupby(
                    ["l_orderkey", "supp_nation", "l_year"],
                    as_index=False)["volume"].sum()),
                batch_format="pandas")

    if _n_rows(sf_dir, "customer") <= broadcast_rows_budget:
        cust = pq.read_table(_t(sf_dir, "customer"),
                             columns=["c_custkey", "c_nationkey"])
        c_nat = {c: n_name[n] for c, n in
                 zip(cust["c_custkey"].to_pylist(),
                     cust["c_nationkey"].to_pylist()) if n in n_name}
        cref = ray.put(c_nat)

        def orders_side(df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(cref)
            out = pd.DataFrame({"l_orderkey": df["o_orderkey"],
                                "cust_nation": df["o_custkey"].map(lut)})
            return out[out["cust_nation"].notna()]

        orders_n = _read_pq(_t(sf_dir, "orders"),
                            columns=["o_orderkey", "o_custkey"]) \
            .map_batches(orders_side, batch_format="pandas")
    else:
        nref2 = ray.put(n_name)

        def cust_side(df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(nref2)
            out = pd.DataFrame({"o_custkey": df["c_custkey"],
                                "cust_nation": df["c_nationkey"].map(lut)})
            return out[out["cust_nation"].notna()]

        cust_n = _read_pq(_t(sf_dir, "customer"),
                          columns=["c_custkey", "c_nationkey"]) \
            .map_batches(cust_side, batch_format="pandas")
        orders_n = bucketed_hash_join(
            _read_pq(_t(sf_dir, "orders"),
                     columns=["o_orderkey", "o_custkey"]),
            cust_n, "o_custkey", num_buckets=32,
            left_schema=pa.schema([("o_custkey", pa.int64()),
                                   ("o_orderkey", pa.int64())]),
            right_schema=pa.schema([("o_custkey", pa.int64()),
                                    ("cust_nation", pa.string())])) \
            .map_batches(
                lambda t: pa.table({"l_orderkey": t["o_orderkey"],
                                    "cust_nation": t["cust_nation"]}),
                batch_format="pyarrow")

    joined = bucketed_hash_join(
        li_n, orders_n, "l_orderkey", num_buckets=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("supp_nation", pa.string()),
                               ("l_year", pa.int64()),
                               ("volume", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("cust_nation", pa.string())]))

    def vol_partial(df: pd.DataFrame) -> pa.Table:
        df = df[df["supp_nation"] != df["cust_nation"]]
        return _arrow(df.groupby(
            ["supp_nation", "cust_nation", "l_year"], as_index=False)
            ["volume"].sum().rename(columns={"volume": "revenue"}))

    df = _for_agg(joined.map_batches(vol_partial, batch_format="pandas")) \
        .groupby(["supp_nation", "cust_nation", "l_year"]) \
        .aggregate(Sum("revenue", alias_name="revenue")).to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)



Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""



def q5_local_supplier_volume(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q5-shaped local-supplier volume: revenue per nation where the
    CUSTOMER and the SUPPLIER share that nation, region-restricted
    (completes the 22-query roster). Scale shape mirrors q7: region+nation
    are driver dims (25 rows); supplier and customer maps take the
    size-budget broadcast cutover (bucketed hash joins above it);
    lineitem pre-reduces to (orderkey, supp_nation) partials and orders
    prune on the date window BEFORE the orderkey exchange; the
    nation-equality filter runs co-partitioned inside it."""
    from ..ops.joins import bucketed_hash_join
    region = pq.read_table(_t(sf_dir, "region"),
                           columns=["r_regionkey", "r_name"])
    rkeys = {k for k, v in zip(region["r_regionkey"].to_pylist(),
                               region["r_name"].to_pylist())
             if v == "ASIA"}
    nation = pq.read_table(_t(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    n_name = {k: nm for k, nm, rk in zip(
        nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist(),
        nation["n_regionkey"].to_pylist()) if rk in rkeys}
    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    # --- lineitem → (l_orderkey, supp_nation, volume) partials ---------
    def li_partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_pandas(),
            "l_suppkey": t["l_suppkey"].to_pandas(),
            "volume": (t["l_extendedprice"].to_numpy()
                       * (1.0 - t["l_discount"].to_numpy()))})

    li = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_orderkey", "l_suppkey",
                           "l_extendedprice", "l_discount"])
    if _n_rows(sf_dir, "supplier") <= broadcast_rows_budget:
        sup = pq.read_table(_t(sf_dir, "supplier"),
                            columns=["s_suppkey", "s_nationkey"])
        s_nat = {s: n_name[n] for s, n in
                 zip(sup["s_suppkey"].to_pylist(),
                     sup["s_nationkey"].to_pylist()) if n in n_name}
        sref = ray.put(s_nat)

        def li_supp(t: pa.Table) -> pa.Table:
            lut = ray.get(sref)
            df = li_partial(t)
            df["supp_nation"] = df["l_suppkey"].map(lut)
            df = df[df["supp_nation"].notna()]
            return _arrow(df.groupby(["l_orderkey", "supp_nation"],
                                     as_index=False)["volume"].sum())

        li_n = li.map_batches(li_supp, batch_format="pyarrow")
    else:
        nref = ray.put(n_name)

        def sup_side(df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(nref)
            out = pd.DataFrame({"l_suppkey": df["s_suppkey"],
                                "supp_nation": df["s_nationkey"].map(lut)})
            return out[out["supp_nation"].notna()]

        sup_n = _read_pq(_t(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"]) \
            .map_batches(sup_side, batch_format="pandas")
        li_n = bucketed_hash_join(
            li.map_batches(lambda t: _arrow(li_partial(t)),
                           batch_format="pyarrow"),
            sup_n, "l_suppkey", num_buckets=32,
            left_schema=pa.schema([("l_suppkey", pa.int64()),
                                   ("l_orderkey", pa.int64()),
                                   ("volume", pa.float64())]),
            right_schema=pa.schema([("l_suppkey", pa.int64()),
                                    ("supp_nation", pa.string())])) \
            .map_batches(
                lambda df: _arrow(df.groupby(
                    ["l_orderkey", "supp_nation"],
                    as_index=False)["volume"].sum()),
                batch_format="pandas")

    # --- orders (date-pruned) → (l_orderkey, cust_nation) --------------
    def o_window(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders = _read_pq(_t(sf_dir, "orders"),
                      columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(o_window, batch_format="pyarrow")
    if _n_rows(sf_dir, "customer") <= broadcast_rows_budget:
        cust = pq.read_table(_t(sf_dir, "customer"),
                             columns=["c_custkey", "c_nationkey"])
        c_nat = {c: n_name[n] for c, n in
                 zip(cust["c_custkey"].to_pylist(),
                     cust["c_nationkey"].to_pylist()) if n in n_name}
        cref = ray.put(c_nat)

        def orders_side(df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(cref)
            out = pd.DataFrame({"l_orderkey": df["o_orderkey"],
                                "cust_nation": df["o_custkey"].map(lut)})
            return out[out["cust_nation"].notna()]

        orders_n = orders.map_batches(orders_side, batch_format="pandas")
    else:
        nref2 = ray.put(n_name)

        def cust_side(df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(nref2)
            out = pd.DataFrame({"o_custkey": df["c_custkey"],
                                "cust_nation": df["c_nationkey"].map(lut)})
            return out[out["cust_nation"].notna()]

        cust_n = _read_pq(_t(sf_dir, "customer"),
                          columns=["c_custkey", "c_nationkey"]) \
            .map_batches(cust_side, batch_format="pandas")
        orders_n = bucketed_hash_join(
            orders, cust_n, "o_custkey", num_buckets=32,
            left_schema=pa.schema([("o_custkey", pa.int64()),
                                   ("o_orderkey", pa.int64())]),
            right_schema=pa.schema([("o_custkey", pa.int64()),
                                    ("cust_nation", pa.string())])) \
            .map_batches(
                lambda t: pa.table({"l_orderkey": t["o_orderkey"],
                                    "cust_nation": t["cust_nation"]}),
                batch_format="pyarrow")

    joined = bucketed_hash_join(
        li_n, orders_n, "l_orderkey", num_buckets=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("supp_nation", pa.string()),
                               ("volume", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("cust_nation", pa.string())]))

    def local_partial(df: pd.DataFrame) -> pa.Table:
        df = df[df["supp_nation"] == df["cust_nation"]]
        return _arrow(df.groupby("supp_nation", as_index=False)
                      ["volume"].sum()
                      .rename(columns={"supp_nation": "n_name",
                                       "volume": "revenue"}))

    df = _for_agg(joined.map_batches(local_partial, batch_format="pandas")) \
        .groupby("n_name") \
        .aggregate(Sum("revenue", alias_name="revenue")).to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df.sort_values(["revenue", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)



Q5_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""



def q8_market_share(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q8-shaped national market share: NATION_1 suppliers' slice of
    PROMO-part volume sold to EUROPE customers, by order year. Scale
    shape: the PROMO partkeys arrive as a pushdown-filtered broadcast
    set; supplier and customer attaches reuse the q7 size-budget cutover
    (broadcast dicts under ``broadcast_rows_budget``, bucketed joins
    above); lineitem pre-reduces to (orderkey, supp_nation, volume)
    partials before the one orderkey exchange where it meets the
    window-filtered orders→year side. The numerator/denominator split
    survives partial aggregation as two sums per (year) partial row."""
    from ..ops.joins import bucketed_hash_join
    nation = pq.read_table(_t(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq.read_table(_t(sf_dir, "region"),
                           columns=["r_regionkey", "r_name"])
    eu_key = [r for r, n in zip(region["r_regionkey"].to_pylist(),
                                region["r_name"].to_pylist())
              if n == "EUROPE"][0]
    n_name = dict(zip(nation["n_nationkey"].to_pylist(),
                      nation["n_name"].to_pylist()))
    eu_nations = {k for k, r in zip(nation["n_nationkey"].to_pylist(),
                                    nation["n_regionkey"].to_pylist())
                  if r == eu_key}

    parts = pq.read_table(_t(sf_dir, "part"), columns=["p_partkey"],
                          filters=[("p_type", "==", "PROMO")])
    pset = ray.put(set(parts["p_partkey"].to_pylist()))

    # supplier attach (cutover): suppkey -> nation NAME (all nations —
    # the numerator flag needs every supplier's nation, not a filter)
    assert _n_rows(sf_dir, "supplier") <= broadcast_rows_budget, \
        "swap to the q7 bucketed-join supplier path above the budget"
    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"])
    s_nat = {s: n_name[n] for s, n in zip(sup["s_suppkey"].to_pylist(),
                                          sup["s_nationkey"].to_pylist())}
    sref = ray.put(s_nat)

    def li_partial(t: pa.Table) -> pa.Table:
        ks = ray.get(pset) if isinstance(pset, ray.ObjectRef) else pset
        lut = ray.get(sref) if isinstance(sref, ray.ObjectRef) else sref
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_pandas(),
            "l_partkey": t["l_partkey"].to_pandas(),
            "l_suppkey": t["l_suppkey"].to_pandas(),
            "volume": (t["l_extendedprice"].to_numpy()
                       * (1.0 - t["l_discount"].to_numpy()))})
        df = df[df["l_partkey"].isin(ks)]
        df["supp_nation"] = df["l_suppkey"].map(lut)
        return _arrow(df.groupby(["l_orderkey", "supp_nation"],
                                 as_index=False)["volume"].sum())

    li_n = _read_pq(_t(sf_dir, "lineitem"),
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow")

    # customer attach (cutover): custkey -> in-EUROPE flag
    assert _n_rows(sf_dir, "customer") <= broadcast_rows_budget, \
        "swap to the q7 bucketed-join customer path above the budget"
    cust = pq.read_table(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"])
    eu_cust = {c for c, n in zip(cust["c_custkey"].to_pylist(),
                                 cust["c_nationkey"].to_pylist())
               if n in eu_nations}
    cref = ray.put(eu_cust)
    lo = pa.scalar(pd.Timestamp("1995-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def orders_side(t: pa.Table) -> pa.Table:
        cs = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        t = t.filter(m)
        df = pd.DataFrame({
            "l_orderkey": t["o_orderkey"].to_pandas(),
            "o_year": pc.year(t["o_orderdate"]).to_pandas()
            .astype(np.int64),
            "o_custkey": t["o_custkey"].to_pandas()})
        return _arrow(df[df["o_custkey"].isin(cs)]
                      [["l_orderkey", "o_year"]])

    orders_n = _read_pq(_t(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(orders_side, batch_format="pyarrow")

    joined = bucketed_hash_join(
        li_n, orders_n, "l_orderkey", num_buckets=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("supp_nation", pa.string()),
                               ("volume", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_year", pa.int64())]))

    def share_partial(df: pd.DataFrame) -> pa.Table:
        df["v1"] = df["volume"].where(df["supp_nation"] == "NATION_1", 0.0)
        return _arrow(df.groupby("o_year", as_index=False)
                      .agg(v1=("v1", "sum"), v=("volume", "sum")))

    agg = _for_agg(joined.map_batches(share_partial,
                                      batch_format="pandas")) \
        .groupby("o_year").aggregate(
            Sum("v1", alias_name="v1"), Sum("v", alias_name="v")) \
        .to_pandas()
    agg["mkt_share"] = (agg["v1"] / agg["v"]).round(6)
    return agg[["o_year", "mkt_share"]].sort_values("o_year") \
        .reset_index(drop=True)



Q8_SQL = """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                      ELSE 0 END) / SUM(volume), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON r_regionkey = n2.n_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01')
GROUP BY o_year ORDER BY o_year
"""



def q9_product_profit(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q9-shaped product-type profit (adapted: no
    partsupp.supplycost, so cost is 0.7·p_retailprice·quantity — the
    same computed-measure shape): profit per supplier nation per order
    year for PROMO parts. part's (keys, retailprice) and supplier's
    nation ride as broadcast dicts under ``broadcast_rows_budget`` (the
    q7/q8 cutover applies above it); lineitem pre-reduces to
    (orderkey, nation, profit) partials before the single orderkey
    exchange that attaches the order year."""
    from ..ops.joins import bucketed_hash_join
    nation = pq.read_table(_t(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"])
    n_name = dict(zip(nation["n_nationkey"].to_pylist(),
                      nation["n_name"].to_pylist()))
    assert max(_n_rows(sf_dir, "part"),
               _n_rows(sf_dir, "supplier")) <= broadcast_rows_budget, \
        "swap to the q7 bucketed-join attaches above the budget"
    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_retailprice"],
                         filters=[("p_type", "==", "PROMO")])
    price = dict(zip(part["p_partkey"].to_pylist(),
                     part["p_retailprice"].to_pylist()))
    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"])
    s_nat = {s: n_name[n] for s, n in zip(sup["s_suppkey"].to_pylist(),
                                          sup["s_nationkey"].to_pylist())}
    ref = ray.put((price, s_nat))

    def li_partial(t: pa.Table) -> pa.Table:
        pm, sm = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_pandas(),
            "price": pd.Series(t["l_partkey"].to_numpy()).map(pm),
            "nation": pd.Series(t["l_suppkey"].to_numpy()).map(sm),
            "qty": t["l_quantity"].to_numpy(),
            "rev": (t["l_extendedprice"].to_numpy()
                    * (1.0 - t["l_discount"].to_numpy()))})
        df = df[df["price"].notna()]
        df["profit"] = df["rev"] - 0.7 * df["price"] * df["qty"]
        return _arrow(df.groupby(["l_orderkey", "nation"],
                                 as_index=False)["profit"].sum())

    li = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_orderkey", "l_partkey", "l_suppkey",
                           "l_quantity", "l_extendedprice",
                           "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow")

    orders = _read_pq(_t(sf_dir, "orders"),
                      columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda t: pa.table(
            {"l_orderkey": t["o_orderkey"],
             "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64())}),
            batch_format="pyarrow")

    joined = bucketed_hash_join(
        li, orders, "l_orderkey", num_buckets=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("nation", pa.string()),
                               ("profit", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_year", pa.int64())]))

    df = _for_agg(joined.map_batches(
        lambda d: _arrow(d.groupby(["nation", "o_year"], as_index=False)
                         ["profit"].sum()), batch_format="pandas")) \
        .groupby(["nation", "o_year"]) \
        .aggregate(Sum("profit", alias_name="profit")).to_pandas()
    df["profit"] = df["profit"].round(2)
    return df.sort_values(["nation", "o_year"],
                          ascending=[True, False]).reset_index(drop=True)



Q9_SQL = """
SELECT nation, o_year, ROUND(SUM(profit), 2) AS profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.7 * p_retailprice * l_quantity AS profit
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE p_type = 'PROMO')
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""



def q13_customer_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13-shaped distribution: how many customers placed k orders,
    INCLUDING k=0 — the left-join histogram without a left join: orders
    reduce to per-custkey counts (per-batch partials → one groupby over
    pre-reduced rows), a bucketed SEMI join keeps only real customers,
    the k-histogram finishes as partials, and the k=0 row is customer's
    footer row count minus the matched-group count (two scalars — the
    full outer side never materializes anywhere)."""
    from ..ops.joins import bucketed_hash_join

    def o_partial(t: pa.Table) -> pa.Table:
        return _arrow(pd.DataFrame(
            {"c_custkey": t["o_custkey"].to_pandas()})
            .groupby("c_custkey", as_index=False).size()
            .rename(columns={"size": "c_count"}))

    counts = _for_agg(_read_pq(_t(sf_dir, "orders"), columns=["o_custkey"])
                      .map_batches(o_partial, batch_format="pyarrow")) \
        .groupby("c_custkey").aggregate(Sum("c_count", alias_name="c_count"))

    matched = bucketed_hash_join(
        counts, _read_pq(_t(sf_dir, "customer"), columns=["c_custkey"]),
        "c_custkey", how="semi", num_buckets=32,
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_count", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]))

    def hist_partial(df: pd.DataFrame) -> pa.Table:
        return _arrow(df.groupby("c_count", as_index=False).size()
                      .rename(columns={"size": "custdist"}))

    hist = _for_agg(matched.map_batches(hist_partial,
                                        batch_format="pandas")) \
        .groupby("c_count") \
        .aggregate(Sum("custdist", alias_name="custdist")).to_pandas()
    zero = _n_rows(sf_dir, "customer") - int(hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat([hist, pd.DataFrame({"c_count": [0],
                                              "custdist": [zero]})])
    hist["c_count"] = hist["c_count"].astype(np.int64)
    hist["custdist"] = hist["custdist"].astype(np.int64)
    return hist.sort_values(["custdist", "c_count"],
                            ascending=[False, False]) \
        .reset_index(drop=True)



Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""



def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15-shaped argmax: per-supplier revenue in one quarter
    (per-batch partials → groupby), global MAX via a streaming aggregate,
    winners filtered distributed-side, and the ≤handful of winning
    suppliers' names read back with a parquet pushdown filter — the
    supplier table itself is never scanned in full on the driver.
    Revenue rounds to 2dp BEFORE the max so the equality filter matches
    SQL bit-exactly."""
    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-04-01"), pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        df = pd.DataFrame({
            "s_suppkey": t["l_suppkey"].to_pandas(),
            "total_rev": (t["l_extendedprice"].to_numpy()
                          * (1.0 - t["l_discount"].to_numpy()))})
        return _arrow(df.groupby("s_suppkey", as_index=False)
                      ["total_rev"].sum())

    rev = _for_agg(_read_pq(_t(sf_dir, "lineitem"),
                            columns=["l_suppkey", "l_shipdate",
                                     "l_extendedprice", "l_discount"])
                   .map_batches(partial, batch_format="pyarrow")) \
        .groupby("s_suppkey").aggregate(Sum("total_rev",
                                            alias_name="total_rev")) \
        .map_batches(lambda t: pa.table(
            {"s_suppkey": t["s_suppkey"],
             "total_rev": pc.round(t["total_rev"], 2)}),
            batch_format="pyarrow").materialize()

    from ray.data.aggregate import Max as _Max
    mx = float(rev.aggregate(_Max("total_rev", alias_name="mx"))["mx"])
    winners = rev.map_batches(
        lambda t: t.filter(pc.equal(t["total_rev"], pa.scalar(mx))),
        batch_format="pyarrow").to_pandas()

    names = pq.read_table(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in",
                  winners["s_suppkey"].tolist())]).to_pandas()
    df = winners.merge(names, on="s_suppkey")
    return df[["s_suppkey", "s_name", "total_rev"]] \
        .sort_values("s_suppkey").reset_index(drop=True)



Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM supplier s JOIN rev r USING (s_suppkey)
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s.s_suppkey
"""



def q17_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17-shaped correlated-threshold scalar: yearly revenue from
    small-quantity lines of one brand's parts. Two streaming passes over
    the brand's lines (partkeys arrive as a broadcast set from a
    PUSHDOWN-filtered part read — one brand ≈ |part|/n_brands): pass 1
    reduces to per-part (Σqty, n) → a per-part 0.2·avg threshold dict
    (bounded by the brand's part count); pass 2 filters l_quantity below
    its part's threshold and sums extendedprice. Quantities are
    integer-valued doubles, so the partial sums — hence the thresholds —
    are EXACT in float64 regardless of summation order and the strict <
    matches SQL bit-for-bit."""
    brand = "Brand#13"
    parts = pq.read_table(_t(sf_dir, "part"), columns=["p_partkey"],
                          filters=[("p_brand", "==", brand)])
    keyset = ray.put(set(parts["p_partkey"].to_pylist()))

    li = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(t: pa.Table) -> pa.Table:
        ks = ray.get(keyset) if isinstance(keyset, ray.ObjectRef) else keyset
        df = pd.DataFrame({"l_partkey": t["l_partkey"].to_pandas(),
                           "qty": t["l_quantity"].to_pandas()})
        df = df[df["l_partkey"].isin(ks)]
        g = df.groupby("l_partkey", as_index=False) \
            .agg(s=("qty", "sum"), n=("qty", "size"))
        return _arrow(g)

    agg = _for_agg(li.map_batches(qty_partial, batch_format="pyarrow")) \
        .groupby("l_partkey").aggregate(
            Sum("s", alias_name="s"), Sum("n", alias_name="n")).to_pandas()
    thr = {int(k): 0.2 * (s / n) for k, s, n in
           zip(agg["l_partkey"], agg["s"], agg["n"])}
    tref = ray.put(thr)

    def rev_partial(t: pa.Table) -> pa.Table:
        lut = ray.get(tref) if isinstance(tref, ray.ObjectRef) else tref
        q = t["l_quantity"].to_numpy()
        ep = t["l_extendedprice"].to_numpy()
        # vectorized threshold lookup; parts outside the brand map to NaN
        # and q < NaN is False, so they drop
        tv = pd.Series(t["l_partkey"].to_numpy()).map(lut).to_numpy()
        return pa.table({"rev": pa.array([float(ep[q < tv].sum())],
                                         pa.float64())})

    tot = li.map_batches(rev_partial, batch_format="pyarrow") \
        .aggregate(Sum("rev", alias_name="rev"))["rev"]
    return pd.DataFrame({"avg_yearly": [round(tot / 7.0, 2)]})



Q17_SQL = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < 0.2 * (SELECT AVG(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p_partkey)
"""



def q22_sales_opportunity(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22-shaped (adapted: no phone column, so groups are
    c_nationkey): rich customers with NO RECENT orders (every synthetic
    customer has some order, so the classic no-orders predicate is empty
    at every sf; 'no order since 2000-07-01' keeps the NOT-EXISTS shape
    with a real answer). The global positive-balance average reduces from
    per-batch (Σ, n) partials; customers above it anti-join the recent
    orders' per-batch-DISTINCT custkeys in
    the bucketed exchange (the scale-safe NOT EXISTS); nation totals
    finish as partials. Float caveat (cf. kmeans_assign_embeddings): the
    avg threshold is an order-dependent float64 sum, so a customer within
    1 ULP of it could flip sides vs SQL — no corpus row is near the
    boundary."""
    from ..ops.joins import bucketed_hash_join
    cust = _read_pq(_t(sf_dir, "customer"),
                    columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def avg_partial(t: pa.Table) -> pa.Table:
        v = t["c_acctbal"].to_numpy()
        v = v[v > 0.0]
        return pa.table({"s": pa.array([float(v.sum())], pa.float64()),
                         "n": pa.array([len(v)], pa.int64())})

    a = cust.map_batches(avg_partial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    avg = a["s"] / a["n"]

    rich = cust.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], pa.scalar(avg))),
        batch_format="pyarrow")

    since = pa.scalar(pd.Timestamp("2000-07-01"), pa.timestamp("us"))
    okeys = _read_pq(_t(sf_dir, "orders"),
                     columns=["o_custkey", "o_orderdate"]) \
        .map_batches(lambda t: pa.table(
            {"c_custkey": pc.unique(t.filter(
                pc.greater_equal(t["o_orderdate"], since))["o_custkey"])}),
            batch_format="pyarrow")

    no_orders = bucketed_hash_join(
        rich, okeys, "c_custkey", how="anti", num_buckets=32,
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_nationkey", pa.int32()),
                               ("c_acctbal", pa.float64())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]))

    def nat_partial(df: pd.DataFrame) -> pa.Table:
        return _arrow(df.groupby("c_nationkey", as_index=False)
                      .agg(numcust=("c_custkey", "size"),
                           totacctbal=("c_acctbal", "sum")))

    df = _for_agg(no_orders.map_batches(nat_partial,
                                        batch_format="pandas")) \
        .groupby("c_nationkey").aggregate(
            Sum("numcust", alias_name="numcust"),
            Sum("totacctbal", alias_name="totacctbal")).to_pandas()
    if df.empty:  # Ray to_pandas drops columns on 0-row datasets
        df = pd.DataFrame({"c_nationkey": pd.Series([], dtype=np.int32),
                           "numcust": pd.Series([], dtype=np.int64),
                           "totacctbal": pd.Series([], dtype=np.float64)})
    df["numcust"] = df["numcust"].astype(np.int64)
    df["totacctbal"] = df["totacctbal"].round(2)
    return df.sort_values("c_nationkey").reset_index(drop=True)



Q22_SQL = """
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY c_nationkey ORDER BY c_nationkey
"""



def q19_discounted_revenue(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q19-shaped disjunctive predicate join: revenue from three
    OR'd (brand, size-range, quantity-range) clauses. part collapses to
    a broadcast partkey→(brand, size) map under ``broadcast_rows_budget``
    (above it: project part to those 3 columns and run the bucketed
    join); the OR-of-ANDs evaluates vectorized per batch and only a
    per-batch scalar sum leaves each block."""
    assert _n_rows(sf_dir, "part") <= broadcast_rows_budget, \
        "swap to a bucketed join on partkey above the budget"
    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_size"])
    keys = part["p_partkey"].to_pylist()
    bmap = dict(zip(keys, part["p_brand"].to_pylist()))
    smap = dict(zip(keys, part["p_size"].to_pylist()))
    pref = ray.put((bmap, smap))

    def partial(t: pa.Table) -> pa.Table:
        bm, sm = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        pk = pd.Series(t["l_partkey"].to_numpy())
        brand = pk.map(bm).to_numpy()
        size = pk.map(sm).to_numpy()
        q = t["l_quantity"].to_numpy()
        rev = (t["l_extendedprice"].to_numpy()
               * (1.0 - t["l_discount"].to_numpy()))
        hit = (((brand == "Brand#12") & (size >= 1) & (size <= 5)
                & (q >= 1) & (q <= 11))
               | ((brand == "Brand#23") & (size >= 1) & (size <= 10)
                  & (q >= 10) & (q <= 20))
               | ((brand == "Brand#34") & (size >= 1) & (size <= 15)
                  & (q >= 20) & (q <= 30)))
        return pa.table({"revenue": pa.array([float(rev[hit].sum())],
                                             pa.float64())})

    tot = _read_pq(_t(sf_dir, "lineitem"),
                   columns=["l_partkey", "l_quantity",
                            "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("revenue", alias_name="revenue"))["revenue"]
    return pd.DataFrame({"revenue": [round(tot, 2)]})



Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""



def q16_supplier_cnt(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q16-shaped grouped DISTINCT count (adapted: no partsupp
    table, so the part↔supplier relation is lineitem's observed pairs):
    distinct suppliers per (brand, size) excluding one brand. Per-batch
    DISTINCT (brand, size, suppkey) triples pre-reduce the exchange
    (≤ groups×suppliers per block, never raw lines); one groupby dedups
    across blocks and counts."""
    assert _n_rows(sf_dir, "part") <= broadcast_rows_budget, \
        "swap to a bucketed join on partkey above the budget"
    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_size"])
    pmap = {k: (b, s) for k, b, s in zip(part["p_partkey"].to_pylist(),
                                         part["p_brand"].to_pylist(),
                                         part["p_size"].to_pylist())
            if b != "Brand#45"}
    pref = ray.put(pmap)

    def triples(t: pa.Table) -> pa.Table:
        m = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        df = pd.DataFrame({"pk": t["l_partkey"].to_pandas(),
                           "s": t["l_suppkey"].to_pandas()})
        bs = df["pk"].map(m)
        df = df[bs.notna()]
        df["p_brand"] = bs[bs.notna()].str[0]
        df["p_size"] = bs[bs.notna()].str[1].astype(np.int32)
        return _arrow(df[["p_brand", "p_size", "s"]].drop_duplicates())

    uniq = _for_agg(_read_pq(_t(sf_dir, "lineitem"),
                             columns=["l_partkey", "l_suppkey"])
                    .map_batches(triples, batch_format="pyarrow")) \
        .groupby(["p_brand", "p_size", "s"]) \
        .aggregate(Count(alias_name="_n"))

    def cnt_partial(df: pd.DataFrame) -> pa.Table:
        return _arrow(df.groupby(["p_brand", "p_size"], as_index=False)
                      .size().rename(columns={"size": "supplier_cnt"}))

    out = uniq.map_batches(cnt_partial, batch_format="pandas") \
        .to_pandas().groupby(["p_brand", "p_size"], as_index=False) \
        .agg(supplier_cnt=("supplier_cnt", "sum"))
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    return out.sort_values(["supplier_cnt", "p_brand", "p_size"],
                           ascending=[False, True, True]) \
        .reset_index(drop=True)



Q16_SQL = """
SELECT p_brand, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""



def q20_dominant_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20-shaped self-relative threshold (adapted: no
    partsupp.availqty, so 'dominant' means shipping more than 2× the
    part's MEAN per-supplier quantity — the >50%-of-total form is
    vacuous here because every part has ~15-30 suppliers): per-part
    supplier shares against the part's own statistics. Parts co-partition once (ops.dedup._grouped_exchange after
    per-batch (part, supp) pre-reduction); both aggregation levels and
    the share filter run inside each bucket, and only (suppkey, count)
    partials leave. Quantities are integer-valued doubles, so the sums
    — hence the strict > 0.5·total cut — are float64-EXACT on both
    sides."""
    from ..ops.dedup import _grouped_exchange

    def li_partial(t: pa.Table) -> pa.Table:
        return _arrow(pd.DataFrame({
            "l_partkey": t["l_partkey"].to_pandas(),
            "l_suppkey": t["l_suppkey"].to_pandas(),
            "q": t["l_quantity"].to_pandas()})
            .groupby(["l_partkey", "l_suppkey"], as_index=False)
            ["q"].sum())

    li = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_partkey", "l_suppkey", "l_quantity"]) \
        .map_batches(li_partial, batch_format="pyarrow")

    def block(g: pd.DataFrame) -> pa.Table:
        ps = g.groupby(["l_partkey", "l_suppkey"], as_index=False) \
            ["q"].sum()
        grp = ps.groupby("l_partkey")["q"]
        tot = grp.transform("sum")
        ns = grp.transform("size")
        # 2.0*tq/ns left-assoc like the SQL; all inputs float64-exact
        dom = ps[ps["q"] > 2.0 * tot / ns]
        return _arrow(dom.groupby("l_suppkey", as_index=False).size()
                      .rename(columns={"l_suppkey": "s_suppkey",
                                       "size": "n_parts"}))

    df = _for_agg(_grouped_exchange(li, "l_partkey", block,
                                    num_buckets=32)) \
        .groupby("s_suppkey") \
        .aggregate(Sum("n_parts", alias_name="n_parts")).to_pandas()
    df["n_parts"] = df["n_parts"].astype(np.int64)
    return df.sort_values("s_suppkey").reset_index(drop=True)



Q20_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
  FROM lineitem GROUP BY 1, 2),
tot AS (SELECT l_partkey, SUM(q) AS tq, COUNT(*) AS ns
        FROM ps GROUP BY 1)
SELECT l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM ps JOIN tot USING (l_partkey)
WHERE q > 2.0 * tq / ns
GROUP BY 1 ORDER BY 1
"""



def q21_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21-shaped grouped EXISTS/NOT-EXISTS (adapted: 'late' is
    l_shipdate > o_orderdate + 90 days — there is no commit/receipt
    column): suppliers who were the SOLE late supplier on a
    multi-supplier order. lineitem pre-reduces to one
    (orderkey, suppkey, max_ship) row per pair per batch; the bucketed
    join on orderkey attaches o_orderdate AND co-partitions every
    order's rows into one block, so the per-order EXISTS/NOT-EXISTS
    logic runs as a vectorized pandas pass per join bucket
    (batch_size=None pins batch == block) — no second exchange. Top-100
    by (numwait desc, suppkey) via per-block heads + a bounded driver
    finish; winner names attach through a pushdown-filtered supplier
    read."""
    from ..ops.joins import bucketed_hash_join

    def li_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"l_orderkey": t["l_orderkey"].to_pandas(),
                           "l_suppkey": t["l_suppkey"].to_pandas(),
                           "max_ship": t["l_shipdate"].to_pandas()})
        return _arrow(df.groupby(["l_orderkey", "l_suppkey"],
                                 as_index=False)["max_ship"].max())

    li = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow")

    orders = _read_pq(_t(sf_dir, "orders"),
                      columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda t: t.rename_columns(
            ["l_orderkey", "o_orderdate"]), batch_format="pyarrow")

    joined = bucketed_hash_join(
        li, orders, "l_orderkey", num_buckets=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("max_ship", pa.timestamp("us"))]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]))

    def per_order(df: pd.DataFrame) -> pa.Table:
        # finish the cross-batch (orderkey, suppkey) max first — the
        # per-batch partials may carry one row per batch per pair
        g = df.groupby(["l_orderkey", "l_suppkey"], as_index=False) \
            .agg(max_ship=("max_ship", "max"),
                 o_orderdate=("o_orderdate", "first"))
        g["late"] = g["max_ship"] > g["o_orderdate"] + pd.Timedelta(days=90)
        per_o = g.groupby("l_orderkey").agg(
            n_supp=("l_suppkey", "size"),
            n_late=("late", "sum"),
            late_supp=("l_suppkey",
                       lambda s: s[g.loc[s.index, "late"]].max()))
        ok = per_o[(per_o["n_supp"] >= 2) & (per_o["n_late"] == 1)]
        out = ok.groupby("late_supp").size().reset_index() \
            .rename(columns={"late_supp": "s_suppkey", 0: "numwait"})
        out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
        return _arrow(out)

    counts = _for_agg(joined.map_batches(per_order, batch_format="pandas",
                                         batch_size=None)) \
        .groupby("s_suppkey").aggregate(Sum("numwait", alias_name="numwait"))

    def local_head(df: pd.DataFrame) -> pa.Table:
        return _arrow(_topk(df, ["numwait", "s_suppkey"],
                            [False, True], 100))

    top = _topk(counts.map_batches(local_head, batch_format="pandas")
                .to_pandas(), ["numwait", "s_suppkey"], [False, True], 100)
    names = pq.read_table(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", top["s_suppkey"].tolist())]) \
        .to_pandas()
    df = top.merge(names, on="s_suppkey")
    df["numwait"] = df["numwait"].astype(np.int64)
    return df[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)



Q21_SQL = """
WITH l AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS max_ship
  FROM lineitem GROUP BY l_orderkey, l_suppkey),
j AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (l.max_ship > o.o_orderdate + INTERVAL 90 DAY) AS late
  FROM l JOIN orders o ON o.o_orderkey = l.l_orderkey),
p AS (
  SELECT l_orderkey, COUNT(*) AS n_supp,
         SUM(CASE WHEN late THEN 1 ELSE 0 END) AS n_late,
         MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM j GROUP BY l_orderkey)
SELECT late_supp AS s_suppkey, s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM p JOIN supplier ON s_suppkey = late_supp
WHERE n_supp >= 2 AND n_late = 1
GROUP BY late_supp, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 100
"""



# ---------------------------------------------------------------------------
# TPC-H q2 / q11 over a DERIVED deterministic partsupp (the testdata ships
# no partsupp table — VERDICT r3 item 4). Each part gets 4 suppliers via the
# rotation (p + p//S + i·(S//4)) % S (distinct for S ≥ 4, dbgen-flavored),
# and availqty / supplycost draw from the md5 ≡ DuckDB md5_number_lower
# convention the media headers use, so a SQL CTE reproduces the table
# bit-exactly. supplycost is an INTEGER-VALUED double (100..100000) and
# availqty an int, so every min/sum/threshold comparison is float64-EXACT
# on both sides (products ≤ 1e9, sums ≪ 2^53).
# ---------------------------------------------------------------------------

def _ps_rows(partkeys: np.ndarray, s_cnt: int, *,
             want_avail: bool = True) -> pd.DataFrame:
    """Derived partsupp rows for a batch of part keys (4 per part)."""
    from ..ops.multimodal import _md5_u64

    reps = np.repeat(np.asarray(partkeys, dtype=np.int64), 4)
    i = np.tile(np.arange(4, dtype=np.int64), len(partkeys))
    supp = (reps + reps // s_cnt + i * (s_cnt // 4)) % s_cnt
    out = {"ps_partkey": reps, "ps_suppkey": supp,
           "ps_supplycost": np.fromiter(
               (100 + _md5_u64(f"pscost:{p}:{s}") % 99901
                for p, s in zip(reps, supp)),
               dtype=np.float64, count=len(reps))}
    if want_avail:
        out["ps_availqty"] = np.fromiter(
            (1 + _md5_u64(f"psav:{p}:{s}") % 9999
             for p, s in zip(reps, supp)),
            dtype=np.int64, count=len(reps))
    return pd.DataFrame(out)



_PS_CTE = """
s_cnt AS (SELECT COUNT(*) AS s FROM supplier),
ps AS (
  SELECT ps_partkey, ps_suppkey,
         CAST(100 + md5_number_lower('pscost:' ||
              CAST(ps_partkey AS VARCHAR) || ':' ||
              CAST(ps_suppkey AS VARCHAR)) % 99901 AS DOUBLE)
           AS ps_supplycost,
         CAST(1 + md5_number_lower('psav:' ||
              CAST(ps_partkey AS VARCHAR) || ':' ||
              CAST(ps_suppkey AS VARCHAR)) % 9999 AS BIGINT)
           AS ps_availqty
  FROM (SELECT p_partkey AS ps_partkey,
               (p_partkey + p_partkey // s + i * (s // 4)) % s AS ps_suppkey
        FROM part, s_cnt,
             (SELECT unnest(generate_series(0, 3)) AS i))
)
"""



def q2_min_cost_supplier(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q2-shaped min-cost supplier (adapted filters: p_size ≤ 15 AND
    p_type = 'LARGE', region EUROPE): for each qualifying part, the EUROPE
    suppliers achieving its minimum derived supplycost.

    Scale shape: a part's 4 partsupp rows derive IN-BATCH from its key, so
    the whole correlated-min runs inside one ``map_batches`` over the
    filtered part table — no exchange at all. The EUROPE supplier map
    (supplier ⋈ nation ⋈ region, dimensions) broadcasts under the footer
    row-count budget; the final sort+limit finishes on the driver over the
    candidate rows (≤ 4 × the selectively-filtered parts)."""
    for dim in ("supplier", "nation", "region"):
        assert _n_rows(sf_dir, dim) <= broadcast_rows_budget, \
            "swap the dimension attach to a bucketed join above the budget"
    s_cnt = _n_rows(sf_dir, "supplier")
    sup = pq.read_table(_t(sf_dir, "supplier")).to_pandas()
    nat = pq.read_table(_t(sf_dir, "nation")).to_pandas()
    reg = pq.read_table(_t(sf_dir, "region")).to_pandas()
    eu = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey") \
            .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    eu = eu[eu["r_name"] == "EUROPE"]
    emap = {k: (nm, ab, nn) for k, nm, ab, nn in zip(
        eu["s_suppkey"], eu["s_name"], eu["s_acctbal"], eu["n_name"])}
    eref = ray.put(emap)

    def winners(t: pa.Table) -> pa.Table:
        m = ray.get(eref)
        df = t.to_pandas()
        df = df[(df["p_size"] <= 15) & (df["p_type"] == "LARGE")]
        if len(df) == 0:
            return _arrow(pd.DataFrame({
                "s_acctbal": pd.Series([], dtype="float64"),
                "s_name": pd.Series([], dtype="object"),
                "n_name": pd.Series([], dtype="object"),
                "p_partkey": pd.Series([], dtype="int64"),
                "p_brand": pd.Series([], dtype="object"),
                "ps_supplycost": pd.Series([], dtype="float64")}))
        ps = _ps_rows(df["p_partkey"].to_numpy(), s_cnt, want_avail=False)
        ps = ps[ps["ps_suppkey"].isin(m)]
        # per-part min cost among EUROPE suppliers; integer-valued doubles
        # make the equality cut exact
        mins = ps.groupby("ps_partkey")["ps_supplycost"].transform("min")
        win = ps[ps["ps_supplycost"] == mins]
        win = win.merge(df[["p_partkey", "p_brand"]],
                        left_on="ps_partkey", right_on="p_partkey")
        info = win["ps_suppkey"].map(m)
        return _arrow(pd.DataFrame({
            "s_acctbal": info.str[1].astype(np.float64),
            "s_name": info.str[0],
            "n_name": info.str[2],
            "p_partkey": win["p_partkey"].astype(np.int64),
            "p_brand": win["p_brand"],
            "ps_supplycost": win["ps_supplycost"].astype(np.float64)}))

    cand = _read_pq(_t(sf_dir, "part"),
                    columns=["p_partkey", "p_brand", "p_type", "p_size"]) \
        .map_batches(winners, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                           ascending=[False, True, True, True]).head(100)
    return out.reset_index(drop=True)



Q2_SQL = f"""
WITH {_PS_CTE},
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
cand AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
  FROM part
  JOIN ps ON ps_partkey = p_partkey
  JOIN eu ON s_suppkey = ps_suppkey
  WHERE p_size <= 15 AND p_type = 'LARGE'),
mins AS (
  SELECT p_partkey, MIN(ps_supplycost) AS mc
  FROM cand GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
FROM cand JOIN mins USING (p_partkey)
WHERE ps_supplycost = mc
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""



def q11_important_stock(
        sf_dir: str, *,
        broadcast_rows_budget: int = BROADCAST_ROWS_BUDGET) -> pd.DataFrame:
    """TPC-H Q11-shaped grouped value with self-relative HAVING (adapted:
    nation NATION_3 (present at every sf); threshold = 2× the mean per-part value, the same
    data-adaptive form as q20 — the 0.0001-of-total form is sf-bound):
    per-part stock value SUM(supplycost·availqty) over NATION_3 suppliers.

    Scale shape: partsupp rows derive in-batch from the part keys; the
    NATION_3 supplier set broadcasts (dimension); per-batch partial sums
    pre-reduce the exchange to (partkey, value) rows; one small groupby
    finishes, and the threshold/sort run on the driver over the grouped
    result (≤ #parts rows). All terms are integer-valued doubles, so the
    sums and the strict > cut are float64-exact."""
    for dim in ("supplier", "nation"):
        assert _n_rows(sf_dir, dim) <= broadcast_rows_budget, \
            "swap the dimension attach to a bucketed join above the budget"
    s_cnt = _n_rows(sf_dir, "supplier")
    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(_t(sf_dir, "nation")).to_pandas()
    n7 = set(sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
             .query("n_name == 'NATION_3'")["s_suppkey"])
    n7ref = ray.put(n7)

    def partial(t: pa.Table) -> pa.Table:
        wanted = ray.get(n7ref)
        ps = _ps_rows(t["p_partkey"].to_numpy(), s_cnt)
        ps = ps[ps["ps_suppkey"].isin(wanted)]
        ps["stock_value"] = ps["ps_supplycost"] * ps["ps_availqty"]
        return _arrow(ps.groupby("ps_partkey", as_index=False)
                      ["stock_value"].sum())

    g = _for_agg(_read_pq(_t(sf_dir, "part"), columns=["p_partkey"])
                 .map_batches(partial, batch_format="pyarrow")) \
        .groupby("ps_partkey") \
        .aggregate(Sum("stock_value", alias_name="stock_value")).to_pandas()
    thr = 2.0 * g["stock_value"].sum() / len(g)
    out = g[g["stock_value"] > thr]
    return out.sort_values(["stock_value", "ps_partkey"],
                           ascending=[False, True]).reset_index(drop=True)



Q11_SQL = f"""
WITH {_PS_CTE},
n7 AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'),
g AS (
  SELECT ps_partkey, SUM(ps_supplycost * ps_availqty) AS stock_value
  FROM ps JOIN n7 ON s_suppkey = ps_suppkey
  GROUP BY 1)
SELECT ps_partkey, stock_value FROM g
WHERE stock_value > (SELECT 2.0 * SUM(stock_value) / COUNT(*) FROM g)
ORDER BY stock_value DESC, ps_partkey
"""


__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
