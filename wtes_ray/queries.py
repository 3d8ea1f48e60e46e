"""Driver-facing query registry: every pipeline exposed through
``__ray_entry__.queries()`` with its DuckDB oracle SQL where the semantics
are SQL-expressible (the driver's correctness gate).

Conventions (driver compare: row-count + schema + order-insensitive
value-hash over columns sorted by name):
  - aggregate/computed column names MATCH the SQL aliases exactly;
  - float aggregates are rounded identically on both sides (sums → 2dp,
    ratios/averages/cosines → 6dp) to kill summation-order ULP drift;
  - int aggregates are cast to BIGINT in SQL (DuckDB SUM(int)→HUGEINT);
  - embeddings are cast to DOUBLE[] in SQL so DuckDB's cosine runs in
    float64 like the numpy side;
  - the text-regex oracles (token/quality stats) assume ASCII corpus text:
    Python's \\w/\\s are Unicode-aware while DuckDB RE2's are ASCII-only,
    so they agree only on ASCII (true for the driver's seeded testdata;
    verified). A Unicode corpus would need \\p{{L}}-class SQL regexes.

Each callable takes ``sf_dir`` and returns a Dataset / pandas DataFrame.
Ray is initialised by the caller (driver contract — no ray.init here).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Dimension-attach strategy (size-budget cutover): a join side is broadcast
# (one ray.put dict, read inside every task) only while its row count —
# taken from the parquet FOOTER, no data read — fits this budget; above it
# the attach runs through the bucketed hash join (ops/joins.py), which
# never materializes the side on the driver. ~1M rows ≈ tens of MB of dict
# per worker heap; dimensions scale with sf, so at the 100 TB design point
# the join path is the one that runs.
BROADCAST_ROWS_BUDGET = 1_000_000


def _n_rows(sf_dir: str, name: str) -> int:
    return pq.ParquetFile(_t(sf_dir, name)).metadata.num_rows


def _read_pq(path, *, columns: list[str] | None = None,
             **kwargs) -> rd.Dataset:
    """``read_parquet`` with an explicit, metadata-free schema (pruned to
    ``columns``) taken from the parquet FOOTER. pandas-written parquet
    carries a ``b'pandas'`` schema-metadata dict which makes
    ``Schema.__hash__`` raise, degrading Ray's block-schema dedup to a
    'Failed to hash the schemas' warning inside the READ stage itself —
    passing the clean schema silences it at the source (field-level
    metadata, e.g. the tensor-extension tag on embeddings, survives)."""
    p0 = path[0] if isinstance(path, (list, tuple)) else path
    s = pq.read_schema(p0)
    if columns is not None:
        s = pa.schema([s.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns,
                           schema=s.remove_metadata(), **kwargs)


def _arrow(df: pd.DataFrame) -> pa.Table:
    """pandas → Arrow block for any stage FEEDING an exchange: Ray's
    sort-based groupby/aggregate is ~16× slower on pandas blocks than on
    Arrow blocks (measured at sf0.1: 21 s vs 1.3 s for an identical
    110k-row aggregate), so partial-aggregate outputs convert here.
    Schema METADATA is stripped: from_pandas attaches a b'pandas' dict that
    makes Schema.__hash__ raise, degrading Ray's block-schema dedup to a
    logged warning per unify ('Failed to hash the schemas')."""
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _for_agg(ds: "rd.Dataset") -> "rd.Dataset":
    """Consolidate a PARTIAL-aggregate dataset before its final groupby:
    Ray's AggregateReduce merges one sorted slice per (input block ×
    partition), so many small pre-reduced blocks make the reduce
    per-slice overhead dominate (measured at sf0.1: 9.2 s streaming vs
    1.6 s consolidated for an identical 110k-row → 15k-group aggregate).
    The inputs here are partial-combine outputs — bounded by keys ×
    blocks, orders of magnitude smaller than the raw tables — so a
    materialize is scale-safe."""
    return ds.materialize()


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


def _topk(df: pd.DataFrame, by: list[str], ascending: list[bool],
          k: int) -> pd.DataFrame:
    return df.sort_values(by, ascending=ascending).head(k)


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
    from .ops.joins import bucketed_hash_join
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
        from .ops.joins import bucketed_hash_join

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


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate (streaming-shaped workload, ray_guide):
    window key computed vectorized in arrow, then grouped."""
    ds = _read_pq(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        # unit-proof: normalize to µs first (epoch_us on the SQL side)
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000))
        return pa.table({"user_id": t["user_id"],
                         "hour_bucket": pc.cast(hour, pa.int64()),
                         "value": t["value"]})

    agg = ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby(["user_id", "hour_bucket"]).aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"))
    df = agg.to_pandas()
    df["n_events"] = df["n_events"].astype("int64")
    df["sum_value"] = df["sum_value"].round(2)
    return df.sort_values(["user_id", "hour_bucket"]).reset_index(drop=True)


EVENTS_HOURLY_SQL = """
SELECT user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY user_id, hour_bucket
"""


def sessionize_events_map_groups(sf_dir: str) -> pd.DataFrame:
    """Reference formulation: sort-within-group pandas body under
    ``groupby(user).map_groups`` — one Python callback PER USER. Correct,
    but at billions of small groups the per-group dispatch dominates;
    :func:`sessionize_events` is the sort-within-partition production
    form. Kept (and tested equal) as the semantics reference."""
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff().dt.total_seconds()
        n_sessions = int((gaps.isna() | (gaps > 1800)).sum())
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [n_sessions],
                             "n_events": [len(g)]})

    df = ds.groupby("user_id").map_groups(
        sessions, batch_format="pandas").to_pandas()
    df = df.astype({"n_sessions": "int64", "n_events": "int64"})
    return df.sort_values("user_id").reset_index(drop=True)


def sessionize_events(sf_dir: str) -> pd.DataFrame:
    """Session windows (30-min gap) per user, sort-WITHIN-PARTITION: users
    co-partition by hash into coarse buckets (ops.dedup._grouped_exchange)
    and each bucket is sessionized in ONE vectorized pandas pass — sort by
    (user, ts), session break = user change or gap > 30 min, per-user sum
    of breaks. No per-group Python callback anywhere (the map_groups
    reference form above is one callback per user)."""
    from .ops.dedup import _grouped_exchange
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def sessions_block(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        gaps = g["ts"].diff().dt.total_seconds()
        brk = (new_user | (gaps > 1800)).astype("int64")
        out = pd.DataFrame({"user_id": g["user_id"], "brk": brk}) \
            .groupby("user_id", as_index=False) \
            .agg(n_sessions=("brk", "sum"), n_events=("brk", "size"))
        return _arrow(out.astype({"n_sessions": "int64",
                                  "n_events": "int64"}))

    df = _grouped_exchange(ds, "user_id", sessions_block).to_pandas()
    return df.sort_values("user_id").reset_index(drop=True)


SESSIONIZE_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM (SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events)
GROUP BY user_id ORDER BY user_id
"""


def q12_priority_lines(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12-shaped (adapted to the schema: no shipmode column, so
    the line group is l_returnflag): big-big join of per-batch lineitem
    COUNT partials with a projected orders side on the bucketed hash
    join, then conditional priority counts. The final aggregate is
    flags × blocks partial rows — a bounded driver finish."""
    from .ops.joins import bucketed_hash_join

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
    from .ops.joins import bucketed_hash_join

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
    from .ops.joins import bucketed_hash_join
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


def events_props_stats(sf_dir: str) -> pd.DataFrame:
    """JSON scalar extraction (the `props` column) + grouped aggregate.
    The field pull is a real JSON parse per row (``json.loads`` — JSON
    decode is inherently per-value; the parse batches inside map_batches),
    so arbitrary key sets/nesting around ``k`` are handled, not just the
    seeded ``{"k": N}`` shape. SQL semantics: rows whose props lack an
    integer ``k`` still count in ``n`` (COUNT(*)) but are skipped by
    ``sum_k`` (SUM ignores NULL; pandas sum ignores NaN). JSON ``true``/
    ``false`` are NOT integers (DuckDB's CAST('true' AS BIGINT) errors —
    excluded here, so a boolean-k corpus diverges only where the oracle
    itself would fail). Recorded deviation: a group with NO integer k
    yields sum_k = 0 where SQL SUM gives NULL (unreachable on the seeded
    corpus; int64 output column keeps the driver compare well-typed)."""
    import json as _json
    ds = _read_pq(_t(sf_dir, "events"),
                         columns=["event_type", "props"])

    def _k_of(s) -> float:
        try:
            v = _json.loads(s)["k"]
        except (TypeError, ValueError, KeyError):
            return np.nan
        if isinstance(v, bool) or not isinstance(v, (int, np.integer)):
            return np.nan
        return float(v)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].map(_k_of)
        out = pd.DataFrame({"event_type": df["event_type"], "k": k})
        return _arrow(out.groupby("event_type", as_index=False).agg(
            sum_k=("k", "sum"), n=("k", "size")))

    agg = ds.map_batches(partial, batch_format="pandas") \
            .groupby("event_type").aggregate(
                Sum("sum_k", alias_name="sum_k"),
                Sum("n", alias_name="n"))
    df = agg.to_pandas().astype({"sum_k": "int64", "n": "int64"})
    return df.sort_values("event_type").reset_index(drop=True)


EVENTS_PROPS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT …): per-batch pair dedup (partial) → pair-level
    aggregate (one row per unique pair, no per-group Python callbacks) →
    grouped count. Both exchanges carry unique pairs / pair-counts only."""
    ds = _read_pq(_t(sf_dir, "events"),
                         columns=["event_type", "user_id"])
    pre = ds.map_batches(
        lambda df: _arrow(df.drop_duplicates(["event_type", "user_id"])),
        batch_format="pandas")
    uniq = _for_agg(pre).groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="__dups"))
    df = _for_agg(uniq).groupby("event_type").aggregate(
        Count(alias_name="n_users")).to_pandas()
    df["n_users"] = df["n_users"].astype("int64")
    return df.sort_values("event_type").reset_index(drop=True)


DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def orders_without_lineitems(sf_dir: str) -> pd.DataFrame:
    """Anti-join at scale: orders with no lineitems, counted per priority.
    Both sides are big, so this is a bucketed hash ANTI join — lineitem
    contributes per-batch-distinct orderkeys only (finished per bucket by
    ``right_prepare``); the round-1 driver-materialized lineitem key set is
    gone. Per-bucket priority counts feed a 5-row global combine."""
    from .ops.joins import bucketed_hash_join
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


def last_click_before_purchase_map_groups(sf_dir: str) -> pd.DataFrame:
    """Reference formulation (one Python callback per user) — see
    :func:`last_click_before_purchase` for the sort-within-partition
    production form; kept and tested equal."""
    ds = _read_pq(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # exact mirror of the oracle window (ORDER BY ts, event_id ROWS ...
        # 1 PRECEDING): running max of click ts over the strictly-preceding
        # rows — includes a click at the SAME ts when its event_id sorts
        # first, which merge_asof(allow_exact_matches=False) would drop
        g = g.sort_values(["ts", "event_id"])
        click_ts = g["ts"].where(g["event_type"] == "click")
        prev_click = click_ts.ffill().shift(1)
        out = g.loc[g["event_type"] == "purchase", ["event_id"]].copy()
        out["last_click_ts"] = prev_click[out.index]
        out = out.dropna(subset=["last_click_ts"])
        if out.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "last_click_ts":
                                     pd.Series([], dtype="datetime64[us]")})
        return out

    df = ds.groupby("user_id").map_groups(asof,
                                          batch_format="pandas").to_pandas()
    df["last_click_ts"] = df["last_click_ts"].astype("datetime64[us]")
    return df.sort_values("event_id").reset_index(drop=True)


def last_click_before_purchase(sf_dir: str) -> pd.DataFrame:
    """As-of join (a custom operator Ray Data lacks), sort-WITHIN-PARTITION:
    users co-partition by hash into coarse buckets and each bucket runs ONE
    vectorized pandas pass — sort by (user, ts, event_id), per-user running
    click-ts (grouped ffill) shifted by one row (grouped shift), then the
    purchase rows project out. Matches the oracle window (ORDER BY ts,
    event_id ROWS ... 1 PRECEDING) including the same-ts click-first edge.
    Purchases with no prior click are dropped (NULL-free compare)."""
    from .ops.dedup import _grouped_exchange
    ds = _read_pq(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])

    def asof_block(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"]
        click_ts = g["ts"].where(g["event_type"] == "click")
        prev_click = click_ts.groupby(uid, sort=False).ffill() \
                             .groupby(uid, sort=False).shift(1)
        out = g.loc[g["event_type"] == "purchase", ["event_id"]].copy()
        out["last_click_ts"] = prev_click[out.index]
        out = out.dropna(subset=["last_click_ts"])
        return _arrow(pd.DataFrame({
            "event_id": out["event_id"].astype("int64"),
            "last_click_ts": out["last_click_ts"]
            .astype("datetime64[us]")}))

    df = _grouped_exchange(ds, "user_id", asof_block).to_pandas()
    df["last_click_ts"] = df["last_click_ts"].astype("datetime64[us]")
    return df.sort_values("event_id").reset_index(drop=True)


LAST_CLICK_SQL = """
SELECT event_id, last_click_ts FROM (
  SELECT event_id, event_type,
         MAX(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_ts
  FROM events)
WHERE event_type = 'purchase' AND last_click_ts IS NOT NULL
ORDER BY event_id
"""


def clicks_before_purchase_1h_map_groups(sf_dir: str) -> pd.DataFrame:
    """Reference formulation (one Python callback per user) — see
    :func:`clicks_before_purchase_1h` for the sort-within-partition
    production form; kept and tested equal."""
    ds = _read_pq(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])

    def count_window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        clicks = g.loc[g["event_type"] == "click", "ts"].values
        purch = g[g["event_type"] == "purchase"]
        if purch.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_clicks_1h":
                                     pd.Series([], dtype="int64")})
        ts = purch["ts"].values
        lo = np.searchsorted(clicks, ts - np.timedelta64(3600, "s"),
                             side="left")
        hi = np.searchsorted(clicks, ts, side="left")   # strictly before
        return pd.DataFrame({"event_id": purch["event_id"].values,
                             "n_clicks_1h": (hi - lo).astype("int64")})

    df = ds.groupby("user_id").map_groups(count_window,
                                          batch_format="pandas").to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


def clicks_before_purchase_1h(sf_dir: str) -> pd.DataFrame:
    """Range join (non-equi interval predicate — an operator Ray Data
    lacks), sort-WITHIN-PARTITION: users co-partition by hash into coarse
    buckets; inside each bucket the interval count resolves with TWO
    vectorized ``merge_asof`` passes (both C-level, per-user via ``by=``):
    against the per-user running click count, the count of clicks strictly
    before ``ts`` minus the count strictly before ``ts − 1 h`` is exactly
    the clicks in ``[ts − 1 h, ts)``. No per-group Python callback."""
    from .ops.dedup import _grouped_exchange
    ds = _read_pq(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])

    def count_block(g: pd.DataFrame) -> pa.Table:
        clicks = g.loc[g["event_type"] == "click", ["user_id", "ts"]] \
                  .sort_values("ts", kind="mergesort")
        clicks["cum"] = clicks.groupby("user_id", sort=False).cumcount() + 1
        purch = g.loc[g["event_type"] == "purchase",
                      ["event_id", "user_id", "ts"]] \
                 .sort_values("ts", kind="mergesort")
        if purch.empty or clicks.empty:
            n = pd.Series(np.zeros(len(purch), dtype="int64"),
                          index=purch.index)
        else:
            hi = pd.merge_asof(purch, clicks, on="ts", by="user_id",
                               allow_exact_matches=False)["cum"] \
                   .fillna(0).values
            lo_t = purch.assign(
                ts=(purch["ts"] - pd.Timedelta(hours=1))
                .astype(purch["ts"].dtype))   # keep the [us] unit — the
            # subtraction promotes to [ns], which merge_asof rejects
            # clicks AT ts−1h count (>= bound), so exclude them from `lo`
            # by querying strictly-before ts−1h
            lo = pd.merge_asof(lo_t, clicks, on="ts", by="user_id",
                               allow_exact_matches=False)["cum"] \
                   .fillna(0).values
            n = pd.Series((hi - lo).astype("int64"), index=purch.index)
        return _arrow(pd.DataFrame({
            "event_id": purch["event_id"].astype("int64"),
            "n_clicks_1h": n}))

    df = _grouped_exchange(ds, "user_id", count_block).to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


CLICKS_BEFORE_PURCHASE_SQL = """
SELECT p.event_id,
       CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks_1h
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id ORDER BY p.event_id
"""


def events_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Sliding-window aggregate (1 h windows every 30 min): each event is
    exploded to its two covering windows inside ``map_batches`` (vectorized),
    then a grouped combine — the window assignment stays embarrassingly
    parallel, only (key, window) partials shuffle."""
    ds = _read_pq(_t(sf_dir, "events"), columns=["ts", "value"])
    W, S = 3_600_000_000, 1_800_000_000  # 1 h window, 30 min slide (µs)

    def explode(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        vals = t["value"].to_numpy()
        # windows starting at slide boundaries covering each ts:
        # w0 = floor(ts/S)*S and w1 = w0 - S (since W = 2·S)
        w0 = (us // S) * S
        starts = np.concatenate([w0, w0 - S])
        v2 = np.concatenate([vals, vals])
        return pa.table({"window_start": pa.array(starts, pa.int64()),
                         "value": pa.array(v2, pa.float64())})

    agg = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("window_start").aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"))
    df = agg.to_pandas()
    df["n_events"] = df["n_events"].astype("int64")
    df["sum_value"] = df["sum_value"].round(2)
    return df.sort_values("window_start").reset_index(drop=True)


EVENTS_SLIDING_SQL = """
SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM (
  SELECT (epoch_us(ts) // 1800000000) * 1800000000 AS window_start, value
  FROM events
  UNION ALL
  SELECT (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000, value
  FROM events)
GROUP BY window_start ORDER BY window_start
"""


def dedup_filter_docs(sf_dir: str) -> pd.DataFrame:
    """End-to-end corpus cleaning: planted-dup corpus → MinHash-LSH pairs →
    cluster → drop non-representative members (rows-only: LSH output)."""
    from .ops.dedup import dedup_filter, minhash_lsh_pairs
    docs = _docs_with_planted_dups(sf_dir)   # lazy plan, re-executable
    pairs = minhash_lsh_pairs(docs, threshold=0.8, concurrency=(1, 8))
    kept = dedup_filter(docs, pairs)
    df = kept.select_columns(["doc_id"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


PLANTED_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, text FROM
    (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20)
"""


def dedup_filter_exact_docs(sf_dir: str) -> pd.DataFrame:
    """The full cluster-dedup pipeline (LSH candidates → Jaccard verify →
    connected components → drop non-representatives) run at verify
    threshold 1.0, where it must reduce to exact text dedup — which IS
    SQL-expressible (GROUP BY text, keep MIN(doc_id)), so the whole
    pairs→CC→filter chain gets a value-hash oracle, not just row counts.
    (Identical texts always share every MinHash band, so LSH recall of
    exact dups is 1 barring max_bucket truncation; char-5-gram Jaccard
    is 1.0 only for equal shingle SETS — byte-identical on this corpus.)"""
    from .ops.dedup import (dedup_filter, minhash_lsh_pairs,
                            verify_pairs_jaccard)
    docs = _docs_with_planted_dups(sf_dir)
    pairs = minhash_lsh_pairs(docs, threshold=0.8, concurrency=(1, 8))
    exact = verify_pairs_jaccard(pairs, docs, threshold=1.0)
    kept = dedup_filter(docs, exact)
    df = kept.select_columns(["doc_id"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DEDUP_FILTER_EXACT_SQL = f"""
WITH planted AS ({PLANTED_SQL})
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
FROM planted GROUP BY text ORDER BY doc_id
"""


def neardup_clusters_exact_docs(sf_dir: str) -> pd.DataFrame:
    """Cluster membership of the exact-dup (verify-at-1.0) pipeline —
    SQL-expressible as text-equality groups of size > 1 (window form)."""
    from .ops.dedup import (minhash_lsh_pairs, neardup_clusters,
                            verify_pairs_jaccard)
    docs = _docs_with_planted_dups(sf_dir)
    pairs = minhash_lsh_pairs(docs, threshold=0.8, concurrency=(1, 8))
    exact = verify_pairs_jaccard(pairs, docs, threshold=1.0)
    return neardup_clusters(exact).sort_values("doc_id") \
                                  .reset_index(drop=True)


NEARDUP_CLUSTERS_EXACT_SQL = f"""
WITH planted AS ({PLANTED_SQL}),
g AS (SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY text) AS cluster_id,
             COUNT(*) OVER (PARTITION BY text) AS n
      FROM planted)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(cluster_id AS BIGINT) AS cluster_id
FROM g WHERE n > 1 ORDER BY doc_id
"""


def frontier_buckets(sf_dir: str) -> pd.DataFrame:
    """M20/M21: crawl-frontier URL classification over the synthetic corpus'
    doc_id URLs. The per-URL semantics are pinned by unit tests
    (test_possible_url / classify); the oracle pins the DISTRIBUTION: every
    synthetic URL is a crawlable item page whose subject is not in the
    person lexicon (verified exhaustively over the generator), so the
    result is one ('useless', n_synthetic_docs) row at every sf — which
    the SQL reproduces from the documents row count."""
    from .ops.frontier import classify_urls
    ext = _extract_synthetic(sf_dir)
    urls = ext.select_columns(["doc_id"]).map_batches(
        lambda t: pa.table({"url": t.column("doc_id")}),
        batch_format="pyarrow")
    out = classify_urls(urls)
    df = out.groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("bucket").reset_index(drop=True)


# n_synthetic_docs = max(60, documents_rows // 4) — _extract_synthetic's
# corpus sizing, restated in SQL
FRONTIER_BUCKETS_SQL = """
SELECT 'useless' AS bucket,
       CAST(greatest(60, (SELECT COUNT(*) FROM documents) // 4) AS BIGINT)
         AS n
"""


def extract_error_stats(sf_dir: str) -> pd.DataFrame:
    """Quarantine surfacing (recorded deviation vs the reference's
    exception-swallowing): per-status doc counts from the flagship output.
    The oracle pins the invariant the query exists to watch — EVERY
    synthetic doc extracts cleanly (single ('ok', n) row, n derived from
    the documents row count); any quarantined doc breaks the hash."""
    ext = _extract_synthetic(sf_dir)

    def status(t: pa.Table) -> pa.Table:
        ok = pc.equal(t.column("error"), "")
        return pa.table({"status": pc.if_else(
            ok, pa.scalar("ok"), pa.scalar("quarantined"))})

    df = ext.select_columns(["error"]) \
            .map_batches(status, batch_format="pyarrow") \
            .groupby("status").aggregate(Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("status").reset_index(drop=True)


EXTRACT_ERROR_STATS_SQL = """
SELECT 'ok' AS status,
       CAST(greatest(60, (SELECT COUNT(*) FROM documents) // 4) AS BIGINT)
         AS n
"""


def neardup_clusters_docs(sf_dir: str) -> pd.DataFrame:
    """Connected components over the MinHash candidate pairs → (doc_id,
    cluster_id) for the planted-dup corpus (rows-only: LSH output)."""
    from .ops.dedup import minhash_lsh_pairs, neardup_clusters
    pairs = minhash_lsh_pairs(_docs_with_planted_dups(sf_dir),
                              threshold=0.8, concurrency=(1, 8))
    return neardup_clusters(pairs).sort_values("doc_id") \
                                  .reset_index(drop=True)


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
    from .ops.joins import bucketed_hash_join

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


# ---------------------------------------------------------------------------
# Text analysis over `documents`
# ---------------------------------------------------------------------------

def funnel_counts(sf_dir: str) -> pd.DataFrame:
    """Sequential-pattern funnel over events: users whose FIRST view is
    followed by a click, whose first such click is followed by a
    purchase (strict first-occurrence ordering). Per-user state is
    bucket-local (the `_grouped_exchange` co-partition by user), each
    bucket reduces to ONE partial row of three counts, and the driver
    sums buckets — nothing user-level ever leaves the workers."""
    from .ops.dedup import _grouped_exchange
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["user_id", "ts", "event_type"])
    keep = pa.array(["view", "click", "purchase"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"], value_set=keep)),
        batch_format="pyarrow")

    def block(g: pd.DataFrame) -> pa.Table:
        v = g[g["event_type"] == "view"].groupby("user_id")["ts"].min() \
            .rename("vt").reset_index()
        gc = g[g["event_type"] == "click"].merge(v, on="user_id")
        c = gc[gc["ts"] > gc["vt"]].groupby("user_id")["ts"].min() \
            .rename("ct").reset_index()
        gp = g[g["event_type"] == "purchase"].merge(c, on="user_id")
        p = gp[gp["ts"] > gp["ct"]].groupby("user_id")["ts"].min()
        return pa.table({"n_view": pa.array([len(v)], pa.int64()),
                         "n_view_click": pa.array([len(c)], pa.int64()),
                         "n_full_funnel": pa.array([len(p)], pa.int64())})

    parts = _grouped_exchange(ds, "user_id", block).to_pandas()
    out = parts.sum().to_frame().T.astype(np.int64)
    return out[["n_view", "n_view_click", "n_full_funnel"]] \
        .reset_index(drop=True)


FUNNEL_SQL = """
WITH v AS (SELECT user_id, MIN(ts) AS t FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel
"""


def lang_count(sf_dir: str) -> pd.DataFrame:
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang"])
    df = ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("lang").reset_index(drop=True)


LANG_COUNT_SQL = "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY lang"


def doc_token_stats(sf_dir: str):
    from .ops.text import token_stats
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return token_stats(ds)


DOC_TOKEN_STATS_SQL = r"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_subtokens
FROM documents
"""


def doc_fingerprints(sf_dir: str):
    from .ops.text import fingerprints
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return fingerprints(ds).select_columns(["doc_id", "fp_md5"])


DOC_FINGERPRINTS_SQL = "SELECT doc_id, md5(text) AS fp_md5 FROM documents"


def stopword_stats_docs(sf_dir: str):
    from .ops.text import stopword_stats
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    df = stopword_stats(ds).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


_STOP_EN_SQL = ("'the','of','and','to','a','in','is','it','you','that','he',"
                "'was','for','on','are','as','with','his','they','i','at',"
                "'be','this','have','from','or','had','by'")

STOPWORD_STATS_SQL = rf"""
WITH base AS (
  -- coalesce NULL text to '' so counts are 0/0/0.0 like the Ray side's
  -- fillna('') (instead of NULL-propagating through the whole row)
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\w+') AS toks
  FROM documents)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_words,
  CAST(len(list_filter(toks, t -> t IN ({_STOP_EN_SQL}))) AS BIGINT)
    AS n_stopwords,
  ROUND(len(list_filter(toks, t -> t IN ({_STOP_EN_SQL}))) * 1.0
        / greatest(len(toks), 1), 6) AS stopword_ratio
FROM base ORDER BY doc_id
"""


def quality_scores(sf_dir: str) -> pd.DataFrame:
    from .ops.runtime import stateless
    from .ops.text import TextScorer
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(stateless(TextScorer), batch_format="pandas")
    df = out.to_pandas()[["doc_id", "n_tokens", "punct_ratio", "digit_ratio",
                          "quality"]]
    return df.sort_values("doc_id").reset_index(drop=True)


QUALITY_SCORES_SQL = r"""
WITH base AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
    ROUND(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
          / greatest(length(text), 1), 6) AS punct_ratio,
    ROUND(len(regexp_extract_all(text, '\d')) * 1.0
          / greatest(length(text), 1), 6) AS digit_ratio
  FROM documents)
SELECT doc_id, n_tokens, punct_ratio, digit_ratio,
  ROUND(0.5 * (least(n_tokens, 200) / 200.0)
        + 0.25 * (1 - punct_ratio) + 0.25 * (1 - digit_ratio), 6) AS quality
FROM base ORDER BY doc_id
"""


def lang_id_scores(sf_dir: str) -> pd.DataFrame:
    """Heuristic language id per doc. SQL-checkable: the heuristic is a
    deterministic composition DuckDB can express — CJK-ratio gate, then
    per-language stopword hits over the first 200 whitespace tokens with
    the FIRST language attaining the max winning ties (the sequential
    strictly-greater update in TextScorer.lang_of ⇒ first-occurrence-of-
    max, encoded as the CASE order en→de→fr→es below), then the ≥5%
    hit-ratio gate. Tokens lowercase via str.lower()/lower() — identical
    on this ASCII corpus (same caveat as stopword_stats' \\w pin)."""
    from .ops.runtime import stateless
    from .ops.text import TextScorer
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(stateless(TextScorer), batch_format="pandas")
    return out.to_pandas()[["doc_id", "lang_id"]] \
              .sort_values("doc_id").reset_index(drop=True)


def _lang_id_sql() -> str:
    # the stopword literals come from the SAME tables the Ray side uses
    from .ops.text import _STOPWORDS

    def lit(lang: str) -> str:
        return "(" + ", ".join(
            f"'{w}'" for w in sorted(_STOPWORDS[lang])) + ")"

    return f"""
WITH t AS (
  SELECT doc_id, text,
    len(regexp_extract_all(text, '[\\x{{4E00}}-\\x{{9FFF}}]')) AS cjk,
    list_transform(list_slice(regexp_extract_all(text, '\\S+'), 1, 200),
                   x -> lower(x)) AS toks
  FROM documents),
h AS (
  SELECT doc_id, text, cjk, toks,
    len(list_filter(toks, x -> x IN {lit('en')})) AS he,
    len(list_filter(toks, x -> x IN {lit('de')})) AS hd,
    len(list_filter(toks, x -> x IN {lit('fr')})) AS hf,
    len(list_filter(toks, x -> x IN {lit('es')})) AS hs
  FROM t)
SELECT doc_id,
  CASE WHEN text IS NULL OR text = '' THEN 'unknown'
       WHEN CAST(cjk AS DOUBLE) / length(text) > 0.2 THEN 'zh'
       WHEN len(toks) = 0 THEN 'unknown'
       WHEN greatest(he, hd, hf, hs) = 0
            OR CAST(greatest(he, hd, hf, hs) AS DOUBLE) / len(toks) < 0.05
         THEN 'other'
       WHEN he = greatest(he, hd, hf, hs) THEN 'en'
       WHEN hd = greatest(he, hd, hf, hs) THEN 'de'
       WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
       ELSE 'es' END AS lang_id
FROM h ORDER BY doc_id
"""


LANG_ID_SQL = _lang_id_sql()


def lang_confusion_docs(sf_dir: str) -> pd.DataFrame:
    """Classifier-evaluation confusion matrix: stored ``lang`` label vs
    the heuristic ``lang_id`` prediction, counts per (label, prediction)
    pair — one scoring pass (cached-state TextScorer tasks) + one
    pair-keyed count; the evaluation harness every model-quality stage
    needs. The oracle reuses the full encoded lang-id SQL as a CTE."""
    from ray.data.aggregate import Count
    from .ops.runtime import stateless
    from .ops.text import TextScorer
    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "text", "lang"])
    out = ds.map_batches(stateless(TextScorer), batch_format="pandas") \
        .groupby(["lang", "lang_id"]).aggregate(Count(alias_name="cnt")) \
        .to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values(["lang", "lang_id"]).reset_index(drop=True)


def _lang_confusion_sql() -> str:
    return (f"WITH lid AS ({_lang_id_sql()})\n"
            "SELECT d.lang, lid.lang_id, CAST(COUNT(*) AS BIGINT) AS cnt\n"
            "FROM lid JOIN documents d USING (doc_id)\n"
            "GROUP BY 1, 2 ORDER BY lang, lang_id")


# ---------------------------------------------------------------------------
# Dedup family over `documents`
# ---------------------------------------------------------------------------

def dedup_exact_docs(sf_dir: str) -> pd.DataFrame:
    from .ops.dedup import exact_dedup
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return exact_dedup(ds).to_pandas().sort_values("doc_id") \
                          .reset_index(drop=True)


DEDUP_EXACT_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, text
FROM documents GROUP BY text ORDER BY doc_id
"""


def _sorted_head(path: str, key: str, columns: list[str],
                 n: int) -> pa.Table:
    """First ``n`` rows by ``key`` WITHOUT a driver-side full-table read:
    per-block local head (partial top-k inside map_batches), then a driver
    finish over only the ≤ n-per-block survivors — bounded by block count,
    never data size (the q10 top-k pattern; a full Ray ``sort()`` here
    costs an all-to-all exchange, ~2 s of overhead for a 20-row result).
    (The SQL oracles express this as ORDER BY key LIMIT n, so the result
    must not depend on parquet file order.)"""
    ds = _read_pq(path, columns=columns)

    def local_head(t: pa.Table) -> pa.Table:
        return t.sort_by(key).slice(0, n)

    parts = ray.get(
        ds.map_batches(local_head, batch_format="pyarrow").to_arrow_refs())
    return pa.concat_tables([p for p in parts if p.num_rows]) \
             .sort_by(key).slice(0, n)


def _docs_with_planted_dups(sf_dir: str):
    """documents ∪ copies of the first 20 docs (doc_id + 10**12) so the
    near-dup operators have guaranteed positives at every sf (the sf tables
    themselves are all-distinct word soup)."""
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    head = _sorted_head(_t(sf_dir, "documents"), "doc_id",
                        ["doc_id", "text"], 20)
    dup = pa.table({
        "doc_id": pc.add(head["doc_id"], pa.scalar(10**12)),
        "text": head["text"]})
    return ds.union(rd.from_arrow(dup))


def minhash_neardup_docs(sf_dir: str) -> pd.DataFrame:
    from .ops.dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(_docs_with_planted_dups(sf_dir),
                              threshold=0.8, concurrency=(1, 8))
    df = pairs.to_pandas()[["a", "b", "est_jaccard"]]
    df["est_jaccard"] = df["est_jaccard"].round(6)
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def simhash_neardup_docs(sf_dir: str) -> pd.DataFrame:
    from .ops.dedup import simhash_pairs
    pairs = simhash_pairs(_docs_with_planted_dups(sf_dir), max_hamming=2,
                          concurrency=(1, 8))
    return pairs.to_pandas()[["a", "b", "hamming"]] \
                .sort_values(["a", "b"]).reset_index(drop=True)


def jaccard_verified_neardup_docs(sf_dir: str) -> pd.DataFrame:
    from .ops.dedup import minhash_lsh_pairs, verify_pairs_jaccard
    docs = _docs_with_planted_dups(sf_dir)   # lazy plan, re-executable
    pairs = minhash_lsh_pairs(docs, threshold=0.8, concurrency=(1, 8))
    verified = verify_pairs_jaccard(pairs, docs, threshold=0.95)
    df = verified.to_pandas()[["a", "b", "jaccard"]]
    df["jaccard"] = df["jaccard"].round(6)
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def embedding_neardup(sf_dir: str) -> pd.DataFrame:
    from .ops.dedup import embedding_neardup_pairs
    ds = _read_pq(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    head = _sorted_head(_t(sf_dir, "embeddings"), "vec_id",
                        ["vec_id", "embedding"], 10)
    dup = pa.table({"vec_id": pc.add(head["vec_id"], pa.scalar(10**12)),
                    "embedding": head["embedding"]})
    pairs = embedding_neardup_pairs(ds.union(rd.from_arrow(dup)),
                                    threshold=0.999)
    df = pairs.to_pandas()
    df["cosine"] = df["cosine"].round(4)
    return df.sort_values(["a", "b"]).reset_index(drop=True)


EMB_PLANTED_SQL = """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000000000 AS vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 10)
"""


def embedding_neardup_planted(sf_dir: str) -> pd.DataFrame:
    """The hyperplane-LSH + in-bucket-cosine pipeline at a near-exact
    threshold (0.9999), where it must find exactly the planted identical
    vectors — identical vectors share every hyperplane sign, so LSH recall
    of exact duplicates is 1 — making the whole bucketed pipeline
    SQL-checkable against an exhaustive cross-join (the oracle's O(n²) is
    fine at gate scale; the Ray side stays bucketed)."""
    from .ops.dedup import embedding_neardup_pairs
    ds = _read_pq(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    head = _sorted_head(_t(sf_dir, "embeddings"), "vec_id",
                        ["vec_id", "embedding"], 10)
    dup = pa.table({"vec_id": pc.add(head["vec_id"], pa.scalar(10**12)),
                    "embedding": head["embedding"]})
    pairs = embedding_neardup_pairs(ds.union(rd.from_arrow(dup)),
                                    threshold=0.9999)
    df = pairs.to_pandas()[["a", "b", "cosine"]]
    df["cosine"] = df["cosine"].round(4)
    return df.sort_values(["a", "b"]).reset_index(drop=True)


EMBEDDING_NEARDUP_PLANTED_SQL = f"""
WITH planted AS ({EMB_PLANTED_SQL})
SELECT x.vec_id AS a, y.vec_id AS b,
       ROUND(list_cosine_similarity(x.e, y.e), 4) AS cosine
FROM planted x JOIN planted y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.e, y.e) >= 0.9999
ORDER BY a, b
"""


def simhash_exact_neardup_docs(sf_dir: str) -> pd.DataFrame:
    """SimHash candidates at max_hamming=0 VERIFIED at Jaccard 1.0 on the
    planted corpus. SimHash is a similarity hash — distinct-but-similar
    soup docs do collide at Hamming 0 (measured: 6 of 26 candidates at
    sf0.01), so the exact-dup pipeline is candidates → verify, and the
    verified output must equal the text-equality pairs SQL expresses as
    same-text-group pairs. (Identical texts always hash identically, so
    candidate recall of true dups is 1.)"""
    from .ops.dedup import simhash_pairs, verify_pairs_jaccard
    docs = _docs_with_planted_dups(sf_dir)
    pairs = simhash_pairs(docs, max_hamming=0, concurrency=(1, 8))
    exact = verify_pairs_jaccard(pairs, docs, threshold=1.0)
    df = exact.to_pandas()[["a", "b", "hamming"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)


SIMHASH_EXACT_SQL = f"""
WITH planted AS ({PLANTED_SQL})
SELECT x.doc_id AS a, y.doc_id AS b, CAST(0 AS BIGINT) AS hamming
FROM planted x JOIN planted y ON x.text = y.text AND x.doc_id < y.doc_id
ORDER BY a, b
"""


def ngram_jaccard_neardup_docs(sf_dir: str) -> pd.DataFrame:
    """Word-n-gram Jaccard near-dup pairs over the planted corpus:
    word-trigram MinHash candidates → exact word-trigram Jaccard ≥ 0.7
    (rows-only: LSH candidate recall < 1 by nature; the kernel and the
    full pipeline are hash-checked by ngram_jaccard_planted /
    ngram_jaccard_exact_docs)."""
    from .ops.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(_docs_with_planted_dups(sf_dir), n=3,
                                candidate_threshold=0.5, threshold=0.7,
                                concurrency=(1, 8))
    df = pairs.to_pandas()[["a", "b", "jaccard"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def ngram_jaccard_planted(sf_dir: str) -> pd.DataFrame:
    """Full-value oracle for the word-n-gram Jaccard KERNEL: all 780 pairs
    of the 40 planted head docs (20 originals + their copies), exact
    word-BIGRAM Jaccard at threshold 0.0, computed through the bucketed
    verify path (texts attach via the two hash joins, never the driver).

    The values hash-match DuckDB bit-exactly WITHOUT rounding: both sides
    compute |∩| / |∪| as one IEEE double division of the same two integers
    (tokenizer pinned to the ASCII class [a-z0-9_]+ on both sides — see
    ops/dedup._WORD_RE; Python's \\w is Unicode-wide, RE2's is not)."""
    from .ops.dedup import verify_pairs_jaccard
    docs = _docs_with_planted_dups(sf_dir)
    head = _sorted_head(_t(sf_dir, "documents"), "doc_id", ["doc_id"], 20)
    ids = sorted(head["doc_id"].to_pylist())
    ids = ids + [i + 10**12 for i in ids]
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    pairs_ds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())}))
    out = verify_pairs_jaccard(pairs_ds, docs, ngram=2, threshold=0.0,
                               mode="word")
    df = out.to_pandas()[["a", "b", "jaccard"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)


NGRAM_JACCARD_PLANTED_SQL = """
WITH heads AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20),
planted AS (
  SELECT doc_id, text FROM heads
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, text FROM heads),
g AS (SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS grams
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
            FROM planted))
SELECT x.doc_id AS a, y.doc_id AS b,
       COALESCE(CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
                / NULLIF(len(list_distinct(list_concat(x.grams, y.grams))),
                         0), 0.0) AS jaccard
FROM g x JOIN g y ON x.doc_id < y.doc_id
ORDER BY a, b
"""


def ngram_jaccard_exact_docs(sf_dir: str) -> pd.DataFrame:
    """The full word-n-gram pipeline (word-bigram MinHash candidates →
    exact verify) at threshold 1.0, where it must find exactly the pairs
    with EQUAL word-bigram SETS — SQL-expressible as a join on the sorted
    distinct gram list. (Equal shingle sets ⇒ identical minhash signatures
    ⇒ every band collides, so candidate recall of such pairs is 1 barring
    max_bucket truncation; both-empty gram sets verify at 0.0 by the
    kernel contract, mirrored by the len(grams) > 0 guard in the SQL.)"""
    from .ops.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(_docs_with_planted_dups(sf_dir), n=2,
                                candidate_threshold=0.8, threshold=1.0,
                                concurrency=(1, 8))
    df = pairs.to_pandas()[["a", "b"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)


NGRAM_JACCARD_EXACT_SQL = f"""
WITH planted AS ({PLANTED_SQL}),
g AS (SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS grams
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
            FROM planted))
SELECT CAST(x.doc_id AS BIGINT) AS a, CAST(y.doc_id AS BIGINT) AS b
FROM g x JOIN g y
  ON x.grams = y.grams AND x.doc_id < y.doc_id AND len(x.grams) > 0
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Similarity search over `embeddings`
# ---------------------------------------------------------------------------

def _query_vec(sf_dir: str) -> np.ndarray:
    # row-group/predicate pushdown: only fragments that can contain
    # vec_id=0 are decoded — never the full embeddings table
    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["embedding"],
                      filters=[("vec_id", "==", 0)])
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def topk_cosine_bruteforce(sf_dir: str) -> pd.DataFrame:
    from .ops.similarity import topk_cosine
    ds = _read_pq(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    df = topk_cosine(ds, _query_vec(sf_dir), k=10).to_pandas()
    df["cosine"] = df["cosine"].round(6)
    return df.reset_index(drop=True)


TOPK_COSINE_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    (SELECT qe FROM q)), 6) AS cosine
FROM embeddings
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                (SELECT qe FROM q)) DESC, vec_id
LIMIT 10
"""


def topk_cosine_multiquery(sf_dir: str) -> pd.DataFrame:
    """Batched retrieval: exact top-10 for THREE queries in one corpus
    pass — one (n×d)·(d×3) matmul per block, ≤ 3·k survivor rows per
    block, driver finish bounded by blocks × 3 × k (never corpus size).
    The query vectors load with a vec_id pushdown filter, never a full
    read. Oracle: per-query ROW_NUMBER window with the identical
    (cosine desc, vec_id asc) tie-break."""
    from .ops.similarity import topk_cosine_multi
    qt = pq.read_table(_t(sf_dir, "embeddings"),
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", 3)]).sort_by("vec_id")
    qids = qt.column("vec_id").to_pylist()
    Q = np.stack([np.asarray(v, dtype=np.float64)
                  for v in qt.column("embedding").to_pylist()])
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    df = topk_cosine_multi(ds, Q, qids, k=10)
    df["cosine"] = df["cosine"].round(6)
    return df.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True]) \
             .reset_index(drop=True)


TOPK_COSINE_MULTI_SQL = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 3),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    q.qe) AS c
      FROM q, embeddings e),
r AS (SELECT query_id, vec_id, c,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY c DESC, vec_id) AS rn
      FROM s)
SELECT CAST(query_id AS BIGINT) AS query_id, vec_id,
       ROUND(c, 6) AS cosine
FROM r WHERE rn <= 10
ORDER BY query_id, cosine DESC, vec_id
"""


def topk_cosine_lsh(sf_dir: str) -> pd.DataFrame:
    """Approximate variant (rows-only check: recall < 1 by design)."""
    from .ops.similarity import lsh_topk_cosine
    ds = _read_pq(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    df = lsh_topk_cosine(ds, _query_vec(sf_dir), k=10, probe=2).to_pandas()
    df["cosine"] = df["cosine"].round(6)
    return df.reset_index(drop=True)


def topk_cosine_lsh_full_probe(sf_dir: str) -> pd.DataFrame:
    """LSH ANN at ``probe == planes``: every signature is within Hamming ≤
    planes of the query's, so the candidate filter keeps ALL rows and the
    pipeline must equal brute force exactly — which makes the whole
    signature→filter→score→top-k composition SQL-checkable
    (TOPK_COSINE_SQL)."""
    from .ops.similarity import lsh_topk_cosine
    ds = _read_pq(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    df = lsh_topk_cosine(ds, _query_vec(sf_dir), k=10,
                         planes=10, probe=10).to_pandas()
    df["cosine"] = df["cosine"].round(6)
    return df.reset_index(drop=True)


_IVF_N_CENTROIDS = 16


def _ivf_index(sf_dir: str) -> str:
    """Build-once (cached under /tmp, keyed on sf tag + row count +
    n_centroids) IVF index over the embeddings table: train → assign →
    write hive-partitioned by ``centroid_id``. Returns the index dir."""
    from .ops.similarity import build_ivf_index
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    n_rows = pq.ParquetFile(_t(sf_dir, "embeddings")).metadata.num_rows
    cache = f"/tmp/wtes_cache/ivf-{tag}-{n_rows}-c{_IVF_N_CENTROIDS}"
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil as _shutil
        _shutil.rmtree(cache, ignore_errors=True)
        ds = _read_pq(_t(sf_dir, "embeddings"),
                             columns=["vec_id", "embedding"])
        build_ivf_index(ds, cache, n_centroids=_IVF_N_CENTROIDS)
        with open(marker, "w", encoding="utf-8") as f:
            f.write("ok")
    return cache


def topk_cosine_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-probe ANN on the SCALE path: the corpus is written partitioned
    by ``centroid_id`` (build-once index) and the search reads ONLY the
    nprobe probed partition directories — non-probed lists never leave
    storage. Rows-only check (recall < 1 by design at nprobe=4); the
    full-probe variant below is the hash-checked exactness witness."""
    from .ops.similarity import ivf_search_index
    df = ivf_search_index(_ivf_index(sf_dir), _query_vec(sf_dir), k=10,
                          nprobe=4).to_pandas()
    df["cosine"] = df["cosine"].round(6)
    return df.reset_index(drop=True)


def topk_cosine_ivf_full_probe(sf_dir: str) -> pd.DataFrame:
    """IVF at ``nprobe == n_centroids``: every list is probed, so the
    index path (train → assign → partitioned write → pruned read → top-k)
    must equal brute force exactly — SQL-checkable (TOPK_COSINE_SQL)."""
    from .ops.similarity import ivf_search_index
    df = ivf_search_index(_ivf_index(sf_dir), _query_vec(sf_dir), k=10,
                          nprobe=_IVF_N_CENTROIDS).to_pandas()
    df["cosine"] = df["cosine"].round(6)
    return df.reset_index(drop=True)


def _ivfpq_index(sf_dir: str) -> str:
    """Build-once IVF-PQ index (ops/similarity.build_ivfpq_index): coarse
    quantizer + 4×16-centroid PQ codebooks (seeded from vecs 0..15),
    codes written alongside the vectors, hive-partitioned by
    centroid_id. Cached under /tmp keyed on sf tag + row count."""
    from .ops.similarity import build_ivfpq_index
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    n_rows = pq.ParquetFile(_t(sf_dir, "embeddings")).metadata.num_rows
    cache = f"/tmp/wtes_cache/ivfpq-{tag}-{n_rows}-c{_IVF_N_CENTROIDS}"
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil as _shutil
        _shutil.rmtree(cache, ignore_errors=True)
        init_t = pq.read_table(_t(sf_dir, "embeddings"),
                               columns=["vec_id", "embedding"],
                               filters=[("vec_id", "<", 16)]) \
            .sort_by("vec_id")
        init = np.stack([np.asarray(v, dtype=np.float64)
                         for v in init_t["embedding"].to_pylist()])
        ds = _read_pq(_t(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
        build_ivfpq_index(ds, cache, init, n_centroids=_IVF_N_CENTROIDS,
                          m=4)
        with open(marker, "w", encoding="utf-8") as f:
            f.write("ok")
    return cache


def topk_cosine_ivfpq(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ ANN: pruned read of the probed lists, asymmetric-distance
    shortlist over the m-byte CODES column only, exact re-rank of the
    shortlist. Rows-only check (recall < 1 by design at nprobe=4 /
    shortlist=100); the full-probe/full-rerank variant below is the
    hash-checked exactness witness."""
    from .ops.similarity import ivfpq_search_index
    df = ivfpq_search_index(_ivfpq_index(sf_dir), _query_vec(sf_dir),
                            k=10, nprobe=4, shortlist=100).to_pandas()
    df["cosine"] = df["cosine"].round(6)
    return df.reset_index(drop=True)


def topk_cosine_ivfpq_full_probe(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ at ``nprobe == n_centroids`` and ``shortlist == corpus``:
    every list is probed and every candidate re-ranks exactly, so the
    composed index path (coarse train → PQ codebook train → encode →
    partitioned write → pruned read → ADC shortlist → exact re-rank)
    must equal brute force exactly — SQL-checkable (TOPK_COSINE_SQL)."""
    from .ops.similarity import ivfpq_search_index
    n_rows = pq.ParquetFile(_t(sf_dir, "embeddings")).metadata.num_rows
    df = ivfpq_search_index(_ivfpq_index(sf_dir), _query_vec(sf_dir),
                            k=10, nprobe=_IVF_N_CENTROIDS,
                            shortlist=n_rows).to_pandas()
    df["cosine"] = df["cosine"].round(6)
    return df.reset_index(drop=True)


_IVF_RECALL_K = 10
_IVF_RECALL_NPROBE = 2


def ivf_recall_at_k(sf_dir: str) -> pd.DataFrame:
    """Recall@10 of IVF probing at a REAL operating point (nprobe=2 of 4
    lists) vs exact brute force — the quantizer-regression witness the
    full-probe identities can't provide (VERDICT r4 #6).

    The coarse quantizer here is the SQL-expressible one — full-corpus
    Lloyd's seeded with vecs 0..k-1 (ops/similarity.kmeans_lloyd, the same
    machinery the kmeans oracles pin) — NOT train_ivf_centroids' sampled
    RandomState trainer, precisely so the ENTIRE operating point (train →
    assign → probe ranking → in-list top-k → recall) is one generated
    CTE-chain oracle. One extra streaming pass after Lloyd's: each block
    emits its top-k survivors for BOTH arms (brute / probed), the driver
    finish is bounded by blocks × 2k rows."""
    from .ops.similarity import _as_matrix, kmeans_lloyd
    init_t = pq.read_table(_t(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "<", _KM_K)]) \
        .sort_by("vec_id")
    init = np.stack([np.asarray(v, dtype=np.float64)
                     for v in init_t["embedding"].to_pylist()])
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    _assign, cents = kmeans_lloyd(ds, init, iterations=_KM_ITERS)
    cc = (cents * cents).sum(axis=1)
    q = _query_vec(sf_dir)
    qn = float(np.linalg.norm(q))
    # probe ranking: expanded euclidean (‖c‖² − 2 q·c — ‖q‖² is
    # rank-invariant), ties → lowest centroid id (lexsort)
    cent_d = cc - 2.0 * (cents @ q)
    order = np.lexsort((np.arange(len(cents)), cent_d))
    probes = set(int(i) for i in order[:_IVF_RECALL_NPROBE])
    k = _IVF_RECALL_K

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"arm": pd.Series([], dtype="object"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="float64")})
        mat = _as_matrix(batch["embedding"]).astype(np.float64)
        ids = batch["vec_id"].to_numpy()
        lab = (-2.0 * (mat @ cents.T) + cc[None, :]).argmin(axis=1)
        cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * qn)
        out = {"arm": [], "vec_id": [], "c": []}
        for arm, mask in (("brute", np.ones(len(ids), dtype=bool)),
                          ("ivf", np.isin(lab, list(probes)))):
            mi, mc = ids[mask], cos[mask]
            top = np.lexsort((mi, -mc))[:k]
            out["arm"].extend([arm] * len(top))
            out["vec_id"].extend(mi[top])
            out["c"].extend(mc[top])
        return pd.DataFrame(out)

    surv = ds.map_batches(block_topk, batch_format="pandas").to_pandas()
    sets = {}
    for arm, grp in surv.groupby("arm"):
        grp = grp.sort_values(["c", "vec_id"], ascending=[False, True])
        sets[arm] = set(grp["vec_id"].head(k).tolist())
    hits = len(sets.get("brute", set()) & sets.get("ivf", set()))
    return pd.DataFrame({
        "k": pd.Series([k], dtype="int64"),
        "nprobe": pd.Series([_IVF_RECALL_NPROBE], dtype="int64"),
        "n_centroids": pd.Series([_KM_K], dtype="int64"),
        "hits": pd.Series([hits], dtype="int64"),
        "recall": [round(hits / k, 6)]})


def _ivf_recall_sql() -> str:
    """Generated oracle: the kmeans CTE chain (same k/iters as the Ray
    side) with a probe-rank + two-ROW_NUMBER-top-k + intersection tail."""
    cd_rows = "\n    UNION ALL ".join(
        f"SELECT {i} AS cid, list_inner_product({{c{i}}}, {{c{i}}})"
        f" - 2 * list_inner_product((SELECT qe FROM q), {{c{i}}}) AS d"
        for i in range(_KM_K))
    tail = f""", q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
       FROM embeddings WHERE vec_id = 0),
cd AS ({cd_rows}),
probes AS (SELECT cid FROM
             (SELECT cid, ROW_NUMBER() OVER (ORDER BY d, cid) AS rn
              FROM cd) WHERE rn <= {_IVF_RECALL_NPROBE}),
scored AS (SELECT vec_id, cluster,
                  list_cosine_similarity(e, (SELECT qe FROM q)) AS c
           FROM {{af}}),
brute AS (SELECT vec_id FROM
            (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY c DESC, vec_id)
                    AS rn FROM scored) WHERE rn <= {_IVF_RECALL_K}),
ivf AS (SELECT vec_id FROM
          (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY c DESC, vec_id)
                  AS rn FROM scored
           WHERE cluster IN (SELECT cid FROM probes))
        WHERE rn <= {_IVF_RECALL_K}),
hit AS (SELECT COUNT(*) AS h FROM ivf WHERE vec_id IN
          (SELECT vec_id FROM brute))
SELECT CAST({_IVF_RECALL_K} AS BIGINT) AS k,
       CAST({_IVF_RECALL_NPROBE} AS BIGINT) AS nprobe,
       CAST({_KM_K} AS BIGINT) AS n_centroids,
       CAST(h AS BIGINT) AS hits,
       ROUND(h / {_IVF_RECALL_K}.0, 6) AS recall
FROM hit"""
    return _kmeans_sql(final_select=tail)


def embedding_label_count(sf_dir: str) -> pd.DataFrame:
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["label"])
    df = ds.groupby("label").aggregate(Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("label").reset_index(drop=True)


EMB_LABEL_SQL = "SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label ORDER BY label"


# ---------------------------------------------------------------------------
# Extraction flagship (the engine's reason to exist) — non-SQL, rows-only
# ---------------------------------------------------------------------------

def _code_fingerprint() -> str:
    """Cache key tied to extraction SEMANTICS: the md5 of the stored golden
    outputs (tests/golden/extracted.json). Any intentional semantics change
    regenerates the goldens → new fingerprint → stale /tmp extraction
    caches are abandoned automatically."""
    import hashlib
    golden = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "extracted.json")
    try:
        with open(golden, "rb") as f:
            return hashlib.md5(f.read()).hexdigest()[:8]
    except OSError:
        return "nogolden"


def _synth_cache_dir(sf_dir: str, n_docs: int) -> str:
    from .pipeline import LAYOUT_VERSION
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return (f"/tmp/wtes_cache/{tag}-{n_docs}-{_code_fingerprint()}"
            f"-v{LAYOUT_VERSION}")


def _synthetic_docs(n_docs: int):
    from .gen import generate_batch

    def gen(t: pa.Table) -> pa.Table:
        return generate_batch(t.column("id").to_pylist(),
                              giant_fraction=0.02)

    return rd.range(n_docs, override_num_blocks=max(8, n_docs // 32)) \
             .map_batches(gen, batch_format="pyarrow")


def _extract_synthetic(sf_dir: str) -> "rd.Dataset":
    """Run the flagship extraction over deterministic synthetic interleaved
    docs (scaled off the sf documents row count), checkpointed under /tmp so
    the downstream queries reuse it (resume=True skips finished parts)."""
    from .pipeline import load_extracted, run_extract_pipeline
    n_docs = max(60, pq.ParquetFile(_t(sf_dir, "documents"))
                 .metadata.num_rows // 4)
    cache = _synth_cache_dir(sf_dir, n_docs)
    docs_path = os.path.join(cache, "docs.parquet")
    done_marker = os.path.join(cache, "_DOCS_COMPLETE")
    if not os.path.exists(done_marker):
        # completion marker: a crashed half-written generation must not be
        # treated as a valid corpus
        import shutil as _shutil
        _shutil.rmtree(docs_path, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        _synthetic_docs(n_docs).write_parquet(docs_path)
        with open(done_marker, "w", encoding="utf-8") as f:
            f.write("ok")
    out = os.path.join(cache, "extracted")
    run_extract_pipeline(docs_path, out, num_partitions=16, resume=True)
    return load_extracted(out)


def extract_spans_synthetic(sf_dir: str) -> pd.DataFrame:
    """Flagship summary: per-doc table/span/entity/relation counts from the
    full Ray pipeline over the interleaved (doc_id, spans) input."""
    ext = _extract_synthetic(sf_dir)
    df = ext.select_columns(["doc_id", "n_tables", "n_spans", "n_entities",
                             "n_relations"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def extract_relations_dedup(sf_dir: str) -> pd.DataFrame:
    """Downstream D6: deduped relation triples from the flagship output."""
    from .pipeline import dedup_relations, relations_dataset
    rels = dedup_relations(relations_dataset(_extract_synthetic(sf_dir)))
    df = rels.to_pandas()
    return df.sort_values(["s_name", "rel", "o_name"]).reset_index(drop=True)


def extract_nodes_fused(sf_dir: str) -> pd.DataFrame:
    """Downstream J1/A3: fused entity nodes from the flagship output."""
    from .pipeline import build_nodes, entities_dataset
    nodes = build_nodes(entities_dataset(_extract_synthetic(sf_dir)))
    df = nodes.to_pandas()
    df["props"] = df["props"].map(
        lambda m: "; ".join(f"{k}={v}" for k, v in sorted(dict(m).items())))
    return df.sort_values(["name", "url"]).reset_index(drop=True)


def neo4j_export_counts(sf_dir: str) -> pd.DataFrame:
    """Neo4j-admin bulk-import export (neo4j_io.py — the reference's live
    Neo4j sink, peronGraph.py:33-139, re-expressed as the batch artifact
    the real graph DB ingests): fused nodes + deduped triples from the
    flagship output render to header files + distributed CSV shards with
    endpoint closure. Pins the CSV shard row counts against the export
    manifest AND the endpoint-closure invariant (every relationship
    endpoint id exists in the node shards)."""
    import tempfile

    from .neo4j_io import export_neo4j_admin, read_export_csv
    from .pipeline import (build_nodes, dedup_relations, entities_dataset,
                           relations_dataset)

    ext = _extract_synthetic(sf_dir)
    nodes = build_nodes(entities_dataset(ext))
    edges = dedup_relations(relations_dataset(ext))
    out = tempfile.mkdtemp(prefix="neo4j_export_", dir="/tmp")
    man = export_neo4j_admin(nodes, edges, out)
    ndf = read_export_csv(os.path.join(out, "nodes"),
                          os.path.join(out, "nodes.header.csv"))
    rdf = read_export_csv(os.path.join(out, "relationships"),
                          os.path.join(out, "relationships.header.csv"))
    ids = set(ndf["url:ID"])
    closed = set(rdf[":START_ID"]).issubset(ids) \
        and set(rdf[":END_ID"]).issubset(ids)
    # self-asserting: a rows-only gate run must FAIL on contract breaks
    assert closed, "relationship endpoint missing from node shards"
    assert len(ndf) == man["nodes"] and len(rdf) == man["relationships"]
    return pd.DataFrame({
        "kind": ["nodes", "relationships"],
        "n_csv": [len(ndf), len(rdf)],
        "n_manifest": [man["nodes"], man["relationships"]],
        "endpoints_closed": [closed, closed]})


def extract_flagship_documents(sf_dir: str) -> pd.DataFrame:
    """Adapter path: run the extractor over the driver's plain-text
    documents table (each text wrapped as a single html span — FIXTURES.md
    §4); plain text yields empty span sequences, proving the quarantine-free
    pass-through."""
    from .pipeline import extract_chunks_batch
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def adapt(t: pa.Table) -> pa.Table:
        ids = [str(d) for d in t.column("doc_id").to_pylist()]
        spans = [[{"kind": "html", "text": txt or "", "media_ref": "",
                   "offset": 0}] for txt in t.column("text").to_pylist()]
        from .schema import SPAN_STRUCT
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
            "part": pa.array([0] * len(ids), pa.int32()),
            "chunk": pa.array([0] * len(ids), pa.int32()),
            "n_chunks": pa.array([1] * len(ids), pa.int32()),
        })

    out = ds.map_batches(adapt, batch_format="pyarrow") \
            .map_batches(extract_chunks_batch, batch_format="pyarrow",
                         batch_size=64)
    df = out.select_columns(["doc_id", "n_tables", "n_spans",
                             "error"]).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


# the invariant this adapter query exists to watch: plain text carries no
# tables, so every doc must pass through with zero spans and NO quarantine —
# a non-empty error or a phantom span on any doc breaks the value hash
EXTRACT_FLAGSHIP_SQL = """
SELECT doc_id, '' AS error,
       CAST(0 AS INTEGER) AS n_spans, CAST(0 AS INTEGER) AS n_tables
FROM documents ORDER BY doc_id
"""


def pdf_roundtrip_docs(sf_dir: str) -> pd.DataFrame:
    """PDF source+sink (north rule "PDF/layout parse"): render every
    documents row to a real PDF (catalog → page tree → FlateDecode content
    streams) and parse it back — xref-free object walk, /Kids page order,
    Tj text operators — inside one map_batches stage. The writer slices
    lines at fixed character boundaries, so reader output must equal the
    ORIGINAL text byte-for-byte; the oracle is the identity select, making
    the whole writer→reader composition value-hash-checked through
    distributed stages (pdf_io.py; unit tests cover TJ/hex/octal/nested
    page trees and the encrypted/filter quarantine gates)."""
    from .pdf_io import pdf_text, text_to_pdf

    def rt(batch: pa.Table) -> pa.Table:
        texts = [pdf_text(text_to_pdf(t or ""))
                 for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    df = ds.map_batches(rt, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


PDF_ROUNDTRIP_SQL = "SELECT doc_id, text FROM documents ORDER BY doc_id"


def jsonl_roundtrip_docs(sf_dir: str) -> pd.DataFrame:
    """JSONL source+sink: the interchange format every scraping/labeling
    stack emits. `Dataset.write_json` shards the corpus to JSON-lines
    files (one per block — the resumable layout), `read_json` streams
    them back; the oracle is the identity select, so the whole
    sink→source composition is value-hash-checked (including None text
    surviving as JSON null, and the lang/source payload columns)."""
    import tempfile
    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "text", "lang", "source"])
    out_dir = tempfile.mkdtemp(prefix="jsonl_rt_", dir="/tmp")
    ds.write_json(out_dir)
    back = rd.read_json(out_dir)
    df = back.to_pandas()[["doc_id", "text", "lang", "source"]]
    return df.sort_values("doc_id").reset_index(drop=True)


JSONL_ROUNDTRIP_SQL = ("SELECT doc_id, text, lang, source FROM documents "
                       "ORDER BY doc_id")


def csv_roundtrip_events(sf_dir: str) -> pd.DataFrame:
    """CSV source+sink (the reference's triple-CSV sink S9, generalized):
    `write_csv` shards a typed subset to CSV files, `read_csv` streams
    them back with type inference, and a per-type aggregate over the
    ROUNDTRIPPED data is value-checked against the same aggregate on the
    original table — so the sink→source composition (including float
    text round-tripping) is what the oracle pins."""
    import tempfile
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["event_id", "event_type", "value"])
    out_dir = tempfile.mkdtemp(prefix="csv_rt_", dir="/tmp")
    ds.write_csv(out_dir)
    back = rd.read_csv(out_dir)
    out = back.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value")).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


CSV_ROUNDTRIP_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def media_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing: synthetic payloads → cached-state decode →
    features. SQL-checkable: the synthetic header fields derive from
    md5 (ops.multimodal._md5_u64 ≡ DuckDB md5_number_lower), so the
    decode stage's structural output — per-doc width/height, ref naming,
    decode success — has a value-hash oracle; only the pixel bodies (and
    the histogram features computed from them) stay non-SQL."""
    from .ops.multimodal import media_feature_pipeline
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
    out = media_feature_pipeline(ds, concurrency=(1, 4))
    df = out.select_columns(["doc_id", "media_ref", "width", "height",
                             "channels", "decoded"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


MEDIA_FEATURES_SQL = """
SELECT doc_id,
       'img://' || doc_id || '.fake' AS media_ref,
       CAST(16 + md5_number_lower('42:img:' || doc_id) % 48 AS INTEGER)
         AS width,
       CAST(16 + (md5_number_lower('42:img:' || doc_id) // 48) % 48
            AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       TRUE AS decoded
FROM documents ORDER BY doc_id
"""


def media_video_frames(sf_dir: str) -> pd.DataFrame:
    """Multimodal frame pipeline: synthetic video → frame-sample → resize →
    decode. One row per sampled frame; all frames resized to 8×8 and
    decodable. SQL-checkable: the md5-derived frame counts make the
    sampler's structural output (which frames exist per doc, their refs
    and post-resize metadata) reproducible as a range() unnest."""
    from .ops.multimodal import video_frame_pipeline
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
    out = video_frame_pipeline(ds, stride=4, target=8, concurrency=(1, 4))
    df = out.to_pandas()
    return df.sort_values(["doc_id", "frame_index"]).reset_index(drop=True)


MEDIA_VIDEO_FRAMES_SQL = """
WITH v AS (
  SELECT doc_id,
         CAST(4 + md5_number_lower('42:vid:' || doc_id) % 13 AS BIGINT)
           AS n_frames
  FROM documents)
SELECT doc_id,
       'vid://' || doc_id || '.fake#f' || i AS media_ref,
       CAST(i AS INTEGER) AS frame_index,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       TRUE AS decoded,
       TRUE AS resized
FROM v, UNNEST(range(0, n_frames, 4)) AS t(i)
ORDER BY doc_id, frame_index
"""


def media_audio_features(sf_dir: str) -> pd.DataFrame:
    """Audio modality plumbing: synthetic PCM payloads → actor-pool
    features (rows-only: RMS/ZCR depend on the seeded PCM bodies; the
    STRUCTURAL headers are pinned by ``media_audio_headers``)."""
    from .ops.multimodal import audio_feature_pipeline
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
    out = audio_feature_pipeline(ds, concurrency=(1, 4))
    df = out.to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def media_audio_headers(sf_dir: str) -> pd.DataFrame:
    """Audio synth→parse structural round-trip: sample rate and count
    recovered from the packed payload headers. SQL-checkable because the
    header fields are md5-derived (the image/video convention); duration
    floats stay in the rows-only query (n/16000 rounds differently
    across engines at the 7th decimal — ints don't)."""
    from .ops.multimodal import _unpack_audio_header, synth_audio_batch
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])

    def headers(t: pa.Table) -> pa.Table:
        srs, ns = zip(*(_unpack_audio_header(p)
                        for p in t.column("payload").to_pylist()))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "sr": pa.array(srs, pa.int64()),
            "n_samples": pa.array(ns, pa.int64())})

    out = ds.map_batches(synth_audio_batch, batch_format="pyarrow") \
            .map_batches(headers, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


MEDIA_AUDIO_HEADERS_SQL = """
SELECT doc_id,
       CAST(16000 AS BIGINT) AS sr,
       CAST(4000 + md5_number_lower('42:aud:' || doc_id) % 12000
            AS BIGINT) AS n_samples
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Corpus curation (ops/curate.py): deterministic sampling / splits, quotas,
# vocabulary, decontamination, token-budget packing. Every op here is
# content-addressed (md5 ≡ DuckDB md5_number_lower) or window-expressible,
# so ALL queries in this family carry full value-hash oracles.
# ---------------------------------------------------------------------------

def sample_docs_hash(sf_dir: str) -> pd.DataFrame:
    """Deterministic 5% corpus sample: keep docs whose md5 key hash lands
    in the first 50/1000 of the hash space — reproducible across runs,
    repartitions and resumes (no RNG), and embarrassingly parallel."""
    from .ops.curate import hash_sample
    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "lang", "n_chars"])
    out = hash_sample(ds, permille=50, salt="s1").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SAMPLE_DOCS_HASH_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE md5_number_lower('s1:' || CAST(doc_id AS VARCHAR)) % 1000 < 50
ORDER BY doc_id
"""


def split_assign_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test assignment (900/50/50 permille) —
    a pure function of (key, salt), so later data never moves an
    existing row between splits."""
    from .ops.curate import hash_split
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
    out = hash_split(ds, salt="split").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SPLIT_ASSIGN_SQL = """
SELECT doc_id,
       CASE WHEN md5_number_lower('split:' || CAST(doc_id AS VARCHAR))
                 % 1000 < 900 THEN 'train'
            WHEN md5_number_lower('split:' || CAST(doc_id AS VARCHAR))
                 % 1000 < 950 THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""


def quota_cap_docs(sf_dir: str) -> pd.DataFrame:
    """Data-mixing quota: the 20 longest documents per language
    ((n_chars desc, doc_id asc) total order) via the bucketed per-group
    exchange — the ROW_NUMBER window at corpus scale."""
    from .ops.curate import quota_cap
    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "lang", "n_chars"])
    out = quota_cap(ds, group_col="lang", score_col="n_chars",
                    n=20).to_pandas()
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True) \
              [["doc_id", "lang", "n_chars"]]


QUOTA_CAP_SQL = """
SELECT doc_id, lang, n_chars
FROM (SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
WHERE rn <= 20
ORDER BY lang, doc_id
"""


def stratified_sample_docs(sf_dir: str) -> pd.DataFrame:
    """25 documents per language, chosen by md5-hash rank inside the
    group — a reproducible 'random' stratified sample the oracle can
    recompute exactly."""
    from .ops.curate import stratified_sample
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang"])
    out = stratified_sample(ds, group_col="lang", n=25,
                            salt="strat").to_pandas()
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang
FROM (SELECT doc_id, lang,
             ROW_NUMBER() OVER (
                 PARTITION BY lang
                 ORDER BY md5_number_lower(
                     'strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
WHERE rn <= 25
ORDER BY lang, doc_id
"""


def vocab_top_terms(sf_dir: str) -> pd.DataFrame:
    """Top-50 vocabulary by global term frequency with document
    frequency and idf = ln(N/df). Counts pre-reduce inside every batch
    (terms × blocks rows enter the exchange, never per-occurrence rows)
    and the top-k finish is per-block local heads + a bounded driver
    merge. N comes from the parquet footer, no extra pass."""
    from .ops.curate import top_terms
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = top_terms(ds, k=50, n_docs=_n_rows(sf_dir, "documents"))
    out["tf"] = out["tf"].astype(np.int64)
    out["df"] = out["df"].astype(np.int64)
    return out.reset_index(drop=True)


VOCAB_TOP_TERMS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
stats AS (
  SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
  FROM toks GROUP BY term)
SELECT term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       ROUND(LN((SELECT COUNT(*) FROM documents) * 1.0 / df), 6) AS idf
FROM stats
ORDER BY tf DESC, term
LIMIT 50
"""


def posting_lists_docs(sf_dir: str) -> pd.DataFrame:
    """Inverted-index slice: the 5 most frequent terms → their first 50
    containing doc ids (id order, comma-joined). Term selection reuses
    the vocabulary pass; the posting build ships only (term, doc) pairs
    for the broadcast 5-term set, with per-block heads bounding what
    reaches the driver."""
    from .ops.curate import posting_lists, top_terms
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    terms = top_terms(ds, k=5,
                      n_docs=_n_rows(sf_dir, "documents"))["term"]
    out = posting_lists(ds, list(terms), cap=50)
    out["term"] = out["term"].astype(str)
    return out.sort_values("term").reset_index(drop=True)


POSTING_LISTS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
top5 AS (
  SELECT term FROM toks GROUP BY term
  ORDER BY COUNT(*) DESC, term LIMIT 5),
posting AS (
  SELECT t.term, t.doc_id
  FROM toks t JOIN top5 USING (term)
  GROUP BY t.term, t.doc_id)
SELECT term,
       array_to_string(list_sort(list(doc_id))[1:50], ',') AS docs
FROM posting
GROUP BY term
ORDER BY term
"""


def decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: ~2.7% of docs (hash-selected — the
    stand-in 'benchmark') contribute their first 8-token word gram;
    every document is then flagged iff its token stream contains ANY
    benchmark gram as a consecutive run. The gram set is distilled
    distributed (a filtered, truncated map — only grams reach the
    driver), broadcast once via ray.put, and matched exactly (token
    windows, no hashing), so the SQL substring formulation with
    boundary guards is equivalent."""
    from .ops.curate import decontaminate, hash_sample, _WORD_RE
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def first_gram(batch: pd.DataFrame) -> pd.DataFrame:
        grams = []
        for t in batch["text"].fillna(""):
            w = _WORD_RE.findall(t.lower())
            if len(w) >= 8:
                grams.append(" ".join(w[:8]))
        return pd.DataFrame({"gram": pd.Series(grams, dtype="string")})

    bench = hash_sample(ds, permille=27, salt="bench") \
        .map_batches(first_gram, batch_format="pandas").to_pandas()
    out = decontaminate(ds, list(bench["gram"]), n=8).to_pandas()
    out["contaminated"] = out["contaminated"].astype(np.int64)
    return out[["doc_id", "contaminated"]].sort_values("doc_id") \
                                          .reset_index(drop=True)


DECONTAMINATE_SQL = """
WITH b AS (
  SELECT array_to_string(
           regexp_extract_all(lower(text), '[a-z0-9_]+')[1:8], ' ') AS gram
  FROM documents
  WHERE md5_number_lower('bench:' || CAST(doc_id AS VARCHAR)) % 1000 < 27
    AND len(regexp_extract_all(lower(text), '[a-z0-9_]+')) >= 8),
t AS (
  SELECT doc_id,
         ' ' || array_to_string(
             regexp_extract_all(lower(text), '[a-z0-9_]+'), ' ') || ' '
         AS ts
  FROM documents)
SELECT doc_id,
       CAST(EXISTS(SELECT 1 FROM b
                   WHERE contains(t.ts, ' ' || b.gram || ' '))
            AS BIGINT) AS contaminated
FROM t
ORDER BY doc_id
"""


def mixture_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Data-mixing: language-dependent keep rates (en 300‰ / de 100‰ /
    fr 50‰, everything else 0) composed with the content-addressed key
    hash — the deterministic sampler a weighted corpus mixture needs."""
    from .ops.curate import mixture_sample
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang"])
    out = mixture_sample(ds, {"en": 300, "de": 100, "fr": 50},
                         group_col="lang", salt="mix").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


MIXTURE_SAMPLE_SQL = """
SELECT doc_id, lang
FROM documents
WHERE md5_number_lower('mix:' || CAST(doc_id AS VARCHAR)) % 1000 <
      CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 100
                WHEN 'fr' THEN 50 ELSE 0 END
ORDER BY doc_id
"""


def leakage_safe_split_docs(sf_dir: str) -> pd.DataFrame:
    """Leakage-safe train/val/test assignment: exact-duplicate documents
    share a cluster (min doc_id over identical text — only (md5, id)
    pairs shuffle) and the split keys on the CLUSTER, so duplicated text
    can never straddle the train/eval boundary."""
    from .ops.curate import cluster_consistent_split
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = cluster_consistent_split(ds, salt="lsplit").to_pandas()
    return out[["doc_id", "cluster", "split"]].sort_values("doc_id") \
                                              .reset_index(drop=True)


LEAKAGE_SAFE_SPLIT_SQL = """
WITH c AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY text) AS cluster
  FROM documents)
SELECT doc_id, cluster,
       CASE WHEN md5_number_lower('lsplit:' || CAST(cluster AS VARCHAR))
                 % 1000 < 900 THEN 'train'
            WHEN md5_number_lower('lsplit:' || CAST(cluster AS VARCHAR))
                 % 1000 < 950 THEN 'val'
            ELSE 'test' END AS split
FROM c
ORDER BY doc_id
"""


def hll_registers_users(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog registers over events.user_id — the full 2^12-bucket
    register table, EXACT-integer oracle-checked (ranks via bit_length
    on both sides: ``length(bin(rem))`` in DuckDB; no float log2
    anywhere). Each batch pre-reduces to per-bucket maxima, the
    exchange is a ≤4096-group max."""
    from .ops.sketch import hll_registers
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])
    out = hll_registers(ds, "user_id").to_pandas()
    out["bucket"] = out["bucket"].astype(np.int64)
    out["register"] = out["register"].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


HLL_REGISTERS_SQL = """
WITH h AS (
  SELECT DISTINCT md5_number_lower('hll:' || CAST(user_id AS VARCHAR)) AS h
  FROM events),
r AS (
  SELECT CAST(h >> 52 AS BIGINT) AS bucket,
         CASE WHEN (h & ((1::UBIGINT << 52) - 1)) = 0 THEN 53
              ELSE 53 - length(bin(h & ((1::UBIGINT << 52) - 1)))
         END AS rank
  FROM h)
SELECT bucket, CAST(MAX(rank) AS BIGINT) AS register
FROM r GROUP BY bucket ORDER BY bucket
"""


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """HLL estimate next to the exact distinct count. The estimate is a
    driver-side float over the (oracle-pinned) integer registers; the
    oracle recomputes the IDENTICAL register→estimate arithmetic in SQL
    (same alpha, same linear-counting branch), both rounded to 4dp."""
    from .ops.sketch import approx_distinct
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    exact = len(ds.unique("user_id"))
    return pd.DataFrame({
        "approx_users": pd.Series([round(est, 4)], dtype=float),
        "exact_users": pd.Series([exact], dtype=np.int64)})


APPROX_DISTINCT_SQL = """
WITH h AS (
  SELECT DISTINCT md5_number_lower('hll:' || CAST(user_id AS VARCHAR)) AS h
  FROM events),
r AS (
  SELECT CAST(h >> 52 AS BIGINT) AS bucket,
         CASE WHEN (h & ((1::UBIGINT << 52) - 1)) = 0 THEN 53
              ELSE 53 - length(bin(h & ((1::UBIGINT << 52) - 1)))
         END AS rank
  FROM h),
regs AS (SELECT bucket, MAX(rank) AS register FROM r GROUP BY bucket),
s AS (
  SELECT SUM(POW(2.0, -register)) + (4096 - COUNT(*)) AS denom,
         4096 - COUNT(*) AS zeros
  FROM regs),
est AS (
  SELECT CASE WHEN (0.7213 / (1 + 1.079 / 4096)) * 4096.0 * 4096.0 / denom
                   <= 2.5 * 4096 AND zeros > 0
              THEN 4096.0 * LN(4096.0 / zeros)
              ELSE (0.7213 / (1 + 1.079 / 4096)) * 4096.0 * 4096.0 / denom
         END AS e
  FROM s)
SELECT ROUND((SELECT e FROM est), 4) AS approx_users,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
FROM events
"""


def approx_users_by_type(sf_dir: str) -> pd.DataFrame:
    """HLL as a grouped aggregate: per event_type approximate distinct
    users (ops/sketch.grouped_approx_distinct) next to the exact count —
    the approx-COUNT-DISTINCT-GROUP-BY shape. Registers reduce per
    (group, bucket) inside blocks, one groupby-max finishes; the oracle
    recomputes the identical register AND estimate arithmetic per group
    in SQL (same alpha, same linear-counting branch)."""
    from ray.data.aggregate import Count as _Count

    from .ops.sketch import grouped_approx_distinct
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "user_id"])
    approx = grouped_approx_distinct(ds, "event_type", "user_id")
    approx["approx"] = approx["approx"].round(4)
    exact = ds.groupby(["event_type", "user_id"]).aggregate(_Count()) \
        .groupby("event_type").aggregate(_Count(alias_name="exact_users")) \
        .to_pandas()[["event_type", "exact_users"]]
    out = approx.merge(exact, on="event_type")
    out["exact_users"] = out["exact_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


APPROX_BY_TYPE_SQL = """
WITH h AS (
  SELECT DISTINCT event_type,
         md5_number_lower('hll:' || CAST(user_id AS VARCHAR)) AS h
  FROM events),
r AS (
  SELECT event_type, CAST(h >> 52 AS BIGINT) AS bucket,
         CASE WHEN (h & ((1::UBIGINT << 52) - 1)) = 0 THEN 53
              ELSE 53 - length(bin(h & ((1::UBIGINT << 52) - 1)))
         END AS rank
  FROM h),
regs AS (SELECT event_type, bucket, MAX(rank) AS register
         FROM r GROUP BY event_type, bucket),
s AS (
  SELECT event_type,
         SUM(POW(2.0, -register)) + (4096 - COUNT(*)) AS denom,
         4096 - COUNT(*) AS zeros
  FROM regs GROUP BY event_type),
est AS (
  SELECT event_type,
         CASE WHEN (0.7213 / (1 + 1.079 / 4096)) * 4096.0 * 4096.0 / denom
                   <= 2.5 * 4096 AND zeros > 0
              THEN 4096.0 * LN(4096.0 / zeros)
              ELSE (0.7213 / (1 + 1.079 / 4096)) * 4096.0 * 4096.0 / denom
         END AS e
  FROM s),
x AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
             AS exact_users
      FROM events GROUP BY event_type)
SELECT est.event_type, ROUND(est.e, 4) AS approx, x.exact_users
FROM est JOIN x ON x.event_type = est.event_type
ORDER BY est.event_type
"""


def cms_counters_users(sf_dir: str) -> pd.DataFrame:
    """Count-min sketch counters over events.user_id (width 2048 ×
    depth 4) — EXACT occurrence counts per (row, bucket), value-checked
    against the straightforward hash-and-count SQL. Per-batch partials
    bound the exchange at depth × width rows per block."""
    from .ops.sketch import cms_counters
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])
    out = cms_counters(ds, "user_id").to_pandas()
    for c in ("d", "bucket", "cnt"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["d", "bucket"]).reset_index(drop=True)


CMS_COUNTERS_SQL = """
SELECT CAST(d AS BIGINT) AS d,
       CAST(md5_number_lower('cms' || d || ':' || CAST(user_id AS VARCHAR))
            % 2048 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM events, UNNEST(range(4)) AS t(d)
GROUP BY 1, 2
ORDER BY d, bucket
"""


def bloom_bits_users(sf_dir: str) -> pd.DataFrame:
    """Distributed Bloom-filter build over events.user_id (the
    reference's ST2 Bloom dedup mechanism, re-expressed exact-checkable):
    the distinct set-bit positions under 4 salted hash functions."""
    from .ops.sketch import bloom_bits
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])
    out = bloom_bits(ds, "user_id").to_pandas()
    out["bit"] = out["bit"].astype(np.int64)
    return out.sort_values("bit").reset_index(drop=True)


BLOOM_BITS_SQL = """
SELECT DISTINCT
       CAST(md5_number_lower('bloom' || i || ':' || CAST(user_id AS VARCHAR))
            % 32768 AS BIGINT) AS bit
FROM events, UNNEST(range(4)) AS t(i)
ORDER BY bit
"""


def heavy_hitters_users(sf_dir: str) -> pd.DataFrame:
    """EXACT heavy hitters (users with ≥ 80 events) in two bounded
    passes (ops/sketch.py:heavy_hitters): pass 1 merges per-block
    Misra-Gries summaries — ≤ k rows per block enter the exchange, with
    the mergeable-summaries superset guarantee (every key with true
    count > E survives truncation); pass 2 broadcasts the pruned
    candidate set once and recounts ONLY those keys exactly. The full
    key space never shuffles, yet the output is exact — hence the plain
    GROUP BY ... HAVING oracle."""
    from .ops.sketch import heavy_hitters
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])
    return heavy_hitters(ds, "user_id", threshold=80)


HEAVY_HITTERS_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id HAVING COUNT(*) >= 80
ORDER BY user_id
"""


def priority_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Weighted corpus sampling (Duffield–Lund–Thorup priority
    sampling) of 100 docs by n_chars weight, with the unbiased
    Horvitz-Thompson weight est_w = max(w, τ). All emitted doubles are
    BIT-IDENTICAL to the SQL oracle — every step is one correctly-
    rounded IEEE op on both sides (see ops/curate.py:priority_sample),
    the same unrounded-doubles parity class as ngram_jaccard_planted."""
    from .ops.curate import priority_sample
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    return priority_sample(ds, 100, weight_col="n_chars",
                           key_col="doc_id", salt="ps1")


PRIORITY_SAMPLE_SQL = """
WITH p AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
         CAST(n_chars AS DOUBLE) /
           ((CAST(md5_number_lower('ps1:' || CAST(doc_id AS VARCHAR))
                  AS DOUBLE) + 1.0) * 5.421010862427522e-20) AS priority
  FROM documents),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rn
      FROM p)
SELECT doc_id, w, priority,
       CASE WHEN w >= t.tau THEN w ELSE t.tau END AS est_w
FROM r, (SELECT COALESCE(MAX(priority), 0.0) AS tau FROM r
         WHERE rn = 101) t
WHERE rn <= 100 ORDER BY doc_id
"""


def events_cube(sf_dir: str) -> pd.DataFrame:
    """One-pass grouping-sets aggregate (CUBE over event_type ×
    hour-of-day): each block reduces to its (type, hod) partial counts
    and derives ALL FOUR grouping sets locally, so the exchange carries
    ≤ 4·|types|·24 rows per block regardless of corpus size; the global
    groupby just sums. Sentinels '(all)' / -1 encode rolled-up
    dimensions (COALESCE on the SQL side) — no second pass, no second
    shuffle for the rollups."""
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        base = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "hod": (us // 3_600_000_000) % 24,
            "value": t["value"].to_numpy(zero_copy_only=False)})
        g = base.groupby(["event_type", "hod"], as_index=False) \
            .agg(n=("value", "size"), sum_value=("value", "sum"))
        gt = g.groupby("event_type", as_index=False)[["n", "sum_value"]] \
            .sum()
        gt["hod"] = np.int64(-1)
        gh = g.groupby("hod", as_index=False)[["n", "sum_value"]].sum()
        gh["event_type"] = "(all)"
        ga = pd.DataFrame({"event_type": ["(all)"], "hod": np.int64(-1),
                           "n": [g["n"].sum()],
                           "sum_value": [g["sum_value"].sum()]})
        out = pd.concat([g, gt, gh, ga], ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return _arrow(out[["event_type", "hod", "n", "sum_value"]])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hod"]).aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_value", alias_name="sum_value"))
    df = agg.to_pandas()
    df["n"] = df["n"].astype(np.int64)
    df["sum_value"] = df["sum_value"].round(2)
    return df.sort_values(["event_type", "hod"]).reset_index(drop=True)


EVENTS_CUBE_SQL = """
SELECT COALESCE(event_type, '(all)') AS event_type,
       COALESCE(hod, -1) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM (SELECT event_type,
             CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
             value
      FROM events)
GROUP BY GROUPING SETS ((event_type, hod), (event_type), (hod), ())
ORDER BY event_type, hod
"""


def bm25_topk_docs(sf_dir: str) -> pd.DataFrame:
    """BM25 top-10 retrieval for the query {hash, join, window}
    (ops/curate.py:bm25_topk): pass 1 reduces each block to
    |terms|+2 stat rows (df / N / Σdl), pass 2 ships the few idf
    floats in the closure, scores per block and emits local top-k
    heads only. Scores are rounded to 6dp BEFORE ranking on both
    sides, so the cut is ULP-stable and fully SQL-checkable."""
    from .ops.curate import bm25_topk
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return bm25_topk(ds, ["hash", "join", "window"], 10)


BM25_TOPK_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
       FROM toks GROUP BY doc_id),
st AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
              CAST((SELECT COUNT(*) FROM toks) AS DOUBLE)
                / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                AS avgdl),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM toks WHERE term IN ('hash', 'join', 'window')
       GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id,
              ROUND(SUM(ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                        * tf.tf * (1.2 + 1.0)
                        / (tf.tf + 1.2 * (1.0 - 0.75
                                          + 0.75 * dl.dl / st.avgdl))),
                    6) AS score
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id), st
       GROUP BY tf.doc_id)
SELECT doc_id, score
FROM (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 10)
ORDER BY doc_id
"""


def streaming_dedup_count(sf_dir: str) -> pd.DataFrame:
    """Streaming first-seen dedup through the sharded shared-index
    actors (ops/stream.py — the raw-actor escape hatch for state the
    Dataset API can't express). WHICH representative survives is
    arrival-order-dependent, but the survivor COUNT is exactly the
    distinct-text count — the deterministic projection the oracle
    checks. Actors are shut down before returning (driver contract:
    no leaked state between queries)."""
    from .ops.stream import StreamingDeduper
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    dd = StreamingDeduper(num_shards=4)
    try:
        n = dd.run(ds).count()
        n_idx = dd.index_size()
    finally:
        dd.shutdown()
    assert n == n_idx
    return pd.DataFrame({"n_unique": pd.Series([n], dtype=np.int64)})


STREAMING_DEDUP_COUNT_SQL = """
SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique FROM documents
"""


def split_export_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Partitioned training-data export: hash_split → hive-partitioned
    parquet (one directory per split — the resumable layout: a re-run
    re-writes per partition, and a trainer reads ONLY its split) →
    pruned read-back of the 'val' directory alone. The oracle recomputes
    the val membership from the split function — so the sink→source
    round trip itself is what's being value-checked."""
    import tempfile

    from .ops.curate import hash_split
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    out_dir = tempfile.mkdtemp(prefix="wtes_split_export_")
    hash_split(ds, salt="exp").write_parquet(
        out_dir, partition_cols=["split"])
    back = rd.read_parquet(os.path.join(out_dir, "split=val"))
    df = back.to_pandas()[["doc_id", "n_chars"]]
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    return df.sort_values("doc_id").reset_index(drop=True)


SPLIT_EXPORT_SQL = """
SELECT doc_id, n_chars
FROM documents
WHERE md5_number_lower('exp:' || CAST(doc_id AS VARCHAR)) % 1000
      BETWEEN 900 AND 949
ORDER BY doc_id
"""


def range_export_pruned(sf_dir: str) -> pd.DataFrame:
    """Time-range-clustered export + layout-level pruning (the lakehouse
    zone-map story): lineitem exports hive-partitioned by SHIP YEAR
    (one directory per year — the layout a 100 TB fact table actually
    uses), then a 1996–1997 revenue query reads ONLY those two year
    directories; files outside the probed range never open. Because the
    predicate aligns with the partition key there is no residual filter
    — the oracle's WHERE clause is implemented ENTIRELY by directory
    selection, which is what gets value-checked."""
    import shutil
    import tempfile

    def tag_year(t: pa.Table) -> pa.Table:
        return t.append_column(
            "y", pc.cast(pc.year(t["l_shipdate"]), pa.int64()))

    ds = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_shipdate", "l_extendedprice", "l_discount"])
    out_dir = tempfile.mkdtemp(prefix="wtes_range_export_")
    ds.map_batches(tag_year, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["y"])

    # Ray read_parquet treats LIST elements as files — expand each probed
    # partition dir to its files (the ivf_search_index pattern)
    probe = [os.path.join(out_dir, d, f)
             for d in sorted(os.listdir(out_dir))
             if d in ("y=1996", "y=1997")
             for f in sorted(os.listdir(os.path.join(out_dir, d)))]
    back = rd.read_parquet(probe)

    def rev_partial(t: pa.Table) -> pa.Table:
        v = (t["l_extendedprice"].to_numpy()
             * (1.0 - t["l_discount"].to_numpy()))
        return pa.table({"revenue": pa.array([float(v.sum())],
                                             pa.float64())})

    tot = back.map_batches(rev_partial, batch_format="pyarrow") \
        .aggregate(Sum("revenue", alias_name="revenue"))["revenue"]
    shutil.rmtree(out_dir, ignore_errors=True)
    return pd.DataFrame({"revenue": [round(tot, 2)]})


RANGE_EXPORT_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
"""


def quality_deciles_docs(sf_dir: str) -> pd.DataFrame:
    """Curriculum binning: every document's global length decile via the
    distributed ROW_NUMBER (range-bucketed prefix scan, no global sort);
    decile = (rank-1)*10 // N with N from the parquet footer."""
    from .ops.curate import global_rank
    n = _n_rows(sf_dir, "documents")
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    out = global_rank(ds, order_cols=["n_chars", "doc_id"]).to_pandas()
    out["decile"] = ((out["rank"] - 1) * 10 // n).astype(np.int64)
    return out[["doc_id", "n_chars", "decile"]].sort_values("doc_id") \
                                               .reset_index(drop=True)


QUALITY_DECILES_SQL = """
SELECT doc_id, n_chars,
       CAST((ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1) * 10
            // (SELECT COUNT(*) FROM documents) AS BIGINT) AS decile
FROM documents
ORDER BY doc_id
"""


def length_percentiles_docs(sf_dir: str) -> pd.DataFrame:
    """EXACT distributed percentiles (p25/p50/p75/p95 of n_chars) via the
    count prefix scan: rank every row without a global sort, keep the
    rows at ranks ceil(q·N) — PERCENTILE_DISC semantics, integer-exact
    on both sides. N comes from the parquet footer."""
    import math

    from .ops.curate import global_rank
    n = _n_rows(sf_dir, "documents")
    qs = [0.25, 0.50, 0.75, 0.95]
    want = {math.ceil(q * n): q for q in qs}
    ranked = global_rank(_read_pq(_t(sf_dir, "documents"),
                                  columns=["doc_id", "n_chars"]),
                         order_cols=["n_chars", "doc_id"])
    targets = pa.array(sorted(want))
    hits = ranked.map_batches(
        lambda t: t.filter(pc.is_in(t["rank"], value_set=targets)),
        batch_format="pyarrow").to_pandas()
    out = pd.DataFrame({
        "q": [want[r] for r in hits["rank"]],
        "n_chars": hits["n_chars"].astype(np.int64)})
    return out.sort_values("q").reset_index(drop=True)


LENGTH_PERCENTILES_SQL = """
SELECT 0.25 AS q, CAST(PERCENTILE_DISC(0.25) WITHIN GROUP
                       (ORDER BY n_chars) AS BIGINT) AS n_chars
FROM documents
UNION ALL
SELECT 0.50, CAST(PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY n_chars)
                  AS BIGINT) FROM documents
UNION ALL
SELECT 0.75, CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY n_chars)
                  AS BIGINT) FROM documents
UNION ALL
SELECT 0.95, CAST(PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY n_chars)
                  AS BIGINT) FROM documents
ORDER BY q
"""


def pack_docs_budget(sf_dir: str) -> pd.DataFrame:
    """Token-budget shard packing: bin = floor(chars-before-this-doc /
    100k) in doc_id order — the cumulative-SUM window, computed as a
    distributed prefix scan (range-bucketed, per-bucket offsets from an
    O(buckets) driver step; no global sort). The key range comes from
    the parquet footer's column statistics — zero data read."""
    from .ops.curate import pack_by_budget
    md = pq.ParquetFile(_t(sf_dir, "documents")).metadata
    idx = md.schema.to_arrow_schema().get_field_index("doc_id")
    los, his = zip(*((rg.column(idx).statistics.min,
                      rg.column(idx).statistics.max)
                     for rg in (md.row_group(i)
                                for i in range(md.num_row_groups))))
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    out = pack_by_budget(ds, budget=100_000, weight_col="n_chars",
                         key_range=(min(los), max(his))).to_pandas()
    out["bin"] = out["bin"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True) \
              [["doc_id", "n_chars", "bin"]]


PACK_DOCS_SQL = """
SELECT doc_id, n_chars,
       CAST((SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - n_chars) // 100000
            AS BIGINT) AS bin
FROM documents
ORDER BY doc_id
"""


def semantic_dedup_planted(sf_dir: str) -> pd.DataFrame:
    """SemDeDup (cluster-then-dedup, ops/dedup.semantic_dedup) on the
    planted corpus at a near-exact threshold. The multi-cluster run is
    still SQL-checkable: at 0.9999 the only above-threshold pairs are the
    planted identical vectors (the exhaustive-pairs oracle of
    embedding_neardup_planted proves that set), and an identical vector
    always lands in the same cluster as its original (same argmax), so
    the within-cluster keep rule equals the global NOT-EXISTS rule the
    oracle expresses."""
    from .ops.dedup import semantic_dedup
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    head = _sorted_head(_t(sf_dir, "embeddings"), "vec_id",
                        ["vec_id", "embedding"], 10)
    dup = pa.table({"vec_id": pc.add(head["vec_id"], pa.scalar(10**12)),
                    "embedding": head["embedding"]})
    out = semantic_dedup(ds.union(rd.from_arrow(dup)), n_clusters=8,
                         threshold=0.9999).to_pandas()
    return out[["vec_id", "keep"]].sort_values("vec_id") \
        .reset_index(drop=True)


SEMANTIC_DEDUP_PLANTED_SQL = f"""
WITH planted AS ({EMB_PLANTED_SQL})
SELECT x.vec_id,
       NOT EXISTS (SELECT 1 FROM planted y
                   WHERE y.vec_id < x.vec_id
                     AND list_cosine_similarity(x.e, y.e) >= 0.9999) AS keep
FROM planted x
ORDER BY vec_id
"""


def asof_purchase_click(sf_dir: str) -> pd.DataFrame:
    """Global (non-keyed) as-of join: every purchase event picks up the
    value of the LATEST click anywhere in the stream at-or-before its
    timestamp. A hash exchange can't express this — the match may sit in
    another partition — so it runs through ops/joins.global_asof_join's
    range-bucket + driver-prefix carry-in. Clicks pre-reduce to one tick
    per timestamp (MAX value) to make the match unique on both sides."""
    from ray.data.aggregate import Max

    from .ops.joins import global_asof_join

    ev = _read_pq(_t(sf_dir, "events"),
                  columns=["event_id", "ts", "event_type", "value"])

    def typed(kind: str, cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("event_type"),
                                     kind)).select(cols)
        return f

    purchases = ev.map_batches(typed("purchase", ["event_id", "ts"]),
                               batch_format="pyarrow")
    ticks = ev.map_batches(typed("click", ["ts", "value"]),
                           batch_format="pyarrow") \
        .groupby("ts").aggregate(Max("value", alias_name="click_value"))
    out = global_asof_join(purchases, ticks, left_on="ts", right_on="ts",
                           value_col="click_value").to_pandas()
    out["click_value"] = out["click_value"].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


ASOF_PURCHASE_CLICK_SQL = """
WITH ticks AS (SELECT ts, MAX(value) AS click_value
               FROM events WHERE event_type = 'click' GROUP BY ts),
p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.ts, ROUND(t.click_value, 6) AS click_value
FROM p ASOF LEFT JOIN ticks t ON p.ts >= t.ts
ORDER BY p.event_id
"""


def event_interval_join(sf_dir: str) -> pd.DataFrame:
    """Range-stab join (ops/joins.interval_join): events fall into
    deterministic analysis windows — family A: 180 windows of 90 min every
    4 h; family B (OVERLAPPING family A and each other at the bucket
    level): 60 windows of 3 h every 12 h offset by 2 h — then a per-window
    count/sum. The join's output blocks are its range buckets, so the
    aggregate pre-reduces per block before a window-keyed (tiny) groupby:
    match rows never ride an exchange."""
    from ray.data.aggregate import Sum as _Sum

    from .ops.joins import interval_join

    t0 = 1704067200 * 10**6                  # 2024-01-01T00:00:00Z in µs
    ka = np.arange(180, dtype=np.int64)
    kb = np.arange(60, dtype=np.int64)
    iv = pa.table({
        "interval_id": pa.array(np.concatenate([ka, 1000 + kb])),
        "lo": pa.array(np.concatenate(
            [t0 + ka * 14_400_000_000,
             t0 + kb * 43_200_000_000 + 7_200_000_000])),
        "hi": pa.array(np.concatenate(
            [t0 + ka * 14_400_000_000 + 5_400_000_000,
             t0 + kb * 43_200_000_000 + 7_200_000_000 + 10_800_000_000])),
    })
    ev = _read_pq(_t(sf_dir, "events"), columns=["ts", "value"])
    joined = interval_join(ev, rd.from_arrow(iv), point_on="ts",
                           lo_col="lo", hi_col="hi")

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("interval_id")["value"].agg(["count", "sum"])
        return _arrow(pd.DataFrame({
            "interval_id": g.index.to_numpy(),
            "__n": g["count"].to_numpy().astype(np.int64),
            "__s": g["sum"].to_numpy()}))

    out = joined.map_batches(partial, batch_format="pandas") \
        .groupby("interval_id") \
        .aggregate(_Sum("__n", alias_name="n_events"),
                   _Sum("__s", alias_name="sum_value")).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("interval_id").reset_index(drop=True)


EVENT_INTERVAL_SQL = """
WITH iv AS (
  SELECT k.k AS interval_id,
         1704067200000000 + k.k * 14400000000 AS lo,
         1704067200000000 + k.k * 14400000000 + 5400000000 AS hi
  FROM generate_series(0, 179) k(k)
  UNION ALL
  SELECT 1000 + k.k,
         1704067200000000 + k.k * 43200000000 + 7200000000,
         1704067200000000 + k.k * 43200000000 + 7200000000 + 10800000000
  FROM generate_series(0, 59) k(k))
SELECT iv.interval_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(e.value), 2) AS sum_value
FROM events e JOIN iv ON epoch_us(e.ts) BETWEEN iv.lo AND iv.hi
GROUP BY iv.interval_id ORDER BY iv.interval_id
"""


def doc_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition filters (ops/text.repetition_stats):
    distinct-token ratio and most-frequent bigram/trigram fractions per
    doc — the signals a training pipeline thresholds to drop boilerplate
    and degenerate repetition. Embarrassingly parallel map_batches; no
    exchange."""
    from .ops.text import repetition_stats
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = repetition_stats(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# Zipped unnest (value + generate_subscripts position) reconstructs token
# order, LEAD windows build the n-grams; token class matches the Python
# side's ASCII [a-z0-9_]+ exactly (RE2 \w would also work but is kept
# explicit like VOCAB_TOP_TERMS_SQL).
DOC_REPETITION_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
  FROM arr),
base AS (SELECT doc_id, len(toks) AS n_tokens FROM arr),
dist AS (SELECT doc_id, COUNT(DISTINCT term) AS n_distinct
         FROM toks GROUP BY doc_id),
bi AS (
  SELECT doc_id, MAX(c) AS top_bi FROM (
    SELECT doc_id, COUNT(*) AS c
    FROM (SELECT doc_id, pos, term,
                 LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
          FROM toks)
    WHERE t2 IS NOT NULL GROUP BY doc_id, term, t2)
  GROUP BY doc_id),
tri AS (
  SELECT doc_id, MAX(c) AS top_tri FROM (
    SELECT doc_id, COUNT(*) AS c
    FROM (SELECT doc_id, pos, term,
                 LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
                 LEAD(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
          FROM toks)
    WHERE t3 IS NOT NULL GROUP BY doc_id, term, t2, t3)
  GROUP BY doc_id)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN b.n_tokens > 0
                  THEN CAST(COALESCE(d.n_distinct, 0) AS DOUBLE) / b.n_tokens
                  ELSE 0.0 END, 6) AS distinct_ratio,
       ROUND(CASE WHEN b.n_tokens >= 2
                  THEN CAST(COALESCE(bi.top_bi, 0) AS DOUBLE)
                       / (b.n_tokens - 1)
                  ELSE 0.0 END, 6) AS top_bigram_frac,
       ROUND(CASE WHEN b.n_tokens >= 3
                  THEN CAST(COALESCE(tri.top_tri, 0) AS DOUBLE)
                       / (b.n_tokens - 2)
                  ELSE 0.0 END, 6) AS top_trigram_frac
FROM base b
LEFT JOIN dist d USING (doc_id)
LEFT JOIN bi USING (doc_id)
LEFT JOIN tri USING (doc_id)
ORDER BY b.doc_id
"""


def topk_retrieve_docs(sf_dir: str) -> pd.DataFrame:
    """Retrieval with payload attach (the RAG-prep composition): exact
    top-10 cosine over the corpus, then ONLY the 10 winners' document
    metadata read back with a doc_id pushdown filter (the q10
    winner-attach pattern — the payload table is never scanned)."""
    from .ops.similarity import topk_cosine
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    hits = topk_cosine(ds, _query_vec(sf_dir), k=10).to_pandas()
    ids = sorted(int(v) for v in hits["vec_id"])
    docs = pq.read_table(_t(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"],
                         filters=[("doc_id", "in", ids)]).to_pandas()
    out = hits.merge(docs, left_on="vec_id", right_on="doc_id")
    out["cosine"] = out["cosine"].round(6)
    return out[["vec_id", "cosine", "lang", "n_chars"]] \
        .sort_values("vec_id").reset_index(drop=True)


TOPK_RETRIEVE_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id = 0),
topk AS (
  SELECT vec_id,
         ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                      (SELECT qe FROM q)), 6) AS cosine
  FROM embeddings
  ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                  (SELECT qe FROM q)) DESC, vec_id
  LIMIT 10)
SELECT t.vec_id, t.cosine, d.lang, d.n_chars
FROM topk t JOIN documents d ON d.doc_id = t.vec_id
ORDER BY t.vec_id
"""


def uniform_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Exactly-64 uniform sample without replacement: rank all docs by
    md5(salt:doc_id) and keep the prefix (ops/curate.uniform_sample_k —
    per-block heads + a ≤ k·blocks driver finish; no global sort). The
    top-k-by-hash prefix is extensible: a later k=128 request is a
    superset of this one."""
    from .ops.curate import uniform_sample_k
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    t = uniform_sample_k(ds, 64, key_col="doc_id", salt="usample")
    df = t.rename_columns(
        ["doc_id", "n_chars", "sample_key"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


UNIFORM_SAMPLE_SQL = """
SELECT doc_id, n_chars,
       md5_number_lower('usample:' || CAST(doc_id AS VARCHAR)) AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT 64
"""


def label_centroids_embeddings(sf_dir: str) -> pd.DataFrame:
    """Exact per-label mean embedding (class prototypes) in long layout —
    ops/similarity.label_centroids: per-block (label, dim, Σ, n) partials,
    one small groupby finish; corpus vectors never shuffle."""
    from .ops.similarity import label_centroids
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["label", "embedding"])
    df = label_centroids(ds).to_pandas()
    df["centroid"] = df["centroid"].round(6)
    return df.sort_values(["label", "dim"]).reset_index(drop=True)


LABEL_CENTROIDS_SQL = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings)
SELECT label, CAST(dim AS BIGINT) AS dim, ROUND(AVG(v), 6) AS centroid
FROM e GROUP BY label, dim ORDER BY label, dim
"""


def classify_embeddings(sf_dir: str) -> pd.DataFrame:
    """Linear-classifier inference over the embedding column (ops/infer.
    linear_classify): a deterministic 8-class weight matrix broadcasts
    once, each block scores with ONE matmul, ties on the 6dp-rounded score
    break to the lowest class id (round-before-argmax = the repo's
    ULP-stable rank rule). The oracle regenerates the SAME matrix with
    generate_series arithmetic and ranks identically."""
    from .ops.infer import demo_weights, linear_classify
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = linear_classify(ds, demo_weights(8, 64)).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


CLASSIFY_SQL = """
WITH w AS (
  SELECT c.c AS c, j.j AS j,
         ((1009 * c.c + 9176 * (j.j - 1) + 31) % 1997) / 1997.0 - 0.5 AS w
  FROM generate_series(0, 7) c(c) CROSS JOIN generate_series(1, 64) j(j)),
e AS (
  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS j
  FROM embeddings),
s AS (
  SELECT e.vec_id, w.c, ROUND(SUM(e.v * w.w), 6) AS score
  FROM e JOIN w ON e.j = w.j GROUP BY e.vec_id, w.c),
r AS (
  SELECT vec_id, c, score,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, c) AS rn
  FROM s)
SELECT vec_id, CAST(c AS BIGINT) AS pred_class, score
FROM r WHERE rn = 1 ORDER BY vec_id
"""


def skipgram_cooc_docs(sf_dir: str) -> pd.DataFrame:
    """Skip-gram window-4 ordered co-occurrence counts ≥ 5 (ops/text.
    skipgram_cooccurrence — word2vec preprocessing): per-block Counter
    partials carry (a, b, cnt) into ONE pair-keyed groupby; the window
    expansion never leaves the block. Full-value oracle: DuckDB positional
    self-join on the same RE2 tokenization."""
    from .ops.text import skipgram_cooccurrence
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])
    out = skipgram_cooccurrence(ds, window=4, min_count=5).to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


SKIPGRAM_COOC_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM arr)
SELECT x.tok AS a, y.tok AS b, COUNT(*) AS cnt
FROM toks x JOIN toks y
  ON x.doc_id = y.doc_id AND y.pos > x.pos AND y.pos <= x.pos + 4
GROUP BY x.tok, y.tok
HAVING COUNT(*) >= 5
ORDER BY a, b
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
    from .ops.reshape import pivot_counts
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
    from .ops.reshape import pivot_counts, unpivot
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


def media_binary_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup of binary media payloads (ops/multimodal.
    binary_exact_dedup): payloads are planted so doc_id % 50 share bytes;
    each block digests locally and only (digest, id) pairs shuffle. The
    planted payload is the UTF-8 bytes of a derivable string, so DuckDB's
    md5() over the same varchar is a full-value oracle for the digest,
    keeper and copy count."""
    from .ops.multimodal import binary_exact_dedup
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [f"payload:{int(d) % 50}".encode() for d in ids]
        return pa.table({"doc_id": t.column("doc_id"),
                         "payload": pa.array(payloads, pa.binary())})

    out = binary_exact_dedup(ds.map_batches(plant, batch_format="pyarrow"))
    df = out.to_pandas()
    df["keeper"] = df["keeper"].astype("int64")
    df["n_copies"] = df["n_copies"].astype("int64")
    return df.sort_values("digest").reset_index(drop=True)


MEDIA_BINARY_DEDUP_SQL = """
SELECT md5('payload:' || (doc_id % 50)) AS digest,
       MIN(doc_id) AS keeper, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1 ORDER BY digest
"""


def events_value_histogram(sf_dir: str) -> pd.DataFrame:
    """Equi-width histogram of the event value column — the distributed
    profiling primitive: per-block ``np.unique`` bin counts (width 10,
    floor binning) ride the exchange as (bin, cnt) partials into ONE
    bin-keyed groupby. floor(x/10) is IEEE-identical on both sides."""
    from ray.data.aggregate import Sum as _Sum
    ds = _read_pq(_t(sf_dir, "events"), columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        bins, cnt = np.unique(np.floor(v / 10.0).astype(np.int64),
                              return_counts=True)
        return pa.table({"bin": pa.array(bins, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(_Sum("cnt", alias_name="cnt")).to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("bin").reset_index(drop=True)


EVENTS_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM events GROUP BY 1 ORDER BY bin
"""


def phrase_search_docs(sf_dir: str) -> pd.DataFrame:
    """Exact 3-token phrase occurrences per document via positional
    postings (ops/curate.phrase_search): phrase-term-only (doc, base, bit)
    postings + one bitmask groupby — no text on the exchange. Oracle:
    positional self-joins over the same RE2 tokenization."""
    from .ops.curate import phrase_search
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = phrase_search(ds, ["value", "table", "part"]).to_pandas()
    out["n_occ"] = out["n_occ"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


PHRASE_SEARCH_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM arr)
SELECT t0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
FROM toks t0
JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
            AND t1.tok = 'table'
JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
            AND t2.tok = 'part'
WHERE t0.tok = 'value'
GROUP BY t0.doc_id ORDER BY t0.doc_id
"""


def ngram_containment_planted(sf_dir: str) -> pd.DataFrame:
    """Directional word-bigram CONTAINMENT (|∩|/|Ga|, |∩|/|Gb| — the
    quote/subset-detection score) over all pairs of 20 head docs plus a
    10-word PREFIX of each (so true-subset pairs score exactly 1.0 on the
    prefix side). Runs through ops/dedup.containment_pairs' size-dispatched
    attach; values hash-match DuckDB bit-exactly — both sides make one
    IEEE division of the same two gram-set integers."""
    from .ops.dedup import _WORD_RE, containment_pairs
    head = _sorted_head(_t(sf_dir, "documents"), "doc_id",
                        ["doc_id", "text"], 20)
    ids = head["doc_id"].to_pylist()
    texts = head["text"].to_pylist()
    prefixes = [" ".join(_WORD_RE.findall((t or "").lower())[:10])
                for t in texts]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids + [i + 10**12 for i in ids], pa.int64()),
        "text": pa.array(texts + prefixes, pa.string())}))
    all_ids = sorted(ids) + [i + 10**12 for i in sorted(ids)]
    pairs = [(a, b) for i, a in enumerate(all_ids) for b in all_ids[i + 1:]]
    pairs_ds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())}))
    out = containment_pairs(pairs_ds, docs, ngram=2)
    df = out.to_pandas()[["a", "b", "c_ab", "c_ba"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)


NGRAM_CONTAINMENT_SQL = """
WITH heads AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20),
hw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
       FROM heads),
planted AS (
  SELECT doc_id, w FROM hw
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, w[1:10] AS w FROM hw),
g AS (SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS grams
      FROM planted)
SELECT x.doc_id AS a, y.doc_id AS b,
       COALESCE(CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
                / NULLIF(len(x.grams), 0), 0.0) AS c_ab,
       COALESCE(CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
                / NULLIF(len(y.grams), 0), 0.0) AS c_ba
FROM g x JOIN g y ON x.doc_id < y.doc_id
ORDER BY a, b
"""


_Z_BITS = 3            # 8 buckets per dimension → ≤ 64 Morton cells
_Z_CELLS = 1 << _Z_BITS


def _zorder_widths(sf_dir: str) -> tuple[int, int]:
    """Integer bucket widths for (l_partkey, l_suppkey) — max//8+1 via one
    Max aggregate each, the same two integer divisions the SQL runs."""
    from .ops.layout import dim_width
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
    from .ops.layout import morton2
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
    from .ops.layout import morton2_sql
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

    from .ops.layout import zorder_box_read, zorder_write
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


def fuzzy_match_suppliers(sf_dir: str) -> pd.DataFrame:
    """Record linkage (ops/linkage.fuzzy_self_join): edit-distance-≤1
    matches over supplier names plus 10 planted single-char typos. The
    blocking (prefix-2 ∪ suffix-2 key passes) has PROVEN recall 1 at this
    radius, so the block-then-verify pipeline must equal the oracle's
    exhaustive levenshtein cross join — which also picks up the natural
    near-matches among the zero-padded names (any two keys one digit
    apart), making the check far from vacuous."""
    from .ops.linkage import fuzzy_self_join
    ds = _read_pq(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    head = _sorted_head(_t(sf_dir, "supplier"), "s_suppkey",
                        ["s_suppkey", "s_name"], 10)
    typos = pa.table({
        "s_suppkey": pc.add(head["s_suppkey"], pa.scalar(10**6)),
        "s_name": pa.array([n[:-1] + "x"
                            for n in head["s_name"].to_pylist()],
                           pa.string())})
    pairs = fuzzy_self_join(ds.union(rd.from_arrow(typos)),
                            name_col="s_name", id_col="s_suppkey")
    df = pairs.to_pandas()[["a", "b", "name_a", "name_b", "dist"]]
    df["dist"] = df["dist"].astype("int64")
    return df.sort_values(["a", "b"]).reset_index(drop=True)


FUZZY_MATCH_SQL = """
WITH heads AS (SELECT s_suppkey, s_name FROM supplier
               ORDER BY s_suppkey LIMIT 10),
planted AS (
  SELECT s_suppkey, s_name FROM supplier
  UNION ALL
  SELECT s_suppkey + 1000000 AS s_suppkey,
         substr(s_name, 1, length(s_name) - 1) || 'x' AS s_name
  FROM heads)
SELECT x.s_suppkey AS a, y.s_suppkey AS b,
       x.s_name AS name_a, y.s_name AS name_b,
       CAST(levenshtein(x.s_name, y.s_name) AS BIGINT) AS dist
FROM planted x JOIN planted y ON x.s_suppkey < y.s_suppkey
WHERE levenshtein(x.s_name, y.s_name) <= 1
ORDER BY a, b
"""


def event_value_trend(sf_dir: str) -> pd.DataFrame:
    """Per-event-type least-squares trend of value over time (grouped
    linear regression — the drift-detection primitive): ONE streaming pass
    emits a 6-double moment row per (type, block) — n, Σx, Σy, Σx², Σxy —
    x being the timestamp in days centered at day 20000 (a fixed shared
    constant — raw epoch-days cancel catastrophically in the variance
    term); one type-keyed groupby
    finishes; the slope/intercept close on the driver over |types| rows.
    The SQL oracle computes the SAME uncentered formula (not regr_slope,
    whose internal centering rounds differently)."""
    from ray.data.aggregate import Sum as _Sum
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "ts",
                                                 "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        x = (df["ts"].astype("datetime64[ns]").astype("int64")
             / 86_400_000_000_000).to_numpy() - 20000.0
        # explicit ns (the parquet column is µs — pandas would otherwise
        # keep that unit), CENTERED at a fixed day-20000 reference: raw
        # epoch-days (~19k) make n·Σx²−(Σx)² catastrophically cancel and
        # the intercept unstable past 6dp; the SQL subtracts the same
        # constant
        y = df["value"].to_numpy()
        g = pd.DataFrame({"event_type": df["event_type"], "x": x, "y": y,
                          "xx": x * x, "xy": x * y, "n": 1.0})
        return g.groupby("event_type", as_index=False).sum()

    m = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(*[_Sum(c, alias_name=c)
                     for c in ("x", "y", "xx", "xy", "n")]).to_pandas()
    n, sx, sy, sxx, sxy = (m["n"], m["x"], m["y"], m["xx"], m["xy"])
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    out = pd.DataFrame({"event_type": m["event_type"],
                        "slope": slope.round(6),
                        "intercept": intercept.round(6)})
    return out.sort_values("event_type").reset_index(drop=True)


EVENT_TREND_SQL = """
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(epoch_ns(ts) / 86400000000000.0 - 20000.0) AS sx,
         SUM(value) AS sy,
         SUM((epoch_ns(ts) / 86400000000000.0 - 20000.0)
             * (epoch_ns(ts) / 86400000000000.0 - 20000.0)) AS sxx,
         SUM((epoch_ns(ts) / 86400000000000.0 - 20000.0) * value) AS sxy
  FROM events GROUP BY event_type),
s AS (SELECT event_type,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             n, sx, sy FROM m)
SELECT event_type, ROUND(slope, 6) AS slope,
       ROUND((sy - slope * sx) / n, 6) AS intercept
FROM s ORDER BY event_type
"""


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

    edges = ds.map_batches(mk_edges, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Count()) \
        .select_columns(["a", "b"]).materialize()

    def deg_partial(t: pa.Table) -> pd.DataFrame:
        nodes = np.concatenate([t.column("a").to_numpy(),
                                t.column("b").to_numpy()])
        ns, cnt = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": ns, "deg": cnt.astype("int64")})

    deg = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(_Sum("deg", alias_name="deg"))
    dmap = {r["node"]: float(r["deg"]) for r in deg.take_all()}
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

    sym = ds.map_batches(mk_sym, batch_format="pyarrow") \
        .groupby(["u", "v"]).aggregate(Count()) \
        .select_columns(["u", "v"]).materialize()

    nodes = sorted({r["u"] for r in
                    sym.groupby("u").aggregate(Count()).take_all()})
    labels = {n: n for n in nodes}
    for _ in range(_CC_ROUNDS):
        ref = _ray.put(labels)

        def contrib(t: pa.Table) -> pd.DataFrame:
            lm = _ray.get(ref)
            df = pd.DataFrame({
                "node": t.column("u").to_numpy(zero_copy_only=False),
                "lab": [lm[v] for v in t.column("v").to_pylist()]})
            return df.groupby("node", as_index=False)["lab"].min()

        mins = sym.map_batches(contrib, batch_format="pyarrow") \
            .groupby("node").aggregate(_Min("lab", alias_name="lab"))
        new = dict(labels)
        for r in mins.take_all():
            if r["lab"] < new[r["node"]]:
                new[r["node"]] = r["lab"]
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

    edges = ds.map_batches(mk_edges, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Count()) \
        .select_columns(["a", "b"]).materialize()

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

        deg_df = edges.map_batches(deg_partial, batch_format="pyarrow") \
            .groupby("node").aggregate(_Sum("deg", alias_name="deg")) \
            .to_pandas()
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


_PCA_ITERS = 3
_PCA_DIM = 64


def pca_top_component_embeddings(sf_dir: str) -> pd.DataFrame:
    """Top principal direction of the embedding Gram matrix XᵀX by POWER
    ITERATION (the 6th oracled iterative algorithm): start from the
    constant unit vector, each iteration is ONE streaming pass emitting a
    d-vector partial Xᵀ(Xv) per block (matmul twice per block — vectors
    never leave their blocks, driver state is d doubles), normalize on
    the driver, repeat ×3. Output: (dim, component) rounded 6dp. Oracle:
    unrolled CTE chain computing the same s→normalize recurrence with
    list_inner_product/unnest; power iteration is a contraction toward
    the dominant eigvec, so the two sides' ~1e-15 summation-order
    differences do not amplify across the 3 rounds."""
    import ray as _ray
    from .ops.similarity import _as_matrix

    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["embedding"])
    v = np.full(_PCA_DIM, 1.0 / np.sqrt(_PCA_DIM))
    for _ in range(_PCA_ITERS):
        ref = _ray.put(v)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            vv = _ray.get(ref)
            mat = _as_matrix(batch["embedding"]).astype(np.float64)
            s = mat.T @ (mat @ vv)
            return pd.DataFrame({"dim": np.arange(1, _PCA_DIM + 1,
                                                  dtype=np.int64),
                                 "s": s})

        agg = ds.map_batches(partial, batch_format="pandas").to_pandas() \
            .groupby("dim", sort=True)["s"].sum()
        s = agg.to_numpy()
        v = s / np.sqrt((s * s).sum())

    return pd.DataFrame({"dim": np.arange(1, _PCA_DIM + 1,
                                          dtype=np.int64),
                         "component": np.round(v, 6)})


def _pca_sql(iters: int = _PCA_ITERS, d: int = _PCA_DIM) -> str:
    ctes = [f"""e AS MATERIALIZED (
  SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings)""",
            f"""v0 AS MATERIALIZED (
  SELECT UNNEST(range(1, {d + 1})) AS dim, 1.0 / SQRT({d}) AS val)"""]
    for r in range(1, iters + 1):
        p = r - 1
        ctes.append(f"""s{r} AS MATERIALIZED (
  SELECT dim, SUM(xi * ip) AS s FROM (
    SELECT UNNEST(x) AS xi, generate_subscripts(x, 1) AS dim,
           list_inner_product(
             x, (SELECT list(val ORDER BY dim) FROM v{p})) AS ip
    FROM e)
  GROUP BY dim)""")
        ctes.append(f"""v{r} AS MATERIALIZED (
  SELECT dim, s / (SELECT SQRT(SUM(s * s)) FROM s{r}) AS val FROM s{r})""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT CAST(dim AS BIGINT) AS dim,"
            + f" ROUND(val, 6) AS component FROM v{iters} ORDER BY dim")


_LR_STEPS = 3
_LR_RATE = "0.1"     # literal text shared with the SQL (same float bits)


def logreg_gd_embeddings(sf_dir: str) -> pd.DataFrame:
    """Distributed full-batch logistic-regression training (3 gradient
    steps, lr 0.1, features = embedding dims 1–2 + bias, label = parity
    of the stored class): each step is ONE streaming pass emitting a
    3-double gradient partial per block — Σ x·(σ(w·x) − y) — with the
    3-double weight vector as driver state; the 7th oracled iterative
    algorithm. The oracle unrolls the steps as scalar-aggregate CTEs with
    the same σ/EXP expression (numpy exp vs libm exp agree well past the
    6dp output rounding over 3 contraction-free but tiny-depth steps)."""
    import ray as _ray

    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["embedding", "label"])
    w = np.zeros(3)
    for _ in range(_LR_STEPS):
        ref = _ray.put(w)

        def grad_partial(batch: pd.DataFrame) -> pd.DataFrame:
            ww = _ray.get(ref)
            from .ops.similarity import _as_matrix
            mat = _as_matrix(batch["embedding"]).astype(np.float64)
            x = np.column_stack([mat[:, 0], mat[:, 1],
                                 np.ones(len(mat))])
            y = (batch["label"].to_numpy() % 2).astype(np.float64)
            z = x @ ww
            p = 1.0 / (1.0 + np.exp(-z))
            g = x.T @ (p - y)
            return pd.DataFrame({"g0": [g[0]], "g1": [g[1]],
                                 "g2": [g[2]], "n": [float(len(x))]})

        parts = ds.map_batches(grad_partial,
                               batch_format="pandas").to_pandas().sum()
        n = parts["n"]
        w = w - float(_LR_RATE) * np.array(
            [parts["g0"] / n, parts["g1"] / n, parts["g2"] / n])

    return pd.DataFrame({"weight": ["w0", "w1", "bias"],
                         "value": np.round(w, 6)})


def _logreg_sql(steps: int = _LR_STEPS) -> str:
    ctes = ["""d AS MATERIALIZED (
  SELECT CAST(embedding[1] AS DOUBLE) AS x0,
         CAST(embedding[2] AS DOUBLE) AS x1,
         CAST(label % 2 AS DOUBLE) AS y
  FROM embeddings)""",
            "w0 AS (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c)"]
    for r in range(1, steps + 1):
        p = r - 1
        ctes.append(f"""g{r} AS MATERIALIZED (
  SELECT SUM(x0 * (p - y)) AS g0, SUM(x1 * (p - y)) AS g1,
         SUM(1.0 * (p - y)) AS g2, CAST(COUNT(*) AS DOUBLE) AS n
  FROM (SELECT x0, x1, y,
               1.0 / (1.0 + EXP(-(x0 * w.a + x1 * w.b + 1.0 * w.c))) AS p
        FROM d CROSS JOIN w{p} w))""")
        ctes.append(f"""w{r} AS (
  SELECT w.a - {_LR_RATE} * (g.g0 / g.n) AS a,
         w.b - {_LR_RATE} * (g.g1 / g.n) AS b,
         w.c - {_LR_RATE} * (g.g2 / g.n) AS c
  FROM w{p} w CROSS JOIN g{r} g)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT 'w0' AS weight, ROUND(a, 6) AS value FROM w{steps}
UNION ALL SELECT 'w1', ROUND(b, 6) FROM w{steps}
UNION ALL SELECT 'bias', ROUND(c, 6) FROM w{steps}
ORDER BY weight""")


def ab_test_events(sf_dir: str) -> pd.DataFrame:
    """Two-sample Welch z-test between event-type value distributions
    (the experimentation primitive): per-type moment partials (n, Σ, Σ²)
    in ONE pass — the same mergeable-moments shape as event_outliers —
    then the driver closes mean/variance/z over |type-pairs| rows for the
    fixed comparison set. Sample variance uses the n−1 denominator
    (VAR_SAMP) on both sides."""
    from ray.data.aggregate import Sum as _Sum
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        v = df["value"].to_numpy()
        g = pd.DataFrame({"event_type": df["event_type"], "n": 1.0,
                          "s": v, "ss": v * v})
        return g.groupby("event_type", as_index=False).sum()

    m = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(*[_Sum(c, alias_name=c) for c in ("n", "s", "ss")]) \
        .to_pandas().set_index("event_type")
    rows = []
    for a, b in (("click", "purchase"), ("view", "click"),
                 ("signup", "error")):
        na, nb = m.loc[a, "n"], m.loc[b, "n"]
        ma, mb = m.loc[a, "s"] / na, m.loc[b, "s"] / nb
        va = (m.loc[a, "ss"] - m.loc[a, "s"] * m.loc[a, "s"] / na) \
            / (na - 1)
        vb = (m.loc[b, "ss"] - m.loc[b, "s"] * m.loc[b, "s"] / nb) \
            / (nb - 1)
        z = (ma - mb) / np.sqrt(va / na + vb / nb)
        rows.append((a, b, round(ma - mb, 6), round(z, 6)))
    return pd.DataFrame(rows, columns=["grp_a", "grp_b", "mean_diff", "z"])


AB_TEST_SQL = """
WITH m AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n, SUM(value) AS s,
         SUM(value * value) AS ss
  FROM events GROUP BY event_type),
pairs(grp_a, grp_b) AS (VALUES ('click', 'purchase'), ('view', 'click'),
                               ('signup', 'error'))
SELECT p.grp_a, p.grp_b,
       ROUND(a.s / a.n - b.s / b.n, 6) AS mean_diff,
       ROUND((a.s / a.n - b.s / b.n)
             / SQRT(((a.ss - a.s * a.s / a.n) / (a.n - 1)) / a.n
                    + ((b.ss - b.s * b.s / b.n) / (b.n - 1)) / b.n), 6)
         AS z
FROM pairs p JOIN m a ON a.event_type = p.grp_a
             JOIN m b ON b.event_type = p.grp_b
ORDER BY grp_a, grp_b
"""


def char_entropy_docs(sf_dir: str) -> pd.DataFrame:
    """Per-document character-distribution Shannon entropy (nats) — the
    Gopher-family compressibility/quality signal: vectorized np.unique
    histogram per doc, H = ln(n) − (Σ c·ln c)/n (this factorization makes
    the float expression shared with SQL term-for-term). Embarrassingly
    parallel; no exchange."""
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ents = []
        for t in batch["text"].fillna(""):
            if not t:
                ents.append(0.0)
                continue
            _, cnt = np.unique(list(t), return_counts=True)
            c = cnt.astype(np.float64)
            n = float(len(t))
            ents.append(round(np.log(n) - float((c * np.log(c)).sum()) / n,
                              6))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "entropy": pd.Series(ents, dtype="float64",
                                                  index=batch.index)})

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, UNNEST(string_split(text, '')) AS ch FROM documents),
hist AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS c
  FROM chars GROUP BY doc_id, ch),
tot AS (SELECT doc_id, SUM(c) AS n FROM hist GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(ROUND(LN(t.n) - (SELECT SUM(c * LN(c)) FROM hist h
                                 WHERE h.doc_id = d.doc_id) / t.n, 6),
                0.0) AS entropy
FROM documents d LEFT JOIN tot t ON t.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def cumulative_users_daily(sf_dir: str) -> pd.DataFrame:
    """Cumulative distinct users by day (the growth-curve metric):
    distinct-count-over-time without rescanning — each user reduces to
    their FIRST event day (one user-keyed groupby-Min; the only
    exchange), first-day counts reduce to the day series, and the
    running total closes on the driver over the time-span-bounded day
    rows (the events_daily_ma7 finish pattern)."""
    from ray.data.aggregate import Count, Min as _Min
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def day_of(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        return pd.DataFrame({"user_id": df["user_id"],
                             "day": df["ts"].dt.floor("D")})

    first = ds.map_batches(day_of, batch_format="pyarrow") \
        .groupby("user_id").aggregate(_Min("day", alias_name="first_day"))
    daily = first.groupby("first_day") \
        .aggregate(Count(alias_name="new_users")).to_pandas() \
        .sort_values("first_day").reset_index(drop=True)
    daily["cum_users"] = daily["new_users"].cumsum().astype("int64")
    daily["new_users"] = daily["new_users"].astype("int64")
    daily["day"] = pd.to_datetime(daily["first_day"])
    return daily[["day", "new_users", "cum_users"]]


CUMULATIVE_USERS_SQL = """
WITH f AS (SELECT user_id, MIN(date_trunc('day', ts)) AS day
           FROM events GROUP BY user_id),
d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM f GROUP BY day)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d ORDER BY day
"""


def heavy_bigrams_docs(sf_dir: str) -> pd.DataFrame:
    """Exact heavy-hitter word BIGRAMS (corpus boilerplate phrases — the
    text-domain application of the Misra-Gries machinery already pinned
    on user ids): one flat bigram expansion per block feeds
    ops/sketch.heavy_hitters' two bounded passes (mergeable summaries →
    certified candidate superset → broadcast exact recount); no pass
    shuffles more than min(k, |candidates|) rows per block. Oracle:
    GROUP BY … HAVING over the LEAD-window bigrams."""
    import re as _re

    from .ops.sketch import heavy_hitters
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])
    tok_re = _re.compile(r"[a-z0-9_]+")

    def bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        out: list[str] = []
        for t in batch["text"].fillna(""):
            toks = tok_re.findall(t.lower())
            out.extend(a + " " + b for a, b in zip(toks, toks[1:]))
        return pd.DataFrame({"bigram": pd.Series(out, dtype="object")})

    # scale-derived threshold, identical on both sides: ceil(n_docs/12)
    # (≥ 4) — a fixed count can't fit every sf
    n_docs = pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows
    threshold = max(4, -(-n_docs // 12))
    grams = ds.map_batches(bigrams, batch_format="pandas")
    hh = heavy_hitters(grams, "bigram", threshold=threshold)
    hh = hh.rename(columns={"n": "cnt"})
    hh["cnt"] = hh["cnt"].astype("int64")
    return hh.sort_values("bigram").reset_index(drop=True)


HEAVY_BIGRAMS_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM arr),
bi AS (
  SELECT tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos)
           AS bigram
  FROM toks QUALIFY LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos)
            IS NOT NULL)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM bi GROUP BY bigram
HAVING COUNT(*) >= GREATEST(4, CEIL((SELECT COUNT(*) FROM documents)
                                    / 12.0))
ORDER BY bigram
"""


def cohort_retention_orders(sf_dir: str) -> pd.DataFrame:
    """Cohort retention (the classic two-level analytics shape): cohort =
    a customer's FIRST order year; output = distinct customers per
    (cohort, order year). Three bounded stages: (1) per-block (cust, year)
    partials → one groupby-Min gives the customer-sized cohort table;
    (2) distinct (cust, year) pairs via groupby (the pre-reduction — order
    rows never reach the next stage); (3) cohorts broadcast (customer
    table ≪ fact table — the documented dimension-broadcast contract;
    above budget this becomes a bucketed join on cust) and a final
    (cohort, year) count."""
    import ray as _ray
    from ray.data.aggregate import Count, Min

    ds = _read_pq(_t(sf_dir, "orders"),
                  columns=["o_custkey", "o_orderdate"])

    def cust_year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cust": df["o_custkey"].astype("int64"),
            "o_year": df["o_orderdate"].dt.year.astype("int64")})

    cy = ds.map_batches(cust_year, batch_format="pandas").materialize()
    fy = cy.groupby("cust").aggregate(Min("o_year", alias_name="cohort"))
    cohort_map = {r["cust"]: r["cohort"] for r in fy.take_all()}
    ref = _ray.put(cohort_map)

    pairs = cy.groupby(["cust", "o_year"]).aggregate(Count())

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cm = _ray.get(ref)
        return pd.DataFrame({
            "cohort": df["cust"].map(cm).astype("int64"),
            "o_year": df["o_year"].astype("int64")})

    out = pairs.map_batches(attach, batch_format="pandas") \
        .groupby(["cohort", "o_year"]) \
        .aggregate(Count(alias_name="n_customers")).to_pandas()
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values(["cohort", "o_year"]).reset_index(drop=True)


COHORT_RETENTION_SQL = """
WITH fy AS (SELECT o_custkey,
                   MIN(EXTRACT(year FROM o_orderdate)) AS cohort
            FROM orders GROUP BY 1)
SELECT CAST(fy.cohort AS BIGINT) AS cohort,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM orders o JOIN fy ON o.o_custkey = fy.o_custkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_equidepth_histogram(sf_dir: str) -> pd.DataFrame:
    """Equi-DEPTH histogram of event values: quartile edges from the
    two-pass exact-quantile operator (ops/curate.exact_quantiles — only
    probed buckets' values move), then ONE counting pass bins every row
    against the 3 broadcast edges. Bucket rule: number of edges < v
    (so v == edge stays in the lower bucket — the PERCENTILE_DISC-value
    boundary the SQL CASE expresses with the same stored doubles)."""
    from .ops.curate import exact_quantiles
    from ray.data.aggregate import Sum as _Sum
    ds = _read_pq(_t(sf_dir, "events"), columns=["value"])
    edges = exact_quantiles(ds, "value", [0.25, 0.5, 0.75])["value"] \
        .to_numpy(dtype=np.float64)

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.searchsorted(edges, v, side="left")    # == count(edges < v)
        bins, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(bins, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(_Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


EVENTS_EQUIDEPTH_SQL = """
WITH e AS (
  SELECT PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY value) AS e1,
         PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY value) AS e2,
         PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY value) AS e3
  FROM events)
SELECT CASE WHEN value <= e.e1 THEN 0
            WHEN value <= e.e2 THEN 1
            WHEN value <= e.e3 THEN 2
            ELSE 3 END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM events CROSS JOIN e
GROUP BY 1 ORDER BY bucket
"""


def token_pmi_docs(sf_dir: str) -> pd.DataFrame:
    """Top-50 adjacent-bigram collocations by corpus PMI (ops/text.
    token_pmi): one fused streaming pass emits partial unigram+bigram
    counts, one gram-keyed groupby finishes, vocab-sized unigram counts
    broadcast, per-block local top-k bounds the driver finish. Rounded-PMI
    rank with (a, b) tie break = the ULP-stable rule."""
    from .ops.text import token_pmi
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return token_pmi(ds, min_count=5, k=50)


TOKEN_PMI_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM arr),
bi AS (
  SELECT tok AS a, LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM toks),
bc AS (SELECT a, b, COUNT(*) AS c_ab FROM bi WHERE b IS NOT NULL
       GROUP BY a, b),
uc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT (SELECT CAST(SUM(c) AS DOUBLE) FROM uc) AS n,
               (SELECT CAST(SUM(c_ab) AS DOUBLE) FROM bc) AS m),
scored AS (
  SELECT bc.a, bc.b, CAST(bc.c_ab AS BIGINT) AS c_ab,
         ROUND(LN(CAST(bc.c_ab AS DOUBLE) * tot.n * tot.n
                  / (tot.m * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))),
               6) AS pmi
  FROM bc CROSS JOIN tot
  JOIN uc ua ON ua.tok = bc.a
  JOIN uc ub ON ub.tok = bc.b
  WHERE bc.c_ab >= 5)
SELECT a, b, c_ab, pmi FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, a, b) AS rn FROM scored)
WHERE rn <= 50 ORDER BY pmi DESC, a, b
"""


def bpe_merges_docs(sf_dir: str) -> pd.DataFrame:
    """8 BPE merge rules trained over the documents corpus (ops/text.
    bpe_train): one corpus pass reduces to the word-frequency vocab, the
    training loop then runs vocab-sized (driver arm here — the
    distributed arm is pinned equal in tests). Deterministic argmax: max
    freq-weighted pair count, ties to the smallest (a, b)."""
    from .ops.text import bpe_train
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return bpe_train(ds, merges=8)


def bpe_encode_docs(sf_dir: str) -> pd.DataFrame:
    """Corpus token distribution AFTER applying the 8 trained BPE merges —
    the ENCODE side of the tokenizer (ops/text.bpe_encode_counts): train
    on the vocab, then one vocab-sized apply pass emits (token, Σ word
    freq) partials into a token-keyed groupby. Oracle: the same generated
    merge chain, read out at seq8 (the encoded vocab) joined to the word
    frequencies — so training AND application are value-checked
    together."""
    from .ops.text import bpe_encode_counts, bpe_train
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    rules = [(r.lhs, r.rhs) for r in bpe_train(ds, merges=8).itertuples()]
    out = bpe_encode_counts(ds, rules).to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("token").reset_index(drop=True)


BPE_ENCODE_SQL_TAIL = """
SELECT s AS token, CAST(SUM(freq) AS BIGINT) AS cnt
FROM {seqk} JOIN wf USING (w)
GROUP BY s ORDER BY token"""


def _bpe_sql(k: int = 8, final_select: str | None = None) -> str:
    """Generated step-chain BPE oracle (the kmeans/pagerank pattern):
    seq{i} applies pick{i}'s merge to seq{i-1} via the run-parity
    formulation (greedy left-to-right: 1st, 3rd, ... of each maximal
    overlap run — overlaps only arise when lhs == rhs). CTEs MUST be
    MATERIALIZED: DuckDB's default inlining re-evaluates the chain
    combinatorially (the kmeans lesson)."""
    parts = ["""WITH toks AS MATERIALIZED (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
  FROM documents),
wf AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY w),
seq0 AS MATERIALIZED (
  SELECT w, p, s FROM (
    SELECT w, generate_subscripts(string_split(w, ''), 1) AS p,
           unnest(string_split(w, '')) AS s FROM wf)
  UNION ALL SELECT w, LENGTH(w) + 1, '</w>' FROM wf)"""]
    for i in range(1, k + 1):
        prev = f"seq{i - 1}"
        parts.append(f""",
cnt{i} AS MATERIALIZED (
  SELECT a, b, SUM(freq) AS c FROM (
    SELECT w, s AS a, LEAD(s) OVER (PARTITION BY w ORDER BY p) AS b
    FROM {prev}) x
  JOIN wf USING (w) WHERE b IS NOT NULL GROUP BY a, b),
pick{i} AS MATERIALIZED (
  SELECT a, b, CAST(c AS BIGINT) AS c FROM cnt{i}
  ORDER BY c DESC, a, b LIMIT 1),
seq{i} AS MATERIALIZED (
  SELECT w, ROW_NUMBER() OVER (PARTITION BY w ORDER BY p) AS p, s FROM (
    SELECT w, p,
           CASE WHEN hit THEN (SELECT a || b FROM pick{i}) ELSE s END AS s,
           COALESCE(LAG(hit) OVER (PARTITION BY w ORDER BY p),
                    FALSE) AS consumed
    FROM (
      SELECT w, p, s,
             COALESCE(pairable
                      AND ((p - MIN(p) OVER (PARTITION BY w, grp)) % 2 = 0),
                      FALSE) AS hit
      FROM (
        SELECT w, p, s, pairable,
               CASE WHEN pairable THEN p - ROW_NUMBER()
                    OVER (PARTITION BY w, pairable ORDER BY p) END AS grp
        FROM (
          SELECT w, p, s,
                 (s = (SELECT a FROM pick{i})
                  AND LEAD(s) OVER (PARTITION BY w ORDER BY p)
                      = (SELECT b FROM pick{i})) AS pairable
          FROM {prev}) t1) t2) t3) t4
  WHERE NOT consumed)""")
    if final_select is not None:
        # caller-supplied tail over the chain (seq{k} = the fully-merged
        # symbol sequences, i.e. the ENCODED vocab; wf = word frequencies)
        parts.append("\n" + final_select.format(seqk=f"seq{k}"))
        return "".join(parts)
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, a AS lhs, b AS rhs,"
        f" a || b AS merged, c AS pair_count FROM pick{i}"
        for i in range(1, k + 1))
    parts.append(f"\n{selects}\nORDER BY step")
    return "".join(parts)


BPE_MERGES_SQL = _bpe_sql(8)


def cross_doc_ngram_docs(sf_dir: str) -> pd.DataFrame:
    """Cross-document duplicated 5-gram coverage per doc (ops/text.
    cross_doc_ngram_stats): the C4-style boilerplate signal — what
    fraction of a doc's 5-gram positions carry a gram shared with ≥2
    distinct docs. Gram strings shuffle once, co-partitioned by gram."""
    from .ops.text import cross_doc_ngram_stats
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = cross_doc_ngram_stats(ds, n=5, min_docs=2).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# `term || ' ' || NULL` is NULL, so tail positions (LEAD past the doc end)
# drop exactly like the Python range(len - n + 1); docs with <5 tokens
# emit no row on either side.
CROSS_DOC_NGRAM_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
  FROM arr),
g AS (
  SELECT doc_id,
         term || ' ' || LEAD(term, 1) OVER w || ' ' || LEAD(term, 2) OVER w
              || ' ' || LEAD(term, 3) OVER w || ' ' || LEAD(term, 4) OVER w
           AS gram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
g2 AS (SELECT doc_id, gram FROM g WHERE gram IS NOT NULL),
dup AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS c
                          FROM g2 GROUP BY gram) WHERE c >= 2)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE gram IN (SELECT gram FROM dup))
            AS BIGINT) AS n_dup_grams,
       ROUND(CAST(COUNT(*) FILTER (WHERE gram IN (SELECT gram FROM dup))
                  AS DOUBLE) / COUNT(*), 6) AS dup_frac
FROM g2 GROUP BY doc_id ORDER BY doc_id
"""


def corpus_diff_docs(sf_dir: str) -> pd.DataFrame:
    """Version diff between the documents table and a deterministically
    derived v2 (drop doc_id%7==0, append ' v2' to text where doc_id%11==0,
    add 5 new ids): added/removed/changed deltas via ops/curate.
    corpus_diff — (id, md5) digests through three bucketed joins; texts
    never shuffle, output is delta-sized."""
    from .ops.curate import corpus_diff
    old = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def to_v2(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = ids % 7 != 0
        t = t.filter(pa.array(keep))
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        texts = [x + " v2" if i % 11 == 0 else x
                 for i, x in zip(ids, texts)]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    head = _sorted_head(_t(sf_dir, "documents"), "doc_id",
                        ["doc_id", "text"], 5)
    new = old.map_batches(to_v2, batch_format="pyarrow").union(
        rd.from_arrow(pa.table({
            "doc_id": pc.add(head["doc_id"], pa.scalar(10**12)),
            "text": head["text"]})))
    df = corpus_diff(old, new).to_pandas()
    return df.sort_values(["doc_id", "change"]).reset_index(drop=True)


def incremental_lang_stats(sf_dir: str) -> pd.DataFrame:
    """Incremental materialized-view maintenance: per-lang
    (n_docs, sum_chars) for corpus v2, computed as v1's aggregate PLUS
    delta-sized adjustments — never a second full scan of v2. The delta
    comes from ops/curate.corpus_diff; removed/changed-old rows join
    back to v1 and added/changed-new rows to v2 (bucketed joins over
    the DELTA ids only) to produce per-lang ±(1, len) adjustments; the
    driver merges ≤|langs| rows. The oracle is the FULL recompute over
    the derived v2, so the maintenance identity itself is what gets
    value-checked."""
    from .ops.curate import corpus_diff
    cols = ["doc_id", "text", "lang"]
    v1 = _read_pq(_t(sf_dir, "documents"), columns=cols)

    def to_v2(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        t = t.filter(pa.array(ids % 7 != 0))
        ids = t.column("doc_id").to_numpy()
        texts = [x + " v2" if (i % 11 == 0 and x is not None) else x
                 for i, x in zip(ids, t.column("text").to_pylist())]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string()),
                         "lang": t.column("lang")})

    head = _sorted_head(_t(sf_dir, "documents"), "doc_id", cols, 5)
    v2 = v1.map_batches(to_v2, batch_format="pyarrow").union(
        rd.from_arrow(pa.table({
            "doc_id": pc.add(head["doc_id"], pa.scalar(10**12)),
            "text": head["text"], "lang": head["lang"]})))

    def vals(t: pa.Table) -> pa.Table:
        lens = [len(x or "") for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "len": pa.array(lens, pa.int64())})

    def lang_partial(sign: int):
        def f(df: pd.DataFrame) -> pa.Table:
            g = df.groupby("lang", as_index=False).agg(
                dn=("doc_id", "size"), dchars=("len", "sum"))
            g["dn"] *= sign
            g["dchars"] *= sign
            return _arrow(g)
        return f

    # (id, lang, len) value tables materialize ONCE — each is consumed
    # twice (base/adjustment joins) and re-deriving v2 per consumer would
    # re-run the whole map chain
    v1_vals = v1.map_batches(vals, batch_format="pyarrow").materialize()
    v2_vals = v2.map_batches(vals, batch_format="pyarrow").materialize()

    # per-block partials are ≤ |langs| rows each — a driver finish over
    # langs×blocks rows beats a sort exchange (Ray sort ≈ 2 s fixed)
    base = v1_vals.map_batches(lang_partial(+1), batch_format="pandas") \
        .to_pandas().groupby("lang", as_index=False) \
        .agg(dn=("dn", "sum"), dchars=("dchars", "sum"))

    # the delta is small relative to the corpus BY DEFINITION of an
    # incremental update, so its id sets broadcast and the adjustment
    # value pulls are delta-sized filter passes (zero exchange); a delta
    # too big to broadcast would use the bucketed join instead (the
    # repo's standard cutover — ops/joins.bucketed_hash_join)
    ddf = corpus_diff(v1, v2).to_pandas()
    rm_ref = ray.put(set(
        ddf.loc[ddf["change"].isin(["removed", "changed"]), "doc_id"]))
    ad_ref = ray.put(set(
        ddf.loc[ddf["change"].isin(["added", "changed"]), "doc_id"]))

    def pick(ref):
        def f(t: pa.Table) -> pa.Table:
            ks = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            return t.filter(pa.array(
                np.isin(t["doc_id"].to_numpy(), list(ks))))
        return f

    minus = v1_vals.map_batches(pick(rm_ref), batch_format="pyarrow") \
        .map_batches(lang_partial(-1), batch_format="pandas")
    plus = v2_vals.map_batches(pick(ad_ref), batch_format="pyarrow") \
        .map_batches(lang_partial(+1), batch_format="pandas")

    adj_rows = minus.union(plus).to_pandas()  # ≤ 2·|delta| partial rows
    adj = adj_rows.groupby("lang", as_index=False).agg(
        dn=("dn", "sum"), dchars=("dchars", "sum"))

    out = base.set_index("lang").add(adj.set_index("lang"), fill_value=0) \
        .reset_index()
    out = out[out["dn"] > 0]
    out = out.rename(columns={"dn": "n_docs", "dchars": "sum_chars"})
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


INCREMENTAL_LANG_SQL = """
WITH newv AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, text, lang
  FROM (SELECT doc_id, text, lang FROM documents ORDER BY doc_id LIMIT 5))
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(coalesce(text, ''))) AS BIGINT) AS sum_chars
FROM newv GROUP BY lang ORDER BY lang
"""


CORPUS_DIFF_SQL = """
WITH newv AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, text
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 5))
SELECT d.doc_id, 'removed' AS change FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM newv)
UNION ALL
SELECT n.doc_id, 'added' FROM newv n
WHERE n.doc_id NOT IN (SELECT doc_id FROM documents)
UNION ALL
SELECT d.doc_id, 'changed' FROM documents d JOIN newv n USING (doc_id)
WHERE d.text <> n.text
ORDER BY doc_id, change
"""


def events_contract_check(sf_dir: str) -> pd.DataFrame:
    """Data-contract validation (ops/curate.validate_rows): three named
    row predicates over events (error-type rows, value > 400,
    value < 0.05) evaluated vectorized per batch — no exchange — with
    violation accounting reduced from per-batch partials plus a 'clean'
    row (violates nothing). Predicates compare STORED values (no
    arithmetic), so the counts are bit-exact against SQL."""
    from .ops.curate import validate_rows
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["event_id", "event_type", "value"])
    rules = [
        ("err_type", lambda t: pc.equal(t["event_type"],
                                        pa.scalar("error")).to_numpy(
                                            zero_copy_only=False)),
        ("high_value", lambda t: t["value"].to_numpy() > 400.0),
        ("tiny_value", lambda t: t["value"].to_numpy() < 0.05),
    ]
    flagged = validate_rows(ds, rules)

    def cnt_partial(t: pa.Table) -> pa.Table:
        names = [n for n, _ in rules] + ["clean"]
        vals = [int(pc.sum(pc.cast(t[f"bad_{n}"], pa.int64())).as_py()
                    or 0) for n, _ in rules]
        vals.append(int(pc.sum(pc.cast(pc.equal(t["n_bad"], 0),
                                       pa.int64())).as_py() or 0))
        return pa.table({"rule": pa.array(names, pa.string()),
                         "n": pa.array(vals, pa.int64())})

    df = _for_agg(flagged.map_batches(cnt_partial,
                                      batch_format="pyarrow")) \
        .groupby("rule").aggregate(Sum("n", alias_name="n")).to_pandas()
    df["n"] = df["n"].astype(np.int64)
    return df.sort_values("rule").reset_index(drop=True)


EVENTS_CONTRACT_SQL = """
SELECT 'clean' AS rule,
       CAST(SUM(CASE WHEN event_type <> 'error' AND value <= 400
                      AND value >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n
FROM events
UNION ALL
SELECT 'err_type', CAST(SUM(CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'high_value', CAST(SUM(CASE WHEN value > 400
                                   THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'tiny_value', CAST(SUM(CASE WHEN value < 0.05
                                   THEN 1 ELSE 0 END) AS BIGINT)
FROM events
ORDER BY rule
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


def events_daily_ma7(sf_dir: str) -> pd.DataFrame:
    """Time-series smoothing: per-day event totals with a 7-ROW trailing
    moving average (the ops-dashboard shape). The corpus reduces to
    date-cardinality-bounded per-day partials inside map_batches; the
    day series (bounded by the time SPAN, never data size) finishes on
    the driver where the ordered window runs vectorized — a windowed
    aggregate over an aggregate needs no distributed window machinery.
    The window is over PRESENT days (ROWS BETWEEN 6 PRECEDING), matching
    pandas rolling(7) on the sorted existing rows."""
    ds = _read_pq(_t(sf_dir, "events"), columns=["ts", "value"])

    def day_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"day": t["ts"].to_pandas().dt.floor("D"),
                           "value": t["value"].to_numpy()})
        g = df.groupby("day", as_index=False).agg(
            n=("value", "size"), total_value=("value", "sum"))
        return _arrow(g)

    d = ds.map_batches(day_partial, batch_format="pyarrow").to_pandas() \
        .groupby("day", as_index=False) \
        .agg(n=("n", "sum"), total_value=("total_value", "sum")) \
        .sort_values("day")
    d["ma7"] = d["total_value"].rolling(7, min_periods=1).mean().round(6)
    d["n"] = d["n"].astype(np.int64)
    d["day"] = d["day"].astype("datetime64[us]")
    return d[["day", "n", "ma7"]].reset_index(drop=True)


EVENTS_MA7_SQL = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(value) AS total_value
  FROM events GROUP BY 1)
SELECT day, n,
       ROUND(AVG(total_value) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
FROM d ORDER BY day
"""


def event_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-type z-score outliers (|z| > 2): two streaming passes — moment
    partials (type, n, Σv, Σv²) reduced to a 5-row stats table, then a
    broadcast flag pass. Sample stddev matches SQL STDDEV_SAMP; both
    sides agree to ~1e-13 relative, far from the |z|=2 cut for every
    row in this corpus (the boundary-proximity caveat of any float
    threshold, cf. kmeans_assign_embeddings)."""
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t.column("event_type").to_pandas(),
                           "v": t.column("value").to_numpy()})
        g = df.groupby("event_type")["v"].agg(["count", "sum",
                                               lambda s: (s ** 2).sum()])
        g.columns = ["n", "s1", "s2"]
        return _arrow(g.reset_index())

    agg = _for_agg(ds.map_batches(moments, batch_format="pyarrow")) \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2")).to_pandas()
    m = agg["s1"] / agg["n"]
    s = np.sqrt((agg["s2"] - agg["s1"] ** 2 / agg["n"]) / (agg["n"] - 1))
    stats = {t: (mm, ss) for t, mm, ss in zip(agg["event_type"], m, s)}
    ref = ray.put(stats)

    def flag(t: pa.Table, *, _r=ref) -> pa.Table:
        st = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
        df = t.to_pandas()
        ms = df["event_type"].map(lambda k: st[k][0]).to_numpy()
        ss = df["event_type"].map(lambda k: st[k][1]).to_numpy()
        z = (df["value"].to_numpy() - ms) / ss
        out = df[np.abs(z) > 2.0].copy()
        out["z"] = pd.Series(z, index=df.index)[np.abs(z) > 2.0].round(6)
        return _arrow(out)

    df = ds.map_batches(flag, batch_format="pyarrow").to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


EVENT_OUTLIERS_SQL = """
WITH st AS (SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS s
            FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - st.m) / st.s, 6) AS z
FROM events e JOIN st USING (event_type)
WHERE ABS((e.value - st.m) / st.s) > 2.0
ORDER BY e.event_id
"""


def event_value_p95(sf_dir: str) -> pd.DataFrame:
    """Exact per-group percentile (p95 of value per event_type):
    PERCENTILE_DISC semantics — sorted group, 1-based rank ceil(0.95·n).
    Groups co-partition through the bucketed exchange; each computes its
    percentile in one vectorized pass (no per-group callback)."""
    import math

    from .ops.dedup import _grouped_exchange
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "value"])

    def block(g: pd.DataFrame) -> pa.Table:
        rows = []
        for t, grp in g.groupby("event_type", sort=False):
            v = np.sort(grp["value"].to_numpy())
            rows.append((t, float(v[math.ceil(0.95 * len(v)) - 1])))
        return _arrow(pd.DataFrame(rows, columns=["event_type", "p95"]))

    df = _grouped_exchange(ds, "event_type", block,
                           num_buckets=8).to_pandas()
    return df.sort_values("event_type").reset_index(drop=True)


EVENT_P95_SQL = """
SELECT event_type,
       PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY value) AS p95
FROM events GROUP BY event_type ORDER BY event_type
"""


def _quality_signals_joined(sf_dir: str) -> rd.Dataset:
    """The fused three-signal table (quality, stopword_ratio,
    distinct_ratio, top_bigram_frac per doc) behind quality_filter_docs
    and quality_funnel_docs: three exchange-free signal stages over the
    same pruned read, fused via two doc-keyed bucketed hash joins (the
    scale-honest attach — signal tables are corpus-sized)."""
    from .ops.joins import bucketed_hash_join
    from .ops.runtime import stateless
    from .ops.text import TextScorer, repetition_stats, stopword_stats

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    q = ds.map_batches(stateless(TextScorer), batch_format="pandas") \
        .map_batches(lambda t: t.select(["doc_id", "quality"]),
                     batch_format="pyarrow")
    s = stopword_stats(ds).map_batches(
        lambda t: t.select(["doc_id", "stopword_ratio"]),
        batch_format="pyarrow")
    r = repetition_stats(ds).map_batches(
        lambda t: t.select(["doc_id", "distinct_ratio", "top_bigram_frac"]),
        batch_format="pyarrow")
    return bucketed_hash_join(bucketed_hash_join(q, s, on="doc_id"),
                              r, on="doc_id")


def quality_filter_docs(sf_dir: str) -> pd.DataFrame:
    """The fused corpus quality filter a training pipeline actually runs:
    heuristic quality score + stopword density + within-doc repetition,
    thresholded into one keep decision (signals joined by
    ``_quality_signals_joined``). Thresholds compare the 6dp-ROUNDED
    signals on both sides, so the boundary semantics are bit-identical
    to the oracle."""
    joined = _quality_signals_joined(sf_dir)

    def decide(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(t.column("quality"), 0.6),
                    pc.greater_equal(t.column("stopword_ratio"), 0.04)),
            pc.and_(pc.greater_equal(t.column("distinct_ratio"), 0.35),
                    pc.less_equal(t.column("top_bigram_frac"), 0.1)))
        return t.append_column("keep", keep)

    df = joined.map_batches(decide, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


QUALITY_FILTER_SQL = f"""
WITH q AS ({QUALITY_SCORES_SQL}),
s AS ({STOPWORD_STATS_SQL}),
r AS ({DOC_REPETITION_SQL})
SELECT q.doc_id, q.quality, s.stopword_ratio, r.distinct_ratio,
       r.top_bigram_frac,
       (q.quality >= 0.6 AND s.stopword_ratio >= 0.04
        AND r.distinct_ratio >= 0.35 AND r.top_bigram_frac <= 0.1) AS keep
FROM q JOIN s USING (doc_id) JOIN r USING (doc_id)
ORDER BY q.doc_id
"""


def curation_pipeline_docs(sf_dir: str) -> pd.DataFrame:
    """The composed end-to-end curation run a training-data team ships:
    exact dedup (hash-only exchange, ops/dedup.exact_dedup_ids) →
    fused 3-signal quality filter (_quality_signals_joined thresholds) →
    benchmark decontamination (broadcast gram set, mode='drop') →
    deterministic train/val/test split → per-split (n_docs, sum_chars).
    Every stage is individually oracle-checked elsewhere; HERE the whole
    chain is one value-checked result, so stage composition order and
    the survivor handoffs (two bucketed SEMI joins on doc_id) are what
    the oracle pins. Signals compute over the full corpus on both sides
    (they are pure per-doc functions, so filtering first would not
    change any surviving doc's value)."""
    from .ops.curate import decontaminate, hash_sample, hash_split, \
        _WORD_RE
    from .ops.dedup import exact_dedup_ids
    from .ops.joins import bucketed_hash_join

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    # arrow-normalize: the aggregate behind exact_dedup_ids emits pandas
    # blocks, and union requires both sides in one block format
    dd_ids = exact_dedup_ids(ds).map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow")

    keep_q = _quality_signals_joined(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t.filter(pc.and_(
            pc.and_(pc.greater_equal(t["quality"], 0.6),
                    pc.greater_equal(t["stopword_ratio"], 0.04)),
            pc.and_(pc.greater_equal(t["distinct_ratio"], 0.35),
                    pc.less_equal(t["top_bigram_frac"], 0.1))))
            ["doc_id"]}),
        batch_format="pyarrow")

    # intersect the two survivor-id sets FIRST (ids-only exchange:
    # union + per-id count == 2), so the texts ride through exactly ONE
    # semi-join exchange instead of two
    from ray.data.aggregate import Count as _Count
    keep_ids = dd_ids.union(keep_q).groupby("doc_id") \
        .aggregate(_Count(alias_name="c")) \
        .map_batches(lambda t: pa.table(
            {"doc_id": t.filter(pc.equal(t["c"], 2))["doc_id"]}),
            batch_format="pyarrow")

    sch_dt = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    sch_id = pa.schema([("doc_id", pa.int64())])
    survivors = bucketed_hash_join(
        ds, keep_ids, "doc_id", how="semi",
        left_schema=sch_dt, right_schema=sch_id)

    # benchmark grams come from the FULL corpus (the benchmark exists
    # independently of what the cascade keeps) — same recipe as
    # decontaminate_docs
    def first_gram(batch: pd.DataFrame) -> pd.DataFrame:
        grams = []
        for t in batch["text"].fillna(""):
            w = _WORD_RE.findall(t.lower())
            if len(w) >= 8:
                grams.append(" ".join(w[:8]))
        return pd.DataFrame({"gram": pd.Series(grams, dtype="string")})

    bench = hash_sample(ds, permille=27, salt="bench") \
        .map_batches(first_gram, batch_format="pandas").to_pandas()
    clean = decontaminate(survivors, list(bench["gram"]), n=8,
                          mode="drop")

    def split_partial(t: pa.Table) -> pa.Table:
        lens = [len(x or "") for x in t.column("text").to_pylist()]
        df = pd.DataFrame({"split": t["split"].to_pandas(),
                           "len": lens})
        return _arrow(df.groupby("split", as_index=False).agg(
            n_docs=("len", "size"), sum_chars=("len", "sum")))

    out = hash_split(clean, salt="cur") \
        .map_batches(split_partial, batch_format="pyarrow") \
        .to_pandas().groupby("split", as_index=False) \
        .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    return out.sort_values("split").reset_index(drop=True)


CURATION_PIPELINE_SQL = f"""
WITH q AS ({QUALITY_SCORES_SQL}),
s AS ({STOPWORD_STATS_SQL}),
r AS ({DOC_REPETITION_SQL}),
keepq AS (
  SELECT q.doc_id FROM q JOIN s USING (doc_id) JOIN r USING (doc_id)
  WHERE q.quality >= 0.6 AND s.stopword_ratio >= 0.04
    AND r.distinct_ratio >= 0.35 AND r.top_bigram_frac <= 0.1),
d1 AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT MIN(doc_id) FROM documents
                   GROUP BY md5(coalesce(text, '')))
    AND doc_id IN (SELECT doc_id FROM keepq)),
b AS (
  SELECT array_to_string(
           regexp_extract_all(lower(text), '[a-z0-9_]+')[1:8], ' ') AS gram
  FROM documents
  WHERE md5_number_lower('bench:' || CAST(doc_id AS VARCHAR)) % 1000 < 27
    AND len(regexp_extract_all(lower(text), '[a-z0-9_]+')) >= 8),
clean AS (
  SELECT doc_id, text FROM d1
  WHERE NOT EXISTS (
    SELECT 1 FROM b WHERE contains(
      ' ' || array_to_string(
          regexp_extract_all(lower(coalesce(d1.text, '')),
                             '[a-z0-9_]+'), ' ') || ' ',
      ' ' || b.gram || ' ')))
SELECT CASE WHEN md5_number_lower('cur:' || CAST(doc_id AS VARCHAR))
                 % 1000 < 900 THEN 'train'
            WHEN md5_number_lower('cur:' || CAST(doc_id AS VARCHAR))
                 % 1000 < 950 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(coalesce(text, ''))) AS BIGINT) AS sum_chars
FROM clean GROUP BY 1 ORDER BY 1
"""


_KM_K = 4
_KM_ITERS = 2


def kmeans_assign_embeddings(sf_dir: str) -> pd.DataFrame:
    """Distributed full-corpus Lloyd's k-means (ops/similarity.
    kmeans_lloyd): k=4 centroids seeded from the 4 lowest vec_ids
    (pushdown-filtered read), 2 update iterations, each one streaming
    pass emitting (cluster, dim, Σ, n) partials. Output is the final
    assignment. Parity note: the oracle scores with the same expanded
    form (‖c‖² − 2·x·c via list_inner_product), so Ray and SQL disagree
    only if two centroids are equidistant to ~1e-15 relative — not
    observed on this corpus; ties at equal distance break to the lower
    cluster id on both sides (numpy argmin-first / CASE order)."""
    from .ops.similarity import kmeans_lloyd
    init_t = pq.read_table(_t(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "<", _KM_K)]) \
        .sort_by("vec_id")
    init = np.stack([np.asarray(v, dtype=np.float64)
                     for v in init_t["embedding"].to_pylist()])
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    assign, _cent = kmeans_lloyd(ds, init, iterations=_KM_ITERS)
    return assign.to_pandas().sort_values("vec_id").reset_index(drop=True)


def _kmeans_sql(k: int = _KM_K, iters: int = _KM_ITERS, *,
                vec_expr: str = "CAST(embedding AS DOUBLE[])",
                select_extra: str = "",
                prefix: str = "",
                final_select: str | None = None) -> str:
    """Unrolled k-means oracle: assign/update pairs expand to CTE chains
    (like the PageRank oracle). Scoring uses the SAME expanded euclidean
    form as the Ray side (‖c‖² − 2·x·c — ‖x‖² is rank-invariant), CASE
    order implements the lowest-id tie-break, and an empty cluster keeps
    its previous centroid via a COUNT(*) guard.

    ``vec_expr`` parameterizes the input vector (the PQ oracle passes a
    list SLICE per subspace), ``select_extra`` injects literal output
    columns, ``prefix`` namespaces the CTEs so several chains can UNION
    in one statement."""
    def assign(name: str, cents: list[str]) -> str:
        ds = ",\n         ".join(
            f"list_inner_product({c}, {c})"
            f" - 2 * list_inner_product(e, {c}) AS d{i}"
            for i, c in enumerate(cents))
        cases = []
        for i in range(k - 1):
            conds = " AND ".join(f"d{i} <= d{j}" for j in range(i + 1, k))
            cases.append(f"WHEN {conds} THEN {i}")
        case = "CASE " + " ".join(cases) + f" ELSE {k - 1} END"
        # AS MATERIALIZED: the chain is referenced many times downstream
        # (4 means + the next assign); DuckDB's default CTE inlining would
        # re-evaluate it combinatorially across iterations
        return (f"{name} AS MATERIALIZED (\n"
                f"  SELECT vec_id, e, {case} AS cluster\n"
                f"  FROM (SELECT vec_id, e,\n         {ds}\n"
                f"        FROM e))")

    p = prefix
    ctes = [f"{p}e AS (SELECT vec_id, {vec_expr} AS e FROM embeddings)"]
    cents = [f"(SELECT e FROM {p}e WHERE vec_id = {i})" for i in range(k)]

    def assign_p(name: str, cents: list[str]) -> str:
        # re-point the generic assign body at the prefixed source CTE
        return assign(name, cents).replace("FROM e)", f"FROM {p}e)")

    for it in range(1, iters + 1):
        ctes.append(assign_p(f"{p}a{it}", cents))
        new_cents = []
        for ci in range(k):
            ctes.append(
                f"""{p}m{it}_{ci} AS MATERIALIZED (
  SELECT CASE WHEN (SELECT COUNT(*) FROM {p}a{it} WHERE cluster = {ci}) > 0
              THEN (SELECT list(m ORDER BY dim) FROM
                    (SELECT dim, AVG(v) AS m
                     FROM (SELECT unnest(e) AS v,
                                  generate_subscripts(e, 1) AS dim
                           FROM {p}a{it} WHERE cluster = {ci})
                     GROUP BY dim))
              ELSE {cents[ci]} END AS ce)""")
            new_cents.append(f"(SELECT ce FROM {p}m{it}_{ci})")
        cents = new_cents
    ctes.append(assign_p(f"{p}af", cents))
    if final_select is not None:
        # caller-supplied tail — may reference {p}af and the final centroid
        # selects via {cents} placeholders the caller formats itself
        return ("WITH " + ",\n".join(ctes) + "\n"
                + final_select.format(af=f"{p}af",
                                      **{f"c{i}": c
                                         for i, c in enumerate(cents)}))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT vec_id, {select_extra}"
            + f"CAST(cluster AS BIGINT) AS cluster FROM {p}af"
            + "\nORDER BY vec_id")


KMEANS_ASSIGN_SQL = _kmeans_sql()


def kmeans_quality_embeddings(sf_dir: str) -> pd.DataFrame:
    """Clustering-quality summary (simplified silhouette / Davies-Bouldin
    ingredients): per cluster, the member count, the mean SQUARED distance
    to the OWN centroid and to the NEAREST OTHER centroid — one extra
    streaming pass after Lloyd's converges (distances per block from the
    broadcast k×dim centroid matrix; (cluster, Σ_own, Σ_other, n) partials
    → one k-row groupby). Oracle: the generated kmeans CTE chain with a
    distance-CASE tail over the final assignment — the 4th fully-oracled
    iterative-algorithm surface."""
    from ray.data.aggregate import Sum as _Sum

    from .ops.similarity import _as_matrix, kmeans_lloyd
    init_t = pq.read_table(_t(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "<", _KM_K)]) \
        .sort_by("vec_id")
    init = np.stack([np.asarray(v, dtype=np.float64)
                     for v in init_t["embedding"].to_pylist()])
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    _assign, cents = kmeans_lloyd(ds, init, iterations=_KM_ITERS)
    cc = (cents * cents).sum(axis=1)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"cluster": pd.Series([], dtype="int64"),
                                 "s_own": pd.Series([], dtype="float64"),
                                 "s_other": pd.Series([], dtype="float64"),
                                 "n": pd.Series([], dtype="int64")})
        mat = _as_matrix(batch["embedding"]).astype(np.float64)
        xc = mat @ cents.T
        lab = (-2.0 * xc + cc[None, :]).argmin(axis=1)   # the assign rule
        ee = (mat * mat).sum(axis=1)
        d_full = ee[:, None] - 2.0 * xc + cc[None, :]    # ≡ SQL's a-2b+c
        idx = np.arange(len(lab))
        d_own = d_full[idx, lab]
        masked = d_full.copy()
        masked[idx, lab] = np.inf
        d_other = masked.min(axis=1)
        rows = {"cluster": [], "s_own": [], "s_other": [], "n": []}
        for ci in np.unique(lab):
            m = lab == ci
            rows["cluster"].append(int(ci))
            rows["s_own"].append(float(d_own[m].sum()))
            rows["s_other"].append(float(d_other[m].sum()))
            rows["n"].append(int(m.sum()))
        return pd.DataFrame(rows)

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby("cluster") \
        .aggregate(_Sum("s_own", alias_name="s_own"),
                   _Sum("s_other", alias_name="s_other"),
                   _Sum("n", alias_name="n")).to_pandas()
    agg["mean_intra"] = (agg["s_own"] / agg["n"]).round(6)
    agg["mean_other"] = (agg["s_other"] / agg["n"]).round(6)
    agg["n"] = agg["n"].astype("int64")
    return agg[["cluster", "n", "mean_intra", "mean_other"]] \
        .sort_values("cluster").reset_index(drop=True)


def _kmeans_quality_sql(k: int = _KM_K) -> str:
    dcols = ",\n         ".join(
        f"list_inner_product(e, e) - 2 * list_inner_product(e, {{c{i}}})"
        f" + list_inner_product({{c{i}}}, {{c{i}}}) AS fd{i}"
        for i in range(k))
    own = " ".join(f"WHEN {i} THEN fd{i}" for i in range(k))
    other = " ".join(
        "WHEN {i} THEN LEAST({rest})".format(
            i=i, rest=", ".join(f"fd{j}" for j in range(k) if j != i))
        for i in range(k))
    final = f"""
SELECT CAST(cluster AS BIGINT) AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(d_own) / COUNT(*), 6) AS mean_intra,
       ROUND(SUM(d_other) / COUNT(*), 6) AS mean_other
FROM (
  SELECT cluster, CASE cluster {own} END AS d_own,
         CASE cluster {other} END AS d_other
  FROM (SELECT cluster, e,
         {dcols}
        FROM {{af}}))
GROUP BY cluster ORDER BY cluster"""
    return _kmeans_sql(k=k, final_select=final)


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
    from .ops.graph import pagerank

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
    from .ops.graph import triangle_count

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


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# name → (callable, oracle_sql | None)
def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join (adapted: no commitdate column, so
    the existence predicate is 'order has a returned line'): the date
    window prunes orders at the scan; lineitem reduces to per-batch
    DISTINCT returned orderkeys (keys only — never full lines) and meets
    orders in a bucketed SEMI join; the priority counts finish as
    per-block partials → a 5-row combine."""
    from .ops.joins import bucketed_hash_join
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
    from .ops.joins import bucketed_hash_join
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
    from .ops.joins import bucketed_hash_join
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
    from .ops.joins import bucketed_hash_join
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
    from .ops.joins import bucketed_hash_join
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
    from .ops.joins import bucketed_hash_join

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
    from .ops.joins import bucketed_hash_join
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


def price_percentiles_lineitem(sf_dir: str) -> pd.DataFrame:
    """Exact GLOBAL percentiles of l_extendedprice (PERCENTILE_DISC at
    0.25/0.5/0.75/0.95) via ops/curate.exact_quantiles — the two-pass
    range-bucket counting scheme: pass 1 reduces to 256 bucket counts,
    pass 2 moves only the ≤4 probed buckets' values. No global sort, no
    per-row ranks."""
    from .ops.curate import exact_quantiles
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


def lang_length_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact PER-LANGUAGE length percentiles (PERCENTILE_DISC at
    0.1/0.5/0.9 within each lang) via ops/curate.grouped_exact_quantiles —
    the per-language quality-threshold shape (CCNet's per-lang cuts).
    Pass 1 reduces to (lang, bucket) counts; pass 2 moves only the probed
    (lang, bucket) pairs' values. No sort, no per-row ranks."""
    from .ops.curate import grouped_exact_quantiles
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])
    df = grouped_exact_quantiles(ds, "lang", "n_chars", [0.1, 0.5, 0.9])
    return df.reset_index(drop=True)


LANG_LENGTH_PERCENTILES_SQL = """
SELECT lang, CAST(0.1 AS DOUBLE) AS q,
       CAST(PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY n_chars)
            AS DOUBLE) AS value
FROM documents GROUP BY lang
UNION ALL
SELECT lang, CAST(0.5 AS DOUBLE),
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE)
FROM documents GROUP BY lang
UNION ALL
SELECT lang, CAST(0.9 AS DOUBLE),
       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE)
FROM documents GROUP BY lang
ORDER BY lang, q
"""


def doc_chunks(sf_dir: str) -> pd.DataFrame:
    """Overlapping-window document chunking (ops/text.chunk_documents,
    window=200 chars, stride=150): the context-window splitting stage of
    an LLM data pipeline. Pure local flat expansion — no exchange; chunk
    offsets are characters, matching SQL substring()."""
    from .ops.text import chunk_documents
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    df = chunk_documents(ds, window=200, stride=150).to_pandas()
    return df.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


DOC_CHUNKS_SQL = """
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(0, (length(text) - 1) // 150)) AS gs
  FROM documents WHERE length(coalesce(text, '')) > 0)
SELECT doc_id, CAST(gs AS BIGINT) AS chunk_id,
       substring(text, CAST(gs * 150 + 1 AS BIGINT), 200) AS chunk
FROM g ORDER BY doc_id, chunk_id
"""


_PII_INJECT = (" Contact jane.doe@example.com or +1 555-123-4567"
               " from 10.0.0.1.")


def normalize_docs(sf_dir: str) -> pd.DataFrame:
    """Canonical text normalization (ops/text.normalize_text): NFC +
    whitespace-run collapse + strip over every doc. Every 9th doc gets
    deterministic messy whitespace planted first (mirrored in SQL) so
    the normalizer has real work; the value-hash pins the exact
    normalized strings."""
    from .ops.text import normalize_text
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def messy(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        mask = (df["doc_id"] % 9 == 0)
        df = df.copy()
        df["text"] = t.where(~mask, "  " + t + " \t extra\n\nspace  ")
        return df

    out = normalize_text(ds.map_batches(messy, batch_format="pandas")) \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


NORMALIZE_DOCS_SQL = r"""
WITH v AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0
              THEN '  ' || coalesce(text, '') || ' ' || chr(9)
                   || ' extra' || chr(10) || chr(10) || 'space  '
              ELSE coalesce(text, '') END AS t
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(nfc_normalize(t), '[ \t\n\r]+', ' ', 'g'))
         AS norm_text,
       (trim(regexp_replace(nfc_normalize(t), '[ \t\n\r]+', ' ', 'g'))
        <> t) AS changed
FROM v ORDER BY doc_id
"""


def pii_redact_docs(sf_dir: str) -> pd.DataFrame:
    """PII scrub (ops/text.redact_pii): emails / phones / IPv4 literals →
    placeholder tokens with per-category replacement counts. The corpus
    is PII-free word soup, so every 10th doc gets a deterministic planted
    contact line first (mirrored in the oracle) — the scrubber has real
    work and the hash check is meaningful. Patterns are RE2-compatible
    and shared verbatim with the SQL (built from ops/text.PII_PATTERNS),
    and counts are taken on the progressively-scrubbed text exactly like
    the oracle's nested regexp_replace."""
    from .ops.text import redact_pii
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        mask = (df["doc_id"] % 10 == 0)
        df = df.copy()
        df["text"] = t.where(~mask, t + _PII_INJECT)
        return df

    out = redact_pii(ds.map_batches(inject, batch_format="pandas")) \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _pii_sql() -> str:
    from .ops.text import PII_PATTERNS
    (em, em_r), (ph, ph_r), (ip, ip_r) = PII_PATTERNS
    return f"""
WITH v AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN coalesce(text, '') || ' {_PII_INJECT.strip()}'
              ELSE coalesce(text, '') END AS t0
  FROM documents),
s1 AS (SELECT doc_id, t0,
              regexp_replace(t0, '{em}', '{em_r}', 'g') AS t1 FROM v),
s2 AS (SELECT doc_id, t0, t1,
              regexp_replace(t1, '{ph}', '{ph_r}', 'g') AS t2 FROM s1)
SELECT doc_id,
       regexp_replace(t2, '{ip}', '{ip_r}', 'g') AS clean_text,
       CAST(len(regexp_extract_all(t0, '{em}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t1, '{ph}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t2, '{ip}')) AS BIGINT) AS n_ip
FROM s2 ORDER BY doc_id
"""


def quality_funnel_docs(sf_dir: str) -> pd.DataFrame:
    """Filter-cascade accounting — how many docs survive each prefix of
    the quality_filter_docs cascade (total → quality → +stopword →
    +repetition), the per-stage attrition report a curation run ships
    with. One extra pass over the fused signal table: each block emits a
    4-row cumulative-count partial; a 4-group combine finishes."""
    joined = _quality_signals_joined(sf_dir)

    def funnel_partial(t: pa.Table) -> pa.Table:
        q = t.column("quality").to_numpy()
        s = t.column("stopword_ratio").to_numpy()
        d = t.column("distinct_ratio").to_numpy()
        b = t.column("top_bigram_frac").to_numpy()
        c1 = q >= 0.6
        c2 = c1 & (s >= 0.04)
        c3 = c2 & (d >= 0.35) & (b <= 0.1)
        return pa.table({
            "stage": pa.array([0, 1, 2, 3], pa.int64()),
            "n": pa.array([len(q), int(c1.sum()), int(c2.sum()),
                           int(c3.sum())], pa.int64())})

    df = _for_agg(joined.map_batches(funnel_partial,
                                     batch_format="pyarrow")) \
        .groupby("stage").aggregate(Sum("n", alias_name="n")).to_pandas()
    return df.sort_values("stage").reset_index(drop=True)


QUALITY_FUNNEL_SQL = f"""
WITH q AS ({QUALITY_SCORES_SQL}),
s AS ({STOPWORD_STATS_SQL}),
r AS ({DOC_REPETITION_SQL}),
j AS (SELECT q.quality, s.stopword_ratio, r.distinct_ratio,
             r.top_bigram_frac
      FROM q JOIN s USING (doc_id) JOIN r USING (doc_id))
SELECT CAST(0 AS BIGINT) AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM j
UNION ALL
SELECT 1, CAST(SUM(CASE WHEN quality >= 0.6 THEN 1 ELSE 0 END)
               AS BIGINT) FROM j
UNION ALL
SELECT 2, CAST(SUM(CASE WHEN quality >= 0.6 AND stopword_ratio >= 0.04
                        THEN 1 ELSE 0 END) AS BIGINT) FROM j
UNION ALL
SELECT 3, CAST(SUM(CASE WHEN quality >= 0.6 AND stopword_ratio >= 0.04
                        AND distinct_ratio >= 0.35
                        AND top_bigram_frac <= 0.1
                        THEN 1 ELSE 0 END) AS BIGINT) FROM j
ORDER BY stage
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
    from .ops.dedup import _grouped_exchange

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
    from .ops.joins import bucketed_hash_join

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


def event_transitions(sf_dir: str) -> pd.DataFrame:
    """Markov transition counts over per-user event sequences (the
    journey-analysis shape: LEAD() window → pair counts). Users
    co-partition by hash (ops.dedup._grouped_exchange, the sessionize
    pattern); each bucket sorts once by (user, ts, event_id) and shifts —
    no per-user callback; pair counts reduce as per-bucket partials into
    a #types² combine."""
    from .ops.dedup import _grouped_exchange
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["user_id", "ts", "event_id", "event_type"])

    def block(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        nxt = g["event_type"].shift(-1)
        same = g["user_id"].eq(g["user_id"].shift(-1))
        p = pd.DataFrame({"event_type": g["event_type"],
                          "next_type": nxt})[same]
        return _arrow(p.groupby(["event_type", "next_type"],
                                as_index=False).size()
                      .rename(columns={"size": "n"}))

    df = _for_agg(_grouped_exchange(ds, "user_id", block)) \
        .groupby(["event_type", "next_type"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    df["n"] = df["n"].astype(np.int64)
    return df.sort_values(["event_type", "next_type"]) \
        .reset_index(drop=True)


EVENT_TRANSITIONS_SQL = """
WITH s AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE next_type IS NOT NULL
GROUP BY event_type, next_type ORDER BY event_type, next_type
"""


def bloom_semi_revenue(sf_dir: str) -> pd.DataFrame:
    """Runtime-filter pushdown (the distributed-SQL bloom-join pattern,
    ops/joins.bloom_semi_prefilter): revenue by returnflag over lineitems
    of URGENT orders. The urgent orderkeys build a CONSTANT-size Bloom
    bitmap (broadcast once); lineitem drops definite non-matches BEFORE
    any exchange (~4/5 of the table at ~0.1% fp), then the exact bucketed
    SEMI join removes false positives — the result is exactly the plain
    join's, the Bloom only cut the exchange volume."""
    from .ops.joins import bloom_semi_prefilter, bucketed_hash_join

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


def lm_quality_docs(sf_dir: str) -> pd.DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al., 2020) with a
    char-bigram model (the sandbox-honest KenLM stand-in, ops/text):
    one counting pass trains the charset-bounded model, the broadcast
    scoring pass emits per-doc mean Laplace log-likelihood. Float note:
    per-doc LN terms are exact both sides (integer counts), only the
    summation order differs — ~1e-12 drift vs the 6dp rounding, same
    envelope as event_outliers."""
    from .ops.text import score_char_bigram_lm, train_char_bigram_lm
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    model = train_char_bigram_lm(ds)
    df = score_char_bigram_lm(ds, model).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


LM_QUALITY_SQL = """
WITH ex AS (
  SELECT doc_id, substring(text, CAST(i AS BIGINT), 2) AS b
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 1)) AS i
        FROM documents WHERE length(coalesce(text, '')) >= 2)),
bgc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cb FROM ex GROUP BY b),
uc AS (SELECT substring(b, 1, 1) AS u, CAST(SUM(cb) AS BIGINT) AS cu
       FROM bgc GROUP BY 1),
v AS (SELECT COUNT(*) AS nv FROM uc)
SELECT e.doc_id,
       ROUND(SUM(LN((bgc.cb + 1.0) / (uc.cu + v.nv))) / COUNT(*), 6)
         AS logprob
FROM ex e
JOIN bgc USING (b)
JOIN uc ON uc.u = substring(e.b, 1, 1)
CROSS JOIN v
GROUP BY e.doc_id ORDER BY e.doc_id
"""


_PQ_M = 4
_PQ_K = 4
_PQ_ITERS = 1


def pq_codes_embeddings(sf_dir: str) -> pd.DataFrame:
    """Product-quantization encoding (ops/similarity.pq_codes): 4
    subspaces × 4-centroid codebooks (seeded from vecs 0..3, 1 Lloyd's
    iteration each), every vector encoded to its per-subspace argmin —
    the third fully-oracled ITERATIVE algorithm (after PageRank and
    k-means). The oracle unions 4 generated kmeans CTE chains, each over
    a list SLICE of the embedding."""
    from .ops.similarity import pq_codes
    init_t = pq.read_table(_t(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "<", _PQ_K)]) \
        .sort_by("vec_id")
    init = np.stack([np.asarray(v, dtype=np.float64)
                     for v in init_t["embedding"].to_pylist()])
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    codes, _books = pq_codes(ds, init, m=_PQ_M, iterations=_PQ_ITERS)
    return codes.to_pandas().sort_values(["vec_id", "sub"]) \
        .reset_index(drop=True)


def _pq_sql(m: int = _PQ_M, k: int = _PQ_K,
            iters: int = _PQ_ITERS, dim: int = 64) -> str:
    dsub = dim // m
    parts = []
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        inner = _kmeans_sql(
            k, iters,
            vec_expr=f"(CAST(embedding AS DOUBLE[]))[{lo}:{hi}]",
            select_extra=f"CAST({s} AS BIGINT) AS sub, ",
            prefix=f"p{s}_")
        parts.append(f"SELECT vec_id, sub, cluster AS code\n"
                     f"FROM ({inner})")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY vec_id, sub"


PQ_CODES_SQL = _pq_sql()


def hybrid_retrieval_rrf(sf_dir: str) -> pd.DataFrame:
    """Hybrid dense+sparse retrieval with reciprocal-rank fusion
    (Cormack et al., 2009): BM25 top-20 for {hash, join, window} fuses
    with cosine top-20 for query vec 0 via Σ 1/(60+rank), joined on the
    aligned doc_id/vec_id key. Both lists rank by their 6dp-ROUNDED
    score with an id tie-break (the bm25_topk ULP-stability trick,
    applied to the dense side too), so the ranks — and therefore the
    fused scores, integer-rank rationals — are bit-exact against SQL.
    Each side is its own bounded-driver-finish top-k pipeline; fusion
    touches only 2·k rows."""
    from .ops.curate import bm25_topk
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    sp = bm25_topk(ds, ["hash", "join", "window"], 20)
    sp = sp.sort_values(["score", "doc_id"], ascending=[False, True])
    sp["r"] = np.arange(1, len(sp) + 1)

    qv = _query_vec(sf_dir)
    qn = qv / np.linalg.norm(qv)
    qref = ray.put(qn)

    def dense_block(t: pa.Table) -> pa.Table:
        q = ray.get(qref) if not isinstance(qref, np.ndarray) else qref
        M = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        M = M.astype(np.float64)
        c = (M @ q) / np.linalg.norm(M, axis=1)
        df = pd.DataFrame({"doc_id": t["vec_id"].to_pandas(),
                           "c": np.round(c, 6)})
        return _arrow(_topk(df, ["c", "doc_id"], [False, True], 20))

    emb = _read_pq(_t(sf_dir, "embeddings"),
                   columns=["vec_id", "embedding"])
    dn = _topk(emb.map_batches(dense_block, batch_format="pyarrow")
               .to_pandas(), ["c", "doc_id"], [False, True], 20)
    dn["r"] = np.arange(1, len(dn) + 1)

    fused = pd.concat([sp[["doc_id", "r"]], dn[["doc_id", "r"]]])
    fused["s"] = 1.0 / (60.0 + fused["r"])
    out = fused.groupby("doc_id", as_index=False)["s"].sum()
    out["rrf"] = out["s"].round(6)
    out = _topk(out, ["rrf", "doc_id"], [False, True], 10)
    return out[["doc_id", "rrf"]].sort_values("doc_id") \
        .reset_index(drop=True)


HYBRID_RRF_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
       FROM toks GROUP BY doc_id),
st AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
              CAST((SELECT COUNT(*) FROM toks) AS DOUBLE)
                / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                AS avgdl),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM toks WHERE term IN ('hash', 'join', 'window')
       GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id,
              ROUND(SUM(ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                        * tf.tf * (1.2 + 1.0)
                        / (tf.tf + 1.2 * (1.0 - 0.75
                                          + 0.75 * dl.dl / st.avgdl))),
                    6) AS score
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id), st
       GROUP BY tf.doc_id),
sp AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
       FROM (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 20)),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id = 0),
dn AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS r
       FROM (SELECT vec_id AS doc_id,
                    ROUND(list_cosine_similarity(
                        CAST(embedding AS DOUBLE[]),
                        (SELECT qe FROM q)), 6) AS c
             FROM embeddings ORDER BY c DESC, doc_id LIMIT 20)),
u AS (SELECT doc_id, 1.0 / (60.0 + r) AS s FROM sp
      UNION ALL
      SELECT doc_id, 1.0 / (60.0 + r) FROM dn)
SELECT doc_id, ROUND(SUM(s), 6) AS rrf FROM u GROUP BY doc_id
ORDER BY ROUND(SUM(s), 6) DESC, doc_id LIMIT 10
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
    from .ops.multimodal import _md5_u64

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


# ---------------------------------------------------------------------------
# Exact substring dedup (ops/substr.py — Lee et al. 2021 ExactSubstr family,
# VERDICT r3 item 1). Planted-passage full-value oracles: a fixed 22-word
# passage is appended to every doc_id % 7 == 0 document identically on both
# sides; with min_len=20 its windows are the only duplicated grams in the
# word-soup corpus (and if a natural duplicate ever appeared, both sides
# would flag it identically — the oracle encodes the DEFINITION, not the
# plant).
# ---------------------------------------------------------------------------

_DUP_PASSAGE = ("exact substring deduplication removes long verbatim "
                "passages repeated across training corpora improving "
                "language model perplexity and reducing memorization of "
                "duplicated content measurably")


def _docs_with_planted_passage(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df["doc_id"] % 7 == 0
        df.loc[m, "text"] = df.loc[m, "text"] + " " + _DUP_PASSAGE
        return _arrow(df)

    return ds.map_batches(plant, batch_format="pyarrow")


def duplicate_spans_planted(sf_dir: str) -> pd.DataFrame:
    from .ops.substr import duplicate_spans
    sp = duplicate_spans(_docs_with_planted_passage(sf_dir), min_len=20)
    df = sp.to_pandas().astype({"doc_id": "int64"})
    return df.sort_values(["doc_id", "start_tok"]).reset_index(drop=True)


def strip_dup_spans_planted(sf_dir: str) -> pd.DataFrame:
    from .ops.substr import strip_duplicate_spans
    out = strip_duplicate_spans(_docs_with_planted_passage(sf_dir),
                                min_len=20)
    df = out.to_pandas().astype({"doc_id": "int64"})
    return df.sort_values("doc_id").reset_index(drop=True)


_SUBSTR_CTE = f"""
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' {_DUP_PASSAGE}'
              ELSE text END AS text
  FROM documents),
toks AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
         FROM base),
g AS (SELECT doc_id, unnest(generate_series(1, len(tk) - 19)) AS pos, tk
      FROM toks),
grams AS (SELECT doc_id, pos,
                 array_to_string(tk[pos : pos + 19], ' ') AS gram
          FROM g),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (gram)),
m AS (SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) <= 20
                  THEN 0 ELSE 1 END AS brk
      FROM hits),
isl AS (SELECT doc_id, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM m)
"""

DUP_SPANS_SQL = f"""
WITH {_SUBSTR_CTE}
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_tok,
       CAST(MAX(pos) + 20 AS BIGINT) AS end_tok,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, start_tok
"""

STRIP_DUP_SQL = f"""
WITH {_SUBSTR_CTE},
spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 20 AS e
          FROM isl GROUP BY doc_id, island),
alltok AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS i, tk
           FROM toks),
kept AS (SELECT a.doc_id, a.i, a.tk[a.i] AS tok
         FROM alltok a
         WHERE NOT EXISTS (SELECT 1 FROM spans s
                           WHERE s.doc_id = a.doc_id
                             AND a.i >= s.s AND a.i < s.e))
SELECT t.doc_id, COALESCE(k.ct, '') AS clean_text
FROM toks t LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ct
                       FROM kept GROUP BY doc_id) k USING (doc_id)
ORDER BY t.doc_id
"""


REGISTRY: dict = {
    "lm_quality_docs": (lm_quality_docs, LM_QUALITY_SQL),
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "duplicate_spans_planted": (duplicate_spans_planted, DUP_SPANS_SQL),
    "strip_dup_spans_planted": (strip_dup_spans_planted, STRIP_DUP_SQL),
    "hybrid_retrieval_rrf": (hybrid_retrieval_rrf, HYBRID_RRF_SQL),
    "pq_codes_embeddings": (pq_codes_embeddings, PQ_CODES_SQL),
    "jsonl_roundtrip_docs": (jsonl_roundtrip_docs, JSONL_ROUNDTRIP_SQL),
    "csv_roundtrip_events": (csv_roundtrip_events, CSV_ROUNDTRIP_SQL),
    "range_export_pruned": (range_export_pruned, RANGE_EXPORT_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q10_returned_revenue": (q10_returned_revenue, Q10_SQL),
    "q12_priority_lines": (q12_priority_lines, Q12_SQL),
    "q14_promo_revenue_ratio": (q14_promo_revenue_ratio, Q14_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "revenue_by_nation": (revenue_by_nation, REVENUE_BY_NATION_SQL),
    "top_orders_per_customer": (top_orders_per_customer, TOP_ORDERS_SQL),
    "events_props_stats": (events_props_stats, EVENTS_PROPS_SQL),
    "distinct_users_per_type": (distinct_users_per_type, DISTINCT_USERS_SQL),
    "orders_without_lineitems": (orders_without_lineitems,
                                 ORDERS_WITHOUT_LINEITEMS_SQL),
    "neardup_clusters_docs": (neardup_clusters_docs, None),
    "dedup_filter_docs": (dedup_filter_docs, None),
    "dedup_filter_exact_docs": (dedup_filter_exact_docs,
                                DEDUP_FILTER_EXACT_SQL),
    "neardup_clusters_exact_docs": (neardup_clusters_exact_docs,
                                    NEARDUP_CLUSTERS_EXACT_SQL),
    "extract_error_stats": (extract_error_stats, EXTRACT_ERROR_STATS_SQL),
    "frontier_buckets": (frontier_buckets, FRONTIER_BUCKETS_SQL),
    "part_brand_qty": (part_brand_qty, PART_BRAND_SQL),
    "orders_priority_count": (orders_priority_count, ORDERS_PRIORITY_SQL),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "sessionize_events": (sessionize_events, SESSIONIZE_SQL),
    "last_click_before_purchase": (last_click_before_purchase,
                                   LAST_CLICK_SQL),
    "events_sliding_window": (events_sliding_window, EVENTS_SLIDING_SQL),
    "clicks_before_purchase_1h": (clicks_before_purchase_1h,
                                  CLICKS_BEFORE_PURCHASE_SQL),
    "funnel_counts": (funnel_counts, FUNNEL_SQL),
    "lang_count": (lang_count, LANG_COUNT_SQL),
    "doc_token_stats": (doc_token_stats, DOC_TOKEN_STATS_SQL),
    "doc_fingerprints": (doc_fingerprints, DOC_FINGERPRINTS_SQL),
    "quality_scores": (quality_scores, QUALITY_SCORES_SQL),
    "stopword_stats_docs": (stopword_stats_docs, STOPWORD_STATS_SQL),
    "lang_id_scores": (lang_id_scores, LANG_ID_SQL),
    "dedup_exact_docs": (dedup_exact_docs, DEDUP_EXACT_SQL),
    "minhash_neardup_docs": (minhash_neardup_docs, None),
    "simhash_neardup_docs": (simhash_neardup_docs, None),
    "jaccard_verified_neardup_docs": (jaccard_verified_neardup_docs, None),
    "embedding_neardup": (embedding_neardup, None),
    "embedding_neardup_planted": (embedding_neardup_planted,
                                  EMBEDDING_NEARDUP_PLANTED_SQL),
    "simhash_exact_neardup_docs": (simhash_exact_neardup_docs,
                                   SIMHASH_EXACT_SQL),
    "ngram_jaccard_neardup_docs": (ngram_jaccard_neardup_docs, None),
    "ngram_jaccard_planted": (ngram_jaccard_planted,
                              NGRAM_JACCARD_PLANTED_SQL),
    "ngram_jaccard_exact_docs": (ngram_jaccard_exact_docs,
                                 NGRAM_JACCARD_EXACT_SQL),
    "topk_cosine_bruteforce": (topk_cosine_bruteforce, TOPK_COSINE_SQL),
    "topk_cosine_multiquery": (topk_cosine_multiquery,
                               TOPK_COSINE_MULTI_SQL),
    "topk_cosine_lsh": (topk_cosine_lsh, None),
    "topk_cosine_lsh_full_probe": (topk_cosine_lsh_full_probe,
                                   TOPK_COSINE_SQL),
    "topk_cosine_ivf": (topk_cosine_ivf, None),
    "topk_cosine_ivf_full_probe": (topk_cosine_ivf_full_probe,
                                   TOPK_COSINE_SQL),
    "topk_cosine_ivfpq": (topk_cosine_ivfpq, None),
    "topk_cosine_ivfpq_full_probe": (topk_cosine_ivfpq_full_probe,
                                     TOPK_COSINE_SQL),
    "ivf_recall_at_k": (ivf_recall_at_k, _ivf_recall_sql()),
    "embedding_label_count": (embedding_label_count, EMB_LABEL_SQL),
    "extract_spans_synthetic": (extract_spans_synthetic, None),
    "extract_relations_dedup": (extract_relations_dedup, None),
    "extract_nodes_fused": (extract_nodes_fused, None),
    "neo4j_export_counts": (neo4j_export_counts, None),
    "extract_flagship_documents": (extract_flagship_documents,
                                   EXTRACT_FLAGSHIP_SQL),
    "pdf_roundtrip_docs": (pdf_roundtrip_docs, PDF_ROUNDTRIP_SQL),
    "sample_docs_hash": (sample_docs_hash, SAMPLE_DOCS_HASH_SQL),
    "split_assign_docs": (split_assign_docs, SPLIT_ASSIGN_SQL),
    "quota_cap_docs": (quota_cap_docs, QUOTA_CAP_SQL),
    "stratified_sample_docs": (stratified_sample_docs,
                               STRATIFIED_SAMPLE_SQL),
    "vocab_top_terms": (vocab_top_terms, VOCAB_TOP_TERMS_SQL),
    "posting_lists_docs": (posting_lists_docs, POSTING_LISTS_SQL),
    "decontaminate_docs": (decontaminate_docs, DECONTAMINATE_SQL),
    "pack_docs_budget": (pack_docs_budget, PACK_DOCS_SQL),
    "mixture_sample_docs": (mixture_sample_docs, MIXTURE_SAMPLE_SQL),
    "leakage_safe_split_docs": (leakage_safe_split_docs,
                                LEAKAGE_SAFE_SPLIT_SQL),
    "quality_deciles_docs": (quality_deciles_docs, QUALITY_DECILES_SQL),
    "length_percentiles_docs": (length_percentiles_docs,
                                LENGTH_PERCENTILES_SQL),
    "split_export_roundtrip": (split_export_roundtrip, SPLIT_EXPORT_SQL),
    "streaming_dedup_count": (streaming_dedup_count,
                              STREAMING_DEDUP_COUNT_SQL),
    "hll_registers_users": (hll_registers_users, HLL_REGISTERS_SQL),
    "approx_users_by_type": (approx_users_by_type, APPROX_BY_TYPE_SQL),
    "approx_distinct_users": (approx_distinct_users, APPROX_DISTINCT_SQL),
    "cms_counters_users": (cms_counters_users, CMS_COUNTERS_SQL),
    "bloom_bits_users": (bloom_bits_users, BLOOM_BITS_SQL),
    "heavy_hitters_users": (heavy_hitters_users, HEAVY_HITTERS_SQL),
    "priority_sample_docs": (priority_sample_docs, PRIORITY_SAMPLE_SQL),
    "events_cube": (events_cube, EVENTS_CUBE_SQL),
    "bm25_topk_docs": (bm25_topk_docs, BM25_TOPK_SQL),
    "pagerank_lineitem": (pagerank_lineitem, PAGERANK_SQL),
    "triangle_count_lineitem": (triangle_count_lineitem,
                                TRIANGLE_COUNT_SQL),
    "doc_repetition_stats": (doc_repetition_stats, DOC_REPETITION_SQL),
    "cross_doc_ngram_docs": (cross_doc_ngram_docs, CROSS_DOC_NGRAM_SQL),
    "token_pmi_docs": (token_pmi_docs, TOKEN_PMI_SQL),
    "skipgram_cooc_docs": (skipgram_cooc_docs, SKIPGRAM_COOC_SQL),
    "orders_pivot_status": (orders_pivot_status, ORDERS_PIVOT_SQL),
    "orders_pivot_roundtrip": (orders_pivot_roundtrip,
                               ORDERS_PIVOT_ROUNDTRIP_SQL),
    "lineitem_correlations": (lineitem_correlations, LINEITEM_CORR_SQL),
    "media_binary_dedup": (media_binary_dedup, MEDIA_BINARY_DEDUP_SQL),
    "events_value_histogram": (events_value_histogram,
                               EVENTS_HISTOGRAM_SQL),
    "phrase_search_docs": (phrase_search_docs, PHRASE_SEARCH_SQL),
    "ngram_containment_planted": (ngram_containment_planted,
                                  NGRAM_CONTAINMENT_SQL),
    "zorder_cells_lineitem": (zorder_cells_lineitem, _zorder_cells_sql()),
    "zorder_range_pruned": (zorder_range_pruned, ZORDER_RANGE_SQL),
    "events_equidepth_histogram": (events_equidepth_histogram,
                                   EVENTS_EQUIDEPTH_SQL),
    "kmeans_quality_embeddings": (kmeans_quality_embeddings,
                                  _kmeans_quality_sql()),
    "cohort_retention_orders": (cohort_retention_orders,
                                COHORT_RETENTION_SQL),
    "fuzzy_match_suppliers": (fuzzy_match_suppliers, FUZZY_MATCH_SQL),
    "event_value_trend": (event_value_trend, EVENT_TREND_SQL),
    "degree_assortativity_lineitem": (degree_assortativity_lineitem,
                                      DEGREE_ASSORT_SQL),
    "cc_labels_lineitem": (cc_labels_lineitem, _cc_sql()),
    "kcore_lineitem": (kcore_lineitem, _kcore_sql()),
    "lang_confusion_docs": (lang_confusion_docs, _lang_confusion_sql()),
    "pca_top_component_embeddings": (pca_top_component_embeddings,
                                     _pca_sql()),
    "logreg_gd_embeddings": (logreg_gd_embeddings, _logreg_sql()),
    "ab_test_events": (ab_test_events, AB_TEST_SQL),
    "char_entropy_docs": (char_entropy_docs, CHAR_ENTROPY_SQL),
    "cumulative_users_daily": (cumulative_users_daily,
                               CUMULATIVE_USERS_SQL),
    "heavy_bigrams_docs": (heavy_bigrams_docs, HEAVY_BIGRAMS_SQL),
    "bpe_merges_docs": (bpe_merges_docs, BPE_MERGES_SQL),
    "bpe_encode_docs": (bpe_encode_docs,
                        _bpe_sql(8, final_select=BPE_ENCODE_SQL_TAIL)),
    "uniform_sample_docs": (uniform_sample_docs, UNIFORM_SAMPLE_SQL),
    "topk_retrieve_docs": (topk_retrieve_docs, TOPK_RETRIEVE_SQL),
    "kmeans_assign_embeddings": (kmeans_assign_embeddings,
                                 KMEANS_ASSIGN_SQL),
    "quality_filter_docs": (quality_filter_docs, QUALITY_FILTER_SQL),
    "curation_pipeline_docs": (curation_pipeline_docs,
                               CURATION_PIPELINE_SQL),
    "corpus_diff_docs": (corpus_diff_docs, CORPUS_DIFF_SQL),
    "incremental_lang_stats": (incremental_lang_stats,
                               INCREMENTAL_LANG_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "q19_discounted_revenue": (q19_discounted_revenue, Q19_SQL),
    "q16_supplier_cnt": (q16_supplier_cnt, Q16_SQL),
    "q20_dominant_suppliers": (q20_dominant_suppliers, Q20_SQL),
    "doc_chunks": (doc_chunks, DOC_CHUNKS_SQL),
    "pii_redact_docs": (pii_redact_docs, _pii_sql()),
    "normalize_docs": (normalize_docs, NORMALIZE_DOCS_SQL),
    "quality_funnel_docs": (quality_funnel_docs, QUALITY_FUNNEL_SQL),
    "event_transitions": (event_transitions, EVENT_TRANSITIONS_SQL),
    "bloom_semi_revenue": (bloom_semi_revenue, BLOOM_SEMI_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q22_sales_opportunity": (q22_sales_opportunity, Q22_SQL),
    "lang_length_percentiles": (lang_length_percentiles,
                                LANG_LENGTH_PERCENTILES_SQL),
    "price_percentiles_lineitem": (price_percentiles_lineitem,
                                   PRICE_PERCENTILES_SQL),
    "event_outliers": (event_outliers, EVENT_OUTLIERS_SQL),
    "events_daily_ma7": (events_daily_ma7, EVENTS_MA7_SQL),
    "events_contract_check": (events_contract_check, EVENTS_CONTRACT_SQL),
    "lineitem_profile": (lineitem_profile, LINEITEM_PROFILE_SQL),
    "event_value_p95": (event_value_p95, EVENT_P95_SQL),
    "classify_embeddings": (classify_embeddings, CLASSIFY_SQL),
    "event_interval_join": (event_interval_join, EVENT_INTERVAL_SQL),
    "label_centroids_embeddings": (label_centroids_embeddings,
                                   LABEL_CENTROIDS_SQL),
    "asof_purchase_click": (asof_purchase_click, ASOF_PURCHASE_CLICK_SQL),
    "semantic_dedup_planted": (semantic_dedup_planted,
                               SEMANTIC_DEDUP_PLANTED_SQL),
    "media_features": (media_features, MEDIA_FEATURES_SQL),
    "media_video_frames": (media_video_frames, MEDIA_VIDEO_FRAMES_SQL),
    "media_audio_features": (media_audio_features, None),
    "media_audio_headers": (media_audio_headers, MEDIA_AUDIO_HEADERS_SQL),
}
