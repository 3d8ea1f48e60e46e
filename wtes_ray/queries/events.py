from ._common import *  # noqa: F401,F403
from .tpch import *  # noqa: F401,F403
from .relational import *  # noqa: F401,F403



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
    from ..ops.dedup import _grouped_exchange
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
    from ..ops.dedup import _grouped_exchange
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
    from ..ops.dedup import _grouped_exchange
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



def funnel_counts(sf_dir: str) -> pd.DataFrame:
    """Sequential-pattern funnel over events: users whose FIRST view is
    followed by a click, whose first such click is followed by a
    purchase (strict first-occurrence ordering). Per-user state is
    bucket-local (the `_grouped_exchange` co-partition by user), each
    bucket reduces to ONE partial row of three counts, and the driver
    sums buckets — nothing user-level ever leaves the workers."""
    from ..ops.dedup import _grouped_exchange
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



def hll_registers_users(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog registers over events.user_id — the full 2^12-bucket
    register table, EXACT-integer oracle-checked (ranks via bit_length
    on both sides: ``length(bin(rem))`` in DuckDB; no float log2
    anywhere). Each batch pre-reduces to per-bucket maxima, the
    exchange is a ≤4096-group max."""
    from ..ops.sketch import hll_registers
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
    from ..ops.sketch import approx_distinct
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

    from ..ops.sketch import grouped_approx_distinct
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
    from ..ops.sketch import cms_counters
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
    from ..ops.sketch import bloom_bits
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
    from ..ops.sketch import heavy_hitters
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])
    return heavy_hitters(ds, "user_id", threshold=80)



HEAVY_HITTERS_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id HAVING COUNT(*) >= 80
ORDER BY user_id
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



def asof_purchase_click(sf_dir: str) -> pd.DataFrame:
    """Global (non-keyed) as-of join: every purchase event picks up the
    value of the LATEST click anywhere in the stream at-or-before its
    timestamp. A hash exchange can't express this — the match may sit in
    another partition — so it runs through ops/joins.global_asof_join's
    range-bucket + driver-prefix carry-in. Clicks pre-reduce to one tick
    per timestamp (MAX value) to make the match unique on both sides."""
    from ray.data.aggregate import Max

    from ..ops.joins import global_asof_join

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

    from ..ops.joins import interval_join

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



def cohort_retention_orders(sf_dir: str) -> pd.DataFrame:
    """Cohort retention (the classic two-level analytics shape): cohort =
    a customer's FIRST order year; output = distinct customers per
    (cohort, order year). ONE customer-keyed bucketed exchange does
    everything (customers are disjoint across buckets, so the cohort
    assignment, the distinct (cust, year) reduction AND the per-bucket
    (cohort, year) partial counts all happen inside the bucket — no
    broadcast, no second exchange); the driver combine is bounded by
    years² rows. Rewritten in round 5 from a 3-aggregate chain: Ray's
    sort-based Aggregate measured ~5 s per hop on the many-tiny-block
    layouts the first groupby emits (SCALING.md aggregate-pathology
    note), and this shape is also the scale-correct one — it ships each
    order row exactly once."""
    from ..ops.dedup import _grouped_exchange

    ds = _read_pq(_t(sf_dir, "orders"),
                  columns=["o_custkey", "o_orderdate"])

    def cust_year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cust": df["o_custkey"].astype("int64"),
            "o_year": df["o_orderdate"].dt.year.astype("int64")})

    def bucket(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates()
        fy = g.groupby("cust")["o_year"].min()
        out = pd.DataFrame({
            "cohort": g["cust"].map(fy).astype("int64"),
            "o_year": g["o_year"].to_numpy()})
        part = out.groupby(["cohort", "o_year"], as_index=False) \
            .size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(part, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = _grouped_exchange(
        ds.map_batches(cust_year, batch_format="pandas"), "cust",
        bucket).to_pandas()
    out = parts.groupby(["cohort", "o_year"], as_index=False)["n"].sum() \
        .rename(columns={"n": "n_customers"})
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
    from ..ops.curate import exact_quantiles
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



def events_contract_check(sf_dir: str) -> pd.DataFrame:
    """Data-contract validation (ops/curate.validate_rows): three named
    row predicates over events (error-type rows, value > 400,
    value < 0.05) evaluated vectorized per batch — no exchange — with
    violation accounting reduced from per-batch partials plus a 'clean'
    row (violates nothing). Predicates compare STORED values (no
    arithmetic), so the counts are bit-exact against SQL."""
    from ..ops.curate import validate_rows
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

    from ..ops.dedup import _grouped_exchange
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



def event_transitions(sf_dir: str) -> pd.DataFrame:
    """Markov transition counts over per-user event sequences (the
    journey-analysis shape: LEAD() window → pair counts). Users
    co-partition by hash (ops.dedup._grouped_exchange, the sessionize
    pattern); each bucket sorts once by (user, ts, event_id) and shifts —
    no per-user callback; pair counts reduce as per-bucket partials into
    a #types² combine."""
    from ..ops.dedup import _grouped_exchange
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


def kmv_distinct_users(sf_dir: str) -> pd.DataFrame:
    """KMV (k-minimum-values) distinct-user sketch over events — the
    third mergeable distinct counter next to HLL (exact-state oracle) and
    the exact groupby. Per-block k-minima partials ride the exchange
    (blocks × k hashes max), the driver merge is k-bounded, and the whole
    state + estimate is a pure function of the DISTINCT md5 key set — so
    DuckDB reproduces sketch AND estimate bit-comparably (same
    ``(k−1)/(kth/2^64)`` double expression both sides)."""
    from ..ops.sketch import kmv_estimate, kmv_minima
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])
    minima = kmv_minima(ds, "user_id", k=256)
    k_used, kth_frac, est = kmv_estimate(minima, 256)
    return pd.DataFrame({
        "k_used": pd.Series([k_used], dtype="int64"),
        "kth_frac": [round(kth_frac, 12)],
        "est_distinct": [round(est, 4)]})


KMV_DISTINCT_SQL = """
WITH h AS (
  SELECT DISTINCT md5_number_lower('kmv:' || CAST(user_id AS VARCHAR)) AS hv
  FROM events),
km AS (SELECT hv FROM h ORDER BY hv LIMIT 256)
SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
       ROUND(CAST(MAX(hv) AS DOUBLE) / 18446744073709551616.0, 12)
         AS kth_frac,
       ROUND((COUNT(*) - 1)
             / (CAST(MAX(hv) AS DOUBLE) / 18446744073709551616.0), 4)
         AS est_distinct
FROM km
"""



def event_value_mad(sf_dir: str) -> pd.DataFrame:
    """Robust (median/MAD) outlier detection over events.value — the
    moment-free companion to ``event_outliers``' z>2 rule, immune to the
    outliers it hunts. Three streaming passes, each with bounded driver
    state: exact median (ops/curate.exact_quantiles two-pass range-bucket
    counting = PERCENTILE_DISC), exact median of |value − median| (same
    machinery over the derived deviation column), then a count pass with
    the broadcast 3·MAD threshold (one partial row per block).

    Parity: PERCENTILE_DISC picks REAL data values, so median and MAD are
    bit-exact unrounded doubles; |v − med| and the strict > 3·MAD compare
    use identical IEEE inputs on both sides — no rounding needed
    anywhere (the priority-sampling/DLT precedent)."""
    from ..ops.curate import exact_quantiles

    ds = _read_pq(_t(sf_dir, "events"), columns=["value"])
    med = float(exact_quantiles(ds, "value", [0.5])["value"].iloc[0])

    def absdev(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"dev": pa.array(np.abs(v - med))})

    dev = ds.map_batches(absdev, batch_format="pyarrow")
    mad = float(exact_quantiles(dev, "dev", [0.5])["value"].iloc[0])
    thr = 3.0 * mad

    def count_partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_outliers": pa.array([int((np.abs(v - med) > thr).sum())],
                                   pa.int64()),
            "n": pa.array([len(v)], pa.int64())})

    agg = ds.map_batches(count_partial, batch_format="pyarrow") \
        .to_pandas().sum()
    return pd.DataFrame({
        "median": [med], "mad": [mad],
        "n_outliers": pd.Series([int(agg["n_outliers"])], dtype="int64"),
        "n": pd.Series([int(agg["n"])], dtype="int64")})



EVENT_VALUE_MAD_SQL = """
WITH m AS (SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value)
                  AS med FROM events),
s AS (SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY dev) AS mad
      FROM (SELECT ABS(value - (SELECT med FROM m)) AS dev FROM events))
SELECT (SELECT med FROM m) AS median,
       (SELECT mad FROM s) AS mad,
       CAST((SELECT COUNT(*) FROM events
             WHERE ABS(value - (SELECT med FROM m))
                   > 3.0 * (SELECT mad FROM s)) AS BIGINT) AS n_outliers,
       CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n
"""



_DDSK_QS = ("0.5", "0.9", "0.99")   # literal text shared with the SQL



def ddsketch_quantiles_events(sf_dir: str) -> pd.DataFrame:
    """DDSketch-style mergeable quantile sketch (Masson et al., VLDB'19)
    with γ=2 over integer cents: bucket = bit_length(⌊value·100⌋), so a
    bucket's lower bound is within a 2× relative band of every member —
    the sketch state is a tiny (bucket → count) table whose per-block
    partials MERGE by addition (one small groupby; values never shuffle).
    Quantile estimate = the lower bound 2^(b−1)/100 of the first bucket
    whose cumulative count reaches ⌈q·n⌉ (the PERCENTILE_DISC rank rule,
    same as ops/curate.exact_quantiles).

    Determinism/parity: the bucket index is EXACT integer arithmetic on
    both sides — numpy ``frexp`` exponent ≡ DuckDB ``length(bin(v))``
    (the HLL register trick) on v = ⌊value·100⌋, identical IEEE doubles
    feeding identical FLOOR — so the full sketch state AND the estimates
    hash-check against SQL, unlike a randomized KLL/t-digest."""
    import math

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        v = np.floor(batch["value"].to_numpy() * 100.0)
        e = np.frexp(v)[1].astype(np.int64)   # == bit_length of int(v)
        b, c = np.unique(e, return_counts=True)
        return pd.DataFrame({"bucket": b, "cnt": c.astype(np.int64)})

    ds = _read_pq(_t(sf_dir, "events"), columns=["value"])
    counts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    n = int(counts["cnt"].sum())
    cum = counts["cnt"].cumsum().to_numpy()
    rows = {"q": [], "bucket": [], "est": []}
    for qs in _DDSK_QS:
        r = math.ceil(float(qs) * n)
        idx = int(np.searchsorted(cum, r, side="left"))
        b = int(counts["bucket"].iloc[idx])
        rows["q"].append(float(qs))
        rows["bucket"].append(b)
        rows["est"].append(float(2 ** (b - 1)) / 100.0)
    out = pd.DataFrame({"q": rows["q"],
                        "bucket": pd.Series(rows["bucket"], dtype="int64"),
                        "est": rows["est"]})
    out["n"] = pd.Series([n] * len(out), dtype="int64")
    return out



DDSKETCH_QUANTILES_SQL = f"""
WITH b AS (
  SELECT CAST(length(bin(CAST(FLOOR(value * 100.0) AS BIGINT)))
              AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1),
c AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum,
             (SELECT CAST(SUM(cnt) AS BIGINT) FROM b) AS n
      FROM b),
qs AS (SELECT UNNEST([{", ".join(_DDSK_QS)}]) AS q)
SELECT qs.q,
       MIN(c.bucket) AS bucket,
       POWER(2, MIN(c.bucket) - 1) / 100.0 AS est,
       MIN(c.n) AS n
FROM qs JOIN c ON c.cum >= CEIL(qs.q * c.n)
GROUP BY qs.q
ORDER BY qs.q
"""



_EWMA_ALPHA = 0.3



def ewma_daily_events(sf_dir: str) -> pd.DataFrame:
    """Exponentially-weighted daily smoothing (the alerting-baseline
    shape): e_t = 0.3·x_t + 0.7·e_{t-1} over per-day value totals. The
    corpus reduces to day-keyed partials inside map_batches (bounded by
    the time SPAN, never the data size — the events_daily_ma7 finish
    pattern); the recurrence runs on the driver over the bounded day
    series. Daily inputs are rounded 6dp BEFORE the recurrence on BOTH
    sides, so the two recurrences consume bit-identical doubles and the
    oracle (a recursive CTE over day ranks, same 0.3/0.7 literals and
    operation order) matches without further tolerance."""
    ds = _read_pq(_t(sf_dir, "events"), columns=["ts", "value"])

    def day_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"day": t["ts"].to_pandas().dt.floor("D"),
                           "x": t["value"].to_numpy()})
        return _arrow(df.groupby("day", as_index=False).agg(
            x=("x", "sum")))

    d = ds.map_batches(day_partial, batch_format="pyarrow").to_pandas() \
        .groupby("day", as_index=False).agg(x=("x", "sum")) \
        .sort_values("day").reset_index(drop=True)
    x = d["x"].round(6).to_numpy(np.float64)
    e = np.empty_like(x)
    prev = 0.0
    for i, xi in enumerate(x):
        prev = xi if i == 0 else _EWMA_ALPHA * xi + 0.7 * prev
        e[i] = prev
    return pd.DataFrame({
        "day": d["day"].astype("datetime64[us]"),
        "daily_value": x,
        "ewma": np.round(e, 6)})



EWMA_DAILY_SQL = """
WITH RECURSIVE d AS (
  SELECT date_trunc('day', ts) AS day, ROUND(SUM(value), 6) AS x
  FROM events GROUP BY 1),
r AS (SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d),
e AS (
  SELECT rn, day, x, x AS ewma FROM r WHERE rn = 1
  UNION ALL
  SELECT r.rn, r.day, r.x, 0.3 * r.x + 0.7 * e.ewma
  FROM r JOIN e ON r.rn = e.rn + 1)
SELECT day, x AS daily_value, ROUND(ewma, 6) AS ewma
FROM e ORDER BY day
"""



def trimmed_mean_events(sf_dir: str) -> pd.DataFrame:
    """10%-trimmed mean of event values: drop the k = n//10 lowest- and
    highest-ranked rows (ROW_NUMBER ORDER BY value semantics) and
    average the rest. Distributed as order statistics, not a sort:
    :func:`ops.curate.exact_quantiles` locates the rank-k and rank-
    (n-k+1) VALUES with its two-pass range-bucket counting (ranks hit
    exactly via q=(k∓0.5)/n — float-ceil-safe), then ONE conditional
    moment pass computes the tail masses:
      sum(k smallest) = Σ_{v<v_lo} v + (k − |v<v_lo|)·v_lo
    (ties at the cutoff contribute identical values, so rank tie-break
    order cannot change the trimmed sum — the formula equals the SQL's
    rank-window trim exactly, modulo summation-order ULPs). The output is the
    trimmed SUM rounded 2dp plus the kept count — values are exact-2dp,
    so the true trimmed sum IS a 2dp quantity and can never sit on a
    rounding boundary. The MEAN is deliberately NOT emitted: the corpus's
    mean 42.66923750 sat EXACTLY on the 6dp half-way point at sf0.001,
    flipping the round under summation-order ULP drift (sum/count keep
    it one division away for the reader)."""
    from ..ops.curate import exact_quantiles
    n = _n_rows(sf_dir, "events")
    k = n // 10
    ds = _read_pq(_t(sf_dir, "events"), columns=["value"])
    if k == 0:   # nothing to trim (n < 10): plain sum, same SQL window
        m = ds.aggregate(Sum("value", alias_name="s"))
        return pd.DataFrame({
            "trimmed_sum": [round(float(m["s"]), 2)],
            "n_kept": pd.Series([n], dtype="int64")})
    qv = exact_quantiles(ds, "value",
                         [(k - 0.5) / n, (n - k + 0.5) / n])
    v_lo = float(qv["value"].iloc[0])
    v_hi = float(qv["value"].iloc[1])

    def moments(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        lo, hi = v < v_lo, v > v_hi
        return pa.table({
            "s": pa.array([float(v.sum())], pa.float64()),
            "cb": pa.array([int(lo.sum())], pa.int64()),
            "sb": pa.array([float(v[lo].sum())], pa.float64()),
            "ca": pa.array([int(hi.sum())], pa.int64()),
            "sa": pa.array([float(v[hi].sum())], pa.float64())})

    m = ds.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    sum_small = float(m["sb"]) + (k - int(m["cb"])) * v_lo
    sum_large = float(m["sa"]) + (k - int(m["ca"])) * v_hi
    kept = n - 2 * k
    ts = float(m["s"]) - sum_small - sum_large
    return pd.DataFrame({"trimmed_sum": [round(ts, 2)],
                         "n_kept": pd.Series([kept], dtype="int64")})



TRIMMED_MEAN_SQL = """
WITH s AS (SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn
           FROM events),
k AS (SELECT COUNT(*) AS n, COUNT(*) // 10 AS k FROM events)
SELECT ROUND(SUM(s.value), 2) AS trimmed_sum,
       CAST(MIN(k.n) - 2 * MIN(k.k) AS BIGINT) AS n_kept
FROM s, k WHERE s.rn > k.k AND s.rn <= k.n - k.k
"""



def event_type_lift(sf_dir: str) -> pd.DataFrame:
    """Market-basket association over per-user event-type sets:
    support count and lift = P(a,b)/(P(a)P(b)) for every unordered
    type pair co-occurring in a user's history. ONE user-keyed bucketed
    exchange does everything (users are disjoint across buckets, so
    bucket partials SUM): per bucket, distinct (user, type) pairs are
    self-merged into a<b pairs, and the same distinct set yields
    per-type user counts and the bucket's user count — emitted through
    one (ta, tb, c) stream with ''-sentinel rows ((t, '') = type count,
    ('', '') = user count). The combine is driver-side over a
    type-cardinality-bounded table (T² + T + 1 rows)."""
    from ..ops.dedup import _grouped_exchange
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["user_id", "event_type"])

    def block(g: pd.DataFrame) -> pa.Table:
        u = g.drop_duplicates()
        tas: list[str] = []
        tbs: list[str] = []
        cs: list[int] = []
        p = u.merge(u, on="user_id")
        p = p[p["event_type_x"] < p["event_type_y"]]
        for (a, b), c in p.groupby(
                ["event_type_x", "event_type_y"]).size().items():
            tas.append(a); tbs.append(b); cs.append(int(c))
        for t, c in u.groupby("event_type").size().items():
            tas.append(t); tbs.append(""); cs.append(int(c))
        tas.append(""); tbs.append("")
        cs.append(int(u["user_id"].nunique()))
        return pa.table({"ta": pa.array(tas, pa.string()),
                         "tb": pa.array(tbs, pa.string()),
                         "c": pa.array(cs, pa.int64())})

    agg = _grouped_exchange(ds, "user_id", block).to_pandas() \
        .groupby(["ta", "tb"], as_index=False)["c"].sum()
    nu = int(agg.loc[(agg["ta"] == "") & (agg["tb"] == ""), "c"].iloc[0])
    tc = {r.ta: int(r.c) for r in
          agg[(agg["tb"] == "") & (agg["ta"] != "")].itertuples()}
    pairs = agg[(agg["ta"] != "") & (agg["tb"] != "")]
    lift = [round(int(c) * 1.0 * nu / (tc[a] * tc[b]), 6)
            for a, b, c in zip(pairs["ta"], pairs["tb"], pairs["c"])]
    return pd.DataFrame({
        "ta": pairs["ta"].to_numpy(),
        "tb": pairs["tb"].to_numpy(),
        "c_ab": pairs["c"].astype("int64").to_numpy(),
        "lift": lift}).sort_values(["ta", "tb"]).reset_index(drop=True)



EVENT_TYPE_LIFT_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tc AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY 1),
nu AS (SELECT COUNT(DISTINCT user_id) AS nu FROM events)
SELECT a.event_type AS ta, b.event_type AS tb,
       CAST(COUNT(*) AS BIGINT) AS c_ab,
       ROUND(COUNT(*) * 1.0 * MIN(nu.nu) / (MIN(ca.c) * MIN(cb.c)), 6)
         AS lift
FROM ut a
JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
JOIN tc ca ON ca.event_type = a.event_type
JOIN tc cb ON cb.event_type = b.event_type
CROSS JOIN nu
GROUP BY 1, 2 ORDER BY 1, 2
"""



_BOOT_REPS = 16
# Poisson(1) CDF thresholds (doubles, shared verbatim with the SQL):
# w = |{j : u >= F_j}| — the inverse-CDF draw from one uniform hash
_BOOT_F = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
           0.9810118431238463, 0.9963401531726563, 0.9994058151824183)
_BOOT_U = 5.421010862427522e-20     # exactly 2**-64



def bootstrap_sums_events(sf_dir: str) -> pd.DataFrame:
    """Poisson bootstrap (the distributed resampling scheme: per-row
    Poisson(1) weights stand in for multinomial resampling, so each
    replicate is a single weighted pass — no row ever moves): 16
    deterministic replicates of (Σ w·value, Σ w), weights drawn by
    inverse-CDF from the md5-uniform ``u = md5_u64('boot{r}:'+id)·2⁻⁶⁴``
    with the CDF thresholds shared verbatim with the SQL, so the weights
    are bit-identical on both sides. Emits per-replicate weighted sums —
    exact-2dp quantities (values are 2dp, weights small ints), never on
    a rounding boundary — from which the driver-side CI percentiles are
    one 16-number computation away (pinned in pytest, not hashed)."""
    from ..ops.curate import _key_u64
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "value"])
    thresholds = np.asarray(_BOOT_F, dtype=np.float64)

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False)
        reps: list[int] = []
        ws: list[float] = []
        wn: list[int] = []
        for r in range(_BOOT_REPS):
            u = _key_u64(ids, f"boot{r}").astype(np.float64) * _BOOT_U
            w = np.searchsorted(thresholds, u, side="right") \
                .astype(np.int64)
            reps.append(r)
            ws.append(float((w * v).sum()))
            wn.append(int(w.sum()))
        return pa.table({"rep": pa.array(reps, pa.int64()),
                         "ws": pa.array(ws, pa.float64()),
                         "wn": pa.array(wn, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("rep").aggregate(Sum("ws", alias_name="ws"),
                                  Sum("wn", alias_name="wn")).to_pandas()
    agg = agg.sort_values("rep").reset_index(drop=True)
    return pd.DataFrame({
        "rep": agg["rep"].astype("int64"),
        "wsum": agg["ws"].round(2),
        "wn": agg["wn"].astype("int64")})



def _boot_sql() -> str:
    w_expr = " + ".join(
        f"(CASE WHEN u >= {f!r} THEN 1 ELSE 0 END)" for f in _BOOT_F)
    return f"""
WITH reps AS (SELECT UNNEST(generate_series(0, {_BOOT_REPS - 1})) AS rep),
u AS (SELECT r.rep, e.value,
             md5_number_lower('boot' || CAST(r.rep AS VARCHAR) || ':'
                              || CAST(e.event_id AS VARCHAR))
               * {_BOOT_U!r} AS u
      FROM events e CROSS JOIN reps r),
w AS (SELECT rep, value, {w_expr} AS w FROM u)
SELECT rep, ROUND(SUM(w * value), 2) AS wsum,
       CAST(SUM(w) AS BIGINT) AS wn
FROM w GROUP BY rep ORDER BY rep
"""



BOOTSTRAP_SUMS_SQL = _boot_sql()



def value_psi_events(sf_dir: str) -> pd.DataFrame:
    """Population-stability-index drift check between the first and
    second halves of the event stream (split at the midpoint of the
    epoch-µs time RANGE — an exact integer both sides compute): decile
    edges come from period A via :func:`ops.curate.exact_quantiles`
    (≡ PERCENTILE_DISC — exact data values, so bucket membership is an
    exact comparison), then ONE counting pass buckets both periods
    (side='right' searchsorted ≡ the SQL's Σ(v ≥ eₖ) CASE chain).
    Contributions use +0.5/+5 Laplace smoothing (shared expression) so
    empty B-buckets stay finite; every output double is a deterministic
    function of integer counts — no summation-order drift at all."""
    from ray.data.aggregate import Max, Min

    from ..ops.curate import exact_quantiles
    ds = _read_pq(_t(sf_dir, "events"), columns=["ts", "value"])

    def with_us(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"us": us, "value": t["value"]})

    dsu = ds.map_batches(with_us, batch_format="pyarrow")
    mm = dsu.aggregate(Min("us", alias_name="lo"),
                       Max("us", alias_name="hi"))
    mid = (int(mm["lo"]) + int(mm["hi"])) // 2

    def only_a(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("us"), pa.scalar(mid)))

    qs = [k / 10.0 for k in range(1, 10)]
    edges = exact_quantiles(dsu.map_batches(only_a,
                                            batch_format="pyarrow"),
                            "value", qs)["value"].to_numpy(np.float64)

    def count_partial(t: pa.Table) -> pa.Table:
        us = t.column("us").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.searchsorted(edges, v, side="right")
        in_a = us < mid
        ca = np.bincount(b[in_a], minlength=10)
        cb = np.bincount(b[~in_a], minlength=10)
        return pa.table({"bucket": pa.array(np.arange(10), pa.int64()),
                         "ca": pa.array(ca.astype(np.int64), pa.int64()),
                         "cb": pa.array(cb.astype(np.int64), pa.int64())})

    agg = dsu.map_batches(count_partial, batch_format="pyarrow") \
        .to_pandas().groupby("bucket", as_index=False).sum() \
        .sort_values("bucket").reset_index(drop=True)
    na = float(agg["ca"].sum())
    nb = float(agg["cb"].sum())
    pa_ = (agg["ca"].to_numpy(np.float64) + 0.5) / (na + 5.0)
    pb_ = (agg["cb"].to_numpy(np.float64) + 0.5) / (nb + 5.0)
    contrib = (pa_ - pb_) * np.log(pa_ / pb_)
    return pd.DataFrame({
        "bucket": agg["bucket"].astype("int64"),
        "ca": agg["ca"].astype("int64"),
        "cb": agg["cb"].astype("int64"),
        "contrib": np.round(contrib, 6)})



VALUE_PSI_SQL = """
WITH b AS (SELECT epoch_us(ts) AS us, value FROM events),
m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM b),
a AS (SELECT value FROM b, m WHERE us < m.mid),
e AS (SELECT
  (SELECT PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY value) FROM a) AS e1,
  (SELECT PERCENTILE_DISC(0.2) WITHIN GROUP (ORDER BY value) FROM a) AS e2,
  (SELECT PERCENTILE_DISC(0.3) WITHIN GROUP (ORDER BY value) FROM a) AS e3,
  (SELECT PERCENTILE_DISC(0.4) WITHIN GROUP (ORDER BY value) FROM a) AS e4,
  (SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value) FROM a) AS e5,
  (SELECT PERCENTILE_DISC(0.6) WITHIN GROUP (ORDER BY value) FROM a) AS e6,
  (SELECT PERCENTILE_DISC(0.7) WITHIN GROUP (ORDER BY value) FROM a) AS e7,
  (SELECT PERCENTILE_DISC(0.8) WITHIN GROUP (ORDER BY value) FROM a) AS e8,
  (SELECT PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY value) FROM a) AS e9),
tagged AS (SELECT
    (CASE WHEN value >= e.e1 THEN 1 ELSE 0 END)
  + (CASE WHEN value >= e.e2 THEN 1 ELSE 0 END)
  + (CASE WHEN value >= e.e3 THEN 1 ELSE 0 END)
  + (CASE WHEN value >= e.e4 THEN 1 ELSE 0 END)
  + (CASE WHEN value >= e.e5 THEN 1 ELSE 0 END)
  + (CASE WHEN value >= e.e6 THEN 1 ELSE 0 END)
  + (CASE WHEN value >= e.e7 THEN 1 ELSE 0 END)
  + (CASE WHEN value >= e.e8 THEN 1 ELSE 0 END)
  + (CASE WHEN value >= e.e9 THEN 1 ELSE 0 END) AS bucket,
    (CASE WHEN us < m.mid THEN 1 ELSE 0 END) AS in_a
  FROM b, m, e),
g AS (SELECT k.bucket,
             CAST(COALESCE(SUM(t.in_a), 0) AS BIGINT) AS ca,
             CAST(COALESCE(SUM(1 - t.in_a), 0) AS BIGINT) AS cb
      FROM (SELECT UNNEST(generate_series(0, 9)) AS bucket) k
      LEFT JOIN tagged t ON t.bucket = k.bucket
      GROUP BY k.bucket),
n AS (SELECT CAST((SELECT COUNT(*) FROM tagged WHERE in_a = 1) AS DOUBLE)
               AS na,
             CAST((SELECT COUNT(*) FROM tagged WHERE in_a = 0) AS DOUBLE)
               AS nb)
SELECT bucket, ca, cb,
       ROUND(((ca + 0.5) / (n.na + 5.0) - (cb + 0.5) / (n.nb + 5.0))
             * ln(((ca + 0.5) / (n.na + 5.0))
                  / ((cb + 0.5) / (n.nb + 5.0))), 6) AS contrib
FROM g, n ORDER BY bucket
"""



def signup_purchase_latency(sf_dir: str) -> pd.DataFrame:
    """Time-to-conversion percentiles (the survival-analysis primitive):
    per user, latency = first purchase AT/AFTER the first signup minus
    that signup. One user-keyed bucketed exchange produces the per-user
    latency table (rows pre-filtered to the two event types before the
    exchange); percentiles run through exact_quantiles over THAT dataset
    — scale-safe even when the user population outgrows the driver.
    Latencies are integer µs, so the PERCENTILE_DISC values are exact."""
    from ..ops.curate import exact_quantiles
    from ..ops.dedup import _grouped_exchange
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["user_id", "ts", "event_type"])

    def prune(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        value_set=pa.array(["signup", "purchase"]))
        return t.filter(keep)

    def block(g: pd.DataFrame) -> pa.Table:
        s0 = g[g["event_type"] == "signup"].groupby("user_id")["ts"] \
            .min().rename("s0")
        p = g[g["event_type"] == "purchase"] \
            .merge(s0, left_on="user_id", right_index=True)
        p = p[p["ts"] >= p["s0"]]
        p0 = p.groupby("user_id")["ts"].min()
        lat = (p0.to_numpy() - s0.loc[p0.index].to_numpy()) \
            .astype("timedelta64[us]").astype(np.int64)
        return _arrow(pd.DataFrame({
            "user_id": p0.index.to_numpy().astype(np.int64),
            "lat_us": lat}))

    lat_ds = _grouped_exchange(
        ds.map_batches(prune, batch_format="pyarrow"), "user_id", block)
    qv = exact_quantiles(lat_ds, "lat_us", [0.25, 0.5, 0.75, 0.9])
    return pd.DataFrame({"q": qv["q"].astype(np.float64),
                         "lat_us": qv["value"].astype(np.float64)})



SIGNUP_LATENCY_SQL = """
WITH s AS (SELECT user_id, MIN(ts) AS s0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS p0
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s.s0
      GROUP BY e.user_id),
l AS (SELECT epoch_us(p.p0) - epoch_us(s.s0) AS lat_us
      FROM p JOIN s USING (user_id))
SELECT 0.25 AS q, CAST((SELECT PERCENTILE_DISC(0.25)
    WITHIN GROUP (ORDER BY lat_us) FROM l) AS DOUBLE) AS lat_us
UNION ALL
SELECT 0.5, CAST((SELECT PERCENTILE_DISC(0.5)
    WITHIN GROUP (ORDER BY lat_us) FROM l) AS DOUBLE)
UNION ALL
SELECT 0.75, CAST((SELECT PERCENTILE_DISC(0.75)
    WITHIN GROUP (ORDER BY lat_us) FROM l) AS DOUBLE)
UNION ALL
SELECT 0.9, CAST((SELECT PERCENTILE_DISC(0.9)
    WITHIN GROUP (ORDER BY lat_us) FROM l) AS DOUBLE)
ORDER BY q
"""





def hll_window_users(sf_dir: str) -> pd.DataFrame:
    """7-day sliding-window approximate distinct users per day — the
    sketch-MERGE use case that makes HLL worth carrying at scale: per-day
    register tables are built ONCE (one (day, bucket) groupby-max over
    md5-derived integer registers, ops/sketch.grouped_hll_registers) and
    each day's trailing-week estimate merges 7 register tables by
    elementwise max — no rescan of the raw events, no distinct-set
    union. The driver finish is bounded by days × 4096 integer rows.
    Oracle: the identical register chain in SQL, window-merged by a
    calendar range join, with the same alpha / linear-counting estimate
    arithmetic (4dp round absorbs summation-order ULP, the
    approx_distinct_users precedent)."""
    from ..ops.sketch import _M, grouped_hll_registers, hll_estimate

    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def day_of(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        return pd.DataFrame({"day": df["ts"].dt.floor("D"),
                             "user_id": df["user_id"]})

    regs = grouped_hll_registers(
        ds.map_batches(day_of, batch_format="pyarrow"),
        "day", "user_id").to_pandas()

    days = np.sort(regs["day"].unique())
    by_day = {d: sub for d, sub in regs.groupby("day")}
    rows = []
    for d in days:
        lo = d - np.timedelta64(6, "D")
        merged = np.zeros(_M, dtype=np.int64)
        for w, sub in by_day.items():
            if lo <= w <= d:
                b = sub["bucket"].to_numpy(np.int64)
                np.maximum.at(merged, b,
                              sub["register"].to_numpy(np.int64))
        nz = np.nonzero(merged)[0]
        est = hll_estimate(pd.DataFrame({"bucket": nz,
                                         "register": merged[nz]}))
        rows.append((pd.Timestamp(d), round(est, 4)))
    return pd.DataFrame(rows, columns=["day", "approx_users_7d"])


HLL_WINDOW_SQL = """
WITH e AS (SELECT date_trunc('day', ts) AS day, user_id FROM events),
h AS (SELECT DISTINCT day,
             md5_number_lower('hll:' || CAST(user_id AS VARCHAR)) AS h
      FROM e),
r AS (SELECT day, CAST(h >> 52 AS BIGINT) AS bucket,
             CASE WHEN (h & ((1::UBIGINT << 52) - 1)) = 0 THEN 53
                  ELSE 53 - length(bin(h & ((1::UBIGINT << 52) - 1)))
             END AS rank
      FROM h),
regs AS (SELECT day, bucket, MAX(rank) AS register
         FROM r GROUP BY day, bucket),
days AS (SELECT DISTINCT day FROM e),
merged AS (SELECT d.day AS day, r.bucket, MAX(r.register) AS register
           FROM days d JOIN regs r
             ON r.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
           GROUP BY d.day, r.bucket),
s AS (SELECT day, SUM(POW(2.0, -register)) + (4096 - COUNT(*)) AS denom,
             4096 - COUNT(*) AS zeros
      FROM merged GROUP BY day),
est AS (SELECT day,
               CASE WHEN (0.7213 / (1 + 1.079 / 4096)) * 4096.0 * 4096.0
                         / denom <= 2.5 * 4096 AND zeros > 0
                    THEN 4096.0 * LN(4096.0 / zeros)
                    ELSE (0.7213 / (1 + 1.079 / 4096)) * 4096.0 * 4096.0
                         / denom
               END AS e
        FROM s)
SELECT day, ROUND(e, 4) AS approx_users_7d FROM est ORDER BY day
"""




def join_skew_profile_events(sf_dir: str) -> pd.DataFrame:
    """Join-planning skew profile of the events user_id key: distinct
    keys, exact self-join output size Σc² (what a user_id⋈user_id
    equi-join would produce — the quantity a planner sizes exchanges
    with), the maximum multiplicity, and the share of rows held by the
    top-10 hottest keys (the salting decision input; ops/joins salts on
    exactly this signal).

    Shape: per-block key counts pre-aggregate before ONE user-keyed
    groupby (the only exchange); Σc², max c and the top-10 close from
    per-block partials over the count table — integers throughout, so
    everything but the 6dp-rounded share is bit-exact."""
    from ray.data.aggregate import Sum as _Sum

    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        vc = pd.Series(t.column("user_id").to_numpy()) \
            .value_counts(sort=False)
        return pd.DataFrame({"user_id": vc.index.to_numpy(),
                             "c": vc.to_numpy().astype("int64")})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(_Sum("c", alias_name="c")) \
        .materialize()

    def close(t: pa.Table) -> pd.DataFrame:
        c = t.column("c").to_numpy()
        df = pd.DataFrame({"u": t.column("user_id").to_numpy(), "c": c})
        top = df.sort_values(["c", "u"],
                             ascending=[False, True]).head(10)
        return pd.DataFrame({
            "n_keys": [len(c)], "rows": [int(c.sum())],
            "sj": [int((c.astype("int64") ** 2).sum())],
            "max_c": [int(c.max()) if len(c) else 0],
            "top_u": [top["u"].tolist()], "top_c": [top["c"].tolist()]})

    parts = counts.map_batches(close, batch_format="pyarrow").to_pandas()
    tops = pd.DataFrame({
        "u": np.concatenate(parts["top_u"].to_list()),
        "c": np.concatenate(parts["top_c"].to_list())})
    top10 = tops.sort_values(["c", "u"],
                             ascending=[False, True]).head(10)
    rows = int(parts["rows"].sum())
    return pd.DataFrame({
        "n_keys": pd.Series([int(parts["n_keys"].sum())], dtype="int64"),
        "selfjoin_size": pd.Series([int(parts["sj"].sum())],
                                   dtype="int64"),
        "max_mult": pd.Series([int(parts["max_c"].max())], dtype="int64"),
        "top10_share": [round(float(top10["c"].sum()) / rows, 6)]})


JOIN_SKEW_SQL = """
WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
t10 AS (SELECT c FROM c ORDER BY c DESC, user_id LIMIT 10)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(c * c) AS BIGINT) AS selfjoin_size,
       CAST(MAX(c) AS BIGINT) AS max_mult,
       ROUND((SELECT SUM(c) FROM t10) * 1.0
             / (SELECT COUNT(*) FROM events), 6) AS top10_share
FROM c
"""




def event_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Per-type PERCENT_RANK of each event's value (cents grid):
    pct = (rank-1)/(n_type-1) with RANK ties — the window-function
    primitive behind score normalization, attached to EVERY event row.

    Shape: the distinct-value table is bounded by the VALUE SPACE
    (types × cents grid), not the corpus — one pass of per-block
    (type, cents) count partials + a driver combine builds it, the
    per-type cumulative rank map broadcasts via ray.put, and a second
    streaming pass attaches pct to every row (the two-level trick of
    exact_quantiles / ranksum_auc, here powering a full window
    function). (rank-1)/(n-1) divides identical integers on both sides
    ⇒ identical doubles; 6dp round is belt-and-braces."""
    import ray as _ray

    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["event_id", "event_type", "value"])

    def cents_partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pylist(),
            "cents": np.floor(t.column("value").to_numpy()
                              * 100.0).astype("int64")})
        g = df.groupby(["event_type", "cents"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    dist = ds.map_batches(cents_partial, batch_format="pyarrow") \
        .to_pandas().groupby(["event_type", "cents"],
                             as_index=False)["c"].sum()

    rank_map = {}
    for typ, sub in dist.groupby("event_type"):
        sub = sub.sort_values("cents")
        c = sub["c"].to_numpy(dtype=np.float64)
        n = c.sum()
        below = np.concatenate([[0.0], np.cumsum(c)[:-1]])
        pct = (below / (n - 1.0)) if n > 1 else np.zeros(len(c))
        rank_map[typ] = dict(zip(sub["cents"].to_numpy(),
                                 np.round(pct, 6)))
    ref = _ray.put(rank_map)

    def attach(t: pa.Table, *, _rm=ref) -> pd.DataFrame:
        import ray as _r
        rm = _r.get(_rm) if not isinstance(_rm, dict) else _rm
        types = t.column("event_type").to_pylist()
        cents = np.floor(t.column("value").to_numpy()
                         * 100.0).astype("int64")
        pct = np.fromiter((rm[ty][ce] for ty, ce in zip(types, cents)),
                          dtype=np.float64, count=len(cents))
        return pd.DataFrame({
            "event_id": t.column("event_id").to_numpy(),
            "event_type": types, "cents": cents, "pct": pct})

    out = ds.map_batches(attach, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


EVENT_PERCENT_RANK_SQL = """
SELECT event_id, event_type,
       CAST(FLOOR(value * 100) AS BIGINT) AS cents,
       ROUND(PERCENT_RANK() OVER (PARTITION BY event_type
             ORDER BY FLOOR(value * 100)), 6) AS pct
FROM events ORDER BY event_id
"""




def ewma_user_daily(sf_dir: str) -> pd.DataFrame:
    """Per-USER exponentially-weighted daily smoothing — the grouped
    form of ewma_daily_events (the per-entity alerting baseline):
    e_t = 0.3·x_t + 0.7·e_{t-1} over each user's own ordered day series
    of daily value totals.

    Shape: ONE user-keyed bucketed exchange (ops/dedup._grouped_exchange)
    — a user's rows are complete inside its bucket, so the (user, day)
    reduction AND the per-user recurrence both run vectorized-in-bucket
    with no broadcast and no second exchange; recursion length is
    bounded by the time span. The recurrence itself runs on the INTEGER
    micro-unit grid — e6_t = (3·x6_t + 7·e6_{t-1}) // 10 with x6 =
    round(x·1e6) — because the float form differs by 1 ULP between
    numpy and DuckDB's compiled expression (FMA/op-order), and over the
    ~80k roundings of a grouped recurrence one 6dp half-way value WILL
    land on opposite sides (observed: 144.1315285). Integer floor
    division is bit-exact by construction on both sides (the
    cc_labels/sssp device applied to a recurrence); the per-user
    recursive CTE oracle runs the identical integer step."""
    from ..ops.dedup import _grouped_exchange

    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(),
            "day": t.column("ts").to_pandas().dt.floor("D"),
            "x": t.column("value").to_numpy()})

    def bucket(g: pd.DataFrame) -> pa.Table:
        d = g.groupby(["user_id", "day"], as_index=False)["x"].sum()
        d["x"] = d["x"].round(6)
        d = d.sort_values(["user_id", "day"]).reset_index(drop=True)
        x6 = np.rint(d["x"].to_numpy() * 1e6).astype(np.int64)
        uids = d["user_id"].to_numpy()
        e6 = np.empty(len(d), dtype=np.int64)
        prev = 0
        for i in range(len(d)):
            if i == 0 or uids[i] != uids[i - 1]:
                prev = int(x6[i])
            else:
                prev = (3 * int(x6[i]) + 7 * prev) // 10
            e6[i] = prev
        d["ewma"] = e6 / 1e6
        return _arrow(d.rename(columns={"x": "daily_value"}))

    out = _grouped_exchange(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id",
        bucket).to_pandas()
    out["day"] = out["day"].astype("datetime64[us]")
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


EWMA_USER_SQL = """
WITH RECURSIVE d AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         ROUND(SUM(value), 6) AS x
  FROM events GROUP BY 1, 2),
r AS (SELECT user_id, day, x,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
r6 AS (SELECT user_id, day, x, rn,
              CAST(ROUND(x * 1000000) AS BIGINT) AS x6 FROM r),
e AS (
  SELECT user_id, rn, day, x, x6 AS e6 FROM r6 WHERE rn = 1
  UNION ALL
  SELECT r.user_id, r.rn, r.day, r.x,
         (3 * r.x6 + 7 * e.e6) // 10 AS e6
  FROM r6 r JOIN e ON r.user_id = e.user_id AND r.rn = e.rn + 1)
SELECT user_id, day, x AS daily_value, e6 / 1000000.0 AS ewma
FROM e ORDER BY user_id, day
"""




def value_psi_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-event-type PSI drift — the grouped form of value_psi_events
    (a distribution can be stable corpus-wide while one event type
    drifts; this pins each slice). Each type's decile edges come from
    ITS OWN period-A values (ops/curate.grouped_exact_quantiles ≡
    per-group PERCENTILE_DISC); the global time midpoint splits the
    periods (one exact integer); ONE counting pass buckets every row
    against its type's broadcast edges (types × 9 doubles). All output
    doubles are deterministic functions of integer counts — no
    summation-order drift."""
    import ray as _ray
    from ray.data.aggregate import Max, Min

    from ..ops.curate import grouped_exact_quantiles
    ds = _read_pq(_t(sf_dir, "events"),
                  columns=["event_type", "ts", "value"])

    def with_us(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"event_type": t["event_type"], "us": us,
                         "value": t["value"]})

    dsu = ds.map_batches(with_us, batch_format="pyarrow")
    mm = dsu.aggregate(Min("us", alias_name="lo"),
                       Max("us", alias_name="hi"))
    mid = (int(mm["lo"]) + int(mm["hi"])) // 2

    def only_a(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("us"), pa.scalar(mid)))

    qs = [k / 10.0 for k in range(1, 10)]
    eq = grouped_exact_quantiles(
        dsu.map_batches(only_a, batch_format="pyarrow"),
        "event_type", "value", qs)
    edge_map = {typ: sub.sort_values("q")["value"].to_numpy(np.float64)
                for typ, sub in eq.groupby("event_type")}
    ref = _ray.put(edge_map)

    def count_partial(t: pa.Table, *, _e=ref) -> pd.DataFrame:
        import ray as _r
        em = _r.get(_e) if not isinstance(_e, dict) else _e
        types = np.asarray(t.column("event_type").to_pylist())
        us = t.column("us").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        frames = []
        for typ in np.unique(types):
            m = types == typ
            b = np.searchsorted(em[typ], v[m], side="right")
            in_a = us[m] < mid
            frames.append(pd.DataFrame({
                "event_type": typ, "bucket": np.arange(10),
                "ca": np.bincount(b[in_a], minlength=10)
                .astype("int64"),
                "cb": np.bincount(b[~in_a], minlength=10)
                .astype("int64")}))
        return pd.concat(frames, ignore_index=True)

    agg = dsu.map_batches(count_partial, batch_format="pyarrow") \
        .to_pandas().groupby(["event_type", "bucket"],
                             as_index=False)[["ca", "cb"]].sum() \
        .sort_values(["event_type", "bucket"]).reset_index(drop=True)
    outs = []
    for typ, sub in agg.groupby("event_type", sort=True):
        na = float(sub["ca"].sum())
        nb = float(sub["cb"].sum())
        p_a = (sub["ca"].to_numpy(np.float64) + 0.5) / (na + 5.0)
        p_b = (sub["cb"].to_numpy(np.float64) + 0.5) / (nb + 5.0)
        sub = sub.copy()
        sub["contrib"] = np.round((p_a - p_b) * np.log(p_a / p_b), 6)
        outs.append(sub)
    out = pd.concat(outs, ignore_index=True)
    out["ca"] = out["ca"].astype("int64")
    out["cb"] = out["cb"].astype("int64")
    out["bucket"] = out["bucket"].astype("int64")
    return out[["event_type", "bucket", "ca", "cb", "contrib"]]


_PSI_TYPE_EDGES = ", ".join(
    f"PERCENTILE_DISC(0.{k}) WITHIN GROUP (ORDER BY value) AS e{k}"
    for k in range(1, 10))
_PSI_TYPE_BUCKET = " + ".join(
    f"(CASE WHEN value >= e{k} THEN 1 ELSE 0 END)" for k in range(1, 10))

VALUE_PSI_BY_TYPE_SQL = f"""
WITH b AS (SELECT event_type, epoch_us(ts) AS us, value FROM events),
m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM b),
a AS (SELECT event_type, value FROM b, m WHERE us < m.mid),
e AS (SELECT event_type, {_PSI_TYPE_EDGES}
      FROM a GROUP BY event_type),
t AS (SELECT b.event_type,
             {_PSI_TYPE_BUCKET} AS bucket,
             CASE WHEN b.us < m.mid THEN 1 ELSE 0 END AS in_a
      FROM b JOIN e USING (event_type), m),
g0 AS (SELECT event_type, bucket,
              CAST(SUM(in_a) AS BIGINT) AS ca,
              CAST(SUM(1 - in_a) AS BIGINT) AS cb
       FROM t GROUP BY 1, 2),
grid AS (SELECT e.event_type, gs.bucket
         FROM e, (SELECT UNNEST(generate_series(0, 9)) AS bucket) gs),
g AS (SELECT grid.event_type, grid.bucket,
             COALESCE(g0.ca, 0) AS ca, COALESCE(g0.cb, 0) AS cb
      FROM grid LEFT JOIN g0 USING (event_type, bucket)),
n AS (SELECT event_type, CAST(SUM(ca) AS DOUBLE) AS na,
             CAST(SUM(cb) AS DOUBLE) AS nb
      FROM g GROUP BY event_type)
SELECT g.event_type, g.bucket, g.ca, g.cb,
       ROUND(((g.ca + 0.5) / (n.na + 5.0) - (g.cb + 0.5) / (n.nb + 5.0))
             * LN(((g.ca + 0.5) / (n.na + 5.0))
                  / ((g.cb + 0.5) / (n.nb + 5.0))), 6) AS contrib
FROM g JOIN n USING (event_type)
ORDER BY g.event_type, g.bucket
"""


__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
