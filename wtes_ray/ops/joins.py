"""Bucketed hash join: the repo's scale-safe replacement for driver-side
"broadcast" joins whose build side is NOT a dimension table.

Shape (ray_guide "co-partition by key hash" pattern): both sides get a
``__bucket__ = hash(key) % num_buckets`` column inside ``map_batches``
(vectorized), are tagged with a side marker, unioned under one Arrow
schema (each side's private columns null-padded on the other), and a
single ``groupby(__bucket__)`` shuffle co-locates matching keys; each
bucket group is then split back into its two sides and joined locally
with a vectorized pandas merge. The exchange therefore carries exactly
the projected (and, via ``left_prepare``/``right_prepare``, pre-reduced)
rows of both sides — never a driver-materialized lookup table.

Partitioning contract (documented for the 100 TB design point):
  - every row of ONE bucket (both sides) must fit in a worker's heap;
    size ``num_buckets`` ≈ (join input bytes) / (target group bytes).
    Buckets are hash-uniform in the key, so only a pathologically hot
    single KEY (not key range) can skew a bucket — pre-reduce such keys
    with ``*_prepare`` (e.g. partial aggregation) before the exchange.
  - join keys must be non-null (nulls would hash to one bucket and,
    for ``anti``, silently survive); callers filter nulls first.
  - the two sides may share ONLY the key column name; other name
    collisions raise (no pandas suffix guessing at scale).

``*_prepare`` callbacks run per bucket per side BEFORE the merge — the
idiomatic place to finish a per-batch partial aggregate (all rows of a
key are co-located here), e.g. ``lambda l: l.groupby(key, as_index=False)
["revenue"].sum()``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_SIDE = "__side__"
_BUCKET = "__bucket__"


def _bucket_array(col: pa.ChunkedArray, num_buckets: int) -> pa.Array:
    """Deterministic vectorized bucket ids for an int or string key column
    (splitmix64 finalizer for ints; pandas' fixed-key siphash for strings)."""
    if pa.types.is_integer(col.type):
        k = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            k ^= k >> np.uint64(30)
            k *= np.uint64(0xBF58476D1CE4E5B9)
            k ^= k >> np.uint64(27)
            k *= np.uint64(0x94D049BB133111EB)
            k ^= k >> np.uint64(31)
        return pa.array((k % np.uint64(num_buckets)).astype(np.int64))
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h = pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object))
        return pa.array((h % np.uint64(num_buckets)).astype(np.int64))
    raise TypeError(f"unsupported join-key type {col.type}")


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """The Dataset's schema as a true pyarrow Schema. Parquet-backed
    datasets (the production path) answer from metadata; pandas-backed
    blocks (tests) fall back to converting one sample batch."""
    s = ds.schema()
    if s is None:
        raise ValueError("cannot join a schemaless (empty, untyped) Dataset")
    types = list(s.types)
    if all(isinstance(t, pa.DataType) for t in types):
        return pa.schema(list(zip(s.names, types)))
    return pa.Table.from_pandas(
        ds.limit(1).to_pandas(), preserve_index=False) \
        .replace_schema_metadata(None).schema


def _unified_schema(ls: pa.Schema, rs: pa.Schema, on: str) -> pa.Schema:
    if on not in ls.names or on not in rs.names:
        raise KeyError(f"join key {on!r} missing from a side "
                       f"({ls.names} / {rs.names})")
    lt, rt = ls.field(on).type, rs.field(on).type
    if lt != rt:
        raise TypeError(f"join-key type mismatch: {lt} vs {rt}")
    shared = (set(ls.names) & set(rs.names)) - {on}
    if shared:
        raise ValueError(f"non-key column name collision: {sorted(shared)} "
                         f"— rename one side before joining")
    fields = [ls.field(on)]
    fields += [ls.field(n) for n in ls.names if n != on]
    fields += [rs.field(n) for n in rs.names if n != on]
    fields += [pa.field(_SIDE, pa.int8()), pa.field(_BUCKET, pa.int64())]
    return pa.schema(fields)


def _make_tagger(side: int, own: frozenset[str], unified: pa.Schema,
                 on: str, num_buckets: int):
    def tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for field in unified:
            if field.name == _SIDE:
                cols[field.name] = pa.array(
                    np.full(n, side, dtype=np.int8), pa.int8())
            elif field.name == _BUCKET:
                cols[field.name] = _bucket_array(t.column(on), num_buckets)
            elif field.name in own or field.name == on:
                cols[field.name] = t.column(field.name).cast(field.type)
            else:
                cols[field.name] = pa.nulls(n, field.type)
        return pa.table(cols, schema=unified)
    return tag


def bucketed_hash_join(
        left: ray.data.Dataset, right: ray.data.Dataset, on: str, *,
        how: str = "inner", num_buckets: int = 32,
        left_prepare: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
        right_prepare: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
        left_schema: pa.Schema | None = None,
        right_schema: pa.Schema | None = None,
        bucket_impl: str = "arrow",
) -> ray.data.Dataset:
    """Distributed equi-join of two Datasets on column ``on``.

    ``how``: ``inner`` | ``left`` | ``semi`` | ``anti`` (semi/anti return
    left columns only; ``anti`` = left rows with NO match — the scale-safe
    NOT IN). Returns a Dataset; one output block per non-empty bucket.

    ``left_schema``/``right_schema`` override schema inference — pass them
    when a side may be EMPTY behind a transform (Ray reports ``schema() is
    None`` for those, since there is no block to infer from).

    ``bucket_impl``: the per-bucket merge body. ``"arrow"`` (default
    since round 4, after a full gate+suite soak): a zero-pandas Acero
    ``pa.Table.join`` per bucket, skipping both to_pandas conversions —
    the right body for very wide payload columns (the SCALING.md note).
    ``"pandas"`` remains as the fallback body. Row SETS are identical
    (tested across all four modes); within-block order differs, which
    the Dataset contract never promises. ``*_prepare`` callbacks are
    pandas-typed, so a prepare forces the pandas body for that bucket
    regardless of ``bucket_impl``.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if bucket_impl not in ("pandas", "arrow"):
        raise ValueError(f"unsupported bucket_impl={bucket_impl!r}")
    lsa = left_schema if left_schema is not None else _arrow_schema(left)
    rsa = right_schema if right_schema is not None else _arrow_schema(right)
    unified = _unified_schema(lsa, rsa, on)
    lcols = [on] + [n for n in lsa.names if n != on]
    rcols = [on] + [n for n in rsa.names if n != on]

    tagged_l = left.map_batches(
        _make_tagger(0, frozenset(lsa.names), unified, on, num_buckets),
        batch_format="pyarrow")
    tagged_r = right.map_batches(
        _make_tagger(1, frozenset(rsa.names), unified, on, num_buckets),
        batch_format="pyarrow")

    type_of = {f.name: f.type for f in unified}

    def finalize(out: pd.DataFrame) -> pa.Table:
        # pin output types from the unified schema so EMPTY bucket results
        # keep a full Arrow schema (an empty pandas frame would degrade to
        # schemaless blocks and break chained joins / downstream schema()),
        # and so left-join NaN padding in int columns becomes Arrow NULLs
        # in the PINNED type (Array.from_pandas treats NaN as null) — a
        # per-bucket float64 fallback would hand one Dataset heterogeneous
        # block schemas and break any downstream groupby/sort/join
        known = [type_of.get(c) for c in out.columns]
        if all(t is not None for t in known):
            try:
                arrays = [pa.Array.from_pandas(out[c], type=t)
                          for c, t in zip(out.columns, known)]
                return pa.Table.from_arrays(
                    arrays, schema=pa.schema(list(zip(out.columns, known))))
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                pass   # non-coercible payload: keep the data, infer types
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    _ACERO_HOW = {"inner": "inner", "left": "left outer",
                  "semi": "left semi", "anti": "left anti"}

    # Acero's hash join rejects NESTED payload types ("Data type list<...>
    # is not supported in join non-key field") — route those buckets
    # through the pandas body regardless of bucket_impl
    acero_ok = not any(pa.types.is_nested(f.type) for f in unified
                       if f.name not in (_SIDE, _BUCKET))

    out_names = (lcols if how in ("semi", "anti")
                 else lcols + [c for c in rcols if c != on])
    out_schema = pa.schema([(c, type_of[c]) for c in out_names])
    l_pin = pa.schema([(c, type_of[c]) for c in lcols])
    r_pin = pa.schema([(c, type_of[c]) for c in rcols])

    def join_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            # map_groups can hand fn an EMPTY block with the schema
            # degraded to all-null types (the same Ray quirk the
            # co-partition contract test skips over); Acero rejects
            # null-typed non-key fields — short-circuit to a typed
            # empty table so both bodies stay schema-stable
            return out_schema.empty_table()
        lmask = pc.equal(g.column(_SIDE), pa.scalar(0, pa.int8()))
        lt = g.filter(lmask).select(lcols)
        rt = g.filter(pc.invert(lmask)).select(rcols)
        if (bucket_impl == "arrow" and acero_ok and left_prepare is None
                and right_prepare is None):
            # re-pin side types first: a task whose whole output is empty
            # emits a schemaless empty PANDAS block (Ray forwards empty
            # blocks around UDFs), and the sort reduce normalizes each
            # partition to its most prevalent block type — one such block
            # can drag a partition through pandas, degrading padded int64
            # to float64 and all-null string to null-type, which Acero
            # rejects ("Data type null is not supported in join non-key
            # field"). Cast is a no-op when types already match.
            if lt.schema != l_pin:
                lt = lt.cast(l_pin)
            if rt.schema != r_pin:
                rt = rt.cast(r_pin)
            out = lt.combine_chunks().join(rt.combine_chunks(), keys=on,
                                           join_type=_ACERO_HOW[how])
            return out.select(out_names).cast(out_schema)
        l = lt.to_pandas()
        r = rt.to_pandas()
        if left_prepare is not None:
            l = left_prepare(l)
        if right_prepare is not None:
            r = right_prepare(r)
        if how == "semi":
            return finalize(l[l[on].isin(set(r[on]))])
        if how == "anti":
            return finalize(l[~l[on].isin(set(r[on]))])
        return finalize(l.merge(r, on=on, how=how))

    return tagged_l.union(tagged_r).groupby(_BUCKET).map_groups(
        join_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Global (non-keyed) as-of join
# ---------------------------------------------------------------------------

def global_asof_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                     left_on: str, right_on: str, value_col: str,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """For every left row, attach ``value_col`` of the right row with the
    greatest ``right_on`` <= ``left_on`` (backward as-of, exact matches
    allowed) — DuckDB's ``ASOF LEFT JOIN`` without a `by` key, which a
    plain hash exchange cannot express: a left row's match may live in a
    DIFFERENT partition.

    Distributed shape (the repo's range-bucket + O(B) driver-prefix
    pattern, cf. ops/curate.pack_by_budget):

    1. equal-width range buckets over the combined [min, max] of both
       ``on`` domains (4 cheap aggregates; no data to the driver);
    2. per-bucket right-side summary — each bucket's LATEST (on, value)
       row — via per-block partials; the B-row table prefix-scans on the
       driver into carry_in[b] = latest right row strictly before bucket
       b's first possible left row;
    3. one co-partitioned exchange by bucket; each bucket merges locally
       (sorted ``merge_asof`` over int64 keys — the us→ns promotion trap
       never arises) with its carry_in row prepended, so boundary-crossing
       matches are exact.

    ``right_on`` values must be unique (pre-reduce duplicates — e.g. one
    row per timestamp — upstream; ties would make "the" match ambiguous).
    Left columns pass through; ``value_col`` is NULL when no right row
    precedes. Equal-width buckets assume the keys aren't pathologically
    skewed into one bucket; for heavy skew pass a larger ``num_buckets``
    (empty buckets cost nothing)."""
    lkey, rkey = "__asof_l", "__asof_r"

    def to_i64(t: pa.Table, col: str, out: str) -> pa.Table:
        # timestamps cast to their epoch-us int64 representation; ints pass
        return t.append_column(out, t.column(col).cast(pa.int64()))

    lt = left.map_batches(lambda t: to_i64(t, left_on, lkey),
                          batch_format="pyarrow").materialize()
    rt = right.map_batches(lambda t: to_i64(t, right_on, rkey),
                           batch_format="pyarrow").materialize()
    if rt.count() == 0 or lt.count() == 0:
        def null_val(t: pa.Table) -> pa.Table:
            return t.drop_columns([lkey]).append_column(
                value_col, pa.nulls(t.num_rows, pa.float64()))
        return lt.map_batches(null_val, batch_format="pyarrow")

    lo = min(lt.min(lkey), rt.min(rkey))
    hi = max(lt.max(lkey), rt.max(rkey))
    width = max(1, (hi - lo) // num_buckets + 1)

    # per-bucket latest right row: per-block partial argmax, driver finish
    def right_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": t.column(rkey).to_numpy(),
                           "v": t.column(value_col).to_numpy()})
        df["b"] = np.clip((df["k"] - lo) // width, 0, num_buckets - 1)
        ix = df.groupby("b")["k"].idxmax()
        out = df.loc[ix, ["b", "k", "v"]]
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    summ = rt.map_batches(right_partial, batch_format="pyarrow").to_pandas()
    summ = summ.loc[summ.groupby("b")["k"].idxmax()].sort_values("b")
    carry: dict[int, tuple[int, float]] = {}
    latest: tuple[int, float] | None = None
    by_b = {int(r.b): (int(r.k), r.v) for r in summ.itertuples()}
    for b in range(num_buckets):
        if latest is not None:
            carry[b] = latest
        if b in by_b:
            latest = by_b[b]

    def tag(key: str):
        def f(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy()
            b = np.clip((k - lo) // width, 0, num_buckets - 1)
            return t.append_column("__bucket", pa.array(b.astype(np.int64)))
        return f

    left_cols = [c for c in lt.schema().names if c != lkey]
    l_tagged = lt.map_batches(tag(lkey), batch_format="pyarrow")
    r_tagged = rt.map_batches(tag(rkey), batch_format="pyarrow")

    # unified side-tagged layout for the single exchange
    def widen_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__side", pa.array(
            np.zeros(t.num_rows, dtype=np.int8)))
        t = t.append_column(rkey, pa.nulls(t.num_rows, pa.int64()))
        return t.append_column("__rv", pa.nulls(t.num_rows, pa.float64()))

    def widen_right(t: pa.Table) -> pa.Table:
        base = pa.table({c: pa.nulls(t.num_rows, f.type)
                         for c, f in zip(lt.schema().names,
                                         _arrow_schema(lt))
                         if c != lkey})
        base = base.append_column(lkey, pa.nulls(t.num_rows, pa.int64()))
        base = base.append_column("__bucket", t.column("__bucket"))
        base = base.append_column("__side", pa.array(
            np.ones(t.num_rows, dtype=np.int8)))
        base = base.append_column(rkey, t.column(rkey))
        return base.append_column(
            "__rv", t.column(value_col).cast(pa.float64()))

    def merge_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy()
        lpart = g.filter(pc.equal(g.column("__side"),
                                  pa.scalar(0, pa.int8())))
        rpart = g.filter(pc.equal(g.column("__side"),
                                  pa.scalar(1, pa.int8())))
        b = int(g.column("__bucket")[0].as_py())
        rk = rpart.column(rkey).to_numpy().astype(np.int64, copy=True)
        rv = rpart.column("__rv").to_numpy()
        if b in carry:
            rk = np.concatenate([[carry[b][0]], rk])
            rv = np.concatenate([[carry[b][1]], rv])
        ldf = lpart.select(left_cols + [lkey]).to_pandas()
        if len(rk) == 0:
            ldf[value_col] = np.nan
        else:
            order = np.argsort(rk, kind="stable")
            rk, rv = rk[order], np.asarray(rv, dtype=np.float64)[order]
            pos = np.searchsorted(rk, ldf[lkey].to_numpy(), side="right") - 1
            vals = np.where(pos >= 0, rv[np.clip(pos, 0, None)], np.nan)
            ldf[value_col] = vals
        out = ldf[left_cols + [value_col]]
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    return l_tagged.map_batches(widen_left, batch_format="pyarrow") \
        .union(r_tagged.map_batches(widen_right, batch_format="pyarrow")) \
        .groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Interval (range-stab) join
# ---------------------------------------------------------------------------

def interval_join(points: ray.data.Dataset, intervals: ray.data.Dataset, *,
                  point_on: str, lo_col: str, hi_col: str,
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Inner range join: every (point row, interval row) pair with
    ``lo_col <= point_on <= hi_col`` (closed bounds — SQL ``BETWEEN``).
    Neither side is keyed, so a hash exchange cannot express it: a point's
    matching intervals can live anywhere.

    Distributed shape (the global_asof_join range-bucket pattern):

    1. equal-width range buckets over the combined [min, max] of the point
       and interval domains (driver scalars from cheap aggregates);
    2. points hash once to their value's bucket; each interval REPLICATES
       to every bucket its [lo, hi] span overlaps — replication factor =
       ceil(span/width), the op's one scale knob. Long intervals replicate
       wide; keep interval spans ≪ the domain (true for the
       window/promotion/session shapes this models) or lower num_buckets;
    3. one co-partitioned exchange; each bucket stabs locally — sort the
       bucket's point keys once, then ONE vectorized
       searchsorted(lo)/searchsorted(hi) pair per interval block and a
       ranges-concatenation gather (no per-pair Python).

    A point matches an interval in exactly ONE bucket (the point's), so no
    cross-bucket dedup is needed. Timestamps cast to epoch-us int64 (the
    merge_asof us→ns trap never arises). Output columns = point columns +
    interval columns (names must not collide); order within blocks is
    unspecified (Dataset contract). Blocks are per-bucket, so a downstream
    per-interval aggregate can pre-reduce per block before its (tiny,
    interval-keyed) groupby — the shape queries.event_interval_join uses."""
    pkey, ikey_lo, ikey_hi = "__iv_p", "__iv_lo", "__iv_hi"

    def to_i64(col: str, out: str):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(out, t.column(col).cast(pa.int64()))
        return f

    # schemas from the INPUTS: an empty side loses its schema behind the
    # key-append map_batches (Ray reports Unknown for empty mapped blocks)
    p_schema = _arrow_schema(points)
    i_schema = _arrow_schema(intervals)
    p_cols = list(p_schema.names)
    i_cols = list(i_schema.names)

    pt = points.map_batches(to_i64(point_on, pkey),
                            batch_format="pyarrow").materialize()
    iv = intervals.map_batches(to_i64(lo_col, ikey_lo),
                               batch_format="pyarrow") \
                  .map_batches(to_i64(hi_col, ikey_hi),
                               batch_format="pyarrow").materialize()
    overlap = set(p_cols) & set(i_cols)
    if overlap:
        raise ValueError(f"column names collide across sides: {overlap}")
    out_schema = pa.schema(
        [p_schema.field(c) for c in p_cols]
        + [i_schema.field(c) for c in i_cols])

    def empty_out() -> ray.data.Dataset:
        return ray.data.from_arrow(pa.table(
            {f.name: pa.array([], f.type) for f in out_schema}))

    if pt.count() == 0 or iv.count() == 0:
        return empty_out()

    lo = min(pt.min(pkey), iv.min(ikey_lo))
    hi = max(pt.max(pkey), iv.max(ikey_hi))
    width = max(1, (hi - lo) // num_buckets + 1)

    def tag_points(t: pa.Table) -> pa.Table:
        k = t.column(pkey).to_numpy()
        b = np.clip((k - lo) // width, 0, num_buckets - 1)
        t = t.append_column("__bucket", pa.array(b.astype(np.int64)))
        return t.append_column("__side", pa.array(
            np.zeros(t.num_rows, dtype=np.int8)))

    def replicate_intervals(t: pa.Table) -> pa.Table:
        los = t.column(ikey_lo).to_numpy()
        his = t.column(ikey_hi).to_numpy()
        b0 = np.clip((los - lo) // width, 0, num_buckets - 1)
        b1 = np.clip((his - lo) // width, 0, num_buckets - 1)
        cnt = np.maximum(b1 - b0 + 1, 0)           # lo > hi ⇒ still ≥ 1 row
        cnt = np.maximum(cnt, 1)                    # (dropped locally below)
        idx = np.repeat(np.arange(t.num_rows), cnt)
        cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        buckets = b0[idx] + (np.arange(cnt.sum()) - np.repeat(cum, cnt))
        rep = t.take(pa.array(idx))
        rep = rep.append_column("__bucket",
                                pa.array(buckets.astype(np.int64)))
        return rep.append_column("__side", pa.array(
            np.ones(rep.num_rows, dtype=np.int8)))

    # unified side-tagged layout for the single exchange (nulls fill the
    # other side's columns; helper int64 keys ride as real columns)
    uni_fields = ([p_schema.field(c) for c in p_cols]
                  + [pa.field(pkey, pa.int64())]
                  + [i_schema.field(c) for c in i_cols]
                  + [pa.field(ikey_lo, pa.int64()),
                     pa.field(ikey_hi, pa.int64())]
                  + [pa.field("__bucket", pa.int64()),
                     pa.field("__side", pa.int8())])
    uni = pa.schema(uni_fields)

    def widen(t: pa.Table) -> pa.Table:
        cols = {}
        for f in uni:
            if f.name in t.schema.names:
                cols[f.name] = t.column(f.name).cast(f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        return pa.table(cols, schema=uni)

    def stab_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g.column("__side"), pa.scalar(0, pa.int8()))
        pts = g.filter(lmask)
        ivs = g.filter(pc.invert(lmask))
        if pts.num_rows == 0 or ivs.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type)
                             for f in out_schema})
        pk = pts.column(pkey).to_numpy()
        order = np.argsort(pk, kind="stable")
        pk_sorted = pk[order]
        los = ivs.column(ikey_lo).to_numpy()
        his = ivs.column(ikey_hi).to_numpy()
        ls = np.searchsorted(pk_sorted, los, side="left")
        rs = np.searchsorted(pk_sorted, his, side="right")
        cnt = np.maximum(rs - ls, 0)
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table({f.name: pa.array([], f.type)
                             for f in out_schema})
        iv_idx = np.repeat(np.arange(ivs.num_rows), cnt)
        cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        pt_pos = np.repeat(ls, cnt) + (np.arange(tot) - np.repeat(cum, cnt))
        pt_idx = order[pt_pos]
        ptk = pts.select(p_cols).take(pa.array(pt_idx))
        ivk = ivs.select(i_cols).take(pa.array(iv_idx))
        return pa.table(
            {c: ptk.column(c) for c in p_cols}
            | {c: ivk.column(c) for c in i_cols}, schema=out_schema)

    tagged = pt.map_batches(tag_points, batch_format="pyarrow") \
        .map_batches(widen, batch_format="pyarrow") \
        .union(iv.map_batches(replicate_intervals, batch_format="pyarrow")
                 .map_batches(widen, batch_format="pyarrow"))
    return tagged.groupby("__bucket").map_groups(
        stab_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join
# ---------------------------------------------------------------------------

def _bloom_u64(col: pa.ChunkedArray, salt: int) -> np.ndarray:
    """Vectorized salted 64-bit hash for the bloom-join family — the
    splitmix64 finalizer over (key ⊕ salted odd constant) for ints,
    pandas' fixed-key siphash ⊕-mixed per salt for strings. NOT the
    md5 family of ops/sketch.bloom_bits (that one buys SQL parity at
    ~1 µs/key; this one is ~1 ns/key, the right trade for a filter
    probed on every big-side row)."""
    if pa.types.is_integer(col.type):
        x = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        x = pd.util.hash_array(
            np.asarray(col.to_pylist(), dtype=object))
    with np.errstate(over="ignore"):
        x = x ^ (np.uint64(salt * 2 + 1) * np.uint64(0x9E3779B97F4A7C15))
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def bloom_semi_prefilter(big: ray.data.Dataset, key_col: str,
                         keys: ray.data.Dataset, keys_col: str, *,
                         m_bits: int = 1 << 20,
                         k: int = 4) -> ray.data.Dataset:
    """Shrink the BIG side of a semi/inner join BEFORE its exchange: build
    a Bloom filter of the key side (per-block distinct set bits under the
    vectorized ``_bloom_u64`` family, ≤ m_bits rows ever reduced,
    CONSTANT-size result no matter how many keys), broadcast the packed
    m_bits/8-byte bitmap once, and drop big-side rows whose key is
    definitely absent inside map_batches. No false negatives by
    construction, so composing with the exact bucketed join afterwards
    returns exactly the plain join's rows — the Bloom only cuts exchange
    volume (survivors ≈ matches + false-positive rate · non-matches;
    size m_bits ≈ 10–16 bits/key for ~1% fp). This is the classic
    runtime-filter pushdown of distributed SQL engines, here as a
    composable Dataset stage."""

    def build_bits(t: pa.Table) -> pa.Table:
        col = t.column(keys_col)
        if len(col) == 0:
            return pa.table({"bit": pa.array([], pa.int64())})
        bits = np.unique(np.concatenate([
            (_bloom_u64(col, i) % np.uint64(m_bits)).astype(np.int64)
            for i in range(k)]))
        return pa.table({"bit": pa.array(bits, pa.int64())})

    from ray.data.aggregate import Count
    bits = keys.map_batches(build_bits, batch_format="pyarrow") \
        .groupby("bit").aggregate(Count(alias_name="_n")) \
        .to_pandas()["bit"].to_numpy()
    bitmap = np.zeros(m_bits // 8 + 1, dtype=np.uint8)
    np.bitwise_or.at(bitmap, bits >> 3,
                     np.uint8(1) << (bits & 7).astype(np.uint8))
    bref = ray.put(bitmap)

    def prefilter(t: pa.Table) -> pa.Table:
        bm = ray.get(bref) if not isinstance(bref, np.ndarray) else bref
        col = t.column(key_col)
        ok = np.ones(len(col), dtype=bool)
        for i in range(k):
            idx = (_bloom_u64(col, i) % np.uint64(m_bits)) \
                .astype(np.int64)
            ok &= ((bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1) \
                .astype(bool)
        return t.filter(pa.array(ok))

    return big.map_batches(prefilter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Upsert / CDC merge
# ---------------------------------------------------------------------------

def upsert_merge(base: ray.data.Dataset, delta: ray.data.Dataset,
                 on: str, *, op_col: str = "op",
                 num_buckets: int = 32) -> ray.data.Dataset:
    """Apply a change set to a keyed table (the SCD-1 / CDC MERGE):
    ``delta`` carries the base's columns plus ``op_col`` ∈ {'U', 'D'} —
    'U' rows replace-or-insert their key, 'D' rows delete it. Composed
    from existing scale-safe parts, ONE co-partitioned exchange total:
    the survivors are ``base ANTI JOIN delta`` (bucketed hash join —
    delta keys never materialize on the driver), the upserts are the
    delta's own 'U' rows, which stream straight to the union without
    touching the exchange. Equivalent to the SQL
    ``base WHERE NOT EXISTS(delta) UNION ALL delta WHERE op='U'``."""
    d_schema = _arrow_schema(delta)
    keep = [n for n in d_schema.names if n != op_col]
    survivors = bucketed_hash_join(
        base, delta.select_columns([on]), on,
        how="anti", num_buckets=num_buckets,
        right_schema=pa.schema([d_schema.field(on)]))

    def only_upserts(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column(op_col),
                                 pa.scalar("U"))).select(keep)

    ups = delta.map_batches(only_upserts, batch_format="pyarrow")
    return survivors.union(ups)
