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
        bucket_impl: str = "pandas",
) -> ray.data.Dataset:
    """Distributed equi-join of two Datasets on column ``on``.

    ``how``: ``inner`` | ``left`` | ``semi`` | ``anti`` (semi/anti return
    left columns only; ``anti`` = left rows with NO match — the scale-safe
    NOT IN). Returns a Dataset; one output block per non-empty bucket.

    ``left_schema``/``right_schema`` override schema inference — pass them
    when a side may be EMPTY behind a transform (Ray reports ``schema() is
    None`` for those, since there is no block to infer from).

    ``bucket_impl``: the per-bucket merge body. ``"pandas"`` (default —
    the exhaustively-exercised path) or ``"arrow"``: a zero-pandas
    Acero ``pa.Table.join`` per bucket, skipping both to_pandas
    conversions — the right body for very wide payload columns (the
    SCALING.md note). Row SETS are identical (tested across all four
    modes); within-block order differs, which the Dataset contract
    never promises. ``*_prepare`` callbacks are pandas-typed, so a
    prepare forces the pandas body for that bucket.
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

    def join_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g.column(_SIDE), pa.scalar(0, pa.int8()))
        lt = g.filter(lmask).select(lcols)
        rt = g.filter(pc.invert(lmask)).select(rcols)
        if (bucket_impl == "arrow" and left_prepare is None
                and right_prepare is None):
            # zero-pandas body: key casts pinned by the unified schema
            # already, join output re-ordered/cast to the same contract
            out = lt.combine_chunks().join(rt.combine_chunks(), keys=on,
                                           join_type=_ACERO_HOW[how])
            want = (lcols if how in ("semi", "anti")
                    else lcols + [c for c in rcols if c != on])
            return out.select(want).cast(
                pa.schema([(c, type_of[c]) for c in want]))
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
