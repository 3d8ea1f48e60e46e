"""Corpus-curation operators for training-data pipelines: deterministic
hash sampling and train/val/test splits, per-group quota capping /
stratified sampling, vocabulary + TF-IDF statistics, benchmark
decontamination, token-budget packing (a distributed prefix scan), and
posting-list builds.

These are beyond-reference, first-class engine ops (COVERAGE.md bottom
table). Design rules shared with the dedup/similarity families:

- **Determinism is content-addressed.** Sampling/split decisions hash the
  RECORD KEY (md5 → uint64, ``_md5_u64`` ≡ DuckDB ``md5_number_lower``),
  never ``random()``: re-runs, resumes and re-partitions all agree, and
  every decision is reproducible in oracle SQL. The per-key md5 is a
  Python-level loop (~1 µs/key) — that cost IS the contract; a vectorized
  non-cryptographic hash (``pd.util.hash_pandas_object``) would be faster
  but not reproducible outside this process family.
- **Group work is bucketed, not per-group.** Per-group top-k rides
  :func:`wtes_ray.ops.dedup._grouped_exchange` (hash-bucketed exchange +
  one vectorized pandas pass per bucket) — never one Python callback per
  fine group (measured ~50 µs/group of pure dispatch overhead).
- **Partials before the shuffle.** Vocabulary/DF counts reduce inside
  each batch (terms × blocks rows enter the exchange, not token
  occurrences), the same partial-combine shape as q1.
- **Broadcast small sides once.** The decontamination benchmark set is
  ``ray.put`` once and cached per worker process — never re-shipped or
  re-deserialized per batch.

Tokenization is pinned to the ASCII class ``[a-z0-9_]+`` over lowercased
text — the exact class DuckDB RE2's ``regexp_extract_all(lower(text),
'[a-z0-9_]+')`` yields — so every op here is oracle-checkable on any
corpus (see ops/text.py stopword_stats for the rationale).
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from .dedup import _consolidate, _grouped_exchange
from .multimodal import _md5_u64

_WORD_RE = re.compile(r"[a-z0-9_]+")

# per-worker cache of ray.get'd broadcast objects (a plain ray.get inside
# a task deserializes the object per TASK; this caches per process)
_REF_CACHE: dict = {}


def _cached_get(ref):
    key = ref.hex()
    obj = _REF_CACHE.get(key)
    if obj is None:
        obj = _REF_CACHE[key] = ray.get(ref)
    return obj


def _arrow(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _key_u64(keys, salt: str) -> np.ndarray:
    """uint64 md5 hash per key string — ``md5_number_lower('<salt>:' ||
    CAST(key AS VARCHAR))`` in DuckDB terms."""
    pre = f"{salt}:".encode()
    return np.fromiter(
        (int.from_bytes(hashlib.md5(pre + str(k).encode()).digest()[8:16],
                        "little") for k in keys),
        dtype=np.uint64, count=len(keys))


# ---------------------------------------------------------------------------
# Deterministic sampling / splits
# ---------------------------------------------------------------------------

def hash_sample(ds: ray.data.Dataset, *, permille: int,
                key_col: str = "doc_id",
                salt: str = "") -> ray.data.Dataset:
    """Keep rows whose key hashes into the first ``permille``/1000 of the
    hash space: ``md5_u64(salt:key) % 1000 < permille``. Embarrassingly
    parallel (no exchange), stable under re-partitioning and resume, and
    consistent ACROSS datasets sharing the key — sampling two tables with
    the same salt keeps them row-aligned (the property random_sample
    cannot give)."""
    if not 0 <= permille <= 1000:
        raise ValueError("permille must be in [0, 1000]")

    def f(batch: pa.Table) -> pa.Table:
        h = _key_u64(batch.column(key_col).to_pylist(), salt)
        return batch.filter(pa.array(h % 1000 < permille))

    return ds.map_batches(f, batch_format="pyarrow")


def uniform_sample_k(ds: ray.data.Dataset, k: int, *,
                     key_col: str = "doc_id",
                     salt: str = "usample") -> pa.Table:
    """EXACTLY-k uniform sample without replacement: order every row by
    (md5_u64(salt:key), key) and keep the first k — a deterministic
    permutation, so the prefix is a uniform k-subset, reproducible across
    runs/partitionings, and extensible (the k=100 sample is a superset of
    the k=50 sample — the top-k-by-hash trick Bernoulli ``hash_sample``
    can't offer when an exact count is required).

    Per-block local top-k heads, driver finish over ≤ k·blocks survivor
    rows (never data-sized; the _sorted_head / q10 pattern — a global
    Ray sort would cost a full exchange for a k-row result). Returns an
    Arrow table of the sampled rows (hash key column included as
    ``__u64`` for inspection/extension, ordered by it)."""

    def local_head(t: pa.Table) -> pa.Table:
        h = _key_u64(t.column(key_col).to_pylist(), salt)
        t = t.append_column("__u64", pa.array(h.astype(np.uint64)))
        return t.sort_by([("__u64", "ascending"),
                          (key_col, "ascending")]).slice(0, k)

    parts = ray.get(
        ds.map_batches(local_head, batch_format="pyarrow").to_arrow_refs())
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts).sort_by(
        [("__u64", "ascending"), (key_col, "ascending")]).slice(0, k)


def corpus_diff(old: ray.data.Dataset, new: ray.data.Dataset, *,
                id_col: str = "doc_id",
                text_col: str = "text",
                num_buckets: int = 32) -> ray.data.Dataset:
    """Content diff between two corpus versions — the incremental-ingest
    primitive: which ids were ADDED, which REMOVED, which rows CHANGED
    content. Returns (id_col, change ∈ {'added','removed','changed'});
    unchanged rows emit nothing (the output is delta-sized).

    Texts never move: each side first reduces to (id, md5) digests
    inside map_batches, then three bucketed hash joins do the set
    algebra (anti both ways for added/removed, inner for the digest
    compare) — co-partitioned, no broadcast, no driver materialization.
    md5 equality stands in for text equality (collision odds ~2⁻¹²⁸)."""
    from .joins import bucketed_hash_join

    def digest(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        h = [hashlib.md5(("" if x is None else x).encode()).hexdigest()
             for x in texts]
        return pa.table({id_col: t.column(id_col),
                         "h": pa.array(h, pa.string())})

    do = old.map_batches(digest, batch_format="pyarrow").materialize()
    dn = new.map_batches(digest, batch_format="pyarrow").materialize()

    def tagged(ds, tag):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: t.column(id_col),
                "change": pa.array([tag] * t.num_rows, pa.string())})
        return ds.map_batches(f, batch_format="pyarrow")

    ido = do.select_columns([id_col])
    idn = dn.select_columns([id_col])
    removed = tagged(bucketed_hash_join(ido, idn, on=id_col, how="anti",
                                        num_buckets=num_buckets), "removed")
    added = tagged(bucketed_hash_join(idn, ido, on=id_col, how="anti",
                                      num_buckets=num_buckets), "added")

    def rename_h(name):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([id_col, name])
        return f

    both = bucketed_hash_join(
        do.map_batches(rename_h("h_old"), batch_format="pyarrow"),
        dn.map_batches(rename_h("h_new"), batch_format="pyarrow"),
        on=id_col, num_buckets=num_buckets)

    def changed_only(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.equal(t.column("h_old"), t.column("h_new")))
        kept = t.filter(mask)
        return pa.table({
            id_col: kept.column(id_col),
            "change": pa.array(["changed"] * kept.num_rows, pa.string())})

    changed = both.map_batches(changed_only, batch_format="pyarrow")
    return removed.union(added).union(changed)


def validate_rows(ds: ray.data.Dataset,
                  rules: Sequence[tuple[str, "callable"]], *,
                  mode: str = "flag") -> ray.data.Dataset:
    """Data-contract gate: evaluate named row predicates vectorized per
    batch and either append one bool column per rule plus an ``n_bad``
    count (``mode='flag'``) or keep only fully-clean rows
    (``mode='drop'``) — the validation/quarantine stage every production
    ingest runs before anything downstream trusts the data.

    ``rules`` are ``(name, fn)`` where ``fn(table: pa.Table) ->
    np.ndarray[bool]`` returns True for VIOLATIONS. Pure map_batches —
    no exchange; violation accounting composes with a partial-sum
    aggregate downstream (see the ``events_contract_check`` query)."""
    if mode not in ("flag", "drop"):
        raise ValueError("mode must be 'flag' or 'drop'")

    def f(t: pa.Table) -> pa.Table:
        bad = np.zeros(t.num_rows, dtype=np.int64)
        flags = {}
        for name, fn in rules:
            v = np.asarray(fn(t), dtype=bool)
            flags[f"bad_{name}"] = v
            bad += v
        if mode == "drop":
            return t.filter(pa.array(bad == 0))
        for name, v in flags.items():
            t = t.append_column(name, pa.array(v))
        return t.append_column("n_bad", pa.array(bad, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def exact_quantiles(ds: ray.data.Dataset, col: str,
                    qs: Sequence[float], *,
                    num_buckets: int = 256) -> pd.DataFrame:
    """EXACT global quantiles (PERCENTILE_DISC semantics: the value at
    1-based rank ceil(q·n) under ORDER BY col) without a global sort OR
    per-row ranks — the two-pass range-bucket counting scheme:

    1. one streaming pass reduces to ``num_buckets`` equal-width bucket
       COUNTS (per-batch partials; B driver numbers);
    2. an O(B) cumulative scan locates each target rank's bucket and its
       LOCAL rank within it; a second pass filters only those buckets'
       rows (expected n/B each) — the only values that ever leave their
       blocks — and each bucket sorts locally to pick its ranks.

    Compare ``global_rank`` (ranks EVERY row, one full exchange): this
    moves only the probed buckets. Equal-width buckets assume the value
    distribution isn't collapsed into one bucket; heavy skew just makes
    the pass-2 filtrate larger, never wrong. Returns a DataFrame
    (q, value) ordered by q."""
    mm = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    span = max(hi - lo, 1e-300)
    B = num_buckets

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.minimum(((v - lo) / span * B).astype(np.int64), B - 1)

    def count_partial(t: pa.Table) -> pa.Table:
        b = bucket_of(t.column(col).to_numpy(zero_copy_only=False))
        ids, cnt = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(ids, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    cp = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("b").aggregate(Sum("cnt", alias_name="cnt")).to_pandas()
    counts = np.zeros(B, dtype=np.int64)
    counts[cp["b"].to_numpy()] = cp["cnt"].to_numpy()
    n = int(counts.sum())
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))  # rows before b

    want: dict[int, list[tuple[float, int]]] = {}
    for q in qs:
        r = max(1, int(math.ceil(q * n)))  # 1-based global rank
        b = int(np.searchsorted(np.cumsum(counts), r))
        want.setdefault(b, []).append((q, r - int(starts[b])))
    probe = ray.put(set(want))

    def pass2(t: pa.Table) -> pa.Table:
        pb = ray.get(probe) if isinstance(probe, ray.ObjectRef) else probe
        v = t.column(col).to_numpy(zero_copy_only=False)
        b = bucket_of(v)
        keep = np.isin(b, list(pb))
        return pa.table({"b": pa.array(b[keep], pa.int64()),
                         col: pa.array(v[keep])})

    sub = ds.map_batches(pass2, batch_format="pyarrow").to_pandas()
    out = []
    for b, targets in want.items():
        vals = np.sort(sub.loc[sub["b"] == b, col].to_numpy())
        for q, local_r in targets:
            out.append((q, float(vals[local_r - 1])))
    return pd.DataFrame(sorted(out), columns=["q", "value"])


def grouped_exact_quantiles(ds: ray.data.Dataset, group_col: str, col: str,
                            qs: Sequence[float], *,
                            num_buckets: int = 256) -> pd.DataFrame:
    """EXACT per-group quantiles (PERCENTILE_DISC WITHIN each group) —
    the per-language quality-threshold shape (CCNet's per-lang percentile
    cuts). Same two-pass range-bucket scheme as :func:`exact_quantiles`,
    with counts keyed by (group, bucket):

    1. one streaming pass → per-(group, bucket) COUNTS over GLOBAL
       equal-width buckets (global buckets keep pass 1 to one aggregate;
       per-group ranks stay exact because ranks only need each group's
       own cumulative counts);
    2. per-group O(B) scans locate each target rank's bucket; pass 2
       filters only probed (group, bucket) pairs — the only values that
       leave their blocks.

    Driver state is O(G·B) counts — ``group_col`` must be dimension-like
    (languages, sources), NOT a high-cardinality key; the probed filtrate
    is Σ_g len(targets_g)·n_g/B rows. Returns (group_col, q, value:float)
    ordered by (group, q)."""
    mm = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    span = max(hi - lo, 1e-300)
    B = num_buckets

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.minimum(((v - lo) / span * B).astype(np.int64), B - 1)

    def count_partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby([group_col,
                        bucket_of(df[col].to_numpy())]).size()
        idx = g.index.to_frame(index=False)
        return pa.table({
            group_col: pa.array(idx[group_col]),
            "b": pa.array(idx[1].to_numpy().astype(np.int64)),
            "cnt": pa.array(g.to_numpy().astype(np.int64))})

    cp = ds.map_batches(count_partial, batch_format="pandas") \
        .groupby([group_col, "b"]) \
        .aggregate(Sum("cnt", alias_name="cnt")).to_pandas()

    want: dict[tuple, list[tuple[float, int]]] = {}
    for grp, sub in cp.groupby(group_col):
        sub = sub.sort_values("b")
        bs = sub["b"].to_numpy()
        cnts = sub["cnt"].to_numpy()
        cum = np.cumsum(cnts)
        n_g = int(cum[-1])
        starts = cum - cnts                      # rows before this bucket
        for q in qs:
            r = max(1, int(math.ceil(q * n_g)))  # 1-based in-group rank
            i = int(np.searchsorted(cum, r))
            want.setdefault((grp, int(bs[i])), []).append(
                (q, r - int(starts[i])))
    probe = ray.put(frozenset(want))

    def pass2(df: pd.DataFrame) -> pa.Table:
        pb = ray.get(probe)
        b = bucket_of(df[col].to_numpy())
        keep = np.fromiter(
            ((g, int(bb)) in pb for g, bb in zip(df[group_col], b)),
            dtype=bool, count=len(df))
        return pa.table({
            group_col: pa.array(df[group_col].to_numpy()[keep]),
            "b": pa.array(b[keep]),
            col: pa.array(df[col].to_numpy()[keep])})

    sub = ds.map_batches(pass2, batch_format="pandas").to_pandas()
    out = []
    for (grp, b), targets in want.items():
        m = (sub[group_col] == grp) & (sub["b"] == b)
        vals = np.sort(sub.loc[m, col].to_numpy())
        for q, local_r in targets:
            out.append((grp, q, float(vals[local_r - 1])))
    return pd.DataFrame(sorted(out), columns=[group_col, "q", "value"])


def hash_split(ds: ray.data.Dataset, *,
               splits: Sequence[tuple[str, int]] = (
                   ("train", 900), ("val", 50), ("test", 50)),
               key_col: str = "doc_id",
               salt: str = "split") -> ray.data.Dataset:
    """Assign every row a deterministic ``split`` label from integer
    permille weights (summing to 1000): bucket ``md5_u64(salt:key) %
    1000`` against cumulative thresholds. The assignment is a pure
    function of (key, salt) — adding data later never moves an existing
    row between splits, the property a training pipeline needs for
    stable held-out sets."""
    names = [n for n, _ in splits]
    weights = [w for _, w in splits]
    if sum(weights) != 1000:
        raise ValueError("split permille weights must sum to 1000")
    edges = np.cumsum(weights)                       # upper bounds

    def f(batch: pa.Table) -> pa.Table:
        h = _key_u64(batch.column(key_col).to_pylist(), salt) % 1000
        idx = np.searchsorted(edges, h, side="right")
        lab = np.asarray(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Per-group quota capping / stratified sampling
# ---------------------------------------------------------------------------

def top_n_per_group(ds: ray.data.Dataset, group_col: str, n: int, *,
                    order_cols: Sequence[str],
                    ascending: Sequence[bool],
                    driver_max_rows: int = 200_000) -> ray.data.Dataset:
    """Keep the first ``n`` rows of every group under the given total
    order — the ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...) <= n
    window, with a COMBINER: every block first caps itself to n rows per
    group (global top-n per group == top-n over the union of per-block
    top-ns), so the exchange carries ≤ groups × n × blocks survivor rows
    — bounded, never corpus-sized. The finish is size-dispatched like
    ``_combine_pairs``: below ``driver_max_rows`` survivors it runs on
    the driver (a Ray sort exchange costs ~2 s of fixed overhead even
    for tiny inputs, SCALING.md); above, groups co-partition by hash
    into coarse buckets (``_grouped_exchange``) and one vectorized
    pandas pass per bucket finishes — group COUNT can be unbounded
    (per-domain quotas), only each group's survivor set must fit a
    bucket. Only (order+group+payload) columns move; give it a pruned
    dataset. ``order_cols`` must be a TOTAL order (append the row key
    last) or the boundary row is partition-luck."""

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(list(order_cols), ascending=list(ascending),
                             kind="mergesort") \
                .groupby(group_col, sort=False).head(n) \
                .reset_index(drop=True)

    def block(g: pd.DataFrame) -> pa.Table:
        return _arrow(head(g))

    surv = _consolidate(
        ds.map_batches(lambda b: _arrow(head(b)), batch_format="pandas"))
    if surv.count() <= driver_max_rows:
        df = surv.to_pandas()
        if len(df) == 0:
            return surv
        return ray.data.from_arrow(block(df))
    return _grouped_exchange(surv, group_col, block)


def quota_cap(ds: ray.data.Dataset, *, group_col: str, score_col: str,
              n: int, id_col: str = "doc_id",
              driver_max_rows: int = 200_000) -> ray.data.Dataset:
    """Data-mixing quota: keep the ``n`` best rows per group by
    (score desc, id asc) — e.g. the n highest-quality documents per
    language. Deterministic at ties via the id column."""
    return top_n_per_group(ds, group_col, n,
                           order_cols=[score_col, id_col],
                           ascending=[False, True],
                           driver_max_rows=driver_max_rows)


def stratified_sample(ds: ray.data.Dataset, *, group_col: str, n: int,
                      id_col: str = "doc_id",
                      salt: str = "strat") -> ray.data.Dataset:
    """Deterministic uniform-ish sample of ``n`` rows per group: rank
    rows inside each group by their key hash (md5 order ≈ random order,
    but reproducible and oracle-checkable) and keep the first ``n``.
    The hash column is internal — output schema equals input schema."""

    def add_h(batch: pa.Table) -> pa.Table:
        h = _key_u64(batch.column(id_col).to_pylist(), salt)
        # uint64 sorts wrongly through pandas object fallback; keep int64
        # bit pattern? No — order must match SQL's UBIGINT order, so keep
        # unsigned and let numpy/pandas sort uint64 natively.
        return batch.append_column("__h", pa.array(h, pa.uint64()))

    capped = top_n_per_group(ds.map_batches(add_h, batch_format="pyarrow"),
                             group_col, n,
                             order_cols=["__h", id_col],
                             ascending=[True, True])
    return capped.drop_columns(["__h"])


def priority_sample(ds: ray.data.Dataset, k: int, *, weight_col: str,
                    key_col: str = "doc_id",
                    salt: str = "ps1") -> pd.DataFrame:
    """Weighted sampling without replacement via Priority Sampling
    (Duffield–Lund–Thorup, JACM'07): priority = w / u with u a
    content-addressed uniform in (0, 1] (md5 → uint64 → ``(h+1)·2⁻⁶⁴``),
    keep the top-``k`` priorities, and attach the unbiased
    Horvitz-Thompson weight ``est_w = max(w, τ)`` where τ is the
    (k+1)-th priority (``Σ est_w`` estimates ``Σ w`` over the corpus).
    Every arithmetic step — uint64→double cast, ``+1.0``, ×2⁻⁶⁴
    (a power of two, exact), one division, one max — is a single
    correctly-rounded IEEE-754 op, so the emitted doubles are
    BIT-IDENTICAL to the DuckDB oracle with no rounding.

    Scale shape: priorities are computed per block and each block emits
    only its local top-(k+1) (the ``_sorted_head`` pattern); the driver
    merges blocks × (k+1) survivor rows. Weights and keys never shuffle."""

    def pri(batch: pa.Table) -> pa.Table:
        h = _key_u64(batch.column(key_col).to_pylist(), salt)
        u = (h.astype(np.float64) + 1.0) * 2.0 ** -64
        w = batch.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        df = pd.DataFrame({key_col: batch.column(key_col).to_pandas(),
                           "w": w, "priority": w / u})
        head = df.sort_values(["priority", key_col],
                              ascending=[False, True]).head(k + 1)
        return _arrow(head)

    parts = [p.to_pandas() for p in
             ray.get(ds.map_batches(pri, batch_format="pyarrow")
                     .to_arrow_refs()) if p.num_rows]
    allp = pd.concat(parts, ignore_index=True) if parts else \
        pd.DataFrame({key_col: [], "w": [], "priority": []})
    top = allp.sort_values(["priority", key_col],
                           ascending=[False, True]).head(k + 1)
    tau = float(top["priority"].iloc[k]) if len(top) > k else 0.0
    out = top.head(k).copy()
    out["est_w"] = np.maximum(out["w"].to_numpy(np.float64), tau)
    return out.sort_values(key_col).reset_index(drop=True)


def mixture_sample(ds: ray.data.Dataset, rates: dict, *,
                   group_col: str, key_col: str = "doc_id",
                   salt: str = "mix") -> ray.data.Dataset:
    """Data-mixing sampler: per-group keep rates (integer permille, e.g.
    ``{"en": 300, "de": 100}``; groups absent from ``rates`` drop to 0).
    The decision composes the group's rate with the same content-
    addressed key hash as :func:`hash_sample`, so mixtures stay
    deterministic, resumable, and row-aligned across tables. The rate
    dict is closure-captured (it is group-cardinality-sized; a huge
    per-domain table would broadcast via ray.put instead)."""
    if not all(0 <= int(v) <= 1000 for v in rates.values()):
        raise ValueError("rates are permille values in [0, 1000]")

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        h = _key_u64(batch[key_col], salt) % 1000
        cut = batch[group_col].map(rates).fillna(0).to_numpy(np.int64)
        return batch[h < cut]

    return ds.map_batches(f, batch_format="pandas")


def exact_cluster_ids(ds: ray.data.Dataset, *, text_col: str = "text",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact-duplicate cluster map: (id, cluster) where cluster is the
    MINIMUM id sharing the row's text. The companion of
    ``dedup.exact_dedup_ids`` that keeps EVERY row (that one keeps only
    survivors): one bucketed exchange over (16-byte md5, id) pairs —
    texts never move — and a vectorized per-bucket transform('min')."""

    def hash_batch(df: pd.DataFrame) -> pa.Table:
        import hashlib as _hl
        return _arrow(pd.DataFrame({
            id_col: df[id_col],
            "__h": [_hl.md5((t or "").encode("utf-8")).digest()
                    for t in df[text_col]]}))

    def block(g: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            id_col: g[id_col],
            "cluster": g.groupby("__h")[id_col].transform("min")})
        return _arrow(out.reset_index(drop=True))

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    return _grouped_exchange(hashed, "__h", block)


def cluster_consistent_split(ds: ray.data.Dataset, *,
                             splits: Sequence[tuple[str, int]] = (
                                 ("train", 900), ("val", 50), ("test", 50)),
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             salt: str = "split") -> ray.data.Dataset:
    """Leakage-safe train/val/test split: exact-duplicate documents land
    in the SAME split (splitting on the raw doc id leaks near-identical
    text across the train/eval boundary). Composition: cluster ids from
    :func:`exact_cluster_ids`, then :func:`hash_split` keyed on the
    CLUSTER id — every member inherits its cluster's assignment.
    Returns (id, cluster, split)."""
    clustered = exact_cluster_ids(ds, text_col=text_col, id_col=id_col)
    return hash_split(clustered, splits=splits, key_col="cluster",
                      salt=salt)


# ---------------------------------------------------------------------------
# Vocabulary / TF-IDF
# ---------------------------------------------------------------------------

def term_stats(ds: ray.data.Dataset, *, text_col: str = "text",
               id_col: str = "doc_id",
               driver_max_rows: int = 200_000) -> ray.data.Dataset:
    """Global (term, tf, df) over the ASCII word tokens of ``text_col``:
    tf = total occurrences, df = number of distinct documents containing
    the term. One pass: each batch reduces its own token stream to
    per-term partials (pandas value_counts — vectorized), so the
    final reduce sees ≤ unique-terms × blocks rows, never one row per
    token occurrence. The reduce is size-dispatched (``_combine_pairs``
    idiom): a driver pandas groupby below ``driver_max_rows`` partial
    rows, the distributed Sum aggregate above (the scale path — a real
    corpus has millions of terms × thousands of blocks)."""

    def partial(batch: pd.DataFrame) -> pa.Table:
        toks, docs = [], []
        for i, t in enumerate(batch[text_col].fillna("")):
            w = _WORD_RE.findall(t.lower())
            toks.extend(w)
            docs.extend([i] * len(w))
        if not toks:
            return pa.table({"term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        pairs = pd.DataFrame({"d": np.asarray(docs), "term": toks})
        tf = pairs["term"].value_counts(sort=False)
        df_ = pairs.drop_duplicates()["term"].value_counts(sort=False)
        out = pd.DataFrame({"term": tf.index,
                            "tf": tf.to_numpy(dtype=np.int64)})
        out["df"] = df_.reindex(out["term"]).to_numpy(dtype=np.int64)
        return _arrow(out)

    part = _consolidate(ds.map_batches(partial, batch_format="pandas"))
    if part.count() <= driver_max_rows:
        df = part.to_pandas()
        if len(df) == 0:
            return part
        out = df.groupby("term", as_index=False, sort=False) \
                .agg({"tf": "sum", "df": "sum"})
        return ray.data.from_arrow(_arrow(out))
    return part.groupby("term").aggregate(Sum("tf", alias_name="tf"),
                                          Sum("df", alias_name="df"))


def top_terms(ds: ray.data.Dataset, k: int, *, text_col: str = "text",
              n_docs: int | None = None) -> pd.DataFrame:
    """Top-``k`` vocabulary by (tf desc, term asc) with idf =
    ln(n_docs / df). The global (term, tf, df) table never lands on the
    driver: each block keeps a LOCAL top-k and the driver merges
    blocks × k survivor rows (the ``_sorted_head`` pattern). ``n_docs``
    defaults to ``ds.count()`` (callers holding a parquet footer count
    should pass it)."""
    if n_docs is None:
        n_docs = ds.count()
    stats = term_stats(ds, text_col=text_col)

    def local_head(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["tf", "term"], ascending=[False, True]) \
                .head(k)

    parts = [p.to_pandas() for p in
             ray.get(stats.map_batches(local_head, batch_format="pandas")
                     .to_arrow_refs()) if p.num_rows]
    if not parts:
        return pd.DataFrame({"term": pd.Series(dtype=str),
                             "tf": pd.Series(dtype=np.int64),
                             "df": pd.Series(dtype=np.int64),
                             "idf": pd.Series(dtype=float)})
    allp = pd.concat(parts, ignore_index=True)
    out = allp.sort_values(["tf", "term"], ascending=[False, True]) \
              .head(k).reset_index(drop=True)
    out["idf"] = np.round(np.log(n_docs / out["df"].to_numpy(float)), 6)
    return out[["term", "tf", "df", "idf"]]


def posting_lists(ds: ray.data.Dataset, terms: Sequence[str], *,
                  text_col: str = "text", id_col: str = "doc_id",
                  cap: int = 50) -> pd.DataFrame:
    """Inverted-index slice: for each term in the (small, broadcast)
    ``terms`` set, the first ``cap`` containing doc ids in id order,
    comma-joined. Each batch emits only (term, doc) pairs for the
    filtered term set; per-term heads reduce per block, then on the
    driver over blocks × terms × cap survivors."""
    tset = set(terms)

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        term_out, doc_out = [], []
        for d, t in zip(batch[id_col], batch[text_col].fillna("")):
            hit = tset.intersection(_WORD_RE.findall(t.lower()))
            term_out.extend(hit)
            doc_out.extend([d] * len(hit))
        out = pd.DataFrame({"term": pd.Series(term_out, dtype="string"),
                            id_col: doc_out})
        # local per-term head keeps ≤ terms × cap rows per block
        return out.sort_values(["term", id_col]) \
                  .groupby("term", sort=False).head(cap)

    parts = [p.to_pandas() for p in
             ray.get(ds.map_batches(pairs, batch_format="pandas")
                     .to_arrow_refs()) if p.num_rows]
    if not parts:
        return pd.DataFrame({"term": pd.Series(dtype=str),
                             "docs": pd.Series(dtype=str)})
    allp = pd.concat(parts, ignore_index=True)
    heads = allp.sort_values(["term", id_col]) \
                .groupby("term", sort=True).head(cap)
    return heads.groupby("term", sort=True)[id_col] \
                .agg(lambda s: ",".join(str(v) for v in s)) \
                .rename("docs").reset_index()


def phrase_search(ds: ray.data.Dataset, phrase: Sequence[str], *,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> ray.data.Dataset:
    """Positional phrase search — the posting-list-with-positions shape:
    each block emits (doc, base, bit) postings ONLY for the phrase's terms
    (term i matching at position p contributes bit ``1<<i`` at
    ``base = p - i``), one (doc, base)-keyed groupby ORs the bits via Sum
    (the i are distinct per base, so bits never collide), and bases whose
    mask is complete are exact phrase occurrences. Exchange volume is
    bounded by the phrase terms' corpus frequency — the text itself never
    shuffles, and non-phrase tokens emit nothing.

    Returns (id_col, n_occ) for documents with ≥ 1 occurrence."""
    from ray.data.aggregate import Count

    phrase = [w.lower() for w in phrase]
    n = len(phrase)
    if n == 0:
        raise ValueError("empty phrase")
    full = (1 << n) - 1
    term_bits: dict[str, list[int]] = {}
    for i, w in enumerate(phrase):
        term_bits.setdefault(w, []).append(i)

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        docs: list = []
        bases: list[int] = []
        bits: list[int] = []
        for d, t in zip(batch[id_col], batch[text_col].fillna("")):
            toks = _WORD_RE.findall(t.lower())
            for p, tok in enumerate(toks):
                for i in term_bits.get(tok, ()):
                    base = p - i
                    if base >= 0:
                        docs.append(d)
                        bases.append(base)
                        bits.append(1 << i)
        return pd.DataFrame({id_col: pd.Series(docs, dtype="int64"),
                             "base": pd.Series(bases, dtype="int64"),
                             "bit": pd.Series(bits, dtype="int64")})

    masks = ds.map_batches(postings, batch_format="pandas") \
        .groupby([id_col, "base"]).aggregate(Sum("bit", alias_name="mask"))
    hits = masks.filter(expr=f"mask == {full}")
    return hits.groupby(id_col).aggregate(Count(alias_name="n_occ"))


def bm25_topk(ds: ray.data.Dataset, query_terms: Sequence[str], k: int, *,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """BM25 retrieval: top-``k`` docs for a (small) query-term set, in
    the canonical two-pass shape:

    pass 1 — corpus statistics: each block reduces to (rows, Σdl) plus a
    per-query-term document frequency; the exchange carries
    ``|terms| + 2`` rows per block. df/avgdl/N land on the driver as a
    few floats (this is the stage you'd checkpoint and reuse across
    queries at 100 TB — stats don't change per query batch).

    pass 2 — scoring: idf/avgdl ship in the task closure (bytes, not a
    broadcast table); each block tokenizes once, scores docs containing
    ≥1 query term, and emits only its LOCAL top-k; the driver merges
    blocks × k survivors. Texts and the full score column never shuffle.

    Ordering is by ROUNDED (6dp) score desc then id — rounding BEFORE
    ranking makes the cut ULP-stable, so the result is reproducible in
    oracle SQL (same robust-idf ``ln((N-df+.5)/(df+.5)+1)`` form)."""
    qterms = sorted(set(query_terms))

    def stats_partial(batch: pd.DataFrame) -> pa.Table:
        toks = [_WORD_RE.findall(t.lower())
                for t in batch[text_col].fillna("")]
        rows = [("__docs__", len(toks)),
                ("__dl__", sum(len(ts) for ts in toks))]
        for q in qterms:
            rows.append((q, sum(1 for ts in toks if q in ts)))
        return _arrow(pd.DataFrame(rows, columns=["term", "cnt"]))

    stats = ds.map_batches(stats_partial, batch_format="pandas") \
        .groupby("term").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    lut = dict(zip(stats["term"], stats["cnt"]))
    n_docs = int(lut.pop("__docs__", 0))
    avgdl = float(lut.pop("__dl__", 0)) / n_docs if n_docs else 0.0
    idf = {q: math.log((n_docs - lut.get(q, 0) + 0.5)
                       / (lut.get(q, 0) + 0.5) + 1.0) for q in qterms}

    def score_partial(batch: pd.DataFrame) -> pa.Table:
        ids, scores = [], []
        for d, t in zip(batch[id_col], batch[text_col].fillna("")):
            toks = _WORD_RE.findall(t.lower())
            dl = len(toks)
            s = 0.0
            hit = False
            for q in qterms:
                tf = toks.count(q)
                if tf:
                    hit = True
                    s += idf[q] * tf * (k1 + 1.0) \
                        / (tf + k1 * (1.0 - b + b * dl / avgdl))
            if hit:
                ids.append(d)
                scores.append(s)
        df = pd.DataFrame({id_col: pd.Series(ids),
                           "score": np.round(np.array(scores, float), 6)})
        return _arrow(df.sort_values(["score", id_col],
                                     ascending=[False, True]).head(k))

    parts = [p.to_pandas() for p in
             ray.get(ds.map_batches(score_partial, batch_format="pandas")
                     .to_arrow_refs()) if p.num_rows]
    if not parts:
        return pd.DataFrame({id_col: pd.Series(dtype=object),
                             "score": pd.Series(dtype=float)})
    out = pd.concat(parts, ignore_index=True) \
        .sort_values(["score", id_col], ascending=[False, True]) \
        .head(k)
    return out.sort_values(id_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(ds: ray.data.Dataset, benchmark_grams: Sequence[str], *,
                  n: int = 8, text_col: str = "text",
                  id_col: str = "doc_id",
                  mode: str = "flag") -> ray.data.Dataset:
    """Benchmark decontamination: flag (or drop) documents containing any
    of the benchmark's ``n``-token word grams. ``benchmark_grams`` are
    space-joined lowercase token grams (the shape a benchmark-prep step
    emits); they broadcast ONCE via ``ray.put`` as a set of token tuples
    and deserialize once per worker (``_cached_get``), never per batch.
    Matching slides an ``n``-token window over each doc's token stream —
    exact string equality, no hashing, so a match here is a match in the
    oracle's substring formulation (space-joined tokens with boundary
    guards) and vice versa. ``mode='flag'`` appends a ``contaminated``
    bool column; ``mode='drop'`` filters instead."""
    if mode not in ("flag", "drop"):
        raise ValueError("mode must be 'flag' or 'drop'")
    gram_set = {tuple(g.split(" ")) for g in benchmark_grams}
    if any(len(g) != n for g in gram_set):
        raise ValueError(f"every benchmark gram must have exactly {n} tokens")
    ref = ray.put(gram_set)

    def f(batch: pa.Table) -> pa.Table:
        grams = _cached_get(ref)
        texts = batch.column(text_col).to_pylist()
        hit = np.zeros(len(texts), dtype=bool)
        for i, t in enumerate(texts):
            w = _WORD_RE.findall((t or "").lower())
            hit[i] = any(tuple(w[j:j + n]) in grams
                         for j in range(len(w) - n + 1))
        if mode == "drop":
            return batch.filter(pa.array(~hit))
        return batch.append_column("contaminated", pa.array(hit))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Global ranking (distributed prefix scan over row counts)
# ---------------------------------------------------------------------------

def global_rank(ds: ray.data.Dataset, *, order_cols: Sequence[str],
                key_range: tuple[int, int] | None = None,
                num_buckets: int = 32, rank_col: str = "rank",
                driver_max_rows: int = 200_000) -> ray.data.Dataset:
    """Append the 1-based global row number under ``ORDER BY order_cols``
    (all ascending; must be a total order — append the row key last)
    WITHOUT a global sort: the count-weighted variant of the
    ``pack_by_budget`` prefix scan. Rows range-bucket on the FIRST order
    column (numeric; ties stay inside one bucket, so the composite order
    finishes locally), per-bucket row counts reduce to B driver numbers,
    an O(B) exclusive scan gives each bucket its starting rank, and one
    vectorized pass per bucket sorts and adds ``offset + arange``.
    This is ROW_NUMBER() — and through ``(rank-1)*k // N`` any NTILE-ish
    quantile binning — at corpus scale."""
    first = order_cols[0]
    if key_range is None:
        mm = ds.select_columns([first]).aggregate(
            Min(first, alias_name="lo"), Max(first, alias_name="hi"))
        lo, hi = int(mm["lo"]), int(mm["hi"])
    else:
        lo, hi = map(int, key_range)
    span = max(1, hi - lo + 1)
    B = num_buckets

    def tag(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(first).to_pylist(), dtype=np.int64)
        return t.append_column(
            "__rb", pa.array((k - lo) * B // span, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def counts(t: pa.Table) -> pa.Table:
        rb, c = np.unique(np.asarray(t.column("__rb").to_pylist(),
                                     dtype=np.int64), return_counts=True)
        return pa.table({"__rb": pa.array(rb, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    cnt_part = _consolidate(tagged.map_batches(counts,
                                               batch_format="pyarrow"))
    if cnt_part.count() <= max(driver_max_rows, 1):
        totals = cnt_part.to_pandas().groupby("__rb", as_index=False) \
                         .agg({"c": "sum"})
    else:
        totals = cnt_part.groupby("__rb") \
            .aggregate(Sum("c", alias_name="c")).to_pandas()
    totals = totals.sort_values("__rb")
    n_rows = int(totals["c"].sum())
    cum = np.concatenate([[0], np.cumsum(totals["c"].to_numpy())[:-1]])
    offsets = dict(zip(totals["__rb"].astype(int), cum.astype(np.int64)))

    def rank_frame(g: pd.DataFrame, rb: int) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort") \
             .drop(columns="__rb").reset_index(drop=True)
        g[rank_col] = offsets.get(rb, 0) + np.arange(1, len(g) + 1,
                                                     dtype=np.int64)
        return g

    if n_rows <= driver_max_rows:
        df = tagged.to_pandas()
        if len(df) == 0:
            return tagged.drop_columns(["__rb"])
        out = pd.concat(
            [rank_frame(g, int(rb)) for rb, g in df.groupby("__rb")],
            ignore_index=True)
        return ray.data.from_arrow(_arrow(out))

    def rank_block(g: pd.DataFrame) -> pa.Table:
        return _arrow(rank_frame(g, int(g["__rb"].iloc[0])))

    return tagged.groupby("__rb").map_groups(rank_block,
                                             batch_format="pandas")


# ---------------------------------------------------------------------------
# Token-budget packing (distributed prefix scan)
# ---------------------------------------------------------------------------

def pack_by_budget(ds: ray.data.Dataset, *, budget: int,
                   weight_col: str, key_col: str = "doc_id",
                   key_range: tuple[int, int] | None = None,
                   num_buckets: int = 32,
                   driver_max_rows: int = 200_000) -> ray.data.Dataset:
    """Assign each row a shard ``bin`` by cumulative weight in global
    ``key_col`` order: bin = floor(prefix_sum_before_row / budget) —
    the SUM(...) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING) window.
    The use case is packing documents into ~budget-token training shards
    in a stable, resumable order.

    Implemented as a DISTRIBUTED PREFIX SCAN, no global sort:
    1. rows get an ORDER-PRESERVING range bucket from the numeric key
       (``(key-lo)*B // span`` — contiguous key ranges, unlike the hash
       buckets of ``_grouped_exchange``);
    2. pass 1 pre-reduces per-bucket weight totals inside each batch and
       a tiny ≤ B-row groupby lands them on the driver, which computes
       exclusive prefix offsets (an O(B) scan);
    3. pass 2 exchanges rows by bucket and one vectorized pandas pass
       per bucket sorts by key and adds offset + local cumsum.
    Only (key, weight) plus payload columns move; the driver holds B
    numbers, never rows. Assumes a NUMERIC key; uniform buckets are a
    partitioning choice (skewed keys → uneven buckets, still correct).
    ``key_range`` (lo, hi) skips the min/max pass — pass parquet footer
    stats when you have them."""
    if key_range is None:
        mm = ds.select_columns([key_col]).aggregate(
            Min(key_col, alias_name="lo"), Max(key_col, alias_name="hi"))
        lo, hi = int(mm["lo"]), int(mm["hi"])
    else:
        lo, hi = map(int, key_range)
    span = max(1, hi - lo + 1)
    B = num_buckets

    def tag(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(key_col).to_pylist(), dtype=np.int64)
        b = (k - lo) * B // span
        return t.append_column("__rb", pa.array(b, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def bucket_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"__rb": t.column("__rb").to_pylist(),
                           "w": t.column(weight_col).to_pylist()})
        out = df.groupby("__rb", as_index=False) \
                .agg(w=("w", "sum"), c=("w", "size"))
        return _arrow(out)

    tot_part = _consolidate(
        tagged.map_batches(bucket_partial, batch_format="pyarrow"))
    if tot_part.count() <= max(driver_max_rows, 1):  # ≤ B rows per block
        totals = tot_part.to_pandas().groupby("__rb", as_index=False) \
                         .agg({"w": "sum", "c": "sum"})
    else:
        totals = tot_part.groupby("__rb") \
            .aggregate(Sum("w", alias_name="w"),
                       Sum("c", alias_name="c")).to_pandas()
    totals = totals.sort_values("__rb")
    n_rows = int(totals["c"].sum())
    cum = np.concatenate([[0], np.cumsum(totals["w"].to_numpy())[:-1]])
    offsets = dict(zip(totals["__rb"].astype(int), cum.astype(np.int64)))

    def scan_frame(g: pd.DataFrame, rb: int) -> pd.DataFrame:
        g = g.sort_values(key_col, kind="mergesort")
        before = offsets.get(rb, 0) + np.concatenate(
            [[0], np.cumsum(g[weight_col].to_numpy(np.int64))[:-1]])
        g = g.drop(columns="__rb")
        g["bin"] = (before // budget).astype(np.int64)
        return g.reset_index(drop=True)

    # pass 2 is size-dispatched like _combine_pairs: the scanned rows are
    # corpus-sized, so at scale the bucketed exchange ALWAYS runs; the
    # driver path only fires when the whole (key, weight, payload)
    # projection is tiny (the row count is free — it rode along with the
    # pass-1 totals), saving the ~2 s fixed exchange cost at gate scale.
    if n_rows <= driver_max_rows:
        df = tagged.to_pandas()
        if len(df) == 0:
            return tagged.drop_columns(["__rb"])
        out = pd.concat(
            [scan_frame(g, int(rb)) for rb, g in df.groupby("__rb")],
            ignore_index=True)
        return ray.data.from_arrow(_arrow(out))

    def scan_block(g: pd.DataFrame) -> pa.Table:
        return _arrow(scan_frame(g, int(g["__rb"].iloc[0])))

    return tagged.groupby("__rb").map_groups(scan_block,
                                             batch_format="pandas")


def global_topn(ds: ray.data.Dataset, *, order_cols: Sequence[str],
                descending: Sequence[bool], n: int) -> pd.DataFrame:
    """Global ``ORDER BY … LIMIT n`` WITHOUT a sort exchange: every block
    prunes to its own top-n (a vectorized stable sort + head — any row
    outside a block's local top-n cannot be in the global top-n), the
    ≤ n·blocks survivors concatenate on the driver, and one final sort
    cuts the true head. ``order_cols`` must define a total order (append
    the row key last) so the result is deterministic. Bounded driver
    state: n × block-count rows, never the corpus — the take-ordered
    shape at 100-TB scale. Returns the n-row pandas result."""
    asc = [not d for d in descending]

    def local_head(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(list(order_cols), ascending=asc,
                                       kind="mergesort").head(n)
        return _arrow(df)

    parts = ds.map_batches(local_head, batch_format="pyarrow").to_pandas()
    return parts.sort_values(list(order_cols), ascending=asc,
                             kind="mergesort").head(n) \
                .reset_index(drop=True)
