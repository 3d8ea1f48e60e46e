"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
(char-shingle verification and a standalone word-n-gram pipeline),
embedding-cosine near-dup.

Scale shapes (SURVEY.md §4.2 / ray_guide patterns):
  - exact dedup: two forms — ``exact_dedup`` (groupby(text), returns rows,
    texts necessarily move once) and ``exact_dedup_ids`` (content-hash
    groupby; only (hash, id) pairs enter the exchange);
  - MinHash: shingle → signature per batch (numpy), explode to
    (band, band_hash, doc_id, sig) rows → ``groupby(band, band_hash)`` →
    candidate pairs estimated from signature agreement (texts never shuffle);
  - SimHash: 64-bit signature, banded into 4×16-bit chunks (pigeonhole: any
    pair at Hamming ≤ 3 shares at least one exact chunk) → bucket groupby →
    verify Hamming;
  - embedding near-dup: random-hyperplane LSH buckets → in-bucket cosine.

Buckets are capped (``max_bucket``) so a degenerate hot bucket (all-identical
boilerplate) cannot produce O(n²) pairs — every pair-emitting op (MinHash,
SimHash, embedding) carries a ``truncated`` flag (any-bucket-truncated wins,
combined deterministically), never silent.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from .runtime import stateless, task_concurrency


def _arrow(df: pd.DataFrame) -> pa.Table:
    """pandas → Arrow block for stages feeding an exchange (Ray's
    sort-based groupby is ~16× slower on pandas blocks — measured).
    Every block of one dataset must be the SAME type (the sort's boundary
    sampler asserts homogeneity), so empty early-returns convert too.
    Schema metadata is stripped: from_pandas attaches a b'pandas' dict that
    makes Schema.__hash__ raise ('Failed to hash the schemas' log spam in
    Ray's block-schema dedup)."""
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _as_arrow_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Force a dataset's blocks to Arrow (Ray's aggregate can emit pandas
    blocks on some inputs; a later union with Arrow blocks would trip the
    sort sampler's homogeneity assertion)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _consolidate(ds: ray.data.Dataset, *,
                 min_rows_per_block: int = 20_000) -> ray.data.Dataset:
    """Consolidate a small pre-reduced dataset before a groupby: Ray's
    sort reduce merges one slice per (input block × partition), so MANY
    small blocks (e.g. one per LSH bucket) make per-slice overhead
    dominate (queries._for_agg documents the measurement). On top of the
    materialize, tiny blocks COALESCE to ~``min_rows_per_block`` rows
    each (65 blocks × 1.2k rows → 2.0 s noop exchange; 16 blocks →
    0.39 s, measured — the sort's slice count is blocks × partitions).
    The target grows with row count, so a genuinely large input keeps
    its parallelism. The datasets here are signature/pair-sized —
    orders of magnitude below the corpus — so materializing is
    scale-safe."""
    ds = ds.materialize()
    n, b = ds.count(), ds.num_blocks()
    target = max(8, -(-n // min_rows_per_block))   # ceil, floor of 8
    if b > target:
        ds = ds.repartition(target).materialize()
    return ds


def _id_type(series: pd.Series) -> pa.DataType:
    """Arrow type of an id column for typed EMPTY outputs (an empty object
    column would infer as null and clash with non-empty blocks)."""
    t = pa.Array.from_pandas(series.iloc[:0]).type
    return pa.string() if pa.types.is_null(t) else t


def _grouped_exchange(ds: ray.data.Dataset, bucket_key: str, block_fn, *,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """A fine-grained ``groupby(keys).map_groups(fn)`` re-expressed as a
    BUCKETED exchange + per-bucket pandas pass.

    Rows co-partition by a stable hash of ``bucket_key`` into
    ``num_buckets`` coarse groups (``pd.util.hash_pandas_object`` — fixed
    SipHash key, deterministic across processes), so every fine group is
    fully contained in one bucket and ``block_fn`` handles the per-group
    work vectorized inside it. This replaces Ray's one-Python-callback-
    per-group ``map_groups`` dispatch — measured ~50 µs of scheduling +
    slice overhead per group, i.e. ~4 s of pure overhead for a no-op over
    the 80k (band, band_hash) groups of a 5k-doc MinHash corpus — with
    ``num_buckets`` callbacks total. Size ``num_buckets`` so one bucket's
    rows fit a worker's heap (rows/num_buckets ~ a normal batch); it
    should grow with the corpus."""

    def tag(t: pa.Table) -> pa.Table:
        # arrow-native: only the KEY column converts for hashing — the
        # batch itself is never round-tripped through pandas
        s = t.column(bucket_key).to_pandas()
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        return t.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def run(g: pd.DataFrame) -> pa.Table:
        return block_fn(g.drop(columns="__bucket"))

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby("__bucket").map_groups(run, batch_format="pandas")


def _combine_pairs_block(g: pd.DataFrame, val_col: str | None) -> pa.Table:
    """Per-bucket (a, b) pair dedup: ``val_col`` is identical across a
    pair's duplicate rows (computed from the full signatures/vectors, not
    the band), ``truncated`` is per-source-bucket so any-True wins.
    ``val_col=None`` for pair sets that carry no score yet (MinHash — the
    estimate attaches AFTER combining, see ``_attach_est_jaccard``)."""
    aggs = ({} if val_col is None
            else {val_col: (val_col, "first")})
    aggs["truncated"] = ("truncated", "any")
    out = g.sort_values(["a", "b"]).groupby(["a", "b"], as_index=False) \
           .agg(**aggs)
    return _arrow(out)


def _combine_pairs(pairs: ray.data.Dataset, val_col: str | None, *,
                   driver_max_rows: int = 200_000) -> ray.data.Dataset:
    """Cross-bucket (a, b) pair dedup (a pair that collides in several
    bands/buckets emits once per collision; this keeps one row per pair).

    Size-dispatched like ``neardup_clusters``: a Ray sort exchange costs
    ~2 s of fixed overhead even for tiny inputs (measured, SCALING.md), and
    the pair set is candidate-sized by the LSH-output contract — usually
    orders of magnitude below the corpus. Below ``driver_max_rows`` the
    combine runs on the driver (the count is free: ``_consolidate`` already
    materialized); above it, the bucketed exchange by ``a`` runs
    distributed exactly as before."""
    pairs = _consolidate(pairs)
    if pairs.count() <= driver_max_rows:
        df = pairs.to_pandas()
        if len(df) == 0:
            return pairs
        return ray.data.from_arrow(_combine_pairs_block(df, val_col))
    return _grouped_exchange(pairs, "a",
                             lambda g: _combine_pairs_block(g, val_col))

_U64 = np.uint64
_MERSENNE = _U64((1 << 61) - 1)


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact dedup (ST2/D2 analog — the reference's Bloom filter replaced by
    an exact shuffle): one row per distinct text, keeping the minimum id.
    Returns (id_col, text_col).

    NOTE on the shuffle payload: because the OUTPUT carries the texts, the
    texts necessarily move through the exchange (partial per-block combine
    keeps it to one row per distinct text per block). When only the surviving
    IDS are needed — e.g. to filter the corpus in place — use
    :func:`exact_dedup_ids`, whose exchange carries 16-byte hashes only."""
    agg = ds.groupby(text_col).aggregate(Min(id_col, alias_name=id_col))
    return agg.select_columns([id_col, text_col])


def exact_dedup_ids(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Scale path for exact dedup: min id per CONTENT HASH — only
    (16-byte hash, id) pairs enter the shuffle; texts never leave their
    blocks. Returns one row per distinct text: (id_col,). md5 collisions
    are negligible (~2^-64 at 10^12 docs)."""

    def hash_batch(df: pd.DataFrame) -> pa.Table:
        return _arrow(pd.DataFrame({
            id_col: df[id_col],
            "__h": [hashlib.md5((t or "").encode("utf-8")).digest()
                    for t in df[text_col]],
        }))

    agg = ds.map_batches(hash_batch, batch_format="pandas") \
            .groupby("__h").aggregate(Min(id_col, alias_name=id_col))
    return agg.select_columns([id_col])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_POLY_BASE = _U64(0x9E3779B97F4A7C15)   # golden-ratio odd multiplier


def _rolling_poly(vals: np.ndarray, k: int, *,
                  base: np.uint64 = _POLY_BASE) -> np.ndarray:
    """64-bit hashes of every k-length window of ``vals`` (uint64) — a
    rolling polynomial with a splitmix64-style final avalanche, one numpy
    pass per window position (k is small: k vector passes total).
    ``base`` picks the polynomial lane (ops/substr.py runs a second,
    independent lane for a ~128-bit effective gram key)."""
    n = len(vals) - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=_U64)
        for j in range(k):
            h = h * base + vals[j:j + n]
        h ^= h >> _U64(30)
        h *= _U64(0xBF58476D1CE4E5B9)
        h ^= h >> _U64(27)
        h *= _U64(0x94D049BB133111EB)
        h ^= h >> _U64(31)
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of the k-char shingles of ``text`` — fully vectorized:
    a rolling polynomial over the UTF-32 code points (one numpy pass
    instead of one blake2b call per character position)."""
    if len(text) < k:
        text = text + "\x00" * (k - len(text))
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
              .astype(_U64)
    return _rolling_poly(codes, k)


# ASCII-pinned word class so Python and DuckDB's RE2 oracle tokenize
# identically (the same pin as ops/text.py's stopword tokenizer — Python's
# \w is Unicode-wide, RE2's is ASCII-only)
_WORD_RE = re.compile(r"[a-z0-9_]+", re.ASCII)


def _word_tokens(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def _word_ngram_hashes(text: str, n: int,
                       cache: dict[str, int] | None = None) -> np.ndarray:
    """64-bit hashes of the word n-grams of ``text``. EMPTY for texts with
    fewer than n words (mirrors the true-shingle contract of
    :func:`_word_jaccard`). The per-token blake2b runs once per DISTINCT
    token via the caller-owned memo ``cache`` (per actor, Zipfian
    vocabulary ≪ token count); n-gram combination is the same vectorized
    rolling polynomial as the char path."""
    toks = _word_tokens(text)
    if len(toks) < n:
        return np.empty(0, dtype=_U64)
    if cache is None:
        cache = {}
    vals = np.empty(len(toks), dtype=_U64)
    for i, t in enumerate(toks):
        v = cache.get(t)
        if v is None:
            v = int.from_bytes(hashlib.blake2b(
                t.encode("utf-8"), digest_size=8).digest(), "little")
            if len(cache) < 2_000_000:
                cache[t] = v
        vals[i] = v
    return _rolling_poly(vals, n)


def _word_jaccard(ta: str, tb: str, n: int) -> float:
    """Exact Jaccard of the word-n-gram SETS (space-joined n-grams of the
    ASCII-lowered word tokens). Fewer than n words ⇒ empty set ⇒ 0.0."""
    wa, wb = _word_tokens(ta), _word_tokens(tb)
    sa = {" ".join(wa[i:i + n]) for i in range(len(wa) - n + 1)}
    sb = {" ".join(wb[i:i + n]) for i in range(len(wb) - n + 1)}
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(_U64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(_U64)
    return a, b


class MinHasher:
    """Actor-pool signature stage: permutation params built once per actor.

    ``mode="char"`` (default) shingles k-char windows; ``mode="word"``
    shingles k-WORD n-grams (ASCII word tokens, per-token hash memoized
    per actor) — the signature then estimates word-n-gram Jaccard, pairing
    with :func:`_word_jaccard` verification. A word-mode text with fewer
    than k words has NO shingles: its signature stays all-max, so two such
    texts always become candidates and must be culled by the verifier
    (which scores them 0.0)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, shingle_k: int = 5, seed: int = 7,
                 mode: str = "char"):
        if mode not in ("char", "word"):
            raise ValueError(f"mode must be 'char' or 'word', got {mode!r}")
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.k, self.mode = num_perm, shingle_k, mode
        self.a, self.b = _minhash_params(num_perm, seed)
        self._word_cache: dict[str, int] = {}

    def signature(self, text: str) -> np.ndarray:
        sh = (_shingle_hashes(text, self.k) if self.mode == "char"
              else _word_ngram_hashes(text, self.k, self._word_cache))
        # (a*x + b) mod M per permutation — outer product CHUNKED along the
        # shingle axis so a mega-document costs MBs, not num_perm×len(text)
        # transient memory
        out = np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=_U64)
        step = 1 << 16
        for s in range(0, len(sh), step):
            vals = (np.outer(self.a, sh[s:s + step])
                    + self.b[:, None]) % _MERSENNE
            np.minimum(out, vals.min(axis=1), out=out)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({self.id_col: batch[self.id_col],
                                 "sig": pd.Series([], dtype="object")})
        sigs = np.stack([self.signature(t or "")
                         for t in batch[self.text_col]])
        return pd.DataFrame({
            self.id_col: batch[self.id_col].values,
            "sig": [s.astype(np.int64).tolist() for s in sigs],
        })


def _band_rows(batch: pd.DataFrame, bands: int, rows_per_band: int,
               id_col: str) -> pa.Table:
    """(id, sig) batch → banding-exchange rows (band, band_hash, id) — the
    ONLY columns that ride the LSH shuffle. The signature itself stays in
    the materialized signature table (tested: test_minhash_exchange_slim)."""
    if len(batch) == 0:
        return pa.table({
            "band": pa.array([], pa.int64()),
            "band_hash": pa.array([], pa.int64()),
            id_col: pa.array([], _id_type(batch[id_col]))})
    ids = batch[id_col].tolist()
    sig_mat = np.asarray(batch["sig"].tolist(), dtype=np.int64)
    out = {"band": [], "band_hash": [], id_col: []}
    for band in range(bands):
        chunks = sig_mat[:, band * rows_per_band:(band + 1) * rows_per_band]
        out["band"].extend([band] * len(ids))
        # 8-byte blake2b of the band chunk as int64 (was a 16-char hex
        # string — same collision behavior, a third of the bytes)
        out["band_hash"].extend(
            int.from_bytes(
                hashlib.blake2b(c.tobytes(), digest_size=8).digest(),
                "little", signed=True)
            for c in chunks)
        out[id_col].extend(ids)
    df = pd.DataFrame(out)
    df["band_hash"] = df["band_hash"].astype("int64")
    return _arrow(df)


def _attach_est_jaccard(pairs: ray.data.Dataset, sigs: ray.data.Dataset, *,
                        id_col: str, threshold: float,
                        driver_max_rows: int = 200_000) -> ray.data.Dataset:
    """Attach ``est_jaccard`` (full-signature agreement fraction) to
    combined candidate pairs and filter by ``threshold``.

    This runs AFTER band-bucket pair formation so the banding exchange
    carries (band, band_hash, id) only — the 64-lane signature never rides
    it (it used to replicate ×bands, 16× the needed volume; VERDICT r3).
    The estimate is a pure function of the two signatures, so computing it
    here yields the exact pair set the in-bucket computation did.

    Size dispatch mirrors ``_combine_pairs``: below ``driver_max_rows``
    the candidate id set broadcasts (``ray.put``), the corpus-sized
    ``sigs`` is filtered to candidate rows WITHOUT a shuffle, and the
    candidate-sized signature map attaches on the driver. Above it, two
    id-keyed bucketed hash joins attach the signatures — ``sigs`` then
    shuffles exactly ONCE (vs ×bands before)."""
    import ray as _ray
    from .joins import _arrow_schema, bucketed_hash_join

    pairs = pairs.materialize()     # candidate-sized by the LSH contract
    n = pairs.count()
    schema = _arrow_schema(pairs)
    out_fields = [schema.field("a"), schema.field("b"),
                  pa.field("est_jaccard", pa.float64()),
                  schema.field("truncated")]
    if n == 0:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_fields}))

    def est_of(sig_a, sig_b) -> float:
        return float((np.asarray(sig_a, dtype=np.int64)
                      == np.asarray(sig_b, dtype=np.int64)).mean())

    if n <= driver_max_rows:
        pdf = pairs.to_pandas()
        ids = set(pdf["a"]) | set(pdf["b"])
        id_ref = _ray.put(ids)

        def pick(t: pa.Table) -> pa.Table:
            wanted = _ray.get(id_ref)
            mask = pd.Index(
                t.column(id_col).to_numpy(zero_copy_only=False)).isin(wanted)
            return t.filter(pa.array(mask))

        cand = sigs.map_batches(pick, batch_format="pyarrow").take_all()
        sigmap = {r[id_col]: np.asarray(r["sig"], dtype=np.int64)
                  for r in cand}
        pdf["est_jaccard"] = [
            float((sigmap[a] == sigmap[b]).mean())
            for a, b in zip(pdf["a"], pdf["b"])]
        pdf = pdf[pdf["est_jaccard"] >= threshold]
        pdf = pdf[["a", "b", "est_jaccard", "truncated"]]
        return ray.data.from_arrow(_arrow(pdf))

    sig_t = pa.list_(pa.int64())
    sig_a = sigs.map_batches(lambda t: t.rename_columns(["a", "__sa"]),
                             batch_format="pyarrow")
    sig_b = sigs.map_batches(lambda t: t.rename_columns(["b", "__sb"]),
                             batch_format="pyarrow")
    sa = pa.schema([("a", schema.field("a").type), ("__sa", sig_t)])
    sb = pa.schema([("b", schema.field("b").type), ("__sb", sig_t)])
    with_a = bucketed_hash_join(pairs, sig_a, "a",
                                left_schema=schema, right_schema=sa)
    mid = pa.schema([schema.field("a")]
                    + [schema.field(x) for x in schema.names if x != "a"]
                    + [pa.field("__sa", sig_t)])
    with_b = bucketed_hash_join(with_a, sig_b, "b",
                                left_schema=mid, right_schema=sb)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df["est_jaccard"] = [est_of(x, y)
                             for x, y in zip(df["__sa"], df["__sb"])]
        df = df[df["est_jaccard"] >= threshold]
        return df[["a", "b", "est_jaccard", "truncated"]]

    return with_b.map_batches(score, batch_format="pandas")


def minhash_lsh_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.7, seed: int = 7,
                      max_bucket: int = 64, mode: str = "char",
                      concurrency=None,
                      sig_broadcast_budget_bytes: int = 64 << 20
                      ) -> ray.data.Dataset:
    """Near-duplicate candidate pairs via MinHash+LSH.

    Returns (a, b, est_jaccard, truncated) with a < b, deduplicated; the
    Jaccard estimate is the signature agreement fraction (texts never enter
    the shuffle). ``mode`` picks the shingle unit: ``"char"`` k-char
    windows (default), ``"word"`` k-word n-grams (see :class:`MinHasher`).

    Exchange shape (VERDICT r3 fix): the banding exchange carries
    (band:int64, band_hash:int64, id) ONLY — 24ish bytes/row instead of
    the signature replicated into every band row (8·num_perm = 512 B ×
    bands = 8 KB/doc of pure replication at the defaults). The signature
    table (one row/doc, the op's real working set) is materialized once
    and re-read twice: by the banding explode and by the post-combine
    ``est_jaccard`` attach (:func:`_attach_est_jaccard`). Pair SURVIVAL
    is unchanged — the estimate is a pure function of the two signatures,
    so filtering after pair formation keeps exactly the pairs the old
    in-bucket filter kept, and ``truncated`` still reflects the capped
    source buckets (pairs only form among each bucket's ``max_bucket``
    lowest ids, exactly as before)."""
    import ray as _ray

    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        stateless(MinHasher, text_col=text_col, id_col=id_col,
                  num_perm=num_perm, shingle_k=shingle_k, seed=seed,
                  mode=mode),
        batch_format="pandas", **task_concurrency(concurrency)) \
        .materialize()

    exploded = sigs.map_batches(
        lambda b: _band_rows(b, bands, rows_per_band, id_col),
        batch_format="pandas")

    # Size-budgeted signature broadcast (round 5, VERDICT r4 #8): the r4
    # slimming moved est_jaccard to a post-combine attach — correct shape
    # at 100 TB but +30% wall at bench scale from the extra signature
    # passes and driver syncs it added. When the WHOLE signature matrix
    # fits the broadcast budget (n_docs · num_perm · 8 bytes), ship it
    # once via ray.put and compute the estimate in-bucket, vectorized,
    # filtering below threshold BEFORE the combine (smaller combine
    # input, zero extra passes). Above the budget — the 100-TB regime —
    # the slim post-attach path is unchanged. Both arms produce the same
    # pair set (the estimate is a pure function of the two signatures;
    # pinned by test_minhash_broadcast_path_equal).
    n_docs = sigs.count()
    use_broadcast = n_docs * num_perm * 8 <= sig_broadcast_budget_bytes
    if use_broadcast:
        # Arrow-native pull: take_all() row-converts the list column (~25×
        # slower, measured); flatten() of list<int64> is near zero-copy.
        t = pa.concat_tables(
            sigs.iter_batches(batch_format="pyarrow", batch_size=None))
        if t.num_rows:
            mat = t.column("sig").combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False).reshape(t.num_rows, -1)
        else:
            mat = np.zeros((0, num_perm), dtype=np.int64)
        idx = {v: i for i, v in enumerate(t.column(id_col).to_pylist())}
        sig_ref = _ray.put((idx, mat))
    else:
        sig_ref = None

    def pairs_block(g: pd.DataFrame) -> pa.Table:
        # one hash BUCKET of (band, band_hash) groups; singleton groups —
        # the overwhelming majority — drop in one vectorized pass
        g = g[g.duplicated(["band", "band_hash"], keep=False)]
        out = {"a": [], "b": [], "truncated": []}
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            truncated = len(grp) > max_bucket
            # sort before truncating: Ray's exchange does not guarantee
            # stable within-group row order, so an order-based cut would
            # make the SURVIVING candidates (not just the flag) vary run
            # to run
            ids = grp[id_col].sort_values().iloc[:max_bucket] \
                             .drop_duplicates().tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out["a"].append(ids[i])
                    out["b"].append(ids[j])
                    out["truncated"].append(truncated)
        if not out["a"]:
            empty = {"a": g[id_col].iloc[:0], "b": g[id_col].iloc[:0]}
            if sig_ref is not None:
                empty["est_jaccard"] = pd.Series([], dtype="float64")
            empty["truncated"] = pd.Series([], dtype="bool")
            return _arrow(pd.DataFrame(empty))
        df = pd.DataFrame(out)
        if sig_ref is not None:
            bidx, bmat = _ray.get(sig_ref)
            ia = np.fromiter((bidx[a] for a in df["a"]), dtype=np.int64,
                             count=len(df))
            ib = np.fromiter((bidx[b] for b in df["b"]), dtype=np.int64,
                             count=len(df))
            df["est_jaccard"] = (bmat[ia] == bmat[ib]).mean(axis=1)
            df = df[df["est_jaccard"] >= threshold]
            df = df[["a", "b", "est_jaccard", "truncated"]]
        return _arrow(df)

    # bucket on band_hash alone: equal band_hash ⇒ same bucket, so every
    # (band, band_hash) group is fully contained in its bucket
    pairs = _grouped_exchange(_consolidate(exploded), "band_hash",
                              pairs_block)

    if use_broadcast:
        return _combine_pairs(pairs, "est_jaccard")
    return _attach_est_jaccard(_combine_pairs(pairs, None),
                               sigs, id_col=id_col, threshold=threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over whitespace tokens; vectorized bit accumulation.

    The per-token blake2b (the only per-item Python step) runs once per
    UNIQUE token: tokens collapse through ``np.unique`` with counts (the
    weighted bit-sum is identical to summing per occurrence), and the
    token→hash map is memoized per ACTOR across batches (Zipfian corpus
    vocabulary ≪ token count), bounded to cap actor memory. Output is
    bit-identical to hashing every occurrence."""

    _CACHE_MAX = 2_000_000

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.bits = np.arange(64, dtype=_U64)
        self._cache: dict[str, int] = {}

    def _token_hash(self, tok: str) -> int:
        v = self._cache.get(tok)
        if v is None:
            v = int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"),
                                digest_size=8).digest(), "little")
            if len(self._cache) < self._CACHE_MAX:
                self._cache[tok] = v
        return v

    def simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
        hs = np.fromiter((self._token_hash(t) for t in uniq),
                         dtype=_U64, count=len(uniq))
        bits = ((hs[:, None] >> self.bits) & _U64(1)).astype(np.int64)
        score = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
        return int(((score > 0).astype(np.uint64) << self.bits).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: batch[self.id_col].values,
            "simhash": np.fromiter(
                (self.simhash(t or "") for t in batch[self.text_col]),
                dtype=_U64, count=len(batch)).astype(np.int64),
        })


def simhash_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  max_bucket: int = 256,
                  concurrency=None) -> ray.data.Dataset:
    """Near-dup pairs at Hamming distance ≤ ``max_hamming`` (default 3) via
    4×16-bit banding (pigeonhole guarantee for ≤3 differing bits)."""
    sigs = ds.map_batches(
        stateless(SimHasher, text_col=text_col, id_col=id_col),
        batch_format="pandas", **task_concurrency(concurrency))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pa.table({
                "band": pa.array([], pa.int64()),
                "band_hash": pa.array([], pa.int64()),
                id_col: pa.array([], _id_type(batch[id_col])),
                "simhash": pa.array([], pa.int64())})
        sh = batch["simhash"].values.astype(np.int64)
        ids = batch[id_col].values
        frames = []
        for band in range(4):
            chunk = (sh.view(np.uint64) >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            frames.append(pd.DataFrame({
                "band": band, "band_hash": chunk.astype(np.int64),
                id_col: ids, "simhash": sh}))
        return _arrow(pd.concat(frames, ignore_index=True))

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def pairs_block(g: pd.DataFrame) -> pa.Table:
        g = g[g.duplicated(["band", "band_hash"], keep=False)]
        out = {"a": [], "b": [], "hamming": [], "truncated": []}
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            truncated = len(grp) > max_bucket
            grp = grp.sort_values(id_col).iloc[:max_bucket]  # determ. cut
            sh = grp["simhash"].values.view(np.uint64)
            ids = grp[id_col].tolist()
            for i in range(len(ids)):
                x = sh[i + 1:] ^ sh[i]
                ham = np.fromiter((bin(int(v)).count("1") for v in x),
                                  dtype=np.int64, count=len(x))
                for j_off in np.nonzero(ham <= max_hamming)[0]:
                    if ids[i] == ids[i + 1 + j_off]:
                        continue
                    a, b = sorted((ids[i], ids[i + 1 + j_off]))
                    out["a"].append(a)
                    out["b"].append(b)
                    out["hamming"].append(int(ham[j_off]))
                    out["truncated"].append(truncated)
        if not out["a"]:
            return _arrow(pd.DataFrame(
                {"a": g[id_col].iloc[:0], "b": g[id_col].iloc[:0],
                 "hamming": pd.Series([], dtype="int64"),
                 "truncated": pd.Series([], dtype="bool")}))
        df = pd.DataFrame(out)
        df["hamming"] = df["hamming"].astype("int64")
        return _arrow(df)

    pairs = _grouped_exchange(_consolidate(exploded), "band_hash",
                              pairs_block)

    return _combine_pairs(pairs, "hamming")


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (hash-bucket co-partition of pairs and docs)
# ---------------------------------------------------------------------------

def _char_jaccard(ta: str, tb: str, ngram: int) -> float:
    # true k-shingles: EMPTY set for texts shorter than ngram, so an
    # empty/short text verifies at 0.0, never spuriously at 1.0. (A pair
    # member whose id is ABSENT from docs never reaches here — the inner
    # joins in verify_pairs_jaccard drop such pairs; see its docstring.)
    sa = {ta[i:i + ngram] for i in range(len(ta) - ngram + 1)}
    sb = {tb[i:i + ngram] for i in range(len(tb) - ngram + 1)}
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_jaccard(pairs: ray.data.Dataset, docs: ray.data.Dataset, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         ngram: int = 5, threshold: float = 0.5,
                         num_buckets: int = 32, mode: str = "char",
                         broadcast_rows_budget: int = 100_000,
                         ) -> ray.data.Dataset:
    """Exact n-gram Jaccard for candidate pairs — character n-grams by
    default, WORD n-grams with ``mode="word"`` (ASCII word tokens, see
    :func:`_word_jaccard`).

    Scale shape: the candidate ID set (ints — inherently small: 2 ids per
    LSH candidate pair) filters the corpus vectorized per batch. The
    surviving candidate (id, text) rows then attach to the pairs by size
    dispatch (the repo's ``BROADCAST_ROWS_BUDGET`` cutover pattern, cf.
    :func:`_attach_est_jaccard`):

    - at or below ``broadcast_rows_budget`` candidate rows, the id→text
      map broadcasts once (``ray.put``) and each pair block verifies with
      ZERO exchanges — at gate scale this saves the two join sorts, which
      dominate (fixed ~0.5-0.8 s each against KB of data);
    - above it, two bucketed hash joins (``hash(id) % num_buckets``
      co-partition, ops/joins.py), one per pair member — only candidate
      texts enter the exchanges, each exactly once per side, and nothing
      corpus-sized ever reaches the driver.

    Contract: pairs whose member id is absent from ``docs`` are DROPPED
    (they cannot be verified), not returned with jaccard=0.0 — callers
    passing a threshold of 0.0 to "see everything" still only see pairs
    whose both texts exist. Both dispatch arms enforce it (inner joins /
    explicit membership mask) — pinned by test_verify_paths_equal."""
    import ray as _ray
    from .joins import _arrow_schema as _pairs_schema
    from .joins import bucketed_hash_join

    # pairs and the candidate docs are both candidate-sized (small by the
    # LSH-output contract) — materialize so the id scan, schema probes and
    # the two joins don't each re-execute the upstream LSH / corpus plans
    pairs = pairs.materialize()
    id_rows = pairs.select_columns(["a", "b"]).map_batches(
        lambda df: pd.DataFrame(
            {"cid": pd.concat([df["a"], df["b"]]).unique()}),
        batch_format="pandas").take_all()
    ids = {r["cid"] for r in id_rows}
    if not ids:
        def tag_empty(df: pd.DataFrame) -> pd.DataFrame:
            df["jaccard"] = pd.Series([], dtype="float64")
            return df
        return pairs.map_batches(tag_empty, batch_format="pandas")
    id_ref = _ray.put(ids)

    def make_pick(names: list[str]):
        # arrow in/out so EMPTY filtered blocks keep their schema (a
        # pandas empty frame would degrade to untyped object columns)
        def pick(t: pa.Table) -> pa.Table:
            wanted = _ray.get(id_ref)
            mask = pd.Index(
                t.column(id_col).to_numpy(zero_copy_only=False)).isin(wanted)
            return t.filter(pa.array(mask)).rename_columns(names)
        return pick

    cand = docs.select_columns([id_col, text_col]).map_batches(
        make_pick([id_col, text_col]), batch_format="pyarrow").materialize()

    kernel = _char_jaccard if mode == "char" else _word_jaccard

    if cand.count() <= broadcast_rows_budget:
        # broadcast arm: one candidate-sized object, zero exchanges
        textmap = {r[id_col]: r[text_col] for r in cand.take_all()}
        map_ref = _ray.put(textmap)

        def verify_bcast(batch: pd.DataFrame) -> pd.DataFrame:
            tm = _ray.get(map_ref)
            present = batch["a"].isin(tm) & batch["b"].isin(tm)
            batch = batch[present].copy()
            # explicit float64 so an empty block keeps a typed column
            batch["jaccard"] = pd.Series(
                [kernel(tm[a] or "", tm[b] or "", ngram)
                 for a, b in zip(batch["a"], batch["b"])],
                index=batch.index, dtype="float64")
            return batch[batch["jaccard"] >= threshold]

        return pairs.map_batches(verify_bcast, batch_format="pandas")

    text_t = dict(zip(cand.schema().names, cand.schema().types))[text_col]
    cand_a = cand.map_batches(lambda t: t.rename_columns(["a", "__ta"]),
                              batch_format="pyarrow")
    cand_b = cand.map_batches(lambda t: t.rename_columns(["b", "__tb"]),
                              batch_format="pyarrow")
    # explicit side schemas: cand (and thus the first join's output) can
    # legitimately be EMPTY, where Ray cannot infer a schema
    pair_schema = _pairs_schema(pairs)
    sa = pa.schema([("a", pair_schema.field("a").type), ("__ta", text_t)])
    sb = pa.schema([("b", pair_schema.field("b").type), ("__tb", text_t)])
    with_a = bucketed_hash_join(pairs, cand_a, "a", num_buckets=num_buckets,
                                left_schema=pair_schema, right_schema=sa)
    mid_schema = pa.schema(
        [pair_schema.field("a")]
        + [pair_schema.field(n) for n in pair_schema.names if n != "a"]
        + [pa.field("__ta", text_t)])
    with_b = bucketed_hash_join(with_a, cand_b, "b", num_buckets=num_buckets,
                                left_schema=mid_schema, right_schema=sb)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        batch["jaccard"] = [
            kernel(ta or "", tb or "", ngram)
            for ta, tb in zip(batch["__ta"], batch["__tb"])]
        batch = batch[batch["jaccard"] >= threshold]
        # canonical column order = input pair schema + jaccard (the second
        # join fronts its key "b"; both dispatch arms must agree)
        return batch[list(pair_schema.names) + ["jaccard"]]

    return with_b.map_batches(verify, batch_format="pandas")


def _word_containment(ta: str, tb: str, n: int) -> tuple[float, float]:
    """Broder containment of the word-n-gram sets, both directions:
    (|∩|/|Ga|, |∩|/|Gb|) — the quote/subset-detection score (a short doc
    fully quoted inside a long one has c_ab = 1.0 while its Jaccard is
    small). Empty gram set ⇒ 0.0 on its side (one IEEE division of the
    same two integers as the SQL oracle otherwise)."""
    wa, wb = _word_tokens(ta), _word_tokens(tb)
    sa = {" ".join(wa[i:i + n]) for i in range(len(wa) - n + 1)}
    sb = {" ".join(wb[i:i + n]) for i in range(len(wb) - n + 1)}
    inter = len(sa & sb)
    return (inter / len(sa) if sa else 0.0,
            inter / len(sb) if sb else 0.0)


def containment_pairs(pairs: ray.data.Dataset, docs: ray.data.Dataset, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      ngram: int = 2, num_buckets: int = 32,
                      broadcast_rows_budget: int = 100_000
                      ) -> ray.data.Dataset:
    """Exact word-n-gram CONTAINMENT for candidate (a, b) pairs — the
    directional sibling of :func:`verify_pairs_jaccard`, same scale shape:
    candidate texts attach by size dispatch (broadcast map under
    ``broadcast_rows_budget``, two bucketed hash joins above), pairs with
    a member absent from ``docs`` are dropped. Adds columns (c_ab, c_ba)."""
    import ray as _ray
    from .joins import _arrow_schema as _pairs_schema
    from .joins import bucketed_hash_join

    pairs = pairs.materialize()
    id_rows = pairs.select_columns(["a", "b"]).map_batches(
        lambda df: pd.DataFrame(
            {"cid": pd.concat([df["a"], df["b"]]).unique()}),
        batch_format="pandas").take_all()
    ids = {r["cid"] for r in id_rows}
    if not ids:
        def tag_empty(df: pd.DataFrame) -> pd.DataFrame:
            df["c_ab"] = pd.Series([], dtype="float64")
            df["c_ba"] = pd.Series([], dtype="float64")
            return df
        return pairs.map_batches(tag_empty, batch_format="pandas")
    id_ref = _ray.put(ids)

    def pick(t: pa.Table) -> pa.Table:
        wanted = _ray.get(id_ref)
        mask = pd.Index(
            t.column(id_col).to_numpy(zero_copy_only=False)).isin(wanted)
        return t.filter(pa.array(mask))

    cand = docs.select_columns([id_col, text_col]).map_batches(
        pick, batch_format="pyarrow").materialize()

    if cand.count() <= broadcast_rows_budget:
        textmap = {r[id_col]: r[text_col] for r in cand.take_all()}
        map_ref = _ray.put(textmap)

        def score_bcast(batch: pd.DataFrame) -> pd.DataFrame:
            tm = _ray.get(map_ref)
            present = batch["a"].isin(tm) & batch["b"].isin(tm)
            batch = batch[present].copy()
            scores = [_word_containment(tm[a] or "", tm[b] or "", ngram)
                      for a, b in zip(batch["a"], batch["b"])]
            batch["c_ab"] = pd.Series([s[0] for s in scores],
                                      index=batch.index, dtype="float64")
            batch["c_ba"] = pd.Series([s[1] for s in scores],
                                      index=batch.index, dtype="float64")
            return batch

        return pairs.map_batches(score_bcast, batch_format="pandas")

    text_t = dict(zip(cand.schema().names, cand.schema().types))[text_col]
    cand_a = cand.map_batches(lambda t: t.rename_columns(["a", "__ta"]),
                              batch_format="pyarrow")
    cand_b = cand.map_batches(lambda t: t.rename_columns(["b", "__tb"]),
                              batch_format="pyarrow")
    pair_schema = _pairs_schema(pairs)
    sa = pa.schema([("a", pair_schema.field("a").type), ("__ta", text_t)])
    sb = pa.schema([("b", pair_schema.field("b").type), ("__tb", text_t)])
    with_a = bucketed_hash_join(pairs, cand_a, "a", num_buckets=num_buckets,
                                left_schema=pair_schema, right_schema=sa)
    mid_schema = pa.schema(
        [pair_schema.field("a")]
        + [pair_schema.field(n) for n in pair_schema.names if n != "a"]
        + [pa.field("__ta", text_t)])
    with_b = bucketed_hash_join(with_a, cand_b, "b", num_buckets=num_buckets,
                                left_schema=mid_schema, right_schema=sb)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        vals = [_word_containment(ta or "", tb or "", ngram)
                for ta, tb in zip(batch["__ta"], batch["__tb"])]
        batch["c_ab"] = [v[0] for v in vals]
        batch["c_ba"] = [v[1] for v in vals]
        return batch[list(pair_schema.names) + ["c_ab", "c_ba"]]

    return with_b.map_batches(score, batch_format="pandas")


def ngram_jaccard_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        num_perm: int = 64, bands: int = 16,
                        candidate_threshold: float = 0.5,
                        threshold: float = 0.7, seed: int = 7,
                        max_bucket: int = 64,
                        concurrency=None) -> ray.data.Dataset:
    """Word-n-gram Jaccard near-duplicate pairs: word-shingle MinHash+LSH
    candidates (the signatures estimate the SAME word-n-gram Jaccard the
    verifier computes) → exact :func:`_word_jaccard` ≥ ``threshold``.

    Returns (a, b, est_jaccard, truncated, jaccard) with a < b. Scale
    shape is inherited wholesale: texts never shuffle in the candidate
    stage, buckets are capped with a ``truncated`` flag, and the verify
    attaches texts through two bucketed hash joins — only candidate texts
    enter that exchange. ``candidate_threshold`` is set BELOW ``threshold``
    (banding recall at the target similarity is what matters; the exact
    verify is the precision gate)."""
    cand = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col,
                             num_perm=num_perm, bands=bands, shingle_k=n,
                             threshold=candidate_threshold, seed=seed,
                             max_bucket=max_bucket, mode="word",
                             concurrency=concurrency)
    return verify_pairs_jaccard(cand, ds, text_col=text_col, id_col=id_col,
                                ngram=n, threshold=threshold, mode="word")


# ---------------------------------------------------------------------------
# Near-dup clusters (connected components over candidate pairs)
# ---------------------------------------------------------------------------

def _cc_edges(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Symmetric edge list (node, nbr) from undirected candidate pairs."""
    def both_dirs(df: pd.DataFrame) -> pa.Table:
        return _arrow(pd.DataFrame({
            "node": pd.concat([df["a"], df["b"]], ignore_index=True),
            "nbr": pd.concat([df["b"], df["a"]], ignore_index=True)}))
    return pairs.select_columns(["a", "b"]).map_batches(
        both_dirs, batch_format="pandas")


def neardup_clusters_ds(pairs: ray.data.Dataset, *,
                        max_iters: int = 50) -> ray.data.Dataset:
    """Distributed connected components over candidate pairs → Dataset of
    (doc_id, cluster_id) with cluster_id = min member id — iterative
    min-label propagation, the scale path when the pair graph does not fit
    the driver.

    Per round: messages = edges ⋈ labels on the neighbor (bucketed hash
    join, ops/joins.py) → ``groupby(node).min(label)`` over labels ∪
    messages. Labels are monotonically non-increasing (in id order), so
    the label multiset changes every round until the fixed point; the
    convergence probe sums a per-row 64-bit label hash
    (``pd.util.hash_pandas_object`` — deterministic, id-TYPE-AGNOSTIC:
    string doc ids, the extraction pipeline's actual id type, work), so a
    changed round goes undetected only if hash deltas cancel exactly
    (~2⁻⁶⁴ per round; wraparound is deterministic). Rounds = max cluster
    diameter — small for near-dup graphs (dup clusters are dense).
    Everything per round is one join exchange + one aggregate over the
    CANDIDATE set only (never the corpus)."""
    from ray.data.aggregate import Sum as _Sum
    from .joins import bucketed_hash_join

    def _label_hash_sum(labels_ds: ray.data.Dataset):
        hashed = labels_ds.map_batches(
            lambda df: _arrow(pd.DataFrame({
                "h": pd.util.hash_pandas_object(df["label"], index=False)
                .to_numpy().astype(np.int64, copy=False)})),
            batch_format="pandas")
        return hashed.aggregate(_Sum("h", alias_name="s"))["s"]

    edges = _cc_edges(pairs).materialize()   # reused every round
    # init = one propagation step: label(n) = min(n, min nbr)
    labels = edges.map_batches(
        lambda df: _arrow(pd.DataFrame({
            "node": df["node"],
            "label": df[["node", "nbr"]].min(axis=1)})),
        batch_format="pandas") \
        .groupby("node").aggregate(Min("label", alias_name="label"))

    to_nbr = edges.map_batches(
        lambda df: _arrow(pd.DataFrame({"__k": df["nbr"],
                                        "__dst": df["node"]})),
        batch_format="pandas")

    prev_sum = None
    for _ in range(max_iters):
        labels = _as_arrow_blocks(labels).materialize()
        cur = _label_hash_sum(labels)
        if cur == prev_sum:
            return labels.map_batches(
                lambda df: df.rename(columns={"node": "doc_id",
                                              "label": "cluster_id"}),
                batch_format="pandas")
        prev_sum = cur
        msgs = bucketed_hash_join(
            to_nbr, labels.map_batches(
                lambda df: df.rename(columns={"node": "__k"}),
                batch_format="pandas"),
            "__k",
            left_prepare=lambda l: l.drop_duplicates(),
        ).map_batches(
            lambda df: _arrow(pd.DataFrame({"node": df["__dst"],
                                            "label": df["label"]})),
            batch_format="pandas")
        labels = labels.union(msgs).groupby("node").aggregate(
            Min("label", alias_name="label"))
    raise RuntimeError(
        f"connected components did not converge in {max_iters} rounds "
        f"(pathological graph diameter — raise max_iters)")


def neardup_clusters(pairs: ray.data.Dataset, *,
                     driver_max_pairs: int = 200_000) -> pd.DataFrame:
    """Connected components over a candidate-pair dataset → (doc_id,
    cluster_id) with cluster_id = min member id.

    Dispatch: pair graphs that fit the driver comfortably (≤
    ``driver_max_pairs``, the common LSH-output case) run a single-pass
    union-find there; bigger graphs run the distributed min-label
    propagation (:func:`neardup_clusters_ds`) and only the final
    candidate-sized labelling is collected (callers wanting a Dataset out
    should call ``neardup_clusters_ds`` directly)."""
    # candidate-pair sized (LSH-output contract): materialize so the count
    # probe and the chosen path don't each re-execute the upstream plan
    pairs = pairs.materialize()
    if pairs.count() > driver_max_pairs:
        df = neardup_clusters_ds(pairs).to_pandas()
        # normalize numeric ids to int64 for a stable driver-facing dtype;
        # string ids (the extraction pipeline's doc ids) pass through —
        # neardup_clusters_ds itself is id-type-agnostic
        if pd.api.types.is_numeric_dtype(df["doc_id"]):
            df = df.astype({"doc_id": "int64", "cluster_id": "int64"})
        return df.sort_values("doc_id").reset_index(drop=True)
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    rows = pairs.select_columns(["a", "b"]).take_all()
    for r in rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = sorted({x for r in rows for x in (r["a"], r["b"])})
    labels = [find(n) for n in nodes]
    dtype = ("int64" if all(isinstance(n, (int, np.integer))
                            for n in nodes) else None)
    return pd.DataFrame({
        "doc_id": pd.Series(nodes, dtype=dtype),
        "cluster_id": pd.Series(labels, dtype=dtype),
    })


def dedup_filter(docs: ray.data.Dataset, pairs: ray.data.Dataset,
                 id_col: str = "doc_id", *,
                 use_join: bool = False) -> ray.data.Dataset:
    """Training-data cleaning: drop near-duplicates, keeping each cluster's
    minimum id.

    Default: the drop set (non-representative cluster members) is small —
    broadcast once, filtered vectorized per batch. ``use_join=True`` is
    the path for a drop set too big to broadcast: the clusters stay a
    Dataset (distributed CC) and the corpus anti-joins the drop ids
    through the bucketed hash join — the driver never holds any ids."""
    import ray as _ray

    if use_join:
        from .joins import bucketed_hash_join
        drop_ds = neardup_clusters_ds(pairs).map_batches(
            lambda df: df.loc[df["doc_id"] != df["cluster_id"],
                              ["doc_id"]].rename(columns={"doc_id": id_col}),
            batch_format="pandas")
        return bucketed_hash_join(docs, drop_ds, id_col, how="anti")

    clusters = neardup_clusters(pairs)
    drop = set(clusters.loc[clusters["doc_id"] != clusters["cluster_id"],
                            "doc_id"])
    ref = _ray.put(drop)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        d = _ray.get(ref)
        return df[~df[id_col].isin(d)]

    return docs.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(ds: ray.data.Dataset, *,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            threshold: float = 0.95, planes: int = 12,
                            seed: int = 11,
                            max_bucket: int = 512) -> ray.data.Dataset:
    """Near-duplicate vector pairs: random-hyperplane LSH buckets, exact
    cosine verification inside each bucket."""

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pa.table({
                id_col: pa.array([], _id_type(batch[id_col])),
                "bucket": pa.array([], pa.int64()),
                "unit": pa.array([], pa.list_(pa.float64()))})
        mat = np.stack(batch[vec_col].values).astype(np.float64)
        dim = mat.shape[1]
        rng = np.random.RandomState(seed)
        hyper = rng.standard_normal((dim, planes))
        signs = (mat @ hyper) > 0
        bucket = (signs.astype(np.uint64)
                  << np.arange(planes, dtype=np.uint64)).sum(axis=1)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        return _arrow(pd.DataFrame({
            id_col: batch[id_col].values,
            "bucket": bucket.astype(np.int64),
            "unit": [u.tolist() for u in unit],
        }))

    bucketed = ds.map_batches(bucketize, batch_format="pandas")

    def pairs_block(g: pd.DataFrame) -> pa.Table:
        out = {"a": [], "b": [], "cosine": [], "truncated": []}
        g2 = g[g.duplicated("bucket", keep=False)]
        for _, grp in g2.groupby("bucket", sort=False):
            truncated = len(grp) > max_bucket
            grp = grp.sort_values(id_col).iloc[:max_bucket]  # determ. cut
            mat = np.stack([np.asarray(u) for u in grp["unit"]])
            ids = grp[id_col].tolist()
            cos = mat @ mat.T
            for i in range(len(ids)):
                for j in np.nonzero(cos[i, i + 1:] >= threshold)[0]:
                    a, b = sorted((ids[i], ids[i + 1 + j]))
                    if a == b:
                        continue
                    out["a"].append(a)
                    out["b"].append(b)
                    out["cosine"].append(float(cos[i, i + 1 + j]))
                    out["truncated"].append(truncated)
        if not out["a"]:
            return _arrow(pd.DataFrame({
                "a": g[id_col].iloc[:0], "b": g[id_col].iloc[:0],
                "cosine": pd.Series([], dtype="float64"),
                "truncated": pd.Series([], dtype="bool")}))
        return _arrow(pd.DataFrame(out))

    pairs = _grouped_exchange(_consolidate(bucketed), "bucket",
                              pairs_block)

    return _combine_pairs(pairs, "cosine")


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

def semantic_dedup(ds: ray.data.Dataset, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", n_clusters: int = 16,
                   threshold: float = 0.95, train_size: int = 4096,
                   iters: int = 8, seed: int = 13,
                   max_cluster: int = 20_000,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embeddings with a coarse quantizer trained on a bounded sample, then
    deduplicate WITHIN each cluster only — the clustering converts the
    O(n²) all-pairs cosine into per-cluster work, betting (as the paper
    does) that near-duplicates co-cluster.

    Keep rule (deterministic variant of the paper's random exemplar): a
    vector is dropped iff some SAME-CLUSTER vector with a smaller id has
    cosine >= ``threshold`` to it. Lowest-id exemplars always survive,
    and the rule needs no iteration — one masked matmul per cluster.

    Returns (id_col, centroid_id, keep, truncated) for EVERY input row.
    Clusters larger than ``max_cluster`` dedup only their ``max_cluster``
    lowest ids (the rest keep=True) and set ``truncated`` — the explicit
    cap-and-flag contract every pair-emitting op here follows. Exchange
    shape: one assignment map over the corpus, then the bucketed
    per-group exchange (``_grouped_exchange`` on centroid_id) — vectors
    shuffle once, co-partitioned by cluster."""
    from .similarity import assign_ivf, train_ivf_centroids

    cent = train_ivf_centroids(ds, n_centroids=n_clusters, vec_col=vec_col,
                               train_size=train_size, iters=iters, seed=seed)
    assigned = assign_ivf(ds, cent, vec_col=vec_col)

    def dedup_block(g: pd.DataFrame) -> pa.Table:
        ids, cents, keeps, truncs = [], [], [], []
        for cid, grp in g.groupby("centroid_id", sort=False):
            grp = grp.sort_values(id_col)
            truncated = len(grp) > max_cluster
            work = grp.iloc[:max_cluster]
            mat = np.stack(work[vec_col].values).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            sim = unit @ unit.T
            # column j drops iff any strictly-upper entry >= threshold
            drop = (np.triu(sim, 1) >= threshold).any(axis=0)
            keep = np.ones(len(grp), dtype=bool)
            keep[:len(work)] = ~drop
            ids.extend(grp[id_col].tolist())
            cents.extend([cid] * len(grp))
            keeps.extend(keep.tolist())
            truncs.extend([truncated] * len(grp))
        return _arrow(pd.DataFrame({
            id_col: pd.Series(ids, dtype=g[id_col].dtype),
            "centroid_id": pd.Series(cents, dtype="int64"),
            "keep": pd.Series(keeps, dtype="bool"),
            "truncated": pd.Series(truncs, dtype="bool")}))

    return _grouped_exchange(assigned, "centroid_id", dedup_block,
                             num_buckets=num_buckets)


def set_similarity_join(ds: ray.data.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.7,
                        num_buckets: int = 64, max_bucket: int = 10_000,
                        vocab_rows_budget: int = 50_000_000
                        ) -> ray.data.Dataset:
    """EXACT set-similarity self-join via prefix filtering (PPJoin family,
    Bayardo/Ma/Srikant, "Scaling Up All Pairs Similarity Search", WWW'07):
    every pair (a < b) whose word-token SETS (``_word_tokens``: ASCII
    ``[a-z0-9_]+`` of the lowered text) have Jaccard >= ``threshold``.
    Unlike ``minhash_lsh_pairs`` this is not probabilistic — prefix
    filtering is a LOSSLESS candidate generator, so the verified output is
    the complete qualifying pair set (full-value SQL-oracle-able; the only
    escape is the explicit capped-bucket ``truncated`` flag, shared with
    the LSH ops). Returns (a, b, truncated, jaccard).

    The lemma: order the corpus vocabulary once, globally, by ascending
    document frequency (rarest first; ties by token). For a set of size s,
    the prefix is its first p = s - ceil(tau*s) + 1 tokens in that order.
    If J(A,B) >= tau then |A∩B| >= ceil(tau*max(|A|,|B|)), and a pair
    sharing NO prefix token has all its common tokens inside suffixes of
    size ceil(tau*s) - 1 < |A∩B| — contradiction. So bucketing candidate
    generation by prefix token has recall exactly 1.

    Scale shape (100 TB posture):
      1. one corpus pass of per-block distinct-token partial counts → a
         vocab-sized (token, df) groupby. The ORDERED vocab broadcasts once
         (``ray.put``); Zipf keeps vocab ≪ corpus, and the explicit
         ``vocab_rows_budget`` fails loudly rather than silently shipping
         an over-size object per task.
      2. prefix emission: each doc emits ONLY its p globally-rarest tokens
         as (tok_rank, id, size) int rows — texts never enter the
         exchange, and the ~(1-tau) prefix fraction means the corpus'
         stop-words (max df = max rank) almost never emit: the hot buckets
         a naive token-inverted-index join would melt on are exactly the
         ones prefix filtering skips.
      3. per-token buckets generate candidates under the PPJoin size
         filter (J >= tau ⇒ min(sa, sb) >= tau·max(sa, sb)), capped and
         flagged at ``max_bucket``, deduped by ``_combine_pairs``.
      4. exact verify via :func:`verify_pairs_jaccard` (mode="word",
         ngram=1 — word 1-gram sets ARE the token sets): broadcast-or-join
         size dispatch, candidate texts move at most once.

    Epsilon discipline: the ceil/size-filter comparisons use a -1e-9 slack
    so float rounding can only ENLARGE prefixes / keep extra candidates
    (harmless pruning loss) — never drop a qualifying pair. The final
    threshold compare happens on the exact |∩|/|∪| double, the identical
    IEEE division the SQL oracle performs on the same two integers.
    """
    import math

    import ray as _ray
    from ray.data.aggregate import Sum

    # ---- pass 1: global document frequencies → ordered vocab ----
    def df_partial(df: pd.DataFrame) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for text in df[text_col]:
            c.update(set(_word_tokens(text or "")))
        return pa.table({"tok": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    vocab = ds.map_batches(df_partial, batch_format="pandas") \
        .groupby("tok").aggregate(Sum("n", alias_name="df")).to_pandas()
    if len(vocab) > vocab_rows_budget:
        raise ValueError(
            f"vocabulary ({len(vocab)} tokens) exceeds the broadcast "
            f"budget ({vocab_rows_budget}); shard the rank table or raise "
            "the budget explicitly")
    vocab = vocab.sort_values(["df", "tok"], kind="mergesort")
    rank_ref = _ray.put(
        {t: i for i, t in enumerate(vocab["tok"].to_numpy())})

    # ---- pass 2: prefix emission (rarest p tokens per doc) ----
    def emit_prefix(df: pd.DataFrame) -> pa.Table:
        rk = _ray.get(rank_ref)
        toks: list[int] = []
        ids: list[int] = []
        sizes: list[int] = []
        for i, text in zip(df[id_col], df[text_col]):
            rs = sorted(rk[t] for t in set(_word_tokens(text or "")))
            s = len(rs)
            if s == 0:
                continue  # empty set pairs with nothing (kernel: J = 0.0)
            req = math.ceil(threshold * s - 1e-9)  # min overlap if J >= tau
            p = s - req + 1
            toks.extend(rs[:p])
            ids.extend([int(i)] * p)
            sizes.extend([s] * p)
        return pa.table({"tok_rank": pa.array(toks, pa.int64()),
                         "id": pa.array(ids, pa.int64()),
                         "size": pa.array(sizes, pa.int64())})

    prefix = ds.map_batches(emit_prefix, batch_format="pandas")

    # ---- pass 3: bucketed candidate generation under the size filter ----
    def pairs_block(g: pd.DataFrame) -> pa.Table:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_t: list[np.ndarray] = []
        for _, grp in g.groupby("tok_rank", sort=False):
            trunc = len(grp) > max_bucket
            if trunc:
                grp = grp.sort_values("id").head(max_bucket)
            else:
                grp = grp.sort_values("id")
            ids = grp["id"].to_numpy()
            sz = grp["size"].to_numpy()
            m = len(ids)
            if m < 2:
                continue
            ix, iy = np.triu_indices(m, k=1)
            ok = (np.minimum(sz[ix], sz[iy]) + 1e-9
                  >= threshold * np.maximum(sz[ix], sz[iy]))
            out_a.append(ids[ix[ok]])
            out_b.append(ids[iy[ok]])
            out_t.append(np.full(int(ok.sum()), trunc, dtype=bool))
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "truncated": pa.array([], pa.bool_())})
        return pa.table({"a": pa.array(np.concatenate(out_a), pa.int64()),
                         "b": pa.array(np.concatenate(out_b), pa.int64()),
                         "truncated": pa.array(np.concatenate(out_t),
                                               pa.bool_())})

    cand = _grouped_exchange(prefix, "tok_rank", pairs_block,
                             num_buckets=num_buckets)
    combined = _combine_pairs(cand, None)

    # ---- pass 4: exact token-set Jaccard verify ----
    return verify_pairs_jaccard(combined, ds, text_col=text_col,
                                id_col=id_col, ngram=1, mode="word",
                                threshold=threshold)
