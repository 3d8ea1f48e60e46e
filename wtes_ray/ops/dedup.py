"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.

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

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

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

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "__h": [hashlib.md5((t or "").encode("utf-8")).digest()
                    for t in df[text_col]],
        })

    agg = ds.map_batches(hash_batch, batch_format="pandas") \
            .groupby("__h").aggregate(Min(id_col, alias_name=id_col))
    return agg.select_columns([id_col])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_POLY_BASE = _U64(0x9E3779B97F4A7C15)   # golden-ratio odd multiplier


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of the k-char shingles of ``text`` — fully vectorized:
    a rolling polynomial over the UTF-32 code points with a final
    splitmix-style finalizer (one numpy pass instead of one blake2b call
    per character position)."""
    if len(text) < k:
        text = text + "\x00" * (k - len(text))
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
              .astype(_U64)
    n = len(codes) - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=_U64)
        for j in range(k):          # k is small (default 5): k vector passes
            h = h * _POLY_BASE + codes[j:j + n]
        # splitmix64-style avalanche
        h ^= h >> _U64(30)
        h *= _U64(0xBF58476D1CE4E5B9)
        h ^= h >> _U64(27)
        h *= _U64(0x94D049BB133111EB)
        h ^= h >> _U64(31)
    return h


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(_U64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(_U64)
    return a, b


class MinHasher:
    """Actor-pool signature stage: permutation params built once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.k = num_perm, shingle_k
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
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


def minhash_lsh_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.7, seed: int = 7,
                      max_bucket: int = 64,
                      concurrency=None) -> ray.data.Dataset:
    """Near-duplicate candidate pairs via MinHash+LSH.

    Returns (a, b, est_jaccard, truncated) with a < b, deduplicated; the
    Jaccard estimate is the signature agreement fraction (texts never enter
    the shuffle)."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher, batch_format="pandas",
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   num_perm=num_perm, shingle_k=shingle_k,
                                   seed=seed),
        concurrency=concurrency)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"band": pd.Series([], dtype="int64"),
                                 "band_hash": pd.Series([], dtype="object"),
                                 id_col: batch[id_col],
                                 "sig": pd.Series([], dtype="object")})
        ids = batch[id_col].tolist()
        sig_list = batch["sig"].tolist()
        sig_mat = np.asarray(sig_list, dtype=np.int64)
        out = {"band": [], "band_hash": [], id_col: [], "sig": []}
        for band in range(bands):
            chunks = sig_mat[:, band * rows_per_band:(band + 1) * rows_per_band]
            out["band"].extend([band] * len(ids))
            out["band_hash"].extend(
                hashlib.blake2b(c.tobytes(), digest_size=8).hexdigest()
                for c in chunks)
            out[id_col].extend(ids)
            out["sig"].extend(sig_list)
        return pd.DataFrame(out)

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].tolist()
        if len(ids) < 2:
            return pd.DataFrame({"a": g[id_col].iloc[:0],
                                 "b": g[id_col].iloc[:0],
                                 "est_jaccard": pd.Series([], dtype="float64"),
                                 "truncated": pd.Series([], dtype="bool")})
        truncated = len(ids) > max_bucket
        g = g.iloc[:max_bucket]
        sigs = np.stack([np.asarray(s, dtype=np.int64) for s in g["sig"]])
        ids = g[id_col].tolist()
        out = {"a": [], "b": [], "est_jaccard": [], "truncated": []}
        for i in range(len(ids)):
            est = (sigs[i + 1:] == sigs[i]).mean(axis=1)
            for j_off, e in enumerate(est):
                if e >= threshold:
                    x, y = ids[i], ids[i + 1 + j_off]
                    if x == y:
                        continue
                    a, b = (x, y) if x < y else (y, x)
                    out["a"].append(a)
                    out["b"].append(b)
                    out["est_jaccard"].append(float(e))
                    out["truncated"].append(truncated)
        return pd.DataFrame(out)

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic pair combine: est_jaccard is identical across bands
        # (computed from the full signatures); `truncated` is per-bucket, so
        # any-True wins regardless of which band's row arrives first
        out = g.head(1).copy()
        out["truncated"] = bool(g["truncated"].any())
        return out

    return pairs.groupby(["a", "b"]).map_groups(combine,
                                                batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over whitespace tokens; vectorized bit accumulation."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.bits = np.arange(64, dtype=_U64)

    def simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(t.encode("utf-8"),
                                            digest_size=8).digest(),
                            "little") for t in toks),
            dtype=_U64, count=len(toks))
        bits = ((hs[:, None] >> self.bits) & _U64(1)).astype(np.int64)
        score = (2 * bits - 1).sum(axis=0)
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
        SimHasher, batch_format="pandas",
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        concurrency=concurrency)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"band": pd.Series([], dtype="int64"),
                                 "band_hash": pd.Series([], dtype="int64"),
                                 id_col: batch[id_col],
                                 "simhash": pd.Series([], dtype="int64")})
        sh = batch["simhash"].values.astype(np.int64)
        ids = batch[id_col].values
        frames = []
        for band in range(4):
            chunk = (sh.view(np.uint64) >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            frames.append(pd.DataFrame({
                "band": band, "band_hash": chunk.astype(np.int64),
                id_col: ids, "simhash": sh}))
        return pd.concat(frames, ignore_index=True)

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {"a": [], "b": [], "hamming": [], "truncated": []}
        truncated = len(g) > max_bucket
        g = g.iloc[:max_bucket]
        sh = g["simhash"].values.view(np.uint64)
        ids = g[id_col].tolist()
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
            return pd.DataFrame({"a": g[id_col].iloc[:0],
                                 "b": g[id_col].iloc[:0],
                                 "hamming": pd.Series([], dtype="int64"),
                                 "truncated": pd.Series([], dtype="bool")})
        df = pd.DataFrame(out)
        df["hamming"] = df["hamming"].astype("int64")
        return df

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.head(1).copy()   # hamming identical across bands
        out["truncated"] = bool(g["truncated"].any())
        return out

    return pairs.groupby(["a", "b"]).map_groups(combine,
                                                batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (broadcast small candidate side)
# ---------------------------------------------------------------------------

def verify_pairs_jaccard(pairs: ray.data.Dataset, docs: ray.data.Dataset, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         ngram: int = 5,
                         threshold: float = 0.5) -> ray.data.Dataset:
    """Exact character-n-gram Jaccard for candidate pairs.

    Partitioning assumption (documented, broadcast semi-join): the candidate
    id set is small relative to the corpus — their texts are collected,
    ``ray.put`` once, and read inside the verify stage. For web-scale
    candidate sets use a hash-bucket join instead."""
    import ray as _ray

    ids = set()
    for row in pairs.select_columns(["a", "b"]).take_all():
        ids.add(row["a"])
        ids.add(row["b"])
    texts = {}
    if ids:
        id_ref = _ray.put(ids)

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            wanted = _ray.get(id_ref)
            return df[df[id_col].isin(wanted)]

        small = docs.select_columns([id_col, text_col]).map_batches(
            pick, batch_format="pandas")
        for row in small.take_all():
            texts[row[id_col]] = row[text_col]
    ref = _ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lut = _ray.get(ref)

        def jac(a, b):
            ta, tb = lut.get(a, ""), lut.get(b, "")
            # true k-shingles: EMPTY set for texts shorter than ngram, so a
            # missing/empty text verifies at 0.0, never spuriously at 1.0
            sa = {ta[i:i + ngram] for i in range(len(ta) - ngram + 1)}
            sb = {tb[i:i + ngram] for i in range(len(tb) - ngram + 1)}
            if not sa or not sb:
                return 0.0
            return len(sa & sb) / len(sa | sb)

        batch["jaccard"] = [jac(a, b) for a, b in zip(batch["a"], batch["b"])]
        return batch[batch["jaccard"] >= threshold]

    return pairs.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# Near-dup clusters (connected components over candidate pairs)
# ---------------------------------------------------------------------------

def neardup_clusters(pairs: ray.data.Dataset) -> pd.DataFrame:
    """Connected components over a candidate-pair dataset → (doc_id,
    cluster_id) with cluster_id = min member id.

    Partitioning assumption (documented, ray_guide dedup pattern): the
    candidate-pair set is SMALL relative to the corpus (it is the output of
    LSH banding + thresholding), so union-find runs on the driver. For
    graphs that do not fit the driver, replace with iterative min-label
    propagation (a few rounds of groupby over (node, label) messages)."""
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
    return pd.DataFrame({
        "doc_id": pd.Series(nodes, dtype="int64"),
        "cluster_id": pd.Series([find(n) for n in nodes], dtype="int64"),
    })


def dedup_filter(docs: ray.data.Dataset, pairs: ray.data.Dataset,
                 id_col: str = "doc_id") -> ray.data.Dataset:
    """Training-data cleaning: drop near-duplicates, keeping each cluster's
    minimum id. The drop set (non-representative cluster members) is small —
    broadcast once, filtered vectorized per batch."""
    import ray as _ray

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
            return pd.DataFrame({id_col: batch[id_col],
                                 "bucket": pd.Series([], dtype="int64"),
                                 "unit": pd.Series([], dtype="object")})
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
        return pd.DataFrame({
            id_col: batch[id_col].values,
            "bucket": bucket.astype(np.int64),
            "unit": [u.tolist() for u in unit],
        })

    bucketed = ds.map_batches(bucketize, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        truncated = len(g) > max_bucket
        g = g.iloc[:max_bucket]

        def empty() -> pd.DataFrame:
            return pd.DataFrame({
                "a": g[id_col].iloc[:0], "b": g[id_col].iloc[:0],
                "cosine": pd.Series([], dtype="float64"),
                "truncated": pd.Series([], dtype="bool")})

        if len(g) < 2:
            return empty()
        mat = np.stack([np.asarray(u) for u in g["unit"]])
        ids = g[id_col].tolist()
        cos = mat @ mat.T
        out = {"a": [], "b": [], "cosine": [], "truncated": []}
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
            return empty()
        return pd.DataFrame(out)

    pairs = bucketed.groupby("bucket").map_groups(bucket_pairs,
                                                  batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.head(1).copy()   # cosine identical across buckets
        out["truncated"] = bool(g["truncated"].any())
        return out

    return pairs.groupby(["a", "b"]).map_groups(combine,
                                                batch_format="pandas")
