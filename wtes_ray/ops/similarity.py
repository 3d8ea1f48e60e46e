"""Similarity search over an embedding column (``list<float>``).

``topk_cosine`` is the exact baseline: the query matrix is broadcast once
(closure/ray.put — a few KB), each batch computes scores with one numpy
matmul and keeps only its LOCAL top-k (partial top-k = the pre-aggregation
that keeps the global sort tiny), then a small global sort finishes.

``lsh_topk_cosine`` is a scale path: random-hyperplane bucket signatures
restrict the scan to buckets within Hamming ≤ ``probe`` of the query's
signature (multi-probe LSH) — recall < 1.0 by design, documented per call.

The IVF family is the second scale path (coarse quantizer → probe lists):
``train_ivf_centroids`` (seeded spherical k-means on a driver-side sample —
the SAMPLE is small, the corpus never leaves the cluster), ``assign_ivf``
(per-batch argmax matmul adds a ``centroid_id`` column — write the corpus
partitioned by it so a query prunes whole partitions at the READ), and
``ivf_topk_cosine`` (scan only the query's ``nprobe`` nearest centroid
lists; recall < 1.0 by design). ``build_ivf_index`` + ``ivf_search_index``
wire that end-to-end: hive-partitioned parquet by ``centroid_id``, searches
list only the probed partition directories.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _as_matrix(col) -> np.ndarray:
    if len(col) == 0:
        return np.zeros((0, 1), dtype=np.float64)
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _empty_scores(batch: pd.DataFrame, id_col: str) -> pd.DataFrame:
    return pd.DataFrame({id_col: batch[id_col].iloc[:0],
                         "cosine": pd.Series([], dtype="float64")})


def topk_cosine(ds: ray.data.Dataset, query: np.ndarray, k: int = 10, *,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> ray.data.Dataset:
    """Exact brute-force cosine top-k: per-batch matmul + local top-k, then
    global sort-limit. Returns (id_col, cosine) sorted descending."""
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0:
        qn = 1.0
    q = q / qn

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_scores(batch, id_col)
        mat = _as_matrix(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ q) / norms
        out = pd.DataFrame({id_col: batch[id_col].values, "cosine": cos})
        # local partial top-k with the SAME (cosine desc, id asc) tie-break
        # as the global sort — nlargest alone would drop boundary ties
        # nondeterministically by block order
        return out.sort_values(["cosine", id_col],
                               ascending=[False, True]).head(k)

    return ds.map_batches(score, batch_format="pandas") \
             .sort(["cosine", id_col], descending=[True, False]).limit(k)


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def topk_cosine_multi(ds: ray.data.Dataset, queries: np.ndarray,
                      query_ids: list, k: int = 10, *,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> pd.DataFrame:
    """Exact brute-force cosine top-k for a BATCH of m queries at once —
    the batched-retrieval shape (one (n×d)·(d×m) matmul per block instead
    of m passes). The query matrix is broadcast once via closure (KBs);
    each block keeps its LOCAL top-k per query (≤ m·k rows leave a block),
    and the driver finishes over blocks × m × k survivor rows — bounded by
    block count and m, never by corpus size (the _sorted_head pattern).
    Ties break (cosine desc, id asc) on both sides, deterministically.
    Returns a pandas frame (query_id, id_col, cosine) — m·k rows."""
    import ray as _ray

    Q = _unit_rows(np.asarray(queries, dtype=np.float64))      # (m, d)
    m = Q.shape[0]
    qids = list(query_ids)
    assert len(qids) == m

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 id_col: batch[id_col].iloc[:0],
                                 "cosine": pd.Series([], dtype="float64")})
        mat = _unit_rows(_as_matrix(batch[vec_col]))           # (n, d)
        cos = mat @ Q.T                                        # (n, m)
        ids = batch[id_col].values
        out = {"query_id": [], id_col: [], "cosine": []}
        kk = min(k, len(ids))
        for j in range(m):
            cj = cos[:, j]
            # local top-k with the SAME (cosine desc, id asc) tie-break as
            # the global finish — a plain argpartition would keep an
            # arbitrary member of a boundary tie, varying by block split
            top = np.lexsort((ids, -cj))[:kk]
            out["query_id"].extend([qids[j]] * kk)
            out[id_col].extend(ids[top])
            out["cosine"].extend(cj[top])
        return pd.DataFrame(out)

    parts = _ray.get(ds.map_batches(score, batch_format="pandas")
                     .to_arrow_refs())
    allp = pd.concat([p.to_pandas() for p in parts if p.num_rows],
                     ignore_index=True)
    allp = allp.sort_values(["query_id", "cosine", id_col],
                            ascending=[True, False, True])
    return allp.groupby("query_id", sort=True).head(k) \
               .reset_index(drop=True)


def label_centroids(ds: ray.data.Dataset, *, label_col: str = "label",
                    vec_col: str = "embedding") -> ray.data.Dataset:
    """Per-label mean embedding (class centroids / prototype vectors — the
    per-group vector aggregate behind prototype classifiers and cluster
    summaries), exactly, in LONG layout: one row per (label, dim) with the
    float64 mean.

    Exchange shape: each block reduces to |labels|·dim partial rows
    (label, dim, s=Σv, c=n) — a per-batch float64 matmul-free masked sum —
    and one small groupby((label, dim)) finishes. The corpus vectors
    never shuffle; only label-count-sized partials do. ``dim`` is
    1-based to match SQL's generate_subscripts."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pa.Table:
        rows = {"label": [], "dim": [], "s": [], "c": []}
        if len(batch):
            mat = _as_matrix(batch[vec_col]).astype(np.float64)
            labs = batch[label_col].to_numpy()
            d = mat.shape[1]
            for lab in np.unique(labs):
                m = labs == lab
                rows["label"].extend([int(lab)] * d)
                rows["dim"].extend(range(1, d + 1))
                rows["s"].extend(mat[m].sum(axis=0))
                rows["c"].extend([int(m.sum())] * d)
        t = pa.table({"label": pa.array(rows["label"], pa.int64()),
                      "dim": pa.array(rows["dim"], pa.int64()),
                      "s": pa.array(rows["s"], pa.float64()),
                      "c": pa.array(rows["c"], pa.int64())})
        return t

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["label", "dim"]).aggregate(Sum("s", alias_name="s"),
                                             Sum("c", alias_name="c"))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        cent = _pc.divide(t.column("s").cast(pa.float64()),
                          t.column("c").cast(pa.float64()))
        return pa.table({"label": t.column("label"),
                         "dim": t.column("dim"),
                         "centroid": cent})

    return agg.map_batches(finish, batch_format="pyarrow")


def kmeans_lloyd(ds: ray.data.Dataset, init: np.ndarray, *,
                 iterations: int = 2, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> tuple[ray.data.Dataset,
                                                  np.ndarray]:
    """Distributed FULL-CORPUS Lloyd's k-means (contrast
    :func:`train_ivf_centroids`, which trains on a bounded sample): every
    iteration is ONE streaming pass over the vectors — per-batch argmin
    assignment (euclidean, lowest-id tie-break) plus (cluster, dim, Σ, n)
    partial rows — finished by a small groupby((cluster, dim)) whose
    result (k·dim rows) is the only thing the driver ever holds. Empty
    clusters keep their previous centroid (the standard fix).

    ``init`` is the (k × dim) starting centroid matrix — pass a
    deterministic seed (e.g. the k lowest-id vectors) for reproducible
    runs. Returns (assignments Dataset (id_col, cluster), final
    centroids). The assignment pass re-runs once after the last update so
    the returned labels correspond to the returned centroids."""
    from ray.data.aggregate import Sum

    cent = np.asarray(init, dtype=np.float64).copy()
    k, dim = cent.shape

    def assign_of(c: np.ndarray):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return pd.DataFrame({id_col: batch[id_col],
                                     "cluster": pd.Series([],
                                                          dtype="int64")})
            mat = _as_matrix(batch[vec_col]).astype(np.float64)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over the last two
            # terms (||x||² is constant per row); ties → lowest cluster id
            d = -2.0 * (mat @ c.T) + (c * c).sum(axis=1)[None, :]
            return pd.DataFrame({id_col: batch[id_col],
                                 "cluster": d.argmin(axis=1)
                                 .astype("int64")})
        return f

    def partials_of(c: np.ndarray):
        def f(batch: pd.DataFrame) -> pa.Table:
            rows = {"cluster": [], "dim": [], "s": [], "c": []}
            if len(batch):
                mat = _as_matrix(batch[vec_col]).astype(np.float64)
                d = -2.0 * (mat @ c.T) + (c * c).sum(axis=1)[None, :]
                lab = d.argmin(axis=1)
                for ci in np.unique(lab):
                    m = lab == ci
                    rows["cluster"].extend([int(ci)] * dim)
                    rows["dim"].extend(range(dim))
                    rows["s"].extend(mat[m].sum(axis=0))
                    rows["c"].extend([int(m.sum())] * dim)
            return pa.table({"cluster": pa.array(rows["cluster"],
                                                 pa.int64()),
                             "dim": pa.array(rows["dim"], pa.int64()),
                             "s": pa.array(rows["s"], pa.float64()),
                             "c": pa.array(rows["c"], pa.int64())})
        return f

    for _ in range(iterations):
        agg = ds.map_batches(partials_of(cent.copy()),
                             batch_format="pandas") \
            .groupby(["cluster", "dim"]).aggregate(
                Sum("s", alias_name="s"), Sum("c", alias_name="c")) \
            .to_pandas()
        new = cent.copy()
        for ci, grp in agg.groupby("cluster"):
            grp = grp.sort_values("dim")
            n = int(grp["c"].iloc[0])
            if n > 0:
                new[int(ci)] = grp["s"].to_numpy() / n
        cent = new

    return (ds.map_batches(assign_of(cent.copy()), batch_format="pandas"),
            cent)


def train_ivf_centroids(ds: ray.data.Dataset, *, n_centroids: int = 16,
                        vec_col: str = "embedding",
                        train_size: int = 4096, iters: int = 8,
                        seed: int = 13) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a bounded sample
    (``ds.limit(train_size)`` — the only data that reaches the driver;
    deterministic seeded init). Returns unit-norm centroids
    (n_centroids × dim)."""
    sample = _as_matrix(ds.limit(train_size).to_pandas()[vec_col])
    if len(sample) == 0:
        raise ValueError("cannot train IVF centroids on an empty dataset")
    x = _unit_rows(sample)
    rng = np.random.RandomState(seed)
    n_c = min(n_centroids, len(x))
    cent = x[rng.choice(len(x), size=n_c, replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(n_c):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit_rows(cent)
    return cent


def assign_ivf(ds: ray.data.Dataset, centroids: np.ndarray, *,
               vec_col: str = "embedding") -> ray.data.Dataset:
    """Add a ``centroid_id`` column (nearest-centroid by cosine, per-batch
    matmul). At scale, write the result partitioned by ``centroid_id`` so
    :func:`ivf_topk_cosine` prunes whole partitions at the read."""
    cent = np.asarray(centroids, dtype=np.float64)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            batch["centroid_id"] = pd.Series([], dtype="int64")
            return batch
        unit = _unit_rows(_as_matrix(batch[vec_col]))
        batch["centroid_id"] = (unit @ cent.T).argmax(axis=1).astype("int64")
        return batch

    return ds.map_batches(tag, batch_format="pandas")


def build_ivf_index(ds: ray.data.Dataset, index_dir: str, *,
                    n_centroids: int = 16, vec_col: str = "embedding",
                    train_size: int = 4096, iters: int = 8,
                    seed: int = 13) -> np.ndarray:
    """Materialize the IVF scale path: train a coarse quantizer on a bounded
    sample, tag every row with its nearest centroid (:func:`assign_ivf`),
    and write the corpus hive-PARTITIONED by ``centroid_id`` so a query
    prunes whole lists at the read (:func:`ivf_search_index` lists only the
    probed ``centroid_id=K/`` directories — non-probed lists are never even
    enumerated). Centroids are persisted next to the data
    (``centroids.npy``) so searches don't retrain. Returns the centroids.

    The write is an embarrassingly-parallel partitioned sink — no
    all-to-all exchange; each task splits its batch by centroid locally.
    """
    cent = train_ivf_centroids(ds, n_centroids=n_centroids, vec_col=vec_col,
                               train_size=train_size, iters=iters, seed=seed)
    assign_ivf(ds, cent, vec_col=vec_col).write_parquet(
        index_dir, partition_cols=["centroid_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    return cent


def load_ivf_centroids(index_dir: str) -> np.ndarray:
    return np.load(os.path.join(index_dir, "centroids.npy"))


def ivf_search_index(index_dir: str, query: np.ndarray, k: int = 10, *,
                     centroids: np.ndarray | None = None, nprobe: int = 4,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> ray.data.Dataset:
    """Search a :func:`build_ivf_index` index: pick the query's ``nprobe``
    nearest centroids, then read ONLY those ``centroid_id=K/`` partition
    directories (visible read-level pruning — the plan's ReadParquet sees
    just the probed paths) and run exact cosine top-k over them.

    At ``nprobe == n_centroids`` every list is probed, so the result is
    exactly brute-force :func:`topk_cosine` (the SQL-checkable full-probe
    identity); at smaller ``nprobe`` recall < 1.0 by design.
    """
    cent = (np.asarray(centroids, dtype=np.float64)
            if centroids is not None else load_ivf_centroids(index_dir))
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    qu = q / (qn if qn else 1.0)
    nprobe = min(nprobe, len(cent))
    probe_list = np.argsort(-(cent @ qu))[:nprobe].tolist()
    ds = _clean_read(_probe_paths(index_dir, probe_list),
                     [id_col, vec_col])
    return topk_cosine(ds, query, k, vec_col=vec_col, id_col=id_col)


def ivf_topk_cosine(ds: ray.data.Dataset, query: np.ndarray, k: int = 10, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    centroids: np.ndarray | None = None,
                    n_centroids: int = 16, nprobe: int = 4,
                    assigned: bool = False,
                    seed: int = 13) -> ray.data.Dataset:
    """Approximate top-k via IVF probe lists: score only rows in the
    query's ``nprobe`` nearest centroid lists (recall < 1.0 by design —
    raise ``nprobe`` toward ``n_centroids`` for exactness). Same output
    schema as :func:`topk_cosine`.

    ``assigned=True`` is the scale path: the dataset already carries the
    ``centroid_id`` column from :func:`assign_ivf` (at production scale,
    written PARTITIONED by it so the read itself prunes non-probed
    lists), and the probe filter is a cheap integer ``isin`` — no
    re-assignment matmul. ``assigned=False`` re-derives the assignment
    per batch (n×n_centroids×d FLOPs over the FULL corpus — more compute
    than brute force; useful only to exercise probe recall without a
    prepared index)."""
    if assigned and centroids is None:
        # retraining here would produce a centroid index space that need
        # not match the dataset's existing centroid_id tags → silently
        # wrong probes; the caller must pass the SAME centroids used by
        # assign_ivf
        raise ValueError("assigned=True requires the centroids the "
                         "dataset was tagged with (from assign_ivf)")
    if centroids is None:
        centroids = train_ivf_centroids(ds, n_centroids=n_centroids,
                                        vec_col=vec_col, seed=seed)
    cent = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    nprobe = min(nprobe, len(cent))
    probe_list = np.argsort(-(cent @ q))[:nprobe].tolist()
    probes = set(probe_list)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_scores(batch, id_col)
        if assigned:
            keep = batch["centroid_id"].isin(probes).values
            if not keep.any():
                return _empty_scores(batch, id_col)
            unit = _unit_rows(_as_matrix(batch[vec_col].iloc[keep]))
            cos = unit @ q
            out = pd.DataFrame({id_col: batch[id_col].values[keep],
                                "cosine": cos})
        else:
            unit = _unit_rows(_as_matrix(batch[vec_col]))
            assign = (unit @ cent.T).argmax(axis=1)
            keep = np.isin(assign, probe_list)
            if not keep.any():
                return _empty_scores(batch, id_col)
            out = pd.DataFrame({id_col: batch[id_col].values[keep],
                                "cosine": unit[keep] @ q})
        return out.sort_values(["cosine", id_col],
                               ascending=[False, True]).head(k)

    return ds.map_batches(score, batch_format="pandas") \
             .sort(["cosine", id_col], descending=[True, False]).limit(k)


def lsh_topk_cosine(ds: ray.data.Dataset, query: np.ndarray, k: int = 10, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    planes: int = 10, probe: int = 1,
                    seed: int = 11) -> ray.data.Dataset:
    """Approximate top-k: scan only rows whose hyperplane signature is within
    Hamming ≤ ``probe`` of the query's. Approximate recall; same output
    schema as :func:`topk_cosine`."""
    q = np.asarray(query, dtype=np.float64)
    rng = np.random.RandomState(seed)
    dim = q.shape[0]
    hyper = rng.standard_normal((dim, planes))
    qsig = int(((q @ hyper > 0).astype(np.uint64)
                << np.arange(planes, dtype=np.uint64)).sum())
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_scores(batch, id_col)
        mat = _as_matrix(batch[vec_col])
        sigs = ((mat @ hyper > 0).astype(np.uint64)
                << np.arange(planes, dtype=np.uint64)).sum(axis=1)
        ham = np.fromiter(
            (bin(int(s) ^ qsig).count("1") for s in sigs),
            dtype=np.int64, count=len(sigs))
        keep = ham <= probe
        if not keep.any():
            return _empty_scores(batch, id_col)
        mat = mat[keep]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ q) / norms
        out = pd.DataFrame({id_col: batch[id_col].values[keep],
                            "cosine": cos})
        return out.sort_values(["cosine", id_col],
                               ascending=[False, True]).head(k)

    return ds.map_batches(score, batch_format="pandas") \
             .sort(["cosine", id_col], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) codebooks + codes
# ---------------------------------------------------------------------------

def pq_codes(ds: ray.data.Dataset, init: np.ndarray, *, m: int = 4,
             iterations: int = 1, vec_col: str = "embedding",
             id_col: str = "vec_id") -> tuple[ray.data.Dataset,
                                              np.ndarray]:
    """Product-quantization encoding (Jégou et al., TPAMI 2011): the
    vector splits into ``m`` contiguous subspaces, each trained with its
    own :func:`kmeans_lloyd` codebook over the sliced corpus and encoded
    to that codebook's argmin id — the memory-compression path for
    billion-vector ANN (dim·4 bytes → m codes). Training is ``m``
    independent streaming k-means runs over slice views (the slice
    happens per batch inside map_batches; full vectors never copy);
    codes come back as the long layout (id, sub, code), one union of the
    m assignment datasets.

    ``init`` is a (k × dim) FULL-dimension seed matrix; subspace s seeds
    from its slice (deterministic, like kmeans_assign_embeddings).
    Returns (codes Dataset, (m × k × dim/m) codebook tensor)."""
    k, dim = np.asarray(init).shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    outs, books = [], []
    for s in range(m):
        lo, hi = s * dsub, (s + 1) * dsub

        def slicer(batch: pd.DataFrame, lo=lo, hi=hi) -> pd.DataFrame:
            mat = _as_matrix(batch[vec_col])
            return pd.DataFrame({
                id_col: batch[id_col].reset_index(drop=True),
                vec_col: list(mat[:, lo:hi])})

        sub = ds.map_batches(slicer, batch_format="pandas")
        assign, cent = kmeans_lloyd(sub, np.asarray(init)[:, lo:hi],
                                    iterations=iterations,
                                    vec_col=vec_col, id_col=id_col)
        books.append(cent)

        def tag(t: pa.Table, s=s) -> pa.Table:
            return pa.table({
                id_col: t.column(id_col),
                "sub": pa.array(np.full(t.num_rows, s, dtype=np.int64)),
                "code": t.column("cluster")})

        outs.append(assign.map_batches(tag, batch_format="pyarrow"))
    codes = outs[0]
    for o in outs[1:]:
        codes = codes.union(o)
    return codes, np.stack(books)


# ---------------------------------------------------------------------------
# IVF-PQ composed index (VERDICT r3 item 5): PQ codes stored inside the
# IVF partition layout; search = pruned read of probed lists → asymmetric-
# distance shortlist over CODES only → exact re-rank of the shortlist.
# ---------------------------------------------------------------------------

def _probe_paths(index_dir: str, probe_list: list[int]) -> list[str]:
    """Parquet files of the probed ``centroid_id=K/`` directories only —
    the read-level pruning (Ray's read_parquet treats LIST elements as
    files, so partition dirs expand here; non-probed lists are never even
    enumerated)."""
    dirs = [os.path.join(index_dir, f"centroid_id={c}") for c in probe_list]
    return [os.path.join(d, f) for d in dirs if os.path.isdir(d)
            for f in sorted(os.listdir(d)) if f.endswith(".parquet")]


def _clean_read(paths: list[str], cols: list[str]) -> ray.data.Dataset:
    """Column-pruned read with an explicit metadata-free schema (the index
    files carry pandas schema metadata — unhashable dict → 'Failed to hash
    the schemas' warnings; see queries._read_pq)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    full = pq.read_schema(paths[0])
    clean = pa.schema([full.field(c) for c in cols]).remove_metadata()
    return ray.data.read_parquet(paths, columns=cols, schema=clean)


def build_ivfpq_index(ds: ray.data.Dataset, index_dir: str,
                      pq_init: np.ndarray, *, n_centroids: int = 16,
                      m: int = 4, iterations: int = 1,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      train_size: int = 4096, iters: int = 8,
                      seed: int = 13) -> tuple[np.ndarray, np.ndarray]:
    """IVF-PQ index build (Jégou et al. TPAMI 2011 composed with the IVF
    partition layout): train the coarse quantizer on a bounded sample,
    train ``m`` per-subspace PQ codebooks distributed (:func:`pq_codes`'s
    sliced :func:`kmeans_lloyd` runs), then ONE encode pass writes
    (id, vector, codes) hive-partitioned by ``centroid_id``. Centroids
    and codebooks persist next to the data (``centroids.npy`` /
    ``pq_books.npy``) so searches don't retrain.

    At the 100 TB design point the ``codes`` column (m bytes/vector as
    int8) is what the shortlist stage reads — dim·8 bytes → m bytes per
    vector scanned, the PQ memory story — and the partition layout keeps
    the read pruned to probed lists. Returns (centroids, books)."""
    cent = train_ivf_centroids(ds, n_centroids=n_centroids, vec_col=vec_col,
                               train_size=train_size, iters=iters, seed=seed)
    # distributed per-subspace codebook training; the returned (lazy)
    # assignment dataset is discarded — only the books are needed here
    _, books = pq_codes(ds, pq_init, m=m, iterations=iterations,
                        vec_col=vec_col, id_col=id_col)
    k, dim = np.asarray(pq_init).shape
    dsub = dim // m
    half_n2 = np.stack([(books[s] ** 2).sum(axis=1) * 0.5
                        for s in range(m)])

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({id_col: batch[id_col], vec_col: [],
                                 "codes": [], "centroid_id": pd.Series(
                                     [], dtype="int64")})
        mat = _as_matrix(batch[vec_col])
        cid = (_unit_rows(mat) @ cent.T).argmax(axis=1)
        codes = np.empty((len(mat), m), dtype=np.int8)
        for s in range(m):
            sub = mat[:, s * dsub:(s + 1) * dsub]
            # argmin ||x-c||² = argmax (c·x − ||c||²/2), one matmul per sub
            codes[:, s] = (sub @ books[s].T - half_n2[s]).argmax(axis=1)
        return pd.DataFrame({
            id_col: batch[id_col].values, vec_col: list(mat),
            "codes": list(codes), "centroid_id": cid.astype("int64")})

    ds.map_batches(encode, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["centroid_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    np.save(os.path.join(index_dir, "pq_books.npy"), books)
    return cent, books


def ivfpq_search_index(index_dir: str, query: np.ndarray, k: int = 10, *,
                       nprobe: int = 4, shortlist: int | None = None,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> ray.data.Dataset:
    """Search a :func:`build_ivfpq_index` index.

    Three stages, each with the scale-correct read shape:
      1. probe: the query's ``nprobe`` nearest centroid lists — only those
         partition directories are read at all;
      2. shortlist: asymmetric distance over the CODES column only
         (per-subspace lookup tables, one gather per code lane — the
         vectors never leave storage here), keeping the global
         ``shortlist`` best candidates (default 10·k);
      3. re-rank: the probed lists re-read pruned to (id, vector),
         filtered to the shortlist ids (a ≤ shortlist-sized broadcast
         set), exact cosine top-k.

    At ``nprobe == n_centroids`` and ``shortlist ≥`` the corpus size the
    result is exactly brute-force :func:`topk_cosine` (the SQL-checkable
    full-probe/full-rerank identity); smaller settings trade recall."""
    import ray as _ray

    cent = load_ivf_centroids(index_dir)
    books = np.load(os.path.join(index_dir, "pq_books.npy"))
    m = books.shape[0]
    shortlist = 10 * k if shortlist is None else shortlist
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    qu = q / (qn if qn else 1.0)
    nprobe = min(nprobe, len(cent))
    probe_list = np.argsort(-(cent @ qu))[:nprobe].tolist()
    paths = _probe_paths(index_dir, probe_list)

    dsub = books.shape[2]
    dot_t = np.stack([books[s] @ qu[s * dsub:(s + 1) * dsub]
                      for s in range(m)])
    n2_t = np.stack([(books[s] ** 2).sum(axis=1) for s in range(m)])

    def adc(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({id_col: batch[id_col],
                                 "adc": pd.Series([], dtype="float64")})
        codes = np.stack(batch["codes"].values).astype(np.int64)
        dot = np.zeros(len(codes))
        n2 = np.zeros(len(codes))
        for s in range(m):
            dot += dot_t[s][codes[:, s]]
            n2 += n2_t[s][codes[:, s]]
        n = np.sqrt(n2)
        n[n == 0] = 1.0
        out = pd.DataFrame({id_col: batch[id_col].values, "adc": dot / n})
        return out.sort_values(["adc", id_col],
                               ascending=[False, True]).head(shortlist)

    cand = _clean_read(paths, [id_col, "codes"]) \
        .map_batches(adc, batch_format="pandas") \
        .sort(["adc", id_col], descending=[True, False]).limit(shortlist)
    ids = {r[id_col] for r in cand.select_columns([id_col]).take_all()}
    ids_ref = _ray.put(ids)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        wanted = _ray.get(ids_ref)
        return batch[batch[id_col].isin(wanted)]

    exact = _clean_read(paths, [id_col, vec_col]) \
        .map_batches(pick, batch_format="pandas")
    return topk_cosine(exact, query, k, vec_col=vec_col, id_col=id_col)


def pq_decode(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Reconstruct (n × dim) vectors from (n × m) codes — each row is the
    concatenation of its chosen subspace centroids (the ADC table's
    other half; used by tests to bound quantization error)."""
    n, m = codes.shape
    return np.concatenate([books[s][codes[:, s]] for s in range(m)],
                          axis=1)
