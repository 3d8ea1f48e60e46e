"""Similarity search over an embedding column (``list<float>``).

``topk_cosine`` is the exact baseline: the query matrix is broadcast once
(closure/ray.put — a few KB), each batch computes scores with one numpy
matmul and keeps only its LOCAL top-k (partial top-k = the pre-aggregation
that keeps the global sort tiny), then a small global sort finishes.

``lsh_topk_cosine`` is the scale path: random-hyperplane bucket signatures
restrict the scan to buckets within Hamming ≤ ``probe`` of the query's
signature (multi-probe LSH) — recall < 1.0 by design, documented per call.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
