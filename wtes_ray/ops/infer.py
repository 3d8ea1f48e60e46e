"""Batched model inference over an embedding column — the actor-pool /
broadcast-weights shape a training-data pipeline uses for quality
classifiers (fastText-style linear heads scoring every document).

``linear_classify`` scores each vector against a (num_classes × dim)
weight matrix with ONE numpy matmul per batch: the matrix is broadcast
once (``ray.put`` — KBs; a real checkpoint would load in an actor-pool
``__init__``, same shape), blocks stream, nothing corpus-sized leaves its
block. Output = (id, pred_class, score): argmax class with the
deterministic tie rule LOWEST class id on equal ROUNDED score — scores are
rounded to 6dp BEFORE the argmax so numpy's pairwise-summed matmul and a
SQL ``SUM`` agree on the winner (the repo's round-before-rank pattern,
cf. bm25_topk).

``demo_weights`` builds a deterministic pseudo-random weight matrix from
pure integer arithmetic — ``((1009·c + 9176·j + 31) mod 1997)/1997 − 0.5``
— so the full inference pipeline is value-checkable by a DuckDB oracle
that regenerates the SAME matrix with ``generate_series`` (no model file,
no RNG; queries.py::classify_embeddings).

100-TB posture: weights are O(classes·dim) — broadcast, never reshipped
per batch; the matmul is the only per-row work; output is 3 narrow
columns. An actual learned model swaps ``demo_weights`` for a checkpoint
load, nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def demo_weights(num_classes: int, dim: int) -> np.ndarray:
    """Deterministic (num_classes × dim) float64 weight matrix from integer
    arithmetic (SQL-regenerable; see module docstring)."""
    c = np.arange(num_classes, dtype=np.int64)[:, None]
    j = np.arange(dim, dtype=np.int64)[None, :]
    return ((1009 * c + 9176 * j + 31) % 1997) / 1997.0 - 0.5


def linear_classify(ds: ray.data.Dataset, weights: np.ndarray, *,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> ray.data.Dataset:
    """Score every vector against ``weights`` (num_classes × dim, float64);
    emit (id_col, pred_class:int64, score:float64[6dp]) — argmax class,
    ties on the ROUNDED score break to the lowest class id."""
    w_ref = ray.put(np.ascontiguousarray(weights, dtype=np.float64))

    def score(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pred_class": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        W = ray.get(w_ref)                                     # (C, d)
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch[vec_col]])                # (n, d)
        S = np.round(X @ W.T, 6)                               # (n, C)
        # argmax with lowest-class-id tie rule: np.argmax already returns
        # the FIRST maximal index, which is the lowest class id
        pred = S.argmax(axis=1)
        best = S[np.arange(len(S)), pred]
        return pa.table({
            id_col: pa.array(batch[id_col].values, pa.int64()),
            "pred_class": pa.array(pred.astype(np.int64)),
            "score": pa.array(best)})

    return ds.map_batches(score, batch_format="pandas")
