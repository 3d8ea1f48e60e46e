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


def naive_bayes_train(ds: ray.data.Dataset, *, text_col: str = "text",
                      label_col: str = "lang",
                      vocab_rows_budget: int = 50_000_000) -> dict:
    """Train a multinomial Naive Bayes text classifier (word-token counts,
    add-one smoothing) distributed: ONE corpus pass emits per-block partial
    (label, token, n) counts + per-label doc counts, a vocab-sized groupby
    finishes, and the model — O(classes × vocab), Zipf-bounded ≪ corpus —
    assembles on the driver for broadcast. Docs whose token set is EMPTY
    (non-ASCII-only text) contribute no counts and are skipped at classify
    time (the SQL oracle mirrors with a len > 0 guard).

    Returns {classes, priors_log, vocab (token→col), L (C×V log-prob
    matrix), default_log (C,) unseen-token log-prob, v}:
      L[c, t]       = ln((count(c, t) + 1) / (tokens(c) + V))
      default_log[c] = ln(1 / (tokens(c) + V))
      priors_log[c] = ln(docs(c) / N)
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    from .dedup import _word_tokens

    def partial(df: pd.DataFrame) -> pa.Table:
        cnt: Counter = Counter()
        docs: Counter = Counter()
        for lab, text in zip(df[label_col], df[text_col]):
            toks = _word_tokens(text or "")
            if not toks:
                continue
            docs[lab] += 1
            for t in toks:
                cnt[(lab, t)] += 1
        labs = [k[0] for k in cnt] + list(docs.keys())
        toks_ = [k[1] for k in cnt] + [""] * len(docs)  # "" = doc-count row
        ns = list(cnt.values()) + list(docs.values())
        return pa.table({"lab": pa.array(labs, pa.string()),
                         "tok": pa.array(toks_, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["lab", "tok"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    if len(agg) > vocab_rows_budget:
        raise ValueError(
            f"model ({len(agg)} label-token rows) exceeds the broadcast "
            f"budget ({vocab_rows_budget})")
    is_doc = agg["tok"] == ""
    doc_counts = dict(zip(agg.loc[is_doc, "lab"], agg.loc[is_doc, "n"]))
    counts = agg.loc[~is_doc]

    classes = sorted(doc_counts)          # lexicographic — the tie order
    cidx = {c: i for i, c in enumerate(classes)}
    vocab_sorted = sorted(counts["tok"].unique())
    vidx = {t: i for i, t in enumerate(vocab_sorted)}
    v = len(vocab_sorted)
    n_total = int(sum(doc_counts.values()))

    cnt_m = np.zeros((len(classes), v), dtype=np.float64)
    cnt_m[[cidx[l] for l in counts["lab"]],
          [vidx[t] for t in counts["tok"]]] = counts["n"].to_numpy()
    tokens_per_class = cnt_m.sum(axis=1)
    denom = (tokens_per_class + v)[:, None]
    return {
        "classes": classes,
        "priors_log": np.log(np.array(
            [doc_counts[c] for c in classes], dtype=np.float64) / n_total),
        "vocab": vidx,
        "L": np.log((cnt_m + 1.0) / denom),
        "default_log": np.log(1.0 / denom[:, 0]),
        "v": v,
    }


def naive_bayes_classify(ds: ray.data.Dataset, model: dict, *,
                         text_col: str = "text", id_col: str = "doc_id"
                         ) -> ray.data.Dataset:
    """Classify every doc with a broadcast NB ``model`` (one ``ray.put``;
    per-batch work is ONE (n_docs × n_terms) sparse gather + matmul-shaped
    reduction). Emits (id_col, pred_label, score): score = 6dp-rounded log
    posterior; argmax with ties to the LEXICOGRAPHICALLY SMALLEST label on
    the ROUNDED score (round-before-argmax — numpy's summation order and a
    SQL ``SUM`` agree at 6dp, cf. linear_classify). Empty-token docs are
    SKIPPED (mirrored by the oracle's len > 0 guard)."""
    from collections import Counter

    from .dedup import _word_tokens

    m_ref = ray.put(model)

    def score(df: pd.DataFrame) -> pa.Table:
        m = ray.get(m_ref)
        vidx, L, dflt = m["vocab"], m["L"], m["default_log"]
        prior = m["priors_log"]
        ids: list[int] = []
        preds: list[str] = []
        scores: list[float] = []
        for i, text in zip(df[id_col], df[text_col]):
            toks = _word_tokens(text or "")
            if not toks:
                continue
            c = Counter(toks)
            known_idx = []
            known_m = []
            unseen = 0
            for t, n in c.items():
                j = vidx.get(t)
                if j is None:
                    unseen += n
                else:
                    known_idx.append(j)
                    known_m.append(n)
            s = prior + dflt * unseen
            if known_idx:
                s = s + L[:, np.asarray(known_idx)] @ np.asarray(
                    known_m, dtype=np.float64)
            s6 = np.round(s, 6)
            k = int(s6.argmax())          # first max = smallest class
            ids.append(int(i))
            preds.append(m["classes"][k])
            scores.append(float(s6[k]))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "pred_label": pa.array(preds, pa.string()),
                         "score": pa.array(scores, pa.float64())})

    return ds.map_batches(score, batch_format="pandas")


def ranksum_auc(ds: "ray.data.Dataset", *, score_col: str = "score",
                label_col: str = "pos") -> "pd.DataFrame":
    """Exact ROC AUC by the rank-sum (Mann-Whitney U) identity with
    average-rank tie handling:

        AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)

    where R_pos is the sum of 1-based average ranks of the positives
    under an ascending sort of the scores.

    Distributed shape: ONE streaming pass computes per-block
    (score → n_pos, n_total) partials, one score-keyed groupby merges
    them, and the driver finishes over the DISTINCT-score table — which
    is bounded by the score's value space, not the row count (callers
    round scores first; a 6dp score in [0, 1] has ≤ 1e6+1 distinct
    values no matter how many rows stream through). Every driver-side
    term (cum-below + (cnt+1)/2, times n_pos) is an integer or a half —
    exactly representable — so the sums are order-independent and the
    result is bit-identical to the SQL window-function oracle.

    ``label_col`` must be 0/1 int; returns a 1-row DataFrame
    (n_pos, n_neg, auc rounded 6dp).
    """
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(score_col, as_index=False).agg(
            np_=(label_col, "sum"), c=(label_col, "size"))
        return pd.DataFrame({"s": g[score_col].to_numpy(),
                             "np_": g["np_"].astype("int64").to_numpy(),
                             "c": g["c"].astype("int64").to_numpy()})

    from ray.data.aggregate import Sum
    merged = ds.map_batches(partial, batch_format="pandas") \
        .groupby("s").aggregate(Sum("np_", alias_name="np_"),
                                Sum("c", alias_name="c")) \
        .to_pandas().sort_values("s").reset_index(drop=True)

    import numpy as np
    c = merged["c"].to_numpy(dtype=np.float64)
    npos_s = merged["np_"].to_numpy(dtype=np.float64)
    below = np.concatenate([[0.0], np.cumsum(c)[:-1]])
    avg_rank = below + (c + 1.0) / 2.0
    r_pos = float((npos_s * avg_rank).sum())
    n_pos = float(npos_s.sum())
    n_neg = float(c.sum() - n_pos)
    auc = ((r_pos - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * n_neg)
           if n_pos > 0 and n_neg > 0 else float("nan"))
    return pd.DataFrame({"n_pos": pd.Series([int(n_pos)], dtype="int64"),
                         "n_neg": pd.Series([int(n_neg)], dtype="int64"),
                         "auc": [round(auc, 6)]})


def grouped_ranksum_auc(ds: "ray.data.Dataset", *, group_col: str,
                        score_col: str = "score",
                        label_col: str = "pos") -> "pd.DataFrame":
    """Per-group exact ROC AUC — :func:`ranksum_auc` with the rank sums
    computed WITHIN each group (the per-domain / per-source eval slice a
    corpus-quality dashboard wants). One streaming pass of
    (group, score) partials, one exchange, driver finish bounded by
    groups × distinct rounded scores. Degenerate groups (all-positive or
    all-negative) are dropped on both sides — their AUC is undefined.
    Returns (group_col, n_pos, n_neg, auc) sorted by group."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group_col, score_col], as_index=False).agg(
            np_=(label_col, "sum"), c=(label_col, "size"))
        g["np_"] = g["np_"].astype("int64")
        g["c"] = g["c"].astype("int64")
        return g.rename(columns={score_col: "s"})

    merged = ds.map_batches(partial, batch_format="pandas") \
        .groupby([group_col, "s"]).aggregate(Sum("np_", alias_name="np_"),
                                             Sum("c", alias_name="c")) \
        .to_pandas().sort_values([group_col, "s"]).reset_index(drop=True)

    rows = []
    for grp, sub in merged.groupby(group_col, sort=True):
        c = sub["c"].to_numpy(dtype=np.float64)
        npos_s = sub["np_"].to_numpy(dtype=np.float64)
        below = np.concatenate([[0.0], np.cumsum(c)[:-1]])
        r_pos = float((npos_s * (below + (c + 1.0) / 2.0)).sum())
        n_pos = float(npos_s.sum())
        n_neg = float(c.sum() - n_pos)
        if n_pos == 0 or n_neg == 0:
            continue
        rows.append((grp, int(n_pos), int(n_neg),
                     round((r_pos - n_pos * (n_pos + 1.0) / 2.0)
                           / (n_pos * n_neg), 6)))
    return pd.DataFrame(rows, columns=[group_col, "n_pos", "n_neg",
                                       "auc"])
