"""Record linkage: fuzzy (edit-distance) join with recall-guaranteed
blocking — the entity-resolution primitive.

An all-pairs Levenshtein join is O(n²); the scalable shape is
block-then-verify, and the blocking must be an ARGUMENT, not a hope. For
edit distance ≤ 1, FOUR blocking passes give candidate recall exactly 1
(proved in tests/test_round4.py by exhaustive small-alphabet enumeration
of every single edit): key = first-2-chars, key = last-2-chars, key =
(first char, last char), and a catch-all bucket for strings of length
≤ 2. Case analysis: an edit at position p ≥ 2 leaves the prefix window;
p = 0 leaves the suffix window (len ≥ 3); the only survivor, an interior
p = 1 edit on a length-3/4 string, leaves BOTH endpoint characters — the
(first, last) key. Length-≤2 strings admit edits that hit every window,
hence the (bounded: ≤ alphabet²-sized) catch-all. Each pass is one
key-hash exchange of (key, id, name) rows; pairs verify in-bucket with
the standard unit-cost DP (identical to DuckDB's ``levenshtein``, which
the planted oracle uses).

At 100 TB names: block keys are 2-char — ~4k buckets per pass on ASCII;
skewed common prefixes are capped the same way the LSH buckets are
(``max_bucket`` + ``truncated`` flag).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (substitution/insert/delete = 1) — the same
    definition as DuckDB's ``levenshtein`` (pinned by the planted oracle
    and test_levenshtein_matches_duckdb)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def _same_len_within1(a: str, b: str) -> int:
    """Edit distance of two EQUAL-LENGTH strings, capped at 2: for equal
    lengths, dist ≤ 1 ⇔ hamming ≤ 1, so one early-exit scan replaces the
    O(L²) DP (result-equal to :func:`levenshtein` for the ≤1 question)."""
    diff = 0
    for x, y in zip(a, b):
        if x != y:
            diff += 1
            if diff > 1:
                return 2
    return diff


def _one_insert(short: str, long: str) -> bool:
    """True iff ``long`` is ``short`` with exactly one char inserted
    (⇔ levenshtein == 1 when len(long) == len(short) + 1) — one O(L)
    two-pointer scan."""
    i = j = 0
    used = False
    ls, ll = len(short), len(long)
    while i < ls:
        if short[i] == long[j]:
            i += 1
            j += 1
        elif not used:
            used = True
            j += 1
        else:
            return False
    return True


def fuzzy_self_join(ds: ray.data.Dataset, *, name_col: str = "name",
                    id_col: str = "id", max_dist: int = 1,
                    max_bucket: int = 10_000) -> ray.data.Dataset:
    """Near-match pairs (a < b by id) within ``ds`` at edit distance ≤
    ``max_dist`` (recall 1 guaranteed for max_dist=1 at ANY length by the
    four-pass blocking — see module docstring; larger max_dist keeps
    precision but loses the recall guarantee, so it raises). Returns
    (a, b, name_a, name_b, dist, truncated).

    Shape: FOUR key exchanges (prefix-2, suffix-2, endpoint, tiny) of (key, id,
    name) rows (see the module docstring for the four keys and the recall
    proof); per-bucket all-pairs verify with the DP kernel (length
    pre-filter first); buckets above ``max_bucket`` are capped-and-flagged
    (never silently dropped); the pair set dedups on (a, b) via one
    candidate-sized groupby."""
    if max_dist > 1:
        raise ValueError(
            "prefix/suffix-2 blocking guarantees recall only for "
            "max_dist=1; use n-gram blocking for larger radii")

    def keyed(which: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            names = df[name_col].fillna("")
            if which == "p":
                keys = "p" + names.str[:2]
            elif which == "s":
                keys = "s" + names.str[-2:]
            elif which == "m":
                keys = "m" + names.str[:1] + names.str[-1:]
            else:                       # tiny catch-all: len ≤ 2 only
                keys = pd.Series(["t"] * len(names), index=names.index)                     .where(names.str.len() <= 2, None)
            out = pd.DataFrame({"k": keys, id_col: df[id_col],
                                name_col: names})
            return out[out["k"].notna()]
        return f

    both = ds.map_batches(keyed("p"), batch_format="pandas")         .union(ds.map_batches(keyed("s"), batch_format="pandas"),
               ds.map_batches(keyed("m"), batch_format="pandas"),
               ds.map_batches(keyed("t"), batch_format="pandas"))

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        # In-bucket refinement (skew guard): members group by length, pairs
        # enumerate only within a length class and against the next one,
        # and each candidate uses an O(L) one-edit check — equal-length
        # dist ≤ 1 is hamming ≤ 1, off-by-one length is one-insertion —
        # instead of the O(L²) DP. Result-equal to the DP for max_dist=1
        # (pinned by the exhaustive-enumeration recall test); a skewed
        # 10k-member block key costs char scans, not 5e7 DP table fills.
        out = {"a": [], "b": [], "name_a": [], "name_b": [], "dist": [],
               "truncated": []}
        g = group.sort_values(id_col).head(max_bucket)
        trunc = len(group) > max_bucket
        ids = g[id_col].to_numpy()
        names = g[name_col].to_numpy()
        by_len: dict[int, list[int]] = {}
        for idx, n in enumerate(names):
            by_len.setdefault(len(n), []).append(idx)

        def emit(i: int, j: int, d: int) -> None:
            if ids[i] == ids[j]:
                return
            a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
            na, nb = (names[i], names[j]) if ids[i] < ids[j] \
                else (names[j], names[i])
            out["a"].append(a)
            out["b"].append(b)
            out["name_a"].append(na)
            out["name_b"].append(nb)
            out["dist"].append(d)
            out["truncated"].append(trunc)

        for length, idxs in by_len.items():
            for ii in range(len(idxs)):
                i = idxs[ii]
                for jj in range(ii + 1, len(idxs)):
                    j = idxs[jj]
                    d = _same_len_within1(names[i], names[j])
                    if d <= max_dist:
                        emit(i, j, d)
            if max_dist >= 1:
                for i in idxs:
                    for j in by_len.get(length + 1, ()):
                        if _one_insert(names[i], names[j]):
                            emit(i, j, 1)
        return pd.DataFrame(out)

    pairs = both.groupby("k").map_groups(verify, batch_format="pandas")

    def dedup(group: pd.DataFrame) -> pd.DataFrame:
        # a pair found by BOTH blocking passes appears twice — keep one
        # row; truncation anywhere taints the pair
        head = group.iloc[[0]].copy()
        head["truncated"] = bool(group["truncated"].any())
        return head

    return pairs.groupby(["a", "b"]).map_groups(dedup,
                                                batch_format="pandas")
