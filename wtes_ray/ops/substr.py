"""Exact substring deduplication — the ExactSubstr family of Lee et al.
2021 ("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): MinHash/SimHash/SemDeDup catch near-duplicate
DOCUMENTS; this op catches long VERBATIM token runs shared across
otherwise-distinct documents (boilerplate, licenses, quoted passages)
and strips them.

Semantics (the distributed gram-chain formulation, SQL-expressible and
oracle-checked): a length-``min_len`` token window is *duplicated* iff
the exact token sequence occurs at ≥ ``min_count`` (doc, pos) sites in
the corpus (within-doc repeats count, as in the paper's "appears more
than once"). ``duplicate_spans`` returns each document's maximal merged
runs of duplicated windows; ``strip_duplicate_spans`` removes the
covered tokens and re-joins the survivors (token-normalized output:
ASCII-lowered words joined by single spaces — the same token contract
as ops/text.py / the word-mode MinHasher, so Python and the DuckDB RE2
oracle agree).

Scale shape (same discipline as cross_doc_ngram_stats, ops/text.py):
  - stage 1 streams the corpus once; each batch emits
    (h1, h2, doc_id, pos) gram rows — two independent 64-bit rolling
    hashes (≈2⁻¹²⁸ per-pair collision; a collision can only ADD a
    false duplicated window, never lose one). Texts never ride.
  - stage 2 is a gram-keyed bucketed exchange (``_grouped_exchange`` on
    h1): groups with ≥ min_count sites emit their (doc_id, pos) hits —
    duplicated grams only, usually ≪ corpus grams.
  - stage 3 is a doc-keyed bucketed exchange merging hit positions into
    maximal spans (vectorized gaps-and-islands per doc).
  - the strip co-partitions (doc, text) with its span rows in ONE
    doc-keyed exchange; texts move exactly once (the output carries
    them, so that move is irreducible).

Reference anchor: this generalizes the reference's exact URL/triple
dedup (D2/D6, tableExtractor.py) from whole-record identity to
substring identity — a capability the reference lacks but a 100 TB
training-data pipeline needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .dedup import (_MERSENNE, _U64, _arrow, _consolidate,  # noqa: F401
                    _grouped_exchange, _id_type, _rolling_poly,
                    _word_tokens)
from .runtime import stateless, task_concurrency

# second-lane rolling base — any odd 64-bit constant different from
# dedup._POLY_BASE gives an independent-enough second hash lane
_POLY_BASE2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _token_u64s(toks: list[str], cache: dict[str, int]) -> np.ndarray:
    """Per-token 64-bit hashes, blake2b memoized per distinct token
    (Zipfian vocabulary ≪ token count; same pattern as
    dedup._word_ngram_hashes)."""
    vals = np.empty(len(toks), dtype=_U64)
    for i, t in enumerate(toks):
        v = cache.get(t)
        if v is None:
            v = int.from_bytes(hashlib.blake2b(
                t.encode("utf-8"), digest_size=8).digest(), "little")
            if len(cache) < 2_000_000:
                cache[t] = v
        vals[i] = v
    return vals


class GramHasher:
    """Stage-1 map: (id, text) batch → (h1, h2, id, pos) gram rows, one
    per token position (1-based), vectorized rolling hashes over the
    token-hash array. Cached per worker via ``stateless``."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 min_len: int = 20):
        self.text_col, self.id_col, self.L = text_col, id_col, min_len
        self._cache: dict[str, int] = {}

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        ids, poss, h1s, h2s = [], [], [], []
        for d, t in zip(df[self.id_col], df[self.text_col]):
            toks = _word_tokens((t or "").lower())
            n = len(toks) - self.L + 1
            if n <= 0:
                continue
            vals = _token_u64s(toks, self._cache)
            h1s.append(_rolling_poly(vals, self.L))
            h2s.append(_rolling_poly(vals, self.L, base=_POLY_BASE2))
            ids.append(np.full(n, d))
            poss.append(np.arange(1, n + 1, dtype=np.int64))
        if not ids:
            return pa.table({
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                self.id_col: pa.array([], _id_type(df[self.id_col])),
                "pos": pa.array([], pa.int64())})
        return _arrow(pd.DataFrame({
            "h1": np.concatenate(h1s).astype(np.int64),
            "h2": np.concatenate(h2s).astype(np.int64),
            self.id_col: np.concatenate(ids),
            "pos": np.concatenate(poss)}))


def duplicate_spans(ds: ray.data.Dataset, *, text_col: str = "text",
                    id_col: str = "doc_id", min_len: int = 20,
                    min_count: int = 2, num_buckets: int = 64,
                    concurrency=None) -> ray.data.Dataset:
    """Maximal per-document runs of duplicated ``min_len``-token windows.

    Returns (id_col, start_tok, end_tok, n_windows): token positions are
    1-based, ``end_tok`` exclusive (= last window start + min_len), and
    ``n_windows`` counts the duplicated windows merged into the span.
    Two windows merge iff they overlap or touch (gap ≤ min_len)."""
    grams = ds.map_batches(
        stateless(GramHasher, text_col=text_col, id_col=id_col,
                  min_len=min_len),
        batch_format="pandas", **task_concurrency(concurrency))

    def dup_block(g: pd.DataFrame) -> pa.Table:
        if min_count == 2:
            hit = g[g.duplicated(["h1", "h2"], keep=False)]
        else:
            sz = g.groupby(["h1", "h2"])["pos"].transform("size")
            hit = g[sz >= min_count]
        return _arrow(hit[[id_col, "pos"]])

    hits = _grouped_exchange(_consolidate(grams), "h1", dup_block,
                             num_buckets=num_buckets)

    L = min_len

    def merge_block(g: pd.DataFrame) -> pa.Table:
        ids, starts, ends, nw = [], [], [], []
        for d, grp in g.groupby(id_col, sort=False):
            p = np.unique(grp["pos"].to_numpy())
            brk = np.flatnonzero(np.diff(p) > L)
            s = np.concatenate([p[:1], p[brk + 1]])
            e = np.concatenate([p[brk], p[-1:]]) + L
            seg = np.concatenate([[0], brk + 1, [len(p)]])
            ids.extend([d] * len(s))
            starts.extend(s.tolist())
            ends.extend(e.tolist())
            nw.extend(np.diff(seg).tolist())
        if not ids:
            return _arrow(pd.DataFrame({
                id_col: g[id_col].iloc[:0],
                "start_tok": pd.Series([], dtype="int64"),
                "end_tok": pd.Series([], dtype="int64"),
                "n_windows": pd.Series([], dtype="int64")}))
        return _arrow(pd.DataFrame({
            id_col: pd.Series(ids, dtype=g[id_col].dtype),
            "start_tok": pd.Series(starts, dtype="int64"),
            "end_tok": pd.Series(ends, dtype="int64"),
            "n_windows": pd.Series(nw, dtype="int64")}))

    return _grouped_exchange(_consolidate(hits), id_col, merge_block,
                             num_buckets=num_buckets)


def strip_duplicate_spans(ds: ray.data.Dataset,
                          spans: ray.data.Dataset | None = None, *,
                          text_col: str = "text", id_col: str = "doc_id",
                          min_len: int = 20, min_count: int = 2,
                          num_buckets: int = 64,
                          concurrency=None) -> ray.data.Dataset:
    """Remove every duplicated-window token from each document.

    Returns (id_col, clean_text) for EVERY input document — the
    token-normalized survivor join (ASCII-lowered words, single spaces;
    a fully-flagged or token-free document yields ``""``). ``spans``
    defaults to :func:`duplicate_spans` over ``ds`` with the same
    parameters.

    One doc-keyed exchange co-partitions the texts with their span rows
    (span rows are null-padded onto the text schema); texts move exactly
    once — irreducible, the output carries them."""
    if spans is None:
        spans = duplicate_spans(ds, text_col=text_col, id_col=id_col,
                                min_len=min_len, min_count=min_count,
                                num_buckets=num_buckets,
                                concurrency=concurrency)

    # explicit Arrow types on BOTH union sides (an all-null pandas object
    # column would infer as Arrow `null` and diverge the union's schema)
    def tag_docs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            id_col: t.column(id_col),
            "__text": t.column(text_col).cast(pa.string()),
            "start_tok": pa.nulls(n, pa.int64()),
            "end_tok": pa.nulls(n, pa.int64())})

    def tag_spans(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            id_col: t.column(id_col),
            "__text": pa.nulls(n, pa.string()),
            "start_tok": t.column("start_tok").cast(pa.int64()),
            "end_tok": t.column("end_tok").cast(pa.int64())})

    both = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        spans.map_batches(tag_spans, batch_format="pyarrow"))

    def strip_block(g: pd.DataFrame) -> pa.Table:
        out_ids, out_txt = [], []
        for d, grp in g.groupby(id_col, sort=False):
            texts = grp["__text"].dropna()
            if len(texts) == 0:
                continue            # span rows without their doc (caller
                                    # passed foreign spans) — nothing to emit
            toks = _word_tokens(str(texts.iloc[0]).lower())
            sp = grp[grp["start_tok"].notna()]
            keep = np.ones(len(toks), dtype=bool)
            for s, e in zip(sp["start_tok"], sp["end_tok"]):
                keep[int(s) - 1:int(e) - 1] = False
            out_ids.append(d)
            out_txt.append(" ".join(t for t, k in zip(toks, keep) if k))
        return _arrow(pd.DataFrame({
            id_col: pd.Series(out_ids, dtype=g[id_col].dtype),
            "clean_text": pd.Series(out_txt, dtype="object")}))

    return _grouped_exchange(both, id_col, strip_block,
                             num_buckets=num_buckets)
