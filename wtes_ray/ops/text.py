"""Text analysis stages: language id, quality scoring, token counting,
document fingerprinting.

All are stateless vectorized ``map_batches`` transforms over a string column
(default ``text``), pandas-backed where string kernels need it. The language
identifier and quality scorer are deterministic heuristics (no models in this
sandbox); the class-based ``TextScorer`` shows the actor-pool shape a real
model-backed scorer would use (compiled regexes + stopword tables built once
per actor).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# word-ish tokens: unicode word runs or single non-space symbols (the
# "BPE-ish regex" tokenizer — a cheap stand-in for a real BPE vocab)
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_WS_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_DIGIT_RE = re.compile(r"\d")
_CJK_RE = re.compile(r"[一-鿿]")

_STOPWORDS = {
    "en": frozenset("the of and to a in is it you that he was for on are as"
                    " with his they i at be this have from or had by".split()),
    "de": frozenset("der die das und ist ich nicht sie du wir ein eine zu"
                    " den dem mit auf für von".split()),
    "fr": frozenset("le la les de des un une et est je tu il nous vous ils"
                    " pour dans sur avec".split()),
    "es": frozenset("el la los las de un una y es en que por para con del"
                    " se su no".split()),
}


class TextScorer:
    """Actor-pool text scorer: language id + quality features per row.

    Use as ``ds.map_batches(TextScorer, concurrency=N, batch_size=B,
    batch_format="pandas")``; state (regexes, stopword tables) is built once
    per actor in ``__init__``.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = _STOPWORDS

    def lang_of(self, text: str) -> str:
        if not text:
            return "unknown"
        n = len(text)
        cjk = len(_CJK_RE.findall(text))
        if cjk / n > 0.2:
            return "zh"
        toks = [t.lower() for t in _WS_RE.findall(text)[:200]]
        if not toks:
            return "unknown"
        best, best_hits = "other", 0
        for lang, words in self.stop.items():
            hits = sum(1 for t in toks if t in words)
            if hits > best_hits:
                best, best_hits = lang, hits
        if best_hits / len(toks) < 0.05:
            return "other"
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_chars = s.str.len()
        n_ws_tokens = s.str.count(_WS_RE)
        n_punct = s.str.count(_PUNCT_RE)
        n_digit = s.str.count(_DIGIT_RE)
        denom = n_chars.replace(0, 1)
        batch["n_chars_m"] = n_chars.astype("int64")
        batch["n_tokens"] = n_ws_tokens.astype("int64")
        batch["punct_ratio"] = (n_punct / denom).round(6)
        batch["digit_ratio"] = (n_digit / denom).round(6)
        n_ws_chars = s.str.count(r"\s")
        batch["mean_token_len"] = (
            ((n_chars - n_ws_chars) / n_ws_tokens.replace(0, 1))
            .where(n_ws_tokens > 0, 0.0).round(6))
        batch["lang_id"] = s.map(self.lang_of)
        # composite quality score in [0,1]: long enough, not punct/digit heavy
        length_score = (n_ws_tokens.clip(upper=200) / 200.0)
        batch["quality"] = (
            0.5 * length_score + 0.25 * (1 - batch["punct_ratio"].clip(0, 1))
            + 0.25 * (1 - batch["digit_ratio"].clip(0, 1))).round(6)
        return batch


def token_stats(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc token/char counts — whitespace tokens and BPE-ish regex
    tokens, vectorized."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        return pd.DataFrame({
            id_col: batch[id_col],
            "n_chars": s.str.len().astype("int64"),
            "n_tokens": s.str.count(_WS_RE).astype("int64"),
            "n_subtokens": s.str.count(_TOKEN_RE).astype("int64"),
        })

    return ds.map_batches(f, batch_format="pandas")


def stopword_stats(ds: ray.data.Dataset, *, text_col: str = "text",
                   id_col: str = "doc_id", lang: str = "en",
                   keep_cols: tuple = ()) -> ray.data.Dataset:
    """Per-doc stopword counting (the Gopher-style quality signal): number
    and fraction of word tokens (``\\w+``, lowercased) that are stopwords
    of ``lang``. Frozenset membership is C-speed per token; the token walk
    is the irreducible per-row work (same shape as language id).

    The token class is pinned to ASCII ``\\w`` (``re.ASCII``) so it means
    the same thing as the DuckDB/RE2 oracle's ``\\w`` (RE2 is ASCII-only):
    non-ASCII word characters are token BOUNDARIES on both sides. For the
    English stopword signal this is the right class anyway — stopwords are
    ASCII — and it keeps the parity exact on any corpus, not just ASCII
    ones."""
    stops = _STOPWORDS[lang]
    word_re = re.compile(r"\w+", re.ASCII)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        n_words, n_stop = [], []
        for t in texts:
            toks = word_re.findall(t.lower())
            n_words.append(len(toks))
            n_stop.append(sum(1 for w in toks if w in stops))
        n_words = pd.Series(n_words, index=batch.index)
        n_stop = pd.Series(n_stop, index=batch.index)
        out = pd.DataFrame({
            id_col: batch[id_col],
            "n_words": n_words.astype("int64"),
            "n_stopwords": n_stop.astype("int64"),
            "stopword_ratio": (n_stop / n_words.replace(0, 1))
            .where(n_words > 0, 0.0).round(6),
        })
        for c in keep_cols:
            out[c] = batch[c]
        return out

    return ds.map_batches(f, batch_format="pandas")


def repetition_stats(ds: ray.data.Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id") -> ray.data.Dataset:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 "repetition removal"): training corpora drop documents whose
    text is dominated by a few repeated n-grams. Per doc, over lowercased
    ``[a-z0-9_]+`` tokens (the vocab/TF-IDF token class — ASCII-pinned so
    it means the same as the DuckDB RE2 oracle):

      n_tokens        token count
      distinct_ratio  |{distinct tokens}| / n_tokens        (0.0 if empty)
      top_bigram_frac  max bigram count / (n_tokens - 1)    (0.0 if <2)
      top_trigram_frac max trigram count / (n_tokens - 2)   (0.0 if <3)

    The per-doc token walk is the irreducible row work (same posture as
    stopword_stats); n-gram counting is one Counter pass over zipped
    token views — no string concatenation per n-gram."""
    from collections import Counter

    tok_re = re.compile(r"[a-z0-9_]+")

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        n_tok, d_ratio, bi_frac, tri_frac = [], [], [], []
        for t in texts:
            toks = tok_re.findall(t.lower())
            n = len(toks)
            n_tok.append(n)
            d_ratio.append(len(set(toks)) / n if n else 0.0)
            bi_frac.append(
                max(Counter(zip(toks, toks[1:])).values()) / (n - 1)
                if n >= 2 else 0.0)
            tri_frac.append(
                max(Counter(zip(toks, toks[1:], toks[2:])).values()) / (n - 2)
                if n >= 3 else 0.0)
        return pd.DataFrame({
            id_col: batch[id_col],
            "n_tokens": pd.Series(n_tok, index=batch.index, dtype="int64"),
            "distinct_ratio": pd.Series(d_ratio, index=batch.index).round(6),
            "top_bigram_frac": pd.Series(bi_frac, index=batch.index).round(6),
            "top_trigram_frac": pd.Series(tri_frac,
                                          index=batch.index).round(6),
        })

    return ds.map_batches(f, batch_format="pandas")


def cross_doc_ngram_stats(ds: ray.data.Dataset, *, n: int = 5,
                          min_docs: int = 2, text_col: str = "text",
                          id_col: str = "doc_id",
                          num_buckets: int = 64) -> ray.data.Dataset:
    """Cross-document duplicated-n-gram coverage — the C4 / "Deduplicating
    Training Data" (Lee et al. 2021) boilerplate signal: per doc, how many
    of its word n-gram positions carry a gram that also appears in at
    least ``min_docs`` distinct documents.

    Returns (id_col, n_grams, n_dup_grams, dup_frac). Docs with fewer
    than ``n`` tokens have no grams and emit no row (matches the SQL
    LEAD-window formulation, where tail positions are NULL).

    Exchange shape: per block, docs reduce to DISTINCT (gram, doc,
    within-doc count) rows — gram strings shuffle ONCE, co-partitioned by
    gram through the bucketed exchange, where each gram's distinct-doc
    count decides duplication and per-doc dup contributions emit
    directly. A second, doc-keyed groupby (rows ≈ distinct grams per
    doc, far smaller) folds contributions into the per-doc totals. No
    stage ever holds the corpus-wide gram set (contrast decontaminate's
    broadcast REFERENCE set, which is external and small)."""
    tok_re = re.compile(r"[a-z0-9_]+")

    from collections import Counter

    def pairs_and_totals(batch: pd.DataFrame) -> pd.DataFrame:
        ids, grams, cnts = [], [], []
        for doc, t in zip(batch[id_col], batch[text_col].fillna("")):
            toks = tok_re.findall(t.lower())
            if len(toks) < n:
                continue
            c = Counter(" ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1))
            ids.extend([doc] * len(c))
            grams.extend(c.keys())
            cnts.extend(c.values())
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype=batch[id_col].dtype),
            "gram": pd.Series(grams, dtype="object"),
            "cnt": pd.Series(cnts, dtype="int64")})

    pairs = ds.map_batches(pairs_and_totals, batch_format="pandas")

    def per_gram(g: pd.DataFrame) -> pa.Table:
        # rows are distinct (gram, doc): a gram's row count IS its doc count
        sizes = g.groupby("gram")["gram"].transform("size")
        dup = g[sizes >= min_docs]
        out = pd.DataFrame({id_col: dup[id_col],
                            "n_grams": np.int64(0),
                            "n_dup_grams": dup["cnt"].to_numpy()})
        tot = g.groupby(id_col, as_index=False)["cnt"].sum()
        out2 = pd.DataFrame({id_col: tot[id_col],
                             "n_grams": tot["cnt"].to_numpy(),
                             "n_dup_grams": np.int64(0)})
        from .dedup import _arrow as _arrow_blk
        return _arrow_blk(pd.concat([out, out2], ignore_index=True))

    from ray.data.aggregate import Sum

    from .dedup import _grouped_exchange
    merged = _grouped_exchange(pairs, "gram", per_gram,
                               num_buckets=num_buckets) \
        .groupby(id_col).aggregate(Sum("n_grams", alias_name="n_grams"),
                                   Sum("n_dup_grams",
                                       alias_name="n_dup_grams"))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["n_grams"] = df["n_grams"].astype("int64")
        df["n_dup_grams"] = df["n_dup_grams"].astype("int64")
        df["dup_frac"] = (df["n_dup_grams"] / df["n_grams"]).round(6)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    return merged.map_batches(finish, batch_format="pyarrow")


def chunk_documents(ds: ray.data.Dataset, *, window: int = 512,
                    stride: int = 384, text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Split documents into overlapping character windows — the
    LLM-context chunking primitive (cf. pack_by_budget, which PACKS whole
    docs; this SPLITS long ones). Chunk k covers
    ``[k·stride, k·stride + window)``; a chunk exists for every
    ``k·stride < len(text)``, so empty/NULL docs emit nothing and the
    last chunk may be short. A pure flat expansion inside map_batches:
    each block fans out locally (output rows ≈ len/stride per doc), no
    exchange, streaming-safe at any corpus size. The per-doc slice loop
    is irreducible — chunk boundaries are per-string — but each slice is
    a C-level copy. Character (not byte) offsets, matching SQL
    substring() on any corpus DuckDB reads as UTF-8."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_id, out_k, out_c = [], [], []
        for i, x in zip(ids, texts):
            if not x:
                continue
            for k, off in enumerate(range(0, len(x), stride)):
                out_id.append(i)
                out_k.append(k)
                out_c.append(x[off:off + window])
        return pa.table({
            id_col: pa.array(out_id, t.schema.field(id_col).type),
            "chunk_id": pa.array(out_k, pa.int64()),
            "chunk": pa.array(out_c, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


_WS_RUN_RE = re.compile(r"[ \t\n\r]+")


def normalize_text(ds: ray.data.Dataset, *, text_col: str = "text",
                   id_col: str = "doc_id") -> ray.data.Dataset:
    """Canonical text normalization (the first cleaning pass of a corpus
    build): Unicode NFC + collapse whitespace runs to single spaces +
    strip. The whitespace class is the explicit ``[ \\t\\n\\r]`` —
    shared verbatim with the SQL oracle so Python's Unicode-aware
    ``\\s`` vs RE2's ASCII ``\\s`` can never diverge (the stopword_stats
    lesson, applied preemptively). NULL text normalizes to ''.
    Stateless vectorized map_batches; emits (id, norm_text,
    changed flag)."""
    import unicodedata

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        out = [_WS_RUN_RE.sub(" ", unicodedata.normalize("NFC", t))
               .strip() for t in texts]
        return pd.DataFrame({
            id_col: batch[id_col],
            "norm_text": out,
            "changed": pd.Series(
                [a != b for a, b in zip(out, texts)],
                index=batch.index, dtype=bool)})

    return ds.map_batches(f, batch_format="pandas")


# PII patterns pinned to the RE2-compatible subset (no lookaround, no
# backrefs) and re.ASCII so Python `re` and DuckDB regexp_replace agree
# token-for-token; applied in list order, each on the PREVIOUS pattern's
# output (an email's digits can never double-match as a phone).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d{1,3}[ -]\d{3}[ -]\d{3}[ -]\d{4}", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(ds: ray.data.Dataset, *, text_col: str = "text",
               id_col: str = "doc_id") -> ray.data.Dataset:
    """Scrub emails / phone numbers / IPv4 literals to placeholder tokens
    (the standard pre-training privacy pass), counting replacements per
    category. Stateless vectorized stage: patterns compile once per
    process (module import), ``re.subn`` walks each string once per
    pattern. Counts are taken on the text as it looks AFTER the previous
    patterns ran — the exact semantics of nested ``regexp_replace`` in
    the SQL oracle."""
    compiled = [(re.compile(p, re.ASCII), r) for p, r in PII_PATTERNS]

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        cleaned, counts = [], [[] for _ in compiled]
        for t in texts:
            for j, (rx, repl) in enumerate(compiled):
                t, n = rx.subn(repl, t)
                counts[j].append(n)
            cleaned.append(t)
        return pd.DataFrame({
            id_col: batch[id_col],
            "clean_text": cleaned,
            "n_email": pd.Series(counts[0], index=batch.index,
                                 dtype="int64"),
            "n_phone": pd.Series(counts[1], index=batch.index,
                                 dtype="int64"),
            "n_ip": pd.Series(counts[2], index=batch.index,
                              dtype="int64")})

    return ds.map_batches(f, batch_format="pandas")


# bigram id space: ord(a)·0x110000 + ord(b) — one id per ordered char
# pair over the full Unicode range; the ASCII fast path computes the
# same ids from raw bytes (ASCII ords == byte values)
_BIGRAM_BASE = 0x110000


def _bigram_ids(t: str) -> np.ndarray:
    if t.isascii():
        codes = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int64)
    else:
        codes = np.fromiter(map(ord, t), dtype=np.int64, count=len(t))
    return codes[:-1] * _BIGRAM_BASE + codes[1:]


def train_char_bigram_lm(ds: ray.data.Dataset, *,
                         text_col: str = "text"
                         ) -> tuple[dict, dict, int]:
    """One streaming pass of character-bigram counting — the training
    half of a CCNet-style LM quality filter (Wenzek et al., 2020, which
    scores docs with a KenLM n-gram model; a char bigram model is the
    sandbox-honest stand-in with the same dataflow). Per-batch partial
    (bigram_id, count) tables — numpy bincount over raw bytes on the
    ASCII fast path — reduce through one groupby; the finished model is
    CHARSET-bounded (|alphabet|² entries no matter the corpus size), so
    broadcasting it is scale-safe by construction.

    Returns ``(bigram_counts, context_counts, V)`` where context counts
    are bigram-START totals (Σ over bigrams sharing a first char) and
    ``V`` = distinct context chars — the Laplace denominator."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        parts = [_bigram_ids(x) for x in texts if x and len(x) >= 2]
        if parts:
            ids, cnt = np.unique(np.concatenate(parts), return_counts=True)
        else:
            ids = np.array([], dtype=np.int64)
            cnt = ids
        return pa.table({"bid": pa.array(ids, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bid").aggregate(_Sum("cnt", alias_name="cnt")).to_pandas()
    bids = agg["bid"].to_numpy()
    cnts = agg["cnt"].to_numpy()
    cb = dict(zip(bids.tolist(), cnts.tolist()))
    firsts = bids // _BIGRAM_BASE
    cu_ser = pd.Series(cnts).groupby(pd.Series(firsts)).sum()
    cu = {int(k): int(v) for k, v in cu_ser.items()}
    return cb, cu, len(cu)


def score_char_bigram_lm(ds: ray.data.Dataset, model: tuple[dict, dict,
                                                            int], *,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> ray.data.Dataset:
    """Scoring half of the LM quality filter: per-doc mean Laplace
    log-likelihood per bigram, ``mean(ln((c(ab)+1)/(c(a·)+V)))`` —
    higher = more corpus-typical (the CCNet keep/cut signal). The model
    rides once via ``ray.put``; per doc the bigram ids vectorize and two
    dict maps + one ``np.log`` finish it. Docs with < 2 chars emit
    nothing (no bigrams — mirrored by the oracle's length guard)."""
    cb, cu, V = model
    # array form for vectorized lookup: sorted bigram ids + counts,
    # probed with searchsorted (a dict .map per doc costs ~1 ms/doc —
    # measured 17 s for 5k docs; this batch-level form is ~20×)
    bid_arr = np.fromiter(sorted(cb), dtype=np.int64, count=len(cb))
    cb_arr = np.array([cb[b] for b in bid_arr], dtype=np.float64)
    uid_arr = np.fromiter(sorted(cu), dtype=np.int64, count=len(cu))
    cu_arr = np.array([cu[u] for u in uid_arr], dtype=np.float64)
    ref = ray.put((bid_arr, cb_arr, uid_arr, cu_arr, float(V)))

    def _lookup(keys: np.ndarray, sorted_ids: np.ndarray,
                counts: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(sorted_ids, keys)
        pos = np.minimum(pos, len(sorted_ids) - 1)
        hit = sorted_ids[pos] == keys
        return np.where(hit, counts[pos], 0.0)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(ref) if not isinstance(ref, tuple) else ref
        bid_, cb_, uid_, cu_, v_ = m
        ids_out, parts, lens = [], [], []
        for i, x in zip(t.column(id_col).to_pylist(),
                        t.column(text_col).to_pylist()):
            if not x or len(x) < 2:
                continue
            bids = _bigram_ids(x)
            ids_out.append(i)
            parts.append(bids)
            lens.append(len(bids))
        if not parts:
            return pa.table({id_col: pa.array(
                [], t.schema.field(id_col).type),
                "logprob": pa.array([], pa.float64())})
        cat = np.concatenate(parts)
        b = _lookup(cat, bid_, cb_)
        u = _lookup(cat // _BIGRAM_BASE, uid_, cu_)
        terms = np.log((b + 1.0) / (u + v_))
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sums = np.add.reduceat(terms, offs)
        lp = np.round(sums / np.asarray(lens, dtype=np.float64), 6)
        return pa.table({id_col: pa.array(ids_out,
                                          t.schema.field(id_col).type),
                         "logprob": pa.array(lp, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def fingerprints(ds: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> ray.data.Dataset:
    """Content fingerprints: md5 hex (exact-dup key, SQL-checkable) and a
    64-bit rolling polynomial hash (cheap streaming fingerprint)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        md5 = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        roll = np.fromiter((_rolling_hash(t) for t in texts),
                           dtype=np.uint64, count=len(texts))
        return pd.DataFrame({id_col: batch[id_col], "fp_md5": md5,
                             "fp_roll": roll.astype("int64")})

    return ds.map_batches(f, batch_format="pandas")


_MOD = (1 << 61) - 1
_BASE = 131
_BASE8 = pow(_BASE, 8, _MOD)


def _rolling_hash(text: str) -> int:
    """Polynomial rolling hash folded 8 bytes at a time (Horner over uint64
    words — ~8× fewer Python-loop iterations than per-char)."""
    b = text.encode("utf-8")
    pad = (-len(b)) % 8
    if pad:
        b += b"\x00" * pad
    words = np.frombuffer(b, dtype=">u8")
    h = len(text)
    for w in words.tolist():
        h = (h * _BASE8 + w) % _MOD
    return h & ((1 << 63) - 1)


# ---------------------------------------------------------------------------
# Corpus PMI (pointwise mutual information of adjacent token bigrams)
# ---------------------------------------------------------------------------

def token_pmi(ds: ray.data.Dataset, *, text_col: str = "text",
              id_col: str = "doc_id", min_count: int = 5, k: int = 50,
              vocab_budget: int = 5_000_000) -> pd.DataFrame:
    """Top-``k`` adjacent-bigram collocations by corpus PMI —
    ``ln(c_ab·N² / (M·c_a·c_b))`` with N = total tokens, M = total
    bigrams — the collocation statistic a tokenizer/phrase-mining stage
    computes corpus-wide (word2vec's phrase pass).

    Shape: ONE streaming pass emits per-block partial unigram AND bigram
    counts (a fused (kind, a, b, cnt) layout so the corpus is read once);
    one gram-keyed groupby finishes both count tables. Unigram counts are
    VOCAB-sized — under ``vocab_budget`` they broadcast once (ray.put
    dict) and PMI scores per bigram block with zero further exchanges;
    each block keeps only its local top-k (rounded-PMI rank, (a, b) tie
    break — the repo's round-before-rank rule), so the driver finishes
    over ≤ k·blocks rows. Above the budget the same attach runs as two
    bucketed hash joins (not implemented here — raise, documented).

    Returns a k-row DataFrame (a, b, c_ab, pmi:6dp)."""
    import ray as _ray
    from ray.data.aggregate import Sum as _Sum

    tok_re = re.compile(r"[a-z0-9_]+")

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in batch[text_col].fillna(""):
            toks = tok_re.findall(t.lower())
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        a = [*uni.keys(), *(p[0] for p in bi)]
        b = [""] * len(uni) + [p[1] for p in bi]
        kind = np.concatenate([np.zeros(len(uni), dtype=np.int8),
                               np.ones(len(bi), dtype=np.int8)])
        cnt = np.fromiter((*uni.values(), *bi.values()),
                          dtype=np.int64, count=len(uni) + len(bi))
        return pd.DataFrame({"kind": kind, "a": a, "b": b, "cnt": cnt})

    counts = ds.map_batches(partials, batch_format="pandas") \
        .groupby(["kind", "a", "b"]) \
        .aggregate(_Sum("cnt", alias_name="cnt")).materialize()

    uni_ds = counts.filter(expr="kind == 0")
    bi_ds = counts.filter(expr="kind == 1")
    n_tokens = float(uni_ds.aggregate(_Sum("cnt", alias_name="s"))["s"])
    m_bigrams = float(bi_ds.aggregate(_Sum("cnt", alias_name="s"))["s"])

    n_vocab = uni_ds.count()
    if n_vocab > vocab_budget:
        raise NotImplementedError(
            f"vocabulary ({n_vocab}) exceeds vocab_budget ({vocab_budget});"
            " attach unigram counts via two bucketed hash joins"
            " (ops/joins.bucketed_hash_join on a then b) for this corpus")
    vocab = {r["a"]: float(r["cnt"]) for r in uni_ds.take_all()}
    vref = _ray.put(vocab)

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        vc = _ray.get(vref)
        df = df[df["cnt"] >= min_count]
        if len(df) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object"),
                                 "c_ab": pd.Series([], dtype="int64"),
                                 "pmi": pd.Series([], dtype="float64")})
        ca = df["a"].map(vc).to_numpy(dtype=np.float64)
        cb = df["b"].map(vc).to_numpy(dtype=np.float64)
        c_ab = df["cnt"].to_numpy(dtype=np.float64)
        # keep the float expression syntactically parallel with the SQL
        # oracle so IEEE rounding agrees: ((c_ab*N)*N) / (((M*ca))*cb)
        pmi = np.round(np.log(c_ab * n_tokens * n_tokens
                              / (m_bigrams * ca * cb)), 6)
        out = pd.DataFrame({"a": df["a"].to_numpy(),
                            "b": df["b"].to_numpy(),
                            "c_ab": df["cnt"].to_numpy(np.int64),
                            "pmi": pmi})
        return out.sort_values(["pmi", "a", "b"],
                               ascending=[False, True, True]).head(k)

    heads = bi_ds.map_batches(score_block, batch_format="pandas") \
        .to_pandas()                      # ≤ k rows per block
    heads = heads.sort_values(["pmi", "a", "b"],
                              ascending=[False, True, True]).head(k)
    heads["c_ab"] = heads["c_ab"].astype("int64")
    return heads.reset_index(drop=True)


def skipgram_cooccurrence(ds: ray.data.Dataset, *, text_col: str = "text",
                          window: int = 4, min_count: int = 5
                          ) -> ray.data.Dataset:
    """Window-``window`` ORDERED token co-occurrence counts — the word2vec
    skip-gram preprocessing pass: for token positions i < j with
    j − i ≤ window within a document, count the pair (token[i], token[j]).

    Shape: ONE streaming corpus pass emits per-block partial pair counts
    (per-batch Counter over ``zip(toks, toks[d:])`` for each offset d —
    the window expansion happens inside the block, so the exchange carries
    (a, b, cnt) partials, never positions or text); one pair-keyed groupby
    finishes the counts; pairs below ``min_count`` are dropped AFTER the
    combine (a pre-filter would miscount pairs split across blocks).
    Tokens are the ASCII class ``[a-z0-9_]+`` of the lowered text — pinned
    to DuckDB's RE2 so the SQL oracle tokenizes identically.

    Returns a Dataset of (a, b, cnt)."""
    from ray.data.aggregate import Sum as _Sum

    tok_re = re.compile(r"[a-z0-9_]+", re.ASCII)

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        pairs: Counter = Counter()
        for t in batch[text_col].fillna(""):
            toks = tok_re.findall(t.lower())
            for d in range(1, window + 1):
                if d >= len(toks):
                    break
                pairs.update(zip(toks, toks[d:]))
        if not pairs:
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object"),
                                 "cnt": pd.Series([], dtype="int64")})
        ks = list(pairs.keys())
        return pd.DataFrame({
            "a": [p[0] for p in ks], "b": [p[1] for p in ks],
            "cnt": np.fromiter(pairs.values(), dtype=np.int64,
                               count=len(pairs))})

    counts = ds.map_batches(partials, batch_format="pandas") \
        .groupby(["a", "b"]).aggregate(_Sum("cnt", alias_name="cnt"))
    return counts.filter(expr=f"cnt >= {int(min_count)}")


# ---------------------------------------------------------------------------
# BPE merge training (corpus → word vocab → iterative pair merges)
# ---------------------------------------------------------------------------

def _greedy_merge(syms: list, a: str, b: str, ab: str) -> list:
    """One left-to-right greedy pass applying merge (a, b) → ab — the
    standard BPE application step (a symbol created by this pass is NOT
    re-matched within the pass). Equals the SQL oracle's run-parity
    formulation (overlapping candidates only arise when a == b; greedy
    takes the 1st, 3rd, ... of each maximal run)."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(ds: ray.data.Dataset, *, merges: int = 8,
              text_col: str = "text",
              vocab_budget: int = 5_000_000,
              force_distributed: bool = False) -> pd.DataFrame:
    """Train ``merges`` BPE merge rules over the corpus (the tokenizer-
    training stage of an LLM data pipeline; Sennrich et al. 2016).

    ONE corpus pass reduces to the word-frequency vocabulary (gram-keyed
    groupby; per-block Counter partials) — training then runs on the
    VOCAB, never the corpus, which is why BPE training scales: at 100 TB
    the word-vocab table is still ~10^7 rows. Each iteration counts
    freq-weighted adjacent symbol pairs, picks the max (ties → smallest
    (a, b), deterministic), and applies the merge greedily left-to-right
    with a word-end marker ``</w>``.

    Size dispatch: at or below ``vocab_budget`` words the loop runs on
    the driver (the realistic single-machine-trainer shape once the
    corpus pass has reduced); above it (or ``force_distributed``) the
    vocab stays a Dataset — per-block weighted pair-count partials, one
    small groupby, per-block local top-1 + driver finish for the argmax,
    a map_batches merge application per step. Both arms are pinned equal
    in tests.

    Returns (step, lhs, rhs, merged, pair_count) — ``merges`` rows,
    value-checkable against a generated step-chain SQL oracle."""
    from collections import Counter

    from ray.data.aggregate import Sum as _Sum

    tok_re = re.compile(r"[a-z0-9_]+")

    def wf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch[text_col].fillna(""):
            c.update(tok_re.findall(t.lower()))
        return pd.DataFrame({"w": list(c.keys()),
                             "freq": np.fromiter(c.values(), dtype=np.int64,
                                                 count=len(c))})

    wf = ds.map_batches(wf_partial, batch_format="pandas") \
        .groupby("w").aggregate(_Sum("freq", alias_name="freq")) \
        .materialize()

    rules: list[tuple] = []

    if wf.count() <= vocab_budget and not force_distributed:
        vpd = wf.to_pandas()
        words = [(list(w) + ["</w>"], int(f))
                 for w, f in zip(vpd["w"], vpd["freq"])]
        for step in range(1, merges + 1):
            cnt: Counter = Counter()
            for syms, f in words:
                for pair in zip(syms, syms[1:]):
                    cnt[pair] += f
            if not cnt:
                break
            c = max(cnt.values())
            a, b = min(p for p, v in cnt.items() if v == c)
            rules.append((step, a, b, a + b, int(c)))
            words = [(_greedy_merge(s, a, b, a + b), f) for s, f in words]
        return pd.DataFrame(rules, columns=["step", "lhs", "rhs",
                                            "merged", "pair_count"])

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "w": df["w"], "freq": df["freq"],
            "syms": [list(w) + ["</w>"] for w in df["w"]]})

    vocab = wf.map_batches(to_syms, batch_format="pandas").materialize()

    for step in range(1, merges + 1):
        def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
            c: Counter = Counter()
            for syms, f in zip(df["syms"], df["freq"]):
                for pair in zip(list(syms), list(syms)[1:]):
                    c[pair] += int(f)
            ks = list(c.keys())
            return pd.DataFrame({
                "a": [p[0] for p in ks], "b": [p[1] for p in ks],
                "c": np.fromiter(c.values(), dtype=np.int64,
                                 count=len(ks))})

        counts = vocab.map_batches(pair_partial, batch_format="pandas") \
            .groupby(["a", "b"]).aggregate(_Sum("c", alias_name="c"))

        def local_top1(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            return df.sort_values(["c", "a", "b"],
                                  ascending=[False, True, True]).head(1)

        heads = counts.map_batches(local_top1,
                                   batch_format="pandas").to_pandas()
        if len(heads) == 0:
            break
        top = heads.sort_values(["c", "a", "b"],
                                ascending=[False, True, True]).iloc[0]
        a, b, c = str(top["a"]), str(top["b"]), int(top["c"])
        rules.append((step, a, b, a + b, c))

        def apply(df: pd.DataFrame, a=a, b=b) -> pd.DataFrame:
            df = df.copy()
            df["syms"] = [_greedy_merge(list(s), a, b, a + b)
                          for s in df["syms"]]
            return df

        vocab = vocab.map_batches(apply,
                                  batch_format="pandas").materialize()

    return pd.DataFrame(rules, columns=["step", "lhs", "rhs",
                                        "merged", "pair_count"])


def bpe_encode_counts(ds: ray.data.Dataset, rules: list[tuple[str, str]], *,
                      text_col: str = "text") -> ray.data.Dataset:
    """ENCODE the corpus with trained BPE merge rules and return the token
    distribution — the apply side of :func:`bpe_train`: ONE corpus pass
    reduces to the word-frequency vocabulary (encoding is a function of
    the distinct word, so the merges run over the VOCAB, never the
    corpus); each block applies the (tiny, broadcast-by-closure) rule list
    greedily in training order and emits (token, Σ freq) partials; one
    token-keyed groupby finishes. Returns (token, cnt)."""
    from collections import Counter

    from ray.data.aggregate import Sum as _Sum

    tok_re = re.compile(r"[a-z0-9_]+")

    def wf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch[text_col].fillna(""):
            c.update(tok_re.findall(t.lower()))
        return pd.DataFrame({"w": list(c.keys()),
                             "freq": np.fromiter(c.values(), dtype=np.int64,
                                                 count=len(c))})

    wf = ds.map_batches(wf_partial, batch_format="pandas") \
        .groupby("w").aggregate(_Sum("freq", alias_name="freq"))

    def encode_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for w, f in zip(df["w"], df["freq"]):
            syms = list(w) + ["</w>"]
            for a, b in rules:
                syms = _greedy_merge(syms, a, b, a + b)
            f = int(f)
            for s in syms:
                c[s] += f
        return pd.DataFrame({"token": list(c.keys()),
                             "cnt": np.fromiter(c.values(), dtype=np.int64,
                                                count=len(c))})

    return wf.map_batches(encode_partial, batch_format="pandas") \
        .groupby("token").aggregate(_Sum("cnt", alias_name="cnt"))
