from ._common import *  # noqa: F401,F403
from .tpch import *  # noqa: F401,F403
from .relational import *  # noqa: F401,F403
from .events import *  # noqa: F401,F403



def lang_count(sf_dir: str) -> pd.DataFrame:
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang"])
    df = ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("lang").reset_index(drop=True)



LANG_COUNT_SQL = "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY lang"



def doc_token_stats(sf_dir: str):
    from ..ops.text import token_stats
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return token_stats(ds)



DOC_TOKEN_STATS_SQL = r"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_subtokens
FROM documents
"""



def doc_fingerprints(sf_dir: str):
    from ..ops.text import fingerprints
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return fingerprints(ds).select_columns(["doc_id", "fp_md5"])



DOC_FINGERPRINTS_SQL = "SELECT doc_id, md5(text) AS fp_md5 FROM documents"



def stopword_stats_docs(sf_dir: str):
    from ..ops.text import stopword_stats
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    df = stopword_stats(ds).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



_STOP_EN_SQL = ("'the','of','and','to','a','in','is','it','you','that','he',"
                "'was','for','on','are','as','with','his','they','i','at',"
                "'be','this','have','from','or','had','by'")


STOPWORD_STATS_SQL = rf"""
WITH base AS (
  -- coalesce NULL text to '' so counts are 0/0/0.0 like the Ray side's
  -- fillna('') (instead of NULL-propagating through the whole row)
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\w+') AS toks
  FROM documents)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_words,
  CAST(len(list_filter(toks, t -> t IN ({_STOP_EN_SQL}))) AS BIGINT)
    AS n_stopwords,
  ROUND(len(list_filter(toks, t -> t IN ({_STOP_EN_SQL}))) * 1.0
        / greatest(len(toks), 1), 6) AS stopword_ratio
FROM base ORDER BY doc_id
"""



def quality_scores(sf_dir: str) -> pd.DataFrame:
    from ..ops.runtime import stateless
    from ..ops.text import TextScorer
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(stateless(TextScorer), batch_format="pandas")
    df = out.to_pandas()[["doc_id", "n_tokens", "punct_ratio", "digit_ratio",
                          "quality"]]
    return df.sort_values("doc_id").reset_index(drop=True)



QUALITY_SCORES_SQL = r"""
WITH base AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
    ROUND(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
          / greatest(length(text), 1), 6) AS punct_ratio,
    ROUND(len(regexp_extract_all(text, '\d')) * 1.0
          / greatest(length(text), 1), 6) AS digit_ratio
  FROM documents)
SELECT doc_id, n_tokens, punct_ratio, digit_ratio,
  ROUND(0.5 * (least(n_tokens, 200) / 200.0)
        + 0.25 * (1 - punct_ratio) + 0.25 * (1 - digit_ratio), 6) AS quality
FROM base ORDER BY doc_id
"""



def lang_id_scores(sf_dir: str) -> pd.DataFrame:
    """Heuristic language id per doc. SQL-checkable: the heuristic is a
    deterministic composition DuckDB can express — CJK-ratio gate, then
    per-language stopword hits over the first 200 whitespace tokens with
    the FIRST language attaining the max winning ties (the sequential
    strictly-greater update in TextScorer.lang_of ⇒ first-occurrence-of-
    max, encoded as the CASE order en→de→fr→es below), then the ≥5%
    hit-ratio gate. Tokens lowercase via str.lower()/lower() — identical
    on this ASCII corpus (same caveat as stopword_stats' \\w pin)."""
    from ..ops.runtime import stateless
    from ..ops.text import TextScorer
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(stateless(TextScorer), batch_format="pandas")
    return out.to_pandas()[["doc_id", "lang_id"]] \
              .sort_values("doc_id").reset_index(drop=True)



def _lang_id_sql() -> str:
    # the stopword literals come from the SAME tables the Ray side uses
    from ..ops.text import _STOPWORDS

    def lit(lang: str) -> str:
        return "(" + ", ".join(
            f"'{w}'" for w in sorted(_STOPWORDS[lang])) + ")"

    return f"""
WITH t AS (
  SELECT doc_id, text,
    len(regexp_extract_all(text, '[\\x{{4E00}}-\\x{{9FFF}}]')) AS cjk,
    list_transform(list_slice(regexp_extract_all(text, '\\S+'), 1, 200),
                   x -> lower(x)) AS toks
  FROM documents),
h AS (
  SELECT doc_id, text, cjk, toks,
    len(list_filter(toks, x -> x IN {lit('en')})) AS he,
    len(list_filter(toks, x -> x IN {lit('de')})) AS hd,
    len(list_filter(toks, x -> x IN {lit('fr')})) AS hf,
    len(list_filter(toks, x -> x IN {lit('es')})) AS hs
  FROM t)
SELECT doc_id,
  CASE WHEN text IS NULL OR text = '' THEN 'unknown'
       WHEN CAST(cjk AS DOUBLE) / length(text) > 0.2 THEN 'zh'
       WHEN len(toks) = 0 THEN 'unknown'
       WHEN greatest(he, hd, hf, hs) = 0
            OR CAST(greatest(he, hd, hf, hs) AS DOUBLE) / len(toks) < 0.05
         THEN 'other'
       WHEN he = greatest(he, hd, hf, hs) THEN 'en'
       WHEN hd = greatest(he, hd, hf, hs) THEN 'de'
       WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
       ELSE 'es' END AS lang_id
FROM h ORDER BY doc_id
"""



LANG_ID_SQL = _lang_id_sql()



def lang_confusion_docs(sf_dir: str) -> pd.DataFrame:
    """Classifier-evaluation confusion matrix: stored ``lang`` label vs
    the heuristic ``lang_id`` prediction, counts per (label, prediction)
    pair — one scoring pass (cached-state TextScorer tasks) + one
    pair-keyed count; the evaluation harness every model-quality stage
    needs. The oracle reuses the full encoded lang-id SQL as a CTE."""
    from ray.data.aggregate import Count
    from ..ops.runtime import stateless
    from ..ops.text import TextScorer
    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "text", "lang"])
    out = ds.map_batches(stateless(TextScorer), batch_format="pandas") \
        .groupby(["lang", "lang_id"]).aggregate(Count(alias_name="cnt")) \
        .to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values(["lang", "lang_id"]).reset_index(drop=True)



def _lang_confusion_sql() -> str:
    return (f"WITH lid AS ({_lang_id_sql()})\n"
            "SELECT d.lang, lid.lang_id, CAST(COUNT(*) AS BIGINT) AS cnt\n"
            "FROM lid JOIN documents d USING (doc_id)\n"
            "GROUP BY 1, 2 ORDER BY lang, lang_id")



def doc_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition filters (ops/text.repetition_stats):
    distinct-token ratio and most-frequent bigram/trigram fractions per
    doc — the signals a training pipeline thresholds to drop boilerplate
    and degenerate repetition. Embarrassingly parallel map_batches; no
    exchange."""
    from ..ops.text import repetition_stats
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = repetition_stats(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



# Zipped unnest (value + generate_subscripts position) reconstructs token
# order, LEAD windows build the n-grams; token class matches the Python
# side's ASCII [a-z0-9_]+ exactly (RE2 \w would also work but is kept
# explicit like VOCAB_TOP_TERMS_SQL).
DOC_REPETITION_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
  FROM arr),
base AS (SELECT doc_id, len(toks) AS n_tokens FROM arr),
dist AS (SELECT doc_id, COUNT(DISTINCT term) AS n_distinct
         FROM toks GROUP BY doc_id),
bi AS (
  SELECT doc_id, MAX(c) AS top_bi FROM (
    SELECT doc_id, COUNT(*) AS c
    FROM (SELECT doc_id, pos, term,
                 LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
          FROM toks)
    WHERE t2 IS NOT NULL GROUP BY doc_id, term, t2)
  GROUP BY doc_id),
tri AS (
  SELECT doc_id, MAX(c) AS top_tri FROM (
    SELECT doc_id, COUNT(*) AS c
    FROM (SELECT doc_id, pos, term,
                 LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
                 LEAD(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
          FROM toks)
    WHERE t3 IS NOT NULL GROUP BY doc_id, term, t2, t3)
  GROUP BY doc_id)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN b.n_tokens > 0
                  THEN CAST(COALESCE(d.n_distinct, 0) AS DOUBLE) / b.n_tokens
                  ELSE 0.0 END, 6) AS distinct_ratio,
       ROUND(CASE WHEN b.n_tokens >= 2
                  THEN CAST(COALESCE(bi.top_bi, 0) AS DOUBLE)
                       / (b.n_tokens - 1)
                  ELSE 0.0 END, 6) AS top_bigram_frac,
       ROUND(CASE WHEN b.n_tokens >= 3
                  THEN CAST(COALESCE(tri.top_tri, 0) AS DOUBLE)
                       / (b.n_tokens - 2)
                  ELSE 0.0 END, 6) AS top_trigram_frac
FROM base b
LEFT JOIN dist d USING (doc_id)
LEFT JOIN bi USING (doc_id)
LEFT JOIN tri USING (doc_id)
ORDER BY b.doc_id
"""



def skipgram_cooc_docs(sf_dir: str) -> pd.DataFrame:
    """Skip-gram window-4 ordered co-occurrence counts ≥ 5 (ops/text.
    skipgram_cooccurrence — word2vec preprocessing): per-block Counter
    partials carry (a, b, cnt) into ONE pair-keyed groupby; the window
    expansion never leaves the block. Full-value oracle: DuckDB positional
    self-join on the same RE2 tokenization."""
    from ..ops.text import skipgram_cooccurrence
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])
    out = skipgram_cooccurrence(ds, window=4, min_count=5).to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)



SKIPGRAM_COOC_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM arr)
SELECT x.tok AS a, y.tok AS b, COUNT(*) AS cnt
FROM toks x JOIN toks y
  ON x.doc_id = y.doc_id AND y.pos > x.pos AND y.pos <= x.pos + 4
GROUP BY x.tok, y.tok
HAVING COUNT(*) >= 5
ORDER BY a, b
"""



def char_entropy_docs(sf_dir: str) -> pd.DataFrame:
    """Per-document character-distribution Shannon entropy (nats) — the
    Gopher-family compressibility/quality signal: vectorized np.unique
    histogram per doc, H = ln(n) − (Σ c·ln c)/n (this factorization makes
    the float expression shared with SQL term-for-term). Embarrassingly
    parallel; no exchange."""
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ents = []
        for t in batch["text"].fillna(""):
            if not t:
                ents.append(0.0)
                continue
            _, cnt = np.unique(list(t), return_counts=True)
            c = cnt.astype(np.float64)
            n = float(len(t))
            ents.append(round(np.log(n) - float((c * np.log(c)).sum()) / n,
                              6))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "entropy": pd.Series(ents, dtype="float64",
                                                  index=batch.index)})

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, UNNEST(string_split(text, '')) AS ch FROM documents),
hist AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS c
  FROM chars GROUP BY doc_id, ch),
tot AS (SELECT doc_id, SUM(c) AS n FROM hist GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(ROUND(LN(t.n) - (SELECT SUM(c * LN(c)) FROM hist h
                                 WHERE h.doc_id = d.doc_id) / t.n, 6),
                0.0) AS entropy
FROM documents d LEFT JOIN tot t ON t.doc_id = d.doc_id
ORDER BY d.doc_id
"""



def heavy_bigrams_docs(sf_dir: str) -> pd.DataFrame:
    """Exact heavy-hitter word BIGRAMS (corpus boilerplate phrases — the
    text-domain application of the Misra-Gries machinery already pinned
    on user ids): one flat bigram expansion per block feeds
    ops/sketch.heavy_hitters' two bounded passes (mergeable summaries →
    certified candidate superset → broadcast exact recount); no pass
    shuffles more than min(k, |candidates|) rows per block. Oracle:
    GROUP BY … HAVING over the LEAD-window bigrams."""
    import re as _re

    from ..ops.sketch import heavy_hitters
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])
    tok_re = _re.compile(r"[a-z0-9_]+")

    def bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        out: list[str] = []
        for t in batch["text"].fillna(""):
            toks = tok_re.findall(t.lower())
            out.extend(a + " " + b for a, b in zip(toks, toks[1:]))
        return pd.DataFrame({"bigram": pd.Series(out, dtype="object")})

    # scale-derived threshold, identical on both sides: ceil(n_docs/12)
    # (≥ 4) — a fixed count can't fit every sf
    n_docs = pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows
    threshold = max(4, -(-n_docs // 12))
    grams = ds.map_batches(bigrams, batch_format="pandas")
    hh = heavy_hitters(grams, "bigram", threshold=threshold)
    hh = hh.rename(columns={"n": "cnt"})
    hh["cnt"] = hh["cnt"].astype("int64")
    return hh.sort_values("bigram").reset_index(drop=True)



HEAVY_BIGRAMS_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM arr),
bi AS (
  SELECT tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos)
           AS bigram
  FROM toks QUALIFY LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos)
            IS NOT NULL)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM bi GROUP BY bigram
HAVING COUNT(*) >= GREATEST(4, CEIL((SELECT COUNT(*) FROM documents)
                                    / 12.0))
ORDER BY bigram
"""



def token_pmi_docs(sf_dir: str) -> pd.DataFrame:
    """Top-50 adjacent-bigram collocations by corpus PMI (ops/text.
    token_pmi): one fused streaming pass emits partial unigram+bigram
    counts, one gram-keyed groupby finishes, vocab-sized unigram counts
    broadcast, per-block local top-k bounds the driver finish. Rounded-PMI
    rank with (a, b) tie break = the ULP-stable rule."""
    from ..ops.text import token_pmi
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return token_pmi(ds, min_count=5, k=50)



TOKEN_PMI_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM arr),
bi AS (
  SELECT tok AS a, LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM toks),
bc AS (SELECT a, b, COUNT(*) AS c_ab FROM bi WHERE b IS NOT NULL
       GROUP BY a, b),
uc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT (SELECT CAST(SUM(c) AS DOUBLE) FROM uc) AS n,
               (SELECT CAST(SUM(c_ab) AS DOUBLE) FROM bc) AS m),
scored AS (
  SELECT bc.a, bc.b, CAST(bc.c_ab AS BIGINT) AS c_ab,
         ROUND(LN(CAST(bc.c_ab AS DOUBLE) * tot.n * tot.n
                  / (tot.m * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))),
               6) AS pmi
  FROM bc CROSS JOIN tot
  JOIN uc ua ON ua.tok = bc.a
  JOIN uc ub ON ub.tok = bc.b
  WHERE bc.c_ab >= 5)
SELECT a, b, c_ab, pmi FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, a, b) AS rn FROM scored)
WHERE rn <= 50 ORDER BY pmi DESC, a, b
"""



def bpe_merges_docs(sf_dir: str) -> pd.DataFrame:
    """8 BPE merge rules trained over the documents corpus (ops/text.
    bpe_train): one corpus pass reduces to the word-frequency vocab, the
    training loop then runs vocab-sized (driver arm here — the
    distributed arm is pinned equal in tests). Deterministic argmax: max
    freq-weighted pair count, ties to the smallest (a, b)."""
    from ..ops.text import bpe_train
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return bpe_train(ds, merges=8)



def bpe_encode_docs(sf_dir: str) -> pd.DataFrame:
    """Corpus token distribution AFTER applying the 8 trained BPE merges —
    the ENCODE side of the tokenizer (ops/text.bpe_encode_counts): train
    on the vocab, then one vocab-sized apply pass emits (token, Σ word
    freq) partials into a token-keyed groupby. Oracle: the same generated
    merge chain, read out at seq8 (the encoded vocab) joined to the word
    frequencies — so training AND application are value-checked
    together."""
    from ..ops.text import bpe_encode_counts, bpe_train
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    rules = [(r.lhs, r.rhs) for r in bpe_train(ds, merges=8).itertuples()]
    out = bpe_encode_counts(ds, rules).to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("token").reset_index(drop=True)



BPE_ENCODE_SQL_TAIL = """
SELECT s AS token, CAST(SUM(freq) AS BIGINT) AS cnt
FROM {seqk} JOIN wf USING (w)
GROUP BY s ORDER BY token"""



def _bpe_sql(k: int = 8, final_select: str | None = None) -> str:
    """Generated step-chain BPE oracle (the kmeans/pagerank pattern):
    seq{i} applies pick{i}'s merge to seq{i-1} via the run-parity
    formulation (greedy left-to-right: 1st, 3rd, ... of each maximal
    overlap run — overlaps only arise when lhs == rhs). CTEs MUST be
    MATERIALIZED: DuckDB's default inlining re-evaluates the chain
    combinatorially (the kmeans lesson)."""
    parts = ["""WITH toks AS MATERIALIZED (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
  FROM documents),
wf AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY w),
seq0 AS MATERIALIZED (
  SELECT w, p, s FROM (
    SELECT w, generate_subscripts(string_split(w, ''), 1) AS p,
           unnest(string_split(w, '')) AS s FROM wf)
  UNION ALL SELECT w, LENGTH(w) + 1, '</w>' FROM wf)"""]
    for i in range(1, k + 1):
        prev = f"seq{i - 1}"
        parts.append(f""",
cnt{i} AS MATERIALIZED (
  SELECT a, b, SUM(freq) AS c FROM (
    SELECT w, s AS a, LEAD(s) OVER (PARTITION BY w ORDER BY p) AS b
    FROM {prev}) x
  JOIN wf USING (w) WHERE b IS NOT NULL GROUP BY a, b),
pick{i} AS MATERIALIZED (
  SELECT a, b, CAST(c AS BIGINT) AS c FROM cnt{i}
  ORDER BY c DESC, a, b LIMIT 1),
seq{i} AS MATERIALIZED (
  SELECT w, ROW_NUMBER() OVER (PARTITION BY w ORDER BY p) AS p, s FROM (
    SELECT w, p,
           CASE WHEN hit THEN (SELECT a || b FROM pick{i}) ELSE s END AS s,
           COALESCE(LAG(hit) OVER (PARTITION BY w ORDER BY p),
                    FALSE) AS consumed
    FROM (
      SELECT w, p, s,
             COALESCE(pairable
                      AND ((p - MIN(p) OVER (PARTITION BY w, grp)) % 2 = 0),
                      FALSE) AS hit
      FROM (
        SELECT w, p, s, pairable,
               CASE WHEN pairable THEN p - ROW_NUMBER()
                    OVER (PARTITION BY w, pairable ORDER BY p) END AS grp
        FROM (
          SELECT w, p, s,
                 (s = (SELECT a FROM pick{i})
                  AND LEAD(s) OVER (PARTITION BY w ORDER BY p)
                      = (SELECT b FROM pick{i})) AS pairable
          FROM {prev}) t1) t2) t3) t4
  WHERE NOT consumed)""")
    if final_select is not None:
        # caller-supplied tail over the chain (seq{k} = the fully-merged
        # symbol sequences, i.e. the ENCODED vocab; wf = word frequencies)
        parts.append("\n" + final_select.format(seqk=f"seq{k}"))
        return "".join(parts)
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, a AS lhs, b AS rhs,"
        f" a || b AS merged, c AS pair_count FROM pick{i}"
        for i in range(1, k + 1))
    parts.append(f"\n{selects}\nORDER BY step")
    return "".join(parts)



BPE_MERGES_SQL = _bpe_sql(8)



def cross_doc_ngram_docs(sf_dir: str) -> pd.DataFrame:
    """Cross-document duplicated 5-gram coverage per doc (ops/text.
    cross_doc_ngram_stats): the C4-style boilerplate signal — what
    fraction of a doc's 5-gram positions carry a gram shared with ≥2
    distinct docs. Gram strings shuffle once, co-partitioned by gram."""
    from ..ops.text import cross_doc_ngram_stats
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = cross_doc_ngram_stats(ds, n=5, min_docs=2).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



# `term || ' ' || NULL` is NULL, so tail positions (LEAD past the doc end)
# drop exactly like the Python range(len - n + 1); docs with <5 tokens
# emit no row on either side.
CROSS_DOC_NGRAM_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
  FROM arr),
g AS (
  SELECT doc_id,
         term || ' ' || LEAD(term, 1) OVER w || ' ' || LEAD(term, 2) OVER w
              || ' ' || LEAD(term, 3) OVER w || ' ' || LEAD(term, 4) OVER w
           AS gram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
g2 AS (SELECT doc_id, gram FROM g WHERE gram IS NOT NULL),
dup AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS c
                          FROM g2 GROUP BY gram) WHERE c >= 2)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE gram IN (SELECT gram FROM dup))
            AS BIGINT) AS n_dup_grams,
       ROUND(CAST(COUNT(*) FILTER (WHERE gram IN (SELECT gram FROM dup))
                  AS DOUBLE) / COUNT(*), 6) AS dup_frac
FROM g2 GROUP BY doc_id ORDER BY doc_id
"""



def corpus_diff_docs(sf_dir: str) -> pd.DataFrame:
    """Version diff between the documents table and a deterministically
    derived v2 (drop doc_id%7==0, append ' v2' to text where doc_id%11==0,
    add 5 new ids): added/removed/changed deltas via ops/curate.
    corpus_diff — (id, md5) digests through three bucketed joins; texts
    never shuffle, output is delta-sized."""
    from ..ops.curate import corpus_diff
    old = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def to_v2(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = ids % 7 != 0
        t = t.filter(pa.array(keep))
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        texts = [x + " v2" if i % 11 == 0 else x
                 for i, x in zip(ids, texts)]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    head = _sorted_head(_t(sf_dir, "documents"), "doc_id",
                        ["doc_id", "text"], 5)
    new = old.map_batches(to_v2, batch_format="pyarrow").union(
        rd.from_arrow(pa.table({
            "doc_id": pc.add(head["doc_id"], pa.scalar(10**12)),
            "text": head["text"]})))
    df = corpus_diff(old, new).to_pandas()
    return df.sort_values(["doc_id", "change"]).reset_index(drop=True)



def incremental_lang_stats(sf_dir: str) -> pd.DataFrame:
    """Incremental materialized-view maintenance: per-lang
    (n_docs, sum_chars) for corpus v2, computed as v1's aggregate PLUS
    delta-sized adjustments — never a second full scan of v2. The delta
    comes from ops/curate.corpus_diff; removed/changed-old rows join
    back to v1 and added/changed-new rows to v2 (bucketed joins over
    the DELTA ids only) to produce per-lang ±(1, len) adjustments; the
    driver merges ≤|langs| rows. The oracle is the FULL recompute over
    the derived v2, so the maintenance identity itself is what gets
    value-checked."""
    from ..ops.curate import corpus_diff
    cols = ["doc_id", "text", "lang"]
    v1 = _read_pq(_t(sf_dir, "documents"), columns=cols)

    def to_v2(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        t = t.filter(pa.array(ids % 7 != 0))
        ids = t.column("doc_id").to_numpy()
        texts = [x + " v2" if (i % 11 == 0 and x is not None) else x
                 for i, x in zip(ids, t.column("text").to_pylist())]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string()),
                         "lang": t.column("lang")})

    head = _sorted_head(_t(sf_dir, "documents"), "doc_id", cols, 5)
    v2 = v1.map_batches(to_v2, batch_format="pyarrow").union(
        rd.from_arrow(pa.table({
            "doc_id": pc.add(head["doc_id"], pa.scalar(10**12)),
            "text": head["text"], "lang": head["lang"]})))

    def vals(t: pa.Table) -> pa.Table:
        lens = [len(x or "") for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "len": pa.array(lens, pa.int64())})

    def lang_partial(sign: int):
        def f(df: pd.DataFrame) -> pa.Table:
            g = df.groupby("lang", as_index=False).agg(
                dn=("doc_id", "size"), dchars=("len", "sum"))
            g["dn"] *= sign
            g["dchars"] *= sign
            return _arrow(g)
        return f

    # (id, lang, len) value tables materialize ONCE — each is consumed
    # twice (base/adjustment joins) and re-deriving v2 per consumer would
    # re-run the whole map chain
    v1_vals = v1.map_batches(vals, batch_format="pyarrow").materialize()
    v2_vals = v2.map_batches(vals, batch_format="pyarrow").materialize()

    # per-block partials are ≤ |langs| rows each — a driver finish over
    # langs×blocks rows beats a sort exchange (Ray sort ≈ 2 s fixed)
    base = v1_vals.map_batches(lang_partial(+1), batch_format="pandas") \
        .to_pandas().groupby("lang", as_index=False) \
        .agg(dn=("dn", "sum"), dchars=("dchars", "sum"))

    # the delta is small relative to the corpus BY DEFINITION of an
    # incremental update, so its id sets broadcast and the adjustment
    # value pulls are delta-sized filter passes (zero exchange); a delta
    # too big to broadcast would use the bucketed join instead (the
    # repo's standard cutover — ops/joins.bucketed_hash_join)
    ddf = corpus_diff(v1, v2).to_pandas()
    rm_ref = ray.put(set(
        ddf.loc[ddf["change"].isin(["removed", "changed"]), "doc_id"]))
    ad_ref = ray.put(set(
        ddf.loc[ddf["change"].isin(["added", "changed"]), "doc_id"]))

    def pick(ref):
        def f(t: pa.Table) -> pa.Table:
            ks = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            return t.filter(pa.array(
                np.isin(t["doc_id"].to_numpy(), list(ks))))
        return f

    minus = v1_vals.map_batches(pick(rm_ref), batch_format="pyarrow") \
        .map_batches(lang_partial(-1), batch_format="pandas")
    plus = v2_vals.map_batches(pick(ad_ref), batch_format="pyarrow") \
        .map_batches(lang_partial(+1), batch_format="pandas")

    adj_rows = minus.union(plus).to_pandas()  # ≤ 2·|delta| partial rows
    adj = adj_rows.groupby("lang", as_index=False).agg(
        dn=("dn", "sum"), dchars=("dchars", "sum"))

    out = base.set_index("lang").add(adj.set_index("lang"), fill_value=0) \
        .reset_index()
    out = out[out["dn"] > 0]
    out = out.rename(columns={"dn": "n_docs", "dchars": "sum_chars"})
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)



INCREMENTAL_LANG_SQL = """
WITH newv AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, text, lang
  FROM (SELECT doc_id, text, lang FROM documents ORDER BY doc_id LIMIT 5))
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(coalesce(text, ''))) AS BIGINT) AS sum_chars
FROM newv GROUP BY lang ORDER BY lang
"""



CORPUS_DIFF_SQL = """
WITH newv AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, text
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 5))
SELECT d.doc_id, 'removed' AS change FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM newv)
UNION ALL
SELECT n.doc_id, 'added' FROM newv n
WHERE n.doc_id NOT IN (SELECT doc_id FROM documents)
UNION ALL
SELECT d.doc_id, 'changed' FROM documents d JOIN newv n USING (doc_id)
WHERE d.text <> n.text
ORDER BY doc_id, change
"""



def lang_length_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact PER-LANGUAGE length percentiles (PERCENTILE_DISC at
    0.1/0.5/0.9 within each lang) via ops/curate.grouped_exact_quantiles —
    the per-language quality-threshold shape (CCNet's per-lang cuts).
    Pass 1 reduces to (lang, bucket) counts; pass 2 moves only the probed
    (lang, bucket) pairs' values. No sort, no per-row ranks."""
    from ..ops.curate import grouped_exact_quantiles
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])
    df = grouped_exact_quantiles(ds, "lang", "n_chars", [0.1, 0.5, 0.9])
    return df.reset_index(drop=True)



LANG_LENGTH_PERCENTILES_SQL = """
SELECT lang, CAST(0.1 AS DOUBLE) AS q,
       CAST(PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY n_chars)
            AS DOUBLE) AS value
FROM documents GROUP BY lang
UNION ALL
SELECT lang, CAST(0.5 AS DOUBLE),
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE)
FROM documents GROUP BY lang
UNION ALL
SELECT lang, CAST(0.9 AS DOUBLE),
       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE)
FROM documents GROUP BY lang
ORDER BY lang, q
"""



def doc_chunks(sf_dir: str) -> pd.DataFrame:
    """Overlapping-window document chunking (ops/text.chunk_documents,
    window=200 chars, stride=150): the context-window splitting stage of
    an LLM data pipeline. Pure local flat expansion — no exchange; chunk
    offsets are characters, matching SQL substring()."""
    from ..ops.text import chunk_documents
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    df = chunk_documents(ds, window=200, stride=150).to_pandas()
    return df.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)



DOC_CHUNKS_SQL = """
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(0, (length(text) - 1) // 150)) AS gs
  FROM documents WHERE length(coalesce(text, '')) > 0)
SELECT doc_id, CAST(gs AS BIGINT) AS chunk_id,
       substring(text, CAST(gs * 150 + 1 AS BIGINT), 200) AS chunk
FROM g ORDER BY doc_id, chunk_id
"""



_PII_INJECT = (" Contact jane.doe@example.com or +1 555-123-4567"
               " from 10.0.0.1.")



def normalize_docs(sf_dir: str) -> pd.DataFrame:
    """Canonical text normalization (ops/text.normalize_text): NFC +
    whitespace-run collapse + strip over every doc. Every 9th doc gets
    deterministic messy whitespace planted first (mirrored in SQL) so
    the normalizer has real work; the value-hash pins the exact
    normalized strings."""
    from ..ops.text import normalize_text
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def messy(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        mask = (df["doc_id"] % 9 == 0)
        df = df.copy()
        df["text"] = t.where(~mask, "  " + t + " \t extra\n\nspace  ")
        return df

    out = normalize_text(ds.map_batches(messy, batch_format="pandas")) \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



NORMALIZE_DOCS_SQL = r"""
WITH v AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0
              THEN '  ' || coalesce(text, '') || ' ' || chr(9)
                   || ' extra' || chr(10) || chr(10) || 'space  '
              ELSE coalesce(text, '') END AS t
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(nfc_normalize(t), '[ \t\n\r]+', ' ', 'g'))
         AS norm_text,
       (trim(regexp_replace(nfc_normalize(t), '[ \t\n\r]+', ' ', 'g'))
        <> t) AS changed
FROM v ORDER BY doc_id
"""



def pii_redact_docs(sf_dir: str) -> pd.DataFrame:
    """PII scrub (ops/text.redact_pii): emails / phones / IPv4 literals →
    placeholder tokens with per-category replacement counts. The corpus
    is PII-free word soup, so every 10th doc gets a deterministic planted
    contact line first (mirrored in the oracle) — the scrubber has real
    work and the hash check is meaningful. Patterns are RE2-compatible
    and shared verbatim with the SQL (built from ops/text.PII_PATTERNS),
    and counts are taken on the progressively-scrubbed text exactly like
    the oracle's nested regexp_replace."""
    from ..ops.text import redact_pii
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        mask = (df["doc_id"] % 10 == 0)
        df = df.copy()
        df["text"] = t.where(~mask, t + _PII_INJECT)
        return df

    out = redact_pii(ds.map_batches(inject, batch_format="pandas")) \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



def _pii_sql() -> str:
    from ..ops.text import PII_PATTERNS
    (em, em_r), (ph, ph_r), (ip, ip_r) = PII_PATTERNS
    return f"""
WITH v AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN coalesce(text, '') || ' {_PII_INJECT.strip()}'
              ELSE coalesce(text, '') END AS t0
  FROM documents),
s1 AS (SELECT doc_id, t0,
              regexp_replace(t0, '{em}', '{em_r}', 'g') AS t1 FROM v),
s2 AS (SELECT doc_id, t0, t1,
              regexp_replace(t1, '{ph}', '{ph_r}', 'g') AS t2 FROM s1)
SELECT doc_id,
       regexp_replace(t2, '{ip}', '{ip_r}', 'g') AS clean_text,
       CAST(len(regexp_extract_all(t0, '{em}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t1, '{ph}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t2, '{ip}')) AS BIGINT) AS n_ip
FROM s2 ORDER BY doc_id
"""



def lm_quality_docs(sf_dir: str) -> pd.DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al., 2020) with a
    char-bigram model (the sandbox-honest KenLM stand-in, ops/text):
    one counting pass trains the charset-bounded model, the broadcast
    scoring pass emits per-doc mean Laplace log-likelihood. Float note:
    per-doc LN terms are exact both sides (integer counts), only the
    summation order differs — ~1e-12 drift vs the 6dp rounding, same
    envelope as event_outliers."""
    from ..ops.text import score_char_bigram_lm, train_char_bigram_lm
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    model = train_char_bigram_lm(ds)
    df = score_char_bigram_lm(ds, model).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



LM_QUALITY_SQL = """
WITH ex AS (
  SELECT doc_id, substring(text, CAST(i AS BIGINT), 2) AS b
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 1)) AS i
        FROM documents WHERE length(coalesce(text, '')) >= 2)),
bgc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cb FROM ex GROUP BY b),
uc AS (SELECT substring(b, 1, 1) AS u, CAST(SUM(cb) AS BIGINT) AS cu
       FROM bgc GROUP BY 1),
v AS (SELECT COUNT(*) AS nv FROM uc)
SELECT e.doc_id,
       ROUND(SUM(LN((bgc.cb + 1.0) / (uc.cu + v.nv))) / COUNT(*), 6)
         AS logprob
FROM ex e
JOIN bgc USING (b)
JOIN uc ON uc.u = substring(e.b, 1, 1)
CROSS JOIN v
GROUP BY e.doc_id ORDER BY e.doc_id
"""


def naive_bayes_lang(sf_dir: str) -> pd.DataFrame:
    """Multinomial Naive Bayes over word-token counts (add-one smoothing),
    trained distributed on documents with label = lang, then every doc
    classified against the broadcast model (ops/infer.naive_bayes_*).
    Output (doc_id, pred_label, score): 6dp-rounded log posterior, argmax
    ties to the lexicographically smallest label — the round-before-argmax
    discipline shared with linear_classify / bm25_topk."""
    from ..ops.infer import naive_bayes_classify, naive_bayes_train
    docs = _read_pq(_t(sf_dir, "documents"),
                    columns=["doc_id", "text", "lang"])
    model = naive_bayes_train(docs, text_col="text", label_col="lang")
    out = naive_bayes_classify(docs, model).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



NAIVE_BAYES_SQL = """
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents),
doc_tok AS (SELECT doc_id, tok, COUNT(*) AS m FROM toks
            GROUP BY doc_id, tok),
model AS (SELECT lang AS cls, tok, COUNT(*) AS cnt FROM toks
          GROUP BY lang, tok),
tot AS (SELECT cls, SUM(cnt) AS t FROM model GROUP BY cls),
nv AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
prior AS (SELECT lang AS cls, COUNT(*) AS nd
          FROM (SELECT doc_id, lang FROM toks GROUP BY doc_id, lang)
          GROUP BY lang),
ntot AS (SELECT SUM(nd) AS n FROM prior),
scores AS (
  SELECT d.doc_id, c.cls,
         LN(CAST(p.nd AS DOUBLE) / ntot.n)
           + SUM(d.m * LN((COALESCE(mo.cnt, 0) + 1.0) / (tt.t + nv.v)))
           AS s
  FROM doc_tok d
  CROSS JOIN (SELECT DISTINCT cls FROM model) c
  LEFT JOIN model mo ON mo.cls = c.cls AND mo.tok = d.tok
  JOIN tot tt ON tt.cls = c.cls
  JOIN prior p ON p.cls = c.cls
  CROSS JOIN nv CROSS JOIN ntot
  GROUP BY d.doc_id, c.cls, p.nd, ntot.n),
ranked AS (
  SELECT doc_id, cls, ROUND(s, 6) AS s6,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY ROUND(s, 6) DESC, cls ASC) AS rn
  FROM scores)
SELECT CAST(doc_id AS BIGINT) AS doc_id, cls AS pred_label, s6 AS score
FROM ranked WHERE rn = 1 ORDER BY doc_id
"""





def auc_stopword_en(sf_dir: str) -> pd.DataFrame:
    """ROC AUC of the English-stopword-ratio quality signal as a
    detector of ``lang == 'en'`` — the standard one-number eval for a
    corpus-filter signal (rank-sum / Mann-Whitney identity with
    average-rank ties; ops/infer.ranksum_auc).

    Shape: one streaming pass scores the docs (the SAME rounded-6dp
    ratio as stopword_stats_docs, so the driver-side distinct-score
    table is bounded by the VALUE SPACE ≤ 1e6+1, not the corpus size)
    + a binary label; per-block (score → n_pos, n) partials, one
    score-keyed groupby, bounded driver finish. All driver terms are
    integers/halves ⇒ bit-identical to the SQL window oracle."""
    from ..ops.infer import ranksum_auc
    from ..ops.text import stopword_stats

    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "text", "lang"])
    scored = stopword_stats(ds, keep_cols=("lang",))

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "score": df["stopword_ratio"].to_numpy(),
            "pos": (df["lang"] == "en").astype("int64").to_numpy()})

    return ranksum_auc(scored.map_batches(lab, batch_format="pandas"))


AUC_STOPWORD_SQL = rf"""
WITH base AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(coalesce(text, '')), '\w+') AS toks
  FROM documents),
scored AS (
  SELECT ROUND(len(list_filter(toks, t -> t IN ({_STOP_EN_SQL}))) * 1.0
               / greatest(len(toks), 1), 6) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM base),
g AS (SELECT s, SUM(pos) AS np_, COUNT(*) AS c FROM scored GROUP BY s),
o AS (SELECT s, np_, c,
             COALESCE(SUM(c) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
      FROM g),
sums AS (SELECT SUM(np_ * (below + (c + 1) / 2.0)) AS rpos,
                SUM(np_) AS npos, SUM(c) AS n
         FROM o)
SELECT CAST(npos AS BIGINT) AS n_pos,
       CAST(n - npos AS BIGINT) AS n_neg,
       ROUND((rpos - npos * (npos + 1) / 2.0)
             / (npos * (n - npos)), 6) AS auc
FROM sums
"""




_CALIB_BINS = 20


def calibration_stopword_en(sf_dir: str) -> pd.DataFrame:
    """Reliability curve for the stopword-ratio 'is English' detector:
    fixed-width score bins (bin = FLOOR(score·20), clamped so score 1.0
    joins the top bin), per-bin doc count and empirical P(lang='en') —
    the standard calibration companion to auc_stopword_en (a signal can
    rank well but still be miscalibrated; the pair pins both).

    Shape: the same one-pass scoring, then per-block (bin → n_pos, n)
    partials and ONE 20-row groupby — no driver state beyond the bins.
    The rate divides two exact integers and rounds at 6dp ⇒
    bit-identical to SQL."""
    from ray.data.aggregate import Sum as _Sum

    from ..ops.text import stopword_stats

    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "text", "lang"])
    scored = stopword_stats(ds, keep_cols=("lang",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.minimum((df["stopword_ratio"].to_numpy()
                        * _CALIB_BINS).astype("int64"), _CALIB_BINS - 1)
        pos = (df["lang"] == "en").astype("int64").to_numpy()
        g = pd.DataFrame({"bin": b, "n_pos": pos, "n": 1}) \
            .groupby("bin", as_index=False).sum()
        return g

    out = scored.map_batches(partial, batch_format="pandas") \
        .groupby("bin").aggregate(_Sum("n_pos", alias_name="n_pos"),
                                  _Sum("n", alias_name="n")) \
        .to_pandas().sort_values("bin").reset_index(drop=True)
    out["n_pos"] = out["n_pos"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["p_en"] = (out["n_pos"] / out["n"]).round(6)
    return out[["bin", "n", "n_pos", "p_en"]]


CALIBRATION_STOPWORD_SQL = rf"""
WITH base AS (
  SELECT lang,
         regexp_extract_all(lower(coalesce(text, '')), '\w+') AS toks
  FROM documents),
scored AS (
  SELECT LEAST(CAST(FLOOR(
           ROUND(len(list_filter(toks, t -> t IN ({_STOP_EN_SQL}))) * 1.0
                 / greatest(len(toks), 1), 6) * {_CALIB_BINS}) AS BIGINT),
           {_CALIB_BINS - 1}) AS bin,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM base)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       ROUND(SUM(pos) * 1.0 / COUNT(*), 6) AS p_en
FROM scored GROUP BY bin ORDER BY bin
"""




def auc_stopword_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source ROC AUC of the stopword-ratio 'is English' detector —
    the per-domain eval slice (a signal can rank well corpus-wide but
    fail inside one source; this pins each slice). Same bounded
    distinct-score exchange as auc_stopword_en, partitioned by source
    (ops/infer.grouped_ranksum_auc); degenerate slices (single-class)
    are dropped on both sides."""
    from ..ops.infer import grouped_ranksum_auc
    from ..ops.text import stopword_stats

    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "text", "lang", "source"])
    scored = stopword_stats(ds, keep_cols=("lang", "source"))

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": df["source"].to_numpy(),
            "score": df["stopword_ratio"].to_numpy(),
            "pos": (df["lang"] == "en").astype("int64").to_numpy()})

    out = grouped_ranksum_auc(
        scored.map_batches(lab, batch_format="pandas"),
        group_col="source")
    return out.sort_values("source").reset_index(drop=True)


AUC_BY_SOURCE_SQL = rf"""
WITH base AS (
  SELECT source, lang,
         regexp_extract_all(lower(coalesce(text, '')), '\w+') AS toks
  FROM documents),
scored AS (
  SELECT source,
         ROUND(len(list_filter(toks, t -> t IN ({_STOP_EN_SQL}))) * 1.0
               / greatest(len(toks), 1), 6) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM base),
g AS (SELECT source, s, SUM(pos) AS np_, COUNT(*) AS c
      FROM scored GROUP BY source, s),
o AS (SELECT source, s, np_, c,
             COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
      FROM g),
sums AS (SELECT source, SUM(np_ * (below + (c + 1) / 2.0)) AS rpos,
                SUM(np_) AS npos, SUM(c) AS n
         FROM o GROUP BY source
         HAVING SUM(np_) > 0 AND SUM(np_) < SUM(c))
SELECT source, CAST(npos AS BIGINT) AS n_pos,
       CAST(n - npos AS BIGINT) AS n_neg,
       ROUND((rpos - npos * (npos + 1) / 2.0)
             / (npos * (n - npos)), 6) AS auc
FROM sums ORDER BY source
"""


__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
