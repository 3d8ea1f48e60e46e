from ._common import *  # noqa: F401,F403
from .tpch import *  # noqa: F401,F403
from .relational import *  # noqa: F401,F403
from .events import *  # noqa: F401,F403
from .text import *  # noqa: F401,F403
from .dedup import *  # noqa: F401,F403
from .ann import *  # noqa: F401,F403
from .extraction import *  # noqa: F401,F403
from .media import *  # noqa: F401,F403



# ---------------------------------------------------------------------------
# Corpus curation (ops/curate.py): deterministic sampling / splits, quotas,
# vocabulary, decontamination, token-budget packing. Every op here is
# content-addressed (md5 ≡ DuckDB md5_number_lower) or window-expressible,
# so ALL queries in this family carry full value-hash oracles.
# ---------------------------------------------------------------------------

def sample_docs_hash(sf_dir: str) -> pd.DataFrame:
    """Deterministic 5% corpus sample: keep docs whose md5 key hash lands
    in the first 50/1000 of the hash space — reproducible across runs,
    repartitions and resumes (no RNG), and embarrassingly parallel."""
    from ..ops.curate import hash_sample
    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "lang", "n_chars"])
    out = hash_sample(ds, permille=50, salt="s1").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



SAMPLE_DOCS_HASH_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE md5_number_lower('s1:' || CAST(doc_id AS VARCHAR)) % 1000 < 50
ORDER BY doc_id
"""



def split_assign_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test assignment (900/50/50 permille) —
    a pure function of (key, salt), so later data never moves an
    existing row between splits."""
    from ..ops.curate import hash_split
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
    out = hash_split(ds, salt="split").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



SPLIT_ASSIGN_SQL = """
SELECT doc_id,
       CASE WHEN md5_number_lower('split:' || CAST(doc_id AS VARCHAR))
                 % 1000 < 900 THEN 'train'
            WHEN md5_number_lower('split:' || CAST(doc_id AS VARCHAR))
                 % 1000 < 950 THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""



def quota_cap_docs(sf_dir: str) -> pd.DataFrame:
    """Data-mixing quota: the 20 longest documents per language
    ((n_chars desc, doc_id asc) total order) via the bucketed per-group
    exchange — the ROW_NUMBER window at corpus scale."""
    from ..ops.curate import quota_cap
    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "lang", "n_chars"])
    out = quota_cap(ds, group_col="lang", score_col="n_chars",
                    n=20).to_pandas()
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True) \
              [["doc_id", "lang", "n_chars"]]



QUOTA_CAP_SQL = """
SELECT doc_id, lang, n_chars
FROM (SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
WHERE rn <= 20
ORDER BY lang, doc_id
"""



def stratified_sample_docs(sf_dir: str) -> pd.DataFrame:
    """25 documents per language, chosen by md5-hash rank inside the
    group — a reproducible 'random' stratified sample the oracle can
    recompute exactly."""
    from ..ops.curate import stratified_sample
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang"])
    out = stratified_sample(ds, group_col="lang", n=25,
                            salt="strat").to_pandas()
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)



STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang
FROM (SELECT doc_id, lang,
             ROW_NUMBER() OVER (
                 PARTITION BY lang
                 ORDER BY md5_number_lower(
                     'strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
WHERE rn <= 25
ORDER BY lang, doc_id
"""



def vocab_top_terms(sf_dir: str) -> pd.DataFrame:
    """Top-50 vocabulary by global term frequency with document
    frequency and idf = ln(N/df). Counts pre-reduce inside every batch
    (terms × blocks rows enter the exchange, never per-occurrence rows)
    and the top-k finish is per-block local heads + a bounded driver
    merge. N comes from the parquet footer, no extra pass."""
    from ..ops.curate import top_terms
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = top_terms(ds, k=50, n_docs=_n_rows(sf_dir, "documents"))
    out["tf"] = out["tf"].astype(np.int64)
    out["df"] = out["df"].astype(np.int64)
    return out.reset_index(drop=True)



VOCAB_TOP_TERMS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
stats AS (
  SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
  FROM toks GROUP BY term)
SELECT term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       ROUND(LN((SELECT COUNT(*) FROM documents) * 1.0 / df), 6) AS idf
FROM stats
ORDER BY tf DESC, term
LIMIT 50
"""



def posting_lists_docs(sf_dir: str) -> pd.DataFrame:
    """Inverted-index slice: the 5 most frequent terms → their first 50
    containing doc ids (id order, comma-joined). Term selection reuses
    the vocabulary pass; the posting build ships only (term, doc) pairs
    for the broadcast 5-term set, with per-block heads bounding what
    reaches the driver."""
    from ..ops.curate import posting_lists, top_terms
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    terms = top_terms(ds, k=5,
                      n_docs=_n_rows(sf_dir, "documents"))["term"]
    out = posting_lists(ds, list(terms), cap=50)
    out["term"] = out["term"].astype(str)
    return out.sort_values("term").reset_index(drop=True)



POSTING_LISTS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
top5 AS (
  SELECT term FROM toks GROUP BY term
  ORDER BY COUNT(*) DESC, term LIMIT 5),
posting AS (
  SELECT t.term, t.doc_id
  FROM toks t JOIN top5 USING (term)
  GROUP BY t.term, t.doc_id)
SELECT term,
       array_to_string(list_sort(list(doc_id))[1:50], ',') AS docs
FROM posting
GROUP BY term
ORDER BY term
"""



def decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: ~2.7% of docs (hash-selected — the
    stand-in 'benchmark') contribute their first 8-token word gram;
    every document is then flagged iff its token stream contains ANY
    benchmark gram as a consecutive run. The gram set is distilled
    distributed (a filtered, truncated map — only grams reach the
    driver), broadcast once via ray.put, and matched exactly (token
    windows, no hashing), so the SQL substring formulation with
    boundary guards is equivalent."""
    from ..ops.curate import decontaminate, hash_sample, _WORD_RE
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def first_gram(batch: pd.DataFrame) -> pd.DataFrame:
        grams = []
        for t in batch["text"].fillna(""):
            w = _WORD_RE.findall(t.lower())
            if len(w) >= 8:
                grams.append(" ".join(w[:8]))
        return pd.DataFrame({"gram": pd.Series(grams, dtype="string")})

    bench = hash_sample(ds, permille=27, salt="bench") \
        .map_batches(first_gram, batch_format="pandas").to_pandas()
    out = decontaminate(ds, list(bench["gram"]), n=8).to_pandas()
    out["contaminated"] = out["contaminated"].astype(np.int64)
    return out[["doc_id", "contaminated"]].sort_values("doc_id") \
                                          .reset_index(drop=True)



DECONTAMINATE_SQL = """
WITH b AS (
  SELECT array_to_string(
           regexp_extract_all(lower(text), '[a-z0-9_]+')[1:8], ' ') AS gram
  FROM documents
  WHERE md5_number_lower('bench:' || CAST(doc_id AS VARCHAR)) % 1000 < 27
    AND len(regexp_extract_all(lower(text), '[a-z0-9_]+')) >= 8),
t AS (
  SELECT doc_id,
         ' ' || array_to_string(
             regexp_extract_all(lower(text), '[a-z0-9_]+'), ' ') || ' '
         AS ts
  FROM documents)
SELECT doc_id,
       CAST(EXISTS(SELECT 1 FROM b
                   WHERE contains(t.ts, ' ' || b.gram || ' '))
            AS BIGINT) AS contaminated
FROM t
ORDER BY doc_id
"""



def mixture_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Data-mixing: language-dependent keep rates (en 300‰ / de 100‰ /
    fr 50‰, everything else 0) composed with the content-addressed key
    hash — the deterministic sampler a weighted corpus mixture needs."""
    from ..ops.curate import mixture_sample
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang"])
    out = mixture_sample(ds, {"en": 300, "de": 100, "fr": 50},
                         group_col="lang", salt="mix").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



MIXTURE_SAMPLE_SQL = """
SELECT doc_id, lang
FROM documents
WHERE md5_number_lower('mix:' || CAST(doc_id AS VARCHAR)) % 1000 <
      CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 100
                WHEN 'fr' THEN 50 ELSE 0 END
ORDER BY doc_id
"""



def leakage_safe_split_docs(sf_dir: str) -> pd.DataFrame:
    """Leakage-safe train/val/test assignment: exact-duplicate documents
    share a cluster (min doc_id over identical text — only (md5, id)
    pairs shuffle) and the split keys on the CLUSTER, so duplicated text
    can never straddle the train/eval boundary."""
    from ..ops.curate import cluster_consistent_split
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = cluster_consistent_split(ds, salt="lsplit").to_pandas()
    return out[["doc_id", "cluster", "split"]].sort_values("doc_id") \
                                              .reset_index(drop=True)



LEAKAGE_SAFE_SPLIT_SQL = """
WITH c AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY text) AS cluster
  FROM documents)
SELECT doc_id, cluster,
       CASE WHEN md5_number_lower('lsplit:' || CAST(cluster AS VARCHAR))
                 % 1000 < 900 THEN 'train'
            WHEN md5_number_lower('lsplit:' || CAST(cluster AS VARCHAR))
                 % 1000 < 950 THEN 'val'
            ELSE 'test' END AS split
FROM c
ORDER BY doc_id
"""



def priority_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Weighted corpus sampling (Duffield–Lund–Thorup priority
    sampling) of 100 docs by n_chars weight, with the unbiased
    Horvitz-Thompson weight est_w = max(w, τ). All emitted doubles are
    BIT-IDENTICAL to the SQL oracle — every step is one correctly-
    rounded IEEE op on both sides (see ops/curate.py:priority_sample),
    the same unrounded-doubles parity class as ngram_jaccard_planted."""
    from ..ops.curate import priority_sample
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    return priority_sample(ds, 100, weight_col="n_chars",
                           key_col="doc_id", salt="ps1")



PRIORITY_SAMPLE_SQL = """
WITH p AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
         CAST(n_chars AS DOUBLE) /
           ((CAST(md5_number_lower('ps1:' || CAST(doc_id AS VARCHAR))
                  AS DOUBLE) + 1.0) * 5.421010862427522e-20) AS priority
  FROM documents),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rn
      FROM p)
SELECT doc_id, w, priority,
       CASE WHEN w >= t.tau THEN w ELSE t.tau END AS est_w
FROM r, (SELECT COALESCE(MAX(priority), 0.0) AS tau FROM r
         WHERE rn = 101) t
WHERE rn <= 100 ORDER BY doc_id
"""



def split_export_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Partitioned training-data export: hash_split → hive-partitioned
    parquet (one directory per split — the resumable layout: a re-run
    re-writes per partition, and a trainer reads ONLY its split) →
    pruned read-back of the 'val' directory alone. The oracle recomputes
    the val membership from the split function — so the sink→source
    round trip itself is what's being value-checked."""
    import tempfile

    from ..ops.curate import hash_split
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    out_dir = tempfile.mkdtemp(prefix="wtes_split_export_")
    hash_split(ds, salt="exp").write_parquet(
        out_dir, partition_cols=["split"])
    back = rd.read_parquet(os.path.join(out_dir, "split=val"))
    df = back.to_pandas()[["doc_id", "n_chars"]]
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    return df.sort_values("doc_id").reset_index(drop=True)



SPLIT_EXPORT_SQL = """
SELECT doc_id, n_chars
FROM documents
WHERE md5_number_lower('exp:' || CAST(doc_id AS VARCHAR)) % 1000
      BETWEEN 900 AND 949
ORDER BY doc_id
"""



def range_export_pruned(sf_dir: str) -> pd.DataFrame:
    """Time-range-clustered export + layout-level pruning (the lakehouse
    zone-map story): lineitem exports hive-partitioned by SHIP YEAR
    (one directory per year — the layout a 100 TB fact table actually
    uses), then a 1996–1997 revenue query reads ONLY those two year
    directories; files outside the probed range never open. Because the
    predicate aligns with the partition key there is no residual filter
    — the oracle's WHERE clause is implemented ENTIRELY by directory
    selection, which is what gets value-checked."""
    import shutil
    import tempfile

    def tag_year(t: pa.Table) -> pa.Table:
        return t.append_column(
            "y", pc.cast(pc.year(t["l_shipdate"]), pa.int64()))

    ds = _read_pq(_t(sf_dir, "lineitem"),
                  columns=["l_shipdate", "l_extendedprice", "l_discount"])
    out_dir = tempfile.mkdtemp(prefix="wtes_range_export_")
    ds.map_batches(tag_year, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["y"])

    # Ray read_parquet treats LIST elements as files — expand each probed
    # partition dir to its files (the ivf_search_index pattern)
    probe = [os.path.join(out_dir, d, f)
             for d in sorted(os.listdir(out_dir))
             if d in ("y=1996", "y=1997")
             for f in sorted(os.listdir(os.path.join(out_dir, d)))]
    back = rd.read_parquet(probe)

    def rev_partial(t: pa.Table) -> pa.Table:
        v = (t["l_extendedprice"].to_numpy()
             * (1.0 - t["l_discount"].to_numpy()))
        return pa.table({"revenue": pa.array([float(v.sum())],
                                             pa.float64())})

    tot = back.map_batches(rev_partial, batch_format="pyarrow") \
        .aggregate(Sum("revenue", alias_name="revenue"))["revenue"]
    shutil.rmtree(out_dir, ignore_errors=True)
    return pd.DataFrame({"revenue": [round(tot, 2)]})



RANGE_EXPORT_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
"""



def quality_deciles_docs(sf_dir: str) -> pd.DataFrame:
    """Curriculum binning: every document's global length decile via the
    distributed ROW_NUMBER (range-bucketed prefix scan, no global sort);
    decile = (rank-1)*10 // N with N from the parquet footer."""
    from ..ops.curate import global_rank
    n = _n_rows(sf_dir, "documents")
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    out = global_rank(ds, order_cols=["n_chars", "doc_id"]).to_pandas()
    out["decile"] = ((out["rank"] - 1) * 10 // n).astype(np.int64)
    return out[["doc_id", "n_chars", "decile"]].sort_values("doc_id") \
                                               .reset_index(drop=True)



QUALITY_DECILES_SQL = """
SELECT doc_id, n_chars,
       CAST((ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1) * 10
            // (SELECT COUNT(*) FROM documents) AS BIGINT) AS decile
FROM documents
ORDER BY doc_id
"""



def length_percentiles_docs(sf_dir: str) -> pd.DataFrame:
    """EXACT distributed percentiles (p25/p50/p75/p95 of n_chars) via the
    count prefix scan: rank every row without a global sort, keep the
    rows at ranks ceil(q·N) — PERCENTILE_DISC semantics, integer-exact
    on both sides. N comes from the parquet footer."""
    import math

    from ..ops.curate import global_rank
    n = _n_rows(sf_dir, "documents")
    qs = [0.25, 0.50, 0.75, 0.95]
    want = {math.ceil(q * n): q for q in qs}
    ranked = global_rank(_read_pq(_t(sf_dir, "documents"),
                                  columns=["doc_id", "n_chars"]),
                         order_cols=["n_chars", "doc_id"])
    targets = pa.array(sorted(want))
    hits = ranked.map_batches(
        lambda t: t.filter(pc.is_in(t["rank"], value_set=targets)),
        batch_format="pyarrow").to_pandas()
    out = pd.DataFrame({
        "q": [want[r] for r in hits["rank"]],
        "n_chars": hits["n_chars"].astype(np.int64)})
    return out.sort_values("q").reset_index(drop=True)



LENGTH_PERCENTILES_SQL = """
SELECT 0.25 AS q, CAST(PERCENTILE_DISC(0.25) WITHIN GROUP
                       (ORDER BY n_chars) AS BIGINT) AS n_chars
FROM documents
UNION ALL
SELECT 0.50, CAST(PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY n_chars)
                  AS BIGINT) FROM documents
UNION ALL
SELECT 0.75, CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY n_chars)
                  AS BIGINT) FROM documents
UNION ALL
SELECT 0.95, CAST(PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY n_chars)
                  AS BIGINT) FROM documents
ORDER BY q
"""



def pack_docs_budget(sf_dir: str) -> pd.DataFrame:
    """Token-budget shard packing: bin = floor(chars-before-this-doc /
    100k) in doc_id order — the cumulative-SUM window, computed as a
    distributed prefix scan (range-bucketed, per-bucket offsets from an
    O(buckets) driver step; no global sort). The key range comes from
    the parquet footer's column statistics — zero data read."""
    from ..ops.curate import pack_by_budget
    md = pq.ParquetFile(_t(sf_dir, "documents")).metadata
    idx = md.schema.to_arrow_schema().get_field_index("doc_id")
    los, his = zip(*((rg.column(idx).statistics.min,
                      rg.column(idx).statistics.max)
                     for rg in (md.row_group(i)
                                for i in range(md.num_row_groups))))
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    out = pack_by_budget(ds, budget=100_000, weight_col="n_chars",
                         key_range=(min(los), max(his))).to_pandas()
    out["bin"] = out["bin"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True) \
              [["doc_id", "n_chars", "bin"]]



PACK_DOCS_SQL = """
SELECT doc_id, n_chars,
       CAST((SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - n_chars) // 100000
            AS BIGINT) AS bin
FROM documents
ORDER BY doc_id
"""



def uniform_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Exactly-64 uniform sample without replacement: rank all docs by
    md5(salt:doc_id) and keep the prefix (ops/curate.uniform_sample_k —
    per-block heads + a ≤ k·blocks driver finish; no global sort). The
    top-k-by-hash prefix is extensible: a later k=128 request is a
    superset of this one."""
    from ..ops.curate import uniform_sample_k
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    t = uniform_sample_k(ds, 64, key_col="doc_id", salt="usample")
    df = t.rename_columns(
        ["doc_id", "n_chars", "sample_key"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



UNIFORM_SAMPLE_SQL = """
SELECT doc_id, n_chars,
       md5_number_lower('usample:' || CAST(doc_id AS VARCHAR)) AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT 64
"""



def phrase_search_docs(sf_dir: str) -> pd.DataFrame:
    """Exact 3-token phrase occurrences per document via positional
    postings (ops/curate.phrase_search): phrase-term-only (doc, base, bit)
    postings + one bitmask groupby — no text on the exchange. Oracle:
    positional self-joins over the same RE2 tokenization."""
    from ..ops.curate import phrase_search
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = phrase_search(ds, ["value", "table", "part"]).to_pandas()
    out["n_occ"] = out["n_occ"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)



PHRASE_SEARCH_SQL = """
WITH arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM arr)
SELECT t0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
FROM toks t0
JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
            AND t1.tok = 'table'
JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
            AND t2.tok = 'part'
WHERE t0.tok = 'value'
GROUP BY t0.doc_id ORDER BY t0.doc_id
"""



def _quality_signals_joined(sf_dir: str) -> rd.Dataset:
    """The fused three-signal table (quality, stopword_ratio,
    distinct_ratio, top_bigram_frac per doc) behind quality_filter_docs
    and quality_funnel_docs: three exchange-free signal stages over the
    same pruned read, fused via two doc-keyed bucketed hash joins (the
    scale-honest attach — signal tables are corpus-sized)."""
    from ..ops.joins import bucketed_hash_join
    from ..ops.runtime import stateless
    from ..ops.text import TextScorer, repetition_stats, stopword_stats

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    q = ds.map_batches(stateless(TextScorer), batch_format="pandas") \
        .map_batches(lambda t: t.select(["doc_id", "quality"]),
                     batch_format="pyarrow")
    s = stopword_stats(ds).map_batches(
        lambda t: t.select(["doc_id", "stopword_ratio"]),
        batch_format="pyarrow")
    r = repetition_stats(ds).map_batches(
        lambda t: t.select(["doc_id", "distinct_ratio", "top_bigram_frac"]),
        batch_format="pyarrow")
    return bucketed_hash_join(bucketed_hash_join(q, s, on="doc_id"),
                              r, on="doc_id")



def quality_filter_docs(sf_dir: str) -> pd.DataFrame:
    """The fused corpus quality filter a training pipeline actually runs:
    heuristic quality score + stopword density + within-doc repetition,
    thresholded into one keep decision (signals joined by
    ``_quality_signals_joined``). Thresholds compare the 6dp-ROUNDED
    signals on both sides, so the boundary semantics are bit-identical
    to the oracle."""
    joined = _quality_signals_joined(sf_dir)

    def decide(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(t.column("quality"), 0.6),
                    pc.greater_equal(t.column("stopword_ratio"), 0.04)),
            pc.and_(pc.greater_equal(t.column("distinct_ratio"), 0.35),
                    pc.less_equal(t.column("top_bigram_frac"), 0.1)))
        return t.append_column("keep", keep)

    df = joined.map_batches(decide, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



QUALITY_FILTER_SQL = f"""
WITH q AS ({QUALITY_SCORES_SQL}),
s AS ({STOPWORD_STATS_SQL}),
r AS ({DOC_REPETITION_SQL})
SELECT q.doc_id, q.quality, s.stopword_ratio, r.distinct_ratio,
       r.top_bigram_frac,
       (q.quality >= 0.6 AND s.stopword_ratio >= 0.04
        AND r.distinct_ratio >= 0.35 AND r.top_bigram_frac <= 0.1) AS keep
FROM q JOIN s USING (doc_id) JOIN r USING (doc_id)
ORDER BY q.doc_id
"""



def curation_pipeline_docs(sf_dir: str) -> pd.DataFrame:
    """The composed end-to-end curation run a training-data team ships:
    exact dedup (hash-only exchange, ops/dedup.exact_dedup_ids) →
    fused 3-signal quality filter (_quality_signals_joined thresholds) →
    benchmark decontamination (broadcast gram set, mode='drop') →
    deterministic train/val/test split → per-split (n_docs, sum_chars).
    Every stage is individually oracle-checked elsewhere; HERE the whole
    chain is one value-checked result, so stage composition order and
    the survivor handoffs (two bucketed SEMI joins on doc_id) are what
    the oracle pins. Signals compute over the full corpus on both sides
    (they are pure per-doc functions, so filtering first would not
    change any surviving doc's value)."""
    from ..ops.curate import decontaminate, hash_sample, hash_split, \
        _WORD_RE
    from ..ops.dedup import exact_dedup_ids
    from ..ops.joins import bucketed_hash_join

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    # arrow-normalize: the aggregate behind exact_dedup_ids emits pandas
    # blocks, and union requires both sides in one block format
    dd_ids = exact_dedup_ids(ds).map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow")

    keep_q = _quality_signals_joined(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t.filter(pc.and_(
            pc.and_(pc.greater_equal(t["quality"], 0.6),
                    pc.greater_equal(t["stopword_ratio"], 0.04)),
            pc.and_(pc.greater_equal(t["distinct_ratio"], 0.35),
                    pc.less_equal(t["top_bigram_frac"], 0.1))))
            ["doc_id"]}),
        batch_format="pyarrow")

    # intersect the two survivor-id sets FIRST (ids-only exchange:
    # union + per-id count == 2), so the texts ride through exactly ONE
    # semi-join exchange instead of two
    from ray.data.aggregate import Count as _Count
    keep_ids = dd_ids.union(keep_q).groupby("doc_id") \
        .aggregate(_Count(alias_name="c")) \
        .map_batches(lambda t: pa.table(
            {"doc_id": t.filter(pc.equal(t["c"], 2))["doc_id"]}),
            batch_format="pyarrow")

    sch_dt = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    sch_id = pa.schema([("doc_id", pa.int64())])
    survivors = bucketed_hash_join(
        ds, keep_ids, "doc_id", how="semi",
        left_schema=sch_dt, right_schema=sch_id)

    # benchmark grams come from the FULL corpus (the benchmark exists
    # independently of what the cascade keeps) — same recipe as
    # decontaminate_docs
    def first_gram(batch: pd.DataFrame) -> pd.DataFrame:
        grams = []
        for t in batch["text"].fillna(""):
            w = _WORD_RE.findall(t.lower())
            if len(w) >= 8:
                grams.append(" ".join(w[:8]))
        return pd.DataFrame({"gram": pd.Series(grams, dtype="string")})

    bench = hash_sample(ds, permille=27, salt="bench") \
        .map_batches(first_gram, batch_format="pandas").to_pandas()
    clean = decontaminate(survivors, list(bench["gram"]), n=8,
                          mode="drop")

    def split_partial(t: pa.Table) -> pa.Table:
        lens = [len(x or "") for x in t.column("text").to_pylist()]
        df = pd.DataFrame({"split": t["split"].to_pandas(),
                           "len": lens})
        return _arrow(df.groupby("split", as_index=False).agg(
            n_docs=("len", "size"), sum_chars=("len", "sum")))

    out = hash_split(clean, salt="cur") \
        .map_batches(split_partial, batch_format="pyarrow") \
        .to_pandas().groupby("split", as_index=False) \
        .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    return out.sort_values("split").reset_index(drop=True)



CURATION_PIPELINE_SQL = f"""
WITH q AS ({QUALITY_SCORES_SQL}),
s AS ({STOPWORD_STATS_SQL}),
r AS ({DOC_REPETITION_SQL}),
keepq AS (
  SELECT q.doc_id FROM q JOIN s USING (doc_id) JOIN r USING (doc_id)
  WHERE q.quality >= 0.6 AND s.stopword_ratio >= 0.04
    AND r.distinct_ratio >= 0.35 AND r.top_bigram_frac <= 0.1),
d1 AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT MIN(doc_id) FROM documents
                   GROUP BY md5(coalesce(text, '')))
    AND doc_id IN (SELECT doc_id FROM keepq)),
b AS (
  SELECT array_to_string(
           regexp_extract_all(lower(text), '[a-z0-9_]+')[1:8], ' ') AS gram
  FROM documents
  WHERE md5_number_lower('bench:' || CAST(doc_id AS VARCHAR)) % 1000 < 27
    AND len(regexp_extract_all(lower(text), '[a-z0-9_]+')) >= 8),
clean AS (
  SELECT doc_id, text FROM d1
  WHERE NOT EXISTS (
    SELECT 1 FROM b WHERE contains(
      ' ' || array_to_string(
          regexp_extract_all(lower(coalesce(d1.text, '')),
                             '[a-z0-9_]+'), ' ') || ' ',
      ' ' || b.gram || ' ')))
SELECT CASE WHEN md5_number_lower('cur:' || CAST(doc_id AS VARCHAR))
                 % 1000 < 900 THEN 'train'
            WHEN md5_number_lower('cur:' || CAST(doc_id AS VARCHAR))
                 % 1000 < 950 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(coalesce(text, ''))) AS BIGINT) AS sum_chars
FROM clean GROUP BY 1 ORDER BY 1
"""



def quality_funnel_docs(sf_dir: str) -> pd.DataFrame:
    """Filter-cascade accounting — how many docs survive each prefix of
    the quality_filter_docs cascade (total → quality → +stopword →
    +repetition), the per-stage attrition report a curation run ships
    with. One extra pass over the fused signal table: each block emits a
    4-row cumulative-count partial; a 4-group combine finishes."""
    joined = _quality_signals_joined(sf_dir)

    def funnel_partial(t: pa.Table) -> pa.Table:
        q = t.column("quality").to_numpy()
        s = t.column("stopword_ratio").to_numpy()
        d = t.column("distinct_ratio").to_numpy()
        b = t.column("top_bigram_frac").to_numpy()
        c1 = q >= 0.6
        c2 = c1 & (s >= 0.04)
        c3 = c2 & (d >= 0.35) & (b <= 0.1)
        return pa.table({
            "stage": pa.array([0, 1, 2, 3], pa.int64()),
            "n": pa.array([len(q), int(c1.sum()), int(c2.sum()),
                           int(c3.sum())], pa.int64())})

    df = _for_agg(joined.map_batches(funnel_partial,
                                     batch_format="pyarrow")) \
        .groupby("stage").aggregate(Sum("n", alias_name="n")).to_pandas()
    return df.sort_values("stage").reset_index(drop=True)



QUALITY_FUNNEL_SQL = f"""
WITH q AS ({QUALITY_SCORES_SQL}),
s AS ({STOPWORD_STATS_SQL}),
r AS ({DOC_REPETITION_SQL}),
j AS (SELECT q.quality, s.stopword_ratio, r.distinct_ratio,
             r.top_bigram_frac
      FROM q JOIN s USING (doc_id) JOIN r USING (doc_id))
SELECT CAST(0 AS BIGINT) AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM j
UNION ALL
SELECT 1, CAST(SUM(CASE WHEN quality >= 0.6 THEN 1 ELSE 0 END)
               AS BIGINT) FROM j
UNION ALL
SELECT 2, CAST(SUM(CASE WHEN quality >= 0.6 AND stopword_ratio >= 0.04
                        THEN 1 ELSE 0 END) AS BIGINT) FROM j
UNION ALL
SELECT 3, CAST(SUM(CASE WHEN quality >= 0.6 AND stopword_ratio >= 0.04
                        AND distinct_ratio >= 0.35
                        AND top_bigram_frac <= 0.1
                        THEN 1 ELSE 0 END) AS BIGINT) FROM j
ORDER BY stage
"""


def heaps_vocab_growth(sf_dir: str) -> pd.DataFrame:
    """Heaps-law vocabulary-growth curve: distinct-vocabulary size after
    the first 25/50/75/100% of documents (by doc_id order — the corpus's
    arrival order). One term-keyed shuffle: per-block (term, min doc_id)
    partials → groupby MIN (first-occurrence table, the same exchange
    vocabulary/DF counting pays), then a second pass over THAT table
    emits 4 histogram counts per block (searchsorted against the
    checkpoint ids) — the corpus text never shuffles and the driver sums
    blocks × 4 numbers."""
    from ray.data.aggregate import Min as _Min

    from ..ops.curate import _WORD_RE
    n = _n_rows(sf_dir, "documents")
    cps = [(n * k) // 4 for k in (1, 2, 3, 4)]

    def first_seen(batch: pd.DataFrame) -> pa.Table:
        toks: list[str] = []
        docs: list[int] = []
        for did, text in zip(batch["doc_id"], batch["text"].fillna("")):
            w = _WORD_RE.findall(str(text).lower())
            toks.extend(w)
            docs.extend([int(did)] * len(w))
        if not toks:
            return pa.table({"term": pa.array([], pa.string()),
                             "fd": pa.array([], pa.int64())})
        pairs = pd.DataFrame({"term": toks,
                              "fd": np.asarray(docs, dtype=np.int64)})
        return _arrow(pairs.groupby("term", as_index=False)["fd"].min())

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    first = ds.map_batches(first_seen, batch_format="pandas") \
        .groupby("term").aggregate(_Min("fd", alias_name="fd"))

    bounds = np.asarray(cps, dtype=np.int64)

    def hist(t: pa.Table) -> pa.Table:
        fd = np.sort(t.column("fd").to_numpy(zero_copy_only=False))
        # count of fd <= c per checkpoint
        c = np.searchsorted(fd, bounds, side="right").astype(np.int64)
        return pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                         "vocab": pa.array(c, pa.int64())})

    agg = first.map_batches(hist, batch_format="pyarrow").to_pandas() \
        .groupby("k", sort=True)["vocab"].sum()
    return pd.DataFrame({
        "frac": [k / 4.0 for k in (1, 2, 3, 4)],
        "checkpoint": pd.Series(cps, dtype="int64"),
        "vocab": pd.Series(agg.to_numpy(), dtype="int64")})



HEAPS_VOCAB_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
f AS MATERIALIZED (SELECT term, MIN(doc_id) AS fd FROM toks GROUP BY term),
cp AS (SELECT k,
              CAST(((SELECT COUNT(*) FROM documents) * k) // 4 AS BIGINT)
                AS c
       FROM (SELECT UNNEST([1, 2, 3, 4]) AS k))
SELECT cp.k / 4.0 AS frac, cp.c AS checkpoint,
       CAST((SELECT COUNT(*) FROM f WHERE fd <= cp.c) AS BIGINT) AS vocab
FROM cp ORDER BY frac
"""



_ZIPF_TOP = 100



def zipf_slope_docs(sf_dir: str) -> pd.DataFrame:
    """Zipf-law exponent: OLS slope of ln(tf) against ln(rank) over the
    top-100 terms (rank = tf desc, term asc — the vocab_top_terms rule).
    Distributed part: the per-block local-head top-k merge
    (ops/curate.top_terms); the regression runs on 100 driver rows.
    Rounded 6dp — the two sides sum 100 doubles in different orders."""
    from ..ops.curate import top_terms
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    top = top_terms(ds, k=_ZIPF_TOP, n_docs=_n_rows(sf_dir, "documents"))
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    y = np.log(top["tf"].to_numpy(np.float64))
    nn = float(len(top))
    sx, sy = x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    return pd.DataFrame({
        "zipf_slope": [round(slope, 6)],
        "n_terms": pd.Series([len(top)], dtype="int64")})



ZIPF_SLOPE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
stats AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
top AS (SELECT tf,
               ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS r
        FROM stats ORDER BY tf DESC, term LIMIT {_ZIPF_TOP}),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(LN(r)) AS sx, SUM(LN(tf)) AS sy,
             SUM(LN(r) * LN(r)) AS sxx, SUM(LN(r) * LN(tf)) AS sxy
      FROM top)
SELECT ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       CAST((SELECT COUNT(*) FROM top) AS BIGINT) AS n_terms
FROM m
"""



def doc_length_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of document lengths (corpus-balance diagnostic):
    G = 2·Σ r_i·x_i / (n·Σ x) − (n+1)/n over ranks r from the
    (n_chars, doc_id) total order. Ranks come from
    :func:`ops.curate.global_rank` (range-bucket prefix scan — no global
    sort); tied lengths contribute equal x at consecutive ranks, so the
    tie-break cannot change Σ r·x and both sides agree exactly. All
    sums are integers well under 2^53 (n·x̄·n ≈ 4e12 at sf0.1), so the
    final float expression — written with the SAME operation order as
    the SQL — is bit-identical; rounded 6dp anyway."""
    from ..ops.curate import global_rank
    ds = _read_pq(_t(sf_dir, "documents"),
                  columns=["doc_id", "n_chars"])
    ranked = global_rank(ds, order_cols=["n_chars", "doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        rn = t.column("rank").to_numpy(zero_copy_only=False)
        x = t.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({
            "rx": pa.array([int((rn * x).sum())], pa.int64()),
            "s": pa.array([int(x.sum())], pa.int64()),
            "n": pa.array([len(x)], pa.int64())})

    m = ranked.map_batches(partial, batch_format="pyarrow") \
        .to_pandas().sum()
    rx, s, n = int(m["rx"]), int(m["s"]), int(m["n"])
    gini = 2.0 * rx / (n * s) - (n + 1.0) / n
    return pd.DataFrame({"gini": [round(gini, 6)],
                         "n_docs": pd.Series([n], dtype="int64")})



DOC_GINI_SQL = """
WITH r AS (SELECT n_chars,
                  ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
           FROM documents)
SELECT ROUND(2.0 * SUM(rn * n_chars) / (COUNT(*) * SUM(n_chars))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM r
"""



_UPSERT_INSERTS = 500



def upsert_documents(sf_dir: str) -> pd.DataFrame:
    """CDC MERGE / SCD-1 upsert over the documents table via
    :func:`ops.joins.upsert_merge`: a deterministic change set — every
    doc_id % 7 == 0 row updated (text → 'UPDATED:id', lang → 'xx'),
    every doc_id % 13 == 0 row deleted, 500 fresh rows appended past
    MAX(doc_id) — applies through ONE bucketed anti-join exchange; the
    delta's own upsert rows stream to the union untouched. The oracle
    rebuilds the same delta in SQL and merges with
    NOT EXISTS ∪ op='U' (full-value check over the merged table)."""
    from ray.data.aggregate import Max as _Max

    from ..ops.joins import upsert_merge
    base = _read_pq(_t(sf_dir, "documents"),
                    columns=["doc_id", "text", "lang"])
    mx = int(_read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
             .aggregate(_Max("doc_id", alias_name="m"))["m"])

    def delta_from_base(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        upd = (did % 7 == 0) & (did % 13 != 0)
        u_ids = did[upd]
        u_tab = pa.table({
            "doc_id": pa.array(u_ids, pa.int64()),
            "text": pa.array(["UPDATED:" + str(i) for i in u_ids],
                             pa.string()),
            "lang": pa.array(["xx"] * len(u_ids), pa.string()),
            "op": pa.array(["U"] * len(u_ids), pa.string())})
        d_tab = t.filter(pa.array(did % 13 == 0)).append_column(
            "op", pa.array(["D"] * int((did % 13 == 0).sum()),
                           pa.string()))
        return pa.concat_tables([u_tab, d_tab.select(u_tab.column_names)])

    ins_ids = np.arange(mx + 1, mx + 1 + _UPSERT_INSERTS, dtype=np.int64)
    inserts = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ins_ids, pa.int64()),
        "text": pa.array(["NEW:" + str(i) for i in ins_ids], pa.string()),
        "lang": pa.array(["new"] * len(ins_ids), pa.string()),
        "op": pa.array(["U"] * len(ins_ids), pa.string())}))
    delta = base.map_batches(delta_from_base, batch_format="pyarrow") \
        .union(inserts)

    out = upsert_merge(base, delta, "doc_id").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
              [["doc_id", "text", "lang"]]



UPSERT_DOCS_SQL = f"""
WITH delta AS (
  SELECT doc_id, 'UPDATED:' || CAST(doc_id AS VARCHAR) AS text,
         'xx' AS lang, 'U' AS op
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id, text, lang, 'D' AS op
  FROM documents WHERE doc_id % 13 = 0
  UNION ALL
  SELECT (SELECT MAX(doc_id) FROM documents) + s AS doc_id,
         'NEW:' || CAST((SELECT MAX(doc_id) FROM documents) + s
                        AS VARCHAR) AS text,
         'new' AS lang, 'U' AS op
  FROM (SELECT UNNEST(generate_series(1, {_UPSERT_INSERTS})) AS s))
SELECT doc_id, text, lang FROM documents b
WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.doc_id = b.doc_id)
UNION ALL
SELECT doc_id, text, lang FROM delta WHERE op = 'U'
ORDER BY doc_id
"""



_JSD_LANGS = ("en", "es")



def lang_jsd_docs(sf_dir: str) -> pd.DataFrame:
    """Jensen-Shannon divergence between two languages' unigram term
    distributions (corpus drift / domain-shift diagnostic). ONE
    term-keyed exchange: per-block (term, ca, cb) count partials →
    groupby SUM; totals reduce from THAT bounded table; the per-term
    contribution pass is vectorized with the broadcast totals and only
    block-partial doubles reach the driver. Per-term doubles are
    bit-identical to the SQL (same ints, same expression order) —
    only the final summation order differs, absorbed by the 6dp round."""
    from ..ops.curate import _WORD_RE
    la, lb = _JSD_LANGS
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(batch: pd.DataFrame) -> pa.Table:
        cnt: dict[str, list[int]] = {}
        for lang, text in zip(batch["lang"], batch["text"].fillna("")):
            if lang == la:
                j = 0
            elif lang == lb:
                j = 1
            else:
                continue
            for w in _WORD_RE.findall(str(text).lower()):
                c = cnt.get(w)
                if c is None:
                    cnt[w] = c = [0, 0]
                c[j] += 1
        terms = list(cnt)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "ca": pa.array([cnt[t][0] for t in terms], pa.int64()),
            "cb": pa.array([cnt[t][1] for t in terms], pa.int64())})

    counts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("term").aggregate(Sum("ca", alias_name="ca"),
                                   Sum("cb", alias_name="cb")) \
        .materialize()   # bounded (vocab-sized); consumed twice below
    tot = counts.aggregate(Sum("ca", alias_name="na"),
                           Sum("cb", alias_name="nb"))
    na, nb = float(tot["na"]), float(tot["nb"])

    def contrib(t: pa.Table) -> pa.Table:
        ca = t.column("ca").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cb = t.column("cb").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        p = ca / na
        q = cb / nb
        s = p + q
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = np.where(ca > 0, p * np.log(2.0 * p / s), 0.0)
            tb = np.where(cb > 0, q * np.log(2.0 * q / s), 0.0)
        return pa.table({
            "j": pa.array([float((0.5 * (ta + tb)).sum())], pa.float64()),
            "n": pa.array([t.num_rows], pa.int64())})

    m = counts.map_batches(contrib, batch_format="pyarrow") \
        .to_pandas().sum()
    return pd.DataFrame({"jsd": [round(float(m["j"]), 6)],
                         "n_terms": pd.Series([int(m["n"])],
                                              dtype="int64")})



LANG_JSD_SQL = f"""
WITH toks AS (
  SELECT lang,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents WHERE lang IN ('{_JSD_LANGS[0]}', '{_JSD_LANGS[1]}')),
c AS (SELECT term,
             SUM(CASE WHEN lang = '{_JSD_LANGS[0]}' THEN 1 ELSE 0 END)
               AS ca,
             SUM(CASE WHEN lang = '{_JSD_LANGS[1]}' THEN 1 ELSE 0 END)
               AS cb
      FROM toks GROUP BY term),
n AS (SELECT CAST(SUM(ca) AS DOUBLE) AS na,
             CAST(SUM(cb) AS DOUBLE) AS nb FROM c)
SELECT ROUND(SUM(
         0.5 * (CASE WHEN ca > 0
                     THEN (ca / n.na)
                          * ln(2.0 * (ca / n.na)
                               / ((ca / n.na) + (cb / n.nb)))
                     ELSE 0.0 END
              + CASE WHEN cb > 0
                     THEN (cb / n.nb)
                          * ln(2.0 * (cb / n.nb)
                               / ((ca / n.na) + (cb / n.nb)))
                     ELSE 0.0 END)), 6) AS jsd,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM c, n
"""



_NDCG_TERMS = ("hash", "join", "window")
_NDCG_K = 10



def bm25_ndcg_docs(sf_dir: str) -> pd.DataFrame:
    """Retrieval-quality evaluation: NDCG@10 of the BM25 ranking against
    a linear-gain relevance label rel(doc) = total occurrences of the
    query terms (SQL-recomputable ground truth). Composition of existing
    scale parts: the ranked list comes from ops.curate.bm25_topk
    (round-before-rank, ULP-stable cut), the relevance table from one
    vectorized corpus pass, the ideal ordering from
    ops.curate.global_topn (per-block local heads — rel ties across the
    ideal cut swap only equal VALUES, so IDCG is cut-stable), and the
    winners' labels attach via a 10-id pushdown filter. DCG sums 10
    doubles — order absorbed by the 6dp round."""
    from ..ops.curate import _WORD_RE, bm25_topk, global_topn
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    top = bm25_topk(ds, list(_NDCG_TERMS), _NDCG_K) \
        .sort_values(["score", "doc_id"], ascending=[False, True]) \
        .reset_index(drop=True)
    tset = frozenset(_NDCG_TERMS)

    def rel_partial(batch: pd.DataFrame) -> pa.Table:
        ids: list[int] = []
        rels: list[int] = []
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            c = sum(1 for w in _WORD_RE.findall(str(t).lower())
                    if w in tset)
            if c:
                ids.append(int(d))
                rels.append(c)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "rel": pa.array(rels, pa.int64())})

    rels = ds.map_batches(rel_partial, batch_format="pandas")
    ideal = global_topn(rels, order_cols=["rel", "doc_id"],
                        descending=[True, False], n=_NDCG_K)
    win_ids = pa.array([int(d) for d in top["doc_id"]], pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("doc_id"), value_set=win_ids))

    got = rels.map_batches(pick, batch_format="pyarrow").to_pandas()
    rel_of = dict(zip(got["doc_id"].astype(int), got["rel"].astype(int)))
    r = np.arange(1, len(top) + 1, dtype=np.float64)
    gains = np.asarray([rel_of.get(int(d), 0) for d in top["doc_id"]],
                       dtype=np.float64)
    dcg = float((gains / np.log2(r + 1.0)).sum())
    ri = np.arange(1, len(ideal) + 1, dtype=np.float64)
    idcg = float((ideal["rel"].to_numpy(np.float64)
                  / np.log2(ri + 1.0)).sum())
    return pd.DataFrame({"dcg": [round(dcg, 6)],
                         "idcg": [round(idcg, 6)],
                         "ndcg": [round(dcg / idcg, 6)]})



def _ndcg_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _NDCG_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
rel AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS rel
        FROM toks WHERE term IN ({terms}) GROUP BY doc_id),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
       FROM toks GROUP BY doc_id),
st AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
              CAST((SELECT COUNT(*) FROM toks) AS DOUBLE)
                / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                AS avgdl),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM toks WHERE term IN ({terms})
       GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id,
              ROUND(SUM(ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                        * tf.tf * (1.2 + 1.0)
                        / (tf.tf + 1.2 * (1.0 - 0.75
                                          + 0.75 * dl.dl / st.avgdl))),
                    6) AS score
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id), st
       GROUP BY tf.doc_id),
ranked AS (SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
           FROM (SELECT * FROM sc
                 ORDER BY score DESC, doc_id LIMIT {_NDCG_K})),
d AS (SELECT SUM(COALESCE(rel.rel, 0) / log2(ranked.r + 1.0)) AS dcg
      FROM ranked LEFT JOIN rel USING (doc_id)),
i AS (SELECT SUM(rel / log2(rn + 1.0)) AS idcg
      FROM (SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id)
                     AS rn
            FROM rel ORDER BY rel DESC, doc_id LIMIT {_NDCG_K}))
SELECT ROUND(d.dcg, 6) AS dcg, ROUND(i.idcg, 6) AS idcg,
       ROUND(d.dcg / i.idcg, 6) AS ndcg
FROM d, i
"""



BM25_NDCG_SQL = _ndcg_sql()



__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
