from ._common import *  # noqa: F401,F403
from .tpch import *  # noqa: F401,F403
from .relational import *  # noqa: F401,F403
from .events import *  # noqa: F401,F403
from .text import *  # noqa: F401,F403



def dedup_filter_docs(sf_dir: str) -> pd.DataFrame:
    """End-to-end corpus cleaning: planted-dup corpus → MinHash-LSH pairs →
    cluster → drop non-representative members (rows-only: LSH output)."""
    from ..ops.dedup import dedup_filter, minhash_lsh_pairs
    docs = _docs_with_planted_dups(sf_dir)   # lazy plan, re-executable
    pairs = minhash_lsh_pairs(docs, threshold=0.8, concurrency=(1, 8))
    kept = dedup_filter(docs, pairs)
    df = kept.select_columns(["doc_id"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



def dedup_filter_exact_docs(sf_dir: str) -> pd.DataFrame:
    """The full cluster-dedup pipeline (LSH candidates → Jaccard verify →
    connected components → drop non-representatives) run at verify
    threshold 1.0, where it must reduce to exact text dedup — which IS
    SQL-expressible (GROUP BY text, keep MIN(doc_id)), so the whole
    pairs→CC→filter chain gets a value-hash oracle, not just row counts.
    (Identical texts always share every MinHash band, so LSH recall of
    exact dups is 1 barring max_bucket truncation; char-5-gram Jaccard
    is 1.0 only for equal shingle SETS — byte-identical on this corpus.)"""
    from ..ops.dedup import (dedup_filter, minhash_lsh_pairs,
                            verify_pairs_jaccard)
    docs = _docs_with_planted_dups(sf_dir)
    pairs = minhash_lsh_pairs(docs, threshold=0.8, concurrency=(1, 8))
    exact = verify_pairs_jaccard(pairs, docs, threshold=1.0)
    kept = dedup_filter(docs, exact)
    df = kept.select_columns(["doc_id"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



DEDUP_FILTER_EXACT_SQL = f"""
WITH planted AS ({PLANTED_SQL})
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
FROM planted GROUP BY text ORDER BY doc_id
"""



def neardup_clusters_exact_docs(sf_dir: str) -> pd.DataFrame:
    """Cluster membership of the exact-dup (verify-at-1.0) pipeline —
    SQL-expressible as text-equality groups of size > 1 (window form)."""
    from ..ops.dedup import (minhash_lsh_pairs, neardup_clusters,
                            verify_pairs_jaccard)
    docs = _docs_with_planted_dups(sf_dir)
    pairs = minhash_lsh_pairs(docs, threshold=0.8, concurrency=(1, 8))
    exact = verify_pairs_jaccard(pairs, docs, threshold=1.0)
    return neardup_clusters(exact).sort_values("doc_id") \
                                  .reset_index(drop=True)



NEARDUP_CLUSTERS_EXACT_SQL = f"""
WITH planted AS ({PLANTED_SQL}),
g AS (SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY text) AS cluster_id,
             COUNT(*) OVER (PARTITION BY text) AS n
      FROM planted)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(cluster_id AS BIGINT) AS cluster_id
FROM g WHERE n > 1 ORDER BY doc_id
"""



def neardup_clusters_docs(sf_dir: str) -> pd.DataFrame:
    """Connected components over the MinHash candidate pairs → (doc_id,
    cluster_id) for the planted-dup corpus (rows-only: LSH output)."""
    from ..ops.dedup import minhash_lsh_pairs, neardup_clusters
    pairs = minhash_lsh_pairs(_docs_with_planted_dups(sf_dir),
                              threshold=0.8, concurrency=(1, 8))
    return neardup_clusters(pairs).sort_values("doc_id") \
                                  .reset_index(drop=True)



# ---------------------------------------------------------------------------
# Dedup family over `documents`
# ---------------------------------------------------------------------------

def dedup_exact_docs(sf_dir: str) -> pd.DataFrame:
    from ..ops.dedup import exact_dedup
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return exact_dedup(ds).to_pandas().sort_values("doc_id") \
                          .reset_index(drop=True)



DEDUP_EXACT_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, text
FROM documents GROUP BY text ORDER BY doc_id
"""



def minhash_neardup_docs(sf_dir: str) -> pd.DataFrame:
    from ..ops.dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(_docs_with_planted_dups(sf_dir),
                              threshold=0.8, concurrency=(1, 8))
    df = pairs.to_pandas()[["a", "b", "est_jaccard"]]
    df["est_jaccard"] = df["est_jaccard"].round(6)
    return df.sort_values(["a", "b"]).reset_index(drop=True)



def simhash_neardup_docs(sf_dir: str) -> pd.DataFrame:
    from ..ops.dedup import simhash_pairs
    pairs = simhash_pairs(_docs_with_planted_dups(sf_dir), max_hamming=2,
                          concurrency=(1, 8))
    return pairs.to_pandas()[["a", "b", "hamming"]] \
                .sort_values(["a", "b"]).reset_index(drop=True)



def jaccard_verified_neardup_docs(sf_dir: str) -> pd.DataFrame:
    from ..ops.dedup import minhash_lsh_pairs, verify_pairs_jaccard
    docs = _docs_with_planted_dups(sf_dir)   # lazy plan, re-executable
    pairs = minhash_lsh_pairs(docs, threshold=0.8, concurrency=(1, 8))
    verified = verify_pairs_jaccard(pairs, docs, threshold=0.95)
    df = verified.to_pandas()[["a", "b", "jaccard"]]
    df["jaccard"] = df["jaccard"].round(6)
    return df.sort_values(["a", "b"]).reset_index(drop=True)



def embedding_neardup(sf_dir: str) -> pd.DataFrame:
    from ..ops.dedup import embedding_neardup_pairs
    ds = _read_pq(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    head = _sorted_head(_t(sf_dir, "embeddings"), "vec_id",
                        ["vec_id", "embedding"], 10)
    dup = pa.table({"vec_id": pc.add(head["vec_id"], pa.scalar(10**12)),
                    "embedding": head["embedding"]})
    pairs = embedding_neardup_pairs(ds.union(rd.from_arrow(dup)),
                                    threshold=0.999)
    df = pairs.to_pandas()
    df["cosine"] = df["cosine"].round(4)
    return df.sort_values(["a", "b"]).reset_index(drop=True)



EMB_PLANTED_SQL = """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000000000 AS vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 10)
"""



def embedding_neardup_planted(sf_dir: str) -> pd.DataFrame:
    """The hyperplane-LSH + in-bucket-cosine pipeline at a near-exact
    threshold (0.9999), where it must find exactly the planted identical
    vectors — identical vectors share every hyperplane sign, so LSH recall
    of exact duplicates is 1 — making the whole bucketed pipeline
    SQL-checkable against an exhaustive cross-join (the oracle's O(n²) is
    fine at gate scale; the Ray side stays bucketed)."""
    from ..ops.dedup import embedding_neardup_pairs
    ds = _read_pq(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    head = _sorted_head(_t(sf_dir, "embeddings"), "vec_id",
                        ["vec_id", "embedding"], 10)
    dup = pa.table({"vec_id": pc.add(head["vec_id"], pa.scalar(10**12)),
                    "embedding": head["embedding"]})
    pairs = embedding_neardup_pairs(ds.union(rd.from_arrow(dup)),
                                    threshold=0.9999)
    df = pairs.to_pandas()[["a", "b", "cosine"]]
    df["cosine"] = df["cosine"].round(4)
    return df.sort_values(["a", "b"]).reset_index(drop=True)



EMBEDDING_NEARDUP_PLANTED_SQL = f"""
WITH planted AS ({EMB_PLANTED_SQL})
SELECT x.vec_id AS a, y.vec_id AS b,
       ROUND(list_cosine_similarity(x.e, y.e), 4) AS cosine
FROM planted x JOIN planted y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.e, y.e) >= 0.9999
ORDER BY a, b
"""



def simhash_exact_neardup_docs(sf_dir: str) -> pd.DataFrame:
    """SimHash candidates at max_hamming=0 VERIFIED at Jaccard 1.0 on the
    planted corpus. SimHash is a similarity hash — distinct-but-similar
    soup docs do collide at Hamming 0 (measured: 6 of 26 candidates at
    sf0.01), so the exact-dup pipeline is candidates → verify, and the
    verified output must equal the text-equality pairs SQL expresses as
    same-text-group pairs. (Identical texts always hash identically, so
    candidate recall of true dups is 1.)"""
    from ..ops.dedup import simhash_pairs, verify_pairs_jaccard
    docs = _docs_with_planted_dups(sf_dir)
    pairs = simhash_pairs(docs, max_hamming=0, concurrency=(1, 8))
    exact = verify_pairs_jaccard(pairs, docs, threshold=1.0)
    df = exact.to_pandas()[["a", "b", "hamming"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)



SIMHASH_EXACT_SQL = f"""
WITH planted AS ({PLANTED_SQL})
SELECT x.doc_id AS a, y.doc_id AS b, CAST(0 AS BIGINT) AS hamming
FROM planted x JOIN planted y ON x.text = y.text AND x.doc_id < y.doc_id
ORDER BY a, b
"""



def ngram_jaccard_neardup_docs(sf_dir: str) -> pd.DataFrame:
    """Word-n-gram Jaccard near-dup pairs over the planted corpus:
    word-trigram MinHash candidates → exact word-trigram Jaccard ≥ 0.7
    (rows-only: LSH candidate recall < 1 by nature; the kernel and the
    full pipeline are hash-checked by ngram_jaccard_planted /
    ngram_jaccard_exact_docs)."""
    from ..ops.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(_docs_with_planted_dups(sf_dir), n=3,
                                candidate_threshold=0.5, threshold=0.7,
                                concurrency=(1, 8))
    df = pairs.to_pandas()[["a", "b", "jaccard"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)



def ngram_jaccard_planted(sf_dir: str) -> pd.DataFrame:
    """Full-value oracle for the word-n-gram Jaccard KERNEL: all 780 pairs
    of the 40 planted head docs (20 originals + their copies), exact
    word-BIGRAM Jaccard at threshold 0.0, computed through the bucketed
    verify path (texts attach via the two hash joins, never the driver).

    The values hash-match DuckDB bit-exactly WITHOUT rounding: both sides
    compute |∩| / |∪| as one IEEE double division of the same two integers
    (tokenizer pinned to the ASCII class [a-z0-9_]+ on both sides — see
    ops/dedup._WORD_RE; Python's \\w is Unicode-wide, RE2's is not)."""
    from ..ops.dedup import verify_pairs_jaccard
    docs = _docs_with_planted_dups(sf_dir)
    head = _sorted_head(_t(sf_dir, "documents"), "doc_id", ["doc_id"], 20)
    ids = sorted(head["doc_id"].to_pylist())
    ids = ids + [i + 10**12 for i in ids]
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    pairs_ds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())}))
    out = verify_pairs_jaccard(pairs_ds, docs, ngram=2, threshold=0.0,
                               mode="word")
    df = out.to_pandas()[["a", "b", "jaccard"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)



NGRAM_JACCARD_PLANTED_SQL = """
WITH heads AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20),
planted AS (
  SELECT doc_id, text FROM heads
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, text FROM heads),
g AS (SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS grams
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
            FROM planted))
SELECT x.doc_id AS a, y.doc_id AS b,
       COALESCE(CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
                / NULLIF(len(list_distinct(list_concat(x.grams, y.grams))),
                         0), 0.0) AS jaccard
FROM g x JOIN g y ON x.doc_id < y.doc_id
ORDER BY a, b
"""



def ngram_jaccard_exact_docs(sf_dir: str) -> pd.DataFrame:
    """The full word-n-gram pipeline (word-bigram MinHash candidates →
    exact verify) at threshold 1.0, where it must find exactly the pairs
    with EQUAL word-bigram SETS — SQL-expressible as a join on the sorted
    distinct gram list. (Equal shingle sets ⇒ identical minhash signatures
    ⇒ every band collides, so candidate recall of such pairs is 1 barring
    max_bucket truncation; both-empty gram sets verify at 0.0 by the
    kernel contract, mirrored by the len(grams) > 0 guard in the SQL.)"""
    from ..ops.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(_docs_with_planted_dups(sf_dir), n=2,
                                candidate_threshold=0.8, threshold=1.0,
                                concurrency=(1, 8))
    df = pairs.to_pandas()[["a", "b"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)



NGRAM_JACCARD_EXACT_SQL = f"""
WITH planted AS ({PLANTED_SQL}),
g AS (SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS grams
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
            FROM planted))
SELECT CAST(x.doc_id AS BIGINT) AS a, CAST(y.doc_id AS BIGINT) AS b
FROM g x JOIN g y
  ON x.grams = y.grams AND x.doc_id < y.doc_id AND len(x.grams) > 0
ORDER BY a, b
"""



def streaming_dedup_count(sf_dir: str) -> pd.DataFrame:
    """Streaming first-seen dedup through the sharded shared-index
    actors (ops/stream.py — the raw-actor escape hatch for state the
    Dataset API can't express). WHICH representative survives is
    arrival-order-dependent, but the survivor COUNT is exactly the
    distinct-text count — the deterministic projection the oracle
    checks. Actors are shut down before returning (driver contract:
    no leaked state between queries)."""
    from ..ops.stream import StreamingDeduper
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    dd = StreamingDeduper(num_shards=4)
    try:
        n = dd.run(ds).count()
        n_idx = dd.index_size()
    finally:
        dd.shutdown()
    assert n == n_idx
    return pd.DataFrame({"n_unique": pd.Series([n], dtype=np.int64)})



STREAMING_DEDUP_COUNT_SQL = """
SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique FROM documents
"""



def semantic_dedup_planted(sf_dir: str) -> pd.DataFrame:
    """SemDeDup (cluster-then-dedup, ops/dedup.semantic_dedup) on the
    planted corpus at a near-exact threshold. The multi-cluster run is
    still SQL-checkable: at 0.9999 the only above-threshold pairs are the
    planted identical vectors (the exhaustive-pairs oracle of
    embedding_neardup_planted proves that set), and an identical vector
    always lands in the same cluster as its original (same argmax), so
    the within-cluster keep rule equals the global NOT-EXISTS rule the
    oracle expresses."""
    from ..ops.dedup import semantic_dedup
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    head = _sorted_head(_t(sf_dir, "embeddings"), "vec_id",
                        ["vec_id", "embedding"], 10)
    dup = pa.table({"vec_id": pc.add(head["vec_id"], pa.scalar(10**12)),
                    "embedding": head["embedding"]})
    out = semantic_dedup(ds.union(rd.from_arrow(dup)), n_clusters=8,
                         threshold=0.9999).to_pandas()
    return out[["vec_id", "keep"]].sort_values("vec_id") \
        .reset_index(drop=True)



SEMANTIC_DEDUP_PLANTED_SQL = f"""
WITH planted AS ({EMB_PLANTED_SQL})
SELECT x.vec_id,
       NOT EXISTS (SELECT 1 FROM planted y
                   WHERE y.vec_id < x.vec_id
                     AND list_cosine_similarity(x.e, y.e) >= 0.9999) AS keep
FROM planted x
ORDER BY vec_id
"""



def ngram_containment_planted(sf_dir: str) -> pd.DataFrame:
    """Directional word-bigram CONTAINMENT (|∩|/|Ga|, |∩|/|Gb| — the
    quote/subset-detection score) over all pairs of 20 head docs plus a
    10-word PREFIX of each (so true-subset pairs score exactly 1.0 on the
    prefix side). Runs through ops/dedup.containment_pairs' size-dispatched
    attach; values hash-match DuckDB bit-exactly — both sides make one
    IEEE division of the same two gram-set integers."""
    from ..ops.dedup import _WORD_RE, containment_pairs
    head = _sorted_head(_t(sf_dir, "documents"), "doc_id",
                        ["doc_id", "text"], 20)
    ids = head["doc_id"].to_pylist()
    texts = head["text"].to_pylist()
    prefixes = [" ".join(_WORD_RE.findall((t or "").lower())[:10])
                for t in texts]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids + [i + 10**12 for i in ids], pa.int64()),
        "text": pa.array(texts + prefixes, pa.string())}))
    all_ids = sorted(ids) + [i + 10**12 for i in sorted(ids)]
    pairs = [(a, b) for i, a in enumerate(all_ids) for b in all_ids[i + 1:]]
    pairs_ds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())}))
    out = containment_pairs(pairs_ds, docs, ngram=2)
    df = out.to_pandas()[["a", "b", "c_ab", "c_ba"]]
    return df.sort_values(["a", "b"]).reset_index(drop=True)



NGRAM_CONTAINMENT_SQL = """
WITH heads AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20),
hw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
       FROM heads),
planted AS (
  SELECT doc_id, w FROM hw
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, w[1:10] AS w FROM hw),
g AS (SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS grams
      FROM planted)
SELECT x.doc_id AS a, y.doc_id AS b,
       COALESCE(CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
                / NULLIF(len(x.grams), 0), 0.0) AS c_ab,
       COALESCE(CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
                / NULLIF(len(y.grams), 0), 0.0) AS c_ba
FROM g x JOIN g y ON x.doc_id < y.doc_id
ORDER BY a, b
"""



def fuzzy_match_suppliers(sf_dir: str) -> pd.DataFrame:
    """Record linkage (ops/linkage.fuzzy_self_join): edit-distance-≤1
    matches over supplier names plus 10 planted single-char typos. The
    blocking (prefix-2 ∪ suffix-2 key passes) has PROVEN recall 1 at this
    radius, so the block-then-verify pipeline must equal the oracle's
    exhaustive levenshtein cross join — which also picks up the natural
    near-matches among the zero-padded names (any two keys one digit
    apart), making the check far from vacuous."""
    from ..ops.linkage import fuzzy_self_join
    ds = _read_pq(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    head = _sorted_head(_t(sf_dir, "supplier"), "s_suppkey",
                        ["s_suppkey", "s_name"], 10)
    typos = pa.table({
        "s_suppkey": pc.add(head["s_suppkey"], pa.scalar(10**6)),
        "s_name": pa.array([n[:-1] + "x"
                            for n in head["s_name"].to_pylist()],
                           pa.string())})
    pairs = fuzzy_self_join(ds.union(rd.from_arrow(typos)),
                            name_col="s_name", id_col="s_suppkey")
    df = pairs.to_pandas()[["a", "b", "name_a", "name_b", "dist"]]
    df["dist"] = df["dist"].astype("int64")
    return df.sort_values(["a", "b"]).reset_index(drop=True)



FUZZY_MATCH_SQL = """
WITH heads AS (SELECT s_suppkey, s_name FROM supplier
               ORDER BY s_suppkey LIMIT 10),
planted AS (
  SELECT s_suppkey, s_name FROM supplier
  UNION ALL
  SELECT s_suppkey + 1000000 AS s_suppkey,
         substr(s_name, 1, length(s_name) - 1) || 'x' AS s_name
  FROM heads)
SELECT x.s_suppkey AS a, y.s_suppkey AS b,
       x.s_name AS name_a, y.s_name AS name_b,
       CAST(levenshtein(x.s_name, y.s_name) AS BIGINT) AS dist
FROM planted x JOIN planted y ON x.s_suppkey < y.s_suppkey
WHERE levenshtein(x.s_name, y.s_name) <= 1
ORDER BY a, b
"""



# ---------------------------------------------------------------------------
# Exact substring dedup (ops/substr.py — Lee et al. 2021 ExactSubstr family,
# VERDICT r3 item 1). Planted-passage full-value oracles: a fixed 22-word
# passage is appended to every doc_id % 7 == 0 document identically on both
# sides; with min_len=20 its windows are the only duplicated grams in the
# word-soup corpus (and if a natural duplicate ever appeared, both sides
# would flag it identically — the oracle encodes the DEFINITION, not the
# plant).
# ---------------------------------------------------------------------------

_DUP_PASSAGE = ("exact substring deduplication removes long verbatim "
                "passages repeated across training corpora improving "
                "language model perplexity and reducing memorization of "
                "duplicated content measurably")



def _docs_with_planted_passage(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df["doc_id"] % 7 == 0
        df.loc[m, "text"] = df.loc[m, "text"] + " " + _DUP_PASSAGE
        return _arrow(df)

    return ds.map_batches(plant, batch_format="pyarrow")



def duplicate_spans_planted(sf_dir: str) -> pd.DataFrame:
    from ..ops.substr import duplicate_spans
    sp = duplicate_spans(_docs_with_planted_passage(sf_dir), min_len=20)
    df = sp.to_pandas().astype({"doc_id": "int64"})
    return df.sort_values(["doc_id", "start_tok"]).reset_index(drop=True)



def strip_dup_spans_planted(sf_dir: str) -> pd.DataFrame:
    from ..ops.substr import strip_duplicate_spans
    out = strip_duplicate_spans(_docs_with_planted_passage(sf_dir),
                                min_len=20)
    df = out.to_pandas().astype({"doc_id": "int64"})
    return df.sort_values("doc_id").reset_index(drop=True)



_SUBSTR_CTE = f"""
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' {_DUP_PASSAGE}'
              ELSE text END AS text
  FROM documents),
toks AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
         FROM base),
g AS (SELECT doc_id, unnest(generate_series(1, len(tk) - 19)) AS pos, tk
      FROM toks),
grams AS (SELECT doc_id, pos,
                 array_to_string(tk[pos : pos + 19], ' ') AS gram
          FROM g),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (gram)),
m AS (SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) <= 20
                  THEN 0 ELSE 1 END AS brk
      FROM hits),
isl AS (SELECT doc_id, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM m)
"""


DUP_SPANS_SQL = f"""
WITH {_SUBSTR_CTE}
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_tok,
       CAST(MAX(pos) + 20 AS BIGINT) AS end_tok,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, start_tok
"""


STRIP_DUP_SQL = f"""
WITH {_SUBSTR_CTE},
spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 20 AS e
          FROM isl GROUP BY doc_id, island),
alltok AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS i, tk
           FROM toks),
kept AS (SELECT a.doc_id, a.i, a.tk[a.i] AS tok
         FROM alltok a
         WHERE NOT EXISTS (SELECT 1 FROM spans s
                           WHERE s.doc_id = a.doc_id
                             AND a.i >= s.s AND a.i < s.e))
SELECT t.doc_id, COALESCE(k.ct, '') AS clean_text
FROM toks t LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ct
                       FROM kept GROUP BY doc_id) k USING (doc_id)
ORDER BY t.doc_id
"""


def setsim_join_docs(sf_dir: str) -> pd.DataFrame:
    """EXACT set-similarity self-join (PPJoin prefix filtering — see
    ops/dedup.set_similarity_join): ALL pairs with word-token-set Jaccard
    >= 0.7 over the mod-8 document subset ∪ planted dups of its first 20
    docs (guaranteed J = 1.0 positives at every sf). Unlike the MinHash
    family this pair set is complete by the prefix-filter lemma, so the
    WHOLE output is value-hash oracled — both sides compare the identical
    IEEE |∩|/|∪| double against the threshold before rounding."""
    from ..ops.dedup import set_similarity_join
    docs = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    sub = docs.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"],
                                                    pa.scalar(7)), 0)),
        batch_format="pyarrow")
    head = _sorted_head(_t(sf_dir, "documents"), "doc_id",
                        ["doc_id", "text"], 400)
    head = head.filter(pc.equal(pc.bit_wise_and(head["doc_id"],
                                                pa.scalar(7)), 0))
    head = head.slice(0, 20)  # == SQL "first 20 of sub" (ids are dense)
    dup = pa.table({"doc_id": pc.add(head["doc_id"], pa.scalar(10**12)),
                    "text": head["text"]})
    corpus = sub.union(rd.from_arrow(dup))
    pairs = set_similarity_join(corpus, threshold=0.7)
    df = pairs.to_pandas()[["a", "b", "jaccard"]]
    df["jaccard"] = df["jaccard"].round(6)
    return df.sort_values(["a", "b"]).reset_index(drop=True)



SETSIM_JOIN_SQL = """
WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id % 8 = 0),
heads AS (SELECT doc_id, text FROM sub ORDER BY doc_id LIMIT 20),
corpus AS (SELECT doc_id, text FROM sub
           UNION ALL
           SELECT doc_id + 1000000000000 AS doc_id, text FROM heads),
g AS (SELECT doc_id,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+'))
               AS toks
      FROM corpus),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE)
           / len(list_distinct(list_concat(x.toks, y.toks))) AS j
  FROM g x JOIN g y ON x.doc_id < y.doc_id
  WHERE len(x.toks) > 0 AND len(y.toks) > 0)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       ROUND(j, 6) AS jaccard
FROM pairs WHERE j >= 0.7 ORDER BY a, b
"""



__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
