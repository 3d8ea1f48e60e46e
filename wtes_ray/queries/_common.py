"""Driver-facing query registry: every pipeline exposed through
``__ray_entry__.queries()`` with its DuckDB oracle SQL where the semantics
are SQL-expressible (the driver's correctness gate).

Conventions (driver compare: row-count + schema + order-insensitive
value-hash over columns sorted by name):
  - aggregate/computed column names MATCH the SQL aliases exactly;
  - float aggregates are rounded identically on both sides (sums → 2dp,
    ratios/averages/cosines → 6dp) to kill summation-order ULP drift;
  - int aggregates are cast to BIGINT in SQL (DuckDB SUM(int)→HUGEINT);
  - embeddings are cast to DOUBLE[] in SQL so DuckDB's cosine runs in
    float64 like the numpy side;
  - the text-regex oracles (token/quality stats) assume ASCII corpus text:
    Python's \\w/\\s are Unicode-aware while DuckDB RE2's are ASCII-only,
    so they agree only on ASCII (true for the driver's seeded testdata;
    verified). A Unicode corpus would need \\p{{L}}-class SQL regexes.

Each callable takes ``sf_dir`` and returns a Dataset / pandas DataFrame.
Ray is initialised by the caller (driver contract — no ray.init here).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum



def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")



# Dimension-attach strategy (size-budget cutover): a join side is broadcast
# (one ray.put dict, read inside every task) only while its row count —
# taken from the parquet FOOTER, no data read — fits this budget; above it
# the attach runs through the bucketed hash join (ops/joins.py), which
# never materializes the side on the driver. ~1M rows ≈ tens of MB of dict
# per worker heap; dimensions scale with sf, so at the 100 TB design point
# the join path is the one that runs.
BROADCAST_ROWS_BUDGET = 1_000_000



def _n_rows(sf_dir: str, name: str) -> int:
    return pq.ParquetFile(_t(sf_dir, name)).metadata.num_rows



def _read_pq(path, *, columns: list[str] | None = None,
             **kwargs) -> rd.Dataset:
    """``read_parquet`` with an explicit, metadata-free schema (pruned to
    ``columns``) taken from the parquet FOOTER. pandas-written parquet
    carries a ``b'pandas'`` schema-metadata dict which makes
    ``Schema.__hash__`` raise, degrading Ray's block-schema dedup to a
    'Failed to hash the schemas' warning inside the READ stage itself —
    passing the clean schema silences it at the source (field-level
    metadata, e.g. the tensor-extension tag on embeddings, survives)."""
    p0 = path[0] if isinstance(path, (list, tuple)) else path
    s = pq.read_schema(p0)
    if columns is not None:
        s = pa.schema([s.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns,
                           schema=s.remove_metadata(), **kwargs)



def _arrow(df: pd.DataFrame) -> pa.Table:
    """pandas → Arrow block for any stage FEEDING an exchange: Ray's
    sort-based groupby/aggregate is ~16× slower on pandas blocks than on
    Arrow blocks (measured at sf0.1: 21 s vs 1.3 s for an identical
    110k-row aggregate), so partial-aggregate outputs convert here.
    Schema METADATA is stripped: from_pandas attaches a b'pandas' dict that
    makes Schema.__hash__ raise, degrading Ray's block-schema dedup to a
    logged warning per unify ('Failed to hash the schemas')."""
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)



def _for_agg(ds: "rd.Dataset") -> "rd.Dataset":
    """Consolidate a PARTIAL-aggregate dataset before its final groupby:
    Ray's AggregateReduce merges one sorted slice per (input block ×
    partition), so many small pre-reduced blocks make the reduce
    per-slice overhead dominate (measured at sf0.1: 9.2 s streaming vs
    1.6 s consolidated for an identical 110k-row → 15k-group aggregate).
    The inputs here are partial-combine outputs — bounded by keys ×
    blocks, orders of magnitude smaller than the raw tables — so a
    materialize is scale-safe."""
    return ds.materialize()



def _topk(df: pd.DataFrame, by: list[str], ascending: list[bool],
          k: int) -> pd.DataFrame:
    return df.sort_values(by, ascending=ascending).head(k)



PLANTED_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, text FROM
    (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20)
"""



def _sorted_head(path: str, key: str, columns: list[str],
                 n: int) -> pa.Table:
    """First ``n`` rows by ``key`` WITHOUT a driver-side full-table read:
    per-block local head (partial top-k inside map_batches), then a driver
    finish over only the ≤ n-per-block survivors — bounded by block count,
    never data size (the q10 top-k pattern; a full Ray ``sort()`` here
    costs an all-to-all exchange, ~2 s of overhead for a 20-row result).
    (The SQL oracles express this as ORDER BY key LIMIT n, so the result
    must not depend on parquet file order.)"""
    ds = _read_pq(path, columns=columns)

    def local_head(t: pa.Table) -> pa.Table:
        return t.sort_by(key).slice(0, n)

    parts = ray.get(
        ds.map_batches(local_head, batch_format="pyarrow").to_arrow_refs())
    return pa.concat_tables([p for p in parts if p.num_rows]) \
             .sort_by(key).slice(0, n)



def _docs_with_planted_dups(sf_dir: str):
    """documents ∪ copies of the first 20 docs (doc_id + 10**12) so the
    near-dup operators have guaranteed positives at every sf (the sf tables
    themselves are all-distinct word soup)."""
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    head = _sorted_head(_t(sf_dir, "documents"), "doc_id",
                        ["doc_id", "text"], 20)
    dup = pa.table({
        "doc_id": pc.add(head["doc_id"], pa.scalar(10**12)),
        "text": head["text"]})
    return ds.union(rd.from_arrow(dup))



def _code_fingerprint() -> str:
    """Cache key tied to extraction SEMANTICS: the md5 of the stored golden
    outputs (tests/golden/extracted.json). Any intentional semantics change
    regenerates the goldens → new fingerprint → stale /tmp extraction
    caches are abandoned automatically."""
    import hashlib
    # repo root is THREE levels up from queries/_common.py (was two when
    # queries was a single module)
    golden = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "tests", "golden", "extracted.json")
    try:
        with open(golden, "rb") as f:
            return hashlib.md5(f.read()).hexdigest()[:8]
    except OSError:
        return "nogolden"


__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
