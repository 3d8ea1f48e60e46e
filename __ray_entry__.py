"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the wtes_ray library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# log hygiene only (no Ray session touched): drop Ray 2.49's spurious
# empty-new-schema RefBundle divergence warning — see ops/runtime.py
from wtes_ray.ops.runtime import quiet_empty_schema_warnings  # noqa: E402

quiet_empty_schema_warnings()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: deterministic synthetic
    interleaved (doc_id, spans) docs → split/salt → cached-state task
    extraction → per-doc summary Dataset (stable schema, ≥0 rows)."""
    import pyarrow as pa
    import ray.data as rd

    from wtes_ray.gen import generate_batch
    from wtes_ray.pipeline import extract_chunks_batch, split_and_key

    def gen(t: pa.Table) -> pa.Table:
        return generate_batch(t.column("id").to_pylist(), giant_fraction=0.02)

    docs = rd.range(60, override_num_blocks=4).map_batches(
        gen, batch_format="pyarrow")
    chunks = docs.map_batches(
        split_and_key, batch_format="pyarrow",
        fn_kwargs={"num_partitions": 8})
    extracted = chunks.map_batches(extract_chunks_batch,
                                   batch_format="pyarrow", batch_size=16)
    return extracted.select_columns(
        ["doc_id", "part", "n_tables", "n_spans", "n_entities",
         "n_relations", "error"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented pipeline/operator from SURVEY.md §2 and the
    training-data op set (see wtes_ray/queries.py for the registry)."""
    from wtes_ray.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names/rounding as the Ray side); non-SQL ops are omitted → rows-only."""
    from wtes_ray.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items()
            if sql is not None}
