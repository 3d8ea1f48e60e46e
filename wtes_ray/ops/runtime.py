"""Per-worker cached stage state for stateless-task execution.

A callable-class ``map_batches`` stage (actor pool) pays a fresh pool per
invocation: each actor is a new process that re-imports the package
(~1.4 s) before its first batch, and the pool holds CPU slots away from
the read and downstream stages (CLAUDE.md perf facts; re-measured in
round 3 — the MinHash signature stage over sf0.1 costs 2.85 s as a
``(1, 8)`` actor pool vs 0.86 s as stateless tasks on the session's warm
workers, identical work). ``stateless(Cls, **kwargs)`` keeps an actor
pool's once-per-worker setup property — the instance is built lazily and
cached in the worker process, keyed by (class, kwargs) — while running
as plain Ray tasks that reuse already-imported workers and fuse with
adjacent stages.

The callable classes stay public for users who want a dedicated pool:
that is still the right shape when per-actor state is genuinely heavy
(models, GPU decoders) or per-actor resources matter. The gate-scale
pipelines here use tasks (the ``extract_chunks_batch`` pattern,
pipeline.py).
"""
from __future__ import annotations

import logging

_CACHE: dict = {}


class _EmptySchemaDivergenceFilter(logging.Filter):
    """Drop ONLY the empty-new-schema variant of Ray 2.49's RefBundle
    schema-divergence warning (streaming_executor_state.py:793).

    Ray's sort-based aggregate/groupby legitimately emits zero-row,
    zero-column blocks for empty partitions; upstream special-cases an
    empty OLD schema (no warning) but not an empty NEW one, so every
    plain ``groupby().aggregate()`` whose group count is below the
    partition count logs a spurious divergence (reproduced with vanilla
    ``read_parquet → groupby → aggregate``, no wtes_ray code involved).
    A REAL divergence — two non-empty schemas — still passes through."""

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not ("Operator produced a RefBundle with a different schema"
                    in msg and "new schema: ." in msg)


def quiet_empty_schema_warnings() -> None:
    """Install the targeted filter (idempotent, process-local)."""
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptySchemaDivergenceFilter)
               for f in lg.filters):
        lg.addFilter(_EmptySchemaDivergenceFilter())


def stateless(cls, **kwargs):
    """A plain map_batches function wrapping ``cls(**kwargs).__call__``,
    with the instance cached per worker process. ``kwargs`` values must be
    hashable (they key the cache)."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))

    def run_batch(batch):
        inst = _CACHE.get(key)
        if inst is None:
            inst = _CACHE[key] = cls(**kwargs)
        return inst(batch)

    run_batch.__name__ = f"{cls.__name__}_tasks"
    return run_batch


def task_concurrency(concurrency) -> dict:
    """Map an actor-pool concurrency spec onto task semantics: ``None`` →
    no cap (tasks already yield to other stages), int or (min, max) tuple
    → keep the documented upper bound as the task-concurrency cap."""
    if concurrency is None:
        return {}
    if isinstance(concurrency, (tuple, list)):
        return {"concurrency": int(concurrency[-1])}
    return {"concurrency": int(concurrency)}
