"""Streaming ingest operators backed by a SHARED MUTABLE INDEX — the one
shape the Dataset API genuinely cannot express (a `map_batches` stage is
stateless-across-batches by contract; an actor-pool stage has one private
state per actor, not one state all batches agree on). Per the design
rules, raw ``@ray.remote`` actors are the last resort — this module is
that resort, kept deliberately small.

The index is SHARDED BY HASH PREFIX across ``num_shards`` actors, so at
cluster scale the memory (16-byte md5 per distinct document) and the RPC
load spread evenly; each processing task talks to every shard once per
batch (hashes grouped per shard — one message of thousands of hashes,
never one per row). A 10^12-doc corpus at ~10^11 distinct texts needs
~1.6 TB of index → ~100 shards of 16 GB, linear in shards.

Semantics: FIRST-SEEN-WINS under arrival order. With parallel batches
the arrival order is nondeterministic, so WHICH duplicate survives is
not reproducible — but the SURVIVOR COUNT and the surviving text SET
are (exactly one representative per distinct text). Use this for
streaming ingest where any representative is acceptable; the batch
pipelines (``dedup.exact_dedup*``) are the deterministic min-id path.

Reference parity note: this is the Ray re-expression of the reference's
in-process Bloom-filter URL dedup (SURVEY §2.3 ST2) for the STREAMING
case — exact instead of probabilistic, sharded instead of per-process.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray
import ray.data


@ray.remote(num_cpus=0.25)
class DedupIndexShard:
    """One shard of the distributed seen-set: holds the md5 digests whose
    hash prefix routes here. ``num_cpus=0.25`` — shards are memory-bound
    bookkeepers; reserving full cores would starve the processing tasks
    (the op_resource lesson from the extraction pipeline)."""

    def __init__(self):
        self._seen: set = set()

    def first_seen(self, hashes: list[bytes]) -> list[bool]:
        """For each digest, True iff this call is its first appearance
        (and mark it seen). Single-actor execution makes the
        check-and-add atomic per shard — no races within a shard, and
        cross-shard races cannot exist (a digest routes to exactly one
        shard)."""
        seen = self._seen
        out = []
        for h in hashes:
            if h in seen:
                out.append(False)
            else:
                seen.add(h)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)


class StreamingDeduper:
    """Exact first-seen dedup across an UNBOUNDED stream of datasets /
    batches, backed by ``num_shards`` :class:`DedupIndexShard` actors.
    The index persists across :meth:`run` calls — feeding a second
    corpus drops everything already ingested (the resume/incremental
    property a batch groupby cannot give without re-reading history).

    Scale posture: texts are hashed INSIDE the processing tasks (16-byte
    digests travel, texts never do), digests are grouped per shard and
    shipped as one call per (batch, shard), and the filtered batch
    streams on — output is written/consumed downstream, never collected
    here."""

    def __init__(self, *, num_shards: int = 8,
                 text_col: str = "text"):
        self._shards = [DedupIndexShard.remote() for _ in range(num_shards)]
        self._n = num_shards
        self._text_col = text_col

    def run(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """Filter ``ds`` to first-seen rows (against ALL data this
        deduper has ever seen). Lazy — consume the result to advance
        the index; concurrent consumption of two run() outputs
        interleaves arbitrarily but still keeps exactly one
        representative per distinct text."""
        shards = self._shards
        n = self._n
        text_col = self._text_col

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            digs = [hashlib.md5((t or "").encode("utf-8")).digest()
                    for t in batch[text_col]]
            by_shard: list[list[int]] = [[] for _ in range(n)]
            for i, d in enumerate(digs):
                by_shard[d[0] % n].append(i)
            keep = [False] * len(digs)
            # one RPC per shard, issued concurrently, then gathered
            refs = [shards[s].first_seen.remote([digs[i] for i in idx])
                    for s, idx in enumerate(by_shard) if idx]
            live = [idx for idx in by_shard if idx]
            for idx, mask in zip(live, ray.get(refs)):
                for i, m in zip(idx, mask):
                    keep[i] = m
            return batch[pd.Series(keep, index=batch.index)]

        return ds.map_batches(f, batch_format="pandas")

    def index_size(self) -> int:
        """Total distinct texts ingested so far (sums the shards)."""
        return sum(ray.get([s.size.remote() for s in self._shards]))

    def shutdown(self) -> None:
        for s in self._shards:
            ray.kill(s)
        self._shards = []
