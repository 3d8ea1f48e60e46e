"""Streaming dedup (ops.stream) — sharded shared-index actors."""
import pandas as pd
import pytest

from wtes_ray.ops.stream import StreamingDeduper


@pytest.fixture()
def dup_corpus(ray_session):
    import ray.data

    rows = []
    for i in range(120):
        rows.append({"doc_id": i, "text": f"body {i % 40}"})   # 3× each
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(8), 40


def test_streaming_dedup_exactly_one_per_distinct_text(dup_corpus):
    ds, n_distinct = dup_corpus
    dd = StreamingDeduper(num_shards=4)
    try:
        out = dd.run(ds).to_pandas()
        assert len(out) == n_distinct
        assert sorted(out["text"].unique()) == sorted(
            f"body {i}" for i in range(n_distinct))
        assert dd.index_size() == n_distinct
    finally:
        dd.shutdown()


def test_streaming_dedup_is_incremental_across_runs(dup_corpus):
    """The shared index persists: a second pass over already-ingested
    data drops EVERYTHING — the streaming/resume property a stateless
    batch groupby cannot give."""
    ds, n_distinct = dup_corpus
    dd = StreamingDeduper(num_shards=3)
    try:
        first = dd.run(ds).to_pandas()
        assert len(first) == n_distinct
        second = dd.run(ds).to_pandas()
        assert len(second) == 0
        assert dd.index_size() == n_distinct

        # genuinely new texts still pass
        import ray.data
        extra = ray.data.from_pandas(pd.DataFrame(
            {"doc_id": [900, 901], "text": ["brand new", "body 0"]}))
        third = dd.run(extra).to_pandas()
        assert list(third["text"]) == ["brand new"]
    finally:
        dd.shutdown()


def test_streaming_dedup_null_and_empty_text(ray_session):
    import ray.data

    dd = StreamingDeduper(num_shards=2)
    try:
        ds = ray.data.from_pandas(pd.DataFrame(
            {"doc_id": [0, 1, 2, 3], "text": [None, "", None, "x"]}))
        out = dd.run(ds).to_pandas()
        # None and "" hash identically (both encode to b"") — one
        # representative survives for the pair, plus "x"
        assert len(out) == 2
    finally:
        dd.shutdown()
