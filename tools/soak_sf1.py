#!/usr/bin/env python3
"""sf1 memory-envelope soak (VERDICT r4 #4).

Builds a 10× sf0.1 corpus ("sf1": 50k docs / 1M events / 6M lineitem /
20k embeddings — table replicas with offset keys, planted-dup heads
preserved) plus a 400k-doc extraction corpus (bench generator at
GRAFT_DOCS_MULT=80), then runs the extraction pipeline and the heaviest
query pipelines at 32 CPUs, recording per-op wall time, output rows, and
the Ray object-store / spill counters around each op. Output:
bench_runs/soak_sf1_r5.json.

Usage: python tools/soak_sf1.py [--out PATH]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/wtes_sf1"
REPLICAS = 10

# key columns to offset per replica so replicated rows stay distinct
OFFSETS = {
    "documents": {"doc_id": 10**9},
    "embeddings": {"vec_id": 10**9},
    "events": {"event_id": 10**9, "user_id": 10**7},
    "lineitem": {"l_orderkey": 10**9},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "customer": {"c_custkey": 10**7},
    "part": {},
    "supplier": {},
    "nation": {},
    "region": {},
}


def build_sf1() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    marker = os.path.join(SF1, "_COMPLETE")
    if os.path.exists(marker):
        return
    os.makedirs(SF1, exist_ok=True)
    for table, offs in OFFSETS.items():
        t = pq.read_table(os.path.join(SF01, f"{table}.parquet"))
        if not offs:                       # small dims: copy once
            pq.write_table(t, os.path.join(SF1, f"{table}.parquet"))
            continue
        parts = []
        for i in range(REPLICAS):
            r = t
            for col, step in offs.items():
                if i:
                    r = r.set_column(
                        r.schema.get_field_index(col), col,
                        pc.add(r.column(col), pa.scalar(i * step)))
            parts.append(r)
        pq.write_table(pa.concat_tables(parts),
                       os.path.join(SF1, f"{table}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")


def _spill_bytes() -> int:
    """Cumulative bytes under every Ray session's spill directory."""
    import glob
    total = 0
    for d in glob.glob("/tmp/ray/session_*/ray_spilled_objects*"):
        for root, _dirs, files in os.walk(d):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total


class MemSampler:
    """Background peak sampler: plasma lives in /dev/shm on Linux, spill
    under the session dir — both readable without the (absent) grpc
    memory API. ``peak()`` returns the max observed during the window."""

    def __init__(self, interval: float = 0.2):
        import threading
        self.interval = interval
        self.peak_shm = 0
        self.peak_spill = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        import shutil as sh
        while not self._stop.is_set():
            u = sh.disk_usage("/dev/shm")
            self.peak_shm = max(self.peak_shm, u.used)
            self.peak_spill = max(self.peak_spill, _spill_bytes())
            self._stop.wait(self.interval)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join()

    def peaks(self) -> dict:
        return {"peak_object_store_mib": round(self.peak_shm / 2**20, 1),
                "peak_spill_mib": round(self.peak_spill / 2**20, 1)}


def main() -> None:
    out_path = (sys.argv[sys.argv.index("--out") + 1]
                if "--out" in sys.argv
                else os.path.join(REPO, "bench_runs", "soak_sf1_r5.json"))
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    from wtes_ray.ops.runtime import quiet_empty_schema_warnings
    quiet_empty_schema_warnings()
    DataContext.get_current().enable_progress_bars = False

    build_sf1()

    results = {"sf": "sf1(10x sf0.1 replicas)", "num_cpus": 32, "ops": {}}

    # --- extraction at 400k docs (80x the sf0.1 documents table) ----------
    os.environ.setdefault("GRAFT_SF_DIR", SF01)
    import bench as B
    import pyarrow.parquet as pq
    n_base = pq.ParquetFile(
        os.path.join(SF01, "documents.parquet")).metadata.num_rows
    docs_path = B._prepare_input(SF01, 80 * n_base)
    from wtes_ray.pipeline import run_extract_pipeline
    t0 = time.time()
    with MemSampler() as ms:
        summary = run_extract_pipeline(docs_path, "/tmp/wtes_soak_out",
                                       num_partitions=256, batch_size=16)
    dt = time.time() - t0
    results["ops"]["extract_400k"] = {
        "sec": round(dt, 1),
        "n_docs": summary["n_docs"], "n_spans": summary["n_spans"],
        "n_errors": summary["n_errors"],
        "docs_per_sec": round(summary["n_docs"] / dt, 1),
        **ms.peaks()}

    # --- heaviest query pipelines over the sf1 tables ----------------------
    from wtes_ray.queries import REGISTRY
    heavy = ["pagerank_lineitem", "asof_purchase_click",
             "minhash_neardup_docs", "decontaminate_docs",
             "vocab_top_terms", "media_features", "bm25_topk_docs",
             "pack_docs_budget"]
    for name in heavy:
        fn, _sql = REGISTRY[name]
        t0 = time.time()
        with MemSampler() as ms:
            res = fn(SF1)
            n = res.count() if hasattr(res, "count") and not hasattr(
                res, "columns") else len(res)
        results["ops"][name] = {
            "sec": round(time.time() - t0, 1), "rows": int(n),
            **ms.peaks()}
        print(name, results["ops"][name]["sec"], "s", n, "rows",
              flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["ops"], indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
