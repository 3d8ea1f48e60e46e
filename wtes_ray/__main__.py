"""CLI entry points — the reference's runnable surface (start.py headless
``main()``: crawl → extract → graph) re-expressed as batch commands.

    python -m wtes_ray gen --n-docs 1000 --out /tmp/docs.parquet
    python -m wtes_ray extract --input /tmp/docs.parquet --out /tmp/ext [--resume]
    python -m wtes_ray graph --input /tmp/docs.parquet --out /tmp/kg [--resume]

Owns its Ray session (CLI scripts and bench.py are the only Ray owners —
driver contract)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="wtes_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate deterministic synthetic docs")
    g.add_argument("--n-docs", type=int, required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--giant-fraction", type=float, default=0.02)

    e = sub.add_parser("extract", help="run the extraction pipeline")
    e.add_argument("--input", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--num-partitions", type=int, default=64)
    e.add_argument("--resume", action="store_true")

    k = sub.add_parser("graph", help="extract + dedup triples + fuse nodes")
    k.add_argument("--input", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--num-partitions", type=int, default=64)
    k.add_argument("--resume", action="store_true")

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "gen":
            from .pipeline import generate_documents_ray

            generate_documents_ray(args.n_docs, args.out, seed=args.seed,
                                   giant_fraction=args.giant_fraction)
            print(json.dumps({"ok": True, "n_docs": args.n_docs,
                              "out": args.out}))
        elif args.cmd == "extract":
            from .pipeline import run_extract_pipeline

            summary = run_extract_pipeline(
                args.input, args.out, num_partitions=args.num_partitions,
                resume=args.resume)
            print(json.dumps(summary))
        elif args.cmd == "graph":
            from .pipeline import build_knowledge_graph

            summary = build_knowledge_graph(
                args.input, args.out, num_partitions=args.num_partitions,
                resume=args.resume)
            print(json.dumps(summary))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
