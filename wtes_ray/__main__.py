"""CLI entry points — the reference's runnable surface (start.py headless
``main()``: crawl → extract → graph) re-expressed as batch commands.

    python -m wtes_ray gen --n-docs 1000 --out /tmp/docs.parquet
    python -m wtes_ray extract --input /tmp/docs.parquet --out /tmp/ext [--resume]
    python -m wtes_ray graph --input /tmp/docs.parquet --out /tmp/kg [--resume]
    python -m wtes_ray docx2parquet --input a.docx b.docx --out /tmp/docs.parquet
    python -m wtes_ray pdf2parquet --input dir_or_files --out /tmp/docs.parquet
    python -m wtes_ray report --graph-dir /tmp/kg [--out report.json]

Owns its Ray session (CLI scripts and bench.py are the only Ray owners —
driver contract)."""

from __future__ import annotations

import argparse
import json
import os
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

    d = sub.add_parser("docx2parquet",
                       help="adapt .docx table docs into the (doc_id, "
                            "spans) input table (S12)")
    d.add_argument("--input", nargs="+", required=True)
    d.add_argument("--out", required=True)

    pf = sub.add_parser("pdf2parquet",
                        help="adapt PDF docs into the (doc_id, spans) "
                             "input table (stdlib reader, quarantines "
                             "unparseable files)")
    pf.add_argument("--input", nargs="+", required=True,
                    help="PDF files and/or directories")
    pf.add_argument("--out", required=True)

    c = sub.add_parser("compact",
                       help="coalesce a checkpoint's small shard files "
                            "in place (manifest-swap, crash-safe)")
    c.add_argument("--dir", required=True)
    c.add_argument("--target-rows-per-file", type=int, default=100_000)

    r = sub.add_parser("report", help="knowledge-graph summary report "
                                      "(S13 re-expressed)")
    r.add_argument("--graph-dir", required=True)
    r.add_argument("--out", default=None)
    r.add_argument("--top-k", type=int, default=20)

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
        elif args.cmd == "compact":
            from .pipeline import compact_checkpoint

            print(json.dumps(compact_checkpoint(
                args.dir,
                target_rows_per_file=args.target_rows_per_file)))
        elif args.cmd == "docx2parquet":
            import pyarrow as pa
            import pyarrow.parquet as pq

            from .docx_io import docx_to_spans_row
            from .schema import SPAN_STRUCT

            seen: dict[str, str] = {}
            for f in args.input:
                base = os.path.basename(f)
                if base in seen:
                    raise SystemExit(
                        f"duplicate doc_id {base!r} from inputs "
                        f"{seen[base]!r} and {f!r} — doc ids derive from "
                        f"file basenames; rename or pass distinct names")
                seen[base] = f
            rows = [docx_to_spans_row(f) for f in args.input]
            table = pa.table({
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
                "spans": pa.array([r["spans"] for r in rows],
                                  pa.list_(SPAN_STRUCT))})
            pq.write_table(table, args.out)
            print(json.dumps({"ok": True, "n_docs": len(rows),
                              "out": args.out}))
        elif args.cmd == "pdf2parquet":
            from .pdf_io import pdf_dataset

            ds = pdf_dataset(args.input)
            ds.write_parquet(args.out)
            n_err = ds.filter(
                lambda r: r["error"] != "").count()
            print(json.dumps({"ok": True, "n_docs": ds.count(),
                              "n_quarantined": n_err, "out": args.out}))
        elif args.cmd == "report":
            from .report import graph_report

            rep = graph_report(args.graph_dir, top_k=args.top_k)
            if args.out:
                with open(args.out, "w", encoding="utf-8") as f:
                    json.dump(rep, f, ensure_ascii=False)
            print(json.dumps(rep, ensure_ascii=False))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
