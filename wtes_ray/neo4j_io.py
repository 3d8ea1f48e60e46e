"""Neo4j bulk-import export adapter.

The reference keeps a LIVE Neo4j connection and creates person nodes /
relationships record-at-a-time (reference: src/spider/peronGraph.py:33-139
``makeNode``/``makeRelation`` via py2neo). A batch engine's correct
counterpart is the artifact Neo4j's own bulk loader ingests:
``neo4j-admin database import`` CSV shards with separate header files.
This module renders the repo's NODES / RELATIONS datasets
(wtes_ray/schema.py) into that layout:

    out_dir/
      nodes.header.csv           url:ID,name,props:string,n_sources:long,:LABEL
      nodes/*.csv                data shards, no header (distributed write)
      relationships.header.csv   :START_ID,:END_ID,:TYPE,doc_id
      relationships/*.csv        data shards, no header
      import.sh                  the neo4j-admin invocation

Scale shape: the CSV shards are written by ``Dataset.write_csv`` — one
file per block, never driver-materialized. The only exchange is the
endpoint-closure groupby (below), keyed by node id over the node+endpoint
set (fused-node-sized, ≪ corpus).

Semantics carried over from the reference (and from report.er_to_chart's
parity with changeTig2linkList):
  - node identity is the URL when present, else a ``name:<name>``
    synthetic id (the reference's url2NameDict first-seen convention);
  - every relationship endpoint EXISTS as a node: endpoints missing from
    the fused node set are synthesized as property-less stub nodes
    (neo4j-admin otherwise rejects the relationship) — first-seen name
    wins deterministically (min name per id);
  - the relationship TYPE is the extracted ``rel`` string, ``doc_id``
    kept as provenance property.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import ray.data

NODES_HEADER = "url:ID,name,props:string,n_sources:long,:LABEL"
RELS_HEADER = ":START_ID,:END_ID,:TYPE,doc_id"

_IMPORT_SH = """#!/bin/sh
# neo4j-admin bulk import for the export in this directory
neo4j-admin database import full \\
  --delimiter=',' --quote='"' \\
  --nodes={label}=nodes.header.csv,nodes/ \\
  --relationships=relationships.header.csv,relationships/ \\
  neo4j
"""


def _nid(url: str | None, name: str | None) -> str:
    """Node id: the URL when present (the reference's identity key), else
    a deterministic name-derived synthetic id."""
    u = url or ""
    return u if u else f"name:{name or ''}"


def _no_header_args():
    from pyarrow import csv as pacsv
    return {"write_options": pacsv.WriteOptions(include_header=False)}


def export_neo4j_admin(nodes: ray.data.Dataset, edges: ray.data.Dataset,
                       out_dir: str, *, label: str = "Entity",
                       num_buckets: int = 32) -> dict:
    """Write the neo4j-admin import layout for (NODES, RELATIONS) datasets.

    Returns a manifest dict: ``{"nodes": n, "relationships": m,
    "out_dir": ..., "import_cmd": ...}``. Both datasets are materialized
    here — they are extraction OUTPUTS (fused nodes / deduped triples),
    orders of magnitude below the corpus, and the counts are part of the
    export contract."""
    from .ops.dedup import _arrow, _grouped_exchange

    os.makedirs(out_dir, exist_ok=True)
    # Materialize up front (per the contract above). Also load-bearing:
    # both inputs usually hang off the SAME lazy extraction DAG, and a
    # union of two un-materialized branches sharing one upstream source
    # stalls Ray 2.49's streaming executor (observed: the closure-exchange
    # plan makes no progress after 20 s). Flattening each side to an
    # InputDataBuffer sidesteps it and costs nothing extra — both are
    # consumed twice below (union + count / rel_rows + count) anyway.
    nodes = nodes.materialize()
    edges = edges.materialize()

    def node_rows(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _arrow(pd.DataFrame({
            "id": [_nid(u, n) for u, n in zip(df["url"], df["name"])],
            "name": df["name"].fillna(""),
            "props": [json.dumps(dict(sorted(dict(m).items())),
                                 ensure_ascii=False, sort_keys=True)
                      for m in df["props"]],
            "n_sources": df["n_sources"].astype("int64"),
            "real": 1}))

    def stub_rows(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ids = [_nid(u, n) for u, n in zip(df["s_url"], df["s_name"])] + \
              [_nid(u, n) for u, n in zip(df["o_url"], df["o_name"])]
        names = pd.concat([df["s_name"], df["o_name"]],
                          ignore_index=True).fillna("")
        out = pd.DataFrame({"id": ids, "name": names, "props": "{}",
                            "n_sources": 0, "real": 0})
        # per-batch pre-dedup: endpoints repeat heavily within a batch
        return _arrow(out.sort_values(["id", "name"])
                      .drop_duplicates("id"))

    tagged = nodes.map_batches(node_rows, batch_format="pyarrow").union(
        edges.map_batches(stub_rows, batch_format="pyarrow"))

    def resolve(g: pd.DataFrame) -> pa.Table:
        # per node id: the real fused node wins; else the min-name stub
        g = g.sort_values(["id", "real", "name"],
                          ascending=[True, False, True])
        out = g.drop_duplicates("id").copy()
        out[":LABEL"] = label
        return _arrow(out[["id", "name", "props", "n_sources", ":LABEL"]])

    resolved = _grouped_exchange(tagged, "id", resolve,
                                 num_buckets=num_buckets).materialize()

    nodes_dir = os.path.join(out_dir, "nodes")
    rels_dir = os.path.join(out_dir, "relationships")
    resolved.write_csv(nodes_dir, arrow_csv_args_fn=_no_header_args)

    def rel_rows(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _arrow(pd.DataFrame({
            "start": [_nid(u, n) for u, n in zip(df["s_url"],
                                                 df["s_name"])],
            "end": [_nid(u, n) for u, n in zip(df["o_url"], df["o_name"])],
            "type": df["rel"].fillna(""),
            "doc_id": df["doc_id"].fillna("")}))

    edges.map_batches(rel_rows, batch_format="pyarrow").write_csv(
        rels_dir, arrow_csv_args_fn=_no_header_args)

    with open(os.path.join(out_dir, "nodes.header.csv"), "w",
              encoding="utf-8") as f:
        f.write(NODES_HEADER + "\n")
    with open(os.path.join(out_dir, "relationships.header.csv"), "w",
              encoding="utf-8") as f:
        f.write(RELS_HEADER + "\n")
    cmd = _IMPORT_SH.format(label=label)
    with open(os.path.join(out_dir, "import.sh"), "w",
              encoding="utf-8") as f:
        f.write(cmd)

    return {"nodes": resolved.count(), "relationships": edges.count(),
            "out_dir": out_dir, "import_cmd": cmd}


def read_export_csv(data_dir: str, header_file: str) -> pd.DataFrame:
    """Read an exported shard directory back using its header file — the
    round-trip used by tests and the count-pinning query."""
    with open(header_file, encoding="utf-8") as f:
        cols = f.read().strip().split(",")
    frames = [pd.read_csv(os.path.join(data_dir, p), names=cols,
                          header=None, dtype=str, keep_default_na=False)
              for p in sorted(os.listdir(data_dir))
              if p.endswith(".csv")]
    frames = [f for f in frames if len(f)]
    if not frames:
        return pd.DataFrame(columns=cols)
    return pd.concat(frames, ignore_index=True)
