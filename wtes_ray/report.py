"""Debug/report sinks: S10 (Tag→HTML debug file) and S13 (ER chart) —
the reference's pyecharts dependency re-expressed as dependency-free
artifacts over the same data.

  - :func:`write_tag_to_html` — FileIO.py:84-106 ``writeTag2Html``: wrap a
    DOM node's markup in the reference's exact HTML shell (same doctype /
    head / ``<table data-sort=...>`` wrapper).
  - :func:`er_to_chart` — tableExtractor.py:540-643 ``writeER2Chart``'s
    node/link construction with the SAME dedup semantics: a url already in
    the url→name map is skipped, duplicate names are skipped, node value =
    the props dumped as ``key:value`` lines, links carry the relation name.
    Returns plain dicts (the pyecharts Graph object replaced by data).
  - :func:`write_er_chart_html` — renders that data as a standalone static
    HTML page (no JS library; node/edge tables + embedded JSON for any
    downstream chart tool).
  - :func:`graph_report` — batch analog over the knowledge-graph parquet
    (nodes/edges written by ``pipeline.build_knowledge_graph``): counts,
    relation histogram and top-degree entities computed as Ray aggregates
    (the parquet can be huge; only the k-row report reaches the driver).
"""

from __future__ import annotations

import html
import json
import os

import ray.data
from ray.data.aggregate import Count

_SHELL_HEAD = """<!DOCTYPE html>
            <html lang="en">
            <head>
                <meta charset="UTF-8">
                <title>Title</title>
            </head>
            <body>
            <table data-sort="sortDisabled" log-set-param="table_view">"""
_SHELL_TAIL = """</table>
            </body>
            </html>
                            """


def write_tag_to_html(filepath: str, node) -> None:
    """S10: write one DOM node into the reference's debug-HTML shell
    (FileIO.py:84-106 — ``str(tag)`` between fixed prologue/epilogue)."""
    from .dom import Element
    markup = node.markup() if isinstance(node, Element) else str(node)
    with open(filepath, mode="w+", encoding="utf-8") as f:
        f.write(_SHELL_HEAD)
        f.write(markup)
        f.write(_SHELL_TAIL)


def _dump_props(props: dict) -> str:
    # tableExtractor.py:559-563 dumpDict: "key:value\n" lines
    return "".join(f"{k}:{v}\n" for k, v in props.items())


def er_to_chart(entities: list, relations: list,
                url2name: dict | None = None) -> dict:
    """writeER2Chart's node/link data (tableExtractor.py:550-643).

    ``entities``: [[name, url], {props}] pairs; ``relations``:
    [[s_name, s_url], rel, [o_name, o_url]] triples — the extractor's
    native shapes."""
    if url2name is None:
        url2name = {}
    names = set()
    nodes = []
    for ent in entities:
        (name, url), props = ent[0], ent[1]
        if len(url.strip()) != 0 and url in url2name:
            continue
        if name in names:
            continue
        names.add(name)
        nodes.append({"name": name, "symbol_size": 30,
                      "value": [_dump_props(dict(props))]})
        url2name[url] = name
    links = []
    # changeRList2linkList (tableExtractor.py:585-609): endpoints whose url
    # was already seen are canonicalized through url2name, so links attach
    # to the deduped node; then url→name is recorded unconditionally (the
    # reference records even blank urls — reproduced exactly).
    for (s_name, s_url), rel, (o_name, o_url) in relations:
        s_name, o_name = str(s_name), str(o_name)
        s_url, o_url = str(s_url), str(o_url)
        if len(s_url.strip()) != 0 and s_url in url2name:
            s_name = url2name[s_url]
        if len(o_url.strip()) != 0 and o_url in url2name:
            o_name = url2name[o_url]
        links.append({"source": s_name, "target": o_name,
                      "value": str(rel)})
        url2name[s_url] = s_name
        url2name[o_url] = o_name
    return {"nodes": nodes, "links": links}


def write_er_chart_html(entities: list, relations: list, filepath: str,
                        title: str = "") -> dict:
    """S13: the ER relationship chart as a standalone HTML page (tables +
    embedded JSON; no charting library in this environment). Returns the
    chart data for callers/tests."""
    data = er_to_chart(entities, relations)
    esc = html.escape
    node_rows = "".join(
        f"<tr><td>{esc(n['name'])}</td>"
        f"<td><pre>{esc(n['value'][0])}</pre></td></tr>"
        for n in data["nodes"])
    link_rows = "".join(
        f"<tr><td>{esc(l['source'])}</td><td>{esc(l['value'])}</td>"
        f"<td>{esc(l['target'])}</td></tr>" for l in data["links"])
    page = (
        "<!DOCTYPE html><html><head><meta charset='UTF-8'>"
        f"<title>{esc(title)}</title></head><body>"
        f"<h1>{esc(title)}</h1>"
        f"<h2>Entities ({len(data['nodes'])})</h2>"
        f"<table border='1'><tr><th>name</th><th>props</th></tr>"
        f"{node_rows}</table>"
        f"<h2>Relations ({len(data['links'])})</h2>"
        f"<table border='1'><tr><th>subject</th><th>relation</th>"
        f"<th>object</th></tr>{link_rows}</table>"
        "<script type='application/json' id='er-data'>"
        f"{json.dumps(data, ensure_ascii=False)}</script>"
        "</body></html>")
    with open(filepath, "w", encoding="utf-8") as f:
        f.write(page)
    return data


def graph_report(out_dir: str, top_k: int = 20) -> dict:
    """Summary report over the knowledge-graph parquet under ``out_dir``
    ({nodes,edges} from build_knowledge_graph): totals, relation-type
    histogram, top-degree subjects. All aggregation is distributed; only
    ≤(top_k + #relation types) rows reach the driver."""
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    # an all-empty graph writes no parquet files (Ray skips empty blocks)
    n_nodes = (ray.data.read_parquet(nodes_dir, columns=["name"]).count()
               if os.path.isdir(nodes_dir) else 0)
    if not os.path.isdir(edges_dir):
        return {"n_nodes": int(n_nodes), "n_edges": 0,
                "relation_histogram": {}, "top_degree": []}
    edges = ray.data.read_parquet(edges_dir, columns=["s_name", "rel"])
    rel_hist = edges.groupby("rel").aggregate(
        Count(alias_name="n")).to_pandas()
    degree = ray.data.read_parquet(edges_dir, columns=["s_name"]) \
        .groupby("s_name").aggregate(Count(alias_name="degree"))

    def local_topk(df):
        return df.sort_values(["degree", "s_name"],
                              ascending=[False, True]).head(top_k)

    top = local_topk(degree.map_batches(
        local_topk, batch_format="pandas").to_pandas())
    return {
        "n_nodes": int(n_nodes),
        "n_edges": int(rel_hist["n"].sum()) if len(rel_hist) else 0,
        "relation_histogram": dict(zip(rel_hist.get("rel", []),
                                       [int(x) for x in
                                        rel_hist.get("n", [])])),
        "top_degree": [(r.s_name, int(r.degree))
                       for r in top.itertuples(index=False)],
    }
