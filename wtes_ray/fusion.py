"""Entity fusion: group-local first-wins merge with URL-containment matching.

Re-implements the reference's Neo4j node creation/fusion semantics
(/root/reference/src/knowledgeStorage/peronGraph.py:33-88) as a pure
function over one name-group, applied via
``entities.groupby("subject").map_groups(...)`` — the reference matches by
name first (peronGraph.py:62-64), so grouping by name keeps every possible
match group-local (SURVEY.md §2.4 J1).

Reference behaviors mirrored exactly:
  - property merge is FIRST-WINS: only missing keys are added
    (peronGraph.py:84-86 ``fusionNode``);
  - names ending in 氏 are never fused and never create a property node
    (peronGraph.py:49-52 — the matched-or-None node is "re-created", which
    stores nothing new);
  - an entity with an empty url fuses into the first node of its name or
    creates a url-less node (peronGraph.py:53-60);
  - an entity with a url fuses into the exact (name, url) node; else into the
    first same-name node iff the urls contain one another
    (``node['url'] in url or url in node['url']``, peronGraph.py:62-67);
    if that first node is url-less the reference raises TypeError inside its
    per-entity try block and DROPS the entity (peronGraph.py:66,74-75) —
    mirrored via the ``has_url`` flag;
  - else a new (name, url) node is created.

Determinism deviation (recorded): the reference processes entities in DB
insertion order; we sort each group by (doc_id, seq) so fusion output is
independent of task scheduling.

Second recorded deviation: after a URL-containment fusion the reference
``return``s out of the WHOLE per-page entity list (peronGraph.py:68 —
``self.fusionNode(...); return`` inside the loop), silently dropping every
remaining entity of that page. That is an orchestration bug (the loop
variable is shadowed by the early return), not fusion semantics; this
implementation continues processing the group, so later entities still
create/fuse nodes.
"""

from __future__ import annotations


def fuse_entity_group(entities: list[dict]) -> list[dict]:
    """Fuse one name-group of entity rows into nodes.

    ``entities``: dicts with keys doc_id, seq, subject, subject_url, props
    (props = dict). Returns node dicts: name, url, props, n_sources.
    """
    entities = sorted(entities, key=lambda e: (e["doc_id"], e["seq"]))
    nodes: list[dict] = []
    for ent in entities:
        name = ent["subject"]
        url = ent["subject_url"] or ""
        props = ent["props"]
        if name.endswith("氏"):
            # never fused, never creates a property node (peronGraph.py:49-52)
            continue
        if url == "" or url.isspace():
            if nodes:
                _fuse(nodes[0], props)
            else:
                nodes.append({"name": name, "url": "", "has_url": False,
                              "props": dict(props), "n_sources": 1})
            continue
        exact = next((n for n in nodes if n["has_url"] and n["url"] == url),
                     None)
        if exact is not None:
            _fuse(exact, props)
            continue
        if nodes:
            first = nodes[0]
            if not first["has_url"]:
                continue  # reference TypeError → entity dropped
            if first["url"] in url or url in first["url"]:
                _fuse(first, props)
                continue
        nodes.append({"name": name, "url": url, "has_url": True,
                      "props": dict(props), "n_sources": 1})
    for n in nodes:
        n.pop("has_url", None)
    return nodes


def _fuse(node: dict, props: dict) -> None:
    """First-wins property merge (peronGraph.py:77-88)."""
    for k, v in props.items():
        if k not in node["props"]:
            node["props"][k] = v
    node["n_sources"] += 1
