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


# ---------------------------------------------------------------------------
# Hierarchical (salt-friendly) fusion — EXACTLY equivalent to the sequential
# fold above, derived from its structure:
#   - nodes[0] never changes once created, and every containment / empty-url
#     decision consults ONLY nodes[0];
#   - all entities sharing one url have the same fate (the exact-match
#     branch), decided by the FIRST of them vs nodes[0];
#   - first-wins prop merge = per-key "earliest entity wins", which is an
#     associative/commutative min over the entity order key.
# Therefore a name-group folds exactly from per-URL-CLASS summaries
# (url, first order key, count, per-prop-key earliest (order, value)) that
# can be computed in ANY partition of the entities — the scale path for a
# hot subject name. Equivalence is property-tested against
# ``fuse_entity_group`` (tests/test_fusion.py).
# ---------------------------------------------------------------------------

def class_partials(entities: list[dict]) -> list[dict]:
    """Per-(url class) partial summaries of a SUBSET of one name-group.
    Whitespace-only urls normalize to the "" class (the fold's empty
    branch stores url "" too). Partial dicts: subject, url, first_doc,
    first_seq, n, props = {key: (doc_id, seq, value)} (earliest wins)."""
    entities = sorted(entities, key=lambda e: (e["doc_id"], e["seq"]))
    by_url: dict[tuple, dict] = {}
    for ent in entities:
        url = ent["subject_url"] or ""
        if url.isspace():
            url = ""
        key = (ent["subject"], url)
        c = by_url.get(key)
        if c is None:
            c = by_url[key] = {"subject": ent["subject"], "url": url,
                               "first_doc": ent["doc_id"],
                               "first_seq": ent["seq"], "n": 0, "props": {}}
        c["n"] += 1
        for k, v in dict(ent["props"]).items():
            if k not in c["props"]:
                c["props"][k] = (ent["doc_id"], ent["seq"], v)
    return list(by_url.values())


def merge_class_partials(a: dict, b: dict) -> dict:
    """Combine two partials of the SAME (subject, url) class — associative,
    order-free (per-key earliest-entity-wins)."""
    first, second = ((a, b) if (a["first_doc"], a["first_seq"])
                     <= (b["first_doc"], b["first_seq"]) else (b, a))
    props = dict(first["props"])
    for k, ov in second["props"].items():
        if k not in props or (ov[0], ov[1]) < (props[k][0], props[k][1]):
            props[k] = ov
    return {"subject": a["subject"], "url": a["url"],
            "first_doc": first["first_doc"], "first_seq": first["first_seq"],
            "n": a["n"] + b["n"], "props": props}


def _strip_props(props: dict) -> dict:
    """Order-key props → plain dict, insertion-ordered like the fold."""
    items = sorted(props.items(), key=lambda kv: (kv[1][0], kv[1][1]))
    return {k: v for k, (_, __, v) in items}


def fuse_class_summaries(subject: str, classes: list[dict]) -> list[dict]:
    """Final fold over one name-group's complete url-class summaries;
    returns the same node dicts as ``fuse_entity_group``."""
    if not classes or subject.endswith("氏"):
        return []
    classes = sorted(classes,
                     key=lambda c: (c["first_doc"], c["first_seq"]))
    first = classes[0]
    if first["url"] == "":
        # url-less nodes[0]: absorbs every empty-url entity; every
        # url-carrying entity hits the reference's TypeError drop
        return [{"name": subject, "url": "",
                 "props": _strip_props(first["props"]),
                 "n_sources": first["n"]}]
    u0 = first["url"]
    absorbed = dict(first["props"])
    n0 = first["n"]
    others = []
    for c in classes[1:]:
        if c["url"] == "" or u0 in c["url"] or c["url"] in u0:
            n0 += c["n"]
            for k, ov in c["props"].items():
                if k not in absorbed or (ov[0], ov[1]) < (absorbed[k][0],
                                                          absorbed[k][1]):
                    absorbed[k] = ov
        else:
            others.append(c)
    nodes = [{"name": subject, "url": u0, "props": _strip_props(absorbed),
              "n_sources": n0}]
    nodes += [{"name": subject, "url": c["url"],
               "props": _strip_props(c["props"]), "n_sources": c["n"]}
              for c in others]
    return nodes
