"""Entity fusion tests (wtes_ray.fusion — reference peronGraph.py:33-88)."""
from wtes_ray.fusion import fuse_entity_group


def ent(doc, seq, name, url, props):
    return {"doc_id": doc, "seq": seq, "subject": name, "subject_url": url,
            "props": props}


def test_first_wins_merge_on_exact_url():
    nodes = fuse_entity_group([
        ent("a", 0, "孔丘", "u1", {"职业": "思想家", "朝代": "春秋"}),
        ent("b", 0, "孔丘", "u1", {"职业": "教育家", "国籍": "鲁国"}),
    ])
    assert len(nodes) == 1
    assert nodes[0]["props"] == {"职业": "思想家", "朝代": "春秋",
                                 "国籍": "鲁国"}   # first writer wins
    assert nodes[0]["n_sources"] == 2


def test_url_containment_fuses():
    nodes = fuse_entity_group([
        ent("a", 0, "孔丘", "https://b/item/k", {"a": "1"}),
        ent("b", 0, "孔丘", "https://b/item/k/123", {"b": "2"}),
    ])
    assert len(nodes) == 1
    assert nodes[0]["props"] == {"a": "1", "b": "2"}


def test_disjoint_urls_create_two_nodes():
    nodes = fuse_entity_group([
        ent("a", 0, "张伟", "u/1", {"a": "1"}),
        ent("b", 0, "张伟", "v/2", {"b": "2"}),
    ])
    assert len(nodes) == 2


def test_shi_names_never_fuse():
    nodes = fuse_entity_group([
        ent("a", 0, "杜氏", "", {"a": "1"}),
        ent("b", 0, "杜氏", "", {"b": "2"}),
    ])
    assert nodes == []   # reference stores nothing for 氏 names


def test_empty_url_fuses_into_first():
    nodes = fuse_entity_group([
        ent("a", 0, "孔丘", "u1", {"a": "1"}),
        ent("b", 0, "孔丘", "", {"b": "2"}),
    ])
    assert len(nodes) == 1
    assert nodes[0]["url"] == "u1"
    assert nodes[0]["props"] == {"a": "1", "b": "2"}


def test_urlless_first_node_drops_urled_entity():
    # mirror of the reference TypeError path (peronGraph.py:66,74-75)
    nodes = fuse_entity_group([
        ent("a", 0, "孔丘", "", {"a": "1"}),
        ent("b", 0, "孔丘", "u1", {"b": "2"}),
    ])
    assert len(nodes) == 1
    assert nodes[0]["props"] == {"a": "1"}   # second entity dropped


def test_deterministic_order():
    e1 = ent("b", 0, "孔丘", "u1", {"k": "B"})
    e2 = ent("a", 0, "孔丘", "u1", {"k": "A"})
    assert fuse_entity_group([e1, e2]) == fuse_entity_group([e2, e1])
    assert fuse_entity_group([e1, e2])[0]["props"]["k"] == "A"  # doc order


# ---------------------------------------------------------------------------
# Hierarchical (class-summary) fusion: exact equivalence to the fold
# ---------------------------------------------------------------------------

def _via_classes(entities, n_parts=3):
    """Partition the group arbitrarily, build per-partition class partials,
    merge across partitions, final fold — the salted scale path."""
    from wtes_ray.fusion import (class_partials, fuse_class_summaries,
                                 merge_class_partials)
    parts = [entities[i::n_parts] for i in range(n_parts)]
    merged = {}
    for p in parts:
        for c in class_partials(p):
            key = (c["subject"], c["url"])
            merged[key] = (merge_class_partials(merged[key], c)
                           if key in merged else c)
    subject = entities[0]["subject"]
    return fuse_class_summaries(subject,
                                [c for c in merged.values()
                                 if c["subject"] == subject])


def _ent(i, subject, url, props):
    return {"doc_id": f"d{i:03d}", "seq": i, "subject": subject,
            "subject_url": url, "props": props}


def test_class_fusion_matches_fold_adversarial():
    from wtes_ray.fusion import fuse_entity_group

    # interleaved prop priority across classes + containment + empty urls —
    # the exact cases where naive class-then-class merging diverges
    cases = [
        # e1(U0 no props), e2(V contained, x=2), e3(U0, x=9): fold keeps x=2
        [_ent(0, "甲", "http://a/b", {}),
         _ent(1, "甲", "http://a", {"x": "2"}),
         _ent(2, "甲", "http://a/b", {"x": "9", "y": "3"})],
        # url-less first node drops every url entity
        [_ent(0, "乙", "", {"p": "1"}),
         _ent(1, "乙", "http://z", {"q": "2"}),
         _ent(2, "乙", "  ", {"r": "3"})],
        # empty-url entities merge into a url-ful first node
        [_ent(0, "丙", "http://n", {"a": "1"}),
         _ent(1, "丙", "", {"a": "0", "b": "2"}),
         _ent(2, "丙", "http://other", {"c": "3"}),
         _ent(3, "丙", "http://n", {"b": "9"})],
        # 氏 suffix: no nodes at all
        [_ent(0, "王氏", "http://n", {"a": "1"})],
    ]
    for ents in cases:
        want = fuse_entity_group(list(ents))
        for n_parts in (1, 2, 3):
            got = _via_classes(list(ents), n_parts)
            assert got == want, (ents, n_parts, got, want)


def test_class_fusion_matches_fold_randomized():
    import random

    from wtes_ray.fusion import fuse_entity_group

    rng = random.Random(7)
    urls = ["", "  ", "http://a", "http://a/b", "http://a/b/c",
            "http://x", "http://x/y", "http://q"]
    keys = ["k1", "k2", "k3", "k4"]
    for trial in range(60):
        n = rng.randint(1, 14)
        subject = rng.choice(["张三", "李氏"])
        ents = [_ent(i, subject, rng.choice(urls),
                     {k: f"v{trial}_{i}_{k}"
                      for k in rng.sample(keys, rng.randint(0, 3))})
                for i in range(n)]
        # fold mutates nothing but be safe: deep-ish copies per run
        import copy
        want = fuse_entity_group(copy.deepcopy(ents))
        got = _via_classes(copy.deepcopy(ents),
                           n_parts=rng.randint(1, 4))
        assert got == want, (trial, ents, got, want)
