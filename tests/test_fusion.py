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
