"""Table model tests (wtes_ray.tablemodel — reference table.py)."""
from wtes_ray.lexicons import DEFAULT_LEXICONS
from wtes_ray.tablemodel import (CAPTION_REL, ENTITY_REL, OTHER, PERSON_INFO,
                                 PROPERTY_REL, Cell, Table)


def grid(rows, tag_name=None):
    return Table([[Cell(str(c), tag_name=tag_name) for c in r] for r in rows])


def test_normal_and_correct():
    t = grid([["a", "b"], ["c", "d"]])
    assert t.is_normal() and t.is_correct()
    t1 = grid([["a", "b", "c"]])
    assert not t1.is_normal()
    ragged = Table([[Cell("a"), Cell("b")], [Cell("c")]])
    assert not ragged.is_correct()


def test_extend_rowspan():
    t = Table([
        [Cell("A", rowspan=2), Cell("B")],
        [Cell("C")],
    ])
    t.extend_table()
    assert [[c.content for c in r] for r in t.rows] == [["A", "B"], ["A", "C"]]
    assert t.is_correct()


def test_extend_colspan():
    t = Table([
        [Cell("H", colspan=2)],
        [Cell("a"), Cell("b")],
    ])
    t.extend_table()
    assert [[c.content for c in r] for r in t.rows] == [["H", "H"], ["a", "b"]]


def test_extend_clamps_overflow():
    t = Table([
        [Cell("A", rowspan=99), Cell("B")],
        [Cell("C"), Cell("D")],
    ])
    t.extend_table()
    assert t.row_number == 2 and t.col_number == 2


def test_flip():
    t = grid([["a", "b"], ["c", "d"], ["e", "f"]])
    t.unfold_direction = "COL"
    f = t.flip()
    assert [[c.content for c in r] for r in f.rows] == [
        ["a", "c", "e"], ["b", "d", "f"]]
    assert f.unfold_direction == "ROW"


def test_direction_by_th_row():
    t = Table([
        [Cell("姓名", tag_name="th"), Cell("职业", tag_name="th")],
        [Cell("孔丘", tag_name="td"), Cell("思想家", tag_name="td")],
    ])
    assert t.get_unfold_direction() == "ROW"


def test_direction_by_th_col():
    t = Table([
        [Cell("姓名", tag_name="th"), Cell("孔丘", tag_name="td")],
        [Cell("职业", tag_name="th"), Cell("思想家", tag_name="td")],
    ])
    assert t.get_unfold_direction() == "COL"


def test_direction_by_score():
    # col 0 homogeneous Chinese, rows mixed types → ROW unfolds (header row 0)
    t = Table([
        [Cell("名称"), Cell("数量")],
        [Cell("甲"), Cell("1")],
        [Cell("乙"), Cell("2")],
        [Cell("丙"), Cell("3")],
    ])
    assert t.get_unfold_direction() in ("ROW", "COL")  # deterministic value:
    assert t.get_unfold_direction() == t.get_unfold_direction()


def test_property_line_num_quirk_always_one():
    t = Table([
        [Cell("h1", tag_name="th"), Cell("h2", tag_name="th")],
        [Cell("a"), Cell("b")],
    ])
    # reference quirk: cached 1 short-circuits (table.py:112, 541-542)
    assert t.discriminate_property_line_num("ROW") == 1


def test_property_line_num_tiers_when_cache_cleared():
    t = Table([
        [Cell("h1", tag_name="th"), Cell("h2", tag_name="th")],
        [Cell("h3", tag_name="th"), Cell("h4", tag_name="th")],
        [Cell("1"), Cell("2")],
    ])
    t.property_line_num = 0
    assert t.discriminate_property_line_num("ROW") == 2
    # tag tier finds 0 → type tier: leading all-character rows
    t2 = Table([
        [Cell("中文"), Cell("汉字")],
        [Cell("1"), Cell("2")],
    ])
    t2.property_line_num = 0
    assert t2.discriminate_property_line_num("ROW") == 1
    # all rows character-typed → type tier returns 0 → fallback 1
    t3 = grid([["中文", "汉字"], ["文字", "词语"]])
    t3.property_line_num = 0
    assert t3.discriminate_property_line_num("ROW") == 1


def test_clear_table_drops_index_col_and_refs_row():
    t = Table([
        [Cell("序号", tag_name="th"), Cell("姓名", tag_name="th")],
        [Cell("1"), Cell("孔丘")],
        [Cell("参考资料"), Cell("参考资料")],
    ])
    t.get_unfold_direction()
    t.clear_table()
    assert t.col_number == 1
    assert t.row_number == 2
    assert t.rows[1][0].content == "孔丘"


def test_clear_table_trailing_short_row():
    t = Table([
        [Cell("姓名", tag_name="th"), Cell("职业", tag_name="th")],
        [Cell("孔丘"), Cell("思想家")],
        [Cell("a"), Cell(" ")],
    ])
    t.get_unfold_direction()
    t.clear_table()
    assert t.row_number == 2


def test_clear_table_blanks_punct_cells():
    t = Table([
        [Cell("姓名", tag_name="th"), Cell("备注", tag_name="th")],
        [Cell("孔丘"), Cell("——！")],
    ])
    t.get_unfold_direction()
    t.clear_table()
    assert t.rows[1][1].content == ""


def test_table_type_person_info():
    t = Table([
        [Cell("本名"), Cell("别名")],
        [Cell("孔丘"), Cell("仲尼")],
    ])
    t.unfold_direction = "ROW"
    assert t.get_table_type() == PERSON_INFO


def test_table_type_person_info_by_overlap():
    t = Table([
        [Cell("国籍"), Cell("民族")],
        [Cell("中国"), Cell("汉族")],
    ])
    t.unfold_direction = "ROW"
    assert t.get_table_type() == PERSON_INFO  # 2/2 headers in lexicon ≥ 0.5


def test_table_type_property_rel():
    t = Table([
        [Cell("关系"), Cell("姓名")],
        [Cell("父亲"), Cell("赵弘殷")],
        [Cell("母亲"), Cell("杜氏")],
    ])
    t.unfold_direction = "ROW"
    assert t.get_table_type() == PROPERTY_REL


def test_table_type_caption_rel():
    t = Table([
        [Cell("头衔"), Cell("简介")],
        [Cell("x"), Cell("y")],
        [Cell("z"), Cell("w")],
    ], name="兄弟姐妹")
    t.unfold_direction = "ROW"
    assert t.get_table_type() == CAPTION_REL


def test_table_type_entity_rel_and_other():
    t = Table([
        [Cell("姓名"), Cell("成就")],
        [Cell("孔丘"), Cell("儒学")],
        [Cell("颜回"), Cell("德行")],
    ])
    t.unfold_direction = "ROW"
    assert t.get_table_type() == ENTITY_REL
    t2 = Table([
        [Cell("数量"), Cell("单位")],
        [Cell("1"), Cell("个")],
        [Cell("2"), Cell("只")],
    ])
    t2.unfold_direction = "ROW"
    assert t2.get_table_type() == OTHER


def test_extract_entity_records():
    t = Table([
        [Cell("姓名"), Cell("职业"), Cell("朝代")],
        [Cell("孔丘", href={"孔丘": "u1"}), Cell("思想家"), Cell("春秋")],
        [Cell("颜回"), Cell(""), Cell("春秋")],
    ])
    t.unfold_direction = "ROW"
    t.href_map["颜回"] = "u2"
    ents = t.extract_entity()
    assert ents == [
        [["孔丘", "u1"], {"职业": "思想家", "朝代": "春秋"}],
        [["颜回", "u2"], {"朝代": "春秋"}],   # empty cell filtered
    ]


def test_extract_property_relationship():
    t = Table([
        [Cell("关系"), Cell("姓名"), Cell("朝代")],
        [Cell("父亲"), Cell("赵弘殷", href={"赵弘殷": "u2"}), Cell("五代")],
        [Cell("母亲"), Cell("杜氏"), Cell("五代")],
    ])
    t.unfold_direction = "ROW"
    t.prefix = "赵匡胤"
    t.href_map["赵匡胤"] = "u1"
    rels = t.extract_property_relationship()
    assert rels == [
        [["赵匡胤", "u1"], "父亲", ["赵弘殷", "u2"]],
        [["赵匡胤", "u1"], "母亲", ["杜氏", ""]],
    ]
    # the relation column was deleted (mutating, reference order)
    assert t.col_number == 2


def test_extract_caption_relationship():
    t = Table([
        [Cell("姓名"), Cell("简介")],
        [Cell("赵匡济", href={"赵匡济": "u3"}), Cell("长兄")],
        [Cell("赵匡义"), Cell("弟")],
    ], name="兄弟姐妹")
    t.unfold_direction = "ROW"
    t.prefix = "赵匡胤"
    t.href_map["赵匡胤"] = "u1"
    rels = t.extract_caption_relationship()
    assert rels == [
        [["赵匡胤", "u1"], "兄弟姐妹", ["赵匡济", "u3"]],
        [["赵匡胤", "u1"], "兄弟姐妹", ["赵匡义", ""]],
    ]


def test_caption_rel_fallback_no_person_col():
    # >half headers kin words, no person column → row-1 objects, header rels
    t = Table([
        [Cell("长兄"), Cell("弟")],
        [Cell("赵匡济", href={"赵匡济": "u3"}), Cell("赵匡义")],
    ], name="家族成员")
    t.unfold_direction = "ROW"
    t.prefix = "赵匡胤"
    rels = t.extract_caption_relationship()
    assert rels == [
        [["赵匡胤", ""], "长兄", ["赵匡济", "u3"]],
        [["赵匡胤", ""], "弟", ["赵匡义", ""]],
    ]


def test_extract_entity_triples_mode():
    t = Table([
        [Cell("姓名"), Cell("职业")],
        [Cell("孔丘"), Cell("思想家")],
    ])
    t.unfold_direction = "ROW"
    triples = t.extract_entity_triples()
    assert triples == [["孔丘", "职业", "思想家"]]
