"""String cleaner tests (wtes_ray.cleaners — reference table.py:21-79)."""
from wtes_ray.cleaners import (append_entity_triple, append_relation,
                               clean_cell_text, clean_person_name,
                               clear_name_or_rel)


def test_clear_name_or_rel_brackets_and_punct():
    assert clear_name_or_rel("赵匡胤（宋太祖）") == "赵匡胤"
    assert clear_name_or_rel("李渊[1]") == "李渊"
    assert clear_name_or_rel("张三【注】") == "张三"
    assert clear_name_or_rel("名 字！") == "名字"
    assert clear_name_or_rel("") == ""
    assert clear_name_or_rel("   ") == ""


def test_clean_cell_text():
    assert clean_cell_text("孔子[12]") == "孔子"
    assert clean_cell_text("孔\xa0子") == "孔子"
    assert clean_cell_text("[abc]") == "[abc]"  # only numeric refs stripped


def test_clean_person_name_slash_split():
    assert clean_person_name("香孩儿/赵玄郎") == "香孩儿"
    assert clean_person_name("（注）李四/x") == "李四"


def test_append_relation_guards():
    acc = []
    append_relation(acc, ["赵匡胤", "u1"], "父亲", ["赵弘殷", "u2"])
    assert acc == [[["赵匡胤", "u1"], "父亲", ["赵弘殷", "u2"]]]
    # relation longer than 7 chars after cleaning → dropped
    acc = []
    append_relation(acc, ["a", ""], "很长很长很长很长的关系", ["b", ""])
    assert acc == []
    # empty side → dropped
    acc = []
    append_relation(acc, ["", ""], "父亲", ["b", ""])
    assert acc == []


def test_append_entity_triple_guards():
    acc = []
    append_entity_triple(acc, "孔丘", "职业", "思想家")
    assert acc == [["孔丘", "职业", "思想家"]]
    # raw subject longer than 7 → dropped (pre-clean length check)
    acc = []
    append_entity_triple(acc, "一二三四五六七八", "职业", "x")
    assert acc == []
    # is_name object cleaned + length-limited
    acc = []
    append_entity_triple(acc, "a", "b", "名字（注释）", is_name=True)
    assert acc == [["a", "b", "名字"]]


def test_angle_brackets_not_stripped_in_person_paths():
    """The reference's _notNullAppend/__clearPersonNameList bracket regex
    contains an empty '||' alternation that makes the \\<.*?\\> branch
    unreachable — those paths NEVER strip <...> (while _clearNameOrRel
    does). Reproduced faithfully (ADVICE r1)."""
    from wtes_ray.cleaners import (append_entity_triple, clean_person_name,
                                   clear_name_or_rel)
    assert clean_person_name("张三<注>") == "张三<注>"
    assert clear_name_or_rel("张三<注>") == "张三"   # the no-|| variant strips
    acc = []
    append_entity_triple(acc, "张<三>", "字", "某值")
    assert acc == [["张<三>", "字", "某值"]]
