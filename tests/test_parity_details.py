"""Parity tests for the reference's rarer code paths (file:line cites into
/root/reference)."""
from wtes_ray.extract import extract_document
from wtes_ray.locate import get_caption, html_pretreat
from wtes_ray.tablemodel import Cell, Table


def _doc(html):
    return [{"kind": "html", "text": html, "media_ref": "", "offset": 0}]


def test_property_rel_multiple_relation_columns():
    """table.py:853-856: when several headers match the relation lexicon,
    lower-priority columns are deleted and the HIGHEST-priority keyword's
    column supplies the relation."""
    t = Table([
        [Cell("称谓"), Cell("姓名"), Cell("辈分")],
        [Cell("父亲"), Cell("赵弘殷", href={"赵弘殷": "u2"}), Cell("长辈")],
        [Cell("母亲"), Cell("杜氏"), Cell("长辈")],
    ])
    t.unfold_direction = "ROW"
    t.prefix = "赵匡胤"
    t.href_map["赵匡胤"] = "u1"
    rels = t.extract_property_relationship()
    # lexicon order is (关系, 称谓, 辈分, …) → 称谓 outranks 辈分; the
    # 辈分 column is deleted, relations come from the 称谓 column
    assert rels == [
        [["赵匡胤", "u1"], "父亲", ["赵弘殷", "u2"]],
        [["赵匡胤", "u1"], "母亲", ["杜氏", ""]],
    ]
    assert t.col_number == 1   # both relation columns removed


def test_direction_word_type_tie_break():
    """table.py:347-354: when the 0.5·len + 0.5·type scores tie, the
    word-type variance decides (equal → ROW)."""
    # fully symmetric table → scores tie → word-type also ties → ROW
    t = Table([[Cell("甲"), Cell("乙")], [Cell("丙"), Cell("丁")]])
    assert t.get_unfold_direction() == "ROW"


def test_caption_two_element_title_and_prev2():
    """tableExtractor.py:469-470 + 487-497: a title div with TWO children
    takes contents[1]; the SECOND previous sibling can override."""
    html = ('<div><span class="sub-title"><b>图</b>主要弟子</span></div>'
            "<table><tr><td>a</td><td>b</td></tr></table>")
    root = html_pretreat(html)
    cap = get_caption(root.find("table"))
    assert cap == "主要弟子"   # contents[1] of the 2-child title

    html2 = ('<div><div class="para-title"><span>真正标题</span></div></div>'
             "<div>no-title-here-and-way-too-long-to-be-a-caption</div>"
             "<table><tr><td>a</td><td>b</td></tr></table>")
    root2 = html_pretreat(html2)
    cap2 = get_caption(root2.find("table"))
    assert cap2 == "真正标题"   # prev has no title and long text → prev2 wins


def test_ul_table_with_images():
    """tableExtractor.py:373-377: span-level img srcs collected into the
    cell and emitted as media spans."""
    html = ('<table><tr><td class="normal title-td">家族成员</td></tr>'
            "<tr><td><ul><li><span>▪</span><span>长子</span>"
            '<span><img src="img://kid.jpg"/>孔鲤</span></li>'
            "<li><span>▪</span><span>孙</span><span>孔伋</span></li>"
            "</ul></td></tr></table>")
    r = extract_document("https://x/item/%E5%AD%94%E5%AD%90/1", _doc(html))
    kinds = [(s[0], s[2]) for s in r.spans]
    assert ("media", "img://kid.jpg") in kinds


def test_person_info_record_shape_matches_reference_sample():
    """The 赵匡胤 basic-info fixture shape (file/json/entity.json): one
    entity [[name, url], {props}] with the subject url from the page."""
    html = ('<div class="basic-info cmn-clearfix">'
            "<dl><dt>本名</dt><dd>赵匡胤</dd></dl>"
            "<dl><dt>别名</dt><dd>香孩儿/赵玄郎</dd></dl>"
            "<dl><dt>所处时代</dt><dd>五代→北宋</dd></dl>"
            "<dl><dt>庙号</dt><dd>太祖[2]</dd></dl></div>")
    url = "https://baike.baidu.com/item/%E8%B5%B5%E5%8C%A1%E8%83%A4/61716"
    r = extract_document(url, _doc(html))
    assert len(r.entities) == 1
    (name, subj_url), props = r.entities[0]
    assert name == "赵匡胤"
    assert subj_url == url
    assert props["别名"] == "香孩儿/赵玄郎"
    assert props["庙号"] == "太祖"          # [2] citation stripped
    assert "本名" not in props              # person column removed


def test_index_number_column_quirk():
    """clearTable drops 序号/序 only when the header EQUALS it
    (table.py:1022-1023 membership, not containment)."""
    t = Table([
        [Cell("序号说明"), Cell("姓名")],
        [Cell("1"), Cell("孔丘")],
    ])
    t.unfold_direction = "ROW"
    t.clear_table()
    assert t.col_number == 2   # "序号说明" is NOT in {序号, 序} → kept