"""Locator tests (wtes_ray.locate — reference tableExtractor.py)."""
from wtes_ray.lexicons import DEFAULT_LEXICONS
from wtes_ray.locate import (change_tag_to_table, extract_basic_info_tables,
                             extract_list_table, get_caption, html_pretreat,
                             through_heuristic_rule)
from wtes_ray.tablemodel import PERSON_INFO
from wtes_ray.wordtype import default_tagger

TAGGER = default_tagger()


def test_pretreat_removes_noise():
    root = html_pretreat(
        "<div>\n<script>x</script><style>s</style><!-- c -->"
        "<article>a</article><code>c</code><p>keep</p>\t</div>")
    assert root.text == "keep"


def test_basic_info_box():
    html = ('<div class="basic-info cmn-clearfix">'
            "<dl><dt>本名</dt><dd>孔丘[1]</dd></dl>"
            "<dl><dt>国籍</dt><dd>鲁国\xa0</dd></dl>"
            "<dl><dt>别名</dt><dd>仲尼<br/>孔子</dd></dl></div>")
    root = html_pretreat(html)
    tables = extract_basic_info_tables(root, None, "http://u/1")
    assert len(tables) == 1
    t = tables[0]
    assert t.unfold_direction == "COL"
    assert t.table_type == PERSON_INFO
    assert t.href_map == {"孔丘": "http://u/1"}
    assert [[c.content for c in r] for r in t.rows] == [
        ["本名", "孔丘"], ["国籍", "鲁国"], ["别名", "仲尼/孔子"]]


def test_basic_info_box_not_person():
    html = ('<div class="basic-info cmn-clearfix">'
            "<dl><dt>条目</dt><dd>燕明刀</dd></dl>"
            "<dl><dt>类型</dt><dd>刀币</dd></dl></div>")
    root = html_pretreat(html)
    tables = extract_basic_info_tables(root, None, "u")
    assert len(tables) == 1
    assert tables[0].table_type is None


def test_ul_list_table():
    html = ('<table><tr><td class="normal title-td">亲属成员</td></tr>'
            "<tr><td><ul>"
            "<li><span>▪</span><span>长子</span>"
            '<span><a href="/item/x">孔鲤</a></span></li>'
            "<li><span>▪</span><span>孙</span><span>孔伋</span></li>"
            "</ul></td></tr></table>")
    root = html_pretreat(html)
    tables = extract_list_table(root.find("table"))
    assert len(tables) == 1
    t = tables[0]
    assert t.name == "亲属成员"
    assert [[c.content for c in r] for r in t.rows] == [
        ["长子", "孔鲤"], ["孙", "孔伋"]]
    assert t.rows[0][1].href == {"孔鲤": "/item/x"}


def test_heuristic_accepts_normal_table():
    html = ("<table><tr><th>姓名</th><th>职业</th></tr>"
            "<tr><td>孔丘</td><td>思想家</td></tr></table>")
    tag = html_pretreat(html).find("table")
    assert through_heuristic_rule(tag, TAGGER)


def test_heuristic_rejects_link_farm():
    links = "".join(f'<a href="/x{i}">l{i}</a>' for i in range(30))
    html = (f"<table><tr><td>姓名{links}</td><td>a</td></tr>"
            "<tr><td>b</td><td>c</td></tr></table>")
    tag = html_pretreat(html).find("table")
    assert not through_heuristic_rule(tag, TAGGER)


def test_heuristic_rejects_no_nouns():
    html = ("<table><tr><td>123</td><td>456</td></tr>"
            "<tr><td>789</td><td>011</td></tr></table>")
    tag = html_pretreat(html).find("table")
    assert not through_heuristic_rule(tag, TAGGER)


def test_heuristic_rejects_single_row():
    html = "<table><tr><td>姓名</td><td>x</td></tr></table>"
    tag = html_pretreat(html).find("table")
    assert not through_heuristic_rule(tag, TAGGER)


def test_caption_from_caption_tag():
    html = ("<table><caption>兄弟姐妹</caption>"
            "<tr><td>a</td><td>b</td></tr></table>")
    tag = html_pretreat(html).find("table")
    assert get_caption(tag) == "兄弟姐妹"
    # caption element removed from the table (not counted as a row)
    assert tag.find("caption") is None


def test_caption_from_title_sibling():
    html = ('<div><div class="para-title"><span>主要弟子</span></div></div>'
            "<table><tr><td>a</td><td>b</td></tr></table>")
    root = html_pretreat(html)
    tag = root.find("table")
    assert get_caption(tag) == "主要弟子"


def test_caption_from_short_text_sibling():
    html = ("<div>历任官员</div>"
            "<table><tr><td>a</td><td>b</td></tr></table>")
    root = html_pretreat(html)
    assert get_caption(root.find("table")) == "历任官员"


def test_change_tag_to_table_spans_hrefs():
    html = ("<table><thead><tr><th>序号</th><th>姓名</th></tr></thead>"
            "<tbody><tr><td>1</td>"
            '<td rowspan="2"><a href="/item/k">孔丘[3]</a></td></tr>'
            "<tr><td>2</td></tr></tbody></table>")
    tag = html_pretreat(html).find("table")
    t = change_tag_to_table(tag, "名录")
    assert t.name == "名录"
    assert t.row_number == 3 and t.col_number == 2
    cell = t.rows[1][1]
    assert cell.content == "孔丘"            # [3] ref stripped
    assert cell.rowspan == 2
    # href keyed by RAW anchor text (table.py:1202) while content is
    # ref-stripped — faithful quirk: the later name→href lookup misses
    # when the citation sits inside the anchor
    assert cell.href == {"孔丘[3]": "https://baike.baidu.com/item/k"}
    assert t.rows[0][0].tag_name == "th"
    t.extend_table()
    assert [[c.content for c in r] for r in t.rows] == [
        ["序号", "姓名"], ["1", "孔丘"], ["2", "孔丘"]]


def test_caption_two_child_title_keeps_markup():
    """Reference getCaption assigns the RAW second child of a two-child
    title node and str()s it — a Tag yields MARKUP, not inner text
    (tableExtractor.py:470-471,500; ADVICE r1)."""
    from wtes_ray.dom import parse_html
    from wtes_ray.locate import get_caption
    root = parse_html(
        '<div><div><div class="big-title">前缀<span class="x">标题文字'
        "</span></div></div><table><tr><td>a</td></tr></table></div>")
    table = root.find("table")
    assert get_caption(table) == '<span class="x">标题文字</span>'


def test_register_site_rule_hook():
    """SURVEY §2.8 extension surface: a custom-class info box is invisible
    under the default rule and located after register_site_rule merges the
    new class pattern (new frozen instance; the default is untouched)."""
    from wtes_ray.extract import extract_document
    from wtes_ray.lexicons import DEFAULT_LEXICONS

    html = ('<div class="my-wiki-infobox">'
            "<dl><dt>本名</dt><dd>孔丘</dd></dl>"
            "<dl><dt>国籍</dt><dd>鲁国</dd></dl>"
            "<dl><dt>别名</dt><dd>仲尼</dd></dl></div>")
    spans = [{"kind": "html", "text": html, "media_ref": "", "offset": 0}]

    base = extract_document("http://u/item/x/1", spans)
    assert base.n_tables == 0

    lex = DEFAULT_LEXICONS.register_site_rule({"class": "my-wiki-infobox"})
    custom = extract_document("http://u/item/x/1", spans, lex=lex)
    assert custom.n_tables == 1
    # the default instance is untouched (frozen value object)
    assert DEFAULT_LEXICONS.site_rule_dict == {
        "class": "basic-info cmn-clearfix"}
