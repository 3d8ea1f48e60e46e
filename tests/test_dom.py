"""DOM core unit tests (wtes_ray.dom)."""
import re

from wtes_ray.dom import Element, TextNode, parse_html


def test_basic_tree():
    root = parse_html("<div id='a'><p>hi</p><p>there</p></div>")
    div = root.find("div")
    assert div["id"] == "a"
    assert [p.text for p in div.find_all("p")] == ["hi", "there"]
    assert div.text == "hithere"


def test_class_matching():
    root = parse_html('<div class="basic-info cmn-clearfix">x</div>')
    pat = re.compile("basic-info cmn-clearfix")
    assert root.find(attrs={"class": pat}) is not None
    assert root.find(attrs={"class": re.compile("^.*title.*$")}) is None
    assert root.find(class_="basic-info") is not None


def test_siblings_and_next_element():
    root = parse_html("<table><caption>c</caption><tr><td>1</td><td>2</td></tr></table>")
    table = root.find("table")
    first = table.next_element
    assert first.name == "caption"
    tr = first.next_sibling
    assert tr.name == "tr"
    assert tr.previous_sibling is first
    # next of tr = first child (td)
    assert tr.next.name == "td"
    assert len(tr.contents) == 2


def test_extract_removes_node():
    root = parse_html("<div><script>x</script><p>keep</p></div>")
    for s in root.find_all("script"):
        s.extract()
    assert root.find("script") is None
    assert root.find("div").text == "keep"


def test_comments_dropped_and_charrefs():
    root = parse_html("<p><!-- hidden -->a&nbsp;b&amp;</p>")
    assert root.find("p").text == "a\xa0b&"


def test_void_elements_and_replace_br():
    root = parse_html("<dd>a<br>b</dd>")
    dd = root.find("dd")
    assert dd.text == "ab"
    for br in dd.find_all("br"):
        br.replace_with_text("/")
    assert dd.text == "a/b"


def test_stray_end_tag_tolerated():
    root = parse_html("<div><p>x</p></span></div><table><tr><td>y</td></tr></table>")
    assert root.find("table").find("td").text == "y"


def test_href_filter():
    root = parse_html('<p><a href="/x">l</a><a>n</a></p>')
    assert len(root.find_all("a")) == 2
    assert len(root.find_all("a", href=True)) == 1


def _tree_eq(a, b, path="root"):
    if type(a) is not type(b):
        return f"{path}: node type differs"
    if isinstance(a, TextNode):
        return None if a.data == b.data else f"{path}: text differs"
    if a.name != b.name or a.attrs != b.attrs:
        return f"{path}: tag/attrs differ ({a.name} vs {b.name})"
    if len(a.children) != len(b.children):
        return f"{path}<{a.name}>: child count differs"
    for i, (x, y) in enumerate(zip(a.children, b.children)):
        r = _tree_eq(x, y, f"{path}/{a.name}[{i}]")
        if r:
            return r
    return None


def test_fast_parser_matches_stdlib():
    """The fast regex tokenizer must build byte-identical trees to the
    stdlib html.parser reference path on generated documents."""
    from wtes_ray.dom import parse_html_stdlib
    from wtes_ray.gen import generate_document

    for i in range(40):
        d = generate_document(i, giant=(i == 11))
        html = "".join(s["text"] for s in d["spans"] if s["kind"] == "html")
        html = html.replace("\r", "").replace("\t", "").replace("\n", "")
        diff = _tree_eq(parse_html(html), parse_html_stdlib(html))
        assert diff is None, f"doc {i}: {diff}"


def test_fast_parser_edge_cases():
    from wtes_ray.dom import parse_html_stdlib

    cases = [
        "<script>if (a < b) { x(); }</script><p>t</p>",
        "<style>a>b{color:red}</style><p>t</p>",
        '<div data-x="1 &amp; 2">a &lt; b</div>',
        "<p>broken <b>bold</p>",
        "<table><tr><td colspan='2'>x</td></tr></table>",
        "<!DOCTYPE html><!-- c --><p>x</p>",
        "a < b and c > d",
        "<img src='x.png'/><br/>text",
        # unquoted attr values ending in '/' are NOT self-closing markers
        # (review finding: the '/' belongs to the value, as in stdlib)
        "<td><a href=/item/abc/>ZhangSan</a></td>",
        "<p><a href=/x/ class=link>t</a></p>",
    ]
    for html in cases:
        diff = _tree_eq(parse_html(html), parse_html_stdlib(html))
        assert diff is None, f"{html!r}: {diff}"


def test_unquoted_trailing_slash_href():
    root = parse_html("<td><a href=/item/abc/>ZhangSan</a></td>")
    a = root.find("a")
    assert a["href"] == "/item/abc/"
    assert a.text == "ZhangSan"     # text nested INSIDE the anchor


def test_drop_tags_unclosed_and_misnested():
    """Review finding: dropped elements must vanish even when unclosed at
    EOF or implicitly closed by an ancestor's end tag (the reference's
    post-parse extract() removes them regardless of well-formedness)."""
    D = frozenset({"article", "code", "script", "style"})
    r1 = parse_html("<div><article><table><tr><td>secret</td></tr></table>",
                    drop_tags=D)
    assert r1.find("article") is None and r1.find("table") is None
    r2 = parse_html("<b><article>leak</b></article>after", drop_tags=D)
    assert r2.find("article") is None
    assert "leak" not in r2.text and "after" in r2.text
    r3 = parse_html("<p>keep</p><script>var x;", drop_tags=D)
    assert r3.find("script") is None and r3.text == "keep"
