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
