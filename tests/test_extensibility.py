"""User-extension surface (SURVEY §2.8): pluggable site rules and
classification lexicons, injected per run through actor constructor args."""
import json

import pytest

from wtes_ray.extract import extract_document
from wtes_ray.lexicons import DEFAULT_LEXICONS, Lexicons


def _doc(html):
    return [{"kind": "html", "text": html, "media_ref": "", "offset": 0}]


def test_custom_site_rule_changes_basic_info_locator():
    html = ('<div class="info-card"><dl><dt>本名</dt><dd>孔丘</dd></dl>'
            "<dl><dt>国籍</dt><dd>鲁国</dd></dl></div>")
    # default rule (baike class) finds nothing
    r_default = extract_document("https://x/item/k/1", _doc(html))
    assert r_default.n_tables == 0
    # per-site override finds the box
    lex = Lexicons(site_rule=tuple(sorted({"class": "info-card"}.items())))
    r_custom = extract_document("https://x/item/k/1", _doc(html), lex)
    assert r_custom.n_tables == 1
    assert r_custom.entities and r_custom.entities[0][0][0] == "孔丘"


def test_custom_lexicon_changes_classification():
    html = ("<table><tr><th>队员</th><th>位置</th></tr>"
            "<tr><td>王平</td><td>前锋</td></tr>"
            "<tr><td>李刚</td><td>后卫</td></tr></table>")
    r_default = extract_document("https://x/item/team/1", _doc(html))
    # 队员 is not a person-name header by default → no entities
    assert r_default.entities == []
    lex = Lexicons(
        person_name_headers=DEFAULT_LEXICONS.person_name_headers + ("队员",),
        noun_lexicon=DEFAULT_LEXICONS.noun_lexicon + ("队员", "位置"))
    r_custom = extract_document("https://x/item/team/1", _doc(html), lex)
    names = [e[0][0] for e in r_custom.entities]
    assert names == ["王平", "李刚"]


def test_lexicons_from_json_roundtrip(tmp_path):
    path = tmp_path / "lex.json"
    path.write_text(json.dumps({
        "person_name_headers": ["队员"],
        "site_rule": {"class": "info-card"},
    }), encoding="utf-8")
    lex = Lexicons.from_json(str(path))
    assert lex.person_name_headers == ("队员",)
    assert lex.site_rule_dict == {"class": "info-card"}
    # unspecified fields keep defaults
    assert lex.caption_relationship == DEFAULT_LEXICONS.caption_relationship
