"""Lexicon tagger tests (wtes_ray.wordtype — replaces HanLP, SURVEY §7.0)."""
from wtes_ray.wordtype import default_tagger

T = default_tagger()


def test_segments_lexicon_nouns():
    toks = T.seg("姓名职业")
    assert toks == [("姓名", "n"), ("职业", "n")]


def test_longest_match_wins():
    # 中文名 must win over any shorter match starting at the same position
    toks = T.seg("中文名")
    assert toks[0] == ("中文名", "n")


def test_mixed_content_natures():
    toks = T.seg("序号12abc，")
    natures = [n for _, n in toks]
    assert natures == ["n", "m", "nx", "w"]


def test_has_noun_rule3():
    assert T.has_noun("姓名")
    assert T.has_noun("第一列是姓名的表")
    assert not T.has_noun("12345")
    assert not T.has_noun("abcdef")


def test_person_name_recognition():
    # single nr token ⇒ person (reference UrlExtractor.py:54-67 relevance 1.0)
    assert T.is_person_name("孔丘")
    assert not T.is_person_name("孔丘弟子")   # extra tokens
    assert not T.is_person_name("姓名")       # noun, not name


def test_word_type_sum_deterministic():
    assert T.word_type_sum("姓名") == T.word_type_sum("职业")   # both "n"
    assert T.word_type_sum("姓名12") == T.word_type_sum("姓名") + \
        T.word_type_sum("12")
