"""Type lattice + type tree tests (wtes_ray.celltype — reference
TableItem.py:47-96 and table.py:1062-1176)."""
import pytest

from wtes_ray.celltype import (classify_cell, type_distance,
                               type_list_distance)


@pytest.mark.parametrize("content,has_img,expected", [
    ("anything", True, "图片"),
    ("https://baike.baidu.com/item/x", False, "超链接"),
    ("", False, "标点类型"),          # empty string is punctuation-only
    ("—？！", False, "标点类型"),
    # "-3" falls to 其他类型: the reference gates numbers behind the
    # char/num regex, which rejects "-" (TableItem.py:63,72) — faithful quirk
    ("-3", False, "其他类型"),
    ("0", False, "<=0"),
    # decimals also fail the char/num gate ("." not in the class) — faithful
    ("0.5", False, "其他类型"),
    ("12", False, ">=1"),
    ("123万", False, "数字类型"),     # number with trailing Chinese unit
    ("孔子", False, "中文"),
    ("ABC", False, "大写"),
    ("abc", False, "小写"),
    ("AbC", False, "大小写混合"),
    ("孔子A1", False, "字符类型"),
    ("你好，世界", False, "其他类型"),  # mixed Chinese+punct falls out
])
def test_classify(content, has_img, expected):
    assert classify_cell(content, has_img) == expected


def test_type_distance():
    assert type_distance("中文", "中文") == 0
    # 中文(3) vs 大写(4): up 1 → 英文(3); 中文 vs 英文 same depth → both to
    # 字符类型 (+2 each... pairwise) → total 1 + 2 = 3
    assert type_distance("中文", "大写") == 3
    assert type_distance("大写", "中文") == 3
    # siblings at depth 1
    assert type_distance("图片", "超链接") == 2
    # 中文(d3) vs 图片(d1): 中文 up 2 (+2), then both walk to root (+2·2=4)? no:
    # after leveling 中文→字符和数字(d1), 字符和数字 != 图片 → both to 类型 (+2)
    assert type_distance("中文", "图片") == 4


def test_type_list_distance_common_prefix():
    assert type_list_distance(["中文", "中文"], ["中文"]) == 0
    assert type_list_distance([], ["中文"]) == 0
    assert type_list_distance(["中文", "大写"], ["中文", "中文"]) == 1.5


def test_classify_cell_cached_equals_uncached():
    """Property pin for the round-4 memo cache: the cached entry point must
    agree with the pure function on every lattice branch and on whitespace
    variants that collide on the stripped cache key."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wtes_ray.celltype import classify_cell, classify_cell_cached

    samples = ["", " ", "abc", "ABC", "Abc", "42", "-1", "0.5", "1.5",
               "中文", "a1", "!!", "http://x.y/z", "  42  ", "\t中文\n"]
    for s in samples:
        for img in (False, True):
            assert classify_cell_cached(s, img) == classify_cell(s, img)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=12), st.booleans())
    def prop(s, img):
        assert classify_cell_cached(s, img) == classify_cell(s, img)

    prop()


def test_clean_cell_text_cached_equals_uncached():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wtes_ray.cleaners import clean_cell_text, clean_cell_text_cached

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=20))
    def prop(s):
        assert clean_cell_text_cached(s) == clean_cell_text(s)

    prop()
