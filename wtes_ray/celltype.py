"""Cell type lattice + type-distance tree.

Re-implements the reference's cell-content classification
(/root/reference/src/tableExtract/TableItem.py:47-96 ``getTableItemType``)
and the fixed 4-level type taxonomy with tree distances
(table.py:1062-1176 ``TypeTree``). Pure functions over strings — used both
row-locally inside the extraction UDF and by unit tests.
"""

from __future__ import annotations

import re

# Regexes mirror TableItem.py:54-64 (same patterns, matched with re.match —
# i.e. anchored at the start, ``$``-anchored at the end where written).
_SYMBOL = re.compile(r"^[\W]*$")
_NUMBER = re.compile(r"^([$￥]?)(-?)(\d+)(\.\d+)?([一-龥%]?)$")
_NUM_LE0 = re.compile(r"^((-\d+(\.\d+)?)|(0+(\.0+)?))$")
_NUM_0_1 = re.compile(r"^0(\.\d+)?$")
_NUM_GT1 = re.compile(r"^(([1-9]\d+)|[1-9])(\.[\d]*)?$")
_CHINESE = re.compile(r"[一-龥]+$")
_ENGLISH = re.compile(r"[A-Za-z]+$")
_ENG_LOW = re.compile(r"[a-z]+$")
_ENG_UP = re.compile(r"[A-Z]+$")
_CHAR_NUM = re.compile(r"[一-龥A-Za-z0-9]+$")
_HYPERLINK = re.compile(
    r"(https?|ftp|file)://[-A-Za-z0-9+&@#/%?=~_|!:,.;]+[-A-Za-z0-9+&@#/%=~_|]")

# Type labels (the reference uses Chinese labels; kept as-is so behavior-bearing
# constants line up with the cited code).
T_IMG = "图片"
T_LINK = "超链接"
T_PUNCT = "标点类型"
T_NUM = "数字类型"
T_NUM_LE0 = "<=0"
T_NUM_0_1 = "0-1"
T_NUM_GT1 = ">=1"
T_CHINESE = "中文"
T_UPPER = "大写"
T_LOWER = "小写"
T_MIXED = "大小写混合"
T_CHAR = "字符类型"
T_OTHER = "其他类型"

# Types counted as "character-typed" by the property-line-number fallback
# (table.py:511 — note the reference set includes "英文" which the lattice
# never emits; harmless, kept for parity).
CHARACTER_TYPES = frozenset({"字符类型", "中文", "英文", "大写", "小写", "大小写混合"})


def classify_cell(content: str, has_img: bool) -> str:
    """Classify a cell's content into the type lattice (TableItem.py:47-96).

    Precedence: image > hyperlink > punctuation-only (incl. empty) >
    char/num subtree > other.
    """
    content = str(content).strip()
    if has_img:
        return T_IMG
    if _HYPERLINK.match(content):
        return T_LINK
    if _SYMBOL.match(content):
        return T_PUNCT
    if _CHAR_NUM.match(content):
        if _NUMBER.match(content):
            if _NUM_LE0.match(content):
                return T_NUM_LE0
            if _NUM_0_1.match(content):
                return T_NUM_0_1
            if _NUM_GT1.match(content):
                return T_NUM_GT1
            return T_NUM
        if _CHINESE.match(content):
            return T_CHINESE
        if _ENGLISH.match(content):
            if _ENG_UP.match(content):
                return T_UPPER
            if _ENG_LOW.match(content):
                return T_LOWER
            return T_MIXED
        return T_CHAR
    return T_OTHER


# Cross-cell memo for the non-image lattice walk: cell contents are
# Zipfian (measured 99k classify calls / 11k distinct strings over a
# 400-doc bench sample — ~9× repetition), so caching by stripped content
# removes ~90% of the regex matching from the extraction hot path. Per
# worker process, insert-capped so a pathological all-distinct corpus
# cannot grow it unbounded (the dict stops LEARNING at the cap but keeps
# serving hits). Image cells bypass: T_IMG needs no regex.
_CLS_CACHE: dict[str, str] = {}
_CLS_CACHE_CAP = 1_000_000
# Byte-aware guards: values are short class names but keys are raw cell text,
# so long (least-repetitive) keys are never cached and total cached key chars
# are budgeted — a corpus of large distinct cells can't pin worker heap.
_CLS_MAX_KEY_LEN = 1024
_CLS_BYTE_BUDGET = 64 * 1024 * 1024
_cls_cache_bytes = 0


def classify_cell_cached(content: str, has_img: bool) -> str:
    """Memoized :func:`classify_cell` (same result by purity — pinned by
    tests/test_celltype.py's property test over both entry points)."""
    global _cls_cache_bytes
    if has_img:
        return T_IMG
    key = str(content).strip()
    v = _CLS_CACHE.get(key)
    if v is None:
        v = classify_cell(key, False)
        if (len(key) <= _CLS_MAX_KEY_LEN
                and len(_CLS_CACHE) < _CLS_CACHE_CAP
                and _cls_cache_bytes < _CLS_BYTE_BUDGET):
            _CLS_CACHE[key] = v
            _cls_cache_bytes += len(key)
    return v


# Fixed taxonomy (table.py:1067-1089): child → parent.
_PARENT: dict[str, str] = {
    "超链接": "类型",
    "图片": "类型",
    "字符和数字": "类型",
    "其他类型": "类型",
    "标点类型": "类型",
    "字符类型": "字符和数字",
    "数字类型": "字符和数字",
    "中文": "字符类型",
    "英文": "字符类型",
    "<=0": "数字类型",
    "0-1": "数字类型",
    ">=1": "数字类型",
    "大写": "英文",
    "小写": "英文",
    "大小写混合": "英文",
}

_DEPTH: dict[str, int] = {"类型": 0}
for _node in _PARENT:
    _d, _n = 0, _node
    while _n != "类型":
        _n = _PARENT[_n]
        _d += 1
    _DEPTH[_node] = _d


def type_distance(t1: str, t2: str) -> int:
    """Tree distance between two type labels (table.py:1128-1159 ``_VType``):
    walk the deeper node up to equal depth (+1 per step), then walk both up
    together (+2 per step) until they meet."""
    if t1 is None or t2 is None:
        raise ValueError("cell type is None; classify cells first")
    if t1 == t2:
        return 0
    d1, d2 = _DEPTH[t1], _DEPTH[t2]
    dist = 0
    while d1 > d2:
        t1 = _PARENT[t1]
        d1 -= 1
        dist += 1
    while d2 > d1:
        t2 = _PARENT[t2]
        d2 -= 1
        dist += 1
    while t1 != t2:
        t1 = _PARENT[t1]
        t2 = _PARENT[t2]
        dist += 2
    return dist


def type_list_distance(types1: list[str], types2: list[str]) -> float:
    """Mean pairwise distance over the common prefix of two type lists
    (table.py:1161-1176 ``VType``)."""
    if not types1 or not types2:
        return 0.0
    m = min(len(types1), len(types2))
    return sum(type_distance(types1[i], types2[i]) for i in range(m)) / m
