"""Scalar string cleaners shared by the oracle and the Ray pipeline.

Re-implements the reference's cleaning semantics (SURVEY.md §2 M18):
  - bracket stripping across 6 bracket styles + punctuation removal
    (/root/reference/src/tableExtract/table.py:21-32 ``_clearNameOrRel``),
  - ``[n]`` citation-ref stripping + NBSP removal (table.py:1214-1215,
    tableExtractor.py:309-310),
  - guarded triple appends with the ≤7-char name/relation rules
    (table.py:35-52 ``_append``, table.py:55-79 ``_notNullAppend``),
  - person-name cleanup with the ``/``-split (table.py:449-461).

All functions are pure and precompiled — they run inside hot ``map_batches``
stages, once per cell/name, so the regexes are module-level constants.
"""

from __future__ import annotations

import re

# Bracket styles stripped from names/relations (table.py:29). The reference
# pattern for ASCII parens is non-greedy single-char "\(.?\)"; kept verbatim.
_BRACKETS = re.compile(r"\(.?\)|（.*?）|\{.*?}|\[.*?]|【.*?】|<.*?>")
# _notNullAppend (table.py:73) and __clearPersonNameList (table.py:457) use
# a variant with a stray "||" — an EMPTY alternation branch before the
# angle-bracket one. Ordered alternation tries the empty branch at every
# position before \<.*?\> is ever reached, so those two paths NEVER strip
# <...> (while _clearNameOrRel, whose pattern lacks the "||", does).
# Faithfully reproduced: no angle-bracket branch here.
_BRACKETS_NO_ANGLE = re.compile(r"\(.?\)|（.*?）|\{.*?}|\[.*?]|【.*?】")
# Punctuation stripped from names/relations (table.py:30).
_PUNCT = re.compile(r"[\s+.!/_,$%^*(+\"']+|[+——！，。？?、~@#￥%……&*（）]+")
# Citation refs like ``[12]`` stripped from cell text (table.py:1214).
_CITE_REF = re.compile(r"\[\d+\]")


def clear_name_or_rel(s: str) -> str:
    """Strip brackets and punctuation from a name/relation (table.py:21-32)."""
    if len(s) == 0 or s.isspace():
        return ""
    s = _BRACKETS.sub("", s)
    return _PUNCT.sub("", s)


def clean_cell_text(s: str) -> str:
    """Cell-text normalization at DOM→cell time: drop ``[n]`` refs and NBSP
    (table.py:1214-1215)."""
    return _CITE_REF.sub("", s).replace("\xa0", "")


# Cross-cell memo (same rationale as celltype._CLS_CACHE: measured ~6×
# content repetition on the bench corpus; pure function, insert-capped).
# Budget is byte-aware: long strings are the least likely to repeat, so cells
# above _CLEAN_MAX_KEY_LEN are never cached, and total cached chars (key +
# value) are capped so a corpus of large distinct cells can't pin worker heap.
_CLEAN_CACHE: dict[str, str] = {}
_CLEAN_CACHE_CAP = 1_000_000
_CLEAN_MAX_KEY_LEN = 1024
_CLEAN_BYTE_BUDGET = 64 * 1024 * 1024  # ~chars; keys+values combined
_clean_cache_bytes = 0


def clean_cell_text_cached(s: str) -> str:
    global _clean_cache_bytes
    v = _CLEAN_CACHE.get(s)
    if v is None:
        v = clean_cell_text(s)
        if (len(s) <= _CLEAN_MAX_KEY_LEN
                and len(_CLEAN_CACHE) < _CLEAN_CACHE_CAP
                and _clean_cache_bytes < _CLEAN_BYTE_BUDGET):
            _CLEAN_CACHE[s] = v
            _clean_cache_bytes += len(s) + len(v)
    return v


def clean_person_name(s: str) -> str:
    """Person-name cleanup: brackets (sans ``<...>`` — see
    ``_BRACKETS_NO_ANGLE``), ``/``-split, punctuation (table.py:449-461
    ``__clearPersonNameList``)."""
    s = _BRACKETS_NO_ANGLE.sub("", s)
    s = s.split("/")[0]
    return _PUNCT.sub("", s)


def append_relation(acc: list, subj: list, rel: str, obj: list) -> None:
    """Guarded relation-triple append (table.py:35-52 ``_append``).

    ``subj``/``obj`` are ``[name, url]`` pairs; names are cleaned in place,
    the relation must clean to ≤7 chars and all three parts must be non-empty.
    """
    subj[0] = clear_name_or_rel(subj[0])
    rel = clear_name_or_rel(rel)
    obj[0] = clear_name_or_rel(obj[0])
    if len(rel) > 7:
        return
    if (len(subj[0]) == 0 or str(subj[0]).isspace() or len(rel) == 0
            or rel.isspace() or len(obj[0]) == 0 or str(obj[0]).isspace()):
        return
    acc.append([subj, rel, obj])


def append_entity_triple(acc: list, a: str, b: str, c: str,
                         is_name: bool = False) -> None:
    """Guarded entity-triple append (table.py:55-79 ``_notNullAppend``):
    subject/relation ≤7 chars pre-clean, all parts non-empty; object cleaned
    (and length-limited) only when it is itself a person name."""
    if (len(a) == 0 or a.isspace() or len(b) == 0 or b.isspace()
            or len(c) == 0 or c.isspace()):
        return
    if len(a) > 7 or len(b) > 7:
        return
    parts = [_BRACKETS_NO_ANGLE.sub("", x) for x in (a, b, c)]
    parts[0] = _PUNCT.sub("", parts[0])
    parts[1] = _PUNCT.sub("", parts[1])
    if is_name:
        parts[2] = _PUNCT.sub("", parts[2])
        if len(parts[2]) > 7:
            return
    acc.append(parts)
