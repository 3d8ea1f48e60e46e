"""Deterministic lexicon POS tagger.

Replaces the reference's HanLP segmenter + ``WordMap.pkl`` code-sum trick
(/root/reference/src/tableExtract/TableItem.py:98-117,
tableExtractor.py:230-254 Rule3, table.py:347-354 word-type tie-break) with a
pure, dependency-free greedy longest-match tagger over frozen lexicons
(SURVEY.md §7.0 recorded deviation: decision structure identical, vocabulary
is ours; the oracle and the Ray pipeline share this module, so golden
equality is self-consistent).

Natures: "n" common noun, "nr" person name, "m" number, "nx" latin token,
"w" punctuation, "x" other CJK/unknown.
"""

from __future__ import annotations

import re
from functools import lru_cache

from .lexicons import DEFAULT_LEXICONS, NATURE_CODES, Lexicons

_NUM = re.compile(r"\d+(?:\.\d+)?")
_ASCII = re.compile(r"[A-Za-z]+")
_CJK = re.compile(r"[一-龥]")


class LexiconTagger:
    """Greedy longest-match segmenter over the noun + name lexicons."""

    def __init__(self, lex: Lexicons = DEFAULT_LEXICONS):
        self.vocab: dict[str, str] = {}
        for w in lex.noun_lexicon:
            self.vocab[w] = "n"
        for w in lex.name_lexicon:
            self.vocab[w] = "nr"
        self.max_len = max((len(w) for w in self.vocab), default=1)

    def seg(self, text: str) -> list[tuple[str, str]]:
        """Segment ``text`` into (token, nature) pairs."""
        out: list[tuple[str, str]] = []
        i, n = 0, len(text)
        while i < n:
            ch = text[i]
            # longest lexicon match first
            matched = False
            for L in range(min(self.max_len, n - i), 0, -1):
                tok = text[i:i + L]
                nat = self.vocab.get(tok)
                if nat is not None:
                    out.append((tok, nat))
                    i += L
                    matched = True
                    break
            if matched:
                continue
            m = _NUM.match(text, i)
            if m:
                out.append((m.group(), "m"))
                i = m.end()
                continue
            m = _ASCII.match(text, i)
            if m:
                out.append((m.group(), "nx"))
                i = m.end()
                continue
            if _CJK.match(ch):
                # coalesce a run of unknown CJK into one "x" token
                j = i + 1
                while j < n and _CJK.match(text[j]) and not self._starts_word(text, j):
                    j += 1
                out.append((text[i:j], "x"))
                i = j
                continue
            out.append((ch, "w"))
            i += 1
        return out

    def _starts_word(self, text: str, i: int) -> bool:
        for L in range(min(self.max_len, len(text) - i), 0, -1):
            if text[i:i + L] in self.vocab:
                return True
        return False

    def word_type_sum(self, text: str) -> int:
        """Sum of per-token nature codes (TableItem.py:110-116 analog)."""
        return sum(NATURE_CODES[nat] for _, nat in self.seg(text))

    def has_noun(self, text: str) -> bool:
        """True iff a token tags as a common noun — Rule3's
        ``natureList.count("n") > 0`` check (tableExtractor.py:244-247)."""
        return any(nat == "n" for _, nat in self.seg(text))

    def is_person_name(self, text: str) -> bool:
        """True iff the text segments to a single person-name token —
        the reference's URL person-name relevance test (UrlExtractor.py:54-67
        gives relevance 1.0 iff HanLP yields one ``nr`` token)."""
        toks = self.seg(text)
        return len(toks) == 1 and toks[0][1] == "nr"


@lru_cache(maxsize=16)
def tagger_for(lex: Lexicons) -> LexiconTagger:
    """Cached tagger per (frozen, hashable) Lexicons value — custom
    vocabularies get their own tagger without per-document rebuild cost."""
    return LexiconTagger(lex)


def default_tagger() -> LexiconTagger:
    return tagger_for(DEFAULT_LEXICONS)
