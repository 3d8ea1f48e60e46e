"""Per-document extraction: the pure core shared by the oracle and the Ray
pipeline UDF.

Re-implements the reference's per-page orchestration
(/root/reference/src/tableExtract/tableExtractor.py:109-164 ``getTable`` +
``dealWithTableList``): locate tables (basic-info boxes, ul-list tables,
heuristic-filtered <table> tags) → span-normalize (extend) → canonicalize to
ROW direction (flip) → clean → classify → extract entity/relation triples.

Output span-sequence definition (the north rule's per-row invariant — the
reference has no span concept, its outputs are pickles/JSON, so this ordering
contract is OURS and is shared verbatim by oracle and pipeline):
  Tables are processed in the reference's order (tableExtractor.py:150-164):
  ALL basic-info-box tables first (in document order), then the ``<table>``
  tag tables (in document order). For each extracted (normal ∧ correct)
  table, after clear_table:
    1. one ``text`` span carrying the table caption (``name``),
    2. one ``table_cell`` span per cell in row-major order,
    3. one ``media`` span per cell image src, inline right after its cell.
  After all tables: one ``media`` span per input span of kind "media",
  in input offset order. Offsets are assigned 0..n-1 over the final sequence.
  Entities and relations follow the same table order.

Partitioning assumption for the salted mega-doc path (SURVEY.md §4.2): each
input ``html`` span is a self-contained block-level fragment — a TABLE never
straddles two spans — so table location is compositional across chunks.
Captions are NOT span-local (``getCaption`` walks up to 2 previous DOM
siblings, which may live in earlier spans), so each chunk is extracted with
the 2 preceding html spans prepended as parse-only CONTEXT (``n_prefix``):
the prefix's own tables are located, counted, and skipped — they belong to
the previous chunk — while the chunk's first tables see their true preceding
siblings. ``extract_document`` exposes the output groups separately so the
salted reassembly can preserve the whole-document order exactly.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from urllib.parse import unquote

from .lexicons import DEFAULT_LEXICONS, Lexicons
from .locate import (basic_info_tables_from_boxes, change_tag_to_table,
                     extract_list_table, get_caption, html_pretreat,
                     locate_candidates, through_heuristic_rule)
from .tablemodel import Table
from .wordtype import LexiconTagger

Span = tuple[str, str, str]  # (kind, text, media_ref) — offset assigned later


@dataclass
class DocResult:
    """Per-document extraction output, kept in the ordered groups the salted
    reassembly needs (basic-info tables precede tag tables globally, so a
    chunked run must concatenate group-wise — pipeline._reassemble_doc)."""

    doc_id: str
    basic_spans: list[Span] = field(default_factory=list)
    tag_spans: list[Span] = field(default_factory=list)
    tail_media: list[Span] = field(default_factory=list)
    basic_entities: list = field(default_factory=list)
    tag_entities: list = field(default_factory=list)
    basic_relations: list = field(default_factory=list)
    tag_relations: list = field(default_factory=list)
    n_tables: int = 0
    error: str = ""

    @property
    def content_spans(self) -> list[Span]:
        return self.basic_spans + self.tag_spans

    @property
    def entities(self) -> list:
        return self.basic_entities + self.tag_entities

    @property
    def relations(self) -> list:
        return self.basic_relations + self.tag_relations

    @property
    def spans(self) -> list[tuple[str, str, str, int]]:
        """Final ordered span sequence with offsets."""
        seq = self.content_spans + self.tail_media
        return [(k, t, m, i) for i, (k, t, m) in enumerate(seq)]

    @property
    def entities_json(self) -> str:
        return json.dumps(self.entities, ensure_ascii=False)

    @property
    def relations_json(self) -> str:
        return json.dumps(self.relations, ensure_ascii=False)


def subject_from_doc_id(doc_id: str) -> str:
    """M2 (tableExtractor.py:98-99): page subject = percent-decoded last URL
    path segment, or the second-to-last when the last is all digits."""
    parts = doc_id.split("/")
    last = unquote(parts[-1])
    if last.isdigit() and len(parts) >= 2:
        return unquote(parts[-2])
    return last


def locate_tables(html: str, doc_id: str, lex: Lexicons,
                  tagger: LexiconTagger) -> tuple[list[Table], int]:
    """``getTable`` (tableExtractor.py:144-164): pretreat → basic-info boxes →
    per <table>: ul-list extraction, else heuristic filter → caption →
    DOM→Table. Returns (tables, n_basic) — the first ``n_basic`` tables come
    from basic-info boxes (the reference prepends them all)."""
    root = html_pretreat(html)
    boxes, table_tags = locate_candidates(root, lex.site_rule_dict)
    tables = basic_info_tables_from_boxes(boxes, doc_id)
    n_basic = len(tables)
    for tag in table_tags:
        ul_tables = extract_list_table(tag)
        if ul_tables:
            tables.extend(ul_tables)
        elif through_heuristic_rule(tag, tagger):
            caption = get_caption(tag)   # NOTE: removes <caption> from tag
            tables.append(change_tag_to_table(tag, caption))
    return tables, n_basic


def extract_document(doc_id: str, spans: list[dict],
                     lex: Lexicons = DEFAULT_LEXICONS,
                     tagger: LexiconTagger | None = None,
                     n_prefix: int = 0) -> DocResult:
    """Extract one interleaved document row ``(doc_id, spans)``.

    ``spans`` is the input span list (dicts with kind/text/media_ref/offset).
    The html chunks are concatenated in offset order into the page markup
    (the reference's ``personUrlAndHtml.html`` column, MSSQL.py:26-30);
    ``media`` input spans pass through to the output tail.

    ``n_prefix``: the first ``n_prefix`` spans are parse-only CONTEXT from
    the preceding salted chunk (module docstring): their media is not
    emitted and their tables are located-then-skipped.
    """
    if tagger is None:
        from .wordtype import tagger_for
        tagger = tagger_for(lex)
    res = DocResult(doc_id)
    ordered = sorted(spans, key=lambda s: s["offset"])
    prefix, own = ordered[:n_prefix], ordered[n_prefix:]
    html = "".join(s["text"] for s in ordered if s["kind"] == "html")
    res.tail_media = [("media", "", s["media_ref"]) for s in own
                      if s["kind"] == "media"]
    subject = subject_from_doc_id(doc_id)
    tables, n_basic = locate_tables(html, doc_id, lex, tagger)
    skip_basic = skip_tag = 0
    if prefix:
        prefix_html = "".join(s["text"] for s in prefix
                              if s["kind"] == "html")
        p_tables, p_basic = locate_tables(prefix_html, doc_id, lex, tagger)
        skip_basic = p_basic
        skip_tag = len(p_tables) - p_basic
    seen_basic = seen_tag = 0
    for idx, table in enumerate(tables):
        is_basic = idx < n_basic
        # prefix-context tables belong to the previous chunk — skip them
        if is_basic:
            seen_basic += 1
            if seen_basic <= skip_basic:
                continue
        else:
            seen_tag += 1
            if seen_tag <= skip_tag:
                continue
        span_acc = res.basic_spans if is_basic else res.tag_spans
        ent_acc = res.basic_entities if is_basic else res.tag_entities
        rel_acc = res.basic_relations if is_basic else res.tag_relations
        # per-table pipeline (tableExtractor.py:119-133)
        table.href_map[subject] = doc_id
        table.extend_table()
        table.prefix = subject
        if not (table.is_normal() and table.is_correct()):
            continue
        if table.get_unfold_direction(tagger) == "COL":
            table = table.flip()
        table.clear_table()
        # spans reflect the CLEANED table, before triple extraction mutates
        # it (extract_entity / extract_property_relationship delete columns)
        _emit_table_spans(span_acc, table)
        entities, relations = table.extract_entity_relationship(lex)
        ent_acc.extend(entities)
        rel_acc.extend(relations)
        res.n_tables += 1
    return res


def _emit_table_spans(acc: list[Span], table: Table) -> None:
    """Emit the span sequence for one extracted table (see module docstring
    for the ordering contract)."""
    acc.append(("text", str(table.name), ""))
    for row in table.rows:
        for cell in row:
            acc.append(("table_cell", str(cell.content), ""))
            for src in cell.img:
                acc.append(("media", "", src))


def extract_document_safe(doc_id: str, spans: list[dict],
                          lex: Lexicons = DEFAULT_LEXICONS,
                          tagger: LexiconTagger | None = None,
                          n_prefix: int = 0) -> DocResult:
    """Extraction with quarantine semantics: any exception produces an empty
    result carrying the error string (recorded deviation — the reference's
    ``@except_output`` silently drops failed records,
    src/tools/algorithm/exceptionCatch.py:10-35; we keep the row and mark
    it so failed docs are countable and re-runnable)."""
    try:
        return extract_document(doc_id, spans, lex, tagger, n_prefix)
    except Exception as e:  # noqa: BLE001 — quarantine boundary
        res = DocResult(doc_id)
        res.error = f"{type(e).__name__}: {e}"
        return res
