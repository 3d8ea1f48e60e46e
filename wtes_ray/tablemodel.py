"""Table model: cell grid + normalization + classification + triple extraction.

From-scratch re-implementation of the reference's ``TableItem``/``Table``
semantics (/root/reference/src/tableExtract/TableItem.py:16-45,
table.py:82-1176) as pure functions over plain Python objects. This module is
the shared core used BOTH by the single-process oracle and by the Ray
``map_batches`` extraction UDF — every normalization choice here is
behavior-bearing for the span-sequence equality invariant.

Deviations from the reference (recorded, SURVEY.md §7.0):
  - span expansion uses an occupancy grid (identical content matrices for
    well-formed tables; the reference's insert-based expansion is undefined on
    malformed span layouts) with spans clamped to the table rectangle;
  - ``fusionJsonWord`` lexicon self-mutation is frozen out (classification is
    input-order independent);
  - exceptions raise (callers quarantine the document) instead of being
    swallowed by ``@except_output``.
"""

from __future__ import annotations

import numpy as np

from .celltype import (CHARACTER_TYPES, T_PUNCT, classify_cell,  # noqa: F401 (re-export for tests)
                       classify_cell_cached, type_list_distance)
from .cleaners import (append_entity_triple, append_relation, clean_person_name,
                       clear_name_or_rel)
from .lexicons import DEFAULT_LEXICONS, Lexicons
from .wordtype import LexiconTagger, default_tagger

PERSON_INFO = "个人信息表"      # person-info table
PROPERTY_REL = "属性关系表"     # property-relation table
CAPTION_REL = "标题关系表"      # caption-relation table
ENTITY_REL = "实体关系表"       # entity-relation table
OTHER = "其他表"                # other

UNNAMED = "未命名表格"          # default caption (table.py:87)


class Cell:
    """One table cell (reference ``TableItem``, TableItem.py:16-45)."""

    __slots__ = ("content", "rowspan", "colspan", "href", "img", "type_",
                 "word_type", "tag_name")

    def __init__(self, content: str = "", rowspan: int = 1, colspan: int = 1,
                 href: dict | None = None, img: list | None = None,
                 tag_name: str | None = None):
        self.content = content
        self.rowspan = rowspan
        self.colspan = colspan
        self.href = href if href is not None else {}
        self.img = img if img is not None else []
        self.type_: str | None = None
        self.word_type: int | None = None
        self.tag_name = tag_name

    def get_type(self) -> str:
        if self.type_ is None:
            self.type_ = classify_cell_cached(self.content, len(self.img) > 0)
        return self.type_

    def copy(self) -> "Cell":
        c = Cell(self.content, 1, 1, self.href, self.img, self.tag_name)
        c.type_ = self.type_
        c.word_type = self.word_type
        return c

    def __repr__(self) -> str:
        return f"Cell({self.content!r}, rs={self.rowspan}, cs={self.colspan})"


class Table:
    """A located table (reference ``Table``, table.py:82-119)."""

    def __init__(self, rows: list[list[Cell]], name: str = UNNAMED,
                 unfold_direction: str | None = None):
        self.rows = rows
        self.row_number = len(rows)
        # ONE pass over the rows yields both the width and the
        # rectangularity check (the hot path builds thousands of tables;
        # the separate _init_correct sum pass was measurable)
        sums = [sum(c.colspan for c in r) for r in rows]
        self.col_number = max(sums, default=0)
        self.name = name
        self.prefix: str | None = None
        self.unfold_direction = unfold_direction
        self.property_line_num = 1   # init 1 — makes the tiered discrimination
        # short-circuit (reference quirk: table.py:112 init + 541-542 early
        # return mean the property line count is effectively always 1)
        self.table_type: str | None = None
        self.href_map: dict[str, str] = {}
        self._property_names: list[str] | None = None
        self._correct = len(set(sums)) == 1
        self._normal = self._init_normal()
        self.init_types()

    # -- structural checks (M10) -------------------------------------------
    def _init_correct(self) -> bool:
        """Rectangularity: every row's colspan sum equal (table.py:569-581)."""
        sums = {sum(c.colspan for c in r) for r in self.rows}
        self._correct = len(sums) == 1
        return self._correct

    def _init_normal(self) -> bool:
        """≥2 rows and ≥2 cols (table.py:583-592)."""
        self._normal = self.row_number >= 2 and self.col_number >= 2
        return self._normal

    def is_correct(self) -> bool:
        return self._correct

    def is_normal(self) -> bool:
        return self._normal

    def init_types(self) -> None:
        for r in self.rows:
            for c in r:
                c.get_type()

    # -- accessors ----------------------------------------------------------
    def get_row(self, i: int) -> list[Cell]:
        if not (self._normal and self._correct):
            raise ValueError("table not normal/correct; cannot take a row")
        return self.rows[i]

    def get_col(self, j: int) -> list[Cell]:
        if not (self._normal and self._correct):
            raise ValueError("table not normal/correct; cannot take a column")
        return [self.rows[i][j] for i in range(self.row_number)]

    # -- span normalization (M8 + M9) ---------------------------------------
    def extend_table(self) -> "Table":
        """Expand rowspan/colspan > 1 into a dense rectangular grid by
        duplicating cells (reference ``extendTable`` table.py:121-152 +
        ``getAbsolutePosition`` table.py:360-385, via an occupancy grid).

        Spans overflowing the rectangle are clamped. Returns self.
        """
        n_rows = len(self.rows)
        if n_rows == 0:
            return self
        if self._correct and all(c.rowspan == 1 and c.colspan == 1
                                 for r in self.rows for c in r):
            # already a dense rectangle: the grid expansion would rebuild
            # the same matrix out of per-cell copies (observable state
            # identical — copy() resets spans that are already 1 and
            # carries type_), and __init__ already ran the structural
            # checks and typing. Most tables take this path (the bench
            # corpus plants rowspans in a minority of tables).
            return self
        width = max(sum(c.colspan for c in r) for r in self.rows)
        grid: list[list[Cell | None]] = [[None] * width for _ in range(n_rows)]
        for i, row in enumerate(self.rows):
            j = 0
            for cell in row:
                while j < width and grid[i][j] is not None:
                    j += 1
                if j >= width:
                    break
                rs = min(cell.rowspan, n_rows - i)
                cs = min(cell.colspan, width - j)
                for di in range(rs):
                    for dj in range(cs):
                        if grid[i + di][j + dj] is None:
                            grid[i + di][j + dj] = cell.copy()
                j += cs
        self.rows = [[c if c is not None else Cell("") for c in r] for r in grid]
        self.row_number = n_rows
        self.col_number = width
        self._init_correct()
        self._init_normal()
        self.init_types()
        return self

    # -- flip (M11) ----------------------------------------------------------
    def flip(self) -> "Table":
        """Transpose the cell matrix, swapping ROW↔COL direction
        (table.py:201-224). Requires a dense grid (run extend_table first)."""
        new_rows = [[self.rows[i][j].copy() for i in range(self.row_number)]
                    for j in range(self.col_number)]
        t = Table(new_rows, name=self.name)
        if self.unfold_direction == "ROW":
            t.unfold_direction = "COL"
        elif self.unfold_direction == "COL":
            t.unfold_direction = "ROW"
        t.prefix = self.prefix
        t.property_line_num = self.property_line_num
        t.table_type = self.table_type
        t.href_map = self.href_map
        return t

    # -- row/col deletion -----------------------------------------------------
    def delete_row(self, index: int) -> None:
        """(table.py:168-182)"""
        if not (self._correct and self._normal):
            raise ValueError("table not normalized; cannot delete row")
        if index < 0 or index >= self.row_number:
            raise IndexError(f"row {index} out of range")
        del self.rows[index]
        self.row_number -= 1
        self._property_names = None

    def delete_col(self, index: int) -> None:
        """(table.py:184-199)"""
        if not (self._correct and self._normal):
            raise ValueError("table not normalized; cannot delete column")
        if index < 0 or index >= self.col_number:
            raise IndexError(f"col {index} out of range")
        for r in self.rows:
            del r[index]
        self.col_number -= 1
        self._property_names = None

    # -- direction detection (M15) -------------------------------------------
    def length_character(self) -> tuple[float, float]:
        """Normalized (row, col) std-dev means of cell text lengths
        (table.py:236-250)."""
        data = np.zeros((self.row_number, self.col_number), dtype=int)
        for i in range(self.row_number):
            for j in range(self.col_number):
                data[i, j] = len(str(self.rows[i][j].content))
        col_var = float(np.mean(np.std(data, axis=0)))
        row_var = float(np.mean(np.std(data, axis=1)))
        s = row_var + col_var
        if s == 0:
            return row_var, col_var
        return row_var / s, col_var / s

    def type_character(self) -> tuple[float, float]:
        """Normalized (row, col) type-distance characters vs the last row/col
        (table.py:1091-1126 ``TypeTree.getTypeCharacter``)."""
        row_types = [[c.get_type() for c in r] for r in self.rows]
        col_types = [[row_types[i][j] for i in range(self.row_number)]
                     for j in range(self.col_number)]
        col_char = 0.0
        vals = [type_list_distance(row_types[i], row_types[-1])
                for i in range(self.row_number - 1)]
        if vals:
            col_char = float(np.mean(vals))
        row_char = 0.0
        vals = [type_list_distance(col_types[j], col_types[-1])
                for j in range(self.col_number - 1)]
        if vals:
            row_char = float(np.mean(vals))
        s = row_char + col_char
        if s == 0:
            return row_char, col_char
        return row_char / s, col_char / s

    def word_type_character(self, tagger: LexiconTagger) -> tuple[float, float]:
        """Normalized (row, col) std-dev means of per-cell word-type code sums
        (table.py:260-280; codes replace WordMap.pkl, SURVEY.md §7.0)."""
        data = np.zeros((self.row_number, self.col_number), dtype=int)
        for i in range(self.row_number):
            for j in range(self.col_number):
                c = self.rows[i][j]
                if c.word_type is None:
                    c.word_type = tagger.word_type_sum(str(c.content))
                data[i, j] = c.word_type
        col_var = float(np.mean(np.std(data, axis=0)))
        row_var = float(np.mean(np.std(data, axis=1)))
        s = row_var + col_var
        if s == 0:
            return row_var, col_var
        return row_var / s, col_var / s

    def get_unfold_direction(self, tagger: LexiconTagger | None = None) -> str:
        """Header orientation (table.py:313-358): (a) all-``th`` first row/col;
        (b) weighted 0.5·length-std + 0.5·type-character score; (c) word-type
        variance tie-break, defaulting ROW.

        The reference's aspect-ratio rule (table.py:332-335) assigns a
        direction but is unconditionally overwritten at table.py:357 — dead
        code, intentionally not ported."""
        if self.unfold_direction:
            return self.unfold_direction
        if tagger is None:
            tagger = default_tagger()
        row0 = [c.tag_name == "th" for c in self.get_row(0)]
        if row0[0] and len(set(row0)) == 1:
            self.unfold_direction = "ROW"
            return "ROW"
        col0 = [c.tag_name == "th" for c in self.get_col(0)]
        if col0[0] and len(set(col0)) == 1:
            self.unfold_direction = "COL"
            return "COL"
        row_var, col_var = self.length_character()
        row_type, col_type = self.type_character()
        row_score = 0.5 * row_var + 0.5 * row_type
        col_score = 0.5 * col_var + 0.5 * col_type
        if row_score < col_score:
            direction = "ROW"
        elif row_score == col_score:
            rw, cw = self.word_type_character(tagger)
            direction = "ROW" if rw <= cw else "COL"
        else:
            direction = "COL"
        self.unfold_direction = direction
        return direction

    # -- property lines (M16) -------------------------------------------------
    def _tag_property_line_num(self, direction: str) -> int:
        """Count leading all-``th`` lines (table.py:479-503)."""
        res = 0
        if direction == "ROW":
            for i in range(self.row_number):
                if any(self.rows[i][j].tag_name != "th"
                       for j in range(self.col_number)):
                    return res
                res += 1
            return res
        if direction == "COL":
            for j in range(self.col_number):
                if any(self.rows[i][j].tag_name != "th"
                       for i in range(self.row_number)):
                    return res
                res += 1
            return res
        raise ValueError(f"unknown direction {direction!r}")

    def _type_property_line_num(self, direction: str) -> int:
        """Count leading all-character-typed lines; all lines ⇒ 0
        (table.py:505-533)."""
        res = 0
        if direction == "ROW":
            for i in range(self.row_number):
                if any(self.rows[i][j].type_ not in CHARACTER_TYPES
                       for j in range(self.col_number)):
                    return res
                res += 1
            return 0 if res == self.row_number else res
        if direction == "COL":
            for j in range(self.col_number):
                if any(self.rows[i][j].type_ not in CHARACTER_TYPES
                       for i in range(self.row_number)):
                    return res
                res += 1
            return 0 if res == self.col_number else res
        raise ValueError(f"unknown direction {direction!r}")

    def discriminate_property_line_num(self, direction: str) -> int:
        """Property-line count (table.py:535-549). NOTE the reference quirk:
        ``property_line_num`` initializes to 1 and the method early-returns on
        any truthy cached value, so in the production flow this ALWAYS
        returns 1 — the tag/type tiers only run if a caller zeroes the cache
        (unit tests do)."""
        if self.property_line_num:
            return self.property_line_num
        res = self._tag_property_line_num(direction)
        if res == 0 or res > 2:
            res = self._type_property_line_num(direction)
            if res == 0:
                res = 1
        self.property_line_num = res
        return res

    def property_names(self) -> list[str]:
        """Property (header) names: line ``property_line_num - 1`` along the
        unfold direction (table.py:387-404 + 594-607)."""
        if self._property_names is not None:
            return self._property_names
        direction = self.get_unfold_direction()
        n = self.discriminate_property_line_num(direction)
        cells = self.get_row(n - 1) if direction == "ROW" else self.get_col(n - 1)
        self._property_names = [str(c.content) for c in cells]
        return self._property_names

    # -- cleanup (M12) --------------------------------------------------------
    def clear_table(self) -> None:
        """Drop 序号/序 index column, trailing 1-char/whitespace row, trailing
        参考资料 row; blank punctuation-only cells (table.py:1015-1053)."""
        names = self.property_names()
        clear_set = ("序号", "序")
        indexes = [i for i, n in enumerate(names) if n in clear_set]
        if indexes:
            if self.get_unfold_direction() == "ROW":
                self.delete_col(indexes[0])
            else:
                self.delete_row(indexes[0])
        # trailing row where every cell is 1-char or whitespace
        if all((len(str(c.content)) == 1 or str(c.content).isspace())
               for c in self.get_row(self.row_number - 1)):
            self.delete_row(self.row_number - 1)
        # trailing references row
        if all("参考资料" in str(c.content)
               for c in self.get_row(self.row_number - 1)):
            self.delete_row(self.row_number - 1)
        # blank out punctuation-only cells (cached type is NOT recomputed —
        # reference behavior, table.py:1049-1053)
        for r in self.rows:
            for c in r:
                if c.get_type() == T_PUNCT:
                    c.content = ""

    # -- classification (M17) -------------------------------------------------
    def _is_person_info(self, lex: Lexicons) -> bool:
        """(table.py:694-723; the ``fusionJsonWord`` lexicon self-extension at
        table.py:707 is frozen out — recorded deviation A4)."""
        if self.get_unfold_direction() == "ROW":
            if self.row_number != 2:
                return False
        elif self.get_unfold_direction() == "COL":
            if self.col_number != 2:
                return False
        if str(self.rows[0][0].content) in ("中文名", "本名"):
            return True
        props = set(self.property_names())
        if not props:
            return False
        proportion = len(props & set(lex.person_info_properties)) / len(props)
        return proportion >= 0.5

    def _is_property_relationship(self, lex: Lexicons) -> bool:
        """(table.py:725-749)"""
        names = self.property_names()
        for name in names:
            for rel in lex.property_relationship:
                if rel in name:
                    return True
        count = sum(1 for name in names
                    if any(cr in name for cr in lex.caption_relationship))
        return count > len(names) / 2

    def _is_title_relationship(self, lex: Lexicons) -> bool:
        """(table.py:751-765)"""
        if self.name:
            return any(rel in self.name for rel in lex.caption_relationship)
        return False

    def _is_entity_relationship(self, lex: Lexicons) -> bool:
        """(table.py:767-779)"""
        names = self.property_names()
        return any(h in name for name in names for h in lex.person_name_headers)

    def get_table_type(self, lex: Lexicons = DEFAULT_LEXICONS) -> str:
        """Classify into one of 5 types, in reference precedence order
        (table.py:420-438)."""
        if self.table_type:
            return self.table_type
        if self._is_person_info(lex):
            self.table_type = PERSON_INFO
        elif self._is_property_relationship(lex):
            self.table_type = PROPERTY_REL
        elif self._is_title_relationship(lex):
            self.table_type = CAPTION_REL
        elif self._is_entity_relationship(lex):
            self.table_type = ENTITY_REL
        else:
            self.table_type = OTHER
        return self.table_type

    # -- person column helpers ------------------------------------------------
    def _person_name_index(self, lex: Lexicons) -> int:
        """Index of the person-name column: first property whose name contains
        a person-name header keyword (table.py:981-1013)."""
        for idx, name in enumerate(self.property_names()):
            if any(h in name for h in lex.person_name_headers):
                return idx
        return -1

    def get_person_col(self, lex: Lexicons, delete_col: bool = False,
                       remove_header: bool = False, get_name: bool = False
                       ) -> list:
        """Person column cells (or cleaned names) (table.py:440-477)."""
        idx = self._person_name_index(lex)
        if idx == -1:
            return []
        persons = list(self.get_col(idx))
        if not persons:
            return persons
        if remove_header:
            n = self.discriminate_property_line_num(self.get_unfold_direction())
            persons.pop(n - 1)
        if get_name:
            persons = [clean_person_name(str(p.content)) for p in persons]
        if delete_col:
            self.delete_col(idx)
        return persons

    def _person_href_list(self, persons: list[Cell]) -> list[list[str]]:
        """[name, url] per person cell: own href, else table href_map, else ''
        (table.py:962-979)."""
        out = []
        for p in persons:
            name = str(p.content)
            if name in p.href:
                out.append([name, p.href[name]])
            elif name in self.href_map:
                out.append([name, self.href_map[name]])
            else:
                out.append([name, ""])
        return out

    # -- records (M19) --------------------------------------------------------
    def to_dict_list(self, filtration: bool = False,
                     delete_person_name: bool = False,
                     lex: Lexicons = DEFAULT_LEXICONS) -> list[dict]:
        """Header row → keys, data rows → dicts (table.py:658-685)."""
        if not (self._normal and self._correct):
            raise ValueError("table not normalized; cannot build records")
        if delete_person_name:
            idx = self._person_name_index(lex)
            if idx != -1:
                self.delete_col(idx)
        line_num = self.discriminate_property_line_num(self.get_unfold_direction())
        heads = [str(c.content) for c in self.get_row(line_num - 1)]
        records = []
        for i in range(line_num, self.row_number):
            rec: dict[str, str] = {}
            for j in range(self.col_number):
                cell = self.rows[i][j]
                text = str(cell.content)
                if filtration and (text.isspace() or len(text) == 0):
                    continue
                rec[heads[j]] = text
            records.append(rec)
        return records

    # -- triple extraction (T1-T4) --------------------------------------------
    def extract_entity_relationship(self, lex: Lexicons = DEFAULT_LEXICONS
                                    ) -> tuple[list, list]:
        """Dispatcher by table type (table.py:811-831 ``T1``). Returns
        (entities, relations); entities are ``[[name, url], {prop: val}]``
        records, relations are ``[[n1,u1], rel, [n2,u2]]`` triples."""
        entities: list = []
        relations: list = []
        type_name = self.get_table_type(lex)
        if type_name in (PERSON_INFO, ENTITY_REL):
            entities = self.extract_entity(lex)
        elif type_name == PROPERTY_REL:
            relations = self.extract_property_relationship(lex)
            entities = self.extract_entity(lex)
        elif type_name == CAPTION_REL:
            relations = self.extract_caption_relationship(lex)
            entities = self.extract_entity(lex)
        return entities, relations

    def extract_entity(self, lex: Lexicons = DEFAULT_LEXICONS) -> list:
        """Record-mode entity extraction (table.py:944-960 ``T2``):
        ``[[cleaned_name, url], {prop: val}]`` per data row of the person
        column; the person column is removed from the record dicts."""
        entities: list = []
        person_names = self.get_person_col(lex, get_name=True, remove_header=True)
        if not person_names:
            return entities
        person_hrefs = self._person_href_list(
            self.get_person_col(lex, remove_header=True))
        for pair in person_hrefs:
            pair[0] = clear_name_or_rel(pair[0])
        records = self.to_dict_list(filtration=True, delete_person_name=True,
                                    lex=lex)
        if len(person_names) == len(records):
            for i, name in enumerate(person_names):
                if len(name) == 0 or name.isspace():
                    continue
                entities.append([person_hrefs[i], records[i]])
        return entities

    def extract_entity_triples(self, lex: Lexicons = DEFAULT_LEXICONS) -> list:
        """Triple-mode entity extraction (table.py:933-943 ``T2`` variant):
        ``(person_i, property_j, cell_ij)`` per data cell with ≤7-char
        guards."""
        triples: list = []
        person_names = self.get_person_col(lex, delete_col=True, get_name=True)
        if self.col_number >= 1 and person_names:
            line = self.discriminate_property_line_num(self.get_unfold_direction())
            prop_idx = line - 1
            names = self.property_names()
            for i in range(line, self.row_number):
                for j in range(prop_idx, self.col_number):
                    content = str(self.rows[i][j].content)
                    append_entity_triple(triples, person_names[i], names[j],
                                         content)
        return triples

    def extract_property_relationship(self, lex: Lexicons = DEFAULT_LEXICONS
                                      ) -> list:
        """T3 (table.py:833-868): relation per data row from the
        highest-priority relation column; subject = page prefix; object =
        person column cell + href. Deletes lesser relation columns and the
        chosen relation column from the table (mutating, as the reference
        does before ``extractEntity`` runs)."""

        def find_pos(names: list[str], needle: str) -> int:
            for i, n in enumerate(names):
                if needle in n:
                    return i
            return -1

        relations: list = []
        if not self.prefix:
            return relations
        names = self.property_names()
        if not names:
            return relations
        # lexicon-priority-ordered relation keywords present in the header
        # (table.py:781-797)
        found = sorted(
            (idx, kw) for name in names
            for idx, kw in enumerate(lex.property_relationship) if kw in name)
        rel_keywords = [kw for _, kw in found]
        if not rel_keywords:
            return relations
        # FAITHFUL REFERENCE BUG (table.py:853-856): the lesser-relation
        # deletions look positions up in the PRE-DELETION header list, so
        # with ≥3 matching relation columns the shifted index deletes the
        # wrong column or goes out of range (the reference then raises in
        # deleteOneCol and its @except_output kills the page; here the doc
        # is quarantined — same blast radius, visible error).
        for kw in rel_keywords[1:]:
            pos = find_pos(names, kw)
            if pos != -1:
                self.delete_col(pos)
        names = self.property_names()
        persons = self.get_person_col(lex)
        person_hrefs = self._person_href_list(persons)
        idx = find_pos(names, rel_keywords[0])
        rel_col = [str(c.content) for c in self.get_col(idx)]
        self.delete_col(idx)
        line = self.discriminate_property_line_num(self.get_unfold_direction())
        subj_url = self.href_map.get(self.prefix, "")
        for i in range(line, self.row_number):
            if i < len(rel_col) and i < len(person_hrefs):
                append_relation(relations, [self.prefix, subj_url],
                                rel_col[i], list(person_hrefs[i]))
        return relations

    def extract_caption_relationship(self, lex: Lexicons = DEFAULT_LEXICONS
                                     ) -> list:
        """T4 (table.py:870-901): subject = prefix, relation = caption,
        objects = person column; fallback when no person column and >half the
        headers are kin words: objects = row-1 cells, relation = header."""
        relations: list = []
        if not (self.name and self.prefix):
            return relations
        persons = self.get_person_col(lex, remove_header=True)
        subj_url = self.href_map.get(self.prefix, "")
        if not persons:
            names = self.property_names()
            count = sum(1 for n in names
                        if any(cr in n for cr in lex.caption_relationship))
            if count > len(names) / 2:
                # FAITHFUL REFERENCE BUG (table.py:891): row 1 is indexed
                # unconditionally — a table cleared down to one row raises
                # here (reference: page killed via @except_output; here:
                # document quarantined with a visible error row)
                for j in range(self.col_number):
                    cell = self.rows[1][j]
                    content = str(cell.content)
                    url = cell.href.get(content, "")
                    append_relation(relations, [self.prefix, subj_url],
                                    names[j], [content, url])
            return relations
        person_hrefs = self._person_href_list(persons)
        for pair in person_hrefs:
            append_relation(relations, [self.prefix, subj_url],
                            self.name, list(pair))
        return relations

    def dump(self) -> str:
        return "\n".join(
            ",".join(str(c.content) for c in r) for r in self.rows)
