"""Property-based tests (hypothesis): parser equivalence/robustness on
adversarial input, table-model invariants, cleaner idempotence, and
extraction quarantine (never crashes, always deterministic)."""
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from wtes_ray.cleaners import clean_cell_text, clear_name_or_rel
from wtes_ray.dom import parse_html, parse_html_stdlib
from wtes_ray.extract import extract_document_safe
from wtes_ray.tablemodel import Cell, Table

# -- HTML soup strategies ---------------------------------------------------

_tag_names = st.sampled_from(["div", "p", "span", "table", "tr", "td", "th",
                              "ul", "li", "a", "b", "dl", "dt", "dd"])
_text = st.text(alphabet=string.ascii_letters + string.digits + " 中文名姓名兄弟",
                max_size=12)


@st.composite
def html_fragment(draw, depth=0):
    if depth > 3 or draw(st.booleans()):
        return draw(_text)
    tag = draw(_tag_names)
    n = draw(st.integers(0, 3))
    inner = "".join(draw(html_fragment(depth + 1)) for _ in range(n))
    attr = ""
    if draw(st.booleans()):
        attr = f' class="{draw(_text)}"'
    if draw(st.booleans()):
        attr += f' href="/x/{draw(st.integers(0, 99))}"'
    return f"<{tag}{attr}>{inner}</{tag}>"


@settings(max_examples=150, deadline=None)
@given(html_fragment())
def test_fast_parser_equals_stdlib_on_random_html(html):
    """Well-formed random fragments: tree-identical to the stdlib parser."""
    from tests.test_dom import _tree_eq

    assert _tree_eq(parse_html(html), parse_html_stdlib(html)) is None


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="<>/ab='\"& x!-", max_size=60))
def test_fast_parser_never_crashes_on_garbage(garbage):
    root = parse_html(garbage)
    root.find_all("table")   # traversal works
    _ = root.text


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_cleaners_idempotent(s):
    once = clear_name_or_rel(s)
    assert clear_name_or_rel(once) in ("", once)   # cleaning is stable
    assert clean_cell_text(clean_cell_text(s)) == clean_cell_text(s)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.lists(st.tuples(st.text(max_size=4),
                                   st.integers(1, 4), st.integers(1, 4)),
                         min_size=1, max_size=5),
                min_size=1, max_size=5))
def test_extend_table_always_dense(rows):
    t = Table([[Cell(c, rowspan=rs, colspan=cs) for c, rs, cs in r]
               for r in rows])
    t.extend_table()
    # dense rectangular grid: every row has exactly col_number span-1 cells
    assert all(len(r) == t.col_number for r in t.rows)
    assert all(c.rowspan == 1 and c.colspan == 1
               for r in t.rows for c in r)
    assert t.is_correct()


@settings(max_examples=80, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["孔丘", "颜回", "杜氏", "王氏", "张三"]),
              st.sampled_from(["", "u1", "u2", "u1/longer"]),
              st.dictionaries(st.sampled_from(["a", "b", "c"]),
                              st.text(max_size=3), max_size=2)),
    max_size=8))
def test_fusion_invariants(specs):
    """Fusion invariants: every non-氏 source is either merged into a node
    or dropped by the documented TypeError-parity rule; n_sources never
    exceeds the group size; first-wins means node props ⊆ union of inputs."""
    from wtes_ray.fusion import fuse_entity_group

    group = [{"doc_id": f"d{i}", "seq": 0, "subject": "同名",
              "subject_url": url, "props": dict(props)}
             for i, (_, url, props) in enumerate(specs)]
    nodes = fuse_entity_group(group)
    assert sum(n["n_sources"] for n in nodes) <= len(group)
    all_keys = {k for g in group for k in g["props"]}
    for n in nodes:
        assert set(n["props"]) <= all_keys
    # determinism under input order permutation
    assert fuse_entity_group(list(reversed(group))) == nodes


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["html", "media"]),
                          st.text(alphabet="<>abc 姓名/td", max_size=30)),
                max_size=6))
def test_extraction_never_crashes(spans_spec):
    spans = [{"kind": k, "text": t if k == "html" else "",
              "media_ref": "m" if k == "media" else "", "offset": i}
             for i, (k, t) in enumerate(spans_spec)]
    r1 = extract_document_safe("https://x/item/%E5%AD%94%E5%AD%90/1", spans)
    r2 = extract_document_safe("https://x/item/%E5%AD%94%E5%AD%90/1", spans)
    assert r1.spans == r2.spans          # deterministic
    assert r1.error == r2.error


# -- PDF writer/reader round trip --------------------------------------------

@given(st.text(max_size=400))
@settings(max_examples=150, deadline=None)
def test_pdf_roundtrip_is_lossless_for_arbitrary_unicode(t):
    """text_to_pdf slices lines at arbitrary char boundaries and switches
    per line between literal and UTF-16BE hex strings; pdf_text must
    invert the composition exactly for ANY unicode input."""
    from wtes_ray.pdf_io import pdf_text, text_to_pdf
    assert pdf_text(text_to_pdf(t)) == t
    assert pdf_text(text_to_pdf(t, compress=False)) == t


# -- Curation-oracle parity kernels ------------------------------------------

@given(st.text(max_size=30), st.text(alphabet=string.ascii_lowercase
                                     + string.digits, max_size=10))
@settings(max_examples=100, deadline=None)
def test_key_hash_equals_duckdb_md5_number_lower(key, salt):
    """The entire curation family's oracle parity rests on
    _key_u64(salt:key) == DuckDB md5_number_lower('salt:' || key) —
    pin it for ARBITRARY unicode keys, not just integer doc ids."""
    import duckdb

    from wtes_ray.ops.curate import _key_u64

    got = int(_key_u64([key], salt)[0])
    want = duckdb.execute("SELECT md5_number_lower(? || ?)",
                          [f"{salt}:", key]).fetchone()[0]
    assert got == want


@given(st.lists(st.sampled_from("abc"), max_size=12),
       st.lists(st.sampled_from("abc"), min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_decontaminate_window_equals_sql_substring_form(tokens, gram):
    """decontaminate's token-window match must equal the oracle's
    space-joined substring-with-boundary-guards formulation for every
    token stream / gram combination (the documented equivalence)."""
    n = len(gram)
    window_hit = any(tuple(tokens[j:j + n]) == tuple(gram)
                     for j in range(len(tokens) - n + 1))
    sql_hit = f" {' '.join(gram)} " in f" {' '.join(tokens)} "
    assert window_hit == sql_hit


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=40))
def test_bigram_ids_ascii_fast_path_equals_ord_path(s):
    """_bigram_ids' byte fast path must equal the unicode ord formula on
    any string (ASCII strings take the byte path; the ids must not
    depend on which arm ran)."""
    import numpy as np

    from wtes_ray.ops.text import _BIGRAM_BASE, _bigram_ids

    got = _bigram_ids(s)
    codes = [ord(c) for c in s]
    want = np.array([a * _BIGRAM_BASE + b
                     for a, b in zip(codes, codes[1:])], dtype=np.int64)
    assert (got == want).all()


_pii_bits = st.lists(st.sampled_from(
    ["lorem", "ipsum 42", "a.b@c.org", "x_9@mail-host.co.uk",
     "+1 555-123-4567", "12 345-678-9012", "10.0.0.1", "255.255.255.0",
     "not@an", "1.2.3", "x@y.z", "@@", " . "]), max_size=8)


@settings(max_examples=100, deadline=None)
@given(_pii_bits)
def test_pii_patterns_python_equals_duckdb(bits):
    """The PII scrub is pinned pattern-for-pattern to DuckDB RE2: the
    sequential Python subn chain must equal nested regexp_replace on
    texts mixing real PII, near-misses, and noise."""
    import duckdb

    from wtes_ray.ops.text import PII_PATTERNS
    import re as _re

    text = " ".join(bits)
    py = text
    for p, r in PII_PATTERNS:
        py = _re.sub(_re.compile(p, _re.ASCII), r, py)
    (em, em_r), (ph, ph_r), (ip, ip_r) = PII_PATTERNS
    sql = duckdb.sql(
        "SELECT regexp_replace(regexp_replace(regexp_replace($t, "
        f"'{em}', '{em_r}', 'g'), '{ph}', '{ph_r}', 'g'), "
        f"'{ip}', '{ip_r}', 'g')", params={"t": text}).fetchone()[0]
    assert py == sql


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=60),
       st.floats(min_value=0.01, max_value=1.0))
def test_percentile_rank_rule_matches_duckdb(vals, q):
    """exact_quantiles' rank rule — value at 1-based rank ceil(q·n) of
    the sorted column — must be PERCENTILE_DISC's, pinned directly
    against DuckDB on random inputs."""
    import math

    import duckdb
    import numpy as np

    s = np.sort(np.asarray(vals, dtype=np.float64))
    mine = float(s[max(1, math.ceil(q * len(s))) - 1])
    want = duckdb.sql(
        "SELECT PERCENTILE_DISC($q) WITHIN GROUP (ORDER BY v) "
        "FROM (SELECT unnest($v) AS v)",
        params={"q": q, "v": list(map(float, vals))}).fetchone()[0]
    assert mine == want
