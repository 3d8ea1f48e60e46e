"""TRUE reference parity: run this engine's per-table extraction over the
reference's OWN golden data (real Baidu-Baike pages' located tables,
file/tablePkl/*.pkl) with the reference's exact lexicons, and compare
against the reference's OWN extracted entity/relation lists.

This is the strongest conformance evidence available without the
reference's runtime (SURVEY §5.1: the golden artifacts are de-facto
conformance data)."""
import pytest

from tests.ref_fixtures import PAGES, REF_LEXICONS, load_page
from wtes_ray.extract import subject_from_doc_id


def run_page(fname: str):
    url = PAGES[fname]
    subject = subject_from_doc_id(url)
    tables, expected = load_page(fname)
    got = []
    for table in tables:
        # per-table pipeline, exactly as extract_document does
        table.href_map[subject] = url
        table.extend_table()
        table.prefix = subject
        if not (table.is_normal() and table.is_correct()):
            continue
        if table.get_unfold_direction() == "COL":
            table = table.flip()
        table.clear_table()
        ents, rels = table.extract_entity_relationship(REF_LEXICONS)
        if ents or rels:
            got.append([ents, rels])
    return got, expected


@pytest.mark.parametrize("fname", list(PAGES))
def test_reference_golden_er_parity(fname):
    got, expected = run_page(fname)
    assert len(got) == len(expected), (
        f"{fname}: {len(got)} producing tables vs reference "
        f"{len(expected)}")
    for i, (g, e) in enumerate(zip(got, expected)):
        assert g[0] == e[0], f"{fname} table-output {i}: entities differ"
        assert g[1] == e[1], f"{fname} table-output {i}: relations differ"
