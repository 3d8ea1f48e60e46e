"""Deterministic synthetic baike-shaped document generator.

Produces the BASELINE.json ``input_hint`` table — ``(doc_id: string,
spans: list<struct<kind, text, media_ref, offset>>)`` — with page content
covering every locator/normalizer in SURVEY.md §2 (see FIXTURES.md §1 for the
block inventory): basic-info ``dl/dt/dd`` boxes, ``th``-headed rosters with
rowspan/colspan merges + 序号 column + ``[n]`` refs + NBSP, caption-relation
tables, property-relation tables, ul-list tables, COL-direction tables,
script/style/comment/article/code noise, link-farm tables that must fail the
heuristics, trailing 参考资料 rows, and interleaved media spans.

Everything is a pure function of ``(seed, doc index)`` — no external data, no
wall clock — so the same inputs regenerate bit-identically on every node and
every round (the reference's ``time+random`` record ids, tableExtractor.py:442,
are exactly the nondeterminism we must not reproduce).

Each html span is a self-contained block-level fragment: the salted mega-doc
split (pipeline.py) relies on this invariant (extract.py module docstring).
"""

from __future__ import annotations

import random
from urllib.parse import quote

import pyarrow as pa

from .schema import DOCUMENTS

SURNAMES = "赵钱孙李周吴郑王冯陈褚卫蒋沈韩杨朱秦尤许何吕施张孔曹严华金魏陶姜"
GIVEN = "伟芳娜敏静丽强磊军洋勇艳杰娟涛明超秀兰霞平刚桂英德世民治隆基匡胤廷美"
PROPS = ["别名", "国籍", "民族", "出生地", "出生日期", "逝世日期", "职业",
         "主要作品", "主要成就", "毕业院校", "谥号", "庙号", "年号", "籍贯"]
RELS = ["父亲", "母亲", "长子", "次子", "兄", "弟", "妹", "妻"]
CAPTIONS_KIN = ["兄弟姐妹", "亲属成员", "家族成员", "子女"]
OCCUPATIONS = ["政治家", "军事家", "思想家", "教育家", "诗人", "画家"]
ERAS = ["唐朝", "宋朝", "明朝", "春秋", "战国", "五代"]


def _name(rng: random.Random) -> str:
    return rng.choice(SURNAMES) + "".join(
        rng.choice(GIVEN) for _ in range(rng.randint(1, 2)))


def _href(name: str, rng: random.Random) -> str:
    return f"/item/{quote(name)}/{rng.randint(1000, 99999)}"


def _basic_info_box(rng: random.Random, subject: str) -> str:
    first = rng.choice(["本名", "中文名", "姓名"])  # 姓名 ⇒ non-person box path
    pairs = [(first, subject + ("[1]" if rng.random() < 0.5 else ""))]
    for prop in rng.sample(PROPS, rng.randint(4, 8)):
        val = rng.choice(ERAS) + ("\xa0" if rng.random() < 0.3 else "")
        if rng.random() < 0.2:
            val += "<br/>" + rng.choice(OCCUPATIONS)
        pairs.append((prop, val))
    dls = "".join(
        f"<dl><dt>{k}</dt><dd>{v}</dd></dl>" for k, v in pairs)
    return f'<div class="basic-info cmn-clearfix">{dls}</div>'


def _roster_table(rng: random.Random, n_rows: int | None = None) -> str:
    """th-headed roster with 序号 column, hrefs, [n] refs, optional
    rowspan merge and a trailing 参考资料 row."""
    n_rows = n_rows if n_rows is not None else rng.randint(3, 8)
    title = rng.choice(["主要弟子", "部下名录", "历任官员", "主要成员"])
    head = "<tr><th>序号</th><th>姓名</th><th>职业</th><th>朝代</th></tr>"
    body = []
    merge_at = rng.randint(1, max(1, n_rows - 1)) if rng.random() < 0.5 else -1
    for r in range(1, n_rows + 1):
        nm = _name(rng)
        cite = f"[{rng.randint(1, 30)}]" if rng.random() < 0.4 else ""
        occ = rng.choice(OCCUPATIONS)
        era_cell = (f'<td rowspan="2">{rng.choice(ERAS)}</td>'
                    if r == merge_at else
                    ("" if r == merge_at + 1 and merge_at > 0
                     else f"<td>{rng.choice(ERAS)}</td>"))
        body.append(
            f'<tr><td>{r}</td><td><a href="{_href(nm, rng)}">{nm}</a>{cite}'
            f"</td><td>{occ}\xa0</td>{era_cell}</tr>")
    refs = ("<tr><td>参考资料</td><td>参考资料[2]</td><td>参考资料</td>"
            "<td>参考资料</td></tr>" if rng.random() < 0.4 else "")
    return (f'<div><div class="para-title"><span class="title-text">{title}'
            f"</span></div></div>"
            f"<table><thead>{head}</thead><tbody>{''.join(body)}{refs}"
            f"</tbody></table>")


def _caption_rel_table(rng: random.Random) -> str:
    cap = rng.choice(CAPTIONS_KIN)
    rows = []
    for _ in range(rng.randint(2, 5)):
        nm = _name(rng)
        rows.append(f'<tr><td><a href="{_href(nm, rng)}">{nm}</a></td>'
                    f"<td>{rng.choice(ERAS)}人，{rng.choice(OCCUPATIONS)}。"
                    f"</td></tr>")
    return (f"<table><caption>{cap}</caption>"
            f"<tr><th>姓名</th><th>简介</th></tr>{''.join(rows)}</table>")


def _property_rel_table(rng: random.Random) -> str:
    rows = []
    for rel in rng.sample(RELS, rng.randint(2, 5)):
        nm = _name(rng)
        rows.append(f"<tr><td>{rel}</td>"
                    f'<td><a href="{_href(nm, rng)}">{nm}</a></td>'
                    f"<td>{rng.choice(ERAS)}</td></tr>")
    return ("<table><tr><th>关系</th><th>姓名</th><th>朝代</th></tr>"
            f"{''.join(rows)}</table>")


def _ul_list_table(rng: random.Random) -> str:
    title = rng.choice(CAPTIONS_KIN)
    lis = []
    for _ in range(rng.randint(2, 4)):
        nm = _name(rng)
        lis.append(f"<li><span>▪</span><span>{rng.choice(RELS)}</span>"
                   f'<span><a href="{_href(nm, rng)}">{nm}</a></span></li>')
    return (f'<table><tr><td class="normal title-td">{title}</td></tr>'
            f"<tr><td><ul>{''.join(lis)}</ul></td></tr></table>")


def _col_direction_table(rng: random.Random, subject: str) -> str:
    rows = [f"<tr><th>中文名</th><td>{subject}</td></tr>"]
    for prop in rng.sample(PROPS, rng.randint(3, 6)):
        rows.append(f"<tr><th>{prop}</th><td>{rng.choice(ERAS)}</td></tr>")
    return f"<table>{''.join(rows)}</table>"


def _noise_block(rng: random.Random) -> str:
    kind = rng.randint(0, 4)
    if kind == 0:
        return ("<script>var x = 1;</script><style>.a{color:red}</style>"
                "<!-- comment --><p>正文段落。</p>")
    if kind == 1:   # link farm — must fail heuristic Rule2
        links = "".join(
            f'<a href="/item/x{i}">链接{i}</a>' for i in range(20))
        return (f"<table><tr><td>{links}</td><td>a</td></tr>"
                f"<tr><td>b</td><td>c</td></tr></table>")
    if kind == 2:   # 1×N table — fails isNormal after extend
        cells = "".join(f"<td>词{i}</td>" for i in range(4))
        return f"<table><tr>{cells}</tr></table>"
    if kind == 3:   # no nouns in first rows — fails Rule3
        return ("<table><tr><td>123</td><td>456</td></tr>"
                "<tr><td>789</td><td>012</td></tr></table>")
    return "<article>文章内容被移除</article><code>print()</code><p>说明。</p>"


def generate_document(index: int, seed: int = 42,
                      giant: bool = False) -> dict:
    """One synthetic document row, pure in (seed, index)."""
    rng = random.Random((seed << 20) ^ index)
    subject = _name(rng)
    doc_id = f"https://baike.baidu.com/item/{quote(subject)}/{1000 + index}"
    blocks: list[str] = [f"<h1>{subject}</h1>"]
    blocks.append(_basic_info_box(rng, subject))
    if giant:
        for _ in range(rng.randint(40, 60)):
            blocks.append(_roster_table(rng, n_rows=rng.randint(30, 60)))
    else:
        pool = [_roster_table, _caption_rel_table, _property_rel_table,
                _ul_list_table]
        for _ in range(rng.randint(1, 4)):
            blocks.append(rng.choice(pool)(rng))
        if rng.random() < 0.5:
            blocks.append(_col_direction_table(rng, subject))
    blocks.append(_noise_block(rng))
    rng.shuffle(blocks)

    spans: list[dict] = []
    offset = 0
    for block in blocks:
        spans.append({"kind": "html", "text": block, "media_ref": "",
                      "offset": offset})
        offset += 1
        if rng.random() < 0.25:
            spans.append({"kind": "media", "text": "",
                          "media_ref": f"img://{1000 + index}/{offset}.jpg",
                          "offset": offset})
            offset += 1
    return {"doc_id": doc_id, "spans": spans}


def generate_batch(indices, seed: int = 42,
                   giant_fraction: float = 0.0) -> pa.Table:
    """Vector form for ``map_batches`` over an index range: returns an Arrow
    table in the DOCUMENTS schema. ``giant_fraction`` of docs (chosen
    deterministically by index hash) are mega-docs for the skew path."""
    rows = []
    for i in indices:
        i = int(i)
        giant = giant_fraction > 0 and (i * 2654435761 % 1000) < int(
            giant_fraction * 1000)
        rows.append(generate_document(i, seed=seed, giant=giant))
    return pa.Table.from_pylist(rows, schema=DOCUMENTS)


def write_documents(path: str, n_docs: int, seed: int = 42,
                    giant_fraction: float = 0.0) -> None:
    """Driver-side writer for small test inputs (tests, goldens). Bench-scale
    inputs are generated in parallel via the Ray path in pipeline.py."""
    import pyarrow.parquet as pq

    table = generate_batch(range(n_docs), seed=seed,
                           giant_fraction=giant_fraction)
    pq.write_table(table, path)
