"""Safe loader for the reference's golden pickles
(/root/reference/file/tablePkl/*.pkl — real Baidu-Baike pages' located
tables + the reference's own extracted entity/relation lists).

The pickles reference the reference's classes; a restricted unpickler maps
them onto attribute-bag stubs (find_class whitelist — NO code execution) and
converts them to this engine's Table model. The reference's exact lexicon
JSONs (file/configuration/PersonTable/*.json) are mirrored as
``REF_LEXICONS`` so classification parity is vocabulary-exact.
"""

from __future__ import annotations

import builtins
import pickle

from wtes_ray.lexicons import Lexicons
from wtes_ray.tablemodel import Cell, Table

REF_DIR = "/root/reference/file/tablePkl"

# exact mirrors of /root/reference/file/configuration/PersonTable/*.json
REF_LEXICONS = Lexicons(
    person_name_headers=("人名", "姓名", "本名", "中文名", "英文名",
                         "演员名", "人员", "者", "导演"),
    person_info_properties=("东北李", "李", "欧洲李", "中文名", "樱桃李",
                            "乌荆子李", "杏李", "黑刺李"),
    property_relationship=("关系", "称谓", "辈分", "亲属"),
    caption_relationship=("女", "兄", "弟", "妹", "友", "妻", "儿", "妃",
                          "亲属", "家族"),
)

PAGES = {
    "孔子2021_19_17_0256.pkl":
        "https://baike.baidu.com/item/%E5%AD%94%E5%AD%90/1584",
    "瞿颖2021_19_17_0480.pkl":
        "https://baike.baidu.com/item/%E7%9E%BF%E9%A2%96",
    "燕明刀2021_19_17_1039.pkl":
        "https://baike.baidu.com/item/%E7%87%95%E6%98%8E%E5%88%80",
}


class _Stub:
    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)


class _TableStub(_Stub):
    pass


class _ItemStub(_Stub):
    pass


_ALLOWED = {
    ("src.tableExtract.table", "Table"): _TableStub,
    ("src.tableExtract.TableItem", "TableItem"): _ItemStub,
}
_SAFE_BUILTINS = {"dict", "list", "str", "int", "float", "set", "tuple"}


class _SafeUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if (module, name) in _ALLOWED:
            return _ALLOWED[(module, name)]
        if module == "builtins" and name in _SAFE_BUILTINS:
            return getattr(builtins, name)
        raise pickle.UnpicklingError(f"forbidden global {module}.{name}")


def load_page(fname: str):
    """Returns (tables: list[Table], expected_ers: list[[entities, rels]])."""
    with open(f"{REF_DIR}/{fname}", "rb") as f:
        table_stubs, ers = _SafeUnpickler(f).load()
    return [_to_table(s) for s in table_stubs], ers


def _to_table(stub: _TableStub) -> Table:
    d = stub.__dict__
    rows = []
    for row in d["cell"]:
        cells = []
        for c in row:
            cd = c.__dict__
            cells.append(Cell(
                content=cd.get("content", ""),
                rowspan=int(cd.get("rowspan", 1) or 1),
                colspan=int(cd.get("colspan", 1) or 1),
                href=dict(cd.get("href") or {}),
                img=list(cd.get("img") or []),
                tag_name=cd.get("tagName")))
        rows.append(cells)
    t = Table(rows, name=str(d.get("name")),
              unfold_direction=d.get("unfoldDirection"))
    t.table_type = d.get("tableType")
    t.href_map = dict(d.get("hrefMap") or {})
    return t
