"""Classification lexicons, frozen per run.

The reference re-reads four JSON lexicons from disk at every use
(/root/reference/src/tableExtract/table.py:713,732,740,758,773,1004) and even
mutates one mid-run (``fusionJsonWord``, table.py:799-809), which makes
classification input-order dependent. Here the lexicons are plain frozen
constants loaded once per extractor actor (SURVEY.md §7.0 recorded deviation:
frozen per run; vocabulary is our own, the decision *structure* is identical).

``Lexicons`` is a value object so site/user overrides can be injected into the
pipeline (the reference's pluggable ``urlTableMap/<domain>.json`` site rules,
tableExtractor.py:263-266).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace


# Headers that mark a person-name column (reference: personName.json —
# table.py:1004 __getPersonNameIndex, table.py:773 __isEntityRelationshipTable).
PERSON_NAME_HEADERS: tuple[str, ...] = (
    "人名", "姓名", "本名", "中文名", "英文名", "演员名", "人员", "者", "导演", "名字",
)

# Property names typical of a person-info box (reference: personInfo.json —
# table.py:713 __isPersonInfoTable ≥0.5-overlap test).
PERSON_INFO_PROPERTIES: tuple[str, ...] = (
    "本名", "中文名", "别名", "别称", "字", "号", "所处时代", "民族族群", "民族",
    "国籍", "出生地", "出生日期", "逝世日期", "职业", "主要作品", "主要成就",
    "毕业院校", "信仰", "谥号", "庙号", "陵墓", "在位时间", "年号", "籍贯", "性别",
)

# Property-name substrings that mark a relation column (reference:
# propertyRelationship.json — table.py:732; priority = tuple order,
# table.py:781-797 __getPropertyRelationshipList).
PROPERTY_RELATIONSHIP: tuple[str, ...] = ("关系", "称谓", "辈分", "亲属")

# Kinship keywords for caption-relation tables (reference:
# captionRelationship.json — table.py:740,758).
CAPTION_RELATIONSHIP: tuple[str, ...] = (
    "女", "兄", "弟", "妹", "友", "妻", "儿", "妃", "亲属", "家族", "父", "母", "子",
)

# Site rule for the non-standard basic-info box (reference:
# urlTableMap/baike.baidu.com.json, consumed at tableExtractor.py:263-266).
DEFAULT_SITE_RULE: dict = {"class": "basic-info cmn-clearfix"}

# ---------------------------------------------------------------------------
# Deterministic lexicon POS tagger vocabulary (replaces HanLP + WordMap.pkl,
# SURVEY.md §7.0). Nature codes mirror the reference's trick of summing
# per-token POS codes (TableItem.py:110-116).
# ---------------------------------------------------------------------------

# Tokens tagged as common nouns (nature "n") — heuristic Rule3 passes iff a
# cell in the first two rows/cols contains one (tableExtractor.py:230-254).
NOUN_LEXICON: tuple[str, ...] = (
    "姓名", "人名", "名称", "本名", "中文名", "英文名", "别名", "序号", "国籍",
    "民族", "职业", "作品", "成就", "时代", "日期", "出生地", "院校", "关系",
    "称谓", "辈分", "亲属", "家族", "备注", "简介", "朝代", "谥号", "庙号",
    "年号", "陵墓", "籍贯", "性别", "官职", "头衔", "身份", "角色", "导演",
    "演员", "人物", "属性", "数量", "类型", "地区", "语言",
)

# Tokens tagged as person names (nature "nr") — used by the word-type
# tie-break (table.py:347-354) and URL person-name recognition (M20).
NAME_LEXICON: tuple[str, ...] = (
    "孔丘", "孔鲤", "孔伋", "颜回", "仲由", "端木赐", "曾参", "闵损", "冉耕",
    "宰予", "言偃", "卜商", "颛孙师", "李渊", "李世民", "李治", "李隆基",
    "赵匡胤", "赵匡义", "赵廷美", "杜氏", "王氏", "陈氏", "刘氏",
)

# nature → additive code (the reference sums WordMap.pkl codes per token,
# TableItem.py:110-116; our codes are fixed primes so sums are discriminative).
NATURE_CODES: dict[str, int] = {
    "n": 1,      # common noun
    "nr": 3,     # person name
    "m": 7,      # number
    "nx": 13,    # latin/ascii token
    "w": 17,     # punctuation
    "x": 23,     # unknown / other CJK run
}


@dataclass(frozen=True)
class Lexicons:
    """Frozen classification vocabulary for one extraction run."""

    person_name_headers: tuple[str, ...] = PERSON_NAME_HEADERS
    person_info_properties: tuple[str, ...] = PERSON_INFO_PROPERTIES
    property_relationship: tuple[str, ...] = PROPERTY_RELATIONSHIP
    caption_relationship: tuple[str, ...] = CAPTION_RELATIONSHIP
    site_rule: tuple = tuple(sorted(DEFAULT_SITE_RULE.items()))
    noun_lexicon: tuple[str, ...] = NOUN_LEXICON
    name_lexicon: tuple[str, ...] = NAME_LEXICON

    @property
    def site_rule_dict(self) -> dict:
        return dict(self.site_rule)

    def register_site_rule(self, rule: dict) -> "Lexicons":
        """The pluggable site-adapter hook (SURVEY §2.8, reference
        ``urlTableMap/<domain>.json`` consumed at tableExtractor.py:263):
        a NEW frozen Lexicons with ``rule``'s attr→value entries merged
        into the active basic-info site rule — pass it to
        ``ExtractChunks(lexicons=...)`` / the pipeline. Per-domain
        dispatch is one frozen Lexicons per domain, built upstream (the
        reference keys its JSON files by domain the same way).
        Immutability keeps the once-per-worker cache sound (a mutated
        shared instance would desynchronize workers mid-run)."""
        rules = self.site_rule_dict
        rules.update(rule)
        return replace(self, site_rule=tuple(sorted(rules.items())))

    @staticmethod
    def from_json(path: str) -> "Lexicons":
        """Load overrides from a JSON file: {field_name: [values...]}."""
        with open(path, "r", encoding="utf-8") as f:
            raw = json.load(f)
        kwargs = {}
        for key in ("person_name_headers", "person_info_properties",
                    "property_relationship", "caption_relationship",
                    "noun_lexicon", "name_lexicon"):
            if key in raw:
                kwargs[key] = tuple(raw[key])
        if "site_rule" in raw:
            kwargs["site_rule"] = tuple(sorted(raw["site_rule"].items()))
        return Lexicons(**kwargs)


DEFAULT_LEXICONS = Lexicons()
