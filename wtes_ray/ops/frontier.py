"""Crawl-frontier URL classification (SURVEY §2 M20/M21).

The reference's spider partitions discovered URLs into useful/useless queues
(UrlExtractor.py:23-78: relevance = 1.0 iff the percent-decoded URL tail
segments to a single person-name token, threshold 0.8) and keeps only
``baike.baidu.com/item/`` URLs without a file extension
(WebSpider.py:202-216). In this batch engine the crawl frontier is a
Dataset; the same semantics become vectorized ``map_batches`` classifiers —
the ``bucket`` column replaces the two queue tables.
"""

from __future__ import annotations

from urllib.parse import unquote

import pandas as pd
import ray.data

from ..lexicons import DEFAULT_LEXICONS, Lexicons
from ..wordtype import tagger_for

def is_possible_url(url: str) -> bool:
    """M21 predicate (WebSpider.py:202-216), exact reference semantics:
    https item-page prefix required, and only the LAST path segment may not
    contain '.' (a file extension) — a dot in an inner segment (e.g.
    /item/Web2.0/123) is crawlable."""
    if not url.startswith("https://baike.baidu.com/item/"):
        return False
    return "." not in url.rsplit("/", 1)[-1]


def classify_urls(ds: ray.data.Dataset, *, url_col: str = "url",
                  lex: Lexicons = DEFAULT_LEXICONS) -> ray.data.Dataset:
    """M20: bucket each URL as "useful" (tail is a single person-name token),
    "useless" (crawlable but non-person) or "skip" (not a crawlable item
    page). Stateless vectorized stage; the tagger is built once per worker.
    """

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        tagger = tagger_for(lex)

        def bucket(url: str) -> str:
            if not is_possible_url(url):
                return "skip"
            parts = url.split("/")
            tail = unquote(parts[-1])
            if tail.isdigit() and len(parts) >= 2:
                tail = unquote(parts[-2])
            return "useful" if tagger.is_person_name(tail) else "useless"

        batch["bucket"] = batch[url_col].map(bucket)
        return batch

    return ds.map_batches(classify, batch_format="pandas")
