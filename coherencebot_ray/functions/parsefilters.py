"""HtmlParseFilter plugin chain (parse/HtmlParseFilters.java): ordered,
registered post-parse document enrichers — the reference runs each
parser-plugin filter over every parsed page; here each plugin is a
vectorized pass over a docs batch (doc_id, url, spans, ...).

Plugins (coherencebot parser-filter family):
- summary    text-summarizer (net/coherentdigital/summary/SummaryTool):
             extractive summary column from the text spans
- langid     language-identifier: lang column (local heuristic model —
             the reference calls AWS Comprehend)
- thumb      parse-thumb (ThumbnailParseFilter.java:173-179): thumbnail
             media_ref appended as a kind="media" span (deterministic
             service stub; thum.io in the reference)
- translate  parse-translate (TranslateParser.java:41-56): non-English
             titles translated into title_en (deterministic stub; AWS
             Translate in the reference)

Each plugin's ``apply(df, cfg) -> df`` may add columns or rewrite
``spans``; the chain threads the frame through in registration order,
exactly like HtmlParseFilters.filter's sequential loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _doc_text(spans) -> str:
    return " ".join(
        s["text"] for s in spans if s.get("kind") in ("title", "heading", "text")
    ) if isinstance(spans, (list, np.ndarray)) else ""


def _doc_title(spans) -> str:
    if not isinstance(spans, (list, np.ndarray)):
        return ""
    for s in spans:
        if s.get("kind") == "title":
            return s.get("text", "")
    return ""


class HtmlParseFilter:
    name = "base"

    def apply(self, df: pd.DataFrame, cfg) -> pd.DataFrame:
        return df


class SummaryParseFilter(HtmlParseFilter):
    name = "summary"

    def apply(self, df, cfg):
        from .enrich import summarize

        df = df.copy()
        df["summary"] = df["spans"].map(lambda sp: summarize(_doc_text(sp)))
        return df


class LangIdParseFilter(HtmlParseFilter):
    name = "langid"

    def apply(self, df, cfg):
        from ..ops.text import langid

        df = df.copy()
        df["lang"] = langid(df["spans"].map(_doc_text)).to_numpy()
        return df


class ThumbParseFilter(HtmlParseFilter):
    name = "thumb"

    def apply(self, df, cfg):
        from .enrich import thumbnail_stub

        df = df.copy()

        def add_thumb(row):
            spans = list(row["spans"]) if isinstance(row["spans"], (list, np.ndarray)) else []
            spans.append(
                {"kind": "media", "text": "", "media_ref": thumbnail_stub(row["url"]),
                 "offset": len(spans)}
            )
            return spans

        df["spans"] = df.apply(add_thumb, axis=1)
        return df


class TranslateParseFilter(HtmlParseFilter):
    name = "translate"

    def apply(self, df, cfg):
        from .enrich import translate_title_stub

        df = df.copy()
        langs = df["lang"] if "lang" in df.columns else pd.Series("en", index=df.index)
        titles = df["spans"].map(_doc_title)
        df["title_en"] = [
            translate_title_stub(t, l) for t, l in zip(titles, langs)
        ]
        return df


_REGISTRY = {
    c.name: c
    for c in (SummaryParseFilter, LangIdParseFilter, ThumbParseFilter, TranslateParseFilter)
}


def register_parse_filter(name: str, cls) -> None:
    _REGISTRY[name] = cls


class HtmlParseFilters:
    """Ordered chain over a parsed-docs batch."""

    def __init__(self, names=(), cfg=None):
        self.cfg = cfg
        self.chain = [_REGISTRY[n]() for n in names]

    def apply(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        for f in self.chain:
            df = f.apply(df, self.cfg)
        return df
