"""Document enrichment: extractive summarizer, index-criteria filter,
withdrawn scoring, external-service stubs.

Ports of the coherencebot plugins (behavioral, not literal):
- TextSummarizer (src/java/net/coherentdigital/summary/SummaryTool.java:
  75-125, TextSummarizer.java clean() rules): sentence intersection
  matrix (common words / mean sentence length), row-sum scores, top-k
  by score re-emitted in reading order; summary cleaning removes URLs,
  non-printables and squeezes whitespace.
- index-criteria (src/plugin/index-criteria/.../CriteriaIndexer.java:
  52,87-99,135-250,555): reject docs shorter than
  ``index.criteria.minlength`` (4000) chars; best-title selection among
  cleaned title / heading / longest multi-word anchor with an
  algorithm tag.
- scoring-withdrawn (src/plugin/scoring-withdrawn, TestWithdrawnScoringFilter):
  seeds carrying ``withdrawn=true`` metadata mark the frontier row
  STATUS_DB_WITHDRAWN so updatedb/readers can purge them.
- parse-thumb / parse-translate / language-identifier call external
  services in the reference (thum.io, AWS Translate/Comprehend) — here
  deterministic stubs behind the same stage interface.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

_URL_RE = re.compile(r"https?://[-a-zA-Z0-9+&@#/%?=~_|!:,.;]*[-a-zA-Z0-9+&@#/%=~_|]")
_NONPRINT_RE = re.compile(r"[\x00-\x1f\x7f-\x9f]")
_WS_RE = re.compile(r"\s+")
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")

MAX_SUMMARY_SENTENCES = 5  # TextSummarizer.MAX_SUMMARY_LENGTH


def clean_summary(text: str) -> str:
    """TextSummarizer.clean(): strip links, non-printables, squeeze ws."""
    if not text:
        return text
    text = _URL_RE.sub(" ", text)
    text = _NONPRINT_RE.sub(" ", text)
    return _WS_RE.sub(" ", text).strip()


def summarize(text: str, count: int = MAX_SUMMARY_SENTENCES) -> str:
    """SummaryTool: intersection-matrix extractive summary."""
    if not text:
        return ""
    sentences = [s.strip() for s in _SENT_SPLIT.split(text) if s.strip()]
    n = len(sentences)
    if n <= count:
        return clean_summary(" ".join(sentences))
    words = [set(s.lower().split()) for s in sentences]
    lens = np.array([max(1, len(s.split())) for s in sentences], dtype=np.float64)
    scores = np.zeros(n)
    for i in range(n):
        for j in range(i + 1, n):
            inter = len(words[i] & words[j]) / ((lens[i] + lens[j]) / 2.0)
            scores[i] += inter
            scores[j] += inter
    top = np.sort(np.argsort(-scores, kind="stable")[:count])  # reading order
    return clean_summary(" ".join(sentences[i] for i in top))


# ---------------------------------------------------------------------------
# index-criteria
# ---------------------------------------------------------------------------

ANCHOR_JUNK = ("click here", "read more", "download", "pdf", "link", "here")
_PUNCT_RE = re.compile(r"[^\w\s]")


def _clean_field(v: str, max_length: int = 250) -> str:
    v = _NONPRINT_RE.sub("", v)
    return v[:max_length].strip()


def best_title(
    title: str | None, heading: str | None, anchors: list[str] | None
) -> tuple[str | None, str]:
    """CriteriaIndexer.bestTitle (CriteriaIndexer.java:135-250)."""
    clean_t = _clean_field(title) if title else None
    clean_h = _clean_field(heading) if heading else None
    clean_a = None
    for a in anchors or []:
        if not isinstance(a, str):
            continue
        low = a.lower()
        if any(j in low for j in ANCHOR_JUNK):
            continue
        if " " not in a:
            continue  # skip single-word anchors
        if clean_a is None or len(a) > len(clean_a):
            clean_a = a
    if clean_a:
        clean_a = _clean_field(clean_a)

    if clean_t and clean_h:
        mt = _PUNCT_RE.sub(" ", clean_t).strip()
        mh = _PUNCT_RE.sub(" ", clean_h).strip()
        if mt == mh:
            return clean_t, "title"
        t_words = len(mt.split())
        t_upper = sum(c.isupper() for c in mt)
        t_lower = sum(c.islower() for c in mt)
        if t_words > 7 and t_upper > 0 and t_lower > 5:
            return clean_t, "title"
        return clean_h, "heading"
    if clean_t:
        return clean_t, "title"
    if clean_h:
        return clean_h, "heading"
    if clean_a:
        return clean_a, "anchor"
    return None, "none"


def criteria_filter(df: pd.DataFrame, min_length: int = 4000, text_col: str = "text") -> np.ndarray:
    """index.criteria.minlength gate: reject short documents."""
    return df[text_col].fillna("").str.len().to_numpy() >= min_length


# ---------------------------------------------------------------------------
# scoring-withdrawn
# ---------------------------------------------------------------------------

WITHDRAWN_KEY = "withdrawn"


def apply_withdrawn(df: pd.DataFrame, status_col: str = "status", withdrawn_code: int = 0x09) -> pd.DataFrame:
    """Mark rows whose metadata carries withdrawn=true as DB_WITHDRAWN."""
    if "metadata" not in df.columns or len(df) == 0:
        return df
    meta = df["metadata"]

    def _is_withdrawn(m) -> bool:
        if not m or not isinstance(m, str):
            return False
        try:
            return str(json.loads(m).get(WITHDRAWN_KEY, "")).lower() == "true"
        except (ValueError, AttributeError):
            return False

    mask = meta.map(_is_withdrawn).to_numpy(dtype=bool)
    if mask.any():
        df = df.copy()
        df.loc[mask, status_col] = withdrawn_code
    return df


# ---------------------------------------------------------------------------
# external-service stubs (thum.io / AWS Translate / Comprehend analogues)
# ---------------------------------------------------------------------------


def thumbnail_stub(url: str) -> str:
    """parse-thumb: deterministic thumbnail media_ref (service stub)."""
    import hashlib

    h = hashlib.md5(url.encode()).hexdigest()[:12]
    return f"http://thumbs.example/{h}.png"


def translate_title_stub(title: str, lang: str) -> str:
    """parse-translate: non-English titles 'translated' deterministically."""
    if lang == "en" or not title:
        return title
    return f"[{lang}->en] {title}"
