"""scoring-similarity (src/plugin/scoring-similarity): cosine relevance
of a parsed page against a gold-standard corpus.

Model parity (cosine/Model.java + util/LuceneTokenizer.java):
- tokenize: lowercase alphanumeric runs (StandardTokenizer approx),
  stopword-filtered; word n-grams (shingles) when mingram/maxgram > 1
  (ShingleFilter with unigrams off, like LuceneTokenizer's ngram mode
  which skips stopword removal). DIVERGENCE: the reference Porter-stems
  tokens (PORTERSTEM_FILTER); no stemmer ships in this environment, so
  tokens are unstemmed — scores differ where stems would merge terms.
- DocVector = term-frequency map; cosine = dot / (l2 * l2)
  (DocVector.java, Model.computeCosineSimilarity).
- page score = MAX cosine over the gold-standard docs
  (Model.computeCosineSimilarity:131-144); parse failure -> 1.0
  (CosineSimilarity.setURLScoreAfterParsing's catch).
"""

from __future__ import annotations

import math
import re

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# compact standard English stopword set (Lucene EnglishAnalyzer defaults)
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def tokenize(text: str, mingram: int = 1, maxgram: int = 1,
             stopwords: frozenset = STOPWORDS) -> list[str]:
    toks = _TOKEN_RE.findall((text or "").lower())
    if mingram <= 1 and maxgram <= 1:
        return [t for t in toks if t not in stopwords]
    if mingram > 1 and maxgram < mingram:
        maxgram = mingram  # Model.createDocVector:111-114
    out: list[str] = []
    for n in range(max(mingram, 2), maxgram + 1):
        out.extend(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
    return out


def doc_vector(text: str, mingram: int = 1, maxgram: int = 1) -> dict:
    tv: dict[str, int] = {}
    for t in tokenize(text, mingram, maxgram):
        tv[t] = tv.get(t, 0) + 1
    return tv


def cosine(a: dict, b: dict) -> float:
    if not a or not b:
        return 0.0
    small, big = (a, b) if len(a) <= len(b) else (b, a)
    dot = sum(v * big.get(k, 0) for k, v in small.items())
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb) if na and nb else 0.0


class CosineModel:
    """Gold-standard corpus loaded once (Model.createModel): score a
    page text as the max cosine against the corpus doc vectors."""

    def __init__(self, gold_texts, mingram: int = 1, maxgram: int = 1):
        if isinstance(gold_texts, str):
            gold_texts = [gold_texts]
        self.mingram, self.maxgram = mingram, maxgram
        self.docs = [doc_vector(t, mingram, maxgram) for t in gold_texts]

    def score(self, text: str) -> float:
        dv = doc_vector(text, self.mingram, self.maxgram)
        if not dv or not self.docs:
            return 1.0  # reference catch-all (scores default to 1)
        return max((cosine(dv, g) for g in self.docs), default=1.0)
