"""Text analysis ops over a documents table (doc_id, text, ...).

Training-data-pipeline operators (SURVEY.md build mandate): token
counting, quality scoring, language-ID heuristic, document
fingerprinting. All vectorized pandas/numpy `map_batches` bodies; the
definitions are chosen to be mirrorable in ANSI/DuckDB SQL for the
oracle gate (token = ``\\S+`` run, alpha = ``[A-Za-z]``, fingerprint =
md5 of lowercased alnum-only text).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]")

# minimal per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "dans"},
    "es": {"el", "la", "de", "los", "las", "una", "es", "en", "que"},
    "it": {"il", "la", "di", "che", "e", "un", "per", "con", "non"},
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count: number of ``\\S+`` runs."""
    return texts.str.count(r"\S+").fillna(0).to_numpy(dtype=np.int64)


def text_quality(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Quality metrics per document (vectorized).

    Columns: n_tokens, n_alpha, alpha_ratio, digit_ratio, avg_token_len
    (all mirrorable in SQL; ratios rounded to 6 dp for float-stable
    comparison)."""
    t = df[text_col]
    n_chars = t.str.len().fillna(0).to_numpy(dtype=np.int64)
    n_tokens = token_count(t)
    n_alpha = t.str.count(r"[A-Za-z]").fillna(0).to_numpy(dtype=np.int64)
    n_digit = t.str.count(r"[0-9]").fillna(0).to_numpy(dtype=np.int64)
    safe_chars = np.maximum(n_chars, 1)
    safe_tokens = np.maximum(n_tokens, 1)

    def ppm(num, den):
        # parts-per-million as floor(x*1e6 + 0.5): identical in SQL,
        # avoids banker's-vs-half-away rounding divergence
        return np.floor(num / den * 1e6 + 0.5).astype(np.int64)

    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "alpha_ratio_ppm": ppm(n_alpha, safe_chars),
            "digit_ratio_ppm": ppm(n_digit, safe_chars),
            "avg_token_len_ppm": ppm(n_alpha, safe_tokens),
        }
    )


def fingerprint(texts: pd.Series) -> pd.Series:
    """Document fingerprint: md5 hex of lowercase alnum-only text
    (whitespace/punct-robust near-identity)."""
    normed = texts.fillna("").map(lambda s: _NON_ALNUM.sub("", s).lower())
    return normed.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def langid(texts: pd.Series) -> pd.Series:
    """Stopword-profile language ID heuristic (language-identifier plugin
    analogue; the reference calls AWS Comprehend — external service, so
    this is the local model)."""
    profs = list(_LANG_PROFILES.items())

    def _one(s: str) -> str:
        toks = set(s.lower().split()[:200])
        best, best_n = "und", 0
        for lang, stops in profs:
            n = len(toks & stops)
            if n > best_n:
                best, best_n = lang, n
        return best

    return texts.fillna("").map(_one)


def rolling_hashes(texts: pd.Series, window: int = 8, base: int = 257, mod: int = (1 << 61) - 1) -> pd.Series:
    """Rabin-Karp rolling hashes over tokens (content-defined chunking
    primitive); returns list of window hashes per doc."""

    def _one(s: str) -> list[int]:
        toks = s.split()
        hs = [hash(t) & 0xFFFFFFFF for t in toks]
        if len(hs) < window:
            return [sum(hs) % mod] if hs else []
        out = []
        h = 0
        p = pow(base, window - 1, mod)
        for i, v in enumerate(hs):
            h = (h * base + v) % mod
            if i >= window - 1:
                out.append(h)
                h = (h - hs[i - window + 1] * p) % mod
        return out

    return texts.fillna("").map(_one)
