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

# RE2's \s is exactly [\t\n\f\r ] — narrower than Python's even under
# re.ASCII (which adds \v) and than str.split() (Unicode + \v). These
# explicit classes are the oracle-parity tokenizer pattern; every
# tokenizing op routes through ascii_tokens() or TOKEN_PATTERN.
TOKEN_PATTERN = r"[^ \t\n\f\r]+"
WS_PATTERN = r"[ \t\n\f\r]+"
_RE2_TOK = re.compile(TOKEN_PATTERN)


def ascii_tokens(s: str) -> list[str]:
    """Tokenize exactly like RE2's '\\S+' (the oracle semantics):
    str.split() on the C fast path when it provably agrees (pure ASCII
    with no vertical tab — the one ASCII char where the two disagree),
    regex findall otherwise."""
    if s.isascii() and "\x0b" not in s:
        return s.split()
    return _RE2_TOK.findall(s)


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
    return texts.str.count(TOKEN_PATTERN).fillna(0).to_numpy(dtype=np.int64)


# GPT-2-style BPE pre-tokenizer (the public pattern from the GPT-2
# encoder, ASCII classes so Python re and DuckDB RE2 agree exactly):
# contractions, optional-space letter runs, digit runs, punctuation
# runs. Whitespace itself is not counted as a token here.
BPE_TOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
)


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish pre-token count: the number of pre-tokenizer pieces a
    GPT-2-style BPE would split into before merges — the standard cheap
    estimator for LLM token budgets (within the merge factor)."""
    return texts.str.count(BPE_TOKEN_PATTERN).fillna(0).to_numpy(dtype=np.int64)


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


# Gopher quality-rule stopword probe (Rae et al. 2021, "Scaling
# Language Models: ...Gopher", §A2 quality filtering; the paper's
# "must contain ≥2 of" list)
GOPHER_STOPS = frozenset(
    ("the", "be", "to", "of", "and", "that", "have", "with"))


def gopher_quality(df: pd.DataFrame, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: int = 3, max_mean_word_len: int = 10,
                   min_alpha_frac_num: int = 4, min_alpha_frac_den: int = 5,
                   min_stop_hits: int = 2) -> pd.DataFrame:
    """Gopher-style quality rules, fully vectorized and expressed in
    INTEGER arithmetic so the SQL oracle hashes exactly:

      keep = min_words <= wc <= max_words
           AND min_mwl*wc <= chars_total <= max_mwl*wc
           AND alpha_words*den > wc*num      (alpha fraction > num/den)
           AND stop_hits >= min_stop_hits

    Columns: doc_id, word_count, chars_total (non-space chars = sum of
    word lengths), alpha_words (words containing [A-Za-z]), stop_hits
    (Gopher stopword occurrences), keep (0/1). Per-word predicates run
    on ONE exploded Series (two groupby-sums), not a Python loop."""
    texts = df[text_col].fillna("")
    wc = texts.str.count(TOKEN_PATTERN).to_numpy(dtype=np.int64)
    chars_total = texts.str.replace(WS_PATTERN, "", regex=True).str.len().to_numpy(dtype=np.int64)
    words = texts.str.findall(TOKEN_PATTERN).explode().dropna()
    if len(words):
        alpha = words.str.contains("[A-Za-z]", regex=True).groupby(level=0).sum()
        stops = words.str.lower().isin(GOPHER_STOPS).groupby(level=0).sum()
        alpha_words = alpha.reindex(df.index, fill_value=0).to_numpy(dtype=np.int64)
        stop_hits = stops.reindex(df.index, fill_value=0).to_numpy(dtype=np.int64)
    else:
        alpha_words = np.zeros(len(df), dtype=np.int64)
        stop_hits = np.zeros(len(df), dtype=np.int64)
    keep = (
        (wc >= min_words) & (wc <= max_words)
        & (chars_total >= min_mean_word_len * wc)
        & (chars_total <= max_mean_word_len * wc)
        & (alpha_words * min_alpha_frac_den > wc * min_alpha_frac_num)
        & (stop_hits >= min_stop_hits)
    )
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "word_count": wc,
            "chars_total": chars_total,
            "alpha_words": alpha_words,
            "stop_hits": stop_hits,
            "keep": keep.astype(np.int64),
        }
    )


def c4_page_filters(df: pd.DataFrame, text_col: str = "text",
                    min_sentences: int = 5) -> pd.DataFrame:
    """C4 page-level cleaning rules (Raffel et al. 2020 §2.2, public):
    drop pages with fewer than ``min_sentences`` sentences (terminal
    punctuation marks stand in for sentence boundaries), pages
    containing "lorem ipsum", and pages containing a curly brace
    (code). All counts/flags integer so the SQL oracle hashes exactly.

    Columns: doc_id, n_sentences, has_lorem, has_brace, keep (0/1)."""
    texts = df[text_col].fillna("")
    n_sent = texts.str.count(r"[.!?]").to_numpy(dtype=np.int64)
    lorem = texts.str.lower().str.contains("lorem ipsum", regex=False).to_numpy(dtype=bool)
    brace = texts.str.contains("{", regex=False).to_numpy(dtype=bool)
    keep = (n_sent >= min_sentences) & ~lorem & ~brace
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "n_sentences": n_sent,
            "has_lorem": lorem.astype(np.int64),
            "has_brace": brace.astype(np.int64),
            "keep": keep.astype(np.int64),
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
        toks = set(ascii_tokens(s.lower())[:200])
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
        toks = ascii_tokens(s)
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


def gopher_repetition(df: pd.DataFrame, text_col: str = "text",
                      max_dup_line_ppm: int = 300_000,
                      max_dup_line_char_ppm: int = 200_000,
                      max_top_bigram_ppm: int = 200_000) -> pd.DataFrame:
    """Gopher repetition signals (Rae et al. 2021 §A1.1), integer-exact.

    Per doc:
      n_lines            non-empty '\\n' lines
      dup_line_ppm       floor((n_lines - distinct_lines) * 1e6 / n_lines)
      dup_line_char_ppm  chars in lines occurring >1 time (all occurrences)
                         over total line chars, ppm
      dup_bigram_ppm     char mass of word-bigrams occurring >1 time over
                         total bigram char mass, ppm (proxy for the
                         paper's duplicate-n-gram char fraction: we count
                         every occurrence rather than de-overlapping)
      top_bigram_ppm     max over bigrams of cnt*charlen, over total token
                         chars, ppm (tie-free: maximises repeated char
                         mass instead of the paper's most-frequent rule)
      keep               1 iff all three thresholds hold

    All ratios are floor-divided ppm on int64, so a DuckDB oracle hashes
    bit-for-bit. Pure per-doc map — embarrassingly parallel, zero shuffle."""
    texts = df[text_col].fillna("")
    n = len(df)
    pos = pd.RangeIndex(n)
    texts = texts.reset_index(drop=True)

    def _ppm(num: np.ndarray, den: np.ndarray) -> np.ndarray:
        out = np.zeros(len(num), dtype=np.int64)
        nz = den > 0
        out[nz] = (num[nz] * 1_000_000) // den[nz]
        return out

    # --- line signals -----------------------------------------------------
    lf = texts.str.split("\n").explode().dropna()
    lf = lf[lf.str.len() > 0]
    if len(lf):
        lt = pd.DataFrame({"i": lf.index.to_numpy(), "line": lf.to_numpy(),
                           "ln": lf.str.len().to_numpy(dtype=np.int64)})
        lg = lt.groupby(["i", "line"], sort=False).agg(
            cnt=("ln", "size"), ln=("ln", "first")).reset_index()
        lg["mass"] = lg["cnt"].to_numpy(dtype=np.int64) * lg["ln"].to_numpy()
        per = lg.groupby("i", sort=False).agg(
            n_lines=("cnt", "sum"), n_distinct=("cnt", "size"),
            tot_chars=("mass", "sum"))
        dup = lg[lg["cnt"] > 1].groupby("i", sort=False)["mass"].sum()
        per["dup_chars"] = dup.reindex(per.index, fill_value=0)
        per = per.reindex(pos, fill_value=0)
    else:
        per = pd.DataFrame({"n_lines": 0, "n_distinct": 0,
                            "tot_chars": 0, "dup_chars": 0}, index=pos)
    n_lines = per["n_lines"].to_numpy(dtype=np.int64)
    dup_line_ppm = _ppm(n_lines - per["n_distinct"].to_numpy(dtype=np.int64), n_lines)
    dup_line_char_ppm = _ppm(per["dup_chars"].to_numpy(dtype=np.int64),
                             per["tot_chars"].to_numpy(dtype=np.int64))

    # --- word-bigram signals ----------------------------------------------
    ex = texts.str.lower().str.findall(r"[a-z0-9]+").explode().dropna()
    if len(ex):
        tt = pd.DataFrame({"i": ex.index.to_numpy(), "tok": ex.to_numpy()})
        tok_chars = tt.assign(tl=tt["tok"].str.len().astype(np.int64)) \
                      .groupby("i", sort=False)["tl"].sum() \
                      .reindex(pos, fill_value=0).to_numpy(dtype=np.int64)
        tt["nxt"] = tt.groupby("i", sort=False)["tok"].shift(-1)
        bi = tt.dropna(subset=["nxt"])
    else:
        tok_chars = np.zeros(n, dtype=np.int64)
        bi = pd.DataFrame(columns=["i", "tok", "nxt"])
    if len(bi):
        bl = (bi["tok"].str.len() + bi["nxt"].str.len()).to_numpy(dtype=np.int64)
        bt = pd.DataFrame({"i": bi["i"].to_numpy(),
                           "bg": (bi["tok"] + " " + bi["nxt"]).to_numpy(),
                           "bl": bl})
        bg = bt.groupby(["i", "bg"], sort=False).agg(
            cnt=("bl", "size"), bl=("bl", "first")).reset_index()
        bg["mass"] = bg["cnt"].to_numpy(dtype=np.int64) * bg["bl"].to_numpy()
        bper = bg.groupby("i", sort=False).agg(
            tot_mass=("mass", "sum"), top_rep=("mass", "max"))
        bdup = bg[bg["cnt"] > 1].groupby("i", sort=False)["mass"].sum()
        bper["dup_mass"] = bdup.reindex(bper.index, fill_value=0)
        bper = bper.reindex(pos, fill_value=0)
    else:
        bper = pd.DataFrame({"tot_mass": 0, "top_rep": 0, "dup_mass": 0}, index=pos)
    dup_bigram_ppm = _ppm(bper["dup_mass"].to_numpy(dtype=np.int64),
                          bper["tot_mass"].to_numpy(dtype=np.int64))
    top_bigram_ppm = _ppm(bper["top_rep"].to_numpy(dtype=np.int64), tok_chars)

    keep = ((dup_line_ppm <= max_dup_line_ppm)
            & (dup_line_char_ppm <= max_dup_line_char_ppm)
            & (top_bigram_ppm <= max_top_bigram_ppm))
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(),
        "n_lines": n_lines,
        "dup_line_ppm": dup_line_ppm,
        "dup_line_char_ppm": dup_line_char_ppm,
        "dup_bigram_ppm": dup_bigram_ppm,
        "top_bigram_ppm": top_bigram_ppm,
        "keep": keep.astype(np.int64),
    })


# PII redaction (training-data cleaning stage). Patterns are kept to
# the RE2-compatible subset (no lookaround, no backrefs) and to shapes
# where leftmost-greedy semantics agree between Python `re` and
# DuckDB's RE2, so the oracle reproduces the redacted text
# byte-for-byte (checked via md5 in the query). The (?a) flag pins
# Python's \d / \b to ASCII — RE2's default — otherwise Unicode digits
# (e.g. Arabic-Indic) and non-ASCII word chars adjacent to digit runs
# diverge between the op and the oracle.
PII_PATTERNS = (
    ("email", r"(?a)[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"(?a)\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"(?a)\+\d{7,15}\b|\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_redact(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Redact emails / IPv4s / phone numbers, vectorized (pandas str
    kernels run the compiled regex in C per column, no Python row loop).
    Replacement order is fixed (email, ipv4, phone) — an email is
    redacted before its host-like tail could half-match the IP rule.

    Columns: doc_id, n_email, n_ipv4, n_phone (pre-redaction match
    counts) and redacted_md5 (hex md5 of the redacted text — the strong
    equality signal for the SQL oracle)."""
    texts = df[text_col].fillna("")
    out = {"doc_id": df["doc_id"].to_numpy()}
    red = texts
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = red.str.count(pat).to_numpy(dtype=np.int64)
        red = red.str.replace(pat, repl, regex=True)
    out["redacted_md5"] = red.map(
        lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()).to_numpy()
    return pd.DataFrame(out)


def _L(x: np.ndarray) -> np.ndarray:
    """round(ln(x) * 1e6) as int64 — the shared per-value rounding that
    makes every cross-term sum integer and order-independent (values <=
    ln(2^63)*1e6 ~ 4.4e7, so a 1-ulp libm disagreement between numpy
    and the SQL engine cannot move the rounded int). Used by
    char_entropy and ops.vocab.token_kl_drift; the oracles bake the
    same FLOOR(ln(x)*1e6 + 0.5) rule."""
    return np.floor(np.log(x.astype(np.float64)) * 1e6 + 0.5).astype(np.int64)


def char_entropy(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Character-distribution quality signal: per-doc char histogram ->
    Shannon entropy. Gibberish/binary-ish pages sit at the high end,
    single-char spam at the low end (a standard cheap quality gate next
    to the Gopher/C4 rules).

    Fully vectorized: texts are concatenated once and decoded to
    UTF-32 code points (np.frombuffer — one code per char, no Python
    loop), per-(doc, char) counts come from one np.unique over packed
    64-bit keys.

    Integer-exact oracle layout: ``ent_num = sum(n_c * round(ln(n_c) *
    1e6))`` — ln is rounded PER DISTINCT COUNT (value <= ~2e7 so a
    1-ulp libm disagreement cannot move the rounded int), then scaled
    by the exact integer count, so the cross-term SUM is integer and
    order-independent. Shannon entropy (nats) reconstructs as
    ``ln(n_chars) - ent_num / (n_chars * 1e6)`` and is returned in the
    ``entropy`` float column for users; SQL-gated queries project the
    int columns."""
    s = df[text_col].fillna("").astype(str)
    lens = s.str.len().to_numpy(dtype=np.int64)
    joined = "".join(s.tolist())
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    doc_idx = np.repeat(np.arange(len(s), dtype=np.int64), lens)
    key = (doc_idx << 32) | codes.astype(np.int64)
    uniq, counts = np.unique(key, return_counts=True)
    owner = (uniq >> 32).astype(np.int64)
    term = _L(counts) * counts
    # int64 add.at, NOT bincount(weights=...): bincount sums float64 and
    # would round ent_num above 2^53 (huge single docs), breaking the
    # integer-exact oracle layout
    ent_num = np.zeros(len(s), dtype=np.int64)
    np.add.at(ent_num, owner, term)
    distinct = np.bincount(owner, minlength=len(s)).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        entropy = np.where(
            lens > 0, np.log(np.maximum(lens, 1)) - ent_num / (np.maximum(lens, 1) * 1e6), 0.0)
    return pd.DataFrame({
        "n_chars": lens,
        "distinct_chars": distinct,
        "ent_num": ent_num,
        "entropy": entropy,
    })


# Hashed-linear-classifier constants: feature dim (hashing-trick bucket
# count), a Knuth multiplicative-hash weight derivation, and the weight
# range. Weights are integers so the per-doc sum is order-independent
# and the DuckDB oracle reproduces it exactly.
HASHED_DIM = 1 << 20
_KNUTH = 2654435761
_WRANGE = 2001  # weights in [-1000, 1000]


def hashed_classifier(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """fastText-architecture quality classifier over hashed bag-of-words
    features (the model-based quality gate of the GPT-3/CCNet curation
    stacks: hash each token into one of HASHED_DIM buckets, score =
    sum of per-bucket weights, label = sign).

    Weights here are DERIVED deterministically from the bucket id via a
    Knuth multiplicative hash — a stand-in for trained weights that
    keeps the op oracle-able; a real deployment broadcasts the trained
    weight vector once with ``ray.put`` and each actor indexes it, the
    data path (token hash -> bucket -> weight -> per-doc integer sum)
    is identical. Zero-shuffle: one map over documents.

    Per batch: tokens explode once; md5 is computed per UNIQUE token
    (the Zipf head makes uniques a small fraction of occurrences) and
    mapped back; the per-doc sum is one vectorized groupby.

    Columns: score (int64 sum of weights), n_tokens, label (1 iff
    score >= 0). Empty/null docs score 0 -> label 1."""
    texts = df[text_col].fillna("").str.lower()
    tok = texts.str.findall(TOKEN_PATTERN)
    n = tok.str.len().to_numpy(dtype=np.int64)
    score = np.zeros(len(df), dtype=np.int64)
    if int(n.sum()) > 0:
        flat = tok.explode().dropna()
        uniq = pd.unique(flat.to_numpy(dtype=object))
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8],
                            "big") for t in uniq),
            dtype=np.uint64, count=len(uniq))
        bucket = h % np.uint64(HASHED_DIM)
        w = ((bucket * np.uint64(_KNUTH)) % np.uint64(1 << 32)
             % np.uint64(_WRANGE)).astype(np.int64) - (_WRANGE // 2)
        wmap = pd.Series(w, index=uniq)
        weights = flat.map(wmap).to_numpy(dtype=np.int64)
        owner = np.repeat(np.arange(len(df), dtype=np.int64), n)
        np.add.at(score, owner, weights)
    return pd.DataFrame({
        "score": score,
        "n_tokens": n,
        "label": (score >= 0).astype(np.int64),
    })


# Winnowing constants (Schleimer et al. 2003, "Winnowing: Local
# Algorithms for Document Fingerprinting" — the MOSS selector): k-char
# grams, window w, and the packed (fingerprint, position) key the
# argmin tie rule rides on. fp is truncated to 40 bits so key =
# fp * 2^20 + pos stays in int64 (pos < 2^20 chars; longer docs
# window-select per 1M-char slab in a deployment) — the truncation is
# shared with the SQL oracle bit-for-bit.
WINNOW_K = 8
WINNOW_W = 4
_WINNOW_FP_BITS = 40
_WINNOW_POS_BITS = 20


def winnow_fingerprints(df: pd.DataFrame, k: int = WINNOW_K,
                        w: int = WINNOW_W,
                        text_col: str = "text") -> pd.DataFrame:
    """Winnowing fingerprint selection per document: hash every k-char
    gram (md5, 40-bit), then for every window of w consecutive grams
    select the LEFTMOST-minimum fingerprint; the distinct selected set
    is the document's fingerprint sketch (guaranteed to catch any
    shared substring of length >= k + w - 1). Zero-shuffle per-doc map;
    a 100-TB deployment swaps the per-position md5 for a vectorized
    rolling 128-bit mix 1:1 (determinism is all the selection needs).

    Columns: doc_id, n_kgrams, n_selected (distinct selected
    positions' fingerprints), sel_sum (sum of distinct selected packed
    keys mod 2^31 — the oracle's strong equality signal)."""
    texts = df[text_col].fillna("").astype(str)
    n_out = len(df)
    n_kgrams = np.zeros(n_out, dtype=np.int64)
    n_selected = np.zeros(n_out, dtype=np.int64)
    sel_sum = np.zeros(n_out, dtype=np.int64)
    fp_mod = 1 << _WINNOW_FP_BITS  # plain int: the md5 int is > 2^63,
    # so a numpy modulus would coerce it lossily before reducing
    for row, s in enumerate(texts):
        m = len(s) - k + 1
        if m <= 0:
            continue
        n_kgrams[row] = m
        fps = np.fromiter(
            (int.from_bytes(hashlib.md5(s[i:i + k].encode("utf-8")).digest()[:8],
                            "big") % fp_mod for i in range(m)),
            dtype=np.int64, count=m)
        key = (fps << _WINNOW_POS_BITS) + np.arange(m, dtype=np.int64)
        if m <= w:
            sel = np.array([int(key.min())], dtype=np.int64)
        else:
            from numpy.lib.stride_tricks import sliding_window_view

            sel = np.unique(sliding_window_view(key, w).min(axis=1))
        n_selected[row] = len(sel)
        sel_sum[row] = int((sel % (1 << 31)).sum())
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                         "n_kgrams": n_kgrams,
                         "n_selected": n_selected,
                         "sel_sum": sel_sum})


def collapse_repeats(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Collapse runs of identical consecutive tokens ("the the the" ->
    "the") — the stutter-cleanup transform of crawl-text pipelines
    (OCR/boilerplate artifacts repeat tokens; Gopher counts them, this
    removes them). Tokenization is the RE2-parity ``\\S+`` split and the
    output re-joins with single spaces (whitespace-normalizing, like
    every token-level rewrite here). Zero-shuffle, fully vectorized:
    one boundary-masked shifted comparison over the exploded token
    array, no per-row Python.

    Returns (doc_id, text_clean, n_collapsed) for every input row.
    """
    df = df.reset_index(drop=True)
    toks = df[text_col].fillna("").str.findall(TOKEN_PATTERN)
    n = toks.str.len().to_numpy(np.int64)
    out_text = np.full(len(df), "", dtype=object)
    dropped = np.zeros(len(df), dtype=np.int64)
    if int(n.sum()) > 0:
        flat = toks.explode().dropna()
        ridx = flat.index.to_numpy(np.int64)
        w = flat.to_numpy(dtype=object)
        dup = np.zeros(len(w), dtype=bool)
        if len(w) > 1:
            dup[1:] = (w[1:] == w[:-1]) & (ridx[1:] == ridx[:-1])
        dropped = np.bincount(ridx[dup], minlength=len(df)).astype(np.int64)
        kept = pd.Series(w[~dup]).groupby(ridx[~dup]).agg(" ".join)
        out_text[kept.index.to_numpy(np.int64)] = kept.to_numpy(dtype=object)
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                         "text_clean": out_text,
                         "n_collapsed": dropped})
