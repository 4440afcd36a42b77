"""Content signatures (dedup keys).

Re-implements the reference's Signature implementations from their
documented algorithms:

- MD5Signature (crawl/MD5Signature.java:30-38): MD5 of raw content
  bytes, falling back to MD5(url) when content is empty.
- TextMD5Signature (crawl/TextMD5Signature.java): MD5 of extracted
  text, fallback to MD5 of content.
- TextProfileSignature (crawl/TextProfileSignature.java:60-185):
  tokenize letters+digits lowercased, keep tokens with len > MIN_TOKEN_LEN,
  quantize term frequencies (QUANT = round(maxFreq*QUANT_RATE), floored
  at 2 when maxFreq>1 else 1), drop below-QUANT terms, sort by
  (freq desc, token asc), join "token cnt" lines with "\\n", MD5.

All functions are pure; batch variants loop in Python at group
granularity (signatures are computed once per fetched page in the parse
stage, already a per-document cost).
"""

from __future__ import annotations

import hashlib

_ALNUM_CACHE: dict[str, bool] = {}


def md5_signature(content: bytes | None, url: str = "") -> bytes:
    """MD5 of content bytes; MD5(url utf-8) when content is None/empty."""
    if content:
        return hashlib.md5(content).digest()
    return hashlib.md5(url.encode("utf-8")).digest()


def text_md5_signature(text: str | None, content: bytes | None = None, url: str = "") -> bytes:
    if text:
        return hashlib.md5(text.encode("utf-8")).digest()
    return md5_signature(content, url)


def text_profile_signature(
    text: str | None,
    content: bytes | None = None,
    url: str = "",
    min_token_len: int = 2,
    quant_rate: float = 0.01,
    sec_sort_lex: bool = True,
) -> bytes:
    if not text:
        return md5_signature(content, url)

    counts: dict[str, int] = {}
    max_freq = 0
    cur: list[str] = []
    for c in text:
        if c.isalnum():
            cur.append(c.lower())
        else:
            if len(cur) > min_token_len:
                s = "".join(cur)
                n = counts.get(s, 0) + 1
                counts[s] = n
                if n > max_freq:
                    max_freq = n
            cur.clear()
    if len(cur) > min_token_len:
        s = "".join(cur)
        n = counts.get(s, 0) + 1
        counts[s] = n
        if n > max_freq:
            max_freq = n

    # Java Math.round = floor(x + 0.5)
    import math

    quant = math.floor(max_freq * quant_rate + 0.5)
    if quant < 2:
        quant = 2 if max_freq > 1 else 1

    profile = []
    for tok, cnt in counts.items():
        q = (cnt // quant) * quant
        if q < quant:
            continue
        profile.append((q, tok))
    if sec_sort_lex:
        profile.sort(key=lambda t: (-t[0], t[1]))
    else:
        profile.sort(key=lambda t: -t[0])

    joined = "\n".join(f"{tok} {cnt}" for cnt, tok in profile)
    return hashlib.md5(joined.encode("utf-8")).digest()


def make_signer(impl: str = "md5", **kw):
    """Factory (crawl/SignatureFactory.java:35-65)."""
    if impl == "md5":
        return lambda text, content, url: md5_signature(content, url)
    if impl == "text_md5":
        return lambda text, content, url: text_md5_signature(text, content, url)
    if impl == "text_profile":
        return lambda text, content, url: text_profile_signature(text, content, url, **kw)
    raise ValueError(f"unknown signature impl: {impl}")
