

def test_gopher_repetition_vs_naive():
    """Vectorized repetition signals match a per-row naive reference."""
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd

    from coherencebot_ray.ops.text import gopher_repetition

    docs = [
        "a b c\na b c\nunique line",          # duplicate lines
        "spam spam spam spam ham",              # hot bigram
        "",                                     # empty
        "single line only",
        "x\n\nx\n  \nx",                       # dup short lines + blanks kept (non-empty)
        "The quick brown fox jumps over the lazy dog. " * 3,
    ]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    out = gopher_repetition(df).set_index("doc_id")

    for i, t in enumerate(docs):
        lines = [l for l in t.split("\n") if len(l) > 0]
        lc = Counter(lines)
        n_lines = len(lines)
        tot = sum(len(l) for l in lines)
        dupc = sum(len(l) * c for l, c in lc.items() if c > 1)
        assert out.loc[i, "n_lines"] == n_lines
        assert out.loc[i, "dup_line_ppm"] == ((n_lines - len(lc)) * 10**6 // n_lines if n_lines else 0)
        assert out.loc[i, "dup_line_char_ppm"] == (dupc * 10**6 // tot if tot else 0)
        toks = re.findall(r"[a-z0-9]+", t.lower())
        tok_chars = sum(len(x) for x in toks)
        bgs = Counter((toks[j], toks[j + 1]) for j in range(len(toks) - 1))
        tot_mass = sum(c * (len(a) + len(b)) for (a, b), c in bgs.items())
        dup_mass = sum(c * (len(a) + len(b)) for (a, b), c in bgs.items() if c > 1)
        top = max((c * (len(a) + len(b)) for (a, b), c in bgs.items()), default=0)
        assert out.loc[i, "dup_bigram_ppm"] == (dup_mass * 10**6 // tot_mass if tot_mass else 0)
        assert out.loc[i, "top_bigram_ppm"] == (top * 10**6 // tok_chars if tok_chars else 0)


def test_pii_redact():
    import hashlib

    import pandas as pd

    from coherencebot_ray.ops.text import pii_redact

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail me at jane.doe+spam@example.co.uk or bob@x.io today",
            "server at 10.0.0.1 and 192.168.255.3, call +4915112345678",
            "call 555-123-4567 or 555.123.4567; not 12.34 nor a@b",
            None,
        ],
    })
    out = pii_redact(df).set_index("doc_id")
    assert out.loc[0, "n_email"] == 2 and out.loc[0, "n_ipv4"] == 0
    assert out.loc[1, "n_ipv4"] == 2 and out.loc[1, "n_phone"] == 1
    assert out.loc[2, "n_phone"] == 2 and out.loc[2, "n_email"] == 0
    assert out.loc[3, "n_email"] == 0
    red0 = "mail me at <EMAIL> or <EMAIL> today"
    assert out.loc[0, "redacted_md5"] == hashlib.md5(red0.encode()).hexdigest()
    red1 = "server at <IP> and <IP>, call <PHONE>"
    assert out.loc[1, "redacted_md5"] == hashlib.md5(red1.encode()).hexdigest()


def test_pii_redact_ascii_semantics_match_re2():
    """The (?a) flag pins \\d / \\b to ASCII like DuckDB's RE2: Unicode
    digits never match, and a non-ASCII letter before a digit run is a
    boundary (it is not a word char under ASCII)."""
    import pandas as pd

    from coherencebot_ray.ops.text import pii_redact

    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["call ١٢٣-٤٥٦-٧٨٩٠ now",
                 "é123-456-7890"],
    })
    out = pii_redact(df).set_index("doc_id")
    assert out.loc[0, "n_phone"] == 0  # Arabic-Indic digits: no match
    assert out.loc[1, "n_phone"] == 1  # é is a boundary under ASCII \b


def test_winnow_fingerprints_guarantee():
    """The winnowing guarantee: two docs sharing a substring of length
    >= k + w - 1 share at least one selected fingerprint; and the
    leftmost-min selection matches a brute-force reference."""
    import hashlib
    import pandas as pd

    from coherencebot_ray.ops.text import (WINNOW_K, WINNOW_W,
                                           winnow_fingerprints)

    shared = "SHAREDSUBSTRING"  # len 15 >= 8 + 4 - 1
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["prefix " + shared + " tail one",
                 "other start " + shared + " zz",
                 "entirely unrelated content here"],
    })
    out = winnow_fingerprints(df)

    def brute(s, k=WINNOW_K, w=WINNOW_W):
        m = len(s) - k + 1
        if m <= 0:
            return set()
        fps = [int.from_bytes(hashlib.md5(s[i:i + k].encode()).digest()[:8],
                              "big") % (1 << 40) for i in range(m)]
        keys = [(f << 20) + i for i, f in enumerate(fps)]
        if m <= w:
            return {min(keys)}
        return {min(keys[j:j + w]) for j in range(m - w + 1)}

    for i, t in enumerate(df["text"]):
        ref = brute(t)
        assert out["n_selected"][i] == len(ref)
        assert out["sel_sum"][i] == sum(x % (1 << 31) for x in ref)
    # the guarantee: fingerprint VALUES (fp part) of docs 0 and 1 overlap
    fp0 = {x >> 20 for x in brute(df["text"][0])}
    fp1 = {x >> 20 for x in brute(df["text"][1])}
    fp2 = {x >> 20 for x in brute(df["text"][2])}
    assert fp0 & fp1
    assert not (fp0 & fp2)


def test_collapse_repeats():
    """Consecutive-dup collapse: boundary-masked shifted compare, counts
    exact, whitespace-normalizing re-join, empty/null rows survive."""
    import pandas as pd

    from coherencebot_ray.ops.text import collapse_repeats

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "the the the cat",          # run of 3 -> 1
            "a b a b",                  # no consecutive dups
            "x  x\t x",                 # whitespace variants, one token run
            "",                         # empty
            None,                       # null
            "end end",                  # run at doc end; also checks the
                                        # doc boundary vs doc 4/5 edges
        ],
    })
    out = collapse_repeats(df)
    assert out["text_clean"].tolist() == [
        "the cat", "a b a b", "x", "", "", "end"]
    assert out["n_collapsed"].tolist() == [2, 0, 2, 0, 0, 1]
    # boundary: last token of doc 0 ('cat') does not collapse into
    # doc 1's first token even when equal
    df2 = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "b c"]})
    out2 = collapse_repeats(df2)
    assert out2["text_clean"].tolist() == ["a b", "b c"]
    assert out2["n_collapsed"].tolist() == [0, 0]
