"""parsefilter-naivebayes (src/plugin/parsefilter-naivebayes): a tiny
two-class naive-Bayes relevance model with the reference's exact math.

Train (Train.java:66-140): lines ``<target>\\t<text>`` with target 0 =
irrelevant, 1 = relevant; tokens = lowercase, strip [^a-zA-Z ], split
on single spaces (empty tokens COUNT toward word totals like the
reference's split, but only non-empty keys enter the frequency maps).

Classify (Classify.java:53-118): per token,
``log(freq)`` (when present) ``+ 1 - log(numwords_c + uniquewords)``
summed per class, plus the class log-prior; ties -> relevant ("1").

Filter semantics (NaiveBayesParseFilter.filter:157-190): a page whose
text classifies irrelevant keeps only outlinks whose URL contains a
wordlist term (the "second chance").
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

_CLEAN_RE = re.compile(r"[^a-zA-Z ]")


def _tokenize(line: str) -> list[str]:
    # exact parity with line.replaceAll("[^a-zA-Z ]","").toLowerCase()
    # .split(" "): consecutive spaces yield empty tokens mid-line (Java
    # split drops only TRAILING empties)
    cleaned = _CLEAN_RE.sub("", line).lower()
    toks = cleaned.split(" ")
    while toks and toks[-1] == "":
        toks.pop()
    return toks if toks else [""]


@dataclass
class NBModel:
    uniquewords: int
    numof_ir: int
    numwords_ir: int
    wordfreq_ir: dict
    numof_r: int
    numwords_r: int
    wordfreq_r: dict


def train(lines) -> NBModel:
    """Train.start(:66-140) over ``target\\ttext`` lines."""
    numof = {"0": 0, "1": 0}
    numwords = {"0": 0, "1": 0}
    freq = {"0": {}, "1": {}}
    unique: set[str] = set()
    for line in lines:
        if not line or "\t" not in line:
            continue
        target, _, rest = line.partition("\t")
        if target not in ("0", "1"):
            continue
        toks = _tokenize(rest)
        numof[target] += 1
        numwords[target] += len(toks)
        for t in toks:
            unique.add(t)
            if t:
                freq[target][t] = freq[target].get(t, 0) + 1
    return NBModel(
        uniquewords=len(unique),
        numof_ir=numof["0"], numwords_ir=numwords["0"], wordfreq_ir=freq["0"],
        numof_r=numof["1"], numwords_r=numwords["1"], wordfreq_r=freq["1"],
    )


def classify(model: NBModel, text: str) -> str:
    """Classify.classify(:53-118): '1' relevant, '0' irrelevant."""
    toks = _tokenize(text)
    z_ir = math.log(model.numwords_ir + model.uniquewords)
    z_r = math.log(model.numwords_r + model.uniquewords)
    prob_ir = 0.0
    prob_r = 0.0
    for t in toks:
        f = model.wordfreq_ir.get(t)
        prob_ir += (math.log(f) if f else 0.0) + 1 - z_ir
        f = model.wordfreq_r.get(t)
        prob_r += (math.log(f) if f else 0.0) + 1 - z_r
    # Java Math.log(0) is -Infinity (one-class training data must not
    # crash; the comparison still resolves toward the populated class)
    _log = lambda x: math.log(x) if x else float("-inf")
    total = _log(model.numof_ir + model.numof_r)
    prob_ir += _log(model.numof_ir) - total
    prob_r += _log(model.numof_r) - total
    return "0" if prob_ir > prob_r else "1"


def second_chance(url: str, wordlist) -> bool:
    """containsWord(:97-105): keep an outlink from an irrelevant page iff
    its url contains any wordlist term."""
    return any(w in url for w in wordlist)
