"""Restricted JEXL-ish predicate evaluation over datum columns.

The reference evaluates Apache JEXL expressions against CrawlDatum
fields for generate ``-expr``, readdb ``-expr`` and HostDb overrides
(CrawlDatum.java:627-679, util/JexlUtil.java, Generator.java:396-401).

Here: a safe, vectorized evaluator built on ``pandas.DataFrame.eval``
(numexpr-backed when available). Exposed variables mirror the JEXL
context: status, fetchTime, retries, fetchInterval, score, modifiedTime,
plus any metadata keys promoted to columns.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# JEXL name -> column name
_NAME_MAP = {
    "fetchTime": "fetch_time",
    "fetchInterval": "fetch_interval",
    "modifiedTime": "modified_time",
    "retriesSinceFetch": "retries",
}

_ALLOWED = re.compile(r"^[\w\s\.\+\-\*/%<>=!&|()'\"]+$")


def translate(expr: str) -> str:
    for jexl, col in _NAME_MAP.items():
        expr = re.sub(rf"\b{jexl}\b", col, expr)
    # JEXL uses && / || — pandas.eval accepts & / | on boolean exprs
    expr = expr.replace("&&", " & ").replace("||", " | ")
    return expr


def evaluate(df: pd.DataFrame, expr: str) -> np.ndarray:
    """Vectorized predicate -> boolean mask. Raises ValueError on unsafe
    or unparseable expressions (caller treats as reject-none)."""
    if not _ALLOWED.match(expr):
        raise ValueError(f"disallowed characters in expression: {expr!r}")
    py = translate(expr)
    out = df.eval(py)
    return np.asarray(out, dtype=bool)
