"""Benchmark decontamination — flag training documents sharing an
n-gram with an evaluation set (the GPT-3/Pile-style 13-gram rule).

Scale shape: the eval side of this op is benchmark-sized (thousands of
documents), so its distinct n-grams are collected once into a broadcast
set (`ray.put`, read per task) and the training corpus streams through
one vectorized map_batches containment scan — no shuffle at all. At
10^10 training rows the exchange-free scan is the entire cost; if the
eval side ever outgrows broadcast, the same gram frames feed a bucketed
co-group on the gram key instead.

Grams here are exact token strings (space-joined \\S+ runs) so the
DuckDB oracle can rebuild them verbatim; a production deployment would
hash them (the set membership test is identical).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _grams_of(text: str, n: int) -> list[str]:
    from .text import ascii_tokens

    toks = ascii_tokens((text or "").lower())
    if len(toks) < n:
        return []
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def eval_gram_set(eval_ds, n: int = 13, text_col: str = "text") -> set:
    """Distinct n-grams of the (benchmark-sized) eval side: per-batch
    gram extraction + set-union, collected to the driver once."""

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        out: set = set()
        for t in df[text_col]:
            out.update(_grams_of(t, n))
        return pd.DataFrame({"g": sorted(out)})

    parts = eval_ds.map_batches(grams, batch_format="pandas").to_pandas()
    # all-empty Ray datasets round-trip to a ZERO-COLUMN frame
    return set(parts["g"]) if "g" in parts.columns else set()


def contains_gram(text, gset: set, n: int) -> bool:
    """True iff ``text`` shares an n-gram with ``gset`` (early exit) —
    the single scan implementation shared by :func:`decontaminate` and
    the composed pipeline (ops.corpus.curate_corpus)."""
    from .text import ascii_tokens

    toks = ascii_tokens((text or "").lower())
    for j in range(len(toks) - n + 1):
        if " ".join(toks[j:j + n]) in gset:
            return True
    return False


def count_gram_hits(text, gset: set, n: int) -> tuple[int, int]:
    """(total gram windows, windows whose gram is in ``gset``) — the
    full-scan sibling of :func:`contains_gram` (no early exit: every
    window is tested so the hit count is exact)."""
    from .text import ascii_tokens

    toks = ascii_tokens((text or "").lower())
    total = max(len(toks) - n + 1, 0)
    hits = 0
    for j in range(total):
        if " ".join(toks[j:j + n]) in gset:
            hits += 1
    return total, hits


def decontaminate_frac(train_ds, eval_ds, n: int = 13,
                       id_col: str = "doc_id", text_col: str = "text"):
    """Per-document contamination FRACTION — how much of each training
    doc overlaps the eval set, not just whether it does (the graded
    variant used to set removal thresholds: docs above x% contaminated
    are dropped, light-touch docs merely flagged).

    Returns (id_col, n_grams, n_hits, frac_micro) where n_grams is the
    doc's n-gram window count, n_hits the windows whose gram appears in
    the eval side, and frac_micro = floor(n_hits * 1e6 / n_grams)
    (0 when the doc has no windows) — integer-exact for the oracle.

    Same scale shape as :func:`decontaminate`: broadcast eval-gram set,
    one exchange-free vectorized scan of the training corpus."""
    import ray

    gset_ref = ray.put(eval_gram_set(eval_ds, n=n, text_col=text_col))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        gset = ray.get(gset_ref)
        k = len(df)
        totals = np.zeros(k, dtype=np.int64)
        hits = np.zeros(k, dtype=np.int64)
        for i, t in enumerate(df[text_col]):
            totals[i], hits[i] = count_gram_hits(t, gset, n)
        frac = np.where(totals > 0, hits * 1_000_000 // np.maximum(totals, 1), 0)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_grams": totals, "n_hits": hits,
                             "frac_micro": frac.astype(np.int64)})

    return train_ds.map_batches(scan, batch_format="pandas")


def decontaminate(train_ds, eval_ds, n: int = 13, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Returns a Dataset of (id_col, contaminated int 0/1) for every
    training document; contaminated = shares >= 1 n-gram with eval."""
    import ray

    gset_ref = ray.put(eval_gram_set(eval_ds, n=n, text_col=text_col))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        gset = ray.get(gset_ref)
        flags = np.fromiter(
            (contains_gram(t, gset, n) for t in df[text_col]),
            dtype=np.int64, count=len(df))
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "contaminated": flags})

    return train_ds.map_batches(scan, batch_format="pandas")
