"""Corpus vocabulary + distribution statistics — training-data curation
ops over the documents table.

- ``vocab_topk``: global top-k term frequencies. The scale shape is
  partial-combine -> one token-hash bucket exchange -> per-bucket top-k
  -> tiny driver merge: every token lives in exactly ONE bucket, so the
  global top-k is a subset of the union of per-bucket top-k's; only
  k x n_buckets rows ever reach the driver. This is the vocabulary-
  building pass of an LM data pipeline (BPE corpus statistics, stopword
  discovery) expressed Ray-Data-first.

- ``grouped_int_quantiles``: EXACT percentiles of an integer-valued
  per-document metric (token counts, char lengths), optionally grouped.
  Instead of a distributed sort (all-to-all over every row), each batch
  partial-combines to (group, value, count) rows; one bucketed sum
  exchange reduces to the distinct-value histogram, which is tiny (its
  size is bounded by |groups| x |value domain|, independent of corpus
  row count) and collapses to exact percentile_disc cut points on the
  driver. At 10^10 rows the exchange moves histograms, never rows.
  PERCENTILE_DISC semantics (SQL standard / DuckDB): the smallest value
  whose cumulative row fraction is >= p.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import bucketed_group_apply

TOKEN_RE = r"\S+"


def _partial_token_counts(df: pd.DataFrame, lowercase: bool) -> pd.DataFrame:
    texts = df["text"].fillna("")
    if lowercase:
        texts = texts.str.lower()
    tokens = texts.str.findall(TOKEN_RE).explode().dropna()
    if len(tokens) == 0:
        return pd.DataFrame({"token": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    vc = tokens.value_counts()
    return pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                         "cnt": vc.to_numpy(dtype=np.int64)})


def vocab_topk(docs_ds, k: int = 200, n_buckets: int = 32,
               lowercase: bool = True) -> pd.DataFrame:
    """Top-k (token, cnt) by count desc, token asc — the tie-break makes
    the k-boundary deterministic."""

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)["cnt"].sum().reset_index()
        s = s.sort_values(["cnt", "token"], ascending=[False, True],
                          kind="stable").head(k)
        return s

    parts = bucketed_group_apply(
        docs_ds, "token", bucket_fn, n_buckets=n_buckets,
        pre=lambda df: _partial_token_counts(df, lowercase),
    ).to_pandas()  # <= k * n_buckets rows
    out = parts.sort_values(["cnt", "token"], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def int_value_histogram(ds, value_pre, group_col: str | None = None,
                        n_buckets: int = 32) -> pd.DataFrame:
    """Distributed (group, value) -> count histogram. ``value_pre`` maps
    a raw batch to a DataFrame with an int64 ``value`` column (+ the
    group column when grouping). Returns the collected histogram — tiny
    by construction (distinct values, not rows)."""
    gcols = [group_col] if group_col else []

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        v = value_pre(df)
        if len(v) == 0:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in gcols}
                                | {"value": pd.Series(dtype="int64"),
                                   "cnt": pd.Series(dtype="int64")})
        g = v.groupby(gcols + ["value"], sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(gcols + ["value"], sort=False)["cnt"].sum().reset_index()
        s["cnt"] = s["cnt"].astype(np.int64)
        return s

    return bucketed_group_apply(
        ds, gcols + ["value"], bucket_fn, n_buckets=n_buckets, pre=pre
    ).to_pandas()


def quantiles_from_histogram(hist: pd.DataFrame, ps: tuple,
                             group_col: str | None = None) -> pd.DataFrame:
    """Exact PERCENTILE_DISC cut points from a (group, value, cnt)
    histogram: for each p, the smallest value with cum_cnt/n >= p."""
    gcols = [group_col] if group_col else []
    rows = []
    for key, g in (hist.groupby(group_col) if group_col else [(None, hist)]):
        g = g.sort_values("value", kind="stable")
        values = g["value"].to_numpy(dtype=np.int64)
        cum = g["cnt"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1]) if len(cum) else 0
        for p in ps:
            if n == 0:
                continue
            # smallest index with cum >= p*n; exact integer threshold
            # via ceil without float error (p as a Fraction-safe ratio)
            import math

            k = max(1, math.ceil(p * n - 1e-9))
            idx = int(np.searchsorted(cum, k, side="left"))
            rows.append((key, float(p), int(values[idx])))
    out = pd.DataFrame(rows, columns=(gcols or ["__g"]) + ["p", "value"])
    if not group_col:
        out = out.drop(columns=["__g"])
    return out


def grouped_int_quantiles(ds, value_pre, ps=(0.25, 0.5, 0.9, 0.99),
                          group_col: str | None = None,
                          n_buckets: int = 32) -> pd.DataFrame:
    hist = int_value_histogram(ds, value_pre, group_col=group_col,
                               n_buckets=n_buckets)
    return quantiles_from_histogram(hist, tuple(ps), group_col=group_col)
