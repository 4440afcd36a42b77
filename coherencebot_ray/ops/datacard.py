"""Corpus audit ("data card") statistics — the per-source health
numbers a training-data pipeline publishes next to the corpus:
n-gram diversity (distinct-n, the self-repetition metric) and the
cross-source n-gram overlap matrix (which sources feed each other /
share boilerplate).

Both ride the shared bucketed exchange: (source, gram) rows bucket by
GRAM hash, so per-gram global state (distinct sets, source membership)
is exact inside one bucket and only tiny per-source / per-pair partial
sums leave it. The driver folds |sources| or |source-pairs| rows —
corpus-size-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import bucketed_group_apply
from .vocab import _NULL_GROUP as _NULL_SRC  # shared null-group sentinel
# (SQL GROUP BY keeps NULL groups; pandas groupby drops NaN keys)


def _gram_rows(df: pd.DataFrame, n: int, text_col: str,
               group_col: str) -> pd.DataFrame:
    """(source, gram) per n-token window (batch-local dedup deferred —
    diversity needs occurrence counts AND distinct counts)."""
    from .dedup import explode_spans

    g = explode_spans(df.rename(columns={group_col: "_grp"})
                      .assign(_grp=lambda x: x["_grp"].where(
                          x["_grp"].notna(), _NULL_SRC)),
                      n, text_col=text_col, id_col="_grp")
    return g.rename(columns={"_grp": group_col, "span": "gram"})


def distinct_ngrams(docs_ds, n: int = 3, text_col: str = "text",
                    group_col: str = "source",
                    n_buckets: int = 32) -> pd.DataFrame:
    """Per-source n-gram diversity: (source, n_grams, n_distinct,
    distinct_ppm) with distinct_ppm = floor(1e6 * n_distinct /
    n_grams) — the distinct-n self-repetition metric. Each gram lives
    in exactly one bucket, so per-bucket distinct counts sum to the
    exact global distinct count."""

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch partial combine (the agg.py hot-key guard): a gram
        # repeated 10^8 times ships one (source, gram, cnt) row per
        # batch, never one row per occurrence
        g = _gram_rows(df, n, text_col, group_col)
        out = (g.groupby([group_col, "gram"], sort=False).size()
               .reset_index(name="c"))
        out["c"] = out["c"].astype(np.int64)
        return out

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby([group_col, "gram"], sort=False)["c"].sum()
             .reset_index())
        agg = g.groupby(group_col, sort=False).agg(
            n_grams=("c", "sum"), n_distinct=("c", "size")).reset_index()
        return agg

    parts = bucketed_group_apply(
        docs_ds, "gram", per_bucket, n_buckets=n_buckets, pre=pre,
    ).to_pandas()
    if "n_grams" not in parts.columns:
        return pd.DataFrame({group_col: pd.Series(dtype="object"),
                             "n_grams": pd.Series(dtype="int64"),
                             "n_distinct": pd.Series(dtype="int64"),
                             "distinct_ppm": pd.Series(dtype="int64")})
    out = (parts.groupby(group_col, sort=True)[["n_grams", "n_distinct"]]
           .sum().reset_index())
    out["n_grams"] = out["n_grams"].astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    out["distinct_ppm"] = (1_000_000 * out["n_distinct"]) // out["n_grams"]
    out[group_col] = out[group_col].where(out[group_col] != _NULL_SRC, None)
    return out


def source_overlap(docs_ds, n: int = 8, text_col: str = "text",
                   group_col: str = "source",
                   n_buckets: int = 32) -> pd.DataFrame:
    """Cross-source contamination matrix: for every unordered source
    pair (src_a < src_b), the number of DISTINCT n-grams present in
    both. Per bucket: distinct sources per gram (sorted), all pairs per
    gram (sources-per-gram is bounded by |sources|), partial pair
    counts; the driver folds <= |sources|^2/2 rows. Null-source rows
    never pair (SQL semantics: NULL fails every < comparison)."""

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        # idempotent per-batch distinct (the hot-key partial combine)
        g = _gram_rows(df[df[group_col].notna()], n, text_col, group_col)
        return g[[group_col, "gram"]].drop_duplicates()

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        sg = b.drop_duplicates([group_col, "gram"])
        sizes = sg.groupby("gram", sort=False)[group_col].transform("size")
        multi = sg[sizes > 1]
        if not len(multi):
            return pd.DataFrame({"src_a": pd.Series(dtype="object"),
                                 "src_b": pd.Series(dtype="object"),
                                 "shared": pd.Series(dtype="int64")})
        # vectorized pair expansion: self-merge on gram (C loop), keep
        # src_a < src_b — no per-gram Python iteration
        m = multi.merge(multi, on="gram", suffixes=("_a", "_b"))
        m = m[m[group_col + "_a"] < m[group_col + "_b"]]
        part = m.rename(columns={group_col + "_a": "src_a",
                                 group_col + "_b": "src_b"})
        return (part.groupby(["src_a", "src_b"], sort=False).size()
                .reset_index(name="shared"))

    parts = bucketed_group_apply(
        docs_ds, "gram", per_bucket, n_buckets=n_buckets, pre=pre,
    ).to_pandas()
    if "shared" not in parts.columns:
        return pd.DataFrame({"src_a": pd.Series(dtype="object"),
                             "src_b": pd.Series(dtype="object"),
                             "shared": pd.Series(dtype="int64")})
    out = (parts.groupby(["src_a", "src_b"], sort=True)["shared"].sum()
           .reset_index())
    out["shared"] = out["shared"].astype(np.int64)
    for c in ("src_a", "src_b"):
        out[c] = out[c].where(out[c] != _NULL_SRC, None)
    return out
