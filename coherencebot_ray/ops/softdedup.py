"""SoftDeDup — duplication-aware document REWEIGHTING instead of
removal (He et al. 2024, "SoftDedup: an Efficient Data Reweighting
Method for Speeding Up Language Model Pre-training"). Hard dedup
(ops/dedup.py, ops/linededup.py) deletes duplicated text; SoftDeDup
keeps every document but down-weights its sampling probability by how
COMMON its n-grams are corpus-wide, preserving corpus diversity while
de-emphasising boilerplate-heavy shards.

Commonness here is the integer-exact variant: for a document d with
n-gram window occurrences g_1..g_m,

    commonness(d) = sum_i C(g_i)      (C = corpus-wide occurrence count)
    weight_micro(d) = floor(m * 1e6 / commonness(d))   (0 when m = 0)

weight_micro is 1e6 / (mean duplication factor of the doc's grams) —
1e6 for a document made of globally-unique n-grams, 1e6/k for one whose
grams each occur k times. A sampler multiplies its per-doc rate by
weight_micro/1e6 (cf. ops/sample.weighted_sample). Integer arithmetic
end-to-end makes the DuckDB oracle exact.

Scale shape (100 TB): identical to ops/dedup.dup_span_counts — ONE
(doc_id, span) exchange bucketed by span hash (every occurrence of a
gram lands in one bucket, so the global count is exact per bucket with
no second pass), per-doc partial sums leave each bucket, one small
bucketed per-doc sum folds them. The exchange moves O(token) rows,
never documents; ``hash_spans=True`` swaps the gram string for a packed
128-bit hash (~16 bytes/row, the production layout — default False so
the query layout equals the string-grouping SQL oracle verbatim).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import bucketed_group_apply, bucketed_sum
from .dedup import explode_spans


def softdedup_commonness(docs_ds, n: int = 3, text_col: str = "text",
                         id_col: str = "doc_id", n_buckets: int = 64,
                         hash_spans: bool = False):
    """One row per document: (id_col, n_grams, commonness, weight_micro).

    Every document appears in the output — docs with < n tokens get
    (0, 0, 0), mirroring dup_span_counts' LEFT JOIN oracle shape.
    """

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        return explode_spans(df, n, text_col=text_col, id_col=id_col,
                             hash_spans=hash_spans)

    def bucket_part(b: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a span hash to this bucket -> within-bucket
        # span size IS the corpus-wide count C(g)
        sizes = b.groupby("span", sort=False)["span"].transform("size")
        part = pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "n_grams": np.ones(len(b), dtype=np.int64),
            "commonness": sizes.to_numpy(dtype=np.int64),
        })
        return part.groupby(id_col, sort=False, as_index=False).sum()

    def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_grams": np.zeros(len(df), dtype=np.int64),
            "commonness": np.zeros(len(df), dtype=np.int64),
        })

    spans = docs_ds.map_batches(explode, batch_format="pandas")
    partials = bucketed_group_apply(spans, "span", bucket_part,
                                    n_buckets=n_buckets)
    base = docs_ds.map_batches(zero_rows, batch_format="pandas")
    summed = bucketed_sum(partials.union(base), id_col,
                          ["n_grams", "commonness"])

    def weight(df: pd.DataFrame) -> pd.DataFrame:
        ng = df["n_grams"].to_numpy(dtype=np.int64)
        cm = df["commonness"].to_numpy(dtype=np.int64)
        w = np.where(cm > 0, ng * 1_000_000 // np.maximum(cm, 1), 0)
        return df.assign(weight_micro=w.astype(np.int64))

    return summed.map_batches(weight, batch_format="pandas")
