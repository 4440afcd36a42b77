"""Inverted-index construction over a documents table: term ->
(document frequency, sorted posting list).

Distributed layout: each batch explodes to DISTINCT (term, doc_id)
pairs (within-doc dedup happens map-side, so the exchange moves at most
vocab × docs pairs, never one pair per token occurrence), then one
bucketed groupby(term) assembles per-term postings. All rows of a term
land in one bucket (term-hash bucketing); hot terms (stopwords) are the
documented skew: at corpus scale cap them with a df threshold or shard
the posting list by doc-id range before the exchange — the within-doc
dedup already removes the tf-proportional blowup.

Postings ride as a comma-joined string of ascending doc ids — a stable
cross-engine representation (DuckDB string_agg ORDER BY mirrors it
exactly) and the on-disk shape a posting-list file would take anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .rank import TOKEN_RE


def build_inverted_index(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                         n_buckets: int = 64):
    """docs -> Dataset(term, df, postings) with postings =
    'id1,id2,...' ascending."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_RE)
        ex = toks.apply(lambda ts: sorted(set(ts))).explode().dropna()
        ids = df[id_col].reindex(ex.index).to_numpy(dtype=np.int64)
        return pd.DataFrame({"term": ex.to_numpy(), id_col: ids})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_col], kind="stable")
        gg = g.groupby("term", sort=True)
        return pd.DataFrame(
            {
                "term": list(gg.groups.keys()),
                "df": gg.size().to_numpy(dtype=np.int64),
                "postings": gg[id_col].agg(
                    lambda s: ",".join(map(str, s.to_numpy()))
                ).to_numpy(),
            }
        )

    from .agg import bucketed_group_apply

    exploded = docs_ds.map_batches(pairs, batch_format="pandas")
    return bucketed_group_apply(exploded, "term", per_bucket, n_buckets=n_buckets)
