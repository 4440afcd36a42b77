"""Training-data operators over INTERLEAVED text+media documents —
the input_hint shape (doc_id, spans: list<struct<kind, text, media_ref,
offset>>), i.e. the parse output of the crawl loop (stages/parse.py
emits exactly this span layout; model.SPAN_TYPE).

All list handling is zero-copy Arrow: ``batch_format="pyarrow"``,
``list_flatten`` / ``list_parent_indices`` to explode spans without a
Python row loop, ``np.bincount`` to fold back per document. Nothing
here materializes the corpus; each op is one map pass plus (at most)
one bucketed exchange of small projected rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _explode_spans(t: pa.Table, id_col: str, spans_col: str):
    """(doc index per span, flat span struct array) — zero-copy."""
    lst = t.column(spans_col).combine_chunks()
    if isinstance(lst, pa.ChunkedArray):  # single chunk after combine
        lst = lst.chunk(0) if lst.num_chunks else pa.array([], lst.type)
    flat = lst.flatten()
    parent = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
    return parent, flat


def interleaved_costs(docs_ds, media_token_cost: int = 256,
                      id_col: str = "doc_id", spans_col: str = "spans"):
    """Per-document token accounting for an interleaved corpus: text
    spans cost their whitespace-token count, every media span costs a
    fixed ``media_token_cost`` (the "image = N vision tokens" rule of
    multimodal training). Returns a Dataset
    (id_col, text_tokens, media_spans, cost) — one pure map pass, no
    shuffle."""
    from .text import token_count

    def per_batch(t: pa.Table) -> pd.DataFrame:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(t)
        parent, flat = _explode_spans(t, id_col, spans_col)
        if len(parent):
            kind = np.asarray(flat.field("kind").to_numpy(zero_copy_only=False))
            is_media = kind == "media"
            toks = token_count(pd.Series(
                flat.field("text").to_numpy(zero_copy_only=False)))
            toks = np.where(is_media, 0, toks)
            text_tokens = np.bincount(parent, weights=toks,
                                      minlength=n).astype(np.int64)
            media_spans = np.bincount(parent[is_media],
                                      minlength=n).astype(np.int64)
        else:
            text_tokens = np.zeros(n, dtype=np.int64)
            media_spans = np.zeros(n, dtype=np.int64)
        return pd.DataFrame({
            id_col: ids,
            "text_tokens": text_tokens,
            "media_spans": media_spans,
            "cost": text_tokens + media_token_cost * media_spans,
        })

    return docs_ds.map_batches(per_batch, batch_format="pyarrow")


def interleaved_pack(docs_ds, budget: int, media_token_cost: int = 256,
                     id_col: str = "doc_id", spans_col: str = "spans",
                     range_size: int = 65536, n_buckets: int = 64):
    """Token-budget shard packing for interleaved docs: cost = text
    tokens + ``media_token_cost`` per media span; shards assigned in
    stable id order by the distributed two-pass prefix sum
    (ops.pack.pack_counts — spans never reshuffle, only (id, cost)
    rows move). Returns (text_tokens, media_spans, id_col, tokens=cost,
    shard)."""
    from .pack import pack_counts

    costs = interleaved_costs(docs_ds, media_token_cost=media_token_cost,
                              id_col=id_col, spans_col=spans_col)

    def to_tok(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        return pd.DataFrame({
            "text_tokens": df["text_tokens"].to_numpy(np.int64),
            "media_spans": df["media_spans"].to_numpy(np.int64),
            id_col: ids,
            "tokens": df["cost"].to_numpy(np.int64),
            "rng": ids // range_size,
        })

    tok = costs.map_batches(to_tok, batch_format="pandas")
    return pack_counts(tok, budget, id_col=id_col,
                       range_size=range_size, n_buckets=n_buckets)


def media_ref_groups(docs_ds, min_docs: int = 2, id_col: str = "doc_id",
                     spans_col: str = "spans", n_buckets: int = 32,
                     id_arrow_type: "pa.DataType | None" = None):
    """Cross-document media dedup: media refs appearing in >=
    ``min_docs`` distinct documents, with the min-id canonical owner —
    the "fetch/decode each asset once" planning step of an interleaved
    pipeline (and the media analogue of URL dedup J9). One map explodes
    (media_ref, doc) pairs — bytes moved are refs, never payloads —
    then one bucketed groupby on the ref. Returns
    (media_ref, n_docs, canonical). Ids may be int64 (derived tables)
    or strings (segment docs); ``id_arrow_type`` types the empty-result
    schema, default int64."""
    from .agg import bucketed_group_apply

    id_t = id_arrow_type if id_arrow_type is not None else pa.int64()
    id_np = "object" if pa.types.is_string(id_t) else "int64"

    def explode(t: pa.Table) -> pd.DataFrame:
        parent, flat = _explode_spans(t, id_col, spans_col)
        if not len(parent):
            return pd.DataFrame({"media_ref": pd.Series(dtype="object"),
                                 id_col: pd.Series(dtype=id_np)})
        kind = np.asarray(flat.field("kind").to_numpy(zero_copy_only=False))
        ref = np.asarray(flat.field("media_ref").to_numpy(zero_copy_only=False))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)[parent]
        m = (kind == "media") & (ref != "") & (~pd.isna(ref))
        return pd.DataFrame({"media_ref": ref[m],
                             id_col: ids[m]}).drop_duplicates()

    rows = docs_ds.map_batches(explode, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["media_ref", id_col])
        agg = (g.groupby("media_ref", sort=False)[id_col]
               .agg(n_docs="size", canonical="min").reset_index())
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        return agg[agg["n_docs"] >= min_docs]

    return bucketed_group_apply(
        rows, "media_ref", per_bucket, n_buckets=n_buckets,
        empty_schema=pa.schema([("media_ref", pa.string()),
                                ("n_docs", pa.int64()),
                                ("canonical", id_t)]))
