"""Token-budget shard packing: assign documents (in stable doc-id
order) to training shards of ~``budget`` tokens each — the sequential
"running total" pass expressed as a DISTRIBUTED PREFIX SUM, an operator
Ray Data has no native primitive for.

Two-pass range scan (the classic parallel-scan layout):

1. map_batches computes per-document token counts and per-RANGE partial
   sums (range = id // range_size) — the range table is
   ``n_docs / range_size`` rows, bounded and tiny relative to the data
   (~150k rows for 10^10 docs at the default), so the driver can hold
   the range PREFIX OFFSETS and broadcast them.
2. a second map over ranges: local cumsum within the range (rows sorted
   by id) + the broadcast offset = the exact global running total;
   ``shard = (running_total - tokens) // budget`` (a document's shard
   is decided by its START offset, matching SQL's
   ``(sum(t) OVER (ORDER BY id) - t) // budget``).

Deterministic, exact, and one all-to-all (the range groupby) of
(id, tokens) pairs — the text never reshuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .text import TOKEN_PATTERN as _TOKP


def pack_counts(
    tok,
    budget: int,
    id_col: str = "doc_id",
    range_size: int = 65536,
    n_buckets: int = 64,
    sort_cols: "list[str] | None" = None,
):
    """The generic prefix-sum packer over a pre-costed Dataset: ``tok``
    must carry (id_col, tokens, rng = id // range_size); any EXTRA
    columns ride through pass 2 unchanged (pass 1 reads only
    rng/tokens). Returns (extras..., id_col, tokens, shard). Shared by
    :func:`pack_by_token_budget` (text corpora) and
    ``ops.interleaved.interleaved_pack`` (text+media span docs).
    ``sort_cols`` overrides the global packing order (default: id) —
    MUST be consistent with how ``rng`` partitions that order (every
    row of range k orders before every row of range k+1), e.g. a hash
    key with rng = key >> 48 (see :func:`pack_shuffled`)."""
    from ..ops.agg import bucketed_group_apply

    # pass 1: per-range sums -> driver-held prefix offsets (bounded)
    from ..ops.agg import bucketed_sum

    range_sums = bucketed_sum(
        tok.map_batches(
            lambda df: df[["rng", "tokens"]], batch_format="pandas"
        ),
        "rng",
        ["tokens"],
        n_buckets=n_buckets,
    ).to_pandas()
    range_sums = range_sums.sort_values("rng").reset_index(drop=True)
    offsets = np.r_[0, np.cumsum(range_sums["tokens"].to_numpy(np.int64))[:-1]]
    offset_by_range = dict(zip(range_sums["rng"].to_numpy(np.int64), offsets))

    # pass 2: per-range local cumsum + broadcast offset -> shard
    import ray

    offsets_ref = ray.put(offset_by_range)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)
        extras = [c for c in g.columns if c not in (id_col, "tokens", "rng")]
        order_cols = sort_cols or [id_col]
        outs = []
        for rng_id, sub in g.groupby("rng", sort=False):
            sub = sub.sort_values(order_cols, kind="stable")
            t = sub["tokens"].to_numpy(np.int64)
            start = int(off[int(rng_id)]) + np.cumsum(t) - t
            out = sub[extras].reset_index(drop=True)
            out[id_col] = sub[id_col].to_numpy(np.int64)
            out["tokens"] = t
            out["shard"] = (start // budget).astype(np.int64)
            outs.append(out)
        if not outs:
            base = g[extras].iloc[0:0].copy()
            base[id_col] = pd.Series(dtype="int64")
            base["tokens"] = pd.Series(dtype="int64")
            base["shard"] = pd.Series(dtype="int64")
            return base
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(tok, "rng", assign, n_buckets=n_buckets)


def pack_by_token_budget(
    docs_ds,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    range_size: int = 65536,
    n_buckets: int = 64,
):
    """Returns a Dataset (id_col, tokens, shard). Tokens = whitespace
    runs (ops.text.token_count)."""
    from ..ops.text import token_count

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "tokens": token_count(df[text_col]).astype(np.int64),
                "rng": ids // range_size,
            }
        )

    tok = docs_ds.map_batches(counts, batch_format="pandas")
    return pack_counts(tok, budget, id_col=id_col,
                       range_size=range_size, n_buckets=n_buckets)


def pack_shuffled(
    docs_ds,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    range_shift: int = 48,
):
    """Deterministic global shuffle + token-budget packing: documents
    are ordered by the md5 hash of their id — the standard "shuffle the
    corpus before sharding" step of training-data prep, with no
    ``random_shuffle`` all-to-all and no RNG state (reruns and the SQL
    oracle agree exactly) — and packed into ~``budget``-token shards
    along that order by the same distributed prefix sum. The shuffle is
    free: the hash key partitions into ranges (key >> 48, 65536 uniform
    ranges) exactly like doc-id ranges do, so the exchange shape is
    identical to :func:`pack_by_token_budget`. Ties on the 64-bit key
    (birthday-bounded) break on id. ``range_shift`` sizes the range
    count (2^(64-shift)): 48 -> 65536 ranges, the 10^10-doc setting;
    small corpora should pass a larger shift so ranges don't go
    singleton (the per-range fold pays per-group overhead). Returns
    (id_col, tokens, shard)."""
    from .sketch import _md5_u64
    from .text import token_count

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        key = _md5_u64(ids)
        return pd.DataFrame(
            {
                id_col: ids,
                "tokens": token_count(df[text_col]).astype(np.int64),
                "__key": key,
                "rng": (key >> np.uint64(range_shift)).astype(np.int64),
            }
        )

    tok = docs_ds.map_batches(counts, batch_format="pandas")
    packed = pack_counts(tok, budget, id_col=id_col, n_buckets=n_buckets,
                         sort_cols=["__key", id_col])
    return packed.map_batches(
        lambda df: df[[id_col, "tokens", "shard"]], batch_format="pandas")


def chunk_docs(
    docs_ds,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Split each document into ~``budget``-token training chunks on
    LINE boundaries (the long-document preprocessing step before
    sequence packing: context windows must not cut mid-line). A line's
    chunk is decided by its START offset within the document —
    ``(doc-local running total - line tokens) // budget`` — the same
    prefix rule as :func:`pack_counts`, but doc-local, so this is a
    pure per-batch vectorized map with ZERO shuffle (each doc's lines
    live in its own row).

    Returns (id_col, chunk, n_lines, tokens) — one row per chunk that
    holds at least one LINE (a chunk of only zero-token lines — e.g. a
    trailing empty line starting exactly on a budget boundary — is a
    row with tokens=0); empty docs yield one all-empty chunk 0 row."""

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("")
        lines = texts.str.split("\n")
        counts = lines.str.len().to_numpy(np.int64)
        ids = np.repeat(df[id_col].to_numpy(np.int64), counts)
        total = int(counts.sum())
        if not total:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 "chunk": pd.Series(dtype="int64"),
                 "n_lines": pd.Series(dtype="int64"),
                 "tokens": pd.Series(dtype="int64")})
        flat = pd.Series(np.concatenate(
            [np.asarray(v, dtype=object) for v in lines]))
        tok = flat.str.count(_TOKP).to_numpy(np.int64)
        # doc-local prefix sum: global cumsum minus the value carried
        # in from the previous doc (vectorized boundary reset)
        csum = np.cumsum(tok)
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        carry = np.repeat(csum[starts] - tok[starts], counts)
        chunk = (csum - tok - carry) // budget
        out = pd.DataFrame({id_col: ids, "chunk": chunk, "tokens": tok})
        g = out.groupby([id_col, "chunk"], sort=False)
        agg = g.agg(n_lines=("tokens", "size"), tokens=("tokens", "sum"))
        agg = agg.reset_index()
        for c in agg.columns:
            agg[c] = agg[c].astype(np.int64)
        return agg[[id_col, "chunk", "n_lines", "tokens"]]

    return docs_ds.map_batches(per_batch, batch_format="pandas")
