"""End-to-end LLM training-corpus curation as ONE streaming pipeline —
the composition a real curation run chains by hand:

  langid -> Gopher quality -> benchmark decontamination
         -> exact-dedup keep-first -> token-budget shard packing

Scale shape (the reason this is one operator and not five jobs):

- **One text pass.** Language ID, the Gopher quality rules, the md5
  dedup signature, the whitespace token count AND the n-gram
  contamination scan all run in a single ``map_batches`` over the raw
  documents — the text is read once off storage and never reshuffled.
  Everything downstream moves only (doc_id, tokens, sig) rows
  (~50 bytes/doc at 10^10 docs vs the multi-KB text).
- **Eval side broadcast.** The benchmark slice is benchmark-sized; its
  distinct n-grams are collected once (``ray.put``) and read per task —
  no join shuffle (GPT-3 / Pile decontamination rule, see
  ops/decontaminate.py).
- **Exact dedup commutes with the per-doc filters.** Duplicate docs
  have identical text, hence identical lang/quality/contamination
  flags, so flagging before the keep-first fold is semantics-preserving
  and lets the dedup exchange carry tiny rows only.
- **Packing is the distributed prefix sum** (ops/pack.pack_counts):
  per-range partials -> bounded driver offsets -> local cumsum; the
  survivor ids partition cleanly into doc_id // range_size ranges even
  with filter gaps.

Reference: the crawl side of this composition is Nutch's dedup +
index chain (src/java/org/apache/nutch/crawl/DeduplicationJob.java,
indexer/IndexingJob.java); the curation rules are public
(Gopher Rae et al. 2021 §A2, GPT-3 Brown et al. 2020 §C).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def curate_corpus(
    docs_ds,
    *,
    lang: str = "en",
    gram_n: int = 8,
    budget: int = 4096,
    eval_mod: int = 37,
    range_size: int = 65536,
    n_buckets: int = 64,
):
    """Returns a Dataset of (doc_id, tokens, shard) — the curated,
    deduplicated, decontaminated corpus packed into ~``budget``-token
    shards in doc_id order.

    Semantics (mirrored exactly by the composed SQL oracle):
      eligible   = lang_pred == lang AND gopher keep AND train side
                   (doc_id % eval_mod != 0) AND no shared ``gram_n``-gram
                   with the eval slice (doc_id % eval_mod == 0)
      winner     = min doc_id per md5(text) among eligible
      shard      = start-offset // budget over winners in doc_id order
    """
    import ray

    from .agg import bucketed_group_apply
    from .decontaminate import contains_gram, eval_gram_set
    from .pack import pack_counts
    from .text import TOKEN_PATTERN as _TOKP
    from .text import gopher_quality, langid

    def eval_slice(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"].to_numpy(np.int64) % eval_mod == 0]

    gset_ref = ray.put(
        eval_gram_set(
            docs_ds.map_batches(eval_slice, batch_format="pandas"), n=gram_n
        )
    )

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        """The single text pass: emits (doc_id, tokens, sig) for
        eligible docs only."""
        df = df.reset_index(drop=True)
        ids = df["doc_id"].to_numpy(np.int64)
        elig = (ids % eval_mod) != 0
        if elig.any():
            elig &= (langid(df["text"]) == lang).to_numpy()
        if elig.any():
            elig &= gopher_quality(df)["keep"].to_numpy() == 1
        sub = df[elig]
        if not len(sub):
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "tokens": pd.Series(dtype="int64"),
                 "sig": pd.Series(dtype="object")}
            )
        texts = sub["text"].fillna("")
        gset = ray.get(gset_ref)
        clean = np.fromiter(
            (not contains_gram(t, gset, gram_n) for t in texts),
            dtype=bool, count=len(sub))
        sub = sub[clean]
        texts = texts[clean]
        return pd.DataFrame(
            {
                "doc_id": sub["doc_id"].to_numpy(np.int64),
                "tokens": texts.str.count(_TOKP).to_numpy(np.int64),
                "sig": texts.map(
                    lambda s: hashlib.md5(s.encode()).hexdigest()
                ).to_numpy(),
            }
        )

    def keep_first(b: pd.DataFrame) -> pd.DataFrame:
        """Winner = min doc_id per sig; vectorized boundary scan."""
        if not len(b):
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "tokens": pd.Series(dtype="int64")}
            )
        b = b.sort_values(["sig", "doc_id"], kind="stable")
        sig_v = b["sig"].to_numpy()
        first = np.r_[True, sig_v[1:] != sig_v[:-1]]
        k = b[first]
        return pd.DataFrame(
            {"doc_id": k["doc_id"].to_numpy(np.int64),
             "tokens": k["tokens"].to_numpy(np.int64)}
        )

    winners = bucketed_group_apply(
        docs_ds.map_batches(flags, batch_format="pandas"),
        "sig",
        keep_first,
        n_buckets=n_buckets,
    )

    def add_rng(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["rng"] = df["doc_id"].to_numpy(np.int64) // range_size
        return out

    return pack_counts(
        winners.map_batches(add_rng, batch_format="pandas"),
        budget=budget,
        range_size=range_size,
        n_buckets=n_buckets,
    )
