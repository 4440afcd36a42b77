"""Language-model quality scoring — the CCNet-style "perplexity
filter" (Wenzek et al. 2020, public): score every document by its mean
negative log-likelihood under an add-one-smoothed BIGRAM model trained
on a deterministic id-hash sample of the corpus itself, then filter /
bucket on the score (high NLL = gibberish or boilerplate-speak, low =
fluent corpus-typical text).

Integer-exact layout (the token_kl / char_entropy convention): with
L(x) = round(ln(x) * 1e6),

  term(w1, w2)    = L(c(w1 w2) + 1) - L(c(w1) + V)
  nll_micro(doc)  = -sum over the doc's bigrams of term

— all arithmetic after the per-value rounding is integer, so sums are
order-independent and the DuckDB oracle reproduces them bit-for-bit.
c = counts over the SAMPLE docs (md5(id) bucket < sample_pct, the
hash_sample rule), V = distinct sample unigrams; bigrams below
``min_count`` are pruned from the model (→ unseen, smoothed), which
bounds the broadcast.

Scale shape: one pass over the sample builds (w1, w2) and unigram
counts via partial-combine + ONE token-hash exchange each
(ops.agg.bucketed_sum); the pruned model is driver-bounded
(sample_pct x min_count control its size) and broadcast via
``ray.put``; scoring is a zero-shuffle vectorized map (explode
bigrams, two hash-merges against the broadcast frames, one groupby
fold per batch). A 10^10-doc deployment shrinks sample_pct / raises
min_count, or swaps in a fixed external LM behind the same scoring
map (CCNet ships a pretrained KenLM — external binary, so the
self-trained bigram model is the in-env analogue).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sample import _md5_bucket
from .text import _L


def _explode_bigrams(df: pd.DataFrame, id_col: str, text_col: str):
    """(ids, w1, w2) arrays for every in-doc bigram, vectorized."""
    texts = df[text_col].fillna("").str.lower()
    toks = texts.str.findall(r"\S+")
    counts = toks.str.len().to_numpy(np.int64)
    total = int(counts.sum())
    ids_all = np.repeat(df[id_col].to_numpy(np.int64), counts)
    if total < 2:
        e = np.empty(0, dtype=object)
        return np.empty(0, dtype=np.int64), e, e
    flat = np.concatenate([np.asarray(v, dtype=object) for v in toks])
    same = ids_all[:-1] == ids_all[1:]
    return ids_all[:-1][same], flat[:-1][same], flat[1:][same]


def bigram_nll(docs_ds, sample_pct: int = 20, min_count: int = 2,
               id_col: str = "doc_id", text_col: str = "text",
               n_buckets: int = 32):
    """Returns a pandas-convertible Dataset of (id_col, n_bigrams,
    nll_micro) for EVERY document (docs with < 2 tokens score 0)."""
    import ray

    from .agg import bucketed_sum

    def in_sample(df: pd.DataFrame) -> pd.DataFrame:
        return df[_md5_bucket(df[id_col].to_numpy(np.int64)) < sample_pct]

    samp = docs_ds.map_batches(in_sample, batch_format="pandas")

    def uni_rows(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").str.lower()
        toks = texts.str.findall(r"\S+")
        total = int(toks.str.len().sum())
        if not total:
            return pd.DataFrame({"w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(v, dtype=object) for v in toks])
        return pd.DataFrame({"w": flat, "c": np.int64(1)})

    def bi_rows(df: pd.DataFrame) -> pd.DataFrame:
        _, w1, w2 = _explode_bigrams(df, id_col, text_col)
        return pd.DataFrame({"w1": w1, "w2": w2,
                             "c": np.ones(len(w1), dtype=np.int64)})

    def _typed(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
        # all-empty Ray datasets round-trip to a ZERO-COLUMN frame
        if not all(c in df.columns for c in cols):
            return pd.DataFrame({c: pd.Series(dtype="object" if c[0] == "w"
                                              else "int64") for c in cols})
        return df

    uni = _typed(
        bucketed_sum(samp.map_batches(uni_rows, batch_format="pandas"),
                     "w", ["c"], n_buckets=n_buckets).to_pandas(),
        ["w", "c"])
    # prune BEFORE collecting so the driver holds only the bounded
    # model, never the full distinct-bigram table of the sample
    bi = _typed(
        bucketed_sum(samp.map_batches(bi_rows, batch_format="pandas"),
                     ["w1", "w2"], ["c"], n_buckets=n_buckets)
        .map_batches(lambda df: df[df["c"] >= min_count],
                     batch_format="pandas").to_pandas(),
        ["w1", "w2", "c"]).reset_index(drop=True)
    vocab_v = len(uni)

    # L() applied once on the driver (model-sized, not corpus-sized)
    uni = uni.rename(columns={"c": "cu"})
    uni["l_den"] = _L(uni["cu"].to_numpy(np.int64) + vocab_v)
    bi = bi.rename(columns={"c": "cb"})
    bi["l_num"] = _L(bi["cb"].to_numpy(np.int64) + 1)
    l_unseen_den = int(_L(np.array([vocab_v]))[0]) if vocab_v else 0

    uni_ref = ray.put(uni[["w", "l_den"]])
    bi_ref = ray.put(bi[["w1", "w2", "l_num"]])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        bid, w1, w2 = _explode_bigrams(df, id_col, text_col)
        if not len(bid):
            return pd.DataFrame({id_col: ids,
                                 "n_bigrams": np.zeros(len(ids), np.int64),
                                 "nll_micro": np.zeros(len(ids), np.int64)})
        g = pd.DataFrame({id_col: bid, "w1": w1, "w2": w2})
        g = g.merge(ray.get(bi_ref), on=["w1", "w2"], how="left")
        g = g.merge(ray.get(uni_ref), left_on="w1", right_on="w",
                    how="left")
        l_num = g["l_num"].fillna(0).to_numpy(np.int64)      # L(0+1)=0
        l_den = g["l_den"].fillna(l_unseen_den).to_numpy(np.int64)
        g["t"] = l_den - l_num                                # -term
        agg = g.groupby(id_col, sort=False)["t"].agg(["sum", "size"])
        agg = agg.reindex(ids, fill_value=0)
        return pd.DataFrame({id_col: ids,
                             "n_bigrams": agg["size"].to_numpy(np.int64),
                             "nll_micro": agg["sum"].to_numpy(np.int64)})

    return docs_ds.map_batches(score, batch_format="pandas")
