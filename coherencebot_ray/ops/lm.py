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
from .text import TOKEN_PATTERN as _TOKP


def _explode_bigrams(df: pd.DataFrame, id_col: str, text_col: str):
    """(ids, w1, w2) arrays for every in-doc bigram, vectorized."""
    texts = df[text_col].fillna("").str.lower()
    toks = texts.str.findall(_TOKP)
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
        toks = texts.str.findall(_TOKP)
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


# DSIR feature-space constants: hashed n-gram dimension (the paper uses
# 10k buckets; 1024 keeps the broadcast trivially small at equal test
# coverage) shared between the op and its SQL oracle.
DSIR_DIM = 1024


def dsir_weights(docs_ds, target_mod: int = 37, dim: int = DSIR_DIM,
                 id_col: str = "doc_id", text_col: str = "text"):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", public): hash each
    document's unigrams+bigrams into ``dim`` buckets, fit add-one
    bucket multinomials over a TARGET slice (here the deterministic
    doc_id % target_mod == 0 slice, the same eval-slice convention as
    ``decontaminate``) and over the RAW rest, and weight every raw doc
    by its log importance ratio  log w(x) = sum_f n_f(x) *
    (log p_target(f) - log p_raw(f)).  High-weight docs look like the
    target distribution; resampling on these weights (see
    ops/sample.weighted_sample) is the paper's selection step.

    Integer-exact layout (token_kl / bigram_nll convention), with
    L(x) = round(ln(x) * 1e6):

      logw_micro(doc) = sum_b n_b * (L(t_b + 1) - L(r_b + 1))
                        + n(doc) * (L(R + dim) - L(T + dim))

    — integer after per-value rounding, order-independent, oracle
    bit-for-bit. Returns (id_col, n_features, logw_micro) for every
    RAW document (the DSIR candidate pool); n_features = unigrams +
    bigrams.

    Scale shape: the feature space is ``dim`` buckets, so the count
    pass needs NO exchange at all — each batch partial-combines to at
    most ``dim`` (bucket, target_cnt, raw_cnt) rows and the driver
    folds blocks x dim rows into one dim-row table (bounded,
    corpus-size-independent), broadcast in the scoring closure
    (ray.put for a real deployment's larger dim). Scoring is a second
    zero-shuffle vectorized map. md5 runs per UNIQUE feature string
    per batch (Zipf head)."""

    def _features(df: pd.DataFrame):
        """(owner_ids, feature_strings) = unigrams + in-doc bigrams."""
        texts = df[text_col].fillna("").str.lower()
        toks = texts.str.findall(_TOKP)
        counts = toks.str.len().to_numpy(np.int64)
        ids_all = np.repeat(df[id_col].to_numpy(np.int64), counts)
        if not int(counts.sum()):
            e = np.empty(0, dtype=object)
            return np.empty(0, dtype=np.int64), e
        flat = np.concatenate([np.asarray(v, dtype=object) for v in toks])
        same = ids_all[:-1] == ids_all[1:]
        bi = np.add(np.add(flat[:-1][same], " "), flat[1:][same])
        return (np.concatenate([ids_all, ids_all[:-1][same]]),
                np.concatenate([flat, bi]))

    def _buckets(feats: np.ndarray) -> np.ndarray:
        import hashlib

        uniq, inv = np.unique(feats, return_inverse=True)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(f.encode("utf-8")).digest()[:8],
                            "big") % dim for f in uniq),
            dtype=np.int64, count=len(uniq))
        return h[inv]

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids, feats = _features(df)
        if not len(ids):
            return pd.DataFrame({"b": pd.Series(dtype="int64"),
                                 "t": pd.Series(dtype="int64"),
                                 "r": pd.Series(dtype="int64")})
        b = _buckets(feats)
        is_t = ids % target_mod == 0
        t = np.bincount(b[is_t], minlength=dim)
        r = np.bincount(b[~is_t], minlength=dim)
        nz = (t > 0) | (r > 0)
        return pd.DataFrame({"b": np.flatnonzero(nz).astype(np.int64),
                             "t": t[nz].astype(np.int64),
                             "r": r[nz].astype(np.int64)})

    parts = (docs_ds.map_batches(count_partial, batch_format="pandas")
             .to_pandas())  # <= blocks x dim rows
    t_b = np.zeros(dim, dtype=np.int64)
    r_b = np.zeros(dim, dtype=np.int64)
    if "b" in parts.columns and len(parts):  # else: fully-empty corpus
        folded = parts.groupby("b", sort=False)[["t", "r"]].sum()
        t_b[folded.index.to_numpy(np.int64)] = folded["t"].to_numpy(np.int64)
        r_b[folded.index.to_numpy(np.int64)] = folded["r"].to_numpy(np.int64)
    term = _L(t_b + 1) - _L(r_b + 1)                       # per-bucket int
    shift = int(_L(np.array([int(r_b.sum()) + dim]))[0]
                - _L(np.array([int(t_b.sum()) + dim]))[0])  # per-feature int

    def score(df: pd.DataFrame) -> pd.DataFrame:
        raw = df[df[id_col].to_numpy(np.int64) % target_mod != 0]
        out_ids = raw[id_col].to_numpy(np.int64)
        n_feat = np.zeros(len(raw), dtype=np.int64)
        logw = np.zeros(len(raw), dtype=np.int64)
        ids, feats = _features(raw)
        if len(ids):
            b = _buckets(feats)
            pos = pd.Series(np.arange(len(raw), dtype=np.int64),
                            index=out_ids)
            owner = pos.reindex(ids).to_numpy(np.int64)
            np.add.at(n_feat, owner, 1)
            np.add.at(logw, owner, term[b])
        logw += n_feat * shift
        return pd.DataFrame({id_col: out_ids, "n_features": n_feat,
                             "logw_micro": logw})

    return docs_ds.map_batches(score, batch_format="pandas")


def dsir_select(docs_ds, p: float = 0.75, target_mod: int = 37,
                dim: int = DSIR_DIM, id_col: str = "doc_id",
                text_col: str = "text"):
    """DSIR selection step: keep every raw doc whose importance weight
    is at or above the corpus-wide PERCENTILE_DISC(p) cutoff of
    ``logw_micro`` (deterministic — no Gumbel noise; the paper's
    resampling becomes a quantile threshold, ties keep). Returns a
    Dataset of (id_col, logw_micro) for the selected docs.

    Scale shape: dsir_weights' two zero-shuffle scans, then the exact
    distributed value-histogram quantile (ops/vocab machinery: the
    exchange moves (value, cnt) rows). logw values are near-distinct
    per doc, so at 10^10 rows a deployment quantizes the histogram
    key (logw_micro // 1000) to bound it and applies the same cutoff
    rule on the quantized proxy; at oracle scale the exact histogram
    is used so SQL percentile_disc reproduces the cutoff bit-for-bit."""
    from .vocab import int_value_histogram, quantiles_from_histogram

    # materialize: the weights table is tiny ((id, int, int) per raw
    # doc) and is consumed twice (histogram + select) — without this
    # the full corpus text would be re-read and re-scored per pass
    weights = dsir_weights(docs_ds, target_mod=target_mod, dim=dim,
                           id_col=id_col, text_col=text_col).materialize()

    def value_pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"value": df["logw_micro"].to_numpy(np.int64)})

    hist = int_value_histogram(weights, value_pre)
    q = quantiles_from_histogram(hist, (p,))
    cutoff = int(q["value"].iloc[0]) if len(q) else 0

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["logw_micro"].to_numpy(np.int64) >= cutoff]
        return keep[[id_col, "logw_micro"]]

    return weights.map_batches(sel, batch_format="pandas")
