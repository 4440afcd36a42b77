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
from .text import _L

from .text import TOKEN_PATTERN as TOKEN_RE  # RE2-parity tokenizer class


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
    if "cnt" not in parts.columns:  # fully-empty corpus: Ray collapses
        # an all-empty result to a zero-column frame
        return pd.DataFrame({"token": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    out = parts.sort_values(["cnt", "token"], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def _partial_pair_counts(df: pd.DataFrame, lowercase: bool) -> pd.DataFrame:
    """Per-batch adjacent-token-pair counts. Pairs never cross document
    boundaries: with per-doc token counts n, the flattened token array's
    doc-last positions (cumsum(n)-1) are masked out of the left side.
    A pair is keyed as ``left + ' ' + right`` — tokens are ``\\S+`` runs
    so the space separator is unambiguous."""
    texts = df["text"].fillna("")
    if lowercase:
        texts = texts.str.lower()
    tok = texts.str.findall(TOKEN_RE)
    n = tok.str.len().to_numpy(dtype=np.int64)
    empty = pd.DataFrame({"pair": pd.Series(dtype="object"),
                          "cnt": pd.Series(dtype="int64")})
    if int(n.sum()) < 2:
        return empty
    flat = tok.explode().dropna().to_numpy(dtype=object)
    is_last = np.zeros(len(flat), dtype=bool)
    is_last[np.cumsum(n[n > 0]) - 1] = True
    left_ok = ~is_last[:-1]  # position i starts a pair iff not doc-last
    if not left_ok.any():
        return empty
    pairs = (pd.Series(flat[:-1][left_ok]) + " "
             + pd.Series(flat[1:][left_ok]))
    vc = pairs.value_counts()
    return pd.DataFrame({"pair": vc.index.to_numpy(dtype=object),
                         "cnt": vc.to_numpy(dtype=np.int64)})


def pair_topk(docs_ds, k: int = 200, n_buckets: int = 32,
              lowercase: bool = True) -> pd.DataFrame:
    """Top-k adjacent token pairs by count — the merge-candidate
    statistic of a BPE tokenizer-training pass (count all adjacent
    symbol pairs, take the most frequent). Same scale shape as
    ``vocab_topk``: per-batch partial pair counts -> ONE pair-hash
    bucket exchange -> per-bucket top-k -> k x n_buckets driver merge
    (each pair lives in exactly one bucket, so the global top-k is a
    subset of the per-bucket winners). Tie-break cnt desc, pair asc."""

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", sort=False)["cnt"].sum().reset_index()
        s = s.sort_values(["cnt", "pair"], ascending=[False, True],
                          kind="stable").head(k)
        return s

    parts = bucketed_group_apply(
        docs_ds, "pair", bucket_fn, n_buckets=n_buckets,
        pre=lambda df: _partial_pair_counts(df, lowercase),
    ).to_pandas()  # <= k * n_buckets rows
    if "cnt" not in parts.columns:  # fully-empty corpus (see vocab_topk)
        return pd.DataFrame({"pair": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    out = parts.sort_values(["cnt", "pair"], ascending=[False, True],
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


_NULL_GROUP = "\x00null"  # internal sentinel: pandas groupby drops NaN
# keys (dropna default) while SQL GROUP BY keeps NULL as a group; rows
# with a null group are folded under this sentinel and reported as None.


def _group_values(df: pd.DataFrame, group_col: str) -> np.ndarray:
    g = df[group_col]
    return g.where(g.notna(), _NULL_GROUP).to_numpy(dtype=object)


def _partial_group_token_counts(df: pd.DataFrame, group_col: str,
                                lowercase: bool) -> pd.DataFrame:
    texts = df["text"].fillna("")
    if lowercase:
        texts = texts.str.lower()
    tok = texts.str.findall(TOKEN_RE)
    n = tok.str.len().to_numpy(dtype=np.int64)
    if n.sum() == 0:
        return pd.DataFrame({group_col: pd.Series(dtype="object"),
                             "token": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    g = np.repeat(_group_values(df, group_col), n)
    t = tok.explode().dropna().to_numpy(dtype=object)
    vc = (pd.DataFrame({group_col: g, "token": t})
          .groupby([group_col, "token"], sort=False).size()
          .reset_index(name="cnt"))
    vc["cnt"] = vc["cnt"].astype(np.int64)
    return vc


def token_kl_drift(docs_ds, group_col: str = "source",
                   lowercase: bool = True, n_buckets: int = 32):
    """KL(P_g || P_corpus) per corpus slice ``g`` — the distribution-
    drift monitor of a training-data pipeline (does this source / crawl
    batch look like the corpus it joins?). Every token of a slice is in
    the corpus by construction, so the divergence is finite with no
    smoothing.

    Integer-exact layout: with L(x) = round(ln(x) * 1e6),

      kl_num(g) = sum_t  n_gt * (L(n_gt) - L(N_g) - L(n_t) + L(N))

    — all integer arithmetic after the per-value rounding, so the SQL
    oracle reproduces it bit-for-bit regardless of summation order.
    KL(g) = kl_num(g) / (N_g * 1e6) nats (``kl`` float column for
    users; oracle-gated queries project the ints).

    Scale shape: per-batch partial (group, token, cnt) -> ONE
    token-hash exchange (all slices' counts for a token co-locate, so
    the global n_t is exact in-bucket) -> per-(bucket, group) integer
    partial sums -> a tiny grouped fold. Slice totals N_g are a first
    pass of per-batch partials folded on the driver (|groups| x blocks
    rows) and broadcast in the closure. Returns a pandas DataFrame
    (group_col, n_tokens, kl_num, kl) — |groups| rows."""
    from .text import token_count

    def totals_partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        return pd.DataFrame({group_col: _group_values(df, group_col),
                             "n": token_count(texts)}) \
            .groupby(group_col, sort=False)["n"].sum().reset_index()

    totals_parts = (docs_ds.map_batches(totals_partial, batch_format="pandas")
                    .to_pandas())
    if "n" not in totals_parts.columns:  # fully-empty corpus
        return pd.DataFrame({group_col: pd.Series(dtype="object"),
                             "n_tokens": pd.Series(dtype="int64"),
                             "kl_num": pd.Series(dtype="int64"),
                             "kl": pd.Series(dtype="float64")})
    totals = totals_parts.groupby(group_col, sort=True)["n"].sum()
    n_g = {g: int(v) for g, v in totals.items()}
    n_total = int(totals.sum())
    l_ng = {g: int(_L(np.array([v]))[0]) for g, v in n_g.items() if v}
    l_n = int(_L(np.array([n_total]))[0]) if n_total else 0

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({group_col: pd.Series(dtype="object"),
                                 "kl_part": pd.Series(dtype="int64")})
        gt = (b.groupby(["token", group_col], sort=False)["cnt"].sum()
              .reset_index())
        n_t = gt.groupby("token", sort=False)["cnt"].transform("sum").to_numpy(np.int64)
        n_gt = gt["cnt"].to_numpy(np.int64)
        lg = gt[group_col].map(l_ng).to_numpy(np.int64)
        term = n_gt * (_L(n_gt) - lg - _L(n_t) + l_n)
        out = pd.DataFrame({group_col: gt[group_col], "kl_part": term})
        return (out.groupby(group_col, sort=False)["kl_part"].sum()
                .reset_index())

    parts = bucketed_group_apply(
        docs_ds, "token", per_bucket, n_buckets=n_buckets,
        pre=lambda df: _partial_group_token_counts(df, group_col, lowercase),
    ).to_pandas()
    if "kl_part" not in parts.columns:  # fully-empty corpus
        return pd.DataFrame({group_col: pd.Series(dtype="object"),
                             "n_tokens": pd.Series(dtype="int64"),
                             "kl_num": pd.Series(dtype="int64"),
                             "kl": pd.Series(dtype="float64")})
    agg = parts.groupby(group_col, sort=True)["kl_part"].sum().reset_index()
    agg = agg.rename(columns={"kl_part": "kl_num"})
    agg["n_tokens"] = agg[group_col].map(n_g).astype(np.int64)
    agg["kl_num"] = agg["kl_num"].astype(np.int64)
    agg["kl"] = agg["kl_num"] / (agg["n_tokens"] * 1e6)
    agg[group_col] = agg[group_col].where(agg[group_col] != _NULL_GROUP, None)
    return agg[[group_col, "n_tokens", "kl_num", "kl"]]


def pmi_topk(docs_ds, k: int = 20, min_count: int = 3, n_buckets: int = 32,
             lowercase: bool = True) -> pd.DataFrame:
    """Top-k adjacent-token collocations by pointwise mutual information
    PMI(a,b) = ln(c_ab * W^2 / (T * c_a * c_b)) — the association-
    normalized sibling of :func:`pair_topk` (raw counts): high-PMI pairs
    are multi-word expressions / collocations, the standard statistic
    for phrase-vocabulary induction over a pretraining corpus.

    Scale shape: ONE corpus scan emits per-batch unigram AND pair
    partials (exchange volume is bounded by batch vocabulary, never
    tokens); two chained bucketed exchanges join the marginals without
    any broadcast — (1) bucket by FIRST token: every (a,*) pair and
    token a's unigram partials share a bucket, so the pair fold, the
    min_count filter and the c_a attach are all bucket-local; (2)
    re-key by SECOND token to attach c_b the same way. The corpus
    totals W (tokens) and T (pairs) ride the exchanges as per-bucket
    stats rows (each token/pair lives in exactly one bucket, so the
    driver folds n_buckets partial sums — no extra pass). Per-bucket
    top-k prunes on ln(c_ab)-ln(c_a)-ln(c_b), which orders identically
    to PMI (the W/T term is a global constant), so only k x n_buckets
    candidate rows ever reach the driver.

    Returns (a, b, cnt, ca, cb, pmi_micro) with pmi_micro =
    floor(PMI * 1e6 + 0.5), ranked pmi desc / a asc / b asc — the same
    fixed float-operation order as the DuckDB oracle.
    """
    from .agg import bucketed_group_apply

    _K_PAIR, _K_UNI, _K_STATS = 0, 1, 2
    COLS = ["kind", "key", "a", "b", "cnt", "ca"]

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        if lowercase:
            texts = texts.str.lower()
        tok = texts.str.findall(TOKEN_RE)
        n = tok.str.len().to_numpy(dtype=np.int64)
        frames = []
        if int(n.sum()) > 0:
            flat = tok.explode().dropna().to_numpy(dtype=object)
            uv = pd.Series(flat).value_counts()
            frames.append(pd.DataFrame({
                "kind": _K_UNI, "key": uv.index.to_numpy(dtype=object),
                "a": uv.index.to_numpy(dtype=object), "b": "",
                "cnt": uv.to_numpy(dtype=np.int64), "ca": np.int64(0)}))
            is_last = np.zeros(len(flat), dtype=bool)
            is_last[np.cumsum(n[n > 0]) - 1] = True
            left_ok = ~is_last[:-1]
            if left_ok.any():
                pf = pd.DataFrame({"a": flat[:-1][left_ok],
                                   "b": flat[1:][left_ok]})
                pv = pf.groupby(["a", "b"], sort=False).size()
                idx = pv.index
                frames.append(pd.DataFrame({
                    "kind": _K_PAIR,
                    "key": idx.get_level_values(0).to_numpy(dtype=object),
                    "a": idx.get_level_values(0).to_numpy(dtype=object),
                    "b": idx.get_level_values(1).to_numpy(dtype=object),
                    "cnt": pv.to_numpy(dtype=np.int64), "ca": np.int64(0)}))
        if not frames:
            return pd.DataFrame({"kind": pd.Series(dtype="int64"),
                                 "key": pd.Series(dtype="object"),
                                 "a": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="object"),
                                 "cnt": pd.Series(dtype="int64"),
                                 "ca": pd.Series(dtype="int64")})
        return pd.concat(frames, ignore_index=True)[COLS]

    def bucket1(g: pd.DataFrame) -> pd.DataFrame:
        uni = g[g["kind"] == _K_UNI]
        U = uni.groupby("a", sort=False)["cnt"].sum()
        pairs = g[g["kind"] == _K_PAIR]
        out = []
        w_b = np.int64(U.sum()) if len(U) else np.int64(0)
        t_b = np.int64(0)
        if len(pairs):
            pc = pairs.groupby(["a", "b"], sort=False, as_index=False)["cnt"].sum()
            t_b = np.int64(pc["cnt"].sum())
            pc = pc[pc["cnt"] >= min_count]
            if len(pc):
                pc = pc.assign(kind=_K_PAIR, key=pc["b"],
                               ca=pc["a"].map(U).astype(np.int64))
                out.append(pc[COLS])
        if len(U):
            out.append(pd.DataFrame({
                "kind": _K_UNI, "key": U.index.to_numpy(dtype=object),
                "a": U.index.to_numpy(dtype=object), "b": "",
                "cnt": U.to_numpy(dtype=np.int64), "ca": np.int64(0)}))
        # stats row: cnt carries W_b, ca carries T_b; key "" is safe
        # (tokens are \S+ runs, never empty)
        out.append(pd.DataFrame({"kind": [_K_STATS], "key": [""],
                                 "a": [""], "b": [""],
                                 "cnt": [w_b], "ca": [t_b]}))
        return pd.concat(out, ignore_index=True)

    OUT_COLS = ["kind", "a", "b", "cnt", "ca", "cb"]

    def bucket2(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        stats = g[g["kind"] == _K_STATS]
        if len(stats):
            out.append(pd.DataFrame({
                "kind": [_K_STATS], "a": [""], "b": [""],
                "cnt": [np.int64(stats["cnt"].sum())],
                "ca": [np.int64(stats["ca"].sum())], "cb": [np.int64(0)]}))
        pairs = g[g["kind"] == _K_PAIR]
        if len(pairs):
            uni = g[g["kind"] == _K_UNI]
            U = uni.groupby("a", sort=False)["cnt"].sum()
            pairs = pairs.assign(cb=pairs["b"].map(U).astype(np.int64))
            s = (np.log(pairs["cnt"].to_numpy(dtype=np.float64))
                 - np.log(pairs["ca"].to_numpy(dtype=np.float64))
                 - np.log(pairs["cb"].to_numpy(dtype=np.float64)))
            pairs = pairs.assign(_s=s).sort_values(
                ["_s", "a", "b"], ascending=[False, True, True],
                kind="stable")
            if len(pairs) > k:
                # keep a micro-rounding tie margin past the k-th row: the
                # driver (and the SQL oracle) rank by floor(pmi*1e6+0.5)
                # with (a, b) tie-break, so two pairs whose exact keys
                # differ by < 1e-6 can swap order after rounding — a
                # plain head(k) could cut the one the oracle keeps
                kth = pairs["_s"].iloc[k - 1]
                pairs = pairs[pairs["_s"].to_numpy() >= kth - 2e-6]
            out.append(pairs[OUT_COLS])
        if not out:
            return pd.DataFrame({c: pd.Series(dtype="int64" if c in
                                 ("kind", "cnt", "ca", "cb") else "object")
                                 for c in OUT_COLS})
        return pd.concat(out, ignore_index=True)[OUT_COLS]

    import pyarrow as pa

    schema2 = pa.schema([("kind", pa.int64()), ("a", pa.string()),
                         ("b", pa.string()), ("cnt", pa.int64()),
                         ("ca", pa.int64()), ("cb", pa.int64())])
    stage1 = bucketed_group_apply(docs_ds, "key", bucket1,
                                  n_buckets=n_buckets, pre=pre)
    res = bucketed_group_apply(stage1, "key", bucket2,
                               n_buckets=n_buckets,
                               empty_schema=schema2).to_pandas()
    empty = pd.DataFrame({"a": pd.Series(dtype="object"),
                          "b": pd.Series(dtype="object"),
                          "cnt": pd.Series(dtype="int64"),
                          "ca": pd.Series(dtype="int64"),
                          "cb": pd.Series(dtype="int64"),
                          "pmi_micro": pd.Series(dtype="int64")})
    if "kind" not in res.columns or not len(res):
        return empty
    stats = res[res["kind"] == _K_STATS]
    W = int(stats["cnt"].sum())
    T = int(stats["ca"].sum())
    cand = res[res["kind"] == _K_PAIR]
    if not len(cand) or T == 0:
        return empty
    # the exact float-operation order of the oracle:
    # (((ln(cnt) + 2.0*ln(W)) - ln(T)) - ln(ca)) - ln(cb)
    pmi = ((((np.log(cand["cnt"].to_numpy(dtype=np.float64)) +
              2.0 * np.log(np.float64(W))) - np.log(np.float64(T)))
            - np.log(cand["ca"].to_numpy(dtype=np.float64)))
           - np.log(cand["cb"].to_numpy(dtype=np.float64)))
    cand = cand.assign(
        pmi_micro=np.floor(pmi * 1e6 + 0.5).astype(np.int64))
    out = cand.sort_values(["pmi_micro", "a", "b"],
                           ascending=[False, True, True],
                           kind="stable").head(k).reset_index(drop=True)
    for c in ("cnt", "ca", "cb", "pmi_micro"):
        out[c] = out[c].astype(np.int64)
    return out[["a", "b", "cnt", "ca", "cb", "pmi_micro"]]


def rank_normalize(docs_ds, value_pre, id_col: str = "doc_id",
                   n_buckets: int = 32):
    """EXACT rank-normalization (cume_dist) of an integer per-document
    metric — the quality-score calibration step of a multi-source
    curation pipeline: raw scores from heterogeneous sources aren't
    comparable, their corpus-rank percentiles are. For each doc,

        pct_micro = floor(#docs with value <= v  *  1e6 / N)

    (SQL cume_dist scaled to micro units, integer-exact).

    Scale shape: the same two-piece pattern as grouped_int_quantiles —
    the distributed (value, cnt) histogram collapses to distinct values
    (corpus-size-independent), its cumulative counts broadcast back
    into one zero-shuffle scoring scan via ray.put. No stage ever holds
    rows; the only all-data work is two streaming map passes.

    ``value_pre``: batch -> DataFrame with int64 ``value`` (+ id_col)
    columns. Returns a Dataset (id_col, value, pct_micro).
    """
    import ray

    hist = int_value_histogram(docs_ds, value_pre, n_buckets=n_buckets)
    hist = hist.sort_values("value").reset_index(drop=True)
    n_total = int(hist["cnt"].sum())
    cume = dict(zip(hist["value"].to_numpy(np.int64),
                    hist["cnt"].cumsum().to_numpy(np.int64)))
    cume_ref = ray.put((cume, n_total))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cmap, n = ray.get(cume_ref)
        v = value_pre(df)
        vals = v["value"].to_numpy(np.int64)
        cle = v["value"].map(cmap).to_numpy(np.int64)
        return pd.DataFrame({
            id_col: v[id_col].to_numpy(),
            "value": vals,
            "pct_micro": (cle * 1_000_000 // max(n, 1)).astype(np.int64)})

    return docs_ds.map_batches(score, batch_format="pandas")
