"""Curation sampling operators: deterministic hash-Bernoulli sampling
and stratified per-key quotas — the "take 1% of the corpus" / "at most
k docs per host/language" steps of a training-data pipeline, both
exactly reproducible (no RNG state, no ray-level sampling) so reruns
and the SQL oracle agree bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _md5_bucket(ids: np.ndarray, mod: int = 100) -> np.ndarray:
    """First 8 md5 hex chars of str(id) as an int, mod ``mod`` —
    deterministic, uniform, and computable in SQL
    (CAST('0x' || substr(md5(id::VARCHAR),1,8) AS UBIGINT) % mod).
    Per-row hashlib (~1µs/row) is the price of SQL-checkable
    determinism; a deployment that doesn't need the oracle can swap in
    a vectorized integer mix (e.g. splitmix64 in numpy) 1:1."""
    return np.fromiter(
        (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) % mod
         for i in ids),
        dtype=np.int64, count=len(ids),
    )


def hash_sample(ds, rate_pct: int, id_col: str = "doc_id"):
    """Keep ~rate_pct% of rows by id hash: a pure map_batches filter —
    embarrassingly parallel, no shuffle, stable under repartitioning."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        return df[_md5_bucket(ids) < rate_pct]

    return ds.map_batches(keep, batch_format="pandas")


def hash_split(ds, id_col: str = "doc_id", train_pct: int = 80, val_pct: int = 10):
    """Deterministic train/val/test split by id hash: adds a ``split``
    column (bucket < train_pct -> 'train', < train_pct+val_pct -> 'val',
    else 'test'). Pure map — no shuffle, stable under repartitioning and
    appends (a doc's split never changes when the corpus grows), which
    is the property that matters for decontamination bookkeeping.
    Proportions hold per stratum automatically (uniform hash is
    independent of any grouping column)."""
    hi_val = train_pct + val_pct

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        b = _md5_bucket(df[id_col].to_numpy(np.int64))
        split = np.where(b < train_pct, "train", np.where(b < hi_val, "val", "test"))
        return df.assign(split=split)

    return ds.map_batches(tag, batch_format="pandas")


def weighted_sample_topk(ds, k: int = 100, id_col: str = "doc_id",
                         text_col: str = "text") -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    each row draws u ~ U(0,1] from its id hash and scores
    key = ln(u)/w — order-equivalent to u^(1/w) — so the global top-k
    keys are an exact weighted sample without replacement. Weight
    w = char length + 1 (longer docs proportionally likelier), the
    usual token-mass proxy when sampling a training subset.

    Deterministic and SQL-checkable: u = first-8-md5-bytes(str(id)) as
    a double over 2^64 (the oracle computes the identical double; ln is
    IEEE double both sides). Distributed shape: a pure map computes
    keys, each block folds to its LOCAL top-k, and the driver merges
    blocks x k candidate rows — no shuffle, driver memory bounded by
    block count. Ties at the k boundary break on id asc."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        w = df[text_col].fillna("").str.len().to_numpy(np.int64) + 1
        h = np.fromiter(
            (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:16], 16)
             for i in ids),
            dtype=np.uint64, count=len(ids),
        )
        u = np.maximum(h, np.uint64(1)).astype(np.float64) / 2.0 ** 64
        out = pd.DataFrame({id_col: ids, "w": w, "__key": np.log(u) / w})
        return out.sort_values(["__key", id_col], ascending=[False, True],
                               kind="stable").head(k)

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = cand.sort_values(["__key", id_col], ascending=[False, True],
                           kind="stable").head(k)
    return out.drop(columns="__key").reset_index(drop=True)


def stratified_topk(ds, key_col: str, k: int, order_col: str,
                    n_buckets: int = 64, descending: bool = True):
    """At most ``k`` rows per key, ranked by ``order_col`` (ties broken
    by the order column only — callers wanting total determinism pass a
    unique order column). One bucketed exchange; the per-key head runs
    vectorized inside the bucket."""
    from .agg import bucketed_group_apply

    def head(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, ascending=not descending, kind="stable")
        return g.groupby(key_col, sort=False).head(k)

    return bucketed_group_apply(ds, key_col, head, n_buckets=n_buckets)


def curriculum_bins(ds, value_pre, ps=(0.25, 0.5, 0.75),
                    n_buckets: int = 32):
    """Curriculum binning: tag every document with its quantile bin of
    an integer difficulty/quality metric (token count, char length,
    quality score) — the easy-to-hard bucketing pass of curriculum
    training / quality-tiered sampling.

    Two passes, neither shuffles document rows: (1) the exact
    distributed value-histogram -> PERCENTILE_DISC cut points
    (ops.vocab machinery; the exchange moves (value, cnt) histograms
    bounded by the value domain, never rows), (2) a broadcast-cutpoint
    map tags bin = number of cut points strictly below the metric
    (values equal to a cut stay in the lower bin, PERCENTILE_DISC
    parity). ``value_pre(batch) -> DataFrame`` must return the id
    column(s) plus an int64 ``value`` column. Returns a Dataset of
    value_pre's columns plus ``bin``."""
    from .vocab import int_value_histogram, quantiles_from_histogram

    hist = int_value_histogram(ds, value_pre, n_buckets=n_buckets)
    q = quantiles_from_histogram(hist, tuple(ps))
    cuts = np.sort(q["value"].to_numpy(np.int64))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        v = value_pre(df)
        out = v.copy()
        out["bin"] = np.searchsorted(
            cuts, v["value"].to_numpy(np.int64), side="left").astype(np.int64)
        return out

    return ds.map_batches(tag, batch_format="pandas")


def mixture_sample(ds, rates_pct: dict, default_pct: int = 100,
                   id_col: str = "doc_id", group_col: str = "source"):
    """Data-mixture sampling: resample each source group to its mixture
    weight, expressed in percent — 300 = every doc 3x (upsampling /
    multiple epochs), 150 = every doc once plus a deterministic
    hash-chosen half again, 20 = keep ~20%, 0 = drop the source.
    copies = rate // 100 + (id-hash bucket < rate % 100).

    Pure vectorized map, ZERO shuffle, stable under repartitioning and
    corpus growth (a doc's copy count never changes when other docs
    appear — the property that keeps mixtures reproducible across
    incremental crawls). Emits (id_col, group_col, copy) with copy in
    [0, copies); np.repeat expansion, no Python loop."""

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        src = df[group_col].astype(object).to_numpy()
        rate = np.fromiter((rates_pct.get(s, default_pct) for s in src),
                           dtype=np.int64, count=len(src))
        copies = rate // 100 + (_md5_bucket(ids) < rate % 100)
        out_ids = np.repeat(ids, copies)
        out_src = np.repeat(src, copies)
        total = int(copies.sum())
        if total:
            cum = np.cumsum(copies)
            copy = np.arange(total) - np.repeat(cum - copies, copies)
        else:
            copy = np.empty(0, dtype=np.int64)
        return pd.DataFrame({id_col: out_ids, group_col: out_src,
                             "copy": copy.astype(np.int64)})

    return ds.map_batches(expand, batch_format="pandas")
