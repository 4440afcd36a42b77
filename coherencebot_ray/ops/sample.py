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
