"""Temporal joins Ray Data lacks natively: as-of join and interval
range join over a keyed event log.

Both are the textbook distributed layout: hash-partition BOTH sides by
the join key (tagged union + one bucketed exchange, ops/agg.py), then a
fully vectorized in-bucket sort-merge — no per-row or per-key Python
loop. The in-bucket kernel is one combined lexsort over
(key, ts, side) plus a cumulative build count with per-key-segment
rebasing, which yields for every probe row the [lo, hi) slice of its
key's time-sorted build rows in O((B+P) log (B+P)).

Partitioning assumption (documented per the custom-operator rule): all
rows of one join key land in one bucket — guaranteed by hashing the key
— so bucket count B bounds shuffle fan-in while per-bucket work stays
vectorized across every key in the bucket. Skewed keys concentrate in
one bucket; at 100 TB the mitigation is the same as the reference's
reducer skew story (raise n_buckets; a single hot key is still one
task's sort, O(n log n), not O(n^2)).

Semantics:
- ``asof_join``: for each probe row, the build row of the same key with
  the LARGEST ts <= probe.ts (DuckDB ``ASOF JOIN`` / pandas
  ``merge_asof`` backward semantics), inner — unmatched probes drop.
- ``range_join_pairs``: every (probe, build) pair of the same key with
  build.ts in the half-open window [probe.ts - window, probe.ts).
  Output cardinality is the true join size; callers bound it by the
  window width.

Timestamps ride as int64 microseconds (column ``__ts``), so window
arithmetic and tie-breaks are exact integer compares — no float time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import bucketed_group_apply

_SIDE = "__side"  # 0 = build, 1 = probe
_TS = "__ts"  # int64 epoch microseconds
_KEY = "__key"


def ts_epoch_us(s: pd.Series) -> np.ndarray:
    """Timestamp column -> int64 epoch microseconds (unit-safe)."""
    return pd.to_datetime(s).astype("datetime64[us]").astype("int64").to_numpy()


def _same_key_build_counts(
    bu: np.ndarray, bt: np.ndarray, pu: np.ndarray, pk: np.ndarray, inclusive: bool
) -> tuple[np.ndarray, np.ndarray]:
    """For each probe i return (count, base):

    count = #{j : bu[j] == pu[i] and (bt[j] <= pk[i] if inclusive else
    bt[j] < pk[i])}; base = #{j : bu[j] ordered-before pu[i]} — i.e. the
    global offset of key pu[i]'s segment in the (key, ts)-sorted build
    array, so matched build rows are exactly positions
    [base + lo, base + hi) of that array.

    One lexsort over the concatenated sides; the tie column decides
    whether equal-ts builds count (builds-first = inclusive).
    """
    nb, npr = len(bu), len(pu)
    keys = np.concatenate([bu, pu])
    ts = np.concatenate([bt, pk])
    if inclusive:
        tie = np.concatenate([np.zeros(nb, np.int8), np.ones(npr, np.int8)])
    else:
        tie = np.concatenate([np.ones(nb, np.int8), np.zeros(npr, np.int8)])
    order = np.lexsort((tie, ts, keys))
    sk = keys[order]
    is_b = order < nb
    cb = np.cumsum(is_b)  # builds at sorted positions <= i
    new_seg = np.r_[True, sk[1:] != sk[:-1]]
    seg_start = np.flatnonzero(new_seg)
    base_at_seg = np.where(seg_start == 0, 0, cb[np.maximum(seg_start - 1, 0)])
    seg_id = np.cumsum(new_seg) - 1
    base = base_at_seg[seg_id]
    # a probe row is not a build, so cb at its position counts builds
    # strictly before it in the combined order; minus the per-key base
    # that is exactly the same-key count under the chosen tie rule
    inv = np.empty(nb + npr, dtype=np.int64)
    inv[order] = np.arange(nb + npr)
    pos = inv[nb:]
    return (cb[pos] - base[pos]).astype(np.int64), base[pos].astype(np.int64)


def _tag_side(ds, side: int, key_col: str, ts_col: str, payload: dict[str, str],
              all_payload: dict[str, str]):
    """Project one side to the common exchange schema: __key, __ts,
    __side, then EVERY payload column in one canonical order (the other
    side's columns ride as typed zeros, never read back — the bucket
    kernel splits sides before touching payloads). Both sides emitting
    the same column order keeps union block schemas identical."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        out = {
            _KEY: df[key_col].to_numpy() if n else np.array([], dtype=np.int64),
            _TS: ts_epoch_us(df[ts_col]) if n else np.array([], dtype=np.int64),
            _SIDE: np.full(n, side, dtype=np.int8),
        }
        for c, dt in all_payload.items():
            if c in payload:
                out[c] = df[c].to_numpy().astype(dt) if n else np.array([], dtype=dt)
            else:
                out[c] = np.zeros(n, dtype=dt)
        return pd.DataFrame(out)

    return ds.map_batches(tag, batch_format="pandas")


def _co_group(probe_ds, build_ds, key_col, ts_col, probe_payload, build_payload,
              bucket_fn, n_buckets):
    if set(probe_payload) & set(build_payload):
        raise ValueError("probe/build payload column names must not overlap")
    all_payload = {**probe_payload, **build_payload}
    tagged = _tag_side(build_ds, 0, key_col, ts_col, build_payload, all_payload).union(
        _tag_side(probe_ds, 1, key_col, ts_col, probe_payload, all_payload)
    )
    return bucketed_group_apply(tagged, _KEY, bucket_fn, n_buckets=n_buckets)


def asof_join(
    probe_ds,
    build_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    probe_payload: dict[str, str] | None = None,
    build_payload: dict[str, str] | None = None,
    n_buckets: int = 64,
):
    """Backward as-of join (inner): per probe row, the same-key build
    row with the largest build.ts <= probe.ts.

    ``*_payload`` map carried column name -> numpy dtype string; build
    payload names must differ from probe names (rename upstream).
    Output: key_col, probe payloads, matched build payloads, ``ts_us``
    (probe) and ``lag_us`` = probe.ts - build.ts, both int64 µs.
    """
    probe_payload = dict(probe_payload or {})
    build_payload = dict(build_payload or {})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = (
            [key_col, "ts_us"]
            + list(probe_payload)
            + list(build_payload)
            + ["lag_us"]
        )
        b = g[g[_SIDE] == 0]
        p = g[g[_SIDE] == 1]
        if len(b) == 0 or len(p) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        bu = b[_KEY].to_numpy()
        bt = b[_TS].to_numpy()
        bord = np.lexsort((bt, bu))
        bu, bt = bu[bord], bt[bord]
        pu = p[_KEY].to_numpy()
        pt = p[_TS].to_numpy()
        hi, base = _same_key_build_counts(bu, bt, pu, pt, inclusive=True)
        ok = hi > 0
        midx = (base + hi - 1)[ok]
        out = {key_col: pu[ok], "ts_us": pt[ok]}
        for c in probe_payload:
            out[c] = p[c].to_numpy()[ok]
        for c in build_payload:
            out[c] = b[c].to_numpy()[bord][midx]
        out["lag_us"] = pt[ok] - bt[midx]
        return pd.DataFrame(out)

    return _co_group(probe_ds, build_ds, key_col, ts_col, probe_payload,
                     build_payload, per_bucket, n_buckets)


def range_join_pairs(
    probe_ds,
    build_ds,
    window_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    probe_payload: dict[str, str] | None = None,
    build_payload: dict[str, str] | None = None,
    n_buckets: int = 64,
):
    """Interval range join: all same-key (probe, build) pairs with
    build.ts in [probe.ts - window_s, probe.ts). Output: key_col, probe
    payloads, build payloads, ``lag_us`` = probe.ts - build.ts (> 0).

    Pair emission is vectorized: per probe a [lo, hi) slice into the
    key-segmented time-sorted build array, materialized with one
    np.repeat + offset-arange — no Python loop over matches.
    """
    probe_payload = dict(probe_payload or {})
    build_payload = dict(build_payload or {})
    w_us = int(window_s) * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = [key_col] + list(probe_payload) + list(build_payload) + ["lag_us"]
        b = g[g[_SIDE] == 0]
        p = g[g[_SIDE] == 1]
        if len(b) == 0 or len(p) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        bu = b[_KEY].to_numpy()
        bt = b[_TS].to_numpy()
        bord = np.lexsort((bt, bu))
        bu, bt = bu[bord], bt[bord]
        pu = p[_KEY].to_numpy()
        pt = p[_TS].to_numpy()
        hi, base = _same_key_build_counts(bu, bt, pu, pt, inclusive=False)
        lo, _ = _same_key_build_counts(bu, bt, pu, pt - w_us, inclusive=False)
        n = hi - lo
        tot = int(n.sum())
        if tot == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        rep = np.repeat(np.arange(len(pu)), n)
        starts = base + lo
        cum = np.concatenate([[0], np.cumsum(n)[:-1]])
        bidx = np.repeat(starts - cum, n) + np.arange(tot)
        out = {key_col: pu[rep]}
        for c in probe_payload:
            out[c] = p[c].to_numpy()[rep]
        for c in build_payload:
            out[c] = b[c].to_numpy()[bord][bidx]
        out["lag_us"] = pt[rep] - bt[bidx]
        return pd.DataFrame(out)

    return _co_group(probe_ds, build_ds, key_col, ts_col, probe_payload,
                     build_payload, per_bucket, n_buckets)
