"""Cardinality sketches — approximate COUNT DISTINCT at corpus scale.

HyperLogLog (Flajolet et al. 2007) over a Ray Dataset: per-batch
register partials (one row per (group, register) touched), ONE bucketed
max exchange to merge, then a per-group fold to the estimate. The
exchange volume is bounded by groups × m registers regardless of input
rows — the whole point of the sketch at 10^10+ rows, where exact
distinct would shuffle every value.

Oracle-exactness design: every quantity the query emits is an INTEGER
computed with integer-only arithmetic (register max-rho values; the raw
HLL estimator as an exact HUGEINT floor division), so a DuckDB oracle
reproduces it bit-for-bit — no float summation-order or libm-precision
hazards. The bias-corrected estimate (linear counting below 2.5m) uses
floats and is exposed separately for users (`corrected_estimate`),
accuracy-tested rather than oracled.

Hash = md5 first 8 bytes big-endian (`('0x' || substr(md5(v),1,16))
::UBIGINT` on the SQL side). md5-per-value is the oracle-parity choice
(same precedent as functions/signatures.py); swap `_md5_u64` for a
faster 64-bit hash when oracle parity is not needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

HLL_P = 10                      # 2^10 = 1024 registers
HLL_M = 1 << HLL_P
_SUFFIX_BITS = 64 - HLL_P       # 54
_SUFFIX_MASK = np.uint64((1 << _SUFFIX_BITS) - 1)
_RHO_CAP = _SUFFIX_BITS + 1     # empty suffix -> 55

# alpha_m = 0.7213 / (1 + 1.079/m) as an exact rational A/B
_ALPHA_NUM = 7213 * 1000 * HLL_M
_ALPHA_DEN = 10000 * (1000 * HLL_M + 1079)
# raw estimate = alpha * m^2 / sum(2^-rho) = _EST_NUM // (_ALPHA_DEN * sum_scaled)
_EST_NUM = _ALPHA_NUM * HLL_M * HLL_M * (1 << 64)

_POP_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(a: np.ndarray) -> np.ndarray:
    return _POP_LUT[a.view(np.uint8)].reshape(-1, 8).sum(axis=1).astype(np.int64)


def _md5_u64(values) -> np.ndarray:
    """First 8 md5 bytes, big-endian — matches the SQL hex-prefix cast."""
    joined = b"".join(
        hashlib.md5((v if isinstance(v, str) else "" if v is None else str(v))
                    .encode("utf-8")).digest()[:8]
        for v in values
    )
    if not joined:
        return np.array([], dtype=np.uint64)
    return np.frombuffer(joined, dtype=">u8").astype(np.uint64)


def _rho(h: np.ndarray) -> np.ndarray:
    """1 + leading-zero count of the (64-p)-bit suffix, capped at 55.

    Exact integer path: smear the suffix down, popcount = bit length,
    rho = 55 - bit_length (zero suffix -> 55). No float log2.
    """
    w = h & _SUFFIX_MASK
    y = w.copy()
    for s in (1, 2, 4, 8, 16, 32):
        y |= y >> np.uint64(s)
    return (_RHO_CAP - _popcount64(y)).astype(np.int64)


def _raw_estimate(rhos: np.ndarray) -> int:
    """Exact integer raw HLL estimator over the present registers."""
    present = len(rhos)
    sum_scaled = sum(1 << (64 - int(r)) for r in rhos) + (HLL_M - present) * (1 << 64)
    return _EST_NUM // (_ALPHA_DEN * sum_scaled)


def corrected_estimate(rhos: np.ndarray) -> float:
    """Bias-corrected estimate (linear counting below 2.5m) — the value
    a user wants; floats, so accuracy-tested rather than SQL-oracled."""
    raw = float(_raw_estimate(rhos))
    zeros = HLL_M - len(rhos) + int((np.asarray(rhos) == 0).sum())
    if raw <= 2.5 * HLL_M and zeros > 0:
        return HLL_M * float(np.log(HLL_M / zeros))
    return raw


def hll_registers(ds, group_col: str, value_col: str, n_buckets: int = 64):
    """Dataset -> merged HLL registers: one row per (group, idx) with
    the max rho observed. Exchange rows ≤ batches × groups × m, merged
    rows ≤ groups × m."""
    from .agg import bucketed_group_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_u64(df[value_col])
        part = pd.DataFrame({
            group_col: df[group_col].to_numpy(),
            "idx": (h >> np.uint64(_SUFFIX_BITS)).astype(np.int64),
            "rho": _rho(h),
        })
        return part.groupby([group_col, "idx"], sort=False, as_index=False)["rho"].max()

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_group_apply(
        partials,
        [group_col, "idx"],
        lambda g: g.groupby([group_col, "idx"], sort=False, as_index=False)["rho"].max(),
        n_buckets=n_buckets,
    )


def hll_distinct(ds, group_col: str, value_col: str, n_buckets: int = 64):
    """Approximate distinct ``value_col`` per ``group_col``.

    Returns (group, hll_raw_est, n_registers_set) — all integers, exactly
    reproducible in SQL. ~1.04/sqrt(m) ≈ 3.3% relative error at
    cardinalities ≳ 3m; use `corrected_estimate` over `hll_registers`
    output when small-range accuracy matters.
    """
    from .agg import bucketed_group_apply

    regs = hll_registers(ds, group_col, value_col, n_buckets=n_buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for grp, gg in g.groupby(group_col, sort=False):
            rows.append({
                group_col: grp,
                "hll_raw_est": np.int64(_raw_estimate(gg["rho"].to_numpy())),
                "n_registers_set": np.int64(len(gg)),
            })
        return pd.DataFrame(rows, columns=[group_col, "hll_raw_est", "n_registers_set"])

    return bucketed_group_apply(regs, group_col, fold, n_buckets=min(n_buckets, 16))


# ---------------------------------------------------------------------------
# Count-Min sketch — approximate frequency estimation (Cormode &
# Muthukrishnan 2005). Mergeable by cell-wise sum, so the distributed
# layout is: per-batch partial cells (at most depth x width rows per
# batch, regardless of batch size), one bucketed sum exchange over
# (row, bucket), then point estimates = min over rows of the queried
# cells. Everything is integer arithmetic; the hash is the md5 idiom
# (row ':' value, first 8 hex chars), so a DuckDB oracle reproduces the
# sketch — and its estimates — bit-for-bit.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64


def _cms_bucket(row: int, values) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(f"{row}:{v}".encode()).hexdigest()[:8], 16) % CMS_WIDTH
         for v in values),
        dtype=np.int64, count=len(values),
    )


def cms_cells(ds, value_counts_fn, n_buckets: int = 16,
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """Build the Count-Min counter table over a Dataset.

    ``value_counts_fn(df) -> DataFrame(value, cnt)`` extracts the
    weighted items of one batch (e.g. token occurrence counts). Returns
    a Dataset of (row, bucket, cnt) cells — at most depth x width rows
    total after the merge. Per-batch md5 cost is bounded by DISTINCT
    values per batch x depth, not by row count."""
    from .agg import bucketed_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = value_counts_fn(df)
        vals = vc["value"].to_numpy()
        cnts = vc["cnt"].to_numpy(dtype=np.int64)
        frames = []
        for r in range(depth):
            b = _cms_bucket(r, vals)
            cell = pd.DataFrame({"row": r, "bucket": b, "cnt": cnts})
            frames.append(cell.groupby(["row", "bucket"], as_index=False)["cnt"].sum())
        return pd.concat(frames, ignore_index=True)

    cells = ds.map_batches(partial, batch_format="pandas")
    return bucketed_sum(cells, ["row", "bucket"], ["cnt"], n_buckets=n_buckets)


def cms_estimate(cells_df: pd.DataFrame, queries: list[str],
                 depth: int = CMS_DEPTH) -> pd.DataFrame:
    """Point-estimate each queried value from a (row, bucket, cnt)
    cell table: min over rows of the value's cell (0 when the cell is
    empty). Classic CMS guarantee: est >= true, est <= true + eps*N."""
    lut = {(int(r), int(b)): int(c)
           for r, b, c in cells_df[["row", "bucket", "cnt"]].itertuples(index=False)}
    ests = []
    for q in queries:
        cand = []
        for r in range(depth):
            b = int(_cms_bucket(r, [q])[0])
            cand.append(lut.get((r, b), 0))
        ests.append(min(cand))
    return pd.DataFrame({"term": list(queries),
                         "est_cnt": np.array(ests, dtype=np.int64)})


# ---------------------------------------------------------------------------
# Bloom filter — mergeable set-membership sketch (Bloom 1970). Completes
# the mergeable-sketch trio (HLL = distinct count, CMS = frequency,
# Bloom = membership). Distributed build: per-batch DISTINCT values ->
# k md5 bit positions -> per-batch unique bits, ONE bucketed exchange
# over the bit index (volume bounded by batches x m, final table <= m
# rows), then the filter is a sorted int array small enough to
# ray.put-broadcast. Probe is a zero-shuffle scan: every batch tests
# all k bits against the broadcast array. Same md5 idiom as CMS
# (salt ':' value, first 8 hex chars), so a DuckDB oracle rebuilds the
# exact same bit set and the exact same hit flags.
# ---------------------------------------------------------------------------

BLOOM_M = 2048
BLOOM_K = 3


def _bloom_positions(values, k: int = BLOOM_K, m: int = BLOOM_M) -> np.ndarray:
    """(len(values), k) int64 bit positions, md5('{i}:{v}') % m per salt."""
    if len(values) == 0:
        return np.empty((0, k), dtype=np.int64)
    cols = [
        np.fromiter(
            (int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:8], 16) % m
             for v in values),
            dtype=np.int64, count=len(values),
        )
        for i in range(k)
    ]
    return np.stack(cols, axis=1)


def bloom_build(ds, value_col: str, k: int = BLOOM_K, m: int = BLOOM_M,
                n_buckets: int = 4) -> np.ndarray:
    """Build a Bloom filter over the distinct values of one column.

    Returns the sorted array of set bit indices (<= m int64s — the
    broadcastable representation). md5 cost per batch is bounded by
    DISTINCT values per batch x k."""
    from .agg import bucketed_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = pd.unique(df[value_col].dropna())
        bits = np.unique(_bloom_positions(vals, k=k, m=m))
        return pd.DataFrame({"bit": bits.astype(np.int64),
                             "one": np.ones(len(bits), dtype=np.int64)})

    cells = ds.map_batches(partial, batch_format="pandas")
    merged = bucketed_sum(cells, ["bit"], ["one"], n_buckets=n_buckets).to_pandas()
    return np.sort(merged["bit"].to_numpy(dtype=np.int64))


def bloom_probe(ds, value_col: str, bits: np.ndarray,
                k: int = BLOOM_K, m: int = BLOOM_M):
    """Zero-shuffle membership probe: hit iff ALL k bit positions are in
    the broadcast filter. Returns a Dataset of (value_col, bloom_hit)
    with bloom_hit an int64 0/1 flag. No false negatives; false-positive
    rate ~ (1 - e^{-kn/m})^k."""
    import ray

    mask = np.zeros(m, dtype=bool)
    mask[bits] = True
    mask_ref = ray.put(mask)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        msk = ray.get(mask_ref)
        vals = df[value_col].to_numpy()
        pos = _bloom_positions(vals, k=k, m=m)
        hit = msk[pos].all(axis=1).astype(np.int64)
        return pd.DataFrame({value_col: vals, "bloom_hit": hit})

    return ds.map_batches(probe, batch_format="pandas")
