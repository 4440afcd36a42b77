"""Sharded cuckoo-filter URL-seen set.

The reference keeps the URL-seen set implicitly as CrawlDb membership
(every groupby-by-url reduce collapses duplicates). At 10^10-URL scale
the north_rule calls for an explicit approximate-membership structure:
one cuckoo filter per frontier partition (a few bytes/URL), rebuildable
from the partition's parquet files on resume, used to

- pre-classify discovered outlinks as novel vs already-seen (cheap
  anti-join before the updatedb shuffle),
- dedup redirect targets inside fetch actors
  (FetchItemQueues.java:272-280 analogue).

Standard cuckoo filter (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014): 4-slot buckets, 16-bit fingerprints, partial-
cuckoo relocation. Vectorized numpy storage; batch add/contains APIs.
"""

from __future__ import annotations

import numpy as np

_EMPTY = 0  # fingerprints are 1..65535; 0 marks a free slot
_MAX_KICKS = 500


def _hash64(arr: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit string hash, vectorized: pandas' siphash
    over the whole array in one C call (PYTHONHASHSEED-independent,
    stable across processes). Replaces a per-string per-byte Python FNV
    loop that dominated seen-shard rebuild CPU."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False).astype(np.uint64)


class CuckooFilter:
    def __init__(self, capacity: int, bucket_size: int = 4):
        # buckets sized to next power of two of capacity / bucket_size
        n_buckets = max(1, int(capacity / bucket_size / 0.95) + 1)
        self.n_buckets = 1 << (n_buckets - 1).bit_length()
        self.bucket_size = bucket_size
        self.table = np.zeros((self.n_buckets, bucket_size), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(42)

    # -- key decomposition ------------------------------------------------
    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == _EMPTY, np.uint16(1), fp)

    def _index1(self, h: np.ndarray) -> np.ndarray:
        return ((h >> np.uint64(16)) % np.uint64(self.n_buckets)).astype(np.int64)

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # i2 = i1 xor hash(fp)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(self.n_buckets)
        return (i1.astype(np.uint64) ^ fph).astype(np.int64) % self.n_buckets

    # -- single-item ops --------------------------------------------------
    def _insert_one(self, i1: int, i2: int, fp: int) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            free = np.flatnonzero(row == _EMPTY)
            if len(free):
                row[free[0]] = fp
                self.count += 1
                return True
        # relocate
        idx = i1 if self._rng.integers(2) else i2
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(self.bucket_size))
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            fph = (int(cur) * 0x5BD1E995) % self.n_buckets
            idx = (idx ^ fph) % self.n_buckets
            row = self.table[idx]
            free = np.flatnonzero(row == _EMPTY)
            if len(free):
                row[free[0]] = cur
                self.count += 1
                return True
        return False  # table full

    # -- batch ops --------------------------------------------------------
    def add_many(self, keys) -> int:
        """Insert keys; returns number successfully inserted.

        Vectorized bulk path: bucket rows are always prefix-packed
        (inserts fill the first free slot; kicks swap occupied slots),
        so slot = occupancy + within-batch rank, computed for the whole
        batch per candidate bucket in numpy. Only keys whose both
        buckets overflow fall back to the per-key cuckoo kick loop."""
        arr = np.asarray(keys, dtype=object)
        n = len(arr)
        if n == 0:
            return 0
        h = _hash64(arr)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        inserted = np.zeros(n, dtype=bool)
        for idx in (i1, i2):
            todo = np.flatnonzero(~inserted)
            if len(todo) == 0:
                break
            ti, tf = idx[todo], fp[todo]
            order = np.argsort(ti, kind="stable")
            ti_s, tf_s = ti[order], tf[order]
            starts = np.flatnonzero(np.r_[True, ti_s[1:] != ti_s[:-1]])
            counts = np.diff(np.r_[starts, len(ti_s)])
            rank = np.arange(len(ti_s)) - np.repeat(starts, counts)
            occ = (self.table[ti_s] != _EMPTY).sum(axis=1)
            slot = occ + rank
            ok = slot < self.bucket_size
            self.table[ti_s[ok], slot[ok]] = tf_s[ok]
            self.count += int(ok.sum())
            ins = np.zeros(len(ti), dtype=bool)
            ins[order] = ok
            inserted[todo] = ins
        for k in np.flatnonzero(~inserted):
            if self._insert_one(int(i1[k]), int(i2[k]), int(fp[k])):
                inserted[k] = True
        return int(inserted.sum())

    def contains_many(self, keys) -> np.ndarray:
        arr = np.asarray(keys, dtype=object)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        h = _hash64(arr)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        b1 = self.table[i1]  # (n, bucket_size)
        b2 = self.table[i2]
        fpc = fp[:, None]
        return ((b1 == fpc).any(axis=1)) | ((b2 == fpc).any(axis=1))

    def __contains__(self, key: str) -> bool:
        return bool(self.contains_many([key])[0])

    # -- (de)serialization ------------------------------------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.n_buckets, self.bucket_size, self.count], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        head = np.frombuffer(data[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_buckets, obj.bucket_size, obj.count = int(head[0]), int(head[1]), int(head[2])
        obj.table = (
            np.frombuffer(data[24:], dtype=np.uint16)
            .reshape(obj.n_buckets, obj.bucket_size)
            .copy()
        )
        obj._rng = np.random.default_rng(42)
        return obj


class ShardedSeen:
    """Per-partition URL-seen shards; shard key = the frontier `part` id."""

    def __init__(self, num_partitions: int, capacity_per_shard: int = 1 << 16):
        self.shards = [CuckooFilter(capacity_per_shard) for _ in range(num_partitions)]

    def add(self, parts: np.ndarray, urls) -> None:
        urls = np.asarray(urls, dtype=object)
        for p in np.unique(parts):
            self.shards[int(p)].add_many(urls[parts == p])

    def contains(self, parts: np.ndarray, urls) -> np.ndarray:
        urls = np.asarray(urls, dtype=object)
        out = np.zeros(len(urls), dtype=bool)
        for p in np.unique(parts):
            mask = parts == p
            out[mask] = self.shards[int(p)].contains_many(urls[mask])
        return out
