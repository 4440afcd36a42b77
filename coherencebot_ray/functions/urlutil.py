"""Scalar/vector URL utilities.

- host/domain extraction (reference: src/java/org/apache/nutch/util/URLUtil.java,
  util/domain/DomainSuffixes — here a compact public-suffix subset)
- ``java_string_hashcode`` — Java String.hashCode, used by the reference's
  URLPartitioner (URLPartitioner.java:90-97) for host partitioning
- ``generator_url_hash`` — the Generator fetchlist HashComparator byte hash
  (Generator.java:629-636): reversed-byte polynomial so fetch order
  decorrelates from host order
- ``partition_for_hosts`` — (hashCode ^ seed) & MAX_INT % P (URLPartitioner.java:104-106)

All vector entry points operate on numpy/pyarrow arrays; distinct-value
caching keeps the per-row cost at "dict lookup" for the common case of
many URLs per host.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pandas as pd

_MASK32 = 0xFFFFFFFF
_JAVA_MAX_INT = 0x7FFFFFFF

# Compact second-level public-suffix subset (reference ships the full
# publicsuffix list in conf/domain-suffixes.xml; this covers the synthetic
# and test hosts plus common real-world cases).
_SECOND_LEVEL_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
        "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
        "co.in", "co.kr", "co.za", "com.sg", "com.tr", "com.ar",
    }
)


def _to_signed32(x: int) -> int:
    x &= _MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def java_string_hashcode(s: str) -> int:
    """Java ``String.hashCode()``: h = 31*h + char, 32-bit wrapping."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & _MASK32
    return _to_signed32(h)


def generator_url_hash(url: str) -> int:
    """Generator.HashComparator.hash (Generator.java:629-636).

    hash = 1; for bytes last→first: hash = 31*hash + signed_byte.
    """
    b = url.encode("utf-8")
    h = 1
    for i in range(len(b) - 1, -1, -1):
        v = b[i]
        if v >= 128:
            v -= 256
        h = (31 * h + v) & _MASK32
    return _to_signed32(h)


def generator_url_hash_vec(urls) -> np.ndarray:
    """Vectorized ``generator_url_hash`` over an iterable of URL strings.

    Python loop per string is acceptable: fetchlists are bounded by topN
    per partition (50k), so this is never the per-frontier-row hot path.
    """
    out = np.empty(len(urls), dtype=np.int64)
    for i, u in enumerate(urls):
        out[i] = generator_url_hash(u)
    return out


def get_host(url: str) -> str:
    """Lowercased hostname; '' when unparseable (URLUtil.getHost)."""
    try:
        h = urlsplit(url).hostname
        return h.lower() if h else ""
    except ValueError:
        return ""


def get_domain(host: str) -> str:
    """Registered domain of a hostname (URLUtil.getDomainName analogue;
    TestURLUtil: an IP host is its own domain)."""
    if not host:
        return ""
    parts = host.split(".")
    if len(parts) == 4 and all(p.isdigit() for p in parts):
        return host  # IP literal (URLUtil returns it whole)
    if len(parts) <= 2:
        return host
    if ".".join(parts[-2:]) in _SECOND_LEVEL_SUFFIXES:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


def get_domain_suffix(host: str) -> str:
    """Public-suffix part of a hostname (URLUtil.getDomainSuffix over
    util/domain/DomainSuffixes; same compact subset as get_domain).
    IP literals and bare hosts have no suffix ('')."""
    if not host:
        return ""
    parts = host.split(".")
    if len(parts) == 4 and all(p.isdigit() for p in parts):
        return ""
    if len(parts) < 2:
        return ""
    two = ".".join(parts[-2:])
    if two in _SECOND_LEVEL_SUFFIXES:
        return two
    return parts[-1]


def hosts_of(urls) -> pd.Series:
    """Vector host extraction with distinct-value caching."""
    s = pd.Series(urls, dtype="object")
    # most URL lists repeat hosts heavily; compute per distinct prefix
    return s.map(_HostCache())


class _HostCache:
    def __init__(self):
        self._cache: dict[str, str] = {}

    def __call__(self, url: str) -> str:
        # cache on the scheme://authority prefix
        end = url.find("/", url.find("://") + 3) if "://" in url else len(url)
        key = url[:end] if end != -1 else url
        h = self._cache.get(key)
        if h is None:
            h = get_host(url)
            self._cache[key] = h
        return h


def domains_of(hosts) -> pd.Series:
    s = pd.Series(hosts, dtype="object")
    uniq = {h: get_domain(h) for h in s.unique()}
    return s.map(uniq)


def partition_for_hosts(hosts, num_partitions: int, seed: int = 42, mode: str = "byHost") -> np.ndarray:
    """Partition id per host: (hashCode(key) ^ seed) & MAX_INT % P.

    Mirrors URLPartitioner.getPartition (URLPartitioner.java:75-107) with
    mode byHost (key = host) or byDomain (key = registered domain).
    Vectorized via a distinct-host hash cache.
    """
    s = pd.Series(hosts, dtype="object")
    uniq = s.unique()
    table = {}
    for h in uniq:
        key = h if mode == "byHost" else get_domain(h)
        hc = java_string_hashcode(key) ^ seed
        table[h] = (_to_signed32(hc) & _JAVA_MAX_INT) % num_partitions
    return s.map(table).to_numpy(dtype=np.int32)


def is_internal(src_host: str, dst_host: str, mode: str = "byHost") -> bool:
    """Internal-link test (db.ignore.*.links semantics; LinkDb.java:142-176)."""
    if mode == "byDomain":
        return get_domain(src_host) == get_domain(dst_host)
    return src_host == dst_host
