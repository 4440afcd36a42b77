"""Deterministic synthetic inputs (FIXTURES.md tiers).

- ``synth_frontier``: frontier table with Zipf-skewed host sizes
  (FIXTURES §F1: t1=101 rows/1 host, t2=10k rows/~200 hosts with one
  mega-host, bench=10^6+). Pure function of (n_urls, n_hosts, seed).
- ``synth_seeds``: seed lines incl. metadata cases (FIXTURES §F2).
- ``synth_docs``: interleaved text+media documents in the input_hint
  shape (doc_id, spans list<struct>) — span content is a pure function
  of hash(doc_id), so the oracle regenerates expected spans instead of
  storing blobs (FIXTURES §F3).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import CrawlConfig
from ..functions.urlutil import domains_of, partition_for_hosts
from ..model import DOCS_SCHEMA, FRONTIER_SCHEMA, CrawlStatus as CS

EPOCH = 1_700_000_000_000  # fixed "now" for deterministic fixtures (ms)


def _md5i(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def synth_frontier(
    n_urls: int,
    n_hosts: int,
    cfg: CrawlConfig | None = None,
    seed: int = 42,
    cur_time_ms: int = EPOCH,
    zipf_a: float = 1.3,
) -> pa.Table:
    """Zipf host sizes; scores/status deterministic per URL index."""
    cfg = cfg or CrawlConfig()
    rng = np.random.default_rng(seed)
    if n_hosts == 1:
        host_idx = np.zeros(n_urls, dtype=np.int64)
    else:
        w = 1.0 / np.arange(1, n_hosts + 1) ** zipf_a
        w /= w.sum()
        host_idx = rng.choice(n_hosts, size=n_urls, p=w)
    host_idx.sort()
    seq_in_host = np.zeros(n_urls, dtype=np.int64)
    # per-host running index (vectorized)
    change = np.r_[True, host_idx[1:] != host_idx[:-1]]
    starts = np.flatnonzero(change)
    seq = np.arange(n_urls)
    seq_in_host = seq - np.repeat(seq[starts], np.diff(np.r_[starts, n_urls]))

    hosts = np.array([f"host{h}.example" for h in host_idx], dtype=object)
    urls = np.array(
        [f"http://host{h}.example/page/{s}" for h, s in zip(host_idx, seq_in_host)],
        dtype=object,
    )
    # deterministic pseudo-random scores (Knuth mix — no per-url md5)
    mix = (host_idx.astype(np.uint64) * np.uint64(2654435761) + seq_in_host.astype(np.uint64) * np.uint64(40503) + np.uint64(seed)) % np.uint64(1 << 32)
    score = ((mix % np.uint64(10_000)).astype(np.float64) / 10_000.0).astype(np.float32)
    parts = partition_for_hosts(hosts, cfg.num_partitions, cfg.partition_seed, cfg.partition_mode)
    return pa.table(
        {
            "url": urls,
            "host": hosts,
            "domain": domains_of(hosts).to_numpy(dtype=object),
            "part": parts.astype(np.int32),
            "status": np.full(n_urls, CS.DB_UNFETCHED, dtype=np.uint8),
            "fetch_time": np.full(n_urls, cur_time_ms - 1000, dtype=np.int64),
            "retries": np.zeros(n_urls, dtype=np.uint8),
            "fetch_interval": np.full(n_urls, cfg.interval_default, dtype=np.int32),
            "score": score,
            "signature": pa.array([None] * n_urls, type=pa.binary()),
            "modified_time": np.zeros(n_urls, dtype=np.int64),
            "gen_time": np.zeros(n_urls, dtype=np.int64),
            "repr_url": pa.array([None] * n_urls, type=pa.string()),
            "fixed_interval": np.zeros(n_urls, dtype=np.int32),
            "metadata": pa.array([None] * n_urls, type=pa.string()),
            "pst": pa.array([None] * n_urls, type=pa.string()),
        },
        schema=FRONTIER_SCHEMA,
    )


def _zipf_weights(n_hosts: int, zipf_a: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n_hosts + 1) ** zipf_a
    return w / w.sum()


def synth_frontier_chunk(
    start: int,
    rows: int,
    n_hosts: int,
    cfg: CrawlConfig,
    seed: int,
    cur_time_ms: int,
    zipf_a: float,
) -> pa.Table:
    """One deterministic chunk of the distributed synthetic frontier.

    Pure function of (start, rows, n_hosts, seed): the rng is keyed by
    (seed, start) so any chunking of the same n_urls yields the same
    multiset of hosts in distribution, and page paths carry the GLOBAL
    row index so URLs are unique across chunks. URL text is built with
    Arrow kernels, not per-row f-strings."""
    import pyarrow.compute as pc

    rng = np.random.default_rng([seed, start])
    if n_hosts == 1:
        host_idx = np.zeros(rows, dtype=np.int64)
    else:
        host_idx = rng.choice(n_hosts, size=rows, p=_zipf_weights(n_hosts, zipf_a))
    page = np.arange(start, start + rows, dtype=np.int64)
    hid_s = pc.cast(pa.array(host_idx), pa.string())
    hosts = pc.binary_join_element_wise("host", hid_s, ".example", "")
    urls = pc.binary_join_element_wise(
        "http://", hosts, "/page/", pc.cast(pa.array(page), pa.string()), ""
    )
    hosts_np = hosts.to_numpy(zero_copy_only=False)
    mix = (
        host_idx.astype(np.uint64) * np.uint64(2654435761)
        + page.astype(np.uint64) * np.uint64(40503)
        + np.uint64(seed)
    ) % np.uint64(1 << 32)
    score = ((mix % np.uint64(10_000)).astype(np.float64) / 10_000.0).astype(np.float32)
    parts = partition_for_hosts(hosts_np, cfg.num_partitions, cfg.partition_seed, cfg.partition_mode)
    return pa.table(
        {
            "url": urls,
            "host": hosts,
            "domain": domains_of(hosts_np).to_numpy(dtype=object),
            "part": parts.astype(np.int32),
            "status": np.full(rows, CS.DB_UNFETCHED, dtype=np.uint8),
            "fetch_time": np.full(rows, cur_time_ms - 1000, dtype=np.int64),
            "retries": np.zeros(rows, dtype=np.uint8),
            "fetch_interval": np.full(rows, cfg.interval_default, dtype=np.int32),
            "score": score,
            "signature": pa.array([None] * rows, type=pa.binary()),
            "modified_time": np.zeros(rows, dtype=np.int64),
            "gen_time": np.zeros(rows, dtype=np.int64),
            "repr_url": pa.array([None] * rows, type=pa.string()),
            "fixed_interval": np.zeros(rows, dtype=np.int32),
            "metadata": pa.array([None] * rows, type=pa.string()),
            "pst": pa.array([None] * rows, type=pa.string()),
        },
        schema=FRONTIER_SCHEMA,
    )


def synth_frontier_ds(
    n_urls: int,
    n_hosts: int,
    cfg: CrawlConfig | None = None,
    seed: int = 42,
    cur_time_ms: int = EPOCH,
    zipf_a: float = 1.3,
    chunk_rows: int = 1_000_000,
):
    """Distributed variant of ``synth_frontier`` for corpus-scale
    rehearsals (the 100M-row rung): the frontier never materializes on
    the driver — one Ray Data block per ``chunk_rows`` slice, each
    generated inside map_batches by ``synth_frontier_chunk``. Feed the
    result to ``CrawlDriver.bootstrap_ds``. Deterministic given
    (n_urls, n_hosts, seed, chunk_rows); host-size distribution matches
    the driver-side generator (same Zipf weights) but rows are not
    byte-identical to ``synth_frontier`` (per-chunk host draws, global
    page index)."""
    import ray

    cfg = cfg or CrawlConfig()
    chunks = [
        {"start": s, "rows": min(chunk_rows, n_urls - s)}
        for s in range(0, n_urls, chunk_rows)
    ]

    def gen(batch: pd.DataFrame) -> pa.Table:
        tabs = [
            synth_frontier_chunk(
                int(r.start), int(r.rows), n_hosts, cfg, seed, cur_time_ms, zipf_a
            )
            for r in batch.itertuples()
        ]
        if not tabs:  # empty block: emit a typed 0-row table, not a crash
            return synth_frontier_chunk(0, 0, n_hosts, cfg, seed, cur_time_ms, zipf_a)
        return tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)

    return ray.data.from_items(chunks, override_num_blocks=len(chunks)).map_batches(
        gen, batch_format="pandas", batch_size=None
    )


def synth_seeds(n: int, n_hosts: int = 10, with_meta_every: int = 5) -> list[str]:
    lines = ["# synthetic seed list"]
    for i in range(n):
        url = f"http://host{i % n_hosts}.example/page/{i}"
        if with_meta_every and i % with_meta_every == 0:
            lines.append(f"{url}\tnutch.score=2.0\tcollection=c{i % 3}")
        else:
            lines.append(url)
    return lines


SPAN_KINDS = ("title", "heading", "text", "media", "link")


def expected_spans(doc_id: str) -> list[dict]:
    """Pure function hash(doc_id) -> span sequence; the test oracle calls
    this same function (golden = regenerate)."""
    h = _md5i(doc_id)
    n_spans = 3 + h % 5
    spans = []
    x = h
    for i in range(n_spans):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        if i == 0:
            kind = "title"
        elif x % 5 == 0:
            kind = "media"
        elif x % 7 == 0:
            kind = "link"
        elif x % 3 == 0:
            kind = "heading"
        else:
            kind = "text"
        text = f"{kind} span {x % 100000} of {doc_id}" if kind not in ("media",) else ""
        media_ref = (
            f"http://assets.example/{x % 99999}.png"
            if kind == "media"
            else (f"http://host{x % 50}.example/page/{x % 1000}" if kind == "link" else "")
        )
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": i})
    return spans


def synth_docs(n_docs: int) -> pa.Table:
    doc_ids = [f"doc-{i:06d}" for i in range(n_docs)]
    spans = [expected_spans(d) for d in doc_ids]
    return pa.table({"doc_id": doc_ids, "spans": spans}, schema=DOCS_SCHEMA)
