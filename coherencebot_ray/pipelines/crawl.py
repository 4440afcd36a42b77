"""The crawl round loop: generate → fetch+parse → updatedb, checkpointed.

Reference control plane: src/bin/crawl:316-470 (bash loop over MapReduce
jobs, state via CrawlDb/segment dirs, atomic install). Here: one Python
driver; state lives in

  workdir/
    frontier/            FrontierStore (versioned generations, manifests)
    segments/gen=N/      fetchlist/ fetch_out/ docs/ outlinks/
                         crawl_parse/ (per-partition parquet) +
                         _ROUND.json (lineage + metrics, written LAST)

Physical plan (the scale design): the frontier is hash(host)-partitioned
ON DISK, so no round stage needs an all-to-all sort —

  1. generate:   one task per partition (read part → eligibility →
                 select → write fetchlist/part=p). Politeness partition
                 invariant preserved by construction.
  2. fetch+parse: one task per non-empty partition, FUSED — fetched
                 content is parsed in-memory and never hits storage
                 (unless cfg.store_content). Discovered-link datums are
                 the only cross-partition data: each task writes them
                 pre-partitioned by TARGET part
                 (crawl_parse/part=T/from=p.parquet — deterministic
                 names, idempotent under retry). This partitioned write
                 IS the round's only exchange; at very large partition
                 counts (P > ~256) swap it for a Ray Data hash shuffle
                 to avoid P² small files.
  3. updatedb:   one task per TOUCHED partition (frontier part ⋈ fetch
                 datums ⋈ crawl_parse) → vectorized merge kernel →
                 writes the new generation's partition file directly;
                 untouched partitions carry forward by manifest
                 reference. A 10^10-row frontier never fully rewrites.

Each phase runs as a Ray Data pipeline over partition descriptors
(``from_items(parts).map_batches(fn, batch_size=1)``) — the streaming
executor provides scheduling, backpressure and task retry; every task
writes deterministic paths so retries are idempotent.

Resume: a round without ``_ROUND.json`` is incomplete — its segment
dirs are discarded and the round re-runs from the last committed
generation (CrawlDb install rotation analogue, CrawlDb.java:209-224).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..model import (
    FRONTIER_SCHEMA,
    SPAN_TYPE,
    CrawlStatus as CS,
    frontier_table_from_pandas,
    table_from_pandas,
)
from ..state.frontier_store import FrontierStore

_FETCH_DATUM_COLS = [
    "url", "host", "part", "status", "fetch_time", "retries", "fetch_interval",
    "score", "signature", "modified_time", "gen_time", "repr_url",
    "fixed_interval", "metadata", "fetch_order", "content_type",
    "pst", "truncated",  # hot keys as typed columns (SURVEY §1.3)
]


_DATUM_FIELDS = [
    ("url", pa.string()), ("host", pa.string()), ("part", pa.int32()),
    ("status", pa.int32()), ("fetch_time", pa.int64()), ("retries", pa.int32()),
    ("fetch_interval", pa.int32()), ("score", pa.float32()),
    ("signature", pa.binary()), ("modified_time", pa.int64()),
    ("gen_time", pa.int64()), ("repr_url", pa.string()),
    ("fixed_interval", pa.int32()), ("metadata", pa.string()),
]
FETCHLIST_SCHEMA = pa.schema(
    _DATUM_FIELDS
    + [("domain", pa.string()), ("segnum", pa.int32()), ("sort_score", pa.float32()),
       ("fetch_delay_ms", pa.int64())]
)
FETCH_OUT_SCHEMA = pa.schema(
    _DATUM_FIELDS
    + [("fetch_order", pa.int64()), ("content_type", pa.string()),
       # typed hot keys: protocol status (rides into the frontier) and
       # the per-segment truncation mark (reference keeps TRUNCATED in
       # segment Content metadata — it does NOT enter the crawldb)
       ("pst", pa.string()), ("truncated", pa.string())]
)
CONTENT_SCHEMA = pa.schema(
    [("url", pa.string()), ("content", pa.binary()), ("content_type", pa.string())]
)
CRAWL_PARSE_SCHEMA = pa.schema(
    [("url", pa.string()), ("host", pa.string()), ("part", pa.int32()),
     ("status", pa.int32()), ("score", pa.float32()), ("signature", pa.binary()),
     ("fetch_interval", pa.int32()), ("anchor", pa.string()),
     ("metadata", pa.string()), ("fetch_time", pa.int64())]
)
DOCS_SEG_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("url", pa.string()), ("host", pa.string()),
     ("part", pa.int32()), ("spans", pa.list_(SPAN_TYPE)),
     ("signature", pa.binary()), ("fetch_time", pa.int64())]
)
OUTLINKS_SEG_SCHEMA = pa.schema(
    [("url", pa.string()), ("host", pa.string()), ("part", pa.int32()),
     ("dst", pa.string()), ("anchor", pa.string())]
)


def _pin_arrow_threads() -> None:
    """One Arrow thread per task: P concurrent partition tasks each
    defaulting to a num_cpus-wide Arrow pool oversubscribe the node
    (measured: 32-cpu run SLOWER than 8-cpu until pinned)."""
    try:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
    except Exception:
        pass


def _write_df(df: pd.DataFrame, path: str, schema: pa.Schema | None = None) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = (
        table_from_pandas(df, schema)
        if schema is not None
        else pa.Table.from_pandas(df, preserve_index=False)
    )
    pq.write_table(t, path, compression="zstd")


class _GenScanTask:
    """Phase 1a: per (partition, subshard-file) eligibility scan.

    Splits the mega-partition scan straggler across subshard files. When
    per-host counting is OFF (gen_max_count <= 0, no hostdb) candidates
    are pre-pruned to the per-partition top-``limit`` by score — exact,
    because the selector takes at most ``limit`` rows in score order.
    With counting on, all eligible rows ship (the selector may need
    more than ``limit`` candidates past capped hosts).
    """

    def __init__(self, cfg, cur_time_ms, limit, cand_dir, filters, can_prune):
        self.cfg, self.cur, self.limit = cfg, cur_time_ms, limit
        self.cand_dir, self.filters, self.can_prune = cand_dir, filters, can_prune

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _pin_arrow_threads()
        t_busy = time.monotonic()
        from ..stages.generate import eligibility_filter

        out = []
        for part, fidx, fpath in zip(batch["part"], batch["fidx"], batch["file"]):
            df = pq.read_table([fpath], partitioning=None).to_pandas()
            elig = eligibility_filter(df, self.cfg, self.cur, self.filters)
            if self.can_prune and len(elig) > self.limit:
                scores = elig["score"].to_numpy(dtype=np.float32)
                keep = np.argpartition(-scores, self.limit - 1)[: self.limit]
                elig = elig.iloc[np.sort(keep)]  # preserve input order for ties
            if len(elig):
                # explicit frontier schema: candidates are frontier rows,
                # and schema inference would type an all-None slice of a
                # nullable column (pst, repr_url...) as Arrow null —
                # unmergeable with a sibling cand file that has values
                _write_df(
                    elig,
                    os.path.join(self.cand_dir, f"part-{int(part)}", f"cand-{int(fidx)}.parquet"),
                    FRONTIER_SCHEMA,
                )
            out.append({"part": int(part), "eligible": int(len(elig))})
        df = pd.DataFrame(out)
        df["busy"] = (time.monotonic() - t_busy) / max(1, len(out))
        return df


class _GenSelectTask:
    """Phase 1b: per-partition selector over the (small) candidate set."""

    def __init__(self, cfg, cur_time_ms, gen_time_ms, limit, cand_dir, fl_dir, hostdb):
        self.cfg, self.cur, self.gen_time, self.limit = cfg, cur_time_ms, gen_time_ms, limit
        self.cand_dir, self.fl_dir, self.hostdb = cand_dir, fl_dir, hostdb

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _pin_arrow_threads()
        t_busy = time.monotonic()
        from ..stages.generate import select_partition

        out = []
        for part in batch["part"]:
            part = int(part)
            files = sorted(glob.glob(os.path.join(self.cand_dir, f"part-{part}", "cand-*.parquet")))
            if not files:
                out.append({"part": part, "selected": 0})
                continue
            elig = pq.read_table(files, partitioning=None).to_pandas()
            sel = select_partition(elig, self.cfg, self.limit, self.gen_time, self.hostdb)
            if len(sel):
                _write_df(sel, os.path.join(self.fl_dir, f"part-{part}", "data-0.parquet"), FETCHLIST_SCHEMA)
            out.append({"part": part, "selected": int(len(sel))})
        df = pd.DataFrame(out)
        df["busy"] = (time.monotonic() - t_busy) / max(1, len(out))
        return df


class _GenFusedTask:
    """Fused scan+select for a whole partition in ONE task — the common
    case (few subshard files). The scan/select split (with candidate
    spill files) only pays off for mega-partitions whose scan must fan
    out across many subshard files; for everyone else it costs a second
    Ray job barrier plus a parquet round-trip."""

    def __init__(self, cfg, cur_time_ms, gen_time_ms, limit, fl_dir, files_by_part, hostdb, filters):
        self.cfg, self.cur, self.gen_time, self.limit = cfg, cur_time_ms, gen_time_ms, limit
        self.fl_dir, self.files_by_part = fl_dir, files_by_part
        self.hostdb, self.filters = hostdb, filters

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _pin_arrow_threads()
        t_busy = time.monotonic()
        from ..stages.generate import eligibility_filter, select_partition

        out = []
        for part in batch["part"]:
            part = int(part)
            files = self.files_by_part.get(part, [])
            if not files:
                out.append({"part": part, "selected": 0})
                continue
            df = pq.read_table(files, partitioning=None).to_pandas()
            elig = eligibility_filter(df, self.cfg, self.cur, self.filters)
            sel = select_partition(elig, self.cfg, self.limit, self.gen_time, self.hostdb)
            if len(sel):
                _write_df(sel, os.path.join(self.fl_dir, f"part-{part}", "data-0.parquet"), FETCHLIST_SCHEMA)
            out.append({"part": part, "selected": int(len(sel))})
        df = pd.DataFrame(out)
        df["busy"] = (time.monotonic() - t_busy) / max(1, len(out))
        return df


class _GenWritebackTask:
    """Generator CrawlDbUpdater analogue (Generator.java:642-691): stamp
    the selected urls' gen_time into the frontier store as a NEW
    generation, so a second generate before updatedb skips in-flight
    urls (re-entrancy) and urls generated-but-never-fetched stay locked
    for crawl.gen.delay."""

    def __init__(self, cfg, gen_time_ms, seg, files_by_part, store_root, wb_gen):
        self.cfg, self.gen_time, self.seg = cfg, gen_time_ms, seg
        self.files_by_part, self.store_root, self.wb_gen = files_by_part, store_root, wb_gen

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _pin_arrow_threads()
        from ..state.cuckoo import CuckooFilter

        out = []
        for part in batch["part"]:
            part = int(part)
            files = self.files_by_part.get(part, [])
            fl = os.path.join(self.seg, "fetchlist", f"part-{part}", "data-0.parquet")
            if not files or not os.path.exists(fl):
                out.append({"part": part, "rows": 0})
                continue
            df = pq.read_table(files, partitioning=None).to_pandas()
            sel = set(pq.read_table(fl, columns=["url"]).column("url").to_pylist())
            mask = df["url"].isin(sel)
            df.loc[mask, "gen_time"] = self.gen_time
            dest = os.path.join(
                self.store_root, f"gen={self.wb_gen:06d}.tmp", f"part={part}", "data-0.parquet"
            )
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            pq.write_table(frontier_table_from_pandas(df), dest, compression="zstd")
            cf = CuckooFilter(capacity=max(1024, 2 * len(df)))
            cf.add_many(df["url"].to_numpy())
            with open(dest.replace(".parquet", ".seen"), "wb") as fh:
                fh.write(cf.to_bytes())
            out.append({"part": part, "rows": int(len(df))})
        return pd.DataFrame(out)


class _FetchParseTask:
    """Fused fetch+parse for one fetchlist partition."""

    def __init__(self, cfg, cur_time_ms, seg, protocol, seen_files_by_part=None):
        self.cfg, self.cur, self.seg, self.protocol = cfg, cur_time_ms, seg, protocol
        self.seen_files_by_part = seen_files_by_part or {}

    def _load_seen(self, part: int):
        from ..state.cuckoo import CuckooFilter

        shards = []
        for f in self.seen_files_by_part.get(part, []):
            if os.path.exists(f):
                with open(f, "rb") as fh:
                    shards.append(CuckooFilter.from_bytes(fh.read()))
        return shards

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _pin_arrow_threads()
        t_busy = time.monotonic()
        cfg, seg = self.cfg, self.seg
        stats = []
        for part in batch["part"]:
            part = int(part)
            fl_path = os.path.join(seg, "fetchlist", f"part-{part}", "data-0.parquet")
            if not os.path.exists(fl_path):
                st = _fp_stat(part, 0, 0, 0.0, 0.0)
                st["selected"] = 0
                stats.append(st)
                continue
            fl = pq.read_table(fl_path).to_pandas()
            stats.append(
                _fetch_parse_one(cfg, self.cur, seg, part, fl, self.protocol, self._load_seen)
            )
        df = pd.DataFrame(stats)
        df["busy"] = (time.monotonic() - t_busy) / max(1, len(stats))
        return df


def _fetch_parse_one(cfg, cur_time_ms, seg, part, fl, protocol, load_seen,
                     robots_cache: dict | None = None, parse=None) -> dict:
    """Fetch+parse one partition's fetchlist (in-memory frame) and write
    the segment artifacts; returns the partition's stat row.

    ``robots_cache`` / ``parse`` let a persistent worker (one actor per
    partition subset, alive across rounds) reuse robots rules and the
    compiled parser chain instead of rebuilding them every round."""
    from ..stages.fetch import FetchPartition
    from ..stages.parse import ParseBatch

    t0 = time.monotonic()
    publisher = None
    if cfg.publisher_dir:
        from ..functions.publisher import JsonlPublisher

        publisher = JsonlPublisher(cfg.publisher_dir)
    fetch_out = FetchPartition(
        cfg, cur_time_ms, protocol, publisher=publisher, robots_cache=robots_cache
    )(fl)
    # Split redirect-discovery LINKED rows out of fetch_out: they
    # are partitioned by TARGET host (stages/fetch.py) and join the
    # crawl_parse cross-partition exchange below, so a cross-host
    # redirect target lands in its own frontier partition.
    redirs = None
    n_maybe_known = 0
    if len(fetch_out):
        is_disc = (fetch_out["status"] == CS.LINKED).to_numpy()
        if is_disc.any():
            redirs = fetch_out[is_disc]
            fetch_out = fetch_out[~is_disc]
            # Cuckoo URL-seen consult is a METRIC prefilter only: a
            # cuckoo "seen" answer can be a false positive, so a
            # discovery row is NEVER dropped on it (the url-keyed
            # updatedb merge no-ops exactly for known urls at zero
            # score). "not seen" is exact => definitely-new count.
            for tgt, gg in redirs.groupby("part"):
                seen = load_seen(int(tgt))
                if seen:
                    urls = gg["url"].to_numpy()
                    mask_seen = np.zeros(len(urls), dtype=bool)
                    for cf in seen:
                        mask_seen |= cf.contains_many(urls)
                    n_maybe_known += int(mask_seen.sum())
    t_fetch = time.monotonic() - t0

    t0 = time.monotonic()
    parsed = (parse if parse is not None else ParseBatch(cfg))(fetch_out)
    t_parse = time.monotonic() - t0

    # fetch datums (without content bytes — narrow segment record)
    fo = fetch_out[_FETCH_DATUM_COLS]
    _write_df(fo, os.path.join(seg, "fetch_out", f"part-{part}", "data-0.parquet"), FETCH_OUT_SCHEMA)
    if cfg.store_content:
        _write_df(
            fetch_out[["url", "content", "content_type"]],
            os.path.join(seg, "content", f"part-{part}", "data-0.parquet"),
            CONTENT_SCHEMA,
        )
    cp_frames = []
    if len(parsed):
        docs = parsed[parsed["rtype"] == "doc"]
        if len(docs):
            _write_df(
                docs[["doc_id", "url", "host", "part", "spans", "signature", "fetch_time"]],
                os.path.join(seg, "docs", f"part-{part}", "data-0.parquet"),
                DOCS_SEG_SCHEMA,
            )
        ol = parsed[parsed["rtype"] == "outlink"]
        if len(ol):
            _write_df(
                ol[["url", "host", "part", "dst", "anchor"]],
                os.path.join(seg, "outlinks", f"part-{part}", "data-0.parquet"),
                OUTLINKS_SEG_SCHEMA,
            )
        cp_frames.append(parsed[parsed["rtype"] == "crawl_parse"])
    if redirs is not None and len(redirs):
        # redirect-discovery LINKED rows join the exchange, keyed by
        # target partition (computed in stages/fetch.py)
        r = pd.DataFrame(
            {
                "rtype": "crawl_parse",
                "url": redirs["url"].to_numpy(),
                "host": redirs["host"].to_numpy(),
                "part": redirs["part"].to_numpy(),
                "doc_id": None,
                "spans": None,
                "status": redirs["status"].to_numpy(),
                "score": redirs["score"].to_numpy(),
                "signature": None,
                "fetch_interval": redirs["fetch_interval"].to_numpy(),
                "anchor": None,
                "dst": None,
                "metadata": redirs["metadata"].to_numpy(),
                "fetch_time": redirs["fetch_time"].to_numpy(),
            }
        )
        cp_frames.append(r)
    if cp_frames:
        cp = (
            pd.concat(
                [f.reindex(columns=cp_frames[0].columns) for f in cp_frames],
                ignore_index=True,
            )
            if len(cp_frames) > 1
            else cp_frames[0]
        )
        cp = _preagg_links(cp, cfg)
        if cfg.num_partitions > cfg.scatter_direct_max_parts:
            # P^2-file guard: one file per SOURCE partition; the
            # per-target split happens in a Ray Data hash
            # exchange after the phase (run_round)
            _write_df(
                cp.drop(columns=["rtype", "doc_id", "spans", "dst"]),
                os.path.join(seg, "crawl_parse_raw", f"from-{part}.parquet"),
                CRAWL_PARSE_SCHEMA,
            )
        else:
            # scatter by TARGET partition — deterministic file names
            for tgt, g in cp.groupby("part"):
                _write_df(
                    g.drop(columns=["rtype", "doc_id", "spans", "dst"]),
                    os.path.join(seg, "crawl_parse", f"part-{int(tgt)}", f"from-{part}.parquet"),
                    CRAWL_PARSE_SCHEMA,
                )
    n_fetched = int((fetch_out["fetch_order"] >= 0).sum()) if len(fetch_out) else 0
    n_docs = int((parsed["rtype"] == "doc").sum()) if len(parsed) else 0
    st = _fp_stat(part, n_fetched, n_docs, t_fetch, t_parse)
    st["disc_maybe_known"] = n_maybe_known
    st["selected"] = int(len(fl))
    return st


class _RoundPartTask:
    """FULLY FUSED round phase for one frontier partition: generate
    (eligibility+select, in-memory) -> fetch -> parse in a single task —
    no cross-phase barrier, no fetchlist read-back. The fetchlist is
    still persisted first (resume/debug artifact and the gen-writeback
    input). Used for partitions with few subshard files; mega-partitions
    take the two-phase scan/select + fetch path."""

    def __init__(self, cfg, cur_time_ms, limit, seg, files_by_part, hostdb, filters, protocol, seen_files_by_part):
        self.cfg, self.cur, self.limit, self.seg = cfg, cur_time_ms, limit, seg
        self.files_by_part, self.hostdb, self.filters = files_by_part, hostdb, filters
        self.protocol = protocol
        self.seen_files_by_part = seen_files_by_part or {}

    def _load_seen(self, part: int):
        from ..state.cuckoo import CuckooFilter

        shards = []
        for f in self.seen_files_by_part.get(part, []):
            if os.path.exists(f):
                with open(f, "rb") as fh:
                    shards.append(CuckooFilter.from_bytes(fh.read()))
        return shards

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _pin_arrow_threads()
        t_busy = time.monotonic()
        from ..stages.generate import eligibility_filter, select_partition

        stats = []
        for part in batch["part"]:
            part = int(part)
            files = self.files_by_part.get(part, [])
            if not files:
                st = _fp_stat(part, 0, 0, 0.0, 0.0)
                st["selected"] = 0
                stats.append(st)
                continue
            df = pq.read_table(files, partitioning=None).to_pandas()
            elig = eligibility_filter(df, self.cfg, self.cur, self.filters)
            sel = select_partition(elig, self.cfg, self.limit, self.cur, self.hostdb)
            if len(sel) == 0:
                st = _fp_stat(part, 0, 0, 0.0, 0.0)
                st["selected"] = 0
                stats.append(st)
                continue
            _write_df(
                sel, os.path.join(self.seg, "fetchlist", f"part-{part}", "data-0.parquet"),
                FETCHLIST_SCHEMA,
            )
            stats.append(
                _fetch_parse_one(self.cfg, self.cur, self.seg, part, sel, self.protocol, self._load_seen)
            )
        df = pd.DataFrame(stats)
        df["busy"] = (time.monotonic() - t_busy) / max(1, len(stats))
        return df


class _RoundWorkerImpl:
    """Persistent fused-round worker (created as a Ray ACTOR by
    CrawlDriver._round_workers, one per CPU slot, alive across rounds).

    The reference keeps robots rules in a static per-JVM cache that
    survives the whole crawl (protocol/RobotRulesParser.java:63) and
    constructs the parser chain once per JVM; a per-round task pool
    rebuilds both every round — the recurring fixed cost the
    512-partition rehearsal surfaced (round-1 wall >> steady-state).
    This actor owns that state; per-round inputs (segment dir, clock,
    file lists, hostdb, generate filters) arrive as call arguments.

    Partitions route to workers by ``part % n_workers`` so the same
    actor sees the same hosts every round and its robots entries re-hit.
    Scheduled with num_cpus=0 + SPREAD: run_round's phases are
    sequential, so the pool is the only stage running while it works —
    reserving CPUs would only starve the updatedb tasks that run
    between calls. On a multi-node cluster SPREAD places workers across
    nodes; politeness state is partition-local so any placement is
    correct."""

    def __init__(self, cfg, protocol):
        _pin_arrow_threads()
        from ..stages.parse import ParseBatch

        self.cfg = cfg
        self.protocol = protocol
        self.robots_cache: dict = {}
        self.parse = ParseBatch(cfg)

    def run_parts(self, parts, cur_time_ms, limit, seg, files_by_part,
                  hostdb, filters, seen_files_by_part) -> list[dict]:
        from ..stages.generate import eligibility_filter, select_partition

        seen_files_by_part = seen_files_by_part or {}

        def load_seen(part: int):
            from ..state.cuckoo import CuckooFilter

            shards = []
            for f in seen_files_by_part.get(part, []):
                if os.path.exists(f):
                    with open(f, "rb") as fh:
                        shards.append(CuckooFilter.from_bytes(fh.read()))
            return shards

        t_busy = time.monotonic()
        stats = []
        for part in parts:
            part = int(part)
            files = files_by_part.get(part, [])
            if not files:
                st = _fp_stat(part, 0, 0, 0.0, 0.0)
                st["selected"] = 0
                stats.append(st)
                continue
            df = pq.read_table(files, partitioning=None).to_pandas()
            elig = eligibility_filter(df, self.cfg, cur_time_ms, filters)
            sel = select_partition(elig, self.cfg, limit, cur_time_ms, hostdb)
            if len(sel) == 0:
                st = _fp_stat(part, 0, 0, 0.0, 0.0)
                st["selected"] = 0
                stats.append(st)
                continue
            _write_df(
                sel, os.path.join(seg, "fetchlist", f"part-{part}", "data-0.parquet"),
                FETCHLIST_SCHEMA,
            )
            stats.append(
                _fetch_parse_one(
                    self.cfg, cur_time_ms, seg, part, sel, self.protocol, load_seen,
                    robots_cache=self.robots_cache, parse=self.parse,
                )
            )
        busy = (time.monotonic() - t_busy) / max(1, len(stats))
        for st in stats:
            st["busy"] = busy
        return stats


def _preagg_links(cp: pd.DataFrame, cfg=None) -> pd.DataFrame:
    """Partial-combine LINKED contributions per target url BEFORE the
    cross-partition scatter (OPIC sums are additive; the updatedb kernel
    adds the partials). Cuts the exchange ~(outlinks per page)×. Note:
    the db.update.max.inlinks top-k cap then applies to per-source-
    partition partials rather than individual links — exact whenever a
    url has <= max_inlinks contributors, the overwhelming case.

    LINKED metadata survives the combine: the highest-score link's
    metadata is the partial's template (the kernel's l_metadata pick),
    and any chain link_meta_min keys (scoring-depth's _depth_) fold to
    their per-url MIN across the combined links so the kernel's
    pre-aggregated min stays exact."""
    linked = cp["status"] == CS.LINKED
    if not linked.any():
        return cp
    lk = cp[linked].sort_values("score", ascending=False, kind="stable")
    g = lk.groupby("url", sort=False, as_index=False)
    agg = g.agg(
        host=("host", "first"),
        part=("part", "first"),
        fetch_time=("fetch_time", "first"),
        fetch_interval=("fetch_interval", "first"),
        anchor=("anchor", "first"),
        metadata=("metadata", "first"),
    )
    # deterministic f32 sum in score-desc order per url
    lk2 = lk.sort_values("url", kind="stable")
    u = lk2["url"].to_numpy()
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    sums = np.add.reduceat(lk2["score"].to_numpy(dtype=np.float32), starts, dtype=np.float32)
    sum_by_url = dict(zip(u[starts], sums))
    agg["score"] = agg["url"].map(sum_by_url).astype(np.float32)
    if cfg is not None:
        from ..functions.scoring import make_scoring

        min_keys = make_scoring(cfg).link_meta_min_keys
        if min_keys and lk2["metadata"].notna().any():
            import json as _json

            bounds = np.r_[starts, len(u)]
            metas = lk2["metadata"].to_numpy()
            tmpl = dict(zip(agg["url"], agg["metadata"]))
            for s, e in zip(bounds[:-1], bounds[1:]):
                mins: dict = {}
                for mj in metas[s:e]:
                    if not (isinstance(mj, str) and mj):
                        continue
                    md = _json.loads(mj)
                    for k in min_keys:
                        v = md.get(k)
                        if v is not None and (k not in mins or v < mins[k]):
                            mins[k] = v
                if mins:
                    url = u[s]
                    base = tmpl.get(url)
                    md = _json.loads(base) if isinstance(base, str) and base else {}
                    md.update(mins)
                    tmpl[url] = _json.dumps(md, sort_keys=True)
            agg["metadata"] = agg["url"].map(tmpl)
    agg["status"] = int(CS.LINKED)
    agg["rtype"] = "crawl_parse"
    for c in ("doc_id", "spans", "signature", "dst"):
        agg[c] = None
    agg = agg.reindex(columns=cp.columns, fill_value=None)
    return pd.concat([cp[~linked], agg], ignore_index=True)


def _fp_stat(part, fetched, docs, t_fetch, t_parse):
    return {"part": part, "fetched": fetched, "docs": docs, "t_fetch": t_fetch,
            "t_parse": t_parse, "disc_maybe_known": 0}


class _InjectTask:
    """Per-partition inject merge (J1): old partition files ∪ the
    partition's seed slice -> inject_merge -> new-generation file +
    seen shard, written directly to the store tmp dir (idempotent
    deterministic path, like _UpdateTask)."""

    def __init__(self, cfg, seeds_ref, files_by_part, store_root, new_gen):
        self.cfg = cfg
        self.seeds_ref = seeds_ref  # ray.put(seeds DataFrame), read per task
        self.files_by_part = files_by_part
        self.store_root, self.new_gen = store_root, new_gen

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _pin_arrow_threads()
        import ray

        from ..functions.inject import inject_merge
        from ..functions.urlutil import domains_of
        from ..state.cuckoo import CuckooFilter

        seeds = ray.get(self.seeds_ref)
        out = []
        for part in batch["part"]:
            part = int(part)
            frames = [seeds[seeds["part"] == part]]
            files = self.files_by_part.get(part, [])
            if files:
                frames.append(pq.read_table(files, partitioning=None).to_pandas())
            combined = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            merged = inject_merge(combined, self.cfg)
            merged["domain"] = (
                domains_of(merged["host"]).to_numpy(dtype=object) if len(merged) else None
            )
            merged["part"] = part
            table = frontier_table_from_pandas(merged)
            dest = os.path.join(
                self.store_root, f"gen={self.new_gen:06d}.tmp", f"part={part}", "data-0.parquet"
            )
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            pq.write_table(table, dest, compression="zstd")
            cf = CuckooFilter(capacity=max(1024, 2 * len(merged)))
            cf.add_many(merged["url"].to_numpy())
            with open(dest.replace(".parquet", ".seen"), "wb") as fh:
                fh.write(cf.to_bytes())
            out.append({"part": part, "rows": len(merged)})
        return pd.DataFrame(out)


class _DedupMarkTask:
    """Per-touched-partition J9 merge-back (StatusUpdateReducer,
    DeduplicationJob.java:330-377): read the partition's files, flip
    DB_FETCHED/DB_NOTMODIFIED rows named by this partition's mark slice
    to DB_DUPLICATE, re-split by the url-hash subshard rule and write
    into the new generation's tmp dir. Partitions whose marks hit
    nothing are NOT rewritten (they inherit the parent files), and the
    frontier itself never crosses an all-to-all exchange — only the
    small mark set shuffles (the reference's second MapReduce job
    rewrites the whole crawldb; partition inheritance is the Ray-native
    improvement)."""

    def __init__(self, cfg, files_by_part, store_root, new_gen, skew_split_rows):
        self.cfg = cfg
        self.files_by_part = files_by_part
        self.store_root, self.new_gen = store_root, new_gen
        self.skew_split_rows = skew_split_rows

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        _pin_arrow_threads()
        from ..state.cuckoo import CuckooFilter
        from ..state.frontier_store import _subshards

        out = []
        for part, sub in g.groupby("part", sort=False):
            part = int(part)
            files = self.files_by_part.get(part)
            if not files:
                continue
            t = pq.read_table(files, partitioning=None).to_pandas()
            hit = t["url"].isin(sub["url"].to_numpy()) & t["status"].isin(
                [int(CS.DB_FETCHED), int(CS.DB_NOTMODIFIED)]
            )
            marked = int(hit.sum())
            if not marked:
                out.append({"part": part, "rows": len(t), "marked": 0, "written": 0})
                continue
            t.loc[hit, "status"] = t["status"].dtype.type(CS.DB_DUPLICATE)
            table = _frontier_pa(t)
            pdir = os.path.join(
                self.store_root, f"gen={self.new_gen:06d}.tmp", f"part={part}"
            )
            os.makedirs(pdir, exist_ok=True)
            for subid, _n_sub, shard in _subshards(table, self.skew_split_rows):
                dest = os.path.join(pdir, f"data-{subid}.parquet")
                pq.write_table(shard, dest, compression="zstd")
                cf = CuckooFilter(capacity=max(1024, 2 * shard.num_rows))
                cf.add_many(shard.column("url").to_pylist())
                with open(dest.replace(".parquet", ".seen"), "wb") as fh:
                    fh.write(cf.to_bytes())
            out.append({"part": part, "rows": len(t), "marked": marked, "written": 1})
        if not out:
            return pd.DataFrame(
                {"part": pd.Series(dtype="int64"), "rows": pd.Series(dtype="int64"),
                 "marked": pd.Series(dtype="int64"), "written": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(out)


class _UpdateTask:
    def __init__(self, cfg, cur_time_ms, seg, files_by_part, store_root, new_gen):
        self.cfg, self.cur, self.seg = cfg, cur_time_ms, seg
        self.files_by_part = files_by_part
        self.store_root, self.new_gen = store_root, new_gen

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _pin_arrow_threads()
        t_busy = time.monotonic()
        from ..functions.updatedb import _DATUM_COLS, merge_partition
        from ..functions.urlutil import domains_of
        from ..stages.updatedb import apply_purges

        out = []
        for part, sub, n_sub in zip(batch["part"], batch["sub"], batch["n_sub"]):
            part, sub, n_sub = int(part), int(sub), int(n_sub)
            frames = []
            files = self.files_by_part.get(part, [])
            if files and len(files) > 1:
                # prune to the parent subshards covering this url-hash range
                # (power-of-two counts: growth -> one parent shard, shrink ->
                # every parent shard s with s % n_sub == sub)
                old_n = len(files)
                keep = (
                    {sub % old_n}
                    if old_n < n_sub
                    else {s for s in range(old_n) if s % n_sub == sub}
                )
                pruned = [
                    f
                    for f in files
                    if any(f.endswith(f"data-{s}.parquet") for s in keep)
                ]
                files = pruned or files
            if files:
                frames.append(pq.read_table(files, partitioning=None).to_pandas())
            fo = os.path.join(self.seg, "fetch_out", f"part-{part}", "data-0.parquet")
            if os.path.exists(fo):
                frames.append(pq.read_table(fo).to_pandas())
            cp_files = sorted(
                glob.glob(os.path.join(self.seg, "crawl_parse", f"part-{part}", "*.parquet"))
            )
            if cp_files:
                frames.append(pq.read_table(cp_files, partitioning=None).to_pandas())
            if not frames:
                out.append({"part": part, "rows": 0, "hist": "{}"})
                continue
            datums = pd.concat(
                [f.reindex(columns=_DATUM_COLS, fill_value=None) for f in frames],
                ignore_index=True,
            )
            if n_sub > 1:
                # skew split: this subtask merges only its url-hash shard
                # (the merge keys by url, so the split is exact)
                h = pd.util.hash_pandas_object(datums["url"], index=False).to_numpy(dtype=np.uint64)
                datums = datums[(h % np.uint64(n_sub)) == sub]
            merged = merge_partition(datums, self.cfg, self.cur)
            merged = apply_purges(merged, self.cfg)
            if "_renamed_" in merged.columns:
                # crawldb-scope normalizer renamed urls; host/part were
                # recomputed (ADVICE r3). Rows whose hash(host) partition
                # changed — and, under skew split, ANY renamed row, since
                # its url-hash subshard assignment changed and future
                # file-pruned reads would lose it — are staged as strays
                # and folded into their target partition by the driver's
                # stray pass before the generation commits.
                ren = merged.pop("_renamed_").to_numpy(dtype=bool)
                move = ren & (merged["part"].to_numpy() != part) if n_sub == 1 else ren
                stayed_renamed = bool((ren & ~move).any())
                if move.any():
                    stray = merged[move].reset_index(drop=True)
                    merged = merged[~move].reset_index(drop=True)
                    stray["domain"] = domains_of(stray["host"]).to_numpy(dtype=object)
                    for q, g in stray.groupby("part", sort=False):
                        sdir = os.path.join(self.seg, "strays", f"part={int(q)}")
                        os.makedirs(sdir, exist_ok=True)
                        pq.write_table(
                            frontier_table_from_pandas(g.reset_index(drop=True)),
                            os.path.join(sdir, f"from-{part}-{sub}.parquet"),
                            compression="zstd",
                        )
                if stayed_renamed:
                    # a rename can land on a url whose canonical twin
                    # already lives in this same partition (merge_partition
                    # grouped by the PRE-rename url, so the twins are now
                    # two rows); re-fold so the committed generation never
                    # carries duplicate url rows — the reference's map-side
                    # CrawlDbFilter merges such twins in one reduce
                    from ..stages.updatedb import merge_frontier_frames

                    merged = merge_frontier_frames(merged).reset_index(drop=True)
            merged["domain"] = (
                domains_of(merged["host"]).to_numpy(dtype=object) if len(merged) else None
            )
            merged["part"] = part
            table = frontier_table_from_pandas(merged)
            dest = os.path.join(
                self.store_root, f"gen={self.new_gen:06d}.tmp", f"part={part}", f"data-{sub}.parquet"
            )
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            pq.write_table(table, dest, compression="zstd")
            # cuckoo URL-seen shard (north_rule): rebuilt per generation
            # from the partition rows, persisted beside the parquet
            from ..state.cuckoo import CuckooFilter

            cf = CuckooFilter(capacity=max(1024, 2 * len(merged)))
            cf.add_many(merged["url"].to_numpy())
            with open(dest.replace(".parquet", ".seen"), "wb") as fh:
                fh.write(cf.to_bytes())
            status = merged["status"].to_numpy()
            hist = {CS.name(int(s)): int(c) for s, c in zip(*np.unique(status, return_counts=True))}
            out.append({"part": part, "rows": len(merged), "hist": json.dumps(hist)})
        df = pd.DataFrame(out)
        df["busy"] = (time.monotonic() - t_busy) / max(1, len(out))
        return df


class _StrayMergeTask:
    """Fold stray rows (urls renamed into a DIFFERENT hash(host)
    partition by a crawldb-scope normalizer — see _UpdateTask) into
    their target partition: read the partition's just-written gen-tmp
    files (or the parent generation's carried-forward files if the
    partition was untouched this round) plus the stray files, dedupe by
    url with CrawlDbMerger semantics, re-subshard by fresh url hash, and
    rewrite the partition in the gen tmp dir. One task per target
    partition; renames are rare so this pass is almost always empty."""

    def __init__(self, cfg, seg, files_by_part, store_root, new_gen, written_parts, skew_split_rows):
        self.cfg, self.seg = cfg, seg
        self.files_by_part = files_by_part
        self.store_root, self.new_gen = store_root, new_gen
        self.written_parts = set(written_parts)
        self.skew_split_rows = skew_split_rows

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..state.cuckoo import CuckooFilter
        from ..state.frontier_store import _subshards
        from ..stages.updatedb import merge_frontier_frames

        out = []
        for part in batch["part"]:
            part = int(part)
            pdir = os.path.join(self.store_root, f"gen={self.new_gen:06d}.tmp", f"part={part}")
            if part in self.written_parts and os.path.isdir(pdir):
                tgt_files = sorted(glob.glob(os.path.join(pdir, "data-*.parquet")))
            else:
                tgt_files = self.files_by_part.get(part, [])
            stray_files = sorted(
                glob.glob(os.path.join(self.seg, "strays", f"part={part}", "*.parquet"))
            )
            frames = [
                pq.read_table(fs, partitioning=None).to_pandas()
                for fs in (tgt_files, stray_files)
                if fs
            ]
            merged = merge_frontier_frames(pd.concat(frames, ignore_index=True))
            merged = merged.reset_index(drop=True)
            table = frontier_table_from_pandas(merged)
            # read-before-overwrite above; clear stale subshard files so
            # the commit's dir listing sees exactly the new shard set
            if os.path.isdir(pdir):
                for old in glob.glob(os.path.join(pdir, "data-*")):
                    os.remove(old)
            os.makedirs(pdir, exist_ok=True)
            for sub, _n_sub, shard in _subshards(table, self.skew_split_rows):
                dest = os.path.join(pdir, f"data-{sub}.parquet")
                pq.write_table(shard, dest, compression="zstd")
                cf = CuckooFilter(capacity=max(1024, 2 * shard.num_rows))
                cf.add_many(shard.column("url").to_pylist())
                with open(dest.replace(".parquet", ".seen"), "wb") as fh:
                    fh.write(cf.to_bytes())
            out.append({"part": part, "rows": len(merged)})
        return pd.DataFrame(out)


class CrawlDriver:
    def __init__(self, workdir: str, cfg: CrawlConfig | None = None, protocol=None):
        self.workdir = workdir
        self.cfg = cfg or CrawlConfig()
        self.protocol = protocol
        self.store = FrontierStore(
            os.path.join(workdir, "frontier"),
            self.cfg.num_partitions,
            skew_split_rows=self.cfg.skew_split_rows,
        )
        os.makedirs(os.path.join(workdir, "segments"), exist_ok=True)
        self._workers: list | None = None  # persistent round-worker pool
        self._pool_borrowed = False  # borrowed pools are not killed here

    def adopt_pool(self, other: "CrawlDriver") -> None:
        """Borrow another driver's persistent round-worker pool instead
        of cold-starting one (actor creation + per-actor imports land in
        the first round otherwise). The pool is only adopted when its
        size matches this driver's sizing rule — a mismatch falls back
        to a fresh pool. Robots/parser caches carry over, which is the
        same semantics as two successive rounds in one driver; the
        borrowed pool is left alive on close() (the lender owns it)."""
        theirs = other._workers
        if not theirs:
            return
        import ray

        n = min(
            self.cfg.num_partitions,
            max(1, int(ray.cluster_resources().get("CPU", 1)) // max(1, self.cfg.task_num_cpus)),
        )
        if len(theirs) == n:
            self._workers = theirs
            self._pool_borrowed = True

    # ------------------------------------------------------------------
    def _round_workers(self) -> list:
        """Lazily create (and cache) the persistent fused-round actor
        pool — see _RoundWorkerImpl. Pool size = one worker per CPU slot
        (cluster CPUs / task_num_cpus), capped at the partition count;
        partitions route by part % n so robots state re-hits each round."""
        import ray

        n = min(
            self.cfg.num_partitions,
            max(1, int(ray.cluster_resources().get("CPU", 1)) // max(1, self.cfg.task_num_cpus)),
        )
        if self._workers is not None and len(self._workers) == n:
            return self._workers
        self.close()
        worker_cls = ray.remote(num_cpus=0, max_restarts=2, max_task_retries=2)(
            _RoundWorkerImpl
        )
        self._workers = [
            worker_cls.options(scheduling_strategy="SPREAD").remote(self.cfg, self.protocol)
            for _ in range(n)
        ]
        return self._workers

    def close(self) -> None:
        """Eagerly kill the persistent worker pool. Optional: the
        actors are non-detached, so dropping the handles (driver GC)
        terminates them too — but long-lived processes that create many
        drivers should release the pool as soon as the crawl ends."""
        if self._workers and not self._pool_borrowed:
            try:
                import ray

                if ray.is_initialized():
                    for w in self._workers:
                        ray.kill(w)
            except Exception:
                pass  # pool dies with its handles either way
        self._workers = None
        self._pool_borrowed = False

    # ------------------------------------------------------------------
    def seg_dir(self, gen: int) -> str:
        return os.path.join(self.workdir, "segments", f"gen={gen:06d}")

    def round_complete(self, gen: int) -> bool:
        return os.path.exists(os.path.join(self.seg_dir(gen), "_ROUND.json"))

    # ------------------------------------------------------------------
    def bootstrap(self, frontier_table: pa.Table) -> None:
        """Install generation 0 from a seed/synthetic frontier table."""
        # one sort + zero-copy slices (not P full-table filters)
        order = pa.compute.sort_indices(frontier_table.column("part"))
        t = frontier_table.take(order)
        parts = t.column("part").to_numpy()
        bounds = np.flatnonzero(np.r_[True, parts[1:] != parts[:-1]])
        by_part = {
            int(parts[s]): t.slice(s, e - s)
            for s, e in zip(bounds, np.r_[bounds[1:], len(parts)])
        }
        self.store.write_generation(
            by_part, gen=0, parent_gen=None, counters={"bootstrap_rows": frontier_table.num_rows}
        )

    def bootstrap_ds(self, frontier_ds) -> dict:
        """Install generation 0 from a frontier Dataset WITHOUT driver
        materialization: one task per partition writes its file + seen
        shard directly into the store tmp dir (the _InjectTask layout);
        the driver only commits the manifest. Use this over bootstrap()
        when the seed frontier is itself corpus-scale."""
        self.store.begin_generation(0)
        root = self.store.root
        skew_split_rows = self.store.skew_split_rows

        def write_part(g: pd.DataFrame) -> pd.DataFrame:
            from ..state.cuckoo import CuckooFilter
            from ..state.frontier_store import _subshards

            out = []
            for part, sub in g.groupby("part", sort=False):
                part = int(part)
                table = _frontier_pa(sub.reset_index(drop=True))
                pdir = os.path.join(root, "gen=000000.tmp", f"part={part}")
                os.makedirs(pdir, exist_ok=True)
                # mega-host partitions get the same url-hash subshard
                # split as write_generation, so round subtasks stay
                # bounded even when one Zipf host owns the partition
                for subid, _n_sub, shard in _subshards(table, skew_split_rows):
                    dest = os.path.join(pdir, f"data-{subid}.parquet")
                    pq.write_table(shard, dest, compression="zstd")
                    cf = CuckooFilter(capacity=max(1024, 2 * shard.num_rows))
                    cf.add_many(shard.column("url").to_pylist())
                    with open(dest.replace(".parquet", ".seen"), "wb") as fh:
                        fh.write(cf.to_bytes())
                out.append({"part": part, "rows": len(sub)})
            if not out:
                # typed empty frame: Ray's streaming executor warns on
                # RefBundles whose schema flips to columnless-empty
                return pd.DataFrame(
                    {"part": pd.Series(dtype="int64"), "rows": pd.Series(dtype="int64")}
                )
            return pd.DataFrame(out)

        stats = (
            frontier_ds.groupby("part")
            .map_groups(write_part, batch_format="pandas")
            .to_pandas()
        )
        written = {int(p): int(r) for p, r in zip(stats["part"], stats["rows"])}
        return self.store.commit_generation(
            written, gen=0, parent_gen=None,
            counters={"bootstrap_rows": int(stats["rows"].sum())},
        )

    def apply_dedup_marks(self, marks_ds) -> dict:
        """Commit duplicate marks as a new generation (J9's second job,
        DeduplicationJob.java:330-411 StatusUpdateReducer). The marks
        (columns ``url`` [, ``part``]) are tiny relative to the
        frontier, so instead of co-grouping the whole frontier on
        hash(url) — a full all-to-all exchange — the marks shuffle to
        their partitions and each TOUCHED partition is rewritten in
        place; untouched (and unhit) partitions inherit the parent
        generation's files through the manifest. Returns
        {"gen", "duplicates_marked"}; commits nothing when no row flips.

        Use :func:`stages.jobs.apply_duplicate_marks` instead when the
        frontier is a free-standing Dataset with no store behind it."""
        marks = marks_ds.materialize()  # loser cardinality, not corpus
        gen = self.store.latest_gen()
        if gen is None or marks.count() == 0:
            return {"gen": gen, "duplicates_marked": 0}
        if "part" not in marks.schema().names:
            cfg = self.cfg

            def add_part(df: pd.DataFrame) -> pd.DataFrame:
                from ..functions.urlutil import get_host, partition_for_hosts

                hosts = df["url"].map(get_host).to_numpy(dtype=object)
                d = df[["url"]].copy()
                d["part"] = partition_for_hosts(
                    hosts, cfg.num_partitions, cfg.partition_seed, cfg.partition_mode
                )
                return d

            marks = marks.map_batches(add_part, batch_format="pandas")
        new_gen = gen + 1
        man = self.store.manifest(gen)
        files_by_part = {
            int(p): [os.path.join(self.store.root, f) for f in ent["files"]]
            for p, ent in man["partitions"].items()
            if ent["files"]
        }
        self.store.begin_generation(new_gen)
        task = _DedupMarkTask(
            self.cfg, files_by_part, self.store.root, new_gen,
            self.store.skew_split_rows,
        )

        def mark_part(g: pd.DataFrame) -> pd.DataFrame:
            return task(g)

        stats = (
            marks.groupby("part")
            .map_groups(mark_part, batch_format="pandas")
            .to_pandas()
        )
        n_marked = int(stats["marked"].sum()) if len(stats) else 0
        written = {
            int(p): int(r)
            for p, r, w in zip(stats["part"], stats["rows"], stats["written"])
            if int(w)
        }
        if not written:
            # nothing flipped anywhere: drop the tmp dir, keep the gen
            shutil.rmtree(
                os.path.join(self.store.root, f"gen={new_gen:06d}.tmp"),
                ignore_errors=True,
            )
            return {"gen": gen, "duplicates_marked": 0}
        self.store.commit_generation(
            written, gen=new_gen, parent_gen=gen,
            counters={"duplicates_marked": n_marked},
        )
        return {"gen": new_gen, "duplicates_marked": n_marked}

    def inject(self, seed_lines: list[str], cur_time_ms: int) -> dict:
        """J1: seeds ∪ frontier -> new generation (Injector.java:209-348)."""
        from ..functions.filters import URLFilters
        from ..functions.inject import inject_merge, parse_seed_lines
        from ..functions.normalizers import SCOPE_INJECT, URLNormalizers
        from ..functions.urlutil import domains_of, hosts_of, partition_for_hosts

        cfg = self.cfg
        seeds = parse_seed_lines(seed_lines, cfg, cur_time_ms)
        norms = URLNormalizers(cfg.normalizers)
        filts = URLFilters(cfg.filters)
        seeds["url"] = norms.normalize_many(seeds["url"].tolist(), SCOPE_INJECT)
        seeds = seeds[seeds["url"].notna()]
        seeds = seeds[filts.accept_many(seeds["url"].to_numpy())]
        # scfilters.injectedScore (Injector.java:255-263): score already
        # carries db.score.injected / nutch.score; plugins may rewrite
        # score and metadata (scoring-depth stamps _depth_/_maxdepth_)
        from ..functions.scoring import make_scoring

        scoring = make_scoring(cfg)
        seeds = seeds.copy()
        seeds["score"] = scoring.injected_score(
            seeds["score"].to_numpy(dtype=np.float32))
        if scoring.has_injected_metadata:
            seeds["metadata"] = scoring.injected_metadata(
                seeds["metadata"].to_numpy())
        hosts = hosts_of(seeds["url"].to_numpy())
        seeds["host"] = hosts.to_numpy(dtype=object)
        seeds["part"] = partition_for_hosts(
            hosts, cfg.num_partitions, cfg.partition_seed, cfg.partition_mode
        )

        gen = self.store.latest_gen()
        new_gen = 0 if gen is None else gen + 1
        touched = sorted(set(int(p) for p in seeds["part"]))
        if not touched:
            self.store.begin_generation(new_gen)
            return self.store.commit_generation(
                {}, gen=new_gen, parent_gen=gen, counters={"urls_injected": 0})
        # Distributed merge: one task per touched partition reads its
        # frontier files + its seed slice (seeds are dimension-sized,
        # broadcast ONCE via ray.put) and writes the new generation file
        # directly — the driver never materializes a frontier partition
        # (Injector.java's reduce is per-key for the same reason).
        import ray
        import ray.data as rd

        self.store.begin_generation(new_gen)
        files_by_part = self._files_by_part(gen) if gen is not None else {}
        task = _InjectTask(
            cfg, ray.put(seeds), files_by_part, self.store.root, new_gen)
        stats = (
            rd.from_items([{"part": p} for p in touched], override_num_blocks=len(touched))
            .map_batches(task, batch_format="pandas", batch_size=1,
                         num_cpus=cfg.task_num_cpus)
            .to_pandas()
        )
        written = {int(p): int(r) for p, r in zip(stats["part"], stats["rows"])}
        return self.store.commit_generation(
            written, gen=new_gen, parent_gen=gen,
            counters={"urls_injected": int(len(seeds))},
        )

    def sitemap_round(self, hosts, cur_time_ms: int) -> dict:
        """J14 SitemapProcessor round: fetch robots-declared sitemaps for
        ``hosts`` (a host-string list or a Dataset with a ``host`` column)
        through the protocol (actor-pool stage), then inject the discovered
        URLs (priority -> score, changefreq -> interval) into the frontier
        (util/SitemapProcessor.java:82-520)."""
        from ..stages.tools import sitemap_processor

        rows = sitemap_processor(hosts, self.cfg, self.protocol).to_pandas()
        if len(rows) == 0:
            return {"discovered": 0}
        lines = [
            f"{u}\tnutch.score={s}\tnutch.fetchInterval={fi}"
            for u, s, fi in zip(rows["url"], rows["score"], rows["fetch_interval"])
        ]
        res = self.inject(lines, cur_time_ms)
        return {"discovered": int(len(rows)), "inject": res}

    # ------------------------------------------------------------------
    def run_round(
        self,
        cur_time_ms: int,
        topn: int | None = None,
        hostdb: dict | None = None,
        filters=None,
    ) -> dict:
        """One generate→fetch+parse→updatedb round. Returns round metrics."""
        import ray.data as rd

        cfg = self.cfg
        t0 = time.monotonic()
        gen = self.store.latest_gen()
        assert gen is not None, "bootstrap or inject first"
        new_gen = gen + 1
        seg = self.seg_dir(new_gen)
        if os.path.exists(seg) and not self.round_complete(new_gen):
            shutil.rmtree(seg)  # incomplete previous attempt: redo
        os.makedirs(seg, exist_ok=True)
        self.store.clean_tmp()

        topn = topn if topn is not None else cfg.topn
        timings: dict[str, float] = {}

        files_by_part = self._files_by_part(gen)
        parts = sorted(files_by_part)
        limit = max(1, topn // cfg.num_partitions)
        task_cpus = cfg.task_num_cpus
        seen_files_by_part = {
            p: [f.replace(".parquet", ".seen") for f in files]
            for p, files in files_by_part.items()
        }

        # -- generate+fetch+parse: ONE task per partition (no phase
        # barrier) for the common few-subshard case; mega-partitions
        # (many subshards) run the two-phase scan/select + fetch path so
        # their scan fans out across files
        t = time.monotonic()
        fused_parts = [p for p in parts if len(files_by_part[p]) <= 2]
        split_parts = [p for p in parts if len(files_by_part[p]) > 2]
        frames = []
        if fused_parts and cfg.persistent_workers:
            # persistent actor pool: robots cache + parser chain survive
            # across rounds (reference's static RobotRulesParser.CACHE);
            # partitions route by part % n for cache locality
            import ray

            workers = self._round_workers()
            n = len(workers)
            futs = []
            for w_idx, w in enumerate(workers):
                mine = [p for p in fused_parts if p % n == w_idx]
                if mine:
                    futs.append(
                        w.run_parts.remote(
                            mine, cur_time_ms, limit, seg,
                            {p: files_by_part[p] for p in mine},
                            hostdb, filters,
                            {p: seen_files_by_part.get(p, []) for p in mine},
                        )
                    )
            stats_rows = [st for rows in ray.get(futs) for st in rows]
            frames.append(pd.DataFrame(stats_rows))
        elif fused_parts:
            rp_task = _RoundPartTask(
                cfg, cur_time_ms, limit, seg, files_by_part, hostdb, filters,
                self.protocol, seen_files_by_part,
            )
            frames.append(
                rd.from_items([{"part": p} for p in fused_parts], override_num_blocks=len(fused_parts))
                .map_batches(rp_task, batch_format="pandas", batch_size=1, num_cpus=task_cpus)
                .to_pandas()
            )
        if split_parts:
            sub_files = {p: files_by_part[p] for p in split_parts}
            gen_stats2 = self._generate_phase(
                seg, cur_time_ms, topn, hostdb, filters, sub_files, split_parts
            )
            active2 = sorted(int(p) for p in gen_stats2[gen_stats2["selected"] > 0]["part"])
            if active2:
                fp_task = _FetchParseTask(cfg, cur_time_ms, seg, self.protocol, seen_files_by_part)
                fp2 = (
                    rd.from_items([{"part": p} for p in active2], override_num_blocks=len(active2))
                    .map_batches(fp_task, batch_format="pandas", batch_size=1, num_cpus=task_cpus)
                    .to_pandas()
                )
                fp2["busy"] = fp2.get("busy", 0.0)
                frames.append(fp2)
        fp_stats = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"part": [], "selected": [], "fetched": [], "docs": [],
                               "t_fetch": [], "t_parse": [], "busy": []})
        )
        timings["gen_fetch_parse"] = time.monotonic() - t
        timings["fetch"] = round(float(fp_stats["t_fetch"].sum()), 3)
        timings["parse"] = round(float(fp_stats["t_parse"].sum()), 3)
        timings["busy_fetch_parse"] = (
            float(fp_stats["busy"].sum()) if "busy" in fp_stats.columns else 0.0
        )
        n_generated = int(fp_stats["selected"].sum()) if "selected" in fp_stats.columns else 0
        if n_generated == 0:
            self.store.begin_generation(new_gen)
            self.store.commit_generation({}, gen=new_gen, parent_gen=gen, counters={"generated": 0})
            return self._commit_round(new_gen, gen, [], timings, {"generated": 0}, t0, seg)

        active = sorted(int(p) for p in fp_stats[fp_stats["selected"] > 0]["part"])

        # -- Generator CrawlDbUpdater write-back (generate.update.crawldb)
        # runs after the fused phase — the fetchlists it folds in are on
        # disk; updatedb then bases on the write-back generation so
        # selected-but-unfetched urls keep their gen_time lock
        if cfg.gen_update_crawldb:
            t = time.monotonic()
            gen = self._gen_writeback(seg, cur_time_ms, files_by_part, gen, active)
            new_gen = gen + 1
            files_by_part = self._files_by_part(gen)
            timings["gen_writeback"] = time.monotonic() - t

        # -- crawl_parse exchange (only at high partition counts) -------
        raw_files = sorted(glob.glob(os.path.join(seg, "crawl_parse_raw", "*.parquet")))
        if raw_files:
            t = time.monotonic()
            cp_dir = os.path.join(seg, "crawl_parse")

            def write_target(g: pd.DataFrame) -> pd.DataFrame:
                tgt = int(g["part"].iloc[0])
                _write_df(g, os.path.join(cp_dir, f"part-{tgt}", "data-0.parquet"), CRAWL_PARSE_SCHEMA)
                return pd.DataFrame({"part": [tgt], "rows": [len(g)]})

            (
                rd.read_parquet(raw_files, partitioning=None)
                .groupby("part")
                .map_groups(write_target, batch_format="pandas")
                .to_pandas()
            )
            timings["cp_exchange"] = time.monotonic() - t

        # -- updatedb (touched partitions only) -------------------------
        t = time.monotonic()
        touched = set(active)
        touched |= {
            int(os.path.basename(d).split("-")[1])
            for d in glob.glob(os.path.join(seg, "crawl_parse", "part-*"))
        }
        touched = sorted(touched)
        self.store.begin_generation(new_gen)
        # skew splitting: a mega-host partition's merge shards by url hash
        man = self.store.manifest(gen)
        rows_by_part = {int(p): ent["rows"] for p, ent in man["partitions"].items()}
        descr = []
        for p in touched:
            raw = max(1, -(-rows_by_part.get(p, 0) // cfg.skew_split_rows))
            n_sub = 1 << (raw - 1).bit_length()  # power of 2: each new
            # subshard maps to exactly one parent subshard file
            for sub in range(n_sub):
                descr.append({"part": p, "sub": sub, "n_sub": n_sub})
        upd_task = _UpdateTask(cfg, cur_time_ms, seg, files_by_part, self.store.root, new_gen)
        upd_stats = (
            rd.from_items(descr, override_num_blocks=len(descr))
            .map_batches(upd_task, batch_format="pandas", batch_size=1, num_cpus=task_cpus)
            .to_pandas()
        )
        timings["busy_updatedb"] = float(upd_stats["busy"].sum()) if "busy" in upd_stats.columns else 0.0
        written = (
            upd_stats.groupby("part")["rows"].sum().astype(int).to_dict()
        )
        written = {int(p): n for p, n in written.items() if n > 0}
        # stray pass: urls a crawldb-scope normalizer moved to another
        # hash(host) partition (empty unless update_url_normalize renamed
        # hosts this round — see _UpdateTask / _StrayMergeTask)
        stray_parts = sorted(
            int(os.path.basename(d).split("=")[1])
            for d in glob.glob(os.path.join(seg, "strays", "part=*"))
        )
        if stray_parts:
            stray_task = _StrayMergeTask(
                cfg, seg, files_by_part, self.store.root, new_gen,
                written, cfg.skew_split_rows,
            )
            sstats = (
                rd.from_items(
                    [{"part": p} for p in stray_parts],
                    override_num_blocks=len(stray_parts),
                )
                .map_batches(stray_task, batch_format="pandas", batch_size=1, num_cpus=task_cpus)
                .to_pandas()
            )
            for p, n in zip(sstats["part"], sstats["rows"]):
                written[int(p)] = int(n)
            touched = sorted(set(touched) | set(stray_parts))
        hist: dict[str, int] = {}
        for h in upd_stats["hist"]:
            for k, v in json.loads(h).items():
                hist[k] = hist.get(k, 0) + v
        counters = {
            "generated": n_generated,
            "fetched": int(fp_stats["fetched"].sum()),
            "docs": int(fp_stats["docs"].sum()),
            "db_status": hist,
            "rows_touched": int(upd_stats["rows"].sum()),
        }
        self.store.commit_generation(written, gen=new_gen, parent_gen=gen, counters=counters)
        timings["updatedb"] = time.monotonic() - t

        return self._commit_round(new_gen, gen, touched, timings, counters, t0, seg)

    # ------------------------------------------------------------------
    def _files_by_part(self, gen: int) -> dict:
        man = self.store.manifest(gen)
        return {
            int(p): [os.path.join(self.store.root, f) for f in ent["files"]]
            for p, ent in man["partitions"].items()
            if ent["files"]
        }

    def _generate_phase(self, seg, cur_time_ms, topn, hostdb, filters, files_by_part, parts):
        """Scan + select (J2): writes fetchlist/part-*/data-0.parquet."""
        import ray.data as rd

        cfg = self.cfg
        limit = max(1, topn // cfg.num_partitions)
        cand_dir = os.path.join(seg, "gen_cand")
        can_prune = cfg.gen_max_count <= 0 and hostdb is None
        task_cpus = cfg.task_num_cpus
        fl_dir = os.path.join(seg, "fetchlist")

        # partitions with few subshard files run scan+select FUSED in one
        # task (one Ray job, no barrier, no candidate spill); only
        # mega-partitions (many subshards) take the two-phase path so
        # their scan parallelizes across files
        fused_parts = [p for p in parts if len(files_by_part[p]) <= 2]
        split_parts = [p for p in parts if len(files_by_part[p]) > 2]

        frames = []
        busy = 0.0

        # split-part scan overlaps the fused job (two Ray jobs share the
        # cluster; the select of split parts only needs ITS scan done)
        scan_result: dict = {}
        scan_thread = None
        if split_parts:
            import threading

            scan_items = [
                {"part": p, "fidx": i, "file": f}
                for p in split_parts
                for i, f in enumerate(files_by_part[p])
            ]
            scan_task = _GenScanTask(cfg, cur_time_ms, limit, cand_dir, filters, can_prune)

            def _run_scan():
                # capture failures: an exception dying in a daemon thread
                # would otherwise surface as a bare KeyError on 'stats'
                try:
                    scan_result["stats"] = (
                        rd.from_items(scan_items, override_num_blocks=max(1, len(scan_items)))
                        .map_batches(scan_task, batch_format="pandas", batch_size=1, num_cpus=task_cpus)
                        .to_pandas()
                    )
                except BaseException as e:  # noqa: BLE001
                    scan_result["error"] = e

            scan_thread = threading.Thread(target=_run_scan, daemon=True)
            scan_thread.start()

        if fused_parts:
            fused_task = _GenFusedTask(
                cfg, cur_time_ms, cur_time_ms, limit, fl_dir, files_by_part, hostdb, filters
            )
            fused_stats = (
                rd.from_items([{"part": p} for p in fused_parts], override_num_blocks=len(fused_parts))
                .map_batches(fused_task, batch_format="pandas", batch_size=1, num_cpus=task_cpus)
                .to_pandas()
            )
            busy += float(fused_stats["busy"].sum()) if "busy" in fused_stats.columns else 0.0
            frames.append(fused_stats[["part", "selected"]])

        if split_parts:
            scan_thread.join()
            if "error" in scan_result:
                raise scan_result["error"]
            scan_stats = scan_result["stats"]
            sel_task = _GenSelectTask(
                cfg, cur_time_ms, cur_time_ms, limit, cand_dir, fl_dir, hostdb
            )
            sel_stats = (
                rd.from_items([{"part": p} for p in split_parts], override_num_blocks=len(split_parts))
                .map_batches(sel_task, batch_format="pandas", batch_size=1, num_cpus=task_cpus)
                .to_pandas()
            )
            busy += float(scan_stats["busy"].sum()) if "busy" in scan_stats.columns and len(scan_stats) else 0.0
            busy += float(sel_stats["busy"].sum()) if "busy" in sel_stats.columns else 0.0
            frames.append(sel_stats[["part", "selected"]])
        gen_stats = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame({"part": [], "selected": []})
        gen_stats.attrs["busy_s"] = busy
        return gen_stats

    def _gen_writeback(self, seg, cur_time_ms, files_by_part, parent_gen, active) -> int:
        """Commit a new generation with gen_time stamped on the selected
        urls (Generator.java:642-691). Returns the new latest gen."""
        import ray.data as rd

        wb_gen = parent_gen + 1
        self.store.begin_generation(wb_gen)
        task = _GenWritebackTask(
            self.cfg, cur_time_ms, seg, files_by_part, self.store.root, wb_gen
        )
        stats = (
            rd.from_items([{"part": p} for p in active], override_num_blocks=max(1, len(active)))
            .map_batches(task, batch_format="pandas", batch_size=1, num_cpus=self.cfg.task_num_cpus)
            .to_pandas()
        )
        written = {int(p): int(r) for p, r in zip(stats["part"], stats["rows"]) if r > 0}
        self.store.commit_generation(
            written, gen=wb_gen, parent_gen=parent_gen,
            counters={"gen_writeback_parts": len(written)},
        )
        return wb_gen

    def generate(self, cur_time_ms: int, topn: int | None = None, hostdb: dict | None = None, filters=None) -> dict:
        """Standalone J2/J3 generate job: writes a fetchlist segment and
        (per cfg.gen_update_crawldb) the CrawlDbUpdater gen_time
        write-back. Re-running generate before updatedb then selects
        DISJOINT urls (Generator re-entrancy)."""
        gen = self.store.latest_gen()
        assert gen is not None, "bootstrap or inject first"
        seg = self.seg_dir(gen + 1)
        os.makedirs(seg, exist_ok=True)
        files_by_part = self._files_by_part(gen)
        parts = sorted(files_by_part)
        topn = topn if topn is not None else self.cfg.topn
        gen_stats = self._generate_phase(seg, cur_time_ms, topn, hostdb, filters, files_by_part, parts)
        n = int(gen_stats["selected"].sum())
        if n > 0 and self.cfg.gen_update_crawldb:
            active = sorted(int(p) for p in gen_stats[gen_stats["selected"] > 0]["part"])
            self._gen_writeback(seg, cur_time_ms, files_by_part, gen, active)
        return {"seg": seg, "generated": n}

    def _commit_round(self, new_gen, parent_gen, touched, timings, counters, t0, seg=None) -> dict:
        metrics = {
            "gen": new_gen,
            "parent_gen": parent_gen,
            "touched_parts": list(touched),
            "timings_s": {k: round(v, 3) for k, v in timings.items()},
            "wall_s": round(time.monotonic() - t0, 3),
            "counters": counters,
        }
        path = os.path.join(seg or self.seg_dir(new_gen), "_ROUND.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(metrics, f, indent=1)
        os.replace(tmp, path)
        return metrics


def _frontier_pa(df) -> pa.Table:
    return frontier_table_from_pandas(df)
