"""The crawl round loop: generate → fetch → parse → updatedb, checkpointed.

Reference control plane: src/bin/crawl:316-470 (bash loop over MapReduce
jobs, state passed via CrawlDb/segment dirs, atomic install). Here: one
Python driver; each round is a DAG of Dataset transforms; state lives in

  workdir/
    frontier/            FrontierStore (versioned generations, manifests)
    segments/gen=N/      fetchlist/ fetch_out/ parse/ (parquet dirs) +
                         _ROUND.json (per-round lineage + metrics,
                         written atomically LAST => resume unit)

Resume: a round whose ``_ROUND.json`` is missing is incomplete — its
segment dirs are discarded and the round re-runs from the last committed
frontier generation (the reference's "Segment already fetched!" guard +
CrawlDb install rotation, FetcherOutputFormat.java:54-56,
CrawlDb.java:209-224).

Scale: updatedb reads and rewrites ONLY touched partitions (fetchlist
parts ∪ link-target parts); untouched partitions carry forward by
manifest reference — the 10^10-row frontier never fully rewrites.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..model import CrawlStatus as CS
from ..state.frontier_store import FrontierStore
from ..stages.fetch import fetch as fetch_stage
from ..stages.generate import generate as generate_stage
from ..stages.parse import parse as parse_stage
from ..stages.updatedb import updatedb as updatedb_stage


class CrawlDriver:
    def __init__(self, workdir: str, cfg: CrawlConfig | None = None, protocol=None):
        self.workdir = workdir
        self.cfg = cfg or CrawlConfig()
        self.protocol = protocol
        self.store = FrontierStore(os.path.join(workdir, "frontier"), self.cfg.num_partitions)
        os.makedirs(os.path.join(workdir, "segments"), exist_ok=True)

    # ------------------------------------------------------------------
    def seg_dir(self, gen: int) -> str:
        return os.path.join(self.workdir, "segments", f"gen={gen:06d}")

    def round_complete(self, gen: int) -> bool:
        return os.path.exists(os.path.join(self.seg_dir(gen), "_ROUND.json"))

    # ------------------------------------------------------------------
    def bootstrap(self, frontier_table: pa.Table) -> None:
        """Install generation 0 from a seed/synthetic frontier table."""
        parts = frontier_table.column("part").to_numpy()
        by_part = {
            int(p): frontier_table.filter(pa.compute.equal(frontier_table["part"], int(p)))
            for p in np.unique(parts)
        }
        self.store.write_generation(by_part, gen=0, parent_gen=None, counters={"bootstrap_rows": frontier_table.num_rows})

    def inject(self, seed_lines: list[str], cur_time_ms: int) -> dict:
        """J1: seeds ∪ frontier -> new generation (Injector.java:209-348)."""
        import pandas as pd

        from ..functions.filters import URLFilters
        from ..functions.inject import inject_merge, parse_seed_lines
        from ..functions.normalizers import SCOPE_INJECT, URLNormalizers
        from ..functions.urlutil import domains_of, hosts_of, partition_for_hosts

        cfg = self.cfg
        seeds = parse_seed_lines(seed_lines, cfg, cur_time_ms)
        norms = URLNormalizers(cfg.normalizers)
        filts = URLFilters(cfg.filters)
        normed = norms.normalize_many(seeds["url"].tolist(), SCOPE_INJECT)
        seeds["url"] = normed
        seeds = seeds[seeds["url"].notna()]
        seeds = seeds[filts.accept_many(seeds["url"].to_numpy())]
        hosts = hosts_of(seeds["url"].to_numpy())
        seeds["host"] = hosts.to_numpy(dtype=object)
        seeds["part"] = partition_for_hosts(hosts, cfg.num_partitions, cfg.partition_seed, cfg.partition_mode)

        gen = self.store.latest_gen()
        new_gen = 0 if gen is None else gen + 1
        touched = sorted(set(int(p) for p in seeds["part"]))
        tables: dict[int, pa.Table] = {}
        for p in touched:
            old = self.store.read_table(gen, parts=[p]) if gen is not None else None
            old_df = old.to_pandas() if old is not None else pd.DataFrame(columns=seeds.columns)
            sp = seeds[seeds["part"] == p]
            combined = pd.concat([sp, old_df], ignore_index=True)
            merged = inject_merge(combined, cfg)
            merged["domain"] = domains_of(merged["host"]).to_numpy(dtype=object)
            tables[p] = _frontier_pa(merged)
        man = self.store.write_generation(
            tables, gen=new_gen, parent_gen=gen,
            counters={"urls_injected": int(len(seeds))},
        )
        return man

    # ------------------------------------------------------------------
    def run_round(self, cur_time_ms: int, topn: int | None = None, hostdb: dict | None = None) -> dict:
        """One generate→fetch→parse→updatedb round. Returns round metrics."""
        cfg = self.cfg
        t0 = time.monotonic()
        gen = self.store.latest_gen()
        assert gen is not None, "bootstrap or inject first"
        new_gen = gen + 1
        seg = self.seg_dir(new_gen)
        if os.path.exists(seg) and not self.round_complete(new_gen):
            shutil.rmtree(seg)  # incomplete previous attempt: redo
        os.makedirs(seg, exist_ok=True)

        timings: dict[str, float] = {}

        # -- generate ---------------------------------------------------
        t = time.monotonic()
        frontier = self.store.read(gen)
        fetchlist = generate_stage(frontier, cfg, cur_time_ms, gen_time_ms=cur_time_ms, topn=topn, hostdb=hostdb)
        fl_dir = os.path.join(seg, "fetchlist")
        fetchlist.write_parquet(fl_dir)
        timings["generate"] = time.monotonic() - t

        import ray.data as rd

        fetchlist = rd.read_parquet(fl_dir, partitioning=None)
        n_generated = fetchlist.count()
        if n_generated == 0:
            # no URLs due: carry frontier forward untouched
            self.store.write_generation({}, gen=new_gen, parent_gen=gen, counters={"generated": 0})
            return self._commit_round(new_gen, gen, [], timings, {"generated": 0}, t0)

        # -- fetch ------------------------------------------------------
        t = time.monotonic()
        fetch_out = fetch_stage(fetchlist, cfg, cur_time_ms, self.protocol)
        fo_dir = os.path.join(seg, "fetch_out")
        fetch_out.write_parquet(fo_dir)
        timings["fetch"] = time.monotonic() - t

        fetch_out = rd.read_parquet(fo_dir, partitioning=None)

        # -- parse ------------------------------------------------------
        t = time.monotonic()
        parsed = parse_stage(fetch_out, cfg)
        parse_dir = os.path.join(seg, "parse")
        parsed.write_parquet(parse_dir)
        timings["parse"] = time.monotonic() - t

        parsed = rd.read_parquet(parse_dir, partitioning=None)
        crawl_parse = parsed.filter(expr="rtype == 'crawl_parse'")

        # -- updatedb (touched partitions only) -------------------------
        t = time.monotonic()
        touched = set(int(p) for p in fetch_out.unique("part"))
        touched |= set(int(p) for p in crawl_parse.unique("part"))
        touched = sorted(touched)
        frontier_touched = self.store.read(gen, parts=touched)
        new_frontier = updatedb_stage(
            frontier_touched,
            fetch_out.drop_columns(["content", "content_type", "fetch_order"]),
            crawl_parse,
            cfg,
            cur_time_ms,
        )
        upd_dir = os.path.join(seg, "frontier_delta")
        new_frontier.write_parquet(upd_dir)
        timings["updatedb"] = time.monotonic() - t

        # install new generation per partition
        delta = pq.read_table(upd_dir)
        tables: dict[int, pa.Table] = {}
        for p in touched:
            tables[p] = _frontier_pa_from_table(delta.filter(pa.compute.equal(delta["part"], p)))
        counters = self._counters(delta, n_generated)
        self.store.write_generation(tables, gen=new_gen, parent_gen=gen, counters=counters)

        return self._commit_round(new_gen, gen, touched, timings, counters, t0)

    # ------------------------------------------------------------------
    def _counters(self, delta: pa.Table, n_generated: int) -> dict:
        status = delta.column("status").to_numpy()
        hist = {CS.name(int(s)): int(c) for s, c in zip(*np.unique(status, return_counts=True))}
        return {"generated": int(n_generated), "db_status": hist, "rows_touched": len(status)}

    def _commit_round(self, new_gen, parent_gen, touched, timings, counters, t0) -> dict:
        metrics = {
            "gen": new_gen,
            "parent_gen": parent_gen,
            "touched_parts": list(touched),
            "timings_s": {k: round(v, 3) for k, v in timings.items()},
            "wall_s": round(time.monotonic() - t0, 3),
            "counters": counters,
        }
        path = os.path.join(self.seg_dir(new_gen), "_ROUND.json")
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(metrics, f, indent=1)
        os.replace(tmp, path)
        return metrics


# ---------------------------------------------------------------------------


def _frontier_pa(df) -> pa.Table:
    from ..model import FRONTIER_SCHEMA

    cols = {}
    for field in FRONTIER_SCHEMA:
        name = field.name
        if name in df.columns:
            cols[name] = pa.array(df[name].tolist(), type=field.type)
        else:
            cols[name] = pa.nulls(len(df), type=field.type)
    return pa.table(cols, schema=FRONTIER_SCHEMA)


def _frontier_pa_from_table(t: pa.Table) -> pa.Table:
    from ..model import FRONTIER_SCHEMA

    cols = {}
    for field in FRONTIER_SCHEMA:
        if field.name in t.column_names:
            cols[field.name] = t.column(field.name).cast(field.type)
        else:
            cols[field.name] = pa.nulls(t.num_rows, type=field.type)
    return pa.table(cols, schema=FRONTIER_SCHEMA)
