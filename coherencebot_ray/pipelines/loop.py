"""The production crawl loop (bin/crawl analogue, src/bin/crawl:316-470).

Per round: [feed inject] → [hostdb update] → generate→fetch+parse→
updatedb (CrawlDriver.run_round) → [invertlinks] → [dedup] → [index].
A ``.STOP`` file in the workdir ends the loop after the current round
(src/bin/crawl:319-322); every step is resumable (round manifests +
versioned generations).
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from ..config import CrawlConfig
from ..model import CrawlStatus as CS
from .crawl import CrawlDriver


def crawl_loop(
    workdir: str,
    cfg: CrawlConfig | None = None,
    seeds: list[str] | None = None,
    rounds: int = 1,
    start_time_ms: int | None = None,
    round_interval_ms: int = 86_400_000,
    use_feed: bool = False,
    hostdb_every: int = 0,
    dedup_every: int = 0,
    doc_dedup_every: int = 0,
    media_dedup_every: int = 0,
    invertlinks_every: int = 0,
    index_every: int = 0,
    sitemaps_every: int = 0,
    sitemap_host_slices: int = 1,
    sitemap_hosts_cap: int = 100_000,
    warc_out: str | None = None,
    gc_keep_gens: int = 0,
    protocol=None,
) -> list[dict]:
    """Run ``rounds`` crawl rounds; returns per-round metrics."""
    import ray.data as rd

    from ..stages import jobs, tools

    cfg = cfg or CrawlConfig()
    d = CrawlDriver(workdir, cfg, protocol=protocol)

    # resume-exact time base: the FIRST run persists its start time and
    # interval; a resumed run (same workdir) reuses them, and every
    # round's timestamp is keyed off the store's generation index — so
    # an interrupted-and-resumed crawl computes byte-identical
    # fetch_time/gen_time to the uninterrupted one (the reference's
    # segment names are wall-clock stamps and are NOT resume-exact;
    # tested in tests/test_loop.py::test_kill_resume_exact).
    meta_path = os.path.join(workdir, "_CRAWL_META.json")
    if start_time_ms is None and os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        now = int(meta["start_time_ms"])
        round_interval_ms = int(meta.get("round_interval_ms", round_interval_ms))
    else:
        now = start_time_ms if start_time_ms is not None else int(time.time() * 1000)
        os.makedirs(workdir, exist_ok=True)
        with open(meta_path, "w") as fh:
            json.dump({"start_time_ms": now,
                       "round_interval_ms": round_interval_ms}, fh)

    if d.store.latest_gen() is None:
        lines = list(seeds or [])
        if use_feed:
            lines += tools.feed_inject_lines(tools.FakeCollectionsFeed())
        if not lines:
            raise ValueError("no frontier: provide seeds or --feed")
        d.inject(lines, now)

    hostdb_overrides = None
    results = []
    try:
        results = _loop_rounds(
            d, cfg, rounds, now, round_interval_ms, use_feed, hostdb_every,
            sitemaps_every, sitemap_host_slices, sitemap_hosts_cap, warc_out,
            gc_keep_gens, invertlinks_every, dedup_every, index_every,
            workdir, hostdb_overrides, doc_dedup_every,
            media_dedup_every,
        )
    finally:
        d.close()  # release the persistent round-worker pool
    return results


def _append_round_counters(seg_dir: str, counters: dict) -> None:
    """Fold post-round cadence counters into the segment's _ROUND.json
    (run_round wrote it before the cadence ran)."""
    path = os.path.join(seg_dir, "_ROUND.json")
    try:
        with open(path) as fh:
            doc = json.load(fh)
        doc.setdefault("counters", {}).update(counters)
        with open(path, "w") as fh:
            json.dump(doc, fh)
    except Exception:
        pass  # metrics-only artifact; never fail the loop over it


def _rounds_completed(store) -> int:
    """Crawl rounds committed in this store: manifests whose counters
    carry ``generated`` (written only by run_round's final commit —
    inject / dedup-mark / gen-writeback commits carry other keys).
    The manifest rename is atomic, so this survives a kill at any point."""
    latest = store.latest_gen()
    if latest is None:
        return 0
    n = 0
    for g in range(latest + 1):
        try:
            man = store.manifest(g)
        except (FileNotFoundError, OSError, ValueError):
            continue
        if "generated" in (man.get("counters") or {}):
            n += 1
    return n


def _all_segment_docs(workdir: str):
    """Lazy Dataset over every parsed docs part across ALL segment
    generations so far (None when no docs exist yet) — shared by the
    doc-dedup and media-dedup cadences."""
    import glob

    import ray.data as rd

    doc_files = sorted(glob.glob(os.path.join(
        workdir, "segments", "gen=*", "docs", "part-*", "*.parquet")))
    if not doc_files:
        return None
    return rd.read_parquet(doc_files, partitioning=None)


def _loop_rounds(
    d, cfg, rounds, now, round_interval_ms, use_feed, hostdb_every,
    sitemaps_every, sitemap_host_slices, sitemap_hosts_cap, warc_out,
    gc_keep_gens, invertlinks_every, dedup_every, index_every,
    workdir, hostdb_overrides, doc_dedup_every=0,
    media_dedup_every=0,
) -> list[dict]:
    import ray.data as rd  # noqa: F401 (kept: parity with crawl_loop imports)

    from ..stages import jobs, tools

    # round index base = crawl rounds already completed in this workdir
    # (manifests committed by run_round carry a "generated" counter;
    # dedup-mark / inject / writeback generations do not). The manifest
    # rename is the atomic commit, so this is crash-consistent — equal
    # to 0 on a fresh run and to the resume point after a kill, making
    # timestamps (now + ridx*interval) and every cadence line up exactly
    # with the uninterrupted execution.
    base = _rounds_completed(d.store)

    results = []
    for r in range(rounds):
        if os.path.exists(os.path.join(workdir, ".STOP")):
            break
        ridx = base + r
        cur = now + ridx * round_interval_ms

        if use_feed and ridx > 0:
            d.inject(tools.feed_inject_lines(tools.FakeCollectionsFeed()), cur)

        if hostdb_every and ridx % hostdb_every == 0:
            gen = d.store.latest_gen()
            # per-host generate overrides (Generator.java:415-453 analogue):
            # demote hosts with many gone pages. Prune to override-worthy
            # hosts BEFORE collecting (the full hostdb is host-cardinality),
            # then build the dict from columns — no iterrows.
            bad = (
                jobs.update_hostdb(d.store.read(gen))
                .map_batches(
                    lambda df: df[df["gone"] > 5][["host", "gone"]],
                    batch_format="pandas",
                )
                .to_pandas()
            )
            hostdb_overrides = {
                h: (max(1, int(10 - g)), 0)
                for h, g in zip(bad["host"], bad["gone"])
            } or None

        if sitemaps_every and ridx % sitemaps_every == 0:
            # robots-declared sitemap discovery over the frontier's hosts
            # (SitemapProcessor round). The host list NEVER lands on the
            # driver (host cardinality is ~1e8 at web scale): per-batch
            # distinct -> host-keyed exchange for the global distinct,
            # sliced by host-hash so each sitemap round walks 1/Nth of
            # the host space (rotating across rounds), with a hard cap.
            # (columns= pushdown on gen=/part= paths trips a Ray parquet
            # reader bug; project per batch instead)
            slice_id = (ridx // sitemaps_every) % sitemap_host_slices

            def pick_hosts(df, _sid=slice_id, _n=sitemap_host_slices):
                h = df[["host"]].drop_duplicates()
                if _n > 1:
                    h = h[tools._shard_of(h["host"].to_numpy(), _n) == _sid]
                return h

            hosts_ds = (
                d.store.read(d.store.latest_gen())
                .map_batches(pick_hosts, batch_format="pandas")
                .groupby("host")
                .map_groups(lambda g: g.head(1), batch_format="pandas")
                .limit(sitemap_hosts_cap)
            )
            d.sitemap_round(hosts_ds, cur)

        metrics = d.run_round(cur, hostdb=hostdb_overrides)
        gen = metrics["gen"]

        if warc_out:
            metrics["warc_records"] = tools.export_warc(
                d.seg_dir(gen), os.path.join(warc_out, f"gen={gen:06d}")
            )

        if gc_keep_gens > 0:
            metrics["gc"] = d.store.gc(keep_gens=gc_keep_gens)

        if invertlinks_every and ridx % invertlinks_every == 0:
            ol = tools.read_segment(d.seg_dir(gen), "outlinks")
            if ol.count():
                linkdb = jobs.invertlinks(ol, cfg)
                linkdb.write_parquet(os.path.join(workdir, "linkdb", f"gen={gen:06d}"))
                metrics["linkdb_rows"] = "written"

        if dedup_every and ridx % dedup_every == 0:
            # J9: decide losers over the (signature-pruned) frontier,
            # then COMMIT the marks as a new generation via the
            # per-touched-partition merge-back — the frontier never
            # crosses an all-to-all exchange, and the marks persist so
            # the indexer / CleaningJob see DB_DUPLICATE in later rounds
            # (bin/crawl runs dedup right before index for this reason).
            dups = jobs.dedup(d.store.read(gen), cfg)
            res = d.apply_dedup_marks(dups)
            metrics["duplicates_marked"] = res["duplicates_marked"]

        if doc_dedup_every and ridx % doc_dedup_every == 0:
            # document-level near-dup keep-one over ALL segments so far
            # (minhash -> components -> losers): the training-data
            # analogue of J9's URL dedup. Losers materialize once (the
            # loser set, not the corpus), land as a resumable parquet
            # artifact, and get marked DB_DUPLICATE in the frontier for
            # the counter — visible in _ROUND.json like J9's marks.
            docs = _all_segment_docs(workdir)
            n_doc_dups = 0
            if docs is not None:
                losers = jobs.doc_neardup_losers(docs).materialize()
                n_doc_dups = losers.count()
                if n_doc_dups:
                    losers.write_parquet(
                        os.path.join(workdir, "doc_dedup", f"gen={gen:06d}"))
                    # commit the loser marks (per-touched-partition
                    # merge-back; apply_dedup_marks derives part from
                    # the loser urls since docs don't carry it)
                    n_doc_dups = d.apply_dedup_marks(losers)["duplicates_marked"]
            metrics["doc_dups_marked"] = n_doc_dups
            _append_round_counters(
                d.seg_dir(gen), {"doc_dups_marked": n_doc_dups})

        if media_dedup_every and ridx % media_dedup_every == 0:
            # interleaved-media dedup plan: media refs shared by >= 2
            # parsed docs across ALL segments so far, with the min-id
            # canonical owner — the media-fetch stage reads the plan
            # and fetches/decodes each asset ONCE (the media analogue
            # of J9's URL dedup; refs move, payloads never do).
            import pyarrow as _pa

            from ..ops.interleaved import media_ref_groups

            docs = _all_segment_docs(workdir)
            n_dup_refs = fetches_saved = 0
            if docs is not None:
                plan = media_ref_groups(
                    docs, min_docs=2, id_arrow_type=_pa.string()
                ).materialize()
                n_dup_refs = plan.count()
                if n_dup_refs:
                    plan.write_parquet(os.path.join(
                        workdir, "media_plan", f"gen={gen:06d}"))
                    fetches_saved = int(plan.map_batches(
                        lambda df: pd.DataFrame(
                            {"s": [int((df["n_docs"] - 1).sum())]}),
                        batch_format="pandas").to_pandas()["s"].sum())
            metrics["media_dup_refs"] = n_dup_refs
            metrics["media_fetches_saved"] = fetches_saved
            _append_round_counters(
                d.seg_dir(gen), {"media_dup_refs": n_dup_refs,
                                 "media_fetches_saved": fetches_saved})

        if index_every and ridx % index_every == 0:
            docs = tools.read_segment(d.seg_dir(gen), "docs")
            if docs.count():
                # -addBinaryContent: ride the segment content part
                # through the same join exchange (IndexerMapReduce
                # initMRJob adds Content.DIR_NAME as an input)
                content = (
                    tools.read_segment(d.seg_dir(gen), "content")
                    if cfg.indexer_add_binary_content
                    else None
                )
                idx = jobs.indexer_join(d.store.read(gen), docs, None, cfg,
                                        content_ds=content)
                tools.write_index(idx, os.path.join(workdir, "index", f"gen={gen:06d}"))
                metrics["indexed"] = "written"

        results.append(metrics)
    return results
