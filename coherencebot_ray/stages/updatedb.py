"""Updatedb stage: merge fetch/parse outcomes into the next frontier
generation.

Reference: crawl/CrawlDb.java:58-390 (job wiring), CrawlDbFilter.java
(purges), CrawlDbReducer (state machine — ported in
functions/updatedb.py). Ray-Data-first:

  union(frontier, fetch_out↓datum-cols, crawl_parse↓datum-cols)
    .groupby("part").map_groups(merge_partition)

One shuffle, keyed by the SAME persisted hash(host) partition id used by
generate/fetch — LINKED rows were already re-partitioned to their
target's partition by the parse stage, so every datum of a URL meets in
exactly one group and the within-group merge is a vectorized pandas
kernel (not per-URL Python).

Scale note (10^10 rows): callers pass ``touched_parts`` so only
partitions with fetch/parse activity are read+rewritten; untouched
partitions carry forward by manifest reference (FrontierStore).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import CrawlConfig
from ..functions.updatedb import _DATUM_COLS, merge_partition
from ..functions.urlutil import domains_of, hosts_of, partition_for_hosts
from ..model import CrawlStatus as CS


def _to_datums(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame()
    for c in _DATUM_COLS:
        out[c] = df[c] if c in df.columns else None
    return out


def renormalize_frame(out: pd.DataFrame, cfg: CrawlConfig):
    """CrawlDbFilter's url re-normalization (scope crawldb) + re-filter
    (crawl/CrawlDbFilter.java:96-120). A normalizer may change the HOST
    (www-strip, case, port rules), so host and the hash(host) partition
    are recomputed for renamed rows — the reference runs this as a
    mapper and Hadoop reshuffles on the new key automatically; here the
    caller is responsible for routing rows whose ``part`` changed.

    Returns ``(df, renamed_mask)``.
    """
    renamed = np.zeros(len(out), dtype=bool)
    if cfg.update_url_normalize and len(out):
        from ..functions.normalizers import SCOPE_CRAWLDB, RegexNormalizer, URLNormalizers

        overrides = None
        if getattr(cfg, "crawldb_regex_rules", ()):
            # per-scope rule file analogue (regex-normalize.xml.crawldb)
            overrides = {
                SCOPE_CRAWLDB: tuple(cfg.normalizers)
                + (RegexNormalizer(list(cfg.crawldb_regex_rules)),)
            }
        urls = out["url"].tolist()
        normed = URLNormalizers(cfg.normalizers, scope_overrides=overrides).normalize_many(
            urls, SCOPE_CRAWLDB)
        keep = np.array([u is not None for u in normed], dtype=bool)
        if not keep.all():
            out = out[keep].reset_index(drop=True)
            urls = [u for u, k in zip(urls, keep) if k]
            normed = [u for u in normed if u is not None]
        renamed = np.array([a != b for a, b in zip(urls, normed)], dtype=bool)
        if renamed.any():
            out = out.copy()
            out["url"] = normed
            sub = pd.Series(np.asarray(normed, dtype=object)[renamed])
            nh = hosts_of(sub)
            out.loc[renamed, "host"] = nh.to_numpy(dtype=object)
            out.loc[renamed, "part"] = partition_for_hosts(
                nh, cfg.num_partitions, cfg.partition_seed, cfg.partition_mode
            )
    if cfg.update_url_filter and len(out):
        from ..functions.filters import make_url_filters

        acc = np.asarray(make_url_filters(cfg).accept_many(out["url"].to_numpy()), dtype=bool)
        if not acc.all():
            out = out[acc].reset_index(drop=True)
            renamed = renamed[acc]
    return out, renamed


def merge_frontier_frames(g: pd.DataFrame) -> pd.DataFrame:
    """CrawlDbMerger fold over a pandas frame of frontier rows: per URL
    keep the entry with the newest calculateLastFetchTime, metadata
    merged newer-over-older (CrawlDbMerger.java:82-119). Used by
    ``mergedb`` and by the stray-routing pass that folds re-partitioned
    (host-renamed) rows into their target partition."""
    import json as _json

    from ..functions.schedules import calculate_last_fetch_time

    lft = calculate_last_fetch_time(
        g["status"].to_numpy(),
        g["fetch_time"].to_numpy(),
        g["fetch_interval"].to_numpy(),
        CS.DB_UNFETCHED,
    )
    g = g.assign(_lft=lft)
    g = g.sort_values("_lft", ascending=True, kind="stable")
    res = g.groupby("url", sort=False).tail(1).drop(columns="_lft").copy()
    # metadata JSON fold only where it can matter: urls with >1 entry of
    # which at least one carries metadata (singletons — the overwhelming
    # majority of a frontier merge — keep their column value untouched)
    dup = g[g["url"].duplicated(keep=False)]
    if len(dup):
        has_md = dup["metadata"].map(lambda m: bool(m)).to_numpy()
        fold_urls = set(dup.loc[has_md, "url"])
        if fold_urls:
            dup = dup[dup["url"].isin(fold_urls)]
            merged = {}
            for url, ms in dup.groupby("url", sort=False)["metadata"]:
                acc = {}
                for mjson in ms:
                    if mjson:
                        acc.update(_json.loads(mjson))
                merged[url] = _json.dumps(acc, sort_keys=True) if acc else None
            sel = res["url"].isin(merged)
            res.loc[sel, "metadata"] = res.loc[sel, "url"].map(merged)
    return res


def updatedb(
    frontier_ds,
    fetch_out_ds,
    crawl_parse_ds,
    cfg: CrawlConfig,
    cur_time_ms: int,
):
    """Returns the next-generation frontier Dataset (with domain column)."""

    def project(df: pd.DataFrame) -> pd.DataFrame:
        out = _to_datums(df)
        if cfg.update_url_normalize or cfg.update_url_filter:
            # map-side, like the reference's CrawlDbFilter mapper: the
            # groupby("part") below then reshuffles renamed rows to
            # their recomputed hash(host) partition, so a renamed url
            # and its canonical twin meet in one group and deduplicate
            out, _ = renormalize_frame(out, cfg)
        return out

    parts = [frontier_ds.map_batches(project, batch_format="pandas")]
    if fetch_out_ds is not None:
        # prune content/bytes BEFORE the shuffle
        parts.append(fetch_out_ds.map_batches(project, batch_format="pandas"))
    if crawl_parse_ds is not None:
        parts.append(crawl_parse_ds.map_batches(project, batch_format="pandas"))
    unioned = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    def merge(g: pd.DataFrame):
        from ..model import frontier_table_from_pandas

        out = merge_partition(g, cfg, cur_time_ms)
        out = apply_purges(out, cfg, normalize=False)  # done map-side in project
        out["domain"] = domains_of(out["host"]).to_numpy(dtype=object) if len(out) else None
        # emit Arrow with the exact frontier schema so every block/file of
        # the write agrees (all-None object cols would infer as null type)
        return frontier_table_from_pandas(out)

    return unioned.groupby("part").map_groups(merge, batch_format="pandas")


def apply_purges(out: pd.DataFrame, cfg: CrawlConfig, normalize: bool = True) -> pd.DataFrame:
    """CrawlDbFilter (crawl/CrawlDbFilter.java:52-125): optional purges
    of 404/gone, orphaned and withdrawn rows — checked FIRST, cheaper
    than normalizing — then optional url re-normalization (scope
    crawldb) and re-filtering during the update; a url normalized to
    None or rejected by the filters is dropped.

    With ``normalize=True`` and renames present, the returned frame
    carries a transient boolean ``_renamed_`` column (host/part already
    recomputed); the caller must pop it and route rows whose partition
    changed (see ``_UpdateTask`` stray staging in pipelines/crawl.py).
    Callers that renormalize map-side pass ``normalize=False``."""
    if len(out) == 0:
        return out
    mask = np.ones(len(out), dtype=bool)
    if cfg.purge_404:
        mask &= out["status"].to_numpy() != CS.DB_GONE
    if cfg.purge_orphans:
        mask &= out["status"].to_numpy() != CS.DB_ORPHAN
    if cfg.purge_withdrawn:
        mask &= out["status"].to_numpy() != CS.DB_WITHDRAWN
    if not mask.all():
        out = out[mask].reset_index(drop=True)
    if normalize and (cfg.update_url_normalize or cfg.update_url_filter) and len(out):
        out, renamed = renormalize_frame(out, cfg)
        if renamed.any():
            out = out.copy()
            out["_renamed_"] = renamed
    return out
