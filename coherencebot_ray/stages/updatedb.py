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
from ..functions.urlutil import domains_of
from ..model import CrawlStatus as CS


def _to_datums(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame()
    for c in _DATUM_COLS:
        out[c] = df[c] if c in df.columns else None
    return out


def updatedb(
    frontier_ds,
    fetch_out_ds,
    crawl_parse_ds,
    cfg: CrawlConfig,
    cur_time_ms: int,
):
    """Returns the next-generation frontier Dataset (with domain column)."""

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return _to_datums(df)

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
        out = apply_purges(out, cfg)
        out["domain"] = domains_of(out["host"]).to_numpy(dtype=object) if len(out) else None
        # emit Arrow with the exact frontier schema so every block/file of
        # the write agrees (all-None object cols would infer as null type)
        return frontier_table_from_pandas(out)

    return unioned.groupby("part").map_groups(merge, batch_format="pandas")


def apply_purges(out: pd.DataFrame, cfg: CrawlConfig) -> pd.DataFrame:
    """CrawlDbFilter (crawl/CrawlDbFilter.java:52-125): optional purges
    of 404/gone, orphaned and withdrawn rows — checked FIRST, cheaper
    than normalizing — then optional url re-normalization (scope
    crawldb) and re-filtering during the update; a url normalized to
    None or rejected by the filters is dropped."""
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
    if cfg.update_url_normalize and len(out):
        from ..functions.normalizers import SCOPE_CRAWLDB, URLNormalizers

        normed = URLNormalizers(cfg.normalizers).normalize_many(
            out["url"].tolist(), SCOPE_CRAWLDB)
        keep = np.array([u is not None for u in normed], dtype=bool)
        out = out[keep].reset_index(drop=True)
        out["url"] = [u for u in normed if u is not None]
    if cfg.update_url_filter and len(out):
        from ..functions.filters import make_url_filters

        out = out[make_url_filters(cfg).accept_many(out["url"].to_numpy())]
        out = out.reset_index(drop=True)
    return out
