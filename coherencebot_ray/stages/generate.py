"""Generate: select the next fetchlist from the frontier.

Reference: crawl/Generator.java (Selector map :216-292, SelectorReducer
:381-537, partitionSegment :1004-1050). Ray-Data-first restatement:

  frontier (partition-pruned parquet read)
    → map_batches(eligibility filter, vectorized)        [stateless tasks]
    → groupby("part").map_groups(select_partition)       [the only shuffle]
    → fetchlist rows ordered by generator_url_hash       [per-partition]

One shuffle total: the frontier is already hash(host)-partitioned by the
persisted ``part`` column (URLPartitioner analogue), so groupby("part")
is the reference's by-host partitioning AND its per-reducer topN budget
(limit = topN / num_partitions, Generator.java:381-382) in one step.
Mega-host skew is handled like the reference: per-host/domain
``generate.max.count`` with spill into up to ``max_num_segments``
fetchlist segments (Generator.java:494-537).

Politeness invariant: a host's URLs never span partitions, so the fetch
stage can keep per-host state partition-locally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import CrawlConfig
from ..functions import schedules as sch
from ..functions.filters import URLFilters
from ..functions.jexl import evaluate as jexl_eval
from ..functions.urlutil import generator_url_hash_vec
from ..model import CrawlStatus as CS

FETCHLIST_EXTRA_COLS = ("segnum", "sort_score", "fetch_delay_ms")


def eligibility_filter(
    df: pd.DataFrame,
    cfg: CrawlConfig,
    cur_time_ms: int,
    filters: URLFilters | None = None,
    expr: str | None = None,
    restrict_status: int = -1,
) -> pd.DataFrame:
    """Vectorized Selector.map (Generator.java:216-292)."""
    if len(df) == 0:
        return df
    mask = np.ones(len(df), dtype=bool)
    if filters is not None:
        mask &= filters.accept_many(df["url"].to_numpy())

    eligible, ft, itv = sch.should_fetch(
        df["fetch_time"].to_numpy(),
        df["fetch_interval"].to_numpy(),
        cur_time_ms,
        cfg.interval_max,
    )
    mask &= eligible
    df = df.copy()
    df["fetch_time"], df["fetch_interval"] = ft, itv

    # gen-delay: rows already carrying a generate time are awaiting
    # fetch+update and are skipped until crawl.gen.delay expires
    # (Generator.java:238-244: skip while genTime + genDelay > curTime)
    gt = df["gen_time"].to_numpy()
    mask &= (gt == 0) | (gt + cfg.gen_delay_ms <= cur_time_ms)

    if expr:
        try:
            mask &= jexl_eval(df, expr)
        except ValueError:
            pass
    if restrict_status != -1:
        mask &= df["status"].to_numpy() == restrict_status
    if cfg.gen_min_score > 0:
        mask &= df["score"].to_numpy(dtype=np.float32) >= np.float32(cfg.gen_min_score)
    if cfg.gen_max_interval > 0:
        mask &= df["fetch_interval"].to_numpy() <= cfg.gen_max_interval
    return df[mask]


def select_partition(
    g: pd.DataFrame,
    cfg: CrawlConfig,
    limit: int,
    gen_time_ms: int,
    hostdb: dict | None = None,
    max_num_segments: int = 1,
    _force_loop: bool = False,
) -> pd.DataFrame:
    """SelectorReducer for one partition (Generator.java:381-537).

    Entries are visited in decreasing score order (stable ties = input
    order, like the MR float-desc sort); per host-or-domain cap with
    segment spill; per-partition budget ``limit`` per segment.
    ``hostdb`` broadcasts per-host overrides {host: (max_count,
    fetch_delay_ms)} — fixes the reference's O(hosts×records) linear
    hostdb scan (Generator.java:552-568) with a dict lookup.
    """
    if len(g) == 0:
        return _empty_fetchlist(g)
    # scfilters.generatorSortValue (Generator.java:248; fold seeded 1.0,
    # OPIC multiplies in the datum score, scoring-depth reads metadata)
    from ..functions.scoring import make_scoring

    scoring = make_scoring(cfg)
    sort_value = scoring.generator_sort_value(
        g["score"].to_numpy(dtype=np.float32),
        metadata=(
            g["metadata"].to_numpy()
            if scoring.uses_generator_metadata and "metadata" in g.columns
            else None
        ),
    )
    order = np.argsort(-sort_value, kind="stable")
    g = g.iloc[order]

    key_col = "domain" if cfg.gen_count_mode == "domain" else "host"
    keys = g[key_col].to_numpy()
    n = len(g)

    default_max = cfg.gen_max_count
    seg_counts = np.zeros(max_num_segments, dtype=np.int64)
    host_state: dict[str, list] = {}  # key -> [segnum(1-based), count]
    take = np.zeros(n, dtype=bool)
    segnum = np.zeros(n, dtype=np.int32)
    fetch_delay = np.zeros(n, dtype=np.int64)
    cur_segment = 1
    count = 0

    hosts_arr = g["host"].to_numpy()
    if default_max <= 0 and not hostdb and not _force_loop:
        # FAST PATH (the stock config: generate.max.count=-1, no hostdb
        # overrides): no per-host caps means selection degenerates to
        # the first limit×segments rows in score order with block
        # segment assignment — fully vectorized, no per-row loop. This
        # is the 10^10-frontier common case; the loop below only runs
        # when host caps or overrides are live.
        n_take = min(n, limit * max_num_segments)
        out = g.iloc[:n_take].copy()
        out["segnum"] = (np.arange(n_take, dtype=np.int64) // limit + 1).astype(np.int32)
        out["sort_score"] = out["score"].astype(np.float32)
        out["fetch_delay_ms"] = np.int64(0)
        out["gen_time"] = gen_time_ms
        h = generator_url_hash_vec(out["url"].to_numpy())
        return out.iloc[np.argsort(h, kind="stable")].reset_index(drop=True)

    if max_num_segments == 1 and not _force_loop:
        # VECTORIZED single-segment path (the production loop shape:
        # maxNumSegments=1, caps/overrides live). The sequential
        # reducer semantics collapse exactly: a row is taken iff its
        # 1-based rank within its count-key group (score order) is
        # within the row's cap, and the running count of such rows has
        # not filled the per-partition budget. Equivalence with the
        # reference-shaped loop below is property-tested
        # (tests/test_generate.py::test_select_vectorized_matches_loop).
        mc = np.full(n, default_max, dtype=np.int64)
        fdel = np.zeros(n, dtype=np.int64)
        if hostdb:
            hseries = pd.Series(hosts_arr)
            ov_mc = {h: int(v[0]) for h, v in hostdb.items() if v[0] is not None}
            ov_fd = {h: int(v[1]) for h, v in hostdb.items()
                     if len(v) > 1 and v[1]}
            if ov_mc:
                m = hseries.map(ov_mc)
                has = m.notna().to_numpy()
                mc[has] = m.to_numpy(dtype="float64")[has].astype(np.int64)
            if ov_fd:
                f = hseries.map(ov_fd)
                has = f.notna().to_numpy()
                fdel[has] = f.to_numpy(dtype="float64")[has].astype(np.int64)
        # group counter semantics: only rows whose OWN cap is live
        # (mc > 0) increment their count-key group's counter — uncapped
        # rows take the reducer's else-branch and never touch it
        capped = mc > 0
        rank = (
            pd.Series(capped.astype(np.int64))
            .groupby(keys, sort=False)
            .cumsum()
            .to_numpy()
        )
        pass_host = ~capped | (rank <= mc)
        take = pass_host & (np.cumsum(pass_host) <= limit)
        out = g[take].copy()
        out["segnum"] = np.int32(1)
        out["sort_score"] = out["score"].astype(np.float32)
        out["fetch_delay_ms"] = fdel[take]
        out["gen_time"] = gen_time_ms
        h = generator_url_hash_vec(out["url"].to_numpy())
        return out.iloc[np.argsort(h, kind="stable")].reset_index(drop=True)

    for i in range(n):
        max_count = default_max
        fd = 0
        if hostdb is not None:
            ov = hostdb.get(hosts_arr[i])
            if ov is not None:
                if ov[0] is not None:
                    max_count = int(ov[0])
                if len(ov) > 1 and ov[1]:
                    fd = int(ov[1])
        if count == limit:
            if cur_segment < max_num_segments:
                count = 0
                cur_segment += 1
            else:
                break
        if max_count > 0:
            st = host_state.get(keys[i])
            if st is None:
                st = [1, 0]
                host_state[keys[i]] = st
            st[1] += 1
            while seg_counts[st[0] - 1] >= limit and st[0] < max_num_segments:
                st[0] += 1
                st[1] = 0
            if st[1] > max_count:
                if st[0] < max_num_segments:
                    st[0] += 1
                    st[1] = 1
                else:
                    continue  # skipped: per-host overflow
            segnum[i] = st[0]
            seg_counts[st[0] - 1] += 1
        else:
            segnum[i] = cur_segment
            seg_counts[cur_segment - 1] += 1
        take[i] = True
        fetch_delay[i] = fd
        count += 1

    out = g[take].copy()
    out["segnum"] = segnum[take]
    out["sort_score"] = out["score"].astype(np.float32)
    out["fetch_delay_ms"] = fetch_delay[take]
    out["gen_time"] = gen_time_ms
    # phase 2 (partitionSegment): order fetchlist by URL-hash so fetch
    # order decorrelates from host order (Generator.java:606-637,1034)
    h = generator_url_hash_vec(out["url"].to_numpy())
    out = out.iloc[np.argsort(h, kind="stable")]
    return out.reset_index(drop=True)


def _empty_fetchlist(g: pd.DataFrame) -> pd.DataFrame:
    out = g.iloc[0:0].copy()
    for c, dt in (("segnum", np.int32), ("sort_score", np.float32), ("fetch_delay_ms", np.int64)):
        out[c] = np.array([], dtype=dt)
    return out


def generate(
    frontier_ds,
    cfg: CrawlConfig,
    cur_time_ms: int,
    gen_time_ms: int | None = None,
    topn: int | None = None,
    hostdb: dict | None = None,
    filters: URLFilters | None = None,
    expr: str | None = None,
    restrict_status: int = -1,
    max_num_segments: int = 1,
):
    """Ray Data generate pipeline: frontier Dataset -> fetchlist Dataset."""
    topn = topn if topn is not None else cfg.topn
    gen_time_ms = gen_time_ms if gen_time_ms is not None else cur_time_ms
    limit = max(1, topn // cfg.num_partitions)

    import ray

    hostdb_ref = ray.put(hostdb) if hostdb is not None else None

    def _filter(df: pd.DataFrame) -> pd.DataFrame:
        return eligibility_filter(df, cfg, cur_time_ms, filters, expr, restrict_status)

    def _select(g: pd.DataFrame) -> pd.DataFrame:
        hdb = ray.get(hostdb_ref) if hostdb_ref is not None else None
        return select_partition(g, cfg, limit, gen_time_ms, hdb, max_num_segments)

    eligible = frontier_ds.map_batches(_filter, batch_format="pandas")
    return eligible.groupby("part").map_groups(_select, batch_format="pandas")
