"""The updatedb merge kernel: CrawlDbReducer's state machine, vectorized.

Ports the observed semantics of crawl/CrawlDbReducer.java:39-341 (the
reference's conformance core, exercised by TestCrawlDbStates) as a
columnar kernel over one URL-hash partition at a time:

  1. classify the unioned datums (old db rows, fetch outputs, LINKED
     contributions, SIGNATURE, PARSE_META),
  2. per URL pick latest old & latest fetch (strictly-greater fetchTime
     wins, first-seen wins ties — CrawlDbReducer.java:78-112),
  3. cap inlink contributions at ``db.update.max.inlinks`` top-k by
     score (InlinkPriorityQueue, CrawlDbReducer.java:328-341),
  4. run the status state machine + fetch schedule (CrawlDbReducer.java:196-312)
     with OPIC score update (OPICScoringFilter.updateDbScore:93-102),
  5. emit the next-generation frontier rows.

Everything is numpy/pandas vectorized; the only Python-level loop is the
(rare) JSON metadata merge.

Input frame columns (one row per datum): url, host, part, status,
fetch_time, retries, fetch_interval, score, signature, modified_time,
gen_time, repr_url, fixed_interval, metadata.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ..config import CrawlConfig
from ..model import CrawlStatus as CS
from . import schedules as sch

_DATUM_COLS = [
    "url",
    "host",
    "part",
    "status",
    "fetch_time",
    "retries",
    "fetch_interval",
    "score",
    "signature",
    "modified_time",
    "gen_time",
    "repr_url",
    "fixed_interval",
    "metadata",
    "content_type",
    "pst",  # typed protocol-status hot key (SURVEY §1.3)
]

_DB_CODES = np.array(sorted(CS._DB), dtype=np.int64)
_FETCH_CODES = np.array(sorted(CS._FETCH), dtype=np.int64)


def empty_datums() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype="object" if c in ("url", "host", "signature", "metadata", "repr_url", "content_type", "pst") else "int64") for c in _DATUM_COLS})


def _latest_per_url(df: pd.DataFrame) -> pd.DataFrame:
    """Latest fetch_time wins. Ties (same url, same fetch_time — only
    possible with duplicate datums the reference never defines an order
    for) break deterministically by (status, retries, score desc) so the
    merge is permutation-invariant regardless of upstream block order."""
    if len(df) <= 1 or df["url"].is_unique:
        return df
    d = df.sort_values(["fetch_time", "status", "retries", "score"],
                       ascending=False, kind="stable")
    return d[~d["url"].duplicated()]


def _merge_meta(old_meta, new_meta):
    """putAllMetaData(old) then overlay new (CrawlDbReducer.java:181-189)."""
    if not old_meta or old_meta == "{}":
        return new_meta
    if not new_meta or new_meta == "{}":
        return old_meta
    m = json.loads(old_meta)
    m.update(json.loads(new_meta))
    return json.dumps(m, sort_keys=True)


def merge_partition(
    datums: pd.DataFrame,
    cfg: CrawlConfig,
    cur_time_ms: int,
) -> pd.DataFrame:
    """Run the updatedb merge over one partition's unioned datums."""
    if len(datums) == 0:
        return empty_datums()
    schedule = sch.make_schedule(cfg.schedule, cfg)
    # ScoringFilter chain, built once per partition (orphanedScore and
    # the updateDbScore hook below; link_meta_min_keys gates the
    # per-inlink metadata fold so the default chain never parses JSON)
    from .scoring import make_scoring

    scoring = make_scoring(cfg, live_seeds=cfg.extra.get("live_seeds"))
    meta_min_keys = scoring.link_meta_min_keys

    status = datums["status"].to_numpy()
    is_old = np.isin(status, _DB_CODES)
    is_fetch = np.isin(status, _FETCH_CODES)
    is_link = status == CS.LINKED
    is_sig = status == CS.SIGNATURE
    is_pmeta = status == CS.PARSE_META

    old = _latest_per_url(datums[is_old])
    fetch = _latest_per_url(datums[is_fetch])

    links = datums[is_link]
    if len(links):
        # top-k by score (desc), stable → deterministic; aggregate sum in
        # float32 like the reference's float accumulation.
        # DELIBERATE DIVERGENCE: the reference's InlinkPriorityQueue
        # (CrawlDbReducer.java:328-341, inverted lessThan over Hadoop
        # PriorityQueue.insert) observably retains the LOWEST-scoring k
        # inlinks when a url has > db.update.max.inlinks (10000) of them.
        # This port pins the documented intent ("best scoring inlinks
        # kept"): it retains the HIGHEST-scoring k. The two differ only
        # for urls with >10000 inlink contributions in a single round.
        links = links.sort_values("score", ascending=False, kind="stable")
        links = links.groupby("url", sort=False).head(cfg.max_inlinks)
        # vectorized per-url f32 sum: sort rows by url (stable keeps the
        # score-desc order within url => deterministic f32 accumulation
        # via add.reduceat, same order as the sequential loop)
        lk = links.sort_values("url", kind="stable")
        u = lk["url"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        scores32 = lk["score"].to_numpy(dtype=np.float32)
        sums = np.add.reduceat(scores32, starts, dtype=np.float32)
        counts = np.diff(np.r_[starts, len(u)])
        # linkList[0] = highest-score link: template when no fetch datum.
        # first occurrence in the score-desc frame = per-url max.
        first = links[~links["url"].duplicated()]
        first = first.set_index("url")
        uniq_urls = u[starts]
        link_agg = pd.DataFrame(
            {
                "link_sum": sums.astype(np.float64),
                "link_n": counts,
                "l_host": first["host"].reindex(uniq_urls).to_numpy(),
                "l_part": first["part"].reindex(uniq_urls).to_numpy(),
                "l_fetch_time": first["fetch_time"].reindex(uniq_urls).to_numpy(),
                "l_interval": first["fetch_interval"].reindex(uniq_urls).to_numpy(),
                "l_score": first["score"].reindex(uniq_urls).to_numpy(),
                "l_metadata": first["metadata"].reindex(uniq_urls).to_numpy(),
            },
            index=pd.Index(uniq_urls, name="url"),
        )
        if meta_min_keys:
            # per-url MIN of each requested metadata key over this
            # round's inlink contributions (DepthScoringFilter.java:
            # 212-233 folds min depth); NaN = no inlink carried the key
            metas = lk["metadata"].to_numpy()
            vals = {k: np.full(len(metas), np.nan) for k in meta_min_keys}
            for i, mj in enumerate(metas):
                if not (isinstance(mj, str) and mj):
                    continue
                md = json.loads(mj)
                for k in meta_min_keys:
                    v = md.get(k)
                    if v is not None:
                        vals[k][i] = float(v)
            for k in meta_min_keys:
                link_agg[f"_lmin_{k}"] = np.fmin.reduceat(vals[k], starts)
    else:
        link_agg = pd.DataFrame(
            columns=["link_sum", "link_n", "l_host", "l_part", "l_fetch_time", "l_interval", "l_score", "l_metadata"]
        )
    sig_by_url = (
        datums[is_sig].groupby("url", sort=False)["signature"].last()
        if is_sig.any()
        else pd.Series(dtype="object")
    )
    pmeta_by_url = (
        datums[is_pmeta].groupby("url", sort=False)["metadata"].last()
        if is_pmeta.any()
        else pd.Series(dtype="object")
    )

    # --- assemble one row per url -------------------------------------
    old = old.set_index("url", drop=False)
    fetch = fetch.set_index("url", drop=False)
    urls = pd.Index(old.index).union(fetch.index).union(link_agg.index)
    m = pd.DataFrame(index=urls)
    m["has_old"] = m.index.isin(old.index)
    m["has_fetch"] = m.index.isin(fetch.index)

    def col(src, name, default):
        if len(src) and name in src.columns:
            return src[name].reindex(urls, fill_value=default)
        return pd.Series(default, index=urls, dtype=object if default is None else None)

    for c in ("status", "fetch_time", "retries", "fetch_interval", "score", "modified_time", "gen_time", "fixed_interval"):
        m[f"o_{c}"] = pd.to_numeric(col(old, c, 0), errors="coerce").fillna(0)
        m[f"f_{c}"] = pd.to_numeric(col(fetch, c, 0), errors="coerce").fillna(0)
    for c in ("host", "part", "signature", "metadata", "repr_url", "content_type", "pst"):
        m[f"o_{c}"] = col(old, c, None)
        m[f"f_{c}"] = col(fetch, c, None)
    if len(link_agg):
        m = m.join(link_agg, how="left")
    else:
        for c in link_agg.columns:
            m[c] = np.nan
    m["link_sum"] = pd.to_numeric(m["link_sum"], errors="coerce").fillna(0.0)
    m["link_n"] = pd.to_numeric(m["link_n"], errors="coerce").fillna(0).astype(np.int64)
    m["sig_parse"] = sig_by_url.reindex(urls)
    m["parse_meta"] = pmeta_by_url.reindex(urls)

    # additions gate (CrawlDbReducer.java:145-146)
    if not cfg.additions_allowed:
        m = m[m["has_old"].to_numpy()]
        if len(m) == 0:
            return empty_datums()

    has_old = m["has_old"].to_numpy(dtype=bool)
    has_fetch = m["has_fetch"].to_numpy(dtype=bool)
    has_links = m["link_n"].to_numpy() > 0

    now_s = cur_time_ms // 1000

    # no fetch & no links -> orphan path: write old unchanged
    orphan = ~has_fetch & ~has_links
    keep_orphan = orphan & has_old
    m_orphan = m[keep_orphan]
    m = m[~orphan]
    if len(m) == 0:
        out = _orphan_rows(m_orphan, scoring, now_s)
        return out

    has_old = m["has_old"].to_numpy(dtype=bool)
    has_fetch = m["has_fetch"].to_numpy(dtype=bool)

    # effective "fetch" datum: real fetch, else highest-score link template
    use_link = ~has_fetch
    f_status = np.where(use_link, CS.LINKED, m["f_status"].to_numpy()).astype(np.int64)
    f_fetch_time = np.where(use_link, pd.to_numeric(m["l_fetch_time"], errors="coerce").fillna(cur_time_ms), m["f_fetch_time"]).astype(np.int64)
    f_interval = np.where(use_link, pd.to_numeric(m["l_interval"], errors="coerce").fillna(cfg.interval_default), m["f_fetch_interval"]).astype(np.int64)
    f_score = np.where(use_link, pd.to_numeric(m["l_score"], errors="coerce").fillna(0.0), m["f_score"]).astype(np.float32)
    f_retries = np.where(use_link, 0, m["f_retries"]).astype(np.int64)
    f_modified = np.where(use_link, 0, m["f_modified_time"]).astype(np.int64)

    o_status = m["o_status"].to_numpy(dtype=np.int64)
    o_fetch_time = m["o_fetch_time"].to_numpy(dtype=np.int64)
    o_interval = m["o_fetch_interval"].to_numpy(dtype=np.int64)
    o_score = m["o_score"].to_numpy(dtype=np.float32)
    o_modified = m["o_modified_time"].to_numpy(dtype=np.int64)

    prev_fetch_time = np.where(has_old, o_fetch_time, 0)
    prev_modified = np.where(has_old, o_modified, 0)

    # signature from SIGNATURE datum, else the fetch datum's
    sig_parse = m["sig_parse"]
    f_sig = m["f_signature"]
    o_sig = m["o_signature"]
    signature = sig_parse.where(sig_parse.notna(), f_sig)

    # --- result init: fetch datum, overlaid with old meta/modified -----
    r_status = f_status.copy()
    r_fetch_time = f_fetch_time.copy()
    r_interval = f_interval.copy()
    r_retries = f_retries.copy()
    r_score = f_score.copy()
    r_modified = np.where(has_old & (o_modified > 0) & (f_modified == 0), o_modified, f_modified)
    r_sig = f_sig.copy()
    r_fixed = np.where(
        m["f_fixed_interval"].to_numpy() > 0,
        m["f_fixed_interval"].to_numpy(),
        np.where(has_old, m["o_fixed_interval"].to_numpy(), 0),
    ).astype(np.int64)

    # metadata: old overlaid by fetch (CrawlDbReducer.java:181-189), then
    # parse_meta overlay for success-class statuses (NUTCH-1656, :228-233)
    o_meta = m["o_metadata"].where(has_old, None)
    f_meta = m["f_metadata"]
    success_class = np.isin(
        f_status, [CS.FETCH_SUCCESS, CS.FETCH_REDIR_TEMP, CS.FETCH_REDIR_PERM, CS.FETCH_NOTMODIFIED]
    )
    o_meta_np, f_meta_np, pmeta_np = o_meta.to_numpy(), f_meta.to_numpy(), m["parse_meta"].to_numpy()
    # No real fetch datum: the highest-score link IS the effective fetch
    # datum (CrawlDbReducer.java result.set(fetch) with fetch =
    # linkList.get(0)), so its metadata rides along as f_meta.
    l_meta_np = m["l_metadata"].to_numpy() if "l_metadata" in m.columns else np.full(len(m), None, dtype=object)
    f_meta_np = np.where(use_link, l_meta_np, f_meta_np)

    def _present(arr):
        return np.array(
            [v is not None and not (isinstance(v, float) and np.isnan(v)) and v != "" for v in arr],
            dtype=bool,
        )

    has_om, has_fm = _present(o_meta_np), _present(f_meta_np)
    has_pm = _present(pmeta_np) & success_class
    # fast path: at most one source present per row => direct pick
    r_meta = np.where(has_fm, f_meta_np, np.where(has_om, o_meta_np, None))
    r_meta = np.where(has_pm & ~has_om & ~has_fm, pmeta_np, r_meta)
    multi = (has_om.astype(int) + has_fm.astype(int) + has_pm.astype(int)) >= 2
    for i in np.flatnonzero(multi):
        meta = _merge_meta(o_meta_np[i], f_meta_np[i])
        if has_pm[i]:
            meta = _merge_meta(meta, pmeta_np[i])
        r_meta[i] = meta

    # ---------------- state machine -----------------------------------
    # LINKED: old wins wholesale; else initializeSchedule + UNFETCHED
    linked = f_status == CS.LINKED
    lo = linked & has_old
    r_status = np.where(lo, o_status, r_status)
    r_fetch_time = np.where(lo, o_fetch_time, r_fetch_time)
    r_interval = np.where(lo, o_interval, r_interval)
    r_retries = np.where(lo, m["o_retries"].to_numpy(), r_retries)
    r_score = np.where(lo, o_score, r_score).astype(np.float32)
    r_modified = np.where(lo, o_modified, r_modified)
    r_sig = r_sig.where(~lo, o_sig)
    r_meta[lo] = o_meta_np[lo]
    ln = linked & ~has_old
    r_status = np.where(ln, CS.DB_UNFETCHED, r_status)
    r_fetch_time = np.where(ln, cur_time_ms, r_fetch_time)  # initializeSchedule: now
    r_interval = np.where(ln, cfg.interval_default, r_interval)
    r_retries = np.where(ln, 0, r_retries)
    r_score = np.where(ln, np.float32(0.0), r_score).astype(np.float32)  # OPIC initialScore

    # SUCCESS / REDIR / NOTMODIFIED classes
    if success_class.any():
        # modification state (CrawlDbReducer.java:236-252)
        old_sig_ok = has_old & o_sig.notna().to_numpy() & signature.notna().to_numpy()
        sig_equal = np.zeros(len(m), dtype=bool)
        if old_sig_ok.any():
            idx = np.flatnonzero(old_sig_ok)
            o_vals, s_vals = o_sig.to_numpy(), signature.to_numpy()
            for i in idx:
                sig_equal[i] = o_vals[i] == s_vals[i]
        mod_state = np.full(len(m), sch.STATUS_UNKNOWN, dtype=np.int64)
        is_nm_fetch = f_status == CS.FETCH_NOTMODIFIED
        mod_state = np.where(is_nm_fetch, sch.STATUS_NOTMODIFIED, mod_state)
        is_succ = f_status == CS.FETCH_SUCCESS
        mod_state = np.where(is_succ & old_sig_ok & ~sig_equal, sch.STATUS_MODIFIED, mod_state)
        mod_state = np.where(is_succ & old_sig_ok & sig_equal, sch.STATUS_NOTMODIFIED, mod_state)

        sched_kw = {}
        if getattr(schedule, "wants_mime", False):
            # MimeAdaptive: Content-Type rides the fetch datum
            sched_kw["mime"] = m["f_content_type"].to_numpy()
        res = schedule.set_fetch_schedule(
            fetch_time=f_fetch_time,
            interval=r_interval,
            modified_time=f_modified,
            state=mod_state,
            fixed_interval=r_fixed,
            **sched_kw,
        )
        r_fetch_time = np.where(success_class, res.fetch_time, r_fetch_time)
        r_interval = np.where(success_class, res.fetch_interval, r_interval)
        r_modified = np.where(success_class, res.modified_time, r_modified)
        r_retries = np.where(success_class, 0, r_retries)

        notmod = success_class & (mod_state == sch.STATUS_NOTMODIFIED)
        r_status = np.where(notmod, CS.DB_NOTMODIFIED, r_status)
        r_modified = np.where(notmod, prev_modified, r_modified)  # NUTCH-1341
        modded = success_class & ~notmod
        r_sig = r_sig.where(~modded, signature)  # result.setSignature(signature)
        r_sig = r_sig.where(~(notmod & has_old), o_sig)
        r_status = np.where(modded & is_succ, CS.DB_FETCHED, r_status)
        r_status = np.where(modded & (f_status == CS.FETCH_REDIR_PERM), CS.DB_REDIR_PERM, r_status)
        r_status = np.where(modded & (f_status == CS.FETCH_REDIR_TEMP), CS.DB_REDIR_TEMP, r_status)

        # forceRefetch when interval exceeds system max (CrawlDbReducer.java:280-281)
        force = success_class & (r_interval > cfg.interval_max)
        if force.any():
            clamp = r_interval > cfg.interval_max
            r_interval = np.where(
                force & clamp,
                np.floor(np.float32(cfg.interval_max) * np.float32(0.9) + np.float32(0.5)).astype(np.int64),
                r_interval,
            )
            r_status = np.where(force, CS.DB_UNFETCHED, r_status)
            r_retries = np.where(force, 0, r_retries)
            r_modified = np.where(force, 0, r_modified)
            r_sig = r_sig.where(~force, None)

    # RETRY (CrawlDbReducer.java:286-299)
    retry = f_status == CS.FETCH_RETRY
    if retry.any():
        r_sig = r_sig.where(~(retry & has_old), o_sig)
        new_ft, new_retries = sch.set_page_retry_schedule(f_fetch_time, f_retries)
        r_fetch_time = np.where(retry, new_ft, r_fetch_time)
        r_retries = np.where(retry, new_retries, r_retries)
        under = r_retries < cfg.retry_max
        r_status = np.where(retry & under, CS.DB_UNFETCHED, r_status)
        over = retry & ~under
        r_status = np.where(over, CS.DB_GONE, r_status)
        # NUTCH-578 (a KNOWN GAP in the reference, TODOTestCrawlDbStates):
        # once the page goes gone the counter must stop growing — clamp
        # at retry_max so a long continuous retry crawl can't overflow it
        r_retries = np.where(over, cfg.retry_max, r_retries)
        if over.any():
            g_ft, g_itv = sch.set_page_gone_schedule(f_fetch_time, r_interval, cfg.interval_max)
            # gone schedule applies on the retry-scheduled datum: reference
            # calls setPageGoneSchedule(result) after retry schedule, which
            # recomputes fetchTime from fetch.getFetchTime()
            r_fetch_time = np.where(over, g_ft, r_fetch_time)
            r_interval = np.where(over, g_itv, r_interval)

    # GONE (CrawlDbReducer.java:302-308)
    gone = f_status == CS.FETCH_GONE
    if gone.any():
        r_sig = r_sig.where(~(gone & has_old), o_sig)
        r_status = np.where(gone, CS.DB_GONE, r_status)
        g_ft, g_itv = sch.set_page_gone_schedule(f_fetch_time, r_interval, cfg.interval_max)
        r_fetch_time = np.where(gone, g_ft, r_fetch_time)
        r_interval = np.where(gone, g_itv, r_interval)

    # ScoringFilters.updateDbScore hook chain (ScoringFilter.java:93-105;
    # OPIC: score = (old if exists else result).score + Σ links;
    # scoring-withdrawn may rewrite status/metadata; scoring-orphan
    # stamps/checks the _orphan_ inlink-freshness timestamp)
    link_sum = m["link_sum"].to_numpy(dtype=np.float32)
    base = np.where(has_old, o_score, r_score).astype(np.float32)
    # LINKED-no-old keeps OPIC initialScore base of 0
    base = np.where(ln, np.float32(0.0), base).astype(np.float32)
    link_meta_min = (
        {k: (m[f"_lmin_{k}"].to_numpy(dtype=np.float64)
             if f"_lmin_{k}" in m.columns
             else np.full(len(m), np.nan))
         for k in meta_min_keys}
        if meta_min_keys
        else None
    )
    r_score, r_status, r_meta = scoring.update_db_score(
        base, link_sum, r_status, r_meta,
        link_n=m["link_n"].to_numpy(), now_s=now_s,
        link_meta_min=link_meta_min)
    r_score = r_score.astype(np.float32)

    host = m["f_host"].where(m["has_fetch"], m["l_host"])
    host = host.where(host.notna(), m["o_host"])
    part = pd.to_numeric(m["f_part"].where(m["has_fetch"], m["l_part"]), errors="coerce")
    part = part.where(part.notna(), pd.to_numeric(m["o_part"], errors="coerce")).fillna(0)
    repr_url = m["f_repr_url"].where(m["has_fetch"] & m["f_repr_url"].notna(), m["o_repr_url"])
    # typed protocol-status hot key: the fetch datum's stamp wins (the
    # reference fetcher writes _pst_ on every attempted fetch,
    # FetcherThread.java:650); rows without a new fetch keep the old
    r_pst = m["f_pst"].where(m["f_pst"].notna(), m["o_pst"])

    sig_out = r_sig.to_numpy(dtype=object)
    sig_out = np.array(
        [None if (v is None or (isinstance(v, float) and np.isnan(v))) else v for v in sig_out],
        dtype=object,
    )
    out = pd.DataFrame(
        {
            "url": m.index.to_numpy(),
            "host": host.to_numpy(),
            "part": part.to_numpy(dtype=np.int64),
            "status": r_status.astype(np.int64),
            "fetch_time": r_fetch_time.astype(np.int64),
            "retries": r_retries.astype(np.int64),
            "fetch_interval": r_interval.astype(np.int64),
            "score": r_score.astype(np.float32),
            "signature": sig_out,
            "modified_time": r_modified.astype(np.int64),
            "gen_time": 0,  # _ngt_ stripped (CrawlDbReducer.java:320)
            "repr_url": repr_url.to_numpy(),
            "fixed_interval": r_fixed,
            "metadata": r_meta,
            "pst": r_pst.to_numpy(),
        }
    )
    orphans = _orphan_rows(m_orphan, scoring, now_s)
    if len(orphans):
        out = pd.concat([out, orphans], ignore_index=True)
    return out.reset_index(drop=True)


def _orphan_rows(m_orphan: pd.DataFrame, scoring=None, now_s: int | None = None) -> pd.DataFrame:
    """No new data: record old unchanged (CrawlDbReducer.java:150-166),
    after the scfilters.orphanedScore hook (:157-161) — scoring-orphan
    may flip long-unlinked rows to DB_GONE / DB_ORPHAN."""
    if len(m_orphan) == 0:
        return empty_datums()[_frontier_cols()]
    status = m_orphan["o_status"].to_numpy(dtype=np.int64)
    metadata = m_orphan["o_metadata"].to_numpy()
    if scoring is not None and now_s is not None:
        status, metadata = scoring.orphaned_score(status, metadata, now_s)
        status = np.asarray(status, dtype=np.int64)
    return pd.DataFrame(
        {
            "url": m_orphan.index.to_numpy(),
            "host": m_orphan["o_host"].to_numpy(),
            "part": pd.to_numeric(m_orphan["o_part"], errors="coerce").fillna(0).to_numpy(dtype=np.int64),
            "status": status,
            "fetch_time": m_orphan["o_fetch_time"].to_numpy(dtype=np.int64),
            "retries": m_orphan["o_retries"].to_numpy(dtype=np.int64),
            "fetch_interval": m_orphan["o_fetch_interval"].to_numpy(dtype=np.int64),
            "score": m_orphan["o_score"].to_numpy(dtype=np.float32),
            "signature": m_orphan["o_signature"].to_numpy(),
            "modified_time": m_orphan["o_modified_time"].to_numpy(dtype=np.int64),
            "gen_time": m_orphan["o_gen_time"].to_numpy(dtype=np.int64),
            "repr_url": m_orphan["o_repr_url"].to_numpy(),
            "fixed_interval": m_orphan["o_fixed_interval"].to_numpy(dtype=np.int64),
            "metadata": metadata,
            "pst": m_orphan["o_pst"].to_numpy(),
        }
    )


def _frontier_cols() -> list[str]:
    return _DATUM_COLS
