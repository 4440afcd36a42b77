"""Fetch stage: politeness-correct fetching over host-partitioned fetchlists.

Reference: fetcher/Fetcher.java:95-627, FetcherThread.java:75-907,
FetchItemQueue(s).java. Ray-Data-first restatement:

  fetchlist.groupby("part").map_groups(FetchPartition, batch_format="pandas")

The generate shuffle guarantees ALL URLs of a host land in one partition
(URLPartitioner semantics), so per-host politeness state (next-allowed
fetch time, robots cache, exception counters, redirect-dedup cache) is
partition-local — held in the callable's per-call state, no cross-actor
coordination. ``FetchPartition`` is a callable class: constructing the
protocol client/robots parser happens once per worker, not per batch.

Politeness model: a virtual per-host clock — the k-th URL fetched from
host h starts at ``cur_time + k * delay(h)`` (FetchItemQueue.java:119-137
nextFetchTime semantics). ``real_sleep=True`` additionally enforces the
spacing in wall-clock (TestFetcher politeness oracle); bench runs keep it
virtual so throughput measures compute, not sleeps.

Semantics ported:
- robots denial -> FETCH_GONE (FetcherThread.java:317-326)
- robots Crawl-Delay adopted; > fetcher.max.crawl.delay -> host skipped
  with FETCH_GONE (FetcherThread.java:327-353)
- redirects: recorded (http.redirect.max=0 default) with the target
  emitted as a LINKED discovery row, or followed inline up to the max
  with a dedup cache (FetcherThread.java:512-629, FetchItemQueues.java:272-280)
- per-host exception threshold purges the host's remaining queue
  (FetchItemQueues.java:241-264)
- timelimit empties remaining queues (FetchItemQueues.java:199-213)
"""

from __future__ import annotations

import json
import time

import numpy as np
import pandas as pd

from ..config import CrawlConfig
from ..functions.urlutil import get_host, partition_for_hosts
from ..model import CrawlStatus as CS
from ..sources.fake_protocol import FakeProtocol

_STATUS_MAP = {
    "success": CS.FETCH_SUCCESS,
    "notfound": CS.FETCH_GONE,
    "gone": CS.FETCH_GONE,
    "moved": CS.FETCH_REDIR_PERM,
    "temp_moved": CS.FETCH_REDIR_TEMP,
    "exception": CS.FETCH_RETRY,
}


class FetchPartition:
    """Callable for ``groupby("part").map_groups`` — fetches one partition."""

    def __init__(self, cfg: CrawlConfig, cur_time_ms: int, protocol=None, publisher=None,
                 robots_cache: dict | None = None):
        self.cfg = cfg
        self.cur_time_ms = cur_time_ms
        self.protocol = protocol if protocol is not None else FakeProtocol()
        # NutchPublisher hook (publisher/NutchPublisher.java via
        # FetcherThreadPublisher): START/REPORTING/END events per
        # partition, buffered and flushed once at partition end
        self.publisher = publisher
        # robots rules cache, optionally OWNED BY THE CALLER so it
        # survives this instance: the reference's RobotRulesParser.CACHE
        # is a static per-JVM Hashtable alive for the whole crawl
        # (protocol/RobotRulesParser.java:63), not per segment — a
        # persistent round worker passes its own dict here so robots
        # fetched in round k are re-used in round k+1. Delay/dead
        # bookkeeping stays per-call (it depends on this round's hostdb
        # overrides), only the fetched rules persist.
        self.robots_cache = robots_cache

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        proto = self.protocol
        if len(g) == 0:
            return _empty_out(g)
        # deterministic processing order regardless of upstream block order
        if "segnum" in g.columns:
            g = g[g["segnum"] == 1] if (g["segnum"] == 1).any() else g
        g = g.reset_index(drop=True)

        scheme_robots = hasattr(proto, "robots_for")
        robots_cache: dict[str, object] = (
            self.robots_cache if self.robots_cache is not None else {}
        )
        seen_rkeys: set[str] = set()  # per-call: delay/dead recomputed each call
        host_delay_ms: dict[str, float] = {}
        host_count: dict[str, int] = {}
        host_dead: dict[str, str] = {}  # host -> reason (delay_too_long | exceptions)
        host_exceptions: dict[str, int] = {}
        redirect_seen: set[str] = set()

        rows: list[dict] = []
        start_wall = time.monotonic()
        timelimit_s = cfg.timelimit_mins * 60 if cfg.timelimit_mins > 0 else None

        urls = g["url"].to_numpy()
        hosts = g["host"].to_numpy()
        fds = g["fetch_delay_ms"].to_numpy() if "fetch_delay_ms" in g.columns else np.zeros(len(g))

        for i in range(len(g)):
            url, host = urls[i], hosts[i]
            row = g.iloc[i]
            if timelimit_s is not None and (time.monotonic() - start_wall) > timelimit_s:
                break  # timelimit: drop remaining (Fetcher.java:295-325)
            if host in host_dead:
                rows.append(_datum(row, CS.FETCH_GONE, self.cur_time_ms, None, None, {"_skip_": host_dead[host]}))
                continue

            # robots (cached per host; RobotRulesParser.CACHE analogue —
            # the reference keys by protocol:host:port, so scheme-aware
            # protocols get a scheme-qualified key + url-aware lookup)
            if scheme_robots:
                rkey = url[: url.find("://")] + ":" + host if "://" in url else host
            else:
                rkey = host
            rb = robots_cache.get(rkey)
            if rb is None:
                rb = proto.robots_for(host, url) if scheme_robots else proto.robots(host)
                robots_cache[rkey] = rb
            if rkey not in seen_rkeys:
                seen_rkeys.add(rkey)
                delay_ms = cfg.server_delay_s * 1000.0
                if rb.crawl_delay is not None:
                    if rb.crawl_delay > cfg.max_crawl_delay_s:
                        host_dead[host] = "crawl_delay_too_long"
                    else:
                        delay_ms = max(rb.crawl_delay, cfg.min_crawl_delay_s) * 1000.0
                if fds[i] > 0:  # hostdb variable fetch delay override
                    delay_ms = float(fds[i])
                host_delay_ms[host] = delay_ms
            if host in host_dead:
                rows.append(_datum(row, CS.FETCH_GONE, self.cur_time_ms, None, None, {"_skip_": host_dead[host]}))
                continue
            if not proto.robots_allows(rb, url):
                rows.append(_datum(row, CS.FETCH_GONE, self.cur_time_ms, None, None,
                                   {"_robots_denied_": "1"}, pst="robots_denied"))
                continue

            # politeness clock
            k = host_count.get(host, 0)
            host_count[host] = k + 1
            fetch_at = self.cur_time_ms + int(k * host_delay_ms[host])
            if cfg.real_sleep and k > 0:
                time.sleep(host_delay_ms[host] / 1000.0)

            resp, final_url, chain = self._fetch_following(url, proto, redirect_seen)
            status = _STATUS_MAP[resp.status]
            if status == CS.FETCH_RETRY:
                host_exceptions[host] = host_exceptions.get(host, 0) + 1
                if (
                    cfg.max_exceptions_per_queue >= 0
                    and host_exceptions[host] > cfg.max_exceptions_per_queue
                ):
                    host_dead[host] = "too_many_exceptions"

            content = resp.content if (cfg.store_content and resp.content) else None
            meta = {}
            if content is not None:
                if len(content) > cfg.content_limit:
                    # http.content.limit cut: mark like the reference's
                    # Response.TRUNCATED_CONTENT(_REASON) (NUTCH-2729)
                    content = content[: cfg.content_limit]
                    meta["_tr_"] = "length"
                elif getattr(resp, "content_length", -1) > len(content):
                    # declared Content-Length exceeds the received bytes
                    # (ParseSegment.isTruncated semantics, :176-209)
                    meta["_tr_"] = "length"
            repr_url = None
            if resp.redirect_to:
                meta["_redirect_to_"] = resp.redirect_to
                if status == CS.FETCH_REDIR_PERM:
                    repr_url = resp.redirect_to  # chooseRepr: perm redirect wins
                # emit discovery row for the target (updatedb will add it).
                # The row is partitioned by the TARGET host's hash (same as
                # parse-stage outlink LINKED rows) so a cross-host redirect
                # target lands in its own frontier partition and the
                # host<->partition politeness invariant holds.
                tgt_host = get_host(resp.redirect_to)
                tgt_part = int(
                    partition_for_hosts(
                        np.array([tgt_host], dtype=object),
                        cfg.num_partitions,
                        cfg.partition_seed,
                        cfg.partition_mode,
                    )[0]
                )
                rows.append(
                    {
                        "url": resp.redirect_to,
                        "host": tgt_host,
                        "part": tgt_part,
                        "status": CS.LINKED,
                        "fetch_time": fetch_at,
                        "retries": 0,
                        "fetch_interval": int(self.cfg.interval_default),
                        "score": np.float32(0.0),
                        "signature": None,
                        "modified_time": 0,
                        "gen_time": 0,
                        "repr_url": None,
                        "fixed_interval": 0,
                        "metadata": None,
                        "content": None,
                        "content_type": None,
                        "fetch_order": -1,
                        "pst": None,
                        "truncated": None,
                    }
                )
            if final_url != url:
                meta["_final_url_"] = final_url
            rows.append(
                _datum(
                    row,
                    status,
                    fetch_at,
                    content,
                    resp.content_type if status == CS.FETCH_SUCCESS else None,
                    meta or None,
                    repr_url=repr_url,
                    fetch_order=i,
                    modified_time_ms=int(getattr(resp, "modified_time_ms", 0) or 0),
                    pst=resp.status,
                    truncated=meta.get("_tr_"),
                )
            )

        out = pd.DataFrame(rows)
        if self.publisher is not None and len(out):
            self._publish(out)
        return out if len(out) else _empty_out(g)

    def _publish(self, out: pd.DataFrame) -> None:
        from ..functions import publisher as pub

        part = int(out["part"].iloc[0])
        events = [pub.event(pub.START, None, self.cur_time_ms, part=part)]
        fetched = out[out["fetch_order"] >= 0]
        for url, status, ft, ct in zip(
            fetched["url"], fetched["status"], fetched["fetch_time"], fetched["content_type"]
        ):
            events.append(
                pub.event(pub.REPORTING, url, ft, part=part, status=int(status), contentType=ct)
            )
        events.append(
            pub.event(pub.END, None, self.cur_time_ms, part=part, fetched=int(len(fetched)))
        )
        try:
            self.publisher.publish_many(events)
        except Exception:
            pass  # publisher failure must not fail the fetch (reference logs+continues)

    def _fetch_following(self, url: str, proto, redirect_seen: set):
        """Follow redirects inline up to http.redirect.max (0 = don't)."""
        resp = proto.fetch(url)
        final_url = url
        chain = 0
        while (
            resp.redirect_to
            and chain < self.cfg.max_redirects
            and resp.redirect_to not in redirect_seen
        ):
            redirect_seen.add(resp.redirect_to)
            final_url = resp.redirect_to
            resp = proto.fetch(final_url)
            chain += 1
        return resp, final_url, chain


# per-fetch protocol keys this stage writes: recomputed every fetch, so
# a stale copy carried in the frontier row (updatedb unions metadata and
# never deletes) must NOT leak into the new fetch datum. The reference
# keeps TRUNCATED in per-segment Content metadata, rebuilt each fetch
# (ParseSegment.isTruncated reads the segment, not the CrawlDb).
_PER_FETCH_KEYS = ("_tr_", "_redirect_to_", "_final_url_", "_skip_", "_robots_denied_")


def _datum(row, status, fetch_time, content, content_type, meta: dict | None, repr_url=None, fetch_order=-1,
           modified_time_ms: int = 0, pst: str | None = None, truncated: str | None = None):
    # the fetch datum starts as the crawl datum — carried frontier
    # metadata rides through (Fetcher copies CrawlDatum metaData; the
    # scoring chain's passScoreBeforeParsing reads it), protocol keys
    # (_pst_ etc.) overlay
    base = row.get("metadata")
    md = json.loads(base) if isinstance(base, str) and base else {}
    for k in _PER_FETCH_KEYS:
        md.pop(k, None)
    if meta:
        md.update(meta)
    return {
        "url": row["url"],
        "host": row["host"],
        "part": int(row["part"]),
        "status": int(status),
        "fetch_time": int(fetch_time),
        "retries": int(row["retries"]),
        "fetch_interval": int(row["fetch_interval"]),
        "score": np.float32(row["score"]),
        "signature": row.get("signature"),
        # protocol Last-Modified wins over the carried frontier value
        "modified_time": int(modified_time_ms) or int(row.get("modified_time", 0)),
        "gen_time": int(row.get("gen_time", 0)),
        "repr_url": repr_url,
        "fixed_interval": int(row.get("fixed_interval", 0)),
        "metadata": json.dumps(md, sort_keys=True) if md else None,
        "content": content,
        "content_type": content_type,
        "fetch_order": int(fetch_order),
        # hot keys as typed columns (SURVEY §1.3): protocol status on
        # every attempted fetch (FetcherThread.java:650); truncation
        # mark mirrors metadata _tr_ so the parse scan reads a column
        "pst": pst,
        "truncated": truncated,
    }


_OUT_COLS = [
    "url", "host", "part", "status", "fetch_time", "retries", "fetch_interval",
    "score", "signature", "modified_time", "gen_time", "repr_url",
    "fixed_interval", "metadata", "content", "content_type", "fetch_order",
    "pst", "truncated",
]


def _empty_out(g: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype="object") for c in _OUT_COLS})


def fetch(fetchlist_ds, cfg: CrawlConfig, cur_time_ms: int, protocol=None, concurrency=None, publisher=None):
    """Ray Data fetch pipeline: fetchlist Dataset -> fetch_out Dataset.

    ``concurrency`` sizes the actor pool; per-partition groups are the
    politeness unit, so any pool size is correct.
    """
    fp = FetchPartition(cfg, cur_time_ms, protocol, publisher=publisher)

    def fetch_partition(g):
        return fp(g)

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return fetchlist_ds.groupby("part").map_groups(fetch_partition, batch_format="pandas", **kwargs)
