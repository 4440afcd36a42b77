"""Fetch stage conformance: politeness spacing (TestFetcher.java:116-119
analogue), robots denial/crawl-delay (FetcherThread.java:317-353),
status mapping, redirects, exception thresholds — against the
deterministic fake protocol."""

import time

import numpy as np
import pandas as pd
import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.sources.fake_protocol import FakeProtocol, FakeResponse, FakeRobots
from coherencebot_ray.stages.fetch import FetchPartition

CUR = 1_700_000_000_000


class ScriptedProtocol:
    """Protocol double with explicit per-URL scripts (FIXTURES §F4)."""

    def __init__(self, responses: dict, robots: dict | None = None):
        self.responses = responses
        self._robots = robots or {}

    def robots(self, host):
        return self._robots.get(host, FakeRobots(disallow=(), crawl_delay=None))

    def robots_allows(self, rb, url):
        path = url.split("://", 1)[-1]
        path = path[path.find("/"):] if "/" in path else "/"
        return not any(path.startswith(d) for d in rb.disallow)

    def fetch(self, url):
        return self.responses.get(url, FakeResponse("notfound", b"", "text/html"))


def fl_row(url, host=None, part=0, score=1.0, **kw):
    host = host or url.split("/")[2]
    base = dict(
        url=url, host=host, domain=host, part=part, status=CS.DB_UNFETCHED,
        fetch_time=CUR - 1000, retries=0, fetch_interval=86400, score=score,
        signature=None, modified_time=0, gen_time=CUR, repr_url=None,
        fixed_interval=0, metadata=None, segnum=1, sort_score=score,
        fetch_delay_ms=0,
    )
    base.update(kw)
    return base


def run_fetch(rows, cfg=None, protocol=None):
    cfg = cfg or CrawlConfig()
    fp = FetchPartition(cfg, CUR, protocol)
    return fp(pd.DataFrame(rows))


def test_status_mapping():
    proto = ScriptedProtocol(
        {
            "http://a.com/ok": FakeResponse("success", b"<html><title>t</title></html>", "text/html"),
            "http://a.com/404": FakeResponse("notfound", b"", "text/html"),
            "http://a.com/gone": FakeResponse("gone", b"", "text/html"),
            "http://a.com/mv": FakeResponse("moved", b"", "text/html", "http://a.com/new"),
            "http://a.com/tmp": FakeResponse("temp_moved", b"", "text/html", "http://a.com/t2"),
            "http://a.com/err": FakeResponse("exception", b"", "text/html"),
        }
    )
    urls = list(proto.responses)
    out = run_fetch([fl_row(u) for u in urls], protocol=proto)
    fetched = out[out["status"] != CS.LINKED].set_index("url")
    assert fetched.loc["http://a.com/ok", "status"] == CS.FETCH_SUCCESS
    assert fetched.loc["http://a.com/404", "status"] == CS.FETCH_GONE
    assert fetched.loc["http://a.com/gone", "status"] == CS.FETCH_GONE
    assert fetched.loc["http://a.com/mv", "status"] == CS.FETCH_REDIR_PERM
    assert fetched.loc["http://a.com/tmp", "status"] == CS.FETCH_REDIR_TEMP
    assert fetched.loc["http://a.com/err", "status"] == CS.FETCH_RETRY
    # permanent redirect records repr_url (chooseRepr analogue)
    assert fetched.loc["http://a.com/mv", "repr_url"] == "http://a.com/new"
    # redirect targets emitted as LINKED discoveries
    linked = out[out["status"] == CS.LINKED]
    assert set(linked["url"]) == {"http://a.com/new", "http://a.com/t2"}


def test_politeness_virtual_clock():
    """k-th URL of a host starts at cur + k*delay (FetchItemQueue.java:119-137)."""
    rows = [fl_row(f"http://one.com/{i}") for i in range(4)]
    cfg = CrawlConfig(server_delay_s=5.0)
    proto = ScriptedProtocol(
        {f"http://one.com/{i}": FakeResponse("success", b"<html/>", "text/html") for i in range(4)}
    )
    out = run_fetch(rows, cfg, proto)
    times = np.sort(out[out["status"] != CS.LINKED]["fetch_time"].to_numpy())
    assert list(np.diff(times)) == [5000, 5000, 5000]


def test_politeness_wall_clock():
    """TestFetcher politeness oracle: elapsed > (n_urls-1) * delay."""
    n, delay = 4, 0.05
    rows = [fl_row(f"http://one.com/{i}") for i in range(n)]
    cfg = CrawlConfig(server_delay_s=delay, real_sleep=True)
    proto = ScriptedProtocol(
        {f"http://one.com/{i}": FakeResponse("success", b"<html/>", "text/html") for i in range(n)}
    )
    t0 = time.monotonic()
    run_fetch(rows, cfg, proto)
    assert time.monotonic() - t0 > (n - 1) * delay


def test_robots_denial_and_crawl_delay():
    proto = ScriptedProtocol(
        {
            "http://r.com/private/x": FakeResponse("success", b"<html/>", "text/html"),
            "http://r.com/pub": FakeResponse("success", b"<html/>", "text/html"),
            "http://slow.com/a": FakeResponse("success", b"<html/>", "text/html"),
            "http://slow.com/b": FakeResponse("success", b"<html/>", "text/html"),
            "http://ok2.com/a": FakeResponse("success", b"<html/>", "text/html"),
            "http://ok2.com/b": FakeResponse("success", b"<html/>", "text/html"),
        },
        robots={
            "r.com": FakeRobots(disallow=("/private/",), crawl_delay=None),
            "slow.com": FakeRobots(disallow=(), crawl_delay=120.0),  # > max 30
            "ok2.com": FakeRobots(disallow=(), crawl_delay=2.0),
        },
    )
    rows = [fl_row(u) for u in proto.responses]
    out = run_fetch(rows, protocol=proto).set_index("url")
    # robots-denied path -> GONE (FetcherThread.java:317-326)
    assert out.loc["http://r.com/private/x", "status"] == CS.FETCH_GONE
    assert out.loc["http://r.com/pub", "status"] == CS.FETCH_SUCCESS
    # crawl delay > fetcher.max.crawl.delay -> whole host skipped as GONE
    assert out.loc["http://slow.com/a", "status"] == CS.FETCH_GONE
    assert out.loc["http://slow.com/b", "status"] == CS.FETCH_GONE
    # adopted crawl delay spaces fetches by 2s
    t = sorted([out.loc["http://ok2.com/a", "fetch_time"], out.loc["http://ok2.com/b", "fetch_time"]])
    assert t[1] - t[0] == 2000


def test_redirect_follow_inline():
    proto = ScriptedProtocol(
        {
            "http://f.com/start": FakeResponse("moved", b"", "text/html", "http://f.com/mid"),
            "http://f.com/mid": FakeResponse("moved", b"", "text/html", "http://f.com/end"),
            "http://f.com/end": FakeResponse("success", b"<html><title>end</title></html>", "text/html"),
        }
    )
    cfg = CrawlConfig(max_redirects=3)
    out = run_fetch([fl_row("http://f.com/start")], cfg, proto)
    row = out[out["url"] == "http://f.com/start"].iloc[0]
    assert row["status"] == CS.FETCH_SUCCESS
    assert "f.com/end" in row["metadata"]


def test_exception_threshold_purges_host():
    """fetcher.max.exceptions.per.queue (FetchItemQueues.java:241-264)."""
    proto = ScriptedProtocol(
        {f"http://e.com/{i}": FakeResponse("exception", b"", "text/html") for i in range(5)}
    )
    cfg = CrawlConfig(max_exceptions_per_queue=2)
    out = run_fetch([fl_row(f"http://e.com/{i}") for i in range(5)], cfg, proto)
    sts = out["status"].value_counts().to_dict()
    assert sts[CS.FETCH_RETRY] == 3  # threshold exceeded after the 3rd
    assert sts[CS.FETCH_GONE] == 2  # remaining queue purged


def test_content_limit_truncation():
    proto = ScriptedProtocol(
        {"http://big.com/x": FakeResponse("success", b"A" * 100, "text/html")}
    )
    cfg = CrawlConfig(content_limit=10)
    out = run_fetch([fl_row("http://big.com/x")], cfg, proto)
    assert len(out.iloc[0]["content"]) == 10


def test_fake_protocol_determinism():
    p = FakeProtocol()
    urls = [f"http://host{i}.example/page/{i}" for i in range(200)]
    a = [p.fetch(u).status for u in urls]
    b = [p.fetch(u).status for u in urls]
    assert a == b
    assert "success" in a and ("moved" in a or "temp_moved" in a)


def test_redirect_discovery_partitioned_by_target_host():
    """A cross-host redirect target's LINKED discovery row must carry the
    TARGET host's hash partition (host<->partition politeness invariant),
    not the source row's partition."""
    from coherencebot_ray.functions.urlutil import partition_for_hosts

    proto = ScriptedProtocol(
        {
            "http://src.com/mv": FakeResponse(
                "moved", b"", "text/html", "http://other-host.org/landing"
            ),
        }
    )
    cfg = CrawlConfig()
    src_part = int(
        partition_for_hosts(
            np.array(["src.com"], dtype=object),
            cfg.num_partitions, cfg.partition_seed, cfg.partition_mode,
        )[0]
    )
    tgt_part = int(
        partition_for_hosts(
            np.array(["other-host.org"], dtype=object),
            cfg.num_partitions, cfg.partition_seed, cfg.partition_mode,
        )[0]
    )
    assert src_part != tgt_part, "fixture hosts must hash apart"
    out = run_fetch([fl_row("http://src.com/mv", part=src_part)], cfg, proto)
    linked = out[out["status"] == CS.LINKED]
    assert list(linked["url"]) == ["http://other-host.org/landing"]
    assert list(linked["host"]) == ["other-host.org"]
    assert list(linked["part"]) == [tgt_part]


def test_file_protocol(tmp_path):
    """protocol-file analogue: local files through the fetch stage,
    directory listings as link pages, jail enforcement."""
    from coherencebot_ray.sources.file_protocol import FileProtocol

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "page.html").write_text("<html><title>P</title></html>")
    (d / "doc.txt").write_text("hello")
    proto = FileProtocol(root=str(tmp_path))

    r = proto.fetch(f"file://{d}/page.html")
    assert r.status == "success" and r.content_type == "text/html"
    r2 = proto.fetch(f"file://{d}")
    assert r2.status == "success" and b"page.html" in r2.content
    assert proto.fetch(f"file://{d}/missing.html").status == "notfound"
    assert proto.fetch("file:///etc/passwd").status == "gone"  # outside jail

    # symlink inside the jail pointing outside must NOT escape: the
    # containment check resolves realpath on both sides
    import os

    os.symlink("/etc", str(d / "leak"))
    assert proto.fetch(f"file://{d}/leak/passwd").status == "gone"
    assert proto.fetch(f"file://{d}/leak").status == "gone"

    # through FetchPartition
    cfg = CrawlConfig(server_delay_s=0.0)
    out = run_fetch(
        [fl_row(f"file://{d}/doc.txt", host="localfile")], cfg, proto
    ).set_index("url")
    assert out.iloc[0]["status"] == CS.FETCH_SUCCESS


def test_truncation_marked_in_metadata():
    """NUTCH-2729/2575 analogue: a content_limit cut AND a declared
    Content-Length larger than the body both mark the datum truncated
    (metadata _tr_=length) for parser.skip.truncated."""
    import json

    proto = ScriptedProtocol(
        {
            "http://big.com/x": FakeResponse("success", b"A" * 100, "text/html"),
            "http://short.com/x": FakeResponse(
                "success", b"A" * 50, "text/html", content_length=64000),
            "http://ok.com/x": FakeResponse(
                "success", b"A" * 50, "text/html", content_length=50),
        }
    )
    cfg = CrawlConfig(content_limit=80)
    out = run_fetch(
        [fl_row("http://big.com/x"), fl_row("http://short.com/x"),
         fl_row("http://ok.com/x")], cfg, proto
    ).set_index("url")
    assert len(out.loc["http://big.com/x", "content"]) == 80
    assert json.loads(out.loc["http://big.com/x", "metadata"])["_tr_"] == "length"
    assert json.loads(out.loc["http://short.com/x", "metadata"])["_tr_"] == "length"
    md_ok = out.loc["http://ok.com/x", "metadata"]
    assert md_ok is None or "_tr_" not in json.loads(md_ok)


def test_truncation_not_sticky_across_fetches():
    """A frontier row carrying a stale '_tr_' from a previous truncated
    fetch must NOT keep the mark when the re-fetch is complete: the
    reference stores TRUNCATED in per-segment Content metadata, rebuilt
    each fetch (ParseSegment.isTruncated reads the segment, not the
    CrawlDb), so truncation state is recomputed per fetch."""
    import json

    proto = ScriptedProtocol(
        {"http://t.com/x": FakeResponse(
            "success", b"A" * 50, "text/html", content_length=50)}
    )
    row = fl_row(
        "http://t.com/x",
        metadata=json.dumps({"_tr_": "length", "keep": "me"}),
    )
    out = run_fetch([row], CrawlConfig(content_limit=80), proto).set_index("url")
    md = json.loads(out.loc["http://t.com/x", "metadata"])
    assert "_tr_" not in md  # recomputed: this fetch is complete
    assert md["keep"] == "me"  # non-protocol metadata still carried


def test_persistent_robots_cache_recomputes_delay_per_call():
    """A persistent robots cache (round-worker actors reuse one dict
    across rounds) must NOT freeze politeness bookkeeping: the hostdb
    fetch_delay_ms override and crawl-delay adoption are per-call
    (per-round hostdb state), so a cache HIT still recomputes the
    host's delay from this call's row."""

    class CountingProtocol(FakeProtocol):
        def __init__(self):
            super().__init__()
            self.robots_calls = 0

        def robots(self, host):
            self.robots_calls += 1
            return FakeRobots(disallow=(), crawl_delay=None)

    proto = CountingProtocol()
    cache: dict = {}
    cfg = CrawlConfig(server_delay_s=0.0)
    rows = [fl_row(f"http://h.com/{i}", host="h.com") for i in range(3)]

    fp1 = FetchPartition(cfg, CUR, proto, robots_cache=cache)
    out1 = fp1(pd.DataFrame(rows))
    assert proto.robots_calls == 1 and len(cache) == 1
    # no delay: all three virtual fetch times equal CUR
    assert (out1[out1["fetch_order"] >= 0]["fetch_time"] == CUR).all()

    # "next round": same cache (robots not re-fetched), but a hostdb
    # override now sets a 2s delay — the clocks must space out
    rows2 = [fl_row(f"http://h.com/{i}", host="h.com", fetch_delay_ms=2000)
             for i in range(3)]
    fp2 = FetchPartition(cfg, CUR, proto, robots_cache=cache)
    out2 = fp2(pd.DataFrame(rows2))
    assert proto.robots_calls == 1  # cache hit across instances
    fetched = out2[out2["fetch_order"] >= 0].sort_values("fetch_order")
    assert list(fetched["fetch_time"]) == [CUR, CUR + 2000, CUR + 4000]


def test_parser_skip_truncated():
    """ParseSegment.java:113 — truncated docs don't parse by default;
    parser_skip_truncated=False restores the old behavior."""
    import json

    from coherencebot_ray.stages.parse import ParseBatch

    row = dict(
        url="http://t.com/x", host="t.com", part=0, status=CS.FETCH_SUCCESS,
        fetch_time=CUR, retries=0, fetch_interval=86400, score=1.0,
        signature=None, modified_time=0, gen_time=0, repr_url=None,
        fixed_interval=0, metadata=json.dumps({"_tr_": "length"}),
        content=b"<html><title>T</title><body>x</body></html>",
        content_type="text/html", fetch_order=0,
    )
    out = ParseBatch(CrawlConfig())(pd.DataFrame([row]))
    assert len(out) == 0
    out2 = ParseBatch(CrawlConfig(parser_skip_truncated=False))(pd.DataFrame([row]))
    assert (out2["rtype"] == "doc").sum() == 1


def test_file_protocol_content_type_and_decode(tmp_path):
    """TestProtocolFile port (NUTCH-384): plain-text files with plain,
    parenthesized, and percent-encoded names all fetch successfully
    with content type text/plain; the percent-encoded url resolves to
    the decoded filename (FileResponse.java:123-134)."""
    from coherencebot_ray.sources.file_protocol import FileProtocol

    for name in ("testprotocolfile.txt", "testprotocolfile_(encoded).txt"):
        (tmp_path / name).write_text("hello")
    proto = FileProtocol(root=str(tmp_path))
    for name in ("testprotocolfile.txt",
                 "testprotocolfile_(encoded).txt",
                 "testprotocolfile_%28encoded%29.txt"):
        r = proto.fetch(f"file:{tmp_path}/{name}")
        assert r.status == "success", name
        assert r.content == b"hello"
        assert r.content_type == "text/plain", name
