"""HttpProtocol unit tests with a stubbed session (no network in this
environment). Status mapping per FetcherThread.java:377-458; robots
parsing per lib-http/HttpRobotRulesParser.java + robots.txt spec."""

import pandas as pd
import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.sources.http_protocol import HttpProtocol, parse_robots_txt
from coherencebot_ray.stages.fetch import FetchPartition

CUR = 1_700_000_000_000


class _Resp:
    def __init__(self, status_code=200, content=b"", headers=None, text=""):
        self.status_code = status_code
        self.content = content
        self.headers = headers or {}
        self.text = text


class _Session:
    def __init__(self, routes):
        self.routes = routes
        self.headers = {}

    def get(self, url, **kw):
        v = self.routes.get(url)
        if v is None:
            return _Resp(404)
        if isinstance(v, Exception):
            raise v
        return v


def test_status_mapping():
    s = _Session(
        {
            "http://a.com/ok": _Resp(200, b"<html/>", {"Content-Type": "text/html; charset=utf-8"}),
            "http://a.com/404": _Resp(404),
            "http://a.com/410": _Resp(410),
            "http://a.com/mv": _Resp(301, headers={"Location": "http://a.com/new"}),
            "http://a.com/tmp": _Resp(307, headers={"Location": "/rel"}),
            "http://a.com/boom": _Resp(500),
            "http://a.com/err": ConnectionError("refused"),
        }
    )
    p = HttpProtocol(session=s)
    assert p.fetch("http://a.com/ok").status == "success"
    assert p.fetch("http://a.com/ok").content_type == "text/html"
    assert p.fetch("http://a.com/404").status == "notfound"
    assert p.fetch("http://a.com/410").status == "gone"
    mv = p.fetch("http://a.com/mv")
    assert mv.status == "moved" and mv.redirect_to == "http://a.com/new"
    tmp = p.fetch("http://a.com/tmp")
    # relative Location resolved against the url's host
    assert tmp.status == "temp_moved" and tmp.redirect_to == "http://a.com/rel"
    assert p.fetch("http://a.com/boom").status == "exception"
    assert p.fetch("http://a.com/err").status == "exception"


ROBOTS_STRING = (
    "User-Agent: Agent1 #foo\r"
    "Disallow: /a\r"
    "Disallow: /b/a\r"
    "#Disallow: /c\r"
    "Crawl-delay: 10\r"
    "\r\r"
    "User-Agent: Agent2\r"
    "Disallow: /a/bloh\r"
    "Disallow: /c\r"
    "Disallow: /foo\r"
    "Crawl-delay: 20\r"
    "\r"
    "User-Agent: *\r"
    "Disallow: /foo/bar/\r"
)

ROBOTS_TEST_PATHS = [
    "http://example.com/a", "http://example.com/a/bloh/foo.html",
    "http://example.com/b", "http://example.com/c",
    "http://example.com/b/a/index.html", "http://example.com/foo/bar/baz.html",
]
ROBOTS_RESULTS = [False, False, True, True, False, True]


def test_robot_rules_agent():
    """TestRobotRulesParser.testRobotsAgent port: per-agent group
    selection (incl. the multi-agent product name matching the first
    declared group) and path allow/deny."""
    p = HttpProtocol(session=_Session({}))
    for agent in ("Agent1", "Agent2, Agent1"):
        rb = parse_robots_txt(ROBOTS_STRING, agent)
        for path, expected in zip(ROBOTS_TEST_PATHS, ROBOTS_RESULTS):
            assert p.robots_allows(rb, path) == expected, (agent, path)


def test_robot_rules_crawl_delay():
    """TestRobotRulesParser.testCrawlDelay port: 10s for Agent1;
    unset (None, the reference's Long.MIN_VALUE) for unknown agents
    falling through to the * group."""
    assert parse_robots_txt(ROBOTS_STRING, "Agent1").crawl_delay == 10
    assert parse_robots_txt(ROBOTS_STRING, "AgentABC").crawl_delay is None


def test_gzip_content_and_last_modified():
    """Content-Encoding: gzip bodies the transport left undecoded are
    best-effort unzipped (HttpBase.processGzipEncoded analogue); the
    Last-Modified header becomes modified_time_ms via HttpDateFormat."""
    from coherencebot_ray.functions.webutil import gzip_zip

    body = b"<html><body>compressed page</body></html>"
    s = _Session({
        "http://a.com/gz": _Resp(200, gzip_zip(body), {
            "Content-Type": "text/html",
            "Content-Encoding": "gzip",
            "Last-Modified": "Sun, 06 Nov 1994 08:49:37 GMT",
        }),
        "http://a.com/badgz": _Resp(200, b"plain, mislabelled", {
            "Content-Type": "text/html",
            "Content-Encoding": "gzip",
            "Last-Modified": "never ever",
        }),
    })
    p = HttpProtocol(session=s)
    r = p.fetch("http://a.com/gz")
    assert r.status == "success" and r.content == body
    assert r.modified_time_ms == 784111777000
    # no gzip magic -> body passed through; bad date -> 0
    r2 = p.fetch("http://a.com/badgz")
    assert r2.content == b"plain, mislabelled" and r2.modified_time_ms == 0


def test_robots_parsing_and_errors():
    txt = """
# comment
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Crawl-delay: 2
Sitemap: http://a.com/sitemap.xml
"""
    rb = parse_robots_txt(txt, "coherencebot-ray/0.2")
    assert rb.disallow == ("/private/",)
    assert rb.crawl_delay == 2.0
    assert rb.sitemaps == ("http://a.com/sitemap.xml",)
    # specific agent group beats *
    rb2 = parse_robots_txt(txt, "googlebot/2.1")
    assert rb2.disallow == ("/google-only/",)

    s = _Session({"http://a.com/robots.txt": _Resp(200, text=txt)})
    p = HttpProtocol(session=s)
    rb3 = p.robots("a.com")
    assert rb3.disallow == ("/private/",)
    assert not p.robots_allows(rb3, "http://a.com/private/x")
    assert p.robots_allows(rb3, "http://a.com/pub")
    # robots fetch failure -> allow-all (EMPTY_RULES)
    p2 = HttpProtocol(session=_Session({"http://b.com/robots.txt": ConnectionError()}))
    assert p2.robots("b.com").disallow == ()


def test_http_protocol_through_fetch_stage():
    """The real client plugs into FetchPartition unchanged."""
    s = _Session(
        {
            "http://h.com/robots.txt": _Resp(200, text="User-agent: *\nDisallow: /no/\n"),
            "http://h.com/a": _Resp(200, b"<html><title>t</title></html>", {"Content-Type": "text/html"}),
            "http://h.com/no/x": _Resp(200, b"x"),
        }
    )
    proto = HttpProtocol(session=s)
    cfg = CrawlConfig(server_delay_s=0.0)
    rows = []
    for u in ("http://h.com/a", "http://h.com/no/x"):
        rows.append(
            dict(url=u, host="h.com", domain="h.com", part=0, status=CS.DB_UNFETCHED,
                 fetch_time=CUR - 1000, retries=0, fetch_interval=86400, score=1.0,
                 signature=None, modified_time=0, gen_time=CUR, repr_url=None,
                 fixed_interval=0, metadata=None, segnum=1, sort_score=1.0,
                 fetch_delay_ms=0)
        )
    out = FetchPartition(cfg, CUR, proto)(pd.DataFrame(rows)).set_index("url")
    assert out.loc["http://h.com/a", "status"] == CS.FETCH_SUCCESS
    assert out.loc["http://h.com/no/x", "status"] == CS.FETCH_GONE  # robots denied


def test_bad_server_responses():
    """TestBadServerResponses analogue at this client's layer (the wire
    parsing itself is the HTTP library's): non-numeric Content-Length
    is tolerated (NUTCH-2564), relative / no-slash / protocol-relative
    redirect Locations resolve against the request url (NUTCH-2555),
    and a declared length larger than the body surfaces for
    ParseSegment.isTruncated."""
    s = _Session(
        {
            "http://a.com/clen": _Resp(
                200, b"Hello", {"Content-Type": "text/plain",
                                "Content-Length": "thousand"}),
            "http://a.com/short": _Resp(
                200, b"Hello", {"Content-Type": "text/plain",
                                "Content-Length": "64000"}),
            "http://a.com/dir/rd": _Resp(302, headers={"Location": "other?171"}),
            "http://a.com/pp": _Resp(301, headers={"Location": "//b.com/x"}),
        }
    )
    p = HttpProtocol(session=s)
    r = p.fetch("http://a.com/clen")
    assert r.status == "success" and r.content == b"Hello"
    assert r.content_length == -1  # tolerated, not trusted
    assert p.fetch("http://a.com/short").content_length == 64000
    assert p.fetch("http://a.com/dir/rd").redirect_to == "http://a.com/dir/other?171"
    assert p.fetch("http://a.com/pp").redirect_to == "http://b.com/x"


# ---------------------------------------------------------------------------
# TestFetcher politeness e2e against a REAL loopback HTTP server
# (src/test/org/apache/nutch/fetcher/TestFetcher.java:116-119 asserts
# wall-clock spacing against Jetty; here http.server drives the real
# requests-backed HttpProtocol — no stubbed session)
# ---------------------------------------------------------------------------


@pytest.fixture()
def loopback_server():
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    hits = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            import time as _t

            hits.append((self.path, _t.monotonic()))
            if self.path == "/robots.txt":
                body = b"User-agent: *\nDisallow: /private/\n"
            elif self.path.startswith("/private/"):
                body = b""
            elif self.path == "/missing.html":
                self.send_response(404)
                self.end_headers()
                return
            else:
                body = f"<html><body>page {self.path}</body></html>".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, hits
    finally:
        srv.shutdown()
        srv.server_close()


def test_fetcher_politeness_real_http(loopback_server):
    """TestFetcher.java:116-119 port: fetching N urls of one host
    through the REAL HTTP client with fetcher.server.delay=d and
    real_sleep takes wall-clock > (N-1)*d, robots.txt is fetched once
    over the wire, /private/ is robots-denied, and the 404 maps to
    FETCH_GONE."""
    import time

    from test_fetch import fl_row, run_fetch

    srv, hits = loopback_server
    host = f"127.0.0.1:{srv.server_address[1]}"
    urls = [f"http://{host}/page{i}.html" for i in range(4)]
    urls += [f"http://{host}/private/x.html", f"http://{host}/missing.html"]
    rows = [fl_row(u, host=host) for u in urls]

    delay = 0.3
    cfg = CrawlConfig(server_delay_s=delay, real_sleep=True)
    t0 = time.monotonic()
    out = run_fetch(rows, cfg, HttpProtocol()).set_index("url")
    elapsed = time.monotonic() - t0
    # politeness: 5 fetched urls from one host => at least 4 gaps
    # (the robots-denied url never hits the wire or the clock)
    assert elapsed > (5 - 1) * delay
    for u in urls[:4]:
        assert out.loc[u, "status"] == CS.FETCH_SUCCESS
        assert bytes(out.loc[u, "content"]) == (
            f"<html><body>page /{u.rsplit('/', 1)[1]}</body></html>".encode())
    assert out.loc[f"http://{host}/private/x.html", "status"] == CS.FETCH_GONE
    assert out.loc[f"http://{host}/missing.html", "status"] == CS.FETCH_GONE
    # robots fetched exactly once (per-host cache), pages hit once each
    paths = [p for p, _ in hits]
    assert paths.count("/robots.txt") == 1
    assert paths.count("/page0.html") == 1 and "/private/x.html" not in paths
    # wire-level spacing: consecutive page hits are >= delay apart
    page_times = [t for p, t in hits if p != "/robots.txt"]
    gaps = [b - a for a, b in zip(page_times, page_times[1:])]
    assert all(g >= delay * 0.9 for g in gaps)
