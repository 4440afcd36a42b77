"""Real HTTP protocol client for the ``CrawlDriver(protocol=...)`` slot.

protocol-http plugin analogue (src/plugin/protocol-http,
lib-http/HttpRobotRulesParser.java:108-184): fetches pages and
robots.txt over the network and maps responses onto the same
``FakeResponse`` / ``FakeRobots`` shapes the fetch stage consumes, so
swapping the deterministic ``FakeProtocol`` for this class is a
one-argument change.

This environment has no network, so the class is exercised by unit
tests with a stubbed session (tests/test_http_protocol.py); the
deterministic ``FakeProtocol`` remains the test/bench double.

Semantics ported:
- HTTP status -> fetch status classes (FetcherThread.java:377-458):
  2xx success, 404 notfound, 410 gone, 301/308 moved (permanent),
  302/303/307 temp_moved, 5xx/timeouts/connection errors -> exception
  (FETCH_RETRY upstream)
- redirects are NOT followed by the client (http.redirect.max handling
  lives in the fetch stage) — the Location header is surfaced as
  ``redirect_to``
- robots.txt parsed for Disallow (user-agent matched), Crawl-delay and
  Sitemap lines; fetch errors on robots default to allow-all
  (HttpRobotRulesParser: 4xx -> EMPTY_RULES)
"""

from __future__ import annotations

from .fake_protocol import FakeResponse, FakeRobots

_PERM_REDIRECTS = {301, 308}
_TEMP_REDIRECTS = {302, 303, 307}


def parse_robots_txt(text: str, agent: str = "coherencebot") -> FakeRobots:
    """Minimal robots.txt parser: the most specific matching user-agent
    group wins; Sitemap lines are global."""
    groups: list[tuple[list[str], list[str], float | None]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_delay: float | None = None
    in_group = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_delay, in_group
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay, in_group = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_group:
                flush()
            cur_agents.append(val.lower())
        elif key == "sitemap":
            sitemaps.append(val)
        elif key == "disallow":
            in_group = True
            if val:
                cur_dis.append(val)
        elif key == "crawl-delay":
            in_group = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
    flush()

    agent = agent.lower()
    best: tuple[list[str], float | None] | None = None
    best_len = -1
    for agents, dis, delay in groups:
        for a in agents:
            if a == "*" and best_len < 0:
                best, best_len = (dis, delay), 0
            elif a != "*" and a in agent and len(a) > best_len:
                best, best_len = (dis, delay), len(a)
    if best is None:
        return FakeRobots(disallow=(), crawl_delay=None, sitemaps=tuple(sitemaps))
    return FakeRobots(
        disallow=tuple(best[0]), crawl_delay=best[1], sitemaps=tuple(sitemaps)
    )


class HttpProtocol:
    """requests-backed protocol client; one Session per instance (i.e.
    per fetch task/actor — connection pooling without cross-actor
    state)."""

    def __init__(self, timeout_s: float = 10.0, user_agent: str = "coherencebot-ray/0.2", session=None):
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        if session is not None:
            self._session = session
        else:  # pragma: no cover - no network in the test environment
            import requests

            self._session = requests.Session()
            self._session.headers["User-Agent"] = user_agent

    # ---------------- robots ----------------
    def robots(self, host: str) -> FakeRobots:
        try:
            r = self._session.get(
                f"http://{host}/robots.txt", timeout=self.timeout_s, allow_redirects=True
            )
            if r.status_code != 200 or not r.text:
                return FakeRobots(disallow=(), crawl_delay=None)
            return parse_robots_txt(r.text, self.user_agent)
        except Exception:
            return FakeRobots(disallow=(), crawl_delay=None)

    def robots_allows(self, rb: FakeRobots, url: str) -> bool:
        path = url.split("://", 1)[-1]
        path = path[path.find("/"):] if "/" in path else "/"
        return not any(path.startswith(d) for d in rb.disallow)

    # ---------------- fetch -----------------
    def fetch(self, url: str) -> FakeResponse:
        try:
            r = self._session.get(url, timeout=self.timeout_s, allow_redirects=False)
        except Exception:
            return FakeResponse("exception", b"", "text/html")
        code = r.status_code
        ctype = (r.headers.get("Content-Type") or "text/html").split(";")[0].strip()
        if code in _PERM_REDIRECTS or code in _TEMP_REDIRECTS:
            target = r.headers.get("Location")
            if target:
                # resolve relative / protocol-relative / no-leading-slash
                # Locations against the request url (the NUTCH-2555
                # family of URL normalization problems)
                from urllib.parse import urljoin

                target = urljoin(url, target.strip())
            status = "moved" if code in _PERM_REDIRECTS else "temp_moved"
            return FakeResponse(status, b"", ctype, redirect_to=target)
        if 200 <= code < 300:
            content = r.content or b""
            # gzip-on-the-wire that the transport didn't decode (stub
            # sessions, mis-labelled Content-Encoding): best-effort
            # unzip per GZIPUtils usage in HttpBase.processGzipEncoded
            enc = (r.headers.get("Content-Encoding") or "").lower()
            if enc in ("gzip", "x-gzip") and content[:2] == b"\x1f\x8b":
                from ..functions.webutil import gzip_unzip_best_effort

                unz = gzip_unzip_best_effort(content)
                if unz is not None:
                    content = unz
            elif enc == "deflate":
                from ..functions.webutil import inflate_best_effort

                inf = inflate_best_effort(content)
                if inf is not None:
                    content = inf
            # Last-Modified -> CrawlDatum modified time (HttpResponse
            # headers; HttpDateFormat parse, 0 when absent/invalid)
            mod_ms = 0
            lm = r.headers.get("Last-Modified")
            if lm:
                from ..functions.webutil import http_date_to_ms

                try:
                    mod_ms = http_date_to_ms(lm)
                except ValueError:
                    mod_ms = 0
            # declared Content-Length for truncation detection; a
            # non-numeric value is tolerated, not an error (NUTCH-2564:
            # "Content-Length: thousand" must not kill the fetch)
            clen = -1
            raw_cl = (r.headers.get("Content-Length") or "").strip()
            if raw_cl:
                try:
                    clen = int(raw_cl)
                except ValueError:
                    clen = -1
            return FakeResponse("success", content, ctype,
                                modified_time_ms=mod_ms, content_length=clen)
        if code == 404:
            return FakeResponse("notfound", b"", ctype)
        if code in (410, 401, 403):
            return FakeResponse("gone", b"", ctype)
        return FakeResponse("exception", b"", ctype)
