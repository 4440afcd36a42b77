"""Scheme-dispatching composite protocol (ProtocolFactory analogue,
src/java/org/apache/nutch/protocol/ProtocolFactory.java): the reference
resolves the protocol plugin per URL scheme; this routes fetch/robots
calls to the registered client for the URL's scheme so one crawl can mix
http://, file:// and ftp:// seeds.

Robots rules are scheme-specific (FtpRobotRulesParser fetches
robots.txt over ftp; HttpRobotRulesParser over http), so the robots
cache key must include the scheme — the fetch stage calls
``robots_for(host, url)`` when the protocol provides it, falling back
to plain ``robots(host)`` (single-protocol clients keep their simple
shape).
"""

from __future__ import annotations

from .fake_protocol import FakeRobots, FakeResponse


def _scheme_of(url: str) -> str:
    i = url.find("://")
    return url[:i].lower() if i > 0 else ""


class SchemeDispatchProtocol:
    """``protocols``: scheme -> protocol client. Unregistered schemes
    fetch as "exception" (ProtocolNotFound analogue) and allow-all
    robots."""

    def __init__(self, protocols: dict, default_scheme: str = "http"):
        self.protocols = dict(protocols)
        self.default_scheme = default_scheme

    def _for(self, scheme: str):
        return self.protocols.get(scheme)

    # scheme-aware robots entry point used by the fetch stage
    def robots_for(self, host: str, url: str) -> FakeRobots:
        p = self._for(_scheme_of(url) or self.default_scheme)
        if p is None:
            return FakeRobots(disallow=(), crawl_delay=None)
        return p.robots(host)

    def robots(self, host: str) -> FakeRobots:
        p = self._for(self.default_scheme)
        if p is None:
            return FakeRobots(disallow=(), crawl_delay=None)
        return p.robots(host)

    def robots_allows(self, rb: FakeRobots, url: str) -> bool:
        p = self._for(_scheme_of(url) or self.default_scheme)
        if p is None:
            return True
        return p.robots_allows(rb, url)

    def fetch(self, url: str) -> FakeResponse:
        p = self._for(_scheme_of(url))
        if p is None:
            return FakeResponse("exception", b"", "text/html")
        return p.fetch(url)
