"""Deterministic fake fetch protocol (test/bench double; no network).

Mirrors what the reference e2e tests serve from Jetty
(src/test/org/apache/nutch/fetcher/TestFetcher.java:84-94) and the proxy
testbed (src/test/org/apache/nutch/tools/proxy/FakeHandler.java): every
response is a pure function of the URL (FIXTURES.md §F4), so identical
runs at any parallelism produce identical fetch outcomes.

Response classes by hash bucket (md5(url)):
  0-79   success (html or pdf-ish)
  80-84  notfound        -> FETCH_GONE
  85-89  moved (perm)    -> redirect
  90-92  temp_moved      -> redirect
  93-95  exception       -> FETCH_RETRY
  96-99  gone            -> FETCH_GONE

Per-host robots.txt, also hash-derived:
  host_hash % 17 == 0 -> Disallow: /private/
  host_hash % 13 == 0 -> Crawl-delay: 2
  host_hash % 53 == 0 -> Crawl-delay: 120  (> fetcher.max.crawl.delay)
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


@dataclass
class FakeResponse:
    status: str  # success | notfound | gone | moved | temp_moved | exception
    content: bytes
    content_type: str
    redirect_to: str | None = None
    modified_time_ms: int = 0  # Last-Modified header (0 = absent)
    # declared Content-Length header (-1 = absent/non-numeric, NUTCH-2564);
    # ParseSegment.isTruncated compares it to the actual byte count
    content_length: int = -1


@dataclass
class FakeRobots:
    disallow: tuple
    crawl_delay: float | None
    sitemaps: tuple = ()  # robots.txt "Sitemap:" lines


class FakeProtocol:
    """Stateless; safe to instantiate once per fetch actor."""

    def __init__(self, n_outlinks: int = 4, n_external: int = 1, n_hosts_universe: int = 1000,
                 media_pct: int = 0):
        self.n_outlinks = n_outlinks
        self.n_external = n_external
        self.n_hosts = n_hosts_universe
        # opt-in interleaved-media mode: this share of successes returns
        # image/gif or audio WAV payloads (deterministic header bytes).
        # Default 0 keeps crawl-order/URL-seen hashes identical to every
        # prior recorded run.
        self.media_pct = int(media_pct)

    # ---------------- robots ----------------
    def robots(self, host: str) -> FakeRobots:
        hh = _h("robots:" + host)
        disallow = ("/private/",) if hh % 17 == 0 else ()
        delay = None
        if hh % 53 == 0:
            delay = 120.0
        elif hh % 13 == 0:
            delay = 2.0
        # every 5th host advertises a sitemap (SitemapProcessor discovery)
        sitemaps = (f"http://{host}/sitemap.xml",) if hh % 5 == 0 else ()
        return FakeRobots(disallow=disallow, crawl_delay=delay, sitemaps=sitemaps)

    def robots_allows(self, robots: FakeRobots, url: str) -> bool:
        path = url.split("://", 1)[-1]
        path = path[path.find("/") :] if "/" in path else "/"
        return not any(path.startswith(d) for d in robots.disallow)

    # ---------------- fetch -----------------
    def fetch(self, url: str) -> FakeResponse:
        hh = _h(url)
        path = url.split("://", 1)[-1]
        path = path[path.find("/"):] if "/" in path else "/"
        if path == "/sitemap.xml" or path.startswith("/sitemap-"):
            return self._sitemap_body(url)
        bucket = hh % 100
        if bucket < 80:
            return self._success(url, hh)
        if bucket < 85:
            return FakeResponse("notfound", b"", "text/html")
        if bucket < 90:
            return FakeResponse("moved", b"", "text/html", redirect_to=self._redirect_target(url, hh))
        if bucket < 93:
            return FakeResponse("temp_moved", b"", "text/html", redirect_to=self._redirect_target(url, hh))
        if bucket < 96:
            return FakeResponse("exception", b"", "text/html")
        return FakeResponse("gone", b"", "text/html")

    def _redirect_target(self, url: str, hh: int) -> str:
        host = url.split("://", 1)[-1].split("/", 1)[0]
        return f"http://{host}/r/{hh % 100000}"

    def _success(self, url: str, hh: int) -> FakeResponse:
        host = url.split("://", 1)[-1].split("/", 1)[0]
        if self.media_pct and (hh >> 7) % 100 < self.media_pct:
            # interleaved media payloads: deterministic gif / wav headers
            if hh % 2 == 0:
                w, h = 16 + hh % 480, 16 + (hh >> 9) % 320
                body = (b"GIF89a" + int(w).to_bytes(2, "little")
                        + int(h).to_bytes(2, "little") + b"\x00" * 6
                        + bytes([hh % 251]) * (hh % 512))
                return FakeResponse("success", body, "image/gif")
            rate = (8000, 16000, 22050, 44100)[hh % 4]
            body = (b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
                    + b"fmt " + (16).to_bytes(4, "little")
                    + (1).to_bytes(2, "little") + (1 + hh % 2).to_bytes(2, "little")
                    + int(rate).to_bytes(4, "little") + b"\x00" * 8)
            return FakeResponse("success", body, "audio/x-wav")
        if hh % 10 == 0:  # pdf-ish payload
            body = self._pdf_body(url, hh)
            return FakeResponse("success", body, "application/pdf")
        return FakeResponse("success", self._html_body(url, host, hh), "text/html")

    # deterministic content -------------------------------------------------
    _WORDS = (
        "policy data report annual climate economic health education review "
        "analysis global development public national research summary energy "
        "council commission framework strategy assessment"
    ).split()

    def _sentences(self, hh: int, n: int) -> list[str]:
        out = []
        x = hh
        for i in range(n):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            words = [self._WORDS[(x >> (j * 5)) % len(self._WORDS)] for j in range(6 + (x % 7))]
            out.append(" ".join(words))
        return out

    def outlink_targets(self, url: str, host: str, hh: int) -> list[str]:
        links = []
        for i in range(self.n_outlinks):
            links.append(f"http://{host}/page/{(hh + i * 2654435761) % 100000}")
        for i in range(self.n_external):
            ext = f"host{(hh + i * 40503) % self.n_hosts}.example"
            links.append(f"http://{ext}/page/{(hh >> 8) % 100000}")
        return links

    def _html_body(self, url: str, host: str, hh: int) -> bytes:
        sents = self._sentences(hh, 5)
        title = sents[0][:60].title()
        links = self.outlink_targets(url, host, hh)
        anchors = "".join(
            f'<a href="{t}">anchor {i}</a>\n' for i, t in enumerate(links)
        )
        img = f'<img src="http://{host}/thumb/{hh % 9999}.png" alt="thumb"/>' if hh % 3 == 0 else ""
        paras = "".join(f"<p>{s}</p>\n" for s in sents[1:])
        html = (
            f"<html><head><title>{title}</title></head><body>\n"
            f"<h1>{sents[1][:40].title()}</h1>\n{img}\n{paras}{anchors}</body></html>"
        )
        return html.encode("utf-8")

    _CHANGEFREQS = ("daily", "weekly", "monthly")

    def _sitemap_body(self, url: str) -> FakeResponse:
        """Deterministic sitemap: hosts with hash%4==0 serve a one-level
        <sitemapindex> pointing at two child urlsets; others serve an
        urlset of 5 /sm/ urls with lastmod/changefreq/priority."""
        host = url.split("://", 1)[-1].split("/", 1)[0]
        sh = _h("sitemap:" + host)
        is_index = sh % 4 == 0
        if is_index and url.endswith("/sitemap.xml"):
            body = (
                "<sitemapindex>"
                + "".join(
                    f"<sitemap><loc>http://{host}/sitemap-{i}.xml</loc></sitemap>"
                    for i in range(2)
                )
                + "</sitemapindex>"
            )
            return FakeResponse("success", body.encode(), "application/xml")
        child = 0
        if "/sitemap-" in url:
            child = int(url.rsplit("-", 1)[1].split(".")[0])
        entries = []
        for i in range(5):
            loc = f"http://{host}/sm/{(sh + child * 101 + i * 7919) % 100000}"
            cf = self._CHANGEFREQS[(sh + i) % len(self._CHANGEFREQS)]
            pri = ((sh + i) % 10) / 10.0
            entries.append(
                f"<url><loc>{loc}</loc><lastmod>2026-01-0{i + 1}</lastmod>"
                f"<changefreq>{cf}</changefreq><priority>{pri:.1f}</priority></url>"
            )
        return FakeResponse(
            "success", ("<urlset>" + "".join(entries) + "</urlset>").encode(),
            "application/xml",
        )

    def _pdf_body(self, url: str, hh: int) -> bytes:
        # opaque binary payload with an embedded deterministic text layer the
        # fake pdf parser understands: "%FPDF|title|heading|text..."
        sents = self._sentences(hh, 4)
        payload = "|".join(["%FPDF", sents[0][:50].title(), sents[1][:40].title()] + sents[2:])
        return payload.encode("utf-8")
