"""ftp:// protocol (protocol-ftp plugin analogue,
src/plugin/protocol-ftp): fetches ftp URLs into the same FakeResponse
shape the fetch stage consumes, completing the protocol families the
reference ships (http, file, ftp).

Semantics mirror FtpResponse.java / Ftp.java:

- anonymous login by default (Ftp.java:279-280: ftp.username
  "anonymous", ftp.password "anonymous@example.com")
- binary transfers, content capped at ``content_limit``
  (Ftp.java:277 ftp.content.limit, 1 MiB)
- path ending in "/" -> directory listing rendered as an HTML index
  page of links (FtpResponse.java list2html:492-530), ".." entry for
  non-root dirs; unknown dir -> notfound (getDirAsHttpResponse:425)
- a file path that turns out to be a directory -> redirect ("moved")
  to path + "/" (FtpResponse.java:395-399: 300 + Location path+"/"),
  which Ftp.java:162-173 follows; our fetch stage does the same with
  ``redirect_to``
- connect / server errors -> "exception" (HTTP 500 analogue,
  FtpResponse.java:180-184 -> retry); login refused -> "gone" (401,
  FtpResponse.java:196-199 -> access denied, same mapping
  HttpProtocol uses for 401/403)
- robots: FtpRobotRulesParser fetches /robots.txt over the same
  protocol and treats any failure as allow-all.

No network in the test environment, so ``client_factory`` injects an
ftplib.FTP-compatible stub in unit tests; the default factory builds a
real ``ftplib.FTP`` (stdlib — no extra dependency).
"""

from __future__ import annotations

import mimetypes
import posixpath
from urllib.parse import unquote, urlparse

from .fake_protocol import FakeResponse, FakeRobots
from .http_protocol import parse_robots_txt


def _default_factory(timeout_s: float):
    import ftplib

    def make():
        return ftplib.FTP(timeout=timeout_s)

    return make


def list2html(names: list[str], path: str, include_dotdot: bool) -> bytes:
    """HTML index page for a dir listing (FtpResponse.java:492-530)."""
    out = ["<html><head>", f"<title>Index of {path}</title></head>\n",
           f"<body><h1>Index of {path}</h1><pre>\n"]
    if include_dotdot:
        parent = posixpath.dirname(path.rstrip("/")) or "/"
        out.append(f'<a href="{parent}">../</a>\n')
    for name in names:
        base = posixpath.basename(name.rstrip("/")) or name
        href = posixpath.join(path, base)
        out.append(f'<a href="{href}">{base}</a>\n')
    out.append("</pre></body></html>\n")
    return "".join(out).encode()


class FtpProtocol:
    """One control connection per instance (i.e. per fetch task/actor),
    reconnected lazily per host — the ftp.keep.connection=true shape
    (Ftp.java:282), which is the right default under host-partitioned
    fetch lists where consecutive URLs share a host."""

    def __init__(
        self,
        user: str = "anonymous",
        password: str = "anonymous@example.com",
        timeout_s: float = 10.0,
        content_limit: int = 1_048_576,
        client_factory=None,
    ):
        self.user = user
        self.password = password
        self.timeout_s = timeout_s
        self.content_limit = content_limit
        self._factory = client_factory or _default_factory(timeout_s)
        self._client = None
        self._connected_host: tuple[str, int] | None = None

    # ---------------- connection ----------------
    def _connect(self, host: str, port: int):
        """Reuse the live connection when the host matches; otherwise
        quit and dial the new one (FtpResponse.java:154-181)."""
        if self._client is not None and self._connected_host == (host, port):
            return self._client
        self._drop()
        c = self._factory()
        c.connect(host, port)
        c.login(self.user, self.password)
        self._client = c
        self._connected_host = (host, port)
        return c

    def _drop(self):
        if self._client is not None:
            try:
                self._client.quit()
            except Exception:
                pass
            self._client = None
            self._connected_host = None

    # ---------------- robots ----------------
    def robots(self, host: str) -> FakeRobots:
        """FtpRobotRulesParser.java: robots.txt fetched over ftp; any
        failure (no file, no server) -> allow-all."""
        r = self.fetch(f"ftp://{host}/robots.txt")
        if r.status != "success" or not r.content:
            return FakeRobots(disallow=(), crawl_delay=None)
        try:
            return parse_robots_txt(r.content.decode("utf-8", "replace"))
        except Exception:
            return FakeRobots(disallow=(), crawl_delay=None)

    def robots_allows(self, rb: FakeRobots, url: str) -> bool:
        path = url.split("://", 1)[-1]
        path = path[path.find("/"):] if "/" in path else "/"
        return not any(path.startswith(d) for d in rb.disallow)

    # ---------------- fetch -----------------
    def fetch(self, url: str) -> FakeResponse:
        p = urlparse(url)
        if p.scheme != "ftp" or not p.hostname:
            return FakeResponse("exception", b"", "text/html")
        path = unquote(p.path) or "/"
        try:
            c = self._connect(p.hostname, p.port or 21)
        except PermissionError:
            # login refused -> access denied (FtpResponse.java:196-199)
            self._drop()
            return FakeResponse("gone", b"", "text/html")
        except Exception:
            self._drop()
            return FakeResponse("exception", b"", "text/html")
        try:
            if path.endswith("/"):
                return self._fetch_dir(c, path)
            return self._fetch_file(c, path)
        except Exception:
            # un-foreseen protocol error: drop the client so the next
            # fetch starts anew (FtpResponse.java:291-303)
            self._drop()
            return FakeResponse("exception", b"", "text/html")

    def _fetch_dir(self, c, path: str) -> FakeResponse:
        import ftplib

        try:
            c.cwd(path)
        except ftplib.error_perm:
            return FakeResponse("notfound", b"", "text/html")
        names = c.nlst()
        body = list2html(sorted(names), path, include_dotdot=path != "/")
        return FakeResponse("success", body, "text/html")

    def _fetch_file(self, c, path: str) -> FakeResponse:
        import ftplib

        chunks: list[bytes] = []
        got = 0

        def sink(b: bytes):
            nonlocal got
            if got < self.content_limit:
                chunks.append(b[: self.content_limit - got])
                got += len(b)

        try:
            c.retrbinary(f"RETR {path}", sink)
        except ftplib.error_perm:
            # not retrievable: a dir -> redirect to path + "/"
            # (FtpResponse.java:395-399), else not found (:401)
            try:
                c.cwd(path)
            except ftplib.error_perm:
                return FakeResponse("notfound", b"", "text/html")
            return FakeResponse("moved", b"", "text/html", redirect_to=None if path.endswith("/") else _with_slash_url(self._connected_host, path))
        ctype = mimetypes.guess_type(path)[0] or "application/octet-stream"
        return FakeResponse("success", b"".join(chunks), ctype)


def _with_slash_url(hostport: tuple[str, int] | None, path: str) -> str:
    host, port = hostport if hostport else ("", 21)
    netloc = host if port == 21 else f"{host}:{port}"
    return f"ftp://{netloc}{path}/"
