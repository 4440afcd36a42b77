"""file:// protocol (protocol-file plugin analogue,
src/plugin/protocol-file): serves local files into the fetch stage —
lets the engine crawl an on-disk corpus (mirrors, test fixtures,
pre-downloaded WARC extractions) through the exact same politeness /
parse / updatedb machinery.

Maps onto the FakeResponse shape; directory listings become HTML pages
of links (like the reference's directory handling), missing paths ->
notfound, permission errors -> gone.
"""

from __future__ import annotations

import mimetypes
import os

from .fake_protocol import FakeResponse, FakeRobots


class FileProtocol:
    """Stateless; restrict reads to ``root`` (jail) when given."""

    def __init__(self, root: str | None = None, content_limit: int = 1_048_576):
        self.root = os.path.abspath(root) if root else None
        self.content_limit = content_limit

    # no robots for local files
    def robots(self, host: str) -> FakeRobots:
        return FakeRobots(disallow=(), crawl_delay=None)

    def robots_allows(self, rb: FakeRobots, url: str) -> bool:
        return True

    def _path_of(self, url: str) -> str | None:
        if not url.startswith("file:"):
            return None
        path = url[len("file:"):]
        while path.startswith("//"):
            path = path[1:]
        # FileResponse.java:123-134 (NUTCH-384): the query part is
        # ignored and the path is always URL-decoded before the
        # filesystem lookup ('file:.../a_%28b%29.txt' reads 'a_(b).txt')
        path = path.split("?", 1)[0]
        from urllib.parse import unquote

        path = unquote(path)
        # realpath (not abspath) on both sides: a symlink inside the
        # jail pointing outside must not pass the containment check
        path = os.path.realpath(path)
        if self.root:
            root = os.path.realpath(self.root)
            if not path.startswith(root + os.sep) and path != root:
                return None  # outside the jail
        return path

    def fetch(self, url: str) -> FakeResponse:
        path = self._path_of(url)
        if path is None:
            return FakeResponse("gone", b"", "text/html")
        try:
            if os.path.isdir(path):
                entries = sorted(os.listdir(path))
                body = "".join(
                    f'<a href="file://{os.path.join(path, e)}">{e}</a>\n' for e in entries
                )
                return FakeResponse(
                    "success",
                    f"<html><body>\n{body}</body></html>".encode(),
                    "text/html",
                )
            if not os.path.exists(path):
                return FakeResponse("notfound", b"", "text/html")
            with open(path, "rb") as f:
                content = f.read(self.content_limit)
            ctype = mimetypes.guess_type(path)[0] or "application/octet-stream"
            return FakeResponse("success", content, ctype)
        except PermissionError:
            return FakeResponse("gone", b"", "text/html")
        except OSError:
            return FakeResponse("exception", b"", "text/html")
