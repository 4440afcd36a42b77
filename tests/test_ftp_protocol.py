"""FtpProtocol unit tests with a stubbed ftplib client (no network in
this environment). Status mapping per protocol-ftp FtpResponse.java /
Ftp.java; scheme dispatch per ProtocolFactory.java."""

import ftplib

import pandas as pd

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.sources.dispatch import SchemeDispatchProtocol
from coherencebot_ray.sources.fake_protocol import FakeRobots, FakeResponse
from coherencebot_ray.sources.ftp_protocol import FtpProtocol
from coherencebot_ray.stages.fetch import FetchPartition

CUR = 1_700_000_000_000


class _StubFtp:
    """ftplib.FTP-shaped stub over an in-memory tree.

    ``tree``: path -> bytes (file) | list of names (dir).
    """

    def __init__(self, tree, fail_connect=False, fail_login=False):
        self.tree = tree
        self.fail_connect = fail_connect
        self.fail_login = fail_login
        self.connected = False
        self.quit_calls = 0
        self.connect_calls = 0

    def connect(self, host, port):
        self.connect_calls += 1
        if self.fail_connect:
            raise OSError("connection refused")
        self.connected = True

    def login(self, user, passwd):
        if self.fail_login:
            raise PermissionError("530 Login incorrect")

    def cwd(self, path):
        if not isinstance(self.tree.get(path.rstrip("/") or "/"), list):
            raise ftplib.error_perm("550 no such dir")

    def nlst(self):
        # stub keeps no cwd state; tests use one dir per listing call
        for v in self.tree.values():
            if isinstance(v, list):
                return list(v)
        return []

    def retrbinary(self, cmd, callback, blocksize=8192):
        assert cmd.startswith("RETR ")
        path = cmd[len("RETR "):]
        v = self.tree.get(path)
        if not isinstance(v, bytes):
            raise ftplib.error_perm("550 not a plain file")
        for i in range(0, len(v), blocksize):
            callback(v[i : i + blocksize])

    def quit(self):
        self.quit_calls += 1
        self.connected = False


def _proto(tree, **kw):
    stub = _StubFtp(tree, **kw)
    return FtpProtocol(client_factory=lambda: stub), stub


def test_file_fetch_and_mime():
    p, _ = _proto({"/docs/a.pdf": b"%PDF-1.4 body"})
    r = p.fetch("ftp://h.example/docs/a.pdf")
    assert r.status == "success"
    assert r.content == b"%PDF-1.4 body"
    assert r.content_type == "application/pdf"


def test_content_limit_caps_body():
    p, _ = _proto({"/big.bin": b"x" * 5000})
    p.content_limit = 1000
    r = p.fetch("ftp://h/big.bin")
    assert r.status == "success"
    assert len(r.content) == 1000


def test_dir_listing_html_with_dotdot():
    p, _ = _proto({"/pub": ["b.txt", "a.txt"]})
    r = p.fetch("ftp://h/pub/")
    assert r.status == "success" and r.content_type == "text/html"
    body = r.content.decode()
    assert "Index of /pub/" in body
    assert '<a href="/pub/a.txt">a.txt</a>' in body
    assert "../" in body  # non-root dir gets the .. entry (list2html)


def test_root_listing_has_no_dotdot():
    p, _ = _proto({"/": ["welcome.msg"]})
    r = p.fetch("ftp://h/")
    assert r.status == "success"
    assert "../" not in r.content.decode()


def test_file_path_that_is_dir_redirects_with_slash():
    # FtpResponse.java:395-399 -> 300 + Location path + "/"
    p, _ = _proto({"/pub": ["x"]})
    r = p.fetch("ftp://h/pub")
    assert r.status == "moved"
    assert r.redirect_to == "ftp://h/pub/"


def test_missing_file_is_notfound():
    p, _ = _proto({"/a": b"x"})
    assert p.fetch("ftp://h/nope").status == "notfound"
    assert p.fetch("ftp://h/nodir/").status == "notfound"


def test_connect_failure_is_exception_login_refused_is_gone():
    p1, _ = _proto({}, fail_connect=True)
    assert p1.fetch("ftp://h/a").status == "exception"
    p2, _ = _proto({}, fail_login=True)
    assert p2.fetch("ftp://h/a").status == "gone"


def test_connection_reused_within_host():
    p, stub = _proto({"/a": b"1", "/b": b"2"})
    p.fetch("ftp://h/a")
    p.fetch("ftp://h/b")
    assert stub.connect_calls == 1  # ftp.keep.connection shape


def test_robots_over_ftp():
    p, _ = _proto({"/robots.txt": b"User-agent: *\nDisallow: /private\n"})
    rb = p.robots("h")
    assert not p.robots_allows(rb, "ftp://h/private/x")
    assert p.robots_allows(rb, "ftp://h/pub/x")
    # no robots file -> allow all
    p2, _ = _proto({})
    assert p2.robots("h").disallow == ()


class _ConstProto:
    def __init__(self, body):
        self.body = body

    def robots(self, host):
        return FakeRobots(disallow=(), crawl_delay=None)

    def robots_allows(self, rb, url):
        return True

    def fetch(self, url):
        return FakeResponse("success", self.body, "text/html")


def test_scheme_dispatch_routes_by_scheme():
    ftp, _ = _proto({"/f.txt": b"ftp body"})
    d = SchemeDispatchProtocol({"ftp": ftp, "http": _ConstProto(b"http body")})
    assert d.fetch("ftp://h/f.txt").content == b"ftp body"
    assert d.fetch("http://h/x").content == b"http body"
    assert d.fetch("gopher://h/x").status == "exception"  # ProtocolNotFound
    assert d.robots_for("h", "ftp://h/f.txt").disallow == ()


def test_ftp_through_fetch_stage():
    """End-to-end: ftp URLs flow through FetchPartition via the scheme
    dispatcher — robots keyed per scheme, datum carries content."""
    ftp, _ = _proto({"/doc.txt": b"hello ftp", "/robots.txt": b"User-agent: *\nDisallow: /sec\n"})
    d = SchemeDispatchProtocol({"ftp": ftp})
    cfg = CrawlConfig(server_delay_s=0.0)
    g = pd.DataFrame(
        {
            "url": ["ftp://h.example/doc.txt", "ftp://h.example/sec/x"],
            "host": ["h.example", "h.example"],
            "part": [0, 0],
            "score": [1.0, 1.0],
            "status": [CS.DB_UNFETCHED, CS.DB_UNFETCHED],
            "fetch_time": [CUR - 1000, CUR - 1000],
            "fetch_interval": [2_592_000, 2_592_000],
            "retries": [0, 0],
            "signature": [None, None],
            "metadata": [{}, {}],
        }
    )
    out = FetchPartition(cfg, CUR, protocol=d)(g).set_index("url")
    assert out.loc["ftp://h.example/doc.txt", "status"] == CS.FETCH_SUCCESS
    assert bytes(out.loc["ftp://h.example/doc.txt", "content"]) == b"hello ftp"
    assert out.loc["ftp://h.example/sec/x", "status"] == CS.FETCH_GONE
