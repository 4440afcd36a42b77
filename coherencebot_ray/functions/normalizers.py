"""URL normalizers: basic + regex, composed in a scoped chain.

Re-implements (from observed behavior, not code):

- BasicURLNormalizer (reference: src/plugin/urlnormalizer-basic/.../
  BasicURLNormalizer.java:52-260, behavior pinned by
  TestBasicURLNormalizer.java:44-216): lowercase scheme/host, strip
  default port, drop fragment, ensure "/" path, RFC-3986
  percent-encoding normalization (decode unreserved, keep+uppercase
  reserved escapes, escape unsafe + non-ASCII), dot-segment and
  duplicate-slash removal.
- RegexURLNormalizer (src/plugin/urlnormalizer-regex/.../
  RegexURLNormalizer.java; default rules from
  conf/regex-normalize.xml.template:33-70): session-id strip, anchor
  strip, ``?&``→``?``, ``&&``→``&``, trailing ``[?&.]`` strip,
  duplicate-slash collapse.
- URLNormalizers chain with per-scope rule sets and fixpoint looping
  (net/URLNormalizers.java:97-310).

All normalizers are pure ``str -> str | None`` functions; ``None`` means
the URL is malformed and must be dropped. Chains are built once per
worker/actor and applied per batch.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

# Scopes (URLNormalizers.java:49-96)
SCOPE_DEFAULT = "default"
SCOPE_PARTITION = "partition"
SCOPE_GENERATE_HOST_COUNT = "generate_host_count"
SCOPE_FETCHER = "fetcher"
SCOPE_CRAWLDB = "crawldb"
SCOPE_LINKDB = "linkdb"
SCOPE_INJECT = "inject"
SCOPE_OUTLINK = "outlink"
SCOPE_INDEXER = "indexer"

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

# RFC 3986 unreserved: ALPHA / DIGIT / "-" / "." / "_" / "~"
_UNRESERVED = frozenset(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
# Characters that MUST be (re-)escaped in a path/query
# (BasicURLNormalizer escapedCharacters table)
_MUST_ESCAPE = frozenset(
    list(range(0x00, 0x21)) + [0x22, 0x3C, 0x3E, 0x5B, 0x5D, 0x5E, 0x60, 0x7B, 0x7C, 0x7D, 0x7F]
)
_HEX = "0123456789ABCDEF"


def _normalize_escaping(s: str) -> str:
    """One pass of unescape+re-escape over a path+query string.

    Tokenizes into (byte, was_escaped) pairs — a valid ``%XX`` becomes its
    octet with was_escaped=True, everything else its UTF-8 bytes — then
    re-emits: unreserved octets as literals, must-escape octets and
    non-ASCII as uppercase ``%XX``, other printable ASCII escaped only if
    it arrived escaped (so ``%2F`` stays ``%2F`` but a literal ``&`` stays
    ``&``).
    """
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and i + 2 <= n - 0:
            h = s[i + 1 : i + 3]
            if len(h) == 2 and all(x in "0123456789abcdefABCDEF" for x in h):
                b = int(h, 16)
                _emit(out, b, True)
                i += 3
                continue
        for b in c.encode("utf-8"):
            _emit(out, b, False)
        i += 1
    return "".join(out)


def _emit(out: list, b: int, was_escaped: bool) -> None:
    if b in _UNRESERVED:
        out.append(chr(b))
    elif b in _MUST_ESCAPE or b >= 0x80:
        out.append("%" + _HEX[b >> 4] + _HEX[b & 0xF])
    elif was_escaped:
        out.append("%" + _HEX[b >> 4] + _HEX[b & 0xF])
    else:
        out.append(chr(b))


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 + duplicate-slash collapse (normalizeTest cases
    TestBasicURLNormalizer.java:144-175)."""
    path = re.sub(r"/{2,}", "/", path)
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if segs and segs[-1] != "":
                segs.pop()
                if not segs:
                    segs = [""]
            continue
        segs.append(seg)
    if not segs or segs[0] != "":
        segs.insert(0, "")
    out = "/".join(segs)
    if path.endswith("/") and not out.endswith("/"):
        out += "/"
    if not out.startswith("/"):
        out = "/" + out
    return out


def _normalize_host(host: str, trim_trailing_dot: bool = False) -> str:
    # NUTCH-2824: fully percent-decode host names as UTF-8
    # (TestBasicURLNormalizer.java:119-122); IDN hosts stay unicode (:97)
    if "%" in host:
        from urllib.parse import unquote

        host = unquote(host, errors="replace")
    host = host.lower()
    if trim_trailing_dot and host.endswith("."):
        host = host[:-1]
    return host


class BasicNormalizer:
    """BasicURLNormalizer port; returns None for malformed URLs."""

    name = "basic"

    def __init__(self, trim_trailing_dot: bool = False):
        self.trim_trailing_dot = trim_trailing_dot

    def __call__(self, url: str, scope: str = SCOPE_DEFAULT) -> str | None:
        if url == "":
            return url
        url = url.strip()
        try:
            parts = urlsplit(url)
        except ValueError:
            return None
        scheme = parts.scheme.lower()
        if not scheme:
            return None
        normalize_path = scheme in ("http", "https", "ftp", "file")

        if scheme in ("http", "https", "ftp"):
            host = parts.hostname or ""
            if not host:
                return None
            host = _normalize_host(host, self.trim_trailing_dot)
            try:
                port = parts.port
            except ValueError:
                return None
            netloc = host
            if port is not None and port != _DEFAULT_PORTS.get(scheme):
                netloc = f"{host}:{port}"
            if parts.username:
                cred = parts.username + (":" + parts.password if parts.password else "")
                netloc = f"{cred}@{netloc}"
            path = parts.path or "/"
            if not path.startswith("/"):
                path = "/" + path
        else:
            netloc = parts.netloc
            path = parts.path

        path = _normalize_escaping(path)
        query = _normalize_escaping(parts.query) if parts.query else ""
        if normalize_path:
            path = _remove_dot_segments(path)

        out = f"{scheme}://{netloc}{path}" if netloc or scheme in ("http", "https", "ftp") else f"{scheme}:{path}"
        if query:
            out += "?" + query
        # fragment (ref) dropped (BasicURLNormalizer.java:222-224)
        return out


# Default regex-normalize rules (conf/regex-normalize.xml.template:33-70).
DEFAULT_REGEX_RULES: list[tuple[str, str]] = [
    # session ids
    (r"(?i)(;?\b_?(l|j|bv_)?(sid|phpsessid|sessionid)=.*?)(\?|&|#|$)", r"\4"),
    # interpage anchors
    (r"#.*?(\?|&|$)", r"\1"),
    # ?& -> ?
    (r"\?&", "?"),
    # && -> &
    (r"&{2,}", "&"),
    # trailing ? & .
    (r"[?&.]$", ""),
    # file://+ -> file:/
    (r"^file://+", "file:/"),
    # duplicate slashes not after ':'
    (r"(?<!:)/{2,}", "/"),
]


def _java_regex_to_py(pattern: str) -> tuple[str, int]:
    """Adapt a Java regex to Python re: Java allows inline ``(?i)``
    anywhere (scoped to the rest), Python 3.11 requires global flags at
    the start — when the pattern uses inline ``(?i)`` mid-expression we
    strip them and compile IGNORECASE (exact for the reference rule
    files, whose flags cover every cased literal)."""
    flags = 0
    if "(?i)" in pattern:
        stripped = pattern.replace("(?i)", "")
        if not pattern.startswith("(?i)") or "(?i)" in pattern[4:]:
            flags = re.IGNORECASE
            pattern = stripped
        else:
            pattern = "(?i)" + stripped
    return pattern, flags


def _java_sub_to_py(sub: str) -> str:
    """Java Matcher.replaceAll template -> Python re.sub template:
    ``$N`` group refs become ``\\N``; Java's ``\\X`` escapes the next
    char to a literal (Python leaves unknown punctuation escapes like
    ``\\?`` verbatim, so they must be unescaped here)."""
    out: list[str] = []
    i = 0
    while i < len(sub):
        c = sub[i]
        if c == "\\" and i + 1 < len(sub):
            nxt = sub[i + 1]
            out.append("\\\\" if nxt == "\\" else nxt)
            i += 2
            continue
        if c == "$" and i + 1 < len(sub) and sub[i + 1].isdigit():
            out.append("\\" + sub[i + 1])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_regex_normalize_xml(text: str) -> list[tuple[str, str]]:
    """conf/regex-normalize.xml rule-file parser
    (RegexURLNormalizer.readConfiguration, :180-230): ordered
    <regex><pattern/><substitution/></regex> entries; a missing
    substitution means delete-the-match."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    rules: list[tuple[str, str]] = []
    for node in root.findall("regex"):
        pat = node.findtext("pattern")
        if pat is None or not pat.strip():
            continue  # reference skips malformed/empty rules
        sub = node.findtext("substitution") or ""
        rules.append((pat.strip(), _java_sub_to_py(sub.strip())))
    return rules


class RegexNormalizer:
    """RegexURLNormalizer: ordered regex substitutions applied once each."""

    name = "regex"

    def __init__(self, rules: list[tuple[str, str]] | None = None):
        src = rules if rules is not None else DEFAULT_REGEX_RULES
        self.rules = []
        for p, s in src:
            pat, flags = _java_regex_to_py(p)
            self.rules.append((re.compile(pat, flags), s))

    @classmethod
    def from_xml(cls, text: str) -> "RegexNormalizer":
        return cls(parse_regex_normalize_xml(text))

    def __call__(self, url: str, scope: str = SCOPE_DEFAULT) -> str | None:
        for pat, sub in self.rules:
            url = pat.sub(sub, url)
        return url


class PassNormalizer:
    """urlnormalizer-pass: identity (used to disable a scope)."""

    name = "pass"

    def __call__(self, url: str, scope: str = SCOPE_DEFAULT) -> str:
        return url


class QuerystringNormalizer:
    """urlnormalizer-querystring: sort query parameters so equivalent
    URLs collapse (src/plugin/urlnormalizer-querystring)."""

    name = "querystring"

    def __call__(self, url: str, scope: str = SCOPE_DEFAULT) -> str | None:
        q = url.find("?")
        if q == -1:
            return url
        base, query = url[:q], url[q + 1 :]
        frag = ""
        h = query.find("#")
        if h != -1:
            query, frag = query[:h], query[h:]
        if not query:
            return url
        params = query.split("&")
        return base + "?" + "&".join(sorted(params)) + frag


class SlashNormalizer:
    """urlnormalizer-slash: per-host trailing-slash policy (add or strip
    a trailing slash on extension-less paths)."""

    name = "slash"

    def __init__(self, add_slash_hosts: tuple = (), strip_slash_hosts: tuple = ()):
        self.add = frozenset(add_slash_hosts)
        self.strip = frozenset(strip_slash_hosts)

    def __call__(self, url: str, scope: str = SCOPE_DEFAULT) -> str:
        try:
            parts = urlsplit(url)
        except ValueError:
            return url
        host = (parts.hostname or "").lower()
        path = parts.path
        if "." in path.rsplit("/", 1)[-1] or parts.query:
            return url
        if host in self.add and not path.endswith("/"):
            return url.replace(path, path + "/", 1) if path else url + "/"
        if host in self.strip and path.endswith("/") and len(path) > 1:
            return url[: len(url) - 1] if url.endswith("/") else url
        return url


class ProtocolNormalizer:
    """urlnormalizer-protocol: force a scheme per host (e.g. https
    everywhere a host is known to redirect)."""

    name = "protocol"

    def __init__(self, host_protocols: dict | None = None, default: str | None = None):
        self.map = host_protocols or {}
        self.default = default

    def __call__(self, url: str, scope: str = SCOPE_DEFAULT) -> str:
        try:
            parts = urlsplit(url)
        except ValueError:
            return url
        host = (parts.hostname or "").lower()
        want = self.map.get(host, self.default)
        if want and parts.scheme and parts.scheme != want:
            return want + url[len(parts.scheme) :]
        return url


class HostNormalizer:
    """urlnormalizer-host: host aliasing (www.example.com ->
    example.com style rewrites from a broadcast alias table)."""

    name = "host"

    def __init__(self, aliases: dict | None = None):
        self.aliases = aliases or {}

    def __call__(self, url: str, scope: str = SCOPE_DEFAULT) -> str:
        try:
            parts = urlsplit(url)
        except ValueError:
            return url
        host = (parts.hostname or "").lower()
        target = self.aliases.get(host)
        if target and host:
            return url.replace("://" + host, "://" + target, 1)
        return url


class AjaxNormalizer:
    """urlnormalizer-ajax: '#!' hash-bang -> '_escaped_fragment_='
    (Google AJAX crawling scheme)."""

    name = "ajax"

    def __call__(self, url: str, scope: str = SCOPE_DEFAULT) -> str:
        i = url.find("#!")
        if i == -1:
            return url
        frag = url[i + 2 :]
        base = url[:i]
        sep = "&" if "?" in base else "?"
        from urllib.parse import quote

        return f"{base}{sep}_escaped_fragment_={quote(frag, safe='')}"


_REGISTRY = {
    "basic": BasicNormalizer,
    "regex": RegexNormalizer,
    "pass": PassNormalizer,
    "querystring": QuerystringNormalizer,
    "slash": SlashNormalizer,
    "protocol": ProtocolNormalizer,
    "host": HostNormalizer,
    "ajax": AjaxNormalizer,
}


def register_normalizer(name: str, factory) -> None:
    """User-extension hook (plugin-system analogue, SURVEY.md §2.11)."""
    _REGISTRY[name] = factory


class URLNormalizers:
    """Ordered chain with per-scope overrides and fixpoint looping
    (URLNormalizers.java:152-310; loop count default 1)."""

    def __init__(
        self,
        names: tuple = ("basic", "regex"),
        scope_overrides: dict[str, tuple] | None = None,
        loop_count: int = 1,
    ):
        # entries may be registry names OR already-built normalizer
        # instances (per-scope rule files like regex-normalize.xml.crawldb
        # become extra RegexNormalizer(rules) instances in that scope)
        self._chains: dict[str, list] = {}
        self._default = [_REGISTRY[n]() if isinstance(n, str) else n for n in names]
        for scope, ns in (scope_overrides or {}).items():
            self._chains[scope] = [_REGISTRY[n]() if isinstance(n, str) else n for n in ns]
        self.loop_count = loop_count

    def normalize(self, url: str, scope: str = SCOPE_DEFAULT) -> str | None:
        chain = self._chains.get(scope, self._default)
        for _ in range(max(1, self.loop_count)):
            prev = url
            for norm in chain:
                url = norm(url, scope)
                if url is None:
                    return None
            if url == prev:
                break
        return url

    def normalize_many(self, urls, scope: str = SCOPE_DEFAULT) -> list:
        """Batch normalize with a per-call memo (URL lists repeat)."""
        memo: dict[str, str | None] = {}
        out = []
        for u in urls:
            if u in memo:
                out.append(memo[u])
            else:
                v = self.normalize(u, scope)
                memo[u] = v
                out.append(v)
        return out
