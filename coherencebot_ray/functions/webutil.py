"""Web/crawl utility parity: gzip handling, HTTP dates, charset
detection, and reversed-url keys.

- GZIPUtils          util/GZIPUtils.java (zip/unzip/unzipBestEffort
                     with truncated-stream tolerance and size limit)
- HttpDateFormat     net/protocols/HttpDateFormat.java (RFC 1123
                     format/parse, fixed GMT zone)
- EncodingDetector   util/EncodingDetector.java (clue list: header
                     charset > sniffed > default, optional content
                     auto-detection gated on a confidence threshold;
                     the reference uses ICU4J — here a BOM + strict
                     UTF-8 probe stands in, same clue precedence)
- TableUtil          util/TableUtil.java:43-130 (reverseUrl /
                     unreverseUrl host-reversed keys used for
                     same-domain locality in ordered stores)
"""

from __future__ import annotations

import email.utils
import gzip
import io
import re
import time
import zlib
from urllib.parse import urlsplit

# ---------------------------------------------------------------------------
# GZIPUtils
# ---------------------------------------------------------------------------

EXPECTED_COMPRESSION_RATIO = 5  # GZIPUtils.java:46


def gzip_zip(data: bytes) -> bytes:
    """GZIPUtils.zip: gzip-compress (deterministic header: mtime=0)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(data)
    return buf.getvalue()


def gzip_unzip(data: bytes) -> bytes:
    """GZIPUtils.unzip: strict decompression; raises on bad data."""
    return gzip.decompress(data)


def gzip_unzip_best_effort(data: bytes, size_limit: int | None = None) -> bytes | None:
    """GZIPUtils.unzipBestEffort(:57-102): returns whatever decompresses
    cleanly — tolerates truncated streams (partial output), returns
    None for non-gzip garbage, caps output at ``size_limit`` bytes."""
    try:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)  # gzip wrapper
        out = bytearray()
        chunk_src = memoryview(data)
        step = 4096
        for i in range(0, len(chunk_src), step):
            try:
                out += d.decompress(chunk_src[i:i + step])
            except zlib.error:
                break  # truncated/corrupt tail: keep what we have
            if size_limit is not None and len(out) >= size_limit:
                return bytes(out[:size_limit])
        try:
            out += d.flush()
        except zlib.error:
            pass
        if size_limit is not None:
            return bytes(out[:size_limit])
        return bytes(out) if out or _is_gzip(data) else None
    except zlib.error:
        return None


def _is_gzip(data: bytes) -> bool:
    return len(data) >= 2 and data[0] == 0x1F and data[1] == 0x8B


def inflate_best_effort(data: bytes) -> bytes | None:
    """DeflateUtils analogue: raw/zlib deflate, best effort."""
    for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):
        try:
            d = zlib.decompressobj(wbits)
            out = d.decompress(data)
            return out + d.flush()
        except zlib.error:
            continue
    return None


# ---------------------------------------------------------------------------
# HttpDateFormat
# ---------------------------------------------------------------------------


def http_date_to_ms(date_string: str) -> int:
    """HttpDateFormat.toLong: RFC 1123 (and tolerant variants, incl.
    single-digit day and named zones) -> epoch ms; ValueError if
    unparseable."""
    dt = email.utils.parsedate_to_datetime(date_string)
    if dt is None:
        raise ValueError(f"not a valid HTTP date: {date_string!r}")
    if dt.tzinfo is None:
        # parsedate treats unknown zones as naive; HttpDateFormat's
        # SimpleDateFormat assumes GMT for the canonical format
        import datetime as _dt

        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return int(dt.timestamp() * 1000)


def ms_to_http_date(millis: int) -> str:
    """HttpDateFormat.toString: fixed 'EEE, dd MMM yyyy HH:mm:ss GMT'."""
    t = time.gmtime(millis / 1000.0)
    return time.strftime("%a, %d %b %Y %H:%M:%S GMT", t)


# ---------------------------------------------------------------------------
# EncodingDetector
# ---------------------------------------------------------------------------

_CHARSET_RE = re.compile(r"charset=\s*[\"']?([^\s;\"']+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset=[\"']?([A-Za-z0-9_\-]+)", re.I)

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe\x00\x00", "utf-32"),
    (b"\x00\x00\xfe\xff", "utf-32"),
    (b"\xff\xfe", "utf-16"),
    (b"\xfe\xff", "utf-16"),
)

MIN_CONFIDENCE_DEFAULT = -1  # encodingdetector.charset.min.confidence


def detect_charset(content: bytes) -> tuple[str | None, int]:
    """Content-based detection stand-in for the reference's ICU4J
    CharsetDetector: BOM sniff (confidence 100), strict UTF-8 probe
    over the head (confidence scaled by non-ASCII evidence). Returns
    (charset|None, confidence 0-100)."""
    for bom, cs in _BOMS:
        if content.startswith(bom):
            return cs, 100
    head = content[:8192]
    try:
        decoded = head.decode("utf-8")
    except UnicodeDecodeError:
        return None, 0
    non_ascii = sum(1 for ch in decoded if ord(ch) > 127)
    if non_ascii:
        return "utf-8", 80  # multi-byte sequences decoded cleanly
    return "utf-8", 15  # pure ASCII: valid but weak evidence


def guess_encoding(content: bytes, content_type: str | None,
                   default: str, sniffed: str | None = None,
                   min_confidence: int = MIN_CONFIDENCE_DEFAULT) -> str:
    """EncodingDetector.guessEncoding(:186-257): auto-detected charset
    wins when its confidence clears the threshold; otherwise the first
    clue in priority order — Content-Type header charset, sniffed
    (e.g. <meta charset>), then the caller's default."""
    if min_confidence >= 0:
        cs, conf = detect_charset(content)
        if cs is not None and conf >= min_confidence:
            return cs.lower()
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            return m.group(1).lower()
    if sniffed:
        return sniffed.lower()
    return default.lower()


def sniff_meta_charset(content: bytes) -> str | None:
    """<meta charset=...> / <meta http-equiv Content-Type> sniff over
    the document head (EncodingDetector.autoDetectClues' html clue)."""
    m = _META_CHARSET_RE.search(content[:4096])
    return m.group(1).decode("ascii", "replace").lower() if m else None


# ---------------------------------------------------------------------------
# SpellCheckedMetadata header-name normalization
# ---------------------------------------------------------------------------

# HttpHeaders canonical names (metadata/HttpHeaders.java)
_CANONICAL_HEADERS = (
    "Content-Encoding", "Content-Language", "Content-Length",
    "Content-Location", "Content-Disposition", "Content-MD5",
    "Content-Type", "Last-Modified", "Location", "Transfer-Encoding",
)
_HEADER_IDX = {
    "".join(ch for ch in h.lower() if ch.isalnum()): h for h in _CANONICAL_HEADERS
}


def _levenshtein(a: str, b: str) -> int:
    if abs(len(a) - len(b)) > 3:
        return 99
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def normalize_header_name(name: str) -> str:
    """SpellCheckedMetadata.getNormalizedName(:95-130): map misspelled
    HTTP header names to their canonical form — exact normalized match
    first, then the closest known name within a Levenshtein threshold
    of ``min(3, len/3)``; unknown names pass through unchanged."""
    norm = "".join(ch for ch in name.lower() if ch.isalnum())
    hit = _HEADER_IDX.get(norm)
    if hit is not None:
        return hit
    threshold = min(3, len(norm) // 3)
    best, best_d = None, threshold + 1
    for known_norm, canonical in _HEADER_IDX.items():
        d = _levenshtein(norm, known_norm)
        if d < best_d:
            best, best_d = canonical, d
    return best if best is not None else name


# ---------------------------------------------------------------------------
# TableUtil reversed urls
# ---------------------------------------------------------------------------


def reverse_url(url: str) -> str:
    """TableUtil.reverseUrl(:60-86): 'http://bar.foo.com:8983/p?q'
    -> 'com.foo.bar:http:8983/p?q' (host dots reversed; same-domain
    rows sort adjacent in an ordered store)."""
    sp = urlsplit(url)
    host = sp.hostname or ""
    port = sp.port
    file = sp.path + (f"?{sp.query}" if sp.query else "")
    buf = ".".join(reversed(host.split("."))) if host else ""
    buf += f":{sp.scheme}"
    if port is not None:
        buf += f":{port}"
    if file and not file.startswith("/"):
        buf += "/"
    return buf + file


def unreverse_url(reversed_url: str) -> str:
    """TableUtil.unreverseUrl(:88-109)."""
    path_begin = reversed_url.find("/")
    if path_begin == -1:
        path_begin = len(reversed_url)
    sub = reversed_url[:path_begin]
    splits = sub.split(":")  # [reversed_host, protocol, port?]
    host = ".".join(reversed(splits[0].split("."))) if splits[0] else ""
    out = f"{splits[1]}://{host}"
    if len(splits) == 3:
        out += f":{splits[2]}"
    return out + reversed_url[path_begin:]
