"""MimeUtil analogue (util/MimeUtil.java): content-type cleaning,
extension-based resolution, and magic-byte sniffing — the reference
wraps Tika's MimeTypes registry; this is a self-contained table + the
byte probes already used by ops/media.py.

autoResolveContentType precedence (MimeUtil.java:123-180): clean the
protocol-supplied type; when it is absent/unspecific
(application/octet-stream) fall back to the url-extension guess; when
magic is enabled and the sniffed type disagrees with an unspecific or
extension-derived type, the magic type wins.
"""

from __future__ import annotations

import re

# the web-common subset of Tika's extension registry
_EXT_TYPES = {
    "html": "text/html", "htm": "text/html", "xhtml": "application/xhtml+xml",
    "txt": "text/plain", "text": "text/plain", "csv": "text/csv",
    "css": "text/css", "js": "application/javascript",
    "json": "application/json", "xml": "application/xml",
    "rss": "application/rss+xml", "atom": "application/atom+xml",
    "pdf": "application/pdf",
    "doc": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls": "application/vnd.ms-excel",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "rtf": "application/rtf", "odt": "application/vnd.oasis.opendocument.text",
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "bmp": "image/bmp", "webp": "image/webp",
    "svg": "image/svg+xml", "ico": "image/vnd.microsoft.icon",
    "mp3": "audio/mpeg", "wav": "audio/vnd.wave", "ogg": "audio/ogg",
    "mp4": "video/mp4", "webm": "video/webm",
    "zip": "application/zip", "gz": "application/gzip",
    "tar": "application/x-tar", "bz2": "application/x-bzip2",
    "warc": "application/warc",
}

# magic-byte prefixes, longest first
_MAGIC = (
    (b"%PDF-", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"BM", "image/bmp"),
    (b"\x1f\x8b", "application/gzip"),
    (b"PK\x03\x04", "application/zip"),
    (b"{\\rtf", "application/rtf"),
)

_UNSPECIFIC = ("application/octet-stream", "application/x-download", "")


def clean_mime_type(raw: str | None) -> str | None:
    """MimeUtil.cleanMimeType: strip parameters (charset etc.), trim,
    lowercase the type token."""
    if not raw:
        return None
    t = raw.split(";", 1)[0].strip().lower()
    return t or None


def mime_from_extension(url: str) -> str | None:
    path = url.split("?", 1)[0].split("#", 1)[0]
    seg = path.rsplit("/", 1)[-1]
    if "." not in seg:
        return None
    return _EXT_TYPES.get(seg.rsplit(".", 1)[-1].lower())


def mime_from_magic(content: bytes | None) -> str | None:
    if not content:
        return None
    head = bytes(content[:16])
    for magic, t in _MAGIC:
        if head.startswith(magic):
            return t
    # riff containers + html/xml sniff
    if head.startswith(b"RIFF") and content[8:12] == b"WEBP":
        return "image/webp"
    if head.startswith(b"RIFF") and content[8:12] == b"WAVE":
        return "audio/vnd.wave"
    lower = bytes(content[:256]).lstrip().lower()
    if lower.startswith((b"<!doctype html", b"<html")):
        return "text/html"
    if lower.startswith(b"<?xml"):
        return "application/xml"
    return None


def auto_resolve_content_type(header_type: str | None, url: str,
                              content: bytes | None = None,
                              use_magic: bool = True) -> str:
    """MimeUtil.autoResolveContentType(:123-180). Never returns None:
    the final fallback is application/octet-stream, like the
    reference's MimeTypes.OCTET_STREAM."""
    cleaned = clean_mime_type(header_type)
    resolved = cleaned
    if resolved is None or resolved in _UNSPECIFIC:
        resolved = mime_from_extension(url) or resolved
    if use_magic:
        magic = mime_from_magic(content)
        # MimeUtil:202-208: a non-null, non-octet-stream magic type that
        # DISAGREES with the resolved type wins — even over a specific
        # header (header text/plain + HTML magic resolves to text/html).
        # mime_from_magic never emits octet-stream (returns None when
        # the content is unrecognized), so only the None check is needed.
        if magic is not None and magic != resolved:
            resolved = magic
    return resolved or "application/octet-stream"


def mime_parts(content_type: str) -> list[str]:
    """MoreIndexingFilter.getParts: 'text/html' -> ['text', 'html'];
    subtype suffixes split too ('application/rss+xml' ->
    ['application', 'rss+xml'])."""
    return content_type.split("/") if content_type else []
