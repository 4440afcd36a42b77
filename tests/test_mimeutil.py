"""Ports of TestMimeUtil.java (util) and TestMoreIndexingFilter.java
(src/plugin/index-more) against functions/mimeutil.py and the upgraded
MoreIndexingFilter."""

import json

import numpy as np
import pandas as pd

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.functions.indexing import MoreIndexingFilter
from coherencebot_ray.functions.mimeutil import (
    auto_resolve_content_type,
    clean_mime_type,
    mime_from_extension,
    mime_from_magic,
    mime_parts,
)


# ---------------------------------------------------------------------------
# MimeUtil (TestMimeUtil port, adapted to the table-backed resolver)
# ---------------------------------------------------------------------------

HTML = b"<!DOCTYPE html>\n<html>\n<head>\n</head>\n<body>x</body></html>"


def test_clean_mime_type():
    assert clean_mime_type("text/html; charset=UTF-8") == "text/html"
    assert clean_mime_type("  TEXT/HTML ") == "text/html"
    assert clean_mime_type(None) is None
    assert clean_mime_type("") is None


def test_with_mime_magic():
    """testWithMimeMagic: content sniffing resolves html with no url
    extension and no header."""
    assert auto_resolve_content_type(None, "http://www.example.com/", HTML) == "text/html"


def test_without_mime_magic():
    """testWithoutMimeMagic: url extension resolves when magic off."""
    assert auto_resolve_content_type(
        None, "http://www.example.com/page.html", None, use_magic=False) == "text/html"
    assert auto_resolve_content_type(
        "application/octet-stream", "http://www.example.com/doc.pdf",
        None, use_magic=False) == "application/pdf"


def test_only_mime_magic():
    """testOnlyMimeMagic: magic overrides an unspecific header type."""
    assert auto_resolve_content_type(
        "application/octet-stream", "http://www.example.com/", HTML) == "text/html"
    assert auto_resolve_content_type(
        None, "http://www.example.com/x", b"%PDF-1.4 ...") == "application/pdf"


def test_magic_overrides_disagreeing_header():
    """MimeUtil:202-208 — a non-octet-stream magic type that disagrees
    with the resolved type wins, even over a specific header (header
    text/plain + HTML magic resolves to text/html)."""
    assert auto_resolve_content_type("text/plain", "http://e.com/x.html", HTML) == "text/html"
    # agreeing magic keeps the resolved type; unrecognized content
    # (magic None) keeps the specific header type
    assert auto_resolve_content_type("text/html", "http://e.com/x.html", HTML) == "text/html"
    assert auto_resolve_content_type("text/plain", "http://e.com/x", b"plain old text") == "text/plain"


def test_binary_magic():
    assert mime_from_magic(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) == "image/png"
    assert mime_from_magic(b"GIF89a" + b"\x00" * 8) == "image/gif"
    assert mime_from_magic(b"\xff\xd8\xff\xe0" + b"\x00" * 8) == "image/jpeg"
    assert mime_from_magic(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image/webp"
    assert mime_from_magic(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "audio/vnd.wave"
    assert mime_from_magic(b"\x1f\x8b\x08" + b"\x00" * 8) == "application/gzip"
    assert mime_from_magic(b"plain old text") is None


def test_extension_fallback_octet_stream():
    assert auto_resolve_content_type(None, "http://e.com/mystery", None) == "application/octet-stream"
    assert mime_from_extension("http://e.com/feed.rss?page=2") == "application/rss+xml"


# ---------------------------------------------------------------------------
# MoreIndexingFilter (TestMoreIndexingFilter port)
# ---------------------------------------------------------------------------


def _doc(**kw):
    row = {"url": "http://nutch.apache.org/index.html", "text": "foo bar",
           "fetch_time": 0, "content_type": None, "metadata": None,
           "title": None}
    row.update(kw)
    return pd.DataFrame([row])


def _apply(df, **extra):
    out, keep = MoreIndexingFilter().apply(df, CrawlConfig(extra=extra))
    assert keep.all()
    return out.iloc[0]


def test_content_type_cleaning():
    """testContentType: charset parameter stripped."""
    assert _apply(_doc(content_type="text/html"))["contentType"] == "text/html"
    assert _apply(_doc(content_type="text/html; charset=UTF-8"))["contentType"] == "text/html"


def test_get_parts():
    """testGetParts."""
    assert mime_parts("text/html") == ["text", "html"]


def test_no_parts():
    """testNoParts (NUTCH-901): parts suppressed by config; the full
    type is still resolved (from the url extension here)."""
    row = _apply(_doc(), more_index_mimetype_parts=False)
    assert row["contentType"] == "text/html"
    assert "primaryType" not in row.index and "subType" not in row.index
    row2 = _apply(_doc())
    assert row2["primaryType"] == "text" and row2["subType"] == "html"


def test_content_disposition_title():
    """testContentDispositionTitle + NUTCH-1140: filename becomes the
    title only when the doc has none."""
    md = json.dumps({"Content-Disposition": "filename=filename.ext"})
    row = _apply(_doc(url="http://www.example.com/", metadata=md))
    assert row["title"] == "filename.ext"
    row2 = _apply(_doc(url="http://www.example.com/", metadata=md, title="title"))
    assert row2["title"] == "title"
