"""Ports of TestGZIPUtils.java, TestHttpDateFormat.java,
TestEncodingDetector.java, TestTableUtil.java (src/test/.../util, net)
and TestOutlinkExtractor.java, against functions/webutil.py and the
parse-stage text outlink extractor."""

import pytest

from coherencebot_ray.functions.webutil import (
    gzip_unzip,
    gzip_unzip_best_effort,
    gzip_zip,
    guess_encoding,
    http_date_to_ms,
    inflate_best_effort,
    ms_to_http_date,
    reverse_url,
    sniff_meta_charset,
    unreverse_url,
)
from coherencebot_ray.stages.parse import extract_text_outlinks

SHORT = b"a" * 16 + b"b" * 21 + b"c" * 16
LONGER = SHORT * 12
WEBPAGE = (b"<!DOCTYPE html PUBLIC \"-//W3C//DTD HTML 4.01 Transitional//EN\">\n"
           b"<html><head><title>gzip test</title></head>"
           b"<body><p>" + b"lorem ipsum dolor sit amet " * 40 + b"</p></body></html>")


# ---------------------------------------------------------------------------
# GZIPUtils
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("data", [SHORT, LONGER, WEBPAGE])
def test_gzip_zip_unzip(data):
    """TestGZIPUtils.testZipUnzip: round-trip, compressed smaller."""
    z = gzip_zip(data)
    assert len(z) < len(data)
    assert gzip_unzip(z) == data


@pytest.mark.parametrize("data", [SHORT, LONGER, WEBPAGE])
def test_gzip_unzip_best_effort(data):
    """testZipUnzipBestEffort: full round-trip via the tolerant path."""
    assert gzip_unzip_best_effort(gzip_zip(data)) == data


@pytest.mark.parametrize("data", [SHORT, LONGER, WEBPAGE])
def test_gzip_truncation(data):
    """testTruncation: any truncation of the compressed stream yields
    None or a prefix of the original, never garbage or an exception."""
    z = gzip_zip(data)
    for cut in range(0, len(z), max(1, len(z) // 17)):
        out = gzip_unzip_best_effort(z[:cut])
        assert out is None or data.startswith(out)


@pytest.mark.parametrize("data", [SHORT, LONGER, WEBPAGE])
def test_gzip_limit(data):
    """testLimit: the size_limit caps the decompressed output."""
    z = gzip_zip(data)
    out = gzip_unzip_best_effort(z, size_limit=10)
    assert out == data[:10]


def test_gzip_garbage_returns_none():
    assert gzip_unzip_best_effort(b"this is not gzip data at all") is None


def test_inflate_best_effort():
    import zlib

    data = LONGER
    assert inflate_best_effort(zlib.compress(data)) == data
    # raw deflate (no zlib header) also accepted
    c = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    raw = c.compress(data) + c.flush()
    assert inflate_best_effort(raw) == data
    assert inflate_best_effort(b"garbage!!") is None


# ---------------------------------------------------------------------------
# HttpDateFormat
# ---------------------------------------------------------------------------

DATE_STRING = "Sun, 06 Nov 1994 08:49:37 GMT"
DATE_MILLIS = 784111777000


def test_http_date_format():
    """TestHttpDateFormat.testHttpDateFormat."""
    assert http_date_to_ms(DATE_STRING) == DATE_MILLIS
    assert ms_to_http_date(DATE_MILLIS) == DATE_STRING
    assert http_date_to_ms("Sun, 6 Nov 1994 08:49:37 GMT") == DATE_MILLIS


def test_http_date_format_exception():
    """testHttpDateFormatException: invalid date raises."""
    with pytest.raises(ValueError):
        http_date_to_ms("this is not a valid date")


def test_http_date_format_timezone():
    """testHttpDateFormatTimeZone (NUTCH-2814): parsing a non-GMT zone
    must not disturb the canonical GMT formatting."""
    http_date_to_ms("Mon, 21 Oct 2019 03:18:16 PDT")
    assert ms_to_http_date(DATE_MILLIS) == DATE_STRING


# ---------------------------------------------------------------------------
# EncodingDetector
# ---------------------------------------------------------------------------

CONTENT = "çñôöøДЛжҶ".encode("utf-8")


def test_encoding_guessing():
    """TestEncodingDetector.testGuessing: clue precedence with
    auto-detection disabled, then enabled."""
    # no information -> default
    assert guess_encoding(CONTENT, None, "windows-1252") == "windows-1252"
    # header charset clue wins
    assert guess_encoding(CONTENT, "text/plain; charset=UTF-16", "windows-1252") == "utf-16"
    # sniffed clue when no header charset
    assert guess_encoding(CONTENT, None, "windows-1252", sniffed="windows-1254") == "windows-1254"
    # autodetection enabled: the content is valid multi-byte UTF-8, so
    # detection (confidence >= 50) overrides both clues
    assert guess_encoding(CONTENT, "text/plain; charset=UTF-16", "windows-1252",
                          sniffed="utf-32", min_confidence=50) == "utf-8"


def test_encoding_bom_detection():
    assert guess_encoding(b"\xef\xbb\xbfhello", None, "ascii", min_confidence=50) == "utf-8"
    assert guess_encoding(b"\xff\xfeh\x00i\x00", None, "ascii", min_confidence=50) == "utf-16"


def test_encoding_ascii_weak_evidence():
    """Pure-ASCII content (confidence 15) does not clear a 50 bar."""
    assert guess_encoding(b"just ascii", "text/plain; charset=KOI8-R", "utf-8",
                          min_confidence=50) == "koi8-r"


def test_sniff_meta_charset():
    html = b'<html><head><meta charset="ISO-8859-2"></head></html>'
    assert sniff_meta_charset(html) == "iso-8859-2"
    assert sniff_meta_charset(b"<html><head></head></html>") is None


# ---------------------------------------------------------------------------
# TableUtil (reverseUrl / unreverseUrl)
# ---------------------------------------------------------------------------

CASES = [
    ("http://foo.com/", "com.foo:http/"),
    ("http://foo.com:8900/", "com.foo:http:8900/"),
    ("ftp://bar.baz.com/", "com.baz.bar:ftp/"),
    ("http://bar.baz.com:8983/to/index.html?a=b&c=d",
     "com.baz.bar:http:8983/to/index.html?a=b&c=d"),
    ("http://foo.com?a=/a/b&c=0", "com.foo:http/?a=/a/b&c=0"),
    ("http://foo.com", "com.foo:http"),
    ("file:///var/www/index.html", ":file/var/www/index.html"),
]


@pytest.mark.parametrize("url,reversed_url", CASES)
def test_reverse_url(url, reversed_url):
    """TestTableUtil.testReverseUrl."""
    assert reverse_url(url) == reversed_url


@pytest.mark.parametrize("url,reversed_url", CASES)
def test_unreverse_url(url, reversed_url):
    """TestTableUtil.testUnreverseUrl (url 5 unreverses to the
    slash-normalized form, as in the reference)."""
    expect = "http://foo.com/?a=/a/b&c=0" if url == "http://foo.com?a=/a/b&c=0" else url
    assert unreverse_url(reversed_url) == expect


# ---------------------------------------------------------------------------
# OutlinkExtractor (TestOutlinkExtractor port)
# ---------------------------------------------------------------------------

def test_get_no_outlinks():
    assert extract_text_outlinks(None) == []
    assert extract_text_outlinks("") == []


def test_get_outlinks_http():
    """testGetOutlinksHttp: three urls found, scheme-less host not."""
    out = extract_text_outlinks(
        "Test with http://www.nutch.org/index.html is it found? "
        "What about www.google.com at http://www.google.de "
        "A longer URL could be http://www.sybit.com/solutions/portals.html")
    assert out == [
        "http://www.nutch.org/index.html",
        "http://www.google.de",
        "http://www.sybit.com/solutions/portals.html",
    ]


def test_get_outlinks_ftp():
    """testGetOutlinksFtp analogue: ftp urls kept, mailto dropped."""
    out = extract_text_outlinks(
        "Test with ftp://ftp.nutch.org is it found? "
        "mail me at mailto:bob@example.com please")
    assert out == ["ftp://ftp.nutch.org"]


def test_spellchecked_header_names():
    """TestSpellCheckedMetadata.testGetNormalizedName port: misspelled
    HTTP header names resolve to the canonical form within the
    Levenshtein threshold; unknown names pass through."""
    from coherencebot_ray.functions.webutil import normalize_header_name

    for variant in ("Content-Type", "ContentType", "Content-type",
                    "contenttype", "contentype", "contntype"):
        assert normalize_header_name(variant) == "Content-Type", variant
    assert normalize_header_name("Last-modified") == "Last-Modified"
    assert normalize_header_name("X-Custom-Header") == "X-Custom-Header"
