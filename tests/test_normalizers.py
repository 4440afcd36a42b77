"""Port of TestBasicURLNormalizer.java:44-216 and regex-normalize rules
(conf/regex-normalize.xml.template) — pins normalizer parity."""

import pytest

from coherencebot_ray.functions.normalizers import (
    BasicNormalizer,
    RegexNormalizer,
    URLNormalizers,
)

basic = BasicNormalizer()

BASIC_CASES = [
    # percent-encoding normalization
    ("http://foo.com/%66oo.html", "http://foo.com/foo.html"),
    ("http://foo.com/%66oo.htm%6c", "http://foo.com/foo.html"),
    ("http://foo.com/%66oo.ht%6dl", "http://foo.com/foo.html"),
    ("http://foo.com/%66oo.ht%6d%6c", "http://foo.com/foo.html"),
    ("http://foo.com/%66oo.htm%C0", "http://foo.com/foo.htm%C0"),
    ("http://foo.com/%66oo.htm%1A", "http://foo.com/foo.htm%1A"),
    ("http://foo.com/%66oo.htm%c0", "http://foo.com/foo.htm%C0"),
    ("http://foo.com/you%20too.html", "http://foo.com/you%20too.html"),
    ("http://foo.com/you too.html", "http://foo.com/you%20too.html"),
    ("http://foo.com/file.html%23cz", "http://foo.com/file.html%23cz"),
    ("http://foo.com/fast/dir%2fcz", "http://foo.com/fast/dir%2Fcz"),
    ("http://foo.com/!", "http://foo.com/%1A!"),
    ("http://foo.com/!", "http://foo.com/%01!"),
    ("http://mydomain.com/en Español.aspx", "http://mydomain.com/en%20Espa%C3%B1ol.aspx"),
    ("http://x.com/s?q=a%26b&m=10", "http://x.com/s?q=a%26b&m=10"),
    ("http://google.com/search?q=c%2B%2B", "http://google.com/search?q=c%2B%2B"),
    ("http://x.com/s?q=a+b", "http://x.com/s?q=a+b"),
    ("http://x.com/./a/../%66.html", "http://x.com/f.html"),
    ("http://x.com/?x[y]=1", "http://x.com/?x%5By%5D=1"),
    ("http://x.com/foo", "http://x.com/foo%C2%80"),
    ("http://x.com/foo%c2%80", "http://x.com/foo%C2%80"),
    # basic
    (" http://foo.com/ ", "http://foo.com/"),
    ("HTTP://foo.com/", "http://foo.com/"),
    ("http://Foo.Com/index.html", "http://foo.com/index.html"),
    ("https://example%2Ecom/", "https://example.com/"),
    # ports
    ("http://foo.com:80/index.html", "http://foo.com/index.html"),
    ("https://foo.com:443/index.html", "https://foo.com/index.html"),
    ("http://foo.com:81/", "http://foo.com:81/"),
    ("http://example.com:/", "http://example.com/"),
    # empty path, fragment
    ("http://foo.com", "http://foo.com/"),
    ("http://foo.com/foo.html#ref", "http://foo.com/foo.html"),
    # dot segments
    ("http://foo.com/aa/./foo.html", "http://foo.com/aa/foo.html"),
    ("http://foo.com/aa/../", "http://foo.com/"),
    ("http://foo.com/aa/bb/../", "http://foo.com/aa/"),
    ("http://foo.com/aa/bb/cc/../../foo.html", "http://foo.com/aa/foo.html"),
    ("http://foo.com/aa/bb/../cc/dd/../ee/foo.html", "http://foo.com/aa/cc/ee/foo.html"),
    ("http://foo.com/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/../../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/../aa/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/aa/../../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/a..a/foo.html", "http://foo.com/a..a/foo.html"),
    ("http://foo.com/a..a/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/foo.foo/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com//aa/bb/foo.html", "http://foo.com/aa/bb/foo.html"),
    ("http://foo.com/aa//bb/foo.html", "http://foo.com/aa/bb/foo.html"),
    ("http://foo.com////aa////bb////foo.html", "http://foo.com/aa/bb/foo.html"),
    ("http://example.com?a=1", "http://example.com/?a=1"),
    # unsafe characters in query
    ("http://www.example.com/a/c/../b/search?q=foobar|", "http://www.example.com/a/b/search?q=foobar%7C"),
    ("http://www.example.com/a/c/../b/search?q=foobar\"", "http://www.example.com/a/b/search?q=foobar%22"),
    ("http://www.example.com/a/c/../b/search?q=foobar^", "http://www.example.com/a/b/search?q=foobar%5E"),
    ("http://www.example.com/a/c/../b/search?q=foobar<", "http://www.example.com/a/b/search?q=foobar%3C"),
    ("http://www.example.com/a/c/../b/search?q=foobar>", "http://www.example.com/a/b/search?q=foobar%3E"),
    ("http://www.example.com/a/c/../b/search?q=foobar`", "http://www.example.com/a/b/search?q=foobar%60"),
    # broken percent escapes are kept literally
    ("http://www.example.com/search?q=foobar%25", "http://www.example.com/search?q=foobar%25"),
    ("http://www.example.com/search?q=foobar%252", "http://www.example.com/search?q=foobar%252"),
]


@pytest.mark.parametrize("raw,expected", BASIC_CASES)
def test_basic_normalizer(raw, expected):
    assert basic(raw) == expected


def test_basic_trailing_dot_host():
    assert BasicNormalizer(trim_trailing_dot=True)("http://foo.com./x") == "http://foo.com/x"


def test_malformed_returns_none():
    assert basic("not a url") is None
    assert basic("") == ""


REGEX_CASES = [
    # session id removal (regex-normalize.xml.template:33)
    ("http://a.com/x?PHPSESSID=abc123&y=1", "http://a.com/x?y=1"),
    ("http://a.com/x;jsessionid=deadbeef?y=1", "http://a.com/x?y=1"),
    # anchors
    ("http://a.com/page#sec2", "http://a.com/page"),
    # ?& -> ?
    ("http://a.com/x?&y=1", "http://a.com/x?y=1"),
    # multiple ampersands
    ("http://a.com/x?a=1&&&b=2", "http://a.com/x?a=1&b=2"),
    # trailing [?&.]
    ("http://a.com/x?", "http://a.com/x"),
    # duplicate slashes (not after protocol colon)
    ("http://a.com/a//b///c", "http://a.com/a/b/c"),
]


@pytest.mark.parametrize("raw,expected", REGEX_CASES)
def test_regex_normalizer(raw, expected):
    assert RegexNormalizer()(raw) == expected


def test_chain_scope_override_and_order():
    """TestURLNormalizers.java:29-71 analogue: chain order + scope fallback."""
    chain = URLNormalizers(
        names=("basic", "regex"),
        scope_overrides={"inject": ("basic",)},
    )
    # default scope applies both
    assert chain.normalize("HTTP://A.com//x?&y=1#frag") == "http://a.com/x?y=1"
    # inject scope applies only basic (regex session-id rule skipped)
    assert (
        chain.normalize("http://a.com/x;jsessionid=1?y=2", scope="inject")
        == "http://a.com/x;jsessionid=1?y=2"
    )
    # unknown scope falls back to the default chain
    assert chain.normalize("http://a.com/x?&y=1", scope="nope") == "http://a.com/x?y=1"


def test_normalize_many_memoizes():
    chain = URLNormalizers()
    urls = ["http://a.com/x?&y=1"] * 5 + ["http://B.com/"]
    out = chain.normalize_many(urls)
    assert out == ["http://a.com/x?y=1"] * 5 + ["http://b.com/"]
