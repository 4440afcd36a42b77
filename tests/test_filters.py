"""TestURLFilters analogue + regex-urlfilter default-rule conformance
(conf/regex-urlfilter.txt.template)."""

import numpy as np

from coherencebot_ray.functions.filters import (
    DescendantURLFilter,
    DomainDenylistURLFilter,
    DomainURLFilter,
    PrefixURLFilter,
    RegexURLFilter,
    SuffixURLFilter,
    URLFilters,
)

regex = RegexURLFilter()


def test_default_regex_rules():
    # protocols rejected
    assert not regex("file:///etc/passwd")
    assert not regex("ftp://foo.com/a")
    assert not regex("mailto:x@y.com")
    # media extensions rejected (case-insensitive)
    assert not regex("http://a.com/pic.JPG")
    assert not regex("http://a.com/x.css")
    assert not regex("http://a.com/x.zip")
    # query characters rejected
    assert not regex("http://a.com/x?y=1")
    assert not regex("http://a.com/x!y")
    # URL loop rejected
    assert not regex("http://a.com/seg/x/seg/y/seg/z/")
    # plain pages accepted
    assert regex("http://a.com/index.html")
    assert regex("https://b.org/path/doc.pdf")


def test_prefix_suffix_domain():
    assert PrefixURLFilter(("http://a.com/",))("http://a.com/x")
    assert not PrefixURLFilter(("http://a.com/",))("http://b.com/x")
    # suffix filter in reject mode (media suffixes)
    sf = SuffixURLFilter((".jpg", ".gif"))
    assert not sf("http://a.com/x.jpg")
    assert sf("http://a.com/x.html")
    df = DomainURLFilter(("example.com",))
    assert df("http://www.example.com/a")
    assert not df("http://other.org/a")
    dd = DomainDenylistURLFilter(("spam.com",))
    assert not dd("http://x.spam.com/a")
    assert dd("http://ok.com/a")


def test_descendants_filter():
    d = DescendantURLFilter(("http://a.com/docs",))
    assert d("http://a.com/docs/x.pdf")
    assert d("http://a.com/docs")
    assert not d("http://a.com/other/x")


def test_chain_and_vectorized_mask():
    chain = URLFilters(names=("regex",))
    urls = ["http://a.com/ok.html", "http://a.com/bad.jpg", "ftp://x/y", "http://a.com/ok.html"]
    mask = chain.accept_many(urls)
    assert mask.tolist() == [True, False, False, True]
    assert mask.dtype == np.bool_


def test_path_filter():
    from coherencebot_ray.functions.filters import PathURLFilter

    p = PathURLFilter(("cgi-bin", "~user"))
    assert not p("http://a.com/cgi-bin/script")
    assert not p("http://a.com/~user/page")
    assert p("http://a.com/normal/page")
    assert p("http://a.com/x")  # empty rule set default: accept-all
    assert PathURLFilter()("http://a.com/cgi-bin/script")


def test_exemption_filter():
    from coherencebot_ray.functions.filters import ExemptionURLFilter

    e = ExemptionURLFilter((r"\.cdn\.example/",))
    assert e.is_exempt("http://img.cdn.example/x.png")
    assert not e.is_exempt("http://other.com/x")
    assert e("http://anything/")  # standalone: accept-all


# ---------------------------------------------------------------------------
# urlfilter-automaton (TestAutomatonURLFilter port: WholeWebCrawling +
# IntranetCrawling sample matrices over the true-DFA engine)
# ---------------------------------------------------------------------------

def _automaton(rules):
    from coherencebot_ray.functions.filters import AutomatonURLFilter

    return AutomatonURLFilter(rules=rules)


_WHOLE_WEB_RULES = [
    ("-", r"(file|ftp|mailto):.*"),
    ("-", r".*\.(gif|GIF|jpg|JPG|ico|ICO|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|MOV|exe)"),
    ("-", r".*[?*!@=].*"),
    ("+", r".*"),
]

_WHOLE_WEB_URLS = [
    (False, "file://home/jc/nutch/index.html"),
    (False, "ftp://ftp.apache.org/nutch.html"),
    (False, "mailto:jerome.charron@gmail.com"),
    (True, "news://any.news.server/comp.lang.java"),
    (True, "whois:/nutch.org"),
    (False, "http://www.nutch.org/nutch.gif"),
    (False, "http://www.nutch.org/nutch.eps"),
    (False, "http://www.nutch.org/nutch?q=nutch"),
    (True, "http://www.nutch.org/"),
    (True, "http://www.nutch.org/abcd/foo/bar/foo/bar/foo/"),
    (True, "http://www.nutch.org/abcd/foo/bar/xyz/foo/bar/foo/"),
]


def test_automaton_whole_web_matrix():
    """WholeWebCrawling.rules/.urls sample port: full-string DFA match,
    first matching rule wins."""
    f = _automaton(_WHOLE_WEB_RULES)
    for expected, url in _WHOLE_WEB_URLS:
        assert f(url) == expected, url
    # vectorized batch path agrees with the scalar path
    urls = np.array([u for _, u in _WHOLE_WEB_URLS], dtype=object)
    batch = f.accept_batch(urls)
    assert batch.tolist() == [e for e, _ in _WHOLE_WEB_URLS]


def test_automaton_intranet_matrix():
    """IntranetCrawling.rules/.urls sample port (accept only
    MY.DOMAIN.NAME hosts; '.' in the un-escaped domain matches any
    char, like the brics automaton does)."""
    rules = [
        ("-", r"(file|ftp|mailto):.*"),
        ("-", r".*\.(gif|GIF|jpg|JPG|ico|ICO|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|MOV|exe|png)"),
        ("-", r".*[?*!@=].*"),
        ("+", r"http://([a-z0-9]*\.)*MY.DOMAIN.NAME/.*"),
        ("-", r".*"),
    ]
    f = _automaton(rules)
    cases = [
        (False, "file://home/jc/nutch/index.html"),
        (False, "ftp://ftp.apache.org/nutch.html"),
        (False, "mailto:jerome.charron@gmail.com"),
        (False, "news://any.news.server/comp.lang.java"),
        (False, "whois:/nutch.org"),
        (True, "http://MY.DOMAIN.NAME/"),
        (True, "http://MY.DOMAIN.NAME/nutch"),
        (True, "http://www.MY.DOMAIN.NAME/"),
    ]
    for expected, url in cases:
        assert f(url) == expected, url


def test_automaton_chain_and_vectorized_accept_many():
    """The automaton plugin rides URLFilters: accept_many takes the
    vectorized accept_batch path and agrees with per-row accept."""
    from coherencebot_ray.functions.filters import URLFilters

    chain = URLFilters(instances=[_automaton(_WHOLE_WEB_RULES)])
    urls = np.array([u for _, u in _WHOLE_WEB_URLS], dtype=object)
    assert chain.accept_many(urls).tolist() == [e for e, _ in _WHOLE_WEB_URLS]
    assert [chain.accept(u) for u in urls] == [e for e, _ in _WHOLE_WEB_URLS]


def test_automaton_regex_features():
    """DFA engine corners: classes w/ ranges + negation, +, ?, nested
    groups/alternation, escaped dot, full-match anchoring."""
    f = _automaton([("+", r"[a-c]+x?(d|e[fg])*")])
    assert f("abcd") and f("axd") and f("a") and f("abefeg")
    assert not f("abxx") and not f("d") and not f("abcdz")
    neg = _automaton([("+", r"[^0-9]*")])
    assert neg("abc/:!") and not neg("ab3c")
    esc = _automaton([("+", r"a\.b")])
    assert esc("a.b") and not esc("axb")


def test_automaton_non_ascii_literal():
    """A non-ASCII literal compiles to its full UTF-8 byte sequence —
    it must match exactly that character, never another string whose
    byte at the position is the same lead byte; classes/escapes reject
    non-ASCII loudly instead of silently over-matching."""
    import pytest

    f = _automaton([("+", "a/é")])
    assert f("a/é")
    assert not f("a/è") and not f("a/e") and not f("a/Ã")
    rep = _automaton([("+", "(é)+x")])
    assert rep("ééx") and not rep("éx" + "\xc3") and not rep("x")
    with pytest.raises(ValueError):
        _automaton([("+", "[é]")])
    with pytest.raises(ValueError):
        _automaton([("+", r"\é")])


# ---------------------------------------------------------------------------
# TestSuffixURLFilter port (mode/case/path matrix)
# ---------------------------------------------------------------------------

_SUFFIXES = (".gif", ".jpg", ".js")
_SUFFIX_URLS = [
    "http://www.example.com/test.gif", "http://www.example.com/TEST.GIF",
    "http://www.example.com/test.jpg", "http://www.example.com/test.JPG",
    "http://www.example.com/test.html", "http://www.example.com/test.HTML",
    "http://www.example.com/test.html?q=abc.js",
    "http://www.example.com/test.js?foo=bar&baz=bar#12333",
]


def test_suffix_filter_matrix():
    from coherencebot_ray.functions.filters import SuffixURLFilter

    def run(**kw):
        f = SuffixURLFilter(_SUFFIXES, **kw)
        return [f(u) for u in _SUFFIX_URLS]

    # testModeAccept (case-sensitive, full-url): listed suffixes rejected
    assert run(mode_accept=True) == [False, True, False, True, True, True, False, True]
    # testModeReject: ONLY listed suffixes kept
    assert run(mode_accept=False) == [True, False, True, False, False, False, True, False]
    # testModeAcceptIgnoreCase
    assert run(mode_accept=True, ignore_case=True) == [False, False, False, False, True, True, False, True]
    # testModeRejectIgnoreCase
    assert run(mode_accept=False, ignore_case=True) == [True, True, True, True, False, False, True, False]
    # testModeAcceptAndPathFilter: query/fragment stripped
    assert run(mode_accept=True, filter_from_path=True) == [False, True, False, True, True, True, True, False]
    # testModeAcceptAndNonPathFilter (explicit default)
    assert run(mode_accept=True, filter_from_path=False) == [False, True, False, True, True, True, False, True]


def test_domain_filter_hosts_fixture():
    """TestDomainURLFilter port over the plugin's hosts.txt sample
    (suffix 'net'/'be', domain 'apache.org', host 'www.yahoo.com')."""
    from coherencebot_ray.functions.filters import (
        DomainDenylistURLFilter, DomainURLFilter)

    allowed = ("net", "apache.org", "be", "www.yahoo.com")
    f = DomainURLFilter(allowed)
    assert f("http://lucene.apache.org")
    assert f("http://hadoop.apache.org")
    assert f("http://www.apache.org")
    assert not f("http://www.google.com")
    assert not f("http://mail.yahoo.com")
    assert f("http://www.foobar.net")
    assert f("http://www.foobas.net")
    assert f("http://www.yahoo.com")
    assert f("http://www.foobar.be")
    assert not f("http://www.adobe.com")

    # the denylist plugin inverts the same fixture
    d = DomainDenylistURLFilter(allowed)
    assert not d("http://lucene.apache.org")
    assert d("http://www.google.com")


def test_path_filter_matrix():
    """TestPathURLFilter port: exact path-segment matching — 'reject'
    anywhere in the path rejects; 'rej'/'rejection' (different length)
    and query-only urls pass; empty segments are skipped."""
    from coherencebot_ray.functions.filters import PathURLFilter

    f = PathURLFilter(("reject",))
    cases = [
        (False, "https://www.example.com/section/reject"),
        (False, "https://www.example.com/reject"),
        (False, "https://www.example.com/section/reject?result=this-is-rejected"),
        (False, "https://www.example.com/reject/?result=this-is-rejected"),
        (False, "https://www.example.com/reject/someotherlastpath"),
        (False, "https://www.example.com//ok//reject/"),
        (True, "https://www.example.com?result=this-is-accepted"),
        (True, "https://www.example.com/rej"),
        (True, "https://www.example.com/rejection"),
        (True, "https://www.example.com//rej//"),
    ]
    for expected, url in cases:
        assert f(url) == expected, url


def test_fast_filter_reference_sample():
    """TestFastURLFilter port: the plugin's fast-urlfilter-test.txt
    rules against its test.urls matrix (Host/Domain grouping,
    DenyPath vs DenyPathQuery, Domain-dot globals, backref loop rule)."""
    from coherencebot_ray.functions.filters import FastURLFilter

    rules = """\
Host www.example.org
  DenyPath ^/path/to/be/excluded
  DenyPath ^/some/other/path/excluded

# Deny everything from *.example.com and example.com
Domain example.com
  DenyPath .*

Domain example.org
  DenyPathQuery /resource/.*?action=exclude

# exclude images from image server
Host i.example.org
  DenyPath (?i)\\.jpe?g$

# skip URLs with slash-delimited segment that repeats 3+ times, to break loops
Domain .
  DenyPath (/.+?)/.*?\\1/.*?\\1/
"""
    f = FastURLFilter.from_rules_text(rules)
    cases = [
        (False, "https://www.example.org/path/to/be/excluded"),
        (False, "https://www.example.org/path/to/be/excluded/continued"),
        (False, "https://www.example.org/some/other/path/excluded"),
        (True, "https://www.example.org/"),
        (True, "https://www.example.org/%20white%20space%20in%20path%20escaped/"),
        (False, "https://www1.example.com/"),
        (False, "https://www2.example.com/"),
        (False, "https://www.subnet.example.com/"),
        (True, "https://www.examplex.com/"),
        (True, "https://www.example.co.uk/"),
        (True, "https://www.example.com.za/"),
        (False, "https://www.example.org/resource/put?action=exclude"),
        (False, "http://www.nutch.org/abcd/foo/bar/foo/bar/foo/"),
        (False, "http://www.nutch.org/abcd/foo/bar/xyz/foo/bar/foo/"),
        (True, "http://www.nutch.org/abcd/foo1/bar1/zzz1/"),
        (False, "https://i.example.org/394d46ef76ee5c1bbad1cb98b40dc463d322c94d/c=0-129-2047-1285/635969287686419433-WORLD-40943944.JPG?width=3200&height=1680&fit=crop"),
        (False, "ftp://ftp.example.com/file1.txt"),
        (True, "ftp://ftp.example.org/file1.txt"),
        (True, "file:/path/file1.txt"),
        (True, "file:///path/file1.txt"),
        (False, "file:/abcd/foo/bar/xyz/foo/bar/foo/"),
    ]
    for expected, url in cases:
        assert f(url) == expected, url


def test_validator_reference_matrix():
    """TestUrlValidator port: scheme/authority/path/query validation."""
    from coherencebot_ray.functions.filters import ValidatorURLFilter

    v = ValidatorURLFilter()
    cases = [
        (False, "example.com/file[/].html"),
        (False, "http://www.example.com/space here.html"),
        (False, "/main.html"),
        (False, "www.example.com/main.html"),
        (False, "ftp:www.example.com/main.html"),
        (False, "http://999.000.456.32/nutch/trunk/README.txt"),
        (False, " http://www.example.com/ma|in\\toc.html"),
        (True, "https://issues.apache.org/jira/NUTCH-1127"),
        (True, "http://domain.tld/function.cgi?url=http://fonzi.com/"
               "&amp;name=Fonzi&amp;mood=happy&amp;coat=leather"),
        (True, "http://validator.w3.org/feed/check.cgi?url="
               "http%3A%2F%2Ffeeds.feedburner.com%2Fperishablepress"),
        (True, "ftp://alfa.bravo.pi/mike/check/plan.pdf"),
    ]
    for expected, url in cases:
        assert v(url) == expected, url


def test_prefix_filter_reference_matrix():
    """TestPrefixURLFilter port: scheme-prefix allow list."""
    f = PrefixURLFilter(("http://", "https://", "file://", "ftp://"))
    cases = [
        (True, "http://www.example.com/"), (True, "https://www.example.com/"),
        (True, "ftp://www.example.com/"), (True, "file://www.example.com/"),
        (False, "abcd://www.example.com/"), (False, "www.example.com/"),
    ]
    for expected, url in cases:
        assert f(url) == expected, url


def test_prefix_string_matcher_property():
    """TestPrefixStringMatcher port (seeded): the vectorized by-length
    matcher agrees with brute force on matches / shortest / longest
    over random prefix sets and inputs."""
    import numpy as np

    from coherencebot_ray.functions.filters import PrefixMatcher

    rng = np.random.RandomState(42)
    alphabet = "abcd"

    def rand_str(max_len):
        n = rng.randint(0, max_len + 1)
        return "".join(alphabet[i] for i in rng.randint(0, 4, n))

    for _ in range(20):
        prefixes = [rand_str(10) for _ in range(rng.randint(0, 100))]
        m = PrefixMatcher(prefixes)
        inputs = [rand_str(20) for _ in range(100)]
        batch = m.matches_batch(inputs)
        for s, got in zip(inputs, batch):
            hits = [p for p in prefixes if p and s.startswith(p)]
            assert m.matches(s) is bool(hits)
            assert bool(got) is bool(hits)
            if hits:
                assert m.longest_match(s) == max(hits, key=len)
                assert m.shortest_match(s) == min(hits, key=len)
            else:
                assert m.longest_match(s) is None
                assert m.shortest_match(s) is None


def test_suffix_string_matcher_property():
    """TestSuffixStringMatcher port (seeded), plus SuffixURLFilter
    batch/scalar agreement in both modes."""
    import numpy as np

    from coherencebot_ray.functions.filters import SuffixMatcher, SuffixURLFilter

    rng = np.random.RandomState(1838)
    alphabet = "abcd"

    def rand_str(max_len):
        n = rng.randint(0, max_len + 1)
        return "".join(alphabet[i] for i in rng.randint(0, 4, n))

    for _ in range(20):
        suffixes = [rand_str(10) for _ in range(rng.randint(0, 100))]
        m = SuffixMatcher(suffixes)
        inputs = [rand_str(20) for _ in range(100)]
        batch = m.matches_batch(inputs)
        for s, got in zip(inputs, batch):
            hits = [p for p in suffixes if p and s.endswith(p)]
            assert m.matches(s) is bool(hits)
            assert bool(got) is bool(hits)
            if hits:
                assert m.longest_match(s) == max(hits, key=len)
                assert m.shortest_match(s) == min(hits, key=len)
        for mode in (True, False):
            f = SuffixURLFilter(tuple(p for p in suffixes if p), mode_accept=mode)
            fb = f.accept_batch(inputs)
            assert [f(u) for u in inputs] == list(map(bool, fb))
