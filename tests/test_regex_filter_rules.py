"""TestRegexURLFilter port (urlfilter-regex/src/test + RegexURLFilterBase
.java:240-286): rule-file parsing, first-match-wins, and NUTCH-1838
host/domain-scoped rule blocks — sample rule/url files embedded
verbatim from src/plugin/urlfilter-regex/sample/ (Apache-2.0 test
data)."""

import pytest

from coherencebot_ray.functions.filters import (
    RegexURLFilter,
    parse_regex_filter_rules,
)

FIXTURES = {'WholeWebCrawling': ("# The default url filter.\n# Better for whole-internet crawling.\n\n# Each non-comment, non-blank line contains a regular expression\n# prefixed by '+' or '-'.  The first matching pattern in the file\n# determines whether a URL is included or ignored.  If no pattern\n# matches, the URL is ignored.\n\n# skip file: ftp: and mailto: urls\n-^(?:file|ftp|mailto):\n\n# skip image and other suffixes we can't yet parse\n-(?i)\\.(?:gif|jpg|ico|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|exe)$\n\n# skip URLs containing certain characters as probable queries, etc.\n-[?*!@=]\n\n# skip URLs with slash-delimited segment that repeats 3+ times, to break loops\n-.*(/.+?)/.*?\\1/.*?\\1/\n\n# accept anything else\n+.\n", '-file://home/jc/nutch/index.html\n-ftp://ftp.apache.org/nutch.html\n-mailto:jerome.charron@gmail.com\n+news://any.news.server/comp.lang.java\n+whois:/nutch.org\n-http://www.nutch.org/nutch.gif\n-http://www.nutch.org/nutch.eps\n-http://www.nutch.org/nutch?q=nutch\n+http://www.nutch.org/\n-http://www.nutch.org/abcd/foo/bar/foo/bar/foo/\n-http://www.nutch.org/abcd/foo/bar/xyz/foo/bar/foo/\n'), 'IntranetCrawling': ("# The url filter file used by the crawl command.\n\n# Better for intranet crawling.\n# Be sure to change MY.DOMAIN.NAME to your domain name.\n\n# Each non-comment, non-blank line contains a regular expression\n# prefixed by '+' or '-'.  The first matching pattern in the file\n# determines whether a URL is included or ignored.  If no pattern\n# matches, the URL is ignored.\n\n# skip file:, ftp:, & mailto: urls\n-^(?:file|ftp|mailto):\n\n# skip image and other suffixes we can't yet parse\n-(?i)\\.(?:gif|jpg|ico|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|exe|png)$\n\n# skip URLs containing certain characters as probable queries, etc.\n-[?*!@=]\n\n# skip URLs with slash-delimited segment that repeats 3+ times, to break loops\n-.*(/.+?)/.*?\\1/.*?\\1/\n\n# accept hosts in MY.DOMAIN.NAME\n+^https?://(?:[a-z0-9]*\\.)*MY.DOMAIN.NAME/\n\n# skip everything else\n-.\n", '-file://home/jc/nutch/index.html\n-ftp://ftp.apache.org/nutch.html\n-mailto:jerome.charron@gmail.com\n-news://any.news.server/comp.lang.java\n-whois:/nutch.org\n+http://MY.DOMAIN.NAME/\n+http://MY.DOMAIN.NAME/nutch\n+http://www.MY.DOMAIN.NAME/\n'), 'nutch1838': ("# Skip all url's containing skip for example.org\n> www.example.org\n-skip\n<\n\n# Allow all url's containing skip for example.com\n> www.example.com\n+skip\n<\n\n# Skip everything else\n-.", '-http://www.example.org/skip-me-now\n+http://www.example.com/noone-can-skip-me\n-http://www.example.nl/i-am-filtered')}


def matrix(urls_text):
    out = []
    for line in urls_text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        out.append((line[1:], line[0] == "+"))
    return out


CASES = [
    (name, url, expected)
    for name, (_, urls) in FIXTURES.items()
    for url, expected in matrix(urls)
]


@pytest.mark.parametrize("name,url,expected", CASES)
def test_regex_filter_samples(name, url, expected):
    f = RegexURLFilter.from_rule_lines(FIXTURES[name][0])
    assert f(url) is expected, (name, url)


def test_scoped_rules_parse():
    rules = parse_regex_filter_rules(FIXTURES["nutch1838"][0])
    # two scoped rules + the global catch-all
    scopes = [r[2] for r in rules]
    assert scopes == ["www.example.org", "www.example.com", None]


def test_invalid_first_char_raises():
    with pytest.raises(ValueError):
        parse_regex_filter_rules("*boom")


def test_domain_scope_matches_subhost():
    # a rule scoped to the DOMAIN applies to any host under it
    f = RegexURLFilter.from_rule_lines(
        "> example.org\n-skip\n<\n+."
    )
    assert f("http://deep.www.example.org/skip-me") is False
    assert f("http://other.net/skip-me") is True
