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

    p = PathURLFilter()
    assert not p("http://a.com/cgi-bin/script")
    assert not p("http://a.com/~user/page")
    assert p("http://a.com/normal/page")


def test_exemption_filter():
    from coherencebot_ray.functions.filters import ExemptionURLFilter

    e = ExemptionURLFilter((r"\.cdn\.example/",))
    assert e.is_exempt("http://img.cdn.example/x.png")
    assert not e.is_exempt("http://other.com/x")
    assert e("http://anything/")  # standalone: accept-all
