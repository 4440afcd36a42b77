"""Ports of TestSubcollection.java (src/plugin/subcollection),
TestMetatagParser.java (src/plugin/parse-metatags) and
TestRegexParseFilter.java (src/plugin/parsefilter-regex)."""

import json

import pandas as pd

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.functions.subcollection import (
    CollectionManager,
    Subcollection,
    SubcollectionIndexingFilter,
)
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.stages.parse import ParseBatch, parse_html, parse_regex_rules

CUR = 1_700_000_000_000


# ---------------------------------------------------------------------------
# subcollection
# ---------------------------------------------------------------------------

def test_subcollection_filter():
    """TestSubcollection.testFilter: blacklist rejects, whitelist
    accepts, otherwise reject."""
    sc = Subcollection()
    sc.set_whitelist("www.nutch.org\nwww.apache.org")
    sc.set_blacklist("jpg\nwww.apache.org/zecret/")

    assert sc.filter("http://www.apache.org/index.html") == "http://www.apache.org/index.html"
    assert sc.filter("http://www.apache.org/zecret/index.html") is None
    assert sc.filter("http://www.apache.org/img/image.jpg") is None
    assert sc.filter("http://www.google.com/") is None


SUBCOLLECTIONS_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    "<subcollections>"
    "<subcollection>"
    "<name>nutch collection</name>"
    "<id>nutch</id>"
    "<whitelist>http://lucene.apache.org/nutch/\nhttp://wiki.apache.org/nutch/\n</whitelist>"
    "<blacklist>http://www.xxx.yyy\n</blacklist>"
    "</subcollection>"
    "</subcollections>"
)


def test_subcollection_xml_input():
    """TestSubcollection.testInput: XML config parse."""
    cm = CollectionManager.parse(SUBCOLLECTIONS_XML)
    assert len(cm.get_all()) == 1
    coll = cm.get_all()[0]
    assert coll.id == "nutch"
    assert coll.name == "nutch collection"
    assert coll.whitelist == [
        "http://lucene.apache.org/nutch/", "http://wiki.apache.org/nutch/"
    ]
    assert coll.filter("http://lucene.apache.org/nutch/") == "http://lucene.apache.org/nutch/"
    assert cm.get_sub_collections("http://lucene.apache.org/nutch/about.html") == [coll]
    assert cm.get_sub_collections("http://www.example.com/") == []


def test_subcollection_indexing_filter():
    """SubcollectionIndexingFilter: matched docs get the collection
    name; a subcollection parse-metadata value overrides matching."""
    cfg = CrawlConfig(extra={"subcollections_xml": SUBCOLLECTIONS_XML})
    df = pd.DataFrame([
        {"url": "http://lucene.apache.org/nutch/about.html", "metadata": None},
        {"url": "http://www.example.com/", "metadata": None},
        {"url": "http://www.example.com/tagged",
         "metadata": json.dumps({"subcollection": "manual"})},
    ])
    out, keep = SubcollectionIndexingFilter().apply(df, cfg)
    assert keep.all()
    assert out.iloc[0]["subcollection"] == ["nutch collection"]
    assert out.iloc[1]["subcollection"] == []
    assert out.iloc[2]["subcollection"] == ["manual"]


def test_subcollection_case_insensitive():
    """subcollection.case.insensitive lowercases both sides."""
    cfg_ci = {"subcollections_xml": SUBCOLLECTIONS_XML,
              "subcollection_case_insensitive": True}
    df = pd.DataFrame([{"url": "HTTP://LUCENE.APACHE.ORG/NUTCH/X", "metadata": None}])
    out, _ = SubcollectionIndexingFilter().apply(df, CrawlConfig(extra=cfg_ci))
    assert out.iloc[0]["subcollection"] == ["nutch collection"]
    out2, _ = SubcollectionIndexingFilter().apply(
        df, CrawlConfig(extra={"subcollections_xml": SUBCOLLECTIONS_XML}))
    assert out2.iloc[0]["subcollection"] == []


def test_subcollection_key_field():
    """A collection with a <key> element indexes under that field."""
    xml = ("<subcollections><subcollection>"
           "<name>keyed</name><id>k1</id><key>special</key>"
           "<whitelist>example.com</whitelist>"
           "</subcollection></subcollections>")
    df = pd.DataFrame([{"url": "http://example.com/x", "metadata": None}])
    out, _ = SubcollectionIndexingFilter().apply(
        df, CrawlConfig(extra={"subcollections_xml": xml}))
    assert out.iloc[0]["special"] == ["keyed"]
    assert out.iloc[0]["subcollection"] == []


# ---------------------------------------------------------------------------
# parse-metatags (TestMetatagParser port)
# ---------------------------------------------------------------------------

METATAGS_HTML = (
    b"<html><head><title>Test</title>"
    b'<meta name="description" content="This is a test of description"/>'
    b'<meta name="keywords" content="This is a test of keywords"/>'
    b"</head><body>x</body></html>"
)

MULTIVAL_HTML = (
    b"<html><head><title>Test</title>"
    b'<meta name="DC.creator" content="Doug Cutting"/>'
    b'<meta name="DC.creator" content="Michael Cafarella"/>'
    b'<meta name="keywords" content="robot d\'indexation"/>'
    b'<meta name="keywords" content="web crawler"/>'
    b'<meta name="keywords" content="Webcrawler"/>'
    b'<meta name="ignored" content="nope"/>'
    b"</head><body>x</body></html>"
)


def _fetch_row(url, content, ctype="text/html"):
    host = url.split("/")[2]
    return dict(
        url=url, host=host, part=0, status=CS.FETCH_SUCCESS, fetch_time=CUR,
        retries=0, fetch_interval=86400, score=1.0, signature=None,
        modified_time=0, gen_time=0, repr_url=None, fixed_interval=0,
        metadata=None, content=content, content_type=ctype, fetch_order=0,
    )


def _parse_meta(cfg, content):
    out = ParseBatch(cfg)(pd.DataFrame([_fetch_row("http://t.com/a.html", content)]))
    pm = out[out["status"] == CS.PARSE_META]
    if len(pm) == 0:
        return {}
    return json.loads(pm.iloc[0]["metadata"])


def test_metatags_defaults_star():
    """TestMetatagParser.testIt: description and keywords captured
    (metatags.names "*" takes everything)."""
    meta = _parse_meta(CrawlConfig(metatags_names=("*",)), METATAGS_HTML)
    assert meta["metatag.description"] == "This is a test of description"
    assert meta["metatag.keywords"] == "This is a test of keywords"


def test_metatags_multivalue():
    """TestMetatagParser.testMultiValueMetatags: repeated tags become
    multi-valued metadata; names filter is lowercase-matched."""
    cfg = CrawlConfig(metatags_names=("keywords", "DC.creator"))
    meta = _parse_meta(cfg, MULTIVAL_HTML)
    assert sorted(meta["metatag.dc.creator"]) == ["Doug Cutting", "Michael Cafarella"]
    assert sorted(meta["metatag.keywords"]) == [
        "Webcrawler", "robot d'indexation", "web crawler"]
    assert "metatag.ignored" not in meta


def test_metatags_disabled_by_default():
    """Empty metatags_names keeps the parse output metadata-free."""
    out = ParseBatch(CrawlConfig())(
        pd.DataFrame([_fetch_row("http://t.com/a.html", METATAGS_HTML)]))
    assert (out["status"] == CS.PARSE_META).sum() == 0


def test_metatags_http_equiv():
    """http-equiv tags are captured like named tags (MetaTagsParser
    http-equiv group)."""
    html = (b'<html><head><meta http-equiv="refresh" content="5"/>'
            b"</head><body>x</body></html>")
    meta = _parse_meta(CrawlConfig(metatags_names=("*",)), html)
    assert meta["metatag.refresh"] == "5"


# ---------------------------------------------------------------------------
# parsefilter-regex (TestRegexParseFilter port)
# ---------------------------------------------------------------------------

RULES = parse_regex_rules(
    "# Example configuration file for parsefilter-regex\n"
    "first\thtml\th1\n"
    "second\ttext\tblablabla\n"
)


def test_parse_regex_rules_format():
    assert RULES == (("first", "html", "h1"), ("second", "text", "blablabla"))


def test_regex_parsefilter_positive():
    """testPositiveFilter: h1 in html and blablabla in text -> true."""
    html = (b"<body><html><h1>nutch</h1>"
            b"<p>this is the extracted text blablabla</p></body></html>")
    meta = _parse_meta(CrawlConfig(parsefilter_regex_rules=RULES), html)
    assert meta["first"] == "true"
    assert meta["second"] == "true"


def test_regex_parsefilter_negative():
    """testNegativeFilter: h2 instead of h1, no blablabla -> false."""
    html = (b"<body><html><h2>nutch</h2>"
            b"<p>this is the extracted text no bla</p></body></html>")
    meta = _parse_meta(CrawlConfig(parsefilter_regex_rules=RULES), html)
    assert meta["first"] == "false"
    assert meta["second"] == "false"


def test_parse_html_meta_collection():
    """parse_html(want_meta=True) returns metatags + base href without
    disturbing the 3-tuple contract."""
    spans, links, text, metatags, base = parse_html(METATAGS_HTML, want_meta=True)
    assert ("description", "This is a test of description") in metatags
    assert base is None
    assert parse_html(METATAGS_HTML) == (spans, links, text)


# ---------------------------------------------------------------------------
# robots meta directives (TestRobotsMetaProcessor port)
# ---------------------------------------------------------------------------

ROBOTS_TESTS = [
    ('<META NAME="ROBOTS" CONTENT="NONE"> <META HTTP-EQUIV="PRAGMA" CONTENT="NO-CACHE">',
     (True, True, True)),
    ('<meta name="robots" content="all"> <meta http-equiv="pragma" content="no-cache">',
     (False, False, True)),
    ('<MeTa NaMe="RoBoTs" CoNtEnT="nOnE"> <MeTa HtTp-EqUiV="pRaGmA" cOnTeNt="No-CaChE">',
     (True, True, True)),
    ('<meta name="robots" content="none">', (True, True, False)),
    ('<meta name="robots" content="noindex,nofollow">', (True, True, False)),
    ('<meta name="robots" content="noindex,follow">', (True, False, False)),
    ('<meta name="robots" content="index,nofollow">', (False, True, False)),
    ('<meta name="robots" content="index,follow"> <base href="http://www.nutch.org/">',
     (False, False, False)),
    ('<meta name="robots"> <base href="http://www.nutch.org/base/">',
     (False, False, False)),
]


def test_robots_meta_matrix():
    """TestRobotsMetaProcessor.testRobotsMetaProcessor: the 9-case
    directive matrix, incl. case-insensitivity, none/all, and the
    content-less robots tag."""
    from coherencebot_ray.stages.parse import robots_meta_directives

    for i, (head, expected) in enumerate(ROBOTS_TESTS):
        html = f'<html><head><title>test page</title>{head}</head><body> some text</body></html>'
        _, _, _, metatags, base = parse_html(html.encode(), want_meta=True)
        assert robots_meta_directives(metatags) == expected, f"case {i}"
    # base capture (cases 8/9 of the reference matrix)
    _, _, _, _, base = parse_html(
        ('<html><head><base href="http://www.nutch.org/base/">'
         "</head><body>x</body></html>").encode(), want_meta=True)
    assert base == "http://www.nutch.org/base/"


def test_robots_meta_through_parse_stage():
    """noindex strips content spans + text (empty-signature semantics);
    nofollow drops every outlink/LINKED row; plain pages unaffected."""
    def page(directive):
        return (f'<html><head><title>T</title>{directive}</head><body>'
                f'<p>body text</p><a href="http://b.com/x">x</a>'
                f"</body></html>").encode()

    batch = pd.DataFrame([
        _fetch_row("http://a.com/plain", page("")),
        _fetch_row("http://a.com/noindex", page('<meta name="robots" content="noindex">')),
        _fetch_row("http://a.com/nofollow", page('<meta name="robots" content="nofollow">')),
    ])
    out = ParseBatch(CrawlConfig())(batch)
    docs = out[out["rtype"] == "doc"].set_index("url")
    kinds = lambda u: [s["kind"] for s in docs.loc[u, "spans"]]
    assert "text" in kinds("http://a.com/plain")
    assert kinds("http://a.com/noindex") == ["link"]  # content spans gone
    outlinks = out[out["rtype"] == "outlink"]
    assert "http://a.com/nofollow" not in set(outlinks["url"])
    assert "http://a.com/plain" in set(outlinks["url"])
    # nofollow also drops the doc's link SPANS (ADVICE r3: the reference
    # empties ParseData outlinks, which feeds LinksIndexingFilter too)
    assert "link" not in kinds("http://a.com/nofollow")
    assert "text" in kinds("http://a.com/nofollow")


def test_frameset_outlinks():
    """TestDOMContentUtils frameset case: every frame src becomes an
    outlink with an empty anchor."""
    html = (b"<html><head><title>my title</title></head>"
            b'<frameset rows="20,*"><frame src="http://f.com/top.html">'
            b'<frameset cols="20,*"><frame src="http://f.com/left.html">'
            b'<frame src="http://f.com/invalid.html"/></frameset>'
            b'<frame src="http://f.com/right.html"></frameset></html>')
    out = ParseBatch(CrawlConfig())(pd.DataFrame([_fetch_row("http://a.com/frames/", html)]))
    dsts = list(out[out["rtype"] == "outlink"]["dst"])
    assert dsts == [f"http://f.com/{p}.html" for p in ("top", "left", "invalid", "right")]


def test_area_iframe_outlinks_and_ignore_tags():
    """TestDOMContentUtils area/iframe case with the
    parser.html.outlinks.ignore_tags default (img/script/link out;
    area/iframe in); clearing the ignore set admits the img."""
    html = (b"<html><head><title>t</title></head><body>"
            b'<img src="http://m.com/logo.gif" usemap="#map1">'
            b'<map name="map1">'
            b'<area href="http://m.com/index.html">'
            b'<area href="http://m.com/bot.html"></map>'
            b'<iframe src="http://m.com/docs/index.html"></iframe>'
            b"</body></html>")
    out = ParseBatch(CrawlConfig())(pd.DataFrame([_fetch_row("http://a.com/maps/", html)]))
    dsts = set(out[out["rtype"] == "outlink"]["dst"])
    assert dsts == {"http://m.com/index.html", "http://m.com/bot.html",
                    "http://m.com/docs/index.html"}
    # clearing the ignore set admits the img at the parser level (the
    # url-filter chain then drops .gif per the default regex rules,
    # exactly like the reference's urlfilter-regex defaults)
    from coherencebot_ray.stages.parse import parse_html_full

    p, _ = parse_html_full(html)
    assert ("img", "http://m.com/logo.gif") in p.tag_links


def test_rel_nofollow_anchor_skipped():
    """TestDOMContentUtils nofollow case: <a rel=nofollow> is not an
    outlink; the normal anchor still is."""
    html = (b"<html><body>"
            b'<a href="http://x.com/skip" rel="nofollow">skip</a>'
            b'<a href="http://x.com/keep">keep</a>'
            b"</body></html>")
    out = ParseBatch(CrawlConfig())(pd.DataFrame([_fetch_row("http://a.com/", html)]))
    assert set(out[out["rtype"] == "outlink"]["dst"]) == {"http://x.com/keep"}


def test_heading_includes_nested_inline_nodes():
    """TestHeadingsParseFilter.testExtractHeadingFromNestedNodes port:
    the h1 heading text must include the content of inner span nodes."""
    html = (b"<html><head><title>test header with span element</title></head>"
            b"<body><h1>header with <span>span element</span></h1></body></html>")
    spans, _, _ = parse_html(html)
    headings = [s[1] for s in spans if s[0] == "heading"]
    assert headings == ["header with span element"]


RSS_SAMPLE = (
    b'<?xml version="1.0" encoding="UTF-8"?>'
    b'<rss version="2.0"><channel>'
    b"<title>TestChannel</title>"
    b"<item><title>Home Page of Chris Mattmann</title>"
    b"<link>http://www-scf.usc.edu/~mattmann/</link>"
    b"<description>Chris Mattmann's home page</description></item>"
    b"<item><title>Awesome Open Source Search Engine</title>"
    b"<link>http://www.nutch.org/</link>"
    b"<description>Yup, that is what it is</description></item>"
    b"</channel></rss>"
)


def test_feed_parser_outlinks():
    """TestFeedParser.testParseFetchChannel invariant kept by the
    single-doc layout (documented divergence: the reference emits one
    parse per item; here items are heading/text spans and their links
    are outlinks): both item urls must surface."""
    from coherencebot_ray.stages.parse import parse_feed

    spans, links, text = parse_feed(RSS_SAMPLE)
    urls = [h for h, _ in links]
    assert urls == ["http://www-scf.usc.edu/~mattmann/", "http://www.nutch.org/"]
    assert [s[1] for s in spans if s[0] == "heading"] == [
        "Home Page of Chris Mattmann", "Awesome Open Source Search Engine"]
    assert "TestChannel" in text


EXPECTED_EXT = "nutch rocks nutch rocks nutch rocks"


def test_ext_parser_cat_and_md5sum():
    """TestExtParser port: content piped alternately through 'cat'
    (text comes back verbatim) and 'md5sum' (text starts with the
    md5 of the content); undefined type and failing command raise."""
    import hashlib

    import pytest

    from coherencebot_ray.functions.extparser import ExtParseError, ExtParser

    p = ExtParser({
        "testcontenttype/cat": ("cat", 10),
        "testcontenttype/md5": ("md5sum", 10),
    })
    data = EXPECTED_EXT.encode()
    for _ in range(2):
        assert p.parse(data, "testContentType/cat") == EXPECTED_EXT
        assert p.parse(data, "testContentType/md5").startswith(
            hashlib.md5(data).hexdigest())
    with pytest.raises(ExtParseError):
        p.parse(data, "unknown/type")
    bad = ExtParser({"t/x": ("false", 5)})
    with pytest.raises(ExtParseError):
        bad.parse(data, "t/x")


def test_ext_parser_through_parse_stage():
    """cfg.ext_parsers routes matching content types through the
    command; the parse text and signature flow as usual, no outlinks."""
    cfg = CrawlConfig(ext_parsers=(("application/x-custom", "cat", 10),))
    row = _fetch_row("http://a.com/custom", EXPECTED_EXT.encode(),
                     ctype="application/x-custom")
    out = ParseBatch(cfg)(pd.DataFrame([row]))
    doc = out[out["rtype"] == "doc"].iloc[0]
    assert [s["text"] for s in doc["spans"] if s["kind"] == "text"] == [EXPECTED_EXT]
    assert (out["rtype"] == "outlink").sum() == 0


# ---------------------------------------------------------------------------
# html charset handling (TestHtmlParser encoding matrix port)
# ---------------------------------------------------------------------------

ENC_KEYWORDS = "français, español, русский язык, čeština, ελληνικά"
ENC_CONTENT = (f"<title>{ENC_KEYWORDS}</title>\n"
               f'<meta name="keywords" content="{ENC_KEYWORDS}" />\n'
               f"</head>\n<body><p>{ENC_KEYWORDS}</p></body>\n</html>")

ENC_PAGES = [
    ("HTML4 meta http-equiv, no quotes", "utf-8",
     ('<html>\n<head>\n<meta http-equiv=Content-Type '
      'content="text/html; charset=utf-8" />' + ENC_CONTENT).encode("utf-8")),
    ("HTML4 meta http-equiv, single quotes", "utf-8",
     ("<html>\n<head>\n<meta http-equiv='Content-Type' "
      "content='text/html; charset=utf-8' />" + ENC_CONTENT).encode("utf-8")),
    ("HTML5 meta charset", "utf-8",
     ('<!DOCTYPE html>\n<html>\n<head>\n<meta charset="utf-8">'
      + ENC_CONTENT).encode("utf-8")),
    ("HTML5 utf-8 BOM", "utf-8",
     ("﻿<!DOCTYPE html>\n<html>\n<head>\n" + ENC_CONTENT).encode("utf-8")),
    ("HTML5 utf-16 BOM", "utf-16",
     ("<!DOCTYPE html>\n<html>\n<head>\n" + ENC_CONTENT).encode("utf-16")),
    ("latin-1 with meta charset", "iso-8859-1",
     ('<html><head><meta charset="ISO-8859-1"><title>français, español</title>'
      "</head><body><p>x</p></body></html>").encode("iso-8859-1")),
]


def test_html_charset_matrix():
    """TestHtmlParser encoding cases: the declared/BOM charset decodes
    the page so the non-ASCII title survives intact."""
    for name, _cs, raw in ENC_PAGES:
        out = ParseBatch(CrawlConfig())(pd.DataFrame([_fetch_row("http://example.com/", raw)]))
        doc = out[out["rtype"] == "doc"].iloc[0]
        title = next(s["text"] for s in doc["spans"] if s["kind"] == "title")
        expected = ENC_KEYWORDS if "latin-1" not in name else "français, español"
        assert title == expected, name
        assert not title.startswith("﻿"), name


def test_protocol_relative_base_href():
    """NUTCH-2478: <base href="//host/"> resolves with the page's
    scheme before outlink resolution."""
    html = (b'<html><head><base href="//www.example.com/"></head>'
            b'<body><a href="index.html">outlink</a></body></html>')
    out = ParseBatch(CrawlConfig())(pd.DataFrame([_fetch_row("http://a.com/p", html)]))
    assert set(out[out["rtype"] == "outlink"]["dst"]) == {"http://www.example.com/index.html"}


PURE_JS = (
    'function selectProvider(form) {\n'
    '    provider = form.elements["searchProvider"].value;\n'
    '    if (provider == "lucid") {\n'
    '        form.action = "http://search.lucidimagination.com/p:nutch";\n'
    '    } else if (provider == "sl") {\n'
    '        form.action = "http://search-lucene.com/nutch";\n'
    '    }\n'
    '    document.cookie = "searchProvider=" + provider + "; path=/";\n'
    '}\n'
).encode()


def test_js_outlink_extraction_pure_js():
    """TestJSParseFilter.testJavaScriptOutlinkExtraction (.js file):
    exactly the two url string literals become outlinks."""
    from coherencebot_ray.stages.parse import extract_js_outlinks

    out = extract_js_outlinks(PURE_JS.decode(), "http://nutch.apache.org/t.js")
    assert out == ["http://search.lucidimagination.com/p:nutch",
                   "http://search-lucene.com/nutch"]


def test_js_outlinks_through_parse_stage():
    """Pure-JS documents parse to outlinks and no text; html <script>
    bodies contribute outlinks only with cfg.parse_js."""
    row = _fetch_row("http://a.com/t.js", PURE_JS, ctype="application/x-javascript")
    out = ParseBatch(CrawlConfig())(pd.DataFrame([row]))
    dsts = set(out[out["rtype"] == "outlink"]["dst"])
    assert "http://search-lucene.com/nutch" in dsts
    doc = out[out["rtype"] == "doc"].iloc[0]
    assert list(doc["spans"]) == []

    html = (b"<html><body><p>hello world</p>"
            b"<script>var u = \"http://js.example/found\";</script>"
            b"</body></html>")
    out_on = ParseBatch(CrawlConfig(parse_js=True))(
        pd.DataFrame([_fetch_row("http://a.com/p", html)]))
    assert "http://js.example/found" in set(out_on[out_on["rtype"] == "outlink"]["dst"])
    out_off = ParseBatch(CrawlConfig())(
        pd.DataFrame([_fetch_row("http://a.com/p", html)]))
    assert "http://js.example/found" not in set(out_off[out_off["rtype"] == "outlink"]["dst"])
    # script text never leaks into the doc text spans
    assert all("js.example" not in s["text"]
               for s in out_off[out_off["rtype"] == "doc"].iloc[0]["spans"])


def test_base_href_relative_resolution():
    """DOMContentUtils base handling: relative hrefs resolve against
    <base href>, else against the page url."""
    html = (b'<html><head><base href="http://cdn.example/dir/"></head>'
            b'<body><a href="sub/page.html">r</a>'
            b'<a href="http://abs.example/p">a</a></body></html>')
    batch = pd.DataFrame([_fetch_row("http://a.com/idx", html)])
    out = ParseBatch(CrawlConfig())(batch)
    dsts = set(out[out["rtype"] == "outlink"]["dst"])
    assert "http://cdn.example/dir/sub/page.html" in dsts
    assert "http://abs.example/p" in dsts

    html2 = (b"<html><body><a href=\"/rooted.html\">r</a></body></html>")
    out2 = ParseBatch(CrawlConfig())(pd.DataFrame([_fetch_row("http://a.com/d/idx", html2)]))
    assert set(out2[out2["rtype"] == "outlink"]["dst"]) == {"http://a.com/rooted.html"}


# ---------------------------------------------------------------------------
# parsefilter-outlinks (TestOutlinkParseFilter.java port)
# ---------------------------------------------------------------------------

def _linked_urls(out):
    return sorted(
        out[(out["rtype"] == "crawl_parse") & (out["status"] == CS.LINKED)]["url"]
    )


def test_outlink_anchor_filter():
    """testOutlinkAnchorFilter: anchors equal to a rule (trimmed,
    lowercased, punctuation-stripped) reject their toUrl — including a
    same-toUrl sibling with a good anchor; superstrings survive."""
    html = (
        "<html><body><p>this is the extracted text blablabla</p>"
        '<a href="/test1">Reject</a>'
        '<a href="/test2">reject</a>'
        '<a href="/test3">   Reject  \n</a>'
        '<a href="/test4">?.Reject</a>'
        '<a href="/test5">Reject!#</a>'
        '<a href="/test6">@*Reject!#</a>'
        '<a href="/test6">Same page as previous - Should not be kept</a>'
        '<a href="/keep">Dont Reject</a>'
        "</body></html>"
    ).encode()
    cfg = CrawlConfig(
        db_descendant_links=True, db_approve_anchors=True,
        anchor_reject_rules=("# this is a comment", "", "reject"),
        ignore_internal_links=False,
    )
    out = ParseBatch(cfg)(
        pd.DataFrame([_fetch_row("http://nutch.apache.org/", html)]))
    assert _linked_urls(out) == ["http://nutch.apache.org/keep"]


def test_outlink_descendant_filter():
    """validateDescendant(:182-225): host+path prefix gate with the
    allowed-domain PDF exception; collection.seed overrides the page
    url as the prefix root."""
    html = (
        "<html><body>"
        '<a href="http://t.com/docs/child">in</a>'
        '<a href="http://t.com/other/page">out</a>'
        '<a href="http://cdn.example.net/paper.pdf">pdf-allowed</a>'
        '<a href="http://evil.example.org/paper.pdf">pdf-denied</a>'
        '<a href="http://elsewhere.com/docs/child">other-host</a>'
        "</body></html>"
    ).encode()
    cfg = CrawlConfig(db_descendant_links=True, ignore_internal_links=False)
    row = _fetch_row("http://t.com/docs/", html)
    row["metadata"] = json.dumps(
        {"collection.seed": "http://t.com/docs/", "org.domains": "example.net"})
    out = ParseBatch(cfg)(pd.DataFrame([row]))
    assert _linked_urls(out) == [
        "http://cdn.example.net/paper.pdf", "http://t.com/docs/child"]


# ---------------------------------------------------------------------------
# microformats-reltag (RelTagParser.java)
# ---------------------------------------------------------------------------

def test_reltag_parse_meta():
    """rel='tag' anchors' last path segment (URL-decoded) lands sorted
    and deduped in parse meta Rel-Tag; other rels don't."""
    html = (
        "<html><body>"
        '<a href="http://t.com/tags/zebra" rel="tag">z</a>'
        '<a href="http://t.com/tags/alpha%20beta" rel="tag">ab</a>'
        '<a href="http://t.com/tags/zebra" rel="tag">dup</a>'
        '<a href="http://t.com/tags/skip" rel="nofollow">n</a>'
        '<a href="http://t.com/tags/notag">plain</a>'
        "</body></html>"
    ).encode()
    cfg = CrawlConfig(microformats_reltag=True)
    meta = _parse_meta(cfg, html)
    assert meta["Rel-Tag"] == ["alpha beta", "zebra"]
    meta2 = _parse_meta(CrawlConfig(), html)
    assert "Rel-Tag" not in meta2


# ---------------------------------------------------------------------------
# parse-zip (TestZipParser.java analogue over a stdlib-built archive)
# ---------------------------------------------------------------------------

def test_parse_zip_text_and_outlinks():
    """ZipParser/ZipTextExtractor: entry names + extracted text
    concatenate; html entries contribute outlinks; extension-less
    entries are skipped."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("doc.txt", "hello zip world")
        zf.writestr("page.html",
                    '<html><body><a href="http://x.com/in">x</a></body></html>')
        zf.writestr("noext", "ignored")
        zf.writestr("dir/", "")
    content = buf.getvalue()
    cfg = CrawlConfig(ignore_internal_links=False)
    out = ParseBatch(cfg)(
        pd.DataFrame([_fetch_row("http://t.com/a.zip", content,
                                 ctype="application/zip")]))
    assert "http://x.com/in" in _linked_urls(out)
    doc = out[out["rtype"] == "doc"].iloc[0]
    texts = " ".join(s["text"] for s in doc["spans"] if s["kind"] == "text")
    assert "hello zip world" in texts


# ---------------------------------------------------------------------------
# parsefilter-naivebayes (Train/Classify exact-math + filter semantics)
# ---------------------------------------------------------------------------

_NB_TRAIN = (
    "1\tray data streaming datasets distributed compute",
    "1\tdistributed execution with datasets and actors",
    "0\tcelebrity gossip fashion week red carpet",
    "0\tfashion gossip tabloid celebrity scandal",
)


def test_naivebayes_classify_math():
    """Classify.java:53-118 parity: per-token log(freq)+1-log(words+V)
    folds plus log-priors; ties -> relevant."""
    from coherencebot_ray.functions.naivebayes import classify, train

    m = train(_NB_TRAIN)
    assert classify(m, "streaming datasets on ray") == "1"
    assert classify(m, "red carpet celebrity gossip") == "0"


def test_naivebayes_one_class_training():
    """Java Math.log(0) = -Infinity: one-class training lines must not
    crash classify; everything resolves toward the populated class."""
    from coherencebot_ray.functions.naivebayes import classify, train

    only_r = train(("1\tray data distributed datasets",))
    assert classify(only_r, "anything at all") == "1"
    only_ir = train(("0\tcelebrity gossip fashion",))
    assert classify(only_ir, "anything at all") == "0"


def test_naivebayes_outlink_second_chance():
    """NaiveBayesParseFilter.filter(:157-190): an irrelevant page keeps
    only outlinks whose url contains a wordlist term; relevant pages
    keep everything."""
    cfg = CrawlConfig(
        ignore_internal_links=False,
        extra={"nb_train_lines": _NB_TRAIN, "nb_wordlist": ("dataset",)},
    )
    links = ('<a href="http://x.com/datasets/1">a</a>'
             '<a href="http://x.com/gossip/2">b</a>')
    irrelevant = f"<html><body><p>celebrity gossip fashion scandal</p>{links}</body></html>".encode()
    relevant = f"<html><body><p>ray data distributed datasets</p>{links}</body></html>".encode()

    out_ir = ParseBatch(cfg)(pd.DataFrame([_fetch_row("http://t.com/a", irrelevant)]))
    assert _linked_urls(out_ir) == ["http://x.com/datasets/1"]
    out_r = ParseBatch(cfg)(pd.DataFrame([_fetch_row("http://t.com/b", relevant)]))
    assert _linked_urls(out_r) == ["http://x.com/datasets/1", "http://x.com/gossip/2"]


# ---------------------------------------------------------------------------
# parsefilter-archive (ArchiveParseFilter.java analogue w/ store seam)
# ---------------------------------------------------------------------------

def test_archive_parse_filter(tmp_path):
    """PDF content is archived under <prefix><host>/<digest>.pdf, the
    parse metadata gains file.url_archive, non-PDF types are ignored,
    and existing keys are not re-uploaded (but still stamped)."""
    import os

    from coherencebot_ray.functions.archive import LocalObjectStore, archive_key, slugify

    root = str(tmp_path / "store")
    cfg = CrawlConfig(
        archive_s3_bucket="assets-dev",
        extra={"archive_store_factory": lambda: LocalObjectStore(root)},
    )
    pdf = b"%FPDF|Title|Head|Body"
    out = ParseBatch(cfg)(pd.DataFrame([
        _fetch_row("http://t.com/doc.pdf", pdf, ctype="application/pdf"),
        _fetch_row("http://t.com/page.html", b"<html><body><p>x</p></body></html>"),
    ]))
    pm = out[out["status"] == CS.PARSE_META]
    metas = [json.loads(m) for m in pm["metadata"]]
    archived = [m["file.url_archive"] for m in metas if "file.url_archive" in m]
    assert len(archived) == 1
    aurl = archived[0]
    assert aurl.startswith("s3://assets-dev/file/coherencebot-archive/t.com/")
    assert aurl.endswith(".pdf")
    key = aurl.split("s3://assets-dev/")[1]
    path = os.path.join(root, "assets-dev", key)
    assert open(path, "rb").read() == pdf

    # idempotent second pass: key exists -> stamped, not rewritten
    mtime = os.path.getmtime(path)
    out2 = ParseBatch(cfg)(pd.DataFrame([
        _fetch_row("http://t.com/doc.pdf", pdf, ctype="application/pdf")]))
    pm2 = [json.loads(m) for m in out2[out2["status"] == CS.PARSE_META]["metadata"]]
    assert pm2[0]["file.url_archive"] == aurl
    assert os.path.getmtime(path) == mtime

    # key derivation corners (:95-118)
    assert archive_key("http://h.com/a/b?q=1", "ab12", "p/") == "p/h.com/ab12.pdf"
    assert archive_key("http://h.com/x/y", None, "p/") == "p/h.com/x-y.pdf"
    assert archive_key("http://no-path-host", "ab12", "p/") == "p/no-host/ab12.pdf"
    assert slugify("A/B c.PDF") == "a-b-c-pdf"


# ---------------------------------------------------------------------------
# language-identifier markup detection (TestHTMLLanguageParser port)
# ---------------------------------------------------------------------------

def test_html_language_parser_meta_docs():
    """testMetaHTMLParsing: html lang attr / http-equiv content-language
    / dc.language each land in parse meta 'language'."""
    docs = [
        (b'<html lang="fi"><head>document 1 title</head>'
         b"<body>jotain suomeksi</body></html>", "fi"),
        (b'<html><head><meta http-equiv="content-language" content="en">'
         b"<title>document 2 title</title></head>"
         b"<body>this is english</body></html>", "en"),
        (b'<html><head><meta name="dc.language" content="en">'
         b"<title>document 3 title</title></head>"
         b"<body>this is english</body></html>", "en"),
    ]
    cfg = CrawlConfig(lang_html_detect=True)
    for html, expected in docs:
        meta = _parse_meta(cfg, html)
        assert meta.get("language") == expected, html


def test_html_language_parse_language_matrix():
    """testParseLanguage: the full 44-case normalization matrix
    (HTMLLanguageParser.LanguageParser.parseLanguage)."""
    from coherencebot_ray.functions.htmllang import parse_language

    cases = [
        ("(SCHEME=ISO.639-1) sv", "sv"), ("(SCHEME=RFC1766) sv-FI", "sv"),
        ("(SCHEME=Z39.53) SWE", "sv"), ("EN_US, SV, EN, EN_UK", "en"),
        ("English Swedish", "en"), ("English, swedish", "en"),
        ("English,Swedish", "en"), ("Other (Svenska)", "sv"),
        ("SE", "se"), ("SV", "sv"), ("SV charset=iso-8859-1", "sv"),
        ("SV-FI", "sv"), ("SV; charset=iso-8859-1", "sv"), ("SVE", "sv"),
        ("SW", "sw"), ("SWE", "sv"), ("SWEDISH", "sv"), ("Sv", "sv"),
        ("Sve", "sv"), ("Svenska", "sv"), ("Swedish", "sv"),
        ("Swedish, svenska", "sv"), ("en, sv", "en"), ("sv", "sv"),
        ("sv, be, dk, de, fr, no, pt, ch, fi, en", "sv"), ("sv,en", "sv"),
        ("sv-FI", "sv"), ("sv-SE", "sv"), ("sv-en", "sv"), ("sv-fi", "sv"),
        ("sv-se", "sv"), ("sv; Content-Language: sv", "sv"), ("sv_SE", "sv"),
        ("sve", "sv"), ("svenska, swedish, engelska, english", "sv"),
        ("sw", "sw"), ("swe", "sv"), ("swe.SPR.", "sv"), ("sweden", "sv"),
        ("swedish", "sv"), ("swedish,", "sv"),
        ("text/html; charset=sv-SE", "sv"), ("text/html; sv", "sv"),
        ("torp, stuga, uthyres, bed & breakfast", None),
    ]
    for raw, expected in cases:
        assert parse_language(raw) == expected, raw
