"""Ports of TestIndexReplace.java (src/plugin/index-replace) and
TestLinksIndexingFilter.java (src/plugin/index-links) against the
vectorized IndexingFilter chain.

The reference drives a sample HTML file through parse + index-metadata
first; here the starting document fields are set directly to the sample
file's metatag values (testIndexReplace.html), so the replace semantics
under test are identical.
"""

import numpy as np
import pandas as pd

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.functions.indexing import (
    IndexingFilters,
    LinksIndexingFilter,
    ReplaceIndexer,
)

DESCRIPTION = "With this plugin, I control the description! Bwuhuhuhaha!"
KEYWORDS = "Breathtaking, Riveting, Two Thumbs Up!"
AUTHOR = "Peter Ciuffetti"


def _doc(url="http://www.example.com/testIndexReplace.html"):
    host = url.split("/")[2]
    return pd.DataFrame([{
        "url": url,
        "host": host,
        "metatag.description": DESCRIPTION,
        "metatag.keywords": KEYWORDS,
        "metatag.author": AUTHOR,
    }])


def _apply(prop, df=None):
    cfg = CrawlConfig(extra={"index_replace_regexp": prop})
    out, keep = ReplaceIndexer().apply(df if df is not None else _doc(), cfg)
    assert keep.all()
    return out.iloc[0]


def test_property_parse():
    """testPropertyParse: the full mixed property (global + hostmatch +
    urlmatch sets, target-field form, flags) parses without error."""
    prop = ("  metatag.description=/this(.*)plugin/this awesome plugin/2\n"
            "  metatag.keywords=/\\,/\\!/\n"
            "  hostmatch=.*.com\n"
            "  metatag.keywords=/\\,/\\?/\n"
            "  metatag.author:dc_author=/\\s+/ David /\n"
            "  urlmatch=.*.html\n"
            "  metatag.keywords=/\\,/\\./\n"
            "  metatag.author=/\\s+/ D. /\n")
    rp = ReplaceIndexer()
    rp._parse(prop)
    # global set + one host-scoped set; one url-scoped set
    assert len(rp._by_host) == 2 and len(rp._by_url) == 1
    host_sets = {p.pattern: [f.field for f in frs] for p, frs in rp._by_host}
    assert host_sets[".*"] == ["metatag.description", "metatag.keywords"]
    assert host_sets[".*.com"] == ["metatag.keywords", "metatag.author"]
    # target-field form
    author_fr = rp._by_host[1][1][1]
    assert author_fr.field == "metatag.author" and author_fr.to_field == "dc_author"


def test_global_replacement():
    """testGlobalReplacement: no scoping -> all three fields changed."""
    row = _apply("  metatag.description=/this(.*)plugin/this awesome plugin/\n"
                 "  metatag.keywords=/\\,/\\!/\n"
                 "  metatag.author=/\\s+/ D. /\n")
    assert row["metatag.description"] == "With this awesome plugin, I control the description! Bwuhuhuhaha!"
    assert row["metatag.keywords"] == "Breathtaking! Riveting! Two Thumbs Up!"
    assert row["metatag.author"] == "Peter D. Ciuffetti"


def test_invalid_patterns_are_ignored():
    """testInvalidPatterns: invalid pattern / invalid flags / missing
    separator are each skipped without failing, fields unchanged."""
    row = _apply("  metatag.description=/this\\s+**plugin/this awesome plugin/\n"
                 "  metatag.keywords=/\\,/\\!/what\n"
                 " metatag.author=#notcomplete")
    assert row["metatag.description"] == DESCRIPTION
    assert row["metatag.keywords"] == KEYWORDS
    assert row["metatag.author"] == AUTHOR


def test_url_matches_pattern():
    """testUrlMatchesPattern: urlmatch scope hits -> fields changed."""
    row = _apply(" urlmatch=.*.html\n"
                 "  metatag.description=/this(.*)plugin/this awesome plugin/\n"
                 "  metatag.keywords=/\\,/\\!/\n"
                 "  metatag.author=/\\s+/ D. /\n")
    assert row["metatag.description"] == "With this awesome plugin, I control the description! Bwuhuhuhaha!"
    assert row["metatag.author"] == "Peter D. Ciuffetti"


def test_url_not_matches_pattern():
    """testUrlNotMatchesPattern: urlmatch scope misses -> unchanged."""
    row = _apply(" urlmatch=.*.xml\n"
                 "  metatag.description=/this(.*)plugin/this awesome plugin/\n"
                 "  metatag.keywords=/\\,/\\!/\n"
                 "  metatag.author=/\\s+/ D. /\n")
    assert row["metatag.description"] == DESCRIPTION
    assert row["metatag.keywords"] == KEYWORDS
    assert row["metatag.author"] == AUTHOR


def test_global_and_url_matches_with_groups():
    """testGlobalAndUrlMatchesPattern: global description rule with $1
    group refs + url-scoped keyword/author rules, all triggered."""
    row = _apply("  metatag.description=/this(.*)plugin/this$1awesome$1plugin/\n"
                 "  urlmatch=.*.html\n"
                 "  metatag.keywords=/\\,/\\!/\n"
                 "  metatag.author=/\\s+/ D. /\n")
    assert row["metatag.description"] == "With this awesome plugin, I control the description! Bwuhuhuhaha!"
    assert row["metatag.keywords"] == "Breathtaking! Riveting! Two Thumbs Up!"
    assert row["metatag.author"] == "Peter D. Ciuffetti"


def test_global_and_url_not_matches():
    """testGlobalAndUrlNotMatchesPattern: only the global rule fires."""
    row = _apply("  metatag.description=/this(.*)plugin/this$1awesome$1plugin/\n"
                 "  urlmatch=.*.xml\n"
                 "  metatag.keywords=/\\,/\\!/\n"
                 "  metatag.author=/\\s+/ D. /\n")
    assert row["metatag.description"] == "With this awesome plugin, I control the description! Bwuhuhuhaha!"
    assert row["metatag.keywords"] == KEYWORDS
    assert row["metatag.author"] == AUTHOR


def test_hostmatch_scoping():
    """hostmatch= restricts its set to matching hosts (ReplaceIndexer
    doReplace keyed on the host field)."""
    prop = ("hostmatch=.*\\.com\n"
            "metatag.keywords=/\\,/\\!/\n")
    row = _apply(prop)
    assert row["metatag.keywords"] == "Breathtaking! Riveting! Two Thumbs Up!"
    row2 = _apply(prop, _doc("http://www.example.org/testIndexReplace.html"))
    assert row2["metatag.keywords"] == KEYWORDS


def test_target_field_replacement():
    """fieldname:tofield form writes the replaced value to the target
    field, leaving the source untouched."""
    row = _apply("metatag.author:dc_author=/\\s+/ David /\n")
    assert row["metatag.author"] == AUTHOR
    assert row["dc_author"] == "Peter David Ciuffetti"


def test_case_insensitive_flags():
    """Java flag 2 (CASE_INSENSITIVE) maps to re.IGNORECASE."""
    row = _apply("metatag.description=/BWUHUHUHAHA/gotcha/2\n")
    assert row["metatag.description"].endswith("gotcha!")


def test_replacements_run_in_order():
    """Multiple rules on the same field chain in specified order."""
    row = _apply("metatag.keywords=/\\,/\\;/\n"
                 "metatag.keywords=/\\;/\\!/\n")
    assert row["metatag.keywords"] == "Breathtaking! Riveting! Two Thumbs Up!"


# ---------------------------------------------------------------------------
# index-links (TestLinksIndexingFilter port)
# ---------------------------------------------------------------------------

OUTLINKS = ["http://www.test.com", "http://www.example.com"]
OUTLINKS_PARTS = ["http://www.test.com/index.php?param=1",
                  "http://www.example.com/index.php?param=2"]
INLINKS = ["http://www.test.com", "http://www.example.com"]


def _links_doc(outlinks=None, inlinks=None):
    return pd.DataFrame([{
        "url": "http://www.example.com/",
        "outlinks": outlinks if outlinks is not None else [],
        "inlinks": inlinks if inlinks is not None else [],
    }])


def _links_apply(df, **extra):
    out, keep = LinksIndexingFilter().apply(df, CrawlConfig(extra=extra))
    assert keep.all()
    return out.iloc[0]


def test_filter_outlinks():
    """testFilterOutlinks: only outlinks from a different host kept."""
    row = _links_apply(_links_doc(outlinks=OUTLINKS),
                       index_links_outlinks_host_ignore=True)
    assert row["outlinks"] == ["http://www.test.com"]


def test_filter_inlinks():
    """testFilterInlinks: only inlinks from a different host kept."""
    row = _links_apply(_links_doc(inlinks=INLINKS),
                       index_links_inlinks_host_ignore=True)
    assert row["inlinks"] == ["http://www.test.com"]


def test_no_filter_outlinks():
    """testNoFilterOutlinks: default keeps same-host outlinks too."""
    row = _links_apply(_links_doc(outlinks=OUTLINKS))
    assert row["outlinks"] == OUTLINKS


def test_no_filter_inlinks():
    """testNoFilterInlinks: explicit false keeps all inlinks."""
    row = _links_apply(_links_doc(inlinks=INLINKS),
                       index_links_inlinks_host_ignore=False)
    assert row["inlinks"] == INLINKS


def test_index_only_host_part():
    """testIndexOnlyHostPart: hosts-only mode stores host portions,
    same-host inlinks count once, filtered hosts stay deduped."""
    inlinks = ["http://www.test.com/one-awesome-page",
               "http://www.test.com/other-awesome-page",
               "http://www.example.com/my-first-awesome-example"]
    row = _links_apply(
        _links_doc(outlinks=OUTLINKS_PARTS, inlinks=inlinks),
        index_links_outlinks_host_ignore=True,
        index_links_inlinks_host_ignore=True,
        index_links_hosts_only=True,
    )
    assert row["outlinks"] == ["www.test.com"]
    assert row["inlinks"] == ["www.test.com"]


def test_index_hosts_only_and_filter_outlinks():
    """testIndexHostsOnlyAndFilterOutlinks."""
    row = _links_apply(_links_doc(outlinks=OUTLINKS_PARTS),
                       index_links_hosts_only=True,
                       index_links_outlinks_host_ignore=True)
    assert row["outlinks"] == ["www.test.com"]


def test_org_indexing_filter():
    """TestOrgIndexerTest analogue with an injected lookup (the
    reference hits a private orgs API): org fields land on the doc,
    keyed by org.slug from the datum metadata or by the url's domain;
    docs with no match stay untouched; lookups are cached."""
    import json as _json

    from coherencebot_ray.functions.indexing import OrgIndexingFilter

    calls = []

    def lookup(slug, domain):
        calls.append((slug, domain))
        if slug == "alaska-center" or domain == "acpp.info":
            return {"organization.id": "alaska-center-for-public-policy-us",
                    "organization.name": "Alaska Center for Public Policy"}
        return None

    df = pd.DataFrame([
        {"url": "https://archive.example/acpp.info/PDFs/a.pdf",
         "metadata": _json.dumps({"org.slug": "alaska-center"})},
        {"url": "http://www.acpp.info/reports/b.html", "metadata": None},
        {"url": "http://unrelated.org/x", "metadata": None},
    ])
    cfg = CrawlConfig(extra={"org_lookup": lookup})
    f = OrgIndexingFilter()
    out, keep = f.apply(df, cfg)
    assert keep.all()
    assert out.iloc[0]["organization.id"] == "alaska-center-for-public-policy-us"
    assert out.iloc[1]["organization.name"] == "Alaska Center for Public Policy"
    assert out.iloc[2]["organization.id"] is None
    # cache: re-applying the same rows adds no new lookup calls
    n = len(calls)
    f.apply(df, cfg)
    assert len(calls) == n
    # dict-form lookup keyed by domain
    out2, _ = OrgIndexingFilter().apply(
        df, CrawlConfig(extra={"org_lookup": {"acpp.info": {"organization.name": "ACPP"}}}))
    assert out2.iloc[1]["organization.name"] == "ACPP"


def test_static_field_property_format():
    """TestStaticFieldIndexerTest port: the index.static property with
    default and custom delimiters; key-less entries skipped, trimmed,
    multi-valued fields split on valuesep."""
    from coherencebot_ray.functions.indexing import StaticFieldIndexer

    df = pd.DataFrame([{"url": "http://x.com/"}])

    # testEmptyIndexStatic: nothing set
    out, _ = StaticFieldIndexer().apply(df, CrawlConfig(extra={"index_static": ""}))
    assert set(out.columns) == {"url"}

    # testNormalScenario
    prop = "field1:val1, field2    :      val2 val3     , field3, field4 :val4 , "
    out, _ = StaticFieldIndexer().apply(df, CrawlConfig(extra={"index_static": prop}))
    row = out.iloc[0]
    assert row["field1"] == "val1"
    assert row["field2"] == ["val2", "val3"]
    assert row["field4"] == "val4"
    assert "field3" not in out.columns

    # testCustomDelimiters
    out, _ = StaticFieldIndexer().apply(df, CrawlConfig(extra={
        "index_static": "field1=val1>field2=val2|val3>field4=val4",
        "index_static_fieldsep": ">",
        "index_static_keysep": "=",
        "index_static_valuesep": "|",
    }))
    row = out.iloc[0]
    assert row["field1"] == "val1"
    assert row["field2"] == ["val2", "val3"]
    assert row["field4"] == "val4"

    # testCustomMulticharacterDelimiters
    out, _ = StaticFieldIndexer().apply(df, CrawlConfig(extra={
        "index_static": "field1\t\tval1\n\nfield2\t\tval2***val3\n\nfield4\t\tval4",
        "index_static_fieldsep": "\n\n",
        "index_static_keysep": "\t\t",
        "index_static_valuesep": "***",
    }))
    row = out.iloc[0]
    assert row["field1"] == "val1"
    assert row["field2"] == ["val2", "val3"]
    assert row["field4"] == "val4"


def test_jexl_indexing_filter():
    """TestJexlIndexingFilter port: doc.lang=='en' keeps the matching
    document and drops the non-matching one; a bad expression raises."""
    import pytest

    from coherencebot_ray.functions.indexing import JexlIndexingFilter

    df = pd.DataFrame([
        {"url": "http://nutch.apache.org/index.html", "lang": "en", "title": "The Foo Page"},
        {"url": "http://nutch.apache.org/ru.html", "lang": "ru", "title": "The Foo Page"},
    ])
    cfg = CrawlConfig(extra={"index_jexl_filter": "doc.lang=='en'"})
    out, keep = JexlIndexingFilter().apply(df, cfg)
    assert keep.tolist() == [True, False]
    with pytest.raises(Exception):
        JexlIndexingFilter().apply(
            df, CrawlConfig(extra={"index_jexl_filter": "import os; bad"}))


def test_anchor_deduplicate_flag():
    """TestAnchorIndexingFilter.testDeduplicateAnchor port: dedup only
    with anchorIndexingFilter.deduplicate=true; the reference default
    (false) keeps duplicates."""
    from coherencebot_ray.functions.indexing import AnchorIndexingFilter

    df = pd.DataFrame([{"url": "http://nutch.apache.org/index.html",
                        "anchors": ["text1", "text2", "text2"]}])
    out, _ = AnchorIndexingFilter().apply(df, CrawlConfig(extra={"anchor_deduplicate": True}))
    assert out.iloc[0]["anchor"] == ["text1", "text2"]
    out2, _ = AnchorIndexingFilter().apply(df, CrawlConfig())
    assert out2.iloc[0]["anchor"] == ["text1", "text2", "text2"]


def test_links_filter_in_chain():
    """The links plugin composes with the registered chain."""
    df = pd.DataFrame([{
        "url": "http://www.example.com/", "title": "t", "text": "x",
        "score_boost": 1.0, "n_inlinks": 2, "anchors": ["a"],
        "outlinks": OUTLINKS, "inlinks": INLINKS,
        "fetch_time": 0,
    }])
    cfg = CrawlConfig(
        indexing_filters=("basic", "links"),
        extra={"index_links_outlinks_host_ignore": True},
    )
    out = IndexingFilters(cfg.indexing_filters, cfg).apply(df)
    assert out.iloc[0]["outlinks"] == ["http://www.test.com"]
    assert out.iloc[0]["inlinks"] == INLINKS


def test_indexing_filters_order_and_unknown(ray_session):
    """TestIndexingFilters port (chain semantics): filters run in the
    configured order (a later filter sees the earlier one's fields),
    and an unknown filter name fails fast like the reference's
    RuntimeException for a missing extension."""
    import pytest

    from coherencebot_ray.functions.indexing import IndexingFilters

    df = pd.DataFrame([{"url": "http://a.com/x", "host": "a.com"}])
    cfg = CrawlConfig(extra={
        "index_static_fields": {"site": "demo site"},
        "index_replace_regexp": "site=/demo/DEMO/\n",
    })
    # static first -> replace rewrites the field it created
    out = IndexingFilters(("static", "replace"), cfg).apply(df)
    assert out.iloc[0]["site"] == "DEMO site"
    # replace first -> nothing to rewrite yet; static then sets the raw value
    out2 = IndexingFilters(("replace", "static"), cfg).apply(df)
    assert out2.iloc[0]["site"] == "demo site"
    with pytest.raises(KeyError):
        IndexingFilters(("nope",), cfg)


# ---------------------------------------------------------------------------
# index-tld (src/plugin/tld/.../TLDIndexingFilter.java)
# ---------------------------------------------------------------------------

def test_tld_indexing_filter():
    """TLDIndexingFilter.java:46-60: the url's public-suffix becomes a
    'tld' field; second-level suffixes (co.uk) come out whole; IP hosts
    have none."""
    df = pd.DataFrame({
        "url": ["http://www.example.com/a", "http://shop.example.co.uk/b",
                "http://127.0.0.1/c"],
    })
    out = IndexingFilters(("tld",), cfg=CrawlConfig()).apply(df)
    assert out["tld"].tolist() == ["com", "co.uk", ""]


def test_tld_boost_multiplies_score():
    """TLDScoringFilter.java:52-66 analogue: per-suffix boosts multiply
    the indexer score (stock domain-suffixes boosts are all 1.0)."""
    cfg = CrawlConfig(extra={"tld_boosts": {"org": 2.0}})
    df = pd.DataFrame({
        "url": ["http://a.org/", "http://b.com/"],
        "score_boost": np.array([1.5, 1.5], dtype=np.float32),
    })
    out = IndexingFilters(("tld",), cfg=cfg).apply(df)
    assert out["score_boost"].tolist() == [3.0, 1.5]


# ---------------------------------------------------------------------------
# mimetype-filter (MimeTypeIndexingFilterTest.java port)
# ---------------------------------------------------------------------------

_MIME_DOCS = pd.DataFrame({
    "url": ["http://www.example.com/"] * 3,
    "content_type": ["text/html", "image/png", "application/pdf"],
})


def test_mimetype_missing_config_allows_all():
    """testMissingConfigFile: no rules -> every document passes."""
    out = IndexingFilters(("mimetype",), cfg=CrawlConfig()).apply(_MIME_DOCS)
    assert len(out) == 3


def test_mimetype_allow_only_images():
    """testAllowOnlyImages (allow-images.txt: '-' then 'image')."""
    cfg = CrawlConfig(mimetype_filter_rules=("# comment", "", "-", "image"))
    out = IndexingFilters(("mimetype",), cfg=cfg).apply(_MIME_DOCS)
    assert out["content_type"].tolist() == ["image/png"]


def test_mimetype_block_html():
    """testBlockHTML (block-html.txt: '+' then 'text/html')."""
    cfg = CrawlConfig(mimetype_filter_rules=("+", "text/html"))
    out = IndexingFilters(("mimetype",), cfg=cfg).apply(_MIME_DOCS)
    assert out["content_type"].tolist() == ["image/png", "application/pdf"]


# ---------------------------------------------------------------------------
# index-geoip (offline-DB seam)
# ---------------------------------------------------------------------------

def test_geoip_indexing_filter_offline_db():
    """GeoIPIndexingFilter.java:197-230: server ip from datum metadata
    _ip_ looked up against the injected offline db; non-null fields
    added (GeoIPDocumentCreator.addIfNotNull)."""
    import json

    cfg = CrawlConfig(extra={"geoip_db": {
        "93.184.216.34": {"cityName": "Minneapolis", "countryIsoCode": "US",
                          "latLon": "44.9733,-93.2323"},
    }})
    df = pd.DataFrame({
        "url": ["http://a.com/", "http://b.com/"],
        "metadata": [json.dumps({"_ip_": "93.184.216.34"}), None],
    })
    out = IndexingFilters(("geoip",), cfg=cfg).apply(df)
    assert out["ip"].tolist() == ["93.184.216.34", None]
    assert out["cityName"].tolist() == ["Minneapolis", None]
    assert out["countryIsoCode"].tolist() == ["US", None]


# ---------------------------------------------------------------------------
# microformats-reltag indexing half
# ---------------------------------------------------------------------------

def test_reltag_indexing_filter():
    """RelTagIndexingFilter.java:44-52: parse-meta Rel-Tag values become
    'tag' field values."""
    import json

    df = pd.DataFrame({
        "url": ["http://a.com/", "http://b.com/"],
        "metadata": [json.dumps({"Rel-Tag": ["python", "ray"]}), None],
    })
    out = IndexingFilters(("reltag",), cfg=CrawlConfig()).apply(df)
    assert out["tag"].tolist() == [["python", "ray"], []]


def test_basic_indexing_filter_matrix():
    """TestBasicIndexingFilter port: title clipped to
    indexer.max.title.length, domain added with indexer.add.domain,
    content clipped to indexer.max.content.length, host/url/tstamp
    populated (BasicIndexingFilter.java:53-130)."""
    cfg = CrawlConfig(
        indexing_filters=("basic",),
        extra={"indexer_max_title_length": 10,
               "indexer_add_domain": True,
               "indexer_max_content_length": 20},
    )
    df = pd.DataFrame([{
        "url": "http://nutch.apache.org/index.html",
        "title": "The Foo Page",
        "text": "this is a sample foo bar page. hope you enjoy it.",
        "fetch_time": 100,
        "score_boost": 1.0,
        "n_inlinks": 0,
        "anchors": [],
    }])
    out = IndexingFilters(cfg.indexing_filters, cfg).apply(df)
    row = out.iloc[0]
    assert row["title"] == "The Foo Pa"
    assert row["domain"] == "apache.org"
    assert row["host"] == "nutch.apache.org"
    assert row["url"] == "http://nutch.apache.org/index.html"
    assert row["content"] == "this is a sample foo"
    assert row["tstamp"] == 100
    # defaults leave title/content whole and add no domain
    out2 = IndexingFilters(("basic",), CrawlConfig(indexing_filters=("basic",))).apply(df)
    assert out2.iloc[0]["title"] == "The Foo Page"
    assert "domain" not in out2.columns
