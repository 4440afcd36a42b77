"""Port of TestCCParseFilter.java (src/plugin/creativecommons) against
functions/license.py, with equivalent inline pages mirroring the
reference's anchor.html / rel.html / rdf.html structures, plus the
CCIndexingFilter feature mapping and the parse-stage wiring."""

import json

import pandas as pd

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.functions.license import (
    CCIndexingFilter,
    cc_index_features,
    find_cc_license,
)
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.stages.parse import ParseBatch

CUR = 1_700_000_000_000

ANCHOR_HTML = (
    b"<html><body>"
    b'<p><a href="http://creativecommons.org/licenses/by-nc-sa/1.0">'
    b'<img alt="Creative Commons License" src="/somerights.gif"></a>'
    b"This file is licensed under a "
    b'<a href="http://creativecommons.org/licenses/by-nc-sa/1.0">Creative Commons License</a>.</p>'
    b"</body></html>"
)

REL_HTML = (
    b"<html><body>"
    b'<a rel="license" href="http://creativecommons.org/licenses/by-nc/2.0">CC by-nc</a>'
    b'<a href="http://creativecommons.org/licenses/by-nc-sa/1.0">plain anchor</a>'
    b"</body></html>"
)

RDF_HTML = (
    b"<html><body>"
    b'<p><a href="http://creativecommons.org/licenses/by-nc/1.0">Creative Commons License</a>.</p>'
    b"<!--\n"
    b'<rdf:RDF xmlns="http://web.resource.org/cc/"\n'
    b'    xmlns:dc="http://purl.org/dc/elements/1.1/"\n'
    b'    xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
    b'<Work rdf:about="http://boingboing.net">\n'
    b'   <dc:type rdf:resource="http://purl.org/dc/dcmitype/Text" />\n'
    b'   <license rdf:resource="http://creativecommons.org/licenses/by-nc/1.0" />\n'
    b"</Work>\n"
    b'<License rdf:about="http://creativecommons.org/licenses/by-nc/1.0">\n'
    b'   <permits rdf:resource="http://web.resource.org/cc/Reproduction" />\n'
    b"</License>\n"
    b"</rdf:RDF>\n"
    b"-->"
    b"</body></html>"
)


def test_cc_pages():
    """TestCCParseFilter.testPages: anchor -> 'a', rel=license ->
    'rel', RDF comment -> 'rdf' (highest precedence) + work type."""
    meta = find_cc_license(ANCHOR_HTML, "http://foo.com/")
    assert meta["License-Url"] == "http://creativecommons.org/licenses/by-nc-sa/1.0"
    assert meta["License-Location"] == "a"
    assert "Work-Type" not in meta

    meta = find_cc_license(REL_HTML, "http://foo.com/")
    assert meta["License-Url"] == "http://creativecommons.org/licenses/by-nc/2.0"
    assert meta["License-Location"] == "rel"

    meta = find_cc_license(RDF_HTML, "http://foo.com/")
    assert meta["License-Url"] == "http://creativecommons.org/licenses/by-nc/1.0"
    assert meta["License-Location"] == "rdf"
    assert meta["Work-Type"] == "text"


def test_cc_unlicensed_and_relative():
    assert find_cc_license(b"<html><body>no license here</body></html>",
                           "http://foo.com/") == {}
    # relative href resolves against the base before the host check
    html = b'<a href="/licenses/by/3.0">x</a>'
    assert find_cc_license(html, "http://creativecommons.org/")["License-Location"] == "a"
    assert find_cc_license(html, "http://other.org/") == {}


def test_cc_index_features():
    """CCIndexingFilter.addUrlFeatures: path tokens split on /-."""
    feats = cc_index_features(
        "http://creativecommons.org/licenses/by-nc/2.0", "rel", "text")
    assert feats == ["license=http://creativecommons.org/licenses/by-nc/2.0",
                     "by", "nc", "2.0", "meta=rel", "text"]


def test_cc_indexing_filter_from_metadata():
    md = json.dumps({"License-Url": "http://creativecommons.org/licenses/by/1.0",
                     "License-Location": "a"})
    df = pd.DataFrame([{"url": "http://x.com/", "metadata": md},
                       {"url": "http://y.com/", "metadata": None}])
    out, keep = CCIndexingFilter().apply(df, CrawlConfig())
    assert keep.all()
    assert out.iloc[0]["cc"] == ["license=http://creativecommons.org/licenses/by/1.0",
                                 "by", "1.0", "meta=a"]
    assert out.iloc[1]["cc"] == []


def _fetch_row(url, content):
    host = url.split("/")[2]
    return dict(
        url=url, host=host, part=0, status=CS.FETCH_SUCCESS, fetch_time=CUR,
        retries=0, fetch_interval=86400, score=1.0, signature=None,
        modified_time=0, gen_time=0, repr_url=None, fixed_interval=0,
        metadata=None, content=content, content_type="text/html",
        fetch_order=0,
    )


def test_cc_through_parse_stage():
    """cfg.cc_license=True records the license as PARSE_META metadata;
    off by default (no extra rows)."""
    batch = pd.DataFrame([_fetch_row("http://foo.com/", RDF_HTML)])
    out = ParseBatch(CrawlConfig(cc_license=True))(batch)
    pm = out[out["status"] == CS.PARSE_META]
    assert len(pm) == 1
    meta = json.loads(pm.iloc[0]["metadata"])
    assert meta["License-Url"] == "http://creativecommons.org/licenses/by-nc/1.0"
    assert meta["Work-Type"] == "text"
    out2 = ParseBatch(CrawlConfig())(batch)
    assert (out2["status"] == CS.PARSE_META).sum() == 0
