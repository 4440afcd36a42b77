"""Parse stage: span-sequence equality, outlink materialization, OPIC
score distribution, signatures (ParseSegment/ParseOutputFormat
analogues)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.stages.parse import ParseBatch, parse_html, parse_pdf

CUR = 1_700_000_000_000

HTML = (
    b"<html><head><title>My Title</title></head><body>"
    b"<h1>Head One</h1>"
    b'<img src="http://a.com/t.png"/>'
    b"<p>para one text</p><p>para two text</p>"
    b'<a href="http://a.com/x">anchor x</a>'
    b'<a href="http://b.com/y">anchor y</a>'
    b"</body></html>"
)


def fetch_row(url, content, ctype="text/html", score=1.0, status=CS.FETCH_SUCCESS, part=0):
    host = url.split("/")[2]
    return dict(
        url=url, host=host, part=part, status=status, fetch_time=CUR, retries=0,
        fetch_interval=86400, score=score, signature=None, modified_time=0,
        gen_time=0, repr_url=None, fixed_interval=0, metadata=None,
        content=content, content_type=ctype, fetch_order=0,
    )


def test_html_span_sequence():
    """Per-row invariant: span-sequence equality on (kind, text, media_ref, order)."""
    spans, links, text = parse_html(HTML)
    assert spans == [
        ("title", "My Title", ""),
        ("heading", "Head One", ""),
        ("media", "", "http://a.com/t.png"),
        ("text", "para one text", ""),
        ("text", "para two text", ""),
        ("link", "anchor x", "http://a.com/x"),
        ("link", "anchor y", "http://b.com/y"),
    ]
    assert links == [("http://a.com/x", "anchor x"), ("http://b.com/y", "anchor y")]
    assert text == "My Title Head One para one text para two text"


def test_pdf_span_sequence():
    body = b"%FPDF|The Title|The Heading|body para a|body para b"
    spans, links, text = parse_pdf(body)
    assert spans == [
        ("title", "The Title", ""),
        ("heading", "The Heading", ""),
        ("text", "body para a", ""),
        ("text", "body para b", ""),
    ]
    assert links == []


def test_parse_batch_outputs():
    cfg = CrawlConfig()
    pb = ParseBatch(cfg)
    out = pb(pd.DataFrame([fetch_row("http://a.com/page", HTML, score=1.0)]))

    docs = out[out["rtype"] == "doc"]
    assert len(docs) == 1
    spans = docs.iloc[0]["spans"]
    assert [s["kind"] for s in spans] == ["title", "heading", "media", "text", "text", "link", "link"]
    assert [s["offset"] for s in spans] == list(range(7))

    # outlinks normalized+filtered
    ol = out[out["rtype"] == "outlink"]
    assert set(ol["dst"]) == {"http://a.com/x", "http://b.com/y"}

    # crawl_parse: SIGNATURE + LINKED per outlink with distributed score
    cp = out[out["rtype"] == "crawl_parse"]
    sig_rows = cp[cp["status"] == CS.SIGNATURE]
    assert len(sig_rows) == 1
    assert sig_rows.iloc[0]["signature"] == hashlib.md5(HTML).digest()
    linked = cp[cp["status"] == CS.LINKED]
    assert len(linked) == 2
    # OPIC: score/validCount = 1.0/2 each (OPICScoringFilter.java:119-160)
    assert linked["score"].to_numpy(dtype=np.float32).tolist() == [0.5, 0.5]
    # LINKED rows re-partitioned to the TARGET's partition
    assert (linked["part"].to_numpy() >= 0).all()


def test_parse_skips_non_success():
    pb = ParseBatch(CrawlConfig())
    out = pb(pd.DataFrame([fetch_row("http://a.com/x", b"", status=CS.FETCH_GONE)]))
    assert len(out) == 0


def test_outlink_cap_and_filtering():
    links = "".join(f'<a href="http://a.com/l{i}">x</a>' for i in range(150))
    bad = '<a href="http://a.com/img.jpg">img</a><a href="ftp://z/q">f</a>'
    html = f"<html><title>t</title>{bad}{links}</html>".encode()
    cfg = CrawlConfig(max_outlinks_per_page=100)
    out = ParseBatch(cfg)(pd.DataFrame([fetch_row("http://a.com/p", html)]))
    ol = out[out["rtype"] == "outlink"]
    assert len(ol) == 100  # db.max.outlinks.per.page
    assert not any(".jpg" in d or d.startswith("ftp:") for d in ol["dst"])


def test_ignore_external_links():
    cfg = CrawlConfig(ignore_external_links=True)
    out = ParseBatch(cfg)(pd.DataFrame([fetch_row("http://a.com/page", HTML)]))
    ol = out[out["rtype"] == "outlink"]
    assert set(ol["dst"]) == {"http://a.com/x"}


def test_text_profile_signature_option():
    cfg = CrawlConfig(signature_impl="text_profile")
    out = ParseBatch(cfg)(pd.DataFrame([fetch_row("http://a.com/page", HTML)]))
    sig = out[(out["rtype"] == "crawl_parse") & (out["status"] == CS.SIGNATURE)].iloc[0]["signature"]
    # near-dup robust: same words reordered -> same signature
    html2 = HTML.replace(b"para one text", b"text one para")
    out2 = ParseBatch(cfg)(pd.DataFrame([fetch_row("http://a.com/other", html2)]))
    sig2 = out2[(out2["rtype"] == "crawl_parse") & (out2["status"] == CS.SIGNATURE)].iloc[0]["signature"]
    assert sig == sig2


def test_parse_feed():
    """parse-feed plugin analogue: RSS/Atom -> spans + outlinks."""
    from coherencebot_ray.stages.parse import parse_feed

    rss = b"""<?xml version="1.0"?>
<rss><channel><title>Policy Feed</title>
<item><title>Report A</title><link>http://x.com/a</link>
<description>Annual review</description></item>
<item><title>Report B</title><link>http://x.com/b</link></item>
</channel></rss>"""
    spans, links, text = parse_feed(rss)
    kinds = [s[0] for s in spans]
    assert kinds[0] == "title" and spans[0][1] == "Policy Feed"
    assert links == [("http://x.com/a", "Report A"), ("http://x.com/b", "Report B")]
    assert "Annual review" in text

    atom = b"""<feed><title>AF</title>
<entry><title>E1</title><link href="http://y.com/1"/><summary>S1</summary></entry>
</feed>"""
    spans2, links2, _ = parse_feed(atom)
    assert links2 == [("http://y.com/1", "E1")]


def test_image_document_parse_metadata():
    """TestImageMetadata port (parse-tika image path): an image/gif doc
    parses to a single media span and width/height parse metadata read
    from the header bytes (the reference's tika run extracts width=121
    height=48 from nutch_logo_tm.gif; same header fields here)."""
    import json

    gif = (b"GIF89a" + (121).to_bytes(2, "little") + (48).to_bytes(2, "little")
           + b"\x00" * 6)
    row = fetch_row("http://a.com/logo.gif", gif, ctype="image/gif")
    out = ParseBatch(CrawlConfig())(pd.DataFrame([row]))
    docs = out[out["rtype"] == "doc"]
    assert len(docs) == 1
    spans = docs.iloc[0]["spans"]
    assert [(s["kind"], s["media_ref"]) for s in spans] == \
        [("media", "http://a.com/logo.gif")]
    pm = out[out["rtype"] == "crawl_parse"]
    pm = pm[pm["metadata"].notna()]
    meta = json.loads(pm.iloc[0]["metadata"])
    assert meta["width"] == "121" and meta["height"] == "48"
    assert meta["media.format"] == "gif"


def test_audio_document_parse_metadata():
    """WAV doc: media span + sample-rate/channel parse metadata."""
    import json

    wav = (b"RIFF" + (100).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + (44100).to_bytes(4, "little") + b"\x00" * 8)
    row = fetch_row("http://a.com/s.wav", wav, ctype="audio/x-wav")
    out = ParseBatch(CrawlConfig())(pd.DataFrame([row]))
    pm = out[(out["rtype"] == "crawl_parse") & out["metadata"].notna()]
    meta = json.loads(pm.iloc[0]["metadata"])
    assert meta["audio.rate"] == "44100" and meta["audio.channels"] == "2"


def test_parser_factory_routing():
    """ParserFactory port (parse-plugins.xml + ParserFactory.java):
    exact mime match wins, '*' is the fallback, ids run IN ORDER until
    one parses, and reference plugin ids alias onto the built-ins."""
    # route zip-named mime to the js parser, '*' to html
    cfg = CrawlConfig(parse_plugins=(
        ("application/zip", ("parse-js",)),
        ("application/x-custom", ("parse-ext", "parse-zip")),  # ext absent -> zip
        ("*", ("parse-html",)),
    ))
    pb = ParseBatch(cfg)
    # exact match: zip mime goes to the JS parser (no text spans)
    js_doc = b"var a = 'http://x.com/from-js';"
    out = pb(pd.DataFrame([fetch_row("http://a.com/f.zip", js_doc,
                                     ctype="application/zip")]))
    assert set(out[out["rtype"] == "outlink"]["dst"]) == {"http://x.com/from-js"}
    # ordered fallback: parse-ext unavailable -> parse-zip runs
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("inner.txt", "zip inner text")
    out2 = pb(pd.DataFrame([fetch_row("http://a.com/c", buf.getvalue(),
                                      ctype="application/x-custom")]))
    docs2 = out2[out2["rtype"] == "doc"]
    assert any("zip inner text" in s["text"]
               for s in docs2.iloc[0]["spans"] if s["kind"] == "text")
    # '*' fallback: a pdf mime routes to html under this table
    out3 = pb(pd.DataFrame([fetch_row("http://a.com/x", b"<html><title>T</title></html>",
                                      ctype="application/pdf")]))
    assert [s["text"] for s in out3[out3["rtype"] == "doc"].iloc[0]["spans"]
            if s["kind"] == "title"] == ["T"]
    # empty table keeps the built-in heuristic routing
    out4 = ParseBatch(CrawlConfig())(pd.DataFrame(
        [fetch_row("http://a.com/p", b"%FPDF|T|H|body", ctype="application/pdf")]))
    assert [s["text"] for s in out4[out4["rtype"] == "doc"].iloc[0]["spans"]
            if s["kind"] == "title"] == ["T"]
