"""Parse stage: content -> interleaved span docs + outlinks + crawl_parse.

Reference: parse/ParseSegment.java:61-355 (mime dispatch, signature),
parse/ParseOutputFormat.java:135-491 (outlink materialization, score
distribution, signature/parse_meta datums), plugins parse-html /
parse-headings / parse-thumb (span kinds).

Ray-Data-first: ONE stateless ``map_batches`` pass over successful fetch
rows emitting a single tagged table (``rtype`` ∈ doc|outlink|crawl_parse)
— downstream splits are zero-copy Arrow filters, so content bytes are
read once and never reshuffled. The parser chain, normalizers, filters
and signer are built once per actor in ``__init__``.

Span mapping (SURVEY.md §1.3): <title> -> kind=title; <h1-3> ->
kind=heading (parse-headings analogue); <p>/text -> kind=text;
<img src> -> kind=media with media_ref (parse-thumb analogue);
<a href> -> kind=link with media_ref=target and text=anchor.
``offset`` is the monotone span position.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser
from urllib.parse import urljoin

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import CrawlConfig
from ..functions.filters import URLFilters
from ..functions.normalizers import SCOPE_OUTLINK, URLNormalizers
from ..functions.signatures import make_signer
from ..functions.urlutil import get_host, partition_for_hosts
from ..model import CrawlStatus as CS


class _DocHTMLParser(HTMLParser):
    """Single-pass span extractor for the synthetic/regular HTML corpus."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple] = []  # (kind, text, media_ref)
        self.links: list[tuple] = []  # (href, anchor)
        self.metatags: list[tuple] = []  # (name, value) from <meta>
        self.base_href: str | None = None  # first <base href>
        self.scripts: list[str] = []  # <script> bodies (parse-js)
        self.tag_links: list[tuple] = []  # (tag, url) non-anchor outlinks
        self.rel_tag_hrefs: list[str] = []  # <a rel="tag"> (reltag)
        self.lang_attr: str | None = None  # first element lang= attr
        self._in_script = False
        self._script_buf: list[str] = []
        self._stack: list[str] = []
        self._buf: list[str] = []
        self._href: str | None = None

    # DOMContentUtils.java:79-91 linkParams — non-anchor elements whose
    # attribute is an outlink; img/script/link/form are collected too
    # and filtered by cfg (parser.html.outlinks.ignore_tags defaults)
    _TAG_LINK_ATTR = {
        "area": "href", "frame": "src", "iframe": "src", "source": "src",
        "script": "src", "link": "href", "form": "action",
    }

    def handle_starttag(self, tag, attrs):
        if self.lang_attr is None:
            # first element lang attribute wins (HTMLLanguageParser's
            # NodeWalker order)
            for k, v in attrs:
                if k == "lang" and v:
                    self.lang_attr = v
                    break
        if tag in ("title", "h1", "h2", "h3", "p", "a"):
            self._stack.append(tag)
            self._buf = []
            if tag == "a":
                d = dict(attrs)
                self._href = d.get("href")
                rel = (d.get("rel") or "").lower()
                # <a rel=nofollow> is not an outlink (DOMContentUtils
                # getOutlinks rel handling; TestDOMContentUtils)
                if "nofollow" in rel:
                    self._href = None
                # microformats rel-tag: rel EQUALS "tag"
                # (RelTagParser.java:96-105)
                if rel == "tag" and self._href:
                    self.rel_tag_hrefs.append(self._href)
        elif tag == "img":
            src = dict(attrs).get("src")
            if src:
                self.spans.append(("media", "", src))
                self.tag_links.append(("img", src))
        elif tag in self._TAG_LINK_ATTR:
            v = dict(attrs).get(self._TAG_LINK_ATTR[tag])
            if v:
                self.tag_links.append((tag, v))
            if tag == "script":
                # body capture for parse-js (src-less inline scripts)
                self._in_script = True
                self._script_buf = []
        elif tag == "meta":
            # parse-metatags source: name= or http-equiv= + content=
            # (MetaTagsParser.java:78-95 general + http-equiv groups)
            d = dict(attrs)
            name = d.get("name") or d.get("http-equiv")
            value = d.get("content")
            if name and value is not None:
                self.metatags.append((name, value))
        elif tag == "base":
            # HTMLMetaProcessor base-url capture (first <base href> wins)
            href = dict(attrs).get("href")
            if href and self.base_href is None:
                self.base_href = href

    def handle_endtag(self, tag):
        if tag == "script":
            if self._script_buf:
                self.scripts.append("".join(self._script_buf))
            self._in_script = False
            self._script_buf = []
            return
        if self._stack and self._stack[-1] == tag:
            text = "".join(self._buf).strip()
            self._stack.pop()
            if tag == "title":
                self.spans.append(("title", text, ""))
            elif tag in ("h1", "h2", "h3"):
                self.spans.append(("heading", text, ""))
            elif tag == "p":
                if text:
                    self.spans.append(("text", text, ""))
            elif tag == "a":
                if self._href:
                    self.spans.append(("link", text, self._href))
                    self.links.append((self._href, text))
                self._href = None
            self._buf = []

    def handle_data(self, data):
        if self._in_script:
            self._script_buf.append(data)
        elif self._stack:
            self._buf.append(data)


def parse_html_full(content: bytes, charset: str | None = None) -> tuple[_DocHTMLParser, str]:
    """One pass; returns the populated parser (spans/links/metatags/
    base_href/scripts) and the extracted text. ``charset`` comes from
    the EncodingDetector clue chain; utf-8 decodes via utf-8-sig so a
    BOM never leaks into the first span."""
    cs = (charset or "utf-8").lower()
    if cs == "utf-8":
        cs = "utf-8-sig"
    try:
        decoded = content.decode(cs, errors="replace")
    except LookupError:
        decoded = content.decode("utf-8-sig", errors="replace")
    p = _DocHTMLParser()
    p.feed(decoded)
    p.close()
    text = " ".join(s[1] for s in p.spans if s[0] in ("title", "heading", "text"))
    return p, text


def parse_html(content: bytes, want_meta: bool = False):
    """Returns (spans, links, text) — or (spans, links, text, metatags,
    base_href) with ``want_meta`` (parse-metatags / robots-meta / base
    support; same single pass)."""
    p, text = parse_html_full(content)
    if want_meta:
        return p.spans, p.links, text, p.metatags, p.base_href
    return p.spans, p.links, text


_JS_STRING_RE = re.compile(r"(\\*(?:\"|'))([^\s\"']+?)\1", re.I | re.M)
_JS_URI_RE = re.compile(r"(^|\s*?)/?\S+?[/.]\S+($|\s*)", re.I | re.M)


def extract_js_outlinks(script: str, base_url: str) -> list[str]:
    """parse-js JSParseFilter.getJSLinks(:195-260): string literals in
    JavaScript that look like URIs become outlinks — www.* prefixed
    with http://, everything else resolved against the base url,
    &amp; unescaped."""
    out = []
    for m in _JS_STRING_RE.finditer(script):
        url = m.group(2)
        if not _JS_URI_RE.fullmatch(url):
            continue
        if url.startswith("www."):
            url = "http://" + url
        else:
            try:
                url = urljoin(base_url, url)
            except ValueError:
                continue
        out.append(url.replace("&amp;", "&"))
    return out


def robots_meta_directives(metatags) -> tuple[bool, bool, bool]:
    """HTMLMetaProcessor.getMetaTagsHelper robots/pragma handling
    (parse/HTMLMetaProcessor.java, TestRobotsMetaProcessor matrix):
    returns (no_index, no_follow, no_cache). ``none`` sets both,
    ``all`` sets neither; directives are comma/space separated,
    case-insensitive; http-equiv pragma/cache-control no-cache sets
    no_cache."""
    no_index = no_follow = no_cache = False
    for name, value in metatags:
        lc = name.lower()
        if lc == "robots":
            toks = {t.strip().lower() for t in re.split(r"[,\s]+", value) if t.strip()}
            if "none" in toks:
                no_index = no_follow = True
            if "all" in toks:
                pass  # explicit allow: sets nothing, like the reference
            if "noindex" in toks:
                no_index = True
            if "nofollow" in toks:
                no_follow = True
        elif lc in ("pragma", "cache-control") and "no-cache" in value.lower():
            no_cache = True
    return no_index, no_follow, no_cache


_TEXT_URL_RE = re.compile(
    # OutlinkExtractor.java:60-64 URL_PATTERN (scheme:rest with the
    # RFC-ish charset, optional #fragment), applied to plain text
    r"[A-Za-z][A-Za-z0-9+.-]{1,120}:[A-Za-z0-9/]"
    r"(?:[A-Za-z0-9$_.+!*,;/?:@&~=-]|%[A-Fa-f0-9]{2}){1,333}"
    r"(?:#[a-zA-Z0-9][a-zA-Z0-9$_.+!*,;/?:@&~=%-]{0,1000})?"
)


def extract_text_outlinks(text: str | None) -> list[str]:
    """OutlinkExtractor.getOutlinks(:76-121): regex URL extraction from
    plain text, kept only for http/https/ftp/file schemes. Scheme-less
    hosts (www.google.com) are NOT links, matching the reference."""
    if not text:
        return []
    out = []
    for m in _TEXT_URL_RE.finditer(text):
        u = m.group(0)
        if u.startswith(("http:", "https:", "ftp:", "file:")):
            out.append(u)
    return out


def parse_regex_rules(text: str) -> tuple:
    """parsefilter-regex rules file format (RegexParseFilter.java:
    155-175, data/regex-parsefilter.txt): ``<field>\\t<html|text>\\t
    <regex>`` per line, ``#`` comments skipped. Returns ((field,
    source, regex), ...) for CrawlConfig.parsefilter_regex_rules."""
    rules = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) == 3:
            rules.append((parts[0], parts[1].lower(), parts[2]))
    return tuple(rules)


_FEED_ITEM_RE = re.compile(r"<(?:item|entry)\b(.*?)</(?:item|entry)>", re.S | re.I)
_FEED_TITLE_RE = re.compile(r"<title[^>]*>\s*(.*?)\s*</title>", re.S | re.I)
_FEED_LINK_RE = re.compile(
    r"<link[^>]*?href=[\"']([^\"']+)[\"']|<link[^>]*>\s*([^<\s]+)\s*</link>", re.S | re.I
)
_FEED_DESC_RE = re.compile(
    r"<(?:description|summary|content)[^>]*>\s*(.*?)\s*</(?:description|summary|content)>",
    re.S | re.I,
)


def parse_feed(content: bytes) -> tuple[list[tuple], list[tuple], str]:
    """parse-feed plugin analogue (src/plugin/feed): RSS/Atom documents
    become one doc whose items are heading+text spans and whose item
    links are outlinks (anchor = item title). Stdlib regex parser — no
    rome/feedparser in this environment."""
    try:
        xml = content.decode("utf-8", errors="replace")
    except Exception:
        return [], [], ""
    spans: list[tuple] = []
    links: list[tuple] = []
    feed_title = _FEED_TITLE_RE.search(xml)
    if feed_title:
        spans.append(("title", feed_title.group(1), ""))
    for m in _FEED_ITEM_RE.finditer(xml):
        item = m.group(1)
        t = _FEED_TITLE_RE.search(item)
        title = t.group(1) if t else ""
        if title:
            spans.append(("heading", title, ""))
        d = _FEED_DESC_RE.search(item)
        if d and d.group(1):
            spans.append(("text", d.group(1), ""))
        lk = _FEED_LINK_RE.search(item)
        if lk:
            href = lk.group(1) or lk.group(2)
            if href:
                spans.append(("link", title, href))
                links.append((href, title))
    text = " ".join(s[1] for s in spans if s[0] in ("title", "heading", "text"))
    return spans, links, text


def parse_pdf(content: bytes) -> tuple[list[tuple], list[tuple], str]:
    """Fake-PDF text layer: '%FPDF|title|heading|para|para...'.

    A real deployment would plug a tika/pdfminer extractor here; the
    container has neither, so the binary decode is this deterministic
    stand-in (clearly marked; plumbing — schema, batching, dispatch —
    is real). parse-headings analogue: first big-font line -> heading.
    """
    try:
        parts = content.decode("utf-8").split("|")
    except UnicodeDecodeError:
        return [], [], ""
    if parts[0] != "%FPDF":
        return [], [], ""
    spans: list[tuple] = []
    if len(parts) > 1:
        spans.append(("title", parts[1], ""))
    if len(parts) > 2:
        spans.append(("heading", parts[2], ""))
    for para in parts[3:]:
        spans.append(("text", para, ""))
    text = " ".join(p for p in parts[1:])
    return spans, [], text


def parse_zip(content: bytes, url: str) -> tuple[list[tuple], list[tuple], str]:
    """parse-zip (src/plugin/parse-zip/.../ZipParser.java:57-110 +
    ZipTextExtractor.java:62-117): walk the archive with stdlib zipfile,
    recursively parse text-bearing entries (html via the span extractor,
    .txt decoded), collect their outlinks; resultText concatenates
    '<entry name> <entry text> ' like the reference. Entry urls resolve
    as url + '/' + name (ZipTextExtractor:78-81)."""
    import io
    import zipfile

    spans: list[tuple] = []
    links: list[tuple] = []
    texts: list[str] = []
    try:
        zf = zipfile.ZipFile(io.BytesIO(content))
    except (zipfile.BadZipFile, ValueError):
        return [], [], ""
    for info in zf.infolist():
        if info.is_dir():
            continue
        name = info.filename
        if "." not in name.rsplit("/", 1)[-1]:
            continue  # reference skips extension-less entries (:83-84)
        try:
            data = zf.read(info)
        except (zipfile.BadZipFile, RuntimeError):
            continue
        entry_text = ""
        lower = name.lower()
        if lower.endswith((".html", ".htm")):
            p, entry_text = parse_html_full(data)
            spans.extend(p.spans)
            links.extend((h, a) for h, a in p.links)
        elif lower.endswith((".txt", ".text", ".md", ".csv")):
            entry_text = data.decode("utf-8", errors="replace")
            if entry_text:
                spans.append(("text", entry_text, ""))
        texts.append(f"{name} {entry_text} ")
    return spans, links, "".join(texts)


def _reltag_of(href: str) -> str | None:
    """Last path segment, URL-decoded (RelTagParser.parseTag:122-133)."""
    from urllib.parse import unquote, urlsplit

    try:
        path = urlsplit(href).path or ""
    except ValueError:
        return None
    tag = unquote(path.rsplit("/", 1)[-1])
    return tag or None


class ParseBatch:
    """Callable class for map_batches (actor pool); stateless per batch."""

    def __init__(self, cfg: CrawlConfig):
        from ..functions.scoring import make_scoring

        self.cfg = cfg
        self.normalizers = URLNormalizers(cfg.normalizers)
        self.filters = URLFilters(cfg.filters)
        self.scoring = make_scoring(cfg)
        self.signer = make_signer(
            cfg.signature_impl,
            **(
                {"min_token_len": cfg.tp_min_token_len, "quant_rate": cfg.tp_quant_rate}
                if cfg.signature_impl == "text_profile"
                else {}
            ),
        )
        # parse-metatags: lowercase tag-name set, "*" = all
        self.metatag_names = frozenset(
            n.lower() for n in (cfg.metatags_names or ())
        )
        # parsefilter-regex: patterns compiled once per actor
        self.pf_rules = tuple(
            (field, source, re.compile(rx))
            for field, source, rx in (cfg.parsefilter_regex_rules or ())
        )
        self._ignore_outlink_tags = frozenset(cfg.html_ignore_outlink_tags or ())
        # parsefilter-outlinks: anchor rejection rules (once per actor)
        self.anchor_rules = frozenset(
            r.strip().lower() for r in (cfg.anchor_reject_rules or ())
            if r.strip() and not r.startswith("#")
        )
        self.pf_outlinks_active = bool(
            cfg.db_descendant_links or (cfg.db_approve_anchors and self.anchor_rules)
        )
        # parsefilter-naivebayes: model trained once per actor from the
        # injected training lines (the reference trains from
        # parsefilter.naivebayes.trainfile at setConf)
        # parsefilter-archive: store client built once per actor
        store_factory = (cfg.extra or {}).get("archive_store_factory")
        if store_factory is not None and cfg.archive_s3_bucket:
            from ..functions.archive import ArchiveFilter

            self.archiver = ArchiveFilter(
                cfg.archive_s3_bucket, cfg.archive_s3_prefix, store_factory())
        else:
            self.archiver = None
        nb_lines = (cfg.extra or {}).get("nb_train_lines")
        if nb_lines:
            from ..functions.naivebayes import train

            self.nb_model = train(nb_lines)
            self.nb_wordlist = tuple((cfg.extra or {}).get("nb_wordlist") or ())
        else:
            self.nb_model = None
            self.nb_wordlist = ()
        # parse-ext: external-command parsers by content type
        if cfg.ext_parsers:
            from ..functions.extparser import ExtParser

            self.ext_parser = ExtParser(
                {ct: (cmd, to) for ct, cmd, to in cfg.ext_parsers})
        else:
            self.ext_parser = None
        # ParserFactory mime routing table (parse-plugins.xml analogue):
        # reference plugin ids normalized onto the built-in parser ids
        _ALIASES = {"parse-html": "html", "parse-tika": "html",
                    "parse-zip": "zip", "parse-js": "js",
                    "parse-feed": "feed", "parse-ext": "ext",
                    "parse-pdf": "pdf"}
        self._routes = {
            m.lower(): tuple(_ALIASES.get(p, p) for p in ids)
            for m, ids in (cfg.parse_plugins or ())
        }

    # -- ParserFactory.getExtensions analogue ---------------------------
    def _resolve_parsers(self, ctype: str) -> tuple:
        if self._routes:
            base = ctype.split(";")[0].strip().lower()
            ids = self._routes.get(base) or self._routes.get("*")
            if ids:
                return ids
        # built-in heuristic table = the template's effective routing
        if self.ext_parser is not None and self.ext_parser.can_parse(ctype):
            return ("ext",)
        if "pdf" in ctype:
            return ("pdf",)
        if "rss" in ctype or "atom" in ctype:
            return ("feed",)
        if "zip" in ctype:
            return ("zip",)
        if "javascript" in ctype:
            return ("js",)
        if ctype.startswith("image/") or ctype.startswith("audio/"):
            return ("media",)
        return ("html",)

    def _run_simple_parser(self, pid: str, content, ctype: str, url: str,
                           media_meta: dict):
        """Run a non-html parser id; returns (spans, links, text) or
        None on failure (the caller falls through to the next routed
        id, like ParseUtil's parser iteration)."""
        if pid == "ext":
            if self.ext_parser is None or not self.ext_parser.can_parse(ctype):
                return None
            from ..functions.extparser import ExtParseError

            try:
                text = self.ext_parser.parse(bytes(content), ctype)
            except ExtParseError:
                return None  # ParseStatus.FAILED -> next parser
            return ([("text", text, "")] if text else []), [], text
        if pid == "pdf":
            return parse_pdf(bytes(content))
        if pid == "feed":
            return parse_feed(bytes(content))
        if pid == "zip":
            return parse_zip(bytes(content), url)
        if pid == "js":
            # parse-js pure .js documents: string-literal outlinks,
            # no text spans (JSParseFilter.getParse:170-190)
            js = bytes(content).decode("utf-8", errors="replace")
            return [], [(u, "") for u in extract_js_outlinks(js, url)], ""
        if pid == "media":
            # interleaved media documents: the doc row is a single
            # media span (media_ref = the fetched url) and the header
            # probe's dimensions land in parse meta — TestImageMetadata
            # semantics (tika extracts width=121/height=48 from the gif
            # header; ops/media.probe_* reads the same header bytes)
            from ..ops.media import probe_audio, probe_image

            raw = bytes(content)
            pr = (probe_image(raw) if ctype.startswith("image/")
                  else probe_audio(raw))
            if pr is not None:
                kind, a, b = pr
                media_meta["media.format"] = kind
                if ctype.startswith("image/"):
                    media_meta["width"] = str(a)
                    media_meta["height"] = str(b)
                else:
                    media_meta["audio.rate"] = str(a)
                    media_meta["audio.channels"] = str(b)
            return [("media", "", url)], [], ""
        return None  # unknown parser id: skip to the next routed one

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Columnar parse pass: the only per-document Python is the html/
        pdf extractor and the signer; the row plumbing (outlink
        normalize/filter/host, output assembly) is batched — normalize_
        many/accept_many/hosts_of run ONCE over every href in the batch,
        and output rows accumulate into per-column lists (no iterrows,
        no list-of-dicts DataFrame)."""
        cfg = self.cfg
        if len(batch) == 0:
            return _empty_parse_out()
        ok = batch[batch["status"] == CS.FETCH_SUCCESS]
        if cfg.parser_skip_truncated and len(ok):
            # parser.skip.truncated (ParseSegment.java:113): drop
            # content the fetch stage marked cut-short. The fetch stage
            # writes a typed ``truncated`` column (SURVEY §1.3 hot-key
            # promotion) — authoritative when present; hand-built
            # frames without it fall back to the metadata JSON scan.
            if "truncated" in ok.columns:
                ok = ok[ok["truncated"].isna()]
            elif "metadata" in ok.columns:
                md = ok["metadata"]
                nn = md.notna()
                if nn.any():
                    hit = pd.Series(False, index=ok.index)
                    hit[nn] = md[nn].str.contains('"_tr_"', regex=False)
                    ok = ok[~hit]
        if len(ok) == 0:
            return _empty_parse_out()
        urls = ok["url"].to_numpy()
        hosts = ok["host"].to_numpy()
        parts = ok["part"].to_numpy()
        contents = ok["content"].to_numpy()
        ctypes = ok["content_type"].to_numpy() if "content_type" in ok.columns else np.full(len(ok), None, dtype=object)
        scores = ok["score"].to_numpy()
        fts = ok["fetch_time"].to_numpy()
        fis = ok["fetch_interval"].to_numpy()

        # pass 1: extract spans/links/signature per doc; flatten hrefs
        parsed: list[tuple] = []  # (i, spans, link_start, n_links, signature, extra_meta)
        nb_irrelevant: set[int] = set()  # parsefilter-naivebayes verdicts
        # per-doc text retained ONLY when a scoring plugin reads it
        # (scoring-similarity's setURLScoreAfterParsing)
        keep_text = self.scoring.uses_parse_text
        doc_texts: dict[int, str] = {}
        hrefs: list[str] = []
        href_anchor: list[str] = []
        for i in range(len(ok)):
            content = contents[i]
            if content is None:
                continue
            ctype = ctypes[i] or "text/html"
            metatags: list[tuple] = []
            rel_tag_hrefs: list[str] = []
            lang_meta: str | None = None
            media_meta: dict = {}
            # ParserFactory routing: ordered parser ids for this mime
            # (exact match > '*' > built-in heuristic table); ids run
            # in order until one parses (ParseUtil iteration)
            pids = self._resolve_parsers(ctype)
            chosen_html = False
            parsed_simple = None
            for pid in pids:
                if pid == "html":
                    chosen_html = True
                    break
                parsed_simple = self._run_simple_parser(
                    pid, content, ctype, urls[i], media_meta)
                if parsed_simple is not None:
                    break
            if not chosen_html and parsed_simple is None:
                continue  # every routed parser failed (ParseStatus.FAILED)
            if not chosen_html:
                spans, links, text = parsed_simple
            else:
                # EncodingDetector clue chain: BOM / strict-UTF-8 probe
                # wins, else the <meta charset> sniff, else utf-8
                # (the transport strips the header charset upstream)
                from ..functions.webutil import guess_encoding, sniff_meta_charset

                raw = bytes(content)
                cs = guess_encoding(raw, None, "utf-8",
                                    sniffed=sniff_meta_charset(raw),
                                    min_confidence=50)
                _p, text = parse_html_full(raw, charset=cs)
                spans, links = _p.spans, _p.links
                metatags = _p.metatags
                if cfg.microformats_reltag:
                    rel_tag_hrefs = _p.rel_tag_hrefs
                if cfg.lang_html_detect:
                    # language-identifier markup detection: html lang
                    # attr > dc.language > http-equiv content-language
                    from ..functions.htmllang import detect_language

                    lang = detect_language(_p.lang_attr, metatags)
                    if lang:
                        lang_meta = lang
                if _p.tag_links:
                    # frame/iframe/area/source (and any un-ignored
                    # img/script/link/form) outlinks, empty anchor
                    # (DOMContentUtils linkParams)
                    ign = self._ignore_outlink_tags
                    extra = [(u, "") for tg, u in _p.tag_links if tg not in ign]
                    if extra:
                        links = list(links) + extra
                # protocol-relative <base href> resolves against the
                # page url first (NUTCH-2478)
                base_href = (
                    urljoin(urls[i], _p.base_href) if _p.base_href else None
                )
                if cfg.parse_js and _p.scripts:
                    # parse-js over embedded <script> bodies
                    base = base_href or urls[i]
                    links = list(links) + [
                        (u, "")
                        for sc in _p.scripts
                        for u in extract_js_outlinks(sc, base)
                    ]
                # robots meta directives (HtmlParser.java getParse:
                # noIndex -> no text/title extracted, noFollow -> no
                # outlinks; HTMLMetaProcessor matrix)
                if metatags:
                    no_index, no_follow, _ = robots_meta_directives(metatags)
                    if no_index:
                        spans = [s for s in spans if s[0] == "link"]
                        text = ""
                    if no_follow:
                        # noFollow empties ParseData outlinks, which also
                        # feeds LinksIndexingFilter — drop link spans too
                        # so indexer_join's index-links sees none (ADVICE r3)
                        links = []
                        spans = [s for s in spans if s[0] != "link"]
                # <base href> / page-url relative link resolution
                # (DOMContentUtils.getOutlinks base handling)
                if links and any("://" not in h for h, _ in links):
                    base = base_href or urls[i]
                    links = [
                        (h if "://" in h else urljoin(base, h), a)
                        for h, a in links
                    ]
            signature = self.signer(text, bytes(content), urls[i])
            # parse-filter metadata: metatag.<name> entries + regex flags
            extra_meta: dict = dict(media_meta)
            if self.archiver is not None:
                # parsefilter-archive: digest keys the stored object
                # (ArchiveParseFilter.java:84-93 uses the parse digest)
                from ..functions.archive import ARCHIVE_META_KEY

                a_url = self.archiver.archive(
                    urls[i], ctype, bytes(content),
                    signature.hex() if signature else None)
                if a_url:
                    extra_meta[ARCHIVE_META_KEY] = a_url
            if self.cfg.cc_license and metatags is not None and "pdf" not in ctype:
                # creativecommons CCParseFilter (License-Url etc.)
                from ..functions.license import find_cc_license

                extra_meta.update(find_cc_license(bytes(content), urls[i]))
            if metatags and self.metatag_names:
                star = "*" in self.metatag_names
                for name, value in metatags:
                    lc = name.lower()
                    if star or lc in self.metatag_names:
                        key = f"metatag.{lc}"
                        prev = extra_meta.get(key)
                        if prev is None:
                            extra_meta[key] = value
                        elif isinstance(prev, list):
                            prev.append(value)
                        else:
                            extra_meta[key] = [prev, value]
            if self.pf_rules:
                html_str = None
                for field, source, pat in self.pf_rules:
                    if source == "html":
                        if html_str is None:
                            html_str = bytes(content).decode("utf-8", errors="replace")
                        src = html_str
                    elif source == "text":
                        src = text
                    else:
                        continue  # misconfigured source: logged + skipped
                    extra_meta[field] = "true" if pat.search(src) else "false"
            if lang_meta:
                # Metadata.LANGUAGE (HTMLLanguageParser.filter:128-131)
                extra_meta["language"] = lang_meta
            if rel_tag_hrefs:
                # microformats-reltag: sorted unique tag set into parse
                # meta (RelTagParser's TreeSet + Metadata.add)
                tags = sorted({t for t in map(_reltag_of, rel_tag_hrefs) if t})
                if tags:
                    extra_meta["Rel-Tag"] = tags
            if self.nb_model is not None:
                # parsefilter-naivebayes: an irrelevant page's outlinks
                # only survive the wordlist second chance (pass 2)
                from ..functions.naivebayes import classify

                if classify(self.nb_model, text) == "0":
                    nb_irrelevant.add(i)
            if keep_text:
                doc_texts[i] = text
            parsed.append((i, spans, len(hrefs), len(links), signature, extra_meta))
            for href, anchor in links:
                hrefs.append(href)
                href_anchor.append(anchor)

        # batched outlink chain: one normalize/filter/host pass per batch
        normed = self.normalizers.normalize_many(hrefs, SCOPE_OUTLINK) if hrefs else []
        acc = np.zeros(len(normed), dtype=bool)
        dst_hosts = np.full(len(normed), "", dtype=object)
        nn = [j for j, v in enumerate(normed) if v is not None]
        if nn:
            nn_urls = [normed[j] for j in nn]
            acc_v = self.filters.accept_many(nn_urls)
            from ..functions.urlutil import hosts_of

            host_v = hosts_of(np.asarray(nn_urls, dtype=object)).to_numpy()
            for k, j in enumerate(nn):
                acc[j] = acc_v[k]
                dst_hosts[j] = host_v[k]

        # pass 2: columnar output assembly (same row order as before:
        # doc, then per-link outlink+LINKED, then SIGNATURE)
        cols: dict[str, list] = {c: [] for c in _PARSE_COLS}

        def emit(rtype, url, host, part, doc_id, spans, status, score,
                 signature, fetch_interval, anchor, dst, fetch_time,
                 metadata=None):
            cols["rtype"].append(rtype)
            cols["url"].append(url)
            cols["host"].append(host)
            cols["part"].append(part)
            cols["doc_id"].append(doc_id)
            cols["spans"].append(spans)
            cols["status"].append(status)
            cols["score"].append(score)
            cols["signature"].append(signature)
            cols["fetch_interval"].append(fetch_interval)
            cols["anchor"].append(anchor)
            cols["dst"].append(dst)
            cols["metadata"].append(metadata)
            cols["fetch_time"].append(fetch_time)

        # ScoringFilter parse-time metadata hooks (scoring-metadata:
        # datum md -> content md -> parse md -> outlink md). Skipped
        # entirely unless a registered plugin overrides them.
        parse_hooks = self.scoring.has_parse_hooks
        datum_metas = (
            ok["metadata"].to_numpy()
            if (parse_hooks or self.pf_outlinks_active) and "metadata" in ok.columns
            else None
        )

        max_ol = cfg.max_outlinks_per_page
        for i, spans, lstart, n_links, signature, extra_meta in parsed:
            url, src_host = urls[i], hosts[i]
            part, ft, fi = int(parts[i]), int(fts[i]), int(fis[i])
            emit("doc", url, src_host, part, url,
                 [{"kind": k, "text": t, "media_ref": m, "offset": o}
                  for o, (k, t, m) in enumerate(spans)],
                 0, 0.0, signature, fi, None, None, ft)

            ol_md_json = None
            parse_meta: dict = dict(extra_meta)  # metatags + regex flags
            content_meta: dict = {}
            if parse_hooks:
                # passScoreBeforeParsing / passScoreAfterParsing /
                # distributeScoreToOutlinks metadata side channel
                dm = datum_metas[i] if datum_metas is not None else None
                datum_meta = json.loads(dm) if isinstance(dm, str) and dm else {}
                self.scoring.pass_score_before_parsing(datum_meta, content_meta)
                self.scoring.pass_score_after_parsing(content_meta, parse_meta)
                if keep_text:
                    # scoring-similarity: score the page text against the
                    # gold standard into the content metadata
                    self.scoring.score_after_parsing(
                        content_meta, parse_meta, doc_texts.get(i, ""))
                ol_md = self.scoring.outlink_metadata(parse_meta)
                ol_md_json = json.dumps(ol_md, sort_keys=True) if ol_md else None
            if parse_meta:
                # PARSE_META datum for the updatedb overlay
                emit("crawl_parse", url, src_host, part, None, None,
                     int(CS.PARSE_META), 0.0, None, 0, None, None, ft,
                     metadata=json.dumps(parse_meta, sort_keys=True))

            # distributeScoreToOutlinks may clear targets wholesale
            # (scoring-depth at the hop limit, DepthScoringFilter.java:77-117)
            if parse_hooks and n_links and self.scoring.distribute_veto(parse_meta):
                n_links = 0

            kept: list[tuple] = []
            seen_dst = set()
            for j in range(lstart, lstart + n_links):
                if len(kept) >= max_ol:
                    break  # db.max.outlinks.per.page (ParseOutputFormat.java:164-166)
                if not acc[j]:
                    continue
                nu = normed[j]
                dst_host = dst_hosts[j]
                if cfg.ignore_internal_links and dst_host == src_host:
                    continue
                if cfg.ignore_external_links and dst_host != src_host:
                    continue
                if nu in seen_dst:
                    continue
                seen_dst.add(nu)
                kept.append((nu, href_anchor[j], dst_host))

            if kept and self.pf_outlinks_active:
                # parsefilter-outlinks: descendant + anchor gates
                from ..functions.parsefilter_outlinks import filter_outlinks

                dm = datum_metas[i] if datum_metas is not None else None
                datum_meta = json.loads(dm) if isinstance(dm, str) and dm else {}
                allowed = tuple(
                    d for d in (datum_meta.get("org.domains") or "").split(";") if d
                )
                kept = filter_outlinks(
                    url, kept,
                    require_descendants=cfg.db_descendant_links,
                    approve_anchors=cfg.db_approve_anchors,
                    anchor_rules=self.anchor_rules,
                    seed_url=datum_meta.get("collection.seed"),
                    allowed_domains=allowed,
                )
            if kept and i in nb_irrelevant:
                # parsefilter-naivebayes second chance: only wordlist
                # urls survive an irrelevant page
                from ..functions.naivebayes import second_chance

                kept = [o for o in kept if second_chance(o[0], self.nb_wordlist)]

            if kept:
                # scfilters.distributeScoreToOutlinks (OPIC share);
                # scoring-similarity SETS every target's score wholesale
                # (CosineSimilarity.distributeScoreToOutlinks:74-81)
                override = (
                    self.scoring.outlink_score_override(content_meta)
                    if keep_text else None
                )
                share = self.scoring.distribute_share(float(scores[i]), len(kept))
                for nu, anchor, dst_host in kept:
                    factor = (
                        cfg.score_internal_factor
                        if dst_host == src_host
                        else cfg.score_external_factor
                    )
                    if override is not None:
                        contrib = float(np.float32(override))
                    else:
                        contrib = float(np.float32(share) * np.float32(factor))
                    emit("outlink", url, src_host, part, None, None, 0, 0.0,
                         None, 0, anchor, nu, ft)
                    # LINKED datum for updatedb (ParseOutputFormat.java:317-366);
                    # part=-1 re-partitioned to the TARGET below
                    emit("crawl_parse", nu, dst_host, -1, None, None,
                         int(CS.LINKED), contrib, None, int(cfg.interval_default),
                         anchor, None, ft, metadata=ol_md_json)

            # SIGNATURE datum (ParseOutputFormat.java:236-244)
            emit("crawl_parse", url, src_host, part, None, None,
                 int(CS.SIGNATURE), 0.0, signature, 0, None, None, ft)

        if not cols["rtype"]:
            return _empty_parse_out()
        out = pd.DataFrame(cols)
        # assign target partition for LINKED rows (vectorized)
        linked = (out["rtype"] == "crawl_parse") & (out["status"] == CS.LINKED)
        if linked.any():
            parts = partition_for_hosts(
                out.loc[linked, "host"].to_numpy(),
                cfg.num_partitions,
                cfg.partition_seed,
                cfg.partition_mode,
            )
            out.loc[linked, "part"] = parts
        return out


_PARSE_COLS = [
    "rtype", "url", "host", "part", "doc_id", "spans", "status", "score",
    "signature", "fetch_interval", "anchor", "dst", "metadata", "fetch_time",
]


def _empty_parse_out() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype="object") for c in _PARSE_COLS})


def parse(fetch_out_ds, cfg: CrawlConfig, concurrency=None, batch_size: int = 256):
    """Ray Data parse pipeline over successful fetches.

    Small batch_size: rows carry content bytes (http.content.limit=1MB),
    so 256 rows × 1 MB bounds per-batch heap at ~256 MB worst case.
    """
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return fetch_out_ds.map_batches(
        ParseBatch(cfg), batch_format="pandas", batch_size=batch_size, **kwargs
    )


def split_parse_output(parse_ds):
    """Zero-copy split of the tagged parse table."""
    docs = parse_ds.filter(expr="rtype == 'doc'")
    outlinks = parse_ds.filter(expr="rtype == 'outlink'")
    crawl_parse = parse_ds.filter(expr="rtype == 'crawl_parse'")
    return docs, outlinks, crawl_parse
