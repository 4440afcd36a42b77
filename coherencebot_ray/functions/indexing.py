"""IndexingFilter plugin chain (indexer/IndexingFilter.java,
IndexingFilters.java): ordered, registered document-field filters run
after the indexer join, each of which may add/rewrite fields or DROP the
document (reference: return null).

Vectorized restatement: each plugin's ``apply(df, cfg)`` returns
(df, keep_mask). The chain threads the frame through every plugin and
ANDs the masks — one pass per plugin over a batch, no per-row dispatch.

Plugins (src/plugin/index-*):
- basic    BasicIndexingFilter.java: host, url, content, title
           (truncated to indexer.max.title.length=100), tstamp
- anchor   AnchorIndexingFilter.java: deduplicated inlink anchors
- more     MoreIndexingFilter.java: contentLength, contentType
           (+ primary type), date
- metadata MetadataIndexer.java: copy configured metadata keys to fields
- static   StaticFieldIndexer.java: constant fields from config
- criteria CriteriaIndexer.java:87-99,135: reject short docs
           (index.criteria.minlength=4000) + best-title selection
- replace  ReplaceIndexer.java: regex replacements on field contents,
           host/url-scoped (index.replace.regexp)
- links    LinksIndexingFilter.java: outlinks/inlinks fields with
           same-host filtering and hosts-only mode
- subcollection  SubcollectionIndexingFilter.java: collection names by
           URL white/black lists (functions/subcollection.py)
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

MAX_TITLE_LENGTH = 100  # indexer.max.title.length


class IndexingFilter:
    name = "base"

    def apply(self, df: pd.DataFrame, cfg) -> tuple[pd.DataFrame, np.ndarray]:
        return df, np.ones(len(df), dtype=bool)


class BasicIndexingFilter(IndexingFilter):
    """index-basic (BasicIndexingFilter.java:53-130, exercised by
    TestBasicIndexingFilter): host/url/content/title/tstamp fields;
    indexer.max.title.length clip (default 100), indexer.add.domain
    (default false), indexer.max.content.length clip (default -1 =
    unlimited). The knobs ride cfg.extra like the other index-* params."""

    name = "basic"

    def apply(self, df, cfg):
        extra = getattr(cfg, "extra", {}) or {}
        max_title = int(extra.get("indexer_max_title_length", MAX_TITLE_LENGTH))
        max_content = int(extra.get("indexer_max_content_length", -1))
        add_domain = bool(extra.get("indexer_add_domain", False))
        df = df.copy()
        if "host" not in df.columns:
            from .urlutil import hosts_of

            df["host"] = hosts_of(df["url"].to_numpy()).to_numpy()
        if add_domain and "domain" not in df.columns:
            from .urlutil import domains_of

            df["domain"] = domains_of(df["host"].to_numpy()).to_numpy()
        if "title" in df.columns and max_title >= 0:
            df["title"] = df["title"].fillna("").str.slice(0, max_title)
        if "content" not in df.columns and "text" in df.columns:
            df["content"] = df["text"]
        if max_content >= 0 and "content" in df.columns:
            df["content"] = df["content"].fillna("").str.slice(0, max_content)
        if "tstamp" not in df.columns:
            df["tstamp"] = df["fetch_time"] if "fetch_time" in df.columns else 0
        return df, np.ones(len(df), dtype=bool)


class AnchorIndexingFilter(IndexingFilter):
    """index-anchor (AnchorIndexingFilter.java:44-100): inlink anchor
    texts; anchorIndexingFilter.deduplicate (default false, as the
    reference) collapses duplicates in first-seen order (the
    reference's HashSet minus its order-nondeterminism)."""

    name = "anchor"

    def apply(self, df, cfg):
        dedup = bool(getattr(cfg, "extra", {}).get("anchor_deduplicate", False))
        df = df.copy()
        if "anchors" in df.columns:
            if dedup:
                df["anchor"] = df["anchors"].map(
                    lambda a: list(dict.fromkeys(a)) if isinstance(a, (list, np.ndarray)) else []
                )
            else:
                df["anchor"] = df["anchors"].map(
                    lambda a: list(a) if isinstance(a, (list, np.ndarray)) else []
                )
        else:
            df["anchor"] = [[] for _ in range(len(df))]
        return df, np.ones(len(df), dtype=bool)


class MoreIndexingFilter(IndexingFilter):
    """index-more (MoreIndexingFilter.java:80-260): contentLength,
    cleaned + auto-resolved content type with primary/sub parts
    (moreIndexingFilter.indexMimeTypeParts, default true), date, and
    the Content-Disposition filename as title — only when the doc has
    no title yet (NUTCH-1140)."""

    name = "more"

    _DISPO_RE = re.compile(r"filename=\"?([^\";]+)\"?", re.I)

    def apply(self, df, cfg):
        from .mimeutil import auto_resolve_content_type, mime_parts

        df = df.copy()
        text = df["text"] if "text" in df.columns else pd.Series("", index=df.index)
        df["contentLength"] = text.fillna("").str.len().astype(np.int64)
        ct = df["content_type"] if "content_type" in df.columns else pd.Series(None, index=df.index)
        urls = df["url"].fillna("") if "url" in df.columns else pd.Series("", index=df.index)
        types = [
            auto_resolve_content_type(c if isinstance(c, str) else None, u, None)
            for c, u in zip(ct, urls)
        ]
        df["contentType"] = types
        if bool(getattr(cfg, "extra", {}).get("more_index_mimetype_parts", True)):
            parts = [mime_parts(t) for t in types]
            df["primaryType"] = [p[0] if p else "" for p in parts]
            df["subType"] = [p[1] if len(p) > 1 else "" for p in parts]
        if "date" not in df.columns:
            df["date"] = df["fetch_time"] if "fetch_time" in df.columns else 0
        # Content-Disposition filename -> title (metadata JSON), never
        # overwriting an existing title (NUTCH-1140)
        if "metadata" in df.columns:
            titles = df["title"] if "title" in df.columns else pd.Series(None, index=df.index)
            new_titles = []
            changed = False
            for t, m in zip(titles, df["metadata"]):
                if (t is None or (isinstance(t, float) and np.isnan(t)) or t == "") \
                        and isinstance(m, str) and "filename" in m:
                    try:
                        dispo = json.loads(m).get("Content-Disposition", "")
                    except ValueError:
                        dispo = ""
                    mt = self._DISPO_RE.search(dispo or "")
                    if mt:
                        new_titles.append(mt.group(1))
                        changed = True
                        continue
                new_titles.append(t)
            if changed:
                df["title"] = new_titles
        return df, np.ones(len(df), dtype=bool)


class MetadataIndexer(IndexingFilter):
    name = "metadata"

    def apply(self, df, cfg):
        keys = tuple(getattr(cfg, "extra", {}).get("index_metadata_keys", ()))
        if not keys or "metadata" not in df.columns:
            return df, np.ones(len(df), dtype=bool)
        df = df.copy()
        parsed = df["metadata"].map(
            lambda m: json.loads(m) if isinstance(m, str) and m else {}
        )
        for k in keys:
            df[f"meta_{k}"] = parsed.map(lambda d, _k=k: d.get(_k))
        return df, np.ones(len(df), dtype=bool)


class TLDIndexingFilter(IndexingFilter):
    """index-tld (src/plugin/tld/.../TLDIndexingFilter.java:46-60): adds
    the url's public-suffix as a ``tld`` field. (The plugin's scoring
    half, TLDScoringFilter, multiplies the indexer score by per-suffix
    boosts from domain-suffixes.xml — every stock boost is 1.0, so it is
    subsumed: set per-suffix boosts via extra['tld_boosts'] here.)"""

    name = "tld"

    def apply(self, df, cfg):
        from .urlutil import get_domain_suffix, hosts_of

        hosts = (
            df["host"]
            if "host" in df.columns
            else hosts_of(df["url"].to_numpy())
        )
        df = df.copy()
        df["tld"] = pd.Series(hosts).map(get_domain_suffix).to_numpy()
        boosts = (getattr(cfg, "extra", {}) or {}).get("tld_boosts") if cfg else None
        if boosts and "score_boost" in df.columns:
            mul = df["tld"].map(lambda t: boosts.get(t, 1.0)).to_numpy("float32")
            df["score_boost"] = (
                df["score_boost"].to_numpy("float32") * mul
            ).astype(np.float32)
        return df, np.ones(len(df), dtype=bool)


class MimeTypeIndexingFilter(IndexingFilter):
    """mimetype-filter (src/plugin/mimetype-filter/.../
    MimeTypeIndexingFilter.java:90-185): gate documents by resolved MIME
    type against prefix rules. Rule lines via cfg.mimetype_filter_rules:
    '+' switches to accept mode (keep docs whose type matches NO rule),
    '-' to block... the reference's modes: acceptMode=True keeps
    non-matching docs (deny-list), acceptMode=False keeps only matching
    docs (allow-list); other lines are type prefixes."""

    name = "mimetype"

    def apply(self, df, cfg):
        rules = tuple(getattr(cfg, "mimetype_filter_rules", ()) or ())
        if not rules or "content_type" not in df.columns:
            return df, np.ones(len(df), dtype=bool)
        accept_mode = True
        prefixes: list[str] = []
        for line in rules:
            if not line or line[0] in (" ", "\n", "#"):
                continue
            if line[0] == "+":
                accept_mode = True
            elif line[0] == "-":
                accept_mode = False
            else:
                prefixes.append(line.strip())
        from .mimeutil import clean_mime_type

        ctypes = df["content_type"].map(
            lambda c: clean_mime_type(c) if isinstance(c, str) and c else ""
        )
        if prefixes:
            matched = ctypes.str.startswith(tuple(prefixes)).to_numpy()
        else:
            matched = np.zeros(len(df), dtype=bool)
        keep = ~matched if accept_mode else matched
        return df, keep


class GeoIPIndexingFilter(IndexingFilter):
    """index-geoip (src/plugin/index-geoip/.../GeoIPIndexingFilter.java:
    197-230 + GeoIPDocumentCreator.addIfNotNull): looks up the server IP
    recorded in the datum metadata key ``_ip_`` against an OFFLINE
    database seam — extra['geoip_db'] maps ip -> {field: value} (the
    reference reads a MaxMind .mmdb; no such package or network here) —
    and adds every non-null field (ip, cityName, countryIsoCode,
    countryName, latLon, timeZone, ...) to the document."""

    name = "geoip"

    def apply(self, df, cfg):
        db = (getattr(cfg, "extra", {}) or {}).get("geoip_db") if cfg else None
        if not db or "metadata" not in df.columns:
            return df, np.ones(len(df), dtype=bool)
        df = df.copy()
        ips = df["metadata"].map(
            lambda m: (json.loads(m).get("_ip_") if isinstance(m, str) and m else None)
        )
        df["ip"] = ips
        recs = [db.get(ip) or {} for ip in ips]
        keys = sorted({k for r in recs for k in r})
        for k in keys:
            df[k] = [r.get(k) for r in recs]
        return df, np.ones(len(df), dtype=bool)


class RelTagIndexingFilter(IndexingFilter):
    """microformats-reltag indexing half (RelTagIndexingFilter.java:
    44-52): every Rel-Tag recorded in the parse metadata becomes a
    ``tag`` field value (list column here)."""

    name = "reltag"

    def apply(self, df, cfg):
        if "metadata" not in df.columns:
            return df, np.ones(len(df), dtype=bool)
        df = df.copy()
        df["tag"] = df["metadata"].map(
            lambda m: (json.loads(m).get("Rel-Tag") or []) if isinstance(m, str) and m else []
        )
        return df, np.ones(len(df), dtype=bool)


class URLMetaIndexingFilter(IndexingFilter):
    """urlmeta (src/plugin/urlmeta/.../URLMetaIndexingFilter.java:78-95):
    every configured urlmeta.tags key present in the db datum's metadata
    becomes an index field of the same name (the scoring half of the
    plugin propagated the tags seed->outlink, so this surfaces them)."""

    name = "urlmeta"

    def apply(self, df, cfg):
        keys = tuple(getattr(cfg, "urlmeta_tags", ()) or ())
        if not keys or "metadata" not in df.columns:
            return df, np.ones(len(df), dtype=bool)
        df = df.copy()
        parsed = df["metadata"].map(
            lambda m: json.loads(m) if isinstance(m, str) and m else {}
        )
        for k in keys:
            df[k] = parsed.map(lambda d, _k=k: d.get(_k))
        return df, np.ones(len(df), dtype=bool)


class StaticFieldIndexer(IndexingFilter):
    """index-static (StaticFieldIndexer.java): constant fields on every
    document. Two config forms: extra['index_static_fields'] (dict,
    value or list) or the reference's index.static property string via
    extra['index_static'] with the index.static.fieldsep/keysep/
    valuesep delimiters (defaults ',', ':', ' '); whitespace-trimmed,
    key-less entries skipped, multi-valued fields split on valuesep."""

    name = "static"

    @staticmethod
    def parse_property(prop: str, fieldsep: str = ",", keysep: str = ":",
                       valuesep: str = " ") -> dict:
        out: dict = {}
        for entry in prop.split(fieldsep):
            if keysep not in entry:
                continue  # "field3" with no value: skipped (:98)
            key, _, val = entry.partition(keysep)
            key, val = key.strip(), val.strip()
            if not key or not val:
                continue
            vals = [v.strip() for v in val.split(valuesep) if v.strip()]
            out[key] = vals if len(vals) > 1 else vals[0]
        return out

    def apply(self, df, cfg):
        ex = getattr(cfg, "extra", {})
        fields = dict(ex.get("index_static_fields", {}))
        prop = ex.get("index_static", "")
        if prop:
            fields.update(self.parse_property(
                prop,
                ex.get("index_static_fieldsep", ","),
                ex.get("index_static_keysep", ":"),
                ex.get("index_static_valuesep", " "),
            ))
        if not fields:
            return df, np.ones(len(df), dtype=bool)
        df = df.copy()
        for k, v in fields.items():
            df[k] = [v] * len(df) if isinstance(v, list) else v
        return df, np.ones(len(df), dtype=bool)


class CriteriaIndexingFilter(IndexingFilter):
    name = "criteria"

    def apply(self, df, cfg):
        from .enrich import criteria_filter

        min_len = int(getattr(cfg, "extra", {}).get("index_criteria_minlength", 4000))
        keep = criteria_filter(df, min_length=min_len) if "text" in df.columns else np.ones(len(df), dtype=bool)
        return df, np.asarray(keep, dtype=bool)


class _FieldReplacer:
    """One replacement instruction (index-replace FieldReplacer.java:
    60-168): compiled pattern + Java-style replacement applied with
    replaceAll semantics; invalid patterns become no-ops."""

    # Java Pattern flag bits -> Python re flags (FieldReplacer.java:92)
    _FLAG_MAP = ((0x02, re.IGNORECASE), (0x04, re.VERBOSE),
                 (0x08, re.MULTILINE), (0x20, re.DOTALL))

    def __init__(self, field: str, to_field: str, pattern: str,
                 replacement: str, flags: int):
        self.field, self.to_field = field, to_field
        py_flags = 0
        for jbit, pyflag in self._FLAG_MAP:
            if flags & jbit:
                py_flags |= pyflag
        try:
            self.pattern = re.compile(pattern, py_flags)
            self.valid = True
        except re.error:
            self.pattern = None
            self.valid = False
        self.replacement = self._convert_replacement(replacement)

    @staticmethod
    def _convert_replacement(java_repl: str) -> str:
        """Java replaceAll replacement -> Python re.sub template:
        ``$N`` group refs become ``\\N``; ``\\c`` escapes become the
        literal char; everything else passes through (backslashes that
        Python would treat as escapes get doubled)."""
        out = []
        i, n = 0, len(java_repl)
        while i < n:
            c = java_repl[i]
            if c == "$" and i + 1 < n and java_repl[i + 1].isdigit():
                j = i + 1
                while j < n and java_repl[j].isdigit():
                    j += 1
                out.append("\\" + java_repl[i + 1:j])
                i = j
            elif c == "\\" and i + 1 < n:
                nxt = java_repl[i + 1]
                out.append("\\\\" if nxt == "\\" else nxt)
                i += 2
            else:
                out.append("\\\\" if c == "\\" else c)
                i += 1
        return "".join(out)

    def replace(self, value: str) -> str:
        if not self.valid or not isinstance(value, str):
            return value
        return self.pattern.sub(self.replacement, value)


_MATCH_NOTHING = r"(?!x)x"


class ReplaceIndexer(IndexingFilter):
    """index-replace (ReplaceIndexer.java:86-331): pattern replacements
    on selected field contents prior to indexing, scoped by hostmatch=
    / urlmatch= pattern sets. Property format (one instruction per
    line, extra['index_replace_regexp']):

        hostmatch=<host regex>          start a host-scoped set
        urlmatch=<url regex>            start a url-scoped set
        field[:tofield]=/pat/repl/[f]   replacement (any sep char)

    Instructions before the first hostmatch/urlmatch apply to every
    host (Pattern ``.*``). Invalid scope patterns deactivate their set;
    invalid field patterns become per-field no-ops — both as the
    reference logs-and-continues."""

    name = "replace"

    def __init__(self):
        self._src = None
        self._by_host: list = []  # [(compiled_pattern, [replacers])]
        self._by_url: list = []

    def _parse(self, prop: str) -> None:
        self._src = prop
        by_host: dict = {}
        by_url: dict = {}
        host_pat, url_pat = ".*", None
        for line in prop.splitlines():
            line = line.strip()
            if not line or "=" not in line:
                continue
            field, _, value = line.partition("=")
            field = field.strip()
            if field == "hostmatch":
                url_pat = None
                host_pat = value if _compiles(value) else _MATCH_NOTHING
            elif field == "urlmatch":
                url_pat = value if _compiles(value) else _MATCH_NOTHING
            elif len(value) > 3:
                to_field = field
                if ":" in field:
                    field, _, to_field = field.partition(":")
                sep = value[0]
                rest = value[1:]
                if sep not in rest:
                    continue  # missing separator: logged + skipped (:184)
                pattern, _, rest = rest.partition(sep)
                replacement = rest.partition(sep)[0] if sep in rest else rest
                flags = 0
                tail = rest[len(replacement) + 1:].strip() if sep in rest else ""
                if tail:
                    try:
                        flags = int(tail)
                    except ValueError:
                        continue  # invalid flags: skipped (:199)
                fr = _FieldReplacer(field, to_field, pattern, replacement, flags)
                target = by_url if url_pat is not None else by_host
                key = url_pat if url_pat is not None else host_pat
                target.setdefault(key, []).append(fr)
        self._by_host = [(re.compile(p), frs) for p, frs in by_host.items()]
        self._by_url = [(re.compile(p), frs) for p, frs in by_url.items()]

    def apply(self, df, cfg):
        prop = getattr(cfg, "extra", {}).get("index_replace_regexp", "")
        if prop != self._src:
            self._parse(prop)
        keep = np.ones(len(df), dtype=bool)
        if not (self._by_host or self._by_url):
            return df, keep
        df = df.copy()
        for key_col, rep_sets in (("host", self._by_host), ("url", self._by_url)):
            if not rep_sets or key_col not in df.columns:
                continue
            keys = df[key_col].fillna("")
            for pat, frs in rep_sets:
                mask = keys.str.contains(pat, regex=True).to_numpy(dtype=bool)
                if not mask.any():
                    continue
                for fr in frs:
                    if fr.field not in df.columns:
                        continue
                    if fr.to_field not in df.columns:
                        df[fr.to_field] = None
                    df.loc[mask, fr.to_field] = df.loc[mask, fr.field].map(fr.replace)
        return df, keep


def _compiles(pattern: str) -> bool:
    try:
        re.compile(pattern)
        return True
    except re.error:
        return False


class LinksIndexingFilter(IndexingFilter):
    """index-links (LinksIndexingFilter.java:69-166): adds outlinks /
    inlinks fields. extra['index_links_outlinks_host_ignore'] /
    ['index_links_inlinks_host_ignore'] drop same-host links;
    ['index_links_hosts_only'] indexes the host portion only, deduped
    in first-seen order (the reference's HashSet check runs BEFORE the
    same-host filter, so a filtered first link still claims its host —
    preserved here). Expects list columns ``outlinks`` / ``inlinks``
    (the indexer join populates them from doc link spans and linkdb
    srcs when this plugin is registered)."""

    name = "links"

    def apply(self, df, cfg):
        from .urlutil import get_host

        ex = getattr(cfg, "extra", {})
        filter_out = bool(ex.get("index_links_outlinks_host_ignore", False))
        filter_in = bool(ex.get("index_links_inlinks_host_ignore", False))
        hosts_only = bool(ex.get("index_links_hosts_only", False))
        df = df.copy()
        page_hosts = [
            (get_host(u) or "").lower() for u in df["url"].fillna("")
        ] if "url" in df.columns else [""] * len(df)

        for col, filt in (("outlinks", filter_out), ("inlinks", filter_in)):
            if col not in df.columns:
                continue
            vals = df[col].to_numpy()
            res = []
            for links, ph in zip(vals, page_hosts):
                if not isinstance(links, (list, np.ndarray)) or len(links) == 0:
                    res.append([])
                    continue
                kept, seen = [], set()
                for u in links:
                    h = (get_host(u) or "").lower()
                    v = h if hosts_only else u
                    if hosts_only:
                        if v in seen:
                            continue
                        seen.add(v)
                    if filt and h == ph:
                        continue
                    kept.append(v)
                res.append(kept)
            df[col] = res
        return df, np.ones(len(df), dtype=bool)


class JexlIndexingFilter(IndexingFilter):
    """index-jexl-filter (JexlIndexingFilter.java): keep only documents
    matching the index.jexl.filter expression (extra['index_jexl_filter'],
    e.g. "doc.lang=='en'"); ``doc.<field>`` references become column
    references. An unparseable expression raises (the reference's
    setConf throws on a bad expression)."""

    name = "jexl"

    def apply(self, df, cfg):
        expr = getattr(cfg, "extra", {}).get("index_jexl_filter", "")
        if not expr or len(df) == 0:
            return df, np.ones(len(df), dtype=bool)
        from .jexl import evaluate

        py = re.sub(r"\bdoc\.(\w+)", r"\1", expr)
        return df, evaluate(df, py)


class OrgIndexingFilter(IndexingFilter):
    """index-org (OrgIndexer.java:33-160): enrich documents with
    organization metadata looked up by the seed's ``org.slug`` (datum
    metadata, injected by the FeedInjector) or by the document domain.
    The reference calls a private orgs API with an LRU cache; here the
    client is injectable — extra['org_lookup'] is a callable
    ``(slug, domain) -> dict | None`` or a plain ``{key: fields}``
    mapping (keyed by slug or domain) — so the Ray-side plumbing is
    real and tested while the service stays external. Results are
    cached per filter instance (the reference's LRUCache(500))."""

    name = "org"
    CACHE_MAX = 500

    def __init__(self):
        self._cache: dict = {}

    def _lookup(self, lookup, slug, domain):
        key = (slug, domain)
        if key in self._cache:
            return self._cache[key]
        if callable(lookup):
            fields = lookup(slug, domain)
        else:
            fields = lookup.get(slug) if slug else None
            if fields is None and domain:
                fields = lookup.get(domain)
        if len(self._cache) >= self.CACHE_MAX:
            self._cache.pop(next(iter(self._cache)))
        self._cache[key] = fields
        return fields

    def apply(self, df, cfg):
        lookup = getattr(cfg, "extra", {}).get("org_lookup")
        if lookup is None or len(df) == 0:
            return df, np.ones(len(df), dtype=bool)
        from .urlutil import get_domain, get_host

        df = df.copy()
        metas = df["metadata"].to_numpy() if "metadata" in df.columns else np.full(len(df), None, dtype=object)
        domains = (
            df["domain"].to_numpy()
            if "domain" in df.columns
            else np.array([get_domain(get_host(u)) for u in df["url"].fillna("")], dtype=object)
        )
        new_cols: dict[str, list] = {}
        for i, (m, dom) in enumerate(zip(metas, domains)):
            slug = None
            if isinstance(m, str) and "org.slug" in m:
                try:
                    slug = json.loads(m).get("org.slug")
                except ValueError:
                    slug = None
            fields = self._lookup(lookup, slug, dom) if (slug or dom) else None
            if not fields:
                continue
            for k, v in fields.items():
                col = new_cols.setdefault(k, [None] * len(df))
                col[i] = v
        for k, vals in new_cols.items():
            df[k] = vals
        return df, np.ones(len(df), dtype=bool)


from .license import CCIndexingFilter  # noqa: E402
from .subcollection import SubcollectionIndexingFilter  # noqa: E402

_REGISTRY = {
    c.name: c
    for c in (
        BasicIndexingFilter,
        AnchorIndexingFilter,
        MoreIndexingFilter,
        MetadataIndexer,
        URLMetaIndexingFilter,
        TLDIndexingFilter,
        MimeTypeIndexingFilter,
        GeoIPIndexingFilter,
        RelTagIndexingFilter,
        StaticFieldIndexer,
        CriteriaIndexingFilter,
        ReplaceIndexer,
        LinksIndexingFilter,
        SubcollectionIndexingFilter,
        CCIndexingFilter,
        JexlIndexingFilter,
        OrgIndexingFilter,
    )
}


def register_indexing_filter(name: str, cls) -> None:
    _REGISTRY[name] = cls


class IndexingFilters:
    """Ordered chain; a row dropped by any plugin stays dropped
    (IndexingFilters.java:filter returns null short-circuit)."""

    def __init__(self, names=("basic", "anchor", "more"), cfg=None):
        self.cfg = cfg
        self.chain = [_REGISTRY[n]() for n in names]

    def apply(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        keep = np.ones(len(df), dtype=bool)
        for f in self.chain:
            df = df.reset_index(drop=True)
            df, mask = f.apply(df, self.cfg)
            keep = keep[: len(df)] if len(keep) != len(df) else keep
            keep &= np.asarray(mask, dtype=bool)
            df = df[keep].reset_index(drop=True)
            keep = np.ones(len(df), dtype=bool)
        return df
