"""parsefilter-outlinks (src/plugin/parsefilter-outlinks/.../
OutlinkParseFilter.java:64-225): keeps a crawl inside a seed's section.

Two independent gates over a page's outlinks:

- ``db.descendant.links``: an outlink survives only if host+path of the
  seed url (content meta ``collection.seed``, else the page url) is a
  prefix of the outlink's host+path; PDFs get a special pass when their
  domain or host is listed in the page's ``org.domains`` meta
  (semicolon-separated).
- ``db.approve.anchors``: anchors are trimmed, lowercased, stripped of
  leading/trailing punctuation; an anchor that EXACTLY equals a rule
  (the reference's trie longestMatch == full length) rejects every
  outlink sharing that target url.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from .urlutil import get_domain, get_host

_PUNCT_RE = re.compile(r"^\W*(.*?)\W*$", re.DOTALL)


def _host_path(url: str) -> str:
    u = urlsplit(url)
    return (u.hostname or "").lower() + (u.path or "").lower()


def validate_descendant(from_url: str, to_url: str, allowed_domains: tuple) -> bool:
    """OutlinkParseFilter.validateDescendant(:182-225): host+path prefix
    check, with the allowed-domain PDF exception."""
    from_url = from_url.replace("\\", "/")
    to_url = to_url.replace("\\", "/")
    try:
        from_chk = _host_path(from_url)
        to_chk = _host_path(to_url)
    except ValueError:
        return False
    if to_chk.startswith(from_chk):
        return True
    if ".pdf" in to_url:
        to_domain = get_domain(get_host(to_url)).lower()
        to_host = get_host(to_url).lower()
        for d in allowed_domains:
            if d == to_domain or d == to_host:  # CDN hosts allowed too
                return True
    return False


def normalize_anchor(anchor: str) -> str:
    """Trim, lowercase, strip leading/trailing punctuation
    (OutlinkParseFilter.java:123-126)."""
    a = (anchor or "").strip().lower()
    m = _PUNCT_RE.match(a)
    return m.group(1) if m else a


def anchor_rejected_urls(outlinks, rules: frozenset) -> set:
    """Urls excluded because ANY of their anchors exactly matches a
    rejection rule (OutlinkParseFilter.java:117-137: one bad anchor
    excludes every outlink with that toUrl)."""
    out = set()
    for to_url, anchor in outlinks:
        a = normalize_anchor(anchor)
        if a and a in rules:
            out.add(to_url)
    return out


def filter_outlinks(
    from_url: str,
    outlinks: list,
    *,
    require_descendants: bool,
    approve_anchors: bool,
    anchor_rules: frozenset,
    seed_url: str | None = None,
    allowed_domains: tuple = (),
) -> list:
    """Apply both gates in the reference's order. ``outlinks`` is a list
    of (to_url, anchor[, ...]) tuples; extra fields ride along."""
    kept = outlinks
    if require_descendants:
        seed = seed_url or from_url
        kept = [o for o in kept if validate_descendant(seed, o[0], allowed_domains)]
    if approve_anchors and anchor_rules and kept:
        bad = anchor_rejected_urls([(o[0], o[1]) for o in kept], anchor_rules)
        if bad:
            kept = [o for o in kept if o[0] not in bad]
    return kept
