"""URL filters: regex / prefix / suffix / domain chains.

Re-implements the reference's filter plugins from observed semantics:

- RegexURLFilter (src/plugin/urlfilter-regex/.../RegexURLFilter.java;
  default rules conf/regex-urlfilter.txt.template): ordered ``+``/``-``
  regex rules, FIRST match wins; no match => reject.
- PrefixURLFilter / SuffixURLFilter (src/plugin/urlfilter-prefix,
  urlfilter-suffix): accept only URLs with a listed prefix/suffix.
- DomainURLFilter / DomainDenylistURLFilter (src/plugin/urlfilter-domain*):
  accept (or reject) by host / domain membership.
- URLFilters chain (net/URLFilters.java): filters applied in order; any
  ``None`` (reject) drops the URL.

Filters are pure ``str -> bool``; the chain exposes a vectorized
``accept_many`` producing a numpy mask.
"""

from __future__ import annotations

import re

import numpy as np

from .urlutil import get_domain, get_host

# conf/regex-urlfilter.txt.template (uncommented rules)
DEFAULT_REGEX_FILTER_RULES: list[tuple[str, str]] = [
    ("-", r"^(?:file|ftp|mailto):"),
    ("-", r"(?i)\.(?:gif|jpg|png|ico|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|exe|jpeg|bmp|js)$"),
    ("-", r"[?*!@=]"),
    ("-", r".*(/[^/]+)/[^/]+\1/[^/]+\1/"),
    ("+", r"."),
]


def parse_regex_filter_rules(text: str) -> list[tuple[str, str, str | None]]:
    """RegexURLFilterBase.readRules (:240-286): ``+``/``-`` regex lines,
    ``#``/blank skipped, ``> host-or-domain`` opens a scoped block and
    ``<`` closes it (NUTCH-1838). Returns (sign, regex, host_or_domain)
    triples; an invalid first character raises like the reference."""
    rules: list[tuple[str, str, str | None]] = []
    host_or_domain: str | None = None
    for line in text.splitlines():
        if not line:
            continue
        first = line[0]
        if first in (" ", "#", "\n"):
            continue
        if first == ">":
            host_or_domain = line[1:].strip()
            continue
        if first == "<":
            host_or_domain = None
            continue
        if first not in "+-":
            raise ValueError(f"Invalid first character: {line}")
        rules.append((first, line[1:], host_or_domain))
    return rules


class RegexURLFilter:
    name = "regex"

    def __init__(self, rules=None):
        src = rules if rules is not None else DEFAULT_REGEX_FILTER_RULES
        # entries are (sign, regex) pairs or (sign, regex, host_or_domain)
        # triples from parse_regex_filter_rules
        self.rules = [
            (r[0] == "+", re.compile(r[1]), r[2] if len(r) > 2 else None)
            for r in src
        ]
        self._has_scoped = any(h is not None for _, _, h in self.rules)

    @classmethod
    def from_rule_lines(cls, text: str) -> "RegexURLFilter":
        return cls(parse_regex_filter_rules(text))

    def __call__(self, url: str) -> bool:
        host = domain = None
        if self._has_scoped:
            # scoped rules apply only when their tag equals the url's
            # host OR its domain (RegexURLFilterBase.filter:171-205)
            host = get_host(url)
            domain = get_domain(host)
        for accept, pat, scope in self.rules:
            if scope is not None and scope != host and scope != domain:
                continue
            if pat.search(url):
                return accept
        return False


class PrefixMatcher:
    """PrefixStringMatcher (util/PrefixStringMatcher.java, exercised by
    TestPrefixStringMatcher) re-expressed for batches: the trie's
    O(len(input)) lookup becomes K vectorized hash passes (K = number
    of DISTINCT prefix lengths, bounded by the longest prefix) — each
    pass one ``str.slice(0, L).isin(set)`` over the whole column, no
    per-row Python. Empty prefixes never match (the reference's
    matcher agrees with its brute-force oracle on that)."""

    def __init__(self, prefixes):
        self._by_len: dict[int, set] = {}
        for p in prefixes:
            if p:
                self._by_len.setdefault(len(p), set()).add(p)
        self._lens = sorted(self._by_len)

    def matches(self, s: str) -> bool:
        return any(s[:L] in ps for L, ps in self._by_len.items())

    def shortest_match(self, s: str) -> str | None:
        for L in self._lens:
            if s[:L] in self._by_len[L]:
                return s[:L]
        return None

    def longest_match(self, s: str) -> str | None:
        for L in reversed(self._lens):
            if s[:L] in self._by_len[L]:
                return s[:L]
        return None

    def matches_batch(self, values) -> np.ndarray:
        import pandas as pd

        s = pd.Series(values, dtype=object).fillna("")
        out = np.zeros(len(s), dtype=bool)
        for L in self._lens:
            out |= s.str.slice(0, L).isin(self._by_len[L]).to_numpy()
        return out


class SuffixMatcher:
    """SuffixStringMatcher (util/SuffixStringMatcher.java, exercised by
    TestSuffixStringMatcher) — the mirror of PrefixMatcher: by-length
    tail-slice set passes."""

    def __init__(self, suffixes):
        self._by_len: dict[int, set] = {}
        for p in suffixes:
            if p:
                self._by_len.setdefault(len(p), set()).add(p)
        self._lens = sorted(self._by_len)

    def matches(self, s: str) -> bool:
        return any(len(s) >= L and s[-L:] in ps for L, ps in self._by_len.items())

    def shortest_match(self, s: str) -> str | None:
        for L in self._lens:
            if len(s) >= L and s[-L:] in self._by_len[L]:
                return s[-L:]
        return None

    def longest_match(self, s: str) -> str | None:
        for L in reversed(self._lens):
            if len(s) >= L and s[-L:] in self._by_len[L]:
                return s[-L:]
        return None

    def matches_batch(self, values) -> np.ndarray:
        import pandas as pd

        s = pd.Series(values, dtype=object).fillna("")
        out = np.zeros(len(s), dtype=bool)
        for L in self._lens:
            out |= (s.str.len() >= L).to_numpy() & s.str.slice(-L).isin(
                self._by_len[L]).to_numpy()
        return out


class PrefixURLFilter:
    name = "prefix"

    def __init__(self, prefixes: tuple = ()):
        # blank entries are skipped like the reference's rule-file
        # reader (keeps the scalar and batch paths consistent)
        self.prefixes = tuple(p for p in prefixes if p)
        self._matcher = PrefixMatcher(self.prefixes)

    def __call__(self, url: str) -> bool:
        return url.startswith(self.prefixes) if self.prefixes else False

    def accept_batch(self, urls) -> np.ndarray:
        # vectorized chain member (URLFilters.accept_many fast path)
        if not self.prefixes:
            return np.zeros(len(urls), dtype=bool)
        return self._matcher.matches_batch(urls)


class SuffixURLFilter:
    """urlfilter-suffix (SuffixURLFilter.java + TestSuffixURLFilter):
    ``mode_accept`` True (default) rejects listed suffixes and keeps
    everything else; False keeps ONLY listed suffixes. Case-SENSITIVE
    by default; ``filter_from_path`` checks the url path (query and
    fragment stripped) instead of the raw string."""

    name = "suffix"

    def __init__(self, suffixes: tuple = (), mode_accept: bool = True,
                 ignore_case: bool = False, filter_from_path: bool = False,
                 reject_matching: bool | None = None):
        if reject_matching is not None:  # legacy alias
            mode_accept = reject_matching
        self.ignore_case = ignore_case
        self.mode_accept = mode_accept
        self.filter_from_path = filter_from_path
        self.suffixes = tuple(
            s.lower() for s in suffixes) if ignore_case else tuple(suffixes)

    def __call__(self, url: str) -> bool:
        probe = url
        if self.filter_from_path:
            from urllib.parse import urlsplit

            try:
                probe = urlsplit(url).path
            except ValueError:
                pass
        if self.ignore_case:
            probe = probe.lower()
        hit = probe.endswith(self.suffixes) if self.suffixes else False
        return not hit if self.mode_accept else hit

    def accept_batch(self, urls) -> np.ndarray:
        if self.filter_from_path:
            # path extraction stays per-row (urlsplit); the chain's
            # rowwise fallback handles this member
            return np.fromiter((self(u) for u in urls), dtype=bool,
                               count=len(urls))
        import pandas as pd

        s = pd.Series(urls, dtype=object).fillna("")
        if self.ignore_case:
            s = s.str.lower()
        if not hasattr(self, "_matcher"):
            self._matcher = SuffixMatcher(self.suffixes)
        hit = self._matcher.matches_batch(s)
        return ~hit if self.mode_accept else hit


class DomainURLFilter:
    """urlfilter-domain (DomainURLFilter.java:158-176): accept URLs
    whose public suffix, domain or host appears in the allow set
    (checked most-general-first like the reference)."""

    name = "domain"

    def __init__(self, allowed: tuple = ()):
        self.allowed = frozenset(a.lower() for a in allowed)

    def __call__(self, url: str) -> bool:
        from .urlutil import get_domain_suffix

        host = get_host(url)
        return (
            get_domain_suffix(host) in self.allowed
            or get_domain(host) in self.allowed
            or host in self.allowed
        )


class DomainDenylistURLFilter:
    """urlfilter-domaindenylist: the domain filter's suffix/domain/host
    membership check, inverted (listed entries rejected)."""

    name = "domaindenylist"

    def __init__(self, denied: tuple = ()):
        self.denied = frozenset(d.lower() for d in denied)

    def __call__(self, url: str) -> bool:
        from .urlutil import get_domain_suffix

        host = get_host(url)
        return (
            get_domain_suffix(host) not in self.denied
            and get_domain(host) not in self.denied
            and host not in self.denied
        )


class DescendantURLFilter:
    """coherencebot's descendant-of-seed restriction (urlfilter-descendants):
    accept only URLs that are path-descendants of a seed URL on the same
    host. Seed set is broadcast to every worker (small side)."""

    name = "descendants"

    def __init__(self, seed_prefixes: tuple = ()):
        norm = []
        for s in seed_prefixes:
            s = s.rstrip("/")
            norm.append(s + "/")
            norm.append(s)
        self.prefixes = tuple(norm)

    def __call__(self, url: str) -> bool:
        return url.startswith(self.prefixes) if self.prefixes else False


class FastURLFilter:
    """urlfilter-fast analogue (src/plugin/urlfilter-fast/.../
    FastURLFilter.java): rules are grouped per host/domain so only the
    URL's own group is tested — O(rules-for-this-host), not O(all).

    ``rules`` maps a host or registered domain (or "" for global) to an
    ordered list of (sign, path_regex); first match wins within the
    group, host group consulted before domain before global; no match
    anywhere => accept.
    """

    name = "fast"

    def __init__(self, rules: dict | None = None):
        # legacy dict form: key -> [(sign, path_regex)]; entries match
        # against path+query, keys are looked up as host then domain
        self.host_rules: dict[str, list] = {}
        self.domain_rules: dict[str, list] = {}
        self.global_rules: list = []
        for k, v in (rules or {}).items():
            group = [(sign == "+", re.compile(pat), True) for sign, pat in v]
            if k == "":
                self.global_rules = group
            else:
                self.host_rules[k] = group
                self.domain_rules[k] = group

    @classmethod
    def from_rules_text(cls, text: str) -> "FastURLFilter":
        """Parse the plugin's rule-file format (FastURLFilter.java:
        readRules): ``Host <h>`` / ``Domain <d>`` headers with indented
        ``DenyPath <re>`` (matches the url PATH) / ``DenyPathQuery <re>``
        (matches path?query) lines; ``Domain .`` rules apply globally;
        a Domain entry covers the registered domain and every
        subdomain; no match anywhere -> accept."""
        f = cls()
        target: list | None = None
        for raw in text.splitlines():
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            head, _, arg = line.partition(" ")
            arg = arg.strip()
            if head == "Host":
                target = f.host_rules.setdefault(arg.lower(), [])
            elif head == "Domain":
                if arg == ".":
                    target = f.global_rules
                else:
                    target = f.domain_rules.setdefault(arg.lower(), [])
            elif head in ("DenyPath", "DenyPathQuery") and target is not None:
                target.append((False, re.compile(arg), head == "DenyPathQuery"))
        return f

    def __call__(self, url: str) -> bool:
        from urllib.parse import urlsplit

        try:
            sp = urlsplit(url)
            path = sp.path or "/"
            pathquery = path + (f"?{sp.query}" if sp.query else "")
            host = (sp.hostname or "").lower()
        except ValueError:
            return True
        groups = []
        if host:
            g = self.host_rules.get(host)
            if g:
                groups.append(g)
            g = self.domain_rules.get(get_domain(host))
            if g:
                groups.append(g)
        if self.global_rules:
            groups.append(self.global_rules)
        for group in groups:
            for accept, pat, use_query in group:
                if pat.search(pathquery if use_query else path):
                    return accept
        return True


_VALID_URL = re.compile(
    r"^(https?|ftp)://"
    r"([A-Za-z0-9]([A-Za-z0-9\-]{0,61}[A-Za-z0-9])?\.)+[A-Za-z]{2,}"
    r"(:\d{1,5})?"
    r"(/[^\s]*)?$"
)


class ValidatorURLFilter:
    """urlfilter-validator: RFC-ish syntactic URL validation."""

    name = "validator"

    def __call__(self, url: str) -> bool:
        if len(url) > 2083 or not _VALID_URL.match(url):
            return False
        try:
            from urllib.parse import urlsplit

            p = urlsplit(url)
            return bool(p.scheme and p.hostname)
        except ValueError:
            return False


class PathURLFilter:
    """urlfilter-path (PathURLFilter.java:66-95): reject URLs where ANY
    non-empty path segment EXACTLY equals a listed entry (the
    reference's trie longestMatch + same-length check); query/fragment
    are not part of the path; backslashes normalize to slashes."""

    name = "path"

    def __init__(self, denied_segments: tuple = ()):
        self.denied = frozenset(denied_segments)

    def __call__(self, url: str) -> bool:
        if not self.denied:
            return True
        from urllib.parse import urlsplit

        try:
            path = urlsplit(url.replace("\\", "/")).path or ""
        except ValueError:
            return True
        return not any(seg and seg in self.denied for seg in path.split("/"))


class ExemptionURLFilter:
    """urlfilter-ignoreexempt analogue: URLs matching an exemption rule
    bypass the db.ignore.external.links restriction. Used as a predicate
    by the parse stage; standalone it accepts everything."""

    name = "ignoreexempt"

    def __init__(self, exempt_patterns: tuple = ()):
        self.patterns = [re.compile(p) for p in exempt_patterns]

    def is_exempt(self, url: str) -> bool:
        return any(p.search(url) for p in self.patterns)

    def __call__(self, url: str) -> bool:
        return True


class AutomatonURLFilter:
    """urlfilter-automaton (AutomatonURLFilter.java:95-108): +/- regex
    rules compiled into ONE union DFA (functions/automaton.UnionDFA),
    FULL-string match per rule (brics RunAutomaton.run), first matching
    rule in file order wins, no match -> reject. The batch path
    (``accept_batch``) steps the DFA column-major — one numpy gather
    per character position for the whole url batch."""

    name = "automaton"

    def __init__(self, rules: list[tuple[str, str]] | None = None):
        from .automaton import UnionDFA

        src = rules if rules is not None else [
            # the plugin's WholeWebCrawling sample defaults (full-match
            # patterns, hence the explicit .* where regex used search)
            ("-", r"(file|ftp|mailto):.*"),
            ("-", r".*\.(gif|GIF|jpg|JPG|ico|ICO|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|MOV|exe)"),
            ("-", r".*[?*!@=].*"),
            ("+", r".*"),
        ]
        self.signs = np.array([s == "+" for s, _ in src], dtype=bool)
        self.dfa = UnionDFA([pat for _, pat in src])

    def __call__(self, url: str) -> bool:
        r = int(self.dfa.match_rule([url])[0])
        return bool(self.signs[r]) if r >= 0 else False

    def accept_batch(self, urls) -> np.ndarray:
        r = self.dfa.match_rule(urls)
        out = np.zeros(len(r), dtype=bool)
        m = r >= 0
        out[m] = self.signs[r[m]]
        return out


_REGISTRY = {
    "regex": RegexURLFilter,
    "automaton": AutomatonURLFilter,
    "fast": FastURLFilter,
    "validator": ValidatorURLFilter,
    "path": PathURLFilter,
    "ignoreexempt": ExemptionURLFilter,
    "prefix": PrefixURLFilter,
    "suffix": SuffixURLFilter,
    "domain": DomainURLFilter,
    "domaindenylist": DomainDenylistURLFilter,
    "descendants": DescendantURLFilter,
}


def register_filter(name: str, factory) -> None:
    _REGISTRY[name] = factory


def make_url_filters(cfg) -> "URLFilters":
    """Build the chain from cfg.filters, prepending cfg.filter_rules
    (extra (sign, regex) rules, checked before the defaults) to the
    regex filter when present."""
    kwargs = {}
    extra = tuple(getattr(cfg, "filter_rules", ()) or ())
    if extra and "regex" in (cfg.filters or ()):
        kwargs["regex"] = {"rules": list(extra) + list(DEFAULT_REGEX_FILTER_RULES)}
    return URLFilters(cfg.filters, **kwargs)


class URLFilters:
    """Ordered all-must-accept chain (net/URLFilters.java)."""

    def __init__(self, names: tuple = ("regex",), instances: list | None = None, **kwargs):
        if instances is not None:
            self.chain = list(instances)
        else:
            self.chain = [_REGISTRY[n](**kwargs.get(n, {})) for n in names]

    def accept(self, url: str) -> bool:
        return all(f(url) for f in self.chain)

    def accept_many(self, urls) -> np.ndarray:
        # vectorized members (accept_batch, e.g. the automaton DFA) run
        # column-major over the whole batch; per-row members keep the
        # memoized loop over the still-accepted subset
        out = np.ones(len(urls), dtype=bool)
        rowwise = []
        for f in self.chain:
            if hasattr(f, "accept_batch"):
                out &= np.asarray(f.accept_batch(urls), dtype=bool)
            else:
                rowwise.append(f)
        if rowwise and out.any():
            memo: dict[str, bool] = {}
            for i in np.flatnonzero(out):
                u = urls[i]
                v = memo.get(u)
                if v is None:
                    v = all(f(u) for f in rowwise)
                    memo[u] = v
                out[i] = v
        return out
