"""language-identifier HTML metadata detection (src/plugin/
language-identifier/.../HTMLLanguageParser.java:92-260): find the page
language from markup before falling back to statistical identification
(ops/text.langid here; Tika/Comprehend in the reference).

Priority (LanguageParser ctor): the first element ``lang`` attribute,
else ``<meta name=dc.language>``, else
``<meta http-equiv=content-language>`` — each normalized through
``parse_language``: split multi-valued strings on ``,| |;|.|(|)|=``,
take each token's primary subtag (before ``-``/``_``), return the
first that resolves in the ISO 639 alias table.
"""

from __future__ import annotations

import re

from .langcodes import LANGUAGES_MAP

_SPLIT_RE = re.compile(r"[,\s;.()=]")


def parse_language(lang: str | None) -> str | None:
    """HTMLLanguageParser.LanguageParser.parseLanguage(:228-252)."""
    if not lang:
        return None
    for token in _SPLIT_RE.split(lang):
        code = token.split("-")[0].split("_")[0]
        hit = LANGUAGES_MAP.get(code.lower())
        if hit is not None:
            return hit
    return None


def detect_language(html_lang_attr: str | None, metatags) -> str | None:
    """Markup-priority fold (html lang > dc.language > http-equiv
    content-language); ``metatags`` is the parse pass's (name, value)
    list (meta name= and http-equiv= both land there)."""
    lang = parse_language(html_lang_attr)
    if lang:
        return lang
    dc = None
    http_equiv = None
    for name, value in metatags or ():
        n = name.lower()
        if dc is None and n == "dc.language":
            dc = parse_language(value)
        elif http_equiv is None and n == "content-language":
            http_equiv = parse_language(value)
    return dc or http_equiv
