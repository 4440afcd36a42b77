"""creativecommons plugin (src/plugin/creativecommons): detect CC
license declarations in HTML and index their features — the
license-filtering primitive a training-data pipeline needs.

- CCParseFilter.Walker   CCParseFilter.java:47-245: scan anchors for
  rel="license" / CC license hrefs and comments for RDF license
  blocks; precedence rdf > rel > a.
- CCIndexingFilter       CCIndexingFilter.java:40-110: cc field
  features (license=<url>, meta=<location>, work type, url path
  tokens).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit

import numpy as np

CC_NS = "http://web.resource.org/cc/"
DC_NS = "http://purl.org/dc/elements/1.1/"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

LICENSE_URL = "License-Url"
LICENSE_LOCATION = "License-Location"
WORK_TYPE = "Work-Type"

# CCParseFilter.java WORK_TYPE_NAMES
WORK_TYPE_NAMES = {
    "http://purl.org/dc/dcmitype/MovingImage": "video",
    "http://purl.org/dc/dcmitype/StillImage": "image",
    "http://purl.org/dc/dcmitype/Sound": "audio",
    "http://purl.org/dc/dcmitype/Text": "text",
    "http://purl.org/dc/dcmitype/Interactive": "interactive",
    "http://purl.org/dc/dcmitype/Software": "software",
    "http://purl.org/dc/dcmitype/Image": "image",
}


class _CCWalker(HTMLParser):
    """Single pass over the document: CC anchors + RDF comments."""

    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.rdf_license: str | None = None
        self.rel_license: str | None = None
        self.anchor_license: str | None = None
        self.work_type: str | None = None

    def handle_starttag(self, tag, attrs):
        # findLicenseUrl (CCParseFilter.java:119-147): anchors whose
        # resolved href is http://creativecommons.org/licenses/<x>
        if tag != "a":
            return
        d = dict(attrs)
        href = d.get("href")
        if not href:
            return
        url = urljoin(self.base, href)
        sp = urlsplit(url)
        if (sp.scheme == "http" and (sp.hostname or "").lower() == "creativecommons.org"
                and sp.path.startswith("/licenses/") and len(sp.path) > len("/licenses/")):
            if d.get("rel") == "license" and self.rel_license is None:
                self.rel_license = url
            elif self.anchor_license is None:
                self.anchor_license = url

    def handle_comment(self, data):
        # findRdf (:163-232): comments containing an rdf:RDF block in
        # the CC namespace
        if "RDF" not in data or CC_NS not in data:
            return
        try:
            root = ET.fromstring(data.strip())
        except ET.ParseError:
            return
        if root.tag != f"{{{RDF_NS}}}RDF":
            return
        for lic in root.iter(f"{{{CC_NS}}}License"):
            about = lic.get(f"{{{RDF_NS}}}about")
            if about:
                self.rdf_license = about
        for t in root.iter(f"{{{DC_NS}}}type"):
            res = t.get(f"{{{RDF_NS}}}resource")
            if res in WORK_TYPE_NAMES:
                self.work_type = WORK_TYPE_NAMES[res]


def find_cc_license(content: bytes, base_url: str) -> dict:
    """Walker.walk result interpretation (:71-103): first choice the
    RDF subject, then rel=license anchors, then plain CC anchors.
    Returns {} when unlicensed."""
    w = _CCWalker(base_url)
    try:
        w.feed(content.decode("utf-8", errors="replace"))
        w.close()
    except Exception:
        return {}
    out: dict = {}
    if w.rdf_license is not None:
        out[LICENSE_URL], out[LICENSE_LOCATION] = w.rdf_license, "rdf"
    elif w.rel_license is not None:
        out[LICENSE_URL], out[LICENSE_LOCATION] = w.rel_license, "rel"
    elif w.anchor_license is not None:
        out[LICENSE_URL], out[LICENSE_LOCATION] = w.anchor_license, "a"
    if w.work_type is not None:
        out[WORK_TYPE] = w.work_type
    return out


def cc_index_features(license_url: str | None, location: str | None,
                      work_type: str | None) -> list[str]:
    """CCIndexingFilter feature list for the ``cc`` field: the full
    license=<url>, path tokens after /licenses/ split on /-,
    meta=<location>, and the work type."""
    feats: list[str] = []
    if license_url:
        feats.append(f"license={license_url}")
        path = urlsplit(license_url).path
        toks = [t for t in path.replace("-", "/").split("/") if t]
        feats.extend(toks[1:])  # drop the leading "licenses"
    if location:
        feats.append(f"meta={location}")
    if work_type:
        feats.append(work_type)
    return feats


class CCIndexingFilter:
    """IndexingFilter plugin ("cc"): metadata License-Url /
    License-Location / Work-Type (JSON) -> cc feature-list field."""

    name = "cc"

    def apply(self, df, cfg):
        import json

        import pandas as pd  # noqa: F401

        df = df.copy()
        feats: list = []
        metas = df["metadata"].to_numpy() if "metadata" in df.columns else np.full(len(df), None, dtype=object)
        for m in metas:
            md = {}
            if isinstance(m, str) and m:
                try:
                    md = json.loads(m)
                except ValueError:
                    md = {}
            feats.append(cc_index_features(
                md.get(LICENSE_URL), md.get(LICENSE_LOCATION), md.get(WORK_TYPE)))
        df["cc"] = feats
        return df, np.ones(len(df), dtype=bool)
