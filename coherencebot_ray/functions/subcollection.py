"""subcollection plugin (src/plugin/subcollection): assign documents to
named sub-collections by URL substring white/black lists, and index the
collection names as a document field.

- Subcollection            collection/Subcollection.java:36-282
- CollectionManager        collection/CollectionManager.java (XML
                           <subcollections> config parse + whichCollection)
- SubcollectionIndexingFilter  indexer/subcollection/
                           SubcollectionIndexingFilter.java:40-110

Filter evaluation (Subcollection.filter:170-193): a URL is in the
collection iff NO blacklist entry is contained in it AND some whitelist
entry is. Matching is plain substring (indexOf), optionally lowercased
first (subcollection.case.insensitive).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import numpy as np


class Subcollection:
    """One named collection: substring white/black lists."""

    def __init__(self, id: str = "", name: str = "", key: str | None = None,
                 case_insensitive: bool = False):
        self.id = id
        self.name = name
        self.key = key
        self.case_insensitive = case_insensitive
        self.whitelist: list[str] = []
        self.blacklist: list[str] = []

    def _parse_list(self, text: str) -> list[str]:
        out = []
        for line in (text or "").replace("\r", "\n").split("\n"):
            line = line.strip()
            if not line:
                continue
            out.append(line.lower() if self.case_insensitive else line)
        return out

    def set_whitelist(self, text: str) -> None:
        self.whitelist = self._parse_list(text)

    def set_blacklist(self, text: str) -> None:
        self.blacklist = self._parse_list(text)

    def filter(self, url: str) -> str | None:
        """URLFilter semantics: blacklist match rejects, then whitelist
        match accepts, else reject (Subcollection.java:170-193)."""
        probe = url.lower() if self.case_insensitive else url
        for row in self.blacklist:
            if row in probe:
                return None
        for row in self.whitelist:
            if row in probe:
                return url
        return None


class CollectionManager:
    """Parses the <subcollections> XML config and answers which
    collections a URL belongs to (CollectionManager.java:71-132)."""

    def __init__(self, collections: list[Subcollection] | None = None):
        self.collections: list[Subcollection] = collections or []

    @classmethod
    def parse(cls, xml_text: str, case_insensitive: bool = False) -> "CollectionManager":
        root = ET.fromstring(xml_text)
        colls = []
        for el in root.iter("subcollection"):
            sc = Subcollection(case_insensitive=case_insensitive)
            sc.id = (el.findtext("id") or "").strip()
            sc.name = (el.findtext("name") or "").strip()
            key = el.findtext("key")
            sc.key = key.strip() if key is not None else None
            sc.set_whitelist((el.findtext("whitelist") or "").strip())
            bl = el.findtext("blacklist")
            if bl is not None:
                sc.set_blacklist(bl.strip())
            colls.append(sc)
        return cls(colls)

    def get_all(self) -> list[Subcollection]:
        return self.collections

    def get_sub_collections(self, url: str) -> list[Subcollection]:
        return [c for c in self.collections if c.filter(url) is not None]


class SubcollectionIndexingFilter:
    """IndexingFilter plugin ("subcollection"): adds the collection
    name(s) to the default field (subcollection.default.fieldname) or
    to each collection's key field; a non-empty ``subcollection`` parse
    metadata value overrides list matching entirely
    (SubcollectionIndexingFilter.java:84-110).

    Config via cfg.extra:
      subcollections_xml        the <subcollections> XML document
      subcollection_default_fieldname  (default "subcollection")
      subcollection_metadata_source    (default "subcollection")
      subcollection_case_insensitive   (default False)
    """

    name = "subcollection"

    def __init__(self):
        self._src = None
        self._cm = CollectionManager()

    def apply(self, df, cfg):
        ex = getattr(cfg, "extra", {})
        xml_text = ex.get("subcollections_xml", "")
        ci = bool(ex.get("subcollection_case_insensitive", False))
        if (xml_text, ci) != self._src:
            self._cm = CollectionManager.parse(xml_text, ci) if xml_text else CollectionManager()
            self._src = (xml_text, ci)
        field = ex.get("subcollection_default_fieldname", "subcollection")
        md_source = ex.get("subcollection_metadata_source", "subcollection")
        df = df.copy()
        urls = df["url"].fillna("").to_numpy() if "url" in df.columns else np.full(len(df), "", dtype=object)
        metas = df["metadata"].to_numpy() if "metadata" in df.columns else np.full(len(df), None, dtype=object)
        default_vals: list = []
        keyed_cols: dict[str, list] = {}
        for row_i, (url, mjson) in enumerate(zip(urls, metas)):
            # metadata override wins outright (reference :86-94)
            override = None
            if isinstance(mjson, str) and mjson:
                try:
                    override = (json.loads(mjson).get(md_source) or "").strip() or None
                except ValueError:
                    override = None
            if override:
                default_vals.append([override])
                continue
            names = []
            for coll in self._cm.get_sub_collections(url):
                if coll.key:
                    col = keyed_cols.setdefault(coll.key, [[] for _ in range(len(df))])
                    col[row_i].append(coll.name)
                else:
                    names.append(coll.name)
            default_vals.append(names)
        df[field] = default_vals
        for key, vals in keyed_cols.items():
            df[key] = vals
        return df, np.ones(len(df), dtype=bool)
