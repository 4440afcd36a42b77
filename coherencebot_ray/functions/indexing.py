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
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

MAX_TITLE_LENGTH = 100  # indexer.max.title.length


class IndexingFilter:
    name = "base"

    def apply(self, df: pd.DataFrame, cfg) -> tuple[pd.DataFrame, np.ndarray]:
        return df, np.ones(len(df), dtype=bool)


class BasicIndexingFilter(IndexingFilter):
    name = "basic"

    def apply(self, df, cfg):
        df = df.copy()
        if "host" not in df.columns:
            from .urlutil import hosts_of

            df["host"] = hosts_of(df["url"].to_numpy()).to_numpy()
        if "title" in df.columns:
            df["title"] = df["title"].fillna("").str.slice(0, MAX_TITLE_LENGTH)
        if "content" not in df.columns and "text" in df.columns:
            df["content"] = df["text"]
        if "tstamp" not in df.columns:
            df["tstamp"] = df["fetch_time"] if "fetch_time" in df.columns else 0
        return df, np.ones(len(df), dtype=bool)


class AnchorIndexingFilter(IndexingFilter):
    name = "anchor"

    def apply(self, df, cfg):
        df = df.copy()
        if "anchors" in df.columns:
            # deduplicate, preserve order (AnchorIndexingFilter HashSet
            # semantics minus its order-nondeterminism)
            df["anchor"] = df["anchors"].map(
                lambda a: list(dict.fromkeys(a)) if isinstance(a, (list, np.ndarray)) else []
            )
        else:
            df["anchor"] = [[] for _ in range(len(df))]
        return df, np.ones(len(df), dtype=bool)


class MoreIndexingFilter(IndexingFilter):
    name = "more"

    def apply(self, df, cfg):
        df = df.copy()
        text = df["text"] if "text" in df.columns else pd.Series("", index=df.index)
        df["contentLength"] = text.fillna("").str.len().astype(np.int64)
        ct = df["content_type"] if "content_type" in df.columns else pd.Series(None, index=df.index)
        df["contentType"] = ct.fillna("text/html")
        df["primaryType"] = df["contentType"].str.split("/").str[0]
        if "date" not in df.columns:
            df["date"] = df["fetch_time"] if "fetch_time" in df.columns else 0
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


class StaticFieldIndexer(IndexingFilter):
    name = "static"

    def apply(self, df, cfg):
        fields = dict(getattr(cfg, "extra", {}).get("index_static_fields", {}))
        if not fields:
            return df, np.ones(len(df), dtype=bool)
        df = df.copy()
        for k, v in fields.items():
            df[k] = v
        return df, np.ones(len(df), dtype=bool)


class CriteriaIndexingFilter(IndexingFilter):
    name = "criteria"

    def apply(self, df, cfg):
        from .enrich import criteria_filter

        min_len = int(getattr(cfg, "extra", {}).get("index_criteria_minlength", 4000))
        keep = criteria_filter(df, min_length=min_len) if "text" in df.columns else np.ones(len(df), dtype=bool)
        return df, np.asarray(keep, dtype=bool)


_REGISTRY = {
    c.name: c
    for c in (
        BasicIndexingFilter,
        AnchorIndexingFilter,
        MoreIndexingFilter,
        MetadataIndexer,
        StaticFieldIndexer,
        CriteriaIndexingFilter,
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
