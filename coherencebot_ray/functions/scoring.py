"""ScoringFilter plugin chain — the reference's 8-hook scoring
extension surface (scoring/ScoringFilter.java:42-246,
ScoringFilters.java chain) as registered, vectorized plugins.

Hooks (each vectorized over numpy arrays; a chain folds values through
every registered plugin in order, like ScoringFilters):

  injected_score(scores)        Injector.java:249 (OPIC: db.score.injected,
                                OPICScoringFilter.java:74-79)
  initial_score(n)              new LINKED rows (OPIC: 0.0, :81-85)
  generator_sort_value(scores)  Generator.java:248 (OPIC: score, :87-91)
  distribute_share(score, n)    page score split over valid outlinks
                                (OPICScoringFilter.java:120-166)
  update_db_score(base, link_sum, status, metadata)
                                CrawlDbReducer hook (:93-105); may also
                                rewrite status/metadata (scoring-withdrawn)
  indexer_score(scores)         IndexerMapReduce boost (OPIC: score^0.5,
                                :157-166)

The crawl stages call the chain, never a concrete filter — OPIC is a
plugin here, not hardwired (VERDICT round-1 item 5).
"""

from __future__ import annotations

import json

import numpy as np


class ScoringFilter:
    """No-op base: every hook passes values through unchanged."""

    name = "base"
    # plugins whose generatorSortValue reads the datum metadata set this
    # so the generate stage only ships the metadata column when needed
    uses_generator_metadata = False
    # metadata keys whose per-url MIN over this round's inlink
    # contributions updateDbScore needs (scoring-depth's _depth_ fold);
    # merge_partition aggregates them only when a plugin asks
    link_meta_min_keys: tuple = ()

    def injected_score(self, scores: np.ndarray, cfg) -> np.ndarray:
        return scores

    def injected_metadata(self, metadata: np.ndarray, cfg) -> np.ndarray:
        """Rewrite seed metadata at inject time (the reference's
        injectedScore metadata side effects, e.g. scoring-depth's
        _depth_/_maxdepth_ stamping)."""
        return metadata

    def initial_score(self, n: int, cfg) -> np.ndarray:
        return np.zeros(n, dtype=np.float32)

    def generator_sort_value(self, sort: np.ndarray, cfg,
                             datum_scores=None, metadata=None) -> np.ndarray:
        """Fold step for the generator sort key. ``sort`` is the chain's
        running value (seeded 1.0, Generator.java:246); ``datum_scores``
        are the raw datum scores; ``metadata`` the metadata column (only
        shipped when a plugin sets uses_generator_metadata)."""
        return sort

    def distribute_share(self, page_score: np.float32, n_valid: int, cfg) -> np.float32:
        return page_score

    def distribute_veto(self, parse_meta: dict, cfg) -> bool:
        """Return True to drop ALL of this page's outlinks
        (distributeScoreToOutlinks' targets.clear(), scoring-depth)."""
        return False

    def update_db_score(self, score, link_sum, status, metadata, cfg,
                        link_n=None, now_s=None, link_meta_min=None):
        """Returns (score, status, metadata) — arrays, possibly rewritten.

        ``link_n`` (per-row inlink-contribution count this round) and
        ``now_s`` (epoch seconds) mirror the reference hook's ``inlinks``
        list and wall clock (ScoringFilter.java:180-205); plugins that
        don't need them ignore them.
        """
        return score, status, metadata

    def orphaned_score(self, status, metadata, cfg, now_s):
        """Hook for rows with neither a fetch datum nor inlinks this
        round (CrawlDbReducer.java:155-165 calls
        scfilters.orphanedScore before writing old unchanged).
        Returns (status, metadata)."""
        return status, metadata

    def indexer_score(self, scores: np.ndarray, cfg) -> np.ndarray:
        return scores

    # parse-time metadata hooks (ScoringFilter.java:118-160); per-row
    # dict in/out — only invoked when a registered plugin overrides them
    # (ScoringFilters caches which hooks are live, so the default chain
    # pays nothing in the parse hot path).
    def pass_score_before_parsing(self, datum_meta: dict, content_meta: dict, cfg) -> None:
        """datum metadata -> content metadata (passScoreBeforeParsing)."""

    def pass_score_after_parsing(self, content_meta: dict, parse_meta: dict, cfg) -> None:
        """content metadata -> parse metadata (passScoreAfterParsing)."""

    def outlink_metadata(self, parse_meta: dict, cfg) -> dict:
        """Metadata entries to stamp on every outlink LINKED datum
        (distributeScoreToOutlinks' target-metadata side channel)."""
        return {}

    def score_after_parsing(self, content_meta: dict, parse_meta: dict,
                            text: str, cfg) -> None:
        """Text-reading passScoreAfterParsing variant (scoring-similarity
        computes a relevance score from the parse text). The parse stage
        only materializes per-doc text for the hook when a registered
        plugin overrides this (uses_parse_text)."""

    def outlink_score_override(self, content_meta: dict, cfg):
        """Return a float to SET every outlink's score wholesale
        (CosineSimilarity.distributeScoreToOutlinks replaces the OPIC
        share), or None to leave the chain's share arithmetic alone."""
        return None


class OPICScoringFilter(ScoringFilter):
    """OPIC (scoring-opic/OPICScoringFilter.java:74-166), exact float32
    arithmetic as the reference."""

    name = "opic"

    def injected_score(self, scores, cfg):
        # injectedScore: score += db.score.injected happens in Injector;
        # the inject kernel passes the already-assigned seed scores here
        return scores

    def initial_score(self, n, cfg):
        return np.zeros(n, dtype=np.float32)  # :81-85

    def generator_sort_value(self, sort, cfg, datum_scores=None, metadata=None):
        # sort = datum.getScore() * initSort (:87-91)
        if datum_scores is None:
            return np.asarray(sort, dtype=np.float32)
        return (np.asarray(datum_scores, dtype=np.float32)
                * np.asarray(sort, dtype=np.float32)).astype(np.float32)

    def distribute_share(self, page_score, n_valid, cfg):
        # score / validCount (:120-166); internal/external factors are
        # applied by the caller per link (they depend on the dst host)
        return np.float32(page_score) / np.float32(n_valid)

    def update_db_score(self, score, link_sum, status, metadata, cfg,
                        link_n=None, now_s=None, link_meta_min=None):
        # adjust += inlink scores (:93-105); float32 accumulation
        return (score.astype(np.float32) + link_sum.astype(np.float32)).astype(np.float32), status, metadata

    def indexer_score(self, scores, cfg):
        return np.power(scores.astype(np.float32), np.float32(0.5))  # :157-166


class WithdrawnScoringFilter(ScoringFilter):
    """scoring-withdrawn (src/plugin/scoring-withdrawn/.../
    WithdrawnScoringFilter.java:73-90): rows whose metadata carries a
    ``collection.seed`` not present in the live seed set are marked
    STATUS_DB_WITHDRAWN; rows whose seed IS live get the seed's current
    metadata overlaid."""

    name = "withdrawn"
    SEED_KEY = "collection.seed"

    def __init__(self, live_seeds: dict | None = None):
        # {seed_url: {metadata}} — the FeedInjector seed list
        self.live_seeds = live_seeds or {}

    def update_db_score(self, score, link_sum, status, metadata, cfg,
                        link_n=None, now_s=None, link_meta_min=None):
        if not self.live_seeds:
            return score, status, metadata
        from ..model import CrawlStatus as CS

        status = np.asarray(status).copy()
        metadata = np.asarray(metadata, dtype=object).copy()
        for i, m in enumerate(metadata):
            if not isinstance(m, str) or self.SEED_KEY not in m:
                continue
            try:
                md = json.loads(m)
            except ValueError:
                continue
            seed = md.get(self.SEED_KEY)
            if seed is None:
                continue
            live = self.live_seeds.get(seed)
            if live is None:
                status[i] = CS.DB_WITHDRAWN
            else:
                md.update(live)
                metadata[i] = json.dumps(md, sort_keys=True)
        return score, status, metadata


def _meta_load(md_json) -> dict:
    if isinstance(md_json, str) and md_json:
        try:
            return json.loads(md_json)
        except ValueError:
            return {}
    return {}


def _meta_dump(md: dict):
    return json.dumps(md, sort_keys=True) if md else None


class OrphanScoringFilter(ScoringFilter):
    """scoring-orphan (src/plugin/scoring-orphan/.../
    OrphanScoringFilter.java:37-110): tracks the last time a page was
    seen with inlinks via an ``_orphan_`` metadata timestamp. A page
    unlinked for longer than scoring.orphan.mark.gone.after seconds is
    marked DB_GONE (the indexer deletes it); unlinked longer than
    scoring.orphan.mark.orphan.after it is marked DB_ORPHAN (purged
    from the CrawlDb). Per-row JSON metadata rewrite — only pays when
    the plugin is registered in cfg.scoring_filters."""

    name = "orphan"
    ORPHAN_KEY = "_orphan_"

    def update_db_score(self, score, link_sum, status, metadata, cfg,
                        link_n=None, now_s=None, link_meta_min=None):
        # updateDbScore(:78-90): inlinks present -> stamp now; else the
        # orphan check runs on the merged datum.
        if link_n is None or now_s is None:
            return score, status, metadata
        status = np.asarray(status).copy()
        metadata = np.asarray(metadata, dtype=object).copy()
        linked = np.asarray(link_n) > 0
        for i in np.flatnonzero(linked):
            md = _meta_load(metadata[i])
            md[self.ORPHAN_KEY] = int(now_s)
            metadata[i] = _meta_dump(md)
        for i in np.flatnonzero(~linked):
            status[i], metadata[i] = self._orphaned_one(
                int(status[i]), metadata[i], cfg, now_s)
        return score, status, metadata

    def orphaned_score(self, status, metadata, cfg, now_s):
        status = np.asarray(status).copy()
        metadata = np.asarray(metadata, dtype=object).copy()
        for i in range(len(status)):
            status[i], metadata[i] = self._orphaned_one(
                int(status[i]), metadata[i], cfg, now_s)
        return status, metadata

    def _orphaned_one(self, status, md_json, cfg, now_s):
        # orphanedScore(:92-109): no stamp yet -> leave untouched (the
        # page was never observed with inlinks; reference behaves the
        # same because the metadata key is absent).
        md = _meta_load(md_json)
        stamp = md.get(self.ORPHAN_KEY)
        if stamp is None:
            return status, md_json
        from ..model import CrawlStatus as CS

        elapsed = int(now_s) - int(stamp)
        if elapsed > int(getattr(cfg, "orphan_mark_orphan_after", 40 * 24 * 3600)):
            status = int(CS.DB_ORPHAN)
        elif elapsed > int(getattr(cfg, "orphan_mark_gone_after", 30 * 24 * 3600)):
            status = int(CS.DB_GONE)
        return status, md_json


class MetadataScoringFilter(ScoringFilter):
    """scoring-metadata (src/plugin/scoring-metadata/.../
    MetadataScoringFilter.java:44-140): propagates configured metadata
    keys along the crawl — scoring.db.md keys from the CrawlDatum into
    the content (passScoreBeforeParsing), scoring.content.md keys from
    the content into the parse metadata (passScoreAfterParsing), and
    scoring.parse.md keys from the parse metadata onto every outlink's
    LINKED datum (distributeScoreToOutlinks)."""

    name = "metadata"

    def _keys(self, cfg, attr):
        return tuple(getattr(cfg, attr, ()) or ())

    def pass_score_before_parsing(self, datum_meta, content_meta, cfg):
        for k in self._keys(cfg, "scoring_db_md"):
            v = datum_meta.get(k)
            if v is not None:
                content_meta[k] = v

    def pass_score_after_parsing(self, content_meta, parse_meta, cfg):
        for k in self._keys(cfg, "scoring_content_md"):
            v = content_meta.get(k)
            if v is not None:
                parse_meta[k] = v

    def outlink_metadata(self, parse_meta, cfg):
        out = {}
        for k in self._keys(cfg, "scoring_parse_md"):
            v = parse_meta.get(k)
            if v is not None:
                out[k] = v
        return out


class URLMetaScoringFilter(MetadataScoringFilter):
    """urlmeta (src/plugin/urlmeta/.../URLMetaScoringFilter.java:44-120):
    the configured urlmeta.tags ride from the seed datum through content
    and parse metadata onto every outlink's LINKED datum — one tag list
    for all three hops (vs scoring-metadata's per-hop lists)."""

    name = "urlmeta"

    def _keys(self, cfg, attr):
        return tuple(getattr(cfg, "urlmeta_tags", ()) or ())


class LinkAnalysisScoringFilter(ScoringFilter):
    """scoring-link (src/plugin/scoring-link/.../
    LinkAnalysisScoringFilter.java:30-95): generator sort multiplies by
    the WebGraph-written datum score; indexer score = normalized
    analysis score (link.analyze.normalize.score × db score, replacing
    the fold); initial score 0 (the LinkRank job assigns real values)."""

    name = "link"

    def generator_sort_value(self, sort, cfg, datum_scores=None, metadata=None):
        if datum_scores is None:
            return np.asarray(sort, dtype=np.float32)
        return (np.asarray(datum_scores, dtype=np.float32)
                * np.asarray(sort, dtype=np.float32)).astype(np.float32)

    def indexer_score(self, scores, cfg):
        norm = np.float32(getattr(cfg, "link_normalize_score", 1.0))
        return (norm * np.asarray(scores, dtype=np.float32)).astype(np.float32)


class DepthScoringFilter(ScoringFilter):
    """scoring-depth (src/plugin/scoring-depth/.../
    DepthScoringFilter.java:47-233): limits hops from the seeds.
    ``_depth_`` / ``_maxdepth_`` ride the datum metadata; outlinks
    inherit depth+1 and are dropped wholesale once depth >= maxdepth
    (distribute_veto); the generator prefers shallow pages
    (sort × (1 + maxdepth - depth)); updatedb keeps the MIN depth over
    the old datum and this round's inlink contributions (the chain's
    link_meta_min aggregation)."""

    name = "depth"
    DEPTH_KEY = "_depth_"
    MAX_DEPTH_KEY = "_maxdepth_"
    DEFAULT_MAX_DEPTH = 1000  # :62-65
    uses_generator_metadata = True
    link_meta_min_keys = (DEPTH_KEY,)

    def _default_max(self, cfg) -> int:
        v = int(getattr(cfg, "scoring_depth_max", 0) or 0)  # scoring.depth.max
        return v if v > 0 else self.DEFAULT_MAX_DEPTH

    def injected_metadata(self, metadata, cfg):
        # injectedScore(:168-186): seed _maxdepth_ kept (parsed to int),
        # else the configured default; initial depth is 1
        out = np.asarray(metadata, dtype=object).copy()
        dmax = self._default_max(cfg)
        for i, mj in enumerate(out):
            md = _meta_load(mj)
            try:
                md[self.MAX_DEPTH_KEY] = int(md.get(self.MAX_DEPTH_KEY, dmax))
            except (TypeError, ValueError):
                md[self.MAX_DEPTH_KEY] = dmax
            md[self.DEPTH_KEY] = 1
            out[i] = _meta_dump(md)
        return out

    def generator_sort_value(self, sort, cfg, datum_scores=None, metadata=None):
        # generatorSortValue(:119-139): sort × (1 + maxdepth - depth);
        # a datum with no depth yet is penalized (depth = maxdepth)
        if metadata is None:
            return sort
        sort = np.asarray(sort, dtype=np.float32)
        dmax = self._default_max(cfg)
        mul = np.ones(len(sort), dtype=np.float32)
        for i, mj in enumerate(np.asarray(metadata, dtype=object)):
            md = _meta_load(mj)
            cur_max = int(md.get(self.MAX_DEPTH_KEY, dmax))
            cur = int(md.get(self.DEPTH_KEY, cur_max))
            mul[i] = np.float32(1 + (cur_max - cur))
        return (sort * mul).astype(np.float32)

    def pass_score_before_parsing(self, datum_meta, content_meta, cfg):
        for k in (self.DEPTH_KEY, self.MAX_DEPTH_KEY):  # :188-199
            if k in datum_meta:
                content_meta[k] = datum_meta[k]

    def pass_score_after_parsing(self, content_meta, parse_meta, cfg):
        for k in (self.DEPTH_KEY, self.MAX_DEPTH_KEY):  # :201-210
            if k in content_meta:
                parse_meta[k] = content_meta[k]

    def distribute_veto(self, parse_meta, cfg):
        # distributeScoreToOutlinks(:77-117): missing depth, or depth at
        # the limit -> remove all outlinks (stops the path)
        d = parse_meta.get(self.DEPTH_KEY)
        if d is None:
            return True
        cur_max = parse_meta.get(self.MAX_DEPTH_KEY)
        cur_max = int(cur_max) if cur_max is not None else self._default_max(cfg)
        return int(d) >= cur_max

    def outlink_metadata(self, parse_meta, cfg):
        d = parse_meta.get(self.DEPTH_KEY)
        if d is None:
            return {}
        out = {self.DEPTH_KEY: int(d) + 1}  # :104-112
        if self.MAX_DEPTH_KEY in parse_meta:
            out[self.MAX_DEPTH_KEY] = int(parse_meta[self.MAX_DEPTH_KEY])
        return out

    def update_db_score(self, score, link_sum, status, metadata, cfg,
                        link_n=None, now_s=None, link_meta_min=None):
        # updateDbScore(:212-233): newDepth = min over (old depth if set
        # else the DEFAULT_MAX_DEPTH constant — the reference's quirky
        # init) and every inlink's depth; runs on EVERY merged row like
        # the reference's reducer hook. The kernel pre-aggregates the
        # per-url inlink min so this stays O(rows).
        mins = None if not link_meta_min else link_meta_min.get(self.DEPTH_KEY)
        if mins is None:
            return score, status, metadata
        metadata = np.asarray(metadata, dtype=object).copy()
        mins = np.asarray(mins, dtype=np.float64)
        for i in range(len(metadata)):
            md = _meta_load(metadata[i])
            old_d = md.get(self.DEPTH_KEY)
            new_d = int(old_d) if old_d is not None else self.DEFAULT_MAX_DEPTH
            if not np.isnan(mins[i]):
                new_d = min(new_d, int(mins[i]))
            md[self.DEPTH_KEY] = new_d
            metadata[i] = _meta_dump(md)
        return score, status, metadata


class SimilarityScoringFilter(ScoringFilter):
    """scoring-similarity (src/plugin/scoring-similarity/.../
    SimilarityScoringFilter.java:33-70 + cosine/CosineSimilarity.java):
    passScoreAfterParsing scores the page text (+ metatag.description /
    metatag.keyword ridealongs like CosineSimilarity:47-60) against the
    gold-standard corpus (extra['cosine_goldstandard_text'], a string or
    list of strings) and records it under ``nutch.score`` in the content
    metadata; distributeScoreToOutlinks then SETS every outlink's score
    to it (replacing the OPIC share). Model built lazily once per
    filter/actor (Model.createModel)."""

    name = "similarity"
    SCORE_KEY = "nutch.score"

    def __init__(self):
        self._model = None

    def _model_for(self, cfg):
        if self._model is None:
            from .similarity import CosineModel

            gold = (getattr(cfg, "extra", {}) or {}).get(
                "cosine_goldstandard_text") or ""
            ng = tuple(getattr(cfg, "scoring_similarity_ngrams", (1, 1)) or (1, 1))
            self._model = CosineModel(gold, mingram=ng[0], maxgram=ng[1])
        return self._model

    def score_after_parsing(self, content_meta, parse_meta, text, cfg):
        parts = [text or ""]
        for k in ("metatag.description", "metatag.keyword"):
            v = parse_meta.get(k)
            if v:
                parts.append(v if isinstance(v, str) else " ".join(v))
        content_meta[self.SCORE_KEY] = float(
            self._model_for(cfg).score(" ".join(parts)))

    def outlink_score_override(self, content_meta, cfg):
        return content_meta.get(self.SCORE_KEY)


_REGISTRY = {
    "opic": OPICScoringFilter,
    "withdrawn": WithdrawnScoringFilter,
    "orphan": OrphanScoringFilter,
    "metadata": MetadataScoringFilter,
    "urlmeta": URLMetaScoringFilter,
    "link": LinkAnalysisScoringFilter,
    "depth": DepthScoringFilter,
    "similarity": SimilarityScoringFilter,
}


def register_scoring_filter(name: str, cls) -> None:
    _REGISTRY[name] = cls


class ScoringFilters:
    """Ordered chain (scoring/ScoringFilters.java): each hook folds its
    value through every plugin."""

    def __init__(self, names=("opic",), cfg=None, plugin_kwargs: dict | None = None):
        kw = plugin_kwargs or {}
        self.cfg = cfg
        self.chain = [_REGISTRY[n](**kw.get(n, {})) for n in names]

    def injected_score(self, scores):
        for f in self.chain:
            scores = f.injected_score(scores, self.cfg)
        return scores

    def injected_metadata(self, metadata):
        for f in self.chain:
            metadata = f.injected_metadata(metadata, self.cfg)
        return metadata

    @property
    def has_injected_metadata(self) -> bool:
        base = ScoringFilter
        return any(type(f).injected_metadata is not base.injected_metadata
                   for f in self.chain)

    @property
    def uses_generator_metadata(self) -> bool:
        return any(f.uses_generator_metadata for f in self.chain)

    @property
    def link_meta_min_keys(self) -> tuple:
        keys: list[str] = []
        for f in self.chain:
            keys.extend(f.link_meta_min_keys)
        return tuple(dict.fromkeys(keys))

    def initial_score(self, n):
        out = np.zeros(n, dtype=np.float32)
        for f in self.chain:
            out = f.initial_score(n, self.cfg)
        return out

    def generator_sort_value(self, scores, metadata=None):
        """``scores`` = the raw datum scores; the fold is seeded 1.0
        (Generator.java:246) and each plugin transforms it (OPIC/link
        multiply by the datum score, depth by 1 + maxdepth - depth)."""
        scores = np.asarray(scores, dtype=np.float32)
        sort = np.ones(len(scores), dtype=np.float32)
        for f in self.chain:
            sort = f.generator_sort_value(
                sort, self.cfg, datum_scores=scores, metadata=metadata)
        return sort

    def distribute_share(self, page_score, n_valid):
        out = np.float32(page_score)
        for f in self.chain:
            out = f.distribute_share(out, n_valid, self.cfg)
        return out

    def distribute_veto(self, parse_meta) -> bool:
        return any(f.distribute_veto(parse_meta, self.cfg) for f in self.chain)

    def update_db_score(self, score, link_sum, status, metadata,
                        link_n=None, now_s=None, link_meta_min=None):
        for f in self.chain:
            score, status, metadata = f.update_db_score(
                score, link_sum, status, metadata, self.cfg,
                link_n=link_n, now_s=now_s, link_meta_min=link_meta_min)
        return score, status, metadata

    def orphaned_score(self, status, metadata, now_s):
        for f in self.chain:
            status, metadata = f.orphaned_score(status, metadata, self.cfg, now_s)
        return status, metadata

    def indexer_score(self, scores):
        for f in self.chain:
            scores = f.indexer_score(scores, self.cfg)
        return scores

    # --- parse-time metadata hooks ---------------------------------
    # Cached liveness: the parse hot path skips dict building entirely
    # when no registered plugin overrides these hooks.
    @property
    def has_parse_hooks(self) -> bool:
        base = ScoringFilter
        return any(
            type(f).pass_score_before_parsing is not base.pass_score_before_parsing
            or type(f).pass_score_after_parsing is not base.pass_score_after_parsing
            or type(f).outlink_metadata is not base.outlink_metadata
            or type(f).distribute_veto is not base.distribute_veto
            or type(f).score_after_parsing is not base.score_after_parsing
            for f in self.chain
        )

    @property
    def uses_parse_text(self) -> bool:
        base = ScoringFilter
        return any(
            type(f).score_after_parsing is not base.score_after_parsing
            for f in self.chain
        )

    def pass_score_before_parsing(self, datum_meta, content_meta):
        for f in self.chain:
            f.pass_score_before_parsing(datum_meta, content_meta, self.cfg)

    def pass_score_after_parsing(self, content_meta, parse_meta):
        for f in self.chain:
            f.pass_score_after_parsing(content_meta, parse_meta, self.cfg)

    def score_after_parsing(self, content_meta, parse_meta, text):
        for f in self.chain:
            f.score_after_parsing(content_meta, parse_meta, text, self.cfg)

    def outlink_score_override(self, content_meta):
        out = None
        for f in self.chain:
            v = f.outlink_score_override(content_meta, self.cfg)
            if v is not None:
                out = v
        return out

    def outlink_metadata(self, parse_meta):
        out = {}
        for f in self.chain:
            out.update(f.outlink_metadata(parse_meta, self.cfg))
        return out


def make_scoring(cfg, live_seeds: dict | None = None) -> ScoringFilters:
    """Build the chain from cfg.scoring_filters; the withdrawn plugin
    receives the live seed set when present."""
    names = getattr(cfg, "scoring_filters", ("opic",))
    return ScoringFilters(
        names, cfg, plugin_kwargs={"withdrawn": {"live_seeds": live_seeds}}
    )
