"""Ports of TestOrphanScoringFilter.java and TestMetadataScoringFilter.java
(src/plugin/scoring-orphan, src/plugin/scoring-metadata) against the
vectorized ScoringFilter chain, plus end-to-end wiring checks through
the updatedb merge kernel and the parse stage.

The reference tests sleep real seconds between hook calls; here the
clock is injected (now_s), so the same elapsed-time matrix runs
instantly and deterministically.
"""

import json

import numpy as np
import pandas as pd

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.functions.scoring import (
    MetadataScoringFilter,
    OrphanScoringFilter,
    ScoringFilters,
)
from coherencebot_ray.functions.updatedb import merge_partition
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.stages.parse import ParseBatch

CUR = 1_700_000_000_000  # ms
NOW = CUR // 1000


def _orphan_cfg():
    # conf.setInt("scoring.orphan.mark.gone.after", 5) / orphan.after 10
    return CrawlConfig(
        scoring_filters=("opic", "orphan"),
        orphan_mark_gone_after=5,
        orphan_mark_orphan_after=10,
    )


def _stamp(md_json):
    return json.loads(md_json)[OrphanScoringFilter.ORPHAN_KEY]


def test_orphan_scoring_filter_matrix():
    """TestOrphanScoringFilter.testOrphanScoringFilter port: inlinked
    rows get a fresh _orphan_ stamp; unlinked rows keep the stamp and
    flip NOTMODIFIED -> (gone.after) DB_GONE -> (orphan.after) DB_ORPHAN."""
    cfg = _orphan_cfg()
    chain = ScoringFilters(("orphan",), cfg)
    score = np.zeros(1, dtype=np.float32)
    lsum = np.zeros(1, dtype=np.float32)
    status = np.array([int(CS.DB_NOTMODIFIED)], dtype=np.int64)
    meta = np.array([None], dtype=object)

    # Act as if record has inlinks -> stamp written
    _, status, meta = chain.update_db_score(score, lsum, status, meta,
                                            link_n=np.array([1]), now_s=NOW)
    first = _stamp(meta[0])
    assert first == NOW

    # Again later with inlinks -> stamp increases
    _, status, meta = chain.update_db_score(score, lsum, status, meta,
                                            link_n=np.array([1]), now_s=NOW + 1)
    second = _stamp(meta[0])
    assert second > first

    # No more inlinks, within gone.after -> stamp frozen, status unchanged
    _, status, meta = chain.update_db_score(score, lsum, status, meta,
                                            link_n=np.array([0]), now_s=NOW + 3)
    assert _stamp(meta[0]) == second
    assert status[0] == CS.DB_NOTMODIFIED

    # past gone.after (elapsed 6 > 5) -> DB_GONE
    _, status, meta = chain.update_db_score(score, lsum, status, meta,
                                            link_n=np.array([0]), now_s=NOW + 7)
    assert _stamp(meta[0]) == second
    assert status[0] == CS.DB_GONE

    # past orphan.after (elapsed 12 > 10) -> DB_ORPHAN
    _, status, meta = chain.update_db_score(score, lsum, status, meta,
                                            link_n=np.array([0]), now_s=NOW + 13)
    assert status[0] == CS.DB_ORPHAN


def test_orphan_no_stamp_is_untouched():
    """A row never observed with inlinks has no _orphan_ key: the filter
    leaves status alone (OrphanScoringFilter.orphanedScore:94)."""
    cfg = _orphan_cfg()
    chain = ScoringFilters(("orphan",), cfg)
    status = np.array([int(CS.DB_FETCHED)], dtype=np.int64)
    meta = np.array([None], dtype=object)
    status, meta = chain.orphaned_score(status, meta, NOW + 1000)
    assert status[0] == CS.DB_FETCHED and meta[0] is None


def _datum(status, meta=None, url="http://www.example.com/"):
    return {
        "url": url, "host": "www.example.com", "part": 0, "status": status,
        "fetch_time": CUR - 100_000_000, "retries": 0,
        "fetch_interval": 2_592_000, "score": 1.0, "signature": None,
        "modified_time": 0, "gen_time": 0, "repr_url": None,
        "fixed_interval": 0, "metadata": meta,
    }


def test_orphan_path_through_merge_kernel():
    """End-to-end: an old row with a stale _orphan_ stamp and no new
    data this round goes through CrawlDbReducer's orphanedScore path
    (reference :155-165) and comes out DB_ORPHAN."""
    stale = json.dumps({OrphanScoringFilter.ORPHAN_KEY: NOW - 100})
    fresh = json.dumps({OrphanScoringFilter.ORPHAN_KEY: NOW - 3})
    out = merge_partition(
        pd.DataFrame([
            _datum(int(CS.DB_FETCHED), meta=stale, url="http://a.com/stale"),
            _datum(int(CS.DB_FETCHED), meta=fresh, url="http://a.com/fresh"),
        ]),
        _orphan_cfg(),
        CUR,
    ).set_index("url")
    assert out.loc["http://a.com/stale", "status"] == CS.DB_ORPHAN
    assert out.loc["http://a.com/fresh", "status"] == CS.DB_FETCHED


def test_orphan_gone_band_through_merge_kernel():
    """Stamp older than gone.after but not orphan.after -> DB_GONE."""
    mid = json.dumps({OrphanScoringFilter.ORPHAN_KEY: NOW - 7})
    out = merge_partition(
        pd.DataFrame([_datum(int(CS.DB_NOTMODIFIED), meta=mid)]),
        _orphan_cfg(),
        CUR,
    )
    assert out.iloc[0]["status"] == CS.DB_GONE


# ---------------------------------------------------------------------------
# scoring-metadata (TestMetadataScoringFilter port)
# ---------------------------------------------------------------------------

_MD_CFG = CrawlConfig(
    scoring_filters=("opic", "metadata"),
    scoring_db_md=("parent", "depth"),
    scoring_content_md=("parent", "depth"),
    scoring_parse_md=("parent", "depth"),
)


def test_metadata_pass_score_before_parsing():
    """passScoreBeforeParsing: scoring.db.md keys copied datum->content."""
    f = MetadataScoringFilter()
    content_meta = {}
    f.pass_score_before_parsing(
        {"parent": "https://nutch.apache.org/", "depth": "1", "other": "x"},
        content_meta, _MD_CFG)
    assert content_meta == {"parent": "https://nutch.apache.org/", "depth": "1"}


def test_metadata_pass_score_after_parsing():
    """passScoreAfterParsing: scoring.content.md keys copied content->parse."""
    f = MetadataScoringFilter()
    content_meta = {}
    f.pass_score_before_parsing(
        {"parent": "https://nutch.apache.org/", "depth": "1"}, content_meta, _MD_CFG)
    parse_meta = {}
    f.pass_score_after_parsing(content_meta, parse_meta, _MD_CFG)
    assert parse_meta == {"parent": "https://nutch.apache.org/", "depth": "1"}


def test_metadata_distribute_to_outlinks():
    """distributeScoreToOutlinks: scoring.parse.md keys stamped on every
    outlink target's metadata."""
    f = MetadataScoringFilter()
    out = f.outlink_metadata(
        {"parent": "https://nutch.apache.org/", "depth": "1", "skip": "y"}, _MD_CFG)
    assert out == {"parent": "https://nutch.apache.org/", "depth": "1"}


def _fetch_row(url, content, meta=None, score=1.0):
    host = url.split("/")[2]
    return dict(
        url=url, host=host, part=0, status=CS.FETCH_SUCCESS, fetch_time=CUR,
        retries=0, fetch_interval=86400, score=score, signature=None,
        modified_time=0, gen_time=0, repr_url=None, fixed_interval=0,
        metadata=meta, content=content, content_type="text/html",
        fetch_order=0,
    )


def test_metadata_propagates_through_parse_stage():
    """End-to-end: datum md -> parse md datum (PARSE_META) + outlink
    LINKED datums carry the configured keys; without the plugin no
    PARSE_META rows and no LINKED metadata are produced."""
    html = (b'<html><head><title>T</title></head><body>'
            b'<a href="http://b.com/x">x</a><a href="http://c.com/y">y</a>'
            b'</body></html>')
    meta = json.dumps({"parent": "http://a.com/", "depth": "1"})
    batch = pd.DataFrame([_fetch_row("http://a.com/", html, meta=meta)])

    out = ParseBatch(_MD_CFG)(batch)
    linked = out[(out["rtype"] == "crawl_parse") & (out["status"] == CS.LINKED)]
    assert len(linked) == 2
    for m in linked["metadata"]:
        assert json.loads(m) == {"parent": "http://a.com/", "depth": "1"}
    pm = out[out["status"] == CS.PARSE_META]
    assert len(pm) == 1
    assert json.loads(pm.iloc[0]["metadata"]) == {"parent": "http://a.com/", "depth": "1"}

    # default chain: zero overhead path, no PARSE_META, no LINKED metadata
    out2 = ParseBatch(CrawlConfig())(batch)
    assert (out2["status"] == CS.PARSE_META).sum() == 0
    linked2 = out2[(out2["rtype"] == "crawl_parse") & (out2["status"] == CS.LINKED)]
    assert linked2["metadata"].isna().all()


def test_metadata_reaches_new_frontier_rows():
    """The LINKED metadata survives updatedb: a newly discovered URL's
    frontier row carries the propagated keys (CrawlDbReducer takes the
    highest-score link as the effective fetch datum, metadata and all)."""
    md = json.dumps({"parent": "http://a.com/", "depth": "1"})
    link = {
        "url": "http://b.com/x", "host": "b.com", "part": 0,
        "status": int(CS.LINKED), "fetch_time": CUR, "retries": 0,
        "fetch_interval": 86400, "score": 0.5, "signature": None,
        "modified_time": 0, "gen_time": 0, "repr_url": None,
        "fixed_interval": 0, "metadata": md,
    }
    out = merge_partition(pd.DataFrame([link]), _MD_CFG, CUR)
    assert out.iloc[0]["status"] == CS.DB_UNFETCHED
    assert json.loads(out.iloc[0]["metadata"]) == {"parent": "http://a.com/", "depth": "1"}
