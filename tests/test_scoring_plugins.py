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


# ---------------------------------------------------------------------------
# scoring-depth (src/plugin/scoring-depth/.../DepthScoringFilter.java)
# ---------------------------------------------------------------------------

_DEPTH_CFG = CrawlConfig(scoring_filters=("opic", "depth"), scoring_depth_max=2)


def test_depth_injected_metadata():
    """injectedScore(:168-186): seed _maxdepth_ kept (parsed to int),
    else the configured default; initial depth is always 1."""
    from coherencebot_ray.functions.scoring import make_scoring

    chain = make_scoring(_DEPTH_CFG)
    assert chain.has_injected_metadata
    metas = np.array([None, json.dumps({"_maxdepth_": "5"})], dtype=object)
    out = chain.injected_metadata(metas)
    assert json.loads(out[0]) == {"_depth_": 1, "_maxdepth_": 2}
    assert json.loads(out[1]) == {"_depth_": 1, "_maxdepth_": 5}


def test_depth_generator_sort_prefers_shallow():
    """generatorSortValue(:119-139): initSort x (1 + maxdepth - depth);
    missing depth is penalized (depth = maxdepth -> x1)."""
    from coherencebot_ray.functions.scoring import make_scoring

    cfg = CrawlConfig(scoring_filters=("opic", "depth"), scoring_depth_max=3)
    chain = make_scoring(cfg)
    assert chain.uses_generator_metadata
    scores = np.ones(3, dtype=np.float32)
    metas = np.array(
        [json.dumps({"_depth_": 1, "_maxdepth_": 3}),
         json.dumps({"_depth_": 3, "_maxdepth_": 3}),
         None],
        dtype=object,
    )
    sort = chain.generator_sort_value(scores, metadata=metas)
    assert sort.tolist() == [3.0, 1.0, 1.0]


def test_depth_outlinks_stamped_and_vetoed():
    """distributeScoreToOutlinks(:77-117): below the limit outlinks get
    depth+1 (+ custom maxdepth); at the limit ALL outlinks are dropped;
    missing depth also drops them."""
    html = (b'<html><body><a href="http://b.com/x">x</a>'
            b'<a href="http://c.com/y">y</a></body></html>')

    md1 = json.dumps({"_depth_": 1, "_maxdepth_": 2})
    out = ParseBatch(_DEPTH_CFG)(
        pd.DataFrame([_fetch_row("http://a.com/", html, meta=md1)]))
    linked = out[(out["rtype"] == "crawl_parse") & (out["status"] == CS.LINKED)]
    assert len(linked) == 2
    for m in linked["metadata"]:
        assert json.loads(m) == {"_depth_": 2, "_maxdepth_": 2}

    md2 = json.dumps({"_depth_": 2, "_maxdepth_": 2})
    out2 = ParseBatch(_DEPTH_CFG)(
        pd.DataFrame([_fetch_row("http://a.com/", html, meta=md2)]))
    linked2 = out2[(out2["rtype"] == "crawl_parse") & (out2["status"] == CS.LINKED)]
    assert len(linked2) == 0

    out3 = ParseBatch(_DEPTH_CFG)(
        pd.DataFrame([_fetch_row("http://a.com/", html, meta=None)]))
    linked3 = out3[(out3["rtype"] == "crawl_parse") & (out3["status"] == CS.LINKED)]
    assert len(linked3) == 0


def test_depth_updatedb_min_fold():
    """updateDbScore(:212-233): depth = min(old depth or 1000, every
    inlink's depth); rows without any depth signal get the reference's
    quirky 1000 stamp."""
    def row(url, status, score=0.5, md=None):
        return {
            "url": url, "host": url.split("/")[2], "part": 0,
            "status": int(status), "fetch_time": CUR, "retries": 0,
            "fetch_interval": 86400, "score": score, "signature": None,
            "modified_time": 0, "gen_time": 0, "repr_url": None,
            "fixed_interval": 0, "metadata": md,
        }

    rows = [
        # old row at depth 1 + a deeper inlink -> stays 1
        row("http://a.com/", CS.DB_FETCHED, md=json.dumps({"_depth_": 1, "_maxdepth_": 2})),
        row("http://a.com/", CS.LINKED, md=json.dumps({"_depth_": 3})),
        # new url discovered at depth 2 -> gets 2
        row("http://b.com/x", CS.LINKED, md=json.dumps({"_depth_": 2, "_maxdepth_": 2})),
        # fetched row with no depth signal anywhere -> the reference's
        # quirky DEFAULT_MAX_DEPTH (1000) stamp
        row("http://c.com/", CS.DB_UNFETCHED, md=None),
        row("http://c.com/", CS.FETCH_SUCCESS, md=None),
        # pass-through old row (no new data): CrawlDbReducer.java:150-166
        # records old unchanged — updateDbScore never runs, no stamp
        row("http://d.com/", CS.DB_UNFETCHED, md=None),
    ]
    out = merge_partition(pd.DataFrame(rows), _DEPTH_CFG, CUR).set_index("url")
    assert json.loads(out.loc["http://a.com/", "metadata"])["_depth_"] == 1
    assert json.loads(out.loc["http://b.com/x", "metadata"])["_depth_"] == 2
    assert json.loads(out.loc["http://c.com/", "metadata"])["_depth_"] == 1000
    assert out.loc["http://d.com/", "metadata"] is None


def test_depth_crawl_halts_at_max_depth():
    """End-to-end two-hop check through the parse+updatedb kernels: with
    maxdepth=2, a seed's outlinks enter the frontier at depth 2 but THEIR
    outlinks never do."""
    html_a = b'<html><body><a href="http://b.com/x">b</a></body></html>'
    html_b = b'<html><body><a href="http://c.com/y">c</a></body></html>'
    from coherencebot_ray.functions.scoring import make_scoring

    chain = make_scoring(_DEPTH_CFG)
    seed_md = chain.injected_metadata(np.array([None], dtype=object))[0]

    p1 = ParseBatch(_DEPTH_CFG)(
        pd.DataFrame([_fetch_row("http://a.com/", html_a, meta=seed_md)]))
    l1 = p1[(p1["rtype"] == "crawl_parse") & (p1["status"] == CS.LINKED)]
    assert list(l1["url"]) == ["http://b.com/x"]
    b_md = l1.iloc[0]["metadata"]
    assert json.loads(b_md)["_depth_"] == 2

    # b fetched at depth 2 == maxdepth -> its outlink to c is dropped
    p2 = ParseBatch(_DEPTH_CFG)(
        pd.DataFrame([_fetch_row("http://b.com/x", html_b, meta=b_md)]))
    l2 = p2[(p2["rtype"] == "crawl_parse") & (p2["status"] == CS.LINKED)]
    assert len(l2) == 0


# ---------------------------------------------------------------------------
# urlmeta (src/plugin/urlmeta/.../URLMetaScoringFilter.java + indexing half)
# ---------------------------------------------------------------------------

_UM_CFG = CrawlConfig(
    scoring_filters=("opic", "urlmeta"), urlmeta_tags=("lang", "team"))


def test_urlmeta_rides_to_outlinks():
    """The configured urlmeta.tags ride datum -> content -> parse ->
    every outlink's LINKED datum (one tag list for all hops)."""
    html = b'<html><body><a href="http://b.com/x">x</a></body></html>'
    md = json.dumps({"lang": "en", "team": "a", "other": "dropped"})
    out = ParseBatch(_UM_CFG)(
        pd.DataFrame([_fetch_row("http://a.com/", html, meta=md)]))
    linked = out[(out["rtype"] == "crawl_parse") & (out["status"] == CS.LINKED)]
    assert len(linked) == 1
    assert json.loads(linked.iloc[0]["metadata"]) == {"lang": "en", "team": "a"}


def test_urlmeta_indexing_filter_fields():
    """URLMetaIndexingFilter.java:78-95: tags in the datum metadata
    become same-named index fields."""
    from coherencebot_ray.functions.indexing import IndexingFilters

    df = pd.DataFrame({
        "url": ["http://a.com/", "http://b.com/"],
        "metadata": [json.dumps({"lang": "en", "team": "a"}), None],
    })
    out = IndexingFilters(("urlmeta",), cfg=_UM_CFG).apply(df)
    assert out["lang"].tolist() == ["en", None]
    assert out["team"].tolist() == ["a", None]


# ---------------------------------------------------------------------------
# scoring-link (src/plugin/scoring-link/.../LinkAnalysisScoringFilter.java)
# ---------------------------------------------------------------------------

def test_link_analysis_scoring():
    """generatorSortValue = datum.score x initSort (:60-63); indexerScore
    replaces the fold with link.analyze.normalize.score x db score
    (:65-72); initialScore 0 (LinkRank assigns real values)."""
    from coherencebot_ray.functions.scoring import make_scoring

    cfg = CrawlConfig(scoring_filters=("link",), link_normalize_score=2.0)
    chain = make_scoring(cfg)
    scores = np.array([0.5, 3.0], dtype=np.float32)
    assert chain.generator_sort_value(scores).tolist() == [0.5, 3.0]
    assert chain.indexer_score(scores).tolist() == [1.0, 6.0]
    assert chain.initial_score(2).tolist() == [0.0, 0.0]


# ---------------------------------------------------------------------------
# scoring-similarity (src/plugin/scoring-similarity)
# ---------------------------------------------------------------------------

def test_similarity_cosine_model_math():
    """cosine/Model.java: tf doc vectors, cosine = dot/(l2*l2), page
    score = max over gold docs; shingle mode when ngrams > 1."""
    from coherencebot_ray.functions.similarity import (
        CosineModel, cosine, doc_vector)

    a = doc_vector("ray data ray")
    b = doc_vector("ray data")
    # a = {ray:2, data:1}, b = {ray:1, data:1}: dot=3, |a|=sqrt5, |b|=sqrt2
    assert abs(cosine(a, b) - 3 / (np.sqrt(5) * np.sqrt(2))) < 1e-12

    m = CosineModel(["distributed datasets streaming"], mingram=1, maxgram=1)
    assert m.score("distributed datasets streaming") > 0.99
    assert m.score("celebrity gossip tabloid") == 0.0

    mg = CosineModel(["big data pipelines"], mingram=2, maxgram=2)
    assert mg.score("big data pipelines") > 0.99  # shared bigrams
    assert mg.score("data big") == 0.0  # order matters for shingles


def test_similarity_scoring_sets_outlink_scores():
    """SimilarityScoringFilter: page text scored against the gold
    standard; every outlink LINKED datum's score is SET to it
    (replacing the OPIC share), and metatag.description rides into the
    scored text (CosineSimilarity:47-60)."""
    cfg = CrawlConfig(
        scoring_filters=("opic", "similarity"),
        extra={"cosine_goldstandard_text": "ray data distributed datasets"},
        ignore_internal_links=False,
    )
    html = (b"<html><body><p>ray data distributed datasets</p>"
            b'<a href="http://x.com/1">a</a><a href="http://x.com/2">b</a>'
            b"</body></html>")
    out = ParseBatch(cfg)(pd.DataFrame([_fetch_row("http://t.com/", html, score=0.8)]))
    linked = out[(out["rtype"] == "crawl_parse") & (out["status"] == CS.LINKED)]
    assert len(linked) == 2
    scores = linked["score"].to_numpy(dtype=np.float64)
    # identical text -> cosine 1.0 for BOTH outlinks (no share division)
    assert np.allclose(scores, 1.0)

    # unrelated text -> cosine 0.0 set on outlinks
    html2 = (b"<html><body><p>celebrity gossip tabloid</p>"
             b'<a href="http://x.com/1">a</a></body></html>')
    out2 = ParseBatch(cfg)(pd.DataFrame([_fetch_row("http://t.com/", html2)]))
    linked2 = out2[(out2["rtype"] == "crawl_parse") & (out2["status"] == CS.LINKED)]
    assert linked2["score"].to_numpy(dtype=np.float64)[0] == 0.0

    # default chain unaffected: OPIC share still divides
    out3 = ParseBatch(CrawlConfig(ignore_internal_links=False))(
        pd.DataFrame([_fetch_row("http://t.com/", html, score=0.8)]))
    linked3 = out3[(out3["rtype"] == "crawl_parse") & (out3["status"] == CS.LINKED)]
    assert np.allclose(linked3["score"].to_numpy(np.float64),
                       np.float32(0.8) / np.float32(2.0))
