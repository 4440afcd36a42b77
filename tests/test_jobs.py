"""Aux job conformance: dedup (J9), invertlinks (J10), hostdb (J13),
mergedb (J12, TestCrawlDbMerger port), readdb, indexer join (J11)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.stages import jobs

CUR = 1_700_000_000_000


def frontier_rows(n=10, host="h.com", status=CS.DB_FETCHED, sig_mod=3):
    return pd.DataFrame(
        {
            "url": [f"http://{host}/{i}" for i in range(n)],
            "host": host,
            "domain": host,
            "part": 0,
            "status": status,
            "fetch_time": [CUR + i for i in range(n)],
            "retries": 0,
            "fetch_interval": 86400,
            "score": np.linspace(1, 2, n).astype(np.float32),
            "signature": [hashlib.md5(str(i % sig_mod).encode()).digest() for i in range(n)],
            "modified_time": 0,
            "gen_time": 0,
            "repr_url": None,
            "fixed_interval": 0,
            "metadata": None,
        }
    )


def test_dedup_marks_losers(ray_session):
    import ray.data as rd

    df = frontier_rows(9, sig_mod=3)  # 3 groups of 3; winner = highest score
    dups = jobs.dedup(rd.from_pandas(df), CrawlConfig()).to_pandas()
    assert len(dups) == 6  # one winner per group survives
    marked = jobs.apply_duplicate_marks(rd.from_pandas(df), rd.from_pandas(dups)).to_pandas()
    assert (marked["status"] == CS.DB_DUPLICATE).sum() == 6
    # winners keep their status
    winners = marked[marked["status"] == CS.DB_FETCHED]
    assert set(winners["url"]) == {"http://h.com/6", "http://h.com/7", "http://h.com/8"}


def test_invertlinks_counts_and_cap(ray_session):
    import ray.data as rd

    edges = pd.DataFrame(
        {
            "url": [f"http://s{i % 5}.com/p" for i in range(20)],
            "host": [f"s{i % 5}.com" for i in range(20)],
            "dst": ["http://t.com/x"] * 12 + ["http://u.com/y"] * 8,
            "anchor": [f"a{i}" for i in range(20)],
        }
    )
    cfg = CrawlConfig(linkdb_max_inlinks=5, linkdb_ignore_internal=False)
    out = jobs.invertlinks(rd.from_pandas(edges), cfg).to_pandas().set_index("url")
    assert out.loc["http://t.com/x", "n_inlinks"] == 12
    assert out.loc["http://u.com/y", "n_inlinks"] == 8
    assert len(out.loc["http://t.com/x", "anchors"]) == 5  # capped


def test_invertlinks_ignore_internal(ray_session):
    import ray.data as rd

    edges = pd.DataFrame(
        {
            "url": ["http://a.com/1", "http://a.com/2"],
            "host": ["a.com", "a.com"],
            "dst": ["http://a.com/x", "http://b.com/x"],
            "anchor": ["in", "out"],
        }
    )
    cfg = CrawlConfig(linkdb_ignore_internal=True)
    out = jobs.invertlinks(rd.from_pandas(edges), cfg).to_pandas()
    assert set(out["url"]) == {"http://b.com/x"}


def test_hostdb_aggregates(ray_session):
    import ray.data as rd

    df = pd.concat(
        [
            frontier_rows(4, host="a.com", status=CS.DB_FETCHED),
            frontier_rows(3, host="a.com", status=CS.DB_UNFETCHED),
            frontier_rows(2, host="b.com", status=CS.DB_GONE),
        ],
        ignore_index=True,
    )
    out = jobs.update_hostdb(rd.from_pandas(df)).to_pandas().set_index("host")
    assert out.loc["a.com", "fetched"] == 4
    assert out.loc["a.com", "unfetched"] == 3
    assert out.loc["a.com", "n_urls"] == 7
    assert out.loc["b.com", "gone"] == 2


def test_mergedb_newest_wins(ray_session):
    """TestCrawlDbMerger.java:113 analogue: newest calculateLastFetchTime
    wins; metadata merged newer-over-older."""
    import json

    import ray.data as rd

    old = frontier_rows(3)
    old["metadata"] = json.dumps({"k": "old", "only_old": "1"})
    new = frontier_rows(3)
    new["fetch_time"] = new["fetch_time"] + 10_000
    new["score"] = np.float32(9.0)
    new["metadata"] = json.dumps({"k": "new"})
    out = jobs.mergedb([rd.from_pandas(old), rd.from_pandas(new)], CrawlConfig()).to_pandas()
    assert len(out) == 3
    assert (out["score"] == 9.0).all()
    meta = json.loads(out["metadata"].iloc[0])
    assert meta == {"k": "new", "only_old": "1"}


def test_mergedb_unfetched_loses_to_fetched(ray_session):
    import ray.data as rd

    a = frontier_rows(2, status=CS.DB_UNFETCHED)  # lastFetchTime = 0
    b = frontier_rows(2, status=CS.DB_FETCHED)
    b["score"] = np.float32(5.0)
    out = jobs.mergedb([rd.from_pandas(a), rd.from_pandas(b)], CrawlConfig()).to_pandas()
    assert (out["status"] == CS.DB_FETCHED).all()


def test_readdb_stats_and_topn(ray_session):
    import ray.data as rd

    df = pd.concat(
        [frontier_rows(5, status=CS.DB_FETCHED), frontier_rows(3, host="x.com", status=CS.DB_UNFETCHED)],
        ignore_index=True,
    )
    stats = jobs.readdb_stats(rd.from_pandas(df)).to_pandas().set_index("status")
    assert stats.loc[CS.DB_FETCHED, "count"] == 5
    assert stats.loc[CS.DB_UNFETCHED, "count"] == 3
    top = jobs.readdb_topn(rd.from_pandas(df), 2).to_pandas()
    assert len(top) == 2
    assert top["score"].min() >= df["score"].to_numpy(dtype=np.float32).max() - 1e-6
    one = jobs.readdb_url(rd.from_pandas(df), "http://h.com/0").to_pandas()
    assert len(one) == 1


def test_indexer_join(ray_session):
    import ray.data as rd

    frontier = frontier_rows(3, status=CS.DB_FETCHED)
    frontier.loc[2, "status"] = CS.DB_GONE  # deleted by -deleteGone
    docs = pd.DataFrame(
        {
            "url": [f"http://h.com/{i}" for i in range(3)],
            "part": 0,
            "spans": [
                [
                    {"kind": "title", "text": f"T{i}", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": f"body {i}", "media_ref": "", "offset": 1},
                ]
                for i in range(3)
            ],
        }
    )
    linkdb = pd.DataFrame(
        {"url": ["http://h.com/0"], "n_inlinks": [7], "anchors": [["a", "b"]]}
    )
    out = jobs.indexer_join(
        rd.from_pandas(frontier), rd.from_pandas(docs), rd.from_pandas(linkdb), CrawlConfig()
    ).to_pandas().set_index("url")
    assert len(out) == 2  # gone row deleted
    assert out.loc["http://h.com/0", "title"] == "T0"
    assert out.loc["http://h.com/0", "n_inlinks"] == 7
    assert out.loc["http://h.com/1", "n_inlinks"] == 0
    # OPIC indexer damping: boost = sqrt(score)
    row = frontier.iloc[0]
    assert out.loc["http://h.com/0", "score_boost"] == pytest.approx(np.sqrt(row["score"]), rel=1e-5)


def test_indexer_join_with_links_filter(ray_session):
    """index-links through the join: outlinks ride the doc's link
    spans, inlinks ride the linkdb srcs column, and the filter's
    same-host ignore applies."""
    import ray.data as rd

    frontier = frontier_rows(2, status=CS.DB_FETCHED)
    docs = pd.DataFrame(
        {
            "url": [f"http://h.com/{i}" for i in range(2)],
            "part": 0,
            "spans": [
                [
                    {"kind": "title", "text": f"T{i}", "media_ref": "", "offset": 0},
                    {"kind": "link", "text": "same", "media_ref": "http://h.com/x", "offset": 1},
                    {"kind": "link", "text": "other", "media_ref": "http://other.com/y", "offset": 2},
                ]
                for i in range(2)
            ],
        }
    )
    linkdb = pd.DataFrame(
        {"url": ["http://h.com/0"], "n_inlinks": [2],
         "anchors": [["a", "b"]], "srcs": [["http://s1.com/p", "http://h.com/q"]]}
    )
    cfg = CrawlConfig(
        indexing_filters=("links",),
        extra={"index_links_outlinks_host_ignore": True},
    )
    out = jobs.indexer_join(
        rd.from_pandas(frontier), rd.from_pandas(docs), rd.from_pandas(linkdb), cfg
    ).to_pandas().set_index("url")
    assert list(out.loc["http://h.com/0", "outlinks"]) == ["http://other.com/y"]
    assert list(out.loc["http://h.com/0", "inlinks"]) == ["http://s1.com/p", "http://h.com/q"]
    assert list(out.loc["http://h.com/1", "inlinks"]) == []


_TEST_HTML_DOC = (  # TestIndexerMapReduce.testHtmlDoc
    "<!DOCTYPE html>\n<html>\n<head>\n"
    "<title>Test Indexing Binary Content</title>\n"
    '<meta charset="utf-8">\n'
    '<meta name="keywords" lang="en" content="charset, encoding" />\n'
    '<meta name="keywords" lang="fr" content="codage des caractères" />\n'
    '<meta name="keywords" lang="cs" content="kódování znaků" />\n'
    "</head>\n<body>\n<p>\n<ul>\n"
    '  <li lang="en">English: character set, encoding\n'
    '  <li lang="fr">Français: codage des caractères\n'
    '  <li lang="cs">Čeština: kódování znaků (not covered by Latin-1)\n'
    "</ul>\n</body>\n</html>"
)


def _binary_content_inputs(doc_bytes: bytes):
    import ray.data as rd

    frontier = frontier_rows(1, status=CS.DB_FETCHED)
    docs = pd.DataFrame(
        {
            "url": ["http://h.com/0"],
            "part": 0,
            "spans": [[{"kind": "title", "text": "Test", "media_ref": "", "offset": 0}]],
        }
    )
    content = pd.DataFrame({"url": ["http://h.com/0"], "content": [doc_bytes]})
    return rd.from_pandas(frontier), rd.from_pandas(docs), rd.from_pandas(content)


def test_indexer_binary_content_base64(ray_session):
    """TestIndexerMapReduce.testBinaryContentBase64 port: raw segment
    bytes in utf-8 / iso-8859-1 / iso-8859-2 survive the join as a
    base64 binaryContent field, decodable back to the exact document
    (IndexerMapReduce.java:412-425)."""
    import base64
    import re

    cfg = CrawlConfig(indexer_add_binary_content=True, indexer_binary_base64=True)
    for charset in ("utf-8", "iso-8859-1", "iso-8859-2"):
        html = _TEST_HTML_DOC
        if charset != "utf-8":
            html = html.replace("utf-8", charset)
            # reference strips the lines its charset can't encode
            drop = "cs" if charset == "iso-8859-1" else "fr"
            html = re.sub(r'\s*<[^>]+\slang="%s".+?\n' % drop, "", html)
        doc_bytes = html.encode(charset)
        f, d, c = _binary_content_inputs(doc_bytes)
        out = jobs.indexer_join(f, d, None, cfg, content_ds=c).to_pandas()
        assert len(out) == 1
        b64 = out["binaryContent"].iloc[0]
        assert base64.b64decode(b64).decode(charset) == html, charset


def test_indexer_binary_content_raw_and_absent(ray_session):
    """Non-base64 mode decodes the bytes as text; URLs with no content
    record get a null field; the flag off means no column at all."""
    doc_bytes = _TEST_HTML_DOC.encode("utf-8")
    cfg = CrawlConfig(indexer_add_binary_content=True, indexer_binary_base64=False)
    f, d, c = _binary_content_inputs(doc_bytes)
    out = jobs.indexer_join(f, d, None, cfg, content_ds=c).to_pandas()
    assert out["binaryContent"].iloc[0] == _TEST_HTML_DOC
    # no content row for this url -> null field
    import ray.data as rd

    f2, d2, _ = _binary_content_inputs(doc_bytes)
    empty_c = rd.from_pandas(pd.DataFrame({"url": ["http://elsewhere.com/x"],
                                           "content": [b"zz"]}))
    out2 = jobs.indexer_join(f2, d2, None, cfg, content_ds=empty_c).to_pandas()
    assert out2["binaryContent"].iloc[0] is None
    # flag off: column absent (filters and sinks see the reference shape)
    f3, d3, c3 = _binary_content_inputs(doc_bytes)
    out3 = jobs.indexer_join(f3, d3, None, CrawlConfig(), content_ds=c3).to_pandas()
    assert "binaryContent" not in out3.columns


def test_indexer_skip_notmodified_and_robots_noindex(ray_session):
    """indexer.skip.notmodified (IndexerMapReduce.java:332-336) and
    indexer.delete.robots.noindex (NUTCH-1434): both rows drop."""
    import json

    import ray.data as rd

    frontier = frontier_rows(3, status=CS.DB_FETCHED)
    frontier.loc[1, "status"] = CS.DB_NOTMODIFIED
    frontier.loc[2, "metadata"] = json.dumps(
        {"metatag.robots": "NOINDEX, nofollow"})
    docs = pd.DataFrame(
        {
            "url": [f"http://h.com/{i}" for i in range(3)],
            "part": 0,
            "spans": [[{"kind": "title", "text": f"T{i}", "media_ref": "", "offset": 0}]
                      for i in range(3)],
        }
    )
    cfg = CrawlConfig(indexer_skip_notmodified=True,
                      indexer_delete_robots_noindex=True)
    out = jobs.indexer_join(
        rd.from_pandas(frontier), rd.from_pandas(docs), None, cfg
    ).to_pandas()
    assert sorted(out["url"]) == ["http://h.com/0"]
    assert "metadata" not in out.columns  # carried for the check, not emitted
    # flags off: all three index
    out2 = jobs.indexer_join(
        rd.from_pandas(frontier), rd.from_pandas(docs), None, CrawlConfig()
    ).to_pandas()
    assert len(out2) == 3


def test_indexer_url_normalize_filter(ray_session):
    """indexer.url.normalizers / indexer.url.filters
    (IndexerMapReduce.java:183-195): map-side key rewrite happens on
    every input BEFORE the exchange, so a frontier key that only
    matches the doc key after normalization still co-groups; filtered
    keys drop."""
    import ray.data as rd

    frontier = frontier_rows(2, status=CS.DB_FETCHED)
    frontier.loc[0, "url"] = "HTTP://H.com/0"       # normalizes to match doc
    frontier.loc[1, "url"] = "file:///etc/passwd"   # default regex filter kills
    docs = pd.DataFrame(
        {
            "url": ["http://h.com/0", "file:///etc/passwd"],
            "part": 0,
            "spans": [[{"kind": "title", "text": "T", "media_ref": "", "offset": 0}]] * 2,
        }
    )
    cfg = CrawlConfig(indexer_url_normalize=True, indexer_url_filter=True)
    out = jobs.indexer_join(
        rd.from_pandas(frontier), rd.from_pandas(docs), None, cfg
    ).to_pandas()
    assert list(out["url"]) == ["http://h.com/0"]
    # without the flags, the case-mismatched key never joins and the
    # file: url sails through
    out2 = jobs.indexer_join(
        rd.from_pandas(frontier), rd.from_pandas(docs), None, CrawlConfig()
    ).to_pandas()
    assert list(out2["url"]) == ["file:///etc/passwd"]


def test_aux_stat_jobs(ray_session):
    """crawlcomplete / domainstats / protocolstats aggregate semantics
    (CrawlCompletionStats.java:220-222, DomainStatistics.java:174-199,
    ProtocolStatusStatistics.java:146-149)."""
    import ray.data as rd

    from coherencebot_ray.stages.jobs import (
        crawl_completion_stats,
        domain_statistics,
        protocol_status_stats,
    )

    df = pd.DataFrame(
        {
            "url": [f"http://a.com/{i}" for i in range(4)] + ["http://b.org/x"],
            "host": ["a.com"] * 4 + ["b.org"],
            "status": [CS.DB_FETCHED, CS.DB_NOTMODIFIED, CS.DB_UNFETCHED, CS.DB_GONE, CS.DB_FETCHED],
            "metadata": ['{"_pst_": "200"}', '{"_pst_": "404"}', None, "", '{"_pst_": "200"}'],
        }
    )
    ds = rd.from_pandas(df)
    cc = crawl_completion_stats(ds).to_pandas().set_index("key")
    assert cc.loc["a.com", "fetched"] == 2 and cc.loc["a.com", "unfetched"] == 2
    assert cc.loc["b.org", "fetched"] == 1 and cc.loc["b.org", "unfetched"] == 0

    dstat = domain_statistics(ds, mode="host").to_pandas().set_index("key")
    assert dstat.loc["a.com", "fetched"] == 2 and dstat.loc["b.org", "fetched"] == 1
    tld = domain_statistics(ds, mode="tld").to_pandas().set_index("key")
    assert tld.loc["com", "fetched"] == 2 and tld.loc["org", "fetched"] == 1

    ps = protocol_status_stats(ds).to_pandas().set_index("code")
    assert ps.loc["200", "count"] == 2
    assert ps.loc["404", "count"] == 1
    assert ps.loc["UNFETCHED", "count"] == 2


def test_hostdb_dns_check_matrix(ray_session):
    """ResolverThread.java:66-120 matrix through the actor-pool stage
    with an injectable stub resolver: known hosts get last_check + 0
    failures (incl. rediscovery reset), unknown hosts accumulate
    failures, and a host whose failures exceed the purge threshold is
    dropped from the hostdb."""
    import ray.data as rd

    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.stages.jobs import dns_check

    def stub_factory():
        def resolve(host):
            if host.startswith("dead"):
                raise OSError(f"unknown host {host}")
            return "10.0.0.1"

        return resolve

    NOW = 1_700_000_000
    cfg = CrawlConfig(
        hostdb_check_new=True, hostdb_check_known=True, hostdb_check_failed=True,
        hostdb_purge_failed_threshold=2, hostdb_resolver_threads=1,
    )
    hostdb = pd.DataFrame(
        {
            "host": ["alive-new.example", "dead-new.example",
                     "alive-rediscovered.example", "dead-at-threshold.example",
                     "dead-over-threshold.example", "fresh-skip.example"],
            "n_urls": 1,
            # -1 = never checked; others carry prior check state
            "dns_failures": [-1, -1, 3, 1, 2, 0],
            "last_check": [0, 0, 0, 0, 0, NOW - 10],  # fresh-skip too recent
        }
    )
    out = (
        dns_check(rd.from_pandas(hostdb), cfg, resolver_factory=stub_factory, now_s=NOW)
        .to_pandas().set_index("host")
    )
    # purged: dead-over-threshold went 2 -> 3 > threshold 2
    assert "dead-over-threshold.example" not in out.index
    assert out.loc["alive-new.example", "dns_failures"] == 0
    assert out.loc["alive-new.example", "last_check"] == NOW
    assert out.loc["dead-new.example", "dns_failures"] == 1
    assert out.loc["alive-rediscovered.example", "dns_failures"] == 0
    assert out.loc["dead-at-threshold.example", "dns_failures"] == 2  # kept (== thr)
    # not eligible (checked 10s ago, recheck interval 1d): untouched
    assert out.loc["fresh-skip.example", "dns_failures"] == 0
    assert out.loc["fresh-skip.example", "last_check"] == NOW - 10


def test_readdb_stats_long(ray_session):
    """readdb -stats long format (CrawlDbStatMapper key shapes,
    CrawlDbReader.java:349-383): T / status / retry / fit / ftt and
    the -sort per-host breakdown, all exact integers."""
    import ray.data as rd

    from coherencebot_ray.stages.jobs import readdb_stats_long

    f = frontier_rows(10)
    f.loc[3, "retries"] = 2
    out = readdb_stats_long(rd.from_pandas(f), sort_hosts=True).to_pandas()
    kv = dict(zip(out["key"], out["value"]))
    assert kv["T"] == 10
    assert kv[f"status {int(CS.DB_FETCHED)}"] == 10
    assert kv["retry 0"] == 9 and kv["retry 2"] == 1
    assert kv["fit"] == int(f["fetch_interval"].sum())
    assert kv["ftt"] == int((f["fetch_time"] // 60_000).sum())
    assert kv[f"status {int(CS.DB_FETCHED)} h.com"] == 10
    # without -sort the per-host keys are absent
    out2 = readdb_stats_long(rd.from_pandas(f)).to_pandas()
    assert not out2["key"].str.contains("h.com").any()


def test_readdb_dump_filters(ray_session):
    """readdb -dump filter matrix (CrawlDbDumpMapper): regex is a FULL
    match, status matches the name case-insensitively, -retry is a
    minimum, -expr runs the JEXL predicate."""
    import ray.data as rd

    from coherencebot_ray.stages.jobs import readdb_dump

    f = frontier_rows(10)
    f.loc[5, "retries"] = 3
    f.loc[6, "status"] = CS.DB_GONE
    ds = rd.from_pandas(f)
    # full-match regex: a substring-only pattern matches nothing
    assert readdb_dump(ds, regex="h.com").to_pandas().empty
    assert len(readdb_dump(ds, regex=r"http://h\.com/\d").to_pandas()) == 10
    assert list(readdb_dump(ds, status="DB_GONE").to_pandas()["url"]) == \
        ["http://h.com/6"]
    assert list(readdb_dump(ds, retry_min=1).to_pandas()["url"]) == \
        ["http://h.com/5"]
    # -expr: JEXL predicate over datum fields
    assert list(readdb_dump(ds, expr="retriesSinceFetch > 1").to_pandas()["url"]) == \
        ["http://h.com/5"]
    # deterministic sample: same subset both times
    a = readdb_dump(ds, sample=0.5).to_pandas()["url"].tolist()
    b = readdb_dump(ds, sample=0.5).to_pandas()["url"].tolist()
    assert a == b and 0 < len(a) < 10


def test_read_hostdb_expr(ray_session):
    """ReadHostDb JEXL filter (ReadHostDb.java:95-135): derived
    context vars (redirs, ok, numRecords) and the dump modes."""
    import ray.data as rd

    from coherencebot_ray.stages.jobs import read_hostdb, update_hostdb

    df = pd.concat(
        [
            frontier_rows(4, host="a.com", status=CS.DB_FETCHED),
            frontier_rows(3, host="a.com", status=CS.DB_UNFETCHED),
            frontier_rows(2, host="b.com", status=CS.DB_REDIR_TEMP),
        ],
        ignore_index=True,
    )
    hdb = update_hostdb(rd.from_pandas(df))
    out = read_hostdb(hdb, expr="ok > 2").to_pandas()
    assert list(out["host"]) == ["a.com"]
    out2 = read_hostdb(hdb, expr="redirs >= 2", dump_hostnames=True).to_pandas()
    assert list(out2.columns) == ["host"] and list(out2["host"]) == ["b.com"]
    out3 = read_hostdb(hdb, expr="numRecords >= 2").to_pandas()
    assert set(out3["host"]) == {"a.com", "b.com"}


def test_hostdb_homepage_detection(ray_session):
    """UpdateHostDbMapper.java:144-182: the fetched root url proposes
    the homepage; a perm-redirect root's repr_url wins; an unfetched
    root proposes nothing."""
    import ray.data as rd

    a = frontier_rows(2, host="a.com")
    a.loc[0, "url"] = "http://a.com/"               # fetched root
    b = frontier_rows(2, host="b.com")
    b.loc[0, "url"] = "http://b.com/"
    b.loc[0, "status"] = CS.DB_REDIR_PERM
    b.loc[0, "repr_url"] = "http://www.b.com/home"  # redirect target wins
    c = frontier_rows(2, host="c.com")
    c.loc[0, "url"] = "http://c.com/"
    c.loc[0, "status"] = CS.DB_UNFETCHED            # not resolved
    out = jobs.update_hostdb(
        rd.from_pandas(pd.concat([a, b, c], ignore_index=True))
    ).to_pandas().set_index("host")
    assert out.loc["a.com", "homepage_url"] == "http://a.com/"
    assert out.loc["b.com", "homepage_url"] == "http://www.b.com/home"
    assert out.loc["c.com", "homepage_url"] is None
    # ReadHostDb -dumpHomepages surfaces them
    from coherencebot_ray.stages.jobs import read_hostdb, update_hostdb

    hp = read_hostdb(
        update_hostdb(rd.from_pandas(pd.concat([a, b], ignore_index=True))),
        dump_homepages=True,
    ).to_pandas()
    assert set(hp["homepage_url"]) == {"http://a.com/", "http://www.b.com/home"}


def test_mergedb_normalize_filter(ray_session):
    """CrawlDbMerger -normalize/-filter (CrawlDbMerger.java:128-179):
    a url that only matches its twin after crawldb-scope normalization
    merges into ONE row in the rewritten url's partition; filtered
    urls drop."""
    import ray.data as rd

    from coherencebot_ray.functions.urlutil import partition_for_hosts

    # fixture parts must be hash-consistent (renamed rows are routed to
    # the RECOMPUTED hash(host) partition, like the real pipeline)
    part = int(partition_for_hosts(np.array(["h.com"], dtype=object),
                                   16, 42, "byHost")[0])
    a = frontier_rows(2)
    a["part"] = part
    a.loc[0, "url"] = "http://h.com/0#frag"   # normalizes to /0
    a.loc[1, "url"] = "http://h.com/x.gif"    # default regex filter kills
    b = frontier_rows(1)                       # the canonical /0, newer
    b["part"] = part
    b["fetch_time"] = b["fetch_time"] + 50_000
    b["score"] = np.float32(7.0)
    out = jobs.mergedb([rd.from_pandas(a), rd.from_pandas(b)], CrawlConfig(),
                       url_normalize=True, url_filter=True).to_pandas()
    assert list(out["url"]) == ["http://h.com/0"]
    assert float(out["score"].iloc[0]) == 7.0  # newest wins post-merge
    # without the flags: three distinct urls survive
    out2 = jobs.mergedb([rd.from_pandas(a), rd.from_pandas(b)], CrawlConfig()).to_pandas()
    assert len(out2) == 3
