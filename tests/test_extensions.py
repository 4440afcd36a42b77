"""Exchange routing, NutchPublisher events, SegmentMergeFilter hook
(exchange/Exchanges.java, publisher/NutchPublisher.java,
segment/SegmentMergeFilter.java analogues)."""

import json
import os

import numpy as np
import pandas as pd

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.functions import publisher as pub
from coherencebot_ray.functions.exchange import ExchangeConfig, Exchanges
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.stages.fetch import FetchPartition

CUR = 1_700_000_000_000


def _docs():
    return pd.DataFrame(
        {
            "url": ["http://a.com/1", "http://b.org/2", "http://c.com/3"],
            "score": [0.9, 0.2, 0.5],
            "lang": ["en", "de", "en"],
        }
    )


def test_exchange_union_of_matches():
    ex = Exchanges(
        [
            ExchangeConfig("hi", "score > 0.4", ("solr",)),
            ExchangeConfig("english", 'lang == "en"', ("csv",)),
        ],
        all_writers=("solr", "csv"),
    )
    m = ex.writer_masks(_docs())
    assert m["solr"].tolist() == [True, False, True]
    assert m["csv"].tolist() == [True, False, True]


def test_exchange_default_route_for_unmatched():
    ex = Exchanges(
        [ExchangeConfig("hi", "score > 0.4", ("solr",))],
        default_writers=("fallback",),
        all_writers=("solr", "fallback"),
    )
    m = ex.writer_masks(_docs())
    assert m["solr"].tolist() == [True, False, True]
    # Exchanges.java:153-156 — default applies only where nothing matched
    assert m["fallback"].tolist() == [False, True, False]


def test_no_exchanges_routes_everywhere():
    # Exchanges.java:80-83 availableExchanges=false -> all writers
    ex = Exchanges(all_writers=("a", "b"))
    m = ex.writer_masks(_docs())
    assert all(m[w].all() for w in ("a", "b"))


def test_exchange_bad_expression_matches_nothing():
    # JexlExchange.match swallows evaluation errors -> no match
    ex = Exchanges(
        [ExchangeConfig("broken", "nosuchcol > 1", ("x",))], all_writers=("x",)
    )
    assert not ex.writer_masks(_docs())["x"].any()


def test_publisher_events_from_fetch_partition(tmp_path):
    out_dir = str(tmp_path / "events")
    p = pub.JsonlPublisher(out_dir)
    cfg = CrawlConfig(server_delay_s=0.0)
    g = pd.DataFrame(
        {
            "url": ["http://h.com/a", "http://h.com/b"],
            "host": ["h.com", "h.com"],
            "part": [3, 3],
            "score": [1.0, 1.0],
            "status": [CS.DB_UNFETCHED] * 2,
            "fetch_time": [CUR - 1000] * 2,
            "fetch_interval": [2_592_000] * 2,
            "retries": [0, 0],
            "signature": [None, None],
            "metadata": [{}, {}],
        }
    )
    FetchPartition(cfg, CUR, publisher=p)(g)
    path = os.path.join(out_dir, "events-part-3.jsonl")
    events = [json.loads(line) for line in open(path)]
    types = [e["eventType"] for e in events]
    assert types[0] == pub.START and types[-1] == pub.END
    reporting = [e for e in events if e["eventType"] == pub.REPORTING]
    assert {e["url"] for e in reporting} == {"http://h.com/a", "http://h.com/b"}
    assert events[-1]["metadata"]["fetched"] == 2


def test_http_index_writer(ray_session, tmp_path):
    import glob

    import ray.data as rd

    from coherencebot_ray.stages.tools import write_index_http

    rec = str(tmp_path / "posts")

    # defined INSIDE the test: Ray workers can't import the pytest
    # module by name, so the stub must be cloudpickled by value
    class _RecordingSession:
        """Stub HTTP session recording posts to a directory (actors run
        in other processes, so recording goes through the filesystem)."""

        def __init__(self, rec_dir):
            self.rec_dir = rec_dir

        def post(self, url, json=None, timeout=None):
            import json as _json
            import os
            import uuid

            os.makedirs(self.rec_dir, exist_ok=True)
            with open(os.path.join(self.rec_dir, f"{uuid.uuid4().hex}.json"), "w") as f:
                _json.dump({"url": url, "body": json}, f)

            class R:
                status_code = 200

            return R()

    docs = pd.DataFrame({"url": [f"http://x/{i}" for i in range(20)], "score": range(20)})
    n = write_index_http(
        rd.from_pandas(docs),
        "http://solr.example/core1",
        session_factory=lambda: _RecordingSession(rec),
        batch_size=8,
        concurrency=1,
    )
    assert n == 20
    posts = [json.load(open(p)) for p in glob.glob(rec + "/*.json")]
    doc_posts = [p for p in posts if p["url"].endswith("/update/json/docs")]
    commits = [p for p in posts if p["url"].endswith("/update") and "commit" in p["body"]]
    assert sum(len(p["body"]) for p in doc_posts) == 20
    assert len(commits) == 1
    urls = {d["url"] for p in doc_posts for d in p["body"]}
    assert urls == set(docs["url"])


def test_commoncrawl_dump(tmp_path):
    """TestCommonCrawlDataDumper analogue: one md5-named timestamped
    JSON file per stored document, gzip option, mimetype filter +
    per-type counts report."""
    import base64
    import gzip as _gzip
    import hashlib
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from coherencebot_ray.stages.tools import commoncrawl_dump

    d = tmp_path / "seg" / "content" / "part-0"
    d.mkdir(parents=True)
    rows = {
        "url": ["http://nutch.apache.org/bot.html",
                "http://nutch.apache.org/downloads",
                "http://img.example/t.png"],
        "content": [b"<html>bot</html>", b"<html>dl</html>", b"\x89PNGdata"],
        "content_type": ["text/html", "text/html", "image/png"],
    }
    pq.write_table(pa.table(rows), d / "c.parquet")

    out = tmp_path / "dump"
    counts = commoncrawl_dump(str(tmp_path / "seg"), str(out), epoch_ms=1700000000000)
    assert counts == {"text/html": 2, "image/png": 1}
    bot = out / (hashlib.md5(b"http://nutch.apache.org/bot.html").hexdigest() + "_bot.html.gz")
    assert bot.exists()
    rec = json.loads(_gzip.open(bot).read())
    assert rec["url"] == "http://nutch.apache.org/bot.html"
    assert rec["key"] == "org.apache.nutch:http/bot.html"
    assert base64.b64decode(rec["response"]["body_b64"]) == b"<html>bot</html>"
    # extension defaults to html for extension-less paths
    dl = out / (hashlib.md5(b"http://nutch.apache.org/downloads").hexdigest() + "_downloads.html.gz")
    assert dl.exists()
    # mimetype filter + plain (non-gzip) output
    out2 = tmp_path / "dump2"
    counts2 = commoncrawl_dump(str(tmp_path / "seg"), str(out2),
                               gzip_out=False, mime_types=("image/png",))
    assert counts2 == {"image/png": 1, "filtered": 2}
    png = out2 / (hashlib.md5(b"http://img.example/t.png").hexdigest() + "_t.png")
    assert png.exists()


def _seg(tmp_path, name, rows):
    """Write one segment's fetch_out component from (url, status,
    fetch_time) triples."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name / "fetch_out" / "part-0"
    d.mkdir(parents=True)
    t = pa.table(
        {
            "url": [r[0] for r in rows],
            "status": [int(r[1]) for r in rows],
            "fetch_time": [int(r[2]) for r in rows],
        }
    )
    pq.write_table(t, d / "f.parquet")
    return str(tmp_path / name)


def _merged_status(tmp_path, segs, url="http://nutch.apache.org/"):
    import pyarrow.parquet as pq

    from coherencebot_ray.stages.tools import merge_segments

    out = tmp_path / "out"
    merge_segments(segs, str(out), n_buckets=4)
    got = pq.read_table(str(out / "fetch_out")).to_pandas().set_index("url")
    return got, (int(got.loc[url, "status"]) if url in got.index else None)


URL = "http://nutch.apache.org/"
REDIR = "http://nutch.apache.org/i_redirect_to_the_root/"


def test_segment_merger_fixed_sequence(ray_session, tmp_path):
    """TestSegmentMergerCrawlDatums.testFixedSequence: gone, then a
    redirect-only segment (LINKED), then success -> success."""
    segs = [
        _seg(tmp_path, "s1", [(URL, CS.FETCH_GONE, 10)]),
        _seg(tmp_path, "s2", [(URL, CS.LINKED, 20), (REDIR, CS.FETCH_REDIR_TEMP, 20)]),
        _seg(tmp_path, "s3", [(URL, CS.FETCH_SUCCESS, 30)]),
    ]
    _, status = _merged_status(tmp_path, segs)
    assert status == CS.FETCH_SUCCESS


def test_segment_merger_mostly_redirects(ray_session, tmp_path):
    """testMostlyRedirects: seven redirect-only segments around one
    real fetch -> the real fetch status survives, regardless of the
    later LINKED datums."""
    segs = []
    for i in range(8):
        t = (i + 1) * 10
        if i == 5:
            segs.append(_seg(tmp_path, f"s{i}", [(URL, CS.FETCH_SUCCESS, t)]))
        else:
            segs.append(_seg(tmp_path, f"s{i}",
                             [(URL, CS.LINKED, t), (REDIR, CS.FETCH_REDIR_TEMP, t)]))
    _, status = _merged_status(tmp_path, segs)
    assert status == CS.FETCH_SUCCESS


def test_segment_merger_redir_fetch_in_one_segment(ray_session, tmp_path):
    """testRedirFetchInOneSegment: LINKED + fetch for the same url in
    ONE segment -> the fetch datum is preferred."""
    segs = [_seg(tmp_path, "s1", [
        (URL, CS.LINKED, 10),
        (URL, CS.FETCH_SUCCESS, 10),
        (REDIR, CS.FETCH_REDIR_TEMP, 10),
    ])]
    _, status = _merged_status(tmp_path, segs)
    assert status == CS.FETCH_SUCCESS


def test_segment_merger_ends_with_redirect(ray_session, tmp_path):
    """testEndsWithRedirect: a trailing redirect-only segment must not
    clobber the earlier real fetch."""
    segs = [
        _seg(tmp_path, "s1", [(URL, CS.FETCH_SUCCESS, 10)]),
        _seg(tmp_path, "s2", [(URL, CS.LINKED, 20), (REDIR, CS.FETCH_REDIR_TEMP, 20)]),
    ]
    _, status = _merged_status(tmp_path, segs)
    assert status == CS.FETCH_SUCCESS


def test_segment_merger_nutch_1520(ray_session, tmp_path):
    """NUTCH-1520/1113: FETCH_NOTMODIFIED and FETCH_RETRY never
    override a real fetch; a url with only retry rows is dropped."""
    segs = [
        _seg(tmp_path, "s1", [(URL, CS.FETCH_SUCCESS, 10),
                              ("http://only-retry.com/", CS.FETCH_RETRY, 10)]),
        _seg(tmp_path, "s2", [(URL, CS.FETCH_NOTMODIFIED, 20),
                              ("http://only-retry.com/", CS.FETCH_RETRY, 20)]),
    ]
    got, status = _merged_status(tmp_path, segs)
    assert status == CS.FETCH_SUCCESS
    assert "http://only-retry.com/" not in got.index


def test_segment_merger_linked_only_kept(ray_session, tmp_path):
    """A url seen only as LINKED keeps its latest LINKED row (the
    reference emits those under crawl_parse; single-table analogue)."""
    segs = [
        _seg(tmp_path, "s1", [(URL, CS.LINKED, 10)]),
        _seg(tmp_path, "s2", [(URL, CS.LINKED, 20)]),
    ]
    got, status = _merged_status(tmp_path, segs)
    assert status == CS.LINKED
    assert int(got.loc[URL, "fetch_time"]) == 20


def test_segment_merge_filter(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coherencebot_ray.stages.tools import merge_segments

    seg = tmp_path / "seg1" / "fetch_out" / "part-0"
    seg.mkdir(parents=True)
    t = pa.table(
        {
            "url": ["http://a.com/x", "http://spam.com/y"],
            "fetch_time": [10, 20],
            "status": [33, 33],
        }
    )
    pq.write_table(t, seg / "f.parquet")

    def drop_spam(component, df):
        if "url" not in df.columns:
            return np.ones(len(df), dtype=bool)
        return ~df["url"].str.contains("spam")

    out = tmp_path / "merged"
    counts = merge_segments(
        [str(tmp_path / "seg1")], str(out), n_buckets=4, merge_filters=[drop_spam]
    )
    assert counts["fetch_out"] == 1
    got = pq.read_table(str(out / "fetch_out")).to_pandas()
    assert got["url"].tolist() == ["http://a.com/x"]


def test_elastic_index_writer(ray_session, tmp_path):
    """indexer-elastic bulk-NDJSON shape through the stub session:
    action+source line pairs with _id = url, one _refresh commit,
    delete actions for the CleaningJob path."""
    import glob

    import ray.data as rd

    from coherencebot_ray.stages.tools import ElasticIndexWriter, write_index_elastic

    rec = str(tmp_path / "bulk")

    class _NdjsonSession:
        def __init__(self, rec_dir):
            self.rec_dir = rec_dir

        def post(self, url, data=None, json=None, headers=None, timeout=None):
            import json as _json
            import os
            import uuid

            os.makedirs(self.rec_dir, exist_ok=True)
            with open(os.path.join(self.rec_dir, f"{uuid.uuid4().hex}.json"), "w") as f:
                _json.dump({"url": url, "data": data, "headers": headers}, f)

            class R:
                status_code = 200

            return R()

    docs = pd.DataFrame({
        "url": [f"http://x/{i}" for i in range(10)],
        "score": np.arange(10, dtype=np.float64),
        "anchors": [["a", "b"]] * 10,
    })
    n = write_index_elastic(
        rd.from_pandas(docs), "http://es.example:9200", index="crawl",
        session_factory=lambda: _NdjsonSession(rec), batch_size=4, concurrency=1,
    )
    assert n == 10
    posts = [json.load(open(p)) for p in glob.glob(rec + "/*.json")]
    bulks = [p for p in posts if p["url"].endswith("/_bulk")]
    refreshes = [p for p in posts if p["url"].endswith("/crawl/_refresh")]
    assert len(refreshes) == 1
    actions, sources = [], []
    for p in bulks:
        assert p["headers"]["Content-Type"] == "application/x-ndjson"
        lines = [json.loads(l) for l in p["data"].strip().split("\n")]
        actions.extend(lines[0::2])
        sources.extend(lines[1::2])
    assert {a["index"]["_id"] for a in actions} == set(docs["url"])
    assert all(a["index"]["_index"] == "crawl" for a in actions)
    assert sources[0]["anchors"] == ["a", "b"]

    # delete path (CleaningJob)
    w = ElasticIndexWriter("http://es.example:9200", index="crawl",
                           session_factory=lambda: _NdjsonSession(rec))
    assert w.delete_batch(["http://x/1", "http://x/2"]) == 2
    posts2 = [json.load(open(p)) for p in glob.glob(rec + "/*.json")]
    dels = [json.loads(l) for p in posts2 if p["url"].endswith("/_bulk")
            for l in p["data"].strip().split("\n") if '"delete"' in l]
    assert {d["delete"]["_id"] for d in dels} == {"http://x/1", "http://x/2"}


def test_exchange_routes_to_callable_sink(ray_session, tmp_path):
    """write_index_exchanged accepts a callable sink so the elastic
    writer rides the exchange routing like file sinks."""
    import ray.data as rd

    from coherencebot_ray.functions.exchange import ExchangeConfig, Exchanges
    from coherencebot_ray.stages.tools import write_index_exchanged

    docs = pd.DataFrame({
        "url": ["http://a.com/1", "http://b.org/2"],
        "host": ["a.com", "b.org"],
    })
    got = {}

    def sink(ds):
        got["rows"] = sorted(ds.to_pandas()["url"])

    exch = Exchanges(
        [ExchangeConfig("orgs", 'host == "b.org"', ("es",))],
        default_writers=("files",),
        all_writers=("files", "es"),
    )
    out_dir = str(tmp_path / "files")
    write_index_exchanged(
        rd.from_pandas(docs), {"files": (out_dir, "parquet"), "es": sink},
        exchanges=exch,
    )
    assert got["rows"] == ["http://b.org/2"]
    import pyarrow.parquet as pq

    files = pq.read_table(out_dir).to_pandas()
    assert sorted(files["url"]) == ["http://a.com/1"]


def test_segment_merger_large_disjoint(ray_session, tmp_path):
    """TestSegmentMerger.testLargeMerge analogue: two segments with
    disjoint key spaces merge losslessly (every record from both
    survives, values intact)."""
    import pyarrow.parquet as pq

    from coherencebot_ray.stages.tools import merge_segments

    n1, n2 = 5000, 4000
    segs = [
        _seg(tmp_path, "big1",
             [(f"http://seg1.example/{i:07d}", CS.FETCH_SUCCESS, i) for i in range(n1)]),
        _seg(tmp_path, "big2",
             [(f"http://seg2.example/{i:07d}", CS.FETCH_SUCCESS, i) for i in range(n2)]),
    ]
    out = tmp_path / "out_large"
    counts = merge_segments(segs, str(out), n_buckets=8)
    assert counts["fetch_out"] == n1 + n2
    got = pq.read_table(str(out / "fetch_out")).to_pandas()
    assert (got["url"].str.startswith("http://seg1.example/")).sum() == n1
    assert (got["url"].str.startswith("http://seg2.example/")).sum() == n2


def test_segment_merger_slice_filter_normalize(ray_session, tmp_path):
    """-slice / -filter / -normalize options (SegmentMerger.java:
    370-434): sliced output directories each hold at most the
    per-bucket chunk; filtered urls drop; normalization rewrites keys
    map-side."""
    import glob as _glob

    import pyarrow.parquet as pq

    from coherencebot_ray.stages.tools import merge_segments

    rows = [(f"http://h.example/p/{i}", CS.FETCH_SUCCESS, i) for i in range(600)]
    rows.append(("http://h.example/skip.gif", CS.FETCH_SUCCESS, 999))   # filtered
    rows.append(("http://h.example/a#frag", CS.FETCH_SUCCESS, 998))     # normalized
    segs = [_seg(tmp_path, "sl1", rows)]
    out = tmp_path / "out_slice"
    counts = merge_segments(
        segs, str(out), n_buckets=4, url_filter=True, url_normalize=True,
        slice_size=400)
    assert counts["fetch_out"] == 601  # gif dropped, #frag merged in
    slice_dirs = sorted(_glob.glob(str(out / "slice-*")))
    assert len(slice_dirs) >= 2
    got = pd.concat([
        pq.read_table(f).to_pandas()
        for f in _glob.glob(str(out / "slice-*" / "fetch_out" / "*.parquet"))
    ])
    assert len(got) == 601
    assert "http://h.example/a" in set(got["url"])      # fragment stripped
    assert "http://h.example/skip.gif" not in set(got["url"])
    # every slice file holds at most the per-bucket chunk (400/4)
    for f in _glob.glob(str(out / "slice-*" / "fetch_out" / "*.parquet")):
        assert pq.read_metadata(f).num_rows <= 100


def test_segment_get(ray_session, tmp_path):
    """readseg -get: one url's rows from every component."""
    from coherencebot_ray.stages.tools import segment_get

    seg = _seg(tmp_path, "sg", [(URL, CS.FETCH_SUCCESS, 10),
                                ("http://other.example/x", CS.FETCH_GONE, 11)])
    got = segment_get(seg, URL)
    assert list(got) == ["fetch_out"]
    assert got["fetch_out"][0]["status"] == int(CS.FETCH_SUCCESS)
    assert segment_get(seg, "http://missing.example/") == {}
