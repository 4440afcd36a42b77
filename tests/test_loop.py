"""Crawl-loop driver (bin/crawl analogue): seed inject, multi-round
growth, .STOP file, feed mode."""

import os

import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.pipelines.loop import crawl_loop

CFG = CrawlConfig(num_partitions=4, topn=300, server_delay_s=0.0)
SEEDS = [f"http://host{i}.example/start" for i in range(5)]
T0 = 1_700_000_000_000


def test_loop_rounds_grow_frontier(tmp_path, ray_session):
    res = crawl_loop(
        str(tmp_path / "w"), CFG, seeds=SEEDS, rounds=2, start_time_ms=T0,
        round_interval_ms=40 * 86400 * 1000,
    )
    assert [m["gen"] for m in res] == [1, 2]
    assert res[1]["counters"]["generated"] > res[0]["counters"]["generated"]


def test_stop_file_halts_loop(tmp_path, ray_session):
    wd = str(tmp_path / "w2")
    os.makedirs(wd)
    open(os.path.join(wd, ".STOP"), "w").close()
    res = crawl_loop(wd, CFG, seeds=SEEDS, rounds=3, start_time_ms=T0)
    assert res == []  # stopped before round 1


def test_feed_mode(tmp_path, ray_session):
    res = crawl_loop(str(tmp_path / "w3"), CFG, rounds=1, use_feed=True, start_time_ms=T0)
    assert res[0]["counters"]["generated"] > 0


def test_no_seeds_raises(tmp_path, ray_session):
    with pytest.raises(ValueError):
        crawl_loop(str(tmp_path / "w4"), CFG, rounds=1, start_time_ms=T0)


def test_doc_dedup_cadence_marks_losers(tmp_path, ray_session):
    """--doc-dedup-every: document-level near-dup keep-one (minhash →
    connected components → mark losers DB_DUPLICATE). Five hosts serve
    an identical page -> one cluster -> exactly 4 losers; the counter
    lands in the round metrics AND the segment's _ROUND.json, and the
    loser list is written as a resumable parquet artifact."""
    import glob
    import json

    from coherencebot_ray.sources.fake_protocol import FakeProtocol, FakeResponse

    class DupProtocol(FakeProtocol):
        def fetch(self, url):
            if "/start" in url:
                body = (b"<html><body><p>identical corpus page with shared "
                        b"text tokens repeated verbatim across hosts for the "
                        b"near duplicate cluster</p></body></html>")
                return FakeResponse("success", body, "text/html")
            return super().fetch(url)

    wd = str(tmp_path / "w5")
    res = crawl_loop(wd, CFG, seeds=SEEDS, rounds=1, start_time_ms=T0,
                     doc_dedup_every=1, protocol=DupProtocol())
    assert res[0]["doc_dups_marked"] == 4
    files = glob.glob(os.path.join(wd, "doc_dedup", "gen=*", "*.parquet"))
    assert files  # resumable loser artifact
    with open(os.path.join(wd, "segments", "gen=000001", "_ROUND.json")) as fh:
        rj = json.load(fh)
    assert rj["counters"]["doc_dups_marked"] == 4


def test_media_dedup_cadence_writes_plan(tmp_path, ray_session):
    """--media-dedup-every: media refs shared across parsed docs land in
    a resumable media_plan parquet with the min-id canonical owner, and
    the counters reach the round metrics and _ROUND.json."""
    import glob
    import json

    import pandas as pd

    from coherencebot_ray.sources.fake_protocol import FakeProtocol, FakeResponse

    class ImgProtocol(FakeProtocol):
        def fetch(self, url):
            if "/start" in url:
                body = (b"<html><body><img src='http://cdn.example/shared.png'>"
                        b"<p>page text</p></body></html>")
                return FakeResponse("success", body, "text/html")
            return super().fetch(url)

    wd = str(tmp_path / "wmedia")
    res = crawl_loop(wd, CFG, seeds=SEEDS, rounds=1, start_time_ms=T0,
                     media_dedup_every=1, protocol=ImgProtocol())
    # every seed page embeds the same asset -> one dup ref group
    assert res[0]["media_dup_refs"] == 1
    assert res[0]["media_fetches_saved"] == len(SEEDS) - 1
    files = glob.glob(os.path.join(wd, "media_plan", "gen=*", "*.parquet"))
    assert files
    plan = pd.concat([pd.read_parquet(f) for f in files])
    assert plan["media_ref"].tolist() == ["http://cdn.example/shared.png"]
    assert plan["n_docs"].tolist() == [len(SEEDS)]
    with open(os.path.join(wd, "segments", "gen=000001", "_ROUND.json")) as fh:
        rj = json.load(fh)
    assert rj["counters"]["media_dup_refs"] == 1


def test_dedup_cadence_commits_marks(tmp_path, ray_session):
    """--dedup-every: J9's StatusUpdateReducer now COMMITS a new
    frontier generation (per-touched-partition merge-back), so the
    DB_DUPLICATE marks survive into later rounds instead of being a
    count-only artifact."""
    from coherencebot_ray.model import CrawlStatus as CS
    from coherencebot_ray.pipelines.crawl import CrawlDriver
    from coherencebot_ray.sources.fake_protocol import FakeProtocol, FakeResponse

    class SameBodyProtocol(FakeProtocol):
        def fetch(self, url):
            if "/start" in url:
                return FakeResponse(
                    "success", b"<html><body>same body</body></html>", "text/html")
            return super().fetch(url)

    wd = str(tmp_path / "w")
    # distinct url lengths: the reference's compare fold marks no one in
    # a fully-tied pair, so ties must break on urlLength for a winner
    seeds = [f"http://host{i}.example/start{'x' * i}" for i in range(5)]
    res = crawl_loop(wd, CFG, seeds=seeds, rounds=1, start_time_ms=T0,
                     dedup_every=1, protocol=SameBodyProtocol())
    assert res[0]["duplicates_marked"] == 4  # 5 identical pages, 1 winner
    d = CrawlDriver(wd, CFG)
    front = d.store.read_table(d.store.latest_gen()).to_pandas()
    assert int((front["status"] == CS.DB_DUPLICATE).sum()) == 4


def test_loop_with_sitemaps_and_warc(tmp_path, ray_session):
    """Crawl loop with sitemap rounds and WARC export wired in."""
    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.pipelines.loop import crawl_loop

    cfg = CrawlConfig(num_partitions=2, topn=40, server_delay_s=0.0)
    res = crawl_loop(
        str(tmp_path / "w"),
        cfg,
        seeds=[f"http://host{i}.example/doc/{i}" for i in range(30)],
        rounds=2,
        start_time_ms=1_700_000_000_000,
        sitemaps_every=1,
        warc_out=str(tmp_path / "warc"),
    )
    assert len(res) == 2
    assert all(m["counters"]["generated"] > 0 for m in res)
    assert all(m.get("warc_records", 0) > 0 for m in res)
    import glob as _glob

    assert _glob.glob(str(tmp_path / "warc" / "gen=*" / "part-*.warc"))


def test_loop_sitemap_host_slicing(tmp_path, ray_session):
    """Sitemap rounds walk a rotating 1/N slice of the host space with a
    hard cap — never a driver-side list of every host."""
    cfg = CrawlConfig(num_partitions=2, topn=40, server_delay_s=0.0)
    res = crawl_loop(
        str(tmp_path / "w"),
        cfg,
        seeds=[f"http://host{i}.example/doc/{i}" for i in range(20)],
        rounds=2,
        start_time_ms=T0,
        sitemaps_every=1,
        sitemap_host_slices=4,
        sitemap_hosts_cap=3,
    )
    assert len(res) == 2 and all(m["counters"]["generated"] > 0 for m in res)


def test_depth_scoring_through_real_loop(tmp_path, ray_session):
    """Cross-stage regression (round-4 bug): carried frontier metadata
    must survive FetchPartition (the fetch datum starts as the crawl
    datum) and LINKED metadata must survive the _preagg_links combine —
    otherwise scoring-depth's inherited depths collapse to the 1000
    fallback. Two rounds at maxdepth=3: discovered pages sit at depth 2
    then 3."""
    import json

    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.pipelines.crawl import CrawlDriver
    from coherencebot_ray.sources.synth import EPOCH

    cfg = CrawlConfig(num_partitions=4, topn=5000, server_delay_s=0.0,
                      scoring_filters=("opic", "depth"), scoring_depth_max=3)
    d = CrawlDriver(str(tmp_path / "c"), cfg)
    d.inject([f"http://host{h}.synth/page/0" for h in range(10)], EPOCH)
    d.run_round(EPOCH + 100_000_000_000)
    d.run_round(EPOCH + 200_000_000_000)
    t = d.store.read_table(d.store.latest_gen()).to_pandas()
    depths = t["metadata"].map(
        lambda m: json.loads(m).get("_depth_") if isinstance(m, str) and m else None
    ).value_counts(dropna=False).to_dict()
    assert depths.get(1) == 10          # seeds
    assert depths.get(2, 0) > 0         # first-hop pages inherited depth
    assert depths.get(3, 0) > 0         # second-hop pages


def test_loop_index_with_binary_content(tmp_path, ray_session):
    """index_every + -addBinaryContent: the written index carries a
    base64 binaryContent field round-tripping the segment bytes."""
    import base64
    import glob

    import pyarrow.parquet as pq

    from coherencebot_ray.pipelines.loop import crawl_loop

    cfg = CrawlConfig(num_partitions=2, topn=40, server_delay_s=0.0,
                      indexer_add_binary_content=True,
                      indexer_binary_base64=True)
    wd = str(tmp_path / "w")
    res = crawl_loop(
        wd, cfg, seeds=[f"http://host{i}.example/doc/{i}" for i in range(10)],
        rounds=1, start_time_ms=T0, index_every=1,
    )
    assert res[0].get("indexed") == "written"
    files = glob.glob(os.path.join(wd, "index", "gen=*", "*.parquet"))
    t = pq.read_table(files)
    assert "binaryContent" in t.schema.names
    b64s = [v for v in t.column("binaryContent").to_pylist() if v]
    assert b64s and base64.b64decode(b64s[0])  # decodable payloads


def _frontier_digest(workdir):
    """Order-insensitive hash of the latest-generation frontier rows."""
    import hashlib

    import pandas as pd

    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.pipelines.crawl import CrawlDriver

    d = CrawlDriver(workdir, CFG)
    gen = d.store.latest_gen()
    df = d.store.read_table(gen).to_pandas()
    df = df.sort_values("url").reset_index(drop=True)
    payload = df.to_csv(index=False).encode()
    return gen, len(df), hashlib.md5(payload).hexdigest()


def test_resume_exact_timestamps_and_cadence(tmp_path, ray_session):
    """A crawl interrupted after round 1 and resumed in a fresh
    crawl_loop call (new driver, time base reloaded from
    _CRAWL_META.json) must produce a byte-identical frontier to the
    uninterrupted 3-round run — including round timestamps and the
    dedup cadence, which commits EXTRA generations that must not shift
    the round index."""
    wa, wb = str(tmp_path / "a"), str(tmp_path / "b")
    interval = 40 * 86400 * 1000

    res_a = crawl_loop(wa, CFG, seeds=SEEDS, rounds=3, start_time_ms=T0,
                       round_interval_ms=interval, dedup_every=2)

    crawl_loop(wb, CFG, seeds=SEEDS, rounds=1, start_time_ms=T0,
               round_interval_ms=interval, dedup_every=2)
    # resume: NO start_time_ms — must come from the persisted meta
    res_b = crawl_loop(wb, CFG, rounds=2, round_interval_ms=999,
                       dedup_every=2)

    gen_a, n_a, dig_a = _frontier_digest(wa)
    gen_b, n_b, dig_b = _frontier_digest(wb)
    assert (gen_a, n_a, dig_a) == (gen_b, n_b, dig_b)
    # the resumed rounds carried the original timestamps forward
    assert [m["gen"] for m in res_a[1:]] == [m["gen"] for m in res_b]


def test_adopt_pool_shares_and_survives_borrower_close(tmp_path, ray_session):
    """adopt_pool: the borrower reuses the lender's warmed actor pool
    (same handles), its rounds stay byte-deterministic, and close() on
    the borrower leaves the lender's actors alive."""
    import pyarrow.parquet as pq

    from coherencebot_ray.pipelines.crawl import CrawlDriver
    from coherencebot_ray.sources.synth import EPOCH, synth_frontier

    a = CrawlDriver(str(tmp_path / "a"), CFG)
    a.bootstrap(synth_frontier(2000, 32, CFG))
    a.run_round(EPOCH)
    pool = a._round_workers()

    def run_b(dirname, adopt):
        b = CrawlDriver(str(tmp_path / dirname), CFG)
        if adopt:
            b.adopt_pool(a)
            assert b._workers is pool
        b.bootstrap(synth_frontier(3000, 48, CFG))
        b.run_round(EPOCH)
        t = pq.read_table(
            os.path.join(b.seg_dir(1), "fetch_out"), columns=["url", "status"]
        ).to_pandas().sort_values("url").reset_index(drop=True)
        b.close()
        return t

    borrowed = run_b("b1", adopt=True)
    # lender's pool survived the borrower's close()
    assert a._workers is pool
    fresh = run_b("b2", adopt=False)
    assert borrowed.equals(fresh)  # warm robots/parser state changes nothing
    a.close()
