"""Port of TestGenerator.java: score ordering (testGenerateHighest:79-107),
per-host cap (:139-195), per-domain cap (:204-261), URLFilter (:272-299),
plus the url-hash fetchlist ordering and topN budget."""

import numpy as np
import pandas as pd
import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.functions.filters import RegexURLFilter, URLFilters
from coherencebot_ray.functions.urlutil import generator_url_hash_vec
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.stages.generate import eligibility_filter, select_partition

CUR = 1_700_000_000_000


def frontier_df(urls, scores, hosts=None, domains=None, **overrides):
    n = len(urls)
    base = {
        "url": urls,
        "host": hosts if hosts is not None else [u.split("/")[2] for u in urls],
        "domain": domains if domains is not None else [u.split("/")[2] for u in urls],
        "part": np.zeros(n, dtype=np.int32),
        "status": np.full(n, CS.DB_UNFETCHED, dtype=np.int64),
        "fetch_time": np.full(n, CUR - 1000, dtype=np.int64),
        "retries": np.zeros(n, dtype=np.int64),
        "fetch_interval": np.full(n, 1, dtype=np.int64),
        "score": np.asarray(scores, dtype=np.float32),
        "signature": [None] * n,
        "modified_time": np.zeros(n, dtype=np.int64),
        "gen_time": np.zeros(n, dtype=np.int64),
        "repr_url": [None] * n,
        "fixed_interval": np.zeros(n, dtype=np.int64),
        "metadata": [None] * n,
    }
    base.update(overrides)
    return pd.DataFrame(base)


def test_generate_highest():
    """101 urls score=i, topN=2 -> the two highest scores win."""
    urls = [f"http://aaa/{i:03d}" for i in range(101)]
    df = frontier_df(urls, scores=list(range(101)))
    cfg = CrawlConfig(num_partitions=1)
    out = select_partition(df, cfg, limit=2, gen_time_ms=CUR)
    got = sorted(out["url"], key=lambda u: -out.set_index("url").loc[u, "score"])
    assert set(out["url"]) == {"http://aaa/100", "http://aaa/099"}
    assert len(out) == 2


@pytest.mark.parametrize("max_per_host,expected", [(1, 1), (2, 2), (3, 3)])
def test_generate_host_limit(max_per_host, expected):
    urls = [f"http://www.example.com/index{i}.html" for i in range(4)]
    df = frontier_df(urls, scores=[1.0] * 4)
    cfg = CrawlConfig(gen_max_count=max_per_host, gen_count_mode="host")
    out = select_partition(df, cfg, limit=1000, gen_time_ms=CUR)
    assert len(out) == expected


@pytest.mark.parametrize("max_per_domain,expected", [(1, 1), (2, 2), (3, 3)])
def test_generate_domain_limit(max_per_domain, expected):
    urls = [
        "http://a.example.com/index.html",
        "http://b.example.com/index.html",
        "http://c.example.com/index.html",
        "http://d.example.com/index.html",
    ]
    df = frontier_df(urls, scores=[1.0] * 4, domains=["example.com"] * 4)
    cfg = CrawlConfig(gen_max_count=max_per_domain, gen_count_mode="domain")
    out = select_partition(df, cfg, limit=1000, gen_time_ms=CUR)
    assert len(out) == expected


def test_generate_url_filter():
    """TestGenerator.testGenerateFilter analogue: filtered URLs are absent."""
    urls = ["http://ok.com/a.html", "http://ok.com/b.jpg", "ftp://bad/x"]
    df = frontier_df(urls, scores=[1.0, 2.0, 3.0])
    cfg = CrawlConfig()
    kept = eligibility_filter(df, cfg, CUR, filters=URLFilters(instances=[RegexURLFilter()]))
    assert list(kept["url"]) == ["http://ok.com/a.html"]


def test_eligibility_future_fetch_time_rejected():
    df = frontier_df(["http://a/1", "http://a/2"], scores=[1, 1])
    df.loc[1, "fetch_time"] = CUR + 10_000
    out = eligibility_filter(df, CrawlConfig(), CUR)
    assert list(out["url"]) == ["http://a/1"]


def test_eligibility_gen_time_skipped():
    """URLs already generated (awaiting update) are skipped (Generator.java:238-244)."""
    df = frontier_df(["http://a/1", "http://a/2"], scores=[1, 1])
    df.loc[0, "gen_time"] = CUR - 500
    out = eligibility_filter(df, CrawlConfig(), CUR)
    assert list(out["url"]) == ["http://a/2"]


def test_eligibility_min_score_and_interval():
    df = frontier_df(["http://a/1", "http://a/2"], scores=[0.1, 0.9])
    out = eligibility_filter(df, CrawlConfig(gen_min_score=0.5), CUR)
    assert list(out["url"]) == ["http://a/2"]
    df2 = frontier_df(["http://a/1", "http://a/2"], scores=[1, 1])
    df2.loc[0, "fetch_interval"] = 10_000
    out2 = eligibility_filter(df2, CrawlConfig(gen_max_interval=5_000), CUR)
    assert list(out2["url"]) == ["http://a/2"]


def test_fetchlist_ordered_by_url_hash():
    """Phase-2 ordering: fetchlist sorted by the Generator byte hash."""
    urls = [f"http://aaa/{i:03d}" for i in range(20)]
    df = frontier_df(urls, scores=[1.0] * 20)
    out = select_partition(df, CrawlConfig(), limit=1000, gen_time_ms=CUR)
    h = generator_url_hash_vec(out["url"].to_numpy())
    assert (np.diff(h) >= 0).all()


def test_segment_spill():
    """Per-host overflow spills to the next segment instead of dropping
    (Generator.java:494-537)."""
    urls = [f"http://big.com/{i}" for i in range(6)]
    df = frontier_df(urls, scores=[6, 5, 4, 3, 2, 1])
    cfg = CrawlConfig(gen_max_count=2)
    out = select_partition(df, cfg, limit=1000, gen_time_ms=CUR, max_num_segments=3)
    assert len(out) == 6
    assert sorted(out["segnum"].value_counts().to_dict().items()) == [(1, 2), (2, 2), (3, 2)]
    # without spill segments, overflow is dropped
    out1 = select_partition(df, cfg, limit=1000, gen_time_ms=CUR, max_num_segments=1)
    assert len(out1) == 2


def test_hostdb_override():
    """HostDb-driven per-host maxCount / fetchDelay (Generator.java:415-453)."""
    urls = [f"http://special.com/{i}" for i in range(5)] + ["http://other.com/0"]
    df = frontier_df(urls, scores=[5, 4, 3, 2, 1, 9])
    cfg = CrawlConfig(gen_max_count=1)
    hostdb = {"special.com": (3, 7000)}
    out = select_partition(df, cfg, limit=1000, gen_time_ms=CUR, hostdb=hostdb)
    by_host = out.groupby("host").size().to_dict()
    assert by_host == {"special.com": 3, "other.com": 1}
    assert (out[out["host"] == "special.com"]["fetch_delay_ms"] == 7000).all()


def test_gen_time_stamped():
    df = frontier_df(["http://a/1"], scores=[1.0])
    out = select_partition(df, CrawlConfig(), limit=10, gen_time_ms=123456)
    assert (out["gen_time"] == 123456).all()


def test_generate_ray_pipeline(ray_session):
    """End-to-end Dataset pipeline: topN budget split across partitions."""
    import ray.data as rd

    from coherencebot_ray.sources.synth import synth_frontier
    from coherencebot_ray.stages.generate import generate

    cfg = CrawlConfig(num_partitions=4, topn=40)
    t = synth_frontier(500, 20, cfg)
    ds = rd.from_arrow(t)
    out = generate(ds, cfg, CUR, topn=40).to_pandas()
    assert 0 < len(out) <= 40
    # per-partition budget respected
    assert out.groupby("part").size().max() <= 10
    # all hosts of one url share the partition of that host
    t_pd = t.to_pandas()
    part_of_host = dict(zip(t_pd["host"], t_pd["part"]))
    assert all(part_of_host[h] == p for h, p in zip(out["host"], out["part"]))


def test_generate_writeback_reentrant(tmp_path, ray_session):
    """Generator CrawlDbUpdater (Generator.java:642-691): with
    generate.update.crawldb on, a second generate WITHOUT an intervening
    updatedb must select a disjoint URL set (gen_time write-back)."""
    import pyarrow.parquet as pq
    import glob as _glob

    from coherencebot_ray.pipelines.crawl import CrawlDriver, _frontier_pa
    from coherencebot_ray.sources.synth import EPOCH, synth_frontier

    cfg = CrawlConfig(num_partitions=2, topn=20, server_delay_s=0.0, gen_update_crawldb=True)
    d = CrawlDriver(str(tmp_path / "c"), cfg)
    d.bootstrap(synth_frontier(200, 8, cfg))

    def fetchlist_urls(seg):
        urls = set()
        for f in _glob.glob(f"{seg}/fetchlist/part-*/data-0.parquet"):
            urls |= set(pq.read_table(f, columns=["url"]).column("url").to_pylist())
        return urls

    r1 = d.generate(EPOCH + 1000)
    u1 = fetchlist_urls(r1["seg"])
    assert len(u1) > 0
    r2 = d.generate(EPOCH + 2000)
    u2 = fetchlist_urls(r2["seg"])
    assert u1.isdisjoint(u2), f"overlap: {u1 & u2}"
    # after the gen-delay expires the locked urls become eligible again
    r3 = d.generate(EPOCH + 2000 + cfg.gen_delay_ms + 1000)
    u3 = fetchlist_urls(r3["seg"])
    assert u3 & u1


def test_url_util_domain_name():
    """TestURLUtil.testGetDomainName port (the subset the compact
    public-suffix table covers; the reference ships the full
    publicsuffix list): registered domains, IP hosts whole, bare
    hosts unchanged."""
    from coherencebot_ray.functions.urlutil import get_domain, get_host

    cases = [
        ("http://lucene.apache.org/nutch", "apache.org"),
        ("http://en.wikipedia.org/wiki/Java_coffee", "wikipedia.org"),
        ("http://140.211.11.130/foundation/contributing.html", "140.211.11.130"),
        ("http://www.example.co.uk:8080/index.html", "example.co.uk"),
        ("http://com", "com"),
    ]
    for url, expected in cases:
        assert get_domain(get_host(url)) == expected, url


def test_select_vectorized_matches_loop():
    """The single-segment vectorized selector must equal the
    reference-shaped sequential reducer row-for-row across randomized
    caps, overrides, skew, count modes and budgets."""
    rng = np.random.RandomState(7)
    for trial in range(40):
        n = int(rng.randint(1, 400))
        n_hosts = int(rng.randint(1, 12))
        hosts = [f"h{rng.randint(n_hosts)}.example" for _ in range(n)]
        domains = [h.split(".", 1)[-1] if rng.rand() < 0.5 else h for h in hosts]
        urls = [f"http://{h}/p{i}" for i, h in enumerate(hosts)]
        scores = rng.rand(n).astype(np.float32) * 10
        df = frontier_df(urls, scores=list(scores), hosts=hosts, domains=domains)
        cfg = CrawlConfig(
            gen_max_count=int(rng.choice([-1, 0, 1, 2, 5])),
            gen_count_mode=str(rng.choice(["host", "domain"])),
        )
        hostdb = None
        if rng.rand() < 0.6:
            hostdb = {}
            for hid in range(n_hosts):
                if rng.rand() < 0.5:
                    mc = None if rng.rand() < 0.3 else int(rng.choice([0, 1, 3]))
                    fd = int(rng.choice([0, 250]))
                    hostdb[f"h{hid}.example"] = (mc, fd)
        limit = int(rng.choice([1, 3, 17, 1000]))
        a = select_partition(df, cfg, limit=limit, gen_time_ms=CUR, hostdb=hostdb)
        b = select_partition(df, cfg, limit=limit, gen_time_ms=CUR, hostdb=hostdb,
                             _force_loop=True)
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True),
            check_dtype=True,
        ), f"trial {trial}"
