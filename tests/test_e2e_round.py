"""End-to-end crawl rounds on the synthetic frontier with the fake
protocol: frontier evolution, URL-seen growth, determinism of crawl
order, resume from checkpoint, partition-pruned updatedb."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.model import CrawlStatus as CS
from coherencebot_ray.pipelines.crawl import CrawlDriver
from coherencebot_ray.sources.synth import EPOCH, synth_frontier, synth_seeds

CFG = CrawlConfig(num_partitions=4, topn=200, server_delay_s=0.0)


@pytest.fixture()
def driver(tmp_path, ray_session):
    d = CrawlDriver(str(tmp_path / "crawl"), CFG)
    d.bootstrap(synth_frontier(300, 12, CFG))
    return d


def test_two_rounds_evolve_frontier(driver):
    m1 = driver.run_round(EPOCH)
    assert m1["gen"] == 1
    hist1 = m1["counters"]["db_status"]
    assert hist1.get("db_fetched", 0) > 0
    # round 2: later time so intervals don't block
    m2 = driver.run_round(EPOCH + 40 * 86400 * 1000)
    assert m2["gen"] == 2
    t = driver.store.read_table(2).to_pandas()
    # discovered outlink URLs joined the frontier
    assert len(t) > 300
    assert t["url"].is_unique
    # every row's part matches its host's partition
    from coherencebot_ray.functions.urlutil import partition_for_hosts

    expect = partition_for_hosts(t["host"], CFG.num_partitions, CFG.partition_seed)
    assert (expect == t["part"].to_numpy()).all()


def test_crawl_order_and_urlseen_equality_between_runs(tmp_path, ray_session):
    """Same seed list + politeness budget => identical crawl order and
    URL-seen set across independent runs (the north-rule gate)."""
    outs = []
    for name in ("a", "b"):
        d = CrawlDriver(str(tmp_path / name), CFG)
        d.bootstrap(synth_frontier(300, 12, CFG))
        d.run_round(EPOCH)
        fo = pq.read_table(os.path.join(d.seg_dir(1), "fetch_out")).to_pandas()
        fo = fo[fo["fetch_order"] >= 0]
        order = fo.sort_values(["part", "fetch_order"])["url"].tolist()
        seen = set(d.store.read_table(1).to_pandas()["url"])
        outs.append((order, seen))
    assert outs[0][0] == outs[1][0], "crawl order differs between identical runs"
    assert outs[0][1] == outs[1][1], "URL-seen set differs between identical runs"


def test_resume_discards_incomplete_round(driver):
    driver.run_round(EPOCH)
    # simulate a crashed round 2: segment dir exists, no _ROUND.json
    seg = driver.seg_dir(2)
    os.makedirs(os.path.join(seg, "fetchlist"), exist_ok=True)
    with open(os.path.join(seg, "fetchlist", "junk.parquet"), "w") as f:
        f.write("garbage")
    m2 = driver.run_round(EPOCH + 40 * 86400 * 1000)
    assert m2["gen"] == 2
    assert driver.round_complete(2)
    assert driver.store.latest_gen() == 2


def test_partition_pruned_updatedb(driver):
    m1 = driver.run_round(EPOCH)
    man = driver.store.manifest(1)
    touched = set(man["lineage"]["touched_parts"])
    # untouched partitions are carried forward by reference (source_gen=0)
    for p, ent in man["partitions"].items():
        if int(p) not in touched and ent["rows"] > 0:
            assert ent["source_gen"] == 0
            assert all("gen=000000" in f for f in ent["files"])


def test_inject_pipeline(tmp_path, ray_session):
    d = CrawlDriver(str(tmp_path / "inj"), CFG)
    man = d.inject(synth_seeds(50, n_hosts=5), EPOCH)
    t = d.store.read_table(0).to_pandas()
    assert len(t) == 50
    assert (t["status"] == CS.DB_UNFETCHED).all()
    # metadata-scored seeds got nutch.score=2.0
    assert (t["score"] == 2.0).sum() == 10
    # injecting overlapping seeds keeps existing rows (no overwrite)
    man2 = d.inject(synth_seeds(60, n_hosts=5), EPOCH + 1000)
    t2 = d.store.read_table(1).to_pandas()
    assert len(t2) == 60
    assert t2["url"].is_unique


def test_round_metrics_recorded(driver):
    m = driver.run_round(EPOCH)
    p = os.path.join(driver.seg_dir(1), "_ROUND.json")
    assert os.path.exists(p)
    with open(p) as f:
        rec = json.load(f)
    assert rec["counters"]["generated"] > 0
    assert {"gen_fetch_parse", "fetch", "parse", "updatedb"} <= set(rec["timings_s"])


def test_scatter_shuffle_fallback(tmp_path, ray_session):
    """At num_partitions > scatter_direct_max_parts the crawl_parse
    exchange switches from per-target files (P^2) to a Ray Data hash
    shuffle; the resulting frontier must be identical to direct mode."""
    from coherencebot_ray.sources.synth import EPOCH, synth_frontier

    outs = []
    for cap in (256, 0):  # direct vs forced-shuffle
        cfg = CrawlConfig(
            num_partitions=4, topn=200, server_delay_s=0.0,
            scatter_direct_max_parts=cap,
        )
        d = CrawlDriver(str(tmp_path / f"c{cap}"), cfg)
        d.bootstrap(synth_frontier(300, 10, cfg))
        d.run_round(EPOCH + 1000)
        f = d.store.read_table(d.store.latest_gen()).to_pandas()
        outs.append(
            f[["url", "status", "fetch_time", "score"]]
            .sort_values("url").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_crawldb_host_rename_repartitions(tmp_path, ray_session):
    """ADVICE r3: a crawldb-scope normalizer that changes the HOST must
    recompute host/part (domain follows) and route renamed rows to their
    new hash(host) partition — the reference's CrawlDbFilter runs as a
    mapper so Hadoop reshuffles on the new key; here the stray pass
    folds moved rows into the target partition before the commit."""
    from coherencebot_ray.functions.urlutil import domains_of, partition_for_hosts

    cfg = CFG.with_(
        update_url_normalize=True,
        crawldb_regex_rules=((r"^http://host1\.example/", "http://host0.example/"),),
    )
    d = CrawlDriver(str(tmp_path / "ren"), cfg)
    d.bootstrap(synth_frontier(300, 12, cfg))
    d.run_round(EPOCH)
    t = d.store.read_table(1).to_pandas()
    # every host1 url was renamed (all partitions saw fetch activity at
    # topn=200, so every partition was merged this round)
    assert not (t["host"] == "host1.example").any()
    assert not t["url"].str.startswith("http://host1.example/").any()
    # collisions with canonical host0 twins deduplicated
    assert t["url"].is_unique
    # host / part / domain all recomputed consistently
    expect = partition_for_hosts(t["host"], cfg.num_partitions, cfg.partition_seed)
    assert (expect == t["part"].to_numpy()).all()
    assert (t["domain"].to_numpy() == domains_of(t["host"]).to_numpy()).all()
    # renamed rows physically live in their new partition's files
    for f in d.store.files(1):
        sub = pq.read_table(f, partitioning=None).to_pandas()
        pdir = next(s for s in f.split(os.sep) if s.startswith("part="))
        assert (sub["part"] == int(pdir.split("=")[1])).all()


def test_crawldb_rename_same_partition_twin_folds(tmp_path, ray_session):
    """ADVICE r4: a crawldb-scope rename landing on a url whose canonical
    twin lives in the SAME partition (part unchanged, no stray staging)
    must still fold — the committed generation never carries duplicate
    url rows (the reference's map-side CrawlDbFilter merges such twins
    in one reduce)."""
    cfg = CFG.with_(
        update_url_normalize=True,
        crawldb_regex_rules=(
            (r"^http://host0\.example/page/1$", "http://host0.example/page/0"),
        ),
    )
    d = CrawlDriver(str(tmp_path / "twin"), cfg)
    d.bootstrap(synth_frontier(300, 12, cfg))
    d.run_round(EPOCH)
    t = d.store.read_table(1).to_pandas()
    assert not (t["url"] == "http://host0.example/page/1").any()
    assert (t["url"] == "http://host0.example/page/0").sum() == 1
    assert t["url"].is_unique


def test_pst_typed_column_rides_into_frontier(driver):
    """The fetcher stamps protocol status as a typed ``pst`` column
    (FetcherThread.java:650 stamps _pst_ on every fetch datum; SURVEY
    §1.3 promotes the hot key) and updatedb carries it into the
    frontier: fetched rows have a code, never-fetched rows are null,
    and protocol_status_stats reads the column."""
    from coherencebot_ray.stages.jobs import protocol_status_stats

    driver.run_round(EPOCH)
    t = driver.store.read_table(1).to_pandas()
    assert "pst" in t.columns
    fetched = t[t["status"] == CS.DB_FETCHED]
    assert len(fetched) and (fetched["pst"] == "success").all()
    unfetched = t[t["status"] == CS.DB_UNFETCHED]
    # never-attempted rows carry no protocol status; an attempted row
    # bounced back to UNFETCHED (FETCH_RETRY → retry path) keeps its
    # "exception" stamp, like the reference's _pst_ metadata
    assert set(unfetched["pst"].dropna()) <= {"exception"}
    assert unfetched["pst"].isna().any()
    stats = protocol_status_stats(driver.store.read(1)).to_pandas().set_index("code")
    assert int(stats.loc["success", "count"]) == int((t["pst"] == "success").sum())
    assert int(stats.loc["UNFETCHED", "count"]) == int(t["pst"].isna().sum())


def test_round_workers_persist_robots_across_rounds(tmp_path, ray_session):
    """The persistent worker pool keeps robots state across rounds (the
    reference's RobotRulesParser.CACHE is a static per-JVM Hashtable
    alive for the whole crawl): with partitions routed part % n to a
    stable actor, each host's robots is fetched AT MOST ONCE over the
    whole crawl, not once per round."""
    from coherencebot_ray.sources.fake_protocol import FakeProtocol

    log = tmp_path / "robots_calls.log"

    class LoggingProtocol(FakeProtocol):
        def robots(self, host):
            with open(log, "a") as fh:
                fh.write(host + "\n")
            return super().robots(host)

    d = CrawlDriver(str(tmp_path / "crawl"), CFG, protocol=LoggingProtocol())
    d.bootstrap(synth_frontier(300, 12, CFG))
    d.run_round(EPOCH)
    workers1 = d._workers
    assert workers1  # pool created
    d.run_round(EPOCH + 40 * 86400 * 1000)
    assert d._workers is workers1  # pool reused, not rebuilt
    calls = log.read_text().splitlines()
    assert len(calls) == len(set(calls)), "a host's robots was re-fetched"
    d.close()
    assert d._workers is None


def test_updatedb_dataset_path_renormalizes_mapside(tmp_path, ray_session):
    """stages.updatedb.updatedb applies CrawlDbFilter renormalization
    map-side (before the groupby) so a renamed url meets its canonical
    twin in one partition group and deduplicates."""
    import ray.data as rd

    from coherencebot_ray.stages.updatedb import updatedb

    cfg = CFG.with_(
        update_url_normalize=True,
        crawldb_regex_rules=((r"^http://host1\.example/", "http://host0.example/"),),
    )
    front = synth_frontier(300, 12, cfg).to_pandas()
    ds = rd.from_pandas(front)
    out = updatedb(ds, None, None, cfg, EPOCH).to_pandas()
    assert not out["url"].str.startswith("http://host1.example/").any()
    assert out["url"].is_unique
    from coherencebot_ray.functions.urlutil import partition_for_hosts

    expect = partition_for_hosts(out["host"], cfg.num_partitions, cfg.partition_seed)
    assert (expect == out["part"].to_numpy()).all()


def test_injector_reference_scenario(tmp_path, ray_session):
    """TestInjector.testInject port through CrawlDriver.inject: first
    inject 100 seeds with nutch.score / nutch.fetchInterval / key=value
    metadata; second inject (db.injector.update=true) re-seeds the same
    urls plus 100 new ones — counts dedupe, and the original interval /
    non-default score / metadata survive the update merge."""
    import json

    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.pipelines.crawl import CrawlDriver

    EPOCH_MS = 1_700_000_000_000
    cfg = CrawlConfig(num_partitions=4, inject_update=True)
    d = CrawlDriver(str(tmp_path / "c"), cfg)

    seeds1 = [
        f"http://zzz.com/{i}.html\tnutch.score=2.{i}\tnutch.fetchInterval=171717\tkey=value"
        for i in range(100)
    ]
    d.inject(seeds1, EPOCH_MS)
    t = d.store.read_table(d.store.latest_gen()).to_pandas()
    assert sorted(t["url"]) == sorted(f"http://zzz.com/{i}.html" for i in range(100))

    seeds2 = [f"http://xxx.com/{i}.html" for i in range(100)] + [
        f"http://zzz.com/{i}.html" for i in range(100)
    ]
    d.inject(seeds2, EPOCH_MS + 1000)
    t2 = d.store.read_table(d.store.latest_gen()).to_pandas().set_index("url")
    # 200 distinct urls (zzz overwritten in place, not duplicated)
    assert len(t2) == 200
    for i in range(100):
        row = t2.loc[f"http://zzz.com/{i}.html"]
        assert row["fetch_interval"] == 171717
        assert float(row["score"]) != 1.0  # nutch.score=2.i preserved
        assert json.loads(row["metadata"])["key"] == "value"


def test_bootstrap_ds_matches_bootstrap(tmp_path, ray_session):
    """bootstrap_ds (distributed gen-0 install) produces the same
    generation-0 table, manifest row counts and seen shards as the
    driver-side bootstrap."""
    import ray.data as rd

    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.pipelines.crawl import CrawlDriver
    from coherencebot_ray.sources.synth import synth_frontier

    cfg = CrawlConfig(num_partitions=4)
    table = synth_frontier(300, 9, cfg)

    a = CrawlDriver(str(tmp_path / "a"), cfg)
    a.bootstrap(table)
    b = CrawlDriver(str(tmp_path / "b"), cfg)
    b.bootstrap_ds(rd.from_arrow(table))

    ta = a.store.read_table(0).to_pandas().sort_values("url").reset_index(drop=True)
    tb = b.store.read_table(0).to_pandas().sort_values("url").reset_index(drop=True)
    assert ta[["url", "part", "status", "score"]].equals(
        tb[["url", "part", "status", "score"]])
    ma, mb = a.store.manifest(0), b.store.manifest(0)
    rows_a = {p: v["rows"] for p, v in ma["partitions"].items()}
    rows_b = {p: v["rows"] for p, v in mb["partitions"].items()}
    assert rows_a == rows_b


def test_synth_frontier_ds_distributed_bootstrap(tmp_path, ray_session):
    """synth_frontier_ds generates the frontier in chunked tasks (no
    driver materialization) with unique urls, the frontier schema, and
    deterministic content; bootstrap_ds splits a mega-host partition
    into url-hash subshards like write_generation does."""
    import glob

    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.model import FRONTIER_SCHEMA
    from coherencebot_ray.pipelines.crawl import CrawlDriver
    from coherencebot_ray.sources.synth import synth_frontier_ds

    cfg = CrawlConfig(num_partitions=4, skew_split_rows=200)
    ds = synth_frontier_ds(1000, 20, cfg, chunk_rows=300)
    t = ds.to_pandas()
    assert len(t) == 1000
    assert t["url"].nunique() == 1000
    assert set(t["part"].unique()) <= set(range(4))
    # deterministic: a second build yields the identical table
    t2 = synth_frontier_ds(1000, 20, cfg, chunk_rows=300).to_pandas()
    assert t.sort_values("url").reset_index(drop=True).equals(
        t2.sort_values("url").reset_index(drop=True))

    d = CrawlDriver(str(tmp_path / "w"), cfg)
    stats = d.bootstrap_ds(synth_frontier_ds(1000, 20, cfg, chunk_rows=300))
    back = d.store.read_table(0)
    assert back.num_rows == 1000
    assert back.schema.equals(FRONTIER_SCHEMA)
    # Zipf host 0 dominates -> its partition exceeds skew_split_rows and
    # must be written as multiple url-hash subshard files
    sizes = {p: v["rows"] for p, v in d.store.manifest(0)["partitions"].items()}
    big = max(sizes, key=sizes.get)
    assert sizes[big] > 200
    files = glob.glob(str(tmp_path / "w" / "frontier" / "gen=000000" / f"part={big}" / "data-*.parquet"))
    assert len(files) >= 2
    assert stats["partitions"]


def test_apply_dedup_marks_partition_merge_back(tmp_path, ray_session):
    """CrawlDriver.apply_dedup_marks commits duplicate marks as a new
    generation by rewriting ONLY the touched partitions; untouched
    partitions inherit the parent generation's files, url-only marks
    derive their partition, and a no-hit mark set commits nothing."""
    import numpy as np
    import ray.data as rd

    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.model import CrawlStatus as CS, frontier_table_from_pandas
    from coherencebot_ray.pipelines.crawl import CrawlDriver
    from coherencebot_ray.sources.synth import synth_frontier

    cfg = CrawlConfig(num_partitions=4)
    t = synth_frontier(200, 8, cfg).to_pandas()
    t["status"] = np.uint8(CS.DB_FETCHED)
    d = CrawlDriver(str(tmp_path / "w"), cfg)
    d.bootstrap(frontier_table_from_pandas(t))

    one_part = int(t["part"].iloc[0])
    marks = t[t["part"] == one_part][["url", "part"]].head(5)
    res = d.apply_dedup_marks(rd.from_pandas(marks))
    assert res == {"gen": 1, "duplicates_marked": 5}
    back = d.store.read_table(1).to_pandas().set_index("url")
    assert (back.loc[marks["url"], "status"] == CS.DB_DUPLICATE).all()
    assert len(back) == 200
    man = d.store.manifest(1)
    for p, ent in man["partitions"].items():
        if not ent["files"]:
            continue
        rewritten = ent["files"][0].startswith("gen=000001")
        assert rewritten == (int(p) == one_part)

    # url-only marks (the doc-dedup shape): part derived from the url
    more = t[t["part"] != one_part][["url"]].head(3)
    res2 = d.apply_dedup_marks(rd.from_pandas(more))
    assert res2 == {"gen": 2, "duplicates_marked": 3}

    # marks that hit nothing (already-duplicate rows): no commit
    res3 = d.apply_dedup_marks(rd.from_pandas(marks))
    assert res3 == {"gen": 2, "duplicates_marked": 0}
    assert d.store.latest_gen() == 2
    assert not os.path.exists(os.path.join(
        str(tmp_path / "w"), "frontier", "gen=000003.tmp"))


def test_interleaved_media_round(tmp_path, ray_session):
    """Interleaved text+media crawl (the north-star payload shape): with
    the fake protocol's media mode on, a full round produces doc rows
    whose span sequences are single media spans with probed width/
    height metadata, side by side with text docs — and the segment's
    content part round-trips the binary payloads through the indexer
    binary-content join."""
    import json

    import pyarrow.parquet as pq

    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.pipelines.crawl import CrawlDriver
    from coherencebot_ray.sources.fake_protocol import FakeProtocol

    cfg = CrawlConfig(num_partitions=4, topn=2000, server_delay_s=0.0)
    d = CrawlDriver(str(tmp_path / "m"), cfg,
                    protocol=FakeProtocol(media_pct=30))
    d.inject([f"http://host{h}.example/doc/{h}" for h in range(40)], EPOCH)
    d.run_round(EPOCH + 1_000_000)
    seg = d.seg_dir(d.store.latest_gen())
    docs = pq.read_table(
        sorted(__import__("glob").glob(f"{seg}/docs/part-*/*.parquet")),
    ).to_pandas()
    spans_kinds = docs["spans"].map(
        lambda ss: tuple(s["kind"] for s in ss))
    media_docs = docs[spans_kinds.map(lambda k: k == ("media",))]
    text_docs = docs[spans_kinds.map(lambda k: "text" in k or "title" in k)]
    assert len(media_docs) > 0 and len(text_docs) > 0
    # media docs carry probe metadata through crawl_parse -> updatedb
    cp = pq.read_table(
        sorted(__import__("glob").glob(f"{seg}/crawl_parse/part-*/*.parquet")),
    ).to_pandas()
    metas = [json.loads(m) for m in cp["metadata"].dropna()]
    dims = [m for m in metas if "width" in m or "audio.rate" in m]
    assert dims and all(
        int(m.get("width", 1)) > 0 and int(m.get("height", 1)) > 0
        for m in dims if "width" in m)
    # content part holds the binary payloads for the media urls
    content = pq.read_table(
        sorted(__import__("glob").glob(f"{seg}/content/part-*/*.parquet")),
    ).to_pandas().set_index("url")
    u = media_docs.iloc[0]["url"]
    raw = bytes(content.loc[u, "content"])
    assert raw[:6] in (b"GIF89a", b"RIFF" + raw[4:6])
