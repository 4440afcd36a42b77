"""Skew splitting: a hot partition's updatedb shards by url hash; the
frontier stays complete and unique across rounds with growing/shrinking
subshard counts (the north-rule mega-host handling)."""

import glob
import os

import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.pipelines.crawl import CrawlDriver
from coherencebot_ray.sources.synth import EPOCH, synth_frontier


def test_subsharded_updatedb_is_lossless(tmp_path, ray_session):
    # skew_split_rows tiny => every partition splits into subshards
    cfg = CrawlConfig(num_partitions=2, topn=400, server_delay_s=0.0, skew_split_rows=40)
    d = CrawlDriver(str(tmp_path / "c"), cfg)
    d.bootstrap(synth_frontier(400, 3, cfg))  # few hosts => heavy skew
    m1 = d.run_round(EPOCH)
    files = glob.glob(os.path.join(d.store.root, "gen=000001", "part=*", "data-*.parquet"))
    assert len(files) > 2, "expected multiple subshard files"
    t1 = d.store.read_table(1).to_pandas()
    assert t1["url"].is_unique
    orig = set(synth_frontier(400, 3, cfg).column("url").to_pylist())
    assert orig <= set(t1["url"]), "subsharding lost frontier rows"

    # round 2 re-reads subsharded partitions (growth/shrink paths)
    m2 = d.run_round(EPOCH + 40 * 86400 * 1000)
    t2 = d.store.read_table(2).to_pandas()
    assert t2["url"].is_unique
    assert set(t1["url"]) <= set(t2["url"])


def test_subsharded_equals_unsharded(tmp_path, ray_session):
    """Same crawl with and without skew splitting -> identical frontier."""
    results = []
    for name, split in (("a", 10_000_000), ("b", 50)):
        cfg = CrawlConfig(num_partitions=2, topn=300, server_delay_s=0.0, skew_split_rows=split)
        d = CrawlDriver(str(tmp_path / name), cfg)
        d.bootstrap(synth_frontier(300, 4, cfg))
        d.run_round(EPOCH)
        t = d.store.read_table(1).to_pandas().sort_values("url").reset_index(drop=True)
        results.append(t)
    a, b = results
    assert list(a["url"]) == list(b["url"])
    assert list(a["status"]) == list(b["status"])
    assert list(a["fetch_time"]) == list(b["fetch_time"])
    assert [round(float(x), 5) for x in a["score"]] == [round(float(x), 5) for x in b["score"]]
