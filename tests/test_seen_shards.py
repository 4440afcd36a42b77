"""Cuckoo URL-seen shard integration: persisted per partition subshard,
rebuildable, consulted by the fetch stage for redirect dedup."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from coherencebot_ray.config import CrawlConfig
from coherencebot_ray.pipelines.crawl import CrawlDriver
from coherencebot_ray.sources.synth import EPOCH, synth_frontier
from coherencebot_ray.state.cuckoo import CuckooFilter

CFG = CrawlConfig(num_partitions=4, topn=300, server_delay_s=0.0)


def test_seen_shards_written_and_consistent(tmp_path, ray_session):
    d = CrawlDriver(str(tmp_path / "c"), CFG)
    d.bootstrap(synth_frontier(300, 12, CFG))
    # bootstrap writes shards alongside gen 0 parquet
    g0 = glob.glob(os.path.join(d.store.root, "gen=000000", "part=*", "*.seen"))
    assert g0, "bootstrap should persist seen shards"
    d.run_round(EPOCH)
    shards = glob.glob(os.path.join(d.store.root, "gen=000001", "part=*", "*.seen"))
    assert shards, "updatedb should persist seen shards"
    # every shard contains exactly its sibling parquet's urls
    for sf in shards:
        cf = CuckooFilter.from_bytes(open(sf, "rb").read())
        urls = pq.read_table(sf.replace(".seen", ".parquet"), partitioning=None).column("url").to_pylist()
        assert cf.contains_many(urls).all()
    # shard is REBUILDABLE from the parquet alone (resume path)
    sf = shards[0]
    urls = pq.read_table(sf.replace(".seen", ".parquet"), partitioning=None).column("url").to_pylist()
    rebuilt = CuckooFilter(capacity=max(1024, 2 * len(urls)))
    rebuilt.add_many(urls)
    assert rebuilt.contains_many(urls).all()


def test_round2_results_unchanged_by_seen_dedup(tmp_path, ray_session):
    """Dropping seen redirect-discovery rows must not change the frontier
    (membership and scores are unaffected by score-0 LINKED dedup)."""
    d = CrawlDriver(str(tmp_path / "c2"), CFG)
    d.bootstrap(synth_frontier(300, 12, CFG))
    d.run_round(EPOCH)
    t1 = d.store.read_table(1).to_pandas()
    d.run_round(EPOCH + 40 * 86400 * 1000)
    t2 = d.store.read_table(2).to_pandas()
    assert t2["url"].is_unique
    assert set(t1["url"]) <= set(t2["url"])
