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


def test_split_generate_mixed_null_pst_cand_files(tmp_path, ray_session):
    """Round-2 rehearsal crash regression: the split (mega-partition)
    generate path writes per-subshard candidate files; a subshard whose
    eligible rows all carry NULL pst must not be typed as Arrow null —
    the selector reads all cand files together and a null/string schema
    merge raises ArrowNotImplementedError (cast_null). Candidates are
    written with the explicit frontier schema."""
    import pandas as pd
    import pyarrow.parquet as pq

    from coherencebot_ray.model import CrawlStatus as CS
    from coherencebot_ray.pipelines.crawl import _GenScanTask, _GenSelectTask

    cfg = CrawlConfig(num_partitions=2, topn=100, server_delay_s=0.0)

    def frontier_file(path, n, pst):
        t = synth_frontier(n, 2, cfg).to_pandas()
        t["part"] = 0
        t["pst"] = pst
        os.makedirs(os.path.dirname(path), exist_ok=True)
        import pyarrow as pa

        from coherencebot_ray.model import frontier_table_from_pandas

        pq.write_table(frontier_table_from_pandas(t), path)
        return path

    f0 = frontier_file(str(tmp_path / "part=0/data-0.parquet"), 40, None)
    f1 = frontier_file(str(tmp_path / "part=0/data-1.parquet"), 40, "success")

    cand_dir, fl_dir = str(tmp_path / "cand"), str(tmp_path / "fl")
    scan = _GenScanTask(cfg, EPOCH, 100, cand_dir, None, False)
    scan(pd.DataFrame({"part": [0, 0], "fidx": [0, 1], "file": [f0, f1]}))
    sel = _GenSelectTask(cfg, EPOCH, EPOCH, 100, cand_dir, fl_dir, None)
    out = sel(pd.DataFrame({"part": [0]}))  # raised ArrowNotImplementedError before
    assert int(out["selected"].iloc[0]) > 0
