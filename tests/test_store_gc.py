"""FrontierStore generation GC: old unreferenced files go, carried-
forward files survive, kept generations stay fully readable
(CrawlDb current/old rotation analogue, CrawlDb.java:209-224)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from coherencebot_ray.model import frontier_table_from_pandas
from coherencebot_ray.state.frontier_store import FrontierStore


def _rows(part, n, tag):
    return frontier_table_from_pandas(pd.DataFrame(
        {
            "url": [f"http://h{part}.com/{tag}/{i}" for i in range(n)],
            "host": f"h{part}.com",
            "domain": f"h{part}.com",
            "part": np.int32(part),
            "status": np.int64(1),
            "fetch_time": np.int64(1),
            "retries": np.int64(0),
            "fetch_interval": np.int64(86400),
            "score": np.float32(1.0),
            "signature": None,
            "modified_time": np.int64(0),
            "gen_time": np.int64(0),
            "repr_url": None,
            "fixed_interval": np.int64(0),
            "metadata": None,
        }
    ))


def test_store_gc(tmp_path):
    st = FrontierStore(str(tmp_path / "f"), num_partitions=3)
    st.write_generation({0: _rows(0, 5, "g0"), 1: _rows(1, 5, "g0"), 2: _rows(2, 5, "g0")}, gen=0)
    # gen1 touches only part 0; parts 1,2 carried forward from gen0
    st.write_generation({0: _rows(0, 6, "g1")}, gen=1, parent_gen=0)
    # gen2 touches part 1; part 2 STILL carried from gen0
    st.write_generation({1: _rows(1, 7, "g2")}, gen=2, parent_gen=1)
    # gen3 touches part 0
    st.write_generation({0: _rows(0, 8, "g3")}, gen=3, parent_gen=2)

    res = st.gc(keep_gens=2)  # keep gens 2 and 3
    assert res["kept_gens"] == 2
    # gen0 dir survives (part 2's file still referenced by gen2/3), but
    # its superseded part-0/part-1 files are gone
    assert os.path.exists(st._gen_dir(0))
    assert not os.path.exists(os.path.join(st._gen_dir(0), "part=0", "data-0.parquet"))
    assert not os.path.exists(os.path.join(st._gen_dir(0), "part=1", "data-0.parquet"))
    assert os.path.exists(os.path.join(st._gen_dir(0), "part=2", "data-0.parquet"))
    # gen1 survives too: kept gen2's manifest carries part 0 from gen1
    assert os.path.exists(os.path.join(st._gen_dir(1), "part=0", "data-0.parquet"))
    # kept generations fully readable with correct carried-forward data
    t3 = st.read_table(3)
    df = t3.to_pandas()
    assert len(df) == 8 + 7 + 5  # part0 g3, part1 g2, part2 g0
    assert set(df[df["part"] == 2]["url"].str.contains("/g0/")) == {True}
    t2 = st.read_table(2)
    assert len(t2.to_pandas()) == 6 + 7 + 5  # gen2 still fully readable
    # removed: gen0 part0+part1 data + their .seen shards
    assert res["removed_files"] >= 4

    # a second, tighter gc after more progress prunes the rest
    st.write_generation({0: _rows(0, 9, "g4"), 1: _rows(1, 9, "g4"), 2: _rows(2, 9, "g4")}, gen=4, parent_gen=3)
    res2 = st.gc(keep_gens=1)
    assert not os.path.exists(st._gen_dir(0))
    assert not os.path.exists(st._gen_dir(1))
    assert len(st.read_table(4).to_pandas()) == 27
