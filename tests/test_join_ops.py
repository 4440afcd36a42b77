"""Temporal join ops (ops/join.py): as-of join and interval range join
verified against pandas merge_asof / brute-force nested loops on random
keyed event logs, plus boundary-tie and empty-side edge cases."""

import numpy as np
import pandas as pd
import pytest

from coherencebot_ray.ops.join import (
    _same_key_build_counts,
    asof_join,
    range_join_pairs,
    ts_epoch_us,
)


def _mk(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df.copy())


def _rand_log(seed: int, n: int, n_keys: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01").value // 1000 + rng.choice(
        np.arange(0, 10**9, 7, dtype=np.int64), size=n, replace=False
    )
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, n_keys, n),
            "ts": pd.to_datetime(ts, unit="us"),
            "eid": np.arange(n, dtype=np.int64),
        }
    )


def test_same_key_build_counts_kernel():
    bu = np.array([1, 1, 1, 2, 5])
    bt = np.array([10, 20, 30, 10, 99])
    pu = np.array([1, 1, 2, 3, 5])
    pk = np.array([20, 5, 10, 50, 99])
    # inclusive: bt <= pk
    cnt, base = _same_key_build_counts(bu, bt, pu, pk, inclusive=True)
    assert cnt.tolist() == [2, 0, 1, 0, 1]
    assert base.tolist() == [0, 0, 3, 4, 4]
    # exclusive: bt < pk
    cnt, _ = _same_key_build_counts(bu, bt, pu, pk, inclusive=False)
    assert cnt.tolist() == [1, 0, 0, 0, 0]


def test_asof_matches_pandas_merge_asof(ray_session):
    probe = _rand_log(7, 400, 12)
    build = _rand_log(8, 300, 12).rename(columns={"eid": "bid"})
    got = (
        asof_join(
            _mk(probe),
            _mk(build),
            probe_payload={"eid": "int64"},
            build_payload={"bid": "int64"},
            n_buckets=8,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        probe.sort_values("ts"),
        build.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
    ).dropna(subset=["bid"])
    exp = exp.sort_values("eid").reset_index(drop=True)
    assert got["eid"].tolist() == exp["eid"].tolist()
    assert got["bid"].tolist() == exp["bid"].astype(np.int64).tolist()
    # lag arithmetic exact in microseconds
    m = build.set_index("bid")["ts"]
    lag = ts_epoch_us(exp["ts"]) - ts_epoch_us(exp["bid"].astype(np.int64).map(m))
    assert got["lag_us"].tolist() == lag.tolist()


def test_asof_tie_inclusive(ray_session):
    t0 = pd.Timestamp("2024-01-01 00:00:10")
    probe = pd.DataFrame({"user_id": [1], "ts": [t0], "eid": [0]})
    build = pd.DataFrame(
        {"user_id": [1, 1], "ts": [t0 - pd.Timedelta(seconds=5), t0], "bid": [10, 11]}
    )
    got = asof_join(
        _mk(probe), _mk(build),
        probe_payload={"eid": "int64"}, build_payload={"bid": "int64"},
    ).to_pandas()
    # equal-ts build matches (backward as-of is <=), lag 0
    assert got["bid"].tolist() == [11] and got["lag_us"].tolist() == [0]


def test_asof_unmatched_probe_drops(ray_session):
    probe = pd.DataFrame(
        {"user_id": [1, 2], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]), "eid": [0, 1]}
    )
    build = pd.DataFrame(
        {"user_id": [2], "ts": pd.to_datetime(["2024-01-03"]), "bid": [9]}
    )
    got = asof_join(
        _mk(probe), _mk(build),
        probe_payload={"eid": "int64"}, build_payload={"bid": "int64"},
    ).to_pandas()
    assert len(got) == 0  # user 1 has no builds; user 2's build is later


def test_range_join_matches_bruteforce(ray_session):
    probe = _rand_log(3, 250, 9)
    build = _rand_log(4, 250, 9).rename(columns={"eid": "bid"})
    w = 120  # seconds
    got = (
        range_join_pairs(
            _mk(probe), _mk(build), window_s=w,
            probe_payload={"eid": "int64"}, build_payload={"bid": "int64"},
            n_buckets=8,
        )
        .to_pandas()
        .sort_values(["eid", "bid"])
        .reset_index(drop=True)
    )
    pt = ts_epoch_us(probe["ts"])
    bt = ts_epoch_us(build["ts"])
    exp = []
    for i in range(len(probe)):
        for j in range(len(build)):
            if probe["user_id"][i] == build["user_id"][j] and (
                pt[i] - w * 10**6 <= bt[j] < pt[i]
            ):
                exp.append((probe["eid"][i], build["bid"][j], pt[i] - bt[j]))
    exp.sort()
    assert list(zip(got["eid"], got["bid"], got["lag_us"])) == exp


def test_range_join_window_boundaries(ray_session):
    t0 = pd.Timestamp("2024-01-01 01:00:00")
    probe = pd.DataFrame({"user_id": [1], "ts": [t0], "eid": [0]})
    build = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1],
            "ts": [
                t0 - pd.Timedelta(seconds=60),  # exactly at lower bound: IN
                t0 - pd.Timedelta(seconds=30),  # inside
                t0,  # upper bound (exclusive): OUT
                t0 - pd.Timedelta(seconds=61),  # below window: OUT
            ],
            "bid": [1, 2, 3, 4],
        }
    )
    got = range_join_pairs(
        _mk(probe), _mk(build), window_s=60,
        probe_payload={"eid": "int64"}, build_payload={"bid": "int64"},
    ).to_pandas()
    assert sorted(got["bid"].tolist()) == [1, 2]


def test_payload_name_clash_rejected(ray_session):
    df = pd.DataFrame({"user_id": [1], "ts": [pd.Timestamp("2024-01-01")], "eid": [0]})
    with pytest.raises(ValueError):
        asof_join(_mk(df), _mk(df), probe_payload={"eid": "int64"},
                  build_payload={"eid": "int64"})
