"""Stream-shaped operators over the events log (event_id, ts, user_id,
event_type, value): tumbling-window aggregates and session windows.

Ray Data has no event-time windowing; per the ordered-partitioned-log
pattern these are groupby(key).map_groups over ts-sorted groups, with a
per-batch partial combine for the tumbling case (pure group-algebra)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def ts_epoch_seconds(s: pd.Series) -> np.ndarray:
    """Timestamp column -> int64 epoch seconds (unit-safe: pandas may
    carry datetime64[us] from parquet; int64-of-datetime is unit-relative)."""
    return (
        pd.to_datetime(s).astype("datetime64[ns]").astype("int64") // 10**9
    ).to_numpy()


def tumbling_agg(events_ds, window_s: int = 3600):
    """Per (user_id, window) count + sum(value): per-batch partial
    combine, then a bucketed final combine (ops/agg.py)."""
    from .agg import bucketed_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sec = ts_epoch_seconds(df["ts"])
        bucket = (sec // window_s) * window_s  # epoch s
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "window_start": bucket,
                "n_events": 1,
                "value_sum": df["value"].to_numpy(),
            }
        )

    partials = events_ds.map_batches(partial, batch_format="pandas")
    return bucketed_sum(partials, ["user_id", "window_start"], ["n_events", "value_sum"])


def sessionize(events_ds, gap_s: int = 1800):
    """Session windows per user (new session when gap > gap_s).

    Bucketed by user hash; inside a bucket the session assignment is
    fully vectorized across users (sort by (user, ts), new session when
    user changes or gap > gap_s). Emits one row per session:
    (user_id, session_start, session_end, n_events, value_sum).
    Partitioning assumption: all events of a user land in one bucket
    (guaranteed by hashing the user id)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        tsv = ts_epoch_seconds(g["ts"])
        users = g["user_id"].to_numpy()
        new_session = np.r_[
            True, (users[1:] != users[:-1]) | ((tsv[1:] - tsv[:-1]) > gap_s)
        ]
        sid = np.cumsum(new_session)
        gg = g.assign(_sid=sid, _ts=tsv).groupby("_sid", sort=True)
        return pd.DataFrame(
            {
                "user_id": gg["user_id"].first().to_numpy(),
                "session_start": gg["_ts"].min().to_numpy(),
                "session_end": gg["_ts"].max().to_numpy(),
                "n_events": gg.size().to_numpy(),
                "value_sum": np.round(gg["value"].sum().to_numpy(), 6),
            }
        )

    from .agg import bucketed_group_apply

    return bucketed_group_apply(events_ds, "user_id", per_bucket)


def sliding_window_counts(events_ds, window_s: int = 3600, slide_s: int = 900):
    """Sliding windows as an explode-to-covering-windows flat map + one
    groupby (each event lands in window_s/slide_s windows)."""
    k = window_s // slide_s

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ts = ts_epoch_seconds(df["ts"])
        base = (ts // slide_s) * slide_s
        frames = []
        for i in range(k):
            w = base - i * slide_s
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": df["user_id"].to_numpy(),
                        "window_start": w,
                        "n": 1,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    from .agg import bucketed_sum

    exploded = events_ds.map_batches(explode, batch_format="pandas")
    out = bucketed_sum(exploded, ["user_id", "window_start"], ["n"])
    return out.map_batches(
        lambda df: df.rename(columns={"n": "n_events"}), batch_format="pandas"
    )


def latest_per_key(events_ds, key_col: str = "user_id",
                   order_cols: tuple = ("ts", "event_id"),
                   keep_cols: tuple = ("event_id", "event_type"),
                   n_buckets: int = 64):
    """Latest-record-per-key — the log-compaction / SCD-current-state
    primitive (Kafka compacted topics, CDC snapshotting): for every key
    keep exactly the row that is maximal under ``order_cols``
    (lexicographic, later wins; the id column breaks timestamp ties
    deterministically).

    Scale shape: each batch pre-combines to ONE candidate row per key
    (vectorized sort + groupby-tail, no Python loop), so the single
    key-hash exchange moves at most |keys-per-batch| rows — at 10^10
    events with a bounded key universe the exchange is key-cardinality-
    sized, never event-sized. The per-bucket fold repeats the same
    argmax over the candidates. Returns (key_col, *keep_cols).
    """
    from .agg import bucketed_group_apply

    ocols = list(order_cols)
    cols = [key_col] + ocols + [c for c in keep_cols if c not in ocols
                                and c != key_col]

    def argmax_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df[cols].sort_values([key_col] + ocols, kind="stable")
        return d.groupby(key_col, sort=False).tail(1)

    partials = events_ds.map_batches(argmax_rows, batch_format="pandas")
    out = bucketed_group_apply(partials, key_col, argmax_rows,
                               n_buckets=n_buckets)
    keep = [key_col] + list(keep_cols)
    return out.map_batches(lambda df: df[keep], batch_format="pandas")


def funnel_stages(events_ds, stages=("view", "click", "purchase"),
                  key_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type", n_buckets: int = 64):
    """Ordered funnel analysis — for each key, the earliest time each
    stage was reached STRICTLY AFTER the previous stage (the product-
    analytics conversion primitive: view -> click -> purchase). A stage
    is reached at min ts among its events later than the prior stage's
    reach time; missing stages (and everything after them) report -1.

    Scale shape: ONE key-hash exchange co-locates each key's events;
    inside a bucket the whole stage chain is vectorized (masked
    per-key transform-min per stage — no per-user Python). The
    exchange moves (key, ts, type) triples only, never payloads.
    Returns (key_col, <stage>_us... , converted) with epoch-us int64
    times and converted = 1 iff the last stage was reached.
    """
    from .agg import bucketed_group_apply

    SENTINEL = np.iinfo(np.int64).max

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        us = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        et = g[type_col].to_numpy()
        keys = g[key_col]
        reach = np.full(len(g), np.int64(-SENTINEL), dtype=np.int64)
        # reach starts "before everything": stage 0 has no predecessor
        out = pd.DataFrame({key_col: keys.drop_duplicates().to_numpy()})
        prev = None
        for s in stages:
            cand = np.where((et == s) & (us > reach), us, SENTINEL)
            t_s = (pd.Series(cand).groupby(keys.to_numpy(), sort=False)
                   .transform("min").to_numpy(np.int64))
            reach = t_s  # next stage must come strictly after this one
            firsts = (pd.DataFrame({key_col: keys.to_numpy(), "t": t_s})
                      .groupby(key_col, sort=False, as_index=False)["t"].min())
            out = out.merge(firsts.rename(columns={"t": f"{s}_us"}),
                            on=key_col, how="left")
        for s in stages:
            c = out[f"{s}_us"].to_numpy(np.int64)
            out[f"{s}_us"] = np.where(c == SENTINEL, np.int64(-1), c)
        out["converted"] = (out[f"{stages[-1]}_us"].to_numpy(np.int64)
                            != -1).astype(np.int64)
        return out

    return bucketed_group_apply(
        events_ds, key_col, per_bucket, n_buckets=n_buckets)
