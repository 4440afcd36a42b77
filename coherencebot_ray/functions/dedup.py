"""Exact-dedup winner selection (DeduplicationJob analogue).

Reference: crawl/DeduplicationJob.java:124-229 — per signature group, a
sequential fold compares the incumbent against each candidate using the
configured compare order (default ``httpsOverHttp,score,fetchTime,
urlLength``); the loser is marked STATUS_DB_DUPLICATE. A fully-tied pair
yields *no* decision (neither marked), so this is a fold, not a sort —
we reproduce the fold exactly.
"""

from __future__ import annotations

from urllib.parse import unquote

import numpy as np
import pandas as pd


def _decide(ex: tuple, new: tuple, compare_order: tuple) -> int:
    """Return -1 to mark existing duplicate, +1 to mark new, 0 no decision.

    Tuples: (url, score, fetch_time).
    """
    for crit in compare_order:
        if crit == "score":
            if ex[1] < new[1]:
                return -1
            if ex[1] > new[1]:
                return 1
        elif crit == "fetchTime":
            if ex[2] > new[2]:
                return 1  # keep newest: older 'new'... existing newer -> new is dup
            if ex[2] < new[2]:
                return -1
        elif crit == "httpsOverHttp":
            u1, u2 = ex[0], new[0]
            if u1.startswith("https://") and u2.startswith("http://") and u1[8:] == u2[7:]:
                return 1
            if u2.startswith("https://") and u1.startswith("http://") and u2[8:] == u1[7:]:
                return -1
        elif crit == "urlLength":
            l1, l2 = len(unquote(ex[0])), len(unquote(new[0]))
            if l1 < l2:
                return 1
            if l1 > l2:
                return -1
    return 0


def mark_duplicates_in_group(
    urls: np.ndarray,
    scores: np.ndarray,
    fetch_times: np.ndarray,
    compare_order: tuple = ("httpsOverHttp", "score", "fetchTime", "urlLength"),
) -> np.ndarray:
    """Boolean mask of rows to mark STATUS_DB_DUPLICATE, via the exact
    sequential fold of DedupReducer.reduce (DeduplicationJob.java:145-165)."""
    n = len(urls)
    dup = np.zeros(n, dtype=bool)
    if n <= 1:
        return dup
    cur = 0
    for i in range(1, n):
        ex = (urls[cur], scores[cur], fetch_times[cur])
        nw = (urls[i], scores[i], fetch_times[i])
        d = _decide(ex, nw, compare_order)
        if d == 1:
            dup[i] = True
        elif d == -1:
            dup[cur] = True
            cur = i
        # d == 0: no decision, incumbent stays, nothing marked
    return dup


def dedup_group_df(g: pd.DataFrame, compare_order: tuple) -> pd.DataFrame:
    """map_groups body: returns (url, is_duplicate) for one signature group."""
    mask = mark_duplicates_in_group(
        g["url"].to_numpy(),
        g["score"].to_numpy(dtype=np.float32),
        g["fetch_time"].to_numpy(dtype=np.int64),
        compare_order,
    )
    return pd.DataFrame({"url": g["url"].to_numpy(), "is_duplicate": mask})
