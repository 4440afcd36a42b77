"""Inject: seed parsing and the inject merge kernel.

Reference semantics (crawl/Injector.java):
- seed line format ``url[\\t k=v]*``; blank / ``#`` lines skipped
  (Injector.java:209-243); reserved metadata keys ``nutch.score``,
  ``nutch.fetchInterval``, ``nutch.fetchInterval.fixed``
  (Injector.java:92-103).
- merge rules (Injector.java:292-348 / NUTCH-1405):
  only-new -> injected (as DB_UNFETCHED); only-old -> old; both ->
  old unless ``overwrite``; ``update`` merges metadata and non-default
  score/interval into old.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ..config import CrawlConfig
from ..model import CrawlStatus as CS

RESERVED_SCORE = "nutch.score"
RESERVED_INTERVAL = "nutch.fetchInterval"
RESERVED_FIXED_INTERVAL = "nutch.fetchInterval.fixed"


def parse_seed_lines(lines: list[str], cfg: CrawlConfig, cur_time_ms: int) -> pd.DataFrame:
    """Parse raw seed lines to injected-datum rows (pre-normalize/filter).

    Returns columns: url, status(INJECTED), fetch_time, retries,
    fetch_interval, score, fixed_interval, metadata.
    """
    urls, scores, intervals, fixeds, metas = [], [], [], [], []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        url = parts[0].strip()
        if not url:
            continue
        score = cfg.score_injected
        interval = cfg.interval_default
        fixed = 0
        meta: dict[str, str] = {}
        for kv in parts[1:]:
            if "=" not in kv:
                continue
            k, v = kv.split("=", 1)
            k, v = k.strip(), v.strip()
            if k == RESERVED_SCORE:
                try:
                    score = float(v)
                except ValueError:
                    pass
            elif k == RESERVED_INTERVAL:
                try:
                    interval = int(float(v))
                except ValueError:
                    pass
            elif k == RESERVED_FIXED_INTERVAL:
                try:
                    fixed = int(float(v))
                    interval = fixed
                except ValueError:
                    pass
            else:
                meta[k] = v
        urls.append(url)
        scores.append(score)
        intervals.append(interval)
        fixeds.append(fixed)
        metas.append(json.dumps(meta, sort_keys=True) if meta else None)
    return pd.DataFrame(
        {
            "url": urls,
            "status": CS.INJECTED,
            "fetch_time": cur_time_ms,
            "retries": 0,
            "fetch_interval": np.array(intervals, dtype=np.int64),
            "score": np.array(scores, dtype=np.float32),
            "signature": None,
            "modified_time": 0,
            "gen_time": 0,
            "repr_url": None,
            "fixed_interval": np.array(fixeds, dtype=np.int64),
            "metadata": metas,
        }
    )


def inject_merge(
    combined: pd.DataFrame, cfg: CrawlConfig
) -> pd.DataFrame:
    """Merge injected rows (status==INJECTED) with existing frontier rows.

    Vectorized over one partition: split by status, outer-join on url,
    apply rules 1/2/3a/3b (Injector.java:292-348). Injected winners become
    DB_UNFETCHED.
    """
    is_new = combined["status"].to_numpy() == CS.INJECTED
    inj = combined[is_new]
    old = combined[~is_new]
    # dedupe injected per url (last wins, like reduce loop overwriting)
    if not inj["url"].is_unique:
        inj = inj[~inj["url"].duplicated(keep="last")]
    if len(old) and not old["url"].is_unique:
        old = old[~old["url"].duplicated(keep="last")]

    inj = inj.set_index("url", drop=False)
    old = old.set_index("url", drop=False)
    both = inj.index.intersection(old.index)

    if cfg.inject_overwrite:
        winners_new = inj.copy()
        losers_old = old.drop(both, errors="ignore")
        out = pd.concat([_as_unfetched(winners_new), losers_old], ignore_index=True)
        return out.reset_index(drop=True)

    new_only = inj.drop(both, errors="ignore")
    result_old = old.copy()
    if cfg.inject_update and len(both):
        o = result_old.loc[both]
        n = inj.loc[both]
        # metadata: old overlaid by injected
        merged_meta = []
        for om, nm in zip(o["metadata"].to_numpy(), n["metadata"].to_numpy()):
            if not nm:
                merged_meta.append(om)
            elif not om:
                merged_meta.append(nm)
            else:
                d = json.loads(om)
                d.update(json.loads(nm))
                merged_meta.append(json.dumps(d, sort_keys=True))
        result_old.loc[both, "metadata"] = merged_meta
        n_score = n["score"].to_numpy(dtype=np.float32)
        result_old.loc[both, "score"] = np.where(
            n_score != np.float32(cfg.score_injected), n_score, o["score"].to_numpy(dtype=np.float32)
        )
        n_itv = n["fetch_interval"].to_numpy()
        result_old.loc[both, "fetch_interval"] = np.where(
            n_itv != cfg.interval_default, n_itv, o["fetch_interval"].to_numpy()
        )
        result_old.loc[both, "fixed_interval"] = np.where(
            n["fixed_interval"].to_numpy() > 0,
            n["fixed_interval"].to_numpy(),
            o["fixed_interval"].to_numpy(),
        )
    out = pd.concat([_as_unfetched(new_only), result_old], ignore_index=True)
    return out.reset_index(drop=True)


def _as_unfetched(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["status"] = CS.DB_UNFETCHED
    return df
