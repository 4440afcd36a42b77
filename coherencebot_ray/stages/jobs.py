"""Auxiliary crawl-db jobs: dedup, invertlinks, hostdb, readdb, mergedb,
indexer join — each a small Ray Data pipeline over the frontier /
segment datasets.

References: DeduplicationJob.java:63-411, LinkDb.java, UpdateHostDb*,
CrawlDbReader.java:336-1115, CrawlDbMerger.java:66-239,
IndexerMapReduce.java:73-498.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import CrawlConfig
from ..functions.dedup import mark_duplicates_in_group
from ..functions.schedules import calculate_last_fetch_time
from ..functions.urlutil import domains_of
from ..model import CrawlStatus as CS

# ---------------------------------------------------------------------------
# J9 DeduplicationJob: shuffle by signature, fold winners, mark losers
# ---------------------------------------------------------------------------


def dedup(frontier_ds, cfg: CrawlConfig):
    """Returns the frontier with losers marked STATUS_DB_DUPLICATE.

    Two shuffles like the reference's two jobs (DeduplicationJob.java:63-411):
    groupby(signature-key) to decide, then groupby(part) merge-back.
    """
    group_mode = cfg.dedup_group_mode
    compare_order = cfg.dedup_compare_order

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        m = df["status"].isin([CS.DB_FETCHED, CS.DB_NOTMODIFIED]) & df["signature"].notna()
        d = df[m][["url", "host", "domain", "part", "score", "fetch_time", "signature"]].copy()
        if len(d) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype="object") for c in ["url", "part", "score", "fetch_time", "sig_key"]}
            )
        key = d["signature"].map(lambda b: bytes(b).hex())
        if group_mode == "host":
            key = key + "|" + d["host"].astype(str)
        elif group_mode == "domain":
            key = key + "|" + d["domain"].astype(str)
        d["sig_key"] = key
        return d[["url", "part", "score", "fetch_time", "sig_key"]]

    def decide_bucket(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized over all signature groups in the bucket
        outs = []
        for _, g in b.groupby("sig_key", sort=False):
            mask = mark_duplicates_in_group(
                g["url"].to_numpy(),
                g["score"].to_numpy(dtype=np.float32),
                g["fetch_time"].to_numpy(dtype=np.int64),
                compare_order,
            )
            if mask.any():
                d = g[mask]
                outs.append(pd.DataFrame({"url": d["url"].to_numpy(), "part": d["part"].to_numpy()}))
        if not outs:
            return pd.DataFrame({"url": pd.Series(dtype="object"), "part": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    from ..ops.agg import bucketed_group_apply

    keyed_ds = frontier_ds.map_batches(keyed, batch_format="pandas")
    return bucketed_group_apply(
        keyed_ds,
        "sig_key",
        decide_bucket,
        empty_schema=pa.schema([("url", pa.string()), ("part", pa.int64())]),
    )


def apply_duplicate_marks(frontier_ds, dups_ds):
    """Merge-back (StatusUpdateReducer analogue, DeduplicationJob.java
    StatusUpdateReducer): flip losers to DB_DUPLICATE.

    Distributed co-group — duplicate cardinality is corpus-scale (10-50%
    of a real crawl), so the mark set must NEVER materialize on the
    driver. Both sides shuffle once on hash(url); within a bucket the
    frontier rows whose url appears among that bucket's marks flip.

    The mark side is aligned to the frontier's exact column dtypes with
    typed filler values BEFORE the union: mismatched union schemas make
    Ray's block unification promote columns (uint8 status -> float64 via
    nulls), which is precisely the bug class behind the round-2 simhash
    failure. A one-row probe of the frontier supplies the dtypes."""
    from ..ops.agg import bucketed_group_apply

    try:
        probe = frontier_ds.take_batch(1, batch_format="pandas")
    except (ValueError, StopIteration):
        return frontier_ds  # empty frontier: nothing to mark
    front_cols = list(probe.columns)
    front_dtypes = {c: probe.dtypes[c] for c in front_cols}

    def tag_front(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["__t"] = np.zeros(len(d), dtype=np.int8)
        return d

    def tag_dup(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        cols = {}
        for c in front_cols:
            dt = front_dtypes[c]
            if c == "url":
                cols[c] = df["url"].astype(object).to_numpy()
            elif dt == np.dtype(object):
                cols[c] = np.array([None] * n, dtype=object)
            else:
                cols[c] = np.zeros(n, dtype=dt)
        out = pd.DataFrame(cols, columns=front_cols)
        out["__t"] = np.ones(n, dtype=np.int8)
        return out

    def mark_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g[g["__t"] == 0].drop(columns=["__t"])
        dup_urls = g.loc[g["__t"] == 1, "url"]
        if len(out) and len(dup_urls):
            hit = out["url"].isin(set(dup_urls)) & out["status"].isin(
                [CS.DB_FETCHED, CS.DB_NOTMODIFIED]
            )
            if hit.any():
                out = out.copy()
                out.loc[hit, "status"] = front_dtypes["status"].type(CS.DB_DUPLICATE)
        return out

    tagged = frontier_ds.map_batches(tag_front, batch_format="pandas").union(
        dups_ds.map_batches(tag_dup, batch_format="pandas")
    )
    from ..model import FRONTIER_SCHEMA

    known = set(FRONTIER_SCHEMA.names)
    empty_schema = (
        pa.schema([(c, FRONTIER_SCHEMA.field(c).type) for c in front_cols])
        if all(c in known for c in front_cols)
        else None
    )
    return bucketed_group_apply(tagged, "url", mark_bucket, empty_schema=empty_schema)


def doc_neardup_losers(docs_ds, threshold: float = 0.8, n_perm: int = 64,
                       n_bands: int = 8):
    """Document-level near-dup keep-one — the training-data analogue of
    J9's URL dedup (DeduplicationJob.java dedups on exact content
    signature; this catches NEAR duplicates the signature misses):
    minhash+LSH pairs over the parsed doc text -> connected components
    -> every non-representative member is a loser. Returns a Dataset of
    loser urls (column ``url``) ready for :func:`apply_duplicate_marks`.

    Winner = the component's minimum doc int id (deterministic; J9's
    score/fetch-time/url-length criteria need frontier fields the docs
    segment doesn't carry — at corpus scale what matters is keeping
    exactly one member per cluster). Ids are the url md5 low 63 bits;
    the (id, url) mapping is re-derived by a second pass of the same
    cheap prep scan, so losers map back to urls through one
    id-cardinality bucketed co-group, never a driver-side dict.
    """
    import hashlib

    from ..ops.agg import bucketed_group_apply
    from ..ops.dedup import connected_components, minhash_lsh_pairs

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "url": pd.Series(dtype="object"),
                 "text": pd.Series(dtype="object")})
        texts = [
            " ".join(s["text"] for s in spans if s.get("text"))
            if spans is not None and len(spans) else ""
            for spans in df["spans"]
        ]
        ids = np.array(
            [int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big") >> 1
             for u in df["url"]],
            dtype=np.int64,
        )
        return pd.DataFrame({
            "doc_id": ids,
            "url": df["url"].to_numpy(dtype=object),
            "text": np.array(texts, dtype=object),
        })

    prepped = docs_ds.map_batches(prep, batch_format="pandas")
    pairs = minhash_lsh_pairs(
        prepped, threshold=threshold, n_perm=n_perm, n_bands=n_bands)
    comp = connected_components(pairs)

    def tag_map(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": df["doc_id"].to_numpy(np.int64),
                             "url": df["url"].to_numpy(dtype=object),
                             "__t": np.int8(0)})

    def tag_loser(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["id"].to_numpy() != df["rep"].to_numpy()]
        return pd.DataFrame({"id": d["id"].to_numpy(np.int64),
                             "url": np.array([None] * len(d), dtype=object),
                             "__t": np.int8(1)})

    tagged = prepped.map_batches(tag_map, batch_format="pandas").union(
        comp.map_batches(tag_loser, batch_format="pandas"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        loser_ids = set(g.loc[g["__t"] == 1, "id"])
        if not loser_ids:
            return pd.DataFrame({"url": pd.Series(dtype="object")})
        m = g[(g["__t"] == 0) & g["id"].isin(loser_ids)]
        return pd.DataFrame({"url": m["url"].to_numpy(dtype=object)})

    return bucketed_group_apply(tagged, "id", pick)


# ---------------------------------------------------------------------------
# J10 LinkDb (invertlinks): outlinks -> per-target inlink lists
# ---------------------------------------------------------------------------


def invertlinks(outlinks_ds, cfg: CrawlConfig, n_buckets: int = 64):
    """outlinks (url=src, dst, anchor) -> linkdb rows
    (url=dst, n_inlinks, anchors list capped at linkdb.max.inlinks).

    Pre-aggregates per batch before the groupby shuffle (partial combine)
    so the all-to-all moves one row per (dst, batch), not one per edge.
    ``n_buckets`` sizes the exchange: 64 (default) for corpus-scale
    linkdbs; small-sf harness runs pass fewer so per-bucket blocks stay
    above Ray's sort-exchange micro-block floor (measured 1.4x at
    sf0.1 with 16; a no-op at real scale).
    """
    max_in = cfg.linkdb_max_inlinks
    ignore_internal = cfg.linkdb_ignore_internal

    _EMPTY = {"dst": "object", "anchor": "object", "src": "object", "w": "int64"}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        """Cap edges per dst within the batch; dropped edges survive as
        weight-only rows so n_inlinks stays the exact count."""
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _EMPTY.items()})
        d = df
        if ignore_internal:
            from ..functions.urlutil import hosts_of

            dst_hosts = hosts_of(d["dst"].to_numpy())
            d = d[(dst_hosts.to_numpy() != d["host"].to_numpy())]
        if len(d) == 0:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _EMPTY.items()})
        if len(d) <= max_in:
            # batch-local cap can't bind: skip the per-batch sort +
            # cumcount entirely (the final bucket pass re-caps exactly)
            return pd.DataFrame(
                {"dst": d["dst"].to_numpy(), "anchor": d["anchor"].to_numpy(),
                 "src": d["url"].to_numpy(), "w": 1}
            )
        d = d.sort_values("dst", kind="stable")
        cum = d.groupby("dst", sort=False).cumcount().to_numpy()
        kept = d[cum < max_in]
        out = pd.DataFrame(
            {"dst": kept["dst"].to_numpy(), "anchor": kept["anchor"].to_numpy(),
             "src": kept["url"].to_numpy(), "w": 1}
        )
        over = d[cum >= max_in]
        if len(over):
            oc = over.groupby("dst", sort=False).size()
            out = pd.concat(
                [out, pd.DataFrame({"dst": oc.index.to_numpy(), "anchor": None, "src": None, "w": oc.to_numpy()})],
                ignore_index=True,
            )
        return out

    def final_bucket(b: pd.DataFrame) -> pd.DataFrame:
        """Vectorized list assembly: sort by dst, split at boundaries."""
        if len(b) == 0:
            return pd.DataFrame(
                {"url": pd.Series(dtype="object"), "n_inlinks": pd.Series(dtype="int64"),
                 "anchors": pd.Series(dtype="object"), "srcs": pd.Series(dtype="object")}
            )
        b = b.sort_values("dst", kind="stable")
        n = b.groupby("dst", sort=False)["w"].sum()
        kept = b[b["anchor"].notna()]
        cum = kept.groupby("dst", sort=False).cumcount().to_numpy()
        kept = kept[cum < max_in]
        dsts = kept["dst"].to_numpy()
        uniq, starts = np.unique(dsts, return_index=True)
        order = np.argsort(starts)
        uniq, starts = uniq[order], starts[order]
        bounds = np.r_[starts[1:], len(dsts)]
        anchors_v = kept["anchor"].to_numpy()
        srcs_v = kept["src"].to_numpy()
        lists = {
            u: (anchors_v[s:e].tolist(), srcs_v[s:e].tolist())
            for u, s, e in zip(uniq, starts, bounds)
        }
        all_dsts = n.index.to_numpy()
        res = pd.DataFrame(
            {
                "url": all_dsts,
                "n_inlinks": n.to_numpy(dtype=np.int64),
                "anchors": [lists.get(u, ([], []))[0] for u in all_dsts],
                "srcs": [lists.get(u, ([], []))[1] for u in all_dsts],
            }
        )
        return res

    from ..ops.agg import bucketed_group_apply

    partials = outlinks_ds.map_batches(partial, batch_format="pandas")
    return bucketed_group_apply(partials, "dst", final_bucket, n_buckets=n_buckets)


def merge_linkdbs(linkdb_dss: list, cfg: CrawlConfig,
                  url_normalize: bool = False, url_filter: bool = False):
    """LinkDbMerger (crawl/LinkDbMerger.java:39-110 reduce): union the
    inlink lists per target url across several linkdbs, dedup by source
    url (Inlinks is keyed by fromUrl), cap at db.max.inlinks; counts
    follow the capped list. One bucketed exchange over the union —
    linkdbs merge without any driver materialization.

    ``-normalize`` / ``-filter`` run LinkDbFilter as the map side
    (LinkDbMerger.createMergeJob:148-160): the TARGET url is
    renormalized (linkdb scope) / filtered before the exchange, and
    each inlink fromUrl is rewritten/dropped too (LinkDbFilter.map).
    """
    max_in = cfg.linkdb_max_inlinks

    if url_normalize or url_filter:
        from ..functions.filters import URLFilters
        from ..functions.normalizers import SCOPE_LINKDB, URLNormalizers

        norms = URLNormalizers(cfg.normalizers) if url_normalize else None
        filts = URLFilters(cfg.filters) if url_filter else None

        def linkdb_filter(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            urls = df["url"]
            if norms is not None:
                urls = pd.Series(norms.normalize_many(urls, SCOPE_LINKDB),
                                 index=df.index)
            keep = urls.notna()
            if filts is not None:
                keep &= pd.Series(
                    filts.accept_many(urls.fillna("").to_numpy()),
                    index=df.index)
            df = df[keep].assign(url=urls[keep])
            if len(df) == 0:
                return df
            # inlink fromUrls: explode once, normalize_many/accept_many
            # over the exploded column, boundary-split reassemble (the
            # merge_bucket machinery below) — no per-inlink Python loop
            from itertools import chain

            srcs_col = df["srcs"].to_numpy()
            ancs_col = df["anchors"].to_numpy()
            lens = np.fromiter((len(s) for s in srcs_col), dtype=np.int64, count=len(df))
            total = int(lens.sum())
            if total == 0:
                return df
            src_e = np.fromiter(chain.from_iterable(srcs_col), dtype=object, count=total)
            anc_e = np.fromiter(chain.from_iterable(ancs_col), dtype=object, count=total)
            if norms is not None:
                src_e = np.asarray(
                    norms.normalize_many(src_e, SCOPE_LINKDB), dtype=object)
            keep_e = pd.notna(src_e)
            if filts is not None:
                keep_e &= filts.accept_many(np.where(keep_e, src_e, ""))
            row_e = np.repeat(np.arange(len(df)), lens)[keep_e]
            src_k, anc_k = src_e[keep_e], anc_e[keep_e]
            # kept elements stay row-ordered, so per-row slices are
            # contiguous; rows whose every inlink dropped get []
            bounds = np.r_[0, np.cumsum(np.bincount(row_e, minlength=len(df)))]
            df = df.assign(
                srcs=[src_k[s:e].tolist() for s, e in zip(bounds[:-1], bounds[1:])],
                anchors=[anc_k[s:e].tolist() for s, e in zip(bounds[:-1], bounds[1:])],
            )
            return df

        linkdb_dss = [ds.map_batches(linkdb_filter, batch_format="pandas")
                      for ds in linkdb_dss]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized fold (same machinery as invertlinks.final_bucket):
        explode the per-linkdb lists in a pinned order, dedup by (url,
        src) keeping the first, cap with a per-url cumcount, reassemble
        by boundary split."""
        if len(g) == 0:
            return pd.DataFrame(
                {"url": pd.Series(dtype="object"), "n_inlinks": pd.Series(dtype="int64"),
                 "anchors": pd.Series(dtype="object"), "srcs": pd.Series(dtype="object")}
            )
        from itertools import chain

        # block arrival order is parallelism-dependent; fold rows in a
        # stable (url, srcs-repr) order so the capped result is
        # deterministic (MapReduce reduce-value order is unspecified in
        # the reference too — we pin it down)
        srcs_col = g["srcs"].to_numpy()
        key = np.fromiter(
            ("\x00".join(map(str, s)) for s in srcs_col), dtype=object, count=len(g))
        order = np.lexsort((key, g["url"].to_numpy()))
        g = g.iloc[order]
        srcs_col = g["srcs"].to_numpy()
        anchors_col = g["anchors"].to_numpy()
        lens = np.fromiter((len(s) for s in srcs_col), dtype=np.int64, count=len(g))
        total = int(lens.sum())
        url_e = np.repeat(g["url"].to_numpy(), lens)
        src_e = np.fromiter(chain.from_iterable(srcs_col), dtype=object, count=total)
        anc_e = np.fromiter(chain.from_iterable(anchors_col), dtype=object, count=total)
        d = pd.DataFrame({"url": url_e, "src": src_e, "anchor": anc_e})
        # Inlinks is keyed by fromUrl (LinkDbMerger.java reduce): first
        # occurrence wins; cap at db.max.inlinks over the deduped fold
        d = d[~d.duplicated(subset=["url", "src"], keep="first")]
        d = d[d.groupby("url", sort=False).cumcount().to_numpy() < max_in]
        urls_d = d["url"].to_numpy()
        starts = np.flatnonzero(np.r_[True, urls_d[1:] != urls_d[:-1]])
        bounds = np.r_[starts[1:], len(urls_d)]
        srcs_v = d["src"].to_numpy()
        ancs_v = d["anchor"].to_numpy()
        out = pd.DataFrame(
            {
                "url": urls_d[starts],
                "n_inlinks": (bounds - starts).astype(np.int64),
                "anchors": [ancs_v[s:e].tolist() for s, e in zip(starts, bounds)],
                "srcs": [srcs_v[s:e].tolist() for s, e in zip(starts, bounds)],
            }
        )
        # urls whose every list was empty still need a row (can't happen
        # from invertlinks output, but unioned linkdbs may carry them)
        missing = g.loc[~g["url"].isin(out["url"]), "url"].drop_duplicates()
        if len(missing):
            out = pd.concat(
                [out, pd.DataFrame({"url": missing.to_numpy(), "n_inlinks": 0,
                                    "anchors": [[]] * len(missing),
                                    "srcs": [[]] * len(missing)})],
                ignore_index=True,
            )
        return out

    from ..ops.agg import bucketed_group_apply

    unioned = linkdb_dss[0].union(*linkdb_dss[1:]) if len(linkdb_dss) > 1 else linkdb_dss[0]
    # NOTE: coalesce_rows was measured COUNTERPRODUCTIVE here (8.5s ->
    # 30s at sf0.1): bundling the list-heavy linkdb rows into one big
    # batch serializes the map and inflates the pandas list-column
    # copies. The micro-block sort overhead is the lesser cost.
    return bucketed_group_apply(unioned, "url", merge_bucket)


# ---------------------------------------------------------------------------
# J13 UpdateHostDb: per-host aggregates
# ---------------------------------------------------------------------------

_STATUS_COLS = {
    "unfetched": CS.DB_UNFETCHED,
    "fetched": CS.DB_FETCHED,
    "gone": CS.DB_GONE,
    "redir_temp": CS.DB_REDIR_TEMP,
    "redir_perm": CS.DB_REDIR_PERM,
    "not_modified": CS.DB_NOTMODIFIED,
    "duplicate": CS.DB_DUPLICATE,
}


def update_hostdb(frontier_ds):
    """frontier -> hostdb (status counts + score sum per host), with a
    per-batch partial combine before the groupby (UpdateHostDbReducer
    analogue, hostdb/UpdateHostDbReducer.java:122-322). Homepage
    detection per UpdateHostDbMapper.java:144-182: the host's root url
    ('proto://host/'), when not UNFETCHED, proposes the homepage — a
    perm/temp redirect's repr_url wins over the root itself."""
    _num_cols = list(_STATUS_COLS) + ["n_urls", "score_sum"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            cols = ["host"] + _num_cols + ["homepage_url"]
            return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
        g = df.groupby("host", sort=False)
        out = pd.DataFrame({"host": list(g.groups.keys())})
        status = df["status"].to_numpy()
        for name, code in _STATUS_COLS.items():
            s = pd.Series(np.where(status == code, 1, 0), index=df.index)
            out[name] = s.groupby(df["host"], sort=False).sum().reindex(out["host"]).to_numpy()
        out["n_urls"] = g.size().reindex(out["host"]).to_numpy()
        out["score_sum"] = g["score"].sum().reindex(out["host"]).to_numpy()
        # homepage candidates
        root = df["url"].str.split("://", n=1).str[0] + "://" + df["host"].astype(str) + "/"
        is_root = (df["url"] == root) & (df["status"] != CS.DB_UNFETCHED)
        hp = pd.Series(np.full(len(df), None, dtype=object), index=df.index)
        if "repr_url" in df.columns:
            redir = is_root & df["status"].isin(
                [CS.DB_REDIR_PERM, CS.DB_REDIR_TEMP]) & df["repr_url"].notna()
            hp[redir] = df.loc[redir, "repr_url"]
        else:
            redir = pd.Series(False, index=df.index)
        plain = is_root & ~redir
        hp[plain] = root[plain]
        out["homepage_url"] = hp.groupby(df["host"], sort=False).first().reindex(out["host"]).to_numpy()
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("host", sort=False, as_index=False)[_num_cols].sum()
        hp = g.groupby("host", sort=False)["homepage_url"].first()
        agg["homepage_url"] = hp.reindex(agg["host"]).to_numpy()
        return agg

    from ..ops.agg import bucketed_group_apply

    partials = frontier_ds.map_batches(partial, batch_format="pandas")
    return bucketed_group_apply(partials, "host", combine)


def read_hostdb(hostdb_ds, expr: str | None = None,
                dump_hostnames: bool = False, dump_homepages: bool = False):
    """ReadHostDb (hostdb/ReadHostDb.java:64-160): dump hostdb rows
    filtered by a JEXL expression over the aggregate counters
    (unfetched/fetched/gone/redirTemp/redirPerm/redirs/notModified/ok/
    numRecords), or just the hostname / homepage-url columns. Pure
    vectorized map — no shuffle (the hostdb is already per-host)."""
    _JEXL_COLS = {
        "redirTemp": "redir_temp", "redirPerm": "redir_perm",
        "notModified": "not_modified", "numRecords": "n_urls",
    }

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        if expr is not None:
            from ..functions.jexl import evaluate

            e = expr
            for jexl, col in _JEXL_COLS.items():
                import re as _re

                e = _re.sub(rf"\b{jexl}\b", col, e)
            d = df.copy()
            # derived JEXL context variables (:105-107)
            d["redirs"] = d["redir_temp"] + d["redir_perm"]
            d["ok"] = d["fetched"] + d["not_modified"]
            df = df[np.asarray(evaluate(d, e), dtype=bool)]
        if dump_hostnames:
            return df[["host"]]
        if dump_homepages and "homepage_url" in df.columns:
            # hasHomepageUrl guard (ReadHostDb.java:140-146)
            return df[df["homepage_url"].notna()][["homepage_url"]]
        return df

    return hostdb_ds.map_batches(filt, batch_format="pandas")


class DnsCheckStage:
    """hostdb DNS resolver check (hostdb/ResolverThread.java:66-120,
    UpdateHostDbReducer.shouldCheck/isEligibleForCheck :361-400) as an
    actor-pool map_batches stage over hostdb rows.

    The resolver is built ONCE per actor from ``resolver_factory`` (a
    zero-arg factory returning ``resolve(host) -> ip-or-raise``); the
    default is ``socket.gethostbyname``. Tests (and this network-free
    sandbox) inject a deterministic stub.

    Eligibility: new hosts (no last_check yet) when check_new; known
    hosts (0 failures) when check_known; failed hosts when check_failed;
    recheck once last_check is older than recheck_interval x
    (dns_failures + 1) unless force. DELIBERATE DIVERGENCE: the
    reference's literal comparisons are inverted from their documented
    intent in two places (ResolverThread.java:104-105 keeps a host only
    once failures EXCEED the purge threshold, and
    UpdateHostDbReducer.java:394-396 marks RECENTLY-checked hosts
    eligible); this port implements the documented intent (purge once
    failures exceed the threshold; recheck stale entries).
    """

    def __init__(self, cfg, resolver_factory=None, now_s: int | None = None):
        if resolver_factory is None:
            import socket

            self.resolve = socket.gethostbyname
        else:
            self.resolve = resolver_factory()
        self.cfg = cfg
        import time as _t

        self.now_s = int(_t.time()) if now_s is None else int(now_s)

    def _eligible(self, is_new, failures, last_check):
        cfg = self.cfg
        if cfg.hostdb_force_check:
            return np.ones(len(is_new), dtype=bool)
        stale = last_check + cfg.hostdb_recheck_interval_s * (failures + 1) < self.now_s
        out = np.zeros(len(is_new), dtype=bool)
        if cfg.hostdb_check_new:
            out |= is_new
        if cfg.hostdb_check_known:
            out |= (~is_new) & (failures == 0) & stale
        if cfg.hostdb_check_failed:
            out |= (failures > 0) & stale
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            for c in ("dns_failures", "last_check"):
                if c not in df.columns:
                    df[c] = pd.Series(dtype="int64")
            return df
        df = df.copy()
        if "dns_failures" not in df.columns:
            df["dns_failures"] = -1  # -1 = never checked (datum.isEmpty())
        if "last_check" not in df.columns:
            df["last_check"] = 0
        failures = pd.to_numeric(df["dns_failures"], errors="coerce").fillna(-1).to_numpy(np.int64)
        last_check = pd.to_numeric(df["last_check"], errors="coerce").fillna(0).to_numpy(np.int64)
        is_new = failures < 0
        check = self._eligible(is_new, np.maximum(failures, 0), last_check)
        failures = np.maximum(failures, 0)
        purge = np.zeros(len(df), dtype=bool)
        for i in np.flatnonzero(check):
            try:
                self.resolve(df["host"].iat[i])
                failures[i] = 0  # new_known / rediscovered / existing_known
                last_check[i] = self.now_s
            except OSError:
                failures[i] += 1
                last_check[i] = self.now_s
                thr = self.cfg.hostdb_purge_failed_threshold
                if thr != -1 and failures[i] > thr:
                    purge[i] = True  # purged_unknown_host
        df["dns_failures"] = failures
        df["last_check"] = last_check
        return df[~purge]


def dns_check(hostdb_ds, cfg: CrawlConfig, resolver_factory=None, now_s=None):
    """Run the DNS check over a hostdb Dataset with an actor pool sized
    by cfg.hostdb_resolver_threads (UpdateHostDb's numResolverThreads)."""
    return hostdb_ds.map_batches(
        DnsCheckStage,
        fn_constructor_kwargs={
            "cfg": cfg, "resolver_factory": resolver_factory, "now_s": now_s},
        batch_format="pandas",
        concurrency=cfg.hostdb_resolver_threads,
    )


# ---------------------------------------------------------------------------
# readdb: stats / topN / dump (CrawlDbReader.java:336-1115)
# ---------------------------------------------------------------------------


def readdb_stats(frontier_ds):
    """Global stats: count by status + score min/max/avg (readdb -stats)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype="float64") for c in
                                 ["status", "n", "score_min", "score_max", "score_sum"]})
        g = df.groupby("status", sort=False)["score"]
        return pd.DataFrame(
            {
                "status": list(g.groups.keys()),
                "n": g.size().to_numpy(),
                "score_min": g.min().to_numpy(),
                "score_max": g.max().to_numpy(),
                "score_sum": g.sum().to_numpy(),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    out = (
        frontier_ds.map_batches(partial, batch_format="pandas")
        .groupby("status")
        .aggregate(
            Sum("n", alias_name="count"),
            Min("score_min", alias_name="score_min"),
            Max("score_max", alias_name="score_max"),
            Sum("score_sum", alias_name="score_sum"),
        )
    )
    return out


def readdb_stats_long(frontier_ds, sort_hosts: bool = False, n_buckets: int = 16):
    """readdb -stats long format (CrawlDbStatMapper/Reducer,
    CrawlDbReader.java:336-470): (key, value) rows exactly in the
    reference's key shapes — 'T' total, 'status <n>' counts,
    'retry <r>' counts, 'fit' fetch-interval total (seconds), 'ftt'
    fetch-time total (minutes, the reference's overflow guard), and
    with ``sort_hosts`` (-sort / db.reader.stats.sort) the per-host
    'status <n> <host>' breakdown. All values are exact integers —
    hash-stable across engines. Partial-combined per batch, one small
    key exchange."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"key": pd.Series(dtype="object"),
                                 "value": pd.Series(dtype="int64")})
        keys: list = ["T", "fit", "ftt"]
        vals: list = [len(df),
                      int(df["fetch_interval"].astype("int64").sum()),
                      int((df["fetch_time"].astype("int64") // 60_000).sum())]
        sc = df["status"].value_counts()
        keys += [f"status {int(s)}" for s in sc.index]
        vals += [int(v) for v in sc.to_numpy()]
        rc = df["retries"].value_counts()
        keys += [f"retry {int(r)}" for r in rc.index]
        vals += [int(v) for v in rc.to_numpy()]
        if sort_hosts:
            hc = df.groupby([df["status"].astype("int64"), df["host"]],
                            sort=False).size()
            keys += [f"status {s} {h}" for s, h in hc.index]
            vals += [int(v) for v in hc.to_numpy()]
        return pd.DataFrame({"key": keys,
                             "value": np.asarray(vals, dtype=np.int64)})

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("key", sort=False)["value"].sum().reset_index()
        s["value"] = s["value"].astype(np.int64)
        return s

    from ..ops.agg import bucketed_group_apply

    return bucketed_group_apply(frontier_ds, "key", bucket_fn,
                                n_buckets=n_buckets, pre=partial)


def readdb_topn(frontier_ds, k: int):
    """readdb -topN (CrawlDbReader.java:925-1006): top-k by score desc."""
    return frontier_ds.sort("score", descending=True).limit(k)


def readdb_url(frontier_ds, url: str):
    """Single-URL lookup (readdb -url)."""
    return frontier_ds.filter(expr=f"url == '{url}'")


def readdb_dump(frontier_ds, regex: str | None = None, status: str | None = None,
                retry_min: int = -1, expr: str | None = None,
                sample: float = 1.0):
    """readdb -dump filter surface (CrawlDbDumpMapper,
    CrawlDbReader.java:667-740): -regex (FULL match on the url, the
    reference's Matcher.matches), -status (case-insensitive status
    NAME), -retry (retries >= N), -expr (JEXL predicate), -sample.
    All filters vectorized per batch; rows stream through, nothing
    materializes. DIVERGENCE, documented: -sample uses Math.random()
    in the reference; here it is the deterministic hash-Bernoulli
    keep rule (ops/sample) so dumps are reproducible."""
    import re as _re

    from ..model import CrawlStatus

    status_code = None
    if status is not None:
        matches = [c for c, n in CrawlStatus.NAMES.items()
                   if n.lower() == status.lower()]
        status_code = matches[0] if matches else -999  # unknown name: none pass
    rx = _re.compile(regex) if regex else None

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        keep = np.ones(len(df), dtype=bool)
        if sample < 1.0:
            import hashlib as _hl

            thr = int(round(sample * 100))
            keep &= np.fromiter(
                (int(_hl.md5(u.encode()).hexdigest()[:8], 16) % 100 < thr
                 for u in df["url"]),
                dtype=bool, count=len(df))
        if retry_min != -1:
            keep &= (df["retries"].to_numpy() >= retry_min)
        if status_code is not None:
            keep &= (df["status"].to_numpy() == status_code)
        if rx is not None:
            keep &= df["url"].str.fullmatch(rx).fillna(False).to_numpy()
        if expr is not None:
            from ..functions.jexl import evaluate

            keep &= np.asarray(evaluate(df, expr), dtype=bool)
        return df[keep]

    return frontier_ds.map_batches(filt, batch_format="pandas")


# ---------------------------------------------------------------------------
# J12 CrawlDbMerger (mergedb)
# ---------------------------------------------------------------------------


def mergedb(dbs: list, cfg: CrawlConfig, url_normalize: bool = False,
            url_filter: bool = False):
    """Union several frontiers; per URL keep the entry with the newest
    calculateLastFetchTime, metadata merged newer-over-older
    (CrawlDbMerger.java:82-119).

    ``-normalize`` / ``-filter`` (CrawlDbMerger.java:128-179 runs
    CrawlDbFilter as the merge mapper): map-side url rewrite + drop
    BEFORE the exchange — renamed urls land in their recomputed
    hash(host) partition, so cross-db twins that only match after
    normalization still merge."""
    from dataclasses import replace

    from .updatedb import merge_frontier_frames, renormalize_frame

    ds = dbs[0].union(*dbs[1:]) if len(dbs) > 1 else dbs[0]
    if url_normalize or url_filter:
        mcfg = replace(cfg, update_url_normalize=url_normalize,
                       update_url_filter=url_filter)

        def renorm(df: pd.DataFrame) -> pd.DataFrame:
            out, _ = renormalize_frame(df.copy(), mcfg)
            return out

        ds = ds.map_batches(renorm, batch_format="pandas")
    return ds.groupby("part").map_groups(merge_frontier_frames, batch_format="pandas")


# ---------------------------------------------------------------------------
# J11 Indexer join: frontier ⋈ linkdb ⋈ docs -> index documents
# ---------------------------------------------------------------------------


def indexer_join(frontier_ds, docs_ds, linkdb_ds, cfg: CrawlConfig, delete_gone: bool = True,
                 content_ds=None):
    """n-way co-group by url (IndexerMapReduce.java:183-298) as a
    per-bucket pandas merge. ALL inputs (frontier, docs, linkdb, and —
    with -addBinaryContent — the segment content part) ride one tagged
    union + groupby(hash(url) % B) exchange — the linkdb is
    frontier-cardinality (one row per inlinked URL), so it is
    co-grouped on the join key like the others, never broadcast.

    Emits one row per indexable page: url, title, text, score_boost,
    n_inlinks, anchors.

    ``content_ds`` (url, content columns — the segment's content part)
    + ``cfg.indexer_add_binary_content`` adds the reference's
    ``binaryContent`` field (IndexerMapReduce.java:412-425, exercised
    by TestIndexerMapReduce): base64 of the raw bytes when
    ``cfg.indexer_binary_base64``, else the bytes decoded as text.
    Added after the IndexingFilter chain, exactly like the reference
    (the chain never sees the field).
    """

    # index-links needs raw link lists riding the join (outlinks from
    # the doc's link spans, inlinks from the linkdb srcs column);
    # subcollection/metadata filters need the frontier metadata column
    want_links = "links" in (cfg.indexing_filters or ())
    want_meta_out = any(
        n in ("subcollection", "metadata", "urlmeta", "geoip", "reltag")
        for n in (cfg.indexing_filters or ())
    )
    want_noindex = bool(cfg.indexer_delete_robots_noindex)
    want_meta = want_meta_out or want_noindex
    want_ctype = "mimetype" in (cfg.indexing_filters or ())
    want_binary = bool(cfg.indexer_add_binary_content) and content_ds is not None
    binary_b64 = bool(cfg.indexer_binary_base64)
    _extra_f_cols = (["metadata"] if want_meta else []) + (
        ["content_type"] if want_ctype else [])

    def docs_project(df: pd.DataFrame) -> pd.DataFrame:
        base_cols = ["url", "part", "title", "text"] + (["outlinks"] if want_links else [])
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in base_cols})
        titles, texts, outlinks = [], [], []
        for spans in df["spans"]:
            t = [s["text"] for s in spans if s["kind"] == "title"]
            x = [s["text"] for s in spans if s["kind"] in ("heading", "text")]
            titles.append(t[0] if t else "")
            texts.append(" ".join(x))
            if want_links:
                outlinks.append([s["media_ref"] for s in spans if s["kind"] == "link"])
        out = pd.DataFrame(
            {"url": df["url"].to_numpy(), "part": df["part"].to_numpy(), "title": titles, "text": texts}
        )
        if want_links:
            out["outlinks"] = outlinks
        return out

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["rjoin"] == "db"]
        d = g[g["rjoin"] == "doc"]
        if len(d) == 0 or len(f) == 0:
            empty_cols = {
                "url": pd.Series(dtype="object"),
                "title": pd.Series(dtype="object"),
                "text": pd.Series(dtype="object"),
                "score_boost": pd.Series(dtype="float32"),
                "n_inlinks": pd.Series(dtype="int64"),
                "anchors": pd.Series(dtype="object"),
            }
            if want_links:
                empty_cols["outlinks"] = pd.Series(dtype="object")
                empty_cols["inlinks"] = pd.Series(dtype="object")
            if want_meta_out:
                empty_cols["metadata"] = pd.Series(dtype="object")
            if want_ctype:
                empty_cols["content_type"] = pd.Series(dtype="object")
            if want_binary:
                empty_cols["binaryContent"] = pd.Series(dtype="object")
            return pd.DataFrame(empty_cols)
        m = d.drop(columns=["status", "score"] + _extra_f_cols,
                   errors="ignore").merge(
            f[["url", "status", "score"] + _extra_f_cols],
            on="url", how="inner"
        )
        if delete_gone:
            m = m[~m["status"].isin([CS.DB_GONE, CS.DB_DUPLICATE, CS.DB_REDIR_PERM, CS.DB_REDIR_TEMP])]
        if cfg.indexer_skip_notmodified:
            # indexer.skip.notmodified (IndexerMapReduce.java:332-336)
            m = m[m["status"] != CS.DB_NOTMODIFIED]
        if want_noindex and len(m):
            # indexer.delete.robots.noindex (NUTCH-1434, :277-289):
            # cheap substring prefilter over the raw JSON, exact check
            # only on the hits
            import json as _json

            raw = m["metadata"].astype(str)
            maybe = raw.str.contains("noindex", case=False, na=False) & raw.str.contains(
                "metatag.robots", na=False)
            if maybe.any():
                def _noidx(s):
                    try:
                        v = _json.loads(s).get("metatag.robots")
                    except Exception:
                        return False
                    vals = v if isinstance(v, list) else [v]
                    return any("noindex" in str(x).lower() for x in vals if x)

                m = m[~(maybe & m["metadata"].where(maybe).map(
                    lambda s: _noidx(s) if isinstance(s, str) else False))]
        ldb = g[g["rjoin"] == "link"]
        ldb_cols = ["url", "n_inlinks", "anchors"] + (["srcs"] if want_links else [])
        if len(ldb):
            m = m.drop(columns=["n_inlinks", "anchors", "srcs"], errors="ignore").merge(
                ldb[[c for c in ldb_cols if c in ldb.columns]], on="url", how="left"
            )
            m["n_inlinks"] = m["n_inlinks"].fillna(0).astype(np.int64)
            m["anchors"] = m["anchors"].apply(lambda a: a if isinstance(a, (list, np.ndarray)) else [])
        else:
            m["n_inlinks"] = 0
            m["anchors"] = [[] for _ in range(len(m))]
        if want_links:
            for c in ("outlinks", "srcs"):
                if c not in m.columns:
                    m[c] = None
                m[c] = m[c].apply(lambda a: list(a) if isinstance(a, (list, np.ndarray)) else [])
        # scfilters.indexerScore (OPIC: score^0.5, OPICScoringFilter.java:157-166)
        from ..functions.scoring import make_scoring

        boost = make_scoring(cfg).indexer_score(m["score"].to_numpy(dtype=np.float32))
        out = pd.DataFrame(
            {
                "url": m["url"].to_numpy(),
                "title": m["title"].to_numpy(),
                "text": m["text"].to_numpy(),
                "score_boost": boost,
                "n_inlinks": m["n_inlinks"].to_numpy(),
                "anchors": m["anchors"].to_numpy(),
            }
        )
        if want_links:
            # index-links input columns (inlinks = linkdb srcs)
            out["outlinks"] = m["outlinks"].to_numpy()
            out["inlinks"] = m["srcs"].to_numpy()
        if want_meta_out:
            out["metadata"] = m["metadata"].to_numpy()
        if want_ctype:
            out["content_type"] = m["content_type"].to_numpy()
        if cfg.indexing_filters:
            # IndexingFilter chain (index-basic/anchor/more/metadata/
            # static/criteria) enriches or drops documents
            from ..functions.indexing import IndexingFilters

            out = IndexingFilters(cfg.indexing_filters, cfg).apply(out)
        if want_binary:
            # binaryContent rides in AFTER the filter chain
            # (IndexerMapReduce.java:412-425: the `doc == null` skip
            # check precedes the content add)
            import base64 as _b64

            c = g[g["rjoin"] == "content"][["url", "content"]]
            cmap = dict(zip(c["url"], c["content"])) if len(c) else {}

            def _bin(u):
                raw = cmap.get(u)
                if raw is None:
                    return None
                raw = bytes(raw)
                if binary_b64:
                    return _b64.b64encode(raw).decode("ascii")
                return raw.decode("utf-8", errors="replace")

            out["binaryContent"] = out["url"].map(_bin)
        return out

    # typed sentinels: union blocks must agree on dtypes or the exchange
    # coerces conflicting columns to null
    _UNION_DEFAULTS = [
        ("url", ""), ("status", -1), ("score", 0.0),
        ("title", ""), ("text", ""), ("rjoin", ""), ("n_inlinks", 0),
        ("anchors", None),
    ] + ([("outlinks", None), ("srcs", None)] if want_links else []) \
      + ([("metadata", None)] if want_meta else []) \
      + ([("content_type", None)] if want_ctype else []) \
      + ([("content", None)] if want_binary else [])

    from ..ops.agg import stable_bucket

    n_buckets = max(64, cfg.num_partitions)

    _key_norms = _key_filts = None
    if cfg.indexer_url_normalize:
        from ..functions.normalizers import URLNormalizers

        _key_norms = URLNormalizers(cfg.normalizers)
    if cfg.indexer_url_filter:
        from ..functions.filters import URLFilters

        _key_filts = URLFilters(cfg.filters)

    def align(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) and (_key_norms is not None or _key_filts is not None):
            # IndexerMapper (IndexerMapReduce.java:183-195): map-side
            # indexer-scope renormalize + refilter of the join key on
            # EVERY input, before the exchange — so rewritten urls
            # still co-group
            from ..functions.normalizers import SCOPE_INDEXER

            urls = df["url"]
            if _key_norms is not None:
                urls = pd.Series(
                    _key_norms.normalize_many(urls, scope=SCOPE_INDEXER),
                    index=df.index)
            keep = urls.notna()
            if _key_filts is not None:
                keep &= pd.Series(
                    _key_filts.accept_many(urls.fillna("").to_numpy()),
                    index=df.index)
            df = df[keep].assign(url=urls[keep])
        out = pd.DataFrame()
        n = len(df)
        for c, default in _UNION_DEFAULTS:
            if c in df.columns:
                out[c] = df[c].to_numpy()
            elif default is None:
                out[c] = np.full(n, None, dtype=object)
            else:
                out[c] = np.full(n, default, dtype=type(default) if not isinstance(default, str) else object)
        out["score"] = out["score"].astype(np.float64)
        out["status"] = out["status"].astype(np.int64)
        out["n_inlinks"] = out["n_inlinks"].astype(np.int64)
        # co-group key: the JOIN key's hash, shared by all three inputs
        out["jb"] = stable_bucket(out["url"], n_buckets) if n else np.array([], dtype=np.int32)
        return out

    f_cols = ["url", "status", "score"] + _extra_f_cols
    f_tagged = frontier_ds.map_batches(
        lambda df: align(df[[c for c in f_cols if c in df.columns]].assign(rjoin="db")),
        batch_format="pandas",
    )
    d_tagged = docs_ds.map_batches(docs_project, batch_format="pandas").map_batches(
        lambda df: align(df.assign(rjoin="doc")), batch_format="pandas"
    )
    unioned = f_tagged.union(d_tagged)
    if linkdb_ds is not None:
        link_cols = ["url", "n_inlinks", "anchors"] + (["srcs"] if want_links else [])
        unioned = unioned.union(
            linkdb_ds.map_batches(
                lambda df: align(df[[c for c in link_cols if c in df.columns]].assign(rjoin="link")),
                batch_format="pandas",
            )
        )
    if want_binary:
        unioned = unioned.union(
            content_ds.map_batches(
                lambda df: align(df[["url", "content"]].assign(rjoin="content")),
                batch_format="pandas",
            )
        )
    return unioned.groupby("jb").map_groups(join_part, batch_format="pandas")


# ---------------------------------------------------------------------------
# Aux stat jobs: crawl completion / domain statistics / protocol status
# (util/CrawlCompletionStats.java:194-252, util/domain/DomainStatistics.java:
# 160-237, util/ProtocolStatusStatistics.java:140-179) — each is one
# partial-combined bucketed aggregate over the frontier; no row ever
# leaves a task un-aggregated.
# ---------------------------------------------------------------------------

_FETCHED_STATUSES = (CS.DB_FETCHED, CS.DB_NOTMODIFIED)


def _stat_key(df: pd.DataFrame, mode: str) -> np.ndarray:
    from ..functions.urlutil import domains_of, hosts_of

    if mode == "host":
        return (
            df["host"].to_numpy()
            if "host" in df.columns
            else hosts_of(df["url"].to_numpy()).to_numpy()
        )
    hosts = (
        df["host"]
        if "host" in df.columns
        else hosts_of(df["url"].to_numpy())
    )
    if mode == "domain":
        return domains_of(np.asarray(hosts, dtype=object)).to_numpy()
    if mode == "tld":
        return np.array(
            [h.rsplit(".", 1)[-1] if isinstance(h, str) and "." in h else (h or "") for h in np.asarray(hosts, dtype=object)],
            dtype=object,
        )
    raise ValueError(f"unknown stats mode: {mode}")


def crawl_completion_stats(frontier_ds, mode: str = "host"):
    """Per host-or-domain FETCHED/UNFETCHED counts
    (CrawlCompletionStats.java:194-252: DB_FETCHED|DB_NOTMODIFIED count
    as fetched, everything else as unfetched).
    Returns Dataset (key, fetched, unfetched)."""
    from ..ops.agg import bucketed_sum

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"key": pd.Series(dtype="object"), "fetched": pd.Series(dtype="int64"),
                 "unfetched": pd.Series(dtype="int64")}
            )
        fetched = np.isin(df["status"].to_numpy(), _FETCHED_STATUSES)
        return pd.DataFrame(
            {"key": _stat_key(df, mode), "fetched": fetched.astype(np.int64),
             "unfetched": (~fetched).astype(np.int64)}
        )

    return bucketed_sum(
        frontier_ds.map_batches(pre, batch_format="pandas"), "key", ["fetched", "unfetched"]
    )


def domain_statistics(frontier_ds, mode: str = "host"):
    """Fetched-page count per host/domain/tld
    (DomainStatistics.java:174-199: only DB_FETCHED|DB_NOTMODIFIED rows
    counted). Returns Dataset (key, fetched)."""
    from ..ops.agg import bucketed_sum

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"key": pd.Series(dtype="object"), "fetched": pd.Series(dtype="int64")}
            )
        d = df[np.isin(df["status"].to_numpy(), _FETCHED_STATUSES)]
        if len(d) == 0:
            return pd.DataFrame(
                {"key": pd.Series(dtype="object"), "fetched": pd.Series(dtype="int64")}
            )
        return pd.DataFrame({"key": _stat_key(d, mode), "fetched": np.int64(1)})

    return bucketed_sum(
        frontier_ds.map_batches(pre, batch_format="pandas"), "key", ["fetched"]
    )


def protocol_status_stats(frontier_ds):
    """Counts per protocol status code (ProtocolStatusStatistics.java:
    140-149; rows without one count as UNFETCHED). Reads the typed
    ``pst`` frontier column when present (SURVEY §1.3 hot-key
    promotion — zero string scanning); falls back to a C-level regex
    extract of metadata['_pst_'] for frontiers that only carry the
    JSON map. Returns Dataset (code, count)."""
    from ..ops.agg import bucketed_sum

    _PST_RE = r'"_pst_"\s*:\s*"?([^",}]*)"?'

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"code": pd.Series(dtype="object"), "count": pd.Series(dtype="int64")}
            )
        if "pst" in df.columns:
            codes = df["pst"].fillna("UNFETCHED").to_numpy(dtype=object)
        else:
            codes = (
                df["metadata"]
                .astype("string")
                .str.extract(_PST_RE, expand=False)
                .fillna("UNFETCHED")
                .to_numpy(dtype=object)
            )
        return pd.DataFrame({"code": codes, "count": np.int64(1)})

    return bucketed_sum(
        frontier_ds.map_batches(pre, batch_format="pandas"), "code", ["count"]
    )
