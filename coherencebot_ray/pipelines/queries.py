"""The driver-facing query registry: every implemented operator as a
``queries()`` entry over the testdata tables, each (where SQL can
express it) with a DuckDB ``oracle_sql()`` equivalent producing the
same column names and values.

Float discipline (the driver hash-compares values): sums are computed
in integer cents via ``floor(x*100 + 0.5)`` on both sides; scores are
pure integer-ratio float64 computed identically; similarity ranks are
tie-broken on ``round(sim, 6)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import CrawlConfig
from ..model import CrawlStatus as CS
from . import derive as DV

EPOCH = DV.EPOCH


def _read(sf_dir: str, table: str, columns=None, min_block_bytes: int | None = None):
    import math
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    path = f"{sf_dir}/{table}.parquet"
    # Strip the writer's pandas key-value metadata: it makes
    # hash(pa.Schema) raise ("unhashable type: dict"), which made every
    # read emit Ray's "Failed to hash the schemas" warning
    # (ray/data/_internal/arrow_ops/transform_pyarrow.py:181).
    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:
        import pyarrow as pa

        schema = pa.schema([schema.field(c) for c in columns])
    kw = {}
    if min_block_bytes:
        # Exchange-bound pipelines: Ray's default parallelism heuristic
        # shatters a small file into ~2xCPU micro-blocks, and the sort
        # exchange pays a per-block overhead that dominates wall time
        # (measured 10.7s -> 2-3s on the invertlinks exchange at sf0.1).
        # Floor the block size instead; at real scale (blocks already
        # >= the floor) this is a no-op.
        n = max(1, math.ceil(os.path.getsize(path) / min_block_bytes))
        kw["override_num_blocks"] = n
    return rd.read_parquet(path, columns=columns, schema=schema, **kw)


# block-size floor for cheap-map + heavy-exchange queries
_EXCHANGE_BLOCK_BYTES = 4 << 20


def _typed_empty(out: pd.DataFrame, cols: dict) -> pd.DataFrame:
    """Ray drops block schemas on some fully-empty pipelines (union /
    map_groups chains), so Dataset.to_pandas() can return a COLUMN-LESS
    empty frame; rebuild the typed empty so downstream projections
    don't KeyError. ``cols`` maps column -> pandas dtype string."""
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    return out



def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


# ===========================================================================
# Crawl operators on the derived frontier
# ===========================================================================


def q_generate_topn(sf_dir: str):
    """J2 Generator selector: score-desc selection, per-host cap 3,
    global topN 100 (Generator.java:216-537). Distributed shape: the
    frontier derives inside map_batches tasks and the selector runs as
    a per-partition bucket task (the real generate stage's layout)."""
    from ..ops.agg import bucketed_group_apply
    from ..stages.generate import select_partition

    cfg = CrawlConfig(num_partitions=1, gen_max_count=3, gen_count_mode="host")
    ds = DV.derived_frontier_ds(sf_dir)

    def sel(g: pd.DataFrame) -> pd.DataFrame:
        # bucket arrival order is parallelism-dependent; the selector's
        # tie-break is input order -> pin it by url
        g = g.sort_values("url", kind="stable").reset_index(drop=True)
        out = select_partition(g, cfg, limit=100, gen_time_ms=EPOCH)
        return out[["url", "host", "score"]]

    out = bucketed_group_apply(ds, "part", sel).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


_GEN_SQL = f"""
WITH f AS (
  SELECT {DV.URL_SQL} AS url, {DV.HOST_SQL} AS host, {DV.SCORE_SQL} AS score
  FROM documents
), r AS (
  SELECT url, host, score,
         row_number() OVER (PARTITION BY host ORDER BY score DESC) AS rn
  FROM f
)
SELECT url, host, score FROM r WHERE rn <= 3
ORDER BY score DESC LIMIT 100
"""


def q_inject_merge(sf_dir: str):
    """J1 Injector merge (NUTCH-1405 rules, Injector.java:292-348):
    seeds = docs with doc_id%3=0 (score 2.0), existing = docs with
    doc_id%2=0; no overwrite/update -> old wins."""
    from ..functions.inject import inject_merge
    from ..ops.agg import bucketed_group_apply

    def seedify(df, ids):
        df["status"] = CS.INJECTED
        df["score"] = 2.0
        return df

    old = DV.derived_frontier_ds(sf_dir, pred=lambda i: i % 2 == 0, num_partitions=8)
    seeds = DV.derived_frontier_ds(
        sf_dir, pred=lambda i: i % 3 == 0, num_partitions=8, transform=seedify)
    cfg = CrawlConfig()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return inject_merge(g, cfg)[["url", "status", "score"]]

    # merge is per-url; part = doc_id%8 co-locates each url's rows
    out = bucketed_group_apply(seeds.union(old), "part", merge).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


_INJECT_SQL = f"""
WITH seeds AS (
  SELECT {DV.URL_SQL} AS url FROM documents WHERE doc_id % 3 = 0
), old AS (
  SELECT {DV.URL_SQL} AS url, {DV.STATUS_CASE_SQL} AS status, {DV.SCORE_SQL} AS score
  FROM documents WHERE doc_id % 2 = 0
)
SELECT coalesce(s.url, o.url) AS url,
       CASE WHEN o.url IS NULL THEN 1 ELSE o.status END AS status,
       CASE WHEN o.url IS NULL THEN 2.0 ELSE o.score END AS score
FROM seeds s FULL OUTER JOIN old o ON s.url = o.url
ORDER BY 1
"""


def q_updatedb_merge(sf_dir: str):
    """J8 CrawlDbReducer state machine (CrawlDbReducer.java:196-312) with
    DefaultFetchSchedule over deterministic fetch outcomes."""
    from ..functions.updatedb import merge_partition
    from ..ops.agg import bucketed_group_apply

    def oldify(df, ids):
        df["status"] = CS.DB_UNFETCHED
        df["signature"] = None
        return df

    def fetchify(df, ids):
        df["signature"] = None
        m8 = ids % 8
        df["status"] = np.select(
            [m8 == 0, m8 == 2, m8 == 4, m8 == 6],
            [CS.FETCH_SUCCESS, CS.FETCH_GONE, CS.FETCH_RETRY, CS.FETCH_NOTMODIFIED],
        )
        return df

    old = DV.derived_frontier_ds(sf_dir, num_partitions=8, transform=oldify)
    fetch = DV.derived_frontier_ds(
        sf_dir, pred=lambda i: i % 2 == 0, num_partitions=8, transform=fetchify)
    cfg = CrawlConfig(schedule="default")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = merge_partition(g, cfg, EPOCH)
        out = out[["url", "status", "fetch_time", "retries", "fetch_interval"]]
        out["status"] = out["status"].astype(np.int64)
        return out

    out = bucketed_group_apply(old.union(fetch), "part", merge).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


# gone schedule: interval*1.5 is exact in f32 here (ints < 2^24)
_UPDATEDB_SQL = f"""
WITH f AS (
  SELECT doc_id, {DV.URL_SQL} AS url, {DV.FETCH_TIME_SQL} AS ft,
         {DV.INTERVAL_SQL} AS itv
  FROM documents
)
SELECT url,
  CASE WHEN doc_id % 2 <> 0 THEN 1
       WHEN doc_id % 8 = 0 THEN 2
       WHEN doc_id % 8 = 2 THEN 3
       WHEN doc_id % 8 = 4 THEN 1
       ELSE 6 END AS status,
  CASE WHEN doc_id % 2 <> 0 THEN ft
       WHEN doc_id % 8 = 0 THEN ft + itv * 1000
       WHEN doc_id % 8 = 2 THEN ft + CAST(itv * 1.5 AS BIGINT) * 1000
       WHEN doc_id % 8 = 4 THEN ft + 86400000
       ELSE ft + itv * 1000 END AS fetch_time,
  CASE WHEN doc_id % 2 = 0 AND doc_id % 8 = 4 THEN 1 ELSE 0 END AS retries,
  CASE WHEN doc_id % 2 = 0 AND doc_id % 8 = 2 THEN CAST(itv * 1.5 AS BIGINT)
       ELSE itv END AS fetch_interval
FROM f
ORDER BY url
"""


def q_scoring_depth(sf_dir: str):
    """scoring-depth (DepthScoringFilter.java:212-233): one updatedb
    round of the _depth_ min-fold. Seeds (doc_id%11==0) sit in the
    frontier at depth 1; each seed contributes LINKED datums at depth 2
    to targets (id*7+1)%N and (id*13+2)%N. Rows with inlinks fold
    min(old depth | 1000, 2); rows without new data pass through
    unchanged (depth -1 = no stamp)."""
    import json as _json

    import pyarrow.parquet as pq

    from ..functions.updatedb import merge_partition
    from ..ops.agg import bucketed_group_apply

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    seed_md = _json.dumps({"_depth_": 1, "_maxdepth_": 3}, sort_keys=True)
    link_md = _json.dumps({"_depth_": 2}, sort_keys=True)

    def oldify(df, ids):
        df.loc[ids % 11 == 0, "metadata"] = seed_md
        return df

    def linkify(df, ids):
        # LINKED contributions derive from the batch's seeds; targets
        # are global ids so the part column routes them to their bucket
        seeds = ids[ids % 11 == 0]
        tgt = np.concatenate([(seeds * 7 + 1) % n, (seeds * 13 + 2) % n])
        out = DV.derived_frontier(tgt, num_partitions=8)
        out["status"] = CS.LINKED
        out["score"] = 0.25
        out["metadata"] = link_md
        return out

    old = DV.derived_frontier_ds(sf_dir, num_partitions=8, transform=oldify)
    links = DV.derived_frontier_ds(sf_dir, transform=linkify)
    cfg = CrawlConfig(scoring_filters=("opic", "depth"), scoring_depth_max=3)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = merge_partition(g, cfg, EPOCH)
        depth = out["metadata"].map(
            lambda m: _json.loads(m).get("_depth_", -1) if isinstance(m, str) and m else -1
        )
        return pd.DataFrame({"url": out["url"], "depth": depth.astype(np.int64)})

    res = bucketed_group_apply(old.union(links), "part", merge).to_pandas()
    return res.sort_values("url").reset_index(drop=True)


_SCORING_DEPTH_SQL = f"""
WITH n AS (SELECT count(*) AS c FROM documents),
seeds AS (SELECT doc_id FROM documents WHERE doc_id % 11 = 0),
tgt AS (
  SELECT DISTINCT tid FROM (
    SELECT (doc_id * 7 + 1) % (SELECT c FROM n) AS tid FROM seeds
    UNION ALL
    SELECT (doc_id * 13 + 2) % (SELECT c FROM n) AS tid FROM seeds
  )
),
f AS (
  SELECT doc_id, {DV.URL_SQL} AS url,
         CASE WHEN doc_id % 11 = 0 THEN 1 ELSE NULL END AS old_d
  FROM documents
)
SELECT f.url,
  CASE WHEN t.tid IS NOT NULL THEN least(coalesce(f.old_d, 1000), 2)
       ELSE coalesce(f.old_d, -1) END AS depth
FROM f LEFT JOIN tgt t ON f.doc_id = t.tid
ORDER BY url
"""


def q_dedup_urls(sf_dir: str):
    """J9 DeduplicationJob: group by signature, losers marked duplicate
    (DeduplicationJob.java:124-229); scores distinct -> winner = max."""
    from ..stages.jobs import dedup

    def fetchedify(df, ids):
        df["status"] = CS.DB_FETCHED
        df["fetch_time"] = 0  # equal fetch times
        # the dedup job keys on binary signatures like the real frontier
        df["signature"] = df["signature"].map(bytes.fromhex)
        return df

    ds = DV.derived_frontier_ds(sf_dir, num_partitions=8, transform=fetchedify)
    out = dedup(ds, CrawlConfig()).to_pandas()
    return pd.DataFrame({"url": np.sort(out["url"].to_numpy())})


_DEDUP_SQL = f"""
WITH f AS (
  SELECT {DV.URL_SQL} AS url, {DV.SIG_SQL} AS sig, {DV.SCORE_SQL} AS score
  FROM documents
), r AS (
  SELECT url, row_number() OVER (PARTITION BY sig ORDER BY score DESC) AS rn FROM f
)
SELECT url FROM r WHERE rn > 1 ORDER BY url
"""


def q_invertlinks(sf_dir: str):
    """J10 LinkDb invert: lineitem edges (order->part) grouped by target
    with inlink counts (LinkDb.java; partial-combine before shuffle)."""
    from ..stages.jobs import invertlinks

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_suppkey"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": "http://o" + df["l_orderkey"].astype(str) + ".example/",
                "host": "o" + df["l_orderkey"].astype(str) + ".example",
                "dst": "http://p" + df["l_partkey"].astype(str) + ".example/",
                "anchor": "s" + df["l_suppkey"].astype(str),
            }
        )

    edges = li.map_batches(to_edges, batch_format="pandas")
    cfg = CrawlConfig(linkdb_ignore_internal=False, linkdb_max_inlinks=10_000_000)
    # 16 buckets at harness scale: keeps exchange blocks off the
    # micro-block floor (the job's 64 default is the at-scale setting)
    out = invertlinks(edges, cfg, n_buckets=16).to_pandas()
    out["min_src"] = out["srcs"].map(min)
    out["min_anchor"] = out["anchors"].map(min)
    return out[["url", "n_inlinks", "min_src", "min_anchor"]].sort_values("url").reset_index(drop=True)


_INVERT_SQL = """
SELECT 'http://p' || l_partkey || '.example/' AS url,
       count(*) AS n_inlinks,
       min('http://o' || l_orderkey || '.example/') AS min_src,
       min('s' || l_suppkey) AS min_anchor
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_linkdb_merge(sf_dir: str):
    """J10b LinkDbMerger: lineitem edges split into two linkdbs by
    l_orderkey parity, each inverted independently, then merged
    (crawl/LinkDbMerger.java). The merge dedups inlinks BY SOURCE url,
    so the oracle counts DISTINCT (src, dst) edges; the anchor is a
    function of the source so duplicate edges carry identical anchors
    (fold order can't matter)."""
    from ..stages.jobs import invertlinks, merge_linkdbs

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_linenumber"]
    )

    def to_edges(parity: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["l_orderkey"].to_numpy(np.int64) % 2 == parity]
            return pd.DataFrame(
                {
                    "url": "http://o" + d["l_orderkey"].astype(str) + "l" + d["l_linenumber"].astype(str) + ".example/",
                    "host": "o" + d["l_orderkey"].astype(str) + ".example",
                    "dst": "http://p" + d["l_partkey"].astype(str) + ".example/",
                    "anchor": "s" + d["l_orderkey"].astype(str),
                }
            )

        return f

    cfg = CrawlConfig(linkdb_ignore_internal=False, linkdb_max_inlinks=10_000_000)
    dbs = [
        invertlinks(li.map_batches(to_edges(p), batch_format="pandas"), cfg)
        for p in (0, 1)
    ]
    out = merge_linkdbs(dbs, cfg).to_pandas()
    out["min_src"] = out["srcs"].map(min)
    out["min_anchor"] = out["anchors"].map(min)
    out = out[["url", "n_inlinks", "min_src", "min_anchor"]]
    out["n_inlinks"] = out["n_inlinks"].astype(np.int64)
    return out.sort_values("url").reset_index(drop=True)


_LINKDB_MERGE_SQL = """
WITH e AS (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey FROM lineitem)
SELECT 'http://p' || l_partkey || '.example/' AS url,
       count(*) AS n_inlinks,
       min('http://o' || l_orderkey || 'l' || l_linenumber || '.example/') AS min_src,
       min('s' || l_orderkey) AS min_anchor
FROM e GROUP BY 1 ORDER BY 1
"""


def q_hostdb(sf_dir: str):
    """J13 UpdateHostDb: per-host status counts (UpdateHostDbReducer)."""
    from ..stages.jobs import update_hostdb

    out = update_hostdb(DV.derived_frontier_ds(sf_dir)).to_pandas()
    cols = ["host", "unfetched", "fetched", "gone", "not_modified", "n_urls"]
    out = out[cols]
    for c in cols[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("host").reset_index(drop=True)


_HOSTDB_SQL = f"""
WITH f AS (
  SELECT {DV.HOST_SQL} AS host, {DV.STATUS_CASE_SQL} AS status FROM documents
)
SELECT host,
  CAST(sum(CASE WHEN status = 1 THEN 1 ELSE 0 END) AS BIGINT) AS unfetched,
  CAST(sum(CASE WHEN status = 2 THEN 1 ELSE 0 END) AS BIGINT) AS fetched,
  CAST(sum(CASE WHEN status = 3 THEN 1 ELSE 0 END) AS BIGINT) AS gone,
  CAST(sum(CASE WHEN status = 6 THEN 1 ELSE 0 END) AS BIGINT) AS not_modified,
  count(*) AS n_urls
FROM f GROUP BY host ORDER BY host
"""


def q_readdb_stats(sf_dir: str):
    """readdb -stats (CrawlDbReader.java:336-470): per-status count +
    score min/max."""
    from ..stages.jobs import readdb_stats

    out = readdb_stats(DV.derived_frontier_ds(sf_dir)).to_pandas()
    out = out[["status", "count", "score_min", "score_max"]]
    out["status"] = out["status"].astype(np.int64)
    out["count"] = out["count"].astype(np.int64)
    return out.sort_values("status").reset_index(drop=True)


_STATS_SQL = f"""
WITH f AS (
  SELECT {DV.STATUS_CASE_SQL} AS status, {DV.SCORE_SQL} AS score FROM documents
)
SELECT status, count(*) AS count, min(score) AS score_min, max(score) AS score_max
FROM f GROUP BY status ORDER BY status
"""


def q_readdb_dump(sf_dir: str):
    """readdb -dump with -regex + -status + -sample filters
    (CrawlDbDumpMapper, CrawlDbReader.java:667-740): full-match url
    regex, status-name equality, deterministic hash-Bernoulli sample."""
    from ..stages.jobs import readdb_dump

    out = readdb_dump(
        DV.derived_frontier_ds(sf_dir),
        regex=r"http://host[0-4]\d?\.example/doc/\d+",
        status="db_fetched",
        sample=0.5,
    ).to_pandas()[["url", "status", "retries"]]
    out["status"] = out["status"].astype(np.int64)
    out["retries"] = out["retries"].astype(np.int64)
    return out.sort_values("url").reset_index(drop=True)


_READDB_DUMP_SQL = f"""
WITH f AS (
  SELECT {DV.URL_SQL} AS url, {DV.STATUS_CASE_SQL} AS status, 0 AS retries
  FROM documents
)
SELECT url, CAST(status AS BIGINT) AS status, CAST(retries AS BIGINT) AS retries
FROM f
WHERE regexp_full_match(url, 'http://host[0-4]\\d?\\.example/doc/\\d+')
  AND status = 2
  AND CAST('0x' || substr(md5(url), 1, 8) AS UBIGINT) % 100 < 50
ORDER BY url
"""


def q_readdb_stats_sort(sf_dir: str):
    """readdb -stats -sort long format (CrawlDbStatMapper with
    db.reader.stats.sort, CrawlDbReader.java:336-415): exact-integer
    (key, value) stat rows incl. the per-host status breakdown."""
    from ..stages.jobs import readdb_stats_long

    out = readdb_stats_long(DV.derived_frontier_ds(sf_dir),
                            sort_hosts=True).to_pandas()
    out["value"] = out["value"].astype(np.int64)
    return out.sort_values("key").reset_index(drop=True)


_STATS_SORT_SQL = f"""
WITH f AS (
  SELECT {DV.STATUS_CASE_SQL} AS status, {DV.HOST_SQL} AS host,
         CAST({DV.FETCH_TIME_SQL} AS BIGINT) AS fetch_time,
         CAST({DV.INTERVAL_SQL} AS BIGINT) AS fetch_interval,
         0 AS retries
  FROM documents
)
SELECT key, CAST(value AS BIGINT) AS value FROM (
  SELECT 'T' AS key, count(*) AS value FROM f
  UNION ALL SELECT 'fit', sum(fetch_interval) FROM f
  UNION ALL SELECT 'ftt', sum(fetch_time // 60000) FROM f
  UNION ALL SELECT 'status ' || status, count(*) FROM f GROUP BY status
  UNION ALL SELECT 'retry ' || retries, count(*) FROM f GROUP BY retries
  UNION ALL SELECT 'status ' || status || ' ' || host, count(*) FROM f GROUP BY status, host
)
ORDER BY key
"""


def q_readdb_topn(sf_dir: str):
    """readdb -topN (CrawlDbReader.java:925-1006)."""
    from ..stages.jobs import readdb_topn

    ds = DV.derived_frontier_ds(
        sf_dir, transform=lambda df, ids: df[["url", "score"]])
    out = readdb_topn(ds, 50).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


_TOPN_SQL = f"""
SELECT url, score FROM (
  SELECT {DV.URL_SQL} AS url, {DV.SCORE_SQL} AS score FROM documents
  ORDER BY score DESC LIMIT 50
) ORDER BY url
"""


def q_crawlcomplete(sf_dir: str):
    """CrawlCompletionStats by host (util/CrawlCompletionStats.java:
    194-252): FETCHED = DB_FETCHED|DB_NOTMODIFIED, else UNFETCHED."""
    from ..stages.jobs import crawl_completion_stats

    ds = DV.derived_frontier_ds(
        sf_dir, transform=lambda df, ids: df[["url", "host", "status"]])
    out = crawl_completion_stats(ds).to_pandas()
    out["fetched"] = out["fetched"].astype(np.int64)
    out["unfetched"] = out["unfetched"].astype(np.int64)
    return out.sort_values("key").reset_index(drop=True)


_CRAWLCOMPLETE_SQL = f"""
WITH f AS (SELECT {DV.HOST_SQL} AS key, {DV.STATUS_CASE_SQL} AS status FROM documents)
SELECT key,
       count(*) FILTER (status IN (2, 6)) AS fetched,
       count(*) FILTER (status NOT IN (2, 6)) AS unfetched
FROM f GROUP BY key ORDER BY key
"""


def q_domainstats(sf_dir: str):
    """DomainStatistics fetched-count by domain
    (util/domain/DomainStatistics.java:174-199)."""
    from ..stages.jobs import domain_statistics

    ds = DV.derived_frontier_ds(
        sf_dir, transform=lambda df, ids: df[["url", "host", "status"]])
    out = domain_statistics(ds, mode="domain").to_pandas()
    out["fetched"] = out["fetched"].astype(np.int64)
    return out.sort_values("key").reset_index(drop=True)


_DOMAINSTATS_SQL = f"""
WITH f AS (SELECT {DV.HOST_SQL} AS key, {DV.STATUS_CASE_SQL} AS status FROM documents)
SELECT key, count(*) AS fetched
FROM f WHERE status IN (2, 6) GROUP BY key ORDER BY key
"""


def q_protocolstats(sf_dir: str):
    """ProtocolStatusStatistics (util/ProtocolStatusStatistics.java:
    140-179): counts per protocol-status code, UNFETCHED when absent.
    The derived frontier stamps the typed ``pst`` column from
    doc_id % 5 (SURVEY §1.3 hot-key promotion — the stats job reads a
    column, never the metadata JSON)."""
    from ..stages.jobs import protocol_status_stats

    _CODES = np.array(["200", "301", "404", "503", None], dtype=object)

    def stamp(df, ids):
        df["pst"] = _CODES[ids % 5]
        return df[["url", "pst"]]

    ds = DV.derived_frontier_ds(sf_dir, transform=stamp)
    out = protocol_status_stats(ds).to_pandas()
    out["count"] = out["count"].astype(np.int64)
    return out.sort_values("code").reset_index(drop=True)


_PROTOCOLSTATS_SQL = """
WITH f AS (
  SELECT CASE doc_id % 5 WHEN 0 THEN '200' WHEN 1 THEN '301' WHEN 2 THEN '404'
         WHEN 3 THEN '503' ELSE 'UNFETCHED' END AS code
  FROM documents
)
SELECT code, count(*) AS count FROM f GROUP BY code ORDER BY code
"""


def q_indexer_join(sf_dir: str):
    """J11 IndexerMapReduce n-way join analogue over orders ⋈ customer ⋈
    nation with OPIC indexer damping sqrt(score) in integer micro-units."""
    import pyarrow.compute as pc

    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    c = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    n = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    c_pd = c.to_pandas()
    n_pd = n.to_pandas()
    import ray

    ref = ray.put((c_pd, n_pd))

    def join(df: pd.DataFrame) -> pd.DataFrame:
        cc, nn = ray.get(ref)
        m = df.merge(cc, left_on="o_custkey", right_on="c_custkey")
        m = m.merge(nn, left_on="c_nationkey", right_on="n_nationkey")
        boost = np.floor(np.sqrt(m["o_totalprice"].to_numpy(dtype=np.float64)) * 1e6 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"].to_numpy(),
                "c_name": m["c_name"].to_numpy(),
                "n_name": m["n_name"].to_numpy(),
                "boost_micro": boost,
            }
        )

    out = o.map_batches(join, batch_format="pandas").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


_INDEXER_SQL = """
SELECT o_orderkey, c_name, n_name,
       CAST(FLOOR(sqrt(o_totalprice) * 1000000 + 0.5) AS BIGINT) AS boost_micro
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY o_orderkey
"""


# ===========================================================================
# Dedup / text / knn / window / media over the driver tables
# ===========================================================================


def q_dedup_exact_docs(sf_dir: str):
    """Exact text dedup (md5) over documents."""
    from ..ops.dedup import exact_dedup

    out = exact_dedup(
        # md5 map is cheap: floor the blocks for the sig exchange
        _read(sf_dir, "documents", columns=["doc_id", "text"],
              min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    ).to_pandas()
    if "doc_id" not in out.columns:  # no duplicates at this scale
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "dup_of": pd.Series(dtype="int64")})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["dup_of"] = out["dup_of"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_DEDUP_DOCS_SQL = """
WITH s AS (SELECT doc_id, md5(text) AS sig FROM documents),
w AS (SELECT doc_id, sig, min(doc_id) OVER (PARTITION BY sig) AS dup_of FROM s)
SELECT doc_id, dup_of FROM w WHERE doc_id <> dup_of ORDER BY doc_id
"""


def q_dedup_norm_docs(sf_dir: str):
    """Normalized exact dedup: case + whitespace-run folding before the
    md5, the standard first pass of a training-data dedup stack."""
    from ..ops.dedup import exact_dedup

    out = exact_dedup(
        _read(sf_dir, "documents", columns=["doc_id", "text"],
              min_block_bytes=_EXCHANGE_BLOCK_BYTES),
        normalize=True,
    ).to_pandas()
    if "doc_id" not in out.columns:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "dup_of": pd.Series(dtype="int64")})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["dup_of"] = out["dup_of"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_DEDUP_NORM_SQL = """
WITH s AS (SELECT doc_id,
                  md5(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')) AS sig
           FROM documents),
w AS (SELECT doc_id, sig, min(doc_id) OVER (PARTITION BY sig) AS dup_of FROM s)
SELECT doc_id, dup_of FROM w WHERE doc_id <> dup_of ORDER BY doc_id
"""


def q_minhash_lsh(sf_dir: str):
    """MinHash+LSH near-dup pairs (true Jaccard >= 0.8 among 8-band
    64-perm collisions); jaccard as integer ppm for float-stable
    comparison. Oracle: same signatures/banding/verify in SQL (the
    permutation constants are embedded in the generated SQL)."""
    from ..ops.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(_read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)).to_pandas()
    out = _typed_empty(out, {"a": "int64", "b": "int64", "jaccard": "float64"})
    out["jaccard_ppm"] = np.floor(out["jaccard"].astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    out = out[["a", "b", "jaccard_ppm"]]
    for c in ("a", "b"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_minhash_lsh_idjoin(sf_dir: str):
    """Same near-dup pairs as ``minhash_lsh`` through the large-document
    layout (with_text=False): band rows carry ids only and candidate
    halves are hash-joined back to the docs table for the Jaccard
    verify. Oracle-checked against the same SQL — both layouts must be
    bitwise identical."""
    from ..ops.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES), with_text=False
    ).to_pandas()
    out = _typed_empty(out, {"a": "int64", "b": "int64", "jaccard": "float64"})
    out["jaccard_ppm"] = np.floor(out["jaccard"].astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    out = out[["a", "b", "jaccard_ppm"]]
    for c in ("a", "b"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _minhash_sql() -> str:
    from ..ops.dedup import MinHasher

    h = MinHasher(n_perm=64, seed=42)
    perms = ", ".join(
        f"({i}, {int(a)}, {int(b)})" for i, (a, b) in enumerate(zip(h.a, h.b))
    )
    # signature arithmetic mirrors MinHasher.signature exactly: numpy
    # uint64 wrap-around = explicit % 2^64 on HUGEINT before % mersenne
    return f"""
WITH perms(i, pa, pb) AS (VALUES {perms}),
toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents),
sh_long AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM toks, unnest(range(1, greatest(len(ts) - 2, 0) + 1)) AS u(i)
  WHERE len(ts) >= 3
),
sh_short AS (SELECT doc_id, array_to_string(ts, ' ') AS s FROM toks WHERE len(ts) BETWEEN 1 AND 2),
sh AS (SELECT DISTINCT doc_id, s FROM (SELECT * FROM sh_long UNION ALL SELECT * FROM sh_short)),
hs AS (SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 16)) AS UBIGINT) AS h FROM sh),
sigs AS (
  SELECT doc_id, p.i,
    min(CAST((CAST(p.pa AS HUGEINT) * (h % 2305843009213693951) + p.pb) % 18446744073709551616 % 2305843009213693951 AS UBIGINT)) AS sig
  FROM hs, perms p GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, i // 8 AS band_id, list(sig ORDER BY i) AS band_sig
  FROM sigs GROUP BY doc_id, i // 8
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band_id = y.band_id AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id
),
shl AS (SELECT doc_id, list(s) AS ss FROM sh GROUP BY doc_id),
ver AS (
  SELECT c.a, c.b, len(list_intersect(sa.ss, sb.ss)) AS inter,
         len(sa.ss) + len(sb.ss) - len(list_intersect(sa.ss, sb.ss)) AS uni
  FROM cand c JOIN shl sa ON sa.doc_id = c.a JOIN shl sb ON sb.doc_id = c.b
)
SELECT a, b, CAST(FLOOR(inter * 1.0 / uni * 1000000 + 0.5) AS BIGINT) AS jaccard_ppm
FROM ver WHERE inter * 1.0 / uni >= 0.8 ORDER BY a, b
"""


def q_ngram_jaccard(sf_dir: str):
    """EXACT n-gram (3-token shingle) Jaccard similarity self-join via
    AllPairs prefix filtering — the no-recall-loss member of the dedup
    family (minhash/simhash are its approximate siblings). Oracle is the
    brute-force Jaccard self-join over the same shingle definition, so
    any candidate the prefix filter missed would show up as a hash
    mismatch."""
    from ..ops.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    ).to_pandas()
    out = _typed_empty(out, {"a": "int64", "b": "int64", "jaccard": "float64"})
    out["jaccard_ppm"] = np.floor(out["jaccard"].astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    out = out[["a", "b", "jaccard_ppm"]]
    for c in ("a", "b"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_ngram_jaccard_idjoin(sf_dir: str):
    """Same exact similarity join through the large-document layout
    (with_text=False): prefix rows carry ids only, candidate halves are
    hash-joined back to the docs table. Both layouts must be bitwise
    identical under the same brute-force oracle (the minhash-layout
    precedent)."""
    from ..ops.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES),
        with_text=False,
    ).to_pandas()
    out = _typed_empty(out, {"a": "int64", "b": "int64", "jaccard": "float64"})
    out["jaccard_ppm"] = np.floor(out["jaccard"].astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    out = out[["a", "b", "jaccard_ppm"]]
    for c in ("a", "b"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_containment(sf_dir: str):
    """Exact directed n-gram containment join (C(a,b) = |A∩B|/|A| >=
    0.8) via the asymmetric prefix filter; id-join verify layout
    (ops/dedup.containment_pairs)."""
    from ..ops.dedup import containment_pairs

    out = containment_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"],
              min_block_bytes=_EXCHANGE_BLOCK_BYTES),
        threshold=0.8,
    ).to_pandas()
    out = _typed_empty(out, {"a": "int64", "b": "int64",
                             "containment": "float64"})
    out["containment_ppm"] = np.floor(
        out["containment"].astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    out = out[["a", "b", "containment_ppm"]]
    for c in ("a", "b"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


_CONTAINMENT_SQL = """
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents),
sh_long AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM toks, unnest(range(1, greatest(len(ts) - 2, 0) + 1)) AS u(i)
  WHERE len(ts) >= 3
),
sh_short AS (SELECT doc_id, array_to_string(ts, ' ') AS s FROM toks WHERE len(ts) BETWEEN 1 AND 2),
sh AS (SELECT DISTINCT doc_id, s FROM (SELECT * FROM sh_long UNION ALL SELECT * FROM sh_short)),
shl AS (SELECT doc_id, list(s) AS ss FROM sh GROUP BY doc_id),
ver AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         len(list_intersect(x.ss, y.ss)) AS inter, len(x.ss) AS asz
  FROM shl x JOIN shl y ON x.doc_id != y.doc_id
)
SELECT a, b, CAST(FLOOR(inter * 1.0 / asz * 1000000 + 0.5) AS BIGINT) AS containment_ppm
FROM ver WHERE inter * 1.0 / asz >= 0.8 ORDER BY a, b
"""


_NGRAM_JACCARD_SQL = """
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents),
sh_long AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM toks, unnest(range(1, greatest(len(ts) - 2, 0) + 1)) AS u(i)
  WHERE len(ts) >= 3
),
sh_short AS (SELECT doc_id, array_to_string(ts, ' ') AS s FROM toks WHERE len(ts) BETWEEN 1 AND 2),
sh AS (SELECT DISTINCT doc_id, s FROM (SELECT * FROM sh_long UNION ALL SELECT * FROM sh_short)),
shl AS (SELECT doc_id, list(s) AS ss FROM sh GROUP BY doc_id),
ver AS (
  SELECT x.doc_id AS a, y.doc_id AS b, len(list_intersect(x.ss, y.ss)) AS inter,
         len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss)) AS uni
  FROM shl x JOIN shl y ON x.doc_id < y.doc_id
)
SELECT a, b, CAST(FLOOR(inter * 1.0 / uni * 1000000 + 0.5) AS BIGINT) AS jaccard_ppm
FROM ver WHERE inter * 1.0 / uni >= 0.8 ORDER BY a, b
"""


def q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct-text-per-lang sketch (Flajolet et al. 2007).
    Integer-only estimator (exact HUGEINT floor division), so the SQL
    oracle reproduces it bit-for-bit — registers, raw estimate and all."""
    from ..ops.sketch import hll_distinct

    out = hll_distinct(
        _read(sf_dir, "documents", columns=["lang", "text"],
              min_block_bytes=_EXCHANGE_BLOCK_BYTES),
        "lang", "text",
    ).to_pandas()
    out = out[["lang", "hll_raw_est", "n_registers_set"]]
    for c in ("hll_raw_est", "n_registers_set"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def _hll_distinct_sql() -> str:
    from ..ops.sketch import _ALPHA_DEN, _EST_NUM

    return f"""
WITH v AS (
  SELECT lang, ('0x' || substr(md5(coalesce(text, '')), 1, 16))::UBIGINT AS h
  FROM documents
),
s0 AS (SELECT lang, (h >> 54)::BIGINT AS idx, h & 18014398509481983 AS w FROM v),
s1 AS (SELECT lang, idx, w | (w >> 1) AS w FROM s0),
s2 AS (SELECT lang, idx, w | (w >> 2) AS w FROM s1),
s3 AS (SELECT lang, idx, w | (w >> 4) AS w FROM s2),
s4 AS (SELECT lang, idx, w | (w >> 8) AS w FROM s3),
s5 AS (SELECT lang, idx, w | (w >> 16) AS w FROM s4),
s6 AS (SELECT lang, idx, w | (w >> 32) AS w FROM s5),
regs AS (SELECT lang, idx, MAX(55 - bit_count(w)) AS rho FROM s6 GROUP BY lang, idx),
agg AS (
  SELECT lang, COUNT(*) AS present,
         SUM(((1::UBIGINT << (64 - rho)))::HUGEINT) AS sum_present
  FROM regs GROUP BY lang
)
SELECT lang,
       CAST({_EST_NUM}::HUGEINT // ({_ALPHA_DEN}::HUGEINT *
            (sum_present + (1024 - present)::HUGEINT * 18446744073709551616::HUGEINT))
            AS BIGINT) AS hll_raw_est,
       CAST(present AS BIGINT) AS n_registers_set
FROM agg ORDER BY lang
"""


def q_dup_spans(sf_dir: str):
    """Cross-document duplicate 8-gram span counts — the detection half
    of exact substring dedup (Lee et al. 2021). One (doc_id, span)
    exchange, per-bucket exact global counts, one small per-doc sum."""
    from ..ops.dedup import dup_span_counts

    out = dup_span_counts(
        _read(sf_dir, "documents", columns=["doc_id", "text"],
              min_block_bytes=_EXCHANGE_BLOCK_BYTES),
        k=8,
    ).to_pandas()
    out = out[["doc_id", "n_spans", "n_dup"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_DUP_SPANS_SQL = """
WITH w AS (SELECT doc_id, regexp_extract_all(coalesce(text,''), '\\S+') AS ws FROM documents),
spans AS (
  SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS span
  FROM w, UNNEST(range(1, len(ws) - 8 + 2)) AS t(i)
),
cnt AS (SELECT span, COUNT(*) AS c FROM spans GROUP BY span),
per_doc AS (
  SELECT spans.doc_id, COUNT(*) AS n_spans,
         SUM(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM spans JOIN cnt USING (span) GROUP BY spans.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


def q_ngram_novelty(sf_dir: str):
    """Order-aware n-gram novelty curve (ops/dedup.novel_span_counts):
    a window is novel iff it is the corpus-order-first occurrence of its
    3-gram. One span-hash exchange; the first-occurrence rank is exact
    per bucket (vectorized two-pass idxmin, no sort)."""
    from ..ops.dedup import novel_span_counts

    out = novel_span_counts(
        _read(sf_dir, "documents", columns=["doc_id", "text"],
              min_block_bytes=_EXCHANGE_BLOCK_BYTES),
        k=3,
    ).to_pandas()
    out = out[["doc_id", "n_spans", "n_novel"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_NGRAM_NOVELTY_SQL = """
WITH w AS (SELECT doc_id, regexp_extract_all(coalesce(text,''), '\\S+') AS ws FROM documents),
spans AS (
  SELECT doc_id, t.i AS pos, array_to_string(ws[t.i:t.i+2], ' ') AS span
  FROM w, UNNEST(range(1, len(ws) - 3 + 2)) AS t(i)
),
ranked AS (
  SELECT doc_id,
         CASE WHEN row_number() OVER (PARTITION BY span
                                      ORDER BY doc_id, pos) = 1
              THEN 1 ELSE 0 END AS novel
  FROM spans
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_spans, SUM(novel) AS n_novel
  FROM ranked GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


def q_knn_pq(sf_dir: str):
    """Product-quantization ANN (ops/knn.knn_pq): per-subspace
    deterministic codebooks + ADC top-10 for queries vec_id < 8. The
    oracle replicates fit + encode + ADC exactly (unrolled per-subspace
    Lloyd over list slices), so the approximate result is
    hash-verifiable."""
    from ..ops.knn import knn_pq

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = knn_pq(ds, query_ids=list(range(8)), k=10, m=4, ksub=16,
                 iters=2).to_pandas()
    out = out[["query_id", "neighbor_id", "rank"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _knn_pq_sql(k: int = 10, m: int = 4, ksub: int = 16, iters: int = 2,
                dim: int = 64, nq: int = 8) -> str:
    """DuckDB mirror of knn_pq: for each subspace, the kmeans Lloyd
    unroll of _kmeans_ctes applied to the list SLICE; then per-query
    LUTs (power(list_distance, 2)) and the ADC rank join."""
    dsub = dim // m
    ctes = [f"q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe "
            f"FROM embeddings WHERE vec_id < {nq})"]
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        sl = f"(e.embedding::DOUBLE[])[{lo}:{hi}]"

        def assign(name: str, cents: str) -> str:
            return f"""{name} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_distance({sl}, c.cent), c.cid
           ) AS rn
    FROM embeddings e CROSS JOIN {cents} c
  ) WHERE rn = 1
)"""

        def update(name: str, assigned: str) -> str:
            return f"""{name} AS (
  SELECT cid, list(mv ORDER BY i) AS cent
  FROM (
    SELECT cid, i, avg(v) AS mv FROM (
      SELECT {assigned}.cid AS cid,
             generate_subscripts({sl}, 1) AS i,
             unnest({sl}) AS v
      FROM {assigned} JOIN embeddings e USING (vec_id)
    ) GROUP BY cid, i
  ) GROUP BY cid
)"""

        ctes.append(
            f"p{j}c0 AS (\n  SELECT vec_id AS cid,"
            f" (embedding::DOUBLE[])[{lo}:{hi}] AS cent"
            f" FROM embeddings WHERE vec_id < {ksub}\n)")
        for it in range(iters):
            ctes.append(assign(f"p{j}a{it}", f"p{j}c{it}"))
            ctes.append(update(f"p{j}c{it + 1}", f"p{j}a{it}"))
        ctes.append(assign(f"p{j}af", f"p{j}c{iters}"))
        ctes.append(
            f"lut{j} AS (\n  SELECT q.qid, c.cid,"
            f" power(list_distance((q.qe)[{lo}:{hi}], c.cent), 2) AS dist"
            f"\n  FROM q CROSS JOIN p{j}c{iters} c\n)")
    code_joins = "\n  ".join(
        f"JOIN p{j}af e{j} USING (vec_id)" for j in range(1, m))
    lut_joins = "\n  ".join(
        f"JOIN lut{j} l{j} ON l{j}.cid = e{j}.cid AND l{j}.qid = l0.qid"
        for j in range(1, m))
    adc = " + ".join(f"l{j}.dist" for j in range(m))
    cte_body = ",\n".join(ctes)
    return f"""WITH {cte_body},
r AS (
  SELECT l0.qid, e0.vec_id AS nid,
         row_number() OVER (
           PARTITION BY l0.qid
           ORDER BY round({adc}, 6) ASC, e0.vec_id ASC) AS rank
  FROM p0af e0
  {code_joins}
  JOIN lut0 l0 ON l0.cid = e0.cid
  {lut_joins}
  WHERE e0.vec_id <> l0.qid
)
SELECT qid AS query_id, nid AS neighbor_id, rank FROM r WHERE rank <= {k}
ORDER BY query_id, rank
"""


def q_q5_join(sf_dir: str):
    """TPC-H Q5-shaped 6-table join: revenue per nation where customer
    and supplier share an ASIA nation, orders in [1996, 1997).

    Distributed plan (100-TB idiom): region x nation resolve on the
    driver (both are fixed-cardinality dimensions, 5 + 25 rows at ANY
    scale); ASIA customer->nation and supplier->nation maps broadcast
    ONCE via ray.put (dimension-sized, the q3 custkey precedent — at
    10^10-row fact scale the same join falls back to one extra
    key-hash exchange, documented here); orders date-filter and
    lineitem revenue partial-combine stream distributed, tagged, and
    meet in ONE bucketed orderkey exchange where the same-nation
    equality applies; only per-bucket (nationkey, cents) partials reach
    the driver (<= 25 x n_buckets rows)."""
    import ray

    from ..ops.agg import bucketed_group_apply

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1997-01-01")

    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    asia_key = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia = nation[nation["n_regionkey"] == asia_key]
    asia_set = set(asia["n_nationkey"].astype(int))
    name_of = dict(zip(asia["n_nationkey"].astype(int), asia["n_name"]))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: df[df["c_nationkey"].isin(list(asia_set))],
        batch_format="pandas").to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"].astype(np.int64),
                                cust["c_nationkey"].astype(np.int64))))
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda df: df[df["s_nationkey"].isin(list(asia_set))],
        batch_format="pandas").to_pandas()
    supp_ref = ray.put(dict(zip(supp["s_suppkey"].astype(np.int64),
                                supp["s_nationkey"].astype(np.int64))))

    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
              min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cust_ref)
        d = df[(df["o_orderdate"].to_numpy() >= lo)
               & (df["o_orderdate"].to_numpy() < hi)]
        nat = d["o_custkey"].map(cmap)
        d = d[nat.notna()]
        return pd.DataFrame({
            "key": d["o_orderkey"].to_numpy(np.int64),
            "nat": nat.dropna().to_numpy(np.int64),
            "revenue_cents": np.zeros(len(d), dtype=np.int64),
            "__t": np.zeros(len(d), dtype=np.int8)})  # 0 = orders side

    def tag_lineitem(df: pd.DataFrame) -> pd.DataFrame:
        smap = ray.get(supp_ref)
        nat = df["l_suppkey"].map(smap)
        d = df[nat.notna()]
        rev = _cents(d["l_extendedprice"].to_numpy(np.float64)
                     * (1.0 - d["l_discount"].to_numpy(np.float64)))
        t = pd.DataFrame({"key": d["l_orderkey"].to_numpy(np.int64),
                          "nat": nat.dropna().to_numpy(np.int64),
                          "revenue_cents": rev})
        t = t.groupby(["key", "nat"], sort=False, as_index=False).sum()
        t["__t"] = np.ones(len(t), dtype=np.int8)  # 1 = lineitem side
        return t

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tags = g["__t"].to_numpy()
        o_side = g[tags == 0][["key", "nat"]]
        l_side = g[tags == 1]
        if not len(o_side) or not len(l_side):
            return pd.DataFrame({"n_nationkey": pd.Series(dtype="int64"),
                                 "revenue_cents": pd.Series(dtype="int64")})
        m = l_side.merge(o_side, on=["key", "nat"], how="inner")
        agg = m.groupby("nat", sort=False, as_index=False)["revenue_cents"].sum()
        return pd.DataFrame({"n_nationkey": agg["nat"].to_numpy(np.int64),
                             "revenue_cents": agg["revenue_cents"].to_numpy(np.int64)})

    tagged = o.map_batches(tag_orders, batch_format="pandas").union(
        li.map_batches(tag_lineitem, batch_format="pandas"))
    parts = bucketed_group_apply(tagged, "key", join_bucket).to_pandas()
    if not len(parts):
        return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                             "revenue_cents": pd.Series(dtype="int64")})
    out = parts.groupby("n_nationkey", as_index=False)["revenue_cents"].sum()
    out["n_name"] = out["n_nationkey"].map(name_of)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return (out[["n_name", "revenue_cents"]]
            .sort_values(["revenue_cents", "n_name"], ascending=[False, True])
            .reset_index(drop=True))


_Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue_cents DESC, n_name
"""


def q_funnel(sf_dir: str):
    """Ordered conversion funnel view -> click -> purchase per user
    (ops/window.funnel_stages): one key-hash exchange, fully vectorized
    masked stage-chain inside each bucket, -1 sentinels for unreached
    stages."""
    from ..ops.window import funnel_stages

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = funnel_stages(ds).to_pandas()
    cols = ["user_id", "view_us", "click_us", "purchase_us", "converted"]
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out[cols].sort_values("user_id").reset_index(drop=True)


_FUNNEL_SQL = """
WITH t AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
v AS (SELECT user_id, MIN(us) AS v_us FROM t
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT t.user_id, MIN(t.us) AS c_us
      FROM t JOIN v ON v.user_id = t.user_id
      WHERE t.event_type = 'click' AND t.us > v.v_us GROUP BY t.user_id),
p AS (SELECT t.user_id, MIN(t.us) AS p_us
      FROM t JOIN c ON c.user_id = t.user_id
      WHERE t.event_type = 'purchase' AND t.us > c.c_us GROUP BY t.user_id),
u AS (SELECT DISTINCT user_id FROM t)
SELECT u.user_id,
       CAST(coalesce(v.v_us, -1) AS BIGINT) AS view_us,
       CAST(coalesce(c.c_us, -1) AS BIGINT) AS click_us,
       CAST(coalesce(p.p_us, -1) AS BIGINT) AS purchase_us,
       CAST(CASE WHEN p.p_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS converted
FROM u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
ORDER BY u.user_id
"""


def q_latest_event(sf_dir: str):
    """Latest-record-per-key compaction over the events log
    (ops/window.latest_per_key): per-batch vectorized argmax partials,
    ONE key-hash exchange moving at most one candidate row per key per
    batch."""
    from ..ops.window import latest_per_key

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = latest_per_key(ds, key_col="user_id",
                         order_cols=("ts", "event_id"),
                         keep_cols=("event_id", "event_type")).to_pandas()
    out["user_id"] = out["user_id"].astype(np.int64)
    out["event_id"] = out["event_id"].astype(np.int64)
    return (out[["user_id", "event_id", "event_type"]]
            .sort_values("user_id").reset_index(drop=True))


_LATEST_EVENT_SQL = """
SELECT user_id, event_id, event_type
FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


def q_q18_join(sf_dir: str):
    """TPC-H Q18-shaped large-order query: the groupby-HAVING semi-join
    shape (q1 = pure agg, q3 = semi-join + agg, q5 = multiway, q18 =
    HAVING gate feeding a join). Quantities fold as exact centi-units;
    the HAVING filter completes inside the single orderkey co-group
    (every lineitem row of an orderkey shares its bucket with the
    orders row), so only qualifying orders — a few hundred rows — ever
    leave the exchange; customer names attach from a broadcast map."""
    import ray

    from ..ops.agg import bucketed_group_apply

    THRESH_CENTI = 250 * 100

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    name_ref = ray.put(dict(zip(cust["c_custkey"].astype(np.int64),
                                cust["c_name"])))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
              min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        qc = _cents(df["l_quantity"].to_numpy(np.float64))
        d = pd.DataFrame({"key": df["l_orderkey"].to_numpy(np.int64),
                          "qty_centi": qc})
        d = d.groupby("key", sort=False, as_index=False).sum()
        d["__t"] = np.ones(len(d), dtype=np.int8)  # 1 = lineitem side
        return d

    def tag_o(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["o_orderkey"].to_numpy(np.int64),
            "qty_centi": df["o_custkey"].to_numpy(np.int64),  # carries custkey
            "__t": np.zeros(len(df), dtype=np.int8)})  # 0 = orders side

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tags = g["__t"].to_numpy()
        l = g[tags == 1].groupby("key", sort=False, as_index=False)["qty_centi"].sum()
        l = l[l["qty_centi"].to_numpy() > THRESH_CENTI]
        if not len(l):
            return pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                 "o_custkey": pd.Series(dtype="int64"),
                                 "qty_centi": pd.Series(dtype="int64")})
        o_side = g[tags == 0][["key", "qty_centi"]].rename(
            columns={"qty_centi": "o_custkey"})
        m = l.merge(o_side, on="key", how="inner")
        return pd.DataFrame({"o_orderkey": m["key"].to_numpy(np.int64),
                             "o_custkey": m["o_custkey"].to_numpy(np.int64),
                             "qty_centi": m["qty_centi"].to_numpy(np.int64)})

    tagged = li.map_batches(tag_li, batch_format="pandas").union(
        o.map_batches(tag_o, batch_format="pandas"))
    out = bucketed_group_apply(tagged, "key", join_bucket).to_pandas()
    if not len(out):
        return pd.DataFrame({"c_name": pd.Series(dtype="object"),
                             "o_orderkey": pd.Series(dtype="int64"),
                             "qty_centi": pd.Series(dtype="int64")})
    names = ray.get(name_ref)
    out["c_name"] = out["o_custkey"].map(names)
    out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
    out["qty_centi"] = out["qty_centi"].astype(np.int64)
    return (out[["c_name", "o_orderkey", "qty_centi"]]
            .sort_values(["qty_centi", "o_orderkey"], ascending=[False, True])
            .reset_index(drop=True))


_Q18_SQL = """
WITH lq AS (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))::BIGINT AS qty_centi
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) > 25000
)
SELECT c.c_name, o.o_orderkey, lq.qty_centi
FROM lq
JOIN orders o ON o.o_orderkey = lq.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY qty_centi DESC, o_orderkey ASC
"""


def q_rank_normalize(sf_dir: str):
    """Exact cume_dist rank-normalization of per-doc token counts
    (ops/vocab.rank_normalize): distributed distinct-value histogram ->
    broadcast cumulative counts -> one zero-shuffle scoring scan. The
    quality-score calibration step of a multi-source curation
    pipeline."""
    from ..ops.text import token_count
    from ..ops.vocab import rank_normalize

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def value_pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "value": token_count(df["text"]).astype(np.int64)})

    out = rank_normalize(ds, value_pre).to_pandas()
    out = out.rename(columns={"value": "n_tokens"})
    for c in ("doc_id", "n_tokens", "pct_micro"):
        out[c] = out[c].astype(np.int64)
    return (out[["doc_id", "n_tokens", "pct_micro"]]
            .sort_values("doc_id").reset_index(drop=True))


_RANK_NORMALIZE_SQL = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS v
  FROM documents
),
c AS (SELECT v, COUNT(*)::BIGINT AS cnt FROM t GROUP BY v),
cc AS (SELECT v, SUM(cnt) OVER (ORDER BY v)::BIGINT AS cle FROM c),
n AS (SELECT COUNT(*)::BIGINT AS nn FROM t)
SELECT t.doc_id, t.v AS n_tokens,
       CAST(cc.cle * 1000000 // nn AS BIGINT) AS pct_micro
FROM t JOIN cc ON cc.v = t.v, n
ORDER BY t.doc_id
"""


def q_props_stats(sf_dir: str):
    """Semi-structured field extraction + grouped stats: pull the
    integer ``k`` out of the events.props JSON string with ONE C-level
    vectorized regex (the same hot-key-extraction shape as the _pst_
    protocol-status scan, stages/jobs.py) and fold per-event-type
    (count, sum, min, max) — per-batch partials, driver fold bounded by
    types x blocks (the kmeans-partial pattern, no exchange). A real
    deployment would promote ``k`` to a typed column at the writer
    (SURVEY §1.3); this is the scan that earns that promotion."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # rows without a parseable "k" are excluded entirely (missing
        # keys are the NORMAL case for semi-structured data; the oracle
        # filters on TRY_CAST the same way), so the op is total
        k = df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "k": k.to_numpy(dtype=object)}).dropna(subset=["k"])
        g["k"] = g["k"].astype(np.int64)
        agg = g.groupby("event_type", sort=False)["k"].agg(
            n="size", k_sum="sum", k_min="min", k_max="max").reset_index()
        for c in ("n", "k_sum", "k_min", "k_max"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), k_sum=("k_sum", "sum"),
        k_min=("k_min", "min"), k_max=("k_max", "max"))
    for c in ("n", "k_sum", "k_min", "k_max"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


_PROPS_STATS_SQL = r"""
WITH v AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       COUNT(*)::BIGINT AS n,
       SUM(k)::BIGINT AS k_sum,
       MIN(k)::BIGINT AS k_min,
       MAX(k)::BIGINT AS k_max
FROM v WHERE k IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_hits(sf_dir: str):
    """Two-iteration unnormalized HITS over the order->part edge graph
    (ops/rank.hits_scores) — the hub/authority complement of linkrank,
    Dataset-native (co-groups, no actors) and all-integer, so bit-exact
    vs SQL with no float caveats."""
    from ..ops.rank import hits_scores

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": "o" + df["l_orderkey"].astype(str),
            "dst": "p" + df["l_partkey"].astype(str)})

    out = hits_scores(li.map_batches(to_edges, batch_format="pandas"),
                      n_buckets=32).to_pandas()
    out["hub"] = out["hub"].astype(np.int64)
    out["auth"] = out["auth"].astype(np.int64)
    return out[["url", "hub", "auth"]].sort_values("url").reset_index(drop=True)


_HITS_SQL = """
WITH e AS (
  SELECT 'o' || l_orderkey AS src, 'p' || l_partkey AS dst FROM lineitem
),
a1 AS (SELECT dst, COUNT(*)::BIGINT AS a FROM e GROUP BY dst),
h1 AS (SELECT e.src, SUM(a1.a)::BIGINT AS h FROM e JOIN a1 USING (dst) GROUP BY e.src),
a2 AS (SELECT e.dst, SUM(h1.h)::BIGINT AS a FROM e JOIN h1 USING (src) GROUP BY e.dst),
nodes AS (SELECT DISTINCT src AS url FROM e UNION SELECT DISTINCT dst FROM e)
SELECT n.url,
       CAST(coalesce(h1.h, 0) AS BIGINT) AS hub,
       CAST(coalesce(a2.a, 0) AS BIGINT) AS auth
FROM nodes n
LEFT JOIN h1 ON h1.src = n.url
LEFT JOIN a2 ON a2.dst = n.url
ORDER BY n.url
"""


def q_collapse_repeats(sf_dir: str):
    """Consecutive-duplicate-token collapse (ops/text.collapse_repeats):
    zero-shuffle vectorized rewrite, whitespace-normalizing re-join."""
    from ..ops.text import collapse_repeats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = ds.map_batches(collapse_repeats, batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_collapsed"] = out["n_collapsed"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_COLLAPSE_REPEATS_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS t
  FROM documents
),
e AS (
  SELECT doc_id, t[s.i] AS w, s.i AS i
  FROM tok, UNNEST(range(1, len(t) + 1)) AS s(i)
),
f AS (
  SELECT doc_id, w, i,
         lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw
  FROM e
),
per_doc AS (
  SELECT doc_id,
         string_agg(w, ' ' ORDER BY i)
           FILTER (WHERE pw IS NULL OR w <> pw) AS text_clean,
         count(*) FILTER (WHERE pw IS NOT NULL AND w = pw) AS n_collapsed
  FROM f GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.text_clean, '') AS text_clean,
       CAST(coalesce(p.n_collapsed, 0) AS BIGINT) AS n_collapsed
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


def q_pmi_topk(sf_dir: str):
    """Top-20 adjacent-token collocations by PMI (ops/vocab.pmi_topk):
    one scan emitting unigram + pair partials, two chained bucketed
    exchanges attach both marginals with no broadcast, per-bucket top-k
    prunes on the W/T-invariant rank key."""
    from ..ops.vocab import pmi_topk

    ds = _read(sf_dir, "documents", columns=["text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    return pmi_topk(ds, k=20, min_count=3, n_buckets=32).reset_index(drop=True)


_PMI_TOPK_SQL = r"""
WITH tok AS (
  SELECT regexp_extract_all(lower(coalesce(text, '')), '\S+') AS t
  FROM documents
),
uni AS (SELECT unnest(t) AS w FROM tok),
ucnt AS (SELECT w, COUNT(*)::BIGINT AS c FROM uni GROUP BY w),
tots AS (SELECT SUM(c)::BIGINT AS wtot FROM ucnt),
pairs AS (
  SELECT t[i.i] AS a, t[i.i + 1] AS b
  FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
  WHERE len(t) >= 2
),
pcnt AS (SELECT a, b, COUNT(*)::BIGINT AS cnt FROM pairs GROUP BY a, b),
ptot AS (SELECT SUM(cnt)::BIGINT AS ttot FROM pcnt)
SELECT p.a, p.b, p.cnt, ua.c AS ca, ub.c AS cb,
       CAST(floor((ln(p.cnt) + 2.0 * ln(wtot) - ln(ttot) - ln(ua.c) - ln(ub.c))
                  * 1000000 + 0.5) AS BIGINT) AS pmi_micro
FROM pcnt p
JOIN ucnt ua ON ua.w = p.a
JOIN ucnt ub ON ub.w = p.b, tots, ptot
WHERE p.cnt >= 3
ORDER BY pmi_micro DESC, a ASC, b ASC
LIMIT 20
"""


def q_softdedup(sf_dir: str):
    """SoftDeDup duplication-aware reweighting (ops/softdedup.py):
    per-doc n-gram commonness sum + integer sampling weight, same
    one-exchange shape as dup_spans (all occurrences of a gram land in
    one bucket, so the global count is exact per bucket)."""
    from ..ops.softdedup import softdedup_commonness

    out = softdedup_commonness(
        _read(sf_dir, "documents", columns=["doc_id", "text"],
              min_block_bytes=_EXCHANGE_BLOCK_BYTES),
        n=3,
    ).to_pandas()
    out = out[["doc_id", "n_grams", "commonness", "weight_micro"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_SOFTDEDUP_SQL = """
WITH w AS (SELECT doc_id, regexp_extract_all(coalesce(text,''), '\\S+') AS ws FROM documents),
spans AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS span
  FROM w, UNNEST(range(1, len(ws) - 3 + 2)) AS t(i)
),
cnt AS (SELECT span, COUNT(*) AS c FROM spans GROUP BY span),
per_doc AS (
  SELECT spans.doc_id, COUNT(*) AS n_grams, SUM(cnt.c) AS commonness
  FROM spans JOIN cnt USING (span) GROUP BY spans.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.commonness, 0) AS BIGINT) AS commonness,
       CAST(CASE WHEN COALESCE(p.commonness, 0) > 0
                 THEN (p.n_grams * 1000000) // p.commonness
                 ELSE 0 END AS BIGINT) AS weight_micro
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


def q_simhash(sf_dir: str):
    """SimHash near-dup pairs (hamming <= 3). The 4x16-bit band blocking
    is lossless for hamming <= 3 (pigeonhole), so the oracle is the
    plain all-pairs hamming scan over SQL-recomputed simhashes."""
    from ..ops.dedup import simhash_pairs

    out = simhash_pairs(_read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)).to_pandas()
    out = _typed_empty(out, {"a": "int64", "b": "int64", "hamming": "int64"})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


_SIMHASH_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
),
cnt AS (SELECT doc_id, t, count(*) AS w FROM tok GROUP BY 1, 2),
th AS (SELECT doc_id, w, CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS h FROM cnt),
bits AS (
  SELECT doc_id, b.i AS bit,
         sum(CASE WHEN (h >> b.i) & 1 = 1 THEN w ELSE -w END) AS acc
  FROM th, (SELECT unnest(range(64)) AS i) b
  GROUP BY 1, 2
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0 THEN CAST(1 AS HUGEINT) << bit ELSE 0 END) AS UBIGINT) AS s
  FROM bits GROUP BY doc_id
)
SELECT x.doc_id AS a, y.doc_id AS b, bit_count(xor(x.s, y.s)) AS hamming
FROM sh x JOIN sh y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.s, y.s)) <= 3
ORDER BY a, b
"""


def q_char_entropy(sf_dir: str):
    """Char-distribution quality signal (ops/text.char_entropy): per-doc
    Shannon entropy in the integer-exact layout (ent_num = sum of
    count x per-distinct-count-rounded ln), pure map, zero shuffle."""
    from ..ops.text import char_entropy

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = char_entropy(df)
        out.insert(0, "doc_id", df["doc_id"].to_numpy(np.int64))
        return out[["doc_id", "n_chars", "distinct_chars", "ent_num"]]

    out = ds.map_batches(per_batch, batch_format="pandas").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_CHAR_ENTROPY_SQL = """
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '[\s\S]')) AS c
  FROM documents
),
cnt AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY doc_id, c),
agg AS (
  SELECT doc_id,
         SUM(n * CAST(FLOOR(ln(n) * 1000000 + 0.5) AS BIGINT)) AS ent_num,
         COUNT(*) AS distinct_chars, SUM(n) AS n_chars
  FROM cnt GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_chars, 0) AS BIGINT) AS n_chars,
       CAST(coalesce(a.distinct_chars, 0) AS BIGINT) AS distinct_chars,
       CAST(coalesce(a.ent_num, 0) AS BIGINT) AS ent_num
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
"""


def q_text_quality(sf_dir: str):
    """Quality metrics per doc (vectorized; SQL-mirrorable definitions)."""
    from ..ops.text import text_quality

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = ds.map_batches(lambda df: text_quality(df), batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_QUALITY_SQL = """
WITH m AS (
  SELECT doc_id, length(text) AS n_chars,
         length(regexp_extract_all(text, '\\S+')) AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
  CAST(FLOOR(n_alpha * 1.0 / greatest(n_chars, 1) * 1000000 + 0.5) AS BIGINT) AS alpha_ratio_ppm,
  CAST(FLOOR(n_digit * 1.0 / greatest(n_chars, 1) * 1000000 + 0.5) AS BIGINT) AS digit_ratio_ppm,
  CAST(FLOOR(n_alpha * 1.0 / greatest(n_tokens, 1) * 1000000 + 0.5) AS BIGINT) AS avg_token_len_ppm
FROM m ORDER BY doc_id
"""


def q_fingerprint(sf_dir: str):
    """Document fingerprints; groups sharing a fingerprint collapse."""
    from ..ops.text import fingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "fp": fingerprint(df["text"])})

    out = ds.map_batches(fp, batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_FINGERPRINT_SQL = """
SELECT doc_id, md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS fp
FROM documents ORDER BY doc_id
"""


_SUBCOLL_XML = (
    "<subcollections>"
    "<subcollection><name>alpha</name><id>alpha</id>"
    "<whitelist>host1.example\nhost2.example</whitelist>"
    "<blacklist>/doc/11</blacklist>"
    "</subcollection>"
    "<subcollection><name>beta</name><id>beta</id>"
    "<whitelist>.example/doc/7</whitelist>"
    "</subcollection>"
    "</subcollections>"
)


def q_subcollection(sf_dir: str):
    """subcollection plugin over the derived url corpus: assign docs to
    named collections by substring white/black lists
    (Subcollection.java:170-193), exploded to one (url, collection)
    row per membership. Oracle: the same contains() logic in SQL."""
    from ..config import CrawlConfig
    from ..functions.subcollection import SubcollectionIndexingFilter

    cfg = CrawlConfig(extra={"subcollections_xml": _SUBCOLL_XML})

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["metadata"] = None
        out, _ = SubcollectionIndexingFilter().apply(d, cfg)
        rows = out[["url", "subcollection"]].explode("subcollection")
        rows = rows[rows["subcollection"].notna()]
        return pd.DataFrame(
            {"url": rows["url"].to_numpy(),
             "collection": rows["subcollection"].to_numpy()}
        ) if len(rows) else pd.DataFrame(
            {"url": pd.Series(dtype="object"),
             "collection": pd.Series(dtype="object")}
        )

    urls_ds = DV.derived_frontier_ds(
        sf_dir, transform=lambda df, ids: df[["url"]])
    out = urls_ds.map_batches(assign, batch_format="pandas").to_pandas()
    return out.sort_values(["url", "collection"]).reset_index(drop=True)


_SUBCOLL_SQL = f"""
WITH f AS (SELECT {DV.URL_SQL} AS url FROM documents)
SELECT url, 'alpha' AS collection FROM f
 WHERE (contains(url, 'host1.example') OR contains(url, 'host2.example'))
   AND NOT contains(url, '/doc/11')
UNION ALL
SELECT url, 'beta' AS collection FROM f
 WHERE contains(url, '.example/doc/7')
ORDER BY url, collection
"""


def q_token_counts(sf_dir: str):
    """Token counting two ways (build mandate: whitespace + a BPE-ish
    regex): \\S+ runs and GPT-2-style pre-tokenizer pieces."""
    from ..ops.text import bpe_token_count, token_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "ws_tokens": token_count(df["text"]),
            "bpe_tokens": bpe_token_count(df["text"]),
        })

    out = ds.map_batches(counts, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _token_counts_sql() -> str:
    from ..ops.text import BPE_TOKEN_PATTERN

    pat = BPE_TOKEN_PATTERN.replace("'", "''")  # SQL string-literal quoting
    return f"""
SELECT doc_id,
       len(regexp_extract_all(coalesce(text, ''), '\\S+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(coalesce(text, ''), '{pat}'))::BIGINT AS bpe_tokens
FROM documents ORDER BY doc_id
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3/Pile n-gram rule): training docs
    (doc_id % 37 != 0) flagged when they share an 8-gram with the eval
    slice (doc_id % 37 == 0). Broadcast eval-gram set + exchange-free
    vectorized scan (ops/decontaminate.py)."""
    from ..ops.decontaminate import decontaminate

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def _slice(df: pd.DataFrame, is_eval: bool) -> pd.DataFrame:
        m = (df["doc_id"].to_numpy() % 37 == 0)
        return df[m if is_eval else ~m]

    ev = ds.map_batches(lambda df: _slice(df, True), batch_format="pandas")
    tr = ds.map_batches(lambda df: _slice(df, False), batch_format="pandas")
    out = decontaminate(tr, ev, n=8).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["contaminated"] = out["contaminated"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_DECONTAMINATE_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\S+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i.i:i.i+7], ' ') AS g
  FROM tok, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) i
  WHERE len(t) >= 8
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0),
hit AS (
  SELECT DISTINCT gr.doc_id FROM grams gr JOIN ev ON gr.g = ev.g
  WHERE gr.doc_id % 37 <> 0
)
SELECT d.doc_id,
       CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS contaminated
FROM documents d LEFT JOIN hit h USING (doc_id)
WHERE d.doc_id % 37 <> 0
ORDER BY d.doc_id
"""


def q_decontaminate_frac(sf_dir: str):
    """Graded decontamination: per-training-doc 8-gram overlap FRACTION
    vs the eval slice (doc_id % 37 == 0) — n_grams windows, n_hits
    matching windows, frac_micro = floor(hits*1e6/windows). Same
    broadcast-set + exchange-free scan as `decontaminate`, but every
    window is tested (no early exit) so thresholds can be tuned
    (ops/decontaminate.decontaminate_frac)."""
    from ..ops.decontaminate import decontaminate_frac

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def _slice(df: pd.DataFrame, is_eval: bool) -> pd.DataFrame:
        m = (df["doc_id"].to_numpy() % 37 == 0)
        return df[m if is_eval else ~m]

    ev = ds.map_batches(lambda df: _slice(df, True), batch_format="pandas")
    tr = ds.map_batches(lambda df: _slice(df, False), batch_format="pandas")
    out = decontaminate_frac(tr, ev, n=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_DECONTAMINATE_FRAC_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\S+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i.i:i.i+7], ' ') AS g
  FROM tok, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) i
  WHERE len(t) >= 8
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0),
hits AS (
  SELECT gr.doc_id, COUNT(*) AS h
  FROM grams gr JOIN ev ON gr.g = ev.g
  WHERE gr.doc_id % 37 <> 0
  GROUP BY gr.doc_id
)
SELECT t.doc_id,
       CAST(GREATEST(len(t.t) - 7, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hits,
       CAST(CASE WHEN len(t.t) >= 8
                 THEN COALESCE(h.h, 0) * 1000000 // (len(t.t) - 7)
                 ELSE 0 END AS BIGINT) AS frac_micro
FROM tok t LEFT JOIN hits h USING (doc_id)
WHERE t.doc_id % 37 <> 0
ORDER BY t.doc_id
"""


def q_vocab_topk(sf_dir: str):
    """Corpus vocabulary: global top-20 lowercased \\S+ tokens by
    frequency (ops/vocab.vocab_topk — partial counts, one token-hash
    exchange, per-bucket top-k, k x buckets driver merge)."""
    from ..ops.vocab import vocab_topk

    ds = _read(sf_dir, "documents", columns=["text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    return vocab_topk(ds, k=20, n_buckets=32).reset_index(drop=True)


_VOCAB_SQL = r"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS token
      FROM documents)
GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT 20
"""


def q_bpe_pairs(sf_dir: str):
    """BPE merge-candidate statistics: global top-20 adjacent lowercased
    token pairs by count (ops/vocab.pair_topk — the pair-counting pass
    of a BPE tokenizer-training iteration; partial pair counts, one
    pair-hash exchange, per-bucket top-k, k x buckets driver merge).
    Pairs never cross document boundaries."""
    from ..ops.vocab import pair_topk

    ds = _read(sf_dir, "documents", columns=["text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    return pair_topk(ds, k=20, n_buckets=32).reset_index(drop=True)


_BPE_PAIRS_SQL = r"""
WITH tok AS (
  SELECT regexp_extract_all(lower(coalesce(text, '')), '\S+') AS t
  FROM documents
),
pairs AS (
  SELECT t[i.i] || ' ' || t[i.i + 1] AS pair
  FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
  WHERE len(t) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs
GROUP BY pair
ORDER BY cnt DESC, pair ASC
LIMIT 20
"""


def q_hashed_quality(sf_dir: str):
    """fastText-architecture hashed-bag-of-words quality classifier
    (ops/text.hashed_classifier): token -> md5 -> 2^20 feature bucket ->
    integer weight, per-doc sum + sign label. Zero-shuffle scan; the
    weight vector stands in for a trained model (broadcast via ray.put
    in a real deployment)."""
    from ..ops.text import hashed_classifier

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        out = hashed_classifier(df)
        out.insert(0, "doc_id", df["doc_id"].to_numpy(np.int64))
        return out

    res = ds.map_batches(score, batch_format="pandas").to_pandas()
    for c in res.columns:
        res[c] = res[c].astype(np.int64)
    return res.sort_values("doc_id").reset_index(drop=True)


_HASHED_QUALITY_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS t
  FROM documents
),
w AS (
  SELECT doc_id,
         CAST((((CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) % 1048576)
                * 2654435761) % 4294967296 % 2001) AS BIGINT) - 1000 AS wt
  FROM tok
)
SELECT d.doc_id,
       CAST(coalesce(sum(w.wt), 0) AS BIGINT) AS score,
       CAST(len(regexp_extract_all(lower(coalesce(d.text, '')), '\S+')) AS BIGINT)
         AS n_tokens,
       CAST(CASE WHEN coalesce(sum(w.wt), 0) >= 0 THEN 1 ELSE 0 END AS BIGINT)
         AS label
FROM documents d LEFT JOIN w USING (doc_id)
GROUP BY d.doc_id, d.text
ORDER BY d.doc_id
"""


def q_dsir(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023, ops/lm.dsir_weights):
    hashed unigram+bigram bucket multinomials over the target slice
    (doc_id % 37 == 0, the decontaminate eval-slice convention) vs the
    raw rest; every raw doc weighted by its integer-exact log
    importance ratio. Exchange-free count pass (dim=1024 bucket
    partials fold on the driver) + zero-shuffle scoring scan."""
    from ..ops.lm import dsir_weights

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = dsir_weights(ds).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_DSIR_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\S+') AS t
  FROM documents
),
feats AS (
  SELECT doc_id, unnest(t) AS f FROM tok
  UNION ALL
  SELECT doc_id, t[i.i] || ' ' || t[i.i + 1] AS f
  FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
  WHERE len(t) >= 2
),
fb AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(f), 1, 16)) AS UBIGINT) % 1024
              AS BIGINT) AS b
  FROM feats
),
cnt AS (
  SELECT b,
         SUM(CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END) AS t_b,
         SUM(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END) AS r_b
  FROM fb GROUP BY b
),
tot AS (
  SELECT CAST(FLOOR(ln(coalesce(SUM(r_b), 0) + 1024) * 1000000 + 0.5) AS BIGINT)
       - CAST(FLOOR(ln(coalesce(SUM(t_b), 0) + 1024) * 1000000 + 0.5) AS BIGINT)
         AS shift
  FROM cnt
),
term AS (
  SELECT b,
         CAST(FLOOR(ln(t_b + 1) * 1000000 + 0.5) AS BIGINT)
       - CAST(FLOOR(ln(r_b + 1) * 1000000 + 0.5) AS BIGINT) AS dterm
  FROM cnt
),
docf AS (
  SELECT fb.doc_id, count(*) AS n, SUM(term.dterm) AS s
  FROM fb JOIN term USING (b)
  WHERE fb.doc_id % 37 <> 0
  GROUP BY fb.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(df.n, 0) AS BIGINT) AS n_features,
       CAST(coalesce(df.s, 0)
            + coalesce(df.n, 0) * (SELECT shift FROM tot) AS BIGINT)
         AS logw_micro
FROM documents d LEFT JOIN docf df ON d.doc_id = df.doc_id
WHERE d.doc_id % 37 <> 0
ORDER BY d.doc_id
"""


def q_dsir_select(sf_dir: str):
    """DSIR selection (ops/lm.dsir_select): raw docs at or above the
    corpus-wide PERCENTILE_DISC(0.75) cutoff of the DSIR importance
    weight — the paper's resampling as a deterministic quantile
    threshold. Cutoff from the exact distributed value histogram."""
    from ..ops.lm import dsir_select

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = dsir_select(ds, p=0.75).to_pandas()
    out = _typed_empty(out, {"doc_id": "int64", "logw_micro": "int64"})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_DSIR_SELECT_SQL = (
    "WITH w AS (" + _DSIR_SQL + "),\n"
    + """cut AS (
  SELECT percentile_disc(0.75) WITHIN GROUP (ORDER BY logw_micro) AS c FROM w
)
SELECT doc_id, logw_micro FROM w, cut WHERE logw_micro >= cut.c
ORDER BY doc_id
""")



def q_distinct_ngrams(sf_dir: str):
    """Per-source trigram diversity (ops/datacard.distinct_ngrams):
    distinct-n self-repetition metric — (source, n_grams, n_distinct,
    distinct_ppm). One gram-hash exchange; per-bucket distinct counts
    sum exactly (each gram lives in one bucket)."""
    from ..ops.datacard import distinct_ngrams

    ds = _read(sf_dir, "documents", columns=["source", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = distinct_ngrams(ds, n=3)
    for c in ("n_grams", "n_distinct", "distinct_ppm"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


_DISTINCT_NGRAMS_SQL = r"""
WITH tok AS (
  SELECT source, regexp_extract_all(coalesce(text, ''), '\S+') AS t
  FROM documents
),
g AS (
  SELECT source, array_to_string(t[i.i:i.i + 2], ' ') AS g
  FROM tok, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) i
  WHERE len(t) >= 3
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       CAST((1000000 * count(DISTINCT g)) // count(*) AS BIGINT) AS distinct_ppm
FROM g GROUP BY source ORDER BY source
"""


def q_source_overlap(sf_dir: str):
    """Cross-source 8-gram overlap matrix (ops/datacard.source_overlap):
    distinct shared grams per unordered source pair — the corpus
    contamination audit. One gram-hash exchange; per-gram source sets
    resolve in-bucket; driver folds <= |sources|^2/2 rows."""
    from ..ops.datacard import source_overlap

    ds = _read(sf_dir, "documents", columns=["source", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = source_overlap(ds, n=8)
    out["shared"] = out["shared"].astype(np.int64)
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


_SOURCE_OVERLAP_SQL = r"""
WITH tok AS (
  SELECT source, regexp_extract_all(coalesce(text, ''), '\S+') AS t
  FROM documents
),
g AS (
  SELECT source, array_to_string(t[i.i:i.i + 7], ' ') AS g
  FROM tok, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) i
  WHERE len(t) >= 8
),
sg AS (SELECT DISTINCT source, g FROM g)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(count(*) AS BIGINT) AS shared
FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY src_a, src_b
"""



def q_dedup_keep_best(sf_dir: str):
    """Normalized exact dedup with the KEEP-BEST winner policy
    (ops/dedup.exact_dedup_keep_best): the longest original text
    survives its signature group (tie: min doc_id) — production stacks
    keep the best-formatted duplicate, not the first-seen."""
    from ..ops.dedup import exact_dedup_keep_best

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = _typed_empty(exact_dedup_keep_best(ds).to_pandas(),
                       {"doc_id": "int64", "dup_of": "int64"})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_DEDUP_KEEP_BEST_SQL = r"""
WITH s AS (
  SELECT doc_id,
         md5(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS sig,
         len(coalesce(text, '')) AS n
  FROM documents
),
r AS (
  SELECT doc_id, sig,
         first_value(doc_id) OVER (PARTITION BY sig ORDER BY n DESC, doc_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS dup_of,
         row_number() OVER (PARTITION BY sig ORDER BY n DESC, doc_id ASC) AS rn
  FROM s
)
SELECT doc_id, dup_of FROM r WHERE rn > 1 ORDER BY doc_id
"""



def q_winnow(sf_dir: str):
    """Winnowing fingerprint selection (Schleimer et al. 2003 / MOSS,
    ops/text.winnow_fingerprints): per-window leftmost-min of 40-bit
    k-gram hashes packed with position; per-doc distinct selected set.
    Zero-shuffle per-doc map."""
    from ..ops.text import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = ds.map_batches(winnow_fingerprints, batch_format="pandas").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_WINNOW_SQL = r"""
WITH s AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
g AS (
  SELECT doc_id, i.i - 1 AS pos,
         CAST(CAST(('0x' || substr(md5(substr(t, i.i, 8)), 1, 16)) AS UBIGINT)
              % 1099511627776 AS BIGINT) AS fp
  FROM s, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) i
  WHERE len(t) >= 8
),
k AS (SELECT doc_id, pos, fp * 1048576 + pos AS key FROM g),
wmin AS (
  SELECT doc_id, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM k
),
sel AS (
  SELECT DISTINCT doc_id, mk AS key FROM wmin
  WHERE (m > 4 AND pos <= m - 4) OR (m <= 4 AND pos = 0)
),
agg AS (
  SELECT doc_id, count(*) AS n_selected,
         SUM(key % 2147483648) AS sel_sum
  FROM sel GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(greatest(len(coalesce(d.text, '')) - 7, 0) AS BIGINT) AS n_kgrams,
       CAST(coalesce(a.n_selected, 0) AS BIGINT) AS n_selected,
       CAST(coalesce(a.sel_sum, 0) AS BIGINT) AS sel_sum
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""



def q_curriculum_bins(sf_dir: str):
    """Curriculum quantile binning (ops/sample.curriculum_bins): each
    doc tagged with its quartile bin of whitespace token count — exact
    PERCENTILE_DISC cut points from the distributed value histogram,
    then a broadcast-cutpoint map. Values equal to a cut stay in the
    lower bin."""
    from ..ops.sample import curriculum_bins
    from ..ops.text import token_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def value_pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "value": token_count(df["text"].fillna(""))})

    out = curriculum_bins(ds, value_pre, ps=(0.25, 0.5, 0.75)).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_CURRICULUM_SQL = r"""
WITH m AS (
  SELECT doc_id,
         len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS value
  FROM documents
),
c AS (
  SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS c1,
         percentile_disc(0.50) WITHIN GROUP (ORDER BY value) AS c2,
         percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS c3
  FROM m
)
SELECT doc_id, value,
       CAST((CASE WHEN value > c1 THEN 1 ELSE 0 END)
          + (CASE WHEN value > c2 THEN 1 ELSE 0 END)
          + (CASE WHEN value > c3 THEN 1 ELSE 0 END) AS BIGINT) AS bin
FROM m CROSS JOIN c ORDER BY doc_id
"""


def q_token_kl(sf_dir: str):
    """Per-source token-distribution drift KL(P_source || P_corpus)
    (ops/vocab.token_kl_drift): integer-exact kl_num layout, one
    token-hash exchange."""
    from ..ops.vocab import token_kl_drift

    ds = _read(sf_dir, "documents", columns=["source", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = token_kl_drift(ds, group_col="source")
    out = out[["source", "n_tokens", "kl_num"]].copy()
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    out["kl_num"] = out["kl_num"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


_TOKEN_KL_SQL = r"""
WITH tok AS (
  SELECT source, unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS t
  FROM documents
),
gt AS (SELECT source, t, COUNT(*) AS n_gt FROM tok GROUP BY source, t),
tt AS (SELECT t, SUM(n_gt) AS n_t FROM gt GROUP BY t),
gs AS (SELECT source, SUM(n_gt) AS n_g FROM gt GROUP BY source),
tot AS (SELECT SUM(n_gt) AS n FROM gt),
terms AS (
  SELECT g.source,
         g.n_gt * (CAST(FLOOR(ln(g.n_gt) * 1000000 + 0.5) AS BIGINT)
                 - CAST(FLOOR(ln(s.n_g) * 1000000 + 0.5) AS BIGINT)
                 - CAST(FLOOR(ln(t.n_t) * 1000000 + 0.5) AS BIGINT)
                 + CAST(FLOOR(ln(tot.n) * 1000000 + 0.5) AS BIGINT)) AS term
  FROM gt g JOIN tt t USING (t)
  JOIN gs s ON g.source IS NOT DISTINCT FROM s.source
  CROSS JOIN tot
)
SELECT s.source, CAST(s.n_g AS BIGINT) AS n_tokens,
       CAST(SUM(term) AS BIGINT) AS kl_num
FROM terms tr JOIN gs s ON tr.source IS NOT DISTINCT FROM s.source
GROUP BY s.source, s.n_g ORDER BY s.source
"""


def q_token_quantiles(sf_dir: str):
    """Exact per-language PERCENTILE_DISC of whitespace token counts
    via the distributed value-histogram (ops/vocab.grouped_int_
    quantiles): the exchange moves (lang, value, cnt) histogram rows,
    never documents."""
    from ..ops.text import token_count
    from ..ops.vocab import grouped_int_quantiles

    ds = _read(sf_dir, "documents", columns=["lang", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def value_pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lang": df["lang"].to_numpy(),
                             "value": token_count(df["text"])})

    out = grouped_int_quantiles(ds, value_pre, ps=(0.25, 0.5, 0.9, 0.99),
                                group_col="lang")
    out["value"] = out["value"].astype(np.int64)
    return out.sort_values(["lang", "p"]).reset_index(drop=True)


_TOKEN_QUANTILES_SQL = r"""
WITH t AS (
  SELECT lang,
         CAST(len(regexp_extract_all(coalesce(text, ''), '\S+')) AS BIGINT) AS ws
  FROM documents
)
SELECT lang, p, CAST(v AS BIGINT) AS value FROM (
  SELECT lang, 0.25 AS p, percentile_disc(0.25) WITHIN GROUP (ORDER BY ws) AS v FROM t GROUP BY lang
  UNION ALL
  SELECT lang, 0.5  AS p, percentile_disc(0.5)  WITHIN GROUP (ORDER BY ws) AS v FROM t GROUP BY lang
  UNION ALL
  SELECT lang, 0.9  AS p, percentile_disc(0.9)  WITHIN GROUP (ORDER BY ws) AS v FROM t GROUP BY lang
  UNION ALL
  SELECT lang, 0.99 AS p, percentile_disc(0.99) WITHIN GROUP (ORDER BY ws) AS v FROM t GROUP BY lang
)
ORDER BY lang, p
"""


def q_pack_tokens(sf_dir: str):
    """Token-budget shard packing (training-data curation): documents in
    doc_id order greedily fill ~4096-token shards; shard = the doc's
    START offset // budget, computed via the distributed two-pass range
    prefix sum (ops/pack.py). Oracle: a window cumsum."""
    from ..ops.pack import pack_by_token_budget

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = pack_by_token_budget(ds, budget=4096, range_size=128).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_PACK_SQL = """
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(coalesce(text, ''), '\\S+'))::BIGINT AS tokens
  FROM documents
)
SELECT doc_id, tokens,
       ((sum(tokens) OVER (ORDER BY doc_id) - tokens) // 4096)::BIGINT AS shard
FROM t ORDER BY doc_id
"""


def q_pack_shuffled(sf_dir: str):
    """Deterministic hash-shuffled token packing (ops/pack.pack_shuffled):
    docs ordered by md5(doc_id) — shuffle-before-sharding with no RNG
    and no random_shuffle all-to-all — then budget-packed by the same
    distributed prefix sum (ranges = key >> 48)."""
    from ..ops.pack import pack_shuffled

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    # 256 ranges at harness scale (the 48-bit default is the 10^10 tier)
    out = pack_shuffled(ds, budget=4096, range_shift=56).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_PACK_SHUFFLED_SQL = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS key
  FROM documents
)
SELECT doc_id, tokens,
       ((sum(tokens) OVER (ORDER BY key, doc_id) - tokens) // 4096)::BIGINT AS shard
FROM t ORDER BY doc_id
"""


def q_bigram_nll(sf_dir: str):
    """CCNet-style LM perplexity filter (ops/lm.bigram_nll): add-one
    bigram model trained on the deterministic 20% id-hash sample,
    min_count=2 pruning, integer-exact L(x)=round(ln x * 1e6) terms;
    every doc scored by a zero-shuffle broadcast-merge map."""
    from ..ops.lm import bigram_nll

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = _typed_empty(bigram_nll(ds, sample_pct=20, min_count=2).to_pandas(),
                       {"doc_id": "int64", "n_bigrams": "int64",
                        "nll_micro": "int64"})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_BIGRAM_NLL_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\S+') AS t
  FROM documents
),
samp AS (
  SELECT doc_id, t FROM tok
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        % 100 < 20
),
uni AS (
  SELECT w, count(*)::BIGINT AS cu
  FROM (SELECT unnest(t) AS w FROM samp) GROUP BY w
),
v AS (SELECT count(*)::BIGINT AS v FROM uni),
bi AS (
  SELECT w1, w2, count(*)::BIGINT AS cb FROM (
    SELECT t[i.i] AS w1, t[i.i+1] AS w2
    FROM samp, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
    WHERE len(t) >= 2
  ) GROUP BY w1, w2 HAVING count(*) >= 2
),
pos AS (
  SELECT doc_id, t[i.i] AS w1, t[i.i+1] AS w2
  FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
  WHERE len(t) >= 2
),
terms AS (
  SELECT p.doc_id,
         (FLOOR(ln(coalesce(u.cu, 0) + v.v) * 1e6 + 0.5)::BIGINT
          - FLOOR(ln(coalesce(b.cb, 0) + 1) * 1e6 + 0.5)::BIGINT) AS nt
  FROM pos p CROSS JOIN v
  LEFT JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2
  LEFT JOIN uni u ON p.w1 = u.w
),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(nt)::BIGINT AS nll_micro
  FROM terms GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(per.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(per.nll_micro, 0)::BIGINT AS nll_micro
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def q_mixture_sample(sf_dir: str):
    """Data-mixture resampling (ops/sample.mixture_sample): src0 at
    250% (2-3 epochs), src1 at 150%, src2 dropped, everything else at
    50% — deterministic id-hash copies, zero shuffle."""
    from ..ops.sample import mixture_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = _typed_empty(
        mixture_sample(ds, {"src0": 250, "src1": 150, "src2": 0},
                       default_pct=50).to_pandas(),
        {"doc_id": "int64", "source": "object", "copy": "int64"})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["copy"] = out["copy"].astype(np.int64)
    return out.sort_values(["doc_id", "copy"]).reset_index(drop=True)


_MIXTURE_SQL = """
WITH b AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
           % 100 AS bkt,
         CASE source WHEN 'src0' THEN 250 WHEN 'src1' THEN 150
                     WHEN 'src2' THEN 0 ELSE 50 END AS rate
  FROM documents
),
n AS (
  SELECT doc_id, source,
         (rate // 100
          + CASE WHEN bkt < rate % 100 THEN 1 ELSE 0 END)::BIGINT AS copies
  FROM b
)
SELECT doc_id, source, c.c::BIGINT AS copy
FROM n, LATERAL (SELECT unnest(range(0, copies)) AS c) c
ORDER BY doc_id, copy
"""


def q_chunk_docs(sf_dir: str):
    """Line-boundary document chunking (ops/pack.chunk_docs): each doc
    splits into ~512-token context chunks, a line's chunk decided by
    its doc-local START offset (prefix rule). Pure vectorized per-batch
    map, zero shuffle."""
    from ..ops.pack import chunk_docs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = _typed_empty(chunk_docs(ds, budget=512).to_pandas(),
                       {"doc_id": "int64", "chunk": "int64",
                        "n_lines": "int64", "tokens": "int64"})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["doc_id", "chunk"]).reset_index(drop=True)


_CHUNK_DOCS_SQL = r"""
WITH arr AS (
  SELECT doc_id, regexp_split_to_array(coalesce(text, ''), '\n') AS a
  FROM documents
),
lines AS (
  SELECT doc_id, i.i AS idx, a[i.i] AS line
  FROM arr, LATERAL (SELECT unnest(range(1, len(a) + 1)) AS i) i
),
t AS (
  SELECT doc_id, idx,
         len(regexp_extract_all(line, '\S+'))::BIGINT AS tok
  FROM lines
),
c AS (
  SELECT doc_id, tok,
         ((sum(tok) OVER (PARTITION BY doc_id ORDER BY idx) - tok)
          // 512)::BIGINT AS chunk
  FROM t
)
SELECT doc_id, chunk, count(*)::BIGINT AS n_lines,
       sum(tok)::BIGINT AS tokens
FROM c GROUP BY doc_id, chunk ORDER BY doc_id, chunk
"""


def q_span_dedup(sf_dir: str):
    """Exact duplicate-span removal (Lee et al. 2021 transform,
    ops/linededup.span_dedup): every 8-token span occurring earlier in
    (doc_id, pos) order anywhere in the corpus marks its window; a
    doc's removed region is the union of marked windows; output text =
    kept tokens joined by single spaces. Two exchanges: ids-only
    winner fold on the span string, then one doc_id co-group."""
    from ..ops.linededup import span_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = _typed_empty(span_dedup(ds, k=8, n_buckets=32).to_pandas(),
                       {"doc_id": "int64", "text_clean": "object",
                        "n_removed": "int64"})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_removed"] = out["n_removed"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_SPAN_DEDUP_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, i.i - 1 AS p, array_to_string(t[i.i:i.i + 7], ' ') AS g
  FROM tok, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) i
  WHERE len(t) >= 8
),
marks AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p,
           row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
    FROM grams
  ) WHERE rn > 1
),
toks AS (
  SELECT doc_id, i.i - 1 AS pos, t[i.i] AS tk
  FROM tok, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i
),
kept AS (
  SELECT s.doc_id, s.pos, s.tk
  FROM toks s
  WHERE NOT EXISTS (SELECT 1 FROM marks m
                    WHERE m.doc_id = s.doc_id
                      AND m.p <= s.pos AND s.pos < m.p + 8)
),
agg AS (
  SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS text_clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.text_clean, '') AS text_clean,
       CAST(len(regexp_extract_all(coalesce(d.text, ''), '\S+'))
            - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


def q_line_dedup(sf_dir: str):
    """Global line-level dedup (C4 cross-document span rule at line
    granularity, ops/linededup.py): later occurrences of a duplicated
    non-empty line — global order (doc_id, line_idx) — are removed.
    Two exchanges: ids-only winner fold on the line hash, then one
    doc_id co-group where text moves exactly once."""
    from ..ops.linededup import line_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = _typed_empty(line_dedup(ds, n_buckets=32).to_pandas(),
                       {"doc_id": "int64", "text_clean": "object",
                        "n_dropped": "int64"})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_dropped"] = out["n_dropped"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_LINE_DEDUP_SQL = r"""
WITH arr AS (
  SELECT doc_id, regexp_split_to_array(coalesce(text, ''), '\n') AS a
  FROM documents
),
lines AS (
  SELECT doc_id, i.i AS idx, a[i.i] AS line
  FROM arr, LATERAL (SELECT unnest(range(1, len(a) + 1)) AS i) i
),
ranked AS (
  SELECT doc_id, idx, line,
         CASE WHEN len(line) = 0 THEN 1
              WHEN row_number() OVER (PARTITION BY line
                                      ORDER BY doc_id, idx) = 1 THEN 1
              ELSE 0 END AS keep
  FROM lines
)
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY idx)
                FILTER (WHERE keep = 1), '') AS text_clean,
       (count(*) FILTER (WHERE keep = 0))::BIGINT AS n_dropped
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


def q_llm_corpus(sf_dir: str):
    """The composed end-to-end curation pipeline (ops/corpus.py):
    langid -> Gopher quality -> decontamination -> exact-dedup
    keep-first -> token-budget packing, in ONE streaming flow over the
    documents table — the text is read once, everything after the flag
    pass moves (doc_id, tokens, sig) rows only. Oracle: the five
    stages' verified SQL composed as CTEs."""
    from ..ops.corpus import curate_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = curate_corpus(ds, lang="en", gram_n=8, budget=4096,
                        range_size=128).to_pandas()
    if not len(out):
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "tokens": pd.Series(dtype="int64"),
                            "shard": pd.Series(dtype="int64")})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _llm_corpus_sql() -> str:
    """Composed oracle: the langid pick, Gopher keep, 8-gram
    decontamination, md5 keep-first and prefix-sum packing CTEs — each
    the same SQL its standalone query verifies against."""
    from ..ops.text import _LANG_PROFILES

    score_cols = ",\n    ".join(
        f"len(list_intersect(ts, [{', '.join(repr(w) for w in sorted(stops))}])) AS {lang}"
        for lang, stops in _LANG_PROFILES.items()
    )
    langs = list(_LANG_PROFILES)
    g = "greatest(" + ", ".join(langs) + ")"
    case = f"CASE WHEN {g} = 0 THEN 'und' " + " ".join(
        f"WHEN {l} = {g} THEN '{l}'" for l in langs[:-1]
    ) + f" ELSE '{langs[-1]}' END"
    return rf"""
WITH ltoks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+')[1:200] AS ts FROM documents
),
sc AS (SELECT doc_id, {score_cols} FROM ltoks),
pick AS (SELECT doc_id, {case} AS lang_pred FROM sc),
w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> len(x) > 0) AS words
  FROM documents
), m AS (
  SELECT doc_id,
         len(words) AS wc,
         coalesce(list_sum(list_transform(words, x -> len(x))), 0)::BIGINT AS chars_total,
         len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
         len(list_filter(words, x -> lower(x) IN
             ('the','be','to','of','and','that','have','with'))) AS stop_hits
  FROM w
),
q AS (
  SELECT doc_id FROM m
  WHERE wc >= 50 AND wc <= 100000
    AND chars_total >= 3 * wc AND chars_total <= 10 * wc
    AND alpha_words * 5 > wc * 4 AND stop_hits >= 2
),
tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\S+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i.i:i.i+7], ' ') AS g
  FROM tok, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) i
  WHERE len(t) >= 8
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0),
cont AS (
  SELECT DISTINCT gr.doc_id FROM grams gr JOIN ev ON gr.g = ev.g
  WHERE gr.doc_id % 37 <> 0
),
elig AS (
  SELECT d.doc_id,
         len(regexp_extract_all(coalesce(d.text, ''), '\S+'))::BIGINT AS tokens,
         md5(coalesce(d.text, '')) AS sig
  FROM documents d
  JOIN pick USING (doc_id)
  JOIN q USING (doc_id)
  WHERE pick.lang_pred = 'en' AND d.doc_id % 37 <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM cont)
),
winners AS (
  SELECT doc_id, tokens FROM (
    SELECT doc_id, tokens, min(doc_id) OVER (PARTITION BY sig) AS keeper
    FROM elig
  ) WHERE doc_id = keeper
)
SELECT doc_id, tokens,
       ((sum(tokens) OVER (ORDER BY doc_id) - tokens) // 4096)::BIGINT AS shard
FROM winners ORDER BY doc_id
"""


def q_interleaved_pack(sf_dir: str):
    """Multimodal token-budget packing over the INTERLEAVED span table
    (input_hint shape, derived: DV.derived_spans_ds): text spans cost
    whitespace tokens, each media span a flat 256 vision tokens; shards
    via the distributed prefix sum (ops/interleaved.interleaved_pack).
    Zero-copy Arrow list handling end to end."""
    from ..ops.interleaved import interleaved_pack

    out = interleaved_pack(DV.derived_spans_ds(sf_dir), budget=8192,
                           media_token_cost=256, range_size=128).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_INTERLEAVED_PACK_SQL = f"""
WITH sp AS ({DV.SPANS_SQL}),
c AS (
  SELECT doc_id,
         SUM(CASE WHEN {DV.SPAN_IS_MEDIA_SQL} THEN 0
                  ELSE {DV.SPAN_TOKENS_SQL} END) AS text_tokens,
         SUM(CASE WHEN {DV.SPAN_IS_MEDIA_SQL} THEN 1 ELSE 0 END) AS media_spans
  FROM sp GROUP BY doc_id
),
c2 AS (SELECT doc_id, text_tokens, media_spans,
              text_tokens + 256 * media_spans AS cost FROM c)
SELECT CAST(text_tokens AS BIGINT) AS text_tokens,
       CAST(media_spans AS BIGINT) AS media_spans,
       doc_id,
       CAST(cost AS BIGINT) AS tokens,
       CAST((SUM(cost) OVER (ORDER BY doc_id) - cost) // 8192 AS BIGINT) AS shard
FROM c2 ORDER BY doc_id
"""


def q_media_dedup(sf_dir: str):
    """Cross-document media-ref dedup over the interleaved span table:
    refs shared by >= 2 docs with the min-id canonical owner (fetch /
    decode each asset once). ops/interleaved.media_ref_groups."""
    from ..ops.interleaved import media_ref_groups

    out = media_ref_groups(DV.derived_spans_ds(sf_dir), min_docs=2).to_pandas()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["canonical"] = out["canonical"].astype(np.int64)
    return out.sort_values("media_ref").reset_index(drop=True)


_MEDIA_DEDUP_SQL = f"""
WITH sp AS ({DV.SPANS_SQL}),
m AS (
  SELECT DISTINCT doc_id, {DV.SPAN_REF_SQL} AS media_ref
  FROM sp WHERE {DV.SPAN_IS_MEDIA_SQL}
)
SELECT media_ref, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical
FROM m GROUP BY media_ref HAVING COUNT(*) >= 2 ORDER BY media_ref
"""


def q_hash_sample(sf_dir: str):
    """Deterministic ~20% corpus sample by doc_id md5 bucket (curation
    sampling; no RNG, stable under repartitioning)."""
    from ..ops.sample import hash_sample

    ds = _read(sf_dir, "documents", columns=["doc_id"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = hash_sample(ds, rate_pct=20).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_HASH_SAMPLE_SQL = """
SELECT doc_id FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 20
ORDER BY doc_id
"""


def q_weighted_sample(sf_dir: str):
    """Efraimidis–Spirakis weighted sampling without replacement over
    documents (w = char length + 1, u = md5-of-id uniform, key =
    ln(u)/w, global top-100 keys). ops/sample.weighted_sample_topk."""
    from ..ops.sample import weighted_sample_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = weighted_sample_topk(ds, k=100)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["w"] = out["w"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_WEIGHTED_SAMPLE_SQL = """
WITH s AS (
  SELECT doc_id, length(coalesce(text, '')) + 1 AS w,
         ln(greatest(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT), 1)
            / 18446744073709551616.0)
           / (length(coalesce(text, '')) + 1) AS key
  FROM documents
),
topk AS (SELECT doc_id, w FROM s ORDER BY key DESC, doc_id ASC LIMIT 100)
SELECT doc_id, CAST(w AS BIGINT) AS w FROM topk ORDER BY doc_id
"""


def q_stratified_topk(sf_dir: str):
    """Per-host quota: at most 3 docs per derived host, highest derived
    score first (tie-broken by score only — scores are distinct by
    construction)."""
    from ..ops.sample import stratified_topk

    def hostify(df, ids):
        return df[["url", "host", "score"]]

    ds = DV.derived_frontier_ds(sf_dir, transform=hostify)
    out = stratified_topk(ds, "host", 3, "score").to_pandas()
    out["score"] = out["score"].astype(np.float64)
    return out[["url", "host", "score"]].sort_values("url").reset_index(drop=True)


_STRATIFIED_SQL = f"""
WITH f AS (
  SELECT {DV.URL_SQL} AS url, {DV.HOST_SQL} AS host, {DV.SCORE_SQL} AS score
  FROM documents
), r AS (
  SELECT url, host, score,
         row_number() OVER (PARTITION BY host ORDER BY score DESC) AS rn
  FROM f
)
SELECT url, host, score FROM r WHERE rn <= 3 ORDER BY url
"""


def q_gopher_quality(sf_dir: str):
    """Gopher-style quality rules (Rae et al. 2021 §A2) over documents,
    integer-arithmetic keep flag. Oracle: the same rules in DuckDB list
    functions."""
    from ..ops.text import gopher_quality

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def rules(df: pd.DataFrame) -> pd.DataFrame:
        return gopher_quality(df.reset_index(drop=True))

    out = ds.map_batches(rules, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_GOPHER_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                     x -> len(x) > 0) AS words
  FROM documents
), m AS (
  SELECT doc_id,
         len(words) AS word_count,
         coalesce(list_sum(list_transform(words, x -> len(x))), 0)::BIGINT AS chars_total,
         len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
         len(list_filter(words, x -> lower(x) IN
             ('the','be','to','of','and','that','have','with'))) AS stop_hits
  FROM w
)
SELECT doc_id, word_count, chars_total, alpha_words, stop_hits,
       CASE WHEN word_count >= 50 AND word_count <= 100000
             AND chars_total >= 3 * word_count
             AND chars_total <= 10 * word_count
             AND alpha_words * 5 > word_count * 4
             AND stop_hits >= 2
            THEN 1 ELSE 0 END::BIGINT AS keep
FROM m ORDER BY doc_id
"""


def q_gopher_repetition(sf_dir: str):
    """Gopher repetition signals (Rae et al. 2021 §A1.1) over documents:
    duplicate-line / duplicate-line-char / duplicate-bigram-char /
    top-bigram-char fractions as floor-ppm integers (ops/text.py).
    Pure per-doc map, zero shuffle; oracle recomputes in DuckDB list +
    window SQL."""
    from ..ops.text import gopher_repetition

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = ds.map_batches(
        lambda df: gopher_repetition(df.reset_index(drop=True)),
        batch_format="pandas",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_GOPHER_REP_SQL = """
WITH lines AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(coalesce(text, ''), '\n'),
                            x -> len(x) > 0)) AS line
  FROM documents
), lg AS (
  SELECT doc_id, line, len(line)::BIGINT AS ln, count(*)::BIGINT AS cnt
  FROM lines GROUP BY 1, 2
), lstats AS (
  SELECT doc_id,
         sum(cnt)::BIGINT AS n_lines,
         count(*)::BIGINT AS n_distinct,
         sum(ln * cnt)::BIGINT AS tot_chars,
         sum(CASE WHEN cnt > 1 THEN ln * cnt ELSE 0 END)::BIGINT AS dup_chars
  FROM lg GROUP BY 1
), toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS ts
  FROM documents
), tstats AS (
  SELECT doc_id,
         coalesce(list_sum(list_transform(ts, x -> len(x))), 0)::BIGINT AS tok_chars
  FROM toks
), bi AS (
  SELECT doc_id,
         ts[i] || ' ' || ts[i+1] AS bg,
         (len(ts[i]) + len(ts[i+1]))::BIGINT AS bl
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
), bg AS (
  SELECT doc_id, bg, bl, count(*)::BIGINT AS cnt FROM bi GROUP BY 1, 2, 3
), bstats AS (
  SELECT doc_id,
         sum(cnt * bl)::BIGINT AS tot_mass,
         max(cnt * bl)::BIGINT AS top_rep,
         sum(CASE WHEN cnt > 1 THEN cnt * bl ELSE 0 END)::BIGINT AS dup_mass
  FROM bg GROUP BY 1
), m AS (
  SELECT d.doc_id,
         coalesce(l.n_lines, 0) AS n_lines,
         CASE WHEN coalesce(l.n_lines, 0) > 0
              THEN ((l.n_lines - l.n_distinct) * 1000000) // l.n_lines
              ELSE 0 END AS dup_line_ppm,
         CASE WHEN coalesce(l.tot_chars, 0) > 0
              THEN (l.dup_chars * 1000000) // l.tot_chars ELSE 0 END AS dup_line_char_ppm,
         CASE WHEN coalesce(b.tot_mass, 0) > 0
              THEN (b.dup_mass * 1000000) // b.tot_mass ELSE 0 END AS dup_bigram_ppm,
         CASE WHEN coalesce(t.tok_chars, 0) > 0
              THEN (coalesce(b.top_rep, 0) * 1000000) // t.tok_chars ELSE 0 END AS top_bigram_ppm
  FROM documents d
  LEFT JOIN lstats l USING (doc_id)
  LEFT JOIN tstats t USING (doc_id)
  LEFT JOIN bstats b USING (doc_id)
)
SELECT doc_id, n_lines::BIGINT AS n_lines,
       dup_line_ppm::BIGINT AS dup_line_ppm,
       dup_line_char_ppm::BIGINT AS dup_line_char_ppm,
       dup_bigram_ppm::BIGINT AS dup_bigram_ppm,
       top_bigram_ppm::BIGINT AS top_bigram_ppm,
       CASE WHEN dup_line_ppm <= 300000 AND dup_line_char_ppm <= 200000
             AND top_bigram_ppm <= 200000 THEN 1 ELSE 0 END::BIGINT AS keep
FROM m ORDER BY doc_id
"""


def q_c4_filters(sf_dir: str):
    """C4 page-level cleaning flags (Raffel et al. 2020 §2.2) over
    documents; integer flags, exact SQL mirror."""
    from ..ops.text import c4_page_filters

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = ds.map_batches(
        lambda df: c4_page_filters(df.reset_index(drop=True)),
        batch_format="pandas",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_C4_SQL = """
SELECT doc_id,
       len(regexp_extract_all(coalesce(text, ''), '[.!?]'))::BIGINT AS n_sentences,
       CASE WHEN contains(lower(coalesce(text, '')), 'lorem ipsum') THEN 1 ELSE 0 END::BIGINT AS has_lorem,
       CASE WHEN contains(coalesce(text, ''), '{') THEN 1 ELSE 0 END::BIGINT AS has_brace,
       CASE WHEN len(regexp_extract_all(coalesce(text, ''), '[.!?]')) >= 5
             AND NOT contains(lower(coalesce(text, '')), 'lorem ipsum')
             AND NOT contains(coalesce(text, ''), '{')
            THEN 1 ELSE 0 END::BIGINT AS keep
FROM documents ORDER BY doc_id
"""


def q_langid(sf_dir: str):
    """Language-ID heuristic counts per predicted lang. Oracle: the
    stopword-profile argmax (first language in profile order wins ties)
    recomputed in SQL."""
    from ..ops.text import langid

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def lid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lang_pred": langid(df["text"])})

    out = ds.map_batches(lid, batch_format="pandas").groupby("lang_pred").count().to_pandas()
    out = out.rename(columns={"count()": "n"})
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("lang_pred").reset_index(drop=True)


def _langid_sql() -> str:
    from ..ops.text import _LANG_PROFILES

    score_cols = ",\n    ".join(
        f"len(list_intersect(ts, [{', '.join(repr(w) for w in sorted(stops))}])) AS {lang}"
        for lang, stops in _LANG_PROFILES.items()
    )
    langs = list(_LANG_PROFILES)
    g = "greatest(" + ", ".join(langs) + ")"
    case = f"CASE WHEN {g} = 0 THEN 'und' " + " ".join(
        f"WHEN {l} = {g} THEN '{l}'" for l in langs[:-1]
    ) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+')[1:200] AS ts FROM documents
),
sc AS (
  SELECT doc_id,
    {score_cols}
  FROM toks
),
pick AS (SELECT doc_id, {case} AS lang_pred FROM sc)
SELECT lang_pred, count(*) AS n FROM pick GROUP BY 1 ORDER BY 1
"""


def q_knn_cosine(sf_dir: str):
    """Brute-force cosine top-10 for queries vec_id < 8."""
    from ..ops.knn import knn_brute

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = knn_brute(ds, query_ids=list(range(8)), k=10).to_pandas()
    out = out[["query_id", "neighbor_id", "rank"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


_KNN_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT q.qid, e.vec_id AS nid,
         round(list_cosine_similarity(q.qe, e.embedding), 6) AS sim
  FROM embeddings e, q WHERE e.vec_id <> q.qid
),
r AS (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
  FROM s
)
SELECT qid AS query_id, nid AS neighbor_id, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs (sim >= 0.45; a<b)."""
    from ..ops.knn import embedding_neardup_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = _typed_empty(embedding_neardup_pairs(ds, threshold=0.45).to_pandas(),
                       {"a": "int64", "b": "int64"})[["a", "b"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_embedding_neardup_lsh(sf_dir: str):
    """Hyperplane-LSH near-dup pairs (the sub-quadratic scale path).
    Approximate by construction — found pairs are exact-verified inside
    their bucket, so every returned pair satisfies the threshold, but
    recall < 1 is possible. Oracled: _embedding_lsh_sql embeds the
    seeded hyperplane matrix as SQL literals and replicates the
    bucket + verify pipeline in DuckDB."""
    from ..ops.knn import embedding_neardup_lsh

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = _typed_empty(
        embedding_neardup_lsh(ds, threshold=0.45, n_tables=24, n_bits=6).to_pandas(),
        {"a": "int64", "b": "int64"})[["a", "b"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


_NEARDUP_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45
ORDER BY a, b
"""


def _embedding_lsh_sql(threshold=0.45, n_tables=24, n_bits=6, dim=64, seed=42):
    """DuckDB equivalent of embedding_neardup_lsh with the seeded
    hyperplane matrix embedded as SQL literals (the same
    constants-in-SQL trick as _minhash_sql). Sign of dot(x, h) is
    invariant under the Python side's L2 normalization, so the SQL
    skips it; candidate buckets and the in-bucket exact verify then
    replicate the LSH pipeline bit-for-bit (modulo dot products within
    float rounding of zero, vanishingly rare for continuous data)."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n_tables * n_bits, dim))
    selects = []
    for t in range(n_tables):
        terms = []
        for b in range(n_bits):
            row = H[t * n_bits + b]
            lit = "[" + ",".join(repr(float(v)) for v in row) + "]"
            terms.append(
                f"(CASE WHEN list_inner_product(embedding, {lit}) > 0 "
                f"THEN {1 << b} ELSE 0 END)"
            )
        selects.append(
            f"SELECT vec_id, {t} AS tbl, " + " + ".join(terms)
            + " AS sig FROM embeddings"
        )
    sigs = "\nUNION ALL\n".join(selects)
    return f"""
WITH sigs AS (
{sigs}
),
cand AS (
  SELECT DISTINCT s1.vec_id AS a, s2.vec_id AS b
  FROM sigs s1 JOIN sigs s2
    ON s1.tbl = s2.tbl AND s1.sig = s2.sig AND s1.vec_id < s2.vec_id
)
SELECT c.a, c.b
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.a
JOIN embeddings eb ON eb.vec_id = c.b
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold}
ORDER BY a, b
"""


def q_dedup_components(sf_dir: str):
    """Dedup clustering: exact embedding near-dup pairs (cosine >= 0.45)
    -> distributed min-label connected components -> (id, rep) with rep
    = the component's minimum vec_id (the KEEP-ONE canonical). Oracle:
    transitive closure via a recursive CTE."""
    from ..ops.dedup import connected_components
    from ..ops.knn import embedding_neardup_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    pairs = embedding_neardup_pairs(ds, threshold=0.45)
    # near-dup graphs are sparse: fewer buckets keep the per-iteration
    # exchange off the micro-block floor at harness scale (the op's
    # 64-bucket default is the 10^10-node setting)
    out = connected_components(pairs, n_buckets=8).to_pandas()
    out["id"] = out["id"].astype(np.int64)
    out["rep"] = out["rep"].astype(np.int64)
    return out.sort_values("id").reset_index(drop=True)


_DEDUP_COMPONENTS_SQL = """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45
),
sym AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
)
SELECT u AS id, least(u, min(v)) AS rep FROM reach GROUP BY u ORDER BY id
"""


def q_neardup_keep_one(sf_dir: str):
    """The composed training-data dedup pipeline: near-dup pairs ->
    connected components -> drop every non-representative member ->
    surviving corpus ids. All three stages distributed (the loser set
    never materializes on the driver: tagged-union anti-join)."""
    from ..ops.agg import bucketed_group_apply
    from ..ops.dedup import connected_components
    from ..ops.knn import embedding_neardup_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    pairs = embedding_neardup_pairs(ds, threshold=0.45)
    comp = connected_components(pairs, n_buckets=8)

    def tag_losers(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["id"].to_numpy() != df["rep"].to_numpy()]
        return pd.DataFrame({"vec_id": d["id"].to_numpy(np.int64),
                             "t": np.int8(1)})

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vec_id": df["vec_id"].to_numpy(np.int64),
                             "t": np.int8(0)})

    tagged = ds.map_batches(tag_docs, batch_format="pandas").union(
        comp.map_batches(tag_losers, batch_format="pandas"))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        losers = set(g.loc[g["t"] == 1, "vec_id"])
        keep = g[(g["t"] == 0) & ~g["vec_id"].isin(losers)]
        return pd.DataFrame({"vec_id": keep["vec_id"].to_numpy(np.int64)})

    out = bucketed_group_apply(tagged, "vec_id", anti).to_pandas()
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


_KEEP_ONE_SQL = """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45
),
sym AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
),
losers AS (
  SELECT u FROM reach GROUP BY u HAVING least(u, min(v)) <> u
)
SELECT e.vec_id FROM embeddings e
WHERE e.vec_id NOT IN (SELECT u FROM losers)
ORDER BY e.vec_id
"""


def q_knn_ivf(sf_dir: str):
    """IVF-bucketed ANN (scale path of knn) with deterministic first-N
    centroid seeding so the exact same IVF algorithm is expressible as
    the SQL oracle; kmeans-mode recall is additionally checked in pytest
    against knn_brute."""
    from ..ops.knn import knn_ivf

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = knn_ivf(ds, query_ids=list(range(8)), k=10, centroid_mode="first").to_pandas()
    out = out[["query_id", "neighbor_id", "rank"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


_KNN_IVF_SQL = """
WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16),
e AS (SELECT vec_id, embedding FROM embeddings),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY round(list_cosine_similarity(e.embedding, c.ce), 6) DESC, c.cid ASC) AS rn
    FROM e, c) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
      row_number() OVER (PARTITION BY q.qid ORDER BY round(list_cosine_similarity(q.qe, c.ce), 6) DESC, c.cid ASC) AS rn
    FROM q, c) WHERE rn <= 4
),
s AS (
  SELECT q.qid, e.vec_id AS nid, round(list_cosine_similarity(q.qe, e.embedding), 6) AS sim
  FROM q JOIN probes p ON p.qid = q.qid
       JOIN asg a ON a.cid = p.cid
       JOIN e ON e.vec_id = a.vec_id
  WHERE e.vec_id <> q.qid
),
r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank FROM s)
SELECT qid AS query_id, nid AS neighbor_id, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_knn_lsh(sf_dir: str):
    """LSH-bucketed ANN: hyperplane-bucket candidate pruning + exact
    re-rank (ops/knn.knn_lsh). Oracled with the hyperplane constants
    embedded in the generated SQL (_knn_lsh_sql)."""
    from ..ops.knn import knn_lsh

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = knn_lsh(ds, query_ids=list(range(8)), k=10,
                  n_tables=8, n_bits=8).to_pandas()
    out = out[["query_id", "neighbor_id", "rank"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _knn_lsh_sql(k=10, n_tables=8, n_bits=8, dim=64, seed=42, n_queries=8):
    """DuckDB twin of knn_lsh: same seeded hyperplanes as SQL literals,
    same bucket-candidate rule, same 6-dp/neighbor-id tie-break."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n_tables * n_bits, dim))
    selects = []
    for t in range(n_tables):
        terms = []
        for b in range(n_bits):
            row = H[t * n_bits + b]
            lit = "[" + ",".join(repr(float(v)) for v in row) + "]"
            terms.append(
                f"(CASE WHEN list_inner_product(embedding, {lit}) > 0 "
                f"THEN {1 << b} ELSE 0 END)"
            )
        selects.append(
            f"SELECT vec_id, {t} AS tbl, " + " + ".join(terms)
            + " AS sig FROM embeddings"
        )
    sigs = "\nUNION ALL\n".join(selects)
    return f"""
WITH sigs AS (
{sigs}
),
cand AS (
  SELECT DISTINCT sq.vec_id AS qid, sx.vec_id AS nid
  FROM sigs sq JOIN sigs sx ON sq.tbl = sx.tbl AND sq.sig = sx.sig
  WHERE sq.vec_id < {n_queries} AND sx.vec_id <> sq.vec_id
),
s AS (
  SELECT c.qid, c.nid,
         round(list_cosine_similarity(eq.embedding, en.embedding), 6) AS sim
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings en ON en.vec_id = c.nid
),
r AS (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
  FROM s
)
SELECT qid AS query_id, nid AS neighbor_id, rank FROM r WHERE rank <= {k}
ORDER BY query_id, rank
"""


def q_window_tumbling(sf_dir: str):
    """Tumbling 1h window per user: event count + value cents."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "value"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    from ..ops.agg import bucketed_sum

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        from ..ops.window import ts_epoch_seconds

        ts_s = ts_epoch_seconds(df["ts"])
        w = (ts_s // 3600) * 3600
        cents = np.floor(df["value"].to_numpy(dtype=np.float64) * 100.0 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(), "window_start": w, "n_events": 1, "value_cents": cents}
        )

    pre = ds.map_batches(to_buckets, batch_format="pandas")
    out = bucketed_sum(pre, ["user_id", "window_start"], ["n_events", "value_cents"]).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["user_id", "window_start"]).reset_index(drop=True)


_TUMBLING_SQL = """
SELECT user_id,
       (CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_sessionize(sf_dir: str):
    """Session windows (gap > 30 min) per user -> session count + events."""
    from ..ops.window import sessionize

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    sess = sessionize(ds, gap_s=1800)

    from ..ops.agg import bucketed_sum

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(n_sessions=1)[["user_id", "n_sessions", "n_events"]]

    pre = sess.map_batches(per_user, batch_format="pandas")
    out = bucketed_sum(pre, "user_id", ["n_sessions", "n_events"]).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


_SESSION_SQL = """
WITH e AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t FROM events
), m AS (
  SELECT user_id, t,
         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                   OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM e
)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM m GROUP BY user_id ORDER BY user_id
"""


def q_media_features(sf_dir: str):
    """Multimodal plumbing: text -> opaque binary payload -> actor-pool
    feature extraction (deterministic fake decode; see ops/media.py)."""
    from ..ops.media import media_features

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def to_binary(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "media": df["text"].map(lambda s: s.encode("utf-8")),
            }
        )

    out = media_features(ds.map_batches(to_binary, batch_format="pandas")).to_pandas()
    out = out[["doc_id", "n_bytes", "width", "height", "n_frames", "kind"]]
    for c in ("doc_id", "n_bytes", "width", "height", "n_frames"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_MEDIA_SQL = """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id, n AS n_bytes, 64 + (n % 577) AS width, 64 + (n % 417) AS height,
       1 + (n % 24) AS n_frames,
       CASE WHEN n % 3 = 0 THEN 'video' WHEN n % 3 = 1 THEN 'image' ELSE 'audio' END AS kind
FROM b ORDER BY doc_id
"""


def q_q1_agg(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate (integer-cents exact)."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        min_block_bytes=_EXCHANGE_BLOCK_BYTES,
    )

    from ..ops.agg import bucketed_sum

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "count_order": 1,
                "sum_qty_cents": _cents(df["l_quantity"].to_numpy(np.float64)),
                "sum_price_cents": _cents(df["l_extendedprice"].to_numpy(np.float64)),
            }
        )

    pre = ds.map_batches(prep, batch_format="pandas")
    out = bucketed_sum(
        pre, ["l_returnflag", "l_linestatus"], ["count_order", "sum_qty_cents", "sum_price_cents"], n_buckets=8
    ).to_pandas()
    for c in ("count_order", "sum_qty_cents", "sum_price_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


_Q1_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS count_order,
       CAST(sum(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_q3_join(sf_dir: str):
    """TPC-H Q3-shaped join: segment-filtered customers' order revenue.

    Distributed semi-join shape (no fact table ever touches the driver):
      * BUILDING custkeys (dimension-sized) are broadcast ONCE via
        ray.put and read per task;
      * orders is filtered distributed and tagged 'o';
      * lineitem revenue is partial-combined per batch and tagged 'l';
      * one bucketed exchange on orderkey joins the two sides.
    """
    import ray

    from ..ops.agg import bucketed_group_apply

    c = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    keys_pd = c.map_batches(
        lambda df: pd.DataFrame(
            {"c_custkey": df.loc[df["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy(np.int64)}
        ),
        batch_format="pandas",
    ).to_pandas()
    keys_ref = ray.put(np.sort(keys_pd["c_custkey"].to_numpy(np.int64)))

    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        keep = ray.get(keys_ref)
        d = df[np.isin(df["o_custkey"].to_numpy(np.int64), keep)]
        return pd.DataFrame(
            {"key": d["o_orderkey"].to_numpy(np.int64),
             "revenue_cents": np.zeros(len(d), dtype=np.int64),
             "__t": np.zeros(len(d), dtype=np.int8)}  # 0 = orders side
        )

    def tag_lineitem(df: pd.DataFrame) -> pd.DataFrame:
        rev = _cents(
            df["l_extendedprice"].to_numpy(np.float64) * (1.0 - df["l_discount"].to_numpy(np.float64))
        )
        d = pd.DataFrame({"key": df["l_orderkey"].to_numpy(np.int64), "revenue_cents": rev})
        d = d.groupby("key", sort=False, as_index=False).sum()
        d["__t"] = np.ones(len(d), dtype=np.int8)  # 1 = lineitem side
        return d

    def _empty_out() -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderkey": pd.Series(dtype="int64"), "revenue_cents": pd.Series(dtype="int64")}
        )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tags = g["__t"].to_numpy()
        o_keys = g.loc[tags == 0, "key"].to_numpy(np.int64)
        l = g[tags == 1]
        if len(o_keys) == 0 or len(l) == 0:
            return _empty_out()
        l = l[np.isin(l["key"].to_numpy(np.int64), np.sort(o_keys))]
        if len(l) == 0:
            return _empty_out()
        agg = l.groupby("key", sort=False, as_index=False)["revenue_cents"].sum()
        return pd.DataFrame(
            {"o_orderkey": agg["key"].to_numpy(np.int64),
             "revenue_cents": agg["revenue_cents"].to_numpy(np.int64)}
        )

    tagged = o.map_batches(tag_orders, batch_format="pandas").union(
        li.map_batches(tag_lineitem, batch_format="pandas")
    )
    out = bucketed_group_apply(tagged, "key", join_bucket).to_pandas()
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out.sort_values("o_orderkey").reset_index(drop=True)


_Q3_SQL = """
SELECT o_orderkey,
       CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey ORDER BY o_orderkey
"""


def q_mergedb(sf_dir: str):
    """J12 CrawlDbMerger (CrawlDbMerger.java:82-119): newest
    calculateLastFetchTime wins. db2 rows are OLDER fetches of every
    3rd url, so they win only against db1 rows that are UNFETCHED
    (lastFetchTime 0)."""
    from ..stages.jobs import mergedb

    def oldify(df, ids):
        df["status"] = CS.DB_FETCHED
        df["fetch_time"] = df["fetch_time"] - 200_000_000_000
        df["score"] = 9.875  # exact in f32/f64
        return df

    db1 = DV.derived_frontier_ds(sf_dir)
    db2 = DV.derived_frontier_ds(
        sf_dir, pred=lambda i: i % 3 == 0, transform=oldify)
    out = mergedb([db1, db2], CrawlConfig()).to_pandas()
    out = out[["url", "status", "fetch_time", "score"]]
    out["status"] = out["status"].astype(np.int64)
    out["fetch_time"] = out["fetch_time"].astype(np.int64)
    out["score"] = out["score"].astype(np.float64)
    return out.sort_values("url").reset_index(drop=True)


_MERGEDB_SQL = f"""
WITH db1 AS (
  SELECT doc_id, {DV.URL_SQL} AS url, {DV.STATUS_CASE_SQL} AS status,
         {DV.FETCH_TIME_SQL} AS fetch_time, {DV.SCORE_SQL} AS score
  FROM documents
), db2 AS (
  SELECT doc_id, {DV.URL_SQL} AS url, 2 AS status,
         {DV.FETCH_TIME_SQL} - 200000000000 AS fetch_time, 9.875 AS score
  FROM documents WHERE doc_id % 3 = 0
)
SELECT db1.url,
  CASE WHEN db2.url IS NOT NULL AND db1.status = 1 THEN db2.status ELSE db1.status END AS status,
  CASE WHEN db2.url IS NOT NULL AND db1.status = 1 THEN db2.fetch_time ELSE db1.fetch_time END AS fetch_time,
  CASE WHEN db2.url IS NOT NULL AND db1.status = 1 THEN db2.score ELSE db1.score END AS score
FROM db1 LEFT JOIN db2 ON db1.url = db2.url
ORDER BY db1.url
"""


def q_criteria_filter(sf_dir: str):
    """index-criteria min-length gate (CriteriaIndexer.java:52,555):
    docs shorter than the threshold are rejected from indexing."""
    from ..functions.enrich import criteria_filter

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        keep = criteria_filter(df, min_length=300)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy()[keep]})

    out = ds.map_batches(gate, batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


_CRITERIA_SQL = """
SELECT doc_id FROM documents WHERE length(text) >= 300 ORDER BY doc_id
"""


def q_linkrank(sf_dir: str):
    """WebGraph/LinkRank analogue (scoring/webgraph/LinkRank): 2 power
    iterations over the order->part edge graph, rank quantized to 4 dp
    with an epsilon-shifted floor (exact-rational .5 ties otherwise flip
    on summation order — observed once at sf0.1)."""
    from ..stages.tools import linkrank

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": "o" + df["l_orderkey"].astype(str),
                "dst": "p" + df["l_partkey"].astype(str),
            }
        )

    edges = li.map_batches(to_edges, batch_format="pandas")
    # n_shards pinned: the shard count sets float accumulation order, and
    # this query's hash must be identical across cluster/parallelism sizes
    out = linkrank(edges, iterations=2, n_shards=8).to_pandas()
    # epsilon-shifted quantizer (both sides): rank values are sums of
    # 1/outdeg rationals that can land EXACTLY on a .5 e4-boundary, where
    # summation-order drift (~1e-14) decides the side arbitrarily; the
    # 1e-9 shift moves the boundary off every such rational point
    out["rank_e4"] = np.floor(
        out["rank"].astype(np.float64) * 1e4 + 0.5 + 1e-9).astype(np.int64)
    return out[["url", "rank_e4"]].sort_values("url").reset_index(drop=True)


_LINKRANK_SQL = """
WITH e AS (
  SELECT 'o' || l_orderkey AS src, 'p' || l_partkey AS dst FROM lineitem
),
nodes AS (SELECT DISTINCT src AS url FROM e UNION SELECT DISTINCT dst FROM e),
od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
r1 AS (
  SELECT n.url,
         0.15 + 0.85 * coalesce(sum(1.0 / od.outdeg), 0) AS r
  FROM nodes n
  LEFT JOIN e ON e.dst = n.url
  LEFT JOIN od ON od.src = e.src
  GROUP BY n.url
),
r2 AS (
  SELECT n.url,
         0.15 + 0.85 * coalesce(sum(r1.r / od.outdeg), 0) AS r
  FROM nodes n
  LEFT JOIN e ON e.dst = n.url
  LEFT JOIN od ON od.src = e.src
  LEFT JOIN r1 ON r1.url = e.src
  GROUP BY n.url
)
SELECT url, CAST(FLOOR(r * 10000 + 0.5 + 0.000000001) AS BIGINT) AS rank_e4 FROM r2 ORDER BY url
"""


def q_sliding_window(sf_dir: str):
    """Sliding windows (1h window, 15min slide) via explode-to-covering
    windows + one grouped sum."""
    from ..ops.window import sliding_window_counts

    ds = _read(sf_dir, "events", columns=["ts", "user_id"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = sliding_window_counts(ds, window_s=3600, slide_s=900).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["user_id", "window_start"]).reset_index(drop=True)


_SLIDING_SQL = """
WITH e AS (
  SELECT user_id, (CAST(FLOOR(epoch(ts)) AS BIGINT) // 900) * 900 AS base FROM events
), x AS (
  SELECT user_id, base - k * 900 AS window_start
  FROM e, unnest([0, 1, 2, 3]) AS t(k)
)
SELECT user_id, window_start, count(*) AS n_events
FROM x GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_asof_join(sf_dir: str):
    """Backward as-of join: each click event matched to the latest
    same-user view at-or-before its timestamp (ops/join.py — tagged
    union, one bucketed exchange by user hash, vectorized in-bucket
    sort-merge). Inner semantics like DuckDB ASOF JOIN."""
    from ..ops.join import asof_join

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    ev = _read(sf_dir, "events", columns=cols, min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def clicks(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"] == "click"]
        return pd.DataFrame({"user_id": d["user_id"].to_numpy(),
                             "ts": d["ts"].to_numpy(),
                             "click_id": d["event_id"].to_numpy()})

    def views(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"] == "view"]
        cents = np.floor(d["value"].to_numpy(dtype=np.float64) * 100.0 + 0.5).astype(np.int64)
        return pd.DataFrame({"user_id": d["user_id"].to_numpy(),
                             "ts": d["ts"].to_numpy(),
                             "view_id": d["event_id"].to_numpy(),
                             "view_value_cents": cents})

    probe = ev.map_batches(clicks, batch_format="pandas")
    build = ev.map_batches(views, batch_format="pandas")
    out = asof_join(
        probe, build,
        probe_payload={"click_id": "int64"},
        build_payload={"view_id": "int64", "view_value_cents": "int64"},
    ).to_pandas()
    out = out.drop(columns=["ts_us"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("click_id").reset_index(drop=True)


_ASOF_SQL = """
SELECT a.user_id AS user_id,
       a.event_id AS click_id,
       b.event_id AS view_id,
       CAST(FLOOR(b.value * 100 + 0.5) AS BIGINT) AS view_value_cents,
       epoch_us(a.ts) - epoch_us(b.ts) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
ORDER BY click_id
"""


def q_range_join(sf_dir: str):
    """Interval range join: every (error, click) pair of the same user
    with the click in the 24h window before the error (ops/join.py —
    pair emission fully vectorized from per-probe [lo,hi) slices)."""
    from ..ops.join import range_join_pairs

    cols = ["event_id", "ts", "user_id", "event_type"]
    ev = _read(sf_dir, "events", columns=cols, min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def side(etype: str, out_id: str):
        def proj(df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["event_type"] == etype]
            return pd.DataFrame({"user_id": d["user_id"].to_numpy(),
                                 "ts": d["ts"].to_numpy(),
                                 out_id: d["event_id"].to_numpy()})
        return proj

    probe = ev.map_batches(side("error", "error_id"), batch_format="pandas")
    build = ev.map_batches(side("click", "click_id"), batch_format="pandas")
    out = range_join_pairs(
        probe, build, window_s=86400,
        probe_payload={"error_id": "int64"},
        build_payload={"click_id": "int64"},
    ).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["error_id", "click_id"]).reset_index(drop=True)


_RANGE_JOIN_SQL = """
SELECT a.user_id AS user_id,
       a.event_id AS error_id,
       b.event_id AS click_id,
       epoch_us(a.ts) - epoch_us(b.ts) AS lag_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL 86400 SECOND
 AND b.ts < a.ts
WHERE a.event_type = 'error' AND b.event_type = 'click'
ORDER BY error_id, click_id
"""


def q_inverted_index(sf_dir: str):
    """Inverted index over documents (ops/index_text.py): map-side
    distinct (term, doc) explode + one bucketed groupby(term) -> per
    term df + ascending posting list as a comma-joined string."""
    from ..ops.index_text import build_inverted_index

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = build_inverted_index(ds).to_pandas()
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values("term").reset_index(drop=True)


_INVERTED_SQL = """
WITH pairs AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')) AS term
  FROM documents
)
SELECT term, count(*)::BIGINT AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY term ORDER BY term
"""


def q_dataset_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test split by doc-id hash
    (ops/sample.hash_split — pure map, append-stable), summarized per
    (lang, split) stratum to show proportions hold per stratum."""
    from ..ops.agg import bucketed_sum
    from ..ops.sample import hash_split

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    tagged = hash_split(ds, train_pct=80, val_pct=10)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lang": df["lang"].to_numpy(),
                             "split": df["split"].to_numpy(),
                             "n_docs": np.ones(len(df), dtype=np.int64)})

    out = bucketed_sum(tagged.map_batches(pre, batch_format="pandas"),
                       ["lang", "split"], ["n_docs"]).to_pandas()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values(["lang", "split"]).reset_index(drop=True)


_DATASET_SPLIT_SQL = """
WITH tagged AS (
  SELECT lang,
         CASE
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 80 THEN 'train'
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 90 THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT lang, split, count(*)::BIGINT AS n_docs
FROM tagged GROUP BY 1, 2 ORDER BY 1, 2
"""


_CMS_TERMS = ["batch", "column", "customer", "filter", "hash", "join", "row", "scan"]


def q_countmin(sf_dir: str):
    """Count-Min sketch frequency estimates for a fixed term set
    (ops/sketch.py): per-batch partial cells (<= depth x width rows),
    one bucketed sum exchange, integer-exact min-over-rows estimates —
    the mergeable-sketch shape that never moves tokens."""
    from ..ops.rank import TOKEN_RE
    from ..ops.sketch import cms_cells, cms_estimate

    ds = _read(sf_dir, "documents", columns=["text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def vc(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].fillna("").str.lower().str.findall(TOKEN_RE).explode().dropna()
        c = ex.value_counts()
        return pd.DataFrame({"value": c.index.to_numpy(), "cnt": c.to_numpy()})

    cells = cms_cells(ds, vc).to_pandas()
    out = cms_estimate(cells, _CMS_TERMS)
    out["est_cnt"] = out["est_cnt"].astype(np.int64)
    return out.sort_values("term").reset_index(drop=True)


def _countmin_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(_CMS_TERMS))
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')) AS v
  FROM documents
), rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
cells AS (
  SELECT r.r AS r,
         CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || t.v), 1, 8)) AS UBIGINT) % 64 AS b,
         count(*)::BIGINT AS c
  FROM toks t CROSS JOIN rows_ r
  GROUP BY 1, 2
), q AS (SELECT unnest([{terms}]) AS term)
SELECT q.term AS term, CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est_cnt
FROM q CROSS JOIN rows_ r
LEFT JOIN cells c
  ON c.r = r.r
 AND c.b = CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || q.term), 1, 8)) AS UBIGINT) % 64
GROUP BY q.term
ORDER BY term
"""


def q_tfidf_topk(sf_dir: str):
    """Per-doc top-3 TF-IDF keywords (ops/rank.tfidf_topk_terms): one
    corpus scan, tagged-union df join on hash(term), per-doc top-k on
    hash(doc_id). Oracle: the same smoothed idf and micro-unit score in
    window SQL."""
    import pyarrow.parquet as pq

    from ..ops.rank import tfidf_topk_terms

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = tfidf_topk_terms(ds, n_docs=n_docs, k=3).to_pandas()
    out["tf"] = out["tf"].astype(np.int64)
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values(["doc_id", "score_micro", "term"],
                           ascending=[True, False, True]).reset_index(drop=True)


_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY 1
), n AS (SELECT count(*)::BIGINT AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(floor(t.tf * (ln((n.n + 1)::DOUBLE / (d.df + 1)::DOUBLE) + 1.0) * 1000000 + 0.5) AS BIGINT) AS score_micro
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
), r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_micro DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, score_micro
FROM r WHERE rn <= 3 ORDER BY doc_id, score_micro DESC, term
"""


def q_pii_redact(sf_dir: str):
    """PII redaction (ops/text.pii_redact): emails / IPv4s / phones
    replaced by typed placeholders, vectorized regex kernels, zero
    shuffle. The oracle re-runs the same RE2-compatible patterns in
    DuckDB and compares match counts AND the md5 of the redacted text —
    byte-exact replacement parity."""
    from ..ops.text import pii_redact

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = ds.map_batches(
        lambda df: pii_redact(df.reset_index(drop=True)),
        batch_format="pandas",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_PII_SQL = r"""
WITH s0 AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
  FROM s0
), s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ipv4,
         regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         len(regexp_extract_all(t, '\+\d{7,15}\b|\b\d{3}[-.]\d{3}[-.]\d{4}\b'))::BIGINT AS n_phone,
         regexp_replace(t, '\+\d{7,15}\b|\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t
  FROM s2
)
SELECT doc_id, n_email, n_ipv4, n_phone, md5(t) AS redacted_md5
FROM s3 ORDER BY doc_id
"""


def q_bloom_membership(sf_dir: str):
    """Bloom-filter membership (ops/sketch.py): build the filter over
    DISTINCT orders.o_custkey (per-batch distinct bits, one bucketed
    exchange bounded by m=2048 rows), broadcast the bit array, then a
    zero-shuffle probe scan over customer flags which custkeys MAY have
    orders. No false negatives; the oracle rebuilds the identical bit
    set from the md5 idiom, so even the false positives match exactly."""
    from ..ops.sketch import bloom_build, bloom_probe

    orders = _read(sf_dir, "orders", columns=["o_custkey"],
                   min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    bits = bloom_build(orders, "o_custkey")
    cust = _read(sf_dir, "customer", columns=["c_custkey"],
                 min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = bloom_probe(cust, "c_custkey", bits).to_pandas()
    out["c_custkey"] = out["c_custkey"].astype(np.int64)
    out["bloom_hit"] = out["bloom_hit"].astype(np.int64)
    return out.sort_values("c_custkey").reset_index(drop=True)


_BLOOM_SQL = """
WITH ks AS (SELECT unnest([0, 1, 2]) AS i),
vals AS (SELECT DISTINCT o_custkey AS v FROM orders),
bits AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(CAST(k.i AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)), 1, 8)) AS UBIGINT) % 2048 AS bit
  FROM vals v CROSS JOIN ks k
), probe AS (
  SELECT c.c_custkey, k.i,
         CAST(('0x' || substr(md5(CAST(k.i AS VARCHAR) || ':' || CAST(c.c_custkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2048 AS bit
  FROM customer c CROSS JOIN ks k
)
SELECT p.c_custkey AS c_custkey,
       CAST(CASE WHEN count(b.bit) = 3 THEN 1 ELSE 0 END AS BIGINT) AS bloom_hit
FROM probe p LEFT JOIN bits b ON b.bit = p.bit
GROUP BY p.c_custkey
ORDER BY c_custkey
"""


_BM25_TERMS = ["hash", "join", "vector", "scan"]


def q_bm25_topk(sf_dir: str):
    """BM25 top-20 for a fixed query bag (ops/rank.py): one corpus text
    pass -> integer (dl, tf) projection, partial-summed corpus stats,
    broadcast idf, per-block partial top-k."""
    from ..ops.rank import bm25_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = bm25_topk(ds, _BM25_TERMS, k=20)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["score_micro"] = out["score_micro"].astype(np.int64)
    return out


def _bm25_sql() -> str:
    # expression order mirrors ops/rank.py exactly (integer dl/tf/df/N,
    # fixed-order double arithmetic, micro-unit rounding)
    tf_defs = ",\n         ".join(
        f"len(list_filter(ts, x -> x = '{t}'))::BIGINT AS tf{j}"
        for j, t in enumerate(_BM25_TERMS)
    )
    df_defs = ",\n         ".join(
        f"sum(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{j}"
        for j in range(len(_BM25_TERMS))
    )
    terms = "\n      + ".join(
        f"ln((CAST(n AS DOUBLE) - CAST(df{j} AS DOUBLE) + 0.5) / (CAST(df{j} AS DOUBLE) + 0.5) + 1.0)"
        f" * (CAST(tf{j} AS DOUBLE) * (1.2 + 1.0))"
        f" / (CAST(tf{j} AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(dls AS DOUBLE) / CAST(n AS DOUBLE)))))"
        for j in range(len(_BM25_TERMS))
    )
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS ts
  FROM documents
), base AS (
  SELECT doc_id, len(ts)::BIGINT AS dl,
         {tf_defs}
  FROM tok
), st AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS dls,
         {df_defs}
  FROM base
), sc AS (
  SELECT doc_id,
      {terms} AS score
  FROM base, st
)
SELECT doc_id, CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) AS score_micro
FROM sc ORDER BY score_micro DESC, doc_id LIMIT 20
"""


def q_kmeans(sf_dir: str):
    """k-means (k=8, 2 Lloyd iterations, deterministic lowest-id seed)
    over the embeddings table (ops/cluster.py): per-iteration streaming
    partial (count, dim-sum) fold, centroids broadcast, docs never
    shuffled. Output: final cluster assignment per vector."""
    from ..ops.cluster import kmeans_assign

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = kmeans_assign(ds, k=8, iters=2).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


def _kmeans_ctes(k: int = 8, iters: int = 2) -> str:
    """The WITH-body of Lloyd unrolled in SQL (ends at CTE ``afin``,
    the final (vec_id, cid) assignment): assign (argmin list_distance,
    cid tie-break) -> per-dim avg regroup, repeated ``iters`` times —
    matching ops/cluster._fit_centroids + the final assignment map.
    Shared by the ``kmeans`` and ``semdedup`` oracles."""

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_distance(e.embedding::DOUBLE[], c.cent), c.cid
           ) AS rn
    FROM embeddings e CROSS JOIN {cents} c
  ) WHERE rn = 1
)"""

    def update(name: str, assigned: str) -> str:
        return f"""{name} AS (
  SELECT cid, list(m ORDER BY i) AS cent
  FROM (
    SELECT cid, i, avg(v) AS m FROM (
      SELECT {assigned}.cid AS cid,
             generate_subscripts(e.embedding, 1) AS i,
             unnest(e.embedding::DOUBLE[]) AS v
      FROM {assigned} JOIN embeddings e USING (vec_id)
    ) GROUP BY cid, i
  ) GROUP BY cid
)"""

    ctes = [
        f"c0 AS (\n  SELECT vec_id AS cid, embedding::DOUBLE[] AS cent"
        f" FROM embeddings WHERE vec_id < {k}\n)"
    ]
    for it in range(iters):
        ctes.append(assign(f"a{it}", f"c{it}"))
        ctes.append(update(f"c{it + 1}", f"a{it}"))
    ctes.append(assign("afin", f"c{iters}"))
    return ",\n".join(ctes)


def _kmeans_sql(k: int = 8, iters: int = 2) -> str:
    return (
        f"WITH {_kmeans_ctes(k, iters)}\n"
        "SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM afin ORDER BY vec_id"
    )


def q_semdedup(sf_dir: str):
    """SemDeDup over the embeddings table (ops/cluster.semdedup):
    k-means (k=8, 2 Lloyd iters, deterministic seed) then within-cluster
    exact cosine near-dup components (tau=0.45), min-id kept. Output one
    row per vector: (vec_id, cluster, kept)."""
    from ..ops.cluster import semdedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
               min_block_bytes=_EXCHANGE_BLOCK_BYTES)
    out = semdedup(ds, k=8, iters=2, tau=0.45, n_buckets=8).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


def _semdedup_sql(k: int = 8, iters: int = 2, tau: float = 0.45) -> str:
    """kmeans CTEs -> within-cluster cosine pairs -> recursive transitive
    closure -> min-id representative; kept = not a non-representative
    member of any component."""
    return f"""
WITH RECURSIVE {_kmeans_ctes(k, iters)},
p AS (
  SELECT fa.vec_id AS a, fb.vec_id AS b
  FROM afin fa JOIN afin fb ON fa.cid = fb.cid AND fa.vec_id < fb.vec_id
  JOIN embeddings ea ON ea.vec_id = fa.vec_id
  JOIN embeddings eb ON eb.vec_id = fb.vec_id
  WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {tau}
),
sym AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
),
rep AS (SELECT u AS vid, least(u, min(v)) AS rep FROM reach GROUP BY u)
SELECT f.vec_id, CAST(f.cid AS BIGINT) AS cluster,
       CAST(CASE WHEN r.rep IS NULL OR r.rep = f.vec_id THEN 1 ELSE 0 END
            AS BIGINT) AS kept
FROM afin f LEFT JOIN rep r ON r.vid = f.vec_id
ORDER BY f.vec_id
"""


def q_nodedumper(sf_dir: str):
    """WebGraph NodeDumper top-50 nodes by inlink degree over the
    order->part edge graph (scoring/webgraph/NodeDumper.java)."""
    from ..stages.tools import node_dumper

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"], min_block_bytes=_EXCHANGE_BLOCK_BYTES)

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"url": "o" + df["l_orderkey"].astype(str), "dst": "p" + df["l_partkey"].astype(str)}
        )

    out = node_dumper(li.map_batches(to_edges, batch_format="pandas"), topn=50).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


_NODEDUMPER_SQL = """
WITH e AS (SELECT 'p' || l_partkey AS url FROM lineitem)
SELECT url, count(*) AS n FROM e GROUP BY url
ORDER BY n DESC, url ASC LIMIT 50
"""


def q_crawl_round(sf_dir: str):
    """Flagship: one full generate→fetch→parse→updatedb round on a
    frontier derived from the documents table, fake protocol. Returns
    the new frontier (url, status). Oracle: the whole round re-derived
    in SQL from the fake protocol's md5 hash rules — eligibility window,
    robots dead-host rule, fetch status buckets, the updatedb state
    transitions they imply, plus redirect-target and html-outlink
    discovery arithmetic (FakeProtocol outlink_targets/_redirect_target)."""
    import tempfile

    from ..functions.urlutil import partition_for_hosts
    from ..pipelines.crawl import CrawlDriver

    cfg = CrawlConfig(num_partitions=4, topn=10_000, server_delay_s=0.0)

    def partify(df, ids):
        df["part"] = partition_for_hosts(
            df["host"], cfg.num_partitions, cfg.partition_seed)
        df["signature"] = None
        return df

    with tempfile.TemporaryDirectory() as wd:
        d = CrawlDriver(wd, cfg)
        try:
            d.bootstrap_ds(DV.derived_frontier_ds(sf_dir, transform=partify))
            d.run_round(EPOCH + 10_000)
            out = d.store.read_table(1).to_pandas()[["url", "status"]]
            out["status"] = out["status"].astype(np.int64)
            return out.sort_values("url").reset_index(drop=True)
        finally:
            d.close()


# The round, re-derived from the fake protocol's pure-hash rules
# (sources/fake_protocol.py): md5-bucket fetch statuses, robots
# dead-host rule (rh % 53), html-vs-pdf split (hh % 10), redirect
# target /r/{hh%100000}, outlink targets /page/{(hh+k*2654435761)%1e5}
# + 1 external host{hh%1000}.example. Status codes are CrawlStatus DB_*.
_CRAWL_ROUND_SQL = """
WITH f AS (
  SELECT doc_id,
         'http://host' || (doc_id % 97) || '.example/doc/' || doc_id AS url,
         'host' || (doc_id % 97) || '.example' AS host,
         CASE doc_id % 7 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 6
              WHEN 4 THEN 3 WHEN 5 THEN 2 ELSE 1 END AS status,
         1700000000000 + (doc_id % 1000) * 1000 AS fetch_time
  FROM documents
),
sel AS (
  SELECT *, CAST(('0x' || substr(md5(url), 1, 16)) AS UBIGINT) AS hh,
            CAST(('0x' || substr(md5('robots:' || host), 1, 16)) AS UBIGINT) AS rh
  FROM f WHERE fetch_time <= 1700000010000
),
fetched AS (
  SELECT url, host, CAST(hh AS HUGEINT) AS hh, hh % 100 AS bucket, rh % 53 = 0 AS dead,
    CASE
      WHEN rh % 53 = 0 THEN 3
      WHEN hh % 100 < 80 THEN 2
      WHEN hh % 100 < 85 THEN 3
      WHEN hh % 100 < 90 THEN 5
      WHEN hh % 100 < 93 THEN 4
      WHEN hh % 100 < 96 THEN 1
      ELSE 3
    END AS new_status
  FROM sel
),
redirs AS (
  SELECT DISTINCT 'http://' || host || '/r/' || (hh % 100000) AS url
  FROM fetched WHERE NOT dead AND bucket BETWEEN 85 AND 92
),
html AS (SELECT * FROM fetched WHERE NOT dead AND bucket < 80 AND hh % 10 <> 0),
outlinks AS (
  SELECT DISTINCT ol AS url FROM (
    SELECT 'http://' || host || '/page/' || ((hh + k * 2654435761) % 100000) AS ol
    FROM html, unnest([0, 1, 2, 3]) AS t(k)
    UNION ALL
    SELECT 'http://host' || (hh % 1000) || '.example/page/' || ((hh // 256) % 100000) AS ol
    FROM html
  )
),
newurls AS (SELECT url FROM redirs UNION SELECT url FROM outlinks),
final AS (
  SELECT f.url, coalesce(x.new_status, f.status) AS status
  FROM f LEFT JOIN fetched x ON f.url = x.url
  UNION ALL
  SELECT n.url, 1 AS status FROM newurls n
  WHERE n.url NOT IN (SELECT url FROM f)
)
SELECT url, status FROM final ORDER BY url
"""


# ===========================================================================


def build_queries() -> dict:
    return {
        "generate_topn": q_generate_topn,
        "inject_merge": q_inject_merge,
        "updatedb_merge": q_updatedb_merge,
        "scoring_depth": q_scoring_depth,
        "dedup_urls": q_dedup_urls,
        "invertlinks": q_invertlinks,
        "linkdb_merge": q_linkdb_merge,
        "hostdb": q_hostdb,
        "readdb_stats": q_readdb_stats,
        "readdb_stats_sort": q_readdb_stats_sort,
        "readdb_dump": q_readdb_dump,
        "readdb_topn": q_readdb_topn,
        "mergedb": q_mergedb,
        "criteria_filter": q_criteria_filter,
        "indexer_join": q_indexer_join,
        "dedup_exact_docs": q_dedup_exact_docs,
        "dedup_norm_docs": q_dedup_norm_docs,
        "dedup_keep_best": q_dedup_keep_best,
        "minhash_lsh": q_minhash_lsh,
        "minhash_lsh_idjoin": q_minhash_lsh_idjoin,
        "containment_join": q_containment,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_jaccard_idjoin": q_ngram_jaccard_idjoin,
        "dup_spans": q_dup_spans,
        "softdedup": q_softdedup,
        "ngram_novelty": q_ngram_novelty,
        "pmi_topk": q_pmi_topk,
        "q5_join": q_q5_join,
        "knn_pq": q_knn_pq,
        "collapse_repeats": q_collapse_repeats,
        "hits": q_hits,
        "props_stats": q_props_stats,
        "rank_normalize": q_rank_normalize,
        "q18_join": q_q18_join,
        "latest_event": q_latest_event,
        "funnel": q_funnel,
        "hll_distinct": q_hll_distinct,
        "simhash": q_simhash,
        "char_entropy": q_char_entropy,
        "text_quality": q_text_quality,
        "fingerprint": q_fingerprint,
        "winnow": q_winnow,
        "langid": q_langid,
        "knn_cosine": q_knn_cosine,
        "knn_ivf": q_knn_ivf,
        "knn_lsh": q_knn_lsh,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "dedup_components": q_dedup_components,
        "neardup_keep_one": q_neardup_keep_one,
        "window_tumbling": q_window_tumbling,
        "sliding_window": q_sliding_window,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "bm25_topk": q_bm25_topk,
        "kmeans": q_kmeans,
        "semdedup": q_semdedup,
        "inverted_index": q_inverted_index,
        "dataset_split": q_dataset_split,
        "countmin_freq": q_countmin,
        "bloom_membership": q_bloom_membership,
        "linkrank": q_linkrank,
        "media_features": q_media_features,
        "q1_agg": q_q1_agg,
        "q3_join": q_q3_join,
        "crawl_round": q_crawl_round,
        "subcollection": q_subcollection,
        "gopher_quality": q_gopher_quality,
        "gopher_repetition": q_gopher_repetition,
        "pii_redact": q_pii_redact,
        "tfidf_topk": q_tfidf_topk,
        "hash_sample": q_hash_sample,
        "weighted_sample": q_weighted_sample,
        "stratified_topk": q_stratified_topk,
        "pack_tokens": q_pack_tokens,
        "pack_shuffled": q_pack_shuffled,
        "llm_corpus": q_llm_corpus,
        "line_dedup": q_line_dedup,
        "span_dedup": q_span_dedup,
        "chunk_docs": q_chunk_docs,
        "mixture_sample": q_mixture_sample,
        "bigram_nll": q_bigram_nll,
        "interleaved_pack": q_interleaved_pack,
        "media_dedup": q_media_dedup,
        "token_counts": q_token_counts,
        "vocab_topk": q_vocab_topk,
        "bpe_pairs": q_bpe_pairs,
        "hashed_quality": q_hashed_quality,
        "dsir_weights": q_dsir,
        "dsir_select": q_dsir_select,
        "distinct_ngrams": q_distinct_ngrams,
        "source_overlap": q_source_overlap,
        "decontaminate": q_decontaminate,
        "decontaminate_frac": q_decontaminate_frac,
        "curriculum_bins": q_curriculum_bins,
        "token_kl": q_token_kl,
        "token_quantiles": q_token_quantiles,
        "c4_filters": q_c4_filters,
        "crawlcomplete": q_crawlcomplete,
        "domainstats": q_domainstats,
        "protocolstats": q_protocolstats,
        "nodedumper": q_nodedumper,
    }


def build_oracle_sql() -> dict:
    return {
        "generate_topn": _GEN_SQL,
        "inject_merge": _INJECT_SQL,
        "updatedb_merge": _UPDATEDB_SQL,
        "scoring_depth": _SCORING_DEPTH_SQL,
        "dedup_urls": _DEDUP_SQL,
        "invertlinks": _INVERT_SQL,
        "linkdb_merge": _LINKDB_MERGE_SQL,
        "hostdb": _HOSTDB_SQL,
        "readdb_stats": _STATS_SQL,
        "readdb_stats_sort": _STATS_SORT_SQL,
        "readdb_dump": _READDB_DUMP_SQL,
        "readdb_topn": _TOPN_SQL,
        "mergedb": _MERGEDB_SQL,
        "criteria_filter": _CRITERIA_SQL,
        "indexer_join": _INDEXER_SQL,
        "dedup_exact_docs": _DEDUP_DOCS_SQL,
        "dedup_norm_docs": _DEDUP_NORM_SQL,
        "dedup_keep_best": _DEDUP_KEEP_BEST_SQL,
        "char_entropy": _CHAR_ENTROPY_SQL,
        "text_quality": _QUALITY_SQL,
        "fingerprint": _FINGERPRINT_SQL,
        "winnow": _WINNOW_SQL,
        "knn_cosine": _KNN_SQL,
        "embedding_neardup": _NEARDUP_SQL,
        "embedding_neardup_lsh": _embedding_lsh_sql(),
        "dedup_components": _DEDUP_COMPONENTS_SQL,
        "neardup_keep_one": _KEEP_ONE_SQL,
        "window_tumbling": _TUMBLING_SQL,
        "sliding_window": _SLIDING_SQL,
        "sessionize": _SESSION_SQL,
        "asof_join": _ASOF_SQL,
        "range_join": _RANGE_JOIN_SQL,
        "bm25_topk": _bm25_sql(),
        "kmeans": _kmeans_sql(k=8, iters=2),
        "semdedup": _semdedup_sql(k=8, iters=2, tau=0.45),
        "inverted_index": _INVERTED_SQL,
        "dataset_split": _DATASET_SPLIT_SQL,
        "countmin_freq": _countmin_sql(),
        "bloom_membership": _BLOOM_SQL,
        "linkrank": _LINKRANK_SQL,
        "media_features": _MEDIA_SQL,
        "q1_agg": _Q1_SQL,
        "q3_join": _Q3_SQL,
        "minhash_lsh": _minhash_sql(),
        "minhash_lsh_idjoin": _minhash_sql(),
        "containment_join": _CONTAINMENT_SQL,
        "ngram_jaccard": _NGRAM_JACCARD_SQL,
        "ngram_jaccard_idjoin": _NGRAM_JACCARD_SQL,
        "dup_spans": _DUP_SPANS_SQL,
        "softdedup": _SOFTDEDUP_SQL,
        "ngram_novelty": _NGRAM_NOVELTY_SQL,
        "pmi_topk": _PMI_TOPK_SQL,
        "q5_join": _Q5_SQL,
        "knn_pq": _knn_pq_sql(),
        "collapse_repeats": _COLLAPSE_REPEATS_SQL,
        "hits": _HITS_SQL,
        "props_stats": _PROPS_STATS_SQL,
        "rank_normalize": _RANK_NORMALIZE_SQL,
        "q18_join": _Q18_SQL,
        "latest_event": _LATEST_EVENT_SQL,
        "funnel": _FUNNEL_SQL,
        "hll_distinct": _hll_distinct_sql(),
        "simhash": _SIMHASH_SQL,
        "langid": _langid_sql(),
        "subcollection": _SUBCOLL_SQL,
        "gopher_quality": _GOPHER_SQL,
        "gopher_repetition": _GOPHER_REP_SQL,
        "pii_redact": _PII_SQL,
        "tfidf_topk": _TFIDF_SQL,
        "hash_sample": _HASH_SAMPLE_SQL,
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "stratified_topk": _STRATIFIED_SQL,
        "pack_tokens": _PACK_SQL,
        "pack_shuffled": _PACK_SHUFFLED_SQL,
        "llm_corpus": _llm_corpus_sql(),
        "line_dedup": _LINE_DEDUP_SQL,
        "span_dedup": _SPAN_DEDUP_SQL,
        "chunk_docs": _CHUNK_DOCS_SQL,
        "mixture_sample": _MIXTURE_SQL,
        "bigram_nll": _BIGRAM_NLL_SQL,
        "interleaved_pack": _INTERLEAVED_PACK_SQL,
        "media_dedup": _MEDIA_DEDUP_SQL,
        "token_counts": _token_counts_sql(),
        "vocab_topk": _VOCAB_SQL,
        "bpe_pairs": _BPE_PAIRS_SQL,
        "hashed_quality": _HASHED_QUALITY_SQL,
        "dsir_weights": _DSIR_SQL,
        "dsir_select": _DSIR_SELECT_SQL,
        "distinct_ngrams": _DISTINCT_NGRAMS_SQL,
        "source_overlap": _SOURCE_OVERLAP_SQL,
        "decontaminate": _DECONTAMINATE_SQL,
        "decontaminate_frac": _DECONTAMINATE_FRAC_SQL,
        "curriculum_bins": _CURRICULUM_SQL,
        "token_kl": _TOKEN_KL_SQL,
        "token_quantiles": _TOKEN_QUANTILES_SQL,
        "c4_filters": _C4_SQL,
        "knn_ivf": _KNN_IVF_SQL,
        "knn_lsh": _knn_lsh_sql(),
        "crawl_round": _CRAWL_ROUND_SQL,
        "crawlcomplete": _CRAWLCOMPLETE_SQL,
        "domainstats": _DOMAINSTATS_SQL,
        "protocolstats": _PROTOCOLSTATS_SQL,
        "nodedumper": _NODEDUMPER_SQL,
    }
