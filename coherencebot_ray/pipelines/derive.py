"""Deterministic derivations of crawl tables from the driver's testdata.

The driver's correctness gate runs each ``queries()`` entry AND its
``oracle_sql()`` DuckDB equivalent on the same parquet tables. Crawl
operators need frontier/seed/edge tables, so we derive them from
``documents`` / ``lineitem`` with pure integer arithmetic that both
numpy and SQL compute bit-identically:

  url            'http://host{doc_id%97}.example/doc/{doc_id}'
  score          ((doc_id*37) % 9973) / 9973.0      (distinct, float64)
  status         CASE doc_id % 7 (mix of db statuses)
  signature      md5(str(doc_id % 50))              (dup groups)
  fetch_time     1_700_000_000_000 + (doc_id%1000)*1000
  fetch_interval 86400 + (doc_id%10)*3600
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..model import CrawlStatus as CS

EPOCH = 1_700_000_000_000

# doc_id % 7 -> db status (CASE mirrored in SQL)
_STATUS_BY_MOD7 = np.array(
    [
        CS.DB_UNFETCHED,  # 0
        CS.DB_FETCHED,  # 1
        CS.DB_FETCHED,  # 2
        CS.DB_NOTMODIFIED,  # 3
        CS.DB_GONE,  # 4
        CS.DB_FETCHED,  # 5
        CS.DB_UNFETCHED,  # 6
    ],
    dtype=np.int64,
)

STATUS_CASE_SQL = (
    "CASE doc_id % 7 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 6 "
    "WHEN 4 THEN 3 WHEN 5 THEN 2 ELSE 1 END"
)

URL_SQL = "'http://host' || (doc_id % 97) || '.example/doc/' || doc_id"
HOST_SQL = "'host' || (doc_id % 97) || '.example'"
SCORE_SQL = "((doc_id * 37) % 9973) / 9973.0"
FETCH_TIME_SQL = f"{EPOCH} + (doc_id % 1000) * 1000"
INTERVAL_SQL = "86400 + (doc_id % 10) * 3600"
SIG_SQL = "md5(CAST(doc_id % 50 AS VARCHAR))"


# 50 signature groups: precompute the md5 table once, take() per batch
_SIG_TABLE = np.array(
    [hashlib.md5(str(k).encode()).hexdigest() for k in range(50)], dtype=object
)


def derived_frontier(doc_ids: np.ndarray, num_partitions: int = 1) -> pd.DataFrame:
    """Vectorized frontier derivation (no per-row Python): pandas str
    concat for urls/hosts, table-take for signatures. ``num_partitions``
    assigns part = doc_id % P (a harness grouping key — the real
    pipeline partitions by hash(host))."""
    d = np.asarray(doc_ids).astype(np.int64)
    hostn = pd.Series(d % 97).astype(str)
    host = ("host" + hostn + ".example").to_numpy(dtype=object)
    url = ("http://host" + hostn + ".example/doc/" + pd.Series(d).astype(str)).to_numpy(dtype=object)
    return pd.DataFrame(
        {
            "url": url,
            "host": host,
            "domain": host,
            "part": (d % num_partitions).astype(np.int32)
            if num_partitions > 1
            else np.zeros(len(d), dtype=np.int32),
            "status": _STATUS_BY_MOD7[d % 7],
            "fetch_time": EPOCH + (d % 1000) * 1000,
            "retries": np.zeros(len(d), dtype=np.int64),
            "fetch_interval": 86400 + (d % 10) * 3600,
            "score": ((d * 37) % 9973) / 9973.0,
            "signature": _SIG_TABLE[d % 50],
            "modified_time": np.zeros(len(d), dtype=np.int64),
            "gen_time": np.zeros(len(d), dtype=np.int64),
            "repr_url": [None] * len(d),
            "fixed_interval": np.zeros(len(d), dtype=np.int64),
            "metadata": [None] * len(d),
        }
    )


def derived_frontier_ds(
    sf_dir: str,
    pred=None,
    num_partitions: int = 1,
    transform=None,
):
    """Distributed frontier derivation: map_batches over
    ``documents.parquet`` (doc_id column only leaves storage) building
    frontier rows inside each task — the driver never materializes a
    partition. ``pred(ids) -> bool mask`` filters doc_ids;
    ``transform(df, ids) -> df`` rewrites rows (status/score overlays),
    both run inside the batch task."""
    import ray.data as rd

    def build(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        if pred is not None:
            ids = ids[pred(ids)]
        out = derived_frontier(ids, num_partitions=num_partitions)
        if transform is not None:
            out = transform(out, ids)
        return out

    # Floor the read-block size (same rationale as queries._read's
    # min_block_bytes): Ray's default parallelism shatters the small
    # doc_id file into ~2xCPU micro-blocks and the downstream bucketed
    # sort exchange pays per-block overhead that dominates the wall at
    # bench scale (measured 3.6s -> sub-second on generate_topn at
    # sf0.1). No-op at real scale where blocks already exceed the floor.
    import math
    import os

    path = f"{sf_dir}/documents.parquet"
    n_blocks = max(1, math.ceil(os.path.getsize(path) / (4 << 20)))
    return rd.read_parquet(
        path, columns=["doc_id"], override_num_blocks=n_blocks
    ).map_batches(build, batch_format="pandas")


# ---------------------------------------------------------------------------
# Interleaved span-table derivation (input_hint shape): REAL Arrow
# list<struct<kind,text,media_ref,offset>> spans built from doc_id with
# pure integer arithmetic a SQL oracle mirrors (SPANS_SQL below):
#   n_spans          3 + doc_id % 5
#   kind(i)          media iff (doc_id + i) % 3 == 0 else text
#   text tokens      10 + (doc_id*7 + i) % 40    ('w ' repeated)
#   media_ref        'm' || (doc_id*131 + i*17) % 1009
# ---------------------------------------------------------------------------

SPANS_SQL = """
  SELECT d.doc_id, CAST(t.i AS BIGINT) AS i
  FROM documents d, unnest(generate_series(0, 3 + d.doc_id % 5 - 1)) AS t(i)
"""
SPAN_IS_MEDIA_SQL = "(doc_id + i) % 3 = 0"
SPAN_TOKENS_SQL = "10 + (doc_id * 7 + i) % 40"
SPAN_REF_SQL = "'m' || ((doc_id * 131 + i * 17) % 1009)"


def derived_spans_ds(sf_dir: str):
    """Distributed interleaved-corpus derivation: map_batches over
    ``documents.parquet`` (doc_id only leaves storage) building the
    (doc_id, spans) Arrow table per batch — text spans carry real
    'w w ...' payloads whose whitespace-token count equals the
    arithmetic rule, media spans carry the derived ref."""
    import math
    import os

    import pyarrow as pa
    import ray.data as rd

    from ..model import SPAN_TYPE

    def build(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = 3 + (d % 5)
        bounds = np.r_[0, np.cumsum(n)].astype(np.int64)
        doc_rep = np.repeat(d, n)
        i = np.arange(bounds[-1], dtype=np.int64) - np.repeat(bounds[:-1], n)
        is_media = (doc_rep + i) % 3 == 0
        ktok = 10 + (doc_rep * 7 + i) % 40
        txt = (
            pd.Series(np.where(is_media, "", "w "), dtype=object)
            .str.repeat(pd.Series(np.where(is_media, 0, ktok)))
            .str.rstrip()
            .to_numpy(dtype=object)
        )
        refn = pd.Series((doc_rep * 131 + i * 17) % 1009).astype(str)
        ref = np.where(is_media, ("m" + refn).to_numpy(dtype=object), "")
        kind = np.where(is_media, "media", "text")
        struct = pa.StructArray.from_arrays(
            [
                pa.array(kind, pa.string()),
                pa.array(txt, pa.string()),
                pa.array(ref, pa.string()),
                pa.array(i.astype(np.int32), pa.int32()),
            ],
            fields=[SPAN_TYPE.field(j) for j in range(SPAN_TYPE.num_fields)],
        )
        spans = pa.ListArray.from_arrays(
            pa.array(bounds.astype(np.int32), pa.int32()), struct
        )
        return pa.table({"doc_id": pa.array(d, pa.int64()), "spans": spans})

    path = f"{sf_dir}/documents.parquet"
    n_blocks = max(1, math.ceil(os.path.getsize(path) / (4 << 20)))
    return rd.read_parquet(
        path, columns=["doc_id"], override_num_blocks=n_blocks
    ).map_batches(build, batch_format="pyarrow")


def read_doc_ids(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    return (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .column("doc_id")
        .to_numpy()
        .astype(np.int64)
    )
