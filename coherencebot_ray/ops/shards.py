"""Resumable sharded map execution — the curation-side analogue of the
frontier store's crash-safe generations (state/frontier_store.py):
"write partitioned Parquet, one directory per INPUT shard, so a failed
run skips finished partitions".

``resumable_map_shards`` drives an embarrassingly-parallel per-document
stage (quality scoring, langid, chunking, hashed classification, PII
redaction — any batch_fn with no cross-shard state) over a list of
input parquet shards. Each input shard maps to its own output
directory ``out_dir/<stem>/``; the shard commits ATOMICALLY — data file
written to a temp name, os.replace into place, then a ``_DONE`` marker
(row counts, for audit) — so a killed run leaves either a committed
shard or no marker, never a torn one. A re-run lists markers first and
schedules ONLY the unfinished shards.

Global stages (cross-doc dedup, packing) cannot resume at shard
granularity by construction; they resume at the generation level via
the frontier-store pattern (atomic manifest commit after the full
exchange), as the crawl loop does for linkdb / dedup-marks output.

Ray-Data-first shape: the work-list is itself a Dataset (one row per
unfinished shard); an actor-pool ``map_batches`` stage reads the
fragment with pyarrow inside the task (the shard IS the block — no
double read), applies batch_fn, and commits. Scheduling, retries and
backpressure stay with the streaming executor; a task that dies is
retried by Ray and re-commits its shard idempotently (os.replace).
"""

from __future__ import annotations

import glob
import json
import os

import pandas as pd


def _stem(path: str) -> str:
    """Collision-free shard key: basename stem (human-readable) + a hash
    of the ABSOLUTE path — two inputs named part-0.parquet in different
    directories must not share an output dir / _DONE marker."""
    import hashlib

    base = os.path.splitext(os.path.basename(path))[0]
    h = hashlib.md5(os.path.abspath(path).encode("utf-8")).hexdigest()[:10]
    return f"{base}-{h}"


def _marker(out_dir: str, path: str) -> str:
    return os.path.join(out_dir, _stem(path), "_DONE")


def list_unfinished(in_files: list[str], out_dir: str) -> list[str]:
    return [p for p in in_files if not os.path.exists(_marker(out_dir, p))]


class _ShardTask:
    """Actor-pool body: one input shard per row; batch_fn state (models,
    compiled patterns) belongs in batch_fn's closure or a wrapper class —
    this runner holds only the output root."""

    def __init__(self, out_dir: str, batch_fn, columns):
        self.out_dir = out_dir
        self.batch_fn = batch_fn
        self.columns = columns

    def __call__(self, rows: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        done = []
        for path in rows["path"]:
            shard_dir = os.path.join(self.out_dir, _stem(path))
            os.makedirs(shard_dir, exist_ok=True)
            table = pq.read_table(path, columns=self.columns)
            out = self.batch_fn(table.to_pandas())
            tmp = os.path.join(shard_dir, ".part.parquet.tmp")
            final = os.path.join(shard_dir, "part.parquet")
            import pyarrow as pa

            pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
            os.replace(tmp, final)  # atomic commit of the data file
            mtmp = os.path.join(shard_dir, "._DONE.tmp")
            with open(mtmp, "w") as f:
                json.dump({"in_rows": table.num_rows, "out_rows": len(out),
                           "source": os.path.basename(path)}, f)
            os.replace(mtmp, os.path.join(shard_dir, "_DONE"))
            done.append({"path": path, "in_rows": table.num_rows,
                         "out_rows": len(out)})
        return pd.DataFrame(done, columns=["path", "in_rows", "out_rows"])


def resumable_map_shards(in_files: list[str], out_dir: str, batch_fn,
                         columns: list[str] | None = None,
                         concurrency: int | None = None) -> dict:
    """Run ``batch_fn(pd.DataFrame) -> pd.DataFrame`` over every input
    shard not yet committed under ``out_dir``; returns
    {"total", "skipped", "processed", "out_rows"}."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    todo = list_unfinished(in_files, out_dir)
    out_rows = 0
    if todo:
        stats = (rd.from_items([{"path": p} for p in sorted(todo)])
                 .map_batches(_ShardTask, batch_size=1,
                              concurrency=concurrency or (2, 16),
                              fn_constructor_args=(out_dir, batch_fn, columns),
                              batch_format="pandas")
                 .to_pandas())
        out_rows = int(stats["out_rows"].sum()) if len(stats) else 0
    return {"total": len(in_files), "skipped": len(in_files) - len(todo),
            "processed": len(todo), "out_rows": out_rows}


def read_shards(out_dir: str):
    """Read back every committed shard as one Dataset (ignores
    uncommitted leftovers — only files under a _DONE-marked dir)."""
    import ray.data as rd

    files = [os.path.join(d, "part.parquet")
             for d in sorted(glob.glob(os.path.join(out_dir, "*")))
             if os.path.exists(os.path.join(d, "_DONE"))]
    return rd.read_parquet(files, partitioning=None)
