"""Versioned, partitioned frontier store on Parquet with Lance-like
semantics (versioned generations, per-partition lineage manifests,
unchanged-partition reuse).

Replaces the reference's CrawlDb MapFile + atomic ``current``→``old``
rotation (crawl/CrawlDb.java:68-70,203-224) with:

```
root/
  gen=000003/
    _MANIFEST.json          # gen, partitions -> {files, rows}, counters,
                            # lineage {parent_gen, touched_parts}
    part=5/*.parquet        # only TOUCHED partitions are rewritten;
                            # untouched partitions reference the parent
                            # generation's files (manifest-level reuse)
  _LATEST                   # atomic pointer (rename) to newest complete gen
```

NOTE on Lance: the environment ships no ``lance`` package, so the
input_hint's "Lance table" role is filled by this layer — same
observable semantics (versioned writes, partition pruning, lineage,
resume), Parquet physical format. Swap `_write_part`/`read` for
`lance.write_dataset`/`ray.data.read_lance` when available.

Commit protocol (crash-safe, resumable):
write parts to ``gen=N.tmp/`` → fsync manifest → atomic rename to
``gen=N/`` → rewrite ``_LATEST``. A failed run leaves only ``*.tmp``
dirs, which ``resume()`` ignores and ``clean_tmp()`` removes.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _subshards(t: pa.Table, skew_split_rows: int):
    """Yield (sub, n_sub, shard_table): power-of-two url-hash subshards
    for tables above the skew threshold (same hash rule the updatedb
    subtasks use, so shard files map 1:1 to merge subtasks)."""
    if t.num_rows <= skew_split_rows:
        yield 0, 1, t
        return
    import pandas as pd

    raw = -(-t.num_rows // skew_split_rows)
    n_sub = 1 << (raw - 1).bit_length()
    urls = pd.Series(t.column("url").to_pylist())
    h = pd.util.hash_pandas_object(urls, index=False).to_numpy()
    assign = h % n_sub
    import numpy as np

    for sub in range(n_sub):
        idx = np.flatnonzero(assign == sub)
        yield sub, n_sub, t.take(idx)


class FrontierStore:
    def __init__(self, root: str, num_partitions: int = 16, skew_split_rows: int = 100_000):
        self.root = root
        self.num_partitions = num_partitions
        self.skew_split_rows = skew_split_rows
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------------
    def _gen_dir(self, gen: int, tmp: bool = False) -> str:
        return os.path.join(self.root, f"gen={gen:06d}" + (".tmp" if tmp else ""))

    def latest_gen(self) -> int | None:
        p = os.path.join(self.root, "_LATEST")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def manifest(self, gen: int) -> dict:
        with open(os.path.join(self._gen_dir(gen), "_MANIFEST.json")) as f:
            return json.load(f)

    # ------------------------------------------------------------------
    def write_generation(
        self,
        tables_by_part: dict[int, pa.Table],
        gen: int,
        parent_gen: int | None = None,
        counters: dict | None = None,
    ) -> dict:
        """Write a new generation.

        ``tables_by_part`` holds only the TOUCHED partitions; every other
        partition is carried forward by referencing the parent manifest's
        files (no data copy — Lance-style version reuse).
        """
        tmp = self._gen_dir(gen, tmp=True)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)

        partitions: dict[str, dict] = {}
        parent = self.manifest(parent_gen) if parent_gen is not None else None
        for part in range(self.num_partitions):
            if part in tables_by_part:
                t = tables_by_part[part]
                pdir = os.path.join(tmp, f"part={part}")
                os.makedirs(pdir)
                names = []
                for sub, n_sub, shard in _subshards(t, self.skew_split_rows):
                    fpath = os.path.join(pdir, f"data-{sub}.parquet")
                    pq.write_table(shard, fpath, compression="zstd")
                    names.append(os.path.basename(fpath))
                    # cuckoo URL-seen shard alongside (rebuildable)
                    from .cuckoo import CuckooFilter

                    cf = CuckooFilter(capacity=max(1024, 2 * shard.num_rows))
                    cf.add_many(shard.column("url").to_pylist())
                    with open(fpath.replace(".parquet", ".seen"), "wb") as fh:
                        fh.write(cf.to_bytes())
                # manifest stores gen-relative paths for rename-safety
                partitions[str(part)] = {
                    "files": [os.path.join(f"gen={gen:06d}", f"part={part}", n) for n in names],
                    "rows": t.num_rows,
                    "source_gen": gen,
                }
            elif parent is not None and str(part) in parent["partitions"]:
                partitions[str(part)] = dict(parent["partitions"][str(part)])
            else:
                partitions[str(part)] = {"files": [], "rows": 0, "source_gen": gen}

        manifest = {
            "gen": gen,
            "num_partitions": self.num_partitions,
            "created_ms": int(time.time() * 1000),
            "lineage": {
                "parent_gen": parent_gen,
                "touched_parts": sorted(tables_by_part.keys()),
            },
            "counters": counters or {},
            "partitions": partitions,
        }
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        final = self._gen_dir(gen)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        with open(os.path.join(self.root, "_LATEST.tmp"), "w") as f:
            f.write(str(gen))
            f.flush()
            os.fsync(f.fileno())
        os.replace(os.path.join(self.root, "_LATEST.tmp"), os.path.join(self.root, "_LATEST"))
        return manifest

    # ------------------------------------------------------------------
    def part_tmp_path(self, gen: int, part: int) -> str:
        """Deterministic path a worker task writes a partition file to
        (idempotent under task retry: same path, same content)."""
        d = os.path.join(self._gen_dir(gen, tmp=True), f"part={part}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, "data-0.parquet")

    def begin_generation(self, gen: int) -> str:
        tmp = self._gen_dir(gen, tmp=True)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        return tmp

    def commit_generation(
        self,
        written_parts: dict[int, int],  # part -> rows (files already in tmp dir)
        gen: int,
        parent_gen: int | None = None,
        counters: dict | None = None,
    ) -> dict:
        """Commit a generation whose touched partition files were written
        directly by worker tasks into the tmp dir (see part_tmp_path)."""
        tmp = self._gen_dir(gen, tmp=True)
        partitions: dict[str, dict] = {}
        parent = self.manifest(parent_gen) if parent_gen is not None else None
        for part in range(self.num_partitions):
            if part in written_parts:
                # a skew-split partition has several data-*.parquet subshards
                names = sorted(
                    os.listdir(os.path.join(tmp, f"part={part}"))
                ) if os.path.isdir(os.path.join(tmp, f"part={part}")) else []
                partitions[str(part)] = {
                    "files": [
                        os.path.join(f"gen={gen:06d}", f"part={part}", n)
                        for n in names
                        if n.endswith(".parquet")
                    ],
                    "rows": int(written_parts[part]),
                    "source_gen": gen,
                }
            elif parent is not None and str(part) in parent["partitions"]:
                partitions[str(part)] = dict(parent["partitions"][str(part)])
            else:
                partitions[str(part)] = {"files": [], "rows": 0, "source_gen": gen}
        manifest = {
            "gen": gen,
            "num_partitions": self.num_partitions,
            "created_ms": int(time.time() * 1000),
            "lineage": {"parent_gen": parent_gen, "touched_parts": sorted(written_parts)},
            "counters": counters or {},
            "partitions": partitions,
        }
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        final = self._gen_dir(gen)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        with open(os.path.join(self.root, "_LATEST.tmp"), "w") as f:
            f.write(str(gen))
            f.flush()
            os.fsync(f.fileno())
        os.replace(os.path.join(self.root, "_LATEST.tmp"), os.path.join(self.root, "_LATEST"))
        return manifest

    def files(self, gen: int | None = None, parts: list[int] | None = None) -> list[str]:
        """Absolute parquet paths for a generation (optionally pruned to parts)."""
        if gen is None:
            gen = self.latest_gen()
            if gen is None:
                return []
        man = self.manifest(gen)
        sel = (
            [str(p) for p in parts]
            if parts is not None
            else list(man["partitions"].keys())
        )
        out: list[str] = []
        for p in sel:
            ent = man["partitions"].get(p)
            if ent:
                out.extend(os.path.join(self.root, f) for f in ent["files"])
        return out

    def read(self, gen: int | None = None, parts: list[int] | None = None, columns=None):
        """Ray Dataset over a generation (partition-pruned, column-pruned)."""
        import ray.data as rd

        fl = self.files(gen, parts)
        if not fl:
            return rd.from_items([])
        # partitioning=None: gen=/part= path segments are lineage layout,
        # not hive partition columns (part is a real column already)
        return rd.read_parquet(fl, columns=columns, partitioning=None)

    def read_table(self, gen: int | None = None, parts: list[int] | None = None) -> pa.Table:
        """Driver-side pyarrow read (tests / small frontiers only)."""
        fl = self.files(gen, parts)
        if not fl:
            return None
        return pa.concat_tables([pq.read_table(f, partitioning=None) for f in fl], promote_options="default")

    def gc(self, keep_gens: int = 2) -> dict:
        """Garbage-collect old generations (CrawlDb current/old rotation
        analogue, generalized): keep the newest ``keep_gens`` manifests;
        any data/seen file not referenced by a kept manifest is deleted,
        and emptied generation directories are removed. Carried-forward
        files referenced across generations are kept wherever they live,
        so kept generations stay fully readable. Returns counts."""
        latest = self.latest_gen()
        if latest is None:
            return {"kept_gens": 0, "removed_files": 0, "removed_dirs": 0}
        gens = sorted(
            int(n.split("=")[1])
            for n in os.listdir(self.root)
            if n.startswith("gen=") and not n.endswith(".tmp")
        )
        kept = [g for g in gens if g > latest - keep_gens]
        referenced: set[str] = set()
        for g in kept:
            for ent in self.manifest(g)["partitions"].values():
                for f in ent["files"]:
                    referenced.add(f)
                    referenced.add(f.replace(".parquet", ".seen"))
        removed_files = removed_dirs = 0
        for g in gens:
            if g in kept:
                continue
            gdir = self._gen_dir(g)
            keep_dir = False
            for dirpath, _, files in os.walk(gdir):
                for name in files:
                    rel = os.path.relpath(os.path.join(dirpath, name), self.root)
                    if rel in referenced:
                        keep_dir = True
                    elif name != "_MANIFEST.json":
                        os.remove(os.path.join(dirpath, name))
                        removed_files += 1
            if keep_dir:
                continue  # old gen still hosts carried-forward files
            shutil.rmtree(gdir, ignore_errors=True)
            removed_dirs += 1
        return {"kept_gens": len(kept), "removed_files": removed_files, "removed_dirs": removed_dirs}

    def clean_tmp(self) -> None:
        for name in os.listdir(self.root):
            if name.endswith(".tmp") and os.path.isdir(os.path.join(self.root, name)):
                shutil.rmtree(os.path.join(self.root, name))
