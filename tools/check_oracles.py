"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side on the same sf dir, compare
row count, sorted column names and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            # duckdb HUGEINT sums arrive as object ints/Decimals
            try:
                as_num = pd.to_numeric(col)
                col = as_num
            except (ValueError, TypeError):
                df[c] = col.astype(str)
                continue
        if np.issubdtype(col.dtype, np.floating):
            v = col.astype(np.float64)
            if len(v) and np.all(np.isfinite(v)) and np.all(v == np.floor(v)):
                df[c] = v.astype(np.int64)  # integral floats == ints
            else:
                df[c] = np.round(v, 9)
        elif np.issubdtype(col.dtype, np.integer):
            df[c] = col.astype(np.int64)
        else:
            df[c] = col
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for c in df.columns:
        h.update(c.encode())
        h.update(df[c].astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    import time

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            ray_df = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.monotonic() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(ray_df)} rows, {dt:.1f}s)")
            continue
        try:
            ora_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures.append(name)
            continue
        problems = []
        if len(ray_df) != len(ora_df):
            problems.append(f"rows {len(ray_df)} vs {len(ora_df)}")
        if list(ray_df.columns) != list(ora_df.columns):
            problems.append(f"cols {list(ray_df.columns)} vs {list(ora_df.columns)}")
        elif value_hash(ray_df) != value_hash(ora_df):
            diff_cols = [
                c for c in ray_df.columns
                if len(ray_df) == len(ora_df) and not (ray_df[c].to_numpy() == ora_df[c].to_numpy()).all()
            ]
            problems.append(f"value hash mismatch (cols differing: {diff_cols})")
            if len(ray_df) == len(ora_df) and diff_cols:
                c = diff_cols[0]
                neq = ray_df[c].to_numpy() != ora_df[c].to_numpy()
                i = int(np.flatnonzero(neq)[0])
                problems.append(f"  first diff row {i}: ray={ray_df.iloc[i].to_dict()} oracle={ora_df.iloc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(ray_df)} rows, {dt:.1f}s)")

    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries PASS")


if __name__ == "__main__":
    main()
