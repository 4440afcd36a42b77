"""Cross-parallelism correctness probe: run every queries() entry at a
given num_cpus and print one JSON object {query: {"rows": n, "hash": h}}.

The round-2 simhash failure (an untyped empty frame promoted uint64->
float64 under Ray schema unification) was invisible at num_cpus=8 and
wrong at 32 — results must be BITWISE identical across parallelism
levels. tests/test_xpar_gate.py runs this script at two cpu counts in
fresh processes and diffs the hashes.

Usage: python tools/xpar_hashes.py <num_cpus> [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracles import canon, to_pandas, value_hash  # noqa: E402


def main():
    num_cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    only = set(sys.argv[3:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # smaller blocks -> more tasks -> more chances for an empty block to
    # poison schema unification; this is the adversarial setting
    ctx.target_max_block_size = 1 * 1024 * 1024

    import __ray_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = canon(to_pandas(fn(sf_dir)))
            out[name] = {"rows": int(len(df)), "hash": value_hash(df)}
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            out[name] = {"error": f"{type(e).__name__}: {e}"}
    ray.shutdown()
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
