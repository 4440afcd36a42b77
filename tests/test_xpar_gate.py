"""Cross-parallelism correctness gate: every queries() entry must return
bitwise-identical values at low and high parallelism.

Motivation: round 2's simhash bug — an untyped empty-DataFrame fallback
let Ray schema unification promote a uint64 hash column to float64, so
the pipeline was right at num_cpus=8 and silently wrong at 32. Any
result that depends on the block layout is a correctness bug; this gate
catches the whole class mechanically.

Runs tools/xpar_hashes.py in two FRESH subprocesses (a Ray session's
num_cpus is fixed at init, so two sessions are required) over sf0.001
and diffs the per-query value hashes.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _run(num_cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "xpar_hashes.py"), str(num_cpus), SF_DIR],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"},
    )
    assert proc.returncode == 0, f"xpar_hashes cpus={num_cpus} failed:\n{proc.stderr[-4000:]}"
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_queries_identical_across_parallelism():
    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata missing")
    low = _run(2)
    high = _run(16)
    assert set(low) == set(high)
    bad = []
    for name in sorted(low):
        if "error" in low[name] or "error" in high[name]:
            bad.append((name, low[name], high[name]))
        elif low[name] != high[name]:
            bad.append((name, low[name], high[name]))
    assert not bad, "parallelism-dependent results:\n" + "\n".join(map(str, bad))
