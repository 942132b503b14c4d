"""bench.py smoke gate: the driver records BENCH_r{N} from this
script's stdout — an import error or JSON-shape drift there would
silently cost the round's benchmark row. Runs the real script in a
subprocess (it owns its own Ray session) at sf0.001 / 4 CPUs."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_valid_json_line():
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
        PYTHONPATH=REPO,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    # the driver-contract shape
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus"):
        assert key in out, key
    assert out["unit"] == "sec" and out["value"] > 0
    assert out["num_cpus"] == 4 and out["sf"] == "0.001"
    # every timed query produced a positive wall
    assert out["queries"] and all(v > 0 for v in out["queries"].values())
    # the round-4 additive keys are present
    for k in ("extract_main_content", "dedup_incremental", "heavy_hitters"):
        assert k in out["queries"], k
