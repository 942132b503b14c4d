"""Any-cwd driver contract regression gate.

The driver imports ``__ray_entry__`` from an arbitrary cwd AFTER
calling ``ray.init`` itself — so workers never see /root/repo on
PYTHONPATH and every pipeline must reach workers purely through the
package's pickle-by-value registration. A function-body relative
import inside worker-executed code (a batch UDF, an actor
``__init__``/``__call__``) defeats that shipping and raises
ModuleNotFoundError only under this exact setup — it is invisible to
the rest of the suite, which runs with the repo importable
everywhere. Two escapes shipped before this gate existed (the
actor-stage clients import, r5; the vectorized ``layout_elements_batch``
import, r5), each caught by a driver sweep instead of CI.

One subprocess: cwd=/tmp, PYTHONPATH stripped, ``ray.init`` before the
module import (the driver's documented order), then the flagship
``entry()`` plus the one historically-regressed query."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, {repo!r})  # driver-side import path only; workers never see it
import __ray_entry__ as E
n_entry = len(E.entry().to_pandas())
n_layout = len(E.queries()["extract_layout"]("/root/testdata/sf0.001").to_pandas())
print("OK", n_entry, n_layout)
ray.shutdown()
"""


def test_entry_and_layout_from_foreign_cwd(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ok = [l for l in proc.stdout.splitlines() if l.startswith("OK ")]
    assert ok, proc.stdout[-2000:]
    _, n_entry, n_layout = ok[-1].split()
    assert int(n_entry) > 0 and int(n_layout) > 0
