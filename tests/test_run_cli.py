"""Smoke gate for the `ray job submit` entry point (pdf_ocr_api_ray.run):
the CLI owns its own Ray session in a subprocess, emits a JSON summary,
lands resumable per-partition output, and a re-invocation skips every
completed partition — the north-rule submit-and-resume loop end to end."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _invoke(input_path, out_dir):
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pdf_ocr_api_ray.run",
            "--input",
            input_path,
            "--out",
            out_dir,
            "--num-partitions",
            "3",
            "--num-cpus",
            "4",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_run_cli_submit_and_resume(tmp_path):
    from pdf_ocr_api_ray.sources.fixtures import docs_to_table, generate_fixture_docs

    docs = generate_fixture_docs(
        families=["f1_table_basic", "f12_multichunk"], docs_per_family=5
    )
    input_path = str(tmp_path / "input.parquet")
    pq.write_table(docs_to_table(docs), input_path)
    out_dir = str(tmp_path / "out")

    first = _invoke(input_path, out_dir)
    assert sorted(first["processed"]) == [0, 1, 2] and first["skipped"] == []
    assert first["wall_s"] > 0

    from pdf_ocr_api_ray.state.checkpoint import read_output

    table = read_output(out_dir)
    assert table.num_rows == len(docs)

    second = _invoke(input_path, out_dir)
    assert second["processed"] == [] and sorted(second["skipped"]) == [0, 1, 2]
