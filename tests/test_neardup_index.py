"""Persisted LSH near-dup index: build-once/query-many reuse,
parameter-drift refusal, planted-duplicate recall. Oracle parity runs
via tests/test_queries_vs_duckdb.py (rotated_out row 'neardup_index')."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from pdf_ocr_api_ray.pipelines.index import (
    build_neardup_index,
    query_neardup_index,
)

SF = "/root/testdata/sf0.001"


def _q(index_dir):
    return (
        query_neardup_index(SF, index_dir)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def test_build_once_query_twice_identical(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    man = build_neardup_index(SF, idx)
    assert man["n_bands"] == 32
    assert os.path.isdir(os.path.join(idx, "bands"))
    assert os.path.isdir(os.path.join(idx, "fps"))

    a = _q(idx)
    b = _q(idx)  # second increment query: pure index reuse
    pd.testing.assert_frame_equal(a, b)

    # planted structure: every pair is cross (base, increment); exact
    # copies confirm at J=1.0, mutants above the 0.6 threshold
    assert (a["id_a"] < 1_000_000).all() and (a["id_b"] >= 1_000_000).all()
    assert (a["jaccard"] >= 0.6).all()
    # every exact copy pairs with its SOURCE at exactly J=1.0 (LSH
    # cannot miss J=1); copies may additionally pair with other base
    # docs that are natural near-dups of the source — those are real
    # (the oracle emits them too) and sit below 1.0
    copies = a[a["id_b"].between(1_000_000, 1_999_999)]
    src = copies[copies["id_b"] - 1_000_000 == copies["id_a"]]
    assert len(src) > 0 and (src["jaccard"] == 1.0).all()
    planted_sources = {d for d in range(500) if d % 5 == 0}
    assert set(src["id_a"]) == planted_sources
    mutants = a[a["id_b"] >= 2_000_000]
    assert len(mutants) > 0


def test_parameter_drift_refused(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    build_neardup_index(SF, idx)
    with open(os.path.join(idx, "manifest.json"), "w") as f:
        json.dump({"n_hashes": 128, "n_bands": 16, "version": 1}, f)
    with pytest.raises(ValueError, match="index parameters"):
        query_neardup_index(SF, idx)
