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


def test_append_grows_the_index(ray_session, tmp_path):
    """The production loop: base index -> query increment 1 -> append
    it -> increment 2's query now matches BOTH base and increment-1
    docs. Self-contained corpus with planted cross-range duplicates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.index import append_to_neardup_index

    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    text_b = "one two three four five six seven eight nine ten"
    text_c = "red green blue cyan magenta yellow black white gray pink"

    def write(dirname, rows):
        d = tmp_path / dirname
        d.mkdir()
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, str(d / "documents.parquet"))
        return str(d)

    base_dir = write("base", [(1, text_a), (2, text_b)])
    inc1 = write("inc1", [(100, text_c), (101, text_a)])  # 101 dups base 1
    inc2 = write(
        "inc2", [(200, text_c), (201, text_b)]
    )  # 200 dups inc1's 100; 201 dups base 2

    idx = str(tmp_path / "idx")
    from pdf_ocr_api_ray.pipelines.index import (
        build_neardup_index,
        query_neardup_index,
    )

    build_neardup_index(base_dir, idx)

    q1 = query_neardup_index(
        base_dir, idx, increment_path=str(tmp_path / "inc1" / "documents.parquet")
    ).to_pandas()
    assert set(map(tuple, q1[["id_a", "id_b"]].values.tolist())) == {(1, 101)}

    # BEFORE append: inc2's 200 has no match (100 not indexed yet)
    q2_pre = query_neardup_index(
        base_dir, idx, increment_path=str(tmp_path / "inc2" / "documents.parquet")
    ).to_pandas()
    assert set(map(tuple, q2_pre[["id_a", "id_b"]].values.tolist())) == {(2, 201)}

    append_to_neardup_index(idx, str(tmp_path / "inc1" / "documents.parquet"))

    q2_post = query_neardup_index(
        base_dir, idx, increment_path=str(tmp_path / "inc2" / "documents.parquet")
    ).to_pandas()
    assert set(map(tuple, q2_post[["id_a", "id_b"]].values.tolist())) == {
        (2, 201),
        (100, 200),
    }
