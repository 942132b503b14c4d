"""Schema-evolution reader + parquet compaction maintenance pass."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(path, table):
    pq.write_table(table, path)


def test_evolved_reader_fills_missing_columns_and_reorders(ray_session, tmp_path):
    from pdf_ocr_api_ray.sources.evolve import read_parquet_evolved, unified_schema

    d = tmp_path / "tbl"
    d.mkdir()
    _write(d / "v1.parquet", pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                       "text": pa.array(["a", "b"])}))
    # v2 adds `quality` and reorders columns
    _write(d / "v2.parquet", pa.table({"quality": pa.array([0.5]),
                                       "text": pa.array(["c"]),
                                       "doc_id": pa.array([3], pa.int64())}))
    s = unified_schema(str(d))
    assert s.names == ["doc_id", "text", "quality"]
    df = read_parquet_evolved(str(d)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert df["quality"].isna().tolist() == [True, True, False]
    assert df["text"].tolist() == ["a", "b", "c"]


def test_evolved_reader_refuses_type_conflicts(ray_session, tmp_path):
    from pdf_ocr_api_ray.sources.evolve import unified_schema

    d = tmp_path / "tbl"
    d.mkdir()
    _write(d / "v1.parquet", pa.table({"k": pa.array([1], pa.int64())}))
    _write(d / "v2.parquet", pa.table({"k": pa.array(["x"])}))
    with pytest.raises(TypeError, match="schema conflict on column 'k'"):
        unified_schema(str(d))


def test_evolved_reader_column_pruning(ray_session, tmp_path):
    from pdf_ocr_api_ray.sources.evolve import read_parquet_evolved

    d = tmp_path / "tbl"
    d.mkdir()
    _write(d / "v1.parquet", pa.table({"doc_id": pa.array([1], pa.int64()),
                                       "text": pa.array(["a"])}))
    _write(d / "v2.parquet", pa.table({"doc_id": pa.array([2], pa.int64()),
                                       "text": pa.array(["b"]),
                                       "quality": pa.array([0.9])}))
    df = read_parquet_evolved(str(d), columns=["doc_id", "quality"]).to_pandas()
    assert sorted(df.columns) == ["doc_id", "quality"]


def _content_key(path: str) -> pd.DataFrame:
    t = pq.read_table(path) if path.endswith(".parquet") else pq.ParquetDataset(path).read()
    df = t.to_pandas()
    return df.sort_values(list(df.columns), ignore_index=True)


def test_compact_preserves_content_and_reduces_files(ray_session, tmp_path):
    from pdf_ocr_api_ray.state.compact import compact_parquet, dataset_file_stats

    src = tmp_path / "frag"
    src.mkdir()
    rng = np.random.default_rng(3)
    for i in range(40):
        n = int(rng.integers(50, 200))
        _write(
            src / f"part-{i:03d}.parquet",
            pa.table(
                {
                    "doc_id": pa.array(rng.integers(0, 1 << 40, n), pa.int64()),
                    "text": pa.array(["t" * int(x) for x in rng.integers(1, 50, n)]),
                }
            ),
        )
    out = tmp_path / "compacted"
    stats = compact_parquet(str(src), str(out), target_mb=1)
    assert stats["files_in"] == 40
    assert stats["files_out"] < 40
    got = _content_key(str(out))
    want = _content_key(str(src))
    pd.testing.assert_frame_equal(got, want)
    _, rows_out, _ = dataset_file_stats(str(out))
    assert rows_out == stats["rows"]


def test_compact_is_atomic_on_rerun(ray_session, tmp_path):
    from pdf_ocr_api_ray.state.compact import compact_parquet

    src = tmp_path / "frag"
    src.mkdir()
    _write(src / "a.parquet", pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
    out = tmp_path / "compacted"
    compact_parquet(str(src), str(out))
    first = _content_key(str(out))
    # re-running replaces the output wholesale (no stale mix), and no
    # tmp directory survives
    compact_parquet(str(src), str(out))
    pd.testing.assert_frame_equal(_content_key(str(out)), first)
    assert not glob.glob(str(tmp_path / "compacted.tmp-*"))
