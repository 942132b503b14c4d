"""Incremental dedup (new-crawl increment vs existing corpus): mode
bit-equality, Bloom-saturation exactness, and empty-candidate path.
Oracle parity runs via tests/test_queries_vs_duckdb.py (registry row).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_ocr_api_ray.pipelines.dedup import dedup_incremental

SF = "/root/testdata/sf0.001"


def _run(sf, **kw):
    return (
        dedup_incremental(sf, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_modes_bit_equal(ray_session):
    a = _run(SF, mode="bloom")
    b = _run(SF, mode="antijoin")
    pd.testing.assert_frame_equal(a, b)
    # survivors are exactly the mutated copies whose text changed:
    # every id%7==0 doc has >= 1 token at this SF, so all 2M+ ids live
    assert (a["doc_id"] >= 2_000_000).all()
    assert len(a) == len([d for d in range(500) if d % 7 == 0])


def test_saturated_bloom_still_exact(ray_session):
    """m_bits far too small -> the filter saturates and every increment
    row becomes a candidate; the presence-verify pass must still reject
    the false positives, leaving output identical to a healthy filter.
    (This is the no-silent-approximation guarantee: Bloom sizing only
    affects COST, never the answer.)"""
    healthy = _run(SF, mode="bloom")
    tiny = _run(SF, mode="bloom", m_bits=64)
    pd.testing.assert_frame_equal(healthy, tiny)


def test_no_duplicates_in_increment(ray_session, tmp_path):
    """A corpus whose ids hit neither planting rule (no %5, no %7)
    yields an empty increment -> empty output with the right schema."""
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", "d e f", "g h i"], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = dedup_incremental(str(tmp_path), mode="bloom").to_pandas()
    assert len(out) == 0


def test_unmutatable_doc_is_dropped(ray_session, tmp_path):
    """doc_id 0 hits BOTH planting rules; with empty text the mutation
    is a no-op, so the 'mutated' copy duplicates base content and must
    be dropped — only genuinely-new content survives."""
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 7], pa.int64()),
            "text": pa.array(["", "alpha beta"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    for mode in ("bloom", "antijoin"):
        out = _run(str(tmp_path), mode=mode)
        # id 0: exact copy (1M) dropped, no-op "mutation" (2M) dropped;
        # id 7: mutated copy (2M+7, 'alpha alpha beta') survives
        assert out["doc_id"].tolist() == [2_000_007], mode


def test_unknown_mode_raises(ray_session):
    with pytest.raises(ValueError, match="unknown mode"):
        dedup_incremental(SF, mode="nope")
