"""zscore_outliers: big-int reference replay, boundary exactness, and
the quantizer overflow guard."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _reference(df: pd.DataFrame, k: int = 3) -> pd.DataFrame:
    df = df.copy()
    df["value_u"] = np.floor(df["value"].to_numpy(np.float64) * 1e6 + 0.5).astype(
        np.int64
    )
    keep = []
    for et, g in df.groupby("event_type"):
        v = [int(x) for x in g["value_u"]]
        n, s, q = len(v), sum(v), sum(x * x for x in v)
        t = k * k * (n * q - s * s)
        for row, x in zip(g.itertuples(), v):
            if (n * x - s) * (n * x - s) > t:
                keep.append((row.event_id, row.user_id, et, x))
    return (
        pd.DataFrame(keep, columns=["event_id", "user_id", "event_type", "value_u"])
        .sort_values("event_id", ignore_index=True)
    )


def test_outliers_match_bigint_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.outliers import zscore_outliers

    events = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    ).to_pandas()
    want = _reference(events)
    got = (
        zscore_outliers(SF_DIR)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)[want.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_outliers_boundary_is_exact(ray_session, tmp_path):
    """A value EXACTLY k·sigma from the mean is NOT an outlier (strict
    inequality) — the cutoff derivation must not flip it."""
    from pdf_ocr_api_ray.pipelines.outliers import zscore_outliers

    # values {0, 0, 3, -3, 6}: mean 1.2 … pick a constructed set where
    # (n·v − S)² == k²(nQ − S²) exactly for one v: v ∈ {-1, 1}, n=2,
    # S=0, Q=2 → T = 9·(2·2 − 0) = 36; (2·v)² = 4 < 36 → no outliers;
    # add v=3: n=3, S=3, Q=11, T=9·(33−9)=216; (3·3−3)²=36 < 216.
    # Exact-boundary case: {−1, 1} with k=1: T = 1·(4) = 4, (2·±1)² = 4
    # → NOT > → kept out.
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["a", "a"]),
            "value": pa.array([-1.0, 1.0]),
        }
    )
    pq.write_table(t, d / "events.parquet")
    out = zscore_outliers(str(d), k=1).to_pandas()
    assert len(out) == 0  # exactly k·sigma — strict > keeps both


def test_outliers_flags_planted_spike(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.outliers import zscore_outliers

    rng = np.random.default_rng(11)
    n = 500
    vals = rng.normal(10, 1, n)
    vals[7] = 1000.0  # unmistakable spike
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(np.zeros(n), pa.int64()),
            "event_type": pa.array(["a"] * n),
            "value": pa.array(vals),
        }
    )
    pq.write_table(t, d / "events.parquet")
    out = zscore_outliers(str(d)).to_pandas()
    assert 7 in set(out["event_id"])


def test_outliers_overflow_guard(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.outliers import zscore_outliers

    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["a"]),
            "value": pa.array([1e5]),  # 1e11 micro-units > the 2^23 bound
        }
    )
    pq.write_table(t, d / "events.parquet")
    with pytest.raises(Exception, match="exact uint64 partial bound"):
        zscore_outliers(str(d)).to_pandas()
