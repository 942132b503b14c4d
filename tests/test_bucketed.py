"""Key-bucketed layout: round-trip multiset equality, per-key
co-location, the zero-exchange sessionize bit-equal to the
exchange-based op, resume skip, and parameter-drift refusal."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


def test_bucketed_roundtrip_and_colocation(ray_session, tmp_path):
    from pdf_ocr_api_ray.sources.bucketed import bucket_files, write_bucketed

    out = str(tmp_path / "ev_buckets")
    summary = write_bucketed(SF_DIR, out, num_buckets=16)
    assert (summary["status"] == "written").all()
    files = bucket_files(out, key="user_id")
    parts = [pq.read_table(f).to_pandas() for f in files]
    # co-location: every user's rows land in exactly one file
    seen = {}
    for i, p in enumerate(parts):
        for u in p["user_id"].unique():
            assert seen.setdefault(int(u), i) == i
    back = pd.concat(parts, ignore_index=True)
    orig = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    pd.testing.assert_frame_equal(
        _canon(back), _canon(orig[back.columns.tolist()]), check_dtype=False
    )


def test_bucketed_sessionize_equals_exchange_based(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.events import sessionize
    from pdf_ocr_api_ray.sources.bucketed import sessionize_bucketed, write_bucketed

    out = str(tmp_path / "ev_buckets")
    write_bucketed(SF_DIR, out, num_buckets=16)
    a = _canon(sessionize_bucketed(out).to_pandas())
    b = _canon(sessionize(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_rerun_skips_complete_buckets(ray_session, tmp_path):
    from pdf_ocr_api_ray.sources.bucketed import write_bucketed

    out = str(tmp_path / "ev_buckets")
    first = write_bucketed(SF_DIR, out, num_buckets=8)
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "part.parquet"))
        for d in os.listdir(out)
        if d.startswith("bucket=")
    }
    second = write_bucketed(SF_DIR, out, num_buckets=8)
    assert (second["status"] == "skipped").all()
    for d, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "part.parquet")) == t
    assert first["n_rows"].sum() == second["n_rows"].sum()


def test_bucketed_refuses_parameter_drift(ray_session, tmp_path):
    from pdf_ocr_api_ray.sources.bucketed import (
        bucket_files,
        write_bucketed,
    )

    out = str(tmp_path / "ev_buckets")
    write_bucketed(SF_DIR, out, num_buckets=8)
    with pytest.raises(ValueError, match="drift"):
        write_bucketed(SF_DIR, out, num_buckets=16)
    with pytest.raises(ValueError, match="drift"):
        bucket_files(out, key="event_id")


def test_bucketed_transitions_equals_exchange_based(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.events import event_transitions
    from pdf_ocr_api_ray.sources.bucketed import transitions_bucketed, write_bucketed

    out = str(tmp_path / "ev_buckets")
    write_bucketed(SF_DIR, out, num_buckets=16)
    a = transitions_bucketed(out).reset_index(drop=True)
    b = event_transitions(SF_DIR).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
