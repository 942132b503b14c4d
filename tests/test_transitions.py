"""event_transitions: pandas reference replay, input-order robustness
(shuffled rows give the same matrix — ordering comes from (ts,
event_id), not arrival order), the probability-row invariant, and the
quantizer headroom guard. (DuckDB-twin parity runs in
tests/test_queries_vs_duckdb.py.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _reference(ev: pd.DataFrame, p_scale: int = 1_000_000) -> pd.DataFrame:
    g = ev.sort_values(["user_id", "ts", "event_id"])
    prev = g.groupby("user_id", sort=False)["event_type"].shift(1)
    pairs = pd.DataFrame({"prev_type": prev, "next_type": g["event_type"]}).dropna()
    out = (
        pairs.groupby(["prev_type", "next_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    out["n"] = out["n"].astype(np.int64)
    tot = out.groupby("prev_type")["n"].transform("sum")
    out["p_u"] = (out["n"] * p_scale) // tot
    return out.sort_values(["prev_type", "next_type"], ignore_index=True)


def test_transitions_match_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.events import event_transitions

    ev = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).to_pandas()
    want = _reference(ev)
    got = event_transitions(SF_DIR).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_transitions_ignore_input_row_order(ray_session, tmp_path):
    """Rows written in scrambled order produce the identical matrix:
    adjacency is defined by (ts, event_id), never by file position."""
    from pdf_ocr_api_ray.pipelines.events import event_transitions

    rng = np.random.default_rng(7)
    n = 400
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": (np.arange(n, dtype=np.int64) * 13) % 17,
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "event_type": np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)],
            "value": np.zeros(n),
            "props": ["{}"] * n,
        }
    )
    want = _reference(ev)
    shuffled = ev.sample(frac=1.0, random_state=3, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(shuffled), str(tmp_path / "events.parquet"))
    got = event_transitions(str(tmp_path)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want[got.columns.tolist()], check_dtype=False
    )


def test_transitions_probability_rows_sum_to_scale(ray_session):
    """Per prev_type, Σ p_u lands within T of P_SCALE (floor rounding
    drops < 1 unit per cell, never adds)."""
    from pdf_ocr_api_ray.pipelines.events import P_SCALE, event_transitions

    got = event_transitions(SF_DIR)
    for _, g in got.groupby("prev_type"):
        s = int(g["p_u"].sum())
        assert P_SCALE - len(g) < s <= P_SCALE


def test_transitions_headroom_guard(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.events import event_transitions

    n = 10
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "event_type": ["x"] * n,
            "value": np.zeros(n),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
    with pytest.raises(OverflowError):
        event_transitions(str(tmp_path), p_scale=2**62)
