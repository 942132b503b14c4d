"""event_cooccurrence: pandas reference replay, exact-lift rational
check, duplicate-event idempotence (baskets are DISTINCT types), and
the headroom guard. (DuckDB-twin parity runs in
tests/test_queries_vs_duckdb.py.)"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _reference(ev: pd.DataFrame, scale: int = 1_000_000) -> pd.DataFrame:
    du = ev[["user_id", "event_type"]].drop_duplicates()
    total = du["user_id"].nunique()
    singles = du.groupby("event_type").size()
    counts: dict[tuple[str, str], int] = {}
    for _, types in du.groupby("user_id")["event_type"]:
        for a, b in itertools.combinations(sorted(types), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    rows = [
        (
            a,
            b,
            n,
            (n * total * scale) // (int(singles[a]) * int(singles[b])),
        )
        for (a, b), n in sorted(counts.items())
    ]
    return pd.DataFrame(rows, columns=["type_a", "type_b", "n_users", "lift_u"])


def test_cooccurrence_matches_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.events import event_cooccurrence

    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
    ).to_pandas()
    want = _reference(ev)
    got = event_cooccurrence(SF_DIR).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cooccurrence_duplicate_events_are_idempotent(ray_session, tmp_path):
    """A user emitting the same type 100 times counts once per basket
    — repeating rows cannot move n_users or lift."""
    from pdf_ocr_api_ray.pipelines.events import event_cooccurrence

    base = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3],
            "event_type": ["a", "b", "a", "b", "a"],
        }
    )
    noisy = pd.concat([base] + [base.iloc[[0]]] * 100, ignore_index=True)
    for name, frame in [("clean", base), ("noisy", noisy)]:
        n = len(frame)
        ev = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": frame["user_id"].astype("int64"),
                "ts": pd.to_datetime("2025-01-01")
                + pd.to_timedelta(np.arange(n), unit="s"),
                "event_type": frame["event_type"],
                "value": np.zeros(n),
                "props": ["{}"] * n,
            }
        )
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(ev), str(d / "events.parquet"))
    got_clean = event_cooccurrence(str(tmp_path / "clean"))
    got_noisy = event_cooccurrence(str(tmp_path / "noisy"))
    pd.testing.assert_frame_equal(got_clean, got_noisy)
    # 2 of 3 users share {a,b}: n_users=2, lift = 2*3*S // (3*2)
    assert got_clean.iloc[0].tolist() == ["a", "b", 2, 1_000_000]


def test_cooccurrence_headroom_guard(ray_session, tmp_path, monkeypatch):
    from pdf_ocr_api_ray.pipelines import events as ev_mod

    n = 8
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.repeat(np.arange(4, dtype=np.int64), 2),
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "event_type": ["a", "b"] * 4,
            "value": np.zeros(n),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
    monkeypatch.setattr(ev_mod, "COOC_SCALE", 2**62)
    with pytest.raises(OverflowError):
        ev_mod.event_cooccurrence(str(tmp_path))
