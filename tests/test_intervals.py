"""coalesce_intervals: pandas reference replay plus the island-edge
semantics (touching merges, strict gap splits, containment absorbs)
and input-order robustness. global_row_number: exact-rank properties
on dense, sparse, skewed, and single-bucket id distributions.
(DuckDB-twin parity for both runs in tests/test_queries_vs_duckdb.py.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _write_events(tmp_path, s_us, dur_us, user_id=None, shuffle_seed=None):
    """Events whose (ts, value) produce exactly [s, s + |v_u| + 1s)."""
    n = len(s_us)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64)
            if user_id is None
            else np.asarray(user_id, dtype=np.int64),
            "ts": pd.to_datetime(np.asarray(s_us, dtype=np.int64), unit="us"),
            # dur_us = |floor(value·1e6 + .5)| + 1_000_000
            "event_type": ["x"] * n,
            "value": (np.asarray(dur_us, dtype=np.int64) - 1_000_000) / 1e6,
            "props": ["{}"] * n,
        }
    )
    if shuffle_seed is not None:
        ev = ev.sample(frac=1.0, random_state=shuffle_seed, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))


def _reference(ev: pd.DataFrame) -> pd.DataFrame:
    s = ev["ts"].astype("datetime64[us]").astype("int64")
    vu = np.floor(ev["value"].to_numpy(np.float64) * 1e6 + 0.5).astype(np.int64)
    iv = pd.DataFrame(
        {
            "user_id": ev["user_id"].astype("int64"),
            "s": s,
            "e": s + np.abs(vu) + 1_000_000,
            "event_id": ev["event_id"].astype("int64"),
        }
    ).sort_values(["user_id", "s", "e", "event_id"])
    rows = []
    for uid, g in iv.groupby("user_id"):
        cur_s = cur_e = None
        cnt = 0
        for _, r in g.iterrows():
            if cur_s is None or r["s"] > cur_e:
                if cur_s is not None:
                    rows.append((uid, cur_s, cur_e, cnt))
                cur_s, cur_e, cnt = r["s"], r["e"], 1
            else:
                cur_e = max(cur_e, r["e"])
                cnt += 1
        if cur_s is not None:
            rows.append((uid, cur_s, cur_e, cnt))
    return pd.DataFrame(rows, columns=["user_id", "start_us", "end_us", "n_events"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), ignore_index=True)


def test_intervals_match_reference_on_testdata(ray_session):
    from pdf_ocr_api_ray.pipelines.events import coalesce_intervals

    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    want = _reference(ev)
    got = coalesce_intervals(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want[got.columns.tolist()]), check_dtype=False
    )


def test_intervals_island_edges(ray_session, tmp_path):
    """Touching merges (next.s == prev.e), a 1-µs gap splits, and a
    contained interval is absorbed without extending the island."""
    from pdf_ocr_api_ray.pipelines.events import coalesce_intervals

    M = 1_000_000
    # A: [0, 2s) then [2s, 3s) — touching, ONE island of 2 events
    # B: [10s, 11s) then [11s + 1µs, 12s+1µs) — 1-µs gap, TWO islands
    # C: [20s, 30s) contains [22s, 23s) — ONE island ending at 30s
    s = [0, 2 * M, 10 * M, 11 * M + 1, 20 * M, 22 * M]
    d = [2 * M, 1 * M, 1 * M, 1 * M, 10 * M, 1 * M]
    _write_events(tmp_path, s, d, user_id=[1, 1, 2, 2, 3, 3])
    got = _canon(coalesce_intervals(str(tmp_path)).to_pandas())
    want = _canon(
        pd.DataFrame(
            {
                "user_id": [1, 2, 2, 3],
                "start_us": [0, 10 * M, 11 * M + 1, 20 * M],
                "end_us": [3 * M, 11 * M, 12 * M + 1, 30 * M],
                "n_events": [2, 1, 1, 2],
            }
        )
    )
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()], check_dtype=False)


def test_intervals_ignore_input_row_order(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.events import coalesce_intervals

    rng = np.random.default_rng(11)
    n = 300
    s = rng.integers(0, 10**8, n)
    d = 1_000_000 + rng.integers(0, 5 * 10**6, n)
    uid = rng.integers(0, 9, n)
    _write_events(tmp_path, s, d, user_id=uid, shuffle_seed=5)
    ev = pq.read_table(str(tmp_path / "events.parquet")).to_pandas()
    want = _reference(ev)
    got = coalesce_intervals(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want[got.columns.tolist()]), check_dtype=False
    )


def test_global_row_number_dense_and_sparse(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.sampling import global_row_number

    rng = np.random.default_rng(3)
    ids = np.unique(rng.integers(-(10**9), 10**9, 3000))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    got = global_row_number(str(tmp_path)).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    want = pd.DataFrame(
        {"doc_id": np.sort(ids), "row_no": np.arange(len(ids), dtype=np.int64)}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_global_row_number_is_a_permutation_on_testdata(ray_session):
    from pdf_ocr_api_ray.pipelines.sampling import global_row_number

    got = global_row_number(SF_DIR).to_pandas()
    n = len(got)
    assert sorted(got["row_no"].tolist()) == list(range(n))
    g = got.sort_values("doc_id")
    assert (np.diff(g["row_no"].to_numpy()) > 0).all()  # order-preserving


def test_global_row_number_single_bucket_and_skew(ray_session, tmp_path):
    """num_buckets=1 (everything in one range bucket) and a pathological
    skew (all ids in one narrow range + one far outlier) still rank
    exactly."""
    from pdf_ocr_api_ray.pipelines.sampling import global_row_number

    ids = np.concatenate([np.arange(100, dtype=np.int64), [10**12]])
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    for nb in (1, 7, 4096):
        got = (
            global_row_number(str(tmp_path), num_buckets=nb)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert got["row_no"].tolist() == list(range(101)), f"buckets={nb}"


def test_global_row_number_rejects_bad_buckets():
    from pdf_ocr_api_ray.pipelines.sampling import global_row_number

    with pytest.raises(ValueError):
        global_row_number(SF_DIR, num_buckets=0)


def test_quality_deciles_equal_depth(ray_session):
    """Deciles are equal-depth (sizes differ by ≤1), ordered (a better
    quality_idx never lands in a later-or-equal decile with a smaller
    id ahead of it), and cover 1..k."""
    from pdf_ocr_api_ray.pipelines.text import quality_deciles

    got = quality_deciles(SF_DIR).to_pandas()
    sizes = got.groupby("decile").size()
    assert sorted(sizes.index) == list(range(1, 11))
    assert sizes.max() - sizes.min() <= 1
    g = got.sort_values(["quality_idx", "doc_id"], ascending=[False, True])
    assert (np.diff(g["decile"].to_numpy()) >= 0).all()


def test_quality_deciles_fewer_rows_than_buckets(ray_session, tmp_path):
    """n < k: ntile gives each row its own bucket 1..n."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import quality_deciles

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([7, 3, 5], pa.int64()),
                "text": ["the a of to and", "zz", "the the the xx yy"],
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": pa.array([15, 2, 17], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = quality_deciles(str(tmp_path)).to_pandas()
    assert sorted(got["decile"].tolist()) == [1, 2, 3]
    assert len(got) == 3


def test_quality_deciles_id_field_guard(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import quality_deciles

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1 << 50], pa.int64()),
                "text": ["x"],
                "lang": ["en"],
                "source": ["s"],
                "n_chars": pa.array([1], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    with pytest.raises(Exception):  # OverflowError surfaces via Ray task error
        quality_deciles(str(tmp_path)).to_pandas()
