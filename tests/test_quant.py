"""quantize_embeddings: straight-line numpy replay equality, the
theoretical error bound, and the dead-dimension path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _reference(emb: np.ndarray, ids: np.ndarray) -> pd.DataFrame:
    vu = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    a = np.abs(vu).max(axis=0)
    safe = np.maximum(a, 1)
    code = np.where(a > 0, (np.abs(vu) * 254 + safe) // (2 * safe), 0) * np.sign(vu)
    recon = np.where(a > 0, (2 * np.abs(code) * safe + 127) // 254, 0) * np.sign(code)
    err = np.abs(vu - recon).max(axis=1)
    return pd.DataFrame(
        {
            "vec_id": ids,
            "n_dims": np.full(len(ids), vu.shape[1], dtype=np.int64),
            "codes": [",".join(map(str, row)) for row in code],
            "max_err_u": err.astype(np.int64),
        }
    )


def test_quantize_matches_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.quant import quantize_embeddings

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = np.stack(t["embedding"].to_pylist())
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    want = _reference(emb, ids).sort_values("vec_id", ignore_index=True)
    got = (
        quantize_embeddings(SF_DIR)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)[want.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quantize_error_bound_and_code_range(ray_session):
    from pdf_ocr_api_ray.pipelines.quant import quantize_embeddings

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    vu = np.floor(np.stack(t["embedding"].to_pylist()).astype(np.float64) * 1e6 + 0.5)
    amax = int(np.abs(vu).max())
    got = quantize_embeddings(SF_DIR).to_pandas()
    codes = np.array(
        [int(x) for row in got["codes"] for x in row.split(",")], dtype=np.int64
    )
    assert codes.min() >= -127 and codes.max() <= 127
    # two half-step roundings: quantize (≤ A/254 micro-units) + integer
    # reconstruction (≤ 1/2) — the worst case is A/254 + 1
    assert int(got["max_err_u"].max()) <= amax // 254 + 2


def test_quantize_dead_dimension_codes_zero(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.quant import quantize_embeddings

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(40, 8)).astype(np.float32)
    emb[:, 3] = 0.0  # dead dimension
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(40), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in emb], pa.list_(pa.float32())),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "embeddings.parquet")
    got = quantize_embeddings(str(d)).to_pandas()
    for row in got["codes"]:
        assert row.split(",")[3] == "0"
    want = _reference(emb, np.arange(40, dtype=np.int64)).sort_values(
        "vec_id", ignore_index=True
    )
    got = got.sort_values("vec_id", ignore_index=True)[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
