"""embedding_pca — straight-line-reference parity, planted-structure
recovery, degenerate inputs, and the asserted int64 guard (the
sketch/PQ-family test pattern: no SQL twin for an eigendecomposition,
so an independent numpy replay pins the distributed arithmetic)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(tmp_path, vecs: np.ndarray):
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")


def test_pca_matches_straightline_reference(ray_session):
    """Bit parity vs the numpy replay on the real sf0.001 table — the
    fold's int64 Gram and the driver finish are deterministic, so the
    distributed scores equal the straight-line ones exactly."""
    from pdf_ocr_api_ray.pipelines.pca import embedding_pca, pca_reference

    sfd = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sfd}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = np.stack(tbl["embedding"].to_pylist()).astype(np.float32)
    ref_scores, comps, evr = pca_reference(vecs)

    out = (
        embedding_pca(sfd)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    order = np.argsort(tbl["vec_id"].to_numpy())
    got = out[[f"pc{j}" for j in range(comps.shape[1])]].to_numpy()
    assert np.array_equal(got, ref_scores[order])
    # variance ordering is real on this corpus
    assert evr[0] >= evr[1] >= evr[2] >= evr[3] > 0


def test_pca_planted_structure_recovery(ray_session, tmp_path):
    """Two planted orthogonal directions with 25:4 variance dominate
    isotropic noise → pc0/pc1 scores recover the planted coordinates
    (up to sign) and the explained variance concentrates."""
    from pdf_ocr_api_ray.pipelines.pca import embedding_pca, pca_reference

    rng = np.random.default_rng(11)
    d, n = 16, 400
    u = np.zeros(d); u[0] = 1.0
    v = np.zeros(d); v[5] = 1.0
    a = rng.normal(scale=5.0, size=n)
    b = rng.normal(scale=2.0, size=n)
    x = (a[:, None] * u + b[:, None] * v + rng.normal(scale=0.01, size=(n, d))).astype(
        np.float32
    )
    _write_embeddings(tmp_path, x)

    out = embedding_pca(str(tmp_path)).to_pandas().sort_values("vec_id")
    c0 = np.corrcoef(out["pc0"].to_numpy(), a)[0, 1]
    c1 = np.corrcoef(out["pc1"].to_numpy(), b)[0, 1]
    # finite-sample correlation between the planted coordinates
    # rotates pc1 slightly — 0.995 still pins recovery unambiguously
    assert abs(c0) > 0.995 and abs(c1) > 0.995

    _, _, evr = pca_reference(x)
    assert evr[0] > evr[1] > evr[2]
    assert evr[0] + evr[1] > 0.99


def test_pca_constant_vectors_zero_covariance(ray_session, tmp_path):
    """All-identical vectors → zero covariance; the op still returns a
    finite, deterministic projection for every row."""
    from pdf_ocr_api_ray.pipelines.pca import embedding_pca

    x = np.tile(np.linspace(-0.3, 0.3, 8, dtype=np.float32), (20, 1))
    _write_embeddings(tmp_path, x)
    out = embedding_pca(str(tmp_path)).to_pandas()
    assert len(out) == 20
    assert np.isfinite(out[[c for c in out.columns if c.startswith("pc")]].to_numpy()).all()
    # identical inputs → identical scores
    assert out.drop(columns=["vec_id"]).nunique().max() == 1


def test_pca_overflow_guard_raises(ray_session, tmp_path):
    """Components outside the n-derived int64-safe range raise a clear
    OverflowError instead of silently wrapping the Gram fold."""
    from pdf_ocr_api_ray.pipelines.pca import embedding_pca

    x = np.full((4, 8), 5000.0, dtype=np.float32)
    _write_embeddings(tmp_path, x)
    with pytest.raises(Exception, match="int64-safe"):
        embedding_pca(str(tmp_path)).to_pandas()


def test_pca_reference_sign_convention():
    """The sign fix makes each component's largest-|·| entry positive —
    flipping the input flips scores, not components' validity."""
    from pdf_ocr_api_ray.pipelines.pca import pca_reference

    rng = np.random.default_rng(3)
    x = rng.normal(scale=0.3, size=(50, 8)).astype(np.float32)
    _, comps, _ = pca_reference(x)
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        assert comps[i, j] > 0
