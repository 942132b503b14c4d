"""Product quantization (pipelines/pq.py) — pinned by an independent
straight-line numpy implementation of the same fixed-point spec (no
SQL twin: per-subspace k-means + argmin encoding are not a DuckDB
query; same precedent as the sketch family and SemDeDup), planted-copy
ADC recovery, and block-layout invariance."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
Q = 1_000_000_000
M, KS, ITERS = 8, 16, 4


def _norm(v):
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)


def _ref_assign(vecs, books):
    m, ks, sub = books.shape
    n = len(vecs)
    codes = np.empty((n, m), dtype=np.uint8)
    dist = np.empty((n, m), dtype=np.float64)
    for j in range(m):
        x = vecs[:, j * sub : (j + 1) * sub]
        d = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=-1)
        a = np.argmin(d, axis=1)
        codes[:, j] = a
        dist[:, j] = d[np.arange(n), a]
    return codes, dist


def _ref_books(base: pd.DataFrame, m=M, ks=KS, iters=ITERS) -> np.ndarray:
    """Single-process replication of _pq_train's spec: per-vector 1e-9
    quantization + int64 sums (associative — must match the distributed
    fold bitwise), init from the ks smallest vec_ids' subvectors."""
    t = base.sort_values("vec_id").reset_index(drop=True)
    vecs = _norm(np.stack(t["embedding"].to_numpy()).astype(np.float64))
    sub = vecs.shape[1] // m
    books = np.ascontiguousarray(
        vecs[:ks].reshape(ks, m, sub).transpose(1, 0, 2)
    ).astype(np.float64)
    for _ in range(iters):
        q = np.floor(vecs * Q + 0.5).astype(np.int64)
        codes, _ = _ref_assign(vecs, books)
        acc = np.zeros((m, ks, sub + 1), dtype=np.int64)
        for j in range(m):
            np.add.at(acc[j, :, :sub], codes[:, j], q[:, j * sub : (j + 1) * sub])
            np.add.at(acc[j, :, sub], codes[:, j], 1)
        new = books.copy()
        counts = acc[:, :, sub]
        live = counts > 0
        new[live] = acc[:, :, :sub][live] / Q / counts[live, None]
        books = new
    return books


def _ref_encode(sf_dir: str) -> pd.DataFrame:
    base = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    books = _ref_books(base)
    t = base.sort_values("vec_id").reset_index(drop=True)
    vecs = _norm(np.stack(t["embedding"].to_numpy()).astype(np.float64))
    codes, dist = _ref_assign(vecs, books)
    return pd.DataFrame(
        {
            "vec_id": t["vec_id"].astype("int64"),
            "codes": [row.tobytes().hex() for row in codes],
            "recon_err": np.round(dist.sum(axis=1), 9),
        }
    )


def _run_encode(sf_dir: str) -> pd.DataFrame:
    from pdf_ocr_api_ray.pipelines.pq import pq_encode

    return pq_encode(sf_dir).to_pandas().sort_values("vec_id").reset_index(drop=True)


def test_pq_encode_matches_reference(ray_session):
    got = _run_encode(SF)
    exp = _ref_encode(SF)
    pd.testing.assert_frame_equal(got, exp, check_exact=True)
    # meaningful compression: every vector got a code, errors positive
    assert len(got) == 500
    assert (got["codes"].str.len() == 2 * M).all()
    assert (got["recon_err"] > 0).all()
    assert got["codes"].nunique() > 400  # 8-byte codes separate the corpus


def test_pq_adc_planted_copies_recovered(ray_session):
    """Identical vectors encode to identical codes, so each probe's 10
    planted exact copies carry the minimum possible ADC distance —
    ann_topk_pq must return exactly them as the top-10 (measured: they
    are also the exact-cosine top-10, so recall@10 = 1.0 here)."""
    from pdf_ocr_api_ray.pipelines.pq import ann_topk_pq

    topk = ann_topk_pq(SF).to_pandas()
    assert len(topk) == 50
    for pid, g in topk.groupby("probe_id"):
        got = set(g["neighbor_id"])
        planted = {200_000 + int(pid) * 100 + j for j in range(10)}
        assert got == planted, (pid, got)
        # ties (all copies are identical) break by vec_id ascending
        ranked = g.sort_values("rank")["neighbor_id"].tolist()
        assert ranked == sorted(ranked)


def test_pq_layout_invariant(ray_session, tmp_path):
    """Codebooks, codes and errors are pure functions of corpus content
    — identical output whether the table is one parquet file or three
    (different block layouts → different fold partials)."""
    t = pq.read_table(f"{SF}/embeddings.parquet")
    one = tmp_path / "one"
    (one / "embeddings.parquet").mkdir(parents=True)
    pq.write_table(t, one / "embeddings.parquet" / "a.parquet")
    three = tmp_path / "three"
    (three / "embeddings.parquet").mkdir(parents=True)
    n = t.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo), three / "embeddings.parquet" / f"p{i}.parquet")
    a = _run_encode(str(one))
    b = _run_encode(str(three))
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_ivfpq_recovers_planted_and_matches_flat_pq(ray_session):
    """The IVF cell filter must not lose the planted copies (identical
    vectors share the probe's own nearest cell), so IVF-PQ returns
    exactly the flat-PQ answer on this corpus — the composition check:
    pruning changed the COST, not the result."""
    from pdf_ocr_api_ray.pipelines.pq import ann_topk_ivfpq, ann_topk_pq

    got = (
        ann_topk_ivfpq(SF)
        .to_pandas()
        .sort_values(["probe_id", "rank"])
        .reset_index(drop=True)
    )
    flat = (
        ann_topk_pq(SF)
        .to_pandas()
        .sort_values(["probe_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, flat)
    for pid, g in got.groupby("probe_id"):
        assert set(g["neighbor_id"]) == {200_000 + int(pid) * 100 + j for j in range(10)}


def test_pq_rejects_indivisible_geometry(ray_session):
    from pdf_ocr_api_ray.pipelines.pq import _pq_train

    with pytest.raises(ValueError, match="not divisible"):
        _pq_train(SF, m=7)
