"""SemDeDup (pipelines/semdedup.py) — pinned by an independent
straight-line numpy implementation of the same spec (no SQL twin
exists: k-means + a sequential leader scan are not a DuckDB query;
same precedent as the sketch family and the perceptual hash)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
Q = 1e9


def _norm(m):
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _ref_centroids(base: pd.DataFrame, k: int, iters: int) -> np.ndarray:
    """Straight-line fixed-point spherical Lloyd — the spec of
    similarity._kmeans_centroids_distributed (single-process int sums;
    integer addition is associative, so this must match the
    distributed trainer bitwise)."""
    t = base.sort_values("vec_id").reset_index(drop=True)
    vecs = _norm(np.stack(t["embedding"].to_numpy()).astype(np.float64))
    cents = vecs[:k].copy()
    for _ in range(iters):
        assign = np.argmax(vecs @ cents.T, axis=1)
        new = cents.copy()
        for cell in range(k):
            sub = vecs[assign == cell]
            if len(sub):
                v = np.floor(sub * Q + 0.5).astype(np.int64).sum(axis=0) / Q
                nrm = np.linalg.norm(v)
                if nrm > 1e-12:
                    new[cell] = v / nrm
        cents = new
    return cents


def _ref_semantic_dedup(sf_dir: str, k=16, tau=0.95, iters=4) -> pd.DataFrame:
    base = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    cents = _ref_centroids(base, k, iters)
    # planted duplicates: exact copy at vec_id + 100_000 for id % 10 == 0
    dup = base[base["vec_id"] % 10 == 0].copy()
    dup["vec_id"] = dup["vec_id"] + 100_000
    full = (
        pd.concat([base, dup], ignore_index=True)
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    vecs = _norm(np.stack(full["embedding"].to_numpy()).astype(np.float64))
    ids = full["vec_id"].to_numpy(dtype=np.int64)
    cells = np.argmax(vecs @ cents.T, axis=1).astype(np.int64)
    rows = []
    for cell in np.unique(cells):
        sel = np.flatnonzero(cells == cell)  # already id-ascending
        kept: list[int] = []
        for i in sel:
            sims = (
                np.round(vecs[kept] @ vecs[i], 9) if kept else np.empty(0)
            )
            hit = np.flatnonzero(sims >= tau)
            if hit.size:
                rows.append((ids[i], cell, 0, ids[kept[hit[0]]]))
            else:
                rows.append((ids[i], cell, 1, ids[i]))
                kept.append(i)
    return (
        pd.DataFrame(rows, columns=["vec_id", "cell", "keep", "leader_id"])
        .astype("int64")
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def _run(sf_dir: str, **kw) -> pd.DataFrame:
    from pdf_ocr_api_ray.pipelines.semdedup import semantic_dedup

    return (
        semantic_dedup(sf_dir, **kw)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def test_semantic_dedup_matches_reference(ray_session):
    got = _run(SF)
    exp = _ref_semantic_dedup(SF)
    pd.testing.assert_frame_equal(got, exp)
    # every planted exact copy must be dropped, chained to a leader no
    # larger than its original (the original, or the original's leader)
    dups = got[got["vec_id"] >= 100_000]
    assert len(dups) == 50
    assert (dups["keep"] == 0).all()
    assert (dups["leader_id"] <= dups["vec_id"] - 100_000).all()
    # originals of kept-leader copies are themselves kept
    by_id = got.set_index("vec_id")
    origs = dups["vec_id"] - 100_000
    same_leader = by_id.loc[origs, "leader_id"].to_numpy()
    assert (same_leader == dups["leader_id"].to_numpy()).all()
    # the op keeps most of a duplicate-free corpus (clusters are loose)
    assert got["keep"].sum() >= 400


def test_semantic_dedup_layout_invariant(ray_session, tmp_path):
    """Verdicts are a pure function of corpus content — identical
    output whether the table is one parquet file or three (different
    Ray block layouts → different batch boundaries in training,
    assignment, and the groupby)."""
    t = pq.read_table(f"{SF}/embeddings.parquet")
    one = tmp_path / "one"
    (one / "embeddings.parquet").mkdir(parents=True)
    pq.write_table(t, one / "embeddings.parquet" / "a.parquet")
    three = tmp_path / "three"
    (three / "embeddings.parquet").mkdir(parents=True)
    n = t.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo), three / "embeddings.parquet" / f"p{i}.parquet")
    a = _run(str(one))
    b = _run(str(three))
    pd.testing.assert_frame_equal(a, b)


def test_semantic_dedup_tau_above_one_keeps_everything(ray_session):
    """tau > 1 is unreachable after round(sim, 9): even bitwise-equal
    vectors score 1.0, so nothing is dropped and every row is its own
    leader (550 rows = 500 corpus + 50 planted)."""
    got = _run(SF, tau=1.5)
    assert len(got) == 550
    assert (got["keep"] == 1).all()
    assert (got["leader_id"] == got["vec_id"]).all()
