"""Similarity-search quality gates (beyond the SQL parity harness)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _topk_map(ds):
    df = ds.to_pandas()
    out = {}
    for pid, g in df.groupby("probe_id"):
        out[pid] = list(g.sort_values("rank")["neighbor_id"])
    return out


def test_ann_lsh_recall_on_structured_corpus(ray_session):
    """On data with genuine neighbor structure (10 planted near-copies
    per probe among 2,000 noise vectors), LSH multi-probe must recover
    most exact top-10 neighbors while scanning a fraction of the corpus.
    (The sf embeddings themselves are isotropic noise, where any
    sublinear index can only reach recall ≈ scan fraction.)"""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pdf_ocr_api_ray.pipelines.similarity import ann_topk_impl, ann_topk_lsh_impl

    rng = np.random.RandomState(7)
    dim, n_noise, n_probes = 64, 2000, 5
    probes = rng.standard_normal((n_probes, dim))
    probes /= np.linalg.norm(probes, axis=1, keepdims=True)
    noise = rng.standard_normal((n_noise, dim))
    planted = []
    for p in range(n_probes):
        planted.append(probes[p][None, :] * 5.0 + rng.standard_normal((10, dim)) * 0.5)
    corpus = np.vstack([noise] + planted)
    ids = np.arange(len(corpus)) + 1000
    df = pd.DataFrame({"vec_id": ids, "embedding": list(corpus.astype(np.float32))})
    ds = rd.from_pandas(df)

    probe_ids = np.arange(n_probes)  # not present in corpus
    exact = _topk_map(ann_topk_impl(ds, probe_ids, probes))
    approx = _topk_map(ann_topk_lsh_impl(ds, probe_ids, probes))
    recalls = [
        len(set(approx.get(pid, [])) & set(exact_ids)) / len(exact_ids)
        for pid, exact_ids in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_near_dup_finds_injected_copies(ray_session):
    from pdf_ocr_api_ray.pipelines.similarity import embedding_near_dup

    df = embedding_near_dup(SF).to_pandas()
    # every injected exact copy (vec_id % 10 == 0 → +100000) must pair
    injected = {(v, v + 100_000) for v in range(0, 500, 10)}
    found = {(a, b) for a, b in zip(df["id_a"], df["id_b"])}
    assert injected <= found


def test_minhash_finds_exact_and_mutated_copies(ray_session):
    from pdf_ocr_api_ray.pipelines.dedup import dedup_minhash_lsh

    df = dedup_minhash_lsh(SF)  # eager pandas result (driver-side verify)
    pairs = {(a, b) for a, b in zip(df["id_a"], df["id_b"])}
    exact_expected = {(v, v + 1_000_000) for v in range(0, 500, 5)}
    assert exact_expected <= pairs
    # mutated copies (one doubled token) should mostly survive J ≥ 0.6
    mutated_found = sum(1 for v in range(0, 500, 7) if (v, v + 2_000_000) in pairs)
    assert mutated_found >= 60  # of ~72


def test_simhash_copies_have_zero_distance(ray_session):
    from pdf_ocr_api_ray.pipelines.dedup import dedup_simhash

    df = dedup_simhash(SF).to_pandas()
    pairs = {(a, b): h for a, b, h in zip(df["id_a"], df["id_b"], df["hamming"])}
    for v in range(0, 500, 5):
        assert pairs.get((v, v + 1_000_000)) == 0
