"""pagerank_domains: straight-line big-int reference replay, the
no-in-link base-rank invariant, the zero-iteration identity, and the
int64 headroom guard. (DuckDB-twin parity runs in
tests/test_queries_vs_duckdb.py like every other registry row.)"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _h(s: str, mod: int) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") % mod


def _reference(doc_ids, D, L, K, S, damp_num=85, damp_den=100) -> pd.DataFrame:
    """Pure-Python unbounded-int replay of the documented contract."""
    edges = []
    for d in doc_ids:
        src = _h(f"dom|{int(d)}", D)
        for j in range(L):
            edges.append((src, _h(f"lnk|{int(d)}|{j}", D)))
    outw = [0] * D
    for s, _ in edges:
        outw[s] += 1
    base = (S * (damp_den - damp_num)) // damp_den
    r = [S] * D
    for _ in range(K):
        c = [0] * D
        for s, t in edges:
            c[t] += r[s] // outw[s]
        r = [base + (damp_num * ci) // damp_den for ci in c]
    return pd.DataFrame(
        {
            "domain": np.arange(D, dtype=np.int64),
            "rank_u": np.array(r, dtype=np.int64),
            "n_docs": np.array([w // L for w in outw], dtype=np.int64),
        }
    )


def test_pagerank_matches_bigint_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.graph import (
        N_DOMAINS,
        N_ITERS,
        OUT_LINKS,
        RANK_SCALE,
        pagerank_domains,
    )

    ids = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    want = _reference(ids, N_DOMAINS, OUT_LINKS, N_ITERS, RANK_SCALE)
    got = pagerank_domains(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pagerank_no_inlink_domain_gets_exact_base(ray_session, tmp_path):
    """A domain nobody links to holds EXACTLY the damping base after
    any n_iters >= 1 — the (1-d) floor of the update rule."""
    from pdf_ocr_api_ray.pipelines.graph import (
        DAMP_DEN,
        DAMP_NUM,
        RANK_SCALE,
        pagerank_domains,
    )

    D, L = 64, 2
    ids = list(range(40))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    linked = {_h(f"lnk|{i}|{j}", D) for i in ids for j in range(L)}
    unlinked = sorted(set(range(D)) - linked)
    if not unlinked:
        pytest.skip("every domain drew an in-link at this size")
    got = pagerank_domains(str(tmp_path), n_domains=D, out_links=L).to_pandas()
    base = (RANK_SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    assert (got.loc[got["domain"].isin(unlinked), "rank_u"] == base).all()


def test_pagerank_zero_iterations_is_uniform(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.graph import RANK_SCALE, pagerank_domains

    pq.write_table(
        pa.table({"doc_id": pa.array(range(50), pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    got = pagerank_domains(str(tmp_path), n_domains=32, n_iters=0).to_pandas()
    assert (got["rank_u"] == RANK_SCALE).all()
    assert got["n_docs"].sum() == 50


def test_pagerank_headroom_guard():
    from pdf_ocr_api_ray.pipelines.graph import pagerank_domains

    with pytest.raises(OverflowError):
        pagerank_domains(SF_DIR, n_domains=2**55)


def test_pagerank_mass_is_bounded(ray_session):
    """Total rank never exceeds the initial mass D·S (links only
    redistribute; damping leaks dangling mass) — the invariant that
    underwrites the int64 headroom argument."""
    from pdf_ocr_api_ray.pipelines.graph import (
        N_DOMAINS,
        RANK_SCALE,
        pagerank_domains,
    )

    got = pagerank_domains(SF_DIR).to_pandas()
    assert int(got["rank_u"].sum()) <= N_DOMAINS * RANK_SCALE
    assert (got["rank_u"] > 0).all()


def test_crawl_priority_composition(ray_session):
    """priority_u equals rank_u[domain(doc)] * quality_idx(doc) row by
    row, rebuilt from the two component ops."""
    from pdf_ocr_api_ray.pipelines.graph import (
        N_DOMAINS,
        crawl_priority,
        pagerank_domains,
    )

    pr = pagerank_domains(SF_DIR).to_pandas().set_index("domain")["rank_u"]
    got = crawl_priority(SF_DIR).to_pandas()
    # domains recomputed from doc_id must match the op's column
    dom = np.array([_h(f"dom|{int(d)}", N_DOMAINS) for d in got["doc_id"]])
    assert (got["domain"].to_numpy() == dom).all()
    want = pr.reindex(got["domain"]).to_numpy() * got["quality_idx"].to_numpy()
    assert (got["priority_u"].to_numpy() == want).all()


def test_crawl_priority_quality_zero_kills_priority(ray_session):
    from pdf_ocr_api_ray.pipelines.graph import crawl_priority

    got = crawl_priority(SF_DIR).to_pandas()
    z = got[got["quality_idx"] == 0]
    assert (z["priority_u"] == 0).all()
