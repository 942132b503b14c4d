"""Curation operators (pipelines/curation.py): hand-computed edge
semantics on a synthetic documents table. Corpus-level DuckDB parity
at sf0.001 is covered by test_queries_vs_duckdb (the three ops live in
rotated_out_queries with full oracle_sql twins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, rows: list[tuple[int, str]]) -> str:
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s0"] * len(rows)),
            "n_chars": pa.array([len(r[1] or "") for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_decontaminate_planted_overlap(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.curation import decontaminate

    # doc 0 is the benchmark (mod=97 → 0 qualifies); doc 1 repeats a
    # benchmark trigram twice (both POSITIONS count); doc 2 shares
    # bigrams but no trigram; doc 3 is too short for any trigram.
    sf = _write_docs(
        tmp_path,
        [
            (0, "alpha beta gamma delta"),
            (1, "x alpha beta gamma y alpha beta gamma"),
            (2, "alpha beta zzz beta gamma qqq"),
            (3, "alpha beta"),
        ],
    )
    got = (
        decontaminate(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got["n_grams"].tolist() == [6, 4, 0]
    assert got["n_hits"].tolist() == [2, 0, 0]
    assert got["contaminated"].tolist() == [1, 0, 0]


def test_repetition_stats_known_fractions(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.curation import repetition_stats

    sf = _write_docs(
        tmp_path,
        [
            (1, "a a a a"),          # 4 toks, 1 distinct; bigrams: "a a" x3
            (2, "w x y z"),          # all distinct
            (3, ""),                 # empty
            (4, "solo"),             # 1 token, no bigram
        ],
    )
    got = (
        repetition_stats(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n_tokens"].tolist() == [4, 4, 0, 1]
    np.testing.assert_allclose(got["dup_token_frac"], [0.75, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(got["dup_ngram_frac"], [2 / 3, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(got["top_ngram_frac"], [1.0, 1 / 3, 0.0, 0.0])


def test_bm25_rank_orders_by_relevance(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.curation import bm25_rank

    # 'merge' is rarer than 'table' → doc holding it outranks a
    # same-length doc with the common term; tf monotonicity within a
    # term; docs without any query term score 0 and rank by doc_id.
    filler = " ".join(f"f{i}" for i in range(8))
    sf = _write_docs(
        tmp_path,
        [
            (1, f"table {filler}"),
            (2, f"merge {filler}"),
            (3, f"table table {filler[:-3]}"),
            (4, f"nothing here {filler}"),
            (5, f"table scan merge {filler}"),
            (6, f"also nothing {filler}"),
        ],
    )
    got = bm25_rank(sf, k=6).to_pandas()
    assert got["doc_id"].tolist()[0] == 5          # all three terms
    ranks = {d: i for i, d in enumerate(got["doc_id"].tolist())}
    assert ranks[2] < ranks[1]                     # rare term beats common
    assert ranks[3] < ranks[1]                     # higher tf beats tf=1
    assert got["doc_id"].tolist()[-2:] == [4, 6]   # zero-score tail by id
    assert (got["score"].to_numpy()[:-2] > 0).all()
    np.testing.assert_allclose(got["score"].to_numpy()[-2:], 0.0)


def test_bm25_partial_topk_bounds_block_output(ray_session, tmp_path):
    """The per-block partial keeps ≤ k rows: global result over many
    blocks still has exactly k rows and the true best doc survives."""
    from pdf_ocr_api_ray.pipelines.curation import bm25_rank

    rows = [(i, "padding text only") for i in range(200)]
    rows[137] = (137, "table scan merge table scan merge")
    sf = _write_docs(tmp_path, rows)
    got = bm25_rank(sf, k=5).to_pandas()
    assert len(got) == 5
    assert got["doc_id"].iloc[0] == 137
