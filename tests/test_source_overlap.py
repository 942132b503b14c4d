"""Cross-source n-gram overlap matrix (dedup.source_overlap) — the
SQL twin rides the rotated_out parity gate in test_queries_vs_duckdb
(verified bitwise incl. the jaccard division); here the semantics are
pinned on a planted corpus with known trigram sets, plus block-layout
invariance on a two-file table."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(path, docs, two_files=False):
    path.mkdir(parents=True, exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in docs], type=pa.int64()),
            "source": pa.array([s for _, s, _ in docs], type=pa.string()),
            "text": pa.array([x for _, _, x in docs], type=pa.string()),
        }
    )
    if two_files:
        d = path / "documents.parquet"
        d.mkdir(exist_ok=True)
        mid = len(docs) // 2
        pq.write_table(t.slice(0, mid), d / "a.parquet")
        pq.write_table(t.slice(mid), d / "b.parquet")
    else:
        pq.write_table(t, path / "documents.parquet")


def _run(sf_dir, **kw):
    from pdf_ocr_api_ray.pipelines.dedup import source_overlap

    return (
        source_overlap(sf_dir, **kw)
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )


# trigram sets: A={abc,bcd,cde}, B={abc,bcx,cxy}, C={pqr,qrs};
# doc 2 repeats doc 1's text — distinct semantics keep n_a at 3
PLANTED = [
    (1, "A", "a b c d e"),
    (2, "A", "a b c d e"),
    (3, "B", "a b c x y"),
    (4, "C", "p q r s"),
    (5, "C", None),  # null text contributes nothing
    (6, "D", "x y"),  # too short for a trigram → D absent entirely
]


def test_planted_matrix(ray_session, tmp_path):
    _write(tmp_path, PLANTED)
    got = _run(str(tmp_path))
    # D has no trigram set: only A, B, C appear → 3 pairs
    assert list(got["src_a"]) == ["A", "A", "B"]
    assert list(got["src_b"]) == ["B", "C", "C"]
    ab = got.iloc[0]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (3, 3, 1)
    assert ab["jaccard"] == 1 / 5
    # disjoint pairs report zero with a full row (complete matrix)
    assert (got.iloc[1:]["n_common"] == 0).all()
    assert (got.iloc[1:]["jaccard"] == 0.0).all()


def test_block_layout_invariance(ray_session, tmp_path):
    """Splitting the table across parquet files (forcing different Ray
    block boundaries and per-batch partial dedup) must not change one
    cell — the bucket stage owns global-distinct semantics."""
    (tmp_path / "one").mkdir()
    _write(tmp_path / "one", PLANTED)
    _write(tmp_path / "two", PLANTED, two_files=True)
    a, b = _run(str(tmp_path / "one")), _run(str(tmp_path / "two"))
    pd.testing.assert_frame_equal(a, b)


def test_bigram_mode(ray_session, tmp_path):
    """n is honoured: at n=2 source D's 'x y' produces a set, and
    B∩D = {'x y'}."""
    _write(tmp_path, PLANTED)
    got = _run(str(tmp_path), n=2).set_index(["src_a", "src_b"])
    bd = got.loc[("B", "D")]
    assert (bd["n_a"], bd["n_b"], bd["n_common"]) == (4, 1, 1)
    assert bd["jaccard"] == 1 / 4


def test_empty_corpus(ray_session, tmp_path):
    _write(tmp_path, [(1, "A", ""), (2, "B", None)])
    got = _run(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == [
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "n_common",
        "jaccard",
    ]
