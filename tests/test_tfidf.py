"""Per-document tf-idf characteristic terms (text.tfidf_terms) — the
SQL twin rides the rotated_out parity gate (all-integer outputs, the
quantized score IS the contract); here the semantics are pinned on a
planted corpus with a known idf structure."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(path, docs):
    path.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "text": pa.array([t for _, t in docs], type=pa.string()),
            }
        ),
        path / "documents.parquet",
    )


def _run(sf_dir, **kw):
    from pdf_ocr_api_ray.pipelines.text import tfidf_terms

    return (
        tfidf_terms(sf_dir, **kw)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )


# "the" appears in every doc (df=4 → idf floor); each doc has one
# unique term (df=1 → idf ceiling); "shared" sits in two docs
PLANTED = [
    (1, "the the the alpha shared"),
    (2, "the beta shared"),
    (3, "the gamma"),
    (4, "the"),
    (5, ""),  # token-less: no rows, still counted in N
]


def test_rare_term_tops_stopword(ray_session, tmp_path):
    _write(tmp_path, PLANTED)
    got = _run(str(tmp_path), k=3)
    n = 5
    top = got[got["rank"] == 1].set_index("doc_id")
    # the unique term wins rank 1 in docs 1-3 despite "the" having tf=3 in doc 1
    assert top.loc[1, "term"] == "alpha"
    assert top.loc[2, "term"] == "beta"
    assert top.loc[3, "term"] == "gamma"
    # doc 4 has only the stopword: it still gets its 1 row
    assert top.loc[4, "term"] == "the"
    assert 5 not in got["doc_id"].to_numpy()
    # exact quantized scores: tf·(2(N−df)+1)·1000 // (2df+1)
    a = got.set_index(["doc_id", "term"])
    assert a.loc[(1, "alpha"), "score_q"].item() == 1 * (2 * (n - 1) + 1) * 1000 // 3
    assert a.loc[(1, "the"), "score_q"].item() == 3 * (2 * (n - 4) + 1) * 1000 // 9
    assert a.loc[(2, "shared"), "score_q"].item() == 1 * (2 * (n - 2) + 1) * 1000 // 5


def test_k_and_tie_break(ray_session, tmp_path):
    """Terms with equal tf and df tie on score; rank breaks by term
    ASC — and k truncates after the tie-break."""
    _write(tmp_path, [(1, "zz aa mm"), (2, "other")])
    got = _run(str(tmp_path), k=2)
    g1 = got[got["doc_id"] == 1]
    assert list(g1["term"]) == ["aa", "mm"]
    assert list(g1["rank"]) == [1, 2]


def test_tfidf_overflow_guard_raises(ray_session):
    """The tf·(2N+1)·scale int64 cap is asserted, not documented-only:
    a scale past the headroom must raise a clear OverflowError from
    the scoring stage instead of silently wrapping."""
    import pytest

    from pdf_ocr_api_ray.pipelines.text import tfidf_terms

    with pytest.raises(Exception, match="tfidf_terms int64 headroom"):
        tfidf_terms("/root/testdata/sf0.001", _scale=2**62).to_pandas()
