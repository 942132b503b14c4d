"""inverted_index: brute-force replay equality + posting invariants."""

from __future__ import annotations

import re

import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _reference_index(df_lo: int, df_hi: int) -> pd.DataFrame:
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    postings: dict[str, list[int]] = {}
    for r in docs.itertuples():
        for w in set(re.findall(r"\S+", r.text)):
            postings.setdefault(w, []).append(int(r.doc_id))
    rows = [
        (w, len(ids), ",".join(map(str, sorted(ids))))
        for w, ids in postings.items()
        if df_lo <= len(ids) <= df_hi
    ]
    return pd.DataFrame(rows, columns=["word", "df", "postings"]).sort_values(
        "word", ignore_index=True
    )


def test_inverted_index_matches_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.textindex import inverted_index

    got = (
        inverted_index(SF_DIR)
        .to_pandas()
        .sort_values("word", ignore_index=True)[["word", "df", "postings"]]
    )
    want = _reference_index(10, 1000)
    assert len(want) > 0  # the gate must actually gate something
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_inverted_index_posting_invariants(ray_session):
    from pdf_ocr_api_ray.pipelines.textindex import inverted_index

    got = inverted_index(SF_DIR, df_lo=5, df_hi=50).to_pandas()
    assert len(got) > 0
    for r in got.itertuples():
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == len(set(ids)) == r.df
        assert 5 <= r.df <= 50
