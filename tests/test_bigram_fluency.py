"""Stupid Backoff bigram fluency (curation.bigram_fluency) — the SQL
twin rides the rotated_out parity gate (this op is driver-verifiable:
quantized integer terms, IEEE-identical arithmetic); here the LM
semantics are pinned on a planted corpus plus edge rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_corpus(path, docs):
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


def _run(sf_dir: str, **kw) -> pd.DataFrame:
    from pdf_ocr_api_ray.pipelines.curation import bigram_fluency

    return (
        bigram_fluency(sf_dir, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ids 1-9 avoid every augmentation rule; the phrase docs make
# "the cat sat on the mat" bigrams corpus-dominant, the scrambled doc
# uses the SAME words in never-repeated orders
PHRASE = "the cat sat on the mat"
PLANTED = [
    (1, PHRASE),
    (2, PHRASE),
    (3, PHRASE),
    (4, PHRASE),
    (6, "mat the on sat the cat"),  # same unigrams, unseen bigrams
    (7, "solo"),  # single token: no bigrams → NULL fluency
    (8, ""),  # empty
]


def test_fluent_doc_outscores_scrambled(ray_session, tmp_path):
    _write_corpus(tmp_path, PLANTED)
    got = _run(str(tmp_path)).set_index("doc_id")
    # phrase docs: every position takes the bigram route
    for did in (1, 2, 3, 4):
        assert got.loc[did, "n_hits"] == got.loc[did, "n_bigrams"] == 5
    # the scrambled doc's bigrams are each seen once (its own), so its
    # fluency sits below every phrase doc's
    assert got.loc[6, "fluency"] < got.loc[1, "fluency"]
    # short/empty docs: no bigrams, NULL fluency
    for did in (7, 8):
        assert got.loc[did, "n_bigrams"] == 0
        assert np.isnan(got.loc[did, "fluency"])


def test_backoff_route_scores_known_unigrams_above_unknown(ray_session, tmp_path):
    """With the bigram table capped to 1 entry, all but the dominant
    bigram take the backoff route: λ·c(w)/N — so a position whose word
    is corpus-frequent must outscore one whose word is rare."""
    _write_corpus(tmp_path, PLANTED)
    got = _run(str(tmp_path), top_bigrams=1).set_index("doc_id")
    # the phrase docs still have >= 1 bigram-route hit at most ("the
    # cat" ties win by lexicographic order), rest back off
    assert (got.loc[[1, 2, 3, 4], "n_hits"] <= 1).all()
    assert (got.loc[[1, 2, 3, 4], "fluency"] > 0).all()


def test_forced_cap_parity_vs_sql_twin(ray_session):
    """Force the top_words / top_bigrams caps to bite (sf0.001 has far
    more than 64 distinct grams per first-pass block) and require
    bit-exact parity with the parameterized SQL twin — pins that the
    corpus token total N sums the UNCAPPED unigram counts (the twin's
    n_total), not the per-block capped side."""
    import duckdb

    from pdf_ocr_api_ray.oracles import bigram_fluency_sql

    sf = "/root/testdata/sf0.001"
    got = _run(sf, top_words=64, top_bigrams=64)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(bigram_fluency_sql(top_bigrams=64, top_words=64))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, rtol=0, atol=0,
    )


def test_quantized_terms_are_exact_integers(ray_session, tmp_path):
    """fluency · n_bigrams · 1e9 must reconstruct the integer term sum
    exactly — the quantization contract the SQL twin relies on."""
    _write_corpus(tmp_path, PLANTED)
    got = _run(str(tmp_path))
    g = got[got["n_bigrams"] > 0]
    back = g["fluency"].to_numpy() * (g["n_bigrams"].to_numpy() * 1e9)
    assert np.allclose(back, np.round(back), rtol=0, atol=1e-6)
