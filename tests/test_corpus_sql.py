"""Byte-equality of the two independent corpus derivations: the Python
generator (sources/corpus.py) and the DuckDB CTE regeneration
(sources/corpus_sql.py). Every span-based SQL oracle stands on this."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pdf_ocr_api_ray.sources.corpus import document_to_spans
from pdf_ocr_api_ray.sources.corpus_sql import corpus_query


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_sql_corpus_equals_python_corpus(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    sql_df = (
        con.execute(corpus_query("SELECT * FROM corpus_spans"))
        .df()
        .sort_values(["doc_id", "offset"], ignore_index=True)
    )
    sql_df["offset"] = sql_df["offset"].astype("int64")

    rows = []
    for did, text in con.execute("SELECT doc_id, text FROM documents").fetchall():
        for s in document_to_spans(did, text):
            rows.append({"doc_id": f"doc-{did:08d}", **s})
    py_df = pd.DataFrame(
        rows, columns=["doc_id", "kind", "text", "media_ref", "offset"]
    ).sort_values(["doc_id", "offset"], ignore_index=True)
    py_df["offset"] = py_df["offset"].astype("int64")

    pd.testing.assert_frame_equal(py_df, sql_df)


def test_all_branches_present():
    """The sf0.001 corpus exercises every document shape (so the SQL
    parity above actually covers every generator arm)."""
    from pdf_ocr_api_ray.sources.corpus import branch_of

    branches = {branch_of(d) for d in range(500)}
    assert branches == {"empty", "cat", "free", "boiler", "media", "multi", "table"}


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_vocab_is_filter_safe(sf_dir):
    """The extract_documents oracle's per-branch count/content formulas
    assume the documents vocabulary never collides with parser filters
    (see oracles.py module docstring). A regenerated testdata set that
    violates these fails HERE, loudly, instead of silently breaking
    oracle parity."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT DISTINCT unnest(regexp_extract_all(text, '\\S+')) AS w
            FROM read_parquet('{sf_dir}/documents.parquet')"""
    ).fetchall()
    vocab = {r[0] for r in rows}
    unit_siglas = {"m", "m2", "m3", "un", "kg", "h", "mes", "%"}
    assert not {w.lower() for w in vocab} & unit_siglas, "unit sigla in vocabulary"
    assert not any(w.lower().startswith("total") for w in vocab), "TOTAL-prefixed token"
    assert not any((" - " in w) or (":" in w) or ("-" == w) for w in vocab)
    texts = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    assert all(t[0].isascii() for t in texts), "non-ASCII text breaks \\S+ parity"
