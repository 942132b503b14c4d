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
