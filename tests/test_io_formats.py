"""Source-format coverage: the extraction DAG produces identical span
sequences whether the interleaved spans table arrives as Parquet or
JSONL (sources/io.read_table dispatch). Lance is exercised implicitly
when the package is installed (same code path)."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest

from pdf_ocr_api_ray.functions.depara import default_depara
from pdf_ocr_api_ray.pipelines.extraction import build_extraction
from pdf_ocr_api_ray.sources.fixtures import docs_to_table, generate_fixture_docs
from pdf_ocr_api_ray.sources.io import read_table


@pytest.fixture(scope="module")
def docs():
    return generate_fixture_docs(
        families=["f1_table_basic", "f12_multichunk", "f13_media_interleaved", "f15_empty_and_edge"],
        docs_per_family=10,
    )


def _spans_of(out):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in out
    }


def test_jsonl_source_equals_parquet_source(ray_session, tmp_path, docs):
    depara = default_depara()
    tbl = docs_to_table(docs)

    pq_path = str(tmp_path / "spans.parquet")
    pq.write_table(tbl, pq_path)
    jl_path = str(tmp_path / "spans.jsonl")
    with open(jl_path, "w") as f:
        for d in docs:
            f.write(json.dumps(d, ensure_ascii=False) + "\n")

    out_pq = _spans_of(build_extraction(read_table(pq_path), depara).take_all())
    out_jl = _spans_of(build_extraction(read_table(jl_path), depara).take_all())
    assert out_pq == out_jl
    assert len(out_jl) == len(docs)


def test_read_table_column_pruning_jsonl(ray_session, tmp_path, docs):
    jl_path = str(tmp_path / "spans2.jsonl")
    with open(jl_path, "w") as f:
        for d in docs:
            f.write(json.dumps({**d, "extra": 1}, ensure_ascii=False) + "\n")
    ds = read_table(jl_path, columns=["doc_id", "spans"])
    assert set(ds.schema().names) == {"doc_id", "spans"}


def test_read_parquet_clean_nested_directory(ray_session, tmp_path):
    """Nested/hive shard layouts (subdirectories only at the top
    level) must resolve a schema like rd.read_parquet does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines._util import read_parquet_clean

    sub = tmp_path / "part=0"
    sub.mkdir()
    pq.write_table(
        pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y"])}),
        str(sub / "f.parquet"),
    )
    ds = read_parquet_clean(str(tmp_path))
    assert ds.count() == 2
    assert sorted(ds.schema().names) == ["a", "b"]
