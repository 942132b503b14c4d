"""Golden regression pin: the oracle's outputs for the seed-42 fixture
corpus are materialized in tests/golden/. If the oracle AND the
pipeline ever drift together (a semantics change that span-equality
tests cannot see), this suite fails. Regenerate the golden file ONLY
for an intentional semantics change, with the reason in the commit:

    python - <<'PY'
    import pyarrow as pa, pyarrow.parquet as pq
    from pdf_ocr_api_ray.sources.fixtures import generate_fixture_docs
    from pdf_ocr_api_ray.functions.depara import default_depara
    from pdf_ocr_api_ray.oracle import run_document
    from pdf_ocr_api_ray.schemas import OUTPUT_SCHEMA
    dep = default_depara()
    docs = generate_fixture_docs(docs_per_family=8, skew_chunks=25, seed=42)
    rows = [run_document(d["doc_id"], d["spans"], dep) for d in docs]
    pq.write_table(pa.Table.from_pylist(rows, schema=OUTPUT_SCHEMA),
                   "tests/golden/expected_seed42.parquet", compression="zstd")
    PY
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pdf_ocr_api_ray.oracle import run_document
from pdf_ocr_api_ray.sources.fixtures import generate_fixture_docs

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "expected_seed42.parquet")


def _span_seq(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_oracle_matches_golden(depara):
    golden = {r["doc_id"]: r for r in pq.read_table(GOLDEN).to_pylist()}
    docs = generate_fixture_docs(docs_per_family=8, skew_chunks=25, seed=42)
    assert {d["doc_id"] for d in docs} == set(golden)
    for d in docs:
        now = run_document(d["doc_id"], d["spans"], depara)
        exp = golden[d["doc_id"]]
        assert _span_seq(now["spans"]) == _span_seq(exp["spans"]), d["doc_id"]
        for f in (
            "NumerodaCertidao",
            "ObjetodaCertidao",
            "TipodaCertidao",
            "QualificacaoObra",
            "QualificacaoEspecifica",
            "NiveldeAtividade",
            "Estado",
        ):
            assert now[f] == exp[f], (d["doc_id"], f)
        assert now["Servicos"] == exp["Servicos"], d["doc_id"]
