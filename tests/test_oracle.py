"""Oracle end-to-end behavior per fixture family (SURVEY.md §5 strategy)."""

from __future__ import annotations

import pytest

from pdf_ocr_api_ray.functions.spans import SEP
from pdf_ocr_api_ray.oracle import run_document
from pdf_ocr_api_ray.sources.fixtures import FAMILIES, generate_doc, generate_fixture_docs


@pytest.fixture(scope="module")
def results(depara):
    docs = generate_fixture_docs(docs_per_family=10, skew_chunks=30)
    return {d["doc_id"]: run_document(d["doc_id"], d["spans"], depara) for d in docs}


def _family(results, name):
    return [r for k, r in results.items() if k.startswith(name)]


def test_all_docs_have_output_spans(results):
    for r in results.values():
        assert r["spans"][0]["kind"] == "header"
        offsets = [s["offset"] for s in r["spans"]]
        assert offsets == list(range(len(offsets)))


def test_f1_records_and_header(results):
    for r in _family(results, "f1_table_basic"):
        assert len(r["Servicos"]) >= 3
        assert r["NumerodaCertidao"] is not None
        assert r["Estado"] is not None
        assert r["TipodaCertidao"] in (1, 2)  # CREA docs
        for s in r["Servicos"]:
            assert s["Quantidade"] is not None


def test_f3_no_total_rows(results):
    for r in _family(results, "f3_table_total_rows"):
        for s in r["Servicos"]:
            assert not (s["Descricao"] or "").upper().startswith("TOTAL")


def test_f6_children_inherit_mother_category(results):
    for r in _family(results, "f6_category_mothers"):
        # mother rows (qty-less, cat==desc) are dropped; children carry the category
        cats = {s["Categoria"] for s in r["Servicos"]}
        assert cats, r["doc_id"]
        for s in r["Servicos"]:
            assert s["Quantidade"] is not None  # mothers filtered out


def test_f7_auto_numbering(results):
    for r in _family(results, "f7_blank_items"):
        numbered = [s["Item"] for s in r["Servicos"] if s["Item"] is not None]
        assert numbered == [str(i + 1) for i in range(len(numbered))]


def test_f9_boilerplate_filtered(results):
    for r in _family(results, "f9_boilerplate"):
        for s in r["Servicos"]:
            text = f"{s['Categoria'] or ''} {s['Descricao'] or ''}"
            assert "Página" not in text and "Tel:" not in text
            assert len(text) <= 601


def test_f11_header_negative_cases(results):
    rs = _family(results, "f11_header_fields")
    assert any(r["TipodaCertidao"] is None for r in rs)  # no-council docs
    assert any(r["TipodaCertidao"] is not None for r in rs)


def test_f13_media_passthrough_order(results):
    for r in _family(results, "f13_media_interleaved"):
        media = [s for s in r["spans"] if s["kind"] == "page_image"]
        assert media
        refs = [m["media_ref"] for m in media]
        assert all(ref.startswith(f"mem://{r['doc_id']}/") for ref in refs)
        # spans after the servico block, dense offsets
        assert media[-1]["offset"] == len(r["spans"]) - 1


def test_f14_skew_chunk_count(results):
    (r,) = _family(results, "f14_skew")
    assert len(r["Servicos"]) >= 50


def test_f15_empty_docs_contract(results):
    for r in _family(results, "f15_empty_and_edge"):
        assert r["Servicos"] == []
        assert r["spans"][0]["text"].count(SEP) == 6  # 7 header fields


def test_determinism_same_seed():
    d1 = generate_doc("f1_table_basic", 3, seed=42)
    d2 = generate_doc("f1_table_basic", 3, seed=42)
    assert d1 == d2
    d3 = generate_doc("f1_table_basic", 3, seed=43)
    assert d1 != d3


def test_f16_boundary_tipo_detected(results):
    rs = _family(results, "f16_boundary_tipo")
    assert rs and all(r["TipodaCertidao"] is not None for r in rs)


def test_all_families_present():
    assert len(FAMILIES) == 16
