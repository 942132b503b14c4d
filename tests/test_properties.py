"""Property-based tests (hypothesis) for the operator semantics the
ordered scans and normalizers must uphold under arbitrary input."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_ocr_api_ray.functions.depara import default_depara, is_servico_valido, map_by_sigla
from pdf_ocr_api_ray.functions.document import (
    auto_number_items,
    filter_boilerplate,
    filter_category_headers,
    preencher_categoria,
    sem_quantidade,
)
from pdf_ocr_api_ray.functions.services import detect_item, detect_quantidade
from pdf_ocr_api_ray.functions.textnorm import clean_line, clean_ocr, normalize_alnum, normalize_header
from pdf_ocr_api_ray.functions.units import normalize_unidade

DEP = default_depara()

texts = st.text(alphabet=string.printable + "çãéÁÊÕü", max_size=120)


@given(texts)
def test_normalize_header_idempotent(s):
    once = normalize_header(s)
    assert normalize_header(once) == once


@given(texts)
def test_normalize_alnum_charset(s):
    out = normalize_alnum(s)
    assert all(c.isascii() and (c.isupper() or c.isdigit()) for c in out)


@given(texts)
def test_clean_ocr_charset_and_idempotence(s):
    out = clean_ocr(s)
    assert set(out) <= set(string.ascii_uppercase + string.digits + "X%")
    assert clean_ocr(out) == out


@given(texts)
def test_clean_line_no_double_spaces(s):
    out = clean_line(s)
    assert "  " not in out
    assert out == out.strip()


@given(texts)
def test_detect_quantidade_roundtrip(s):
    qtd, rest = detect_quantidade(s)
    if qtd is not None:
        assert qtd[-1].isdigit() or qtd[-1] in ".,"
        assert s.rstrip().endswith(qtd)


@given(texts)
def test_detect_item_prefix(s):
    item, rest = detect_item(s)
    if item is not None:
        assert s.startswith(item)


@given(st.text(alphabet="MKGUNH23%ES ", max_size=12))
def test_normalize_unidade_never_raises(s):
    r = normalize_unidade(s, DEP["unidades"])
    assert r is None or isinstance(r, int)


records = st.lists(
    st.fixed_dictionaries(
        {
            "Item": st.one_of(st.none(), st.text(max_size=8)),
            "Categoria": st.one_of(st.none(), st.text(max_size=20)),
            "Descricao": st.one_of(st.none(), st.text(max_size=40)),
            "Unidade": st.one_of(st.none(), st.integers(min_value=1, max_value=8)),
            "Quantidade": st.one_of(st.none(), st.text(alphabet="0123456789.,x ", max_size=10)),
        }
    ),
    max_size=12,
)


@given(records)
@settings(max_examples=60)
def test_auto_number_invariants(recs):
    out = auto_number_items(recs)
    assert len(out) == len(recs)
    all_blank = all(r["Item"] is None or str(r["Item"]).strip() == "" for r in recs)
    if all_blank and recs:
        numbered = [r["Item"] for r in out if not sem_quantidade(r["Quantidade"])]
        assert numbered == [str(i + 1) for i in range(len(numbered))]
        assert all(r["Item"] is None for r in out if sem_quantidade(r["Quantidade"]))
    else:
        assert out == recs


@given(records)
@settings(max_examples=60)
def test_preencher_categoria_invariants(recs):
    out = preencher_categoria(recs)
    assert len(out) == len(recs)
    vigente = None
    for src, dst in zip(recs, out):
        if sem_quantidade(src["Quantidade"]) and src["Descricao"]:
            vigente = src["Descricao"].strip()
            assert dst["Categoria"] == vigente
        elif vigente is not None:
            assert dst["Categoria"] == vigente


@given(records)
@settings(max_examples=60)
def test_filters_only_remove(recs):
    a = filter_category_headers(recs)
    b = filter_boilerplate(a)
    assert len(b) <= len(a) <= len(recs)
    # surviving rows are unmodified originals, in order
    it = iter(recs)
    for r in a:
        while next(it) is not r:
            pass


def test_map_by_sigla_reference_cases():
    lista = [
        {"id": 1, "siglas": ["CAT CREA", "CERTIDAO DE ACERVO TECNICO"]},
        {"id": 2, "siglas": ["CAO CAU"]},
    ]
    assert map_by_sigla("Certidão de Acervo Técnico nº 1", lista) == 1
    assert map_by_sigla("emitida CAOCAU", lista) == 2  # whitespace-stripped containment
    assert map_by_sigla("nada", lista) is None
    assert map_by_sigla(None, lista) is None


def test_is_servico_valido_reference_cases():
    assert is_servico_valido({"Descricao": "obra", "Item": "1"}) is True
    assert is_servico_valido({"Descricao": None, "Item": "1"}) is False
    assert is_servico_valido({"Descricao": "x", "Item": "UF: BA"}) is False
    assert is_servico_valido({"Descricao": "x", "Item": "CEP: 40000"}) is False
    assert is_servico_valido({"Descricao": "x", "Item": "o ENGENHEIRO"}) is False
