"""Table-driven unit tests per operator (SURVEY.md §2.1, O11-O27)."""

from __future__ import annotations

import pytest

from pdf_ocr_api_ray.functions.depara import default_depara, normalize_depara
from pdf_ocr_api_ray.functions.document import (
    auto_number_items,
    categoria_por_prefixo,
    filter_boilerplate,
    filter_category_headers,
    first_estado,
    first_numero,
    is_garbage_item,
    is_garbage_quantidade,
    preencher_categoria,
    sem_quantidade,
    unidade_parece_indice,
)
from pdf_ocr_api_ray.functions.header import extract_header
from pdf_ocr_api_ray.functions.ocr import spans_to_document, spans_to_documents
from pdf_ocr_api_ray.functions.services import (
    detect_item,
    detect_quantidade,
    get_text_from_cell,
    guess_service_columns,
    parse_services,
)
from pdf_ocr_api_ray.functions.textnorm import clean_line, clean_ocr, normalize_alnum, normalize_header
from pdf_ocr_api_ray.functions.tipos import detect_tipo_certidao, detect_tipo_from_flags, tipo_flags
from pdf_ocr_api_ray.functions.units import (
    detect_unidade,
    infer_unidade_from_descricao,
    normalize_unidade,
)

DEP = default_depara()
UNIDADES = DEP["unidades"]


# ---------- O14 normalization ----------

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("  Certidão   de Acervo\tTécnico ", "CERTIDAO DE ACERVO TECNICO"),
        ("ação", "ACAO"),
        ("", ""),
        (None, ""),
    ],
)
def test_normalize_header(raw, expected):
    assert normalize_header(raw) == expected


def test_normalize_alnum():
    assert normalize_alnum("Acervo-Técnico! 12") == "ACERVOTECNICO12"


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("m²", "M"),  # ² does not NFD-decompose — matches JS behavior
        ("M 2", "M2"),
        ("M/S", "MXS"),
        ("Mês", "MES"),
        ("%", "%"),
        ("un.", "UN"),
    ],
)
def test_clean_ocr(raw, expected):
    assert clean_ocr(raw) == expected


def test_clean_line_nbsp():
    assert clean_line("a  b   c") == "a b c"


# ---------- O11/O12 regex extraction ----------

def test_first_numero():
    assert first_numero("Certidão Nº 12345/2023 emitida") == "12345/2023"
    assert first_numero("Nº 1234/2023") is None  # needs 5+ digits
    assert first_numero("") is None


def test_first_estado():
    assert first_estado("CREA-BA Salvador") == "BA"
    assert first_estado("sem estado aqui") is None
    # \b boundaries: 'BAHIA' must not match 'BA'
    assert first_estado("BAHIA") is None


# ---------- O18/O19 unit normalization ----------

@pytest.mark.parametrize(
    "raw,expected_id",
    [
        ("M2", 1),
        ("m 2", 1),
        ("METRO QUADRADO", 1),
        ("M²", 4),  # ² stripped → 'M' → exact sigla match on Metro (reference quirk)
        ("m3", 2),
        ("M³", 4),  # same quirk
        ("KG", 3),
        ("quilograma", 3),
        ("UN", 5),
        ("UT", 5),  # alias class
        ("MÊS", 6),
        ("H", 7),
        ("hora", 7),
        ("%", 8),
        ("percentual", 8),
        ("XYZ", None),
        ("", None),
        (None, None),
    ],
)
def test_normalize_unidade(raw, expected_id):
    assert normalize_unidade(raw, UNIDADES) == expected_id


def test_detect_unidade_word_boundary():
    # '%' has no word boundary — must still match (parseServices.js:75-78)
    uid, rest = detect_unidade("reajuste 48%", UNIDADES)
    assert uid == 8
    # plain word must respect \b: 'AMES' must not match sigla 'MES'
    uid2, _ = detect_unidade("EXAMES clinicos", UNIDADES)
    assert uid2 != 6


def test_detect_unidade_scan_order_and_removal():
    uid, rest = detect_unidade("pavimentação m2 asfáltica", UNIDADES)
    assert uid == 1
    assert "m2" not in rest


def test_infer_unidade_from_descricao():
    assert infer_unidade_from_descricao("reajuste (48,69%)", UNIDADES) == 8
    assert infer_unidade_from_descricao("quarenta POR CENTO", UNIDADES) == 8
    assert infer_unidade_from_descricao("percentual de obra", UNIDADES) == 8
    assert infer_unidade_from_descricao("sem unidade", UNIDADES) is None


# ---------- O27 tipo detection ----------

@pytest.mark.parametrize(
    "texto,expected",
    [
        ("Certidão de Acervo Técnico CREA-BA", 1),
        ("Certidão de Acervo Operacional do CREA", 2),
        ("acervo técnico CAU/SP", 3),
        ("CAO emitida pelo CFTA", 9),
        ("Certidão de Acervo Técnico", None),  # no council
        ("CREA apenas", None),  # no CAT/CAO
        ("", None),
    ],
)
def test_detect_tipo_certidao(texto, expected):
    assert detect_tipo_certidao(texto, DEP["listaTiposOriginal"]) == expected


def test_tipo_flags_merge_equivalence():
    a = "Certidão de Acervo Téc"
    b = "nico do CREA"
    whole = detect_tipo_certidao(a + b, DEP["listaTiposOriginal"])
    merged = detect_tipo_from_flags(tipo_flags(a) | tipo_flags(b), DEP["listaTiposOriginal"])
    # per-chunk flags alone MISS the boundary-spanning match; the pipeline
    # handles this with boundary strings (tested in the pipeline suite)
    assert whole == 1
    assert merged is None


# ---------- O13/O15 cell anchors + column guessing ----------

def test_get_text_from_cell():
    text = "ITEM DESCRIÇÃO UNIDADE"
    assert get_text_from_cell(text, {"start": 0, "end": 4}) == "ITEM"
    assert get_text_from_cell(text, {"start": 4, "end": 5}) is None  # whitespace-only → None


def test_guess_service_columns():
    idx = guess_service_columns(["ITEM", "DESCRIÇÃO DOS SERVIÇOS", "UNIDADE", "QTD"])
    assert idx == {"idxItem": 0, "idxDescricao": 1, "idxUnidade": 2, "idxQuantidade": 3}
    idx2 = guess_service_columns(["NATUREZA", "UNIDADE", "QUANTIDADE"])
    assert idx2["idxDescricao"] == 0


# ---------- tier-2/3 detectors ----------

def test_detect_quantidade():
    assert detect_quantidade("Execução de base 1.234,56") == ("1.234,56", "Execução de base")
    assert detect_quantidade("sem quantidade") == (None, "sem quantidade")


def test_detect_item():
    assert detect_item("1.2 Escavação") == ("1.2", "Escavação")
    assert detect_item("Escavação") == (None, "Escavação")


# ---------- O23 auto numbering ----------

def _rec(item=None, cat=None, desc=None, unid=None, qtd=None):
    return {"Item": item, "Categoria": cat, "Descricao": desc, "Unidade": unid, "Quantidade": qtd}


def test_auto_number_only_when_all_blank():
    recs = [_rec(desc="a", qtd="1"), _rec(desc="mãe"), _rec(desc="b", qtd="2")]
    out = auto_number_items(recs)
    assert [r["Item"] for r in out] == ["1", None, "2"]
    # one non-blank item → untouched
    recs2 = [_rec(item="7", desc="a", qtd="1"), _rec(desc="b", qtd="2")]
    assert auto_number_items(recs2) == recs2


# ---------- O24 category inheritance ----------

def test_preencher_categoria_mother_and_prefix():
    recs = [
        _rec(desc="PAVIMENTAÇÃO - base", qtd="1"),  # no mother yet → prefix
        _rec(desc="SERVIÇOS GERAIS"),  # mother
        _rec(desc="filho", qtd="2"),
    ]
    out = preencher_categoria(recs)
    assert out[0]["Categoria"] == "PAVIMENTAÇÃO"
    assert out[1]["Categoria"] == "SERVIÇOS GERAIS"
    assert out[2]["Categoria"] == "SERVIÇOS GERAIS"


def test_categoria_por_prefixo():
    assert categoria_por_prefixo("ELÉTRICA: cabos") == "ELÉTRICA"
    assert categoria_por_prefixo("A - b: c") == "A"
    assert categoria_por_prefixo("sem separador") == "sem separador"
    assert categoria_por_prefixo("") is None


# ---------- O25 category-header filter ----------

def test_filter_category_headers():
    recs = [
        _rec(cat="DRENAGEM", desc="DRENAGEM"),  # pure header row → dropped
        _rec(cat="DRENAGEM", desc="DRENAGEM", qtd="5"),  # has qty → kept
        _rec(cat="DRENAGEM", desc="tubo", qtd="5"),
    ]
    out = filter_category_headers(recs)
    assert len(out) == 2


# ---------- O26 boilerplate/garbage filters ----------

@pytest.mark.parametrize(
    "qtd,garbage",
    [("1.234,56", False), ("...", True), ("1234567890123", True), ("x" * 26, True), ("47", False)],
)
def test_is_garbage_quantidade(qtd, garbage):
    assert is_garbage_quantidade(qtd) is garbage


def test_is_garbage_item():
    assert is_garbage_item("12345678901") is True
    assert is_garbage_item("1.2.3") is False


def test_unidade_parece_indice():
    assert unidade_parece_indice("12") is True
    assert unidade_parece_indice("M2") is False


def test_filter_boilerplate():
    recs = [
        _rec(desc="Página 3/10"),
        _rec(desc="Tel: + 55 (71) 3453-8000"),
        _rec(desc="x" * 700, qtd="1"),
        _rec(qtd="47"),  # the '47' page-count quirk (parseDocument.js:208)
        _rec(desc="un"),
        _rec(desc="Escavação de valas", qtd="10", item="1"),
    ]
    out = filter_boilerplate(recs)
    assert len(out) == 1 and out[0]["Descricao"] == "Escavação de valas"


# ---------- O10 header extraction ----------

def test_extract_header_fields():
    texto = (
        "Certidão de Acervo Técnico Nº 12345/2023\nCREA-BA\n"
        "Objeto: Construção de hospital municipal\nNível de Atividade: Execução\n"
        "Especificação: Pavimentação Urbana"
    )
    h = extract_header(texto, DEP)
    assert h["TipodaCertidao"] == 1
    assert h["NiveldeAtividade"] == 1
    assert h["QualificacaoObra"] == 1  # HOSPITAL → Obras Hospitalares
    assert h["QualificacaoEspecifica"] == 1
    assert h["ObjetodaCertidao"] == "Construção de hospital municipal"


def test_extract_header_null_contract():
    null = extract_header(None, DEP)
    assert all(v is None for v in null.values())
    assert extract_header("", DEP) == null


def test_extract_header_8000_cap():
    texto = "x" * 8000 + "\nObjeto: tardio\nCREA acervo técnico"
    h = extract_header(texto, DEP)
    assert h["ObjetodaCertidao"] is None
    assert h["TipodaCertidao"] is None


# ---------- O4 depara normalization ----------

def test_normalize_depara():
    out = normalize_depara([{"id": 7, "unidadeNome": "M2 - Metro  Quadrado"}], "unidadeNome")
    assert out == [{"id": 7, "valor": "M2 - METRO QUADRADO"}]


# ---------- spans → Document (OCR stand-in) ----------

def _sp(kind, text, offset, media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_spans_to_document_anchors_roundtrip():
    spans = [
        _sp("text", "linha um", 0),
        _sp("table_header", "ITEM\tDESCRIÇÃO\tUNIDADE\tQUANTIDADE", 1),
        _sp("table_cell", "1\tEscavação\tM2\t10,00", 2),
        _sp("page_image", "", 3, media_ref="mem://d/p1"),
        _sp("text", "rodapé", 4),
    ]
    doc = spans_to_document(spans)
    tables = doc["pages"][0]["tables"]
    assert len(tables) == 1
    header_cells = [get_text_from_cell(doc["text"], c) for c in tables[0]["header_rows"][0]["cells"]]
    assert header_cells == ["ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE"]
    body_cells = [get_text_from_cell(doc["text"], c) for c in tables[0]["body_rows"][0]["cells"]]
    assert body_cells == ["1", "Escavação", "M2", "10,00"]
    assert doc["media_refs"] == ["mem://d/p1"]
    assert doc["text"].startswith("linha um\n")


def test_spans_to_documents_chunk_order():
    spans = [_sp("text", "c1", 10_000), _sp("text", "c0", 0), _sp("text", "c0b", 1)]
    docs = spans_to_documents(spans)
    assert [d["chunk_idx"] for d in docs] == [0, 1]
    assert docs[0]["text"] == "c0\nc0b"


def test_media_breaks_table_run():
    spans = [
        _sp("table_header", "ITEM\tDESCRIÇÃO\tUNIDADE\tQUANTIDADE", 0),
        _sp("table_cell", "1\ta\tM2\t1,00", 1),
        _sp("page_image", "", 2, media_ref="m"),
        _sp("table_cell", "2\tb\tM2\t2,00", 3),
    ]
    doc = spans_to_document(spans)
    assert len(doc["pages"][0]["tables"]) == 2


# ---------- parse_services tiers ----------

def test_tier1_total_and_empty_rows_skipped():
    spans = [
        _sp("table_header", "ITEM\tDESCRIÇÃO\tUNIDADE\tQUANTIDADE", 0),
        _sp("table_cell", "1\tEscavação\tM2\t10,00", 1),
        _sp("table_cell", "\t\t\t", 2),
        _sp("table_cell", "\tTOTAL GERAL\t\t99,99", 3),
    ]
    doc = spans_to_document(spans)
    recs = parse_services(doc, DEP)
    assert len(recs) == 1
    assert recs[0]["Item"] == "1" and recs[0]["Unidade"] == 1


def test_tier1_header_in_body_promotion():
    spans = [
        _sp("table_cell", "ITEM\tDESCRIÇÃO\tUNIDADE\tQUANTIDADE", 0),
        _sp("table_cell", "1\tEscavação\tM2\t10,00", 1),
    ]
    recs = parse_services(spans_to_document(spans), DEP)
    assert len(recs) == 1 and recs[0]["Descricao"] == "Escavação"


def test_tier1_legacy_numeric_col0():
    spans = [
        _sp("table_header", "COL-A\tCOL-B", 0),  # no service shape
        _sp("table_cell", "1.2\tEscavação\tM2\t10,00", 1),
        _sp("table_cell", "abc\tnão-numérico\tM2\t9", 2),
    ]
    recs = parse_services(spans_to_document(spans), DEP)
    assert len(recs) == 1 and recs[0]["Item"] == "1.2"


def test_tier2_cat_segments():
    texto = (
        "Atividade Técnica: 1 - Execução de pavimentação asfáltica m2 1.500,00; "
        "2 - Coordenação de obra de drenagem m 300,00; 9 - observação sem medida"
    )
    doc = {"text": texto, "pages": [{"tables": []}], "media_refs": []}
    recs = parse_services(doc, DEP)
    assert len(recs) == 2
    assert recs[0]["Item"] == "1" and recs[0]["Unidade"] == 1 and recs[0]["Quantidade"] == "1.500,00"


def test_tier3_lines_with_marker_and_categories():
    texto = (
        "cabeçalho ignorado 1.234,56\nPLANILHA DOS SERVIÇOS EXECUTADOS\n"
        "1.1 Escavação manual M3 150,00\nPAVIMENTACAO\nab\nlinha sem nada aqui\n"
    )
    doc = {"text": texto, "pages": [{"tables": []}], "media_refs": []}
    recs = parse_services(doc, DEP)
    cats = [r for r in recs if r["Categoria"]]
    items = [r for r in recs if r["Item"]]
    assert len(items) == 1 and items[0]["Item"] == "1.1" and items[0]["Unidade"] == 2
    assert len(cats) == 1 and cats[0]["Categoria"] == "PAVIMENTACAO"


def test_tier_fallback_is_per_chunk():
    # chunk with a parsable table must NOT fall through to tiers 2/3
    spans = [
        _sp("table_header", "ITEM\tDESCRIÇÃO\tUNIDADE\tQUANTIDADE", 0),
        _sp("table_cell", "1\tEscavação\tM2\t10,00", 1),
        _sp("text", "1.9 Linha que o tier 3 pegaria M3 77,00", 2),
    ]
    recs = parse_services(spans_to_document(spans), DEP)
    assert len(recs) == 1


def test_sem_quantidade():
    assert sem_quantidade(None) and sem_quantidade("") and sem_quantidade("  ")
    assert not sem_quantidade("0") and not sem_quantidade("1,5")


def test_model_stage_modes_identical(ray_session):
    """stages/model.py: actor-pool and stateless-task execution of the
    heavy-init model stage produce bit-identical features (same seed →
    same weights wherever they are built)."""
    import pandas as pd

    from pdf_ocr_api_ray.pipelines._util import read_parquet_clean
    from pdf_ocr_api_ray.stages.model import model_features

    ds = read_parquet_clean(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    a = (
        model_features(ds, "actors", concurrency=2, weight_mb=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        model_features(ds, "tasks", weight_mb=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(a) > 0 and a["feature_checksum"].abs().sum() > 0
    pd.testing.assert_frame_equal(a, b)


# ---------- multi-segment text-anchor resolution (debug path) ----------


def test_multiseg_anchor_joins_all_segments():
    """test-documentai.js:17-31 joins EVERY textSegment then collapses
    whitespace — unlike the live path's segment-0-only rule."""
    from pdf_ocr_api_ray.functions.services import (
        get_text_from_cell,
        get_text_from_cell_multiseg,
    )

    text = "ITEM  01\nCONCRETO   ARMADO\tM3  12,5"
    # segments join with NO separator (JS .join("")); the second one
    # starts at the newline, which the whitespace collapse then folds
    segs = [{"start": 0, "end": 8}, {"start": 8, "end": 26}]
    assert get_text_from_cell_multiseg(text, segs) == "ITEM 01 CONCRETO ARMADO"
    # the live path reads only segment 0 (and does not collapse runs)
    assert get_text_from_cell(text, segs[0]) == "ITEM  01"


def test_multiseg_anchor_js_edge_semantics():
    """Pins the JS quirks the debug path inherits: missing startIndex
    → 0 (seg.startIndex || 0), missing endIndex → substring swap
    (text[0:start]), out-of-range clamped, empty list → ''."""
    from pdf_ocr_api_ray.functions.services import get_text_from_cell_multiseg

    text = "abcdef"
    assert get_text_from_cell_multiseg(text, [{"end": 3}]) == "abc"
    # substring(2, NaN) → substring(0, 2) in JS
    assert get_text_from_cell_multiseg(text, [{"start": 2}]) == "ab"
    assert get_text_from_cell_multiseg(text, [{"start": 1, "end": 99}]) == "bcdef"
    assert get_text_from_cell_multiseg(text, []) == ""
    assert get_text_from_cell_multiseg(None, [{"start": 0, "end": 3}]) == ""
