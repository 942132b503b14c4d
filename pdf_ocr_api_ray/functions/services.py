"""Per-chunk service-record parsing — tiers 1/2/3 (operators O13-O22).

Operates on the intermediate "Document" representation our OCR/layout
stage emits per page-chunk (the analogue of a Document AI ``Document``
proto, SURVEY.md §1.2):

    {"text": str,                      # flat text buffer for the chunk
     "pages": [{"tables": [{"header_rows": [row], "body_rows": [row]}]}]}
    row = {"cells": [{"start": int, "end": int}]}   # offsets into "text"

Reference semantics, tier by tier (parser/parseServices.js):
- cell text by anchor: :7-13 (first segment only, substring + trim).
- column guessing: :24-41; header-in-body promotion: :137-148.
- tier 1 (tables): :132-210 — mapped path when the header has
  UNIDADE+QUANTIDADE (+ any of DESCRICAO/ITEM/nonempty header), legacy
  path keyed on a numeric col 0 otherwise; skip empty and TOTAL rows.
- tier 2 (CAT "Atividade Técnica" segments): :218-241.
- tier 3 (line-by-line with optional PLANILHA markers): :244-313.
Tier fallback is decided per chunk (per Document), not per document —
parser/parseDocument.js:95-97 flat-maps per-chunk results.

Records are plain dicts {Item, Categoria, Descricao, Unidade,
Quantidade} exactly like parseServices.js:182-190.
"""

from __future__ import annotations

import re

from .textnorm import clean_line, normalize_header
from .units import detect_unidade, infer_unidade_from_descricao, normalize_unidade

_ITEM_RE = re.compile(r"^\d+(\.\d+)*$")
_ITEM_PREFIX_RE = re.compile(r"^\d+(\.\d+)*")
_QTD_SUFFIX_RE = re.compile(r"([\d.,]+)\Z")  # \Z not $: JS $ never matches before a trailing newline
_TOTAL_RE = re.compile(r"^TOTAL\b")
_CAT_SPLIT_RE = re.compile(
    r";\s*(?=\d+\s*-\s*(?:Execução|Coordenação|Elaboração|Planejamento|Projeto|obra|Obra|serviço|Serviço|técnico|Técnico))",
    re.IGNORECASE,
)
_ATIVIDADE_PREFIX_RE = re.compile(r"^Atividade\s+Técnica:\s*", re.IGNORECASE)
_PLANILHA_MARKERS = [
    re.compile(r"PLANILHA\s+(?:DOS\s+)?SERVI[CÇ]OS\s+EXECUTADOS", re.IGNORECASE),
    re.compile(r"ITEM\s+UND\.?\s+QUANT", re.IGNORECASE),
    re.compile(r"\d+\.\s*PLANILHA", re.IGNORECASE),
]
_ALL_CAPS_RE = re.compile(r"^[A-Z\s]+$")
_HDR_ITEM = re.compile(r"\bITEM\b")
_HDR_UNIDADE = re.compile(r"\bUNIDADE\b")
_HDR_QTD = re.compile(r"\bQUANTIDADE\b|\bQTD\b")
_HDR_DESC = re.compile(r"\bNATUREZA\b|\bSERVIC|\bDESCRIC")


def get_text_from_cell(doc_text: str, cell: dict) -> str | None:
    """Substring of the chunk text buffer by the cell's first anchor segment."""
    start = cell.get("start")
    end = cell.get("end")
    if start is None or end is None:
        return None
    return (doc_text or "")[start:end].strip() or None


def get_text_from_cell_multiseg(doc_text: str, segments: list[dict]) -> str:
    """The reference's DEBUG-path anchor resolution
    (test-documentai.js:17-31): join text for ALL textSegments — not
    just segment 0 like the live path (parseServices.js:9-12 /
    ``get_text_from_cell``) — then collapse runs of whitespace to one
    space and trim. Exposed as a library scalar for parity with the
    reference's full surface; the live pipeline keeps the
    segment-0-only behavior on purpose (SURVEY §2.2).

    Faithful to the JS semantics: a missing ``start`` is 0
    (``seg.startIndex || 0``) and the slice follows
    ``String.prototype.substring`` — negative/NaN clamp to 0, and a
    start greater than end SWAPS the two (a missing ``end`` therefore
    yields ``text[0:start]``)."""
    text = doc_text or ""
    n = len(text)

    def clamp(v) -> int:
        try:
            i = int(v)
        except (TypeError, ValueError):
            return 0
        return min(max(i, 0), n)

    parts = []
    for seg in segments or []:
        start = clamp(seg.get("start") or 0)
        end = clamp(seg.get("end") if seg.get("end") is not None else 0)
        if start > end:  # substring() swap semantics
            start, end = end, start
        parts.append(text[start:end])
    return re.sub(r"\s+", " ", "".join(parts)).strip()


def guess_service_columns(header_cells: list[str | None]) -> dict:
    headers = [normalize_header(h or "") for h in header_cells]

    def find(pattern: re.Pattern) -> int:
        for i, h in enumerate(headers):
            if pattern.search(h):
                return i
        return -1

    return {
        "idxItem": find(_HDR_ITEM),
        "idxUnidade": find(_HDR_UNIDADE),
        "idxQuantidade": find(_HDR_QTD),
        "idxDescricao": find(_HDR_DESC),
    }


def detect_quantidade(linha: str) -> tuple[str | None, str]:
    m = _QTD_SUFFIX_RE.search(linha)
    if not m:
        return None, linha
    return m.group(1), _QTD_SUFFIX_RE.sub("", linha).strip()


def detect_item(linha: str) -> tuple[str | None, str]:
    m = _ITEM_PREFIX_RE.match(linha)
    if not m:
        return None, linha
    return m.group(0), linha.replace(m.group(0), "", 1).strip()


def _make_record(item, categoria, descricao, unidade, quantidade) -> dict:
    return {
        "Item": item,
        "Categoria": categoria,
        "Descricao": descricao,
        "Unidade": unidade,
        "Quantidade": quantidade,
    }


def _parse_tables(doc: dict, depara: dict) -> list[dict]:
    resultado: list[dict] = []
    doc_text = doc.get("text") or ""
    for page in doc.get("pages") or []:
        for table in page.get("tables") or []:
            header_rows = table.get("header_rows") or []
            header_row = header_rows[0] if header_rows else None
            body_rows = list(table.get("body_rows") or [])

            # header sometimes lands in the first body row (parseServices.js:137-148)
            if header_row is None and body_rows:
                first_cells = [get_text_from_cell(doc_text, c) for c in body_rows[0]["cells"]]
                first_row_text = " ".join(c if c is not None else "" for c in first_cells).upper()
                if _HDR_UNIDADE.search(first_row_text) and _HDR_QTD.search(first_row_text):
                    header_row = body_rows[0]
                    body_rows = body_rows[1:]

            header_cells = (
                [get_text_from_cell(doc_text, c) for c in header_row["cells"]]
                if header_row
                else []
            )
            idx = guess_service_columns(header_cells)
            has_service_shape = (
                idx["idxUnidade"] != -1
                and idx["idxQuantidade"] != -1
                and (idx["idxDescricao"] != -1 or idx["idxItem"] != -1 or len(header_cells) > 0)
            )

            for row in body_rows:
                cells = [get_text_from_cell(doc_text, c) for c in row["cells"]]
                if not any(cells):
                    continue

                if has_service_shape:
                    # JS indexing past the row's cells yields undefined →
                    # null (rows can be shorter than the header)
                    def cell_at(i: int):
                        return cells[i] if 0 <= i < len(cells) else None

                    item_raw = cell_at(idx["idxItem"]) if idx["idxItem"] != -1 else None
                    item = item_raw if item_raw and _ITEM_RE.match(item_raw) else None
                    descricao = (
                        cell_at(idx["idxDescricao"])
                        if idx["idxDescricao"] != -1
                        else (cells[0] if cells else None)
                    ) or None
                    unidade_raw = (cell_at(idx["idxUnidade"]) if idx["idxUnidade"] != -1 else None) or None
                    quantidade = (cell_at(idx["idxQuantidade"]) if idx["idxQuantidade"] != -1 else None) or None

                    desc_norm = normalize_header(descricao or "")
                    if not descricao and not item:
                        continue
                    if _TOTAL_RE.match(desc_norm):
                        continue

                    unidade = normalize_unidade(unidade_raw, depara["unidades"])
                    if unidade is None:
                        unidade = infer_unidade_from_descricao(descricao, depara["unidades"])
                    resultado.append(_make_record(item, None, descricao, unidade, quantidade))
                    continue

                # legacy shape: numeric first column (parseServices.js:195-205)
                item = cells[0] if cells else None
                if item and _ITEM_RE.match(item):
                    resultado.append(
                        _make_record(
                            item,
                            None,
                            (cells[1] if len(cells) > 1 else None) or None,
                            normalize_unidade(cells[2] if len(cells) > 2 else None, depara["unidades"]),
                            (cells[3] if len(cells) > 3 else None) or None,
                        )
                    )
    return resultado


def _parse_cat_segments(texto_completo: str, depara: dict) -> list[dict]:
    resultado: list[dict] = []
    segmentos = _CAT_SPLIT_RE.split(texto_completo)
    if len(segmentos) <= 1:
        return []
    for seg in segmentos:
        seg = clean_line(_ATIVIDADE_PREFIX_RE.sub("", seg, count=1).strip())
        if not seg or len(seg) < 10:
            continue
        quantidade, sem_qtd = detect_quantidade(seg)
        unidade_id, resto = detect_unidade(sem_qtd, depara["unidades"])
        if not quantidade and not unidade_id:
            continue
        item, descricao = detect_item(resto)
        resultado.append(
            _make_record(item, None, descricao or resto or None, unidade_id, quantidade)
        )
    return resultado


def _parse_lines(texto_completo: str, depara: dict) -> list[dict]:
    resultado: list[dict] = []
    texto_para_linhas = texto_completo
    for marker in _PLANILHA_MARKERS:
        m = marker.search(texto_completo)
        if m:
            texto_para_linhas = texto_completo[m.end():]
            break

    for linha in texto_para_linhas.split("\n"):
        linha = clean_line(linha)
        if not linha or len(linha) < 5:
            continue
        quantidade, sem_quantidade = detect_quantidade(linha)
        unidade_id, sem_unidade = detect_unidade(sem_quantidade, depara["unidades"])
        item, resto = detect_item(sem_unidade)

        if not quantidade and not unidade_id and not item:
            # isolated ALL-CAPS short line = category (parseServices.js:286-299)
            if _ALL_CAPS_RE.match(linha) and len(linha) < 60:
                resultado.append(_make_record(None, linha, None, None, None))
            continue

        resultado.append(_make_record(item, None, resto or None, unidade_id, quantidade))
    return resultado


def parse_services(doc: dict, depara: dict) -> list[dict]:
    """Parse one chunk's Document into service records (3-tier fallback)."""
    resultado = _parse_tables(doc, depara)
    if resultado:
        return resultado

    texto_completo = (doc.get("text") or "").replace("\r\n", "\n")

    resultado = _parse_cat_segments(texto_completo, depara)
    if resultado:
        return resultado

    return _parse_lines(texto_completo, depara)
