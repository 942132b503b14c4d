"""Salted per-document reassembly (operators O8, O23-O26, O28).

Two-phase groupby so a multi-hundred-chunk outlier document cannot
serialize a reducer (SURVEY.md §4 skew row; the reference's known
weakness — one giant doc runs its whole chunk loop sequentially,
worker/processJob.js:74-87):

  phase 1: groupby (doc_id, salt = chunk_idx // SALT_SPAN)
           → associative partial combine of ≤SALT_SPAN chunk rows
  phase 2: groupby doc_id → merge partials (ordered by chunk_lo),
           run the reference's ordered per-document scans, assemble the
           final row and re-serialize the output spans.

The combine is associative because every doc-level value is either
- order-insensitive (OR of tipo bitmask, AND of items_all_blank), or
- order-keyed (first numero/estado by chunk order; servicos / media
  lists concatenated in chunk order; compressed normalized strings
  concatenated in chunk order with boundary-junction flags folded into
  the bitmask as we merge — see stages/parse.py on exactness).

Ordered scans (auto-numbering parseDocument.js:104-114, category
forward-fill :30-52) run once per document over the merged record list
— O(records), never over text.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.document import finalize_servicos
from ..functions.header import null_header
from ..functions.spans import serialize_result
from ..functions.tipos import detect_tipo_from_flags, tipo_flags_norm
from ..schemas import OUTPUT_SCHEMA, SERVICO_STRUCT
from .parse import HEADER_STRUCT, compress_norm

SALT_SPAN = 64

PARTIAL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_lo", pa.int32()),
        ("servicos", pa.list_(SERVICO_STRUCT)),
        ("numero", pa.string()),
        ("estado", pa.string()),
        ("tipo_bits", pa.int32()),
        ("norm_comp", pa.string()),
        ("header", HEADER_STRUCT),
        ("media_refs", pa.list_(pa.string())),
        ("items_all_blank", pa.bool_()),
    ]
)


def _combine(rows: list[dict]) -> dict:
    """Associative merge of parsed/partial rows pre-sorted by chunk order."""
    servicos: list[dict] = []
    media_refs: list[str] = []
    numero = None
    estado = None
    bits = 0
    header = None
    all_blank = True
    norm_parts: list[str] = []
    for row in rows:
        servicos.extend(row["servicos"] or [])
        media_refs.extend(row["media_refs"] or [])
        if numero is None and row["numero"] is not None:
            numero = row["numero"]
        if estado is None and row["estado"] is not None:
            estado = row["estado"]
        bits |= row["tipo_bits"]
        if header is None and row["header"] is not None:
            header = row["header"]
        all_blank = all_blank and row["items_all_blank"]
        norm_parts.append(row["norm_comp"] or "")
    joined = "".join(norm_parts)
    bits |= tipo_flags_norm(joined)  # boundary-spanning matches at the junctions
    return {
        "servicos": servicos,
        "media_refs": media_refs,
        "numero": numero,
        "estado": estado,
        "tipo_bits": bits,
        "header": header,
        "items_all_blank": all_blank,
        "norm_comp": compress_norm(joined),
    }


def partial_combine(group: pa.Table) -> pa.Table:
    """Phase-1 reducer: one partial row per (doc_id, salt) group."""
    rows = sorted(group.to_pylist(), key=lambda r: r["chunk_idx"])
    merged = _combine(rows)
    merged["doc_id"] = rows[0]["doc_id"]
    merged["chunk_lo"] = rows[0]["chunk_idx"]
    return pa.Table.from_pylist([merged], schema=PARTIAL_SCHEMA)


class FinalAssembler:
    """Phase-2 reducer: merge a document's partials and assemble the
    final output row (parseDocument.js:104-236 + span serialization)."""

    def __init__(self, depara: dict):
        self.depara = depara

    def __call__(self, group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["chunk_lo"])
        merged = _combine(rows)

        servicos = finalize_servicos(merged["servicos"])

        header = merged["header"] or null_header()
        tipo = detect_tipo_from_flags(merged["tipo_bits"], self.depara["listaTiposOriginal"])

        result = {
            "NumerodaCertidao": merged["numero"],
            "ObjetodaCertidao": header.get("ObjetodaCertidao"),
            "TipodaCertidao": tipo,
            "QualificacaoObra": header.get("QualificacaoObra"),
            "QualificacaoEspecifica": header.get("QualificacaoEspecifica"),
            "NiveldeAtividade": header.get("NiveldeAtividade"),
            "Estado": merged["estado"],
            "Servicos": servicos,
        }
        out_spans = serialize_result(result, merged["media_refs"])
        row = {"doc_id": rows[0]["doc_id"], **result, "spans": out_spans}
        return pa.Table.from_pylist([row], schema=OUTPUT_SCHEMA)
