"""Explicit Arrow schemas for every table in the engine (SURVEY.md §1.2).

The reference's schemas are implicit JS objects
(/root/reference/ANALISE_PROJETO.md:77-88); here every boundary is a
fixed ``pyarrow.Schema``.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# input table (BASELINE.json input_hint)
INPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

SERVICO_STRUCT = pa.struct(
    [
        ("Item", pa.string()),
        ("Categoria", pa.string()),
        ("Descricao", pa.string()),
        ("Unidade", pa.int32()),
        ("Quantidade", pa.string()),
    ]
)

# final output row (parseDocument.js:227-236 shape + re-serialized spans)
OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("NumerodaCertidao", pa.string()),
        ("ObjetodaCertidao", pa.string()),
        ("TipodaCertidao", pa.int32()),
        ("QualificacaoObra", pa.int32()),
        ("QualificacaoEspecifica", pa.int32()),
        ("NiveldeAtividade", pa.int32()),
        ("Estado", pa.string()),
        ("Servicos", pa.list_(SERVICO_STRUCT)),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)
