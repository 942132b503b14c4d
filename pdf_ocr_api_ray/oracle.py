"""Straight-line single-document oracle — the correctness pin.

Direct transcription of the reference's per-document control flow
(worker/processJob.js:21-96 → parser/parseDocument.js:54-237) over one
input row of the interleaved spans table. Dependency-free (no Ray); the
pytest suite replays every fixture through this oracle AND the Ray Data
pipeline and asserts span-sequence equality (kind, text, media_ref,
order) row-for-row.

Flow (parseDocument.js line refs):
 1. spans → ordered chunk Documents (the OCR stand-in, §3.2 shape)
 2. textoCompleto = '\n'.join(chunk texts)                      :59-61
 3. header = extract_header(chunk-0 text)                       :63-78
 4. numero / estado first-match regexes over textoCompleto      :85-91
 5. per-chunk parse_services, flat-mapped in chunk order        :95-97
 6. auto item numbering (whole-doc blank predicate first)       :104-114
 7. category forward-fill                                       :117
 8. category-header filter                                      :119-133
 9. boilerplate/garbage filter                                  :136-215
10. detect_tipo_certidao over textoCompleto                     :219-222
11. final assembly                                              :227-236
12. output-span re-serialization (our invariant target)
"""

from __future__ import annotations

from .functions.document import (
    finalize_servicos,
    first_estado,
    first_numero,
)
from .functions.header import extract_header
from .functions.ocr import spans_to_documents
from .functions.services import parse_services
from .functions.spans import serialize_result
from .functions.tipos import detect_tipo_certidao


def run_document(doc_id: str, spans: list[dict], depara: dict) -> dict:
    """Run the full reference flow for one document row."""
    documentos = spans_to_documents(spans)

    texto_completo = "\n".join(d["text"] or "" for d in documentos)
    texto_cabecalho = documentos[0]["text"] if documentos else ""

    header = extract_header(texto_cabecalho, depara)

    numero = first_numero(texto_completo)
    estado = first_estado(texto_completo)

    todos_servicos = [r for d in documentos for r in parse_services(d, depara)]
    todos_servicos = finalize_servicos(todos_servicos)

    tipo_certidao_id = detect_tipo_certidao(texto_completo, depara["listaTiposOriginal"])

    result = {
        "NumerodaCertidao": numero,
        "ObjetodaCertidao": header.get("ObjetodaCertidao"),
        "TipodaCertidao": tipo_certidao_id,
        "QualificacaoObra": header.get("QualificacaoObra"),
        "QualificacaoEspecifica": header.get("QualificacaoEspecifica"),
        "NiveldeAtividade": header.get("NiveldeAtividade"),
        "Estado": estado,
        "Servicos": todos_servicos,
    }

    media_refs = [ref for d in documentos for ref in d["media_refs"]]
    out_spans = serialize_result(result, media_refs)

    return {"doc_id": doc_id, **result, "spans": out_spans}
