"""Output span re-serialization — the span-sequence-equality target.

The per-row invariant (BASELINE.json input_hint) compares output spans
as (kind, text, media_ref, order) row-for-row. We define the canonical
serialization of a final extraction result (parseDocument.js:227-236
shape) as:

- span 0: kind='header', text = the seven header fields joined by the
  ASCII unit separator (nulls → ''), media_ref=''.
- spans 1..n: kind='servico', one per service record in final order,
  text = Item/Categoria/Descricao/Unidade/Quantidade joined by the unit
  separator (nulls → ''), media_ref=''.
- then one kind='page_image' span per input media span, media_ref
  preserved, in original offset order (media pass-through, F13).
- offsets are dense 0..len-1.

Both the oracle and the Ray pipeline produce this exact sequence; the
pytest suite asserts equality.
"""

from __future__ import annotations

SEP = "\x1f"

_HEADER_FIELDS = (
    "NumerodaCertidao",
    "ObjetodaCertidao",
    "TipodaCertidao",
    "QualificacaoObra",
    "QualificacaoEspecifica",
    "NiveldeAtividade",
    "Estado",
)
_SERVICO_FIELDS = ("Item", "Categoria", "Descricao", "Unidade", "Quantidade")


def _s(v) -> str:
    return "" if v is None else str(v)


def serialize_result(result: dict, media_refs: list[str]) -> list[dict]:
    """Serialize a final result + pass-through media refs to output spans."""
    spans = [
        {
            "kind": "header",
            "text": SEP.join(_s(result.get(f)) for f in _HEADER_FIELDS),
            "media_ref": "",
            "offset": 0,
        }
    ]
    for s in result.get("Servicos") or []:
        spans.append(
            {
                "kind": "servico",
                "text": SEP.join(_s(s.get(f)) for f in _SERVICO_FIELDS),
                "media_ref": "",
                "offset": len(spans),
            }
        )
    for ref in media_refs:
        spans.append({"kind": "page_image", "text": "", "media_ref": ref, "offset": len(spans)})
    return spans
