"""Deterministic header-field extraction (operator O10 stand-in).

The reference calls GPT with a rule prompt (gpt/extractHeader.js:25-105)
and a null-on-failure contract (gpt/extractHeader.js:14-19,126-132).
That call is nondeterministic by nature (and broken in the reference —
/root/reference/ANALISE_PROJETO.md:43-65), so this module implements the
*rules the prompt states* as a deterministic classifier with the same
input contract (first-chunk text truncated to 8,000 chars —
gpt/extractHeader.js:23) and the same output shape / null fallback.
Fixtures define golden outputs produced by these rules.

Rules implemented (all case/accent-insensitive over normalized text):
- TipodaCertidao: CAT/CAO × council combination resolved against the
  tipo list (prompt rules 8.1-8.4 ≙ detectTipoCertidao applied to the
  header slice).
- NiveldeAtividade: first of Execução/Coordenação/Supervisão/Condução
  present (prompt rule 10), resolved to the list row containing it.
- QualificacaoObra: keyword map Hospital→OBRAS HOSPITALARES,
  Escola→OBRAS EDUCACIONAIS, Residencial→RESIDENCIAL,
  Industrial→OBRAS INDUSTRIAIS (prompt rule 9).
- QualificacaoEspecifica: first list row whose normalized value occurs
  verbatim in the header text (prompt rule 6 "use exclusively the lists").
- ObjetodaCertidao: the text after an "Objeto:" label up to end-of-line,
  else null (prompt rule 5: never invent).
"""

from __future__ import annotations

import re

from .textnorm import normalize_header
from .tipos import detect_tipo_certidao

HEADER_SLICE = 8000

_NIVEL_ORDER = ["EXECUCAO", "COORDENACAO", "SUPERVISAO", "CONDUCAO"]
_QUAL_OBRA_MAP = [
    ("HOSPITAL", "OBRAS HOSPITALARES"),
    ("ESCOLA", "OBRAS EDUCACIONAIS"),
    ("RESIDENCIAL", "RESIDENCIAL"),
    ("INDUSTRIAL", "OBRAS INDUSTRIAIS"),
]
_OBJETO_RE = re.compile(r"OBJETO\s*:\s*([^\n;]+)", re.IGNORECASE)

_NULL_HEADER = {
    "TipodaCertidao": None,
    "NiveldeAtividade": None,
    "QualificacaoObra": None,
    "QualificacaoEspecifica": None,
    "ObjetodaCertidao": None,
}


def null_header() -> dict:
    return dict(_NULL_HEADER)


def extract_header(texto_ocr: str | None, depara: dict) -> dict:
    """Classify the five header fields from the first-chunk text."""
    if not texto_ocr:
        return null_header()

    texto = texto_ocr[:HEADER_SLICE]
    norm = normalize_header(texto)

    tipo = detect_tipo_certidao(texto, depara.get("listaTiposOriginal"))

    nivel = None
    for kw in _NIVEL_ORDER:
        if re.search(rf"\b{kw}\b", norm):
            for item in depara.get("nivelAtividade") or []:
                if kw in (item.get("valor") or ""):
                    nivel = item["id"]
                    break
            break

    qual_obra = None
    for trigger, alvo in _QUAL_OBRA_MAP:
        if re.search(rf"\b{trigger}", norm):
            alvo_norm = normalize_header(alvo)
            for item in depara.get("qualificacaoObra") or []:
                if (item.get("valor") or "") == alvo_norm:
                    qual_obra = item["id"]
                    break
            break

    qual_esp = None
    for item in depara.get("qualificacaoEspecifica") or []:
        valor = item.get("valor") or ""
        if len(valor) >= 4 and valor in norm:
            qual_esp = item["id"]
            break

    objeto_match = _OBJETO_RE.search(texto)
    objeto = objeto_match.group(1).strip() if objeto_match else None

    return {
        "TipodaCertidao": tipo,
        "NiveldeAtividade": nivel,
        "QualificacaoObra": qual_obra,
        "QualificacaoEspecifica": qual_esp,
        "ObjetodaCertidao": objeto or None,
    }
