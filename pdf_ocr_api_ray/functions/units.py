"""Unit normalization and detection (operators O18-O20, tier-2/3 helpers).

Reference semantics:
- ``normalize_unidade``: parser/normalizeUnidade.js:25-66 — OCR-clean the
  extracted token, exact-match against each dimension row's sigla (first
  word before " - ") or full name, then fall back to alias classes
  (parser/normalizeUnidade.js:3-11) re-resolved to a sigla.
- ``detect_unidade``: parser/parseServices.js:70-105 — scan the dimension
  list in order; for each row try sigla then full name as a
  case-insensitive regex (word-boundary-wrapped only for ``\\w``-only
  terms — '%' must match without \\b); on first hit remove the first
  occurrence from the line and resolve the *term* through
  ``normalize_unidade``.
- ``infer_unidade_from_descricao``: parser/parseServices.js:107-119 —
  '%' char or POR CENTO / PERCENT(UAL|O) in the normalized description
  resolves to the '%' unit.

The dimension list rows are dicts with ``id`` and one of
``unidadeNome`` / ``valor`` / ``nome`` (reference accepts all three:
normalizeUnidade.js:35-39, parseServices.js:81).
"""

from __future__ import annotations

import re

from .textnorm import clean_ocr, normalize_header

ALIASES: dict[str, list[str]] = {
    "METROQUADRADO": ["M2", "M²", "METROQUADRADO"],
    "METROCUBICO": ["M3", "M³", "METROCUBICO"],
    "QUILOGRAMA": ["KG", "QUILOGRAMA"],
    "METRO": ["M", "METRO"],
    "UNIDADE": ["UN", "UNIDADE", "UT"],
    "MES": ["MES", "MÊS"],
    "HORA": ["H", "HORA"],
}

_WORD_LIKE = re.compile(r"^[A-Za-z0-9_]+$")
_PCT_DESC = re.compile(r"\bPOR\s+CENTO\b|\bPERCENT(UAL|O)?\b")


def _raw_name(item: dict) -> str:
    return item.get("unidadeNome") or item.get("valor") or item.get("nome") or ""


# Prepared-lookup cache: the dimension list is cleaned ONCE per list
# object instead of once per lookup (the reference re-cleans per call,
# normalizeUnidade.js:34-53 — pure overhead since the list is
# broadcast-constant). Holding a reference to the list keeps its id()
# stable for the cache key; semantics are unchanged (first-match order
# preserved via setdefault insertion order).
_PREP_CACHE: dict[int, tuple[list, dict, list]] = {}


def _prepare(lista_unidades: list[dict]) -> tuple[dict, list]:
    key = id(lista_unidades)
    hit = _PREP_CACHE.get(key)
    if hit is not None and hit[0] is lista_unidades:
        return hit[1], hit[2]

    exact: dict[str, int] = {}
    for item in lista_unidades:
        raw = _raw_name(item)
        if not raw:
            continue
        partes = raw.split(" - ")
        primeiro = (partes[0] or "").strip()
        sigla_limpa = clean_ocr(
            primeiro.split()[0] if " " in primeiro and primeiro.split() else primeiro
        )
        nome_limpo = clean_ocr(partes[1] if len(partes) > 1 else "")
        # first item matching on either field wins (loop order in the
        # reference) — setdefault keeps the earliest
        exact.setdefault(sigla_limpa, item["id"])
        exact.setdefault(nome_limpo, item["id"])

    alias_classes: list[tuple[frozenset, int | None]] = []
    for variantes in ALIASES.values():
        tokens = frozenset(clean_ocr(v) for v in variantes)
        resolved = None
        for item in lista_unidades:
            raw = _raw_name(item)
            sigla = clean_ocr(raw.split(" - ")[0] or "")
            if sigla in tokens:
                resolved = item["id"]
                break
        alias_classes.append((tokens, resolved))

    _PREP_CACHE[key] = (lista_unidades, exact, alias_classes)
    if len(_PREP_CACHE) > 64:  # bound the cache (bench replicates lists)
        _PREP_CACHE.pop(next(iter(_PREP_CACHE)))
    return exact, alias_classes


def normalize_unidade(unidade_extraida: str | None, lista_unidades: list[dict] | None) -> int | None:
    """Resolve a raw unit token to a dimension-row id, else None."""
    if not unidade_extraida:
        return None
    if not isinstance(lista_unidades, list):
        return None

    limpa = clean_ocr(unidade_extraida)
    exact, alias_classes = _prepare(lista_unidades)

    hit = exact.get(limpa)
    if hit is not None:
        return hit

    for tokens, resolved in alias_classes:
        if limpa in tokens and resolved is not None:
            return resolved

    return None


def _build_term_regex(termo: str) -> re.Pattern:
    escaped = re.escape(termo)
    if _WORD_LIKE.match(termo):
        return re.compile(rf"\b{escaped}\b", re.IGNORECASE)
    return re.compile(escaped, re.IGNORECASE)


def detect_unidade(linha: str | None, lista_unidades: list[dict] | None = None) -> tuple[int | None, str]:
    """Find the first dimension term occurring in the line.

    Returns ``(unidade_id, line_without_term)``; ``(None, line)`` when no
    term matches. Scan order = dimension-list order, sigla before name.
    """
    if not linha:
        return None, linha or ""
    lista_unidades = lista_unidades or []

    for item in lista_unidades:
        raw = _raw_name(item)
        partes = raw.split(" - ")
        # the reference drops empty parts, so a leading " - " shifts the name
        # into the sigla slot (parseServices.js:80-85)
        candidatos = [p for p in ((partes[0] or "").strip(), " - ".join(partes[1:]).strip()) if p]
        if not candidatos:
            continue
        sigla = candidatos[0]
        nome_completo = candidatos[1] if len(candidatos) > 1 else ""
        for termo in (sigla, nome_completo):
            if not termo:
                continue
            regex = _build_term_regex(termo)
            if regex.search(linha):
                nova = regex.sub("", linha, count=1).strip()
                return normalize_unidade(termo, lista_unidades), nova

    return None, linha


def infer_unidade_from_descricao(descricao: str | None, lista_unidades: list[dict] | None = None) -> int | None:
    """'%' or spelled-out percentage in the description implies the '%' unit."""
    if not descricao:
        return None
    lista_unidades = lista_unidades or []
    if "%" in descricao:
        return normalize_unidade("%", lista_unidades)
    if _PCT_DESC.search(normalize_header(descricao)):
        return normalize_unidade("%", lista_unidades)
    return None
