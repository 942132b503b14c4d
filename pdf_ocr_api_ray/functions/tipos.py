"""Certificate-type detection (operator O27).

Reference: parser/detectTipoCertidao.js:9-45 — normalize the full text to
bare alphanumerics, flag CAT/CAO (acervo técnico/operacional or the
literal acronyms) × council CREA/CAU/CRT/CRA/CFTA in a fixed precedence
order, and resolve the combined name (e.g. "CATCREA") against the
tipo-certidão dimension list.
"""

from __future__ import annotations

from .textnorm import normalize_alnum

_COMBOS: list[tuple[str, str, str]] = [
    ("CAT", "CREA", "CATCREA"),
    ("CAO", "CREA", "CAOCREA"),
    ("CAT", "CAU", "CATCAU"),
    ("CAO", "CAU", "CAOCAU"),
    ("CAT", "CRT", "CATCRT"),
    ("CAO", "CRT", "CAOCRT"),
    ("CAT", "CRA", "CATCRA"),
    ("CAO", "CRA", "CAOCRA"),
    ("CAO", "CFTA", "CAOCFTA"),
]


def detect_tipo_certidao(texto: str | None, lista_tipos: list[dict] | None = None) -> int | None:
    """Resolve the certificate type id from the (full) document text."""
    if not texto or not isinstance(lista_tipos, list):
        return None

    upper = normalize_alnum(texto)

    flags = {
        "CAT": "ACERVOTECNICO" in upper or "CAT" in upper,
        "CAO": "ACERVOOPERACIONAL" in upper or "CAO" in upper,
        "CREA": "CREA" in upper,
        "CAU": "CAU" in upper,
        "CRT": "CRT" in upper,
        "CRA": "CRA" in upper,
        "CFTA": "CFTA" in upper,
    }

    nome_detectado = None
    for kind, council, nome in _COMBOS:
        if flags[kind] and flags[council]:
            nome_detectado = nome
            break
    if not nome_detectado:
        return None

    for item in lista_tipos:
        texto_lista = item.get("tipoCertidao") or item.get("valor") or ""
        if normalize_alnum(texto_lista) == nome_detectado:
            return item["id"]
    return None


def tipo_flags_norm(upper: str) -> int:
    """Bitmask of the seven detection flags over already-normalized text."""
    bits = 0
    for i, needle_set in enumerate((
        ("ACERVOTECNICO", "CAT"),
        ("ACERVOOPERACIONAL", "CAO"),
        ("CREA",),
        ("CAU",),
        ("CRT",),
        ("CRA",),
        ("CFTA",),
    )):
        if any(n in upper for n in needle_set):
            bits |= 1 << i
    return bits


def tipo_flags(texto: str | None) -> int:
    """Bitmask of the seven detection flags over *normalized* text.

    Used by the distributed pipeline to pre-reduce per-chunk presence so
    the doc-level reducer never needs the full concatenated text. Bit
    order matches ``_COMBOS`` keys: CAT, CAO, CREA, CAU, CRT, CRA, CFTA.
    """
    if not texto:
        return 0
    return tipo_flags_norm(normalize_alnum(texto))


def detect_tipo_from_flags(bits: int, lista_tipos: list[dict] | None = None) -> int | None:
    """Same resolution as ``detect_tipo_certidao`` but from a merged bitmask."""
    if not isinstance(lista_tipos, list):
        return None
    flags = {
        "CAT": bool(bits & 1),
        "CAO": bool(bits & 2),
        "CREA": bool(bits & 4),
        "CAU": bool(bits & 8),
        "CRT": bool(bits & 16),
        "CRA": bool(bits & 32),
        "CFTA": bool(bits & 64),
    }
    nome_detectado = None
    for kind, council, nome in _COMBOS:
        if flags[kind] and flags[council]:
            nome_detectado = nome
            break
    if not nome_detectado:
        return None
    for item in lista_tipos:
        texto_lista = item.get("tipoCertidao") or item.get("valor") or ""
        if normalize_alnum(texto_lista) == nome_detectado:
            return item["id"]
    return None
