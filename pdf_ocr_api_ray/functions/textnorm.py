"""Text-normalization scalars (operator O14 family).

Reference semantics:
- ``normalize_header``: parser/parseServices.js:15-22 (same function is
  re-implemented at parser/normalizeDepara.js:1-8 and
  parser/detectTipoCertidao.js:1-7 in the reference) — uppercase, NFD
  de-accent, collapse whitespace, trim.
- ``normalize_alnum``: parser/detectTipoCertidao.js:1-7 — uppercase, NFD
  de-accent, strip every non-[A-Z0-9] character.
- ``clean_ocr``: parser/normalizeUnidade.js:13-23 — uppercase, NFD
  de-accent, strip all whitespace, map ``×`` and ``/``/``-`` to ``X``,
  keep only ``[A-Z0-9X%]``.
- ``clean_line``: parser/parseServices.js:43-48 — collapse whitespace
  (incl. NBSP) to single spaces and trim.
"""

from __future__ import annotations

import re
import unicodedata

_COMBINING = re.compile("[\u0300-\u036f]")
_WS = re.compile(r"\s+")
_NON_ALNUM = re.compile(r"[^A-Z0-9]")
_NON_OCR = re.compile(r"[^A-Z0-9X%]")


def _deaccent_upper(texto: str) -> str:
    """Uppercase then NFD-decompose and drop combining marks (JS
    ``.toUpperCase().normalize("NFD").replace(/[\\u0300-\\u036f]/g,"")``)."""
    return _COMBINING.sub("", unicodedata.normalize("NFD", texto.upper()))


def normalize_header(texto: str | None = "") -> str:
    """Uppercase + de-accent + whitespace-collapse + trim."""
    if texto is None:
        texto = ""
    return _WS.sub(" ", _deaccent_upper(texto)).strip()


def normalize_alnum(texto: str | None = "") -> str:
    """Uppercase + de-accent + strip non-alphanumerics (tipo detection)."""
    if texto is None:
        texto = ""
    return _NON_ALNUM.sub("", _deaccent_upper(texto))


def clean_ocr(texto: str | None = "") -> str:
    """OCR-clean a unit token for exact matching."""
    if texto is None:
        texto = ""
    s = _deaccent_upper(texto)
    s = _WS.sub("", s)
    s = s.replace("×", "X")
    s = re.sub(r"[/\-]", "X", s)
    return _NON_OCR.sub("", s)


def clean_line(texto: str | None = "") -> str:
    """Collapse runs of whitespace (incl. NBSP) to one space and trim."""
    if texto is None:
        texto = ""
    return _WS.sub(" ", texto.replace(" ", " ")).strip()
