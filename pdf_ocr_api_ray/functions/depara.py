"""De/para (dimension-list) normalization and default dimension tables.

Reference: parser/normalizeDepara.js:1-15 (normalize each row's value to
``{id, valor}``), wired per-field at worker/processJob.js:28-50. The
reference ships these lists in every request body (server.cjs:38-42);
we broadcast them once per run (``ray.put`` / actor constructor args).

The default tables below are synthetic stand-ins shaped after the
values the reference's prompts and detectors expect
(gpt/extractHeader.js:41-74, parser/detectTipoCertidao.js:25-33,
FIXTURES.md dimension section). They are data, not code — a user swaps
them per run exactly like the reference swaps request-body lists.
"""

from __future__ import annotations

from .textnorm import normalize_header


def normalize_depara(lista: list[dict] | None, campo: str) -> list[dict]:
    """Project each row to ``{id, valor}`` with the value header-normalized."""
    out = []
    for item in lista or []:
        out.append({"id": item["id"], "valor": normalize_header(item.get(campo))})
    return out


def _normaliza_sigla(txt: str | None) -> str:
    """mapBySigla's normalizer: uppercase, de-accent, strip ALL
    whitespace (parser/mapBySigla.js:1-7 — note: no collapse, removal)."""
    import re
    import unicodedata

    if txt is None:
        return ""
    s = unicodedata.normalize("NFD", txt.upper())
    s = re.sub("[̀-ͯ]", "", s)
    return re.sub(r"\s+", "", s)


def map_by_sigla(valor: str | None, lista: list[dict] | None) -> int | None:
    """Legacy sigla mapper (parser/mapBySigla.js:9-27, dead in the
    reference server path but kept as an operator): first list row any
    of whose ``siglas`` occurs as a substring of the normalized value."""
    if not valor or not isinstance(lista, list):
        return None
    v = _normaliza_sigla(valor)
    for item in lista:
        siglas = item.get("siglas")
        if not siglas:
            continue
        if any(_normaliza_sigla(s) in v for s in siglas):
            return item["id"]
    return None


_LIXO_ITEM_RES = None


def is_servico_valido(item: dict) -> bool:
    """Legacy output filter (parser/formatFinalResponse.js:1-14): drop
    records without Descricao or whose Item matches junk prefixes."""
    global _LIXO_ITEM_RES
    import re

    if _LIXO_ITEM_RES is None:
        _LIXO_ITEM_RES = [
            re.compile(p, re.IGNORECASE)
            for p in (r"^UF:", r"^CEP:", r"^Início da Obra", r"^Término da Obra", r"ENGENHEIRO")
        ]
    if not item.get("Descricao"):
        return False
    alvo = item.get("Item") or ""
    return not any(rx.search(alvo) for rx in _LIXO_ITEM_RES)


DEFAULT_UNIDADES = [
    {"id": 1, "unidadeNome": "M2 - Metro Quadrado"},
    {"id": 2, "unidadeNome": "M3 - Metro Cúbico"},
    {"id": 3, "unidadeNome": "KG - Quilograma"},
    {"id": 4, "unidadeNome": "M - Metro"},
    {"id": 5, "unidadeNome": "UN - Unidade"},
    {"id": 6, "unidadeNome": "MES - Mês"},
    {"id": 7, "unidadeNome": "H - Hora"},
    {"id": 8, "unidadeNome": "% - Percentual"},
]

DEFAULT_TIPOS_CERTIDAO = [
    {"id": 1, "tipoCertidao": "CAT – CREA"},
    {"id": 2, "tipoCertidao": "CAO – CREA"},
    {"id": 3, "tipoCertidao": "CAT – CAU"},
    {"id": 4, "tipoCertidao": "CAO – CAU"},
    {"id": 5, "tipoCertidao": "CAT – CRT"},
    {"id": 6, "tipoCertidao": "CAO – CRT"},
    {"id": 7, "tipoCertidao": "CAT – CRA"},
    {"id": 8, "tipoCertidao": "CAO – CRA"},
    {"id": 9, "tipoCertidao": "CAO – CFTA"},
]

DEFAULT_NIVEL_ATIVIDADE = [
    {"id": 1, "nivelAtividade": "Execução"},
    {"id": 2, "nivelAtividade": "Coordenação"},
    {"id": 3, "nivelAtividade": "Supervisão"},
    {"id": 4, "nivelAtividade": "Condução"},
]

DEFAULT_QUALIFICACAO_OBRA = [
    {"id": 1, "qualificacao": "Obras Hospitalares"},
    {"id": 2, "qualificacao": "Obras Educacionais"},
    {"id": 3, "qualificacao": "Residencial"},
    {"id": 4, "qualificacao": "Obras Industriais"},
]

DEFAULT_QUALIFICACAO_ESPECIFICA = [
    {"id": 1, "qualificacaoEspecifica": "Pavimentação Urbana"},
    {"id": 2, "qualificacaoEspecifica": "Saneamento Básico"},
    {"id": 3, "qualificacaoEspecifica": "Instalações Elétricas"},
    {"id": 4, "qualificacaoEspecifica": "Climatização"},
]


def default_depara() -> dict:
    """Build the normalized broadcastable de/para dict the pipeline uses.

    Mirrors worker/processJob.js:28-50 + the ``listaTiposOriginal``
    passthrough at worker/processJob.js:93-96.
    """
    return {
        "tipoCertidao": normalize_depara(DEFAULT_TIPOS_CERTIDAO, "tipoCertidao"),
        "nivelAtividade": normalize_depara(DEFAULT_NIVEL_ATIVIDADE, "nivelAtividade"),
        "qualificacaoObra": normalize_depara(DEFAULT_QUALIFICACAO_OBRA, "qualificacao"),
        "qualificacaoEspecifica": normalize_depara(
            DEFAULT_QUALIFICACAO_ESPECIFICA, "qualificacaoEspecifica"
        ),
        "unidades": normalize_depara(DEFAULT_UNIDADES, "unidadeNome"),
        "listaTiposOriginal": DEFAULT_TIPOS_CERTIDAO,
    }
