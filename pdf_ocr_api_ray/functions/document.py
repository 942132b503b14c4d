"""Document-level ordered scans, filters and final assembly
(operators O11-O12, O23-O26, O28).

Reference: parser/parseDocument.js —
- numero regex :85-86, estado regex :88-91
- auto item numbering (ordered scan, only when *every* Item is blank)
  :104-114 with the blank test ``semQuantidade`` :6-10
- category inheritance ``preencherCategoria`` :30-52 (prefix fallback
  ``categoriaPorPrefixo`` :13-24)
- category-header row filter :119-133
- boilerplate / garbage filters :136-215 (36 patterns :139-180,
  600-char cap :181, garbage quantity/item :183-195, index-like unit
  :196-201)
- final assembly :227-236 (the reference's own field typo
  ``ObjetodaCertidaCertidao`` is kept as the *semantic* field
  ``ObjetodaCertidao``; SURVEY.md §1.1 note).

All functions are pure: list[dict] in → list[dict] out, preserving the
reference's exact ordering-sensitive behavior.
"""

from __future__ import annotations

import re

NUMERO_RE = re.compile(r"\b\d{5,}/\d{4}\b")
ESTADO_RE = re.compile(
    r"\b(AC|AL|AP|AM|BA|CE|DF|ES|GO|MA|MT|MS|MG|PA|PB|PR|PE|PI|RJ|RN|RS|RO|RR|SC|SP|SE|TO)\b"
)

_BOILERPLATE_RAW = [
    r"Certidão\s+de\s+Acervo\s+Técnico",
    r"Conselho\s+Regional\s+de\s+Engenharia\s+(e\s+)?Agronomia",
    r"Conselho\s+Regional\s+de\s+Engenharia\s*$",
    r"Regional\s+de\s+Engenharia\s+.*Agronomia\s+da\s+Bahia",
    r"CREA-\s*BA|CREA\s*-\s*BA",
    r"Página\s*\d+\s*/\s*\d+",
    r"vinculado\s+à\s+Certidão",
    r"Chave\s+de\s+Impress[ãa]?o?",
    r"Certidão\s*[°º]\s*\d+\s*/\s*\d*",
    r"/\d{2}/\d{4},\s*\d{2}:\s*$",
    r"^/\d{2}/\d{4},\s*\d{2}:$",
    r"Tel:\s*\+\s*55\s*\(\d{2}\)",
    r"Avenida\s+\d+|Avanida\s+\d+",
    r"Rua\s+[A-ZÀ-Ú]",
    r"Plataforma\s+[GL]\s*,?\s*Lado\s+[AB]",
    r"Centro\s+Administrativo\s+da\s+Bahia",
    r"Salvador-Bahia\s+CEP",
    r"Impresso\s+em:\s*\d{2}/\d{2}/\d{4}",
    r"Este\s+documento\s+encontra-se\s+registrado",
    r"O\s+documento\s+neste\s+ato\s+registrado",
    r"Resolução\s+N[°º]\s*\d+",
    r"CERTIFICAMOS\s*,",
    r"Coordenação\s+Executiva\s+de\s+Infraestrutura\s+da\s+Rede",
    r"Declaramos\s+que\s+todos\s+os\s+serviços",
    r"Comissão\s+Transitória\s+de\s+Recebimento",
    r"Coordenador\s+Executivo\s*$",
    r"Mat\.\s*\d+\.\d+\.\d+-\d*",
    r"E-mail:\s*creaba@creaba",
    r"Fax:\s*\+\s*55",
    r"Site:\s*www\.",
    r"GOVERNO\s+DO\s+ESTADO",
    r"Secretaria\s+da\s+Saúde\s+do\s+Estado",
    r"under\s+F\.L\.",
    r"^un\s*$",
    r"(?:Silvia|ílvia|Sílvia)\s+Maria\s+Pereira",
    r"Fernando\s+\.?\s*da\s+Cunha",
    r"Cesar\s+Maurício\s+B",
    r"ésar\s+Mauricio\s+Chastinet",
    r"^\d{2}/\d{2}/\d{4},\s*09:\s*$",
    r"^\s*/\d{2}/\d{4},\s*\d{2}:\s*$",
]

BOILERPLATE_PATTERNS = [re.compile(p, re.IGNORECASE) for p in _BOILERPLATE_RAW]
# note: a single 36-way alternation was MEASURED SLOWER than this loop
# for the (majority) no-match case — CPython's re fast-scans each small
# pattern by its literal prefix, which a big alternation can't — so the
# loop IS the optimized form; don't "optimize" it back.

DESC_MAX_LENGTH = 600

_PAGINA_DESC_RE = re.compile(r"^Página\s*\d+\s*/?\s*$", re.IGNORECASE)
_PUNCT_ONLY_RE = re.compile(r"^[.,;:\s]+$")
_DIGITS_ONLY_RE = re.compile(r"^\d+$")
_NUMERIC_RE = re.compile(r"^[\d.,]+$")
_INDEX_UNIT_RE = re.compile(r"^\d{1,4}$")


def sem_quantidade(qtd) -> bool:
    """Blank test: None, empty or whitespace-only (parseDocument.js:6-10)."""
    if qtd is None:
        return True
    return str(qtd).strip() == ""


def categoria_por_prefixo(descricao) -> str | None:
    """Prefix of the description up to " - " or ":" (parseDocument.js:13-24)."""
    if not descricao or not isinstance(descricao, str):
        return None
    d = descricao.strip()
    if not d:
        return None
    fim = len(d)
    idx_traco = d.find(" - ")
    if idx_traco != -1:
        fim = min(fim, idx_traco)
    idx_dois_pontos = d.find(":")
    if idx_dois_pontos != -1:
        fim = min(fim, idx_dois_pontos)
    prefixo = d[:fim].strip()
    return prefixo or None


def preencher_categoria(servicos: list[dict]) -> list[dict]:
    """Forward-fill categories: a row without quantity is a "mother" whose
    description becomes the running category (parseDocument.js:30-52)."""
    if not isinstance(servicos, list) or not servicos:
        return servicos
    categoria_vigente = None
    resultado = []
    for s in servicos:
        descricao = s.get("Descricao")
        eh_linha_mae = sem_quantidade(s.get("Quantidade"))
        if eh_linha_mae and descricao:
            categoria_vigente = descricao.strip()
            resultado.append({**s, "Categoria": categoria_vigente})
            continue
        categoria = categoria_vigente
        if categoria is None:
            categoria = categoria_por_prefixo(descricao)
        resultado.append({**s, "Categoria": categoria})
    return resultado


def auto_number_items(servicos: list[dict]) -> list[dict]:
    """Number rows 1,2,3… (rows with quantity only) when every Item is
    blank; mother rows stay null (parseDocument.js:104-114)."""
    todos_em_branco = all(
        s.get("Item") is None or str(s.get("Item")).strip() == "" for s in servicos
    )
    if not (todos_em_branco and servicos):
        return servicos
    contador = 0
    out = []
    for s in servicos:
        if not sem_quantidade(s.get("Quantidade")):
            contador += 1
            out.append({**s, "Item": str(contador)})
        else:
            out.append({**s, "Item": None})
    return out


def filter_category_headers(servicos: list[dict]) -> list[dict]:
    """Drop rows that are only a category header replicated into the body
    (parseDocument.js:119-133)."""
    out = []
    for s in servicos:
        sem_item = s.get("Item") is None or str(s.get("Item")).strip() == ""
        sem_unidade = s.get("Unidade") is None or str(s.get("Unidade")).strip() == ""
        sem_qtd = sem_quantidade(s.get("Quantidade"))
        cat = str(s.get("Categoria")).strip() if s.get("Categoria") is not None else ""
        desc = str(s.get("Descricao")).strip() if s.get("Descricao") is not None else ""
        eh_so_cabecalho = sem_item and sem_unidade and sem_qtd and cat != "" and cat == desc
        if not eh_so_cabecalho:
            out.append(s)
    return out


def is_garbage_quantidade(qtd) -> bool:
    if qtd is None:
        return False
    s = str(qtd).strip()
    if _PUNCT_ONLY_RE.match(s) or s == "" or len(s) > 25:
        return True
    if _DIGITS_ONLY_RE.match(s) and len(s) > 12:
        return True
    if _NUMERIC_RE.match(s) and len(re.sub(r"\D", "", s)) > 15:
        return True
    return False


def is_garbage_item(item) -> bool:
    if item is None:
        return False
    s = str(item).strip()
    return bool(_DIGITS_ONLY_RE.match(s)) and len(s) > 10


def unidade_parece_indice(unidade) -> bool:
    if unidade is None:
        return False
    u = str(unidade).strip()
    return bool(_INDEX_UNIT_RE.match(u)) and int(u) > 0


def filter_boilerplate(servicos: list[dict]) -> list[dict]:
    """Drop boilerplate/garbage rows (parseDocument.js:202-215)."""
    out = []
    for s in servicos:
        cat = (str(s.get("Categoria")).strip() if s.get("Categoria") is not None else "") or ""
        desc = (str(s.get("Descricao")).strip() if s.get("Descricao") is not None else "") or ""
        text = f"{cat} {desc}".strip()
        if len(text) > DESC_MAX_LENGTH:
            continue
        if desc and _PAGINA_DESC_RE.match(desc):
            continue
        if s.get("Quantidade") is not None and str(s.get("Quantidade")).strip() == "47" and not desc:
            continue
        if is_garbage_quantidade(s.get("Quantidade")):
            continue
        if is_garbage_item(s.get("Item")):
            continue
        if (cat == "un" or desc == "un") and not s.get("Quantidade") and not s.get("Item"):
            continue
        if (
            unidade_parece_indice(s.get("Unidade"))
            and sem_quantidade(s.get("Quantidade"))
            and cat
            and cat == desc
        ):
            continue
        if any(p.search(text) for p in BOILERPLATE_PATTERNS):
            continue
        out.append(s)
    return out


def finalize_servicos(servicos: list[dict]) -> list[dict]:
    """The full ordered post-parse chain (numbering → category fill →
    header-row filter → boilerplate filter), in reference order
    (parseDocument.js:104-215)."""
    servicos = auto_number_items(servicos)
    servicos = preencher_categoria(servicos)
    servicos = filter_category_headers(servicos)
    servicos = filter_boilerplate(servicos)
    return servicos


def first_numero(texto: str) -> str | None:
    m = NUMERO_RE.search(texto or "")
    return m.group(0) if m else None


def first_estado(texto: str) -> str | None:
    m = ESTADO_RE.search(texto or "")
    return m.group(1) if m else None
