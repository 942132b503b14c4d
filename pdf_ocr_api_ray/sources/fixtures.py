"""Deterministic fixture-document generators (FIXTURES.md families F1-F15).

Each family produces interleaved spans documents exercising one slice of
the reference's behavior; fixtures are fully seeded (no external data).
Offsets follow the FIXTURES.md encoding: ``chunk_idx * 10_000 + row_idx``.
Table rows encode cells TAB-separated (see functions/ocr.py docstring).
"""

from __future__ import annotations

import random

import pyarrow as pa

from ..functions.ocr import CHUNK_STRIDE
from ..schemas import INPUT_SCHEMA

_DESCRICOES = [
    "Escavação de valas em material de 1ª categoria",
    "Execução de base de brita graduada",
    "Pavimentação asfáltica em CBUQ",
    "Assentamento de meio-fio de concreto",
    "Instalação de rede de drenagem pluvial",
    "Concreto estrutural fck 25 MPa",
    "Alvenaria de bloco cerâmico",
    "Revestimento cerâmico de piso",
    "Pintura acrílica em paredes internas",
    "Estrutura metálica para cobertura",
    "Impermeabilização de laje com manta",
    "Fornecimento e lançamento de areia",
]

_CATEGORIAS_CAPS = [
    "SERVICOS PRELIMINARES",
    "MOVIMENTO DE TERRA",
    "PAVIMENTACAO",
    "DRENAGEM",
    "INSTALACOES ELETRICAS",
]

_UNIDADES_COL = ["M2", "M3", "KG", "M", "UN", "MES", "H", "%"]
_UNIDADE_ALIASES = ["M2", "M²", "METRO QUADRADO", "m3", "KG", "UN", "UT", "MÊS", "H", "%"]

_ESTADOS = ["BA", "SP", "RJ", "MG", "CE", "PR", "RS"]
_COUNCILS = ["CREA", "CAU", "CRT", "CRA", "CFTA"]
_NIVEIS = ["Execução", "Coordenação", "Supervisão", "Condução"]
_OBJETOS = [
    "Construção de hospital municipal",
    "Reforma de escola estadual",
    "Edifício residencial multifamiliar",
    "Galpão industrial pré-moldado",
    "Pavimentação urbana do bairro centro",
]


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


class _ChunkBuilder:
    """Accumulates spans for one document with automatic offsets."""

    def __init__(self) -> None:
        self.spans: list[dict] = []
        self._chunk = 0
        self._row = 0

    def next_chunk(self) -> None:
        self._chunk += 1
        self._row = 0

    def _emit(self, kind: str, text: str = "", media_ref: str = "") -> None:
        self.spans.append(_span(kind, text, media_ref, self._chunk * CHUNK_STRIDE + self._row))
        self._row += 1

    def text(self, line: str) -> None:
        self._emit("text", line)

    def header_row(self, *cells: str) -> None:
        self._emit("table_header", "\t".join(cells))

    def body_row(self, *cells: str) -> None:
        self._emit("table_cell", "\t".join(cells))

    def image(self, media_ref: str) -> None:
        self._emit("page_image", "", media_ref)


def _qty(rng: random.Random) -> str:
    kind = rng.randrange(3)
    if kind == 0:
        return f"{rng.randrange(1, 9999)},{rng.randrange(100):02d}"
    if kind == 1:
        return f"{rng.randrange(1, 9)}.{rng.randrange(100, 999)},{rng.randrange(100):02d}"
    return str(rng.randrange(1, 500))


def _desc(rng: random.Random) -> str:
    return rng.choice(_DESCRICOES)


def _cert_header_lines(b: _ChunkBuilder, rng: random.Random, council: str | None = "CREA") -> None:
    estado = rng.choice(_ESTADOS)
    numero = f"{rng.randrange(10000, 999999)}/{rng.randrange(2010, 2026)}"
    kind = rng.choice(["Técnico", "Operacional"])
    if council:
        b.text(f"Certidão de Acervo {kind} Nº {numero}")
        b.text(f"{council}-{estado}")
    else:
        b.text(f"Certidão Nº {numero}")
        b.text(f"Estado: {estado}")
    b.text(f"Objeto: {rng.choice(_OBJETOS)}")
    b.text(f"Nível de Atividade: {rng.choice(_NIVEIS)}")


def gen_f1_table_basic(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.header_row("ITEM", "DESCRIÇÃO DOS SERVIÇOS", "UNIDADE", "QUANTIDADE")
    n = rng.randrange(3, 8)
    for i in range(n):
        item = f"{i + 1}" if rng.random() < 0.7 else f"{i + 1}.{rng.randrange(1, 4)}"
        b.body_row(item, _desc(rng), rng.choice(_UNIDADES_COL), _qty(rng))


def gen_f2_table_headerless(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.body_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    for i in range(rng.randrange(2, 6)):
        b.body_row(str(i + 1), _desc(rng), rng.choice(_UNIDADES_COL), _qty(rng))


def gen_f3_table_total_rows(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    for i in range(rng.randrange(2, 5)):
        b.body_row(str(i + 1), _desc(rng), rng.choice(_UNIDADES_COL), _qty(rng))
        if rng.random() < 0.5:
            b.body_row("", "", "", "")
    b.body_row("", "TOTAL GERAL", "", _qty(rng))
    b.body_row("", "Total do item", "", _qty(rng))


def gen_f4_cat_segments(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    verbs = ["Execução", "Coordenação", "Elaboração", "Planejamento", "Projeto"]
    segs = []
    for i in range(rng.randrange(3, 7)):
        verb = rng.choice(verbs)
        unit = rng.choice(["m2", "m3", "un", "kg", "m"])
        segs.append(f"{i + 1} - {verb} de {_desc(rng).lower()} {unit} {_qty(rng)}")
    b.text("Atividade Técnica: " + "; ".join(segs))


def gen_f5_line_fallback(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.text("PLANILHA DOS SERVIÇOS EXECUTADOS")
    for i in range(rng.randrange(3, 8)):
        roll = rng.random()
        if roll < 0.2:
            b.text(rng.choice(_CATEGORIAS_CAPS))
        elif roll < 0.3:
            b.text("ab")  # < 5 chars → skipped
        else:
            b.text(f"{i + 1}.{rng.randrange(1, 5)} {_desc(rng)} {rng.choice(_UNIDADES_COL)} {_qty(rng)}")


def gen_f6_category_mothers(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    for g in range(rng.randrange(1, 3)):
        b.body_row("", rng.choice(_CATEGORIAS_CAPS), "", "")
        for i in range(rng.randrange(2, 4)):
            b.body_row(f"{g + 1}.{i + 1}", _desc(rng), rng.choice(_UNIDADES_COL), _qty(rng))


def gen_f7_blank_items(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    for _ in range(rng.randrange(3, 7)):
        if rng.random() < 0.25:
            b.body_row("", rng.choice(_CATEGORIAS_CAPS), "", "")  # mother: no qty
        else:
            b.body_row("", _desc(rng), rng.choice(_UNIDADES_COL), _qty(rng))


def gen_f8_prefix_category(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    prefixes = ["PAVIMENTAÇÃO", "ELÉTRICA", "HIDRÁULICA"]
    for i in range(rng.randrange(2, 5)):
        sep = " - " if rng.random() < 0.5 else ": "
        desc = f"{rng.choice(prefixes)}{sep}{_desc(rng).lower()}"
        b.body_row(str(i + 1), desc, rng.choice(_UNIDADES_COL), _qty(rng))


def gen_f9_boilerplate(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    b.body_row("1", _desc(rng), "M2", _qty(rng))
    junk = [
        ("", "Página 3/10", "", ""),
        ("", "Tel: + 55 (71) 3453-8000", "", ""),
        ("", "Rua Aristides Atheneu, 123", "", ""),
        ("", "GOVERNO DO ESTADO", "", ""),
        ("", "Impresso em: 01/02/2023", "", ""),
        ("", "E-mail: creaba@creaba.org.br", "", ""),
        ("", "x" * 650, "", _qty(rng)),
        ("", _desc(rng), "", "1234567890123456"),
        ("12345678901", _desc(rng), "UN", _qty(rng)),
        ("", "un", "", ""),
        ("", _desc(rng), "", "...,"),
    ]
    for row in rng.sample(junk, k=rng.randrange(4, len(junk))):
        b.body_row(*row)
    b.body_row("2", _desc(rng), "UN", _qty(rng))


def gen_f10_units_aliases(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    for i, unit in enumerate(rng.sample(_UNIDADE_ALIASES, k=rng.randrange(4, 9))):
        b.body_row(str(i + 1), _desc(rng), unit, _qty(rng))
    b.body_row("98", f"{_desc(rng)} (48,69%)", "", _qty(rng))
    b.body_row("99", f"{_desc(rng)} reajuste POR CENTO", "", _qty(rng))


def gen_f11_header_fields(rng: random.Random, b: _ChunkBuilder) -> None:
    roll = rng.random()
    if roll < 0.2:
        # negative: no council anywhere → tipo null
        _cert_header_lines(b, rng, council=None)
    else:
        council = rng.choice(_COUNCILS)
        _cert_header_lines(b, rng, council=council)
        b.text(f"Qualificação: {rng.choice(['Hospital Geral', 'Escola Municipal', 'Residencial Parque', 'Industrial Norte'])}")
        b.text(f"Especificação: {rng.choice(['Pavimentação Urbana', 'Saneamento Básico', 'Instalações Elétricas', 'Climatização'])}")
    if rng.random() < 0.3:
        # padding past the 8,000-char header cap; keywords after it are
        # invisible to the header extractor but visible to doc-level tipo
        b.text(("Texto de preenchimento do memorial descritivo. " * 200)[:8200])
        b.text("Referência tardia CFTA e acervo operacional")
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    b.body_row("1", _desc(rng), "M2", _qty(rng))


def gen_f12_multichunk(rng: random.Random, b: _ChunkBuilder) -> None:
    _cert_header_lines(b, rng)
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    for i in range(rng.randrange(2, 4)):
        b.body_row(str(i + 1), _desc(rng), rng.choice(_UNIDADES_COL), _qty(rng))
    n_chunks = rng.randrange(2, 6)
    for c in range(1, n_chunks):
        b.next_chunk()
        if c % 2 == 1:
            b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
            for i in range(rng.randrange(1, 4)):
                b.body_row(f"{c}.{i + 1}", _desc(rng), rng.choice(_UNIDADES_COL), _qty(rng))
        else:
            # chunk with only CAT text → tier divergence per chunk
            segs = [
                f"{i + 1} - Execução de {_desc(rng).lower()} m2 {_qty(rng)}"
                for i in range(rng.randrange(2, 4))
            ]
            b.text("Atividade Técnica: " + "; ".join(segs))


def gen_f13_media_interleaved(rng: random.Random, b: _ChunkBuilder, doc_id: str = "") -> None:
    _cert_header_lines(b, rng)
    b.image(f"mem://{doc_id}/p0")
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    for i in range(rng.randrange(2, 5)):
        b.body_row(str(i + 1), _desc(rng), rng.choice(_UNIDADES_COL), _qty(rng))
        if rng.random() < 0.4:
            b.image(f"mem://{doc_id}/p{i + 1}")
    if rng.random() < 0.5:
        b.next_chunk()
        b.image(f"mem://{doc_id}/p99")
        b.text(f"1.1 {_desc(rng)} M2 {_qty(rng)}")


def gen_f14_skew(rng: random.Random, b: _ChunkBuilder, n_chunks: int = 200) -> None:
    _cert_header_lines(b, rng)
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    b.body_row("1", _desc(rng), "M2", _qty(rng))
    for c in range(1, n_chunks):
        b.next_chunk()
        b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
        for i in range(2):
            b.body_row(f"{c}.{i + 1}", _desc(rng), rng.choice(_UNIDADES_COL), _qty(rng))


def gen_f16_boundary_tipo(rng: random.Random, b: _ChunkBuilder) -> None:
    """Adversarial: the certificate-type needle only exists ACROSS a
    chunk boundary (normalization strips the joint, parseDocument.js
    sees it in textoCompleto; the distributed reducer must recover it
    from the compressed boundary strings — stages/parse.py docstring)."""
    # chunk 0 ends mid-word; chunk 1 completes it; no council/kind
    # token is whole within any single chunk
    splits = [
        ("Certidão de Acervo Téc", "nico emitida pelo CR", "EA regional"),
        ("Acervo Operac", "ional do CF", "TA nacional"),
        ("Documento CA", "T registrado no C", "AU estadual"),
    ]
    parts = rng.choice(splits)
    # fragments must END/START their chunks so the needles only become
    # contiguous after normalization strips the chunk joints
    b.text(f"Nº {rng.randrange(10000, 999999)}/{rng.randrange(2010, 2026)}")
    b.text(parts[0])
    b.next_chunk()
    b.text(parts[1])
    b.next_chunk()
    b.text(parts[2])
    b.header_row("ITEM", "DESCRIÇÃO", "UNIDADE", "QUANTIDADE")
    b.body_row("1", _desc(rng), "M2", _qty(rng))


def gen_f15_empty_and_edge(rng: random.Random, b: _ChunkBuilder) -> None:
    roll = rng.random()
    if roll < 0.34:
        pass  # zero spans
    elif roll < 0.67:
        b.text("")  # single empty text span
    else:
        b.text("Memorial descritivo sem planilha de serviços.")
        b.text("abc")


_FAMILY_GENS = {
    "f1_table_basic": gen_f1_table_basic,
    "f2_table_headerless": gen_f2_table_headerless,
    "f3_table_total_rows": gen_f3_table_total_rows,
    "f4_cat_segments": gen_f4_cat_segments,
    "f5_line_fallback": gen_f5_line_fallback,
    "f6_category_mothers": gen_f6_category_mothers,
    "f7_blank_items": gen_f7_blank_items,
    "f8_prefix_category": gen_f8_prefix_category,
    "f9_boilerplate": gen_f9_boilerplate,
    "f10_units_aliases": gen_f10_units_aliases,
    "f11_header_fields": gen_f11_header_fields,
    "f12_multichunk": gen_f12_multichunk,
    "f13_media_interleaved": gen_f13_media_interleaved,
    "f14_skew": gen_f14_skew,
    "f15_empty_and_edge": gen_f15_empty_and_edge,
    "f16_boundary_tipo": gen_f16_boundary_tipo,
}

FAMILIES = list(_FAMILY_GENS)


def generate_doc(family: str, doc_idx: int, seed: int = 42, **kwargs) -> dict:
    """Generate one deterministic fixture document."""
    doc_id = f"{family}-{doc_idx:05d}"
    rng = random.Random((seed, family, doc_idx).__repr__())
    b = _ChunkBuilder()
    gen = _FAMILY_GENS[family]
    if family == "f13_media_interleaved":
        gen(rng, b, doc_id=doc_id)
    elif family == "f14_skew":
        gen(rng, b, **kwargs)
    else:
        gen(rng, b)
    return {"doc_id": doc_id, "spans": b.spans}


def generate_fixture_docs(
    families: list[str] | None = None,
    docs_per_family: int = 20,
    seed: int = 42,
    skew_chunks: int = 200,
) -> list[dict]:
    """The full deterministic fixture corpus (all families by default)."""
    docs = []
    for family in families or FAMILIES:
        n = 1 if family == "f14_skew" else docs_per_family
        for i in range(n):
            kwargs = {"n_chunks": skew_chunks} if family == "f14_skew" else {}
            docs.append(generate_doc(family, i, seed=seed, **kwargs))
    return docs


def docs_to_table(docs: list[dict]) -> pa.Table:
    """Materialize generated docs as an Arrow table with the input schema."""
    return pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)
