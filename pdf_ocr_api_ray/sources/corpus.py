"""Deterministic testdata → spans-table converter (corpus v2).

``/root/testdata/sf*/documents.parquet`` rows ``(doc_id:int64, text, …)``
are converted into interleaved spans documents of the BASELINE.json
input shape. Every random draw is **counter-addressed md5**
(``H(doc_id, label) = int(md5(f"{doc_id}|{label}")[:8], 16)``) instead
of a sequential RNG, so the exact same corpus is reproducible in ANY
engine with an md5 function — in particular DuckDB SQL
(``sources/corpus_sql.py`` regenerates the full spans table as a CTE,
which is what gives the flagship and the span-surgery queries real
driver-side oracles instead of rows-only checks).

Document shape mix (same coverage as corpus v1):

- 70% single-chunk table docs (tier 1)
- 10% multi-chunk (2-4 chunks, alternating table / CAT-text chunks)
-  5% media-interleaved (page_image spans)
-  5% CAT segment docs (tier 2), 5% free-line docs (tier 3)
-  3% boilerplate-heavy, 2% empty/edge docs

Used by ``entry()``, the ``extract_documents`` query and ``bench.py``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.ocr import CHUNK_STRIDE
from ..schemas import INPUT_SCHEMA
from .fixtures import _COUNCILS, _ESTADOS, _NIVEIS, _OBJETOS, _UNIDADES_COL, _span

# branch thresholds as exact u32 integers (p * 2^32) — the SQL oracle
# compares against the same constants, no float roundoff anywhere
T_EMPTY = 85899345  # 0.02
T_CAT = 300647710  # 0.07
T_FREE = 515396075  # 0.12
T_BOILER = 644245094  # 0.15
T_MEDIA = 858993459  # 0.20
T_MULTI = 1288490188  # 0.30

TABLE_HEADER_TEXT = "ITEM\tDESCRIÇÃO DOS SERVIÇOS\tUNIDADE\tQUANTIDADE"


def _h(doc_id: int, label: str) -> int:
    """Addressable u32 draw — identical to DuckDB's
    ``('0x'||substr(md5(doc_id||'|'||label),1,8))::UBIGINT``."""
    return int(hashlib.md5(f"{doc_id}|{label}".encode()).hexdigest()[:8], 16)


def _window(doc_id: int, label: str, words: list[str]) -> str:
    """Word window drawn from the source text (3-6 words)."""
    if not words:
        return "servico generico"
    n = 3 + _h(doc_id, label + "n") % 4
    start = _h(doc_id, label + "s") % max(1, len(words) - n)
    return " ".join(words[start : start + n])


def _qty(doc_id: int, label: str) -> str:
    qa = 1 + _h(doc_id, label + "qa") % 9998
    qb = _h(doc_id, label + "qb") % 100
    return f"{qa},{qb:02d}"


def branch_of(doc_id: int) -> str:
    roll = _h(doc_id, "roll")
    if roll < T_EMPTY:
        return "empty"
    if roll < T_CAT:
        return "cat"
    if roll < T_FREE:
        return "free"
    if roll < T_BOILER:
        return "boiler"
    if roll < T_MEDIA:
        return "media"
    if roll < T_MULTI:
        return "multi"
    return "table"


def document_to_spans(doc_id: int, text: str) -> list[dict]:
    """One testdata document row → deterministic interleaved spans."""
    d = int(doc_id)
    words = (text or "").split()
    spans: list[dict] = []
    row = 0
    chunk = 0

    def emit(kind: str, t: str = "", ref: str = "") -> None:
        nonlocal row
        spans.append(_span(kind, t, ref, chunk * CHUNK_STRIDE + row))
        row += 1

    branch = branch_of(d)
    if branch == "empty":
        if _h(d, "ek") % 2 == 0:
            return []
        emit("text", "")
        return spans

    council = _COUNCILS[_h(d, "co") % len(_COUNCILS)]
    estado = _ESTADOS[_h(d, "es") % len(_ESTADOS)]
    num = 10000 + _h(d, "nu") % 989999
    year = 2010 + _h(d, "yr") % 16
    emit("text", f"Certidão de Acervo Técnico Nº {num}/{year}")
    emit("text", f"{council}-{estado}")
    emit("text", f"Objeto: {_OBJETOS[_h(d, 'ob') % len(_OBJETOS)]}")
    emit("text", f"Nível de Atividade: {_NIVEIS[_h(d, 'nv') % len(_NIVEIS)]}")

    def table_chunk(c: int, prefix: str = "") -> None:
        emit("table_header", TABLE_HEADER_TEXT)
        nrows = 3 + _h(d, f"c{c}n") % 6
        for i in range(nrows):
            lbl = f"c{c}r{i}"
            emit(
                "table_cell",
                f"{prefix}{i + 1}\t{_window(d, lbl + 'w', words)}"
                f"\t{_UNIDADES_COL[_h(d, lbl + 'u') % len(_UNIDADES_COL)]}\t{_qty(d, lbl)}",
            )

    if branch == "cat":
        nsegs = 3 + _h(d, "ns") % 4
        segs = [
            f"{i + 1} - Execução de {_window(d, f's{i}w', words)} m2 {_qty(d, f's{i}')}"
            for i in range(nsegs)
        ]
        emit("text", "Atividade Técnica: " + "; ".join(segs))
    elif branch == "free":
        emit("text", "PLANILHA DOS SERVIÇOS EXECUTADOS")
        nlines = 3 + _h(d, "nl") % 5
        for i in range(nlines):
            lbl = f"l{i}"
            emit(
                "text",
                f"{i + 1}.1 {_window(d, lbl + 'w', words)} "
                f"{_UNIDADES_COL[_h(d, lbl + 'u') % len(_UNIDADES_COL)]} {_qty(d, lbl)}",
            )
    elif branch == "boiler":
        table_chunk(0)
        emit("table_cell", "\tPágina 1/9\t\t")
        emit("table_cell", "\tTel: + 55 (71) 3453-8000\t\t")
        emit("table_cell", "\tTOTAL GERAL\t\t" + _qty(d, "tg"))
    elif branch == "media":
        emit("page_image", "", f"mem://doc-{d}/p0")
        table_chunk(0)
        emit("page_image", "", f"mem://doc-{d}/p1")
    elif branch == "multi":
        table_chunk(0)
        nchunks = 2 + _h(d, "nc") % 3
        for c in range(1, nchunks):
            chunk = c
            row = 0
            if c % 2 == 1:
                nsegs = 2 + _h(d, f"c{c}ns") % 2
                segs = [
                    f"{i + 1} - Coordenação de {_window(d, f'c{c}s{i}w', words)} un "
                    f"{_qty(d, f'c{c}s{i}')}"
                    for i in range(nsegs)
                ]
                emit("text", "Atividade Técnica: " + "; ".join(segs))
            else:
                table_chunk(c, prefix=f"{c}.")
    else:  # plain table doc
        table_chunk(0)

    return spans


def documents_batch_to_spans(batch: pa.Table) -> pa.Table:
    """map_batches body: documents rows → spans rows (INPUT_SCHEMA)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = [
        {"doc_id": f"doc-{doc_id:08d}", "spans": document_to_spans(doc_id, text)}
        for doc_id, text in zip(doc_ids, texts)
    ]
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)
