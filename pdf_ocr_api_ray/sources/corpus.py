"""Deterministic testdata → spans-table converter.

``/root/testdata/sf*/documents.parquet`` rows ``(doc_id:int64, text, …)``
are converted into interleaved spans documents of the BASELINE.json
input shape, seeded per doc_id (no external data, reproducible across
runs and parallelism levels). Each document becomes a synthetic
certificate whose table-row descriptions are word windows drawn from
the source text, with a deterministic mix of shapes:

- 70% single-chunk table docs (tier 1)
- 10% multi-chunk (2-4 chunks, alternating table / CAT-text chunks)
-  5% media-interleaved (page_image spans)
-  5% CAT segment docs (tier 2), 5% free-line docs (tier 3)
-  3% boilerplate-heavy, 2% empty/edge docs

Used by ``entry()``, the ``extract_documents`` query and ``bench.py``.
"""

from __future__ import annotations

import random

import pyarrow as pa

from ..functions.ocr import CHUNK_STRIDE
from ..schemas import INPUT_SCHEMA
from .fixtures import _COUNCILS, _ESTADOS, _NIVEIS, _OBJETOS, _UNIDADES_COL, _span


def _words_window(words: list[str], rng: random.Random, lo: int = 3, hi: int = 7) -> str:
    if not words:
        return "servico generico"
    n = rng.randrange(lo, hi)
    start = rng.randrange(0, max(1, len(words) - n))
    return " ".join(words[start : start + n])


def document_to_spans(doc_id: int, text: str) -> list[dict]:
    """One testdata document row → deterministic interleaved spans."""
    rng = random.Random(("corpus", int(doc_id)).__repr__())
    words = (text or "").split()
    spans: list[dict] = []
    row = 0
    chunk = 0

    def emit(kind: str, t: str = "", ref: str = "") -> None:
        nonlocal row
        spans.append(_span(kind, t, ref, chunk * CHUNK_STRIDE + row))
        row += 1

    def qty() -> str:
        return f"{rng.randrange(1, 9999)},{rng.randrange(100):02d}"

    roll = rng.random()
    if roll < 0.02:  # empty/edge
        if rng.random() < 0.5:
            return []
        emit("text", "")
        return spans

    council = rng.choice(_COUNCILS)
    estado = rng.choice(_ESTADOS)
    emit("text", f"Certidão de Acervo Técnico Nº {rng.randrange(10000, 999999)}/{rng.randrange(2010, 2026)}")
    emit("text", f"{council}-{estado}")
    emit("text", f"Objeto: {rng.choice(_OBJETOS)}")
    emit("text", f"Nível de Atividade: {rng.choice(_NIVEIS)}")

    def table_chunk(prefix: str = "") -> None:
        emit("table_header", "ITEM\tDESCRIÇÃO DOS SERVIÇOS\tUNIDADE\tQUANTIDADE")
        for i in range(rng.randrange(3, 9)):
            emit(
                "table_cell",
                f"{prefix}{i + 1}\t{_words_window(words, rng)}\t{rng.choice(_UNIDADES_COL)}\t{qty()}",
            )

    if roll < 0.07:  # CAT segments (tier 2)
        segs = [
            f"{i + 1} - Execução de {_words_window(words, rng)} m2 {qty()}"
            for i in range(rng.randrange(3, 7))
        ]
        emit("text", "Atividade Técnica: " + "; ".join(segs))
    elif roll < 0.12:  # free lines (tier 3)
        emit("text", "PLANILHA DOS SERVIÇOS EXECUTADOS")
        for i in range(rng.randrange(3, 8)):
            emit("text", f"{i + 1}.1 {_words_window(words, rng)} {rng.choice(_UNIDADES_COL)} {qty()}")
    elif roll < 0.15:  # boilerplate-heavy
        table_chunk()
        emit("table_cell", "\tPágina 1/9\t\t")
        emit("table_cell", "\tTel: + 55 (71) 3453-8000\t\t")
        emit("table_cell", "\tTOTAL GERAL\t\t" + qty())
    elif roll < 0.20:  # media-interleaved
        emit("page_image", "", f"mem://doc-{doc_id}/p0")
        table_chunk()
        emit("page_image", "", f"mem://doc-{doc_id}/p1")
    elif roll < 0.30:  # multi-chunk
        table_chunk()
        for c in range(1, rng.randrange(2, 5)):
            chunk = c
            row = 0
            if c % 2 == 1:
                segs = [
                    f"{i + 1} - Coordenação de {_words_window(words, rng)} un {qty()}"
                    for i in range(rng.randrange(2, 4))
                ]
                emit("text", "Atividade Técnica: " + "; ".join(segs))
            else:
                table_chunk(prefix=f"{c}.")
    else:  # plain table doc
        table_chunk()

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
