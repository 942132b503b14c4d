"""Seeded fuzz conformance: arbitrary (not family-shaped) span documents
must still produce pipeline ≡ oracle span sequences — weird unicode,
tabs/newlines inside span text, dense needle fragments, random offsets,
duplicate offsets, media refs on text kinds and vice versa."""

from __future__ import annotations

import random

import pytest

from pdf_ocr_api_ray.functions.depara import default_depara
from pdf_ocr_api_ray.oracle import run_document
from pdf_ocr_api_ray.pipelines.extraction import build_extraction
from pdf_ocr_api_ray.sources.fixtures import docs_to_table

_WORDS = [
    "CAT", "CREA", "CAU", "Acervo", "Técnico", "Operacional", "CR", "EA",
    "TOTAL", "ITEM", "UNIDADE", "QUANTIDADE", "12345/2023", "BA", "SP",
    "1.2", "150,00", "M2", "un", "%", "Página 3/10", "PLANILHA DOS SERVIÇOS EXECUTADOS",
    "Atividade Técnica:", "1 - Execução de obra m2 10,00;", "ç", "ã", "²", "—", "",
]
_KINDS = ["text", "text", "text", "table_header", "table_cell", "table_cell", "page_image", "mystery"]


def _fuzz_doc(i: int) -> dict:
    rng = random.Random(("fuzz", i).__repr__())
    mode = i % 4
    n = rng.randrange(0, 25)
    spans = []
    for k in range(n):
        kind = rng.choice(_KINDS)
        if mode == 2:
            # boundary-dense: fragments that only complete across chunks
            text = rng.choice(["Acervo Téc", "nico", "CR", "EA", "CF", "TA", "C", "AU", "CA", "T"])
            offset = k * 10_000 + rng.randrange(0, 3)  # every span its own chunk-ish
        elif mode == 3:
            # header-cap straddling: long text around the 8,000-char cap
            filler = rng.choice(["x", "Execução ", "Hospital "])
            text = filler * rng.randrange(700, 1200) + rng.choice(_WORDS)
            offset = rng.randrange(0, 25_000)
        else:
            words = [rng.choice(_WORDS) for _ in range(rng.randrange(0, 8))]
            sep = rng.choice([" ", "\t", "\n", ""])
            text = sep.join(words)
            # negative offsets are schema-legal; floor-division chunk
            # assignment must agree between oracle and explode stage
            offset = rng.randrange(-5_000, 45_000)  # random chunks incl. duplicates
        ref = rng.choice(["", f"mem://f{i}/p{rng.randrange(5)}", "junk ref"])
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": offset})
    return {"doc_id": f"fuzz-{i:04d}", "spans": spans}


@pytest.mark.parametrize("seed_block", [0, 1, 2, 3])
def test_fuzz_span_equality(ray_session, depara, seed_block):
    import ray.data as rd

    docs = [_fuzz_doc(i) for i in range(seed_block * 100, seed_block * 100 + 100)]
    oracle = {d["doc_id"]: run_document(d["doc_id"], d["spans"], depara) for d in docs}
    out = build_extraction(
        rd.from_arrow(docs_to_table(docs)), depara, parse_batch_size=7, num_buckets=13
    ).take_all()
    assert len(out) == len(docs)
    bad = []
    for r in out:
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        exp = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle[r["doc_id"]]["spans"]
        ]
        if got != exp:
            bad.append(r["doc_id"])
    assert bad == [], bad[:5]
