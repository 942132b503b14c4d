"""End-to-end: Ray extraction pipeline ≡ oracle, span-for-span.

The correctness gate from BASELINE.md: 100% span-sequence equality
(kind, text, media_ref, order) row-for-row, plus property tests
(block-order permutation and salt-span invariance).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from pdf_ocr_api_ray.oracle import run_document
from pdf_ocr_api_ray.pipelines.extraction import build_extraction
from pdf_ocr_api_ray.sources.fixtures import docs_to_table, generate_fixture_docs


def _span_seq(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@pytest.fixture(scope="module")
def corpus(depara):
    docs = generate_fixture_docs(docs_per_family=4, skew_chunks=40)
    oracle = {d["doc_id"]: run_document(d["doc_id"], d["spans"], depara) for d in docs}
    return docs, oracle


@pytest.fixture(scope="module")
def pipeline_rows(ray_session, corpus, depara, tmp_path_factory):
    import ray.data as rd

    docs, _ = corpus
    path = str(tmp_path_factory.mktemp("spans") / "input.parquet")
    pq.write_table(docs_to_table(docs), path)
    out = build_extraction(rd.read_parquet(path), depara, parse_concurrency=2)
    return {r["doc_id"]: r for r in out.take_all()}


def test_every_doc_present(corpus, pipeline_rows):
    docs, _ = corpus
    assert set(pipeline_rows) == {d["doc_id"] for d in docs}


def test_span_sequence_equality(corpus, pipeline_rows):
    _, oracle = corpus
    bad = []
    for doc_id, r in pipeline_rows.items():
        if _span_seq(r["spans"]) != _span_seq(oracle[doc_id]["spans"]):
            bad.append(doc_id)
    assert bad == [], f"span mismatch for {bad[:5]} (+{max(0, len(bad) - 5)} more)"


def test_scalar_fields_equal(corpus, pipeline_rows):
    _, oracle = corpus
    for doc_id, r in pipeline_rows.items():
        o = oracle[doc_id]
        for f in (
            "NumerodaCertidao",
            "ObjetodaCertidao",
            "TipodaCertidao",
            "QualificacaoObra",
            "QualificacaoEspecifica",
            "NiveldeAtividade",
            "Estado",
        ):
            assert r[f] == o[f], (doc_id, f, r[f], o[f])
        assert r["Servicos"] == o["Servicos"], doc_id


def test_block_order_permutation_invariant(ray_session, corpus, depara):
    """Reversing input row order must not change any document's output."""
    import ray.data as rd

    docs, oracle = corpus
    sample = [d for d in docs if not d["doc_id"].startswith("f14")][:40]
    reversed_tbl = docs_to_table(list(reversed(sample)))
    out = build_extraction(rd.from_arrow(reversed_tbl), depara, parse_concurrency=2)
    for r in out.take_all():
        assert _span_seq(r["spans"]) == _span_seq(oracle[r["doc_id"]]["spans"])


def test_bucket_count_invariant(ray_session, corpus, depara):
    """The bucketed reassembly must be a pure optimization: pathological
    bucket counts (1 bucket = everything in one reducer; 4096 = nearly
    one doc per bucket) give identical output. Also stresses the
    batch-boundary combine with a tiny parse batch size."""
    import ray.data as rd

    docs, oracle = corpus
    multi = [d for d in docs if d["doc_id"].startswith(("f12", "f13", "f14"))]
    for nb, bs in ((1, 4), (4096, 2)):
        out = build_extraction(
            rd.from_arrow(docs_to_table(multi)),
            depara,
            parse_concurrency=2,
            num_buckets=nb,
            parse_batch_size=bs,
        )
        for r in out.take_all():
            assert _span_seq(r["spans"]) == _span_seq(oracle[r["doc_id"]]["spans"])


def test_first_match_wins_across_chunks(ray_session, depara):
    """numero/estado take the FIRST match in chunk order — a later
    chunk's different match must not win (parseDocument.js:85-91 over
    the concatenated text)."""
    import ray.data as rd

    from pdf_ocr_api_ray.oracle import run_document

    spans = [
        {"kind": "text", "text": "sem numero aqui", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "Nº 11111/2021 em BA", "media_ref": "", "offset": 10_000},
        {"kind": "text", "text": "Nº 22222/2022 em SP", "media_ref": "", "offset": 20_000},
    ]
    doc = {"doc_id": "first-match", "spans": spans}
    o = run_document(doc["doc_id"], doc["spans"], depara)
    assert o["NumerodaCertidao"] == "11111/2021" and o["Estado"] == "BA"

    out = build_extraction(
        rd.from_arrow(docs_to_table([doc])), depara, parse_concurrency=2, parse_batch_size=1
    ).take_all()
    assert out[0]["NumerodaCertidao"] == "11111/2021"
    assert out[0]["Estado"] == "BA"
    assert _span_seq(out[0]["spans"]) == _span_seq(o["spans"])


def test_output_parquet_roundtrip(ray_session, corpus, depara, tmp_path):
    import ray.data as rd

    docs, oracle = corpus
    sample = [d for d in docs if d["doc_id"].startswith(("f1_", "f13", "f15"))]
    out = build_extraction(rd.from_arrow(docs_to_table(sample)), depara, parse_concurrency=2)
    out.write_parquet(str(tmp_path / "out"))
    back = pq.read_table(str(tmp_path / "out"))
    assert back.num_rows == len(sample)
    for r in back.to_pylist():
        assert _span_seq(r["spans"]) == _span_seq(oracle[r["doc_id"]]["spans"])


def test_large_payload_docs(ray_session, depara):
    """Multi-megabyte span payloads must stream through without
    crashing block handling, and still match the oracle (the
    'large binary rows need small batches' regime — here ~2 MB text
    spans standing in for decoded page payloads)."""
    import ray.data as rd

    from pdf_ocr_api_ray.oracle import run_document

    big = "palavra " * 250_000  # ~2 MB per span
    docs = []
    for i in range(6):
        spans = [
            {"kind": "text", "text": f"Certidão de Acervo Técnico Nº 5555{i}/2021 CREA-BA", "media_ref": "", "offset": 0},
            {"kind": "text", "text": big, "media_ref": "", "offset": 1},
            {"kind": "table_header", "text": "ITEM\tDESCRIÇÃO\tUNIDADE\tQUANTIDADE", "media_ref": "", "offset": 10_000},
            {"kind": "table_cell", "text": f"1\tobra {i}\tM2\t10,00", "media_ref": "", "offset": 10_001},
        ]
        docs.append({"doc_id": f"big-{i}", "spans": spans})
    oracle = {d["doc_id"]: run_document(d["doc_id"], d["spans"], depara) for d in docs}
    out = build_extraction(
        rd.from_arrow(docs_to_table(docs)), depara, parse_batch_size=2
    ).take_all()
    assert len(out) == 6
    for r in out:
        assert _span_seq(r["spans"]) == _span_seq(oracle[r["doc_id"]]["spans"])
        assert r["NumerodaCertidao"] is not None


def test_transient_parse_failures_are_retried(ray_session, depara, tmp_path):
    """A stage that fails transiently (real OCR backends time out) must
    be retried by Ray, not fail the run — the pipeline passes
    retry_exceptions to the parse stage and stays pure under retry."""
    import os

    import ray.data as rd

    from pdf_ocr_api_ray.oracle import run_document
    from pdf_ocr_api_ray.stages.explode import explode_batch
    from pdf_ocr_api_ray.stages.parse import ChunkParser
    from pdf_ocr_api_ray.stages.assemble import BucketAssembler, make_batch_combine

    docs = generate_fixture_docs(families=["f1_table_basic"], docs_per_family=6)
    oracle = {d["doc_id"]: run_document(d["doc_id"], d["spans"], depara) for d in docs}
    marker_dir = str(tmp_path / "flaky")
    os.makedirs(marker_dir)

    parser = ChunkParser(depara)

    def flaky_parse(t):
        # fail the FIRST attempt of each task (marker file per batch key)
        key = str(t.column("doc_id")[0])
        marker = os.path.join(marker_dir, key.replace("/", "_"))
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("transient OCR backend failure")
        return parser(t)

    ds = rd.from_arrow(docs_to_table(docs)).map_batches(explode_batch, batch_format="pyarrow")
    parsed = ds.map_batches(
        flaky_parse,
        batch_format="pyarrow",
        batch_size=2,
        max_retries=3,
        retry_exceptions=True,
    )
    out = (
        parsed.map_batches(make_batch_combine(16), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: BucketAssembler(depara)(g), batch_format="pyarrow")
        .take_all()
    )
    assert len(out) == len(docs)
    for r in out:
        assert _span_seq(r["spans"]) == _span_seq(oracle[r["doc_id"]]["spans"])
