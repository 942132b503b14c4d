"""Property test: the vectorized span-surgery batch transforms must
equal the pure per-doc kernels on ADVERSARIAL random span structures —
shuffled span order inside lists, sparse/gapped chunk indices, empty
docs, single-span docs, media-only chunks. (The corpus-based parity
tests only exercise well-formed dense layouts.)"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from pdf_ocr_api_ray.functions.ocr import CHUNK_STRIDE
from pdf_ocr_api_ray.pipelines import spanops
from pdf_ocr_api_ray.schemas import INPUT_SCHEMA

KINDS = ["text", "table_header", "table_cell", "page_image"]


def _random_doc(rng: random.Random, i: int) -> dict:
    roll = rng.random()
    if roll < 0.08:
        return {"doc_id": f"rnd-{i:05d}", "spans": []}
    spans = []
    # sparse, non-dense chunk indices (the ops must not assume 0..n-1)
    chunks = sorted(rng.sample(range(0, 12), rng.randint(1, 5)))
    for c in chunks:
        rows = rng.sample(range(0, 40), rng.randint(1, 6))
        for r in rows:
            kind = rng.choice(KINDS)
            spans.append(
                {
                    "kind": kind,
                    "text": f"t{c}.{r}" if kind != "page_image" else "",
                    "media_ref": f"mem://x/{c}/{r}" if kind == "page_image" else "",
                    "offset": c * CHUNK_STRIDE + r,
                }
            )
    rng.shuffle(spans)  # stored order is NOT offset order
    return {"doc_id": f"rnd-{i:05d}", "spans": spans}


def _canon(spans: list[dict]) -> list[tuple]:
    return sorted(
        (s["kind"], s["text"], s["media_ref"], int(s["offset"])) for s in spans
    )


@pytest.fixture(scope="module")
def batch():
    rng = random.Random(20260817)
    docs = [_random_doc(rng, i) for i in range(120)]
    return docs, pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)


def test_delete_batch_matches_kernel(batch):
    docs, t = batch
    out = {r["doc_id"]: r["spans"] for r in spanops.delete_batch(t, 1, 3).to_pylist()}
    for d in docs:
        assert _canon(out[d["doc_id"]]) == _canon(
            spanops.delete_chunks_doc(d["spans"], 1, 3)
        ), d["doc_id"]


def test_reorder_batch_matches_kernel(batch):
    docs, t = batch
    out = {r["doc_id"]: r["spans"] for r in spanops.reorder_batch(t).to_pylist()}
    for d in docs:
        assert _canon(out[d["doc_id"]]) == _canon(
            spanops.reorder_chunks_doc(d["spans"])
        ), d["doc_id"]


def test_watermark_batch_matches_kernel(batch):
    docs, t = batch
    out = {
        r["doc_id"]: r["spans"]
        for r in spanops.watermark_batch(t, "mem://assets/wm").to_pylist()
    }
    for d in docs:
        assert _canon(out[d["doc_id"]]) == _canon(
            spanops.watermark_doc(d["spans"], "mem://assets/wm")
        ), d["doc_id"]


def test_split_batch_matches_kernel(batch):
    docs, t = batch
    rows = spanops.split_batch(t).to_pylist()
    got: dict[str, list] = {r["doc_id"]: r["spans"] for r in rows}
    for d in docs:
        for part in spanops.split_doc(d["doc_id"], d["spans"]):
            assert _canon(got[part["doc_id"]]) == _canon(part["spans"]), part["doc_id"]
    # row counts agree too (no extra/missing parts)
    expected_rows = sum(len(spanops.split_doc(d["doc_id"], d["spans"])) for d in docs)
    assert len(rows) == expected_rows


def test_layout_elements_batch_matches_sequential_builder():
    """r4 vectorization of extract_layout: the flattened segmented-scan
    kernel must equal the sequential spans_to_documents +
    extract_elements builders on adversarial inputs — tab-bearing
    table rows, EMPTY span texts (the single-empty-line P suppression),
    header-after-body table splits, media-only chunks, unknown kinds
    (treated as text lines)."""
    from collections import Counter

    from pdf_ocr_api_ray.functions.layout import extract_elements
    from pdf_ocr_api_ray.functions.ocr import spans_to_documents

    rng = random.Random(20260818)
    kinds = ["text", "table_header", "table_cell", "page_image", "mystery"]
    docs = []
    for i in range(200):
        spans = []
        for c in sorted(rng.sample(range(0, 9), rng.randint(0, 4))):
            for r in rng.sample(range(0, 30), rng.randint(1, 7)):
                kind = rng.choice(kinds)
                if kind in ("table_header", "table_cell"):
                    ncell = rng.randint(1, 4)
                    text = "\t".join(
                        rng.choice(["", f"v{r}", "xy"]) for _ in range(ncell)
                    )
                elif kind == "page_image":
                    text = ""
                else:
                    text = rng.choice(["", f"line{c}.{r}", "a b"])
                spans.append(
                    {
                        "kind": kind,
                        "text": text,
                        "media_ref": f"mem://m/{c}/{r}" if kind == "page_image" else "",
                        "offset": c * CHUNK_STRIDE + r,
                    }
                )
        rng.shuffle(spans)
        docs.append({"doc_id": f"lay-{i:04d}", "spans": spans})

    t = pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)
    got = spanops.layout_elements_batch(t).to_pylist()

    exp = []
    for d in docs:
        for doc in spans_to_documents(d["spans"] or []):
            exp.extend(extract_elements(d["doc_id"], doc["chunk_idx"], doc))

    key = lambda r: (r["doc_id"], r["path"], r["page"], r["num_rows"], r["num_cols"])
    assert Counter(map(key, got)) == Counter(map(key, exp))
    assert len(exp) > 300  # non-degenerate corpus
