"""Span-surgery operators: kernel semantics + Ray/oracle agreement."""

from __future__ import annotations

import pytest

from pdf_ocr_api_ray.functions.ocr import CHUNK_STRIDE
from pdf_ocr_api_ray.pipelines import spanops


def _sp(kind, text, offset, ref=""):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": offset}


@pytest.fixture()
def doc3():
    """Three chunks: text, table+media, text."""
    return [
        _sp("text", "c0 line", 0),
        _sp("table_header", "ITEM\tDESC\tUNIDADE\tQUANTIDADE", 1),
        _sp("text", "c1 line", CHUNK_STRIDE),
        _sp("page_image", "", CHUNK_STRIDE + 1, "mem://d/p1"),
        _sp("text", "c2 line", 2 * CHUNK_STRIDE),
    ]


def test_split_doc(doc3):
    rows = spanops.split_doc("d", doc3)
    assert [r["doc_id"] for r in rows] == ["d#c0", "d#c1", "d#c2"]
    # every part re-based to chunk 0
    for r in rows:
        assert all(s["offset"] < CHUNK_STRIDE for s in r["spans"])
    assert rows[1]["spans"][1]["media_ref"] == "mem://d/p1"


def test_delete_chunks_doc(doc3):
    out = spanops.delete_chunks_doc(doc3, 1, 2)  # drop chunk 1
    chunks = sorted({s["offset"] // CHUNK_STRIDE for s in out})
    assert chunks == [0, 1]  # gap closed
    texts = [s["text"] for s in out if s["kind"] == "text"]
    assert texts == ["c0 line", "c2 line"]


def test_reorder_chunks_doc(doc3):
    out = spanops.reorder_chunks_doc(doc3)
    first_chunk_texts = [s["text"] for s in out if s["offset"] < CHUNK_STRIDE and s["kind"] == "text"]
    assert first_chunk_texts == ["c2 line"]


def test_rotate_media_doc(doc3):
    out = spanops.rotate_media_doc(doc3, angle=180)
    refs = [s["media_ref"] for s in out if s["kind"] == "page_image"]
    assert refs == ["mem://d/p1#rot180"]
    # non-media untouched
    assert out[0] == doc3[0]


def test_watermark_doc(doc3):
    out = spanops.watermark_doc(doc3, "mem://assets/wm")
    wm = [s for s in out if s["media_ref"] == "mem://assets/wm"]
    assert len(wm) == 3  # one per chunk
    assert sorted(s["offset"] % CHUNK_STRIDE for s in wm) == [0, 0, 0]
    # original spans shifted by one within their chunk
    assert any(s["text"] == "c0 line" and s["offset"] == 1 for s in out)


SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "query",
    ["split_chunks", "combine_docs", "delete_chunks", "reorder_chunks", "watermark", "span_properties"],
)
def test_spanops_queries_run(ray_session, query):
    ds = getattr(spanops, query)(SF)
    df = ds.to_pandas()
    assert len(df) > 0
    assert "doc_id" in df.columns


def test_span_properties_values(ray_session):
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.sources.corpus import document_to_spans

    df = spanops.span_properties(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    for d in docs[:25]:
        spans = document_to_spans(d["doc_id"], d["text"])
        row = df.loc[f"doc-{d['doc_id']:08d}"]
        assert row["n_spans"] == len(spans)
        assert row["n_media"] == sum(1 for s in spans if s["kind"] == "page_image")
        assert row["total_text_len"] == sum(len(s["text"]) for s in spans)
        exp_chunks = len({s["offset"] // CHUNK_STRIDE for s in spans}) if spans else 0
        assert row["n_chunks"] == exp_chunks


def test_extract_tables_reference_shape():
    from pdf_ocr_api_ray.functions.layout import extract_tables, extract_text
    from pdf_ocr_api_ray.functions.ocr import spans_to_document

    spans = [
        _sp("text", "intro", 0),
        _sp("table_header", "ITEM\tDESC", 1),
        _sp("table_cell", "1\tEscavação", 2),
        _sp("table_cell", "2\t", 3),
    ]
    doc = spans_to_document(spans)
    assert extract_text(doc).startswith("intro")
    tables = extract_tables(doc)
    assert tables[0]["page"] == 1 and tables[0]["table"] == 1
    # body rows only; empty cell stays '' (not None) — extractLayout.js
    assert tables[0]["rows"] == [["1", "Escavação"], ["2", ""]]


def test_extract_layout_query(ray_session):
    from pdf_ocr_api_ray.pipelines.spanops import extract_layout

    df = extract_layout(SF).to_pandas()
    assert set(df["path"]) <= {"//Document/Sect/Table", "//Document/Sect/P", "//Document/Sect/Figure"}
    assert (df[df["path"] == "//Document/Sect/Table"]["num_cols"] > 0).all()
    assert len(df) > 400


def test_combine_docs_groups(ray_session):
    df = spanops.combine_docs(SF).to_pandas()
    assert df["doc_id"].str.startswith("group-").all()
    assert len(df) == 50  # 500 docs / group_size 10


def _counts(spans):
    n = len(spans)
    cs = sum(int(s["offset"]) * 31 % 1_000_003 for s in spans)
    return n, cs


def test_vectorized_surgery_matches_pure_kernels(ray_session):
    """The Arrow/numpy stage implementations must agree with the pure
    per-doc kernels (the reference-semantics source of truth) on every
    document — counts + offset checksums."""
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.sources.corpus import document_to_spans

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    spans_by_doc = {
        f"doc-{d['doc_id']:08d}": document_to_spans(d["doc_id"], d["text"]) for d in docs
    }

    cases = [
        (spanops.delete_chunks, lambda s: spanops.delete_chunks_doc(s, 1, 3)),
        (spanops.reorder_chunks, spanops.reorder_chunks_doc),
        (spanops.watermark, lambda s: spanops.watermark_doc(s, "mem://assets/watermark-draft")),
    ]
    for query, kernel in cases:
        df = query(SF).to_pandas().set_index("doc_id")
        for doc_id, spans in list(spans_by_doc.items())[:60]:
            n, cs = _counts(kernel(spans))
            row = df.loc[doc_id]
            assert (row["n_spans"], row["offset_checksum"]) == (n, cs), (
                f"{query.__name__} disagrees with kernel on {doc_id}"
            )

    # split: one row per chunk, kernel per doc
    split_df = spanops.split_chunks(SF).to_pandas().set_index("doc_id")
    for doc_id, spans in list(spans_by_doc.items())[:40]:
        for part in spanops.split_doc(doc_id, spans):
            n, cs = _counts(part["spans"])
            row = split_df.loc[part["doc_id"]]
            assert (row["n_spans"], row["offset_checksum"]) == (n, cs)


def test_pair_merge_queries(ray_session):
    ins = spanops.insert_pages(SF).to_pandas()
    rep = spanops.replace_pages(SF).to_pandas()
    assert len(ins) == 250 and len(rep) == 250
    # insertion preserves every span of both pair members
    props = spanops.span_properties(SF).to_pandas()
    props["pair"] = props["doc_id"].str.slice(4).astype(int) // 2
    per_pair = props.groupby("pair")["n_spans"].sum()
    ins_ids = ins["doc_id"].str.slice(4).astype(int) // 2
    assert (ins.set_index(ins_ids)["n_spans"].sort_index() == per_pair.sort_index()).all()


def test_pair_merge_odd_corpus_lone_base(ray_session, tmp_path):
    """Odd document count: the last pair has no role-1 partner — the
    merge must neither crash nor shift the lone base's chunks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.sources.corpus import document_to_spans

    rows = [{"doc_id": i, "text": "the fast key order sort table scan merge part window"} for i in range(5)]
    t = pa.table(
        {"doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
         "text": pa.array([r["text"] for r in rows], pa.string())}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    ins = spanops.insert_pages(str(tmp_path)).to_pandas().set_index("doc_id")
    rep = spanops.replace_pages(str(tmp_path)).to_pandas().set_index("doc_id")
    assert len(ins) == 3 and len(rep) == 3  # pairs 0,1,2 (pair 2 lone)
    # lone base (doc 4): insert with an absent partner is the identity
    spans4 = document_to_spans(4, rows[4]["text"])
    n4 = len(spans4)
    cs4 = sum(int(s["offset"]) * 31 % 1_000_003 for s in spans4)
    assert ins.loc["doc-00000004", "n_spans"] == n4
    assert ins.loc["doc-00000004", "offset_checksum"] == cs4
