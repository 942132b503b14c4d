"""Span-surgery operators — the Adobe PDF-Services sample-family
analogues (SURVEY.md §2.3) re-expressed as list-kernel transforms over
the interleaved spans table.

Reference mapping (all under /root/reference/src):
- splitpdf/*          → ``split_chunks``   (doc → one row per chunk)
- combinepdf/*        → ``combine_docs``   (ordered concat by group key ≙ O8)
- deletepages/*       → ``delete_chunks``  (drop a chunk range, re-offset)
- reorderpages/*      → ``reorder_chunks`` (permute chunk order, re-offset)
- rotatepages/*       → ``rotate_media``   (per-span media transform tag)
- pdfwatermark/*      → ``watermark``      (broadcast small-side merge into
                                            every document ≙ watermark asset)
- pdfproperties/*     → ``span_properties``(per-doc metadata projection)

Every transform is a ``map_batches`` over the spans list column (explode
to flat span rows only when fan-out is the point); documents never
shuffle except ``combine_docs``'s one groupby. Each op's semantics are
pinned by a pure-python per-doc oracle in tests/test_spanops.py.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.ocr import CHUNK_STRIDE
from ..schemas import INPUT_SCHEMA


def _spans_corpus(sf_dir: str):
    """The deterministic spans corpus derived from the sf documents."""
    import ray.data as rd

    from ..sources.corpus import documents_batch_to_spans

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(documents_batch_to_spans, batch_format="pyarrow")


# ---------- pure per-doc kernels (shared by stage + test oracle) ----------


def split_doc(doc_id: str, spans: list[dict]) -> list[dict]:
    """doc → one output row per chunk, chunk re-based to 0 (splitpdf)."""
    by_chunk: dict[int, list[dict]] = {}
    for s in spans or []:
        by_chunk.setdefault(int(s["offset"]) // CHUNK_STRIDE, []).append(s)
    rows = []
    for new_idx, c in enumerate(sorted(by_chunk)):
        part = sorted(by_chunk[c], key=lambda s: int(s["offset"]))
        rebased = [
            {**s, "offset": (int(s["offset"]) % CHUNK_STRIDE)} for s in part
        ]
        rows.append({"doc_id": f"{doc_id}#c{new_idx}", "spans": rebased})
    return rows or [{"doc_id": f"{doc_id}#c0", "spans": []}]


def delete_chunks_doc(spans: list[dict], lo: int, hi: int) -> list[dict]:
    """Drop chunks in [lo, hi), close the gap (deletepages semantics —
    remaining pages renumber)."""
    by_chunk: dict[int, list[dict]] = {}
    for s in spans or []:
        by_chunk.setdefault(int(s["offset"]) // CHUNK_STRIDE, []).append(s)
    keep = [c for c in sorted(by_chunk) if not (lo <= c < hi)]
    out = []
    for new_idx, c in enumerate(keep):
        for s in sorted(by_chunk[c], key=lambda s: int(s["offset"])):
            out.append({**s, "offset": new_idx * CHUNK_STRIDE + int(s["offset"]) % CHUNK_STRIDE})
    return out


def reorder_chunks_doc(spans: list[dict]) -> list[dict]:
    """Reverse the chunk order (reorderpages with a reversed range)."""
    by_chunk: dict[int, list[dict]] = {}
    for s in spans or []:
        by_chunk.setdefault(int(s["offset"]) // CHUNK_STRIDE, []).append(s)
    out = []
    for new_idx, c in enumerate(sorted(by_chunk, reverse=True)):
        for s in sorted(by_chunk[c], key=lambda s: int(s["offset"])):
            out.append({**s, "offset": new_idx * CHUNK_STRIDE + int(s["offset"]) % CHUNK_STRIDE})
    return out


def rotate_media_doc(spans: list[dict], angle: int = 90) -> list[dict]:
    """Tag every media span with a rotation transform (rotatepages is a
    per-page byte map; by-reference payloads carry the op in the ref)."""
    return [
        {**s, "media_ref": f"{s['media_ref']}#rot{angle}"}
        if s.get("kind") == "page_image" and s.get("media_ref")
        else s
        for s in spans or []
    ]


def watermark_doc(spans: list[dict], wm_ref: str) -> list[dict]:
    """Insert the (broadcast) watermark media span at the start of every
    chunk (pdfwatermark: overlay asset applied to every page)."""
    by_chunk: dict[int, list[dict]] = {}
    for s in spans or []:
        by_chunk.setdefault(int(s["offset"]) // CHUNK_STRIDE, []).append(s)
    out = []
    for c in sorted(by_chunk):
        base = c * CHUNK_STRIDE
        out.append({"kind": "page_image", "text": "", "media_ref": wm_ref, "offset": base})
        for s in sorted(by_chunk[c], key=lambda s: int(s["offset"])):
            out.append({**s, "offset": int(s["offset"]) + 1})
    return out


# ---------- Ray stages / queries ----------


def split_chunks(sf_dir: str):
    ds = _spans_corpus(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            rows.extend(split_doc(r["doc_id"], r["spans"]))
        return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)

    out = ds.map_batches(fn, batch_format="pyarrow")
    return _project_counts(out)


def combine_docs(sf_dir: str, group_size: int = 10):
    """Ordered concat of documents into groups (combinepdf): group key =
    doc index // group_size, chunk indices re-based so member k's chunks
    follow member k-1's. One groupby; order key = doc_id within group."""
    import pyarrow.compute as pc

    ds = _spans_corpus(sf_dir)

    def add_key(t: pa.Table) -> pa.Table:
        # doc-id suffix is the numeric index (corpus emits doc-%08d; the
        # slice tolerates longer suffixes but requires the 'doc-' prefix)
        nums = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 4, 99), pa.int64())
        return t.append_column("group_key", pc.cast(pc.divide(nums, group_size), "int64"))

    def merge(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["doc_id"])
        out_spans = []
        chunk_base = 0
        for r in rows:
            max_chunk = -1
            for s in r["spans"] or []:
                c = int(s["offset"]) // CHUNK_STRIDE
                max_chunk = max(max_chunk, c)
                out_spans.append(
                    {**s, "offset": (chunk_base + c) * CHUNK_STRIDE + int(s["offset"]) % CHUNK_STRIDE}
                )
            chunk_base += max_chunk + 1
        return pa.Table.from_pylist(
            [{"doc_id": f"group-{rows[0]['group_key']:06d}", "spans": out_spans}],
            schema=INPUT_SCHEMA,
        )

    out = ds.map_batches(add_key, batch_format="pyarrow").groupby("group_key").map_groups(
        merge, batch_format="pyarrow"
    )
    return _project_counts(out)


def delete_chunks(sf_dir: str, lo: int = 1, hi: int = 3):
    ds = _spans_corpus(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        rows = [
            {"doc_id": r["doc_id"], "spans": delete_chunks_doc(r["spans"], lo, hi)}
            for r in t.to_pylist()
        ]
        return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)

    return _project_counts(ds.map_batches(fn, batch_format="pyarrow"))


def reorder_chunks(sf_dir: str):
    ds = _spans_corpus(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        rows = [
            {"doc_id": r["doc_id"], "spans": reorder_chunks_doc(r["spans"])}
            for r in t.to_pylist()
        ]
        return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)

    return _project_counts(ds.map_batches(fn, batch_format="pyarrow"))


def watermark(sf_dir: str):
    """Broadcast-small-side merge: one watermark ref applied to every
    document (the two-input map; small side rides in the closure)."""
    wm_ref = "mem://assets/watermark-draft"
    ds = _spans_corpus(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        rows = [
            {"doc_id": r["doc_id"], "spans": watermark_doc(r["spans"], wm_ref)}
            for r in t.to_pylist()
        ]
        return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)

    return _project_counts(ds.map_batches(fn, batch_format="pyarrow"))


def span_properties(sf_dir: str):
    """Per-doc metadata projection (pdfproperties): span/chunk/media
    counts and text size, computed with Arrow list kernels (no Python
    per row)."""
    import pyarrow.compute as pc

    ds = _spans_corpus(sf_dir)

    def props(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        n = t.num_rows
        import numpy as np

        par = parents.to_numpy(zero_copy_only=False)
        is_media = pc.equal(flat.field("kind"), pa.scalar("page_image")).to_numpy(
            zero_copy_only=False
        )
        text_len = pc.utf8_length(flat.field("text")).to_numpy(zero_copy_only=False)
        chunk = (flat.field("offset").to_numpy(zero_copy_only=False) // CHUNK_STRIDE).astype(
            "int64"
        )
        n_media = np.zeros(n, dtype="int64")
        np.add.at(n_media, par, is_media.astype("int64"))
        total_text = np.zeros(n, dtype="int64")
        np.add.at(total_text, par, text_len)
        n_chunks = np.zeros(n, dtype="int64")
        if len(par):
            order = np.lexsort((chunk, par))
            ps, cs = par[order], chunk[order]
            newgrp = np.ones(len(ps), dtype=bool)
            newgrp[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
            np.add.at(n_chunks, ps[newgrp], 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_spans": pc.cast(pc.list_value_length(spans), pa.int64()),
                "n_chunks": pa.array(n_chunks),
                "n_media": pa.array(n_media),
                "total_text_len": pa.array(total_text),
            }
        )

    return ds.map_batches(props, batch_format="pyarrow")


def extract_layout(sf_dir: str):
    """Structured layout extraction (extractpdf family + the reference's
    lib/extractLayout.js): one Adobe-Extract-style element row per
    table/paragraph-block/figure per chunk."""
    import pyarrow as pa

    from ..functions.layout import extract_elements
    from ..functions.ocr import spans_to_documents

    ds = _spans_corpus(sf_dir)

    ELEMENTS_SCHEMA = pa.schema(
        [
            ("doc_id", pa.string()),
            ("path", pa.string()),
            ("page", pa.int64()),
            ("num_rows", pa.int64()),
            ("num_cols", pa.int64()),
        ]
    )

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            for doc in spans_to_documents(r["spans"] or []):
                rows.extend(extract_elements(r["doc_id"], doc["chunk_idx"], doc))
        return pa.Table.from_pylist(rows, schema=ELEMENTS_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow")


def _project_counts(ds):
    """Compact rows-only result: per-doc span count + offset checksum
    (stable fingerprint of the surgery result)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        import numpy as np

        flat = pc.list_flatten(spans)
        par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        off = flat.field("offset").to_numpy(zero_copy_only=False).astype("int64")
        checksum = np.zeros(t.num_rows, dtype="int64")
        np.add.at(checksum, par, off * 31 % 1_000_003)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_spans": pc.cast(pc.list_value_length(spans), pa.int64()),
                "offset_checksum": pa.array(checksum),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
