"""Document → page-chunk fan-out (operator O6, axis-A explode).

The reference splits each PDF into ≤15-page sub-PDFs processed in order
(utils/splitPdf.js:3-26, worker/processJob.js:70). Here each input row's
span list is split into chunk rows by the offset encoding
(``offset // CHUNK_STRIDE``), re-indexed densely (0..n-1) per document
so downstream stages can rely on "chunk 0 = header chunk"
(parseDocument.js:63-66) regardless of raw offsets.

Fully vectorized over the Arrow batch: spans are flattened once, sorted
by (doc, chunk, offset) with one ``np.lexsort``, and re-assembled into a
chunk-row list column with ``pa.ListArray.from_arrays`` — no per-row
Python in the hot path. Documents with zero spans still emit one empty
chunk row so they survive to the output (F15 contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.ocr import CHUNK_STRIDE
from ..schemas import SPAN_STRUCT

CHUNK_ROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_idx", pa.int32()),
        ("n_chunks", pa.int32()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)


def explode_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) rows → (doc_id, chunk_idx, n_chunks, spans) chunk rows."""
    n_docs = batch.num_rows
    if n_docs == 0:
        return CHUNK_ROW_SCHEMA.empty_table()

    spans_col = batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    doc_ids = batch.column("doc_id")

    flat = pc.list_flatten(spans_col)
    parents = pc.list_parent_indices(spans_col).to_numpy(zero_copy_only=False)

    if len(flat) == 0:
        # every doc empty → one empty chunk row per doc
        return pa.table(
            {
                "doc_id": doc_ids,
                "chunk_idx": pa.array(np.zeros(n_docs, dtype=np.int32)),
                "n_chunks": pa.array(np.ones(n_docs, dtype=np.int32)),
                "spans": pa.ListArray.from_arrays(
                    pa.array(np.zeros(n_docs + 1, dtype=np.int32)),
                    flat,
                ),
            },
            schema=CHUNK_ROW_SCHEMA,
        )

    offsets = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
    chunks = np.floor_divide(offsets, CHUNK_STRIDE)

    order = np.lexsort((offsets, chunks, parents))
    parents_s = parents[order]
    chunks_s = chunks[order]
    flat_s = flat.take(pa.array(order))

    # group boundaries where (parent, chunk) changes
    change = np.empty(len(order), dtype=bool)
    change[0] = True
    change[1:] = (parents_s[1:] != parents_s[:-1]) | (chunks_s[1:] != chunks_s[:-1])
    group_starts = np.flatnonzero(change)
    group_parent = parents_s[group_starts]

    # dense chunk_idx per doc: running rank of the group within its parent
    parent_change = np.empty(len(group_starts), dtype=bool)
    parent_change[0] = True
    parent_change[1:] = group_parent[1:] != group_parent[:-1]
    grp_idx = np.arange(len(group_starts))
    first_grp_of_parent = np.maximum.accumulate(np.where(parent_change, grp_idx, 0))
    chunk_idx = (grp_idx - first_grp_of_parent).astype(np.int32)

    # n_chunks per doc, broadcast to its groups
    parent_first = np.flatnonzero(parent_change)
    groups_per_parent = np.diff(np.append(parent_first, len(group_starts)))
    n_chunks = np.repeat(groups_per_parent, groups_per_parent).astype(np.int32)

    list_offsets = np.append(group_starts, len(order)).astype(np.int32)
    spans_out = pa.ListArray.from_arrays(pa.array(list_offsets), flat_s)
    doc_id_out = pc.take(doc_ids, pa.array(group_parent))

    out = pa.table(
        {
            "doc_id": doc_id_out,
            "chunk_idx": pa.array(chunk_idx),
            "n_chunks": pa.array(n_chunks),
            "spans": spans_out,
        },
        schema=CHUNK_ROW_SCHEMA,
    )

    # docs with zero spans: emit an empty chunk row each
    present = np.zeros(n_docs, dtype=bool)
    present[group_parent] = True
    missing = np.flatnonzero(~present)
    if len(missing):
        empty_rows = pa.table(
            {
                "doc_id": pc.take(doc_ids, pa.array(missing)),
                "chunk_idx": pa.array(np.zeros(len(missing), dtype=np.int32)),
                "n_chunks": pa.array(np.ones(len(missing), dtype=np.int32)),
                "spans": pa.ListArray.from_arrays(
                    pa.array(np.zeros(len(missing) + 1, dtype=np.int32)),
                    flat.slice(0, 0),
                ),
            },
            schema=CHUNK_ROW_SCHEMA,
        )
        out = pa.concat_tables([out, empty_rows])

    return out
