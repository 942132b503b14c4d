"""Deterministic OCR/layout stand-in: interleaved spans → chunk Document.

The reference's OCR stage (Google Document AI, worker/processJob.js:74-87;
legacy local path ocr-tesseract.cjs:5-39) turns a ≤15-page PDF chunk into
a ``Document`` proto: one flat text buffer plus layout elements that
reference it by character-offset anchors (consumed at
parser/parseServices.js:7-13). Our input table already carries the
interleaved span content (BASELINE.json input_hint), so the stand-in
"recognizes" a chunk by re-materializing exactly that representation:

- spans are grouped into chunks by ``offset // CHUNK_STRIDE`` (the
  fixture encoding: offset = chunk_idx * 10_000 + row_idx) and ordered
  by offset within a chunk — the analogue of the reference's page-order
  filename sort (ocr-tesseract.cjs:13-15) and sequential chunk loop
  (processJob.js:74).
- kind='text' spans append one line to the chunk text buffer.
- kind='table_header' / 'table_cell' spans each encode one table ROW with
  cells separated by TAB; cell texts are appended to the buffer separated
  by single spaces and their [start, end) offsets recorded as anchors —
  the Document AI textAnchor model (SURVEY.md §1.1).
- consecutive table rows form one table; a header row after body rows
  starts a new table; any text/media span closes the current table.
- kind='page_image' spans contribute no text; their media_ref is
  collected for order-preserving pass-through.

Output Document: ``{"chunk_idx", "text", "pages": [{"tables": [...]}],
"media_refs": [...]}`` with tables ``{"header_rows": [row],
"body_rows": [row]}``, row ``{"cells": [{"start", "end"}]}``.
"""

from __future__ import annotations

CHUNK_STRIDE = 10_000

TEXT_KINDS = ("text",)
TABLE_KINDS = ("table_header", "table_cell")
MEDIA_KINDS = ("page_image",)


def spans_to_document(spans: list[dict]) -> dict:
    """Build one chunk Document from that chunk's spans (pre-sorted by offset)."""
    rows: list[str] = []
    pos = 0
    tables: list[dict] = []
    current: dict | None = None
    media_refs: list[str] = []

    for span in spans:
        kind = span.get("kind") or ""
        text = span.get("text") or ""
        if kind in TABLE_KINDS:
            cells_text = text.split("\t")
            row_cells = []
            row_parts = []
            cell_pos = pos
            for i, cell in enumerate(cells_text):
                if i > 0:
                    cell_pos += 1  # single-space separator
                row_cells.append({"start": cell_pos, "end": cell_pos + len(cell)})
                row_parts.append(cell)
                cell_pos += len(cell)
            row_str = " ".join(row_parts)
            rows.append(row_str)
            pos += len(row_str) + 1  # +1 for the newline joining rows

            row = {"cells": row_cells}
            if kind == "table_header":
                if current is None or current["body_rows"]:
                    current = {"header_rows": [], "body_rows": []}
                    tables.append(current)
                current["header_rows"].append(row)
            else:
                if current is None:
                    current = {"header_rows": [], "body_rows": []}
                    tables.append(current)
                current["body_rows"].append(row)
        elif kind in MEDIA_KINDS:
            media_refs.append(span.get("media_ref") or "")
            current = None
        else:  # plain text span
            rows.append(text)
            pos += len(text) + 1
            current = None

    return {
        "text": "\n".join(rows),
        "pages": [{"tables": tables}] if tables else [{"tables": []}],
        "media_refs": media_refs,
    }


def spans_to_documents(spans: list[dict]) -> list[dict]:
    """Split a document's spans into ordered chunk Documents.

    Chunks are ordered by their raw chunk index (``offset // CHUNK_STRIDE``)
    ascending — the reference's page/chunk order invariant
    (processJob.js:70-87). Returns ``[]`` for empty/missing spans.
    """
    if not spans:
        return []
    by_chunk: dict[int, list[dict]] = {}
    for span in spans:
        by_chunk.setdefault(int(span.get("offset") or 0) // CHUNK_STRIDE, []).append(span)
    docs = []
    for chunk_idx in sorted(by_chunk):
        chunk_spans = sorted(by_chunk[chunk_idx], key=lambda s: int(s.get("offset") or 0))
        doc = spans_to_document(chunk_spans)
        doc["chunk_idx"] = chunk_idx
        docs.append(doc)
    return docs
