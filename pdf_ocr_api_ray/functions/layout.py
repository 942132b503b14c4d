"""Layout extraction utilities (reference: lib/extractLayout.js:1-30 and
the extractpdf structured-output shape, result.zip/structuredData.json).

- ``extract_text`` / ``extract_tables``: the reference's helper pair —
  tables as {page, table, rows} with 1-based indices, BODY rows only,
  missing anchors defaulting to 0 and cell text trimmed (note: unlike
  parseServices.getTextFromCell, empty cells stay '' — not null).
- ``extract_elements``: the Adobe Extract ``elements`` projection —
  one row per layout element with a ``//Document/...`` path, page
  index and table geometry attributes (structuredData.json shape:
  Path, Page, attributes.NumCol/NumRow).
"""

from __future__ import annotations


def extract_text(document: dict) -> str:
    return document.get("text") or ""


def extract_tables(document: dict) -> list[dict]:
    """Body rows of every table as trimmed cell strings."""
    text = document.get("text") or ""
    tables = []
    for page_index, page in enumerate(document.get("pages") or []):
        for table_index, table in enumerate(page.get("tables") or []):
            rows = []
            for row in table.get("body_rows") or []:
                cells = []
                for cell in row["cells"]:
                    start = cell.get("start") or 0
                    end = cell.get("end") or 0
                    cells.append(text[start:end].strip())
                rows.append(cells)
            tables.append({"page": page_index + 1, "table": table_index + 1, "rows": rows})
    return tables


def extract_elements(doc_id: str, chunk_idx: int, document: dict) -> list[dict]:
    """Flatten a chunk Document into Adobe-Extract-style element rows."""
    out = []
    for page in document.get("pages") or []:
        for t_idx, table in enumerate(page.get("tables") or []):
            body = table.get("body_rows") or []
            header = table.get("header_rows") or []
            n_cols = max(
                (len(r["cells"]) for r in (header + body)),
                default=0,
            )
            out.append(
                {
                    "doc_id": doc_id,
                    "path": "//Document/Sect/Table",
                    "page": chunk_idx,
                    "num_rows": len(body),
                    "num_cols": n_cols,
                }
            )
    n_text_lines = len((document.get("text") or "").split("\n")) if document.get("text") else 0
    if n_text_lines:
        out.append(
            {
                "doc_id": doc_id,
                "path": "//Document/Sect/P",
                "page": chunk_idx,
                "num_rows": n_text_lines,
                "num_cols": 0,
            }
        )
    for _ in document.get("media_refs") or []:
        out.append(
            {
                "doc_id": doc_id,
                "path": "//Document/Sect/Figure",
                "page": chunk_idx,
                "num_rows": 0,
                "num_cols": 0,
            }
        )
    return out
