"""pdf_ocr_api_ray — a Ray-Data-native document-extraction engine.

A from-scratch re-implementation of the *semantics* of
devadambruno/pdf-ocr-api (reference snapshot at /root/reference) as a
streaming Ray Data DAG over zero-copy Arrow batches:

- input: a columnar table of interleaved text+media documents
  ``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
- page-chunk fan-out (``flat_map``-style explode), deterministic OCR/layout
  actor pool, per-chunk service parsing (three fallback tiers), salted
  ``groupby(doc_id)`` reassembly with ordered per-document scans
  (auto-numbering, category forward-fill), boilerplate filtering, and
  final span re-serialization.

Correctness is pinned by span-sequence equality (kind, text, media_ref,
order) against a straight-line Python oracle (``pdf_ocr_api_ray.oracle``)
that transcribes the reference's control flow exactly.
"""

__version__ = "0.1.0"
