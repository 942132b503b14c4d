"""Chunk OCR + parse actor stage (operators O7, O9-O22 fused per chunk).

One actor-pool ``map_batches`` stage that, per chunk row:
- re-materializes the chunk Document (the deterministic OCR/layout
  stand-in, functions/ocr.py — the reference's Document AI call,
  worker/processJob.js:74-87),
- parses service records through the 3-tier fallback
  (parser/parseServices.js — per chunk, like the reference's per-proto
  flatMap at parseDocument.js:95-97),
- extracts the header fields for chunk 0 only (parseDocument.js:63-78,
  8,000-char cap at gpt/extractHeader.js:23),
- pre-reduces every doc-level scalar the reassembly needs, so the
  groupby(doc_id) shuffle moves ONLY derived records and tiny scalars,
  never chunk text (the scale-critical design point: at 10^12 docs the
  raw text never crosses the exchange):
    * first numero / estado match in the chunk (these regexes cannot
      span the '\\n' chunk joints — \\d and \\b can't cross a newline —
      so the doc-level first match = first chunk with a match),
    * certificate-type flags as a bitmask over the chunk's normalized
      text PLUS a compressed normalized string (≤24-char head + '\\x00'
      + ≤24-char tail) so boundary-spanning matches (normalization
      strips the joints) are still found exactly for needles ≤ 25 chars
      (longest needle: ACERVOOPERACIONAL, 17),
    * the per-chunk "all items blank" predicate (AND-reducible; feeds
      the whole-doc auto-numbering gate, parseDocument.js:104-106),
    * ordered media_ref pass-through.

The depara dimension tables ride in the actor constructor
(``fn_constructor_kwargs``) — broadcast-small-side semantics, like the
reference shipping them per request (server.cjs:38-42) but shipped once
per actor instead of once per job.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.document import first_estado, first_numero
from ..functions.header import extract_header
from ..functions.ocr import spans_to_document
from ..functions.services import parse_services
from ..functions.textnorm import normalize_alnum
from ..functions.tipos import tipo_flags_norm
from ..schemas import SERVICO_STRUCT
from .clients import RetryPolicy, call_with_retry

HEADER_STRUCT = pa.struct(
    [
        ("TipodaCertidao", pa.int32()),
        ("NiveldeAtividade", pa.int32()),
        ("QualificacaoObra", pa.int32()),
        ("QualificacaoEspecifica", pa.int32()),
        ("ObjetodaCertidao", pa.string()),
    ]
)

PARSED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_idx", pa.int32()),
        ("servicos", pa.list_(SERVICO_STRUCT)),
        ("numero", pa.string()),
        ("estado", pa.string()),
        ("tipo_bits", pa.int32()),
        ("norm_comp", pa.string()),
        ("header", HEADER_STRUCT),
        ("media_refs", pa.list_(pa.string())),
        ("items_all_blank", pa.bool_()),
    ]
)

_COMP_EDGE = 24


def compress_norm(norm: str) -> str:
    """Keep exact boundary-matching power with bounded size: short strings
    pass through; long ones keep head+tail with an inert separator."""
    if len(norm) <= 2 * _COMP_EDGE:
        return norm
    return norm[:_COMP_EDGE] + "\x00" + norm[-_COMP_EDGE:]


class DefaultHeaderClient:
    """The deterministic stand-in for the reference's OpenAI header
    extractor (gpt/extractHeader.js:7-9 builds the client once per
    process; :23 caps the prompt at 8,000 chars — the cap lives in
    extract_header). A real LLM endpoint implements the same surface:
    construct once, ``extract(text, depara, timeout_s=) -> header
    dict | None`` per chunk-0."""

    def extract(self, text: str, depara: dict, timeout_s: float | None = None):
        return extract_header(text, depara)


class ChunkParser:
    """Callable actor: chunk rows → parsed rows. Dimension tables and any
    model/client state are built once per actor (the reference's
    module-level singleton clients, processJob.js:12-17). The header
    extractor — the stage's external-model call — is injected via
    ``header_client_factory`` + ``retry`` (stages/clients.py): a real
    GPT/OCR endpoint with timeouts is a constructor kwarg through
    ``fn_constructor_kwargs``, never an engine edit."""

    def __init__(self, depara: dict, header_client_factory=None, retry=None):
        self.depara = depara
        self.header_client = (header_client_factory or DefaultHeaderClient)()
        self.retry = retry or RetryPolicy()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = []
        for row in rows:
            doc = spans_to_document(row["spans"] or [])
            text = doc["text"]
            servicos = parse_services(doc, self.depara)
            norm = normalize_alnum(text)
            header = None
            if row["chunk_idx"] == 0:
                header = call_with_retry(
                    self.header_client.extract,
                    self.retry,
                    text,
                    self.depara,
                    timeout_s=self.retry.timeout_s,
                )
            out.append(
                {
                    "doc_id": row["doc_id"],
                    "chunk_idx": row["chunk_idx"],
                    "servicos": servicos,
                    "numero": first_numero(text),
                    "estado": first_estado(text),
                    "tipo_bits": tipo_flags_norm(norm),
                    "norm_comp": compress_norm(norm),
                    "header": header,
                    "media_refs": doc["media_refs"],
                    "items_all_blank": all(
                        s["Item"] is None or str(s["Item"]).strip() == "" for s in servicos
                    ),
                }
            )
        return pa.Table.from_pylist(out, schema=PARSED_SCHEMA)
