"""Per-document reassembly (operators O8, O23-O26, O28) — one shuffle.

Two-level design chosen for 10^12-doc scale (SURVEY.md §4 skew row):

1. ``batch_combine`` — a *shuffle-free* map_batches pass that merges
   whatever chunk rows of the same document happen to co-reside in a
   batch (the combine is associative, so any subset may merge early).
   Single-chunk documents — the overwhelming common case — take a pure
   Arrow fast path (rename chunk_idx → chunk_lo, no Python per row).
   Multi-hundred-chunk outliers collapse to ≤ one row per source batch
   here, which is what defuses their skew before the exchange.

2. ``groupby('__bucket').map_groups(assemble_bucket)`` — the single
   all-to-all exchange, keyed by a stable hash bucket of ``doc_id``
   (NOT by doc_id itself): each group carries ~|docs|/num_buckets
   documents, so the per-group Python/Arrow overhead is amortized
   across a whole bucket while the in-bucket per-document work is the
   tiny ordered scan the reference semantics require
   (parseDocument.js:104-215). ``num_buckets`` scales with the
   cluster (default 256); a salted variant (hash(doc_id, chunk_lo//S))
   is unnecessary because step 1 already bounded per-doc row counts.

The shuffle carries ONLY derived service records and small scalars —
never span text (see stages/parse.py).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.document import finalize_servicos
from ..functions.header import null_header
from ..functions.spans import serialize_result
from ..functions.tipos import detect_tipo_from_flags, tipo_flags_norm
from ..schemas import OUTPUT_SCHEMA, SERVICO_STRUCT
from .parse import HEADER_STRUCT, compress_norm

NUM_BUCKETS = 256

PARTIAL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("__bucket", pa.int32()),
        ("chunk_lo", pa.int32()),
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


def _combine(rows: list[dict]) -> dict:
    """Associative merge of parsed/partial rows pre-sorted by chunk order."""
    servicos: list[dict] = []
    media_refs: list[str] = []
    numero = None
    estado = None
    bits = 0
    header = None
    all_blank = True
    norm_parts: list[str] = []
    for row in rows:
        servicos.extend(row["servicos"] or [])
        media_refs.extend(row["media_refs"] or [])
        if numero is None and row["numero"] is not None:
            numero = row["numero"]
        if estado is None and row["estado"] is not None:
            estado = row["estado"]
        bits |= row["tipo_bits"]
        if header is None and row["header"] is not None:
            header = row["header"]
        all_blank = all_blank and row["items_all_blank"]
        norm_parts.append(row["norm_comp"] or "")
    joined = "".join(norm_parts)
    bits |= tipo_flags_norm(joined)  # boundary-spanning matches at the junctions
    return {
        "servicos": servicos,
        "media_refs": media_refs,
        "numero": numero,
        "estado": estado,
        "tipo_bits": bits,
        "header": header,
        "items_all_blank": all_blank,
        "norm_comp": compress_norm(joined),
    }


def bucket_of(doc_id: str, num_buckets: int = NUM_BUCKETS) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) % num_buckets


def make_batch_combine(num_buckets: int = NUM_BUCKETS):
    """Build the shuffle-free pre-combine map_batches fn."""

    def batch_combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PARTIAL_SCHEMA.empty_table()
        si = pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("chunk_idx", "ascending")]
        )
        t = t.take(si)
        ids = t.column("doc_id").to_pylist()

        # run boundaries per doc
        starts = [0]
        for i in range(1, len(ids)):
            if ids[i] != ids[i - 1]:
                starts.append(i)
        starts.append(len(ids))

        single_idx: list[int] = []
        multi_rows: list[dict] = []
        multi_slices: list[tuple[int, int]] = []
        for a, b in zip(starts, starts[1:]):
            if b - a == 1:
                single_idx.append(a)
            else:
                multi_slices.append((a, b))

        parts = []
        if single_idx:
            fast = t.take(pa.array(single_idx, pa.int64()))
            buckets = pa.array(
                [bucket_of(d, num_buckets) for d in fast.column("doc_id").to_pylist()],
                pa.int32(),
            )
            fast = pa.table(
                {
                    "doc_id": fast["doc_id"],
                    "__bucket": buckets,
                    "chunk_lo": fast["chunk_idx"],
                    "servicos": fast["servicos"],
                    "numero": fast["numero"],
                    "estado": fast["estado"],
                    "tipo_bits": fast["tipo_bits"],
                    "norm_comp": fast["norm_comp"],
                    "header": fast["header"],
                    "media_refs": fast["media_refs"],
                    "items_all_blank": fast["items_all_blank"],
                },
                schema=PARTIAL_SCHEMA,
            )
            parts.append(fast)

        if multi_slices:
            for a, b in multi_slices:
                rows = t.slice(a, b - a).to_pylist()
                # CONTIGUITY INVARIANT: a doc's rows inside one batch
                # must form a consecutive chunk range — explode emits
                # dense chunk_idx in order and Ray blocks are contiguous
                # stream slices, so this holds unless an order-perturbing
                # op (repartition/random_shuffle) is inserted between
                # parse and combine. Merging a gapped range would create
                # false norm_comp adjacencies (spurious tipo needles)
                # and could mis-pick numero/estado, so fail loudly.
                # rows are already SORTED by chunk_idx (sort above), so
                # last-first+1 == count ⟺ consecutive and duplicate-free.
                chunk_ids = [r["chunk_idx"] for r in rows]
                if chunk_ids[-1] - chunk_ids[0] + 1 != len(chunk_ids):
                    raise AssertionError(
                        f"non-contiguous chunk run for doc {rows[0]['doc_id']!r}: "
                        f"{chunk_ids} — was an order-perturbing op inserted "
                        "between explode/parse and combine?"
                    )
                merged = _combine(rows)
                merged["doc_id"] = rows[0]["doc_id"]
                merged["__bucket"] = bucket_of(rows[0]["doc_id"], num_buckets)
                merged["chunk_lo"] = rows[0]["chunk_idx"]
                multi_rows.append(merged)
            parts.append(pa.Table.from_pylist(multi_rows, schema=PARTIAL_SCHEMA))

        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    return batch_combine


class BucketAssembler:
    """Per-bucket reducer: many documents per group, one Arrow table
    built per bucket (amortized), reference-ordered scans per document
    (parseDocument.js:104-236 + span serialization)."""

    def __init__(self, depara: dict):
        self.depara = depara

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return OUTPUT_SCHEMA.empty_table()
        si = pc.sort_indices(
            group, sort_keys=[("doc_id", "ascending"), ("chunk_lo", "ascending")]
        )
        rows = group.take(si).to_pylist()

        out_rows = []
        i = 0
        n = len(rows)
        tipos = self.depara["listaTiposOriginal"]
        while i < n:
            j = i
            doc_id = rows[i]["doc_id"]
            while j < n and rows[j]["doc_id"] == doc_id:
                j += 1
            merged = _combine(rows[i:j])
            i = j

            servicos = finalize_servicos(merged["servicos"])
            header = merged["header"] or null_header()
            tipo = detect_tipo_from_flags(merged["tipo_bits"], tipos)
            result = {
                "NumerodaCertidao": merged["numero"],
                "ObjetodaCertidao": header.get("ObjetodaCertidao"),
                "TipodaCertidao": tipo,
                "QualificacaoObra": header.get("QualificacaoObra"),
                "QualificacaoEspecifica": header.get("QualificacaoEspecifica"),
                "NiveldeAtividade": header.get("NiveldeAtividade"),
                "Estado": merged["estado"],
                "Servicos": servicos,
            }
            out_spans = serialize_result(result, merged["media_refs"])
            out_rows.append({"doc_id": doc_id, **result, "spans": out_spans})

        return pa.Table.from_pylist(out_rows, schema=OUTPUT_SCHEMA)
