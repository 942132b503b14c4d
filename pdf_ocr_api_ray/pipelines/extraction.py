"""The flagship extraction DAG (SURVEY.md §3.1 re-expressed Ray-Data-first).

    read (parquet/lance spans table)
      → map_batches(explode_batch)                 stateless fan-out (O6)
      → map_batches(ChunkParser, actor pool)       OCR+parse per chunk (O7-O22)
      → add salt column                            chunk_idx // SALT_SPAN
      → groupby(doc_id, salt).map_groups           partial combine (skew defuse)
      → groupby(doc_id).map_groups(FinalAssembler) ordered scans + assembly
      → (caller) write_parquet / iter_batches

Exactly one logical all-to-all exchange family (the two groupbys over
the same key prefix); raw span text never crosses it — only derived
service records and small scalars (stages/parse.py docstring).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from ..functions.depara import default_depara
from ..stages.assemble import SALT_SPAN, FinalAssembler, partial_combine
from ..stages.explode import explode_batch
from ..stages.parse import ChunkParser

if TYPE_CHECKING:
    import ray.data


def _default_parallelism() -> int:
    import ray

    if ray.is_initialized():
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    return 8


def build_extraction(
    ds: "ray.data.Dataset",
    depara: dict | None = None,
    *,
    parse_concurrency: int | tuple[int, int] | None = None,
    parse_batch_size: int = 64,
    salt_span: int = SALT_SPAN,
) -> "ray.data.Dataset":
    """Compose the extraction DAG over an input Dataset of spans rows."""
    import pyarrow.compute as pc

    depara = depara or default_depara()
    if parse_concurrency is None:
        parse_concurrency = (1, _default_parallelism())

    chunks = ds.map_batches(explode_batch, batch_format="pyarrow")
    parsed = chunks.map_batches(
        ChunkParser,
        fn_constructor_kwargs={"depara": depara},
        batch_format="pyarrow",
        batch_size=parse_batch_size,
        concurrency=parse_concurrency,
        num_cpus=1,
    )
    salted = parsed.map_batches(
        lambda t: t.append_column(
            "salt", pc.cast(pc.divide(t["chunk_idx"], salt_span), "int32")
        ),
        batch_format="pyarrow",
    )
    partials = salted.groupby(["doc_id", "salt"]).map_groups(
        partial_combine, batch_format="pyarrow"
    )
    assembler = FinalAssembler(depara)

    def final_assemble(group):
        return assembler(group)

    return partials.groupby("doc_id").map_groups(final_assemble, batch_format="pyarrow")


def run_extraction_on_parquet(
    input_path: str,
    depara: dict | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """Read a spans table from parquet and build the extraction DAG."""
    import ray.data as rd

    ds = rd.read_parquet(input_path)
    return build_extraction(ds, depara, **kwargs)
