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
from ..stages.assemble import NUM_BUCKETS, BucketAssembler, make_batch_combine
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
    parse_num_cpus: float = 1,
    parse_num_gpus: float = 0,
    num_buckets: int = NUM_BUCKETS,
    header_client_factory=None,
    parse_retry=None,
) -> "ray.data.Dataset":
    """Compose the extraction DAG over an input Dataset of spans rows.

    Input rows must have unique ``doc_id`` (the identity; duplicate ids
    merge into one document, like replayed job ids in the reference).

    ``header_client_factory`` / ``parse_retry`` inject a real header
    extraction endpoint (the reference's OpenAI client) + its
    retry/timeout policy into the parse stage per stages/clients.py.
    """
    depara = depara or default_depara()

    chunks = ds.map_batches(explode_batch, batch_format="pyarrow")
    if parse_concurrency is None:
        # default: stateless TASKS. The deterministic OCR stand-in's only
        # state is module-level compiled regexes (warm per worker
        # process), so an actor pool buys nothing and costs real money:
        # a fixed pool reserves CPUs for the whole operator lifetime
        # (starving read/combine/write) and pays actor-startup ramp every
        # run — measured ~8s/22s of the sf0.1 bench. A REAL model-backed
        # OCR stage (weights loaded in __init__) should pass
        # parse_concurrency=N to get the actor pool.
        parser = ChunkParser(
            depara, header_client_factory=header_client_factory, retry=parse_retry
        )

        def parse_chunks(t):
            return parser(t)

        parsed = chunks.map_batches(
            parse_chunks,
            batch_format="pyarrow",
            batch_size=parse_batch_size,
            # transient faults (a real OCR backend timing out) retry the
            # task instead of failing the run; the stage is pure so
            # retries are safe (SURVEY.md §4 stragglers/retries row)
            max_retries=3,
            retry_exceptions=True,
        )
    else:
        # actor-pool path for model-backed OCR/layout stages: weights
        # load once per actor; num_gpus>0 makes Ray schedule the pool on
        # GPU nodes (fractional values pack several actors per device)
        remote_args = {"num_cpus": parse_num_cpus}
        if parse_num_gpus:
            remote_args["num_gpus"] = parse_num_gpus
        parsed = chunks.map_batches(
            ChunkParser,
            fn_constructor_kwargs={
                "depara": depara,
                "header_client_factory": header_client_factory,
                "retry": parse_retry,
            },
            batch_format="pyarrow",
            batch_size=parse_batch_size,
            concurrency=parse_concurrency,
            max_task_retries=3,  # actor-task retry on actor failure
            **remote_args,
        )
    partials = parsed.map_batches(make_batch_combine(num_buckets), batch_format="pyarrow")
    assembler = BucketAssembler(depara)

    def assemble_bucket(group):
        return assembler(group)

    return partials.groupby("__bucket").map_groups(assemble_bucket, batch_format="pyarrow")


def run_extraction_on_parquet(
    input_path: str,
    depara: dict | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """Read a spans table from parquet and build the extraction DAG."""
    import ray.data as rd

    ds = rd.read_parquet(input_path)
    return build_extraction(ds, depara, **kwargs)
