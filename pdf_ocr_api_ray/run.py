"""Job entry point for ``ray job submit`` / standalone runs.

    python -m pdf_ocr_api_ray.run \
        --input /path/to/spans_parquet \
        --out /tmp/extraction_out \
        --num-partitions 16 [--resume] [--num-cpus 32]

Runs the checkpointed extraction (per-partition manifest + atomic
renames; a re-invocation with the same --out resumes, skipping
completed partitions — state/checkpoint.py). This owns its Ray session
(guarded init) — the driver-contract module never does.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="spans table (parquet file/dir)")
    parser.add_argument("--out", required=True, help="output directory (resumable)")
    parser.add_argument("--num-partitions", type=int, default=16)
    parser.add_argument("--num-cpus", type=int, default=None)
    parser.add_argument("--num-buckets", type=int, default=None)
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        init_kwargs = dict(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if args.num_cpus:
            init_kwargs["num_cpus"] = args.num_cpus
        ray.init(**init_kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .state.checkpoint import run_checkpointed

    pipeline_kwargs = {}
    if args.num_buckets:
        pipeline_kwargs["num_buckets"] = args.num_buckets

    t0 = time.time()
    summary = run_checkpointed(
        args.input, args.out, num_partitions=args.num_partitions, **pipeline_kwargs
    )
    summary["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
