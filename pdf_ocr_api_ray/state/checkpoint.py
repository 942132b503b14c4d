"""Per-partition checkpointed extraction runs (north_rule resumability).

The reference is all-or-nothing: a thrown error fails the whole job and
restarts lose every in-memory job (server.cjs:80-92, jobs.js:1-55).
Here a run is partitioned by a stable content hash of ``doc_id``; each
partition executes as its own bounded Dataset pipeline and lands
atomically (write to a temp dir, rename) under ``out_dir/part=N/``,
with one manifest line per completed partition carrying lineage
(input path, partition spec) and per-partition metrics (docs, wall
seconds, docs/sec). A resumed run reads the manifest and skips
completed partitions — the anti-join against the completed set.

Partition granularity is the resume unit: at 10^12 docs you pick
num_partitions so one partition ≈ minutes of work; a retry never
repeats more than that.
"""

from __future__ import annotations

import json
import os
import time
import zlib


def partition_of(doc_id: str, num_partitions: int) -> int:
    """Stable, process-independent partition assignment."""
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def completed_partitions(out_dir: str) -> set[int]:
    path = _manifest_path(out_dir)
    done: set[int] = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    done.add(json.loads(line)["partition"])
    return done


def run_checkpointed(
    input_path: str,
    out_dir: str,
    num_partitions: int = 8,
    depara: dict | None = None,
    max_partitions: int | None = None,
    **pipeline_kwargs,
) -> dict:
    """Run (or resume) the extraction over ``input_path``.

    ``max_partitions`` limits how many pending partitions this call
    processes (used by the kill-and-resume test to simulate a crash).
    Returns a summary dict {completed, skipped, processed}.
    """
    import pyarrow as pa
    import ray.data as rd

    from ..pipelines.extraction import build_extraction

    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    processed = []

    for p in range(num_partitions):
        if p in done:
            continue
        if max_partitions is not None and len(processed) >= max_partitions:
            break

        t0 = time.time()
        ds = rd.read_parquet(input_path)

        def keep_partition(t: pa.Table, _p: int = p) -> pa.Table:
            mask = [
                partition_of(d, num_partitions) == _p
                for d in t.column("doc_id").to_pylist()
            ]
            return t.filter(pa.array(mask))

        part_ds = ds.map_batches(keep_partition, batch_format="pyarrow")
        out = build_extraction(part_ds, depara, **pipeline_kwargs)

        final_dir = os.path.join(out_dir, f"part={p}")
        tmp_dir = final_dir + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        out.write_parquet(tmp_dir)
        n_docs = sum(1 for _ in open_part_rows(tmp_dir))
        os.rename(tmp_dir, final_dir)

        wall = time.time() - t0
        with open(_manifest_path(out_dir), "a") as f:
            f.write(
                json.dumps(
                    {
                        "partition": p,
                        "input_path": input_path,
                        "num_partitions": num_partitions,
                        "n_docs": n_docs,
                        "wall_s": round(wall, 3),
                        "docs_per_s": round(n_docs / wall, 2) if wall > 0 else None,
                        "completed_at": time.time(),
                    }
                )
                + "\n"
            )
        processed.append(p)

    return {
        "completed": sorted(done | set(processed)),
        "skipped": sorted(done),
        "processed": processed,
    }


def open_part_rows(part_dir: str):
    """Iterate doc_ids of a written partition (for counting/validation)."""
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(part_dir)):
        if name.endswith(".parquet"):
            t = pq.read_table(os.path.join(part_dir, name), columns=["doc_id"])
            yield from t.column("doc_id").to_pylist()


def read_output(out_dir: str):
    """Read the full (completed) output as one Arrow table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = []
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if name.startswith("part=") and os.path.isdir(path):
            for f in sorted(os.listdir(path)):
                if f.endswith(".parquet"):
                    tables.append(pq.read_table(os.path.join(path, f)))
    return pa.concat_tables(tables) if tables else None
