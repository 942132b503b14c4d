"""Parquet compaction — rewrite a many-small-files dataset into
~target-size files (the OPTIMIZE/maintenance pass every table format
runs after streaming or per-partition checkpointed writes).

Why it exists here: the engine's resumable sinks
(`state/checkpoint.run_checkpointed`, `sampling.write_epoch_shards`)
deliberately write one file per partition/shard so a crashed run can
skip finished work — which after thousands of small increments leaves
a fragment layout whose per-file open/footer cost dominates reads.
Compaction is the complementary maintenance op: content-identical
rows, fewer right-sized files.

Scale design: file sizes come from parquet FOOTERS only; the rewrite
is one streaming read → ``repartition(n)`` → write (no driver
materialization). ``repartition`` without shuffle splits/coalesces
blocks in order. Output is atomic-by-directory: written to
``<out>.tmp-<pid>`` then renamed, so readers never observe a
half-compacted table and a crashed compaction leaves the source
untouched.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow.parquet as pq


def dataset_file_stats(path: str) -> tuple[list[str], int, int]:
    """(files, total_rows, total_byte_size) from footers only."""
    files = (
        sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if os.path.isdir(path)
        else [path]
    )
    rows = 0
    nbytes = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        for rg in range(md.num_row_groups):
            nbytes += md.row_group(rg).total_byte_size
    return files, rows, nbytes


def compact_parquet(
    in_path: str, out_dir: str, target_mb: int = 256
) -> dict[str, int]:
    """Rewrite ``in_path`` into ``out_dir`` as ≈``target_mb``-sized
    files. Returns {files_in, files_out, rows} for the caller's
    manifest. Content is row-identical (order may change across
    files — parquet carries no order contract; tests pin the sorted
    multiset)."""
    import ray.data as rd

    from ..pipelines._util import read_parquet_clean

    files, rows, nbytes = dataset_file_stats(in_path)
    n_out = max(1, round(nbytes / (target_mb * (1 << 20))))
    tmp = f"{out_dir.rstrip('/')}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        ds = read_parquet_clean(in_path)
        ds.repartition(n_out).write_parquet(tmp)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.rename(tmp, out_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out_files = glob.glob(os.path.join(out_dir, "*.parquet"))
    return {"files_in": len(files), "files_out": len(out_files), "rows": rows}
