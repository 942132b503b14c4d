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
    """Partitions recorded as DONE; error lines (status='error') are
    retried on resume — the reference's per-job error status analogue
    (server.cjs:86-92), but at partition granularity and retryable."""
    return {rec["partition"] for rec in _done_records(out_dir)}


def _done_records(out_dir: str) -> list[dict]:
    path = _manifest_path(out_dir)
    out: list[dict] = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("status", "done") == "done":
                    out.append(rec)
    return out


def _validate_resume(
    out_dir: str,
    input_path: str,
    num_partitions: int,
    shards: list[str] | None,
    listing: list[str],
) -> None:
    """Fail fast when a resume doesn't match what the manifest recorded.

    Skipping a partition is only sound if the partition FUNCTION is
    unchanged: same num_partitions, same input, same partitioning MODE
    (shard-ownership vs doc-id-hash fallback — in BOTH directions: a
    fallback-completed partition resumed in shard mode would silently
    re-key ownership just as the reverse would), and the same input
    file listing (growth of a fallback-mode input directory silently
    adds documents that hash into already-skipped partitions). A
    changed spec must use a fresh out_dir."""
    mode = "shards" if shards is not None else "hash"
    for rec in _done_records(out_dir):
        if rec.get("num_partitions") not in (None, num_partitions):
            raise ValueError(
                f"resume mismatch: manifest recorded num_partitions="
                f"{rec.get('num_partitions')} but this run uses {num_partitions}; "
                f"use a fresh out_dir (completed partitions would be re-keyed)"
            )
        if rec.get("input_path") not in (None, input_path):
            raise ValueError(
                f"resume mismatch: manifest recorded input_path="
                f"{rec.get('input_path')!r} but this run reads {input_path!r}; "
                f"use a fresh out_dir"
            )
        # pre-r3 manifests carry no mode/listing — infer mode from the
        # shards field so old checkpoints keep their (weaker) guarantees
        rec_mode = rec.get("mode") or ("shards" if rec.get("shards") is not None else None)
        if rec_mode is not None and rec_mode != mode:
            disp = {"shards": "sharded", "hash": "doc-id-hash"}
            raise ValueError(
                f"resume mismatch: partition {rec['partition']} was completed in "
                f"{disp.get(rec_mode, rec_mode)} mode but this run uses "
                f"{disp.get(mode, mode)} mode (input shard count crossed "
                "num_partitions?); completed partitions would cover a different "
                "document set — use a fresh out_dir"
            )
        rec_shards = rec.get("shards")
        if rec_shards is not None and shards is not None:
            p = rec["partition"]
            cur = shards[p :: num_partitions]
            if rec_shards != cur:
                raise ValueError(
                    f"resume mismatch: partition {p} previously owned shards "
                    f"{rec_shards} but the input directory now yields {cur} "
                    f"(shards added/removed/renamed); use a fresh out_dir"
                )
        rec_listing = rec.get("listing")
        if rec_listing is not None and rec_listing != listing:
            raise ValueError(
                f"resume mismatch: partition {rec['partition']} was completed "
                f"against input listing {rec_listing} but the input now yields "
                f"{listing} (files added/removed/renamed — in doc-id-hash mode "
                "new files hash documents into already-completed partitions); "
                "use a fresh out_dir"
            )


def _stage_metrics(ds) -> dict:
    """Compact per-stage metrics parsed from ds.stats(): wall seconds
    and total remote-task seconds per operator (the north_rule's
    per-stage metrics sidecar — pages/sec derives from these + counts)."""
    import re as _re

    metrics: dict[str, dict] = {}
    current = None
    try:
        for line in ds.stats().splitlines():
            m = _re.match(r"Operator (\d+) (\S+).*?in ([\d.]+)s", line)
            if m:
                current = f"{m.group(1)}:{m.group(2)[:60]}"
                metrics[current] = {"wall_s": float(m.group(3))}
                continue
            m = _re.match(r"Operator (\d+) (\S+)", line)
            if m and line.startswith("Operator"):
                current = f"{m.group(1)}:{m.group(2)[:60]}"
                metrics.setdefault(current, {})
                continue
            if current and "Remote wall time" in line:
                t = _re.search(r"([\d.]+)(us|ms|s) total", line)
                if t:
                    val = float(t.group(1))
                    scale = {"us": 1e-6, "ms": 1e-3, "s": 1.0}[t.group(2)]
                    metrics[current]["remote_total_s"] = round(
                        metrics[current].get("remote_total_s", 0.0) + val * scale, 3
                    )
    except Exception:
        pass  # metrics are best-effort; never fail the partition for them
    return metrics


def _input_shards(input_path: str) -> list[str] | None:
    """Parquet files of a sharded input directory (None for one file)."""
    if not os.path.isdir(input_path):
        return None
    files = sorted(
        os.path.join(input_path, f)
        for f in os.listdir(input_path)
        if f.endswith(".parquet")
    )
    return files or None


def run_checkpointed(
    input_path: str,
    out_dir: str,
    num_partitions: int = 8,
    depara: dict | None = None,
    max_partitions: int | None = None,
    **pipeline_kwargs,
) -> dict:
    """Run (or resume) the extraction over ``input_path``.

    Partitioning strategy (the resume unit and the read-pruning unit):
    - sharded input directory with ≥ num_partitions files → partition
      p owns files [p::num_partitions] and READS ONLY THOSE — a resumed
      run never re-scans completed shards (the "one directory per input
      shard" layout the output also uses);
    - single file / few shards → fallback to hashing doc_id per row
      (every partition scans the input but keeps only its rows).

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
    shards = _input_shards(input_path)
    use_shards = shards is not None and len(shards) >= num_partitions
    # the full input listing is recorded in EVERY done record (also in
    # hash-fallback mode, where per-partition shard ownership doesn't
    # exist) so resume can detect input growth/shrink in any mode
    listing = shards if shards is not None else [input_path]
    _validate_resume(
        out_dir, input_path, num_partitions, shards if use_shards else None, listing
    )

    for p in range(num_partitions):
        if p in done:
            continue
        if max_partitions is not None and len(processed) >= max_partitions:
            break

        t0 = time.time()

        def validate(t: pa.Table) -> pa.Table:
            # input validation (the reference 400s jobs without an id,
            # server.cjs:45-51): null/empty doc_id rows are quarantined
            mask = [d is not None and d != "" for d in t.column("doc_id").to_pylist()]
            return t.filter(pa.array(mask))

        if use_shards:
            part_files = shards[p::num_partitions]
            ds = rd.read_parquet(part_files)
            part_ds = ds.map_batches(validate, batch_format="pyarrow")
        else:
            ds = rd.read_parquet(input_path)

            def keep_partition(t: pa.Table, _p: int = p) -> pa.Table:
                t = validate(t)
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
        try:
            out.write_parquet(tmp_dir)
            # an empty partition writes no files (and possibly no dir);
            # it is still DONE — materialize the empty dir so the
            # rename/manifest flow is uniform
            os.makedirs(tmp_dir, exist_ok=True)
            n_docs = sum(1 for _ in open_part_rows(tmp_dir))
            os.rename(tmp_dir, final_dir)
        except Exception as exc:  # record and continue — retried on resume
            with open(_manifest_path(out_dir), "a") as f:
                f.write(
                    json.dumps(
                        {
                            "partition": p,
                            "status": "error",
                            "input_path": input_path,
                            "error": f"{type(exc).__name__}: {exc}"[:500],
                            "at": time.time(),
                        }
                    )
                    + "\n"
                )
            continue

        wall = time.time() - t0
        with open(_manifest_path(out_dir), "a") as f:
            f.write(
                json.dumps(
                    {
                        "partition": p,
                        "status": "done",
                        "input_path": input_path,
                        "num_partitions": num_partitions,
                        "mode": "shards" if use_shards else "hash",
                        "listing": listing,
                        "shards": shards[p::num_partitions] if use_shards else None,
                        "n_docs": n_docs,
                        "wall_s": round(wall, 3),
                        "docs_per_s": round(n_docs / wall, 2) if wall > 0 else None,
                        "stages": _stage_metrics(out),
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
