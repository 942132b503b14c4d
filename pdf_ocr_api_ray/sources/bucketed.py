"""Key-bucketed parquet layout — shuffle ONCE, reuse across queries.

The brief's partitioning rule ("pick ONE partitioning key and reuse it
across stages") materialized as a storage layout: ``write_bucketed``
pays one keyed exchange to land every row of a key in exactly one
``bucket=NNNNN`` directory (atomic tmp→rename per bucket, manifest
lineage, resume skips complete buckets — the write_epoch_shards
discipline), and every downstream per-key operator then runs with
ZERO exchange by mapping over bucket files: ``sessionize_bucketed``
demonstrates the contract, bit-equal to the exchange-based
``events.sessionize`` (tests/test_bucketed.py).

The read side is the file-driven pattern: a Dataset OF BUCKET PATHS
(``from_items``) mapped with ``batch_size=1`` — each task owns exactly
one bucket file, so per-key kernels see every row of their keys
without any co-location step. At 100 TB this is the difference between
paying the all-to-all once at ingest and paying it in every one of the
dozens of per-user/per-domain queries that follow.

The manifest pins (key, num_buckets, mod scheme); ``read_bucketed``
refuses a layout whose parameters drift from what the caller expects —
the neardup-index parameter-drift discipline.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd

from ..pipelines._util import read_parquet_clean

MANIFEST = "bucketed_manifest.json"


def write_bucketed(
    sf_dir: str,
    out_dir: str,
    table: str = "events",
    key: str = "user_id",
    num_buckets: int = 64,
    columns: list | None = None,
):
    """Land ``table`` hash-bucketed by ``key`` (int64) under
    ``out_dir/bucket=NNNNN/part.parquet``. One keyed exchange total;
    per-bucket writes are atomic and a re-run skips complete buckets
    (membership is a pure function of the key — resume-stable).
    Returns the per-bucket summary frame."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")

    ds = read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (
            df[key].astype("int64").to_numpy() % num_buckets
        ).astype(np.int32)
        return df

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["__bucket"].iloc[0])
        final_dir = os.path.join(out_dir, f"bucket={b:05d}")
        if os.path.exists(final_dir):  # completed by an earlier run
            return pd.DataFrame(
                {"bucket": [b], "n_rows": [len(group)], "status": ["skipped"],
                 "wall_s": [0.0]}
            )
        t0 = time.time()
        g = group.drop(columns=["__bucket"]).sort_values(
            list(group.columns.drop("__bucket")), ignore_index=True
        )
        tmp_dir = final_dir + ".tmp"
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g, preserve_index=False),
            os.path.join(tmp_dir, "part.parquet"),
        )
        try:
            os.rename(tmp_dir, final_dir)
        except OSError:
            # lost a speculative-retry rename race: bucket content is a
            # pure function of its members, the winner's bytes match
            if not os.path.exists(final_dir):
                raise
            return pd.DataFrame(
                {"bucket": [b], "n_rows": [len(g)], "status": ["skipped"],
                 "wall_s": [0.0]}
            )
        return pd.DataFrame(
            {"bucket": [b], "n_rows": [len(g)], "status": ["written"],
             "wall_s": [round(time.time() - t0, 3)]}
        )

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, MANIFEST)
    spec = {"table": table, "key": key, "num_buckets": num_buckets, "scheme": "mod"}
    if os.path.exists(manifest_path):
        prior = json.load(open(manifest_path))
        if {k: prior[k] for k in spec} != spec:
            raise ValueError(
                f"bucketed layout drift: existing {prior} vs requested {spec}"
            )
    summary = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()  # bucket-bounded: ≤ num_buckets summary rows
    )
    json.dump({**spec, "at": time.time()}, open(manifest_path, "w"))
    return summary.sort_values("bucket", ignore_index=True)


def bucket_files(out_dir: str, key: str, num_buckets: int | None = None) -> list:
    """Validated bucket-file listing; refuses parameter drift."""
    manifest_path = os.path.join(out_dir, MANIFEST)
    spec = json.load(open(manifest_path))
    if spec["key"] != key or (
        num_buckets is not None and spec["num_buckets"] != num_buckets
    ):
        raise ValueError(f"bucketed layout drift: {spec} vs key={key}/{num_buckets}")
    files = sorted(
        os.path.join(out_dir, d, "part.parquet")
        for d in os.listdir(out_dir)
        if d.startswith("bucket=")
    )
    return files


def map_buckets(out_dir: str, key: str, kernel, columns: list | None = None):
    """Run a per-key-complete kernel over every bucket with ZERO
    exchange: a Dataset of bucket paths, ``batch_size=1`` — one task
    per bucket file, each kernel call sees every row of its keys."""
    import pyarrow.parquet as pq
    import ray.data as rd

    files = bucket_files(out_dir, key)

    def run_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = [
            kernel(pq.read_table(p, columns=columns).to_pandas()) for p in df["path"]
        ]
        return pd.concat(frames, ignore_index=True)

    return rd.from_items([{"path": p} for p in files]).map_batches(
        run_bucket, batch_format="pandas", batch_size=1
    )


def sessionize_bucketed(out_dir: str):
    """``events.sessionize`` over a user-bucketed layout — the kernel
    is identical; the exchange is GONE (paid once at write time)."""
    from ..pipelines.events import sessions_kernel

    return map_buckets(
        out_dir, key="user_id", kernel=sessions_kernel,
        columns=["user_id", "ts", "event_id"],
    )


def transitions_bucketed(out_dir: str):
    """``events.event_transitions`` over a user-bucketed layout — the
    second consumer that amortizes the one write-time exchange: the
    shared pair kernel runs per bucket file (zero exchange), and the
    T²-bounded partials merge driver-side through the shared
    quantized-probability finish."""
    from ..pipelines.events import transition_pairs_kernel, transitions_finish

    partials = map_buckets(
        out_dir, key="user_id", kernel=transition_pairs_kernel,
        columns=["user_id", "ts", "event_id", "event_type"],
    ).to_pandas()  # T²-per-bucket bounded: ≤ buckets·T² rows
    merged = partials.groupby(["prev_type", "next_type"], as_index=False)["n"].sum()
    return transitions_finish(merged)
