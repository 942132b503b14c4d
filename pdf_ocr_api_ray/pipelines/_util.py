"""Shared helpers for the query pipelines.

Rounding: numpy/pandas round half-to-even; DuckDB's ``round(DOUBLE)``
rounds half away from zero (``std::round``). Exactly-representable
halves (dyadic ratios like 137/32 = 4.28125) therefore differ by one
ulp of the last digit. Every float column we emit for oracle comparison
uses half-away-from-zero to match the SQL semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def read_parquet_clean(path: str, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with the file's pandas metadata
    stripped from the schema. The driver-written testdata parquet
    carries a ``pandas`` metadata dict, and a ``pa.Schema`` holding a
    dict is unhashable — every block then fails Ray's schema
    deduplication ("Failed to hash the schemas…" log spam) and can
    mask a real schema drift. Passing the metadata-free schema makes
    block schemas identical and hashable."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    # accept rd.read_parquet's LOCAL path forms: a single file, a
    # sharded directory (flat or nested/hive layout), or a list of
    # either — the schema comes from the first fragment found
    # (pq.read_schema only handles a lone file). Remote URIs are out of
    # scope for this sandbox engine.
    first = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(first):
        frag = None
        for root, dirs, files in os.walk(first):
            dirs.sort()
            hits = sorted(f for f in files if f.endswith(".parquet"))
            if hits:
                frag = os.path.join(root, hits[0])
                break
        if frag is None:
            raise FileNotFoundError(f"no .parquet fragments under {first!r}")
        first = frag
    schema = pq.read_schema(first).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)


def distinct_pairs(ds, keep_min: str | None = None, num_buckets: int = 256):
    """Hash-bucketed vectorized distinct over (id_a, id_b) pair rows —
    the engine's standard alternative to a per-pair-key aggregate
    (which pays per-key Python over |pairs| keys; measured minutes vs
    seconds under mass duplication). ``keep_min`` keeps the row with
    the smallest value of that column per pair (e.g. min hamming)."""

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pb"] = (
            (
                df["id_a"].to_numpy(np.uint64) * np.uint64(0x9E3779B9)
                + df["id_b"].to_numpy(np.uint64)
            )
            % num_buckets
        ).astype(np.int32)
        return df

    cols = ["id_a", "id_b"] + ([keep_min] if keep_min else [])

    def distinct_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(cols)
        return g.drop_duplicates(["id_a", "id_b"])[cols]

    return (
        ds.map_batches(add_pb, batch_format="pandas")
        .groupby("pb")
        .map_groups(distinct_bucket, batch_format="pandas")
    )


def clamped_join_partitions(requested: int) -> int:
    """``Dataset.join`` partition count bounded by cluster CPUs: join
    aggregator actors hold slots for the whole exchange, and more
    partitions than CPUs starves/deadlocks a small (e.g. 4-CPU local)
    cluster — measured. On a real cluster the requested count stands."""
    import ray

    try:
        total_cpus = int(ray.cluster_resources().get("CPU", requested))
    except Exception:
        total_cpus = requested
    return max(2, min(requested, total_cpus))


def round_half_away(s: pd.Series, ndigits: int) -> pd.Series:
    f = 10.0**ndigits
    arr = s.to_numpy(dtype=np.float64)
    return pd.Series(np.sign(arr) * np.floor(np.abs(arr) * f + 0.5) / f, index=s.index)


def round_cols_arrow(ds, cols: dict[str, int]):
    """Round the given Dataset columns (Arrow path, half away from zero)."""

    def fn(t: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            t = t.set_column(
                t.schema.get_field_index(c),
                c,
                pc.round(t[c], ndigits=nd, round_mode="half_towards_infinity"),
            )
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def elementwise_fold(ds, per_batch, combine, dtype, shape):
    """In-cluster elementwise reduction of a fixed-shape numpy array
    derived per batch — the bounded-metadata fold for sketch merges
    (HLL register max, count-min cell sums, bucket-count sums).

    ``per_batch(batch_df) -> np.ndarray`` of ``(dtype, shape)``; arrays
    travel as single-row byte blobs and reduce with the associative
    ``combine`` (e.g. ``np.maximum``, ``np.add``) through a 32-way then
    single-block fold — the driver receives ONE row no matter the block
    count. Measured motivation: Ray-native shapes for this pass
    (keyed groupby over ≤4k metadata rows, or ``Dataset.sum`` over
    hundreds of columns) each cost 7-8 s of fixed aggregator ramp at
    sf0.1; this fold is scan-dominated.

    Returns the reduced array (zeros if the dataset is empty)."""

    def blob_row(df: pd.DataFrame) -> pd.DataFrame:
        arr = np.ascontiguousarray(per_batch(df), dtype=dtype)
        return pd.DataFrame({"blob": [arr.tobytes()]})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        acc = None
        for b in df["blob"]:
            a = np.frombuffer(b, dtype=dtype).reshape(shape)
            acc = a.copy() if acc is None else combine(acc, a)
        return pd.DataFrame({"blob": [acc.tobytes()]})

    out = (
        ds.map_batches(blob_row, batch_format="pandas")
        .repartition(32)
        .map_batches(fold, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
        .to_pandas()
    )
    if not len(out) or "blob" not in out.columns:
        return np.zeros(shape, dtype=dtype)
    return np.frombuffer(out["blob"].iloc[0], dtype=dtype).reshape(shape).copy()


def smalltable_fold(ds, combine, fan: int = 32) -> pd.DataFrame:
    """In-cluster reduction of a SMALL keyed table — the variable-key
    sibling of ``elementwise_fold``. ``ds`` already holds per-block
    partial rows (each block pre-reduced to ≤ a bounded number of keyed
    rows); ``combine(df) -> df`` re-reduces a concatenation of partials
    (e.g. a pandas groupby-sum). Partials fold through a ``fan``-way
    then single-block pass, so the driver receives ONE combined frame.

    Motivation (measured, sf0.1 / 32 CPUs): a keyed
    ``groupby(...).aggregate(...)`` over a few thousand partial rows
    pays ~3 s of fixed aggregator/exchange ramp per execution; this
    fold is scan-dominated (~0.3 s on the same input). Use it whenever
    the post-partial row count is metadata-bounded (histograms,
    per-type stats, boundary-bin collects) — NOT for data-sized keys."""

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return combine(df)

    return (
        ds.repartition(fan)
        .map_batches(fold, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
        .to_pandas()
    )


def embedding_table_meta(path: str) -> tuple[int, int]:
    """(row_count, embedding_dim) from parquet METADATA only — no data
    scan beyond one row group. Directory-aware: the engine's resumable
    outputs and the bench corpus are multi-file directories, and
    ``pq.ParquetFile`` alone rejects those."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet"))) or [path]
        if os.path.isdir(path)
        else [path]
    )
    n_rows, dim = 0, 0
    for f in files:
        pf = pq.ParquetFile(f)
        n_rows += pf.metadata.num_rows
        if not dim and pf.metadata.num_rows:
            dim = len(pf.read_row_group(0, columns=["embedding"])["embedding"][0])
    return n_rows, dim
