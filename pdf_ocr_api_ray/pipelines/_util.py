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

    # accept everything rd.read_parquet accepts: a single file, a
    # sharded directory, or a list of either — the schema comes from
    # the first fragment (pq.read_schema only handles a lone file)
    first = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(first):
        frags = sorted(f for f in os.listdir(first) if f.endswith(".parquet"))
        if not frags:
            raise FileNotFoundError(f"no .parquet fragments under {first!r}")
        first = os.path.join(first, frags[0])
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
