"""Columnar table I/O: Lance when available, Parquet otherwise.

The north_rule targets Lance tables of interleaved documents; this
sandbox has no ``lance`` package, so every call degrades to Parquet
with the identical schema (the spans layout in schemas.py IS the Lance
table shape from BASELINE.json). Production with ``pylance`` installed
uses the Lance paths unchanged.
"""

from __future__ import annotations

try:  # pragma: no cover — lance not present in this environment
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """Ray Dataset from a Lance dataset, Parquet file/dir, or JSONL.

    JSONL (``.jsonl`` / ``.ndjson``) covers interchange dumps of the
    spans table: nested ``spans`` lists of structs parse through
    pyarrow's JSON reader; column pruning happens post-read (JSON has
    no column projection)."""
    import ray.data as rd

    if HAVE_LANCE and path.endswith(".lance"):
        return rd.read_lance(path, columns=columns, **kwargs)
    if path.endswith((".jsonl", ".ndjson", ".json")):
        ds = rd.read_json(path, **kwargs)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs):
    """Write a Ray Dataset as Lance (if available and requested) or
    partitioned Parquet."""
    if HAVE_LANCE and path.endswith(".lance"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
