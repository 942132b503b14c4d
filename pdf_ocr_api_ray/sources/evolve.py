"""Schema-evolution parquet reader — read a dataset whose fragments
were written under DIFFERENT schema versions (columns added over time,
column order drift) as ONE Dataset with the unified schema.

Production shape: a crawl corpus accretes fields release by release
(`quality` added in v2, `license` in v3); re-writing petabytes of old
fragments to backfill a column is exactly the work an engine must NOT
do. The reader unifies fragment schemas driver-side from parquet
FOOTERS only (no data scan), then hands Ray's parquet datasource the
unified schema — Arrow's scanner fills absent columns with nulls and
reorders projections per fragment, so old and new fragments stream
through the same pipeline.

Refusals are loud, not silent: a column whose TYPE conflicts across
fragments (int64 in one file, string in another) raises with both
types named — unify-by-coercion would corrupt data downstream where a
parity oracle can no longer see it. (Reference analogue: the de/para
normalization layer absorbs FIELD-NAME drift, `depara.js`; this reader
absorbs table-schema drift the same declare-don't-rewrite way.)
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq


def unified_schema(path: str) -> pa.Schema:
    """Union of all fragment schemas under ``path`` (footer-only scan,
    metadata stripped). Raises on cross-fragment type conflicts."""
    files = (
        sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no .parquet fragments under {path!r}")
    seen: dict[str, tuple[pa.DataType, str]] = {}
    fields: list[pa.Field] = []  # first-seen order, like unify_schemas
    for f in files:
        for field in pq.read_schema(f):
            prev = seen.get(field.name)
            if prev is None:
                seen[field.name] = (field.type, f)
                fields.append(field)
            elif prev[0] != field.type:
                raise TypeError(
                    f"schema conflict on column {field.name!r}: "
                    f"{prev[0]} in {prev[1]!r} vs {field.type} in {f!r} — "
                    "migrate the fragments explicitly instead of coercing"
                )
    return pa.schema(fields).remove_metadata()


def _fragment_files(path: str) -> list[str]:
    return (
        sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if os.path.isdir(path)
        else [path]
    )


def read_parquet_evolved(path: str, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` over mixed-schema fragments: absent
    columns arrive as typed nulls, fragment column order is irrelevant.

    Column pruning stays a true READ-level projection: fragments are
    grouped by which requested columns they actually contain, each
    group reads only its intersection (old fragments never pay for
    columns they predate), absent columns are padded with typed nulls
    per batch, and the groups union. (Handing Ray one unified schema
    plus a ``columns`` list instead makes the scanner reject fragments
    missing a projected column — measured on Ray 2.49.)"""
    import ray.data as rd

    schema = unified_schema(path)
    if columns is None:
        return rd.read_parquet(path, schema=schema, **kwargs)

    out_schema = pa.schema([schema.field(c) for c in columns])
    groups: dict[frozenset, list[str]] = {}
    for f in _fragment_files(path):
        present = frozenset(set(pq.read_schema(f).names) & set(columns))
        groups.setdefault(present, []).append(f)

    def pad(present: frozenset):
        def fn(t: pa.Table) -> pa.Table:
            cols = []
            for field in out_schema:
                if field.name in present:
                    cols.append(t[field.name])
                else:
                    cols.append(pa.nulls(len(t), field.type))
            return pa.Table.from_arrays(cols, schema=out_schema)

        return fn

    parts = []
    for present, files in sorted(groups.items(), key=lambda kv: kv[1][0]):
        cols = [c for c in columns if c in present]
        sub = pa.schema([schema.field(c) for c in cols])
        parts.append(
            rd.read_parquet(files, columns=cols, schema=sub, **kwargs).map_batches(
                pad(present), batch_format="pyarrow"
            )
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
