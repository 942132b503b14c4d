"""Driver-contract parity: every queries() entry with an oracle_sql()
entry must match DuckDB on row count, (sorted) schema and values at
sf0.001 — mirroring the driver's CORRECTNESS gate (it runs sf0.01).
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _load_entry_module():
    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__ray_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod():
    return _load_entry_module()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


SQL_CHECKED = None  # filled in test_parity parametrization at import


def _all_queries(mod):
    """Driver registry + the r4 rotated-out library queries — pytest
    parity covers BOTH (the driver only sees the first dict)."""
    return {**mod.queries(), **mod.rotated_out_queries()}


def _query_names():
    mod = _load_entry_module()
    return sorted(set(_all_queries(mod)) & set(mod.oracle_sql()))


@pytest.mark.parametrize("name", _query_names())
def test_parity(ray_session, entry_mod, con, name):
    ray_df = _canon(_to_pandas(_all_queries(entry_mod)[name](SF_DIR)))
    sql_df = _canon(con.execute(entry_mod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} vs {len(sql_df)}"
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False, rtol=0, atol=1e-9
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), f"{name}: col {c} differs"


# approximate-by-construction ops with no exact SQL twin: the driver
# records a rows-only check; the rank-error bound is pytest-pinned
# ops without a SQL twin, each pinned by its own reference gate:
# the t-digest sketch by its error-bound test (exact twin
# value_percentiles IS hash-verified), the perceptual image hash by
# brute-force all-pairs equality (hash over decoded binary content),
# SemDeDup by an independent straight-line numpy reference of the
# same spec (tests/test_semdedup.py)
ROWS_ONLY = {
    "value_percentiles_sketch",
    # grouped-HLL DAU: libm estimator — error-bound-pinned vs the
    # exact active_users op (tests/test_events_sketch.py)
    "daily_active_hll",
    "media_phash_dup",
    "semantic_dedup",
    # PQ: per-subspace k-means + argmin codes — reference-pinned
    "pq_encode",
    "ann_topk_pq",
    # BPE: iterative merge loop — reference-pinned
    "train_bpe",
    "bpe_encode",
    # DSIR: libm log weights — reference-pinned
    "dsir_select",
    # IVF-PQ composition of two pinned pieces
    "ann_topk_ivfpq",
    # actor-pool model scoring: float GEMM head — reference-pinned
    # (tests/test_model_score.py, shared straight-line kernel)
    "neural_quality_score",
    # PCA: eigendecomposition — reference-pinned (tests/test_pca.py,
    # straight-line numpy replay + planted-structure recovery)
    "embedding_pca",
    # ridge linear probe: matrix solve — reference-pinned
    # (tests/test_probe.py, straight-line numpy replay +
    # planted-separable recovery)
    "quality_probe",
}


def test_every_query_has_an_oracle(entry_mod):
    """Round-2 invariant: every queries() entry is driver-verifiable,
    except the documented rows-only sketch op (exact twin
    value_percentiles IS hash-verified)."""
    assert set(entry_mod.queries()) - ROWS_ONLY <= set(entry_mod.oracle_sql())
    assert set(entry_mod.rotated_out_queries()) - ROWS_ONLY <= set(entry_mod.oracle_sql())
    # the registry must stay within the driver's hard 50-row cap
    assert len(entry_mod.queries()) <= 50


def test_entry_smoke(ray_session, entry_mod):
    df = _to_pandas(entry_mod.entry())
    assert len(df) > 0
    assert "doc_id" in df.columns
