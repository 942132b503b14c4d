"""Sampling / selection operators for training-data curation —
deterministic stratified sampling (per-language mixture fractions) and
per-group top-k exemplar selection.

Library ops with DuckDB-oracle pytest gates
(tests/test_sampling.py) — the driver registry is capped at 50 rows,
so these are not `queries()` entries.

Scale design: both are single-scan. Stratified sampling is a pure
per-row hash filter (no shuffle at all — the id hash IS the random
draw, reproducible on any worker). Top-k per group pre-reduces each
batch to ≤ k rows per group before one bounded groupby.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ._util import read_parquet_clean

DEFAULT_FRACTIONS = {"en": 0.5, "pt": 0.3}
DEFAULT_FRACTION = 0.2
_SAMPLE_SALT = "samp"


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _u32(doc_id: int) -> int:
    """Deterministic uniform draw in [0, 2^32): little-endian 64-bit
    md5 prefix of 'samp|<id>' masked to 32 bits — the same arithmetic
    the SQL oracle rebuilds from DuckDB's md5()."""
    h = hashlib.md5(f"{_SAMPLE_SALT}|{doc_id}".encode()).digest()[:8]
    return int.from_bytes(h, "little") & 0xFFFFFFFF


def sample_stratified(
    sf_dir: str,
    fractions: dict[str, float] | None = None,
    default_fraction: float = DEFAULT_FRACTION,
):
    """Stratified Bernoulli sample with per-language keep fractions
    (the training-mixture knob: upsample scarce languages, downsample
    dominant ones). The draw is a pure function of doc_id — no RNG
    state, no shuffle, reproducible across runs/cluster sizes, and a
    resumed run keeps exactly the same sample. Output: the sampled
    (doc_id, lang) rows."""
    fr = DEFAULT_FRACTIONS if fractions is None else fractions

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        thresh = df["lang"].map(lambda l: fr.get(l, default_fraction)).to_numpy()
        draws = np.fromiter(
            (_u32(int(d)) for d in df["doc_id"]), dtype=np.float64, count=len(df)
        )
        return df[draws < thresh * 2**32][["doc_id", "lang"]]

    return ds.map_batches(keep, batch_format="pandas")


def group_topk(sf_dir: str, k: int = 5):
    """Top-k documents per language by (n_chars DESC, doc_id ASC) —
    per-group exemplar selection. Each batch pre-reduces to ≤ k rows
    per language (so the shuffle carries k × languages × blocks rows,
    independent of corpus size), then one small groupby finalizes.
    Output: (lang, rank, doc_id, n_chars)."""
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return s.groupby("lang", sort=False).head(k)[["lang", "doc_id", "n_chars"]]

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "lang": g["lang"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "doc_id": g["doc_id"].astype("int64"),
                "n_chars": g["n_chars"].astype("int64"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )
