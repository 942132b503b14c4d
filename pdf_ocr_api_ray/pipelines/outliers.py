"""Exact per-group 3-sigma outlier detection over the events table —
the telemetry-cleaning pass (drop sensor glitches / bot spikes before
aggregation) every event pipeline runs.

Exactness discipline: the naive test |v − mean| > k·sigma runs through
floating sqrt and divides — boundary events then flip with summation
order. Instead the inequality is kept in integers end to end:

    outlier(v)  ⇔  (n·v − S)² > k² · (n·Q − S²)        (micro-units)

with S = Σv, Q = Σv². n·Q overflows int64 at corpus scale, so the
engine never evaluates the quadratic per event: the driver solves it
ONCE per type with arbitrary-precision Python ints —

    |n·v − S| ≥ isqrt(k²(nQ − S²)) + 1
    ⇔ v > v_hi  or  v < v_lo,   v_hi = ⌊(S + r)/n⌋, v_lo = ⌈(S − r)/n⌉ − adj

(exact integer cutoffs; ``math.isqrt`` is exact) — and the scan is a
broadcast two-constant int64 range filter per type. The DuckDB twin
evaluates the SAME quadratic inequality directly in HUGEINT (int128),
so a cutoff derivation bug on either side breaks parity.

Scale shape: ONE fold for per-type (n, S, Q) — Q in micro-unit² needs
int128-scale headroom, so per-batch partials carry Q split into
(high, low) int64 limbs recombined driver-side in Python ints (exact
for any corpus size; the per-batch Σv² over ≤2¹⁷-row batches of
≤2³¹-micro-unit values fits uint64, asserted) — then one stateless
filter scan. Output: the outlier rows only (bounded by the tail mass).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ._util import read_parquet_clean

SIGMA_K = 3

# |v_u| < 2³¹ keeps every per-element v² under 2⁶² (one uint64); the
# batch Σv² then accumulates as TWO 32-bit-limb sums (hi = v²>>32 sums
# to < 2³⁰·rows, lo likewise), recombined driver-side in Python ints —
# exact for any corpus size. 2³¹ micro-units ≈ values up to ±2147.
_VMAX = 1 << 31
_BATCH_ROWS = 1 << 20


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _quantized(sf_dir: str):
    ds = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "value"]
    )

    def quantize(df: pd.DataFrame) -> pd.DataFrame:
        vu = np.floor(df["value"].to_numpy(np.float64) * 1e6 + 0.5).astype(np.int64)
        if len(vu) and (np.abs(vu).max() >= _VMAX or len(vu) > _BATCH_ROWS):
            raise OverflowError(
                "zscore_outliers: |value_u| or batch size past the exact "
                f"uint64 partial bound (|v|<{_VMAX}, rows<={_BATCH_ROWS}) — "
                "rescale the quantizer or shrink batch_size"
            )
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_type": df["event_type"],
                "value_u": vu,
            }
        )

    return ds.map_batches(quantize, batch_format="pandas", batch_size=_BATCH_ROWS)


def zscore_outliers(sf_dir: str, k: int = SIGMA_K):
    """Events with |value − mean| > k·sigma within their event_type
    (population sigma). Output: the flagged rows
    ``(event_id, user_id, event_type, value_u)``."""
    import ray

    q_ds = _quantized(sf_dir).materialize()

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = g["value_u"].to_numpy()
            vsq = v.astype(np.uint64) * v.astype(np.uint64)  # exact: |v| < 2³¹
            hi = int((vsq >> np.uint64(32)).sum(dtype=np.uint64))
            lo = int((vsq & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
            rows.append((et, np.int64(len(v)), np.int64(v.sum()), np.int64(hi), np.int64(lo)))
        return pd.DataFrame(rows, columns=["event_type", "n", "s", "q_hi", "q_lo"])

    parts = q_ds.map_batches(stat_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return q_ds.limit(0)  # typed empty

    cuts: dict[str, tuple[int, int]] = {}
    for et, g in parts.groupby("event_type"):
        # exact big-int recombination driver-side
        n = int(g["n"].sum())
        s = int(g["s"].sum())
        qq = sum((int(h) << 32) + int(lo) for h, lo in zip(g["q_hi"], g["q_lo"]))
        t = k * k * (n * qq - s * s)  # ≥ 0 by Cauchy-Schwarz
        r = math.isqrt(t)
        # outlier ⇔ |n·v − S| ≥ r+1  ⇔  v ≥ ceil((S + r + 1)/n)  or
        #                               v ≤ floor((S − r − 1)/n)
        v_hi = -(-(s + r + 1) // n)  # ceil
        v_lo = (s - r - 1) // n  # floor
        cuts[et] = (v_lo, v_hi)
    cuts_ref = ray.put(cuts)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        look = ray.get(cuts_ref)
        # take-based dim lookup (factorize once per batch, no per-row map)
        codes, uniq = pd.factorize(df["event_type"])
        lo = np.asarray([look[e][0] for e in uniq], dtype=np.int64)[codes]
        hi = np.asarray([look[e][1] for e in uniq], dtype=np.int64)[codes]
        v = df["value_u"].to_numpy()
        return df[(v <= lo) | (v >= hi)]

    return q_ds.map_batches(flag, batch_format="pandas")
