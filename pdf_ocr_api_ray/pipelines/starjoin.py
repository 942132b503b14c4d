"""Multi-way star join: revenue per nation per order-year
(lineitem ⋈ orders ⋈ customer ⋈ nation — the TPC-H Q5 shape).

``relational.orders_per_nation`` proves the union+groupby co-location
idiom for ONE fact×dim hop; real warehouse queries chain hops. This op
shows the idiom *composes*: each hop is one keyed exchange over slim
integer rows, facts are pre-aggregated before AND inside every
exchange, and the finish is the bounded ``elementwise_fold`` — no
``Dataset.join`` aggregator ramp anywhere (measured at 5-7 s fixed per
join at sf0.1; two chained joins would pay it twice).

Hop 1 (orderkey): lineitem batches pre-aggregate quantized revenue per
orderkey (≤ distinct-orderkeys rows leave each batch), union with
orders' ``(orderkey, custkey, year)``, ONE orderkey-bucketed groupby
merges them and emits per-(custkey, year) partials — already ≤
|customers|×|years| rows per bucket.

Hop 2 (custkey): those partials union with customer's
``(custkey, nationkey)``, ONE custkey-bucketed groupby merges, and each
bucket emits ≤ |nations|×|years| partially-aggregated rows.

Finish: partials fold to ONE (n_nations, YEAR_SPAN, 2) int64 grid via
``elementwise_fold``; the 25-row nation dim (read driver-side, a few
hundred bytes) names the rows. Total: two keyed exchanges, both over
integer rows whose width never includes text or floats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import elementwise_fold, read_parquet_clean, round_half_away

YEAR_BASE = 1990
YEAR_SPAN = 24  # covers any TPC-H-ish date generator; guarded below


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def revenue_by_nation_year(sf_dir: str, num_buckets: int = 256):
    import pyarrow.parquet as pq

    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nation_map = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    n_keys = max(nation_map) + 1

    lineitem = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    customer = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )

    # ---- hop 1: co-locate lineitem partials with orders on orderkey ----
    # shared slim schema: (key, b, custkey, year, rev_u, n); custkey=-1
    # tags fact rows (real custkeys are positive)
    def tag_lineitem(t: pa.Table) -> pa.Table:
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        disc = t["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        # the pricing_summary quantization: exact integer 1e-4 units
        rev_u = np.floor(np.abs(price * (1.0 - disc)) * 10000 + 0.5).astype(np.int64)
        df = (
            pd.DataFrame({"key": okey, "rev_u": rev_u})
            .groupby("key", sort=False, as_index=False)
            .agg(rev_u=("rev_u", "sum"), n=("rev_u", "size"))
        )
        keys = df["key"].to_numpy(np.int64)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "b": pa.array(keys % num_buckets, pa.int64()),
                "custkey": pa.array(np.full(len(keys), -1, dtype=np.int64)),
                "year": pa.array(np.zeros(len(keys), dtype=np.int64)),
                "rev_u": pa.array(df["rev_u"].to_numpy(np.int64)),
                "n": pa.array(df["n"].to_numpy(np.int64)),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        years = (
            pd.to_datetime(pd.Series(t["o_orderdate"].to_pandas())).dt.year.to_numpy()
        ).astype(np.int64)
        if len(years) and (years.min() < YEAR_BASE or years.max() >= YEAR_BASE + YEAR_SPAN):
            raise ValueError(
                f"order year outside the fold grid [{YEAR_BASE}, {YEAR_BASE + YEAR_SPAN})"
            )
        zeros = np.zeros(len(okey), dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(okey, pa.int64()),
                "b": pa.array(okey % num_buckets, pa.int64()),
                "custkey": t["o_custkey"].cast(pa.int64()),
                "year": pa.array(years),
                "rev_u": pa.array(zeros),
                "n": pa.array(zeros),
            }
        )

    def merge_hop1(group: pd.DataFrame) -> pd.DataFrame:
        is_fact = group["custkey"].to_numpy() < 0
        facts = (
            group[is_fact]
            .groupby("key", sort=False, as_index=False)
            .agg(rev_u=("rev_u", "sum"), n=("n", "sum"))
        )
        dims = group[~is_fact][["key", "custkey", "year"]]
        merged = facts.merge(dims, on="key", how="inner")
        out = merged.groupby(["custkey", "year"], sort=False, as_index=False).agg(
            rev_u=("rev_u", "sum"), n=("n", "sum")
        )
        return out[["custkey", "year", "rev_u", "n"]]

    hop1 = (
        lineitem.map_batches(tag_lineitem, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(merge_hop1, batch_format="pandas")
    )

    # ---- hop 2: co-locate per-(custkey, year) partials with customer ----
    def tag_partials(t: pa.Table) -> pa.Table:
        keys = t["custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "custkey": pa.array(keys, pa.int64()),
                "b": pa.array(keys % num_buckets, pa.int64()),
                "nationkey": pa.array(np.full(len(keys), -1, dtype=np.int64)),
                "year": t["year"],
                "rev_u": t["rev_u"],
                "n": t["n"],
            }
        )

    def tag_customer(t: pa.Table) -> pa.Table:
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        zeros = np.zeros(len(keys), dtype=np.int64)
        return pa.table(
            {
                "custkey": pa.array(keys, pa.int64()),
                "b": pa.array(keys % num_buckets, pa.int64()),
                "nationkey": t["c_nationkey"].cast(pa.int64()),
                "year": pa.array(zeros),
                "rev_u": pa.array(zeros),
                "n": pa.array(zeros),
            }
        )

    def merge_hop2(group: pd.DataFrame) -> pd.DataFrame:
        is_fact = group["nationkey"].to_numpy() < 0
        facts = group[is_fact][["custkey", "year", "rev_u", "n"]]
        dims = group[~is_fact][["custkey", "nationkey"]]
        merged = facts.merge(dims, on="custkey", how="inner")
        out = merged.groupby(["nationkey", "year"], sort=False, as_index=False).agg(
            rev_u=("rev_u", "sum"), n=("n", "sum")
        )
        return out[["nationkey", "year", "rev_u", "n"]]

    partials = (
        hop1.map_batches(tag_partials, batch_format="pyarrow")
        .union(customer.map_batches(tag_customer, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(merge_hop2, batch_format="pandas")
    )

    # ---- finish: fold ≤ num_buckets × 25 × YEAR_SPAN integer partials ----
    def per_batch(df: pd.DataFrame) -> np.ndarray:
        arr = np.zeros((n_keys, YEAR_SPAN, 2), dtype=np.int64)
        nk = df["nationkey"].to_numpy()
        yr = df["year"].to_numpy() - YEAR_BASE
        np.add.at(arr[:, :, 0], (nk, yr), df["rev_u"].to_numpy())
        np.add.at(arr[:, :, 1], (nk, yr), df["n"].to_numpy())
        return arr

    totals = elementwise_fold(partials, per_batch, np.add, np.int64, (n_keys, YEAR_SPAN, 2))
    nk, yr = np.nonzero(totals[:, :, 1])
    return pd.DataFrame(
        {
            "n_name": [nation_map[int(k)] for k in nk],
            "order_year": (yr + YEAR_BASE).astype(np.int64),
            "revenue": round_half_away(pd.Series(totals[nk, yr, 0] / 10000.0), 2),
            "n_items": totals[nk, yr, 1],
        }
    )
