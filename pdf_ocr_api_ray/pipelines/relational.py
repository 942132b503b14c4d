"""Relational query pipelines over the TPC-H-ish testdata tables.

Each function takes ``sf_dir`` and returns a Ray ``Dataset``; an
equivalent ANSI-SQL oracle lives in ``__ray_entry__.oracle_sql``.
Design rules (the 100-TB story):

- prune columns at the read (``read_parquet(columns=...)``) and push
  row filters into the scan where the query allows;
- vectorized Arrow kernels inside ``map_batches`` only;
- big×big joins go through ``Dataset.join`` (hash-partitioned);
  small sides (nation, 25 rows) are broadcast dicts inside the batch
  fn — never a shuffle;
- aggregates use Ray's native grouped aggregation (partial per-block
  combine inside Ray's hash-shuffle aggregator);
- **money/measure columns are quantized to integer units per row
  before summing** (cents / 10⁻⁴-units). Per-row float ops are
  IEEE-deterministic across engines, and integer sums are exact and
  order-independent — so results hash identically at any parallelism
  and match DuckDB bit-for-bit, which raw float sums cannot
  (parallel summation order shifts the last ulp across rounding
  boundaries). Derived doubles (sums/averages) are computed from the
  exact integers at the end.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._util import read_parquet_clean, round_cols_arrow as _round_cols


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _icol(t: pa.Table, name: str, scale: float) -> pa.Array:
    """Per-row integer quantization: round(col * scale) as int64."""
    return pc.cast(pc.round(pc.multiply(t[name], pa.scalar(scale))), "int64")


def _derive(t: pa.Table, out: str, num: str, scale: float, nd: int, per: str | None = None) -> pa.Table:
    """out = round(num/scale [/ per], nd) — identical double ops to the
    SQL oracle because the integer inputs are bit-identical."""
    val = pc.divide(pc.cast(t[num], "float64"), pa.scalar(scale))
    if per is not None:
        val = pc.divide(val, pc.cast(t[per], "float64"))
    val = pc.round(val, ndigits=nd, round_mode="half_towards_infinity")
    return t.append_column(out, val)


def pricing_summary(sf_dir: str):
    """TPC-H Q1-style grouped aggregate; revenue computed per row, all
    measures integer-quantized before the (pre-combining) shuffle."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def quantize(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": _icol(t, "l_quantity", 100.0),
                "price_c": _icol(t, "l_extendedprice", 100.0),
                "rev_u": pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))), "int64"),
            }
        )

    agg = (
        ds.map_batches(quantize, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="qty_c"),
            Sum("price_c", alias_name="price_c"),
            Sum("rev_u", alias_name="rev_u"),
            Count(alias_name="n_rows"),
        )
    )

    def derive(t: pa.Table) -> pa.Table:
        t = _derive(t, "sum_qty", "qty_c", 100.0, 2)
        t = _derive(t, "sum_base_price", "price_c", 100.0, 2)
        t = _derive(t, "sum_revenue", "rev_u", 10000.0, 2)
        t = _derive(t, "avg_qty", "qty_c", 100.0, 4, per="n_rows")
        return t.drop_columns(["qty_c", "price_c", "rev_u"])

    return agg.map_batches(derive, batch_format="pyarrow")


def top_orders(sf_dir: str):
    """Global top-k without a global sort: each batch emits its local
    top-10 (vectorized argpartition-style select), then the tiny
    partial set is sorted once. Shuffle volume = 10 rows per block."""
    import ray.data as rd

    ds = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=10, sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(idx)

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    # final merge stays in the cluster: fold the ≤10-rows-per-block
    # partials through an intermediate reduction (32 ways) and then a
    # single block — the driver never receives more than the final 10
    # rows regardless of block count (a 10⁶-block run folds 10⁷ partial
    # rows inside tasks, not on the driver)
    return (
        partials.repartition(32)
        .map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        # select_k_unstable emits its indices already ordered by the
        # sort keys, so the single-block final pass is globally sorted
        .map_batches(local_topk, batch_format="pyarrow")
    )


def top_customers_per_segment(sf_dir: str, k: int = 3):
    """Grouped top-k (the window row_number ≤ k pattern) without a
    global sort: every batch emits its local per-segment top-k
    (vectorized pandas sort+head), the tiny partials meet in one
    per-segment group for the final pick. Shuffle volume = k rows per
    (segment, block). Ties broken by custkey ascending."""
    import pandas as pd
    import ray.data as rd

    ds = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_mktsegment", "c_custkey", "c_acctbal"]
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["c_mktsegment", "c_acctbal", "c_custkey"], ascending=[True, False, True])
        return g.groupby("c_mktsegment", sort=False).head(k)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True]).head(k)
        out = g.reset_index(drop=True)
        out["rank"] = out.index.to_numpy() + 1
        return out[["c_mktsegment", "rank", "c_custkey", "c_acctbal"]]

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .groupby("c_mktsegment")
        .map_groups(final_topk, batch_format="pandas")
    )


def orders_per_nation(sf_dir: str, num_buckets: int = 256):
    """Fact×dim-key join (orders ⋈ customer ⋈ nation) + grouped
    aggregate via the union+groupby co-location idiom (the
    ``dedup_segments`` 10.1→2.8 s move, applied per VERDICT r4 ask #2):
    ``Dataset.join`` pays a ~5-7 s fixed aggregator/exchange ramp at
    sf0.1, while tagging both sides and co-locating them in ONE
    custkey-bucketed groupby costs a single keyed exchange over slim
    integer rows. Per bucket, a vectorized pandas merge joins the
    orders to their customers, the 25-row nation dim (broadcast inside
    the closure) attaches via ``Series.map``, and the bucket emits ≤25
    partially-aggregated ``(n_name, n_orders, price_c)`` rows — the
    final nation-level groupby moves ≤num_buckets×25 rows."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nation_map = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))

    orders = read_parquet_clean(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = read_parquet_clean(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])

    # both union sides carry the same slim int schema: (custkey, bucket,
    # nationkey) with nationkey = -1 tagging fact rows (real nationkeys
    # are non-negative), plus the quantized price (0 on dim rows)
    def tag_orders(t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "custkey": pa.array(keys, pa.int64()),
                "b": pa.array(keys % num_buckets, pa.int64()),
                "nationkey": pa.array(np.full(len(keys), -1, dtype=np.int64)),
                "price_c": _icol(t, "o_totalprice", 100.0),
            }
        )

    def tag_cust(t: pa.Table) -> pa.Table:
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "custkey": pa.array(keys, pa.int64()),
                "b": pa.array(keys % num_buckets, pa.int64()),
                "nationkey": t["c_nationkey"].cast(pa.int64()),
                "price_c": pa.array(np.zeros(len(keys), dtype=np.int64)),
            }
        )

    n_keys = max(nation_map) + 1  # dense small key space (25 nations)

    def bucket_merge(group: pd.DataFrame) -> pd.DataFrame:
        is_fact = group["nationkey"].to_numpy() < 0
        facts = group[is_fact]
        dims = group[~is_fact]
        # inner-join semantics: orders without a customer row drop at
        # the merge; customers without orders never produce fact rows
        per_cust = facts.groupby("custkey", sort=False).agg(
            n_orders=("price_c", "size"), price_c=("price_c", "sum")
        )
        merged = per_cust.merge(
            dims[["custkey", "nationkey"]], left_index=True, right_on="custkey", how="inner"
        )
        out = merged.groupby("nationkey", sort=False, as_index=False).agg(
            n_orders=("n_orders", "sum"), price_c=("price_c", "sum")
        )
        return out[["nationkey", "n_orders", "price_c"]]

    tagged = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        cust.map_batches(tag_cust, batch_format="pyarrow")
    )
    partials = tagged.groupby("b").map_groups(bucket_merge, batch_format="pandas")

    # the surviving data is ≤num_buckets×25 integer partials — a keyed
    # Ray aggregate here pays ~5 s of fixed aggregator ramp for nothing
    # (the elementwise_fold motivation); fold to ONE (n_keys, 2) int64
    # row instead and finish the ≤25-row derive on the driver
    def per_batch(df: pd.DataFrame) -> np.ndarray:
        arr = np.zeros((n_keys, 2), dtype=np.int64)
        keys = df["nationkey"].to_numpy()
        np.add.at(arr[:, 0], keys, df["n_orders"].to_numpy())
        np.add.at(arr[:, 1], keys, df["price_c"].to_numpy())
        return arr

    from ._util import elementwise_fold, round_half_away

    totals = elementwise_fold(partials, per_batch, np.add, np.int64, (n_keys, 2))
    live = np.flatnonzero(totals[:, 0])  # nations with ≥1 joined order
    return pd.DataFrame(
        {
            "n_name": [nation_map[int(k)] for k in live],
            "n_orders": totals[live, 0],
            "total_price": round_half_away(pd.Series(totals[live, 1] / 100.0), 2),
        }
    )


def mktsegment_stats(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = read_parquet_clean(_t(sf_dir, "customer"), columns=["c_mktsegment", "c_acctbal"])

    def quantize(t: pa.Table) -> pa.Table:
        return t.append_column("bal_c", _icol(t, "c_acctbal", 100.0))

    agg = (
        ds.map_batches(quantize, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("bal_c", alias_name="bal_c"),
            Min("c_acctbal", alias_name="min_bal"),
            Max("c_acctbal", alias_name="max_bal"),
        )
    )

    def derive(t: pa.Table) -> pa.Table:
        t = _derive(t, "avg_bal", "bal_c", 100.0, 4, per="n_customers")
        return t.drop_columns(["bal_c"])

    return _round_cols(agg.map_batches(derive, batch_format="pyarrow"), {"min_bal": 2, "max_bal": 2})


def revenue_by_returnflag_1995(sf_dir: str):
    """Filter-pushdown query: the shipdate/quantity predicate goes into
    the parquet scan (row-group pruning), not a post-read filter."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_extendedprice", "l_discount", "l_shipdate", "l_quantity"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(datetime(1995, 1, 1)))
            & (pc.field("l_shipdate") < pa.scalar(datetime(1996, 1, 1)))
            & (pc.field("l_quantity") > pa.scalar(25.0))
        ),
    )

    def quantize(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "rev_u": pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))), "int64"),
            }
        )

    agg = (
        ds.map_batches(quantize, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("rev_u", alias_name="rev_u"), Count(alias_name="n_rows"))
    )

    def derive(t: pa.Table) -> pa.Table:
        t = _derive(t, "revenue", "rev_u", 10000.0, 2)
        return t.drop_columns(["rev_u"])

    return agg.map_batches(derive, batch_format="pyarrow")


def orders_outside_segment(sf_dir: str, segment: str = "AUTOMOBILE"):
    """Anti semi-join via broadcast key set: the FILTERED dimension key
    set (custkeys of one market segment; at 10^12 scale a Bloom filter)
    is broadcast once and every fact batch filters against it inside
    map_batches — the dim predicate is pushed to the fact scan with no
    shuffle. Returns orders whose customer is NOT in the segment,
    counted per order status."""
    import numpy as np
    import pyarrow.compute as _pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    # the filter column must be part of the pruned schema for the scan
    # expression to bind; it is dropped by the unique() right after
    cust = read_parquet_clean(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_mktsegment"],
        filter=(_pc.field("c_mktsegment") == segment),
    )
    keys = cust.unique("c_custkey")
    keyset_ref = ray.put(np.sort(np.array(keys, dtype=np.int64)))

    orders = read_parquet_clean(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderstatus"])

    def anti(t: pa.Table) -> pa.Table:
        import ray as _ray

        keyset = _ray.get(keyset_ref)
        if len(keyset) == 0:  # empty segment → nothing to exclude
            return t
        ck = t.column("o_custkey").to_numpy()
        pos = np.searchsorted(keyset, ck)
        pos = np.clip(pos, 0, len(keyset) - 1)
        has_customer = keyset[pos] == ck
        return t.filter(pa.array(~has_customer))

    return (
        orders.map_batches(anti, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n_outside_orders"))
    )


def latest_order_per_customer(sf_dir: str):
    """Grouped argmax WITHOUT map_groups: encode (orderdate, orderkey)
    into one int64, take the grouped Max, decode — a fully vectorized
    top-1-per-key (the window row_number()=1 pattern) whose shuffle
    carries one int per key."""
    import ray.data as rd
    from ray.data.aggregate import Max

    ds = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )

    ENC = 100_000_000  # orderkey < 1e8; epoch-days * ENC + orderkey

    def encode(t: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.divide(pc.cast(t["o_orderdate"], pa.int64()), 86_400_000_000), "int64"
        )
        enc = pc.add(pc.multiply(days, pa.scalar(ENC)), t["o_orderkey"])
        return pa.table({"o_custkey": t["o_custkey"], "enc": enc})

    agg = (
        ds.map_batches(encode, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Max("enc", alias_name="enc"))
    )

    def decode(t: pa.Table) -> pa.Table:
        latest_key = pc.cast(
            pc.subtract(t["enc"], pc.multiply(pc.divide(t["enc"], pa.scalar(ENC)), pa.scalar(ENC))),
            "int64",
        )
        return pa.table({"o_custkey": t["o_custkey"], "latest_orderkey": latest_key})

    return agg.map_batches(decode, batch_format="pyarrow")


def part_type_counts(sf_dir: str):
    """Distinct-style: grouped count over a categorical column."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = read_parquet_clean(_t(sf_dir, "part"), columns=["p_type"])
    return ds.groupby("p_type").aggregate(Count(alias_name="n_parts"))


def supplier_balance(sf_dir: str):
    """Tiny-table sanity query (unit of the broadcast-dim path)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(_t(sf_dir, "supplier"), columns=["s_nationkey", "s_acctbal"])

    def quantize(t: pa.Table) -> pa.Table:
        return t.append_column("bal_c", _icol(t, "s_acctbal", 100.0))

    agg = (
        ds.map_batches(quantize, batch_format="pyarrow")
        .groupby("s_nationkey")
        .aggregate(Count(alias_name="n_suppliers"), Sum("bal_c", alias_name="bal_c"))
    )

    def derive(t: pa.Table) -> pa.Table:
        t = _derive(t, "total_bal", "bal_c", 100.0, 2)
        return t.drop_columns(["bal_c"])

    return agg.map_batches(derive, batch_format="pyarrow")
