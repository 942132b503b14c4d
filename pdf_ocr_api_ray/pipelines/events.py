"""Streaming-shaped pipelines over the ``events`` log table.

Ray Data has no event-time windowing; the idiomatic mapping (SURVEY.md
§2.1 streaming row) is: partition by key, sort by ts within the group,
and run the window logic with vectorized pandas inside ``map_groups``.
Ordering contract: (user_id, ts, event_id) is a total order; every
query below states it and the SQL oracle uses the identical ORDER BY.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._util import round_half_away


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def events_daily(sf_dir: str):
    """Tumbling daily window per event_type (day as string so the
    grouping key is engine-agnostic)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def add_day(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        # integer micro-units per row → exact, order-independent sum;
        # floor(x+0.5) (not banker's round) so the SQL oracle's
        # identical expression quantizes identically on every input
        df["value_u"] = np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        return df[["event_type", "day", "value_u"]]

    out = (
        ds.map_batches(add_day, batch_format="pandas")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n_events"), Sum("value_u", alias_name="value_u"))
    )

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = round_half_away(pd.Series(df["value_u"] / 1e6), 2)
        return df.drop(columns=["value_u"])

    return out.map_batches(derive, batch_format="pandas")


def running_total(sf_dir: str):
    """Per-user running sum of value ordered by (ts, event_id) — the
    grouped cumulative scan (sequential addition order is part of the
    contract, so floats match the SQL window exactly before rounding)."""
    import ray.data as rd

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "running_value": round_half_away(g["value"].cumsum(), 2),
            }
        )

    return ds.groupby("user_id").map_groups(scan, batch_format="pandas")


def systematic_sample(sf_dir: str, k: int = 17):
    """Deterministic 1-in-k systematic sample (event_id % k == 0) with
    summary stats — the reproducible-sampling pattern (a random sample
    with a seed is engine-specific; a key-modulo sample is portable and
    restartable)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def quantize(t: pa.Table) -> pa.Table:
        # modulo isn't a scan-pushdown expression — vectorized in-map
        keep = (t["event_id"].to_numpy(zero_copy_only=False) % k) == 0
        t = t.filter(pa.array(keep))
        vu = pa.array(
            np.floor(t["value"].to_numpy(zero_copy_only=False) * 1e6 + 0.5).astype(np.int64)
        )
        return pa.table({"event_type": t["event_type"], "value_u": vu})

    agg = (
        ds.map_batches(quantize, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n_sampled"), Sum("value_u", alias_name="value_u"))
    )

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = round_half_away(pd.Series(df["value_u"] / 1e6), 2)
        return df.drop(columns=["value_u"])

    return agg.map_batches(derive, batch_format="pandas")


def union_parties(sf_dir: str):
    """Set-op coverage: union two keyed tables (customers ∪ suppliers)
    with a side tag and aggregate — ``Dataset.union`` + groupby."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "nationkey": t["c_nationkey"],
                "kind": pa.array(["customer"] * t.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "nationkey": t["s_nationkey"],
                "kind": pa.array(["supplier"] * t.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    return cust.union(supp).groupby(["kind", "nationkey"]).aggregate(
        Count(alias_name="n_parties")
    )


def json_props_stats(sf_dir: str):
    """JSON scalar extraction (the reference's only JSON op is
    JSON.parse of the GPT reply, gpt/extractHeader.js:121): parse the
    ``props`` JSON column, extract ``k``, and aggregate per event type
    — vectorized pandas json load per batch; DuckDB json_extract oracle."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "props"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        df["k"] = df["props"].map(lambda s: int(_json.loads(s)["k"])).astype("int64")
        return df[["event_type", "k"]]

    return (
        ds.map_batches(extract, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
            Max("k", alias_name="max_k"),
        )
    )


SESSION_GAP_MIN = 30


def sessionize(sf_dir: str):
    """Session windows: a >30-minute gap starts a new session. Output:
    per-user session count and the longest session's event count."""
    import ray.data as rd

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds().fillna(0.0)
        new_session = (gaps > SESSION_GAP_MIN * 60).astype(int)
        session_id = new_session.cumsum()
        sizes = session_id.value_counts()
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_sessions": [int(session_id.max()) + 1],
                "max_session_events": [int(sizes.max())],
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def asof_last_order(sf_dir: str):
    """As-of join: for each event, the latest order of the same user
    (o_custkey = user_id, o_orderdate ≤ ts). Orders are first reduced
    to one row per (custkey, orderdate) — max orderkey — so the as-of
    pick is deterministic on date ties. Custom operator composition:
    hash-partition by key, sort within group, pd.merge_asof per group
    (Ray Data has no native as-of join)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    # small side at this scale: deduped (custkey, date) → max orderkey.
    # At 10^12 scale this side would be bucketed by the same key and
    # merge_asof run per bucket; the group shape below is unchanged.
    orders = pq.read_table(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_orderkey"]
    ).to_pandas()
    orders = (
        orders.groupby(["o_custkey", "o_orderdate"], as_index=False)["o_orderkey"]
        .max()
        .sort_values(["o_custkey", "o_orderdate"])
    )
    orders_ref = ray.put(orders)

    events = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def join_group(group: pd.DataFrame) -> pd.DataFrame:
        odf = ray.get(orders_ref)
        uid = int(group["user_id"].iloc[0])
        mine = odf[odf["o_custkey"] == uid]
        g = group.sort_values(["ts", "event_id"])
        if mine.empty:
            return pd.DataFrame(
                {
                    "event_id": g["event_id"],
                    "user_id": g["user_id"],
                    "last_orderkey": np.full(len(g), -1, dtype=np.int64),
                }
            )
        merged = pd.merge_asof(
            g[["event_id", "user_id", "ts"]],
            mine[["o_orderdate", "o_orderkey"]].rename(columns={"o_orderdate": "ts_o"}),
            left_on="ts",
            right_on="ts_o",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": merged["event_id"],
                "user_id": merged["user_id"],
                "last_orderkey": merged["o_orderkey"].fillna(-1).astype("int64"),
            }
        )

    return events.groupby("user_id").map_groups(join_group, batch_format="pandas")
