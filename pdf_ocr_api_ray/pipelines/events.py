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

from ._util import read_parquet_clean, round_half_away


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def events_daily(sf_dir: str):
    """Tumbling daily window per event_type (day as string so the
    grouping key is engine-agnostic)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

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


NUM_KEY_BUCKETS = 256


def running_total(sf_dir: str):
    """Per-user running sum of value ordered by (ts, event_id) — the
    grouped cumulative scan. Users are grouped into hash buckets
    (one Ray group per BUCKET, not per user — the per-key Python-call
    overhead the engine's own BucketAssembler fix measured at 15×);
    inside a bucket the scan is one vectorized pandas groupby-cumsum.
    Values are quantized to integer micro-units before the scan so the
    cumulative sums are exact integers — bit-identical to the SQL
    window regardless of accumulation tree shape."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value_u"] = np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        df["ub"] = (df["user_id"].to_numpy() % NUM_KEY_BUCKETS).astype(np.int32)
        return df[["event_id", "user_id", "ts", "value_u", "ub"]]

    def scan_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"])
        run_u = g.groupby("user_id", sort=False)["value_u"].cumsum()
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "running_value": round_half_away(run_u / 1e6, 2),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("ub")
        .map_groups(scan_bucket, batch_format="pandas")
    )


def systematic_sample(sf_dir: str, k: int = 17):
    """Deterministic 1-in-k systematic sample (event_id % k == 0) with
    summary stats — the reproducible-sampling pattern (a random sample
    with a seed is engine-specific; a key-modulo sample is portable and
    restartable)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
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

    cust = read_parquet_clean(_t(sf_dir, "customer"), columns=["c_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "nationkey": t["c_nationkey"],
                "kind": pa.array(["customer"] * t.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    supp = read_parquet_clean(_t(sf_dir, "supplier"), columns=["s_nationkey"]).map_batches(
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

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "props"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized scalar-field extraction (the props values are flat
        # {"k": int} objects; a full json parse per row is pure overhead)
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        df = df[["event_type"]].copy()
        df["k"] = k.astype("int64")
        return df

    return (
        ds.map_batches(extract, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
            Max("k", alias_name="max_k"),
        )
    )


def value_percentiles(sf_dir: str):
    """Exact grouped percentiles (p50/p95 of value per event_type):
    values are quantized to integer micro-units, co-located per group
    by the groupby, and interpolated with the standard linear
    (quantile_cont) formula — identical arithmetic to DuckDB, so the
    doubles match before rounding. Exact percentiles inherently need
    the group's values together (one shuffle); at 10^12 rows the scale
    path swaps this stage for a mergeable sketch (t-digest/KLL) with
    the same output schema."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "value"])

    def quantize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value_u": np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64),
            }
        )

    def pct(group: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(group["value_u"].to_numpy())
        p50 = np.percentile(v, 50, method="linear") / 1e6
        p95 = np.percentile(v, 95, method="linear") / 1e6
        return pd.DataFrame(
            {
                "event_type": [group["event_type"].iloc[0]],
                "p50": round_half_away(pd.Series([p50]), 4),
                "p95": round_half_away(pd.Series([p95]), 4),
            }
        )

    return (
        ds.map_batches(quantize, batch_format="pandas")
        .groupby("event_type")
        .map_groups(pct, batch_format="pandas")
    )


def events_hopping(sf_dir: str, window_s: int = 3600, hop_s: int = 900):
    """Hopping (sliding) window aggregate: 1-hour windows advancing
    every 15 minutes — each event contributes to window_s/hop_s = 4
    overlapping windows. Ray Data has no event-time windowing; the
    idiomatic mapping is a vectorized per-batch fan-out (one row per
    (event, window_start)) followed by a grouped aggregate — the
    exchange carries quantized partial rows, never raw events twice.
    Output: (event_type, window_start epoch-seconds, n_events,
    sum_value)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    k = window_s // hop_s
    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        secs = df["ts"].astype("datetime64[s]").astype("int64").to_numpy()
        base = (secs // hop_s) * hop_s
        value_u = np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        et = df["event_type"].to_numpy()
        n = len(df)
        # every event lands in exactly k windows: base - i*hop, i<k
        starts = (base[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop_s).ravel()
        return pd.DataFrame(
            {
                "event_type": np.repeat(et, k),
                "window_start": starts,
                "value_u": np.repeat(value_u, k),
            }
        )

    agg = (
        ds.map_batches(fan_out, batch_format="pandas")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value_u", alias_name="value_u"))
    )

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = round_half_away(pd.Series(df["value_u"] / 1e6), 2)
        return df.drop(columns=["value_u"])

    return agg.map_batches(derive, batch_format="pandas")


SESSION_GAP_MIN = 30


def sessionize(sf_dir: str):
    """Session windows: a >30-minute gap starts a new session. Output:
    per-user session count and the longest session's event count."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ub"] = (df["user_id"].to_numpy() % NUM_KEY_BUCKETS).astype(np.int32)
        return df

    def sessions_bucket(group: pd.DataFrame) -> pd.DataFrame:
        """All users of one hash bucket, vectorized: gap flags via a
        per-user shift, session ids via grouped cumsum, then two
        grouped aggregations — no per-user Python."""
        g = group.sort_values(["user_id", "ts", "event_id"])
        gaps = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds().fillna(0.0)
        new_session = (gaps > SESSION_GAP_MIN * 60).astype(np.int64)
        session_id = new_session.groupby(g["user_id"], sort=False).cumsum()
        sizes = g.groupby([g["user_id"], session_id], sort=False).size()
        per_user = sizes.groupby(level=0).agg(["count", "max"])
        return pd.DataFrame(
            {
                "user_id": per_user.index.astype("int64"),
                "n_sessions": per_user["count"].astype("int64").to_numpy(),
                "max_session_events": per_user["max"].astype("int64").to_numpy(),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("ub")
        .map_groups(sessions_bucket, batch_format="pandas")
    )


def asof_last_order(sf_dir: str):
    """As-of join: for each event, the latest order of the same user
    (o_custkey = user_id, o_orderdate ≤ ts) — fully distributed custom
    operator (Ray Data has no native as-of join):

    1. both sides stream through a batch pass that tags the user-hash
       bucket and projects a COMMON schema (orders are pre-reduced per
       batch to (custkey, date) → max orderkey — a combiner; the
       exchange then carries partially-reduced order rows, never the
       raw fact table, and nothing is read on the driver);
    2. one union + groupby(bucket) co-locates each user's events and
       orders;
    3. inside a bucket: finish the orders reduction, then a single
       vectorized ``pd.merge_asof(by=user)`` over all users at once.
    """
    import pyarrow as pa
    import ray.data as rd

    SCHEMA = pa.schema(
        [
            ("ub", pa.int32()),
            ("kind", pa.int8()),  # 0 = event, 1 = order
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_id", pa.int64()),
            ("orderkey", pa.int64()),
        ]
    )

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "ub": (df["user_id"].to_numpy() % NUM_KEY_BUCKETS).astype(np.int32),
                "kind": np.int8(0),
                "user_id": df["user_id"].astype("int64"),
                "ts": df["ts"].astype("datetime64[us]"),
                "event_id": df["event_id"].astype("int64"),
                "orderkey": np.int64(-1),
            }
        )

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        red = df.groupby(["o_custkey", "o_orderdate"], as_index=False)["o_orderkey"].max()
        return pd.DataFrame(
            {
                "ub": (red["o_custkey"].to_numpy() % NUM_KEY_BUCKETS).astype(np.int32),
                "kind": np.int8(1),
                "user_id": red["o_custkey"].astype("int64"),
                "ts": red["o_orderdate"].astype("datetime64[us]"),
                "event_id": np.int64(-1),
                "orderkey": red["o_orderkey"].astype("int64"),
            }
        )

    events = read_parquet_clean(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"]).map_batches(
        tag_events, batch_format="pandas"
    )
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_orderkey"]
    ).map_batches(tag_orders, batch_format="pandas")

    def asof_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ev = group[group["kind"] == 0]
        od = group[group["kind"] == 1]
        # finish the distributed reduction (batch combiners may have
        # emitted several partials per (user, date))
        od = od.groupby(["user_id", "ts"], as_index=False)["orderkey"].max()
        ev = ev.sort_values("ts", kind="mergesort")
        if od.empty:
            out = ev[["event_id", "user_id"]].copy()
            out["last_orderkey"] = np.int64(-1)
            return out.reset_index(drop=True)
        od = od.sort_values("ts", kind="mergesort")
        merged = pd.merge_asof(
            ev[["event_id", "user_id", "ts"]],
            od.rename(columns={"orderkey": "o_orderkey"}),
            on="ts",
            by="user_id",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": merged["event_id"],
                "user_id": merged["user_id"],
                "last_orderkey": merged["o_orderkey"].fillna(-1).astype("int64"),
            }
        )

    return events.union(orders).groupby("ub").map_groups(asof_bucket, batch_format="pandas")
