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


# Registry defaults for the parameterized event ops. The inline SQL
# twins in __ray_entry__.oracle_sql() interpolate THESE constants (the
# bigram_fluency_sql pattern) so calling an op with a non-default
# argument can never silently invalidate the parity oracle — engine
# and twin read the same value from one place.
ACTIVE_USERS_WINDOW_DAYS = 7
COHORT_WEEK_DAYS = 7
DEBOUNCE_GAP_S = 300
ANOMALY_FACTOR_NUM = 2
ANOMALY_FACTOR_DEN = 1
TRIMMED_STATS_TRIM_PCT = 1


def events_daily(sf_dir: str):
    """Tumbling daily window per event_type (day as string so the
    grouping key is engine-agnostic)."""
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
    from ray.data.aggregate import Count, Max, Sum

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "props"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized scalar-field extraction (the props values are flat
        # {"k": int} objects; a full json parse per row is pure overhead).
        # Rows whose props is NULL / lacks "k" extract to NaN and are
        # SKIPPED by Sum/Max but still counted — matching the SQL
        # oracle's json_extract→CAST NULL semantics instead of crashing
        # the task on the first malformed row
        k = pd.to_numeric(
            df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False),
            errors="coerce",
        )
        df = df[["event_type"]].copy()
        df["k"] = k.astype("float64")
        return df

    agg = (
        ds.map_batches(extract, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
            Max("k", alias_name="max_k"),
        )
    )

    def to_int(df: pd.DataFrame) -> pd.DataFrame:
        # integer-valued sums/maxes (float only for NULL tolerance). A
        # group whose props are ALL malformed/NULL aggregates to NaN
        # and a plain int64 cast raises — SQL's SUM over an all-NULL
        # group is NULL, so such groups ship a null via nullable Int64;
        # the all-valid fast path keeps the plain int64 dtype
        for c in ("sum_k", "max_k"):
            s = df[c]
            df[c] = s.astype("int64") if s.notna().all() else s.round().astype("Int64")
        return df

    return agg.map_batches(to_int, batch_format="pandas")


_PCT_NBINS = 4096


def _np_lerp(a: float, b: float, t: float) -> float:
    """numpy's quantile interpolation arithmetic, replicated exactly
    (np.lib._function_base_impl._lerp): t ≥ 0.5 evaluates from the b
    side for accuracy. Using the identical expression keeps the result
    bit-equal to np.percentile(method='linear') — and therefore to
    DuckDB's quantile_cont, which the r1/r2 single-group implementation
    already matched."""
    diff = b - a
    out = a + diff * t
    if t >= 0.5:
        out = b - diff * (1 - t)
    return out


def _quantize_values(sf_dir: str):
    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "value"])

    def quantize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value_u": np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64),
            }
        )

    return ds.map_batches(quantize, batch_format="pandas")


def _type_meta(q_ds, want_sum: bool = False) -> pd.DataFrame:
    """Per-event-type (n, [s,] mn, mx) over a quantized projection —
    WITHOUT a keyed aggregate: each batch pre-reduces to ≤|types| rows
    and the driver combines (the heavy_hitters discipline). A keyed
    ``groupby(event_type).aggregate`` here pays ~3 s of fixed
    aggregator/exchange ramp per execution (measured at sf0.1, 32
    CPUs) to reduce a handful of types; the partial collect is
    scan-dominated (0.7 s same input). Driver rows = blocks × types —
    fine for event-typed telemetry (tens of types); a corpus with
    ~10⁵+ types should switch back to the keyed shape."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False)["value_u"]
        out = {"event_type": g.size().index, "n": g.size().to_numpy(np.int64)}
        if want_sum:
            out["s"] = g.sum().to_numpy(np.int64)
        out["mn"] = g.min().to_numpy(np.int64)
        out["mx"] = g.max().to_numpy(np.int64)
        return pd.DataFrame(out)

    parts = q_ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return parts
    aggs = {"n": ("n", "sum"), "mn": ("mn", "min"), "mx": ("mx", "max")}
    if want_sum:
        aggs["s"] = ("s", "sum")
    return parts.groupby("event_type", as_index=False).agg(**aggs)


def value_percentiles(sf_dir: str):
    """Exact grouped percentiles (p50/p95 of value per event_type) —
    DISTRIBUTED, no per-group value materialization (the r2 version
    shipped every value of an event_type into one map_groups call; at
    10^12 rows that one group is the job):

    1. per-type count/min/max (one tiny aggregate) → the ranks each
       quantile needs (floor/ceil of q·(n−1));
    2. per-type fixed-width histogram (per-batch pre-agg → bounded
       groupby of ≤ types × 4096 bin rows) → cumulative counts locate
       the BIN holding each needed rank;
    3. a second pre-aggregated pass collects (value, count) only for
       those target bins (≤ bin-width distinct values each) — the
       driver receives bounded metadata at every step, never the data.

    Interpolation replicates np.percentile's linear formula exactly
    (``_np_lerp``), so output is bit-identical to the r2 single-group
    path and to DuckDB's quantile_cont. A one-pass mergeable-sketch
    alternative (``value_percentiles_sketch``) trades exactness for a
    single shuffle of ≤ compression centroids per (batch, type).

    Values are quantized to integer micro-units first, so sums/ranks
    are order-independent and the arithmetic is exact."""
    import math

    import ray

    # three passes read the quantized projection — materialize it once
    # (16 B/row; object-store spill covers the extreme case, and even
    # then beats three reads + three quantize kernels)
    q_ds = _quantize_values(sf_dir).materialize()

    # pass 1: per-type n/min/max → needed ranks (per-batch partials +
    # driver combine — see _type_meta for the measured ramp argument)
    meta = _type_meta(q_ds)
    if meta.empty:
        # empty events table: every later step would KeyError on the
        # column-less frames — return the schema-carrying empty result
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("event_type", pa.string()), ("p50", pa.float64()), ("p95", pa.float64())]
            ).empty_table()
        )
    info: dict[str, dict] = {}
    for _, row in meta.iterrows():
        n, mn, mx = int(row["n"]), int(row["mn"]), int(row["mx"])
        width = max(1, math.ceil((mx - mn + 1) / _PCT_NBINS))
        ranks: set[int] = set()
        for q in (0.5, 0.95):
            pos = q * (n - 1)
            i = int(np.floor(pos))
            ranks.add(i)
            ranks.add(min(i + 1, n - 1))
        info[row["event_type"]] = {"n": n, "mn": mn, "width": width, "ranks": ranks}
    geom_ref = ray.put({et: (d["mn"], d["width"]) for et, d in info.items()})

    # pass 2: per-type histogram (pre-agg per batch, bounded shuffle)
    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        look = ray.get(geom_ref)
        outs = []
        for et, g in df.groupby("event_type", sort=False):
            mn, width = look[et]
            bins = (g["value_u"].to_numpy() - mn) // width
            ub, cnt = np.unique(bins, return_counts=True)
            outs.append(
                pd.DataFrame(
                    {
                        "event_type": et,
                        "bin": ub.astype("int64"),
                        "c": cnt.astype("int64"),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "bin": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    from ._util import smalltable_fold

    hist = smalltable_fold(
        q_ds.map_batches(hist_partial, batch_format="pandas"),
        lambda df: df.groupby(["event_type", "bin"], as_index=False).agg(
            c=("c", "sum")
        ),
    ).rename(columns={"c": "nb"})

    # locate the bin of every needed rank; remember ranks-below-bin
    rank_bin: dict[str, dict[int, tuple[int, int]]] = {}  # et -> rank -> (bin, below)
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("bin")
        cnts = g["nb"].to_numpy()
        cum = cnts.cumsum()
        below = cum - cnts
        bins_ = g["bin"].to_numpy()
        for r in info[et]["ranks"]:
            idx = int(np.searchsorted(cum, r + 1))
            rank_bin.setdefault(et, {})[r] = (int(bins_[idx]), int(below[idx]))
    tb_ref = ray.put(
        {et: {b for b, _ in d.values()} for et, d in rank_bin.items()}
    )

    # pass 3: (value, count) for target bins only — distinct values per
    # bin are bounded by the bin width, so the collect is bounded even
    # under massive duplication of a single value
    def val_partial(df: pd.DataFrame) -> pd.DataFrame:
        look = ray.get(geom_ref)
        tbs = ray.get(tb_ref)
        outs = []
        for et, g in df.groupby("event_type", sort=False):
            mn, width = look[et]
            tb = tbs.get(et)
            if not tb:
                continue
            v = g["value_u"].to_numpy()
            mask = np.isin((v - mn) // width, list(tb))
            if mask.any():
                uv, cnt = np.unique(v[mask], return_counts=True)
                outs.append(
                    pd.DataFrame(
                        {"event_type": et, "value_u": uv, "c": cnt.astype("int64")}
                    )
                )
        if not outs:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "value_u": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    vals = smalltable_fold(
        q_ds.map_batches(val_partial, batch_format="pandas"),
        lambda df: df.groupby(["event_type", "value_u"], as_index=False).agg(
            c=("c", "sum")
        ),
    ).rename(columns={"c": "n"})

    def rank_value(et: str, r: int) -> int:
        b, below = rank_bin[et][r]
        mn, width = info[et]["mn"], info[et]["width"]
        g = vals[vals["event_type"] == et]
        v = g["value_u"].to_numpy()
        in_bin = (v - mn) // width == b
        bv = np.sort(v[in_bin])
        order = np.argsort(v[in_bin], kind="stable")
        bc = g["n"].to_numpy()[in_bin][order]
        local = r - below
        cum = bc.cumsum()
        return int(bv[np.searchsorted(cum, local + 1)])

    rows = []
    for et in sorted(info):
        n = info[et]["n"]
        out = {"event_type": et}
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            pos = q * (n - 1)
            i = int(np.floor(pos))
            frac = pos - i
            vlo = float(rank_value(et, i))
            vhi = float(rank_value(et, min(i + 1, n - 1)))
            out[col] = _np_lerp(vlo, vhi, frac) / 1e6
        rows.append(out)
    import ray.data as rd

    res = pd.DataFrame(rows)
    res["p50"] = round_half_away(res["p50"], 4)
    res["p95"] = round_half_away(res["p95"], 4)
    # uniform Dataset return type across all queries() entries (a
    # driver consuming results via Dataset methods must not hit one
    # pandas odd-one-out)
    return rd.from_pandas(res)


def _tdigest_compress(means: np.ndarray, weights: np.ndarray, compression: int):
    """Merging t-digest compaction (Dunning's k1-less uniform variant
    with the classic q(1−q) size bound): input centroids sorted by
    mean; greedily merge neighbors while the merged centroid's weight
    stays within 4·total·q(1−q)/δ at its cumulative position.
    Deterministic for a given (mean, weight) multiset — inputs are
    sorted by (mean, weight) first."""
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    cum = 0.0
    cur_m, cur_w = means[0], weights[0]
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + (cur_w + w) / 2.0) / total
        cap = max(1.0, 4.0 * total * q * (1.0 - q) / compression)
        if cur_w + w <= cap:
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _tdigest_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Standard t-digest quantile read: interpolate between centroid
    means at cumulative mid-positions."""
    total = weights.sum()
    cum = weights.cumsum()
    mids = cum - weights / 2.0
    target = q * total
    if target <= mids[0]:
        return float(means[0])
    if target >= mids[-1]:
        return float(means[-1])
    j = int(np.searchsorted(mids, target))
    m0, m1 = means[j - 1], means[j]
    t = (target - mids[j - 1]) / (mids[j] - mids[j - 1])
    return float(m0 + t * (m1 - m0))


def value_percentiles_sketch(sf_dir: str, compression: int = 256):
    """One-pass MERGEABLE-sketch percentiles (t-digest): each batch
    emits ≤ ``compression`` (mean, weight) centroid rows per event
    type; the only shuffle carries centroids (types × batches ×
    compression rows — independent of row count), merged per type by a
    final compaction. Approximate by construction (bounded rank error
    concentrated at the tails — tests/test_events_sketch.py asserts
    the empirical rank-error bound); ``value_percentiles`` is the
    exact multi-pass twin and the driver-verified query. Same output
    schema (event_type, p50, p95)."""

    q_ds = _quantize_values(sf_dir)

    def batch_sketch(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in df.groupby("event_type", sort=False):
            uv, cnt = np.unique(g["value_u"].to_numpy(), return_counts=True)
            m, w = _tdigest_compress(
                uv.astype(np.float64), cnt.astype(np.float64), compression
            )
            outs.append(pd.DataFrame({"event_type": et, "mean": m, "weight": w}))
        if not outs:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "mean": pd.Series([], dtype="float64"),
                    "weight": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    def merge_type(group: pd.DataFrame) -> pd.DataFrame:
        m, w = _tdigest_compress(
            group["mean"].to_numpy(), group["weight"].to_numpy(), compression
        )
        return pd.DataFrame(
            {
                "event_type": [group["event_type"].iloc[0]],
                "p50": [_tdigest_quantile(m, w, 0.5) / 1e6],
                "p95": [_tdigest_quantile(m, w, 0.95) / 1e6],
            }
        )

    return (
        q_ds.map_batches(batch_sketch, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge_type, batch_format="pandas")
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


def sessions_kernel(group: pd.DataFrame) -> pd.DataFrame:
    """All users of one user-complete partition, vectorized: gap flags
    via a per-user shift, session ids via grouped cumsum, then two
    grouped aggregations — no per-user Python. Shared by the
    exchange-based ``sessionize`` and the exchange-FREE
    ``sources.bucketed.sessionize_bucketed`` (correct whenever the
    partition holds every event of each of its users)."""
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


def sessionize(sf_dir: str):
    """Session windows: a >30-minute gap starts a new session. Output:
    per-user session count and the longest session's event count."""

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ub"] = (df["user_id"].to_numpy() % NUM_KEY_BUCKETS).astype(np.int32)
        return df

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("ub")
        .map_groups(sessions_kernel, batch_format="pandas")
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

    # common layout (ub, kind, user_id, ts, event_id, orderkey) —
    # produced identically by both tag functions below; kind 0 = event,
    # 1 = order
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


def range_join_events(sf_dir: str, window_s: int = 3600):
    """RANGE join — the interval sibling of ``asof_last_order`` (Ray
    Data has neither natively): for each event, how many OTHER events
    the same user produced in the trailing window [ts − window_s, ts)
    — the classic "recent activity" feature. Distributed shape:

    1. one tagging pass assigns the user-hash bucket;
    2. groupby(bucket) co-locates each user's events (one Ray group
       per BUCKET, vectorized inside — never per user);
    3. per user, counts come from two vectorized ``searchsorted``
       passes over the user's sorted timestamps (half-open window:
       strictly-before ts, at-or-after ts − window) — O(log) per
       event, no per-pair materialization.

    Output: (event_id, user_id, n_recent_events). DuckDB oracle: the
    equivalent correlated range predicate (tests/test_events_sketch.py)."""

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    win = np.timedelta64(window_s, "s")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ts"] = df["ts"].astype("datetime64[us]")
        df["ub"] = (df["user_id"].to_numpy() % NUM_KEY_BUCKETS).astype(np.int32)
        return df[["event_id", "user_id", "ts", "ub"]]

    def window_count(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].to_numpy()
        counts = np.zeros(len(g), dtype=np.int64)
        # user runs on the sorted frame
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        ends = np.concatenate([starts[1:], [len(u)]])
        for s_, e_ in zip(starts, ends):
            tu = t[s_:e_]
            lo = np.searchsorted(tu, tu - win, side="left")
            hi = np.searchsorted(tu, tu, side="left")  # strictly before
            counts[s_:e_] = hi - lo
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "n_recent_events": counts,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("ub")
        .map_groups(window_count, batch_format="pandas")
    )


def active_users(
    sf_dir: str,
    window_days: int = ACTIVE_USERS_WINDOW_DAYS,
    num_buckets: int = 256,
):
    """Exact daily / trailing-window active users (DAU + WAU) — the
    canonical engagement report whose hard part is COUNT DISTINCT per
    overlapping window at scale. Output per day with ≥1 event:
    ``(day, dau, wau)`` where ``wau`` counts users active in the
    ``window_days`` days ending that day.

    ONE keyed exchange does all the distinct work: per-batch distinct
    ``(day, user)`` rows bucket BY USER, so inside a bucket
    ``drop_duplicates`` is globally exact for both the day grain and
    the window grain (two users never share a bucket's rows, so
    cross-bucket double-counting is structurally impossible). Each
    bucket emits per-day partial DAU counts and — after exploding each
    (day, user) to the ``window_days`` anchors it serves and
    re-deduplicating per (anchor, user) — per-anchor partial WAU
    counts. The final groupby and the driver pivot are
    calendar-bounded (≤ 2 × (#days + window) rows), never user- or
    event-scale. Anchors with no same-day events drop at the pivot,
    matching the SQL twin's inner join."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["ts", "user_id"])

    def day_user(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "day": df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
            }
        ).drop_duplicates()
        out["ub"] = (out["user_id"] % num_buckets).astype(np.int32)
        return out

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        du = g.drop_duplicates(["day", "user_id"])
        dau = du["day"].value_counts()
        days = du["day"].to_numpy(np.int64)
        users = du["user_id"].to_numpy(np.int64)
        off = np.arange(window_days, dtype=np.int64)
        wu = pd.DataFrame(
            {
                "w": (days[:, None] + off[None, :]).ravel(),
                "user_id": np.repeat(users, window_days),
            }
        ).drop_duplicates()
        wau = wu["w"].value_counts()
        return pd.DataFrame(
            {
                "day": np.concatenate(
                    [dau.index.to_numpy(np.int64), wau.index.to_numpy(np.int64)]
                ),
                "kind": ["d"] * len(dau) + ["w"] * len(wau),
                "cnt": np.concatenate([dau.to_numpy(), wau.to_numpy()]).astype(
                    np.int64
                ),
            }
        )

    agg = (
        ds.map_batches(day_user, batch_format="pandas")
        .groupby("ub")
        .map_groups(bucket_counts, batch_format="pandas")
        .groupby(["day", "kind"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # calendar-bounded: ≤ 2 × (#days + window) rows
    )
    if "day" not in agg.columns:  # empty-Dataset schema loss guard
        return pd.DataFrame(
            {
                "day": pd.Series([], dtype=str),
                "dau": pd.Series([], dtype="int64"),
                "wau": pd.Series([], dtype="int64"),
            }
        )
    dau = agg[agg["kind"] == "d"].set_index("day")["cnt"].sort_index()
    wau = agg[agg["kind"] == "w"].set_index("day")["cnt"]
    days = dau.index.to_numpy(np.int64)
    return pd.DataFrame(
        {
            "day": days.astype("datetime64[D]").astype(str),
            "dau": dau.to_numpy(np.int64),
            "wau": wau.reindex(dau.index).to_numpy(np.int64),
        }
    )


def debounce_events(sf_dir: str, gap_s: int = DEBOUNCE_GAP_S):
    """Burst-collapse retention filter — the client-retry / double-fire
    cleaner analytics pipelines run before counting anything: an event
    is DROPPED when the immediately preceding event of the same
    ``(user_id, event_type)`` stream (ordered by ``ts, event_id``)
    arrived within ``gap_s`` seconds. An unbroken chain of sub-gap
    arrivals therefore keeps only its head (consecutive-gap semantics —
    the same rule ``lag()`` expresses in SQL, and the deterministic
    variant of every client-side debouncer).

    Same shape as ``sessionize``: ONE user-hash exchange, per-bucket
    vectorized sort + per-stream ``diff`` — no per-user Python, no
    driver state. Output: the kept rows ``(event_id, user_id,
    event_type, ts)``."""
    ds = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ub"] = (df["user_id"].to_numpy() % NUM_KEY_BUCKETS).astype(np.int32)
        return df

    def debounce_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "event_type", "ts", "event_id"])
        delta = (
            g.groupby(["user_id", "event_type"], sort=False)["ts"]
            .diff()
            .dt.total_seconds()
        )
        keep = ~(delta <= float(gap_s))  # NaN (stream head) keeps
        out = g.loc[keep, ["event_id", "user_id", "event_type", "ts"]]
        return out.reset_index(drop=True)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("ub")
        .map_groups(debounce_bucket, batch_format="pandas")
    )


def anomaly_days(
    sf_dir: str,
    factor_num: int = ANOMALY_FACTOR_NUM,
    factor_den: int = ANOMALY_FACTOR_DEN,
):
    """Per-(event_type, day) volume-spike detection — the monitoring
    query every event pipeline runs: a day is a spike when its count
    exceeds ``factor`` × the trailing-7-calendar-day mean, evaluated in
    PURE INTEGER arithmetic (``7·n·factor_den > factor_num·prev7``) so
    the SQL twin is hash-exact. Days with an empty 7-day history
    (``prev7 = 0``) are never spikes — launch days are new, not
    anomalous. Output: ``(event_type, day, n_events, prev7, is_spike)``.

    Scale shape: ONE (type, day) groupby — the only event-scale work —
    then the spike rule runs on the calendar-bounded result
    (types × days rows, the ``active_users`` driver-pivot precedent);
    missing calendar days contribute zero through a shifted-merge
    accumulation, exactly the SQL twin's RANGE window."""
    from ray.data.aggregate import Count

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def add_day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64),
            }
        )

    agg = (
        ds.map_batches(add_day, batch_format="pandas")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n_events"))
        .to_pandas()  # calendar-bounded: types × days rows
    )
    if "event_type" not in agg.columns:  # empty-Dataset schema loss guard
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=str),
                "day": pd.Series([], dtype=str),
                "n_events": pd.Series([], dtype="int64"),
                "prev7": pd.Series([], dtype="int64"),
                "is_spike": pd.Series([], dtype="int64"),
            }
        )
    agg = agg.sort_values(["event_type", "day"], ignore_index=True)
    cnt = dict(
        zip(zip(agg["event_type"], agg["day"].astype(np.int64)), agg["n_events"])
    )
    days = agg["day"].to_numpy(np.int64)
    types = agg["event_type"].to_numpy(object)
    prev7 = np.zeros(len(agg), dtype=np.int64)
    for off in range(1, 8):  # missing calendar days contribute zero
        prev7 += np.fromiter(
            (cnt.get((t, d - off), 0) for t, d in zip(types, days)),
            dtype=np.int64,
            count=len(agg),
        )
    n = agg["n_events"].to_numpy(np.int64)
    spike = (prev7 > 0) & (7 * n * factor_den > factor_num * prev7)
    return pd.DataFrame(
        {
            "event_type": types,
            "day": days.astype("datetime64[D]").astype(str),
            "n_events": n,
            "prev7": prev7,
            "is_spike": spike.astype(np.int64),
        }
    )


def trimmed_stats(sf_dir: str, trim_pct: int = TRIMMED_STATS_TRIM_PCT):
    """Robust per-type mean: trim the lowest and highest
    ``k = n·trim_pct // 100`` OBSERVATIONS (rank-based — the classic
    trimmed-mean definition, so the whole computation stays in exact
    integer arithmetic; no interpolated thresholds) and average the
    rest. Types where trimming exhausts the group emit no row, like
    the SQL twin's empty group. Output: ``(event_type, n_events,
    n_trimmed, trimmed_mean)``.

    Scale shape — the ``value_percentiles`` discipline, two bounded
    passes after the tiny meta aggregate, the driver only ever sees
    metadata:

    1. per-type ``(n, sum)`` aggregate → ``k`` and the two boundary
       ranks ``k`` and ``n−k−1``;
    2. per-type fixed-width histogram carrying per-bin COUNT and SUM
       (pre-agg per batch; ≤ types × 4096 bin rows shuffle) locates
       each boundary rank's bin and the exact below-bin prefix
       count/sum;
    3. a (value, count) collect over ONLY the two boundary bins
       resolves the boundary values and in-bin prefixes — then
       ``lowest_k_sum = below_sum + (k − below_cnt)·v_lo`` (dually for
       the top) and ``trimmed_mean`` is one division of exact ints.
       Int64 bound: per-bin micro-unit sums need Σ|value_u| < 2⁶³ per
       (type, bin) — ~9·10⁹ rows of 10⁹-micro values; shard bins past
       that (documented, not silent)."""
    import math

    import ray

    q_ds = _quantize_values(sf_dir).materialize()

    # per-batch partials + driver combine (see _type_meta) — saves the
    # ~3 s keyed-aggregate ramp per execution
    meta = _type_meta(q_ds, want_sum=True)
    if meta.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=str),
                "n_events": pd.Series([], dtype="int64"),
                "n_trimmed": pd.Series([], dtype="int64"),
                "trimmed_mean": pd.Series([], dtype="float64"),
            }
        )
    info: dict[str, dict] = {}
    for _, row in meta.iterrows():
        et = row["event_type"]
        n, total = int(row["n"]), int(row["s"])
        k = n * trim_pct // 100
        mn, mx = int(row["mn"]), int(row["mx"])
        width = max(1, math.ceil((mx - mn + 1) / _PCT_NBINS))
        info[et] = {"n": n, "total": total, "k": k, "mn": mn, "width": width}
    geom_ref = ray.put({et: (d["mn"], d["width"]) for et, d in info.items()})

    # per-type (count, sum) histogram as ONE elementwise_fold row —
    # the (T × 4096 × 2) state is metadata-bounded (64 KB per type per
    # blob; a corpus with thousands of event types would switch this
    # pass back to the keyed-groupby shape) and skips the ~5 s fixed
    # aggregator ramp a (type, bin) groupby pays per execution
    from ._util import elementwise_fold

    types = sorted(info)
    t_idx = {et: i for i, et in enumerate(types)}
    n_types = len(types)

    def hist_batch(df: pd.DataFrame) -> np.ndarray:
        look = ray.get(geom_ref)
        out = np.zeros((n_types, _PCT_NBINS, 2), dtype=np.int64)
        for et, g in df.groupby("event_type", sort=False):
            mn, width = look[et]
            v = g["value_u"].to_numpy()
            bins = (v - mn) // width
            ti = t_idx[et]
            np.add.at(out[ti, :, 0], bins, 1)
            np.add.at(out[ti, :, 1], bins, v)
        return out

    hist_arr = elementwise_fold(
        q_ds, hist_batch, np.add, np.int64, (n_types, _PCT_NBINS, 2)
    )

    # locate the two boundary ranks' bins + exact below-bin prefixes
    bounds: dict[str, dict] = {}
    for et in types:
        d = info[et]
        n, k = d["n"], d["k"]
        if n - 2 * k <= 0:
            continue
        cnts = hist_arr[t_idx[et], :, 0]
        sums = hist_arr[t_idx[et], :, 1]
        cum_c, cum_s = cnts.cumsum(), sums.cumsum()
        ent = {}
        for tag, r in (("lo", k), ("hi", n - k - 1)):
            idx = int(np.searchsorted(cum_c, r + 1))
            ent[tag] = {
                "bin": int(idx),
                "below_c": int(cum_c[idx] - cnts[idx]),
                "below_s": int(cum_s[idx] - sums[idx]),
            }
        bounds[et] = ent
    tb_ref = ray.put(
        {et: {e["lo"]["bin"], e["hi"]["bin"]} for et, e in bounds.items()}
    )

    def val_partial(df: pd.DataFrame) -> pd.DataFrame:
        look = ray.get(geom_ref)
        tbs = ray.get(tb_ref)
        outs = []
        for et, g in df.groupby("event_type", sort=False):
            tb = tbs.get(et)
            if not tb:
                continue
            mn, width = look[et]
            v = g["value_u"].to_numpy()
            mask = np.isin((v - mn) // width, list(tb))
            if mask.any():
                uv, cnt = np.unique(v[mask], return_counts=True)
                outs.append(
                    pd.DataFrame(
                        {"event_type": et, "value_u": uv, "c": cnt.astype("int64")}
                    )
                )
        if not outs:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "value_u": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    from ._util import smalltable_fold

    # combine keeps the partials' schema (fold passes re-apply it)
    vals = smalltable_fold(
        q_ds.map_batches(val_partial, batch_format="pandas"),
        lambda df: df.groupby(["event_type", "value_u"], as_index=False).agg(
            c=("c", "sum")
        ),
    ).rename(columns={"c": "n"})

    rows = []
    for et in sorted(bounds):
        d, ent = info[et], bounds[et]
        n, k, total = d["n"], d["k"], d["total"]
        mn, width = d["mn"], d["width"]
        g = vals[vals["event_type"] == et]
        v_all = g["value_u"].to_numpy()
        c_all = g["n"].to_numpy()

        def resolve(tag: str, rank: int) -> tuple[int, int, int]:
            """boundary value + exact (count, sum) strictly below it"""
            e = ent[tag]
            in_bin = (v_all - mn) // width == e["bin"]
            order = np.argsort(v_all[in_bin], kind="stable")
            bv, bc = v_all[in_bin][order], c_all[in_bin][order]
            cum = bc.cumsum()
            j = int(np.searchsorted(cum, rank - e["below_c"] + 1))
            val = int(bv[j])
            blw_c = e["below_c"] + int(cum[j] - bc[j])
            blw_s = e["below_s"] + int((bv[:j] * bc[:j]).sum())
            return val, blw_c, blw_s

        v_lo, blo_c, blo_s = resolve("lo", k)
        v_hi, bhi_c, bhi_s = resolve("hi", n - k - 1)
        lowest = blo_s + (k - blo_c) * v_lo
        # above v_hi: everything minus (≤ v_hi) = total − below_hi − all at v_hi ≤ rank...
        # count ≤ v_hi via the hi boundary: below_c(hi) + count(v == v_hi)
        at_hi = int(c_all[(v_all == v_hi)].sum())
        le_hi_c = bhi_c + at_hi
        le_hi_s = bhi_s + at_hi * v_hi
        above_c = n - le_hi_c
        above_s = total - le_hi_s
        highest = above_s + (k - above_c) * v_hi
        kept_n = n - 2 * k
        ts = total - lowest - highest
        mean = round_half_away(pd.Series([ts / 1e6 / kept_n]), 4).iloc[0]
        rows.append((et, n, 2 * k, mean))
    return pd.DataFrame(
        rows, columns=["event_type", "n_events", "n_trimmed", "trimmed_mean"]
    ).astype({"n_events": "int64", "n_trimmed": "int64"})


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_S = 3600


def funnel_conversions(
    sf_dir: str,
    steps: tuple = FUNNEL_STEPS,
    window_s: int = FUNNEL_WINDOW_S,
):
    """Per-user three-step funnel conversion — the product-analytics
    query behind every acquisition dashboard: a ``purchase`` at time
    ``t`` CONVERTS when some ``click`` happened strictly before it and
    some ``view`` strictly before that click, all strictly inside the
    trailing window ``(t - window_s, t)``. Output per user with ≥1
    purchase: ``(user_id, n_purchases, n_converted)``.

    The existence test is order-monotone, so it vectorizes exactly:
    for each purchase, the EARLIEST view after ``t - window_s``
    maximizes click availability — converted ⟺ some click lies in
    ``(that view, t)``. Three ``searchsorted`` probes per purchase
    against the user's sorted view/click time arrays replace the SQL
    twin's correlated EXISTS; strict inequalities match the twin's
    ``>`` / ``<`` everywhere.

    Scale shape: ONE user-hash exchange (two users never share a
    bucket's per-user arrays), per-bucket vectorized numpy — no
    per-user Python loops over events, no driver state; the step
    filter prunes every other event type at the read."""
    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts"])
    s_view, s_click, s_buy = steps

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin([s_view, s_click, s_buy])].copy()
        df["ub"] = (df["user_id"].to_numpy() % NUM_KEY_BUCKETS).astype(np.int32)
        return df

    win_us = np.int64(window_s) * 1_000_000

    def funnel_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized — no per-user Python loop: each user's
        # timestamps shift into a DISJOINT int64 range (user ordinal ×
        # span), so ONE global searchsorted per step respects user
        # boundaries; an out-of-segment hit lands in another user's
        # range and the strict comparisons below reject it. Headroom:
        # ordinal ≤ bucket users, span = ts spread + window + 2 —
        # overflow would need users × span ≥ 2^63 (≈ 10⁵ years of µs
        # spread × 10⁶ users per bucket), checked below.
        g = group.sort_values(["user_id", "ts"])
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        users = g["user_id"].to_numpy(dtype=np.int64)
        kinds = g["event_type"].to_numpy()
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_purchases": pd.Series([], dtype="int64"),
                "n_converted": pd.Series([], dtype="int64"),
            }
        )
        if not len(ts):
            return empty
        uniq, ordinal = np.unique(users, return_inverse=True)
        t0 = ts.min()
        span = int(ts.max() - t0) + int(win_us) + 2
        if len(uniq) * span >= 2**62:
            raise OverflowError("funnel_conversions offset headroom exceeded")
        shifted = (ts - t0) + ordinal * span  # sorted: g is (user, ts)-sorted
        is_buy = kinds == s_buy
        views = shifted[kinds == s_view]
        clicks = shifted[kinds == s_click]
        buys = shifted[is_buy]
        buy_ord = ordinal[is_buy]
        if not len(buys):
            return empty
        conv = np.zeros(len(buys), dtype=bool)
        if len(views) and len(clicks):
            # earliest view STRICTLY after t - window; the probe
            # `buys - win_us` can underflow into the PREVIOUS user's
            # range (a buy near its range start), so clamp to this
            # user's view-segment start — LATER-user leakage needs no
            # clamp: those views/clicks sit ≥ one whole span above the
            # buy and the final c1 < buys rejects them
            vi = np.searchsorted(views, buys - win_us, side="right")
            vi = np.maximum(vi, np.searchsorted(views, buy_ord * span, side="left"))
            has_v = vi < len(views)
            v1 = views[np.minimum(vi, len(views) - 1)]
            # any click STRICTLY after that view and before t (v1 in
            # this user's range ⇒ earlier users' clicks all sort below)
            ci = np.searchsorted(clicks, v1, side="right")
            has_c = ci < len(clicks)
            c1 = clicks[np.minimum(ci, len(clicks) - 1)]
            conv = has_v & has_c & (c1 < buys)
        n_buys = np.bincount(buy_ord, minlength=len(uniq))
        n_conv = np.bincount(buy_ord, weights=conv.astype(np.float64), minlength=len(uniq)).astype(np.int64)
        keep = n_buys > 0
        return pd.DataFrame(
            {
                "user_id": uniq[keep],
                "n_purchases": n_buys[keep].astype(np.int64),
                "n_converted": n_conv[keep],
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("ub")
        .map_groups(funnel_bucket, batch_format="pandas")
    )


def cohort_retention(
    sf_dir: str,
    week_days: int = COHORT_WEEK_DAYS,
    num_buckets: int = NUM_KEY_BUCKETS,
):
    """Weekly cohort-retention matrix — the growth report every
    training-data/product pipeline runs over its event log: users
    cohort by the calendar week of their FIRST event, and each
    ``(cohort_week, week_offset)`` cell counts the distinct cohort
    members active ``week_offset`` weeks after their own first day.
    Output: ``(cohort_week, week_offset, n_users)`` — ``cohort_week``
    in epoch weeks (``first_day // week_days``), ``week_offset`` =
    ``(day - first_day) // week_days`` relative to the user's OWN
    first day (the standard user-anchored retention definition).

    Scale shape (the ``active_users`` idiom): per-batch distinct
    ``(day, user)`` rows bucket BY USER, so a user's whole history
    lands in ONE bucket and both the per-user ``min(day)`` and the
    distinct ``(cohort_week, week_offset, user)`` cell set are
    globally exact inside the bucket — cross-bucket double counting is
    structurally impossible. Each bucket emits calendar-bounded
    partial counts (≤ #weeks² rows), the final keyed groupby sums
    partials, and the driver never sees user- or event-scale rows.
    Pure integer day/week arithmetic throughout (hash-exact twin)."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["ts", "user_id"])

    def day_user(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "day": df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
            }
        ).drop_duplicates()
        out["ub"] = (out["user_id"] % num_buckets).astype(np.int32)
        return out

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        du = g.drop_duplicates(["day", "user_id"])
        days = du["day"].to_numpy(np.int64)
        first = du.groupby("user_id")["day"].transform("min").to_numpy(np.int64)
        cells = pd.DataFrame(
            {
                # epoch days are non-negative and offsets are ≥ 0, so
                # C-truncating // IS floor division — matches the twin
                "cohort_week": first // week_days,
                "week_offset": (days - first) // week_days,
                "user_id": du["user_id"].to_numpy(np.int64),
            }
        ).drop_duplicates()
        part = (
            cells.groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        part["n_users"] = part["n_users"].astype(np.int64)
        return part

    agg = (
        ds.map_batches(day_user, batch_format="pandas")
        .groupby("ub")
        .map_groups(bucket_cells, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()  # calendar-bounded: ≤ #weeks² cells
    )
    if "cohort_week" not in agg.columns:  # empty-Dataset schema loss guard
        return pd.DataFrame(
            {
                "cohort_week": pd.Series([], dtype="int64"),
                "week_offset": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64"),
            }
        )
    agg["cohort_week"] = agg["cohort_week"].astype(np.int64)
    agg["week_offset"] = agg["week_offset"].astype(np.int64)
    agg["n_users"] = agg["n_users"].astype(np.int64)
    return agg[["cohort_week", "week_offset", "n_users"]]


P_SCALE = 1_000_000  # transition-probability quantizer (exact int64)


def transition_pairs_kernel(group: pd.DataFrame) -> pd.DataFrame:
    """Per-user-complete transition-pair partial counts — shared by the
    exchange-based ``event_transitions`` and the exchange-free
    ``sources.bucketed.transitions_bucketed`` (correct whenever the
    partition holds every event of each of its users)."""
    g = group.sort_values(["user_id", "ts", "event_id"])
    same_user = g["user_id"].to_numpy() == np.roll(g["user_id"].to_numpy(), 1)
    if len(same_user):
        same_user[0] = False
    prev = g["event_type"].shift(1)
    pairs = pd.DataFrame(
        {"prev_type": prev.to_numpy(), "next_type": g["event_type"].to_numpy()}
    )[same_user]
    part = (
        pairs.groupby(["prev_type", "next_type"], sort=False)
        .size()
        .reset_index(name="n")
    )
    part["n"] = part["n"].astype(np.int64)
    return part


def event_transitions(
    sf_dir: str, num_buckets: int = NUM_KEY_BUCKETS, p_scale: int = P_SCALE
):
    """Per-user next-event Markov transition matrix — the event-stream
    bigram model behind funnel design and session-LM features: for
    every ordered pair of consecutive events of one user (ordered by
    ``(ts, event_id)``; event_id is unique so the order is total),
    count the ``prev_type → next_type`` transition and quantize its
    row-conditional probability to exact integers
    (``p_u = n * P_SCALE // row_total``). Output one row per observed
    transition: ``(prev_type, next_type, n, p_u)``.

    Distributed shape: adjacency is a per-user property, so ONE
    user-hash keyed exchange (the sessionize idiom) co-locates each
    user's events; inside a bucket the pair extraction is a vectorized
    shift-compare (no per-user Python). Each bucket emits ≤ T² partial
    rows (T = #event types — METADATA-bounded), so the final merge is
    a ``smalltable_fold``, never a second keyed exchange. The driver
    holds ≤ fan·T² rows at any point.

    int64 headroom: ``n·P_SCALE`` must fit — guarded, raises past
    ~9.2e12 transitions per cell (the asserted-cap pattern)."""
    from ._util import smalltable_fold

    ds = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ub"] = (df["user_id"].to_numpy() % num_buckets).astype(np.int32)
        return df

    partials = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("ub")
        .map_groups(transition_pairs_kernel, batch_format="pandas")
    )
    merged = smalltable_fold(
        partials,
        lambda df: df.groupby(["prev_type", "next_type"], as_index=False)["n"].sum(),
    )
    return transitions_finish(merged, p_scale)


def transitions_finish(merged: pd.DataFrame, p_scale: int = P_SCALE) -> pd.DataFrame:
    """Quantized-probability finish over the T²-bounded merged counts —
    shared by ``event_transitions`` and the bucketed-layout consumer."""
    if not len(merged) or "prev_type" not in merged.columns:
        return pd.DataFrame(
            {
                "prev_type": pd.Series([], dtype=str),
                "next_type": pd.Series([], dtype=str),
                "n": pd.Series([], dtype="int64"),
                "p_u": pd.Series([], dtype="int64"),
            }
        )
    merged = merged.copy()
    merged["n"] = merged["n"].astype(np.int64)
    if merged["n"].max() > (2**63 - 1) // p_scale:
        raise OverflowError("transition count exceeds the P_SCALE int64 headroom")
    tot = merged.groupby("prev_type")["n"].transform("sum").astype(np.int64)
    merged["p_u"] = (merged["n"] * int(p_scale)) // tot
    return merged.sort_values(
        ["prev_type", "next_type"], ignore_index=True
    )[["prev_type", "next_type", "n", "p_u"]]


INTERVAL_MIN_US = 1_000_000  # every event occupies at least 1 s


def coalesce_intervals(sf_dir: str, num_buckets: int = NUM_KEY_BUCKETS):
    """Per-user interval union (gaps-and-islands): each event occupies
    ``[ts, ts + dur)`` where ``dur`` derives from the event's value in
    exact integer microseconds (``|floor(value·1e6 + 0.5)| +
    INTERVAL_MIN_US``); overlapping or touching intervals of one user
    merge into islands. The canonical coverage/uptime computation —
    sessionize's sibling where extents matter, not gaps. Output one row
    per island: ``(user_id, start_us, end_us, n_events)``.

    Distributed shape: island membership is a per-user property, so
    ONE user-hash keyed exchange co-locates each user's intervals;
    inside a bucket the island scan is vectorized (sort by
    ``(s, e, event_id)``, per-user shifted cummax of ``e``, island ids
    by grouped cumsum — no per-user Python). Output is data-sized and
    stays a Dataset; nothing collects to the driver. A strictly-later
    start (``s > prev_max``) opens an island, so touching intervals
    (``s == prev_max``) merge — the SQL twin encodes the identical
    strictness."""
    ds = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )

    def to_intervals(df: pd.DataFrame) -> pd.DataFrame:
        s = df["ts"].astype("datetime64[us]").astype("int64")
        value_u = np.floor(df["value"].to_numpy(np.float64) * 1e6 + 0.5).astype(
            np.int64
        )
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "s": s,
                "e": s + np.abs(value_u) + INTERVAL_MIN_US,
                "event_id": df["event_id"].astype("int64"),
                "ub": (df["user_id"].to_numpy() % num_buckets).astype(np.int32),
            }
        )

    def bucket_islands(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "s", "e", "event_id"])
        u = g["user_id"].to_numpy()
        e_cummax = g.groupby("user_id", sort=False)["e"].cummax()
        prev_max = e_cummax.shift(1).to_numpy()
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        new_island = first | (g["s"].to_numpy() > np.where(first, -(2**62), prev_max))
        island = np.cumsum(new_island)
        agg = g.groupby([u, island], sort=False).agg(
            start_us=("s", "min"), end_us=("e", "max"), n_events=("s", "size")
        )
        return pd.DataFrame(
            {
                "user_id": agg.index.get_level_values(0).astype("int64"),
                "start_us": agg["start_us"].astype("int64").to_numpy(),
                "end_us": agg["end_us"].astype("int64").to_numpy(),
                "n_events": agg["n_events"].astype("int64").to_numpy(),
            }
        )

    return (
        ds.map_batches(to_intervals, batch_format="pandas")
        .groupby("ub")
        .map_groups(bucket_islands, batch_format="pandas")
    )


COOC_SCALE = 1_000_000  # lift quantizer (exact int64 rational ranking)


def event_cooccurrence(sf_dir: str, num_buckets: int = NUM_KEY_BUCKETS):
    """Event-type co-occurrence (market-basket over user baskets): for
    every unordered pair of DISTINCT event types a user has ever
    emitted, count co-occurring users and rank by quantized lift —
    the association signal behind co-click features and negative-
    sampling tables. Output one row per observed pair
    ``(type_a, type_b, n_users, lift_u)`` with ``type_a < type_b`` and
    ``lift_u = (n_users · n_total_users · COOC_SCALE) // (n_a · n_b)``
    — an exact integer rational, so ranking equals the SQL twin's
    bit-for-bit (the collocations log-free discipline).

    Distributed shape: basket membership is per-user, so per-batch
    distinct ``(user, type)`` rows take ONE user-hash keyed exchange;
    inside a bucket the pair expansion is a vectorized per-user
    self-merge (the type universe T is metadata-bounded, so the
    fan-out is ≤T²/2 rows per user — C-speed hash join, no per-user
    Python). Each bucket emits ≤T² pair partials, ≤T per-type user
    counts, and one total-users row — all METADATA-bounded — so the
    finish is one ``smalltable_fold``, never a second exchange."""
    from ._util import smalltable_fold

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "event_type"])

    def distinct_pairs_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "event_type"]].drop_duplicates().copy()
        out["ub"] = (out["user_id"].to_numpy() % num_buckets).astype(np.int32)
        return out

    def bucket_partials(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["user_id", "event_type"]].drop_duplicates()
        m = g.merge(g, on="user_id", suffixes=("_a", "_b"))
        pairs = (
            m[m["event_type_a"] < m["event_type_b"]]
            .groupby(["event_type_a", "event_type_b"], sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={"event_type_a": "type_a", "event_type_b": "type_b"})
        )
        pairs.insert(0, "kind", "pair")
        singles = (
            g.groupby("event_type", sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={"event_type": "type_a"})
        )
        singles.insert(0, "kind", "single")
        singles["type_b"] = ""
        total = pd.DataFrame(
            {"kind": ["total"], "type_a": [""], "type_b": [""],
             "n": [g["user_id"].nunique()]}
        )
        out = pd.concat(
            [pairs, singles[["kind", "type_a", "type_b", "n"]], total],
            ignore_index=True,
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    merged = smalltable_fold(
        ds.map_batches(distinct_pairs_batch, batch_format="pandas")
        .groupby("ub")
        .map_groups(bucket_partials, batch_format="pandas"),
        lambda df: df.groupby(["kind", "type_a", "type_b"], as_index=False)["n"].sum(),
    )
    if not len(merged) or "kind" not in merged.columns:
        return pd.DataFrame(
            {
                "type_a": pd.Series([], dtype=str),
                "type_b": pd.Series([], dtype=str),
                "n_users": pd.Series([], dtype="int64"),
                "lift_u": pd.Series([], dtype="int64"),
            }
        )
    total = int(merged.loc[merged["kind"] == "total", "n"].sum())
    singles = (
        merged[merged["kind"] == "single"].set_index("type_a")["n"].astype(np.int64)
    )
    pairs = merged[merged["kind"] == "pair"].copy()
    if len(pairs):
        na = singles.reindex(pairs["type_a"]).to_numpy(np.int64)
        nb = singles.reindex(pairs["type_b"]).to_numpy(np.int64)
        n = pairs["n"].to_numpy(np.int64)
        # int64 headroom for both the numerator and the na·nb product
        if int(n.max()) * total > (2**63 - 1) // COOC_SCALE or total > 3_000_000_000:
            raise OverflowError("co-occurrence counts exceed the lift headroom")
        pairs["lift_u"] = (n * total * COOC_SCALE) // (na * nb)
    else:
        pairs["lift_u"] = pd.Series([], dtype="int64")
    pairs = pairs.rename(columns={"n": "n_users"})
    return pairs.sort_values(["type_a", "type_b"], ignore_index=True)[
        ["type_a", "type_b", "n_users", "lift_u"]
    ]


HLL_P_DAILY = 12  # 4096 registers/day: ~1.6% standard error
MAX_DAY_SPAN = 4096  # calendar-bounded fold guard


def daily_active_hll(sf_dir: str, p: int = HLL_P_DAILY):
    """Approximate DAU per day via per-key HyperLogLog — the grouped
    sibling of ``text.distinct_count_hll`` and the sketch that answers
    "distinct users per day over a 10¹²-event stream" with ZERO keyed
    exchanges: every batch reduces to ONE (days, 2^p) uint8 register
    grid, grids merge by elementwise MAX (associative + idempotent —
    any layout/retry gives the same registers) through
    ``elementwise_fold``, and the per-day estimates come off the single
    merged grid. The exact companion is ``active_users`` (one keyed
    exchange); this is the 100-TB first-pass whose accuracy is pinned
    against it (tests/test_events_sketch.py pattern).

    The day span is calendar-bounded: a (2,) MIN/MAX fold sizes the
    grid and refuses spans past MAX_DAY_SPAN rather than folding an
    unbounded axis. Returns a pandas frame ``(day, dau_est)`` with
    ``day`` in epoch days (matching the twin-op grain)."""
    import hashlib

    from ._util import elementwise_fold

    m = 1 << p
    US_PER_DAY = 86_400_000_000

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["ts", "user_id"]).materialize()

    def day_minmax(df: pd.DataFrame) -> np.ndarray:
        d = df["ts"].astype("datetime64[us]").astype("int64") // US_PER_DAY
        return np.array([d.min(), -d.max()], dtype=np.int64)

    mm = elementwise_fold(ds, day_minmax, np.minimum, np.int64, (2,))
    lo, hi = int(mm[0]), int(-mm[1])
    span = hi - lo + 1
    if span <= 0:
        return pd.DataFrame(
            {"day": pd.Series([], dtype="int64"), "dau_est": pd.Series([], dtype=float)}
        )
    if span > MAX_DAY_SPAN:
        raise ValueError(f"day span {span} exceeds the bounded fold guard")

    def batch_grid(df: pd.DataFrame) -> np.ndarray:
        # uint8 registers: ranks ≤ 64-p+1 ≤ 53, and the blob is 8×
        # smaller on the wire than int64
        M = np.zeros((span, m), dtype=np.uint8)
        day = (
            df["ts"].astype("datetime64[us]").astype("int64") // US_PER_DAY - lo
        ).to_numpy(np.int64)
        pairs = pd.DataFrame({"d": day, "u": df["user_id"].astype("int64")})
        pairs = pairs.drop_duplicates()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(f"u|{int(u)}".encode()).digest()[:8], "little")
                for u in pairs["u"]
            ),
            dtype=np.uint64,
            count=len(pairs),
        )
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
        # leading-zero masked scan (the distinct_count_hll kernel)
        rank = np.zeros(len(h), dtype=np.int64)
        alive = np.ones(len(h), dtype=bool)
        cur = rest.copy()
        for _ in range(64 - p):
            top_zero = (cur >> np.uint64(63)) == 0
            rank += (alive & top_zero).astype(np.int64)
            alive &= top_zero
            if not alive.any():
                break
            cur = cur << np.uint64(1)
        np.maximum.at(M, (pairs["d"].to_numpy(np.int64), reg), (rank + 1).astype(np.uint8))
        return M

    G = elementwise_fold(ds, batch_grid, np.maximum, np.uint8, (span, m)).astype(
        np.float64
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-G), axis=1)
    zeros = (G == 0).sum(axis=1)
    small = (raw <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        linear = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1), 1.0))
    est = np.where(small, linear, raw)
    active = G.max(axis=1) > 0  # days with no events drop, like the exact op
    days = np.arange(lo, hi + 1, dtype=np.int64)[active]
    return pd.DataFrame({"day": days, "dau_est": est[active]})
