"""The exact distributed percentile path and its mergeable t-digest
twin (pipelines/events.py).

- the rewritten exact ``value_percentiles`` (histogram rank-locate, no
  per-group materialization) is bit-identical to the straightforward
  single-array np.percentile computation — same contract the r2
  single-group version satisfied against DuckDB's quantile_cont;
- the t-digest sketch is within a small empirical rank error of exact
  on a skewed distribution, deterministic across runs, and its
  centroid count is bounded (the mergeability/scale contract).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, ets, values) -> str:
    ts = pd.to_datetime(np.arange(len(values)), unit="s", origin="2024-01-01")
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(ets, pa.string()),
                "value": pa.array(values, pa.float64()),
                "ts": pa.array(ts),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    return str(tmp_path)


def test_exact_path_matches_np_percentile(ray_session):
    from pdf_ocr_api_ray.pipelines._util import round_half_away
    from pdf_ocr_api_ray.pipelines.events import value_percentiles

    out = value_percentiles(SF).to_pandas().sort_values("event_type", ignore_index=True)

    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"]).to_pandas()
    ev["value_u"] = np.floor(ev["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    rows = []
    for et, g in ev.groupby("event_type"):
        v = np.sort(g["value_u"].to_numpy())
        rows.append(
            {
                "event_type": et,
                "p50": np.percentile(v, 50, method="linear") / 1e6,
                "p95": np.percentile(v, 95, method="linear") / 1e6,
            }
        )
    exp = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    exp["p50"] = round_half_away(exp["p50"], 4)
    exp["p95"] = round_half_away(exp["p95"], 4)
    pd.testing.assert_frame_equal(out, exp)


def test_exact_path_massive_duplication_in_one_bin(ray_session, tmp_path):
    """10⁴ copies of one value dominating a bin: the (value, count)
    pre-agg keeps the target-bin collect tiny and ranks land inside
    the duplicated run correctly."""
    from pdf_ocr_api_ray.pipelines.events import value_percentiles

    rng = np.random.RandomState(3)
    vals = np.concatenate([np.full(10_000, 42.0), rng.uniform(0, 100, 500)])
    ets = ["dup"] * len(vals)
    sf = _write_events(tmp_path, ets, vals)
    out = value_percentiles(sf).to_pandas()
    v_u = np.sort(np.floor(vals * 1e6 + 0.5).astype(np.int64))
    assert out.loc[0, "p50"] == pytest.approx(np.percentile(v_u, 50) / 1e6, abs=1e-4)
    assert out.loc[0, "p95"] == pytest.approx(np.percentile(v_u, 95) / 1e6, abs=1e-4)


def test_sketch_rank_error_bound(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.events import value_percentiles_sketch

    rng = np.random.RandomState(11)
    parts, ets = [], []
    for et, n in (("a", 30_000), ("b", 20_000)):
        vals = np.exp(rng.normal(3.0, 1.0, n))  # skewed lognormal
        parts.append(vals)
        ets.extend([et] * n)
    vals = np.concatenate(parts)
    sf = _write_events(tmp_path, ets, vals)

    out = value_percentiles_sketch(sf).to_pandas().set_index("event_type")
    ev = pd.DataFrame({"event_type": ets, "value": vals})
    ev["value_u"] = np.floor(ev["value"] * 1e6 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        v = np.sort(g["value_u"].to_numpy()) / 1e6
        n = len(v)
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            est = out.loc[et, col]
            rank = np.searchsorted(v, est) / n
            assert abs(rank - q) < 0.02, (et, col, rank, q)


def test_sketch_deterministic_and_bounded(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.events import (
        _tdigest_compress,
        value_percentiles_sketch,
    )

    rng = np.random.RandomState(5)
    vals = rng.gamma(2.0, 10.0, 25_000)
    sf = _write_events(tmp_path, ["x"] * len(vals), vals)
    a = value_percentiles_sketch(sf).to_pandas().sort_values("event_type", ignore_index=True)
    b = value_percentiles_sketch(sf).to_pandas().sort_values("event_type", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)

    # mergeability/scale contract: compaction bounds centroid count
    # independent of input size (the greedy uniform-cap variant lands
    # around 4δ, vs the k1-scale-function digest's 2δ — the constant
    # doesn't matter for the shuffle-volume argument, n-independence does)
    m, w = _tdigest_compress(
        np.sort(rng.uniform(0, 1, 50_000)), np.ones(50_000), compression=256
    )
    assert len(m) <= 6 * 256
    assert w.sum() == 50_000
    m2, w2 = _tdigest_compress(
        np.sort(rng.uniform(0, 1, 500_000)), np.ones(500_000), compression=256
    )
    assert len(m2) <= 6 * 256  # 10× the data, same centroid budget
    assert w2.sum() == 500_000


def test_range_join_events_matches_sql(ray_session):
    import duckdb

    from pdf_ocr_api_ray.pipelines.events import range_join_events

    got = (
        range_join_events(SF)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(
        """
        SELECT e.event_id, e.user_id,
               (SELECT count(*) FROM events o
                 WHERE o.user_id = e.user_id
                   AND o.ts < e.ts
                   AND o.ts >= e.ts - INTERVAL 1 HOUR) AS n_recent_events
        FROM events e ORDER BY e.event_id
        """
    ).df()
    assert len(got) == len(exp)
    assert got["n_recent_events"].sum() > 0  # non-degenerate window
    pd.testing.assert_frame_equal(got, exp.astype("int64"))


def test_json_props_stats_all_null_group(ray_session, tmp_path):
    """ADVICE r3: an event_type whose props are ALL NULL/malformed must
    aggregate to a NULL sum/max (SQL semantics), not crash the int
    cast; groups with any valid k keep the plain int64 path."""
    from pdf_ocr_api_ray.pipelines.events import json_props_stats

    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(
                    ["dead", "dead", "dead", "live", "live"], pa.string()
                ),
                "props": pa.array(
                    [None, "not json", '{"x": 1}', '{"k": 3}', None], pa.string()
                ),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    out = (
        json_props_stats(str(tmp_path))
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    dead = out[out["event_type"] == "dead"].iloc[0]
    live = out[out["event_type"] == "live"].iloc[0]
    assert dead["n_events"] == 3
    assert pd.isna(dead["sum_k"]) and pd.isna(dead["max_k"])
    assert live["n_events"] == 2 and live["sum_k"] == 3 and live["max_k"] == 3


def test_distinct_count_hll_error_bound(ray_session, tmp_path):
    """HLL estimate within 5% of the exact distinct-token count in BOTH
    regimes: the testdata corpus (31 distinct → linear counting) and a
    planted 50k-token vocabulary (raw HLL estimate path). Registers
    merge by MAX so the result is independent of block layout."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import distinct_count_hll

    small = distinct_count_hll("/root/testdata/sf0.001")
    assert abs(small["estimate"] - 31) / 31 < 0.05

    # synthetic: 2,000 docs × 25 unique tokens each = 50,000 distinct
    rng = np.random.default_rng(11)
    rows = []
    tok = 0
    for d in range(2000):
        words = [f"w{tok + j:06d}" for j in range(25)]
        tok += 25
        rng.shuffle(words)
        rows.append((d, " ".join(words)))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s0"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    big = distinct_count_hll(str(tmp_path))
    assert abs(big["estimate"] - 50_000) / 50_000 < 0.05, big


def test_freq_sketch_cms_bounds(ray_session, tmp_path):
    """CMS never undercounts; planted heavy tokens estimate exactly in
    a sparse corpus; overshoot stays within the e/width × N bound."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import cms_estimate, freq_sketch_cms

    # 500 docs: 'alpha' x3 each (1500), 'beta' x1 each (500), plus a
    # long tail of unique tokens (4 per doc = 2000 singletons)
    rows = []
    for d in range(500):
        tail = " ".join(f"u{d:04d}x{j}" for j in range(4))
        rows.append((d, f"alpha alpha alpha beta {tail}"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s0"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    sk = freq_sketch_cms(str(tmp_path))
    assert sk["n_tokens"] == 500 * 8
    true = {"alpha": 1500, "beta": 500, "u0000x0": 1, "absent-token": 0}
    est = cms_estimate(sk, list(true))
    bound = np.e / sk["width"] * sk["n_tokens"]  # ≈ 5.3 here
    for (tok, n), e in zip(true.items(), est):
        assert e >= n, (tok, e, n)               # never undercounts
        assert e <= n + bound, (tok, e, n)       # classic CMS bound
    # heavy hitters are far above the noise floor → usable rankings
    assert est[0] > est[1] > est[2]


def test_debounce_events_planted_bursts(ray_session, tmp_path):
    """Consecutive-gap semantics: an unbroken sub-gap chain keeps only
    its head (even when the chain outlasts the gap), the exact-gap
    boundary drops, and distinct (user, type) streams never interact."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.events import debounce_events

    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = [  # (event_id, user, type, offset_s)
        (1, 1, "click", 0),
        (2, 1, "click", 100),   # within 300 of #1 → drop
        (3, 1, "click", 200),   # within 300 of #2 → drop (chain)
        (4, 1, "click", 500),   # 300 after #3 (exact gap) → drop
        (5, 1, "click", 900),   # 400 after #4 → keep
        (6, 1, "view", 50),     # other type stream → keep
        (7, 2, "click", 10),    # other user → keep
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array(
                    [(base + pd.Timedelta(seconds=r[3])).to_pydatetime() for r in rows],
                    pa.timestamp("us"),
                ),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = debounce_events(str(tmp_path)).to_pandas()
    assert sorted(got["event_id"]) == [1, 5, 6, 7]


def test_anomaly_days_planted_spikes(ray_session, tmp_path):
    """Integer spike rule on a hand-built calendar: empty-history days
    never flag, calendar gaps count as zero, the boundary is strict."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.events import anomaly_days

    base = pd.Timestamp("2024-05-01")
    counts = {0: 10, 1: 10, 9: 100, 10: 3}  # day-offset → events of type "a"
    rows = []
    for off, n in counts.items():
        for i in range(n):
            rows.append((base + pd.Timedelta(days=off, seconds=i)))
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a"] * len(rows), pa.string()),
                "ts": pa.array([t.to_pydatetime() for t in rows], pa.timestamp("us")),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = anomaly_days(str(tmp_path)).set_index("day")
    # day 0: no history → never a spike even at any volume
    assert got.loc["2024-05-01", "is_spike"] == 0
    # day 1: prev7 = 10, 7·10 = 70 > 20 → spike (steady volume IS >2× a
    # one-day-old mean — the rule is trailing-mean, shown strictly)
    assert got.loc["2024-05-02", "is_spike"] == 1
    # day 9: prev7 covers days 2-8 → only day 1's 10 events fall in
    # (days 2..8: only day 1 is offset... day 1 is offset 1 → day 9-7=2
    # .. day 8 window EXCLUDES day 1) → prev7 = 0 → not a spike
    assert got.loc["2024-05-10", "prev7"] == 0
    assert got.loc["2024-05-10", "is_spike"] == 0
    # day 10: prev7 = day 9's 100 → 7·3 = 21 < 200 → quiet day, no flag
    assert got.loc["2024-05-11", "is_spike"] == 0


def test_trimmed_stats_planted(ray_session, tmp_path):
    """Rank-based trimming on hand-built groups: k=n//100 drops exactly
    the extreme observations, tiny groups trim nothing, duplicate-heavy
    groups resolve boundaries inside one histogram bin, and a group
    that trimming exhausts emits no row."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.events import trimmed_stats

    rows = []
    # type "a": values 1..100 → k=1 → mean of 2..99 = 50.5
    rows += [("a", float(i)) for i in range(1, 101)]
    # type "b": 150 copies of 7.25 → k=1, mean unchanged
    rows += [("b", 7.25)] * 150
    # type "c": n=50 → k=0 → plain mean of 1..50 = 25.5
    rows += [("c", float(i)) for i in range(1, 51)]
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([t for t, _ in rows], pa.string()),
                "value": pa.array([v for _, v in rows], pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = trimmed_stats(str(tmp_path)).set_index("event_type")
    assert got.loc["a", "n_trimmed"] == 2 and got.loc["a", "trimmed_mean"] == 50.5
    assert got.loc["b", "n_trimmed"] == 2 and got.loc["b", "trimmed_mean"] == 7.25
    assert got.loc["c", "n_trimmed"] == 0 and got.loc["c", "trimmed_mean"] == 25.5
    # 50% trim exhausts every group (k = n//2 → 0 kept) → empty result,
    # matching the twin's empty groups
    got50 = trimmed_stats(str(tmp_path), trim_pct=50)
    assert len(got50) == 0


def test_funnel_conversions_planted(ray_session, tmp_path):
    """Planted funnel semantics: ordered view<click<purchase inside
    the window converts; wrong order, out-of-window views, and exact
    window/timestamp boundaries (strict inequalities) do not."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.events import funnel_conversions

    t0 = np.datetime64("2026-01-01T00:00:00", "us")

    def ev(uid, kind, sec):
        return {"user_id": uid, "event_type": kind, "ts": t0 + np.timedelta64(sec, "s")}

    rows = [
        # u1: textbook conversion
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # u2: click before view → no conversion
        ev(2, "click", 0), ev(2, "view", 10), ev(2, "purchase", 20),
        # u3: view outside the trailing window → no conversion
        ev(3, "view", 0), ev(3, "click", 10), ev(3, "purchase", 3700),
        # u4: view exactly AT t-window (strict >) → no conversion
        ev(4, "view", 100), ev(4, "click", 200), ev(4, "purchase", 3700),
        # u5: click at the purchase instant (strict <) → no conversion
        ev(5, "view", 0), ev(5, "click", 20), ev(5, "purchase", 20),
        # u6: two purchases, only the second has a full chain before it
        ev(6, "purchase", 5), ev(6, "view", 10), ev(6, "click", 20),
        ev(6, "purchase", 30),
        # u7: no purchase → absent from the output
        ev(7, "view", 0), ev(7, "click", 1),
    ]
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")

    out = (
        funnel_conversions(str(tmp_path))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3, 4, 5, 6]
    assert out.loc[1, "n_converted"] == 1 and out.loc[1, "n_purchases"] == 1
    assert out.loc[2, "n_converted"] == 0
    assert out.loc[3, "n_converted"] == 0
    assert out.loc[4, "n_converted"] == 0
    assert out.loc[5, "n_converted"] == 0
    assert out.loc[6, "n_purchases"] == 2 and out.loc[6, "n_converted"] == 1


def test_funnel_no_cross_user_leak_in_shared_bucket(ray_session, tmp_path):
    """Two users co-located in ONE hash bucket (ids differ by
    NUM_KEY_BUCKETS): user A's view+click immediately precede user B's
    early purchase in raw time — the vectorized offset trick must NOT
    let A's chain convert B's purchase (the probe-underflow clamp),
    while A's own later purchase still converts."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.events import NUM_KEY_BUCKETS, funnel_conversions

    a, b = 3, 3 + NUM_KEY_BUCKETS  # same bucket
    t0 = np.datetime64("2026-01-01T00:00:00", "us")

    def ev(uid, kind, sec):
        return {"user_id": uid, "event_type": kind, "ts": t0 + np.timedelta64(sec, "s")}

    rows = [
        ev(a, "view", 0), ev(a, "click", 5), ev(a, "purchase", 10),
        # B's purchase 8 s after the epoch start (inside A's chain's
        # window by raw time) with NO view/click of its own
        ev(b, "purchase", 8),
    ]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        tmp_path / "events.parquet",
    )
    out = funnel_conversions(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.loc[a, "n_converted"] == 1
    assert out.loc[b, "n_converted"] == 0


def test_cohort_retention_planted(ray_session, tmp_path):
    """Planted cohort semantics: cohort_week = first-event epoch week,
    week_offset anchored to the user's OWN first day, same-day /
    same-offset-week repeats count once, and two users sharing a hash
    bucket keep their OWN first days (no per-bucket min leak)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.events import NUM_KEY_BUCKETS, cohort_retention

    def ev(uid, day, hour=0):
        return {
            "user_id": uid,
            "ts": np.datetime64("1970-01-01", "us")
            + np.timedelta64(day, "D")
            + np.timedelta64(hour, "h"),
        }

    rows = [
        # u1: first day 14 (epoch week 2); same-day repeat at a
        # different hour counts once; offsets 0, 0, 1, 3
        ev(1, 14), ev(1, 14, 9), ev(1, 17), ev(1, 21), ev(1, 35),
        # u2: first day 15 — SAME cohort week 2, own anchor
        ev(2, 15), ev(2, 22),
        # u3: single-day user, cohort week 3
        ev(3, 21),
        # u4: first day 13 → cohort week 1; day 14 is still offset 0
        ev(4, 13), ev(4, 14),
        # u5 shares u3's hash bucket but has an EARLIER first day —
        # u3's cohort must stay week 3 (per-user min, not bucket min)
        ev(3 + NUM_KEY_BUCKETS, 14), ev(3 + NUM_KEY_BUCKETS, 21),
    ]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        tmp_path / "events.parquet",
    )
    out = (
        cohort_retention(str(tmp_path))
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    expected = pd.DataFrame(
        {
            "cohort_week": pd.Series([1, 2, 2, 2, 3], dtype="int64"),
            "week_offset": pd.Series([0, 0, 1, 3, 0], dtype="int64"),
            "n_users": pd.Series([1, 3, 3, 1, 1], dtype="int64"),
        }
    )
    pd.testing.assert_frame_equal(out, expected)


def test_daily_active_hll_error_bound(ray_session):
    """Grouped-HLL DAU within 5% of the exact op on every day (p=12
    → ~1.6% standard error; linear counting covers the small range)."""
    import numpy as np
    import pandas as pd

    from pdf_ocr_api_ray.pipelines.events import active_users, daily_active_hll

    est = daily_active_hll(SF)
    exact = active_users(SF)
    if not isinstance(exact, pd.DataFrame):
        exact = exact.to_pandas()
    exact = exact.copy()
    exact["day_i"] = (
        pd.to_datetime(exact["day"]).astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    m = est.merge(exact, left_on="day", right_on="day_i")
    assert len(m) == len(exact) == len(est)  # same day set as the exact op
    rel = (m["dau_est"] - m["dau"]).abs() / m["dau"]
    assert float(rel.max()) < 0.05


def test_daily_active_hll_span_guard(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from pdf_ocr_api_ray.pipelines.events import daily_active_hll

    ev = pd.DataFrame(
        {
            "event_id": [0, 1],
            "user_id": [1, 2],
            "ts": pd.to_datetime(["1990-01-01", "2050-01-01"]),
            "event_type": ["x", "x"],
            "value": [0.0, 0.0],
            "props": ["{}", "{}"],
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
    with _pytest.raises(ValueError, match="day span"):
        daily_active_hll(str(tmp_path))
