"""Unit tests for timedb_spark.operators.timeseries on tiny in-memory frames
with hand-computed expectations (grid shape, locf carry, linear blend,
session splits, range-join candidate correctness, top-k tiebreak).
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from timedb_spark.operators import timeseries as ts


def _series(spark, rows):
    return spark.createDataFrame(rows, "series_id int, valid_time timestamp, value double")


T = lambda h, m=0: datetime(2024, 1, 1, h, m)


def test_resample_locf_fills_holes_and_carries(spark):
    df = _series(
        spark,
        [
            (1, T(0), 10.0),
            (1, T(3), 40.0),  # holes at 01:00, 02:00
            (2, T(5), 5.0),  # single point → single tick, no holes
        ],
    )
    out = {(r.series_id, r.valid_time): (r.value, r.gap_filled) for r in ts.resample_locf(df).collect()}
    assert len(out) == 5  # 4 ticks for s1 + 1 for s2
    assert out[(1, T(0))] == (10.0, False)
    assert out[(1, T(1))] == (10.0, True)  # carried
    assert out[(1, T(2))] == (10.0, True)
    assert out[(1, T(3))] == (40.0, False)
    assert out[(2, T(5))] == (5.0, False)


def test_resample_locf_subhour_observations_collapse_to_tick(spark):
    # two obs inside the same hour → one tick, max wins (deterministic collapse)
    df = _series(spark, [(1, T(0, 10), 1.0), (1, T(0, 50), 7.0), (1, T(1), 2.0)])
    out = {r.valid_time: r.value for r in ts.resample_locf(df).collect()}
    assert out == {T(0): 7.0, T(1): 2.0}


def test_interpolate_linear_blend_and_endpoints(spark):
    df = _series(spark, [(1, T(0), 10.0), (1, T(4), 50.0)])
    out = {r.valid_time: (r.value, r.gap_filled) for r in ts.interpolate_linear(df).collect()}
    # interior ticks blend by time fraction: 20, 30, 40
    assert out[T(0)] == (10.0, False)
    assert out[T(1)] == (20.0, True)
    assert out[T(2)] == (30.0, True)
    assert out[T(3)] == (40.0, True)
    assert out[T(4)] == (50.0, False)


def test_interpolate_linear_no_next_carries_prev(spark):
    # hole after last obs can't happen (grid ends at max), but hole before
    # first obs of the grid can't either — verify a 3-point series with an
    # interior hole uses its own neighbours, not global ones
    df = _series(spark, [(1, T(0), 0.0), (1, T(2), 8.0), (1, T(3), 100.0)])
    out = {r.valid_time: r.value for r in ts.interpolate_linear(df).collect()}
    assert out[T(1)] == 4.0  # midpoint of 0→8, NOT influenced by 100


def test_sessionize_gap_split(spark, sf_dir):
    out = ts.sessionize(spark, sf_dir, gap_minutes=30)
    rows = out.collect()
    assert rows
    # session invariants: start<=end, n_events>=1
    for r in rows:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
    # per-user event counts conserved
    ev_counts = {
        r.user_id: r.c
        for r in ts.load_table(spark, sf_dir, "events").groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    sess_counts = {}
    for r in rows:
        sess_counts[r.user_id] = sess_counts.get(r.user_id, 0) + r.n_events
    assert sess_counts == ev_counts


def test_range_join_matches_naive(spark, sf_dir):
    """Binned range join == naive theta-join on a small sample."""
    ev = ts.load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    ev.createOrReplaceTempView("_ev_small")
    naive = spark.sql(
        """
        SELECT e.event_id, count(*) AS n_later
        FROM _ev_small e JOIN _ev_small r
          ON r.user_id = e.user_id AND r.ts > e.ts
         AND r.ts <= e.ts + INTERVAL 3 HOURS
        GROUP BY e.event_id
        """
    )
    binned = (
        ts.range_join_events(spark, sf_dir)
        .join(ev.select("event_id"), "event_id", "inner")
        .select("event_id", "n_later")
    )
    n_rows = {r.event_id: r.n_later for r in naive.collect()}
    b_rows = {r.event_id: r.n_later for r in binned.collect()}
    assert n_rows == b_rows


def test_topk_deterministic_tiebreak(spark, sf_dir):
    a = [(r.user_id, r.n_events) for r in ts.topk_users(spark, sf_dir, k=10).collect()]
    b = [(r.user_id, r.n_events) for r in ts.topk_users(spark, sf_dir, k=10).collect()]
    assert a == b
    counts = [n for _, n in a]
    assert counts == sorted(counts, reverse=True)


def test_rollup_resolutions_consistent(spark, sf_dir):
    """Hour buckets must sum to the same totals as month buckets."""
    df = ts.rollup_multires(spark, sf_dir)
    agg = (
        df.groupBy("resolution")
        .agg(F.sum("n_events").alias("n"))
        .collect()
    )
    totals = {r.resolution: r.n for r in agg}
    assert totals["hour"] == totals["day"] == totals["month"]


# ---------------------------------------------------------------------------
# snapshot / snapshot_diff (bitemporal time-travel)
# ---------------------------------------------------------------------------


def _sv(spark, rows):
    from timedb_spark.operators import bitemporal  # noqa: F401

    return spark.createDataFrame(
        rows, "series_id int, valid_time timestamp, knowledge_time timestamp, change_time timestamp, value double"
    )


def test_snapshot_drops_later_knowledge(spark):
    from timedb_spark.operators import bitemporal as bt

    df = _sv(
        spark,
        [
            (1, T(0), T(1), T(1), 10.0),   # known at 01:00
            (1, T(0), T(5), T(5), 99.0),   # revision known at 05:00
            (2, T(0), T(6), T(6), 7.0),    # series appears only after cutoff
        ],
    )
    out = {(r.series_id, r.valid_time): r.value for r in bt.snapshot(df, T(3)).collect()}
    assert out == {(1, T(0)): 10.0}  # revision + series 2 not yet known


def test_snapshot_diff_kinds(spark):
    from timedb_spark.operators import bitemporal as bt

    df = _sv(
        spark,
        [
            (1, T(0), T(1), T(1), 10.0),   # unchanged between cutoffs
            (2, T(0), T(1), T(1), 20.0),
            (2, T(0), T(4), T(4), 25.0),   # revised between t1=T2h and t2=T6h
            (3, T(0), T(5), T(5), 30.0),   # added after t1
        ],
    )
    rows = {r.series_id: (r.value_t1, r.value_t2, r.change_kind) for r in bt.snapshot_diff(df, T(2), T(6)).collect()}
    assert 1 not in rows  # unchanged → not in diff
    assert rows[2] == (20.0, 25.0, "changed")
    assert rows[3] == (None, 30.0, "added")


# ---------------------------------------------------------------------------
# OHLC / moving stats / zscore / gap detect on tiny frames
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double")


def test_ohlc_open_close_ordering(tmp_path, spark):
    # same-hour ticks: open = earliest (ts, event_id), close = latest
    df = _events(
        spark,
        [
            (2, T(1, 10), 1, "a", 5.0),
            (1, T(1, 10), 1, "a", 3.0),   # same ts as event 2 → event_id breaks tie
            (3, T(1, 50), 1, "a", 9.0),
            (4, T(2, 0), 1, "a", 1.0),    # next hour → own bar
        ],
    )
    import timedb_spark.operators.timeseries as tsmod

    okey = F.struct(F.col("ts"), F.col("event_id"))
    out = (
        df.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .collect()
    )
    bars = {r.bucket: r for r in out}
    b1 = bars[T(1)]
    assert (b1.open, b1.high, b1.low, b1.close, b1.n_ticks) == (3.0, 9.0, 3.0, 9.0, 3)
    assert bars[T(2)].open == bars[T(2)].close == 1.0


def test_gap_detect_threshold(spark):
    from timedb_spark.operators.timeseries import gap_detect  # noqa: F401 (signature check)

    df = _events(
        spark,
        [
            (1, T(0), 1, "a", 0.0),
            (2, T(1), 1, "a", 0.0),    # 1h gap — below 2h threshold
            (3, T(5), 1, "a", 0.0),    # 4h gap — reported
        ],
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    us = F.unix_micros("ts") - F.unix_micros(prev)
    out = (
        df.select("user_id", prev.alias("gap_start"), F.col("ts").alias("gap_end"), us.alias("_us"))
        .filter(F.col("_us") > 120 * 60 * 1_000_000)
        .collect()
    )
    assert len(out) == 1
    assert out[0].gap_start == T(1) and out[0].gap_end == T(5)


def test_corr_matrix_bounds_and_pairs(spark, sf_dir):
    from timedb_spark.operators.timeseries import corr_matrix

    out = corr_matrix(spark, sf_dir).collect()
    # 5 event types -> C(5,2) ordered pairs, each correlation in [-1, 1]
    assert len(out) == 10
    assert all(r.type_a < r.type_b for r in out)
    assert all(-1.0 <= r.corr <= 1.0 for r in out)


def test_corr_matrix_perfect_correlation(spark, sf_dir, tmp_path):
    # Construct two perfectly correlated types via a tiny synthetic events
    # table written through the same reader path.
    import pandas as pd
    from datetime import datetime, timedelta

    rows = []
    for i in range(6):
        ts = datetime(2024, 1, 1) + timedelta(hours=i)
        rows.append((i * 2, ts, 1, "x", float(i)))
        rows.append((i * 2 + 1, ts, 1, "y", 2.0 * i + 3.0))  # y = 2x + 3
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    from timedb_spark.operators.timeseries import corr_matrix

    out = corr_matrix(spark, d).collect()
    assert len(out) == 1
    assert out[0].corr == pytest.approx(1.0)


def test_seasonal_naive_exact_lag(spark, sf_dir):
    from timedb_spark.operators.timeseries import seasonal_naive

    out = seasonal_naive(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.rmse >= r.mae >= 0.0  # RMSE dominates MAE by Jensen


def test_histogram_exact_integer_binning(spark, tmp_path):
    import os

    import pandas as pd

    rows = [(i, T(0, i % 60), 1, "x", float(i)) for i in range(20)]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    out = ts.value_histogram(spark, d).collect()
    bins = {r.bin: r for r in out}
    assert sum(r.n for r in out) == 20
    assert min(bins) == 0 and max(bins) == 19  # extremes land in edge bins
    for r in out:
        assert 0 <= r.bin < 20 and r.bin_min_value <= r.bin_max_value


def test_ewma_hand_computed(spark, tmp_path):
    import os

    import pandas as pd

    rows = [(1, T(0), 1, "x", 10.0), (2, T(1), 1, "x", 20.0), (3, T(2), 1, "x", 40.0)]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.event_id: r.ewma for r in ts.ewma(spark, d).collect()}
    # s1=10; s2=.75*10+.25*20=12.5; s3=.75*12.5+.25*40=19.375 (exact dyadics)
    assert got == {1: 10.0, 2: 12.5, 3: 19.375}


def test_approx_quantiles_within_tolerance_of_exact(spark, sf_dir):
    """The 100 TB swap-in for ts_quantiles: percentile_approx (t-digest
    sketch, mergeable map-side — no global sort) stays within the sketch
    accuracy bound of the exact percentiles on real data."""
    from timedb_spark.io.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    acc = 1000  # guarantees rank error ≤ n/acc
    approx = ev.groupBy("event_type").agg(
        F.expr(f"percentile_approx(value, array(0.5, 0.9, 0.99), {acc})").alias("approx"),
        F.count(F.lit(1)).alias("n"),
    )
    # the sketch contract is a RANK bound, not a value bound (tails are
    # sparse): the returned value's true rank must sit within n/acc of the
    # target rank (+1 row of discreteness slack)
    vals = ev.select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in vals:
        by_type.setdefault(r.event_type, []).append(r.value)
    for r in approx.collect():
        xs = sorted(by_type[r.event_type])
        for q, a in zip((0.5, 0.9, 0.99), r.approx):
            rank = sum(1 for x in xs if x <= a)
            assert abs(rank - q * r.n) <= r.n / acc + 1, (r.event_type, q, a, rank, r.n)


def test_approx_distinct_within_hll_error(spark, sf_dir):
    """approx_count_distinct (HLL++, mergeable — the count-distinct that
    scales) lands within its configured relative error of the exact count."""
    from timedb_spark.io.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(got.approx - got.exact) / got.exact <= 0.06  # 3× rsd envelope


def test_lttb_invariants_and_local_recompute(spark, sf_dir):
    """LTTB: first/last kept, exactly min(n, n_out) points per series in
    time order, deterministic, and the selection equals an independent
    pure-python recompute for sampled series."""
    import numpy as np

    from timedb_spark.operators.timeseries import _hourly_series, lttb_downsample

    n_out = 20
    got = {}
    for r in lttb_downsample(spark, sf_dir, n_out=n_out).collect():
        got.setdefault(r.series_id, []).append((r.pt_index, r.valid_time, r.value))
    src = {}
    for r in _hourly_series(spark, sf_dir).collect():
        src.setdefault(r.series_id, []).append((r.valid_time, r.value))

    def py_lttb(pts):
        pts = sorted(pts)
        n = len(pts)
        if n <= n_out:
            return pts
        x = np.array([p[0].timestamp() * 1e6 for p in pts])
        y = np.array([p[1] for p in pts])
        edges = [1 + int(i * (n - 2) / (n_out - 2)) for i in range(n_out - 1)]

        def seq_mean(a):
            # ordered sequential fold — the cross-engine summation spec the
            # operator and the DuckDB oracle both honor (numpy's pairwise
            # .mean() diverges in ULPs and can flip near-tie argmaxes)
            acc = 0.0
            for v in a.tolist():
                acc = acc + v
            return acc / len(a)

        idx = [0]
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            nlo = edges[b + 1]
            nhi = n if b == n_out - 3 else edges[b + 2]
            ax, ay = seq_mean(x[nlo:nhi]), seq_mean(y[nlo:nhi])
            p = idx[-1]
            cand = np.arange(lo, hi)
            area = np.abs((x[p] - ax) * (y[cand] - y[p]) - (x[p] - x[cand]) * (ay - y[p]))
            idx.append(int(cand[int(area.argmax())]))
        idx.append(n - 1)
        return [pts[i] for i in idx]

    assert set(got) == set(src)
    for sid, sel in got.items():
        sel = [t[1:] for t in sorted(sel)]
        pts = sorted(src[sid])
        assert len(sel) == min(len(pts), n_out)
        assert sel[0] == pts[0] and sel[-1] == pts[-1]  # endpoints kept
        assert sel == py_lttb(pts)  # exact match with independent recompute


def test_holt_winters_tracks_planted_seasonality(spark, tmp_path):
    """On a strongly 24h-periodic series, the Holt-Winters one-step forecast
    must converge onto the pattern after a couple of periods — mean |error|
    over the last day a small fraction of the seasonal amplitude — and beat
    the trend-only (holt-style) naive level forecast."""
    import math

    import pandas as pd

    from timedb_spark.operators.timeseries import holt_winters

    hours = 24 * 6
    rows = []
    eid = 0
    for h in range(hours):
        if h % 3 == 2:  # respect the _hourly_series sparsity pattern
            continue
        rows.append(
            {
                "event_id": eid,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h),
                "user_id": 1,
                "event_type": "click",
                "value": 100.0 + 50.0 * math.sin(2 * math.pi * (h % 24) / 24),
                "props": "{}",
            }
        )
        eid += 1
    d = tmp_path / "sf_hw"
    d.mkdir()
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(str(d / "events.parquet"))

    out = sorted(holt_winters(spark, str(d)).collect(), key=lambda r: r.valid_time)
    # one-step contract on the dense LOCF grid: row t's hw_forecast
    # predicts row t+1's value
    tail = out[-25:]  # last day
    errs = [abs(prev.hw_forecast - cur.value) for prev, cur in zip(tail, tail[1:])]
    amplitude = 100.0
    assert sum(errs) / len(errs) < 0.2 * amplitude
    # a pure-level forecast (no seasonal term) cannot track the oscillation
    level_errs = [abs(prev.hw_level - cur.value) for prev, cur in zip(tail, tail[1:])]
    assert sum(errs) / len(errs) < 0.8 * (sum(level_errs) / len(level_errs))

    # the pandas recursion equals an independent pure-python recompute
    from timedb_spark.operators.timeseries import _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_PERIOD

    series = [(r.valid_time, r.value) for r in out]
    level, trend, ring = series[0][1], 0.0, [0.0] * _HW_PERIOD
    for i, (vt, x) in enumerate(series):
        if i:
            s_old = ring.pop(0)
            lp = _HW_ALPHA * (x - s_old) + (1.0 - _HW_ALPHA) * (level + trend)
            trend = _HW_BETA * (lp - level) + (1.0 - _HW_BETA) * trend
            level = lp
            ring.append(_HW_GAMMA * (x - level) + (1.0 - _HW_GAMMA) * s_old)
        import math
        assert out[i].hw_level == math.floor(level * 1e6) / 1e6
        assert out[i].hw_forecast == math.floor((level + trend + ring[0]) * 1e6) / 1e6


def test_quantiles_and_mad_approx_within_sketch_error(spark, sf_dir):
    """The percentile_approx default agrees with the exact mode within
    sketch rank error: approx quantiles land between the exact p-eps and
    p+eps quantiles (eps = 1/accuracy bounded rank error, generous margin
    for the tiny test frame), and the MAD outlier sets overlap heavily."""
    from timedb_spark.io.tables import load_table
    from timedb_spark.operators.timeseries import mad_anomaly, quantiles_by_type

    ex = {r.event_type: (r.p50, r.p90, r.p99) for r in quantiles_by_type(spark, sf_dir, exact=True).collect()}
    ap = {r.event_type: (r.p50, r.p90, r.p99) for r in quantiles_by_type(spark, sf_dir).collect()}
    assert set(ex) == set(ap)
    vals = {t: sorted(r.value for r in rows) for t, rows in __import__("itertools").groupby(
        sorted(load_table(spark, sf_dir, "events").select("event_type", "value").collect(),
               key=lambda r: r.event_type), key=lambda r: r.event_type)}
    for t, (e50, e90, e99) in ex.items():
        v = vals[t]
        n = len(v)
        for p, approx in zip((0.5, 0.9, 0.99), ap[t]):
            # rank window: approx within +-(n/1000) ranks of the exact rank
            k = int(p * (n - 1))
            pad = max(2, n // 1000)
            lo, hi = v[max(0, k - pad)], v[min(n - 1, k + pad)]
            assert lo - 1e-9 <= approx <= hi + 1e-9, (t, p, approx, lo, hi)

    ex_ids = {r.event_id for r in mad_anomaly(spark, sf_dir, exact=True).collect()}
    ap_ids = {r.event_id for r in mad_anomaly(spark, sf_dir).collect()}
    inter = len(ex_ids & ap_ids)
    assert inter >= 0.9 * max(len(ex_ids), 1) and len(ap_ids) <= 1.2 * max(len(ex_ids), 1)


def test_theta_forecast_matches_numpy(spark, tmp_path):
    """ts_theta vs a straight numpy recompute (exact-cents OLS + SES fold +
    half/half combination) on a small planted series — pins the operator's
    math independently of the SQL oracle."""
    import math
    import os

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for uid in (1, 2):
        for t in range(30):
            eid += 1
            v = round(5.0 + 0.3 * t + float(rng.normal(0, 0.5)), 2)
            rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), uid, "x", v))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in ts.theta_forecast(spark, d).collect()}
    for uid in (1, 2):
        x = pdf[pdf.user_id == uid].sort_values(["ts", "event_id"]).value.to_numpy()
        c = np.round(x * 100).astype(np.int64)
        n = len(c)
        t_ = np.arange(1, n + 1, dtype=np.int64)
        st, st2 = int(t_.sum()), int((t_ * t_).sum())
        b = (n * int((c * t_).sum()) - st * int(c.sum())) / (n * st2 - st * st)
        a = (int(c.sum()) - b * st) / n
        z = 2.0 * c - (a + b * t_)
        l = z[0]
        for zz in z[1:]:
            l = l * 0.5 + zz * 0.5
        f1 = 0.5 * l + 0.5 * (a + b * (n + 1))
        f24 = 0.5 * l + 0.5 * (a + b * (n + 24))
        r = got[uid]
        assert r.n_points == n
        assert r.theta_slope == math.floor(b / 100.0 * 1e6) / 1e6
        assert r.theta_level == math.floor(l / 100.0 * 1e6) / 1e6
        assert r.theta_f1 == math.floor(f1 / 100.0 * 1e6) / 1e6
        assert r.theta_f24 == math.floor(f24 / 100.0 * 1e6) / 1e6
        # slope recovers the planted 0.3/hour trend
        assert abs(r.theta_slope - 0.3) < 0.05


def test_kalman_matches_numpy(spark, tmp_path):
    """ts_kalman vs a direct numpy recursion of the local-level filter on a
    planted step series — pins the fold math (and the span-bounded seeding)
    independently of the SQL oracle."""
    import math
    import os

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    for t in range(40):
        eid += 1
        base = 10.0 if t < 20 else 25.0  # level step at t=20
        rows.append(
            (eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x",
             round(base + float(rng.normal(0, 0.3)), 2))
        )
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    out = ts.kalman_filter(spark, d).orderBy("ts", "event_id").collect()
    vals = pdf.sort_values(["ts", "event_id"]).value.to_numpy()
    q, r_, span = ts._KF_Q, ts._KF_R, ts._KF_SPAN
    for idx, row in enumerate(out):
        frame = vals[max(0, idx - span + 1): idx + 1]
        l, p = float(frame[0]), 1.0
        for x in frame[1:]:
            pp = p + q
            k = pp / (pp + r_)
            l = l + k * (x - l)
            p = (1.0 - k) * pp
        gain = (p + q) / (p + q + r_)
        assert row.kf_level == math.floor(l * 1e6) / 1e6, idx
        assert row.kf_gain == math.floor(gain * 1e6) / 1e6, idx
    # the filter tracks the level step: late levels near 25, early near 10
    assert abs(out[10].kf_level - 10.0) < 1.0
    assert abs(out[39].kf_level - 25.0) < 1.0
    # gain converges to the steady state of the Riccati recursion
    ss = out[39].kf_gain
    assert abs(out[38].kf_gain - ss) < 1e-6


def test_croston_hand_computed(spark, tmp_path):
    """ts_croston on a hand-built intermittent demand pattern: demands of
    2.00 / 4.00 at periods 3 and 6 of an 8-period history."""
    import math
    import os

    import pandas as pd

    rows = []
    # periods 1..8; purchases (demand) at period 3 (2.00) and period 6 (4.00)
    for t in range(1, 9):
        et = "purchase" if t in (3, 6) else "view"
        v = {3: 2.0, 6: 4.0}.get(t, 9.99)  # non-purchase value must be ignored
        rows.append((t, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, et, v))
    # user 2: no purchases at all -> NULL croston columns
    rows.append((100, datetime(2024, 1, 1), 2, "view", 5.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in ts.croston(spark, d).collect()}
    a = ts._CROSTON_ALPHA
    # init at first demand: z=200 cents, p=3 (periods since start)
    # second demand after q=2 zero periods -> interval sample q+1=3
    z = a * 400.0 + (1 - a) * 200.0
    p = a * 3.0 + (1 - a) * 3.0
    r1 = got[1]
    assert r1.n_periods == 8 and r1.n_demands == 2
    assert r1.croston_size == math.floor(z / 100.0 * 1e6) / 1e6
    assert r1.croston_interval == math.floor(p * 1e6) / 1e6
    assert r1.croston_forecast == math.floor((z / 100.0) / p * 1e6) / 1e6
    r2 = got[2]
    assert r2.n_demands == 0
    assert r2.croston_size is None and r2.croston_forecast is None


def test_sax_planted_shapes(spark, tmp_path):
    """ts_sax on planted shapes: a rising ramp must symbolize low->high
    (a..d monotone), a flat series pins all-'b', and a V-shape is symmetric."""
    import os

    import numpy as np
    import pandas as pd

    rows = []
    eid = 0
    for t in range(32):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", float(t)))
    for t in range(32):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x", 7.5))
    for t in range(32):
        eid += 1
        v = abs(t - 15.5)
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 3, "x", v))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in ts.sax_symbolize(spark, d).collect()}
    assert got[1].sax_word == "aabbccdd"
    assert got[2].sax_word == "bbbbbbbb"
    assert got[2].series_std == 0.0
    w = got[3].sax_word
    assert w == w[::-1]  # V-shape symmetry
    assert w[0] in "cd" and w[3] in "ab"  # high at edges, low in the middle
    assert all(len(r.sax_word) == 8 for r in got.values())
    assert got[1].n_points == 32


def test_cusum_matches_python_recompute(spark, tmp_path):
    """ts_cusum vs an exact python replay of the same recursion: a flat
    series with a planted level shift must alarm on the positive side
    exactly where the replay says; a constant series (sigma=0) never
    alarms."""
    import math
    import os

    import pandas as pd

    rows = []
    vals = [10.0] * 12 + [25.0] * 8  # shift up at t=12
    for t, v in enumerate(vals):
        rows.append((t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", v))
    for t in range(6):  # constant series
        rows.append((100 + t, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x", 7.25))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in ts.cusum(spark, d).collect()}

    # python replay, identical op order (cents, mu, sigma, fold)
    c = [int(v * 100) for v in vals]
    n = len(c)
    mu = sum(c) / n
    var = sum(x * x for x in c) / n - mu * mu
    sigma = math.sqrt(max(var, 0.0))
    sp = sn = 0.0
    alarms, mxp, mxn, first = 0, 0.0, 0.0, -1
    for t, x in enumerate(c):
        z = (x - mu) / sigma if sigma > 0 else 0.0
        sp2 = max(0.0, sp + z - 0.5)
        sn2 = max(0.0, sn - z - 0.5)
        fired = sp2 > 4.0 or sn2 > 4.0
        mxp, mxn = max(mxp, sp2), max(mxn, sn2)
        if fired:
            alarms += 1
            if first < 0:
                first = t
            sp, sn = 0.0, 0.0
        else:
            sp, sn = sp2, sn2

    r1 = got[1]
    assert alarms >= 1 and r1.n_alarms == alarms
    assert r1.first_alarm_idx == first >= 12
    assert r1.max_cusum_pos == math.floor(mxp * 1e6) / 1e6
    assert r1.max_cusum_neg == math.floor(mxn * 1e6) / 1e6
    assert r1.mean_value == math.floor(mu / 100.0 * 1e6) / 1e6

    r2 = got[2]
    assert r2.n_alarms == 0 and r2.first_alarm_idx == -1
    assert r2.max_cusum_pos == 0.0 and r2.std_value == 0.0


def test_mk_trend_matches_python_recompute(spark, tmp_path):
    """Mann–Kendall S/variance/z and Sen's slope vs an exact python replay:
    a strictly increasing series (certain trend), a noisy-flat series, and
    an all-ties series (variance fully tie-corrected to 0)."""
    import math
    import os

    import pandas as pd

    series = {
        1: [float(t) for t in range(1, 25)],             # strict increase
        2: [5.0, 5.2, 4.9, 5.1, 5.0, 4.8, 5.15, 5.05],   # flat noise
        3: [7.5] * 6,                                    # all ties
    }
    rows = []
    eid = 0
    for uid, vals in series.items():
        for t, v in enumerate(vals):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), uid, "x", v))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in ts.mk_trend(spark, d).collect()}

    for uid, vals in series.items():
        c = [int(round(v * 100)) for v in vals]
        n = len(c)
        s = sum(
            (0 if c[j] == c[i] else (1 if c[j] > c[i] else -1))
            for j in range(1, n)
            for i in range(j)
        )
        from collections import Counter

        corr = sum(t * (t - 1) * (2 * t + 5) for t in Counter(c).values())
        var_s = (n * (n - 1) * (2 * n + 5) - corr) / 18.0
        sd = math.sqrt(var_s)
        z = (s - 1) / sd if (s > 0 and sd > 0) else (s + 1) / sd if (s < 0 and sd > 0) else 0.0
        slopes = sorted(
            (c[j] - c[i]) / (j - i) for j in range(1, n) for i in range(j)
        )
        p = len(slopes)
        med = slopes[(p + 1) // 2 - 1] if p % 2 == 1 else (slopes[p // 2 - 1] + slopes[p // 2]) / 2.0
        r = got[uid]
        assert r.s_stat == s
        assert r.var_s == math.floor(var_s * 1e6) / 1e6
        assert r.z_stat == math.floor(z * 1e6) / 1e6
        assert r.sen_slope == math.floor(med / 100.0 * 1e6) / 1e6

    assert got[1].trend == "increasing"
    assert got[2].trend == "no_trend"
    assert got[3].trend == "no_trend" and got[3].var_s == 0.0


def test_periodogram_detects_planted_daily_cycle(spark, tmp_path):
    """A pure 24 h cosine spend signal concentrates power at the daily
    period; a flat signal concentrates at DC (all three equal-ish, tiny);
    the python replay of the same literal-constant rotation matches
    exactly."""
    import math
    import os

    import pandas as pd

    from timedb_spark.operators.timeseries import _PERIODOGRAM_PERIODS

    rows = []
    eid = 0
    # user 1: hourly events for 14 days, value = 10 + 5*cos(2π t/24)
    vals = [round(10.0 + 5.0 * math.cos(2 * math.pi * t / 24.0), 2) for t in range(336)]
    for t, v in enumerate(vals):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", v))
    # user 2: constant
    for t in range(48):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x", 3.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in ts.periodogram(spark, d).collect()}

    def replay(xs, cp, sp):
        c, s, sx, sy = 1.0, 0.0, 0.0, 0.0
        for x in xs:
            c, s, sx, sy = c * cp - s * sp, c * sp + s * cp, sx + x * c, sy + x * s
        n = float(len(xs))
        return (sx * sx + sy * sy) / (n * n)

    xs1 = [int(round(v * 100)) / 100.0 for v in vals]
    for p, (cp, sp), col in [
        (24, _PERIODOGRAM_PERIODS[24], "power_24h"),
        (12, _PERIODOGRAM_PERIODS[12], "power_12h"),
        (168, _PERIODOGRAM_PERIODS[168], "power_168h"),
    ]:
        exp = math.floor(replay(xs1, *(_PERIODOGRAM_PERIODS[p])) * 1e6) / 1e6
        assert getattr(got[1], col) == exp, (p, col)

    assert got[1].dominant_period == "24h"
    assert got[1].power_24h > 5.0  # (amplitude/2)^2 = 6.25 for a pure tone
    assert got[1].power_24h > 100 * got[1].power_168h
    assert got[2].n_hours == 48 and got[2].dominant_period is not None


def test_seasonal_strength_planted_characters(spark, tmp_path):
    """A pure 24 h cycle reads as 'seasonal' (F_seasonal near 1), a pure
    ramp as 'trending' (F_trend near 1), white-ish alternation as 'noisy'."""
    import os

    import pandas as pd

    rows = []
    eid = 0
    # user 1: strong daily cycle, 14 days
    for t in range(336):
        eid += 1
        v = 10.0 + (8.0 if t % 24 < 12 else -8.0)
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", v))
    # user 2: pure ramp
    for t in range(336):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x", float(t)))
    # user 3: +/- alternation at the fastest frequency (neither trend nor
    # hour-of-day seasonal after the +/-12h centered MA)
    for t in range(96):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 3, "x", 5.0 + (t % 7) - 3.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.series_id: r for r in ts.seasonal_strength(spark, d).collect()}
    assert got[1].f_seasonal > 0.9 and got[1].character in ("seasonal", "trend+seasonal")
    assert got[2].f_trend > 0.9 and got[2].character in ("trending", "trend+seasonal")
    assert got[3].f_trend < 0.6 or got[3].f_seasonal < 0.6
    assert all(0.0 <= r.f_trend <= 1.0 and 0.0 <= r.f_seasonal <= 1.0 for r in got.values())


def test_hampel_matches_python_recompute(spark, tmp_path):
    """ts_hampel vs an exact python replay of the same window math: a
    smooth series with one planted spike flags exactly the spike (and only
    where the replay says — neighbors with degenerate MAD=0 windows are
    part of the contract, not an accident); a constant series flags
    nothing (|x-med| = 0 is not > 0); cleaned repairs to the window
    median only on flagged rows."""
    import math
    import os

    import pandas as pd

    rows = []
    vals = [10.0, 10.1, 9.9, 10.2, 10.0, 99.0, 10.1, 9.8, 10.0, 10.2, 9.9, 10.1]
    for t, v in enumerate(vals):
        rows.append((t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", v))
    for t in range(5):  # constant series: MAD=0, deviation=0, never flagged
        rows.append((100 + t, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x", 7.25))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {(r.user_id, r.event_id): r for r in ts.hampel(spark, d).collect()}

    def med(sorted_arr):
        p = len(sorted_arr)
        if p % 2 == 1:
            return float(sorted_arr[(p + 1) // 2 - 1])
        return float(sorted_arr[p // 2 - 1] + sorted_arr[p // 2]) / 2.0

    c = [int(round(v * 100)) for v in vals]
    for i, x in enumerate(c):
        win = sorted(c[max(0, i - 3): i + 4])
        m = med(win)
        devs = sorted(abs(float(y) - m) for y in win)
        mad = med(devs) if len(devs) % 2 == 1 else (devs[len(devs) // 2 - 1] + devs[len(devs) // 2]) / 2.0
        out = abs(float(x) - m) > 3.0 * 1.4826 * mad
        r = got[(1, i + 1)]
        assert r.is_outlier == out, (i, x, m, mad)
        assert r.win_median == math.floor(m / 100.0 * 1e6) / 1e6
        exp_clean = math.floor((m if out else float(x)) / 100.0 * 1e6) / 1e6
        assert r.cleaned == exp_clean

    # the planted spike IS flagged and repaired toward the local level
    spike = got[(1, 6)]
    assert spike.is_outlier and abs(spike.cleaned - 10.0) < 0.5

    # constant series: nothing flagged, cleaned == value
    for t in range(5):
        r = got[(2, 100 + t)]
        assert not r.is_outlier and r.cleaned == 7.25


def test_permutation_entropy_matches_python_recompute(spark, tmp_path):
    """ts_perm_entropy vs an exact python replay: a monotone ramp uses ONE
    ordinal pattern (entropy exactly 0), and a mixed series replays the
    ≤-with-positional-tiebreak pattern fold term for term."""
    import math
    import os

    import pandas as pd

    rows = []
    for t in range(20):  # user 1: strict ramp → single pattern, H = 0
        rows.append((t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", float(t)))
    vals2 = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0, 9.0, 7.0]
    for t, v in enumerate(vals2):  # user 2: mixed (with a tie pair)
        rows.append((100 + t, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x", v))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in ts.permutation_entropy(spark, d).collect()}

    r1 = got[1]
    assert r1.n_triples == 18 and r1.n_patterns == 1
    assert r1.perm_entropy == 0.0 and r1.perm_entropy_norm == 0.0

    # python replay for user 2
    c = [int(round(v * 100)) for v in vals2]
    pats = [
        4 * (c[i] <= c[i + 1]) + 2 * (c[i] <= c[i + 2]) + (c[i + 1] <= c[i + 2])
        for i in range(len(c) - 2)
    ]
    m = len(pats)
    counts = [pats.count(p) for p in range(8) if pats.count(p) > 0]
    h = 0.0
    for cc in counts:
        h = h - (cc / m) * math.log(cc / m)
    r2 = got[2]
    assert r2.n_triples == m and r2.n_patterns == len(counts)
    assert r2.perm_entropy == math.floor(h * 1e6) / 1e6
    assert r2.perm_entropy_norm == math.floor(h / math.log(6.0) * 1e6) / 1e6
    assert 0.0 < r2.perm_entropy_norm <= 1.0


def test_anomaly_residual_flags_spike_not_seasonality(spark, tmp_path):
    """The residual gate's reason to exist: on a strong daily cycle a
    raw-value gate would fire at every peak, but the decompose residual
    absorbs the seasonality — only the planted off-cycle spike (and at
    most its ±12 h trend-window contamination) may flag."""
    import os

    import pandas as pd

    rows = []
    spike_t = 170  # 02:00 on day 8 (an on-cycle peak-half hour)
    for t in range(336):  # 14 days, square daily cycle 2..18 + pseudo-noise
        v = 10.0 + (8.0 if t % 24 < 12 else -8.0) + ((t * 7919) % 11 - 5) * 0.4
        if t == spike_t:
            v += 60.0
        rows.append((t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", v))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = ts.anomaly_residual(spark, d).collect()
    hours = sorted((r.h - datetime(2024, 1, 1)).total_seconds() / 3600 for r in got)

    assert spike_t in hours  # the spike IS caught
    # every flagged hour is explicable: the spike itself, its ±12 h
    # trend-window shadow, or the spike's hour-of-day (the single spike
    # shifts that hod's seasonal mean by +60/14) — never a regular peak
    assert all(abs(h - spike_t) <= 12 or h % 24 == spike_t % 24 for h in hours), hours
    assert len(hours) <= 5
    spike_row = [r for r in got if (r.h - datetime(2024, 1, 1)).total_seconds() / 3600 == spike_t][0]
    assert spike_row.score is None or spike_row.score > 3.0
    assert abs(spike_row.value - 78.4) < 1e-9  # 10 + 8 + 60 + noise(170)


def test_backtest_models_planted_winners(spark, tmp_path):
    """Model selection on planted series with known winners: a strong
    daily cycle → snaive wins; a flat-with-noise series → mean/naive beat
    snaive; MAEs replay an exact python recompute."""
    import math
    import os

    import pandas as pd

    rows, eid = [], 0
    # user 1: pure 24 h cycle — snaive MAE is exactly 0
    for t in range(96):
        eid += 1
        v = 10.0 + (6.0 if t % 24 < 12 else -6.0)
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", v))
    # user 2: constant with one old wobble — naive and mean near-perfect,
    # snaive perfect too... so make the LAST season differ from the one
    # before (level shift inside the holdout window's seasonal lookback)
    vals2 = [5.0] * 48 + [5.0 + ((t * 31) % 7 - 3) * 0.5 for t in range(24)] + [5.0] * 24
    for t, v in enumerate(vals2):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x", v))
    # user 3: too short (<48) — must be excluded
    for t in range(30):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 3, "x", 1.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.series_id: r for r in ts.backtest_models(spark, d).collect()}
    assert 3 not in got

    def replay(vals):
        c = [int(round(v * 100)) for v in vals]
        n = len(c)
        hold, train = c[n - 24:], c[: n - 24]
        lt, mu = train[-1], sum(train) / len(train)
        mn = sum(abs(x - lt) for x in hold) / 2400.0
        msn = sum(abs(c[n - 24 + j] - c[n - 48 + j]) for j in range(24)) / 2400.0
        md = 0.0
        for x in hold:
            md = md + abs(float(x) - mu)
        mm = md / 2400.0
        best = "mean" if (mm <= mn and mm <= msn) else ("naive" if mn <= msn else "snaive")
        return (math.floor(mn * 1e6) / 1e6, math.floor(msn * 1e6) / 1e6,
                math.floor(mm * 1e6) / 1e6, best)

    v1 = [10.0 + (6.0 if t % 24 < 12 else -6.0) for t in range(96)]
    mn, msn, mm, best = replay(v1)
    r1 = got[1]
    assert (r1.mae_naive, r1.mae_snaive, r1.mae_mean, r1.best_model) == (mn, msn, mm, best)
    assert r1.mae_snaive == 0.0 and r1.best_model == "snaive"
    assert r1.n_train == 72

    mn, msn, mm, best = replay(vals2)
    r2 = got[2]
    assert (r2.mae_naive, r2.mae_snaive, r2.mae_mean, r2.best_model) == (mn, msn, mm, best)
    assert r2.best_model in ("mean", "naive")  # the wobbly prior season hurts snaive


def test_drawdown_matches_python_recompute(spark, tmp_path):
    """ts_drawdown vs an exact python replay: a rise-fall-rise series has
    its known worst drop; a monotone ramp has drawdown 0."""
    import math
    import os

    import pandas as pd

    rows, eid = [], 0
    vals1 = [10.0, 12.0, 11.0, 15.0, 9.0, 13.0, 14.0, 8.5, 16.0]
    for t, v in enumerate(vals1):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", v))
    for t in range(6):  # monotone ramp → zero drawdown
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x", float(t)))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.series_id: r for r in ts.drawdown(spark, d).collect()}

    c = [int(round(v * 100)) for v in vals1]
    peak, dd, mf = c[0], 0, 0.0
    for x in c[1:]:
        dd = max(dd, peak - x)
        if peak > 0:
            mf = max(mf, float(peak - x) / float(peak))
        peak = max(peak, x)
    r1 = got[1]
    assert r1.max_drawdown == dd / 100.0 == 6.5  # 15.0 → 8.5
    assert r1.max_drawdown_frac == math.floor(mf * 1e6) / 1e6
    assert r1.final_peak == 16.0 and r1.n_obs == 9

    r2 = got[2]
    assert r2.max_drawdown == 0.0 and r2.max_drawdown_frac == 0.0


def test_cusum_oracle_survives_duplicated_predicate_folds(spark):
    """Regression guard for the DuckDB v1.0.0 list_reduce mis-evaluation
    found while building ts_drawdown (identical CASE predicates in two
    fold slots can disagree on multi-step chains): stress the CUSUM
    ORACLE — whose fold duplicates its fired-predicate across five slots
    — against an exact python replay on alarm-heavy planted series."""
    import math

    import duckdb
    import pandas as pd

    rows, eid = [], 0
    for uid in range(12):
        for t in range(60):
            v = 10.0 + uid + (15.0 if (t // (7 + uid % 5)) % 2 else 0.0) + ((t * 13 + uid) % 7 - 3) * 0.7
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), uid, "x", round(v, 2), ""))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])

    con = duckdb.connect()
    con.register("events_df", pdf)
    con.sql("CREATE VIEW events AS SELECT * FROM events_df")
    res = con.sql(ts.CUSUM_SQL)
    cols = [d[0] for d in res.description]
    duck = {r[0]: dict(zip(cols, r)) for r in res.fetchall()}

    K, H = 0.5, 4.0
    for uid in range(12):
        c = [int(round(v * 100)) for v in pdf[pdf.user_id == uid].sort_values(["ts", "event_id"]).value]
        n = len(c)
        mu = sum(c) / n
        sigma = math.sqrt(max(sum(x * x for x in c) / n - mu * mu, 0.0))
        sp = sn = 0.0
        alarms, mxp, mxn, first = 0, 0.0, 0.0, -1
        for t, x in enumerate(c):
            z = (x - mu) / sigma if sigma > 0 else 0.0
            sp2, sn2 = max(0.0, sp + z - K), max(0.0, sn - z - K)
            mxp, mxn = max(mxp, sp2), max(mxn, sn2)
            if sp2 > H or sn2 > H:
                alarms += 1
                if first < 0:
                    first = t
                sp, sn = 0.0, 0.0
            else:
                sp, sn = sp2, sn2
        d = duck[uid]
        assert d["n_alarms"] == alarms and d["first_alarm_idx"] == first, uid
        assert d["max_cusum_pos"] == math.floor(mxp * 1e6) / 1e6, uid
        assert d["max_cusum_neg"] == math.floor(mxn * 1e6) / 1e6, uid


def test_pi_naive_matches_python_recompute(spark, tmp_path):
    """ts_pi_naive vs an exact replay: residual quantile picks, interval
    endpoints off the last observation, and in-sample coverage; a
    9-observation series is excluded."""
    import math
    import os

    import pandas as pd

    rows, eid = [], 0
    vals = [10.0, 10.5, 9.8, 10.2, 11.0, 10.9, 10.1, 10.6, 10.3, 10.8, 10.0, 10.4]
    for t, v in enumerate(vals):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", v))
    for t in range(9):  # below the 10-obs floor → excluded
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x", 5.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.series_id: r for r in ts.pi_naive(spark, d).collect()}
    assert 2 not in got

    c = [int(round(v * 100)) for v in vals]
    r = [c[i] - c[i - 1] for i in range(1, len(c))]
    m = len(r)
    srt = sorted(r)
    q05 = srt[max(math.ceil(m * 5 / 100), 1) - 1]
    q95 = srt[max(math.ceil(m * 95 / 100), 1) - 1]
    cov = sum(1 for x in r if q05 <= x <= q95) / m
    g = got[1]
    assert g.n_obs == len(c)
    assert g.q05_resid == q05 / 100.0 and g.q95_resid == q95 / 100.0
    assert g.pi_lo == (c[-1] + q05) / 100.0 and g.pi_hi == (c[-1] + q95) / 100.0
    assert g.coverage == math.floor(cov * 1e6) / 1e6
    assert g.pi_lo < vals[-1] < g.pi_hi  # the interval brackets the level


def test_hurst_planted_memory_regimes(spark, tmp_path):
    """Hurst readouts on planted dynamics: a strong linear trend scores
    persistent (H near 1 — block sums grow superlinearly), high-frequency
    alternation scores anti-persistent, and the estimate replays the
    exact aggregated-variance OLS."""
    import math
    import os

    import pandas as pd

    rows, eid = [], 0
    for t in range(128):  # user 1: ramp + tiny wobble → persistent
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x",
                     float(t) + ((t * 7) % 3) * 0.1))
    for t in range(128):  # user 2: +/- alternation → anti-persistent
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "x",
                     10.0 + (4.0 if t % 2 == 0 else -4.0) + ((t * 5) % 3) * 0.05))
    for t in range(40):  # user 3: too short → excluded
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 3, "x", 1.0))
    for t in range(128):  # user 4: CONSTANT (zero variance) → NULL-gated row
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 4, "x", 7.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in ts.hurst(spark, d).collect()}
    assert 3 not in got

    def replay(vals):
        c = [int(round(v * 100)) for v in vals]
        lnks = [0.0, math.log(4.0), math.log(16.0)]
        lvs = []
        for k in (1, 4, 16):
            nk = len(c) // k
            sums = [sum(c[j * k : (j + 1) * k]) for j in range(nk)]
            s1 = s2 = 0.0
            for x in sums:
                s1, s2 = s1 + float(x), s2 + float(x) * x
            lvs.append(math.log(max(s2 / nk - (s1 / nk) ** 2, 0.0)))
        mx = sum(lnks) / 3.0
        my = (lvs[0] + lvs[1] + lvs[2]) / 3.0
        cov = sum((x - mx) * (y - my) for x, y in zip(lnks, lvs)) / 3.0
        vx = sum((x - mx) ** 2 for x in lnks) / 3.0
        return cov / vx / 2.0

    v1 = [float(t) + ((t * 7) % 3) * 0.1 for t in range(128)]
    h1 = replay(v1)
    r1 = got[1]
    assert r1.hurst == math.floor(h1 * 1e6) / 1e6
    assert r1.character == "persistent" and r1.hurst > 0.9

    v2 = [10.0 + (4.0 if t % 2 == 0 else -4.0) + ((t * 5) % 3) * 0.05 for t in range(128)]
    h2 = replay(v2)
    r2 = got[2]
    assert r2.hurst == math.floor(h2 * 1e6) / 1e6
    assert r2.character == "anti-persistent" and r2.hurst < 0.2

    # user 4 (constant, zero block variance at every k): the row survives
    # with NULL hurst/character — and, critically, the ORACLE survives too.
    # DuckDB ln(0) throws 'Out of Range Error', so before HURST_SQL gated
    # ln behind nullif, ONE degenerate series aborted the whole gate query
    # (ADVICE r6). Run the oracle on the same frame and compare all rows.
    import duckdb

    r4 = got[4]
    assert r4.n_obs == 128 and r4.hurst is None and r4.character is None

    con = duckdb.connect()
    con.register("events_df", pdf)
    con.sql("CREATE VIEW events AS SELECT * FROM events_df")
    duck = {r[0]: r for r in con.sql(ts.HURST_SQL).fetchall()}
    assert set(duck) == set(got) == {1, 2, 4}
    for uid, row in got.items():
        assert (row.n_obs, row.hurst, row.character) == duck[uid][1:]


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, value) → events.parquet fixture."""
    import os

    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["event_type"] = "x"
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]].to_parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def test_runs_test_planted_regimes(spark, tmp_path):
    """Alternating series → far too many runs (z ≫ 0, 'alternating');
    two-level step series → two runs only (z ≪ 0, 'clustered'); both z
    values replay the exact n1/n2/R normal approximation."""
    import math

    import pandas as pd

    rows, eid = [], 0
    for t in range(40):  # user 1: strict +/- alternation around median
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1,
                     10.0 + (1.0 if t % 2 == 0 else -1.0)))
    for t in range(40):  # user 2: low block then high block → 2 runs
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2,
                     (5.0 if t < 20 else 15.0)))
    d = _write_events(tmp_path, rows)

    got = {r.user_id: r for r in ts.runs_test(spark, d).collect()}

    def replay(signs):
        m = len(signs)
        runs = 1 + sum(1 for i in range(1, m) if signs[i] != signs[i - 1])
        n1 = sum(1 for s in signs if s == 1)
        a, b = float(n1), float(m - n1)
        mu = 2.0 * a * b / m + 1.0
        var = 2.0 * a * b * (2.0 * a * b - m) / (m * m * (m - 1.0))
        return runs, n1, (runs - mu) / math.sqrt(var)

    r1, n1_1, z1 = replay([1 if t % 2 == 0 else -1 for t in range(40)])
    assert got[1].n_runs == r1 == 40 and got[1].n_above == n1_1 == 20
    assert got[1].z == math.floor(z1 * 1e6) / 1e6 and got[1].verdict == "alternating"

    r2, n1_2, z2 = replay([-1] * 20 + [1] * 20)
    assert got[2].n_runs == r2 == 2
    assert got[2].z == math.floor(z2 * 1e6) / 1e6 and got[2].verdict == "clustered"


def test_rsi_planted_momentum(spark, tmp_path):
    """Strictly rising series → all gains, RSI = 100, overbought; strictly
    falling → RSI = 0, oversold; a mixed series replays the exact
    zero-seeded Wilder fold in cents."""
    import math

    import pandas as pd

    rows, eid = [], 0
    for t in range(20):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, 10.0 + t))
    for t in range(20):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, 50.0 - t))
    vals3 = [10.0 + ((t * 7) % 5) - 2 + (0.5 if t % 3 == 0 else 0.0) for t in range(30)]
    for t, v in enumerate(vals3):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 3, v))
    d = _write_events(tmp_path, rows)

    got = {r.user_id: r for r in ts.rsi(spark, d).collect()}
    assert got[1].rsi == 100.0 and got[1].verdict == "overbought" and got[1].avg_loss == 0.0
    assert got[2].rsi == 0.0 and got[2].verdict == "oversold" and got[2].avg_gain == 0.0

    def replay(vals):
        c = [int(round(v * 100)) for v in vals]
        ag = al = 0.0
        for i in range(1, len(c)):
            x = float(c[i] - c[i - 1])
            ag = (ag * 13.0 + max(x, 0.0)) / 14.0
            al = (al * 13.0 + max(-x, 0.0)) / 14.0
        return ag, al, 100.0 - 100.0 / (1.0 + ag / al)

    ag, al, r = replay(vals3)
    assert got[3].avg_gain == math.floor(ag / 100.0 * 1e6) / 1e6
    assert got[3].avg_loss == math.floor(al / 100.0 * 1e6) / 1e6
    assert got[3].rsi == math.floor(r * 1e6) / 1e6


def test_bollinger_planted_breach(spark, tmp_path):
    """A flat series with one mid-stream spike: the spike row breaches the
    upper band exactly once (the window self-inflates afterwards), %B of
    the last full window replays exactly."""
    import math

    import pandas as pd

    vals = [10.0 + (0.2 if t % 2 == 0 else -0.2) for t in range(40)]
    vals[30] = 25.0  # planted spike
    rows = [
        (t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, v)
        for t, v in enumerate(vals)
    ]
    d = _write_events(tmp_path, rows)
    r = ts.bollinger(spark, d).collect()[0]

    c = [int(round(v * 100)) for v in vals]
    up = dn = 0
    pb_last = None
    for i in range(19, len(c)):
        w = c[i - 19 : i + 1]
        wn = 20.0
        mu = sum(w) / wn
        sd = math.sqrt(max(sum(x * x for x in w) / wn - mu * mu, 0.0))
        hi, lo = mu + 2.0 * sd, mu - 2.0 * sd
        x = float(c[i])
        if x > hi:
            up += 1
        if x < lo:
            dn += 1
        if hi > lo:
            pb_last = (x - lo) / (hi - lo)
    assert r.n_obs == 40 and r.n_eval == 21
    assert r.n_breach_upper == up == 1 and r.n_breach_lower == dn
    assert r.pct_b_last == math.floor(pb_last * 1e6) / 1e6


def test_ljung_box_planted_structure(spark, tmp_path):
    """Strict alternation → huge Q ('correlated', r1 ≈ −1); a hash-noise
    series → small Q ('white'). Q and r1 replay the exact fold order."""
    import math

    import pandas as pd

    rows, eid = [], 0
    v1 = [10.0 + (2.0 if t % 2 == 0 else -2.0) for t in range(60)]
    for t, v in enumerate(v1):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, v))
    import random

    rng = random.Random(7)  # Mersenne Twister: stable across platforms
    v2 = [round(10.0 + rng.uniform(-5.0, 5.0), 2) for _ in range(60)]
    for t, v in enumerate(v2):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, v))
    d = _write_events(tmp_path, rows)

    got = {r.user_id: r for r in ts.ljung_box(spark, d).collect()}

    def replay(vals):
        c = [int(round(v * 100)) for v in vals]
        n = len(c)
        mu = float(sum(c)) / float(n)
        dev = [float(x) - mu for x in c]
        denom = 0.0
        for x in dev:
            denom += x * x
        acc, r1 = 0.0, None
        for k in range(1, 6):
            num = 0.0
            for t in range(n - k):
                num += dev[t] * dev[t + k]
            rk = num / denom
            if k == 1:
                r1 = rk
            acc = acc + rk * rk / (n - float(k))
        return r1, n * (n + 2.0) * acc

    r1, q1 = replay(v1)
    assert got[1].q_stat == math.floor(q1 * 1e6) / 1e6
    assert got[1].acf_lag1 == math.floor(r1 * 1e6) / 1e6
    assert got[1].verdict == "correlated" and got[1].acf_lag1 < -0.9

    r2, q2 = replay(v2)
    assert got[2].q_stat == math.floor(q2 * 1e6) / 1e6
    assert got[2].verdict == "white"


def test_spectral_entropy_planted_cycle(spark, tmp_path):
    """A clean 24 h square-wave spend signal concentrates its candidate
    power (low entropy) vs hash-noise spend (high entropy); both replay
    the exact rotation folds."""
    import math

    import pandas as pd

    from timedb_spark.operators.timeseries import _SPECENT_LN_K, _SPECENT_PERIODS

    rows, eid = [], 0
    for t in range(7 * 24):  # user 1: 24h cycle
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1,
                     20.0 if t % 24 < 12 else 2.0))
    # user 2: equal-amplitude cosine at EVERY candidate period → candidate
    # power provably spread → near-maximal entropy
    flat_vals = [
        round(20.0 + sum(math.cos(2.0 * math.pi * t / p_) for p_ in _SPECENT_PERIODS), 2)
        for t in range(7 * 24)
    ]
    for t, v in enumerate(flat_vals):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, v))
    d = _write_events(tmp_path, rows)

    got = {r.user_id: r for r in ts.spectral_entropy(spark, d).collect()}

    def replay(vals):
        x = [round(v, 2) for v in vals]
        powers = []
        n = float(len(x))
        for cp, sp in _SPECENT_PERIODS.values():
            c_, s_, sc, ss = 1.0, 0.0, 0.0, 0.0
            for v in x:
                c_, s_, sc, ss = (
                    c_ * cp - s_ * sp,
                    c_ * sp + s_ * cp,
                    sc + v * c_,
                    ss + v * s_,
                )
            powers.append((sc * sc + ss * ss) / (n * n))
        total = powers[0]
        for p in powers[1:]:
            total = total + p
        ent = 0.0
        for p in powers:
            share = p / total
            if share > 0:
                ent = ent + (-share * math.log(share))
        return total, ent / _SPECENT_LN_K

    t1, h1 = replay([20.0 if t % 24 < 12 else 2.0 for t in range(7 * 24)])
    assert got[1].spectral_entropy == math.floor(h1 * 1e6) / 1e6
    assert got[1].total_power == math.floor(t1 * 1e6) / 1e6
    t2, h2 = replay(flat_vals)
    assert got[2].spectral_entropy == math.floor(h2 * 1e6) / 1e6
    assert got[1].spectral_entropy < got[2].spectral_entropy
    # spectral leakage (48h/84h fit 3.5 / 2 cycles into the 168h window) and
    # the DC offset keep the 8-candidate spectrum short of perfectly flat —
    # assert the ordering and the non-concentrated verdict, values replay.
    assert got[2].verdict in ("flat", "mixed") and got[2].spectral_entropy > 0.5


def test_anomaly_online_planted_spike(spark, tmp_path):
    """A stable ±0.5 series with one +40 spike after warm-up: exactly one
    alert, at the spike's 0-based index, and never before observation 10;
    mean/std replay the exact Welford recursion. A spike INSIDE the
    warm-up window (user 2) must NOT alert."""
    import math

    import pandas as pd

    vals1 = [10.0 + (0.5 if t % 2 == 0 else -0.5) for t in range(30)]
    vals1[20] = 50.0
    vals2 = [10.0 + (0.5 if t % 2 == 0 else -0.5) for t in range(30)]
    vals2[5] = 50.0  # inside warm-up: prefix n < 10 → no alert; it fattens σ
    rows, eid = [], 0
    for uid, vals in ((1, vals1), (2, vals2)):
        for t, v in enumerate(vals):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), uid, v))
    d = _write_events(tmp_path, rows)

    got = {r.user_id: r for r in ts.anomaly_online(spark, d).collect()}

    def replay(vals):
        c = [int(round(v * 100)) for v in vals]
        n, mean, m2, alerts, first = 0, 0.0, 0.0, 0, -1
        for ci in c:
            x = float(ci)
            if n >= 10 and m2 > 0.0 and abs(x - mean) / math.sqrt(m2 / n) > 3.0:
                alerts += 1
                if first < 0:
                    first = n
            n += 1
            delta = x - mean
            mean = mean + delta / n
            m2 = m2 + delta * (x - mean)
        return n, alerts, first, mean, m2

    n1, a1, f1, mean1, m21 = replay(vals1)
    r1 = got[1]
    assert (r1.n_events, r1.n_alerts, r1.first_alert_idx) == (30, 1, 20)
    assert (a1, f1) == (1, 20)
    assert r1.mean_value == math.floor(mean1 / 100.0 * 1e6) / 1e6
    assert r1.std_value == math.floor(math.sqrt(m21 / n1) / 100.0 * 1e6) / 1e6

    n2, a2, f2, _, _ = replay(vals2)
    r2 = got[2]
    assert (r2.n_events, r2.n_alerts, r2.first_alert_idx) == (30, a2, f2)
    assert r2.n_alerts == 0 and r2.first_alert_idx == -1


def test_pacf_planted_ar_structure(spark, tmp_path):
    """PACF replays the exact unrolled Durbin–Levinson algebra; an
    alternation (AR(1)-like, φ₁₁ ≈ −1) selects order ≥ 1 with
    near-vanishing φ₂₂ after the lag-1 structure is regressed out."""
    import math

    import pandas as pd

    v1 = [10.0 + (2.0 if t % 2 == 0 else -2.0) + ((t * 5) % 3) * 0.05 for t in range(60)]
    rows = [(t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, v)
            for t, v in enumerate(v1)]
    d = _write_events(tmp_path, rows)
    r = ts.pacf(spark, d).collect()[0]

    c = [int(round(v * 100)) for v in v1]
    n = len(c)
    mu = float(sum(c)) / float(n)
    dev = [float(x) - mu for x in c]
    denom = 0.0
    for x in dev:
        denom += x * x
    rk = []
    for k in (1, 2, 3):
        num = 0.0
        for t in range(n - k):
            num += dev[t] * dev[t + k]
        rk.append(num / denom)
    r1, r2, r3 = rk
    phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    phi21 = r1 - phi22 * r1
    phi33 = (r3 - (phi21 * r2 + phi22 * r1)) / (1.0 - (phi21 * r1 + phi22 * r2))
    assert r.pacf1 == math.floor(r1 * 1e6) / 1e6
    assert r.pacf2 == math.floor(phi22 * 1e6) / 1e6
    assert r.pacf3 == math.floor(phi33 * 1e6) / 1e6
    assert r1 < -0.9  # the alternation is the lag-1 story
    assert r.ar_order >= 1


def test_ccf_planted_lead_lag(spark, tmp_path):
    """Type 'view' strictly leads type 'purchase' by one hour (y_{t+1} =
    x_t): the CCF peaks at exactly lag +1 with corr 1; other lags stay
    below it."""
    import os

    import pandas as pd

    vals = [10.0 + ((t * 7) % 13) for t in range(48)]
    rows, eid = [], 0
    for t, v in enumerate(vals):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "view", v))
    for t, v in enumerate(vals):  # same signal one hour LATER
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t + 1), 2, "purchase", v))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.lag: r for r in ts.ccf(spark, d).collect()}
    assert got[1].type_a == "purchase" and got[1].type_b == "view"
    # type_a < type_b alphabetically: purchase < view, so ccf at lag L is
    # corr(purchase_t, view_{t+L}); view leads purchase by 1h → peak at -1
    assert got[-1].ccf == 1.0
    assert all(got[k].ccf < 1.0 for k in got if k != -1)


def test_macd_planted_momentum(spark, tmp_path):
    """A steady ramp keeps the fast EMA above the slow one → bullish; a
    mixed hash-noise series replays the exact three-EMA fold in cents."""
    import math

    import pandas as pd

    rows, eid = [], 0
    for t in range(40):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, 10.0 + 2.0 * t))
    vals2 = [20.0 + ((t * 13) % 7) - 3 + (0.25 if t % 4 == 0 else 0.0) for t in range(35)]
    for t, v in enumerate(vals2):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, v))
    d = _write_events(tmp_path, rows)
    got = {r.user_id: r for r in ts.macd(spark, d).collect()}

    assert got[1].verdict == "bullish" and got[1].macd > 0.0
    assert got[1].hist_min == 0.0  # ramp never dips the histogram below the zero seed

    def replay(vals):
        x = [float(int(round(v * 100))) for v in vals]
        fa, sl, sg = 2.0 / 13.0, 2.0 / 27.0, 0.2
        e12 = e26 = x[0]
        sig = hmax = hmin = 0.0
        for v in x[1:]:
            e12 = e12 + (v - e12) * fa
            e26 = e26 + (v - e26) * sl
            sig = sig + ((e12 - e26) - sig) * sg
            h = (e12 - e26) - sig
            hmax, hmin = max(hmax, h), min(hmin, h)
        return e12, e26, sig, hmax, hmin

    e12, e26, sig, hmax, hmin = replay(vals2)
    r = got[2]
    assert r.macd == math.floor((e12 - e26) / 100.0 * 1e6) / 1e6
    assert r.macd_signal == math.floor(sig / 100.0 * 1e6) / 1e6
    assert r.macd_hist == math.floor((e12 - e26 - sig) / 100.0 * 1e6) / 1e6
    assert r.hist_max == math.floor(hmax / 100.0 * 1e6) / 1e6
    assert r.hist_min == math.floor(hmin / 100.0 * 1e6) / 1e6


def test_sharpe_planted_ratios(spark, tmp_path):
    """Constant +1 steps → zero volatility (Sharpe/Sortino NULL, no
    downside); a mixed series replays the exact integer moment sums."""
    import math

    import pandas as pd

    rows, eid = [], 0
    for t in range(35):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, 10.0 + t))
    vals2 = [50.0 + ((t * 11) % 9) - 4 for t in range(40)]
    for t, v in enumerate(vals2):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, v))
    d = _write_events(tmp_path, rows)
    got = {r.user_id: r for r in ts.sharpe(spark, d).collect()}

    assert got[1].mean_chg == 1.0 and got[1].volatility == 0.0
    assert got[1].downside_dev == 0.0
    assert got[1].sharpe is None and got[1].sortino is None

    c = [int(round(v * 100)) for v in vals2]
    dl = [c[i] - c[i - 1] for i in range(1, len(c))]
    n = float(len(dl))
    mean = sum(dl) / n
    vol = math.sqrt(max(sum(x * x for x in dl) / n - mean * mean, 0.0))
    ddev = math.sqrt(sum(min(x, 0) ** 2 for x in dl) / n)
    r = got[2]
    assert r.n_ret == len(dl)
    assert r.mean_chg == math.floor(mean / 100.0 * 1e6) / 1e6
    assert r.volatility == math.floor(vol / 100.0 * 1e6) / 1e6
    assert r.sharpe == math.floor(mean / vol * 1e6) / 1e6
    assert r.sortino == math.floor(mean / ddev * 1e6) / 1e6


def test_benford_planted_distributions(spark, tmp_path):
    """A multi-scale geometric sample follows Benford (verdict benford_ok);
    a uniform two-digit sample deviates; counts and χ² replay exactly."""
    import math

    import pandas as pd

    # geometric sweep: v = 1.07^k spans 4 decades → near-Benford digits
    rows = [
        (k + 1, datetime(2024, 1, 1) + pd.Timedelta(minutes=k), 1, 1.07 ** k)
        for k in range(300)
    ]
    d = _write_events(tmp_path, rows)
    out = ts.benford(spark, d).collect()
    assert len(out) == 9 and all(r.verdict == "benford_ok" for r in out)

    digits = {}
    for k in range(300):
        v = 1.07 ** k
        dg = int(v / (10 ** math.floor(math.log10(v))))
        digits[dg] = digits.get(dg, 0) + 1
    got = {r.digit: r for r in out}
    assert {dg: r.n for dg, r in got.items()} == digits
    total = 300.0
    chi2 = sum(
        (digits[dg] - total * math.log10(1 + 1 / dg)) ** 2 / (total * math.log10(1 + 1 / dg))
        for dg in range(1, 10)
    )
    assert got[1].chi2_total == math.floor(chi2 * 1e6) / 1e6

    # uniform 10..99 values: first digits uniform → strong deviation
    rows = [
        (k + 1, datetime(2024, 1, 1) + pd.Timedelta(minutes=k), 1, float(10 + (k % 90)))
        for k in range(360)
    ]
    d2 = _write_events(tmp_path, rows)
    out2 = ts.benford(spark, d2).collect()
    assert all(r.verdict == "deviates" for r in out2)


def test_adf_planted_regimes(spark, tmp_path):
    """Mean-reverting hash noise → stationary (strongly negative DF stat);
    a drifting random walk of the same innovations → unit_root; β replays
    the exact closed-form OLS."""
    import math

    import pandas as pd

    s, noise = 5, []  # LCG innovations: a genuine-looking walk, no periodic cancel
    for _ in range(80):
        s = (s * 1103515245 + 12345) % (2**31)
        noise.append((s % 13) - 6)
    rows, eid = [], 0
    for t, e in enumerate(noise):  # white noise around 100 → stationary
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, 100.0 + e))
    walk = 500.0
    for t, e in enumerate(noise):  # random walk → unit root
        walk += e
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, walk))
    d = _write_events(tmp_path, rows)
    got = {r.user_id: r for r in ts.adf(spark, d).collect()}

    assert got[1].verdict == "stationary" and got[1].df_stat < -2.86
    assert got[2].verdict == "unit_root" and got[2].df_stat > -2.86

    def replay(vals):
        c = [int(round(v * 100)) for v in vals]
        ys = [(c[i - 1], c[i] - c[i - 1]) for i in range(1, len(c))]
        n = float(len(ys))
        sy = sum(y for y, _ in ys); syy = sum(y * y for y, _ in ys)
        sd = sum(dy for _, dy in ys); sdd = sum(dy * dy for _, dy in ys)
        syd = sum(y * dy for y, dy in ys)
        beta = (n * syd - sy * sd) / (n * syy - sy * sy)
        return beta

    beta1 = replay([100.0 + e for e in noise])
    assert got[1].beta == math.floor(beta1 * 1e6) / 1e6


def test_var_es_planted_tails(spark, tmp_path):
    """A series with a few large planted drops: VaR/ES match the exact
    order statistics of the delta multiset."""
    import math

    import pandas as pd

    deltas = [1.0] * 30 + [-8.0, -20.0, 2.0, 3.0, -1.0, 4.0, -2.0, 5.0, 6.0]
    vals, v = [100.0], 100.0
    for dl in deltas:
        v += dl
        vals.append(v)
    rows = [
        (t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, x)
        for t, x in enumerate(vals)
    ]
    d = _write_events(tmp_path, rows)
    r = ts.var_es(spark, d).collect()[0]

    dl_sorted = sorted(int(round(x * 100)) for x in deltas)
    n = len(dl_sorted)
    k95, k99 = (n + 19) // 20, (n + 99) // 100
    assert r.n_ret == n
    assert r.var95 == math.floor(-dl_sorted[k95 - 1] / 100.0 * 1e6) / 1e6
    assert r.es95 == math.floor(-(sum(dl_sorted[:k95]) / k95) / 100.0 * 1e6) / 1e6
    assert r.var99 == math.floor(-dl_sorted[k99 - 1] / 100.0 * 1e6) / 1e6
    assert r.var99 == 20.0  # the single worst planted drop


def test_sax_motif_shape_groups(spark, tmp_path):
    """Two identical up-ramps share one SAX word (n_series = 2, example =
    min user); a down-ramp lands in the mirrored word; shares floor-scale."""
    import math

    import pandas as pd

    rows, eid = [], 0
    for uid in (1, 2):  # identical up-ramps → same word
        for t in range(16):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), uid, 10.0 + t))
    for t in range(16):  # down-ramp → mirrored word
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 3, 40.0 - t))
    d = _write_events(tmp_path, rows)

    out = ts.sax_motif(spark, d).collect()
    assert [r.n_series for r in out] == [2, 1]
    top = out[0]
    assert top.example_user == 1 and top.sax_word == out[0].sax_word
    assert top.share == math.floor(2.0 / 3.0 * 1e6) / 1e6
    # ramps symbolize monotonically: word ascends a→d, mirror descends
    assert top.sax_word == "".join(sorted(top.sax_word))
    assert out[1].sax_word == top.sax_word[::-1]


def test_forecast_ensemble_weights_and_blend(spark, tmp_path):
    """A pure seasonal series (period 24) gives snaive zero holdout error →
    it dominates the weights, and every output replays the exact inverse-
    MAE combination in python."""
    import math

    import pandas as pd

    vals = [10.0 + 5.0 * ((t % 24) in (3, 7)) + (t % 3) * 0.25 for t in range(96)]
    rows = [
        (t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, v)
        for t, v in enumerate(vals)
    ]
    d = _write_events(tmp_path, rows)
    r = ts.forecast_ensemble(spark, d).collect()[0]

    c = [int(round(v * 100)) for v in vals]
    n, H, S = len(c), 24, 24
    hold, lt = c[n - H:], c[n - H - 1]
    mu = sum(c[: n - H]) / (n - H)
    mn = sum(abs(x - lt) for x in hold) / (100.0 * H)
    ms = sum(abs(c[n - H + j] - c[n - H - S + j]) for j in range(H)) / (100.0 * H)
    acc = 0.0
    for x in hold:
        acc += abs(float(x) - mu)
    mm = acc / (100.0 * H)
    eps = 0.01
    iv = [1 / (mn + eps), 1 / (ms + eps), 1 / (mm + eps)]
    tot = iv[0] + iv[1] + iv[2]
    f = [float(c[-1]), float(c[n - S]), sum(c) / n]
    blend = (iv[0] * f[0] + iv[1] * f[1] + iv[2] * f[2]) / tot

    assert ms == 0.0 and r.mae_snaive == 0.0
    assert r.w_snaive > r.w_naive and r.w_snaive > r.w_mean
    assert r.w_naive == math.floor(iv[0] / tot * 1e6) / 1e6
    assert r.w_snaive == math.floor(iv[1] / tot * 1e6) / 1e6
    assert r.forecast_blend == math.floor(blend / 100.0 * 1e6) / 1e6


def test_granger_planted_causality(spark, tmp_path):
    """y follows x's previous hour exactly (y_t = x_{t-1}) while x is LCG
    noise: x→y is flagged granger-causal with a huge F, the reverse
    direction is not, and both F statistics replay the closed form."""
    import math

    import pandas as pd

    s, xs = 11, []
    for _ in range(81):
        s = (s * 1103515245 + 12345) % (2**31)
        xs.append(float(10 + (s % 50)))
    # y = x one hour late + small jitter (an EXACT copy fits perfectly,
    # ssr_u = 0, and the zero-residual guard correctly NULLs the test)
    ys = {t: xs[t - 1] + 0.25 * ((t * 7) % 4) for t in range(1, 81)}
    import os

    rows, eid = [], 0
    for t, xv in enumerate(xs):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, "x", xv))
        if t >= 1:
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, "y", ys[t]))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    out = {(r.type_x, r.type_y): r for r in ts.granger(spark, d).collect()}

    assert out[("x", "y")].verdict == "granger_causal"
    assert out[("y", "x")].verdict == "no_evidence"

    # hourly grid: x series at hours 0..80, y at hours 1..80
    xh = {t: xs[t] for t in range(81)}
    # x→y rows: y_t at h, y_{t-1} and x_{t-1} at h-1 (h >= 2)
    yt = [ys[h] for h in range(2, 81)]
    y1 = [ys[h - 1] for h in range(2, 81)]
    x1 = [xh[h - 1] for h in range(2, 81)]
    nd = float(len(yt))
    S = lambda a, b: sum(i * j for i, j in zip(a, b))
    cyy = S(yt, yt) - sum(yt) ** 2 / nd
    cy1y1 = S(y1, y1) - sum(y1) ** 2 / nd
    cx1x1 = S(x1, x1) - sum(x1) ** 2 / nd
    cyy1 = S(yt, y1) - sum(yt) * sum(y1) / nd
    cyx1 = S(yt, x1) - sum(yt) * sum(x1) / nd
    cy1x1 = S(y1, x1) - sum(y1) * sum(x1) / nd
    ssr_r = cyy - cyy1**2 / cy1y1
    det = cy1y1 * cx1x1 - cy1x1**2
    b = (cyy1 * cx1x1 - cyx1 * cy1x1) / det
    c = (cyx1 * cy1y1 - cyy1 * cy1x1) / det
    ssr_u = cyy - b * cyy1 - c * cyx1
    f = (ssr_r - ssr_u) / (ssr_u / (nd - 3.0))
    assert out[("x", "y")].f_stat == math.floor(f * 1e6) / 1e6
    assert out[("x", "y")].n == len(yt)


def test_load_curve_planted_profile(spark, tmp_path):
    """A 20-observation profile with one peak: exceedance picks replay the
    exact k = ceil(q*n) order statistics and the load factor is
    mean/peak."""
    import math

    import pandas as pd

    vals = [float(v) for v in [50, 52, 48, 51, 49, 50, 53, 47, 50, 52,
                               100, 51, 49, 50, 48, 52, 50, 51, 49, 50]]
    rows = [
        (t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, v)
        for t, v in enumerate(vals)
    ]
    d = _write_events(tmp_path, rows)
    r = ts.load_curve(spark, d).collect()[0]

    c = sorted(int(round(v * 100)) for v in vals)
    n = len(c)
    pick = lambda qn, qd: c[n - ((n * qn + qd - 1) // qd)] / 100.0
    assert r.n_obs == 20 and r.peak == 100.0
    assert r.p10_exceed == pick(1, 10)
    assert r.p50_exceed == pick(1, 2)
    assert r.p90_exceed == pick(9, 10)
    mean = sum(c) / n / 100.0
    assert r.mean_load == math.floor(mean * 1e6) / 1e6
    assert r.load_factor == math.floor(mean / 100.0 * 1e6) / 1e6
    assert r.peak_trough_ratio == math.floor(100.0 / 47.0 * 1e6) / 1e6


def test_peak_detect_planted_peaks(spark, tmp_path):
    """Two prominent spikes on a flat line are the only peaks; a strict-max
    plateau (two equal tops) and a sub-prominence wiggle are rejected;
    spacing replays the exact microsecond mean."""
    import math

    import pandas as pd

    vals = [100.0] * 30
    vals[5] = 150.0    # peak 1
    vals[20] = 140.0   # peak 2
    vals[10] = 102.0   # wiggle: 20*(10200-10000)=40000 < 10200? no — prominent?
    vals[10] = 100.5   # 20*(10050-10000)=1000 < 10050 → NOT prominent
    vals[14] = 130.0   # plateau pair...
    vals[15] = 130.0   # two equal tops → neither is a STRICT max
    rows = [
        (t + 1, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, v)
        for t, v in enumerate(vals)
    ]
    d = _write_events(tmp_path, rows)
    r = ts.peak_detect(spark, d).collect()[0]

    assert r.n_obs == 30 and r.n_peaks == 2
    assert r.max_peak == 150.0
    assert r.peak_rate == math.floor(2 / 30 * 1e6) / 1e6
    # peaks at hours 5 and 20 → one 15-hour gap
    assert r.mean_gap_minutes == 15 * 60.0


def test_missingness_planted_holes(spark, tmp_path):
    """A series spanning 50 hours with 5 missing ones scores 45/50; a
    dense series is 'complete'."""
    import math

    import pandas as pd

    rows, eid = [], 0
    holes = {7, 13, 21, 33, 40}
    for t in range(50):
        if t in holes:
            continue
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, 10.0))
    for t in range(30):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, 10.0))
    d = _write_events(tmp_path, rows)
    out = {r.user_id: r for r in ts.missingness(spark, d).collect()}
    assert out[1].n_hours_expected == 50 and out[1].n_missing == 5
    assert out[1].completeness == math.floor(45 / 50 * 1e6) / 1e6
    assert out[1].verdict == "gappy"
    assert out[2].verdict == "complete" and out[2].n_missing == 0


def test_arch_test_planted_regimes(spark, tmp_path):
    """Alternating calm/turbulent blocks autocorrelate the squared changes
    (arch_effect); same-magnitude changes applied uniformly are
    homoskedastic; Q replays the exact fold."""
    import math

    import pandas as pd

    rows, eid = [], 0
    # user 1: 10 calm (±0.1) then 10 wild (±8) alternating blocks — ARCH
    v, vals1 = 100.0, []
    for t in range(80):
        amp = 8.0 if (t // 10) % 2 else 0.1
        v += amp if t % 2 == 0 else -amp
        vals1.append(v)
    for t, x in enumerate(vals1):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, x))
    # user 2: constant ±3 alternation — squared changes constant → denom 0
    # guard? no: all squared deltas equal → dev 0 → denom 0 → filtered out
    v, vals2 = 100.0, []
    for t in range(80):
        v += 3.0 if t % 2 == 0 else -3.0
        vals2.append(v)
    for t, x in enumerate(vals2):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, x))
    # user 3: LCG-modulated magnitudes, no regime structure
    s, v, vals3 = 9, 100.0, []
    for t in range(80):
        s = (s * 1103515245 + 12345) % (2**31)
        amp = 1.0 + (s % 7)
        v += amp if t % 2 == 0 else -amp
        vals3.append(v)
    for t, x in enumerate(vals3):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 3, x))
    d = _write_events(tmp_path, rows)

    out = {r.user_id: r for r in ts.arch_test(spark, d).collect()}
    assert out[1].verdict == "arch_effect" and out[1].acf_sq_lag1 > 0.3
    assert 2 not in out  # zero-variance squared changes filtered by denom>0
    assert out[3].verdict == "homoskedastic"

    def replay(vals):
        c = [int(round(x * 100)) for x in vals]
        c2 = [(c[i] - c[i - 1]) ** 2 for i in range(1, len(c))]
        n = len(c2)
        mu = sum(c2) / n
        dev = [x - mu for x in c2]
        denom = sum(x * x for x in dev)
        q = 0.0
        for k in range(1, 6):
            rk = sum(dev[t] * dev[t + k] for t in range(n - k)) / denom
            q += rk * rk / (n - k)
        return n * (n + 2.0) * q

    assert out[1].q_stat == math.floor(replay(vals1) * 1e6) / 1e6


def test_dist_drift_planted_shift(spark, tmp_path):
    """A series whose second half jumps to a new level drifts (all mass in
    the top bin); a stationary hash-noise series is stable; χ² replays."""
    import math

    import pandas as pd

    rows, eid = [], 0
    vals1 = [10.0 + ((t * 7) % 5) for t in range(30)] + [50.0 + ((t * 7) % 5) for t in range(30)]
    for t, v in enumerate(vals1):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 1, v))
    vals2 = [20.0 + ((t * 11) % 9) for t in range(60)]
    for t, v in enumerate(vals2):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t), 2, v))
    d = _write_events(tmp_path, rows)
    out = {r.user_id: r for r in ts.dist_drift(spark, d).collect()}

    assert out[1].verdict == "drifted"
    # the shifted half sits entirely above the full-series median: the two
    # lower bins empty (q3 falls inside the shifted level band, so the
    # upper mass splits between bins 3 and 4)
    assert out[1].h2_bin1 == 0 and out[1].h2_bin2 == 0
    assert out[1].h2_bin3 + out[1].h2_bin4 == 30
    assert out[2].verdict == "stable"

    def replay(vals):
        c = sorted(int(round(v * 100)) for v in vals)
        n = len(c)
        q = lambda qn, qd: c[((n * qn + qd - 1) // qd) - 1]
        q1, q2, q3 = q(1, 4), q(1, 2), q(3, 4)
        raw = [int(round(v * 100)) for v in vals]
        nh = n // 2
        h1, h2 = raw[:nh], raw[nh:]

        def bins(h):
            return [
                sum(1 for x in h if x <= q1),
                sum(1 for x in h if q1 < x <= q2),
                sum(1 for x in h if q2 < x <= q3),
                sum(1 for x in h if x > q3),
            ]

        a, b = bins(h1), bins(h2)
        n2 = float(len(h2))
        chi2 = 0.0
        for ac, bc in zip(a, b):
            exp = max(ac / nh * n2, 0.5)
            chi2 += (bc - exp) ** 2 / exp
        return chi2

    assert out[1].chi2 == math.floor(replay(vals1) * 1e6) / 1e6
    assert out[2].chi2 == math.floor(replay(vals2) * 1e6) / 1e6


def test_benford_first_digit_power_of_ten_boundaries(spark, tmp_path):
    """The r8 digit extraction (DECIMAL string rendering, not float
    log10/pow/floor) must bin exact powers of ten as digit 1 and their
    1-ulp-below neighbors as digit 9 — the boundary where a libm
    difference between engines could flip a bin under the old float
    formulation. Spark and the DuckDB oracle replay must agree bin for
    bin on the planted boundary set."""
    import math

    import duckdb
    import pandas as pd

    vals = [
        1.0, 10.0, 100.0, 1000.0, 0.1, 0.001,          # exact powers of ten -> 1
        math.nextafter(1.0, 0.0),                      # 0.999... -> 9
        math.nextafter(10.0, 0.0),                     # 9.999... -> 9
        math.nextafter(1.0, 2.0),                      # 1.000...1 -> 1
        9.999999999999998, 560.21, 2.5, -30.0,         # sign stripped -> 3
        0.0,                                           # no digit at all: must be
                                                       # DROPPED, not a cast error
                                                       # (DuckDB reorders filter
                                                       # conjuncts past the
                                                       # abs>1e-9 guard)
    ]
    expected = [1, 1, 1, 1, 1, 1, 9, 9, 1, 9, 5, 2, 3]  # 0.0 contributes nothing
    rows = [
        (k + 1, datetime(2024, 1, 1) + pd.Timedelta(minutes=k), 1, v)
        for k, v in enumerate(vals)
    ]
    d = _write_events(tmp_path, rows)
    out = {r.digit: r.n for r in ts.benford(spark, d).collect()}
    want = {}
    for dg in expected:
        want[dg] = want.get(dg, 0) + 1
    assert {dg: n for dg, n in out.items() if n} == want

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["event_type"] = "x"
    pdf["props"] = ""
    con = duckdb.connect()
    con.register("events_df", pdf)
    con.sql("CREATE VIEW events AS SELECT * FROM events_df")
    duck = {r[0]: r[1] for r in con.sql(ts.BENFORD_SQL).fetchall()}
    assert duck == out

    # ADVICE r8 residual-band probes: a double 1 ulp BELOW a negative power
    # of ten. Spark converts via shortest-repr BigDecimal + HALF_UP
    # setScale(18) while DuckDB multiplies by 10^18 in double precision and
    # rounds, so a value in this band could in principle round across the
    # boundary in one engine only, flipping the bin 9↔1. No hand expectation
    # here — the contract under test is ENGINE AGREEMENT bin-for-bin (plus
    # the k=9 probe landing below the abs>1e-9 guard on both engines).
    probes = [math.nextafter(10.0**-k, 0.0) for k in range(2, 10)]
    rows2 = [
        (k + 1, datetime(2024, 1, 1) + pd.Timedelta(minutes=k), 1, v)
        for k, v in enumerate(probes)
    ]
    d2 = _write_events(tmp_path / "ulp_band", rows2)
    out2 = {r.digit: r.n for r in ts.benford(spark, d2).collect()}
    assert sum(out2.values()) == len(probes) - 1  # k=9 probe < 1e-9: dropped
    pdf2 = pd.DataFrame(rows2, columns=["event_id", "ts", "user_id", "value"])
    pdf2["event_type"] = "x"
    pdf2["props"] = ""
    con2 = duckdb.connect()
    con2.register("events_df", pdf2)
    con2.sql("CREATE VIEW events AS SELECT * FROM events_df")
    duck2 = {r[0]: r[1] for r in con2.sql(ts.BENFORD_SQL).fetchall()}
    assert duck2 == out2
