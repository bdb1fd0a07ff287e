"""Unit tests for timedb_spark.operators.forecasting + attribution on tiny
frames with hand-computed expectations (vintage cutoffs, lag-frame
semantics on sparse grids, planted mean shifts, attribution windows).
"""

from datetime import datetime, timedelta

import pandas as pd

from timedb_spark.operators import asof
from timedb_spark.operators import forecasting as fc


def _events_dir(tmp_path, rows):
    import os

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    return d


def test_forecast_vintage_cutoffs_hand_computed(spark, tmp_path):
    # One (series 1, hour 10:00) point with three knowledge vintages:
    # event_id % 4 is the knowledge lag in hours (see io.tables).
    t = lambda m: datetime(2024, 1, 1, 10, m)
    d = _events_dir(
        tmp_path,
        [
            (100, t(30), 1, "x", 1.0),  # kt = 10:30 (lag 0)  → final
            (101, t(20), 1, "x", 2.0),  # kt = 09:20 (lag 1)  → latest ≤ vt
            (103, t(10), 1, "x", 3.0),  # kt = 07:10 (lag 3)  → only ≤ vt-1h
        ],
    )
    [r] = fc.forecast_vintage(spark, d).collect()
    assert r.series_id == 1 and r.valid_time == datetime(2024, 1, 1, 10)
    assert r.n_vintages == 3
    assert r.v_final == 1.0
    assert r.v_h0 == 2.0  # as known at 10:00
    assert r.v_h1 == 3.0  # as known at 09:00
    assert r.v_h2 == 3.0  # as known at 08:00


def test_restatements_counts(spark, tmp_path):
    t = lambda h, m: datetime(2024, 1, 1, h, m)
    d = _events_dir(
        tmp_path,
        [
            (100, t(10, 30), 1, "x", 1.0),  # kt 10:30
            (101, t(10, 20), 1, "x", 2.0),  # kt 09:20 → 2nd vintage, same point
            (200, t(12, 0), 1, "x", 5.0),  # unrevised point
            (300, t(9, 0), 2, "x", 7.0),  # other series
        ],
    )
    out = {r.series_id: r for r in fc.restatements(spark, d).collect()}
    s1 = out[1]
    assert (s1.n_points, s1.n_obs, s1.n_revised_points, s1.max_vintages) == (2, 3, 1, 2)
    # series 2: single obs, kt == ts == vt ⇒ lead 0; event 300 has lag 300%4=0
    assert out[2].avg_first_lead_h == 0.0


def test_calendar_features_sparse_lags(spark, tmp_path):
    # Hours 0 and 1 observed, hour 2 dropped by the %3 filter, hours 3,4
    # observed: lag_1h at hour 4 sees hour 3; at hour 3 sees NOTHING (hour 2
    # missing) — a ROWS-offset lag would wrongly return hour 1.
    t = lambda h: datetime(2024, 1, 1, h)
    d = _events_dir(tmp_path, [(i, t(h), 1, "x", float(10 * h)) for i, h in enumerate([0, 1, 3, 4])])
    out = {r.valid_time.hour: r for r in fc.calendar_features(spark, d).collect()}
    assert set(out) == {0, 1, 3, 4}
    assert out[1].lag_1h == 0.0
    assert out[3].lag_1h is None  # hour 2 missing → exact RANGE lag is null
    assert out[4].lag_1h == 30.0
    # 2024-01-01 is a Monday; 0=Sunday convention ⇒ day_of_week == 1
    assert out[0].day_of_week == 1 and out[0].is_weekend is False
    assert out[4].hour_of_day == 4


def test_changepoint_planted_shift(spark, tmp_path):
    # Values 10.0 then 50.0; observations only at hour-of-day % 3 < 2 (the
    # hourly-series filter). Windows are observation-indexed, so the planted
    # shift must flag with mean_shift near +40 at the boundary.
    base = datetime(2024, 1, 1)
    rows = []
    i = 0
    for h in range(120):
        ts = base + timedelta(hours=h)
        if ts.hour % 3 < 2:
            rows.append((i * 4, ts, 1, "x", 10.0 if i < 40 else 50.0))  # id*4 → lag 0
            i += 1
    d = _events_dir(tmp_path, rows)
    out = fc.changepoint(spark, d).collect()
    assert out, "planted shift not detected"
    best = max(out, key=lambda r: abs(r.mean_shift))
    assert best.mean_shift == 40.0 and best.pre_mean == 10.0 and best.post_mean == 50.0
    # the exact boundary observation (index 40) is the argmax
    assert sum(1 for r in out if abs(r.mean_shift) == 40.0) == 1


def test_holt_hand_computed(spark, tmp_path):
    from timedb_spark.operators import timeseries as ts

    t = lambda h: datetime(2024, 1, 1, h)
    d = _events_dir(tmp_path, [(1, t(0), 1, "x", 10.0), (2, t(1), 1, "x", 20.0), (3, t(2), 1, "x", 40.0)])
    got = {r.event_id: (r.holt_level, r.holt_forecast) for r in ts.holt(spark, d).collect()}
    # α=β=0.5, seed (l=10, b=0):
    # x=20: l=.5·20+.5·10=15, b=.5·5=2.5 → forecast 17.5
    # x=40: l=.5·40+.5·17.5=28.75, b=.5·13.75+.5·2.5=8.125 → forecast 36.875
    assert got == {1: (10.0, 10.0), 2: (15.0, 17.5), 3: (28.75, 36.875)}


def test_interval_at_overlap_arbitration(spark, tmp_path):
    from timedb_spark.io.tables import interval_frame
    from timedb_spark.operators import bitemporal as bt

    # id%3 sets interval hours (1+), id%4 the knowledge lag (io.tables).
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)
    d = _events_dir(
        tmp_path,
        [
            (1, t(10), 1, "x", 2.0),  # [10,12) covers 11:30, kt 09:00
            (3, t(11), 1, "x", 3.0),  # [11,12) covers, kt 08:00 — newer vt wins
            (7, t(11, 40), 1, "x", 4.0),  # [11,13) covers, same vt, kt 08:40 — newest revision wins
            (6, t(9), 2, "x", 9.0),  # [09,10) does NOT cover → series 2 absent
        ],
    )
    out = bt.interval_at(interval_frame(spark, d), t(11, 30)).collect()
    assert len(out) == 1
    [r] = out
    assert (r.series_id, r.valid_time, r.valid_time_end, r.value) == (1, t(11), t(13), 4.0)


def test_attribution_last_touch_window(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    d = _events_dir(
        tmp_path,
        [
            (1, t0, 1, "click", 0.0),
            (2, t0 + timedelta(hours=1), 1, "purchase", 100.0),  # attributed
            (3, t0 + timedelta(days=10), 1, "purchase", 50.0),  # click too old
            (4, t0, 2, "purchase", 30.0),  # no click at all
        ],
    )
    out = {r.user_id: r for r in asof.attribution_last_touch(spark, d).collect()}
    u1, u2 = out[1], out[2]
    assert (u1.n_purchases, u1.n_attributed) == (2, 1)
    assert (u1.attributed_revenue, u1.organic_revenue) == (100.0, 50.0)
    assert (u2.n_purchases, u2.n_attributed, u2.attributed_revenue, u2.organic_revenue) == (1, 0, 0.0, 30.0)


def test_events_markov_hand_computed(spark, tmp_path):
    from timedb_spark.operators import analytics

    t0 = datetime(2024, 1, 1)
    d = _events_dir(
        tmp_path,
        [
            (1, t0, 1, "click", 0.0),
            (2, t0 + timedelta(minutes=1), 1, "view", 0.0),
            (3, t0 + timedelta(minutes=2), 1, "view", 0.0),
            (4, t0 + timedelta(minutes=3), 1, "purchase", 0.0),
            (5, t0, 2, "click", 0.0),  # single event → no transition
        ],
    )
    out = {(r.prev_type, r.next_type): (r.n, r.p_transition) for r in analytics.events_markov(spark, d).collect()}
    assert out == {
        ("click", "view"): (1, 1.0),
        ("view", "view"): (1, 0.5),
        ("view", "purchase"): (1, 0.5),
    }


def test_mad_anomaly_planted_outlier(spark, tmp_path):
    from timedb_spark.operators import timeseries as ts

    t0 = datetime(2024, 1, 1)
    rows = [(i, t0 + timedelta(minutes=i), 1, "click", 10.0 + (i % 3) - 1) for i in range(30)]
    rows.append((99, t0 + timedelta(hours=2), 1, "click", 1000.0))  # the outlier
    d = _events_dir(tmp_path, rows)
    out = ts.mad_anomaly(spark, d).collect()
    assert [r.event_id for r in out] == [99]
    [r] = out
    assert r.value == 1000.0 and r.mad <= 1.0 and r.dev > 900


def test_interval_merge_islands(spark, tmp_path):
    from timedb_spark.io.tables import interval_frame
    from timedb_spark.operators import bitemporal as bt

    # id%3 → duration 1+id%3 hours (io.tables): build [10,12) [11,12) (overlap),
    # [12,13) (adjacent → merges), [20,21) (separate island)
    t = lambda h: datetime(2024, 1, 1, h)
    d = _events_dir(
        tmp_path,
        [
            (1, t(10), 1, "x", 1.0),  # [10,12)
            (3, t(11), 1, "x", 1.0),  # [11,12) overlaps
            (6, t(12), 1, "x", 1.0),  # [12,13) adjacent — merges
            (9, t(20), 1, "x", 1.0),  # [20,21) separate
        ],
    )
    out = sorted(
        ((r.span_start, r.span_end, r.n_intervals) for r in bt.interval_merge(interval_frame(spark, d)).collect())
    )
    assert out == [(t(10), t(13), 3), (t(20), t(21), 1)]


def test_coverage_hand_spans(spark, tmp_path):
    """Same planted intervals as the merge test: [10,13) + [20,21) covered
    of the [10,21) extent → ratio 4/11, one 7-hour gap."""
    import math

    from timedb_spark.io.tables import interval_frame
    from timedb_spark.operators import bitemporal as bt

    t = lambda h: datetime(2024, 1, 1, h)
    d = _events_dir(
        tmp_path,
        [
            (1, t(10), 1, "x", 1.0),  # [10,12)
            (3, t(11), 1, "x", 1.0),  # [11,12)
            (6, t(12), 1, "x", 1.0),  # [12,13) adjacent — merges
            (9, t(20), 1, "x", 1.0),  # [20,21) island
        ],
    )
    r = bt.coverage(interval_frame(spark, d)).collect()[0]
    assert r.n_spans == 2 and r.n_intervals == 4
    hour = 3600 * 1_000_000
    assert r.covered_us == 4 * hour
    assert r.largest_gap_us == 7 * hour
    assert r.coverage_ratio == math.floor(4.0 / 11.0 * 1e6) / 1e6


def test_pit_features_cutoff_correctness(spark, tmp_path):
    # Revisions of (sid 1, Jan1 14:00): kt 14:00 (v=10, the final winner),
    # kt 12:45 (v=20), kt 11:30 (v=30 — the only revision known by the
    # day-ahead cutoff, Jan1 12:00). The Jan2 14:00 target's lag_24h_pit
    # must be 30, NOT the final 10 — a join onto the latest state (the
    # feature-leakage bug) would return 10. kt offsets come from
    # bitemporal_frame's event_id % 4 derivation.
    d = _events_dir(tmp_path, [
        (4, datetime(2024, 1, 1, 14, 0), 1, "x", 10.0),    # kt 14:00
        (2, datetime(2024, 1, 1, 14, 45), 1, "x", 20.0),   # kt 12:45
        (3, datetime(2024, 1, 1, 14, 30), 1, "x", 30.0),   # kt 11:30
        (8, datetime(2024, 1, 2, 14, 0), 1, "x", 99.0),    # target row
    ])
    out = {r.valid_time: r for r in fc.pit_features(spark, d).collect()}
    assert set(out) == {datetime(2024, 1, 1, 14), datetime(2024, 1, 2, 14)}
    tgt = out[datetime(2024, 1, 2, 14)]
    assert tgt.y == 99.0
    assert tgt.lag_24h_pit == 30.0       # as-of the TARGET's cutoff
    assert tgt.lag_168h_pit is None      # no data a week back
    src = out[datetime(2024, 1, 1, 14)]
    assert src.y == 10.0                 # label is the realized latest
    assert src.lag_24h_pit is None       # no data a day back


def test_pit_features_random_histories_match_python_replay(spark, tmp_path):
    """Property (seeded): on random revision histories, every pit_features
    cell must equal a direct Python recompute of the PIT semantics —
    per-target cutoff = trunc_day(vt) - 12h, lag winner = max-(kt, ct)
    revision of the lagged hour with kt ≤ the TARGET's cutoff, label =
    unconditional max-(kt, ct). Timestamps are generated collision-free
    per (user, ts) so (kt, ct) ties cannot make winners order-dependent."""
    import random

    rng = random.Random(42)
    rows = []
    used = set()
    for i in range(120):
        day = rng.randint(1, 9)
        hour = rng.randint(0, 23)
        minute = rng.randint(0, 59)
        user = rng.randint(1, 4)
        key = (user, day, hour, minute)
        if key in used:
            continue
        used.add(key)
        rows.append((i * 7 + rng.randint(0, 6), datetime(2024, 1, day, hour, minute),
                     user, "x", float(rng.randint(-99, 99))))
    d = _events_dir(tmp_path, rows)

    # python replay of the bitemporal_frame derivation + PIT semantics
    revs = {}
    for event_id, ts, user, _et, value in rows:
        vt = ts.replace(minute=0, second=0)
        kt = ts - timedelta(hours=event_id % 4)
        revs.setdefault((user, vt), []).append((kt, ts, value))

    def winner(sid, vt, cutoff=None):
        cands = [(kt, ct, v) for kt, ct, v in revs.get((sid, vt), [])
                 if cutoff is None or kt <= cutoff]
        return max(cands)[2] if cands else None

    out = fc.pit_features(spark, d).collect()
    assert len(out) == len(revs)
    for r in out:
        cutoff = r.valid_time.replace(hour=0) - timedelta(hours=12)
        assert r.y == winner(r.series_id, r.valid_time), (r, "y")
        for lag in (24, 168):
            want = winner(r.series_id, r.valid_time - timedelta(hours=lag), cutoff)
            got = getattr(r, f"lag_{lag}h_pit")
            assert got == want, (r, lag, want)


def test_rollup_pit_backtest_hand_computed(spark, tmp_path):
    """r11 composition pin: the day-ahead forecast for a bucket must be
    the 24 h-lagged bucket's winner AS KNOWN AT THE TARGET'S CUTOFF (noon
    prev day) — never the lagged bucket's final winner (the leakage bug) —
    scored in exact cents against the materialized latest-collapse state.

    Source hour Jan1 14:00 has kt 11:30 (v=30, the only revision known by
    the Jan2 cutoff = Jan1 12:00), kt 12:45 (v=20) and kt 14:00 (v=10, the
    FINAL winner). The Jan2 14:00 target (actual 99.0) must be forecast as
    30.0 → err 6900 cents; a leaky join onto the final state would score
    |1000-9900| = 8900. Jan2 20:00 has no lag-source data → unscored;
    Jan1's own bucket has no day-0 source → day 1 coalesces to 0/0."""
    from timedb_spark.io.tables import bitemporal_frame
    from timedb_spark.rollup import _latest_hourly

    d = _events_dir(tmp_path, [
        (4, datetime(2024, 1, 1, 14, 0), 1, "x", 10.0),    # kt 14:00 (final)
        (2, datetime(2024, 1, 1, 14, 45), 1, "x", 20.0),   # kt 12:45
        (3, datetime(2024, 1, 1, 14, 30), 1, "x", 30.0),   # kt 11:30 (PIT)
        (8, datetime(2024, 1, 2, 14, 0), 1, "x", 99.0),    # target, actual
        (5, datetime(2024, 1, 2, 20, 0), 1, "x", 7.0),     # unscored target
    ])
    sv = bitemporal_frame(spark, d)
    out = {
        (r.series_id, r.day): r
        for r in fc.rollup_pit_backtest(_latest_hourly(sv), sv).collect()
    }
    assert set(out) == {(1, "2024-01-01"), (1, "2024-01-02")}
    d1 = out[(1, "2024-01-01")]
    assert (d1.n_buckets, d1.n_scored, d1.err_cents, d1.bias_cents) == (1, 0, 0, 0)
    d2 = out[(1, "2024-01-02")]
    assert (d2.n_buckets, d2.n_scored, d2.err_cents, d2.bias_cents) == (2, 1, 6900, -6900)


def test_calendar_and_pit_floor_semantics_pre_epoch_cross_engine(spark, tmp_path):
    """ADVICE r10 closure, reviewer-hardened: for PRE-EPOCH valid times the
    calendar ints must agree between engines. Both engines' native integer
    ops truncate toward zero (Spark `div`/`%`; DuckDB 1.0.0 `//`/`%` —
    `-91 // 24 = -3`, NOT floor), so each side applies its own
    exact-multiple floor construction (_floor_hours/_DOW_H vs
    _floor_div_sql/_DOW_H_SQL); this test runs BOTH engines on a pre-epoch
    frame and compares cell-for-cell — it reds if either side regresses to
    native truncation. 1969-12-28 is a Sunday (dow 0, weekend);
    1969-12-31 is a Wednesday (dow 3)."""
    import duckdb

    # hours chosen ≡ 0/1 (mod 3) so _hourly_series keeps them
    rows = [
        (0, datetime(1969, 12, 28, 4, 0), 1, "x", 1.0),    # Sunday pre-epoch
        (4, datetime(1969, 12, 31, 22, 0), 1, "x", 2.0),   # Wednesday, h=-2
        (8, datetime(1970, 1, 1, 0, 0), 1, "x", 3.0),      # epoch itself
        (3, datetime(1970, 1, 4, 13, 0), 1, "x", 4.0),     # Sunday post-epoch
    ]
    d = _events_dir(tmp_path, rows)

    def norm(recs):
        # FULL-row comparison: every column, not just the calendar ints —
        # floats/None stringified stably so a lag/label regression on
        # either side also reds this test
        return sorted(
            tuple(sorted((k, str(v)) for k, v in r.items())) for r in recs
        )

    def duck_rows(con, sql):
        rows = con.execute(sql).fetchall()
        cols = [c[0] for c in con.description]
        return [dict(zip(cols, row)) for row in rows]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")

    cal_spark_rows = [r.asDict() for r in fc.calendar_features(spark, d).collect()]
    assert norm(cal_spark_rows) == norm(duck_rows(con, fc.CALENDAR_FEATURES_SQL))
    by_vt = {
        str(r["valid_time"]): (r["hour_of_day"], r["day_of_week"], r["is_weekend"])
        for r in cal_spark_rows
    }
    assert by_vt["1969-12-28 04:00:00"] == (4, 0, True)   # floor, not trunc
    assert by_vt["1969-12-31 22:00:00"] == (22, 3, False)  # h=-2 → hod 22
    assert by_vt["1970-01-01 00:00:00"] == (0, 4, False)
    assert by_vt["1970-01-04 13:00:00"] == (13, 0, True)

    from timedb_spark.io.tables import BITEMPORAL_ORACLE_SQL

    pit_spark = norm(r.asDict() for r in fc.pit_features(spark, d).collect())
    pit_duck = norm(duck_rows(con, fc.pit_features_sql(BITEMPORAL_ORACLE_SQL)))
    assert pit_spark == pit_duck


def test_rollup_pit_backtest_random_histories_match_python_replay(spark, tmp_path):
    """Property (seeded): on random revision histories, every per-(series,
    day) backtest cell must equal a direct Python recompute — actual = the
    bucket's unconditional max-(kt, ct) winner, forecast = the 24 h-lagged
    bucket's winner restricted to kt ≤ the TARGET's noon-prev-day cutoff,
    err/bias as exact cent integers, unscored days 0/0. Same collision-free
    generation discipline as the pit_features replay."""
    import random

    from timedb_spark.io.tables import bitemporal_frame
    from timedb_spark.rollup import _latest_hourly

    rng = random.Random(1117)
    rows = []
    used = set()
    for i in range(140):
        day = rng.randint(1, 9)
        hour = rng.randint(0, 23)
        minute = rng.randint(0, 59)
        user = rng.randint(1, 3)
        key = (user, day, hour, minute)
        if key in used:
            continue
        used.add(key)
        rows.append((i * 7 + rng.randint(0, 6), datetime(2024, 1, day, hour, minute),
                     user, "x", float(rng.randint(-99, 99))))
    d = _events_dir(tmp_path, rows)

    revs = {}
    for event_id, ts, user, _et, value in rows:
        vt = ts.replace(minute=0, second=0)
        kt = ts - timedelta(hours=event_id % 4)
        revs.setdefault((user, vt), []).append((kt, ts, value))

    def winner(sid, vt, cutoff=None):
        cands = [(kt, ct, v) for kt, ct, v in revs.get((sid, vt), [])
                 if cutoff is None or kt <= cutoff]
        return max(cands)[2] if cands else None

    expect = {}
    for (sid, vt) in revs:
        day = vt.strftime("%Y-%m-%d")
        actual = round(winner(sid, vt) * 100)
        cutoff = vt.replace(hour=0) - timedelta(hours=12)
        fc_v = winner(sid, vt - timedelta(hours=24), cutoff)
        e = expect.setdefault((sid, day), [0, 0, 0, 0])  # n_buckets, n_scored, err, bias
        e[0] += 1
        if fc_v is not None:
            fc_c = round(fc_v * 100)
            e[1] += 1
            e[2] += abs(fc_c - actual)
            e[3] += fc_c - actual

    sv = bitemporal_frame(spark, d)
    got = {
        (r.series_id, r.day): [r.n_buckets, r.n_scored, r.err_cents, r.bias_cents]
        for r in fc.rollup_pit_backtest(_latest_hourly(sv), sv).collect()
    }
    assert got == expect
    assert sum(v[1] for v in expect.values()) > 0, "no scored buckets — fixture degenerate"


def test_floor_division_twins_exhaustive_signed_range(spark):
    """Both engines' floor constructions equal Python's floor semantics
    (`//`/`%` ARE floor in Python) over every hour index in [-1000, 1000)
    — stronger than the 4-point pre-epoch pin: any trunc-vs-floor or
    double-mod slip on either side reds within the range."""
    import duckdb

    from pyspark.sql import functions as F

    from timedb_spark.operators.forecasting import _DOW_H, _DOW_H_SQL, _HOD_H_SQL, _floor_div_sql

    rows = duckdb.connect().execute(f"""
        WITH t AS (SELECT unnest(range(-1000, 1000)) AS h)
        SELECT h, {_floor_div_sql('h', 24)}, {_HOD_H_SQL}, {_DOW_H_SQL} FROM t
    """).fetchall()
    assert all(
        fd == h // 24 and hod == h % 24 and dow == (h // 24 + 4) % 7
        for h, fd, hod, dow in rows
    )

    out = spark.range(-1000, 1000).select(F.col("id").alias("h")).select(
        "h",
        F.expr("(h - pmod(h, 24)) div 24").alias("fd"),
        F.expr("pmod(h, 24)").alias("hod"),
        F.expr(_DOW_H).alias("dow"),
    ).collect()
    assert all(
        r.fd == r.h // 24 and r.hod == r.h % 24 and r.dow == (r.h // 24 + 4) % 7
        for r in out
    )


def test_rollup_pit_backtest_half_cent_ties_cross_engine(spark, tmp_path):
    """ADVICE r11 closure, premise checked like the r11 floor advice: the
    claim was that Spark F.round (HALF_UP) and the oracle's decimal→BIGINT
    cast diverge on exact half-cent sums — empirically DuckDB 1.0.0's cast
    AND round() both round ties AWAY FROM ZERO (2.5→3, -2.5→-3), i.e. the
    engines already agreed; the oracle now spells round(x, 0) explicitly
    and this test pins the tie cells by LITERAL value on both engines, so
    either engine changing its tie rule (even both together) reds."""
    import duckdb

    import __spark_entry__ as entrymod
    from timedb_spark.io.tables import bitemporal_frame
    from timedb_spark.rollup import _latest_hourly

    # event_id % 4 == 0 → knowledge_time = ts (always ≤ the noon-prev-day
    # cutoff for a next-day 10:00 target). Values are exact half-cents
    # after the DECIMAL(38,6) cast: ±0.005 → ±0.5 cents, -0.015 → -1.5.
    t = lambda day, h: datetime(2024, 1, day, h, 0)
    d = _events_dir(
        tmp_path,
        [
            (100, t(4, 10), 1, "x", -0.005),  # lag source: fc tie -0.5 → -1
            (104, t(5, 10), 1, "x", 0.005),   # actual tie 0.5 → 1
            (108, t(4, 10), 2, "x", 0.015),   # fc 1.5 → 2
            (112, t(5, 10), 2, "x", -0.015),  # actual -1.5 → -2
        ],
    )

    sv = bitemporal_frame(spark, d)
    got = {
        (r.series_id, r.day): (r.n_buckets, r.n_scored, r.err_cents, r.bias_cents)
        for r in fc.rollup_pit_backtest(_latest_hourly(sv), sv).collect()
    }
    # literal pins: away-from-zero on both signs
    assert got[(1, "2024-01-05")] == (1, 1, 2, -2)    # fc -1 vs actual 1
    assert got[(2, "2024-01-05")] == (1, 1, 4, 4)     # fc 2 vs actual -2

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    sql = entrymod.oracle_sql()["rollup_pit_backtest"]
    cols = [c[0] for c in con.execute(sql).description]
    duck = {
        (r["series_id"], r["day"]): (r["n_buckets"], r["n_scored"], r["err_cents"], r["bias_cents"])
        for r in (dict(zip(cols, row)) for row in con.execute(sql).fetchall())
    }
    assert duck == got


def test_pit_train_split_boundary_and_min_obs_cross_engine(spark, tmp_path):
    """Hand-pinned split boundary + the min-obs exclusion (NOT exercised by
    the gate data at sf0.01, where every series clears the floor — this
    test is the coverage): series 1 has 12 PIT rows → n_test = ceil(12/5) =
    3, so exactly its last three hours are 'test'; series 2 has 9 rows
    (< _TSPLIT_MIN_OBS = 10) and must be EXCLUDED, not defaulted to train.
    The same frame then runs through the DuckDB twin and must match
    cell-for-cell."""
    import duckdb

    from timedb_spark.io.tables import BITEMPORAL_ORACLE_SQL

    rows = []
    for h in range(12):  # series 1: 12 hourly points
        rows.append((h * 4, datetime(2024, 1, 10, h, 0), 1, "x", float(h)))
    for h in range(9):   # series 2: 9 points -> below the floor
        rows.append((100 + h * 4, datetime(2024, 1, 10, h, 0), 2, "x", float(h)))
    d = _events_dir(tmp_path, rows)

    out = fc.pit_train_split(spark, d).collect()
    assert {r.series_id for r in out} == {1}
    by_hour = {r.valid_time.hour: r.split for r in out}
    assert len(by_hour) == 12
    assert [by_hour[h] for h in range(12)] == ["train"] * 9 + ["test"] * 3

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    sql = fc.pit_train_split_sql(BITEMPORAL_ORACLE_SQL)
    cols = [c[0] for c in con.execute(sql).description]
    duck = sorted(
        tuple(sorted((k, str(v)) for k, v in dict(zip(cols, row)).items()))
        for row in con.execute(sql).fetchall()
    )
    got = sorted(tuple(sorted((k, str(v)) for k, v in r.asDict().items())) for r in out)
    assert got == duck


def test_pit_train_split_random_histories_match_python_replay(spark, tmp_path):
    """Property (seeded): on random event histories the full row-level
    split assignment must equal a pure-Python recompute — grid = distinct
    (series, hour), per-series rows ordered by valid_time, last ⌈n/5⌉
    are 'test', series with n < 10 excluded entirely. Catches an
    off-by-one in the tail cut, a wrong ordering column, or the exclusion
    silently defaulting to 'train'."""
    import math
    import random

    rng = random.Random(1217)
    rows = []
    used = set()
    for i in range(220):
        user = rng.randint(1, 6)      # mixed sizes: some series < 10 hours
        day = rng.randint(1, 5)
        hour = rng.randint(0, 23)
        key = (user, day, hour)
        if key in used:
            continue
        used.add(key)
        rows.append((i * 4, datetime(2024, 1, day, hour, rng.randint(0, 59)),
                     user, "x", float(rng.randint(-50, 50))))
    for h in range(4):  # series 99: below the min-obs floor by construction
        rows.append((1000 + h * 4, datetime(2024, 1, 2, h, 30), 99, "x", 1.0))
    d = _events_dir(tmp_path, rows)

    hours = {}
    for _eid, ts, user, _et, _v in rows:
        hours.setdefault(user, set()).add(ts.replace(minute=0, second=0))
    expect = {}
    for user, hs in hours.items():
        ordered = sorted(hs)
        n = len(ordered)
        if n < 10:
            continue  # excluded, never 'train'
        n_test = math.ceil(n / 5)
        for i, vt in enumerate(ordered):
            expect[(user, vt)] = "test" if i >= n - n_test else "train"

    got = {
        (r.series_id, r.valid_time): r.split
        for r in fc.pit_train_split(spark, d).collect()
    }
    assert got == expect
    assert any(v == "test" for v in expect.values())
    assert len(hours) > len({u for u, _ in expect}), "no series excluded — fixture degenerate"
