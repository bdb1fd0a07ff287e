"""Unit tests for the bitemporal operators on hand-built frames.

Mirrors the reference's integration assertions (tests/test_integration.py):
latest-kt-wins, history-returns-all-kts, correction-chain-with-change_time,
retention pruning, relative cutoffs, null sentinel roundtrip — but as pure
DataFrame-transform tests with exact expecteds.
"""

from __future__ import annotations

from datetime import datetime, time as dt_time, timedelta

import pytest

from timedb_spark.operators import bitemporal as bt

BASE = datetime(2025, 1, 1, 0, 0, 0)
KT1 = BASE + timedelta(hours=6)
KT2 = BASE + timedelta(hours=7)
CT1 = BASE + timedelta(days=1)
CT2 = BASE + timedelta(days=1, hours=1)

COLS = ["series_id", "valid_time", "knowledge_time", "change_time", "value", "changed_by", "annotation", "retention"]


def _frame(spark, rows):
    return spark.createDataFrame([tuple(r) for r in rows], COLS)


def _rows(sid, n, kt, *, mult=1.0, ct=CT1, retention="medium", changed_by="", annotation=""):
    return [
        [sid, BASE + timedelta(hours=i), kt, ct, float(i) * mult, changed_by, annotation, retention]
        for i in range(n)
    ]


def test_latest_flat(spark):
    df = _frame(spark, _rows(1, 3, KT1))
    out = bt.latest(df).orderBy("valid_time").collect()
    assert [r.value for r in out] == [0.0, 1.0, 2.0]
    assert set(bt.latest(df).columns) == {"series_id", "valid_time", "value"}


def test_latest_picks_highest_kt(spark):
    df = _frame(spark, _rows(1, 2, KT1, mult=10) + _rows(1, 2, KT2, mult=100))
    out = bt.latest(df).orderBy("valid_time").collect()
    assert [r.value for r in out] == [0.0, 100.0]


def test_latest_tiebreaks_on_change_time(spark):
    # Same kt, later change_time (a correction) wins.
    df = _frame(spark, _rows(1, 2, KT1, mult=10, ct=CT1) + _rows(1, 2, KT1, mult=100, ct=CT2))
    out = bt.latest(df).orderBy("valid_time").collect()
    assert [r.value for r in out] == [0.0, 100.0]


def test_overlapping_returns_all_kts(spark):
    df = _frame(spark, _rows(1, 2, KT1, mult=10) + _rows(1, 2, KT2, mult=100))
    out = bt.overlapping(df)
    assert out.count() == 4
    assert set(out.columns) == {"series_id", "knowledge_time", "valid_time", "value"}


def test_overlapping_collapses_corrections(spark):
    df = _frame(spark, _rows(1, 2, KT1, mult=10, ct=CT1) + _rows(1, 2, KT1, mult=100, ct=CT2))
    out = bt.overlapping(df).orderBy("valid_time").collect()
    assert [r.value for r in out] == [0.0, 100.0]


def test_latest_changes_chain(spark):
    # Two valid_times, initial write + correction under same kt.
    df = _frame(spark, _rows(1, 2, KT1, mult=1, ct=CT1) + _rows(1, 2, KT1, mult=1, ct=CT2))
    # second batch has SAME values → duplicate states collapse; expect 2 rows.
    out = bt.latest_changes(df)
    assert out.count() == 2

    df2 = _frame(
        spark,
        _rows(1, 2, KT1, mult=1, ct=CT1) + [[1, BASE + timedelta(hours=i), KT1, CT2, float(i) + 100, "", "", "medium"] for i in range(2)],
    )
    out2 = bt.latest_changes(df2).orderBy("valid_time", "change_time").collect()
    assert [r.value for r in out2] == [0.0, 100.0, 1.0, 101.0]
    assert "change_time" in bt.latest_changes(df2).columns


def test_latest_changes_only_winning_kt(spark):
    # Corrections of an OLD kt never surface in the latest chain.
    df = _frame(spark, _rows(1, 1, KT1, mult=1, ct=CT1) + _rows(1, 1, KT2, mult=7, ct=CT1))
    out = bt.latest_changes(df).collect()
    assert len(out) == 1 and out[0].value == 0.0


def test_overlapping_changes_full_audit(spark):
    df = _frame(
        spark,
        [
            [1, BASE, KT1, CT1, 1.0, "", "", "medium"],
            [1, BASE, KT1, CT2, 5.0, "", "", "medium"],  # correction of kt1
            [1, BASE, KT2, CT2, 9.0, "", "", "medium"],  # separate vintage
        ],
    )
    out = bt.overlapping_changes(df)
    assert out.count() == 3


def test_filters_half_open_ranges(spark):
    df = _frame(spark, _rows(1, 4, KT1))
    out = bt.apply_filters(df, start_valid=BASE + timedelta(hours=1), end_valid=BASE + timedelta(hours=3))
    assert out.count() == 2
    out2 = bt.apply_filters(df, series_ids=[2])
    assert out2.count() == 0
    out3 = bt.apply_filters(df, retention=["medium", "short"])
    assert out3.count() == 4
    out4 = bt.apply_filters(df, start_known=KT1 + timedelta(seconds=1))
    assert out4.count() == 0


def test_retention_prune(spark):
    df = _frame(spark, _rows(1, 3, KT1, retention="short") + _rows(1, 3, KT1, mult=100, retention="medium", ct=CT2))
    short = bt.latest(bt.apply_filters(df, retention="short")).orderBy("valid_time").collect()
    med = bt.latest(bt.apply_filters(df, retention="medium")).orderBy("valid_time").collect()
    assert [r.value for r in short] == [0.0, 1.0, 2.0]
    assert [r.value for r in med] == [0.0, 100.0, 200.0]


def test_relative_cutoff_day_ahead(spark):
    # Day-ahead market style: forecasts for day D must be issued by D-1 12:00.
    vt = datetime(2025, 1, 2, 10)
    early_kt = datetime(2025, 1, 1, 11)  # before cutoff (Jan 1 12:00)
    late_kt = datetime(2025, 1, 1, 13)  # after cutoff
    df = _frame(
        spark,
        [
            [1, vt, early_kt, CT1, 1.0, "", "", "medium"],
            [1, vt, late_kt, CT1, 2.0, "", "", "medium"],
        ],
    )
    wl, off, sw = bt.resolve_relative_params(days_ahead=1, time_of_day=dt_time(12), start_valid=datetime(2025, 1, 2))
    out = bt.relative_cutoff(df, window_length=wl, issue_offset=off, start_window=sw).collect()
    assert len(out) == 1 and out[0].value == 1.0


def test_relative_param_validation():
    with pytest.raises(ValueError, match="Cannot mix"):
        bt.resolve_relative_params(days_ahead=1, time_of_day=dt_time(12), window_length=timedelta(days=1))
    with pytest.raises(ValueError, match="together"):
        bt.resolve_relative_params(days_ahead=1)
    with pytest.raises(ValueError, match="start_window"):
        bt.resolve_relative_params(window_length=timedelta(days=1), issue_offset=timedelta(0))


def test_nan_null_roundtrip(spark):
    import pyspark.sql.functions as F

    df = _frame(spark, _rows(1, 3, KT1))
    df = df.withColumn("value", F.when(F.col("valid_time") == BASE, float("nan")).otherwise(F.col("value")))
    out = bt.nan_to_null(bt.latest(df)).orderBy("valid_time").collect()
    assert out[0].value is None
    assert [r.value for r in out[1:]] == [1.0, 2.0]


def test_meta_semi_join(spark):
    df = _frame(spark, _rows(1, 2, KT1) + _rows(2, 2, KT1, mult=5) + _rows(3, 2, KT1, mult=7))
    meta = spark.createDataFrame(
        [
            (1, "Grid/A/T01", "power", "actual", "medium"),
            (2, "Grid/A/T02", "power", "forecast", "medium"),
            (3, "Grid/B/T01", "power", "actual", "medium"),
        ],
        ["series_id", "path", "name", "data_type", "retention"],
    )
    spec = bt.SeriesMeta(root_path="Grid/A")
    out = bt.filter_by_meta(df, meta, spec)
    assert sorted({r.series_id for r in out.collect()}) == [1, 2]

    spec2 = bt.SeriesMeta(root_path="Grid/A", data_type="actual")
    out2 = bt.filter_by_meta(df, meta, spec2)
    assert sorted({r.series_id for r in out2.collect()}) == [1]

    with pytest.raises(ValueError, match="needs one of"):
        bt.resolve_meta(meta, bt.SeriesMeta())


def test_backtest_error_hand_computed(spark):
    # Series 1, one daily window starting BASE, cutoff at BASE+2h.
    # vt = BASE: forecast issued at kt=BASE+1h says 10.0; actual (kt=BASE+5h,
    # too late for the cutoff) is 12.0 -> err = -2.
    # vt = BASE+1h (same window): forecast 5.0 at kt=BASE+2h (exactly at
    # cutoff, inclusive); actual corrected to 5.0 as well -> err = 0.
    rows = [
        [1, BASE, BASE + timedelta(hours=1), CT1, 10.0, "", "", "medium"],
        [1, BASE, BASE + timedelta(hours=5), CT1, 12.0, "", "", "medium"],
        [1, BASE + timedelta(hours=1), BASE + timedelta(hours=2), CT1, 5.0, "", "", "medium"],
    ]
    df = _frame(spark, rows)
    out = bt.backtest_error(
        df, window_length=timedelta(days=1), issue_offset=timedelta(hours=2), start_window=BASE
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_points == 2
    assert r.mae == pytest.approx(1.0)          # (|-2| + 0) / 2
    assert r.rmse == pytest.approx(2**0.5)      # sqrt((4 + 0)/2)
    assert r.bias == pytest.approx(-1.0)        # (-2 + 0) / 2


def test_backtest_error_skips_unmatched_windows(spark):
    # A valid_time whose only revision arrives after the cutoff has no
    # forecast row -> inner join drops it from the metrics.
    rows = [
        [1, BASE, BASE + timedelta(hours=1), CT1, 10.0, "", "", "medium"],
        [2, BASE, BASE + timedelta(hours=23), CT1, 7.0, "", "", "medium"],
    ]
    df = _frame(spark, rows)
    out = bt.backtest_error(
        df, window_length=timedelta(days=1), issue_offset=timedelta(hours=2), start_window=BASE
    ).collect()
    assert [r.series_id for r in out] == [1]


def test_value_at_two_axis_pin(spark):
    """value_at pins both axes: newest valid_time ≤ T wins, and within it
    only revisions known by K count."""
    rows = [
        # series 1: vt 00:00 revised at KT1 (v=10) and KT2 (v=11);
        #           vt 02:00 known only at KT2 (v=20)
        [1, BASE, KT1, CT1, 10.0, "", "", "medium"],
        [1, BASE, KT2, CT1, 11.0, "", "", "medium"],
        [1, BASE + timedelta(hours=2), KT2, CT1, 20.0, "", "", "medium"],
        # series 2: only a later-valid observation, outside the valid pin
        [2, BASE + timedelta(hours=5), KT1, CT1, 99.0, "", "", "medium"],
    ]
    df = _frame(spark, rows)
    T = BASE + timedelta(hours=1)

    # as known at KT2: vt 02:00 exists but is > T → vt 00:00 wins with its
    # latest revision 11.0
    out = {r.series_id: r for r in bt.value_at(df, T, KT2).collect()}
    assert out[1].value == 11.0 and out[1].effective_valid_time == BASE
    assert 2 not in out  # nothing in effect at T for series 2

    # as known at KT1: the KT2 revision is not yet known → 10.0
    out1 = {r.series_id: r for r in bt.value_at(df, T, KT1).collect()}
    assert out1[1].value == 10.0 and out1[1].known_at == KT1

    # pin late enough to see vt 02:00 as the effective observation
    out2 = {r.series_id: r for r in bt.value_at(df, BASE + timedelta(hours=3), KT2).collect()}
    assert out2[1].value == 20.0 and out2[1].effective_valid_time == BASE + timedelta(hours=2)


def test_audit_hand_computed(spark):
    """bt_audit on a hand-built revision history: restatement counts,
    per-author series reach, and mean |delta| over revisions only."""
    from datetime import datetime

    from timedb_spark.operators import bitemporal as bt

    T0 = datetime(2024, 1, 1)

    def t(h):
        return datetime(2024, 1, 1, h)

    rows = [
        # (series, valid, knowledge, change, value, retention, changed_by, annotation)
        (1, T0, t(1), t(1), 10.0, "short", "alice", ""),
        (1, T0, t(2), t(2), 12.5, "short", "bob", ""),    # restates alice's point: |delta|=2.5
        (1, T0, t(3), t(3), 12.0, "short", "bob", ""),    # restates again: |delta|=0.5
        (2, T0, t(1), t(1), 5.0, "short", "alice", ""),   # first write, not a restatement
        (2, t(4), t(5), t(5), 7.0, "short", "alice", ""), # different point, first write
    ]
    df = spark.createDataFrame(
        rows,
        "series_id int, valid_time timestamp, knowledge_time timestamp, "
        "change_time timestamp, value double, retention string, "
        "changed_by string, annotation string",
    )
    got = {r.changed_by: r for r in bt.audit(df).collect()}

    a = got["alice"]
    assert (a.n_changes, a.n_series, a.n_restatements) == (3, 2, 0)
    assert a.mean_abs_restatement is None
    assert a.first_change == t(1) and a.last_change == t(5)

    b = got["bob"]
    assert (b.n_changes, b.n_series, b.n_restatements) == (2, 1, 2)
    assert b.mean_abs_restatement == 1.5  # (2.5 + 0.5) / 2
    assert b.first_change == t(2) and b.last_change == t(3)


def test_knowledge_lag_hand_computed(spark):
    """Four rows, two tiers, lags 0/60/120 and -30 minutes: counts, bounds,
    exact long-sum mean, and interpolated p50/p90 replay by hand."""
    import math
    from datetime import datetime

    from timedb_spark.operators.bitemporal import knowledge_lag

    vt = datetime(2024, 1, 1, 0, 0)
    rows = [
        # retention, valid_time, knowledge_time (lag minutes: 0, 60, 120)
        ("short", vt, datetime(2024, 1, 1, 0, 0)),
        ("short", vt, datetime(2024, 1, 1, 1, 0)),
        ("short", vt, datetime(2024, 1, 1, 2, 0)),
        ("long", vt, datetime(2023, 12, 31, 23, 30)),  # -30
    ]
    df = spark.createDataFrame(
        rows, "retention string, valid_time timestamp, knowledge_time timestamp"
    )
    got = {r.retention: r for r in knowledge_lag(df).collect()}
    s = got["short"]
    assert s.n_rows == 3
    assert (s.lag_min_min, s.lag_min_max) == (0.0, 120.0)
    assert s.lag_min_mean == math.floor((0 + 60 + 120) / 3 * 1e6) / 1e6
    assert s.lag_min_p50 == 60.0
    # interpolated p90 of [0, 60, 120]: rank 0.9*(3-1)=1.8 → 60 + 0.8*60
    assert s.lag_min_p90 == math.floor((60 + 0.8 * 60) * 1e6) / 1e6
    lg = got["long"]
    assert lg.n_rows == 1 and lg.lag_min_min == -30.0 and lg.lag_min_p90 == -30.0


def test_staleness_hand_buckets(spark):
    """Three series 0 h / 30 h / 200 h behind the corpus high-water mark
    land in fresh / recent / stale with exact worst-lag hours."""
    from datetime import datetime, timedelta

    from timedb_spark.operators.bitemporal import staleness

    hw = datetime(2024, 2, 1)
    rows = [
        ("short", 1, hw),                            # fresh (lag 0)
        ("short", 1, hw - timedelta(hours=500)),     # older point, ignored (max wins)
        ("short", 2, hw - timedelta(hours=30)),      # recent
        ("long", 3, hw - timedelta(hours=200)),      # stale
    ]
    df = spark.createDataFrame(rows, "retention string, series_id long, valid_time timestamp")
    got = {(r.retention, r.bucket): r for r in staleness(df).collect()}
    assert set(got) == {("short", "fresh"), ("short", "recent"), ("long", "stale")}
    assert got[("short", "fresh")].n_series == 1 and got[("short", "fresh")].max_lag_hours == 0
    assert got[("short", "recent")].max_lag_hours == 30
    assert got[("long", "stale")].max_lag_hours == 200


def test_revision_latency_hand_chain(spark):
    """A 3-revision chain with 10- and 30-minute gaps and a single-revision
    chain (no gap rows): counts, bounds and interpolated quantiles replay
    by hand."""
    import math
    from datetime import datetime, timedelta

    from timedb_spark.operators.bitemporal import revision_latency

    vt = datetime(2024, 1, 1)
    k0 = datetime(2024, 1, 1, 12, 0)
    m = timedelta(minutes=1)
    rows = [
        ("short", 1, vt, k0, k0),
        ("short", 1, vt, k0 + 10 * m, k0 + 10 * m),
        ("short", 1, vt, k0 + 40 * m, k0 + 40 * m),
        ("long", 2, vt, k0, k0),  # single revision → no latency rows
    ]
    df = spark.createDataFrame(
        rows,
        "retention string, series_id long, valid_time timestamp, "
        "knowledge_time timestamp, change_time timestamp",
    )
    got = {r.retention: r for r in revision_latency(df).collect()}
    assert set(got) == {"short"}
    r = got["short"]
    assert r.n_revisions == 2
    assert (r.gap_min_min, r.gap_min_max) == (10.0, 30.0)
    assert r.gap_min_p50 == math.floor((10 + 0.5 * 20) * 1e6) / 1e6
    assert r.gap_min_p90 == math.floor((10 + 0.9 * 20) * 1e6) / 1e6
