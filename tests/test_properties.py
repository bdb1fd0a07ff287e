"""Property-based invariants (hypothesis) for the bitemporal core.

The unit tests pin hand-built cases; these throw randomized revision
histories at the operators and check them against a direct Python
re-computation of the reference semantics (ref timedb/read.py:232-344):

* latest == argmax over (kt, ct) per (sid, vt)
* overlapping == one row per (sid, vt, kt), max ct wins
* snapshot(K) == latest of the kt ≤ K sub-history (time-travel consistency)
* value_at(T, K) == newest effective vt ≤ T within the K-snapshot
* latest is insensitive to input row order and duplication of losing rows

Frames stay tiny (≤ 24 rows) — the point is adversarial *shapes* (revision
ties, correction chains, empty groups), not volume.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from timedb_spark.operators import bitemporal as bt

BASE = datetime(2025, 6, 1)

COLS = ["series_id", "valid_time", "knowledge_time", "change_time", "value", "changed_by", "annotation", "retention"]


def _h(i: int) -> datetime:
    return BASE + timedelta(hours=i)


row_strategy = st.tuples(
    st.integers(0, 2),  # series_id
    st.integers(0, 3),  # valid_time hour
    st.integers(0, 3),  # knowledge_time hour
    st.integers(0, 2),  # change_time hour
    st.integers(-5, 5),  # value (integers: exact compare)
)

frame_strategy = st.lists(row_strategy, min_size=1, max_size=24)


def _spark_frame(spark, raw):
    rows = [
        (sid, _h(vt), _h(kt), _h(ct), float(v), "", "", "medium")
        for sid, vt, kt, ct, v in raw
    ]
    return spark.createDataFrame(rows, COLS)


def _py_latest(raw):
    best = {}
    for sid, vt, kt, ct, v in raw:
        k = (sid, vt)
        cand = (kt, ct, v)
        if k not in best or cand[:2] >= best[k][:2]:
            # ties on (kt, ct): keep max value to mirror a deterministic
            # argmax; inputs below are deduped on (sid, vt, kt, ct) anyway
            if k not in best or cand[:2] > best[k][:2] or v > best[k][2]:
                best[k] = cand
    return {k: v[2] for k, v in best.items()}


def _dedup_coords(raw):
    """One value per (sid, vt, kt, ct) coordinate — physical writes can't
    collide on the full coordinate, and collisions would make any engine's
    argmax nondeterministic."""
    seen = {}
    for sid, vt, kt, ct, v in raw:
        seen[(sid, vt, kt, ct)] = v
    return [(sid, vt, kt, ct, v) for (sid, vt, kt, ct), v in seen.items()]


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(frame_strategy)
def test_bitemporal_invariants(spark, raw):
    raw = _dedup_coords(raw)
    df = _spark_frame(spark, raw)

    # latest == python argmax
    exp_latest = {(s, _h(vt)): float(v) for (s, vt), v in _py_latest(raw).items()}
    got_latest = {(r.series_id, r.valid_time): r.value for r in bt.latest(df).collect()}
    assert got_latest == exp_latest

    # overlapping: one row per (sid, vt, kt); max ct wins
    exp_overlap = {}
    for sid, vt, kt, ct, v in raw:
        k = (sid, _h(vt), _h(kt))
        if k not in exp_overlap or ct > exp_overlap[k][0]:
            exp_overlap[k] = (ct, float(v))
    got_overlap = {
        (r.series_id, r.valid_time, r.knowledge_time): r.value
        for r in bt.overlapping(df).collect()
    }
    assert got_overlap == {k: v for k, (_, v) in exp_overlap.items()}

    # snapshot(K) == latest of the kt <= K sub-history
    K = _h(2)
    sub = [r for r in raw if r[2] <= 2]
    exp_snap = {(s, _h(vt)): float(v) for (s, vt), v in _py_latest(sub).items()}
    got_snap = {(r.series_id, r.valid_time): r.value for r in bt.snapshot(df, K).collect()}
    assert got_snap == exp_snap

    # value_at(T, K): newest effective vt <= T within the K-snapshot,
    # winning revision by (kt, ct), value tiebreak
    T = _h(1)
    pinned = [r for r in raw if r[1] <= 1 and r[2] <= 2]
    exp_va = {}
    for sid, vt, kt, ct, v in pinned:
        cand = (vt, kt, ct, v)
        if sid not in exp_va or cand > exp_va[sid]:
            exp_va[sid] = cand
    got_va = {r.series_id: (r.effective_valid_time, r.value) for r in bt.value_at(df, T, K).collect()}
    assert got_va == {sid: (_h(c[0]), float(c[3])) for sid, c in exp_va.items()}

    # order/duplication insensitivity: shuffling + repeating losing rows
    # never changes latest
    noisy = raw + [min(raw)] * 2
    got_noisy = {
        (r.series_id, r.valid_time): r.value
        for r in bt.latest(_spark_frame(spark, noisy[::-1])).collect()
    }
    assert got_noisy == exp_latest


interval_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),   # series_id
        st.integers(0, 6),   # start hour
        st.integers(1, 4),   # duration hours
    ),
    min_size=1,
    max_size=20,
)


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(interval_strategy)
def test_interval_merge_matches_python_sweep(spark, raw):
    """Temporal NORMALIZE under random interval sets: islands, spans and
    interval counts equal a pure-Python sweep-line merge (overlapping OR
    adjacent intervals coalesce; strict gaps split)."""
    ivals = sorted({(sid, s, s + d) for sid, s, d in raw})
    rows = [
        (sid, _h(s), _h(e), _h(0), _h(0), 1.0, "", "", "medium")
        for sid, s, e in ivals
    ]
    df = spark.createDataFrame(
        rows,
        ["series_id", "valid_time", "valid_time_end", "knowledge_time", "change_time",
         "value", "changed_by", "annotation", "retention"],
    )

    # python sweep: per series, sorted by (start, end); new island when
    # start > max end seen so far
    exp = {}
    for sid in sorted({s for s, *_ in ivals}):
        mine = sorted((s, e) for ssid, s, e in ivals if ssid == sid)
        island, max_end = 0, None
        for s, e in mine:
            if max_end is None or s > max_end:
                island += 1
                exp[(sid, island)] = [s, e, 1]
            else:
                exp[(sid, island)][1] = max(exp[(sid, island)][1], e)
                exp[(sid, island)][2] += 1
            max_end = max(max_end, e) if max_end is not None else e

    got = {
        (r.series_id, r.island): [r.span_start, r.span_end, r.n_intervals]
        for r in bt.interval_merge(df).collect()
    }
    assert got == {k: [_h(v[0]), _h(v[1]), v[2]] for k, v in exp.items()}


# ---------------------------------------------------------------------------
# fold-operator properties: the r6 sequential recursions vs exact python
# replays on hypothesis-generated series
# ---------------------------------------------------------------------------

_series_strategy = st.lists(
    st.integers(min_value=0, max_value=20000),  # cents: 0.00 .. 200.00
    min_size=1,
    max_size=40,
)


def _events_frame(spark, tmpdir, cents_series):
    import os

    import pandas as pd

    rows = []
    eid = 0
    for uid, cents in enumerate(cents_series, start=1):
        for t, c in enumerate(cents):
            eid += 1
            rows.append(
                (eid, datetime(2024, 1, 1) + timedelta(hours=t), uid, "x", c / 100.0)
            )
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = os.path.join(tmpdir, "sf")
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_series_strategy, min_size=1, max_size=3))
def test_cusum_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("cusum")), cents_series)
    got = {r.user_id: r for r in ts.cusum(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        n = len(c)
        mu = sum(c) / n
        var = sum(x * x for x in c) / n - mu * mu
        sigma = math.sqrt(max(var, 0.0))
        sp = sn = 0.0
        alarms, mxp, mxn, first = 0, 0.0, 0.0, -1
        for t, x in enumerate(c):
            z = (x - mu) / sigma if sigma > 0 else 0.0
            sp2, sn2 = max(0.0, sp + z - 0.5), max(0.0, sn - z - 0.5)
            mxp, mxn = max(mxp, sp2), max(mxn, sn2)
            if sp2 > 4.0 or sn2 > 4.0:
                alarms += 1
                if first < 0:
                    first = t
                sp = sn = 0.0
            else:
                sp, sn = sp2, sn2
        r = got[uid]
        assert r.n_alarms == alarms and r.first_alarm_idx == first
        assert r.max_cusum_pos == math.floor(mxp * 1e6) / 1e6
        assert r.max_cusum_neg == math.floor(mxn * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_series_strategy, min_size=1, max_size=3))
def test_mk_trend_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math
    from collections import Counter

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("mk")), cents_series)
    got = {r.user_id: r for r in ts.mk_trend(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        n = len(c)
        s = sum(
            (0 if c[j] == c[i] else (1 if c[j] > c[i] else -1))
            for j in range(1, n)
            for i in range(j)
        )
        corr = sum(t * (t - 1) * (2 * t + 5) for t in Counter(c).values())
        var_s = (n * (n - 1) * (2 * n + 5) - corr) / 18.0
        sd = math.sqrt(var_s)
        z = (s - 1) / sd if (s > 0 and sd > 0) else (s + 1) / sd if (s < 0 and sd > 0) else 0.0
        slopes = sorted((c[j] - c[i]) / (j - i) for j in range(1, n) for i in range(j))
        p = len(slopes)
        med = (
            None
            if p == 0
            else slopes[(p + 1) // 2 - 1]
            if p % 2 == 1
            else (slopes[p // 2 - 1] + slopes[p // 2]) / 2.0
        )
        r = got[uid]
        assert r.s_stat == s
        assert r.var_s == math.floor(var_s * 1e6) / 1e6
        assert r.z_stat == math.floor(z * 1e6) / 1e6
        if med is None:
            assert r.sen_slope is None
        else:
            assert r.sen_slope == math.floor(med / 100.0 * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_series_strategy, min_size=1, max_size=2))
def test_periodogram_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts
    from timedb_spark.operators.timeseries import _PERIODOGRAM_PERIODS

    d = _events_frame(spark, str(tmp_path_factory.mktemp("pg")), cents_series)
    got = {r.user_id: r for r in ts.periodogram(spark, d).collect()}

    def replay(xs, cp, sp):
        c, s, sx, sy = 1.0, 0.0, 0.0, 0.0
        for x in xs:
            c, s, sx, sy = c * cp - s * sp, c * sp + s * cp, sx + x * c, sy + x * s
        n = float(len(xs))
        return (sx * sx + sy * sy) / (n * n)

    for uid, c in enumerate(cents_series, start=1):
        xs = [x / 100.0 for x in c]  # hourly grid is dense by construction
        r = got[uid]
        assert r.n_hours == len(c)
        for p, col in ((24, "power_24h"), (12, "power_12h"), (168, "power_168h")):
            cp, sp = _PERIODOGRAM_PERIODS[p]
            assert getattr(r, col) == math.floor(replay(xs, cp, sp) * 1e6) / 1e6, (uid, p)


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_series_strategy, min_size=1, max_size=3))
def test_drawdown_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("dd")), cents_series)
    got = {r.series_id: r for r in ts.drawdown(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        if len(c) < 2:
            assert uid not in got
            continue
        peak, dd, mf = c[0], 0, 0.0
        for x in c[1:]:
            dd = max(dd, peak - x)
            if peak > 0:
                mf = max(mf, float(peak - x) / float(peak))
            peak = max(peak, x)
        r = got[uid]
        assert r.max_drawdown == dd / 100.0
        assert r.max_drawdown_frac == math.floor(mf * 1e6) / 1e6
        assert r.final_peak == peak / 100.0


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_series_strategy, min_size=1, max_size=3))
def test_perm_entropy_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("pe")), cents_series)
    got = {r.user_id: r for r in ts.permutation_entropy(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        if len(c) < 3:
            assert uid not in got
            continue
        pats = [
            4 * (c[i] <= c[i + 1]) + 2 * (c[i] <= c[i + 2]) + (c[i + 1] <= c[i + 2])
            for i in range(len(c) - 2)
        ]
        m = len(pats)
        counts = [pats.count(p) for p in range(8) if pats.count(p) > 0]
        h = 0.0
        for cc in counts:
            h = h - (cc / m) * math.log(cc / m)
        r = got[uid]
        assert r.n_triples == m and r.n_patterns == len(counts)
        assert r.perm_entropy == math.floor(h * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.integers(0, 20000), min_size=48, max_size=80), min_size=1, max_size=2))
def test_backtest_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("bt")), cents_series)
    got = {r.series_id: r for r in ts.backtest_models(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
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
        r = got[uid]
        assert r.n_train == n - 24
        assert r.mae_naive == math.floor(mn * 1e6) / 1e6
        assert r.mae_snaive == math.floor(msn * 1e6) / 1e6
        assert r.mae_mean == math.floor(mm * 1e6) / 1e6
        assert r.best_model == best


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_series_strategy, min_size=1, max_size=3))
def test_hampel_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("hp")), cents_series)
    got = {(r.user_id, r.event_id): r for r in ts.hampel(spark, d).collect()}

    def med(a):
        p = len(a)
        if p % 2 == 1:
            return float(a[(p + 1) // 2 - 1])
        return float(a[p // 2 - 1] + a[p // 2]) / 2.0

    eid = 0
    for uid, c in enumerate(cents_series, start=1):
        for i, x in enumerate(c):
            eid += 1
            win = sorted(c[max(0, i - 3): i + 4])
            m = med(win)
            devs = sorted(abs(float(y) - m) for y in win)
            mad = devs[(len(devs) + 1) // 2 - 1] if len(devs) % 2 == 1 else (
                devs[len(devs) // 2 - 1] + devs[len(devs) // 2]) / 2.0
            out = abs(float(x) - m) > 3.0 * 1.4826 * mad
            r = got[(uid, eid)]
            assert r.is_outlier == out
            assert r.win_median == math.floor(m / 100.0 * 1e6) / 1e6
            assert r.cleaned == math.floor((m if out else float(x)) / 100.0 * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_series_strategy, min_size=1, max_size=3))
def test_anomaly_online_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("anom")), cents_series)
    got = {r.user_id: r for r in ts.anomaly_online(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
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
        r = got[uid]
        assert (r.n_events, r.n_alerts, r.first_alert_idx) == (n, alerts, first)
        assert r.mean_value == math.floor(mean / 100.0 * 1e6) / 1e6
        assert r.std_value == math.floor(math.sqrt(m2 / n) / 100.0 * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.integers(0, 20000), min_size=15, max_size=40), min_size=1, max_size=3))
def test_rsi_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("rsi")), cents_series)
    got = {r.user_id: r for r in ts.rsi(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        ag = al = 0.0
        for i in range(1, len(c)):
            x = float(c[i] - c[i - 1])
            ag = (ag * 13.0 + max(x, 0.0)) / 14.0
            al = (al * 13.0 + max(-x, 0.0)) / 14.0
        r = got[uid]
        assert r.avg_gain == math.floor(ag / 100.0 * 1e6) / 1e6
        assert r.avg_loss == math.floor(al / 100.0 * 1e6) / 1e6
        if ag == 0.0 and al == 0.0:
            assert r.rsi is None
        elif al == 0.0:
            assert r.rsi == 100.0
        else:
            assert r.rsi == math.floor((100.0 - 100.0 / (1.0 + ag / al)) * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.integers(0, 50), min_size=12, max_size=40), min_size=1, max_size=3))
def test_runs_test_property_matches_replay(spark, tmp_path_factory, cents_series):
    """Small value range forces heavy TIES at the median — the adversarial
    shape for the drop-at-median rule and the exact two-middles median."""
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("runs")), cents_series)
    got = {r.user_id: r for r in ts.runs_test(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        cs = sorted(c)
        n = len(c)
        med = float(cs[(n + 1) // 2 - 1]) if n % 2 == 1 else (cs[n // 2 - 1] + cs[n // 2]) / 2.0
        signs = [1 if x > med else -1 for x in c if x != med]
        m = len(signs)
        if m < 10:
            assert uid not in got
            continue
        runs = 1 + sum(1 for i in range(1, m) if signs[i] != signs[i - 1])
        n1 = sum(1 for s_ in signs if s_ == 1)
        a, b = float(n1), float(m - n1)
        mu = 2.0 * a * b / m + 1.0
        var = 2.0 * a * b * (2.0 * a * b - m) / (m * m * (m - 1.0))
        r = got[uid]
        assert (r.n_runs, r.n_above, r.n_below) == (runs, n1, m - n1)
        if var > 0:
            assert r.z == math.floor((runs - mu) / math.sqrt(var) * 1e6) / 1e6
        else:
            assert r.z is None and r.verdict is None


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.integers(0, 20000), min_size=30, max_size=40), min_size=1, max_size=3))
def test_ljung_box_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("lb")), cents_series)
    got = {r.user_id: r for r in ts.ljung_box(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        n = len(c)
        mu = float(sum(c)) / float(n)
        dev = [float(x) - mu for x in c]
        denom = 0.0
        for x in dev:
            denom += x * x
        if denom == 0.0:
            assert uid not in got  # constant series filtered
            continue
        acc, r1 = 0.0, None
        for k in range(1, 6):
            num = 0.0
            for t in range(n - k):
                num += dev[t] * dev[t + k]
            rk = num / denom
            if k == 1:
                r1 = rk
            acc = acc + rk * rk / (n - float(k))
        q = n * (n + 2.0) * acc
        r = got[uid]
        assert r.q_stat == math.floor(q * 1e6) / 1e6
        assert r.acf_lag1 == math.floor(r1 * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.integers(0, 20000), min_size=20, max_size=45), min_size=1, max_size=3))
def test_bollinger_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("boll")), cents_series)
    got = {r.user_id: r for r in ts.bollinger(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        up = dn = ev = 0
        pb_last = None
        for i in range(19, len(c)):
            w = c[i - 19 : i + 1]
            ev += 1
            mu = sum(w) / 20.0
            sd = math.sqrt(max(sum(x * x for x in w) / 20.0 - mu * mu, 0.0))
            hi, lo = mu + 2.0 * sd, mu - 2.0 * sd
            x = float(c[i])
            if x > hi:
                up += 1
            if x < lo:
                dn += 1
            if hi > lo:
                pb_last = (x - lo) / (hi - lo)
        r = got[uid]
        assert (r.n_obs, r.n_eval, r.n_breach_upper, r.n_breach_lower) == (len(c), ev, up, dn)
        if pb_last is None:
            assert r.pct_b_last is None
        else:
            assert r.pct_b_last == math.floor(pb_last * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.integers(0, 20000), min_size=30, max_size=45), min_size=1, max_size=3))
def test_macd_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("macd")), cents_series)
    got = {r.user_id: r for r in ts.macd(spark, d).collect()}
    fa, sl, sg = 2.0 / 13.0, 2.0 / 27.0, 0.2
    for uid, c in enumerate(cents_series, start=1):
        e12 = e26 = float(c[0])
        sig = hmax = hmin = 0.0
        for ci in c[1:]:
            x = float(ci)
            e12 = e12 + (x - e12) * fa
            e26 = e26 + (x - e26) * sl
            sig = sig + ((e12 - e26) - sig) * sg
            h = (e12 - e26) - sig
            hmax, hmin = max(hmax, h), min(hmin, h)
        r = got[uid]
        assert r.macd == math.floor((e12 - e26) / 100.0 * 1e6) / 1e6
        assert r.macd_signal == math.floor(sig / 100.0 * 1e6) / 1e6
        assert r.hist_max == math.floor(hmax / 100.0 * 1e6) / 1e6
        assert r.hist_min == math.floor(hmin / 100.0 * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.integers(0, 20000), min_size=31, max_size=45), min_size=1, max_size=3))
def test_var_es_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("var")), cents_series)
    got = {r.user_id: r for r in ts.var_es(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        dl = sorted(c[i] - c[i - 1] for i in range(1, len(c)))
        n = len(dl)
        k95, k99 = (n + 19) // 20, (n + 99) // 100
        r = got[uid]
        assert r.n_ret == n
        assert r.var95 == math.floor(-dl[k95 - 1] / 100.0 * 1e6) / 1e6
        assert r.es95 == math.floor(-(sum(dl[:k95]) / k95) / 100.0 * 1e6) / 1e6
        assert r.var99 == math.floor(-dl[k99 - 1] / 100.0 * 1e6) / 1e6


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.integers(0, 20000), min_size=30, max_size=45), min_size=1, max_size=3))
def test_sharpe_property_matches_replay(spark, tmp_path_factory, cents_series):
    import math

    from timedb_spark.operators import timeseries as ts

    d = _events_frame(spark, str(tmp_path_factory.mktemp("sh")), cents_series)
    got = {r.user_id: r for r in ts.sharpe(spark, d).collect()}
    for uid, c in enumerate(cents_series, start=1):
        dl = [c[i] - c[i - 1] for i in range(1, len(c))]
        n = float(len(dl))
        mean = sum(dl) / n
        vol = math.sqrt(max(sum(x * x for x in dl) / n - mean * mean, 0.0))
        ddev = math.sqrt(sum(min(x, 0) ** 2 for x in dl) / n)
        r = got[uid]
        assert r.mean_chg == math.floor(mean / 100.0 * 1e6) / 1e6
        assert r.volatility == math.floor(vol / 100.0 * 1e6) / 1e6
        if vol > 0:
            assert r.sharpe == math.floor(mean / vol * 1e6) / 1e6
        else:
            assert r.sharpe is None
        if ddev > 0:
            assert r.sortino == math.floor(mean / ddev * 1e6) / 1e6
        else:
            assert r.sortino is None


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(1, 5000), st.integers(1, 4)),  # (user_id, n_events)
        min_size=2,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_srm_property_matches_exact_replay(spark, tmp_path_factory, users):
    """events_srm's χ² must equal the EXACT integer replay
    Σ(12·n_b − T)² / (12·T) folded over the FULL 0..11 bucket domain
    (ADVICE r8: an empty bucket contributes T², the strongest SRM signal —
    the operator left-joins the domain so it can never vanish from the
    aggregate). The replay folds pure ints, so any order-sensitivity
    regression in the operator diverges here."""
    import math
    import os

    import pandas as pd

    rows, eid = [], 0
    for uid, n in users:
        for k in range(n):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + timedelta(minutes=eid), uid, "x", 1.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = os.path.join(str(tmp_path_factory.mktemp("srm")), "sf")
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    from timedb_spark.operators import analytics

    out = analytics.events_srm(spark, d).collect()

    buckets: dict[int, int] = {b: 0 for b in range(12)}
    for uid, _n in users:
        b = uid * 2654435761 % 2147483648 % 12
        buckets[b] += 1
    T = sum(buckets.values())
    num = {b: (12 * n - T) ** 2 for b, n in buckets.items()}
    chi2 = sum(num.values()) / (12.0 * T)

    got = {r.bucket: r for r in out}
    assert set(got) == set(range(12))
    for b, r in got.items():
        assert r.n_users == buckets[b]
        assert r.chi2_contrib == math.floor(num[b] / (12.0 * T) * 1e6) / 1e6
        assert r.chi2_total == math.floor(chi2 * 1e6) / 1e6
        assert r.verdict == ("srm_detected" if chi2 > 24.725 else "healthy")
