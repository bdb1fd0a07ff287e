"""Pin tests for events_rfm's two scoring modes (VERDICT r4 task #1).

The operator default is percentile_approx cut-point scoring (zero global
sorts — the scale path); ``exact=True`` is the ntile path that matches the
DuckDB oracle. These tests pin:

1. On all-distinct data whose size is a multiple of 5, the two modes agree
   EXACTLY (cut-points at accuracy=10000 are exact on small data, and each
   value falls in the same quintile under both rules).
2. On fully tied data the modes diverge BY DESIGN: cut-point scoring gives
   every tied user the same score (quantile-threshold semantics) while ntile
   splits ties across 5 near-equal buckets via the user_id tiebreak. The
   divergence is documented in the operator docstring
   (timedb_spark/operators/analytics.py events_rfm).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timedb_spark.operators import analytics


def _events_dir(tmp_path, rows):
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]).to_parquet(
        tmp_path / "events.parquet"
    )
    return str(tmp_path)


def _monotone_corpus(tmp_path):
    """25 users; user u has u purchases of value u, last at day 1+u —
    strictly increasing frequency/monetary, strictly decreasing recency,
    no ties anywhere, 25 % 5 == 0."""
    ev, eid = [], 0
    for u in range(1, 26):
        for _ in range(u):
            ev.append((eid, pd.Timestamp(2024, 1, 1, tz="UTC") + pd.Timedelta(days=u), u, "purchase", float(u), "{}"))
            eid += 1
    ev.append((eid, pd.Timestamp(2024, 2, 1, tz="UTC"), 1, "click", 0.0, "{}"))  # anchor
    return _events_dir(tmp_path, ev)


def test_rfm_exact_and_approx_agree_on_untied_quintiles(spark, tmp_path):
    d = _monotone_corpus(tmp_path)
    approx = {r["user_id"]: r.asDict() for r in analytics.events_rfm(spark, d).collect()}
    exact = {r["user_id"]: r.asDict() for r in analytics.events_rfm(spark, d, exact=True).collect()}
    assert set(approx) == set(exact) == set(range(1, 26))
    for u in approx:
        assert approx[u] == exact[u], f"user {u}: approx {approx[u]} != exact {exact[u]}"
    # and both match the hand computation: user u in quintile ceil(u/5)
    for u in range(1, 26):
        q = (u + 4) // 5
        assert approx[u]["segment"] == f"{q}{q}{q}"


def test_rfm_modes_diverge_on_ties_as_documented(spark, tmp_path):
    # 10 users, one identical purchase each: every dimension fully tied.
    ts = pd.Timestamp(2024, 1, 10, tz="UTC")
    ev = [(u, ts, u, "purchase", 1.0, "{}") for u in range(1, 11)]
    ev.append((99, pd.Timestamp(2024, 1, 20, tz="UTC"), 1, "click", 0.0, "{}"))  # anchor
    d = _events_dir(tmp_path, ev)

    approx = analytics.events_rfm(spark, d).collect()
    # quantile-threshold semantics: all tied users score identically
    # (cuts equal the common value; nothing is strictly above any cut for
    # f/m, so score 1; recency inverted -> 5).
    assert {(r["r_score"], r["f_score"], r["m_score"]) for r in approx} == {(5, 1, 1)}

    exact = analytics.events_rfm(spark, d, exact=True).collect()
    # ntile guarantees 5 near-equal buckets even under full ties: 10 users
    # -> each score value appears exactly twice per dimension.
    for col in ("r_score", "f_score", "m_score"):
        scores = sorted(r[col] for r in exact)
        assert scores == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5], f"{col}: {scores}"


def test_abtest_hand_computed(spark, tmp_path):
    """events_abtest on a crafted experiment: 4 users per variant, variant 0
    converts 1/4 (user 2), variant 1 converts 3/4 (users 1,3,5) — counts,
    rates, and the pooled two-proportion z all match the hand calculation."""
    import math

    ts = pd.Timestamp(2024, 1, 1, tz="UTC")
    ev, eid = [], 0
    for u in range(8):  # all 8 users have some event
        ev.append((eid, ts, u, "click", 0.0, "{}")); eid += 1
    for u in (2, 1, 3, 5):  # converting purchases (value >= 100)
        ev.append((eid, ts, u, "purchase", 150.0, "{}")); eid += 1
    ev.append((eid, ts, 4, "purchase", 50.0, "{}"))  # sub-threshold: no conversion
    d = _events_dir(tmp_path, ev)
    r = analytics.events_abtest(spark, d).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (4, 1, 4, 3)
    assert r.rate_a == 0.25 and r.rate_b == 0.75
    pool = 0.5
    z = (0.75 - 0.25) / math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 4))
    assert r.z_score == pytest.approx(round(z, 6))


def test_abtest_degenerate_pool_yields_null_z(spark, tmp_path):
    """All users converting (pool=1) gives zero pooled variance: z must be
    NULL, not a divide-by-zero error (ANSI mode raises on the naive form)."""
    ts = pd.Timestamp(2024, 1, 1, tz="UTC")
    ev = [(u, ts, u, "purchase", 200.0, "{}") for u in range(4)]
    d = _events_dir(tmp_path, ev)
    r = analytics.events_abtest(spark, d).collect()[0]
    assert (r.rate_a, r.rate_b) == (1.0, 1.0) and r.z_score is None


def test_profile_drift_hand_computed(spark, tmp_path):
    """PSI report on a crafted two-population drift: clicks uniform over
    bins {0,1}, purchases all in bin 1 — per-bin terms match the hand
    formula, and the empty-bin epsilon floor kicks in where one side has
    no mass."""
    import math

    from timedb_spark.operators import pipeline

    ts = pd.Timestamp(2024, 1, 1, tz="UTC")
    ev, eid = [], 0
    for v in (10.0, 10.0, 60.0, 60.0):  # clicks: 2 in bin 0, 2 in bin 1
        ev.append((eid, ts, 1, "click", v, "{}")); eid += 1
    for v in (60.0, 70.0, 80.0, 90.0):  # purchases: 4 in bin 1
        ev.append((eid, ts, 1, "purchase", v, "{}")); eid += 1
    ev.append((eid, ts, 1, "view", 10.0, "{}"))  # other types excluded
    d = _events_dir(tmp_path, ev)
    rows = {r.bin: r for r in pipeline.profile_drift(spark, d).collect()}
    assert set(rows) == {0, 1}
    eps = 1e-6
    # bin 0: p_a = 0.5, p_b floored to eps
    assert rows[0].p_a == 0.5 and rows[0].p_b == eps
    assert rows[0].psi_term == pytest.approx(round((eps - 0.5) * math.log(eps / 0.5), 6))
    # bin 1: p_a = 0.5, p_b = 1.0
    assert rows[1].p_a == 0.5 and rows[1].p_b == 1.0
    assert rows[1].psi_term == pytest.approx(round(0.5 * math.log(2.0), 6))


def test_events_survival_hand_computed(spark, tmp_path):
    """Kaplan-Meier on a hand-built cohort: 5 users with lifetimes
    0/0/2/5/9 days against a 10-day window; the 9-day user's last event is
    within the censor margin -> censored. Survival factors verified against
    the product-limit definition computed by hand."""
    import math
    import os

    import pandas as pd

    from datetime import datetime as _dt

    day = pd.Timedelta(days=1)
    t0 = _dt(2024, 1, 1)
    rows = []
    eid = 0

    def span(uid, first_day, last_day):
        nonlocal eid
        for d_ in {first_day, last_day}:
            eid += 1
            rows.append((eid, t0 + d_ * day, uid, "x", 1.0))

    span(1, 0, 0)   # lifetime 0, churned
    span(2, 0, 0)   # lifetime 0, churned
    span(3, 1, 3)   # lifetime 2, churned
    span(4, 1, 6)   # lifetime 5, churned (last event clears the censor margin)
    span(5, 1, 10)  # lifetime 9, last event AT window end -> censored
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    out = {r.duration_days: r for r in analytics.events_survival(spark, d).collect()}
    assert set(out) == {0, 2, 5, 9}
    # t=0: n=5, d=2 -> S = 3/5
    assert (out[0].n_risk, out[0].n_events, out[0].n_censored) == (5, 2, 0)
    s0 = 3 / 5
    assert out[0].km_survival == math.floor(s0 * 1e6) / 1e6
    # t=2: n=3, d=1 -> S = 3/5 * 2/3
    s2 = s0 * (2 / 3)
    assert (out[2].n_risk, out[2].n_events) == (3, 1)
    assert out[2].km_survival == math.floor(s2 * 1e6) / 1e6
    # t=5: n=2, d=1 -> S = s2 * 1/2
    s5 = s2 * (1 / 2)
    assert out[5].km_survival == math.floor(s5 * 1e6) / 1e6
    # t=9: censored only -> factor 1, S unchanged
    assert (out[9].n_events, out[9].n_censored) == (0, 1)
    assert out[9].km_survival == math.floor(s5 * 1e6) / 1e6


def test_graph_link_predict_hand_computed(spark, tmp_path):
    """RA link prediction on a hand-built 4-node path graph
    1-2, 2-3, 3-4 (+ order 99 joining 1-2-3 so 1-3 is also wedged twice? no:
    orders are the edge source). Edges: {1,2},{2,3},{3,4}. Non-adjacent
    2-hop pairs: (1,3) via 2 [deg 2], (2,4) via 3 [deg 2], (1,4) none.
    RA score = 1/2 for both; cn = 1."""
    import os

    import pandas as pd

    # lineitem orders define co-purchase edges: one order per edge
    rows = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3), (3, 4)]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    # fill the remaining lineitem columns the loader may project
    d = str(tmp_path / "sf")
    os.makedirs(d)
    li.to_parquet(os.path.join(d, "lineitem.parquet"))

    out = analytics.graph_link_predict(spark, d).collect()
    got = {(r.u, r.w): r for r in out}
    assert set(got) == {(1, 3), (2, 4)}
    for r in out:
        assert r.cn == 1
        assert r.ra_score == 0.5


def test_graph_link_predict_planted_hub_cap_stable(spark):
    """Planted-hub stability of the budget-derived middle-degree cap
    (VERDICT r6 #2): part 99 appears in EVERY order (the power-law hub).
    The hub is a common neighbor of every candidate pair, so it shifts each
    pair's RA score by the SAME 1/deg(hub) — capping it out preserves the
    ranking exactly while removing the dominant wedge class; pairs whose
    ONLY common neighbor was the hub (RA = 1/deg(hub), the no-signal floor)
    drop out entirely.

    Cycle-with-chord graph over parts 1..6 (edges 1-2,2-3,1-6,3-6,3-4,4-5)
    plus hub 99 in all six orders. Hand-computed exact ranking:
    (1,3) 1/3+1/3+1/6, (2,6) 1/3+1/4+1/6, (3,5) 1/3+1/6,
    (2,4)=(4,6) 1/4+1/6, then four hub-only pairs at 1/6."""
    orders = [(1, 2), (2, 3), (1, 6), (3, 6), (3, 4), (4, 5)]
    rows = [(ok, pk) for ok, (x, y) in enumerate(orders) for pk in (x, y, 99)]
    li = spark.createDataFrame(rows, "ok bigint, pk bigint")

    # degree classes: {5}:2, {1,2,4,6}:3, {3}:4, {99}:6 → Σdeg² cum by class
    # 4 / 40 / 56 / 92; budget 60 admits ≤4 — exactly excising the hub.
    und = li.alias("a").join(li.alias("b"), "ok").selectExpr("a.pk pa", "b.pk pb")
    deg = (
        und.filter("pa != pb").distinct()
        .groupBy(F.col("pa").alias("node")).count().withColumnRenamed("count", "deg")
    )
    assert analytics._ra_middle_cap(deg, 60) == 4
    assert analytics._ra_middle_cap(deg, 3) == 2  # sub-minimum budget → min class
    assert analytics._ra_middle_cap(deg.filter("deg < 0"), 60) == 0  # empty graph

    kw = dict(top_n=9, max_middle_degree=None)
    exact = analytics._link_predict_pairs(li, wedge_budget=None, **kw).collect()
    capped = analytics._link_predict_pairs(li, wedge_budget=60, **kw).collect()

    assert [(r.u, r.w) for r in exact] == [
        (1, 3), (2, 6), (3, 5), (2, 4), (4, 6), (1, 4), (1, 5), (2, 5), (5, 6)
    ]
    # top-5 ranking identical under the cap; hub-only pairs vanish
    assert [(r.u, r.w) for r in capped] == [(r.u, r.w) for r in exact[:5]]
    by_pair = {(r.u, r.w): r for r in exact}
    for r in capped:
        ex = by_pair[(r.u, r.w)]
        assert r.cn == ex.cn - 1  # exactly the hub removed from the middles
        # score drops by exactly the hub's 1/6 contribution (floor-scaled)
        assert r.ra_score == pytest.approx(ex.ra_score - 1 / 6, abs=2e-6)


def test_graph_label_prop_two_cliques(spark, tmp_path):
    """Two disjoint co-purchase cliques resolve to two communities labelled
    by their min part id; a bridge order merging them collapses the labels
    after enough rounds."""
    import os

    import pandas as pd

    rows = [(1, p) for p in (10, 11, 12)] + [(2, p) for p in (20, 21, 22)]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    # pad the untouched lineitem columns the loader projects
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "lineitem.parquet"))

    out = {r.node: r for r in analytics.graph_label_prop(spark, d).collect()}
    assert {r.community for r in out.values()} == {10, 20}
    assert all(out[p].community == 10 and out[p].community_size == 3 for p in (10, 11, 12))
    assert all(out[p].community == 20 and out[p].community_size == 3 for p in (20, 21, 22))


def test_events_entropy_closed_forms(spark, tmp_path):
    """Single-action user has zero type entropy; a uniform 4-type user hits
    ln(4) with normalized entropy exactly 1; values replay the fold."""
    import math
    import os
    from datetime import datetime

    import pandas as pd

    rows = []
    eid = 0
    for t in range(8):  # user 1: all clicks, all same hour
        eid += 1
        rows.append((eid, datetime(2024, 1, 1, 9), 1, "click", 1.0))
    for t, et in enumerate(["a", "b", "c", "d"] * 3):  # user 2: uniform 4 types
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + pd.Timedelta(hours=t % 5), 2, et, 1.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in analytics.events_entropy(spark, d).collect()}
    assert got[1].type_entropy == 0.0 and got[1].type_entropy_norm == 0.0
    assert got[1].n_active_hours == 1 and got[1].hod_entropy == 0.0
    expected = math.floor(-sum(0.25 * math.log(0.25) for _ in range(4)) * 1e6) / 1e6
    assert got[2].type_entropy == expected
    assert got[2].type_entropy_norm == math.floor((-4 * 0.25 * math.log(0.25)) / math.log(4.0) * 1e6) / 1e6
    assert got[2].n_types == 4 and got[2].n_events == 12


def test_events_lift_hand_computed(spark, tmp_path):
    """Association rules on a planted corpus with known counts: a pair
    present in every basket has lift exactly 1/P(other-direction math
    checks below); a perfectly anti-correlated pair never reaches
    min_support and is absent; lift > 1 appears exactly for the planted
    co-occurring pair."""
    import os
    from datetime import datetime

    import pandas as pd

    # 40 users. Types: "x" in all 40 baskets; "y" in users 0..19 ONLY and
    # "z" in users 0..19 ONLY (y,z perfectly co-occur); "w" in users 20..39
    # (w never co-occurs with y/z).
    rows, eid = [], 0
    for u in range(40):
        types = ["x"] + (["y", "z"] if u < 20 else ["w"])
        for et in types:
            eid += 1
            rows.append((eid, datetime(2024, 1, 1, eid % 24), u, et, 1.0))
            eid += 1  # duplicate event of the same type: basket dedup must absorb it
            rows.append((eid, datetime(2024, 1, 1, eid % 24), u, et, 2.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {(r.type_a, r.type_b): r for r in analytics.events_lift(spark, d).collect()}

    # (y, z): support 20, cnt 20/20, n=40 → conf 1.0 both ways, lift 2.0
    yz = got[("y", "z")]
    assert (yz.support, yz.cnt_a, yz.cnt_b) == (20, 20, 20)
    assert yz.conf_a_b == 1.0 and yz.conf_b_a == 1.0 and yz.lift == 2.0

    # (x, y): support 20, cnt_x 40 → conf_x→y 0.5, conf_y→x 1.0, lift 1.0
    xy = got[("x", "y")]
    assert (xy.support, xy.cnt_a, xy.cnt_b) == (20, 40, 20)
    assert xy.conf_a_b == 0.5 and xy.conf_b_a == 1.0 and xy.lift == 1.0

    # (w, y): never co-occur → below min_support, absent
    assert ("w", "y") not in got and ("y", "w") not in got
    # duplicate same-type events did not inflate any support
    assert got[("w", "x")].support == 20


def test_profile_sources_hand_computed(spark, tmp_path):
    """Per-source dashboard on a planted corpus: counts, dominant language
    with deterministic tiebreak (count desc, then name), and the
    within-source exact-dup rate counting ALL members of a dup group."""
    import os

    rows = [
        # source A: 4 docs, langs en×2/de×2 (tie → 'de' wins by name),
        # one dup pair → n_dup_docs = 2
        (1, "same text here", "en", "A", 14),
        (2, "same text here", "de", "A", 14),
        (3, "unique one", "en", "A", 10),
        (4, "unique two", "de", "A", 10),
        # source B: 3 docs all en, a triple dup group → n_dup_docs = 3
        (5, "b text", "en", "B", 6),
        (6, "b text", "en", "B", 6),
        (7, "b text", "en", "B", 6),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))

    from timedb_spark.operators import pipeline

    got = {r.source: r for r in pipeline.profile_sources(spark, d).collect()}

    a = got["A"]
    assert (a.n_docs, a.total_chars, a.n_langs) == (4, 48, 2)
    assert a.avg_chars == 12.0
    assert a.top_lang == "de" and a.top_lang_share == 0.5  # 2-2 tie → name order
    assert a.n_dup_docs == 2 and a.dup_rate == 0.5

    b = got["B"]
    assert (b.n_docs, b.n_langs, b.top_lang) == (3, 1, "en")
    assert b.top_lang_share == 1.0
    assert b.n_dup_docs == 3 and b.dup_rate == 1.0


def test_graph_degree_profile_matches_member_logic(spark, tmp_path):
    """The profile's stats replay a python recompute on a planted graph,
    and its orientation verdict equals select_orientation on the same
    (max_deg, n_edges) — a star graph flips to 'degree', a cycle stays
    'id'."""
    import math
    import os

    # build lineitem so the co-purchase graph is a 12-leaf star (hub part
    # 0 shares an order with each leaf) plus a disjoint 4-cycle
    rows = []
    ok = 0
    for leaf in range(1, 13):  # star: orders {0, leaf}
        ok += 1
        rows.append((ok, 0))
        rows.append((ok, leaf))
    cyc = [100, 101, 102, 103]
    for i in range(4):  # cycle edges via 2-part orders
        ok += 1
        rows.append((ok, cyc[i]))
        rows.append((ok, cyc[(i + 1) % 4]))
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "lineitem.parquet"))

    r = analytics.graph_degree_profile(spark, d).collect()[0]
    assert r.n_nodes == 17 and r.n_edges == 16 and r.max_deg == 12

    degs = sorted([12] + [1] * 12 + [2] * 4)
    med = (degs[8] + degs[9]) / 2.0  # n=17 → middle element; odd pick
    med = float(degs[(17 + 1) // 2 - 1])
    assert r.median_deg == med
    tail = [x for x in degs if x >= med]
    lnsum = 0.0
    for x in tail:
        lnsum = lnsum + math.log(x / med)
    assert r.n_tail == len(tail)
    assert r.hill_alpha == math.floor((1.0 + len(tail) / lnsum) * 1e6) / 1e6
    # star hub: 12² = 144 > 16·16 = 256? No → stays 'id'
    assert r.orientation == analytics.select_orientation(r.max_deg, r.n_edges)


def test_events_interarrival_planted_signatures(spark, tmp_path):
    """Timing signatures on planted streams: a perfectly periodic user has
    burstiness exactly -1 (σ=0 ⇒ B=(0-μ)/(0+μ)) and an undefined memory
    coefficient; an alternating short/long user replays the exact gap
    math with memory exactly -1; a 2-event user is excluded."""
    import math
    import os
    from datetime import datetime, timedelta

    rows, eid = [], 0
    for t in range(10):  # user 1: metronome, gap exactly 3600 s
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + timedelta(hours=t), 1, "x", 1.0))
    gaps2 = [60, 3600, 60, 3600, 60, 3600, 60]  # user 2: alternating
    t0 = datetime(2024, 1, 1)
    cur = t0
    eid += 1
    rows.append((eid, cur, 2, "x", 1.0))
    for gsec in gaps2:
        cur = cur + timedelta(seconds=gsec)
        eid += 1
        rows.append((eid, cur, 2, "x", 1.0))
    for t in range(2):  # user 3: too short
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + timedelta(hours=t), 3, "x", 1.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.user_id: r for r in analytics.events_interarrival(spark, d).collect()}
    assert 3 not in got

    r1 = got[1]
    assert r1.n_gaps == 9 and r1.mean_gap_s == 3600.0 and r1.median_gap_s == 3600.0
    assert r1.burstiness == -1.0  # σ = 0: the periodic signature
    assert r1.memory_coef is None  # zero variance → undefined, NULL

    # user 2: replay the exact math
    g = [x * 1_000_000 for x in gaps2]
    m = len(g)
    mu = sum(g) / m
    sigma = math.sqrt(sum(float(x) * x for x in g) / m - mu * mu)
    r2 = got[2]
    assert r2.n_gaps == m
    assert r2.burstiness == math.floor((sigma - mu) / (sigma + mu) * 1e6) / 1e6
    assert r2.burstiness > 0.0  # σ > μ: more variable than Poisson
    a1, a2 = g[:-1], g[1:]
    k = m - 1
    s1, s2 = sum(a1) / k, sum(a2) / k
    cov = sum(float(x) * y for x, y in zip(a1, a2)) / k - s1 * s2
    v1 = sum(float(x) * x for x in a1) / k - s1 * s1
    v2 = sum(float(x) * x for x in a2) / k - s2 * s2
    assert r2.memory_coef == math.floor(cov / (math.sqrt(v1) * math.sqrt(v2)) * 1e6) / 1e6
    assert r2.memory_coef < -0.9  # perfect alternation: strong negative memory


def test_events_gini_closed_forms(spark, tmp_path):
    """Gini on planted distributions: perfectly equal users score 0; one
    user owning nearly everything scores near 1 − 1/n; values replay the
    exact Σ(2i−n−1)x formula."""
    import math
    import os
    from datetime import datetime, timedelta

    rows, eid = [], 0
    # 10 users, 4 events each, value 2.50 — perfect equality
    for u in range(10):
        for t in range(4):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + timedelta(hours=t), u, "x", 2.5))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    from timedb_spark.operators import analytics as an

    r = an.events_gini(spark, d).collect()[0]
    assert r.n_users == 10
    assert r.gini_events == 0.0 and r.gini_spend == 0.0
    assert r.top_decile_events == 0.1  # 1 of 10 equal users holds 10%

    # skewed corpus: user 0 gets 91 events, users 1..9 get 1 each
    rows, eid = [], 0
    for t in range(91):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + timedelta(minutes=t), 0, "x", 1.0))
    for u in range(1, 10):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1), u, "x", 1.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d2 = str(tmp_path / "sf2")
    os.makedirs(d2)
    pdf.to_parquet(os.path.join(d2, "events.parquet"))

    r2 = an.events_gini(spark, d2).collect()[0]
    counts = sorted([91] + [1] * 9)
    n, tot = len(counts), sum(counts)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(counts))
    exp = math.floor(num / (n * tot) * 1e6) / 1e6
    assert r2.gini_events == exp
    assert r2.gini_events > 0.7  # heavy concentration
    assert r2.top_decile_events == 0.91  # user 0 (top 10%) holds 91/100


def test_graph_kcore_planted_cliques(spark, tmp_path):
    """A 6-clique bridged to a triangle: peeling at k=4 strips the triangle
    and the bridge edge, leaving exactly the clique (deg_core 5); k above
    the clique degree empties the core; the adaptive default keeps the
    whole (low-mean) graph."""
    import os

    rows = [(1, p) for p in (1, 2, 3, 4, 5, 6)] + [(2, p) for p in (11, 12, 13)] + [
        (3, 6), (3, 11)
    ]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "lineitem.parquet"))

    core4 = {r.node: r for r in analytics.graph_kcore(spark, d, k=4).collect()}
    assert set(core4) == {1, 2, 3, 4, 5, 6}
    assert all(r.deg_core == 5 for r in core4.values())
    assert core4[6].deg_initial == 6  # clique 5 + bridge 1
    assert analytics.graph_kcore(spark, d, k=6).count() == 0
    # default k = floor(0.7 * mean(38/9)) = 2 → nothing peels (9 nodes total)
    assert analytics.graph_kcore(spark, d).count() == 9


def test_events_time_to_convert_hand_events(spark, tmp_path):
    """Hand funnel: user 1 views then purchases 2 h later; user 2 clicks
    then purchases 5 h later (an EARLIER pre-touch purchase must not
    count); user 3 never purchases; user 4 purchases with no touch —
    rows appear only for converting touched users, delays exact."""
    import os

    ts0 = pd.Timestamp(2024, 1, 1)
    h = pd.Timedelta(hours=1)
    rows = [
        (1, ts0, 1, "view", 0.0, ""),
        (2, ts0 + 2 * h, 1, "purchase", 10.0, ""),
        (3, ts0 - 3 * h, 2, "purchase", 5.0, ""),   # pre-touch: excluded
        (4, ts0, 2, "click", 0.0, ""),
        (5, ts0 + 5 * h, 2, "purchase", 9.0, ""),
        (6, ts0 + 9 * h, 2, "purchase", 9.0, ""),   # later buy ignored (first wins)
        (7, ts0, 3, "view", 0.0, ""),
        (8, ts0, 4, "purchase", 1.0, ""),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.first_touch: r for r in analytics.events_time_to_convert(spark, d).collect()}
    assert set(got) == {"view", "click"}
    v = got["view"]
    assert (v.n_converted, v.hours_min, v.hours_max, v.hours_p50) == (1, 2.0, 2.0, 2.0)
    c = got["click"]
    assert (c.n_converted, c.hours_min, c.hours_max) == (1, 5.0, 5.0)


def test_pipeline_dq_rules_planted_violations(spark, tmp_path):
    """Planted violations: one NULL value, one negative value, one
    duplicated event_id, one off-vocabulary type — each rule reports its
    exact count and fails; untouched rules pass."""
    import os

    from timedb_spark.operators import pipeline

    ts = pd.Timestamp(2024, 1, 1)
    rows = [
        (1, ts, 1, "click", 1.0, ""),
        (2, ts, 1, "view", None, ""),        # null value
        (3, ts, 2, "purchase", -5.0, ""),    # negative value
        (3, ts, 2, "click", 2.0, ""),        # duplicate event_id
        (4, ts, 3, "weird", 1.0, ""),        # off-vocabulary type
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.rule: r for r in pipeline.pipeline_dq_rules(spark, d).collect()}
    assert got["value_not_null"].n_violations == 1 and got["value_not_null"].status == "fail"
    assert got["value_non_negative"].n_violations == 1
    assert got["event_id_unique"].n_violations == 1
    assert got["event_type_in_vocab"].n_violations == 1
    assert got["value_below_cap"].n_violations == 0 and got["value_below_cap"].status == "pass"
    assert got["ts_not_null"].status == "pass"
    assert all(r.n_rows == 5 for r in got.values())
    assert got["value_non_negative"].violation_share == 0.2


def test_events_seasonality_hand_profile(spark, tmp_path):
    """Hand events: clicks peak at hour 9 (2 of 3), one click on a Saturday
    night (hour 2) — peak hour/share, weekend and night shares exact."""
    import os

    rows = [
        (1, pd.Timestamp(2024, 1, 1, 9), 1, "click", 1.0, ""),   # Monday 09
        (2, pd.Timestamp(2024, 1, 2, 9), 1, "click", 1.0, ""),   # Tuesday 09
        (3, pd.Timestamp(2024, 1, 6, 2), 2, "click", 1.0, ""),   # Saturday 02
        (4, pd.Timestamp(2024, 1, 7, 12), 2, "view", 1.0, ""),   # Sunday 12
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    got = {r.event_type: r for r in analytics.events_seasonality(spark, d).collect()}
    c = got["click"]
    assert (c.n_events, c.peak_hour) == (3, 9)
    assert c.peak_share == pytest.approx(0.666666)
    assert c.weekend_share == pytest.approx(0.333333)
    assert c.night_share == pytest.approx(0.333333)
    v = got["view"]
    assert (v.n_events, v.peak_hour, v.weekend_share) == (1, 12, 1.0)


def test_graph_modularity_two_cliques(spark, tmp_path):
    """Two disjoint 3-cliques: each community holds half the edges and half
    the degree mass → Q = 2 · (1/2 − 1/4²·4) = 0.5 exactly."""
    import os

    import pandas as pd

    rows = [(1, p) for p in (10, 11, 12)] + [(2, p) for p in (20, 21, 22)]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "lineitem.parquet"))

    out = {r.community: r for r in analytics.graph_modularity(spark, d).collect()}
    assert set(out) == {10, 20}
    for c in (10, 20):
        assert out[c].community_size == 3
        assert out[c].internal_edges == 3
        assert out[c].degree_sum == 6
        assert out[c].contribution == 0.25  # 3/6 − (6/12)²
        assert out[c].modularity == 0.5


def test_graph_clustering_planted(spark, tmp_path):
    """A 3-clique with a pendant node: the two pure-clique corners have
    lcc = 1, the corner carrying the pendant 1/3; transitivity = 3T/wedges
    = 3/5; degree-1 pendant excluded."""
    import os

    import pandas as pd

    rows = [(1, p) for p in (10, 11, 12)] + [(2, 10), (2, 13)]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "lineitem.parquet"))

    out = analytics.graph_clustering(spark, d).collect()
    assert [r.node for r in out] == [11, 12, 10]  # lcc desc, tri desc, node
    by = {r.node: r for r in out}
    assert by[11].lcc == 1.0 and by[12].lcc == 1.0
    assert by[10].lcc == 0.333333 and by[10].degree == 3
    assert all(r.transitivity == 0.6 for r in out)
    assert all(r.n_triangles == 1 for r in out)


def test_events_srm_planted(spark, tmp_path):
    """Sequential users replay the exact χ² against the python reference;
    a user population planted entirely into one hash bucket flags SRM."""
    import math
    import os
    from datetime import datetime

    import pandas as pd

    def bucket(uid):
        return (uid * 2654435761) % 2147483648 % 12

    def write(users, path):
        rows = [
            (i + 1, datetime(2024, 1, 1), u, "click", 1.0)
            for i, u in enumerate(users)
        ]
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
        pdf["props"] = ""
        d = str(path)
        os.makedirs(d)
        pdf.to_parquet(os.path.join(d, "events.parquet"))
        return d

    users = list(range(1, 601))
    d = write(users, tmp_path / "healthy")
    out = analytics.events_srm(spark, d).collect()
    counts = {}
    for u in users:
        counts[bucket(u)] = counts.get(bucket(u), 0) + 1
    exp = len(users) / 12.0
    chi2 = sum((counts.get(b, 0) - exp) ** 2 / exp for b in range(12))
    got = {r.bucket: r for r in out}
    # full 0..11 domain (ADVICE r8): unoccupied buckets surface as 0 rows
    assert {b: r.n_users for b, r in got.items()} == {b: counts.get(b, 0) for b in range(12)}
    assert all(r.chi2_total == math.floor(chi2 * 1e6) / 1e6 for r in out)
    expected_verdict = "srm_detected" if chi2 > 24.725 else "healthy"
    assert all(r.verdict == expected_verdict for r in out)

    # plant 48 users that all hash into bucket 0 → massive χ², SRM flagged
    planted = [u for u in range(1, 20000) if bucket(u) == 0][:48]
    assert len(planted) == 48
    d2 = write(planted, tmp_path / "broken")
    out2 = analytics.events_srm(spark, d2).collect()
    # unconditional χ²: the 11 EMPTY buckets each contribute T² = 48², so
    # the exact total is 48²·(11² + 11)/(12·48) = 528 — pre-ADVICE-r8 the
    # aggregate dropped them and only bucket 0's contribution survived
    assert len(out2) == 12
    by_bucket = {r.bucket: r for r in out2}
    assert by_bucket[0].n_users == 48
    assert all(by_bucket[b].n_users == 0 for b in range(1, 12))
    assert all(r.chi2_total == 528.0 for r in out2)
    assert all(r.verdict == "srm_detected" for r in out2)


def test_events_power_hand_computed(spark, tmp_path):
    """Planted conversion counts replay the closed-form MDE and needed-n;
    a large planted delta reads 'powered'."""
    import math
    import os
    from datetime import datetime

    import pandas as pd

    rows, eid = [], 0
    # 20 even users (variant 0): 2 convert; 20 odd (variant 1): 12 convert
    for uid in range(1, 41):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1), uid, "view", 1.0))
        converts = (uid % 2 == 0 and uid <= 4) or (uid % 2 == 1 and uid <= 24)
        if converts:
            eid += 1
            rows.append((eid, datetime(2024, 1, 2), uid, "purchase", 150.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    r = analytics.events_power(spark, d).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (20, 2, 20, 12)
    pool = 14 / 40
    delta = 12 / 20 - 2 / 20
    zsum = 1.959963984540054 + 0.8416212335729143
    mde = zsum * math.sqrt(pool * (1 - pool) * (1 / 20 + 1 / 20))
    assert r.observed_delta == math.floor(delta * 1e6) / 1e6
    assert r.mde_abs == math.floor(mde * 1e6) / 1e6
    assert r.needed_n_per_arm == math.ceil(zsum**2 * 2 * pool * (1 - pool) / delta**2)
    assert r.verdict == "powered" and abs(delta) >= mde


def test_events_anomaly_daily_spike(spark, tmp_path):
    """Eight weeks of weekday-patterned volume with one planted spike: only
    the spiked day flags, and every z replays the weekday-scoped formula.
    (Eight weeks because the day sits inside its own weekday baseline, so
    one outlier among k samples is bounded at |z| ≤ √(k−1) — with four
    weeks the |z| > 2 gate is unreachable by construction.)"""
    import math
    import os
    from datetime import datetime, timedelta

    import pandas as pd

    base = datetime(2024, 1, 1)
    counts = {}
    rows, eid = [], 0
    for d_off in range(56):
        day = base + timedelta(days=d_off)
        n = 20 + (d_off % 7) * 3 + (d_off // 7)  # weekday level + weekly creep
        if d_off == 16:
            n += 300  # planted spike
        counts[day] = n
        for i in range(n):
            eid += 1
            rows.append((eid, day + timedelta(minutes=i), 1 + (i % 5), "click", 1.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    out = {r.day: r for r in analytics.events_anomaly_daily(spark, d).collect()}
    assert len(out) == 56
    spiked = base + timedelta(days=16)
    assert out[spiked].verdict == "anomalous"
    assert sum(1 for r in out.values() if r.verdict == "anomalous") == 1

    by_dow = {}
    for day, n in counts.items():
        by_dow.setdefault((day - datetime(1970, 1, 1)).days % 7, []).append(n)
    for day, r in out.items():
        ns = by_dow[(day - datetime(1970, 1, 1)).days % 7]
        mean = sum(ns) / len(ns)
        sd = math.sqrt(max(sum(x * x for x in ns) / len(ns) - mean * mean, 0.0))
        z = (counts[day] - mean) / sd
        assert r.z == math.floor(z * 1e6) / 1e6


def test_events_markov_stationary_biased_chain(spark, tmp_path):
    """a→a 3×/a→b 1×, b→a always ⇒ P rows (.75,.25)/(1,0); six synchronous
    iterations from uniform replay exactly and rank a first."""
    import math
    import os
    from datetime import datetime, timedelta

    import pandas as pd

    # one user walks: pattern with exact transition counts a→a 9, a→b 3, b→a 3
    seq = ("a a a a b " * 3).split()  # transitions: a→a 9, a→b 3, b→a 2 (+1 via wrap row)
    seq = seq + ["a"]  # close the last b→a
    rows = [
        (i + 1, datetime(2024, 1, 1) + timedelta(hours=i), 1, t, 1.0)
        for i, t in enumerate(seq)
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    out = {r.event_type: r for r in analytics.events_markov_stationary(spark, d).collect()}

    # python replay of exactly 6 synchronous iterations
    trans = {}
    for pv, nx in zip(seq, seq[1:]):
        trans[(pv, nx)] = trans.get((pv, nx), 0) + 1
    types = sorted({pv for pv, _ in trans})
    totals = {t: sum(n for (pv, _), n in trans.items() if pv == t) for t in types}
    p = {(pv, nx): n / totals[pv] for (pv, nx), n in trans.items()}
    pi = {t: 1.0 / len(types) for t in types}
    for _ in range(6):
        nxt = {}
        for t in types:
            terms = sorted((pv, pi[pv] * p[(pv, t)]) for pv in types if (pv, t) in p)
            acc = 0.0
            for _, term in terms:
                acc += term
            nxt[t] = acc
        pi = nxt
    for t in types:
        assert out[t].stationary_p == math.floor(pi[t] * 1e6) / 1e6
    assert out["a"].rank == 1 and out["b"].rank == 2


def test_embed_index_stats_contract(spark, tmp_path):
    """Cell counts sum to the corpus, shares/imbalance are consistent, and
    empty-cell accounting matches the row count."""
    import numpy as np
    import os

    rng = np.random.default_rng(3)
    rows = [
        (vid, [float(x) for x in rng.normal(size=64).astype(np.float32)], int(vid % 10))
        for vid in range(200)
    ]
    d = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    from timedb_spark.operators import similarity as sim

    out = sim.embed_index_stats(spark, d).collect()
    assert sum(r.n_vecs for r in out) == 200
    assert all(r.n_empty_cells == 16 - len(out) for r in out)
    assert abs(sum(r.share for r in out) - 1.0) < 1e-4
    max_n = max(r.n_vecs for r in out)
    import math
    expect_imb = math.floor(max_n / (200 / 16.0) * 1e6) / 1e6
    assert all(r.imbalance == expect_imb for r in out)
    assert all(r.min_cos <= r.max_cos for r in out)


def test_graph_assortativity_star_and_regular(spark, tmp_path):
    """A perfect star is maximally disassortative (r = −1); a
    degree-regular graph has zero degree variance → r NULL, verdict NULL."""
    import os

    import pandas as pd

    rows = [(i, p) for i, (a, b) in enumerate([(1, 10), (1, 11), (1, 12), (1, 13)]) for p in (a, b)]
    # one order per edge: orders 0..3 each hold {hub 1, leaf}
    pdf = pd.DataFrame(
        [(i, a) for i, (a, b) in enumerate([(1, 10), (1, 11), (1, 12), (1, 13)])]
        + [(i, b) for i, (a, b) in enumerate([(1, 10), (1, 11), (1, 12), (1, 13)])],
        columns=["l_orderkey", "l_partkey"],
    )
    d = str(tmp_path / "star")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "lineitem.parquet"))
    r = analytics.graph_assortativity(spark, d).collect()[0]
    assert r.n_edges == 4 and r.assortativity == -1.0 and r.verdict == "disassortative"

    # 3-clique: every degree 2 → zero variance → NULL
    pdf2 = pd.DataFrame([(1, 10), (1, 11), (1, 12)], columns=["l_orderkey", "l_partkey"])
    d2 = str(tmp_path / "clique")
    os.makedirs(d2)
    pdf2.to_parquet(os.path.join(d2, "lineitem.parquet"))
    r2 = analytics.graph_assortativity(spark, d2).collect()[0]
    assert r2.n_edges == 3 and r2.assortativity is None and r2.verdict is None


def test_events_ltv_hand_cohorts(spark, tmp_path):
    """Two cohorts with planted purchases: cumulative per-user LTV replays
    the hand math, including a user who churns (divides the cohort
    average without contributing later revenue)."""
    import os
    from datetime import datetime, timedelta

    import pandas as pd

    wk = timedelta(days=7)
    w0 = datetime(2024, 1, 1)  # a Monday — week-truncation-stable
    rows, eid = [], 0

    def ev(uid, when, etype, value):
        nonlocal eid
        eid += 1
        rows.append((eid, when, uid, etype, value))

    # cohort w0: users 1, 2. user 1 buys 10 in wk0 and 20 in wk1;
    # user 2 buys 30 in wk0 then churns.
    ev(1, w0, "purchase", 10.0)
    ev(1, w0 + wk, "purchase", 20.0)
    ev(2, w0 + timedelta(days=1), "purchase", 30.0)
    # cohort w0+2wk: user 3 buys 40 two weeks later (offset 2)
    ev(3, w0 + 2 * wk, "view", 0.0)
    ev(3, w0 + 4 * wk, "purchase", 40.0)
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    out = {(r.cohort_wk, r.week_offset): r for r in analytics.events_ltv(spark, d).collect()}
    c0 = w0
    assert out[(c0, 0)].n_users == 2 and out[(c0, 0)].revenue == 40.0
    assert out[(c0, 0)].cum_ltv == 20.0          # (10+30)/2
    assert out[(c0, 1)].revenue == 20.0
    assert out[(c0, 1)].cum_ltv == 30.0          # (40+20)/2 — churned user drags
    c1 = w0 + 2 * wk
    assert out[(c1, 2)].n_users == 1 and out[(c1, 2)].cum_ltv == 40.0


def test_events_dau_hand_board(spark, tmp_path):
    """Three users across four days: new/returning splits, the trailing
    7-day WAU union, and stickiness all replay the hand computation."""
    import math
    import os
    from datetime import datetime, timedelta

    import pandas as pd

    d0 = datetime(2024, 1, 1)
    day = timedelta(days=1)
    acts = [(1, 0), (2, 0), (1, 1), (3, 1), (1, 3), (2, 3)]
    rows = [
        (i + 1, d0 + off * day + timedelta(hours=2), uid, "click", 1.0)
        for i, (uid, off) in enumerate(acts)
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = ""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "events.parquet"))

    out = {r.day: r for r in analytics.events_dau(spark, d).collect()}
    assert set(out) == {d0, d0 + day, d0 + 3 * day}
    assert (out[d0].dau, out[d0].new_users, out[d0].returning_users) == (2, 2, 0)
    assert (out[d0 + day].dau, out[d0 + day].new_users) == (2, 1)  # user 3 new
    assert (out[d0 + 3 * day].dau, out[d0 + 3 * day].new_users) == (2, 0)
    # WAU: all activity within 7 days of each active day
    assert out[d0].wau == 2
    assert out[d0 + day].wau == 3
    assert out[d0 + 3 * day].wau == 3
    assert out[d0 + 3 * day].stickiness == math.floor(2 / 3 * 1e6) / 1e6
