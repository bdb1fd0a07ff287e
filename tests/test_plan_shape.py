"""Plan-shape tests (SURVEY §6): the scale properties — pushdown, pruning,
broadcasts, bounded shuffles — asserted on the real optimized plans."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from timedb_spark import plans
from timedb_spark.client import TimeDB
from timedb_spark.io.tables import load_table
from timedb_spark.operators import analytics


def test_tpch_q3_broadcasts_customer(spark, sf_dir):
    df = analytics.tpch_q3(spark, sf_dir)
    plans.assert_broadcast_joins(df, 1)
    plans.assert_no_cartesian(df)


def test_tpch_q5_broadcasts_dims(spark, sf_dir):
    df = analytics.tpch_q5(spark, sf_dir)
    plans.assert_broadcast_joins(df, 2)  # region+nation (+supplier) stay broadcast
    plans.assert_no_cartesian(df)


def test_tpch_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = analytics.tpch_q1(spark, sf_dir)
    plans.assert_pushed_filter(df, "l_shipdate")
    # q1 needs 7 lineitem cols; the scan must not read all 16
    plans.assert_column_pruned(df, {"l_returnflag": 8})
    plans.assert_max_shuffles(df, 1)  # one partial-agg shuffle, nothing else


def test_events_window_single_shuffle(spark, sf_dir):
    df = analytics.events_window(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)


def test_store_read_pushes_partition_and_data_filters(spark, tmp_path):
    db = TimeDB(spark, str(tmp_path / "t"))
    db.create()
    UTC = timezone.utc
    rows = pd.DataFrame(
        [
            {
                "series_id": s,
                "valid_time": datetime(2024, m, 5, tzinfo=UTC),
                "value": float(s * m),
            }
            for s in (1, 2)
            for m in (1, 2, 3)
        ]
    )
    db.write(rows, retention="short")
    out = db.read(
        series_ids=[1],
        retention="short",
        start_valid=datetime(2024, 2, 1, tzinfo=UTC),
        end_valid=datetime(2024, 3, 1, tzinfo=UTC),
    )
    # directory-level: retention + vt_month are partition filters;
    # row-group-level: series_id + valid_time reach PushedFilters.
    part = " ".join(plans.partition_filters(out))
    assert "retention" in part and "vt_month" in part
    plans.assert_pushed_filter(out, "series_id", "valid_time")
    db.delete()


def test_bt_read_latest_no_window_sort(spark, sf_dir):
    """The latest collapse must be a partial-aggregable max_by (SortAggregate/
    HashAggregate), never a row_number window sort."""
    df = entry.queries()["bt_read_latest"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Window" not in plan, "latest uses a window sort — should be max_by aggregation"


def test_dedup_minhash_no_cartesian(spark, sf_dir):
    df = entry.queries()["dedup_minhash"](spark, sf_dir)
    plans.assert_no_cartesian(df)


def test_ann_bruteforce_broadcasts_queries(spark, sf_dir):
    df = entry.queries()["ann_bruteforce"](spark, sf_dir)
    # query-vector side must be broadcast: nested-loop join is fine but it
    # must be a Broadcast NLJ, not a cartesian shuffle.
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    plans.assert_no_cartesian(df)


def test_asof_join_bounded_shuffles(spark, sf_dir):
    df = entry.queries()["asof_join"](spark, sf_dir)
    plans.assert_no_cartesian(df)
    assert plans.num_shuffles(df) <= 3  # union-side exchange + window partition


def test_tpch_q14_q19_broadcast_part_and_pushdown(spark, sf_dir):
    df14 = analytics.tpch_q14(spark, sf_dir)
    plans.assert_broadcast_joins(df14, 1)
    plans.assert_pushed_filter(df14, "l_shipdate")
    plans.assert_max_shuffles(df14, 1)  # broadcast join + single scalar agg
    df19 = analytics.tpch_q19(spark, sf_dir)
    plans.assert_broadcast_joins(df19, 1)
    # the OR-of-ANDs quantity bounds must reach the lineitem scan
    plans.assert_pushed_filter(df19, "l_quantity")
    plans.assert_no_cartesian(df19)


def test_tpch_q22_recent_order_filter_pushed(spark, sf_dir):
    df = analytics.tpch_q22(spark, sf_dir)
    plans.assert_pushed_filter(df, "o_orderdate")
    plans.assert_broadcast_joins(df, 2)  # seg_avg broadcast + broadcast anti join
    plans.assert_no_cartesian(df)


def test_snapshot_knowledge_filter_in_plan(spark, sf_dir):
    # the kt <= T cutoff must sit under the aggregate, not above it
    q = entry.queries()["bt_snapshot"]
    df = q(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    agg_pos = plan.find("Aggregate")
    filt_pos = plan.find("knowledge_time")
    assert agg_pos != -1 and filt_pos != -1 and filt_pos > agg_pos


def test_ohlc_single_shuffle_partial_agg(spark, sf_dir):
    from timedb_spark.operators import timeseries

    df = timeseries.ohlc_bars(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)
    # partial (map-side) combine before the exchange
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in plan or "partial_min" in plan


def test_tpch_q21_exists_rewrite_shape(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair must compile to aggregations + semi joins,
    never a correlated row-wise self-join explosion."""
    from timedb_spark.operators import tpch_ext

    df = tpch_ext.tpch_q21(spark, sf_dir)
    plans.assert_no_cartesian(df)
    plan = plans.formatted_plan(df)
    assert "LeftSemi" in plan
    plans.assert_broadcast_joins(df, 1)  # supplier⋈nation side broadcasts


def test_tpch_q2_single_pass_no_rescan(spark, sf_dir):
    """The correlated per-part min is a window over the filtered candidates —
    lineitem must be scanned once, dims broadcast."""
    from timedb_spark.operators import tpch_ext

    df = tpch_ext.tpch_q2(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert sum(1 for ln in plan.splitlines() if "lineitem" in ln and "Location" in ln) == 1
    plans.assert_broadcast_joins(df, 2)


def test_tpch_q17_avg_broadcast_back(spark, sf_dir):
    """Per-part average joins back via broadcast — no fact-fact shuffle join."""
    from timedb_spark.operators import tpch_ext

    df = tpch_ext.tpch_q17(spark, sf_dir)
    plans.assert_broadcast_joins(df, 2)
    plans.assert_no_cartesian(df)


def test_text_tfidf_broadcasts_df_and_n(spark, sf_dir):
    from timedb_spark.operators.text import text_tfidf

    df = text_tfidf(spark, sf_dir)
    plans.assert_broadcast_joins(df, 1)  # vocabulary df
    # corpus-size N is a 1-row broadcast nested loop, never a cartesian
    assert plans.count_ops(df, "BroadcastNestedLoopJoin") == 1
    plans.assert_no_cartesian(df)


def test_ts_histogram_broadcast_bounds_two_shuffles(spark, sf_dir):
    from timedb_spark.operators.timeseries import value_histogram

    df = value_histogram(spark, sf_dir)
    plans.assert_broadcast_joins(df, 1)  # per-type min/max broadcast back
    # tiny bounds agg + final (type, bin) agg — nothing else shuffles
    plans.assert_max_shuffles(df, 2)


def test_bt_value_at_pushdown_no_window(spark, sf_dir):
    from datetime import datetime

    from timedb_spark.io.tables import bitemporal_frame
    from timedb_spark.operators import bitemporal as bt

    df = bt.value_at(
        bitemporal_frame(spark, sf_dir), datetime(2024, 1, 15, 12), datetime(2024, 1, 20)
    )
    s = plans.formatted_plan(df)
    assert "Window" not in s  # pure max_by aggregation, no window sort
    plans.assert_max_shuffles(df, 1)
    plans.assert_pushed_filter(df, "ts")  # valid/knowledge cutoffs reach the scan


def test_events_cohort_dedup_before_distinct_count(spark, sf_dir):
    from timedb_spark.operators.timeseries import retention_cohort

    df = retention_cohort(spark, sf_dir)
    s = plans.formatted_plan(df)
    assert "Expand" not in s  # no count(distinct) expand — pre-deduped frame
    plans.assert_no_cartesian(df)


def test_calendar_features_one_window_two_shuffles(spark, sf_dir):
    # hourly partial-agg shuffle + the per-series window repartition; all
    # three RANGE lag frames must ride ONE Window operator (one sort)
    from timedb_spark.operators import forecasting as fc

    df = fc.calendar_features(spark, sf_dir)
    plans.assert_max_shuffles(df, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # three RANGE frame definitions, all inside a single Window exec node
    assert plan.count("windowspecdefinition") == 3
    assert plan.count("+- Window") == 1


def test_forecast_vintage_partial_agg(spark, sf_dir):
    # every horizon is a conditional max_by inside the SAME aggregation —
    # partial_max_by must appear (map-side combine before the shuffle)
    from timedb_spark.operators import forecasting as fc

    df = fc.forecast_vintage(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan
    plans.assert_no_cartesian(df)


def test_attribution_single_event_shuffle_plus_agg(spark, sf_dir):
    # union + ONE window partitioning on user_id + the report groupBy —
    # never an inequality self-join (no cartesian / BNLJ)
    from timedb_spark.operators import asof

    df = asof.attribution_last_touch(spark, sf_dir)
    plans.assert_no_cartesian(df)
    plans.assert_max_shuffles(df, 2)


def test_ann_pq_broadcasts_codebook_and_distance_table(spark, sf_dir):
    from timedb_spark.operators import similarity as sim

    df = sim.ann_pq(spark, sf_dir)
    plans.assert_broadcast_joins(df, 3)  # seeds→cb0, cb, qdist (+qv rescore)
    plans.assert_no_cartesian(df)


def test_text_pii_no_shuffle(spark, sf_dir):
    from timedb_spark.operators import text as tx

    df = tx.text_pii(spark, sf_dir)
    plans.assert_max_shuffles(df, 0)  # pure projection rides the scan


def test_interval_at_pushes_both_bounds(spark, sf_dir):
    from datetime import datetime as _dt

    from timedb_spark.io.tables import interval_frame
    from timedb_spark.operators import bitemporal as bt

    df = bt.interval_at(interval_frame(spark, sf_dir), _dt(2024, 1, 15, 12, 30))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan  # one map-side-combinable argmax, no window
    assert "Window" not in plan


def test_ts_corr_bounded_join_no_window(spark, sf_dir):
    """Pairwise correlation must self-join only the BOUNDED hourly aggregate
    (broadcast — never a fact-fact shuffle join), compute co-moments as
    aggregations (no window sort), and stay within 3 shuffles total:
    hourly collapse, pair grouping, final assembly."""
    from timedb_spark.operators import timeseries

    df = timeseries.corr_matrix(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Window" not in plan, "corr uses a window sort — should be pure aggregation"
    plans.assert_no_cartesian(df)
    plans.assert_broadcast_joins(df, 1)  # the bounded hourly side broadcasts
    plans.assert_max_shuffles(df, 3)


def test_ts_decompose_fine_keyed_shuffles_only(spark, sf_dir):
    """Trend/seasonal decomposition: the ±12h trend window and seasonal
    means must ride fine-grained (series, hour)-keyed exchanges — four
    shuffles total, hour-of-day means broadcast back, no cartesian."""
    from timedb_spark.operators import timeseries

    df = timeseries.seasonal_decompose(spark, sf_dir)
    plans.assert_no_cartesian(df)
    plans.assert_broadcast_joins(df, 1)  # tiny (series, hod) seasonal grid
    plans.assert_max_shuffles(df, 4)


def test_snapshot_store_read_keeps_pruning_and_pushdown(spark, tmp_path):
    """The manifest read path (explicit file list + basePath) must preserve
    BOTH directory-level partition pruning (retention, vt_month) and
    row-group predicate pushdown — otherwise the ACID upgrade would be a
    scale regression over the directory store."""
    db = TimeDB(spark, str(tmp_path / "sp"), table_format="snapshot")
    db.create()
    UTC = timezone.utc
    rows = pd.DataFrame(
        [
            {"series_id": s, "valid_time": datetime(2024, m, 5, tzinfo=UTC), "value": float(s * m)}
            for s in (1, 2)
            for m in (1, 2, 3)
        ]
    )
    db.write(rows, retention="short")
    db.write(rows.assign(value=rows.value + 1), retention="long")
    out = db.read(
        series_ids=[1],
        retention="short",
        start_valid=datetime(2024, 2, 1, tzinfo=UTC),
        end_valid=datetime(2024, 3, 1, tzinfo=UTC),
    )
    part = " ".join(plans.partition_filters(out))
    assert "retention" in part and "vt_month" in part
    plans.assert_pushed_filter(out, "series_id", "valid_time")
    assert out.count() == 1
    db.delete()


def test_graph_triangles_orientations_agree_and_no_cartesian(spark, sf_dir):
    """id- and degree-orientation enumerate the SAME triangle set (the flag
    changes wedge generation, never membership), and neither plan contains
    a cartesian product."""
    from timedb_spark.operators import analytics

    by_id = analytics.graph_triangles(spark, sf_dir, orient="id")
    by_deg = analytics.graph_triangles(spark, sf_dir, orient="degree")
    by_auto = analytics.graph_triangles(spark, sf_dir)  # default: auto-select
    plans.assert_no_cartesian(by_id)
    plans.assert_no_cartesian(by_deg)
    plans.assert_no_cartesian(by_auto)
    assert (
        [(r.node, r.n_triangles) for r in by_id.collect()]
        == [(r.node, r.n_triangles) for r in by_deg.collect()]
        == [(r.node, r.n_triangles) for r in by_auto.collect()]
    )


def test_graph_triangles_orientation_auto_switch():
    """The auto-selector flips to degree orientation exactly when a hub's
    potential wedge volume (max_deg²) dominates the edge list: a star /
    power-law graph picks 'degree', a uniform graph keeps zero-prep 'id'."""
    from timedb_spark.operators.analytics import select_orientation

    # 10k-edge uniform graph, max degree 20: 400 << 16*10000 -> id
    assert select_orientation(20, 10_000) == "id"
    # same edge count with a 10k-degree hub (star): 1e8 > 1.6e5 -> degree
    assert select_orientation(10_000, 10_000) == "degree"
    # boundary: max_deg² == hub_factor*m stays on the cheap path
    assert select_orientation(400, 10_000) == "id"
    assert select_orientation(401, 10_000) == "degree"
    assert select_orientation(0, 0) == "id"  # empty graph


def test_graph_shj_partition_formula_and_fallback_plan(spark, sf_dir):
    """The 100 TB wedge plan (r13): the shuffled fallback must join via
    SHUFFLED HASH (SMJ's sorter collapsed then OOM'd on the ~1B-row wedge
    stream at 20x; SCALEPROBE_r12_x20 diagnosis), and its partition count
    must grow with the MEASURED edge count — SHJ builds cannot spill, so a
    fixed partition count OOMs the hash build at some scale (the first SHJ
    cut did, at 20x)."""
    from timedb_spark.operators import analytics
    from timedb_spark.operators.analytics import _SHJ_EDGES_PER_PART, _shj_parts

    # formula pin: conf floor below the knee, linear growth past it
    assert _shj_parts(32, 0) == 32
    assert _shj_parts(32, 1_196_000) == 32          # sf0.1 co-purchase graph
    assert _shj_parts(32, 32 * _SHJ_EDGES_PER_PART) == 32
    assert _shj_parts(32, 32 * _SHJ_EDGES_PER_PART + 1) == 33
    assert _shj_parts(32, 24_000_000) == 320        # the 20x probe graph
    assert _shj_parts(32, 10_000_000_000) == 133_334  # a 100 TB-ish graph
    # plan pin: forced-degree (broadcast off) wedge+closing joins are SHJ,
    # and the wedge stream is never sorted into a join
    df = analytics.graph_triangles(spark, sf_dir, orient="degree")
    s = df._jdf.queryExecution().executedPlan().toString()
    assert s.count("ShuffledHashJoin") >= 2
    assert "SortMergeJoin [v#" not in s and "SortMergeJoin [src#" not in s


def test_profile_table_approx_plans_no_expand(spark, sf_dir):
    """NEITHER profile mode may plan an Expand node: N exact
    multi-distincts in one agg multiply every input row ~(3N+2)x into the
    shuffle — the 100 TB scale-killer. The approx path uses map-side
    combinable HLL sketches; the exact path (r13) computes each column's
    distinct count + min/max from a per-column distinct() HASH aggregate
    instead of one multi-distinct agg (which also dragged the whole
    Expand-widened stream through a SortAggregate via the string min/max
    buffers — measured 8.1 s -> 1.1 s at sf0.1)."""
    from timedb_spark.operators.pipeline import profile_table

    approx = profile_table(spark, sf_dir)
    assert plans.count_ops(approx, "Expand") == 0
    exact = profile_table(spark, sf_dir, exact=True)
    assert plans.count_ops(exact, "Expand") == 0
    # the exact path's full-table passes must all be hash aggregates: the
    # only sort-based aggregate allowed is the final 1-row collapse of a
    # per-column distinct frame (its input is the distinct set, not the
    # table). A SortAggregate consuming the base-table scan directly
    # would re-open the r13 finding (8-12 s at sf0.1).
    plans.assert_no_sort_aggregate_over_raw_scan(exact)
    plans.assert_no_sort_aggregate_over_raw_scan(approx)
    # negative control (the r11 lesson — the detector must demonstrably
    # engage): the OLD exact formulation, a single agg mixing string
    # min/max with multi-distinct counts, plans SortAggregate straight
    # over the (Expand-widened) scan and must trip the new audit.
    from timedb_spark.io.tables import load_table
    from timedb_spark.operators.pipeline import PROFILE_COLS

    li = load_table(spark, sf_dir, "lineitem")
    old_exact = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            a
            for c in PROFILE_COLS
            for a in (
                F.count_distinct(F.col(c)).alias(f"{c}__nd"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            )
        ],
    )
    with pytest.raises(AssertionError, match="raw file scan"):
        plans.assert_no_sort_aggregate_over_raw_scan(old_exact)


def test_profile_table_approx_within_hll_error(spark, sf_dir):
    """approx mode agrees with exact mode: identical n_rows/nulls/min/max,
    distinct counts within 3*rsd (rsd=0.02 -> 6%) relative error."""
    from timedb_spark.operators.pipeline import profile_table

    ex = {r.column: r for r in profile_table(spark, sf_dir, exact=True).collect()}
    ap = {r.column: r for r in profile_table(spark, sf_dir).collect()}
    assert set(ex) == set(ap)
    for c, e in ex.items():
        a = ap[c]
        assert (a.n_rows, a.n_nulls, a.min_value, a.max_value) == (e.n_rows, e.n_nulls, e.min_value, e.max_value)
        assert abs(a.n_distinct - e.n_distinct) <= max(3, 0.06 * e.n_distinct)


def test_events_rfm_broadcast_anchor_bounded_shuffles(spark, sf_dir):
    from timedb_spark.operators import analytics as an

    df = an.events_rfm(spark, sf_dir)
    # the 1-row anchor join is condition-free -> Broadcast NLJ, never a
    # shuffled cartesian
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    plans.assert_no_cartesian(df)
    plans.assert_pushed_filter(df, "event_type")


def test_text_boilerplate_two_shuffles_no_join(spark, sf_dir):
    from timedb_spark.operators import text as tx

    df = tx.text_boilerplate(spark, sf_dir)
    # explode -> window over shingle (1 shuffle) -> groupBy doc_id (1
    # shuffle). The naive double-aggregate+join formulation plans 3+.
    plans.assert_max_shuffles(df, 2)
    plans.assert_no_cartesian(df)


def test_ann_range_broadcast_no_shuffle(spark, sf_dir):
    from timedb_spark.operators import similarity as sim

    df = sim.ann_range(spark, sf_dir)
    # != join condition -> Broadcast NLJ on the tiny query side
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # strictly cheaper than top-k: no per-query window grouping at all
    plans.assert_max_shuffles(df, 0)


def test_embed_pca_projection_stays_jvm(spark, sf_dir):
    from timedb_spark.operators import similarity as sim

    df = sim.embed_pca(spark, sf_dir)
    # the projection itself is pure column expressions riding the scan: no
    # shuffle, no Python eval in the OUTPUT plan (the one mapInPandas pass
    # happens during fit, not in the returned projection).
    plans.assert_max_shuffles(df, 0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_filter_unchanged_plans_without_driver_actions(spark, tmp_path):
    """skip_unchanged's read-back filter must PLAN with zero Spark jobs: the
    month set, valid_time slab bounds, and batch-key pruning all ride
    broadcast (semi-)joins, never collected literals (client.py
    _filter_unchanged docstring). A regression to collect-driven pruning
    would serialize the write path on a driver round-trip per batch —
    catastrophic for a backfill touching millions of series."""
    from datetime import datetime

    db = TimeDB(spark, str(tmp_path / "tdb"))
    db.create()
    db.write(
        pd.DataFrame(
            [{"series_id": 1, "valid_time": pd.Timestamp("2024-01-01", tz="UTC"), "value": 1.0}]
        ),
        retention="short",
    )
    rows = [
        (1, datetime(2024, 1, 1), 2.0, datetime(2024, 1, 2), datetime(2024, 1, 2), 7,
         "short", "", "", datetime(2260, 1, 1)),
        (1, datetime(2024, 1, 1, 1), 1.0, datetime(2024, 1, 2), datetime(2024, 1, 2), 7,
         "short", "", "", datetime(2260, 1, 1)),
    ]
    cols = ["series_id", "valid_time", "value", "knowledge_time", "change_time",
            "run_id", "retention", "changed_by", "annotation", "valid_time_end"]
    stamped = spark.createDataFrame(rows, cols)

    sc = spark.sparkContext
    sc.setJobGroup("zero_action_probe", "plan-only")
    try:
        out = db._filter_unchanged(stamped, scope="valid_time")
        _ = out.schema  # force full analysis/resolution, still no action
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("zero_action_probe")) == []
    # and the plan is the right one when it DOES run: changed value kept,
    # new key kept (2 rows), identical rewrite dropped by other tests
    assert out.count() == 2
    db.delete()


def test_ann_hybrid_broadcast_single_window_shuffle(spark, sf_dir):
    from timedb_spark.operators import similarity as sim

    df = sim.ann_hybrid(spark, sf_dir)
    plan = plans.formatted_plan(df)
    # tiny query side broadcasts; the lexical leg rides the same projection
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    plans.assert_no_cartesian(df)
    # doc-embedding key join + the per-query top-k window; the fusion must
    # not add a shuffle beyond ann_bruteforce's shape
    plans.assert_max_shuffles(df, 2)


def test_embed_quantize_no_shuffle_stays_jvm(spark, sf_dir):
    from timedb_spark.operators import similarity as sim

    df = sim.embed_quantize(spark, sf_dir)
    plans.assert_max_shuffles(df, 0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_text_readability_no_shuffle_stays_jvm(spark, sf_dir):
    """Readability is a pure scan projection: zero exchanges, no Python
    (regexp_count compiles into codegen), and only the 2 needed columns
    read off the 5-column documents scan."""
    from timedb_spark.operators import text

    df = text.text_readability(spark, sf_dir)
    plans.assert_max_shuffles(df, 0)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    plans.assert_column_pruned(df, {"text": 2})


def test_graph_link_predict_broadcasts_no_cartesian(spark, sf_dir):
    """The RA wedge self-join must stay an equi-join (never a cartesian)
    with the degree table and the second wedge leg broadcast on this
    dimension-sized graph."""
    df = analytics.graph_link_predict(spark, sf_dir)
    plans.assert_no_cartesian(df)
    plans.assert_broadcast_joins(df, 2)


def test_ts_kalman_single_window_shuffle(spark, sf_dir):
    """The Kalman fold rides the one (user_id) window sort — same profile
    as ts_holt: one exchange, zero Python."""
    from timedb_spark.operators import timeseries as ts

    df = ts.kalman_filter(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_ts_croston_and_sax_single_shuffle(spark, sf_dir):
    """Both per-user fold operators shuffle once (the groupBy collect) and
    keep every fold/lambda JVM-side."""
    from timedb_spark.operators import timeseries as ts

    for op in (ts.croston, ts.sax_symbolize):
        df = op(spark, sf_dir)
        plans.assert_max_shuffles(df, 1)
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in phys, op.__name__


def test_events_survival_bounded_post_agg(spark, sf_dir):
    """The KM estimator's global window/collect run on the per-lifetime
    aggregate only: the plan shuffles the events scan once (user span
    groupBy); later exchanges move the days-bounded aggregate."""
    df = analytics.events_survival(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_dedup_spans_no_cartesian_no_python(spark, sf_dir):
    """Span dedup is explode -> hash groupBy -> equi-join back: candidate
    volume is |tokens|, never a cross product, and the interval-union fold
    is a JVM array aggregate."""
    from timedb_spark.operators import dedup

    df = dedup.dedup_spans(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_text_collocations_broadcast_vocab_joins(spark, sf_dir):
    """The unigram sides and the two scalar totals join broadcast — the
    only shuffles are the two count groupBys; the collocation table never
    sorts globally."""
    from timedb_spark.operators import text

    df = text.text_collocations(spark, sf_dir)
    plans.assert_no_cartesian(df)
    plans.assert_broadcast_joins(df, 2)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_text_chunk_zero_shuffle_stays_jvm(spark, sf_dir):
    """Chunking is a pure per-row explode projection: zero exchanges, no
    Python, and only the 2 needed columns read."""
    from timedb_spark.operators import text

    df = text.text_chunk(spark, sf_dir)
    plans.assert_max_shuffles(df, 0)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    plans.assert_column_pruned(df, {"text": 2})


def test_sample_weighted_takeordered_no_global_sort(spark, sf_dir):
    """A-ES top-k must compile to TakeOrderedAndProject (per-partition
    heaps + driver merge of k rows), not a full Sort+Exchange."""
    from timedb_spark.operators import sampling

    df = sampling.sample_weighted(spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    plans.assert_max_shuffles(df, 0)
    assert "Python" not in phys


def test_ts_cusum_single_shuffle_stays_jvm(spark, sf_dir):
    """The CUSUM fold rides the one groupBy(user) collect — same profile as
    croston/theta: one exchange, zero Python."""
    from timedb_spark.operators import timeseries as ts

    df = ts.cusum(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_graph_label_prop_no_cartesian_bounded_joins(spark, sf_dir):
    """Each propagation round is an equi-join + hash agg + per-node window
    over the degree-bounded label histogram — no cartesian anywhere in the
    4-round chained plan, zero Python."""
    df = analytics.graph_label_prop(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_ts_mk_trend_single_shuffle_stays_jvm(spark, sf_dir):
    """The O(n²) pair enumeration runs as nested array lambdas inside the
    one groupBy(user) collect — croston's single-shuffle profile, zero
    Python."""
    from timedb_spark.operators import timeseries as ts

    df = ts.mk_trend(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_dedup_containment_blocked_join_no_cartesian(spark, sf_dir):
    """Containment reuses the shared-shingle blocking equi-join — no
    cartesian, no Python, both directions from one intersection plan."""
    from timedb_spark.operators import dedup

    df = dedup.dedup_containment(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_ts_periodogram_no_engine_trig_single_series_shuffle(spark, sf_dir):
    """The spectral folds are pure +/× rotation chains over the collected
    grid — the executed plan contains no COS/SIN call (cross-engine ulp
    drift is designed out via literal constants) and no Python."""
    from timedb_spark.operators import timeseries as ts

    df = ts.periodogram(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    assert "COS" not in phys and "SIN" not in phys


def test_ann_mmr_single_fold_no_python(spark, sf_dir):
    """The K-step greedy selection is one aggregate over the candidate
    array on top of ann_bruteforce's broadcast+window plan — no extra
    shuffles beyond the window + per-query collect, no cartesian, no
    Python, and the fold lambda appears once (no per-step plan blowup)."""
    from timedb_spark.operators import similarity as sim

    df = sim.ann_mmr(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    # the query side broadcasts through the != join (nested-loop w/
    # broadcast build, same as ann_bruteforce — not a BroadcastHashJoin)
    assert "BroadcastNestedLoopJoin BuildRight" in phys
    assert "Python" not in phys


def test_ts_hampel_single_window_pass_stays_jvm(spark, sf_dir):
    """The Hampel repair is ONE exchange on user_id feeding a single
    ROWS-framed window sort; both medians (window, MAD) are sorted-array
    picks in plain projections AFTER the window — no second window pass,
    no join, zero Python."""
    from timedb_spark.operators import timeseries as ts

    df = ts.hampel(spark, sf_dir)
    plans.assert_no_cartesian(df)
    plans.assert_max_shuffles(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    assert phys.count("Window") == 1 and "Join" not in phys


def test_embed_outliers_broadcast_centroids_no_fanout(spark, sf_dir):
    """Centroids collapse to a single broadcast row of (label, centroid)
    structs, so scoring is a zero-fan-out projection over one scan — the
    plan has no cartesian, no window, and the vectors shuffle only in the
    posexplode centroid agg."""
    from timedb_spark.operators import similarity as sim

    df = sim.embed_outliers(spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    assert "Window" not in phys
    assert "BroadcastNestedLoopJoin" in phys  # the 1-row candidate list
    assert "CartesianProduct" not in phys


def test_events_lift_copartitioned_join_broadcast_dims(spark, sf_dir):
    """The pair generator is an equi-join on user_id over the pre-deduped
    basket frame (no cartesian); per-type counts and the basket total come
    back as broadcasts — only the basket self-join + support agg shuffle."""
    from timedb_spark.operators import analytics as an

    df = an.events_lift(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    assert "BroadcastHashJoin" in phys or "BroadcastNestedLoopJoin" in phys


def test_ts_perm_entropy_single_shuffle_stays_jvm(spark, sf_dir):
    """Pattern extraction, counting, and the entropy fold are all array
    expressions over the one groupBy(user) collect — single exchange, no
    explode, zero Python, and no engine log-constant (ln(3!) is a
    literal)."""
    from timedb_spark.operators import timeseries as ts

    df = ts.permutation_entropy(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys and "Generate" not in phys


def test_ts_anomaly_resid_composed_no_python(spark, sf_dir):
    """The anomaly gate composes the decompose pipeline (two fine-keyed
    shuffles) with one per-series stats collect joined back — no
    cartesian, zero Python, and both median picks live in projections."""
    from timedb_spark.operators import timeseries as ts

    df = ts.anomaly_residual(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_ts_backtest_single_shuffle_stays_jvm(spark, sf_dir):
    """Splits, all three baseline predictions and the MAE folds ride the
    one groupBy(user) collect — theta's single-exchange profile, zero
    Python, no join."""
    from timedb_spark.operators import timeseries as ts

    df = ts.backtest_models(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys and "Join" not in phys


def test_ts_drawdown_single_shuffle_stays_jvm(spark, sf_dir):
    """The running-peak fold rides the one groupBy(user) collect — single
    exchange, zero Python, no join."""
    from timedb_spark.operators import timeseries as ts

    df = ts.drawdown(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys and "Join" not in phys


def test_text_novelty_no_pairwise_join(spark, sf_dir):
    """Novelty never forms doc pairs: the only join is the shingle-keyed
    frequency join back — no cartesian, zero Python."""
    from timedb_spark.operators import text as tx

    df = tx.text_novelty(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_profile_sources_two_fine_groupbys_no_python(spark, sf_dir):
    """The dashboard is fine-keyed map-side-combined aggs joined on the
    tiny source key — no cartesian, zero Python."""
    from timedb_spark.operators import pipeline

    df = pipeline.profile_sources(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_bt_audit_window_plus_single_agg(spark, sf_dir):
    """One revision-ordering window + one author groupBy — no cartesian,
    zero Python, exactly one Window node."""
    from timedb_spark.operators import forecasting

    df = forecasting.bt_audit(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    assert phys.count("Window") == 1


def test_ann_filtered_broadcast_label_scope(spark, sf_dir):
    """The label pre-filter composes with the broadcast query join into one
    candidate projection — at least one broadcast join, no cartesian, the
    vectors stay JVM-side."""
    from timedb_spark.operators import similarity as sim

    df = sim.ann_filtered(spark, sf_dir)
    plans.assert_no_cartesian(df)
    plans.assert_broadcast_joins(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_ts_macd_single_shuffle_stays_jvm(spark, sf_dir):
    """All three EMA recursions ride the one groupBy(user) sorted collect —
    a single shuffle, zero Python."""
    from timedb_spark.operators import timeseries as ts

    df = ts.macd(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_ts_load_curve_single_shuffle_stays_jvm(spark, sf_dir):
    """The load-duration curve is one sorted collect per series; exceedance
    picks are array projections — a single shuffle, zero Python."""
    from timedb_spark.operators import timeseries as ts

    df = ts.load_curve(spark, sf_dir)
    plans.assert_max_shuffles(df, 1)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_events_dau_no_count_distinct_over_events(spark, sf_dir):
    """Everything derives from the ONE (user, day) distinct frame; the WAU
    range join is calendar-bounded and no expansion over raw events
    appears — no cartesian, zero Python."""
    from timedb_spark.operators import analytics

    df = analytics.events_dau(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_contamination_semantic_broadcast_bench(spark, sf_dir):
    """The benchmark embedding slice broadcasts; the corpus side streams
    through one projection. The scan × bench pairing carries no equi-key,
    so it compiles to a BroadcastNestedLoopJoin (the broadcast is the
    point — the big side never shuffles); zero Python."""
    from timedb_spark.operators import pipeline

    df = pipeline.contamination_semantic(spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in phys
    assert "CartesianProduct" not in phys
    assert "Python" not in phys


def test_events_srm_two_aggs_zero_python(spark, sf_dir):
    """The SRM gate is one user-grain aggregate + one 12-bucket aggregate +
    a 12-row window rollup: two shuffles total, the χ² numerators exact
    BIGINTs (no float Σ — the r8 order-sensitivity fix), zero Python, no
    cartesian."""
    from timedb_spark.operators import analytics

    df = analytics.events_srm(spark, sf_dir)
    plans.assert_no_cartesian(df)
    plans.assert_max_shuffles(df, 3)  # user agg + bucket agg + 12-row window
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_ts_benford_single_scan_broadcast_chi2(spark, sf_dir):
    """Benford is ONE events scan into a 9-group aggregate; the χ² total
    arrives as a broadcast 1-row fold (digit-ordered — the r8 determinism
    fix), so no cartesian product and zero Python appear."""
    from timedb_spark.operators import timeseries as ts

    df = ts.benford(spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    assert "BroadcastNestedLoopJoin" in phys  # the 1-row chi2 fold join


def test_store_compact_zorder_gate_single_scan_post(spark):
    """The compaction gate's post-side is one partition-pruned scan of the
    compacted store into one fingerprint aggregate — no cartesian, zero
    Python, and the pre-side is a local {str,int} relation (class-tested
    in test_oracle_types)."""
    df = entry._q_store_compact_zorder(spark, "/root/testdata/sf0.001")
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys


def test_pit_features_no_cartesian_bounded_shuffles(spark, sf_dir):
    # grid distinct + latest-collapse + one equi-join per lag, all keyed by
    # (series_id, valid_time): no cartesian, no Python, and the exchange
    # count stays bounded (a per-target or per-revision fanout would blow
    # past it). At tiny SF AQE converts the co-partitioned joins to
    # broadcast; at scale they run as co-partitioned SMJ — both shapes fit
    # the same bound.
    from timedb_spark.operators import forecasting as fc

    df = fc.pit_features(spark, sf_dir)
    plans.assert_no_cartesian(df)
    plans.assert_max_shuffles(df, 12)


def test_rollup_pit_backtest_no_cartesian_bounded_shuffles(spark, sf_dir):
    """The backtest is the pit_features shape re-pointed at a rollup state:
    the lag-shifted revision set crosses the wire once through an equi-join
    on (series_id, bucket), then two keyed collapses and the per-day score —
    no cartesian, zero Python, bounded exchanges. The state side here is an
    in-memory _latest_hourly of the same frame (the gate reads the
    materialized parquet state instead — strictly cheaper)."""
    from timedb_spark.io.tables import bitemporal_frame
    from timedb_spark.operators import forecasting as fc
    from timedb_spark.rollup import _latest_hourly

    sv = bitemporal_frame(spark, sf_dir)
    df = fc.rollup_pit_backtest(_latest_hourly(sv), sv)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    plans.assert_max_shuffles(df, 12)


#: Queries whose explode-feeding broadcasts are EXPLICIT ``F.broadcast``
#: calls of sides bounded by contract, not planner guesses: the ANN family
#: broadcasts the sampled QUERY side (its probe/subvector expansions are
#: constant-factor over a fixed small query set — "queries broadcast,
#: corpus never shuffles"), the contamination scans broadcast the
#: FIXED benchmark eval slice, which does not scale with the corpus, and
#: multimodal_audio_hash broadcasts the band-explosion of the
#: DISTINCT-16-bit-hash frame (a post-groupBy side capped at
#: 4 bands x 2^16 = 262,144 rows at ANY corpus size — the r14 rewrite
#: that replaced its doc-level band self-join; the raw doc explode this
#: audit pins no longer exists in that plan).
_EXPLICIT_BOUNDED_BROADCASTS = frozenset({
    "ann_bruteforce", "ann_lsh", "ann_ivf", "ann_pq", "ann_range",
    "ann_hybrid", "ann_filtered", "ann_mmr", "ann_recall",
    "contamination_check", "contamination_semantic",
    "multimodal_audio_hash",
})

#: Store/stream-backed gates materialize whole stores or drain streams in
#: their materialization step — excluded here (their READ plans are
#: aggregate scans; the hostile-session test runs them end-to-end).
_STATEFUL_GATES = frozenset({
    "fast_count", "partition_stats", "snap_time_travel", "snap_vacuum",
    "client_write_validation", "client_null_sentinel",
    "store_compact_zorder", "store_retention_ttl", "store_delete_series",
    "store_landing_ingest", "rollup_continuous_agg",
    "rollup_bitemporal_agg", "rollup_pit_backtest",
    "rollup_retention_refresh", "stream_ingest_once",
    "bt_write_skip_unchanged",
})


def test_registry_never_broadcasts_raw_exploded_sides(spark, sf_dir):
    """The scaleprobe r12 driver-OOM class, pinned across the ENTIRE
    registry at gate SF (non-vacuous: at sf0.01 the PRE-explode size
    estimates are all under the broadcast threshold, so WITHOUT the merge
    hints the static planner broadcasts the exploded-shingle /
    banded-signature / lag-exploded / bucket-exploded sides — this test
    reds on the un-hinted code). The full-registry sweep of this audit
    found and fixed four sites beyond the dedup legs: ts_range_join's
    binned probe side, ts_autocorr's lag expansion, and the two
    perceptual-hash band joins."""
    qs = entry.queries()
    for name, fn in qs.items():
        if name in _EXPLICIT_BOUNDED_BROADCASTS or name in _STATEFUL_GATES:
            continue
        if name.startswith("stream_"):
            continue  # streaming drains; plan audited via their batch twins
        try:
            plans.assert_no_broadcast_over_raw_explode(fn(spark, sf_dir))
        except AssertionError as exc:
            raise AssertionError(f"{name}: {exc}") from None

    # negative control (the r11 lesson: a green assert proves nothing unless
    # the detector demonstrably engages): the same exploded self-join WITHOUT
    # the hint must trip the audit at this SF — i.e. the static planner does
    # choose broadcast here, so the hinted queries above pass by the hint,
    # not by luck.
    from timedb_spark.operators.dedup import _shingled, doc_corpus

    ex = _shingled(doc_corpus(spark, sf_dir)).select(
        "doc_id", F.explode("sh").alias("s")
    )
    unhinted = ex.alias("a").join(
        ex.alias("b"),
        (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    with pytest.raises(AssertionError, match="explode-derived"):
        plans.assert_no_broadcast_over_raw_explode(unhinted)
