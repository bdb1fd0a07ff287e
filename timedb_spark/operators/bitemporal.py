"""Bitemporal read operators — pure DataFrame → DataFrame transforms.

Re-expresses the reference's 3-dimensional read path (timedb/read.py) as
declarative Spark plans. Output shape by flag combination matches
timedb/read.py:3-13:

    latest(df)               -> (series_id, valid_time, value)
    overlapping(df)          -> (series_id, knowledge_time, valid_time, value)
    latest_changes(df)       -> (series_id, valid_time, change_time, value,
                                 changed_by, annotation)
    overlapping_changes(df)  -> (series_id, valid_time, knowledge_time,
                                 change_time, value, changed_by, annotation)

Scale notes (100 TB posture):

- ClickHouse's ``argMax(value, (kt, ct))`` (read.py:240) and ``LIMIT 1 BY``
  (read.py:310) become ``F.max_by(value, F.struct(kt, ct))`` inside a
  ``groupBy`` — a hash aggregate with **map-side partial aggregation**, so
  each executor collapses its own revisions before the single shuffle on the
  group key. A window-function formulation would force a full sort of every
  partition; the aggregate form shuffles only one row per (group, mapper).
- The correction-chain collapse (read.py:264-267 ``lagInFrame``) genuinely
  needs ordering within (series_id[, knowledge_time], valid_time) groups, so
  it uses a ``lag`` window — but partitioned on fine-grained keys, which
  parallelizes across executors and never sorts globally.
- All filter helpers are plain column predicates, applied *before*
  aggregation so Catalyst pushes them into the parquet scan
  (``PushedFilters``) and prunes ``(retention, vt_month)`` partitions.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from datetime import datetime, time as dt_time, timedelta

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timedb_spark.functions.ordering import packed_lex

# ---------------------------------------------------------------------------
# Filters (ref: timedb/read.py:183-224 ``_where``)
# ---------------------------------------------------------------------------


def apply_filters(
    df: DataFrame,
    *,
    series_ids: Sequence[int] | None = None,
    retention: str | Sequence[str] | None = None,
    start_valid: datetime | None = None,
    end_valid: datetime | None = None,
    start_known: datetime | None = None,
    end_known: datetime | None = None,
) -> DataFrame:
    """Conjunction of the reference's WHERE filters.

    Range semantics match read.py:212-223: valid/knowledge ranges are
    half-open ``[start, end)``. All predicates are simple comparisons →
    parquet predicate pushdown + (retention) partition pruning for free.
    """
    conds: list[Column] = []
    if series_ids is not None:
        conds.append(F.col("series_id").isin([int(s) for s in series_ids]))
    if retention is not None:
        tiers = [retention] if isinstance(retention, str) else list(retention)
        conds.append(F.col("retention").isin(tiers))
    if start_valid is not None:
        conds.append(F.col("valid_time") >= F.lit(start_valid))
    if end_valid is not None:
        conds.append(F.col("valid_time") < F.lit(end_valid))
    if start_known is not None:
        conds.append(F.col("knowledge_time") >= F.lit(start_known))
    if end_known is not None:
        conds.append(F.col("knowledge_time") < F.lit(end_known))
    for c in conds:
        df = df.filter(c)
    return df


# ---------------------------------------------------------------------------
# Meta-resolved series sets (ref: timedb/read.py:73-180 PgEngineMeta)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SeriesMeta:
    """Address a series set through a metadata DataFrame instead of an
    explicit id array — the Spark analogue of the reference's ``PgEngineMeta``
    (read.py:73-105). Exactly one addressing field must be set; ``data_type``
    and ``name`` narrow the set (scalar or set-valued, matching
    read.py:108-115's ``=`` / ``IN`` split).

    The reference resolves ids through a PostgreSQL engine table collapsed to
    a scalar CTE so ClickHouse evaluates it once (read.py:118-131). On Spark
    the same one-pass semantics fall out of a **broadcast left-semi join**:
    the metadata frame is catalog-sized, so it broadcasts, and the big fact
    scan is filtered map-side with zero extra shuffles.
    """

    root_path: str | None = None
    paths: tuple[str, ...] | None = None
    node_uuids: tuple[str, ...] | None = None
    edge_uuids: tuple[str, ...] | None = None
    edge_triple: tuple[str, str, str] | None = None
    edge_triples: tuple[tuple[str, str, str], ...] | None = None
    data_type: str | tuple[str, ...] | None = None
    name: str | tuple[str, ...] | None = None


def _scalar_or_set(col: str, value: str | tuple[str, ...]) -> Column:
    # ref read.py:108-115 — ``=`` for scalars, ``IN`` for sets.
    if isinstance(value, str):
        return F.col(col) == value
    return F.col(col).isin(list(value))


def resolve_meta(meta_df: DataFrame, spec: SeriesMeta) -> DataFrame:
    """Filter the metadata frame down to the addressed series rows.

    Addressing semantics mirror read.py:133-169, including the documented
    *cartesian superset* behaviour of set-valued ``edge_triples`` (three
    single-column INs, read.py:152-165).
    """
    if spec.root_path is not None:
        prefix = spec.root_path.rstrip("/") + "/"
        cond = (F.col("path") == spec.root_path) | F.col("path").startswith(prefix)
    elif spec.paths is not None:
        cond = F.col("path").isin(list(spec.paths))
    elif spec.node_uuids is not None:
        cond = F.col("node_uuid").isin(list(spec.node_uuids))
    elif spec.edge_uuids is not None:
        cond = F.col("edge_uuid").isin(list(spec.edge_uuids))
    elif spec.edge_triple is not None:
        f, t, e = spec.edge_triple
        cond = (F.col("from_path") == f) & (F.col("to_path") == t) & (F.col("edge_type") == e)
    elif spec.edge_triples is not None:
        cond = (
            F.col("from_path").isin(sorted({t[0] for t in spec.edge_triples}))
            & F.col("to_path").isin(sorted({t[1] for t in spec.edge_triples}))
            & F.col("edge_type").isin(sorted({t[2] for t in spec.edge_triples}))
        )
    else:
        raise ValueError(
            "SeriesMeta needs one of root_path / paths / node_uuids / edge_uuids / edge_triple / edge_triples."
        )

    if spec.data_type is not None:
        cond = cond & _scalar_or_set("data_type", spec.data_type)
    if spec.name is not None:
        cond = cond & _scalar_or_set("name", spec.name)
    return meta_df.filter(cond)


def filter_by_meta(df: DataFrame, meta_df: DataFrame, spec: SeriesMeta) -> DataFrame:
    """Restrict ``df`` to the meta-resolved series set.

    Matches the reference's ``series_id IN _meta.1 AND retention IN _meta.2``
    (read.py:204-210): ids come from the resolved rows; retentions are the
    *distinct* tiers of those rows (a deliberate superset, like CH's
    ``groupUniqArray(retention)``). Both semi-joins broadcast.
    """
    resolved = resolve_meta(meta_df, spec)
    ids = F.broadcast(resolved.select("series_id").distinct())
    df = df.join(ids, on="series_id", how="left_semi")
    if "retention" in resolved.columns and "retention" in df.columns:
        tiers = F.broadcast(resolved.select("retention").distinct())
        df = df.join(tiers, on="retention", how="left_semi")
    return df


# ---------------------------------------------------------------------------
# Latest reads — one row per (series_id, valid_time)
# ---------------------------------------------------------------------------

_STATE = ("value", "annotation", "changed_by")


def kt_ct_order() -> Column:
    """The (knowledge_time, change_time) lexicographic ordering as ONE
    Tungsten-mutable DECIMAL(38,0) (functions/ordering.packed_lex — the
    shared injectivity/exactness argument lives there).

    ``max_by(value, struct(kt, ct))`` carries a struct-typed aggregation
    buffer, which disqualifies HashAggregate (struct fields aren't mutable
    in an UnsafeRow) and forces a SortAggregate — a full sort of every map
    partition BEFORE the partial combine, and a second sort after the
    exchange (measured r13: the two sorts are the dominant cost of
    bt_read_latest at sf0.1). The packed key keeps the exact lexicographic
    order while the (double, decimal) buffer is fully mutable, so the
    collapse runs as a HashAggregate with the same map-side combine.

    NULL semantics: the store's write path stamps both columns non-null
    (the validation contract), so in-domain results are identical to the
    struct form. OUT of that domain the encodings differ: a NULL kt/ct
    makes the packed key NULL and max_by SKIPS the row, where the struct
    form would have ordered it null-first within the field comparison —
    callers feeding un-stamped frames must not rely on NULL ordering.
    """
    return packed_lex(
        F.unix_micros(F.col("knowledge_time")), F.unix_micros(F.col("change_time"))
    )


def latest(df: DataFrame) -> DataFrame:
    """Latest value per (series_id, valid_time).

    The max_by picks the row with the largest (knowledge_time, change_time)
    — latest issue, latest correction within it. Parity with
    ``argMax(value, (knowledge_time, change_time))`` (read.py:232-247).
    The ordering key is the packed decimal (:func:`kt_ct_order`) rather
    than a struct so the collapse runs as a HashAggregate with map-side
    PARTIAL combine: every partition collapses to one row per
    (series_id, valid_time) before the shuffle — at 100 TB the revision
    history never crosses the wire, unlike a window row_number which
    shuffles every raw row — and no partition is ever sorted (the struct
    form degraded to a double SortAggregate).
    """
    return df.groupBy("series_id", "valid_time").agg(
        F.max_by("value", kt_ct_order()).alias("value")
    )


def latest_changes(df: DataFrame) -> DataFrame:
    """Correction chain of the winning knowledge_time per (series_id,
    valid_time); consecutive duplicate states collapsed.

    Parity with read.py:250-287: the inner max(knowledge_time) per (sid, vt)
    plays the reference's semi-join role, then a lag window ordered by
    change_time emits only real state transitions. The winning-kt filter is
    a self-contained window max (no second scan of the source, unlike the
    reference's embedded-twice WHERE).
    """
    w_chain = Window.partitionBy("series_id", "valid_time").orderBy("change_time")
    # Same sort keys as the lag window (a whole-partition max is
    # order-insensitive), so both Window nodes share ONE sort: the filter
    # preserves the (sid, vt, ct) ordering and Spark elides the second
    # SortExec (the unordered-window form re-sorted the full frame).
    w_kt = w_chain.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    state = F.struct(*_STATE)
    return (
        df.withColumn("_max_kt", F.max("knowledge_time").over(w_kt))
        .filter(F.col("knowledge_time") == F.col("_max_kt"))
        .withColumn("_prev", F.lag(state).over(w_chain))
        .filter(F.col("_prev").isNull() | ~_state_eq(F.col("_prev")))
        .select("series_id", "valid_time", "change_time", "value", "changed_by", "annotation")
    )


def _state_eq(prev: Column) -> Column:
    """Null-safe + NaN-safe equality of the (value, annotation, changed_by)
    state tuple against its lag — the reference's ``IS NOT DISTINCT FROM``
    over a CH tuple (read.py:278-279). ``eqNullSafe`` treats NaN == NaN the
    way the storage sentinel requires."""
    return (
        F.col("value").eqNullSafe(prev["value"])
        & F.col("annotation").eqNullSafe(prev["annotation"])
        & F.col("changed_by").eqNullSafe(prev["changed_by"])
    )


# ---------------------------------------------------------------------------
# Overlapping reads — one row per (series_id, valid_time, knowledge_time)
# ---------------------------------------------------------------------------


def overlapping(df: DataFrame) -> DataFrame:
    """One row per (series_id, knowledge_time, valid_time); the row with the
    largest change_time wins within the group.

    Parity with the reference's ORDER BY … LIMIT 1 BY streaming pass
    (read.py:295-317) — same result as its documented ``argMax(value,
    change_time)`` equivalence, expressed as the aggregate directly so Spark
    runs it with map-side combine instead of a global sort.
    """
    return df.groupBy("series_id", "knowledge_time", "valid_time").agg(
        F.max_by("value", "change_time").alias("value")
    )


def overlapping_changes(df: DataFrame) -> DataFrame:
    """Full 3D audit: every state transition per (series_id, kt, vt).

    Parity with read.py:320-344.
    """
    w_chain = Window.partitionBy("series_id", "knowledge_time", "valid_time").orderBy("change_time")
    state = F.struct(*_STATE)
    return (
        df.withColumn("_prev", F.lag(state).over(w_chain))
        .filter(F.col("_prev").isNull() | ~_state_eq(F.col("_prev")))
        .select("series_id", "valid_time", "knowledge_time", "change_time", "value", "changed_by", "annotation")
    )


# ---------------------------------------------------------------------------
# Relative read (ref: timedb/read.py:352-396, 461-527)
# ---------------------------------------------------------------------------


def relative_cutoff(
    df: DataFrame,
    *,
    window_length: timedelta,
    issue_offset: timedelta,
    start_window: datetime,
) -> DataFrame:
    """Per-window point-in-time read: keep only rows whose knowledge_time is
    at or before the issue cutoff of their valid_time's window, then latest.

    The cutoff is ``window_start(vt) + issue_offset`` where window_start
    aligns vt to ``window_length``-sized buckets anchored at
    ``start_window`` — parity with CH's ``toStartOfInterval(vt, interval,
    origin) + offset`` (read.py:386-391). Pure column arithmetic on epoch
    seconds (window/offset are whole seconds in the reference too), so the
    predicate stays inside codegen and combines with pushed-down scans.
    """
    w = int(window_length.total_seconds())
    off = int(issue_offset.total_seconds())
    sw = F.unix_timestamp(F.lit(start_window).cast("timestamp"))
    vt_s = F.unix_timestamp(F.col("valid_time"))
    win_start = sw + F.floor((vt_s - sw) / F.lit(w)) * F.lit(w)
    cutoff = F.timestamp_seconds(win_start + F.lit(off))
    return latest(df.filter(F.col("knowledge_time") <= cutoff))


def resolve_relative_params(
    *,
    window_length: timedelta | None = None,
    issue_offset: timedelta | None = None,
    start_window: datetime | None = None,
    start_valid: datetime | None = None,
    days_ahead: int | None = None,
    time_of_day: dt_time | None = None,
) -> tuple[timedelta, timedelta, datetime]:
    """Normalize the two parameterizations of read_relative.

    Exact port of the argument-resolution semantics (read.py:475-498): the
    daily sugar ``(days_ahead, time_of_day)`` maps to a 1-day window whose
    issue offset is ``time_of_day - days_ahead`` anchored the midnight before
    ``start_valid``; mixing the two forms raises.
    """
    using_daily = days_ahead is not None or time_of_day is not None
    using_explicit = window_length is not None or issue_offset is not None
    if using_daily and using_explicit:
        raise ValueError("Cannot mix (days_ahead, time_of_day) with (window_length, issue_offset). Use one set.")
    if using_daily:
        if days_ahead is None or time_of_day is None:
            raise ValueError("Both days_ahead and time_of_day must be provided together.")
        if start_valid is None:
            raise ValueError("start_valid is required when using days_ahead/time_of_day.")
        window_length = timedelta(days=1)
        issue_offset = timedelta(
            hours=time_of_day.hour,
            minutes=time_of_day.minute,
            seconds=time_of_day.second,
            microseconds=time_of_day.microsecond,
        ) - timedelta(days=days_ahead)
        start_window = start_valid.replace(hour=0, minute=0, second=0, microsecond=0) - timedelta(days=1)
    else:
        if window_length is None or issue_offset is None:
            raise ValueError("Both window_length and issue_offset are required.")
        start_window = start_window if start_window is not None else start_valid
        if start_window is None:
            raise ValueError("start_window is required when start_valid is not provided.")
    return window_length, issue_offset, start_window


# ---------------------------------------------------------------------------
# Null sentinel (ref: timedb/read.py:57-67)
# ---------------------------------------------------------------------------


def nan_to_null(df: DataFrame, col: str = "value") -> DataFrame:
    """NaN is the storage sentinel for null; reads surface it as null."""
    return df.withColumn(col, F.when(F.isnan(F.col(col)), F.lit(None)).otherwise(F.col(col)))


def snapshot(df: DataFrame, asof_knowledge: "datetime") -> DataFrame:
    """Time-travel read: the world as it was KNOWN at ``asof_knowledge`` —
    drop everything learned later, then collapse to latest. The knowledge-
    time filter is a plain pushdown predicate (reaches the parquet scan);
    the collapse is the same partial-aggregable max_by as :func:`latest`.
    Parity: read.py's end_knowledge bound + latest collapse.
    """
    return latest(df.filter(F.col("knowledge_time") <= F.lit(asof_knowledge)))


def snapshot_diff(df: DataFrame, t1: "datetime", t2: "datetime") -> DataFrame:
    """What changed between two knowledge-time snapshots (t1 < t2): per
    (series_id, valid_time) the t1 and t2 values plus a change kind
    ('added' | 'changed'). Append-only store ⇒ t1 keys ⊆ t2 keys, so a left
    join from the t2 snapshot covers the full diff; both snapshots reuse the
    same (series_id, valid_time) shuffle partitioning.
    """
    s1 = snapshot(df, t1).withColumnRenamed("value", "value_t1").withColumn("_in_t1", F.lit(True))
    s2 = snapshot(df, t2).withColumnRenamed("value", "value_t2")
    j = s2.join(s1, on=["series_id", "valid_time"], how="left")
    added = F.col("_in_t1").isNull()  # key absent at t1 (≠ a stored null value)
    changed = ~F.col("value_t2").eqNullSafe(F.col("value_t1"))
    return (
        j.filter(added | changed)
        .select(
            "series_id",
            "valid_time",
            "value_t1",
            "value_t2",
            F.when(added, "added").otherwise("changed").alias("change_kind"),
        )
    )


# ---------------------------------------------------------------------------
# Backtest error metrics — the query a forecasting TimeDB user runs next:
# how good were the forecasts that were available at issue time?
# ---------------------------------------------------------------------------


def backtest_error(
    df: DataFrame,
    *,
    window_length: timedelta,
    issue_offset: timedelta,
    start_window: datetime,
) -> DataFrame:
    """Per-series forecast-accuracy metrics: compare the point-in-time state
    (what :func:`relative_cutoff` would have served at each window's issue
    cutoff — the "forecast") against the final latest state (the "actual").

    Composes the reference's read_relative (read.py:461-527) with read
    latest (read.py:232-247) the way its energy-forecasting users do in
    client code; here it is ONE Spark plan.

    Output: (series_id, n_points, mae, rmse, bias).

    Scale notes: both sides are max_by aggregations over the same scan,
    hash-partitioned on (series_id, valid_time) — the equi-join reuses that
    partitioning with no extra exchange, then the per-series rollup is one
    more (much smaller) shuffle. Error terms are rounded per row and summed
    as DECIMAL so the aggregate is exact and order-independent (the oracle
    hash-matches regardless of partitioning).
    """
    forecast = relative_cutoff(
        df, window_length=window_length, issue_offset=issue_offset, start_window=start_window
    ).withColumnRenamed("value", "forecast")
    actual = latest(df).withColumnRenamed("value", "actual")
    # floor(x*1e6+0.5)/1e6 everywhere, not round(x,6): Spark's HALF_UP on
    # the exact decimal expansion and DuckDB's round disagree by 1e-6 on
    # half-boundary values (observed at sf0.1 in mae/bias) — floor+0.5 on
    # bit-identical doubles is bit-identical on both engines.
    # Tie semantics (ADVICE r8): for NEGATIVE values an exact tie rounds
    # toward +inf (-1.0000005 → -1.000000), not away from zero like
    # HALF_UP (→ -1.000001). Signed outputs (bias, the raw err) therefore
    # carry toward-+inf ties; both engines apply the identical convention,
    # and the reference publishes no tie rule of its own (it returns raw
    # ClickHouse floats unrounded), so cross-engine agreement is the
    # binding contract here.
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    err = r6(F.col("forecast") - F.col("actual")).cast("decimal(28,6)")
    err2 = r6((F.col("forecast") - F.col("actual")) * (F.col("forecast") - F.col("actual"))).cast(
        "decimal(28,6)"
    )
    n = F.count(F.lit(1))
    return (
        forecast.join(actual, ["series_id", "valid_time"])
        .groupBy("series_id")
        .agg(
            n.alias("n_points"),
            r6(F.sum(F.abs(err)).cast("double") / n).alias("mae"),
            r6(F.sqrt(F.sum(err2).cast("double") / n)).alias("rmse"),
            r6(F.sum(err).cast("double") / n).alias("bias"),
        )
    )


def value_at(df: DataFrame, valid_instant: "datetime", asof_knowledge: "datetime") -> DataFrame:
    """Fully-bitemporal point read: each series' value in effect AT
    ``valid_instant`` AS KNOWN AT ``asof_knowledge`` — the two-axis pin
    (TimescaleDB locf-at-point / SQL:2011 ``FOR SYSTEM_TIME AS OF`` ×
    application-time ``AS OF`` composed).

    One map-side-combinable aggregation: both cutoffs are pushdown
    predicates, then a single ``max_by`` keyed by the lexicographic
    ``struct(valid_time, knowledge_time, change_time)`` picks the newest
    effective observation and its winning revision in the same pass — the
    "latest vt, then latest (kt, ct) within it" two-level argmax with no
    window sort and no second shuffle.
    """
    pinned = df.filter(
        (F.col("valid_time") <= F.lit(valid_instant))
        & (F.col("knowledge_time") <= F.lit(asof_knowledge))
    )
    # value as the last key component: a deterministic tiebreak should two
    # revisions ever share the full (vt, kt, ct) coordinate.
    key = F.struct("valid_time", "knowledge_time", "change_time", "value")
    win = F.max_by(F.struct("valid_time", "knowledge_time", "value"), key)
    v = win.getField("value")
    return pinned.groupBy("series_id").agg(
        win.getField("valid_time").alias("effective_valid_time"),
        win.getField("knowledge_time").alias("known_at"),
        F.when(F.isnan(v), F.lit(None)).otherwise(v).alias("value"),
    )


def interval_at(df: DataFrame, at: "datetime") -> DataFrame:
    """Interval-validity point read: each series' observation whose
    ``[valid_time, valid_time_end)`` interval COVERS instant ``at``, latest
    fact first — the reference's ``valid_time_end`` column (DDL
    ch_create_tables.sql:33) given its application-time-period semantics
    (SQL:2011 application-time ``CONTAINS``).

    Overlapping intervals are arbitrated by the same two-level argmax as
    :func:`value_at` — newest effective ``valid_time``, then newest
    ``(knowledge_time, change_time)`` revision within it — in ONE map-side-
    combinable ``max_by``; both interval bounds are pushdown predicates, so
    at 100 TB the scan prunes to the partitions whose zone maps can cover
    ``at``."""
    covering = df.filter((F.col("valid_time") <= F.lit(at)) & (F.col("valid_time_end") > F.lit(at)))
    key = F.struct("valid_time", "knowledge_time", "change_time", "value")
    win = F.max_by(F.struct("valid_time", "valid_time_end", "value"), key)
    v = win.getField("value")
    return covering.groupBy("series_id").agg(
        win.getField("valid_time").alias("valid_time"),
        win.getField("valid_time_end").alias("valid_time_end"),
        F.when(F.isnan(v), F.lit(None)).otherwise(v).alias("value"),
    )


def interval_merge(df: DataFrame) -> DataFrame:
    """Temporal NORMALIZE (SQL:2011) / gaps-and-islands: collapse each
    series' overlapping-or-adjacent ``[valid_time, valid_time_end)``
    intervals into maximal contiguous spans, with the interval count per
    span — the coverage view of an interval-valid store ("when was this
    series covered at all, and by how many observations").

    Shape: distinct intervals → ONE window sort per series evaluating both
    passes (the trailing running-max of ends that detects island starts,
    and the running island-id sum) → a map-side-combined span aggregate.
    Adjacent intervals (end == next start) merge; integer-µs comparisons
    keep the island boundaries bit-identical cross-engine."""
    iv = df.select("series_id", "valid_time", "valid_time_end").distinct()
    order = [F.col("valid_time"), F.col("valid_time_end")]
    w_prev = Window.partitionBy("series_id").orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.partitionBy("series_id").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    prev_max_end = F.max("valid_time_end").over(w_prev)
    new_island = (prev_max_end.isNull() | (F.col("valid_time") > prev_max_end)).cast("int")
    islands = iv.select(
        "series_id", "valid_time", "valid_time_end", F.sum(new_island).over(w_run).alias("island")
    )
    return islands.groupBy("series_id", "island").agg(
        F.min("valid_time").alias("span_start"),
        F.max("valid_time_end").alias("span_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def audit(df: DataFrame) -> DataFrame:
    """Change-audit rollup per author over a series_values frame: how many
    writes each ``changed_by`` issued, how many series they touched, how
    many of their writes were RESTATEMENTS (a revision of an already-known
    (series, valid_time) point), and the mean absolute restatement
    magnitude — the data-governance readout over the reference's
    ``changed_by`` / ``annotation`` lineage columns (ref
    timedb/sql/ch_create_tables.sql: series_values.changed_by; the
    reference stores the lineage, this is the query a steward runs on it).

    One revision-ordering window (the latest_changes sort, reused) + one
    map-side-combined groupBy(changed_by). Deltas in exact integer cents;
    the mean is a single division, floor-scaled.
    """
    w = Window.partitionBy("series_id", "valid_time").orderBy("knowledge_time", "change_time")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    base = df.select(
        "series_id", "valid_time", "knowledge_time", "change_time", "changed_by", cents.alias("c")
    ).withColumn("prev", F.lag("c").over(w))
    agg = base.groupBy("changed_by").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.countDistinct("series_id").alias("n_series"),
        F.sum(F.when(F.col("prev").isNotNull(), 1).otherwise(0)).cast("long").alias("n_restatements"),
        F.sum(F.when(F.col("prev").isNotNull(), F.abs(F.col("c") - F.col("prev"))).otherwise(0)).alias("adq"),
        F.min("change_time").alias("first_change"),
        F.max("change_time").alias("last_change"),
    )
    return agg.select(
        "changed_by",
        "n_changes",
        "n_series",
        "n_restatements",
        F.when(
            F.col("n_restatements") > 0,
            F.floor(F.col("adq").cast("double") / 100.0 / F.col("n_restatements").cast("double") * 1e6) / 1e6,
        ).alias("mean_abs_restatement"),
        "first_change",
        "last_change",
    )


def knowledge_lag(df: DataFrame) -> DataFrame:
    """Publication-lag audit per retention tier: how far behind the
    observed instant (valid_time) does knowledge arrive (knowledge_time)?
    THE data-ops question on a bitemporal store — feed freshness, SLA
    checking, and how far back read_relative cutoffs must reach (ref
    semantics: timedb/read.py's knowledge-time filtering makes this lag
    the user-visible staleness). Negative lag = knowledge precedes the
    stamped valid hour (early/forecast-style publication).

    One groupBy(retention) — grouping cardinality is the tier vocabulary,
    so the shuffle is trivially bounded at any scale. Lag rides exact
    integer MICROSECONDS (no float until the final divisions); the mean
    divides an exact long sum; p50/p90 use exact interpolated
    ``percentile`` (== DuckDB quantile_cont) over minutes. All outputs
    floor-scaled to 6 dp.
    """
    lag_us = (
        F.unix_micros(F.col("knowledge_time")) - F.unix_micros(F.col("valid_time"))
    ).alias("lag_us")
    d = df.select("retention", lag_us)
    lag_min = F.col("lag_us").cast("double") / 60000000.0
    d = d.select("retention", "lag_us", lag_min.alias("lag_min"))
    g = d.groupBy("retention").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("lag_min").alias("mn"),
        F.max("lag_min").alias("mx"),
        F.sum("lag_us").alias("s_us"),
        F.percentile("lag_min", F.lit(0.5)).alias("p50"),
        F.percentile("lag_min", F.lit(0.9)).alias("p90"),
    )
    mean_min = F.col("s_us").cast("double") / F.col("n_rows").cast("double") / 60000000.0
    return g.select(
        "retention",
        "n_rows",
        (F.floor(F.col("mn") * 1e6) / 1e6).alias("lag_min_min"),
        (F.floor(F.col("mx") * 1e6) / 1e6).alias("lag_min_max"),
        (F.floor(mean_min * 1e6) / 1e6).alias("lag_min_mean"),
        (F.floor(F.col("p50") * 1e6) / 1e6).alias("lag_min_p50"),
        (F.floor(F.col("p90") * 1e6) / 1e6).alias("lag_min_p90"),
    )


def staleness(df: DataFrame) -> DataFrame:
    """Feed-staleness audit: each series' latest ``valid_time`` vs the
    corpus high-water mark, bucketed fresh (< 24 h behind) / recent
    (< 168 h) / stale (≥ 168 h) per retention tier — the "which feeds
    stopped updating" dashboard (the other half of [[bt_knowledge_lag]]:
    lag measures HOW LATE knowledge arrives, this measures WHO went
    quiet). Per (retention, bucket): series count and the worst lag.

    One groupBy(series) for per-series max valid_time, a 1-row global max
    broadcast back (cross-join of a scalar — no shuffle of the big side),
    one vocabulary-bounded rollup. Staleness rides exact integer hours
    (non-negative by construction, so integer division is floor in both
    engines)."""
    per_series = df.groupBy("retention", "series_id").agg(
        F.max("valid_time").alias("vt_last")
    )
    hw = df.agg(F.max("valid_time").alias("vt_max"))
    j = per_series.join(F.broadcast(hw))
    lag_h = (
        (F.unix_micros(F.col("vt_max")) - F.unix_micros(F.col("vt_last")))
        / F.lit(3600000000)
    ).cast("long")
    j = j.select("retention", lag_h.alias("lag_h"))
    bucket = (
        F.when(F.col("lag_h") < 24, F.lit("fresh"))
        .when(F.col("lag_h") < 168, F.lit("recent"))
        .otherwise(F.lit("stale"))
    )
    return j.groupBy("retention", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_series"),
        F.max("lag_h").alias("max_lag_hours"),
    )


def revision_latency(df: DataFrame) -> DataFrame:
    """Revision-cadence audit per retention tier: the minutes between
    CONSECUTIVE knowledge_time stamps within each (series_id, valid_time)
    revision chain — how quickly restatements follow the original
    publication (ref semantics: the chain latest/overlapping arbitrate;
    bt_restatements counts and sizes the corrections, THIS measures their
    cadence — the data-ops SLA on corrections). Per tier: revision count,
    min / interpolated p50/p90 / max latency.

    One revision-ordering window per (series, valid_time) — the
    latest_changes sort reused — then a vocabulary-bounded rollup; gaps in
    exact integer microseconds, exact interpolated percentile."""
    w = Window.partitionBy("series_id", "valid_time").orderBy(
        "knowledge_time", "change_time"
    )
    prev_kt = F.lag(F.col("knowledge_time")).over(w)
    d = df.select(
        "retention",
        ((F.unix_micros(F.col("knowledge_time")) - F.unix_micros(prev_kt)).cast("double")
         / 60000000.0).alias("gap_min"),
    ).filter(F.col("gap_min").isNotNull())
    return d.groupBy("retention").agg(
        F.count(F.lit(1)).alias("n_revisions"),
        (F.floor(F.min("gap_min") * 1e6) / 1e6).alias("gap_min_min"),
        (F.floor(F.percentile("gap_min", F.lit(0.5)) * 1e6) / 1e6).alias("gap_min_p50"),
        (F.floor(F.percentile("gap_min", F.lit(0.9)) * 1e6) / 1e6).alias("gap_min_p90"),
        (F.floor(F.max("gap_min") * 1e6) / 1e6).alias("gap_min_max"),
    )


def coverage(df: DataFrame) -> DataFrame:
    """Valid-time coverage audit per series — the summary a data steward
    reads off :func:`interval_merge`'s spans: how much of each series'
    overall [first, last) valid extent is actually covered by observations,
    how many contiguous spans/gaps there are, and the largest hole (in
    exact integer microseconds — the zone-map unit). The interval-store
    sibling of ts_gap_detect (which audits point-sample spacing): this one
    audits DECLARED validity intervals, e.g. "which sensors have
    certification holes".

    Shape: interval_merge's one window sort per series, a lag over the
    per-series span list (already tiny — spans ≤ intervals), and one
    map-side-combined rollup. Micros arithmetic is exact integer; the
    coverage ratio is the only double, floor-scaled.
    """
    spans = interval_merge(df)
    w = Window.partitionBy("series_id").orderBy("span_start")
    gap = F.unix_micros(F.col("span_start")) - F.unix_micros(F.lag("span_end").over(w))
    g = spans.withColumn("gap_us", gap).groupBy("series_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("n_intervals").cast("long").alias("n_intervals"),
        F.sum(F.unix_micros("span_end") - F.unix_micros("span_start")).cast("long").alias("covered_us"),
        F.min(F.unix_micros("span_start")).alias("first_us"),
        F.max(F.unix_micros("span_end")).alias("last_us"),
        F.max(F.coalesce(F.col("gap_us"), F.lit(0).cast("long"))).cast("long").alias("largest_gap_us"),
    )
    extent = (F.col("last_us") - F.col("first_us")).cast("double")
    return g.select(
        "series_id",
        "n_spans",
        "n_intervals",
        "covered_us",
        "largest_gap_us",
        (F.floor(F.col("covered_us").cast("double") / extent * 1e6) / 1e6).alias("coverage_ratio"),
    )
