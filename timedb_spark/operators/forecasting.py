"""Forecasting-workflow operators over the bitemporal frame + hourly series.

The queries a forecasting team (the reference's audience — rebase-energy
builds energy-forecast tooling) runs on top of the bitemporal reads:

- ``forecast_vintage``  — how the value for each (series, hour) evolved
  across knowledge horizons (the "forecast vintage" pivot; generalizes
  read_relative to several cutoffs in ONE pass).
- ``restatements``      — per-series audit: how often points get revised,
  how many vintages exist, how early knowledge first arrives.
- ``calendar_features`` — the supervised-learning feature matrix (lag +
  calendar features) fed to a downstream forecast model.
- ``changepoint``       — rolling mean-shift detection (CUSUM-style
  two-window contrast) over the hourly series.
- ``pit_features``      — point-in-time-correct training matrix: lag
  features as known at each TARGET's day-ahead cutoff (the feature-store
  PIT join), label = realized latest, calendar ints.

Scale posture: vintage + restatements are groupBy aggregations keyed by the
fine-grained (series_id, valid_time) — map-side partial combine, one
shuffle (restatements adds a second, tiny, per-series reduce). The feature
matrix and changepoint use ONE window sort per series partition; the three
lag frames / two contrast frames share the same (partition, order) so Spark
evaluates them in a single WindowExec pass. No self-joins anywhere:
time-shifted lookups are RANGE frames on an integer hour axis, not
shifted equi-joins.

Ref parity anchors: read_relative semantics (timedb/read.py:352-396) —
vintage generalizes its single cutoff; the revision-chain model
(timedb/read.py:250-287) — restatements quantifies it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedb_spark.io.tables import bitemporal_frame
from timedb_spark.operators.bitemporal import kt_ct_order as bt_kt_ct_order
from timedb_spark.operators.timeseries import _HOURLY_SERIES_SQL, _hourly_series

# ---------------------------------------------------------------------------
# forecast vintages: value as known h hours before the valid hour
# ---------------------------------------------------------------------------

#: Knowledge horizons (hours before valid_time) pivoted per point.
VINTAGE_HORIZONS = (0, 1, 2)


def forecast_vintage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (series, valid hour): the final value plus the value as known at
    each horizon's cutoff (vt - h). ONE groupBy — each horizon is a
    conditional ``max_by`` whose ordering is NULL outside the cutoff (null
    orderings are ignored by max_by in both Spark and DuckDB), so the whole
    vintage pivot costs a single map-side-combined shuffle instead of one
    relative-cutoff read per horizon."""
    sv = bitemporal_frame(spark, sf_dir)
    # value joins the ordering struct as the final tiebreak: two revisions can
    # share (kt, ct) exactly (same user_id/ts/event_id%4 in the derived frame),
    # and without it the winner is partitioning-dependent — same reason
    # bitemporal.value_at/interval_at key their argmax on (..., value).
    key = F.struct("knowledge_time", "change_time", "value")
    aggs = [
        F.max_by("value", key).alias("v_final"),
        F.count_distinct("knowledge_time").alias("n_vintages"),
    ]
    for h in VINTAGE_HORIZONS:
        cond = F.col("knowledge_time") <= F.col("valid_time") - F.expr(f"INTERVAL {h} HOUR")
        aggs.append(
            F.max_by(
                F.when(cond, F.col("value")),
                F.when(cond, key),
            ).alias(f"v_h{h}")
        )
    return sv.groupBy("series_id", "valid_time").agg(*aggs)


def _vintage_cte(h: int) -> str:
    return f"""
    SELECT series_id, valid_time, value FROM (
        SELECT series_id, valid_time, value,
               row_number() OVER (PARTITION BY series_id, valid_time
                                  ORDER BY knowledge_time DESC, change_time DESC, value DESC) AS rn
        FROM sv WHERE knowledge_time <= valid_time - to_hours({h})
    ) t WHERE rn = 1
    """


def forecast_vintage_sql(sv_sql: str) -> str:
    joins = "\n".join(
        f"LEFT JOIN h{h} ON h{h}.series_id = b.series_id AND h{h}.valid_time = b.valid_time"
        for h in VINTAGE_HORIZONS
    )
    ctes = ",\n".join(f"h{h} AS ({_vintage_cte(h)})" for h in VINTAGE_HORIZONS)
    sel = ", ".join(f"h{h}.value AS v_h{h}" for h in VINTAGE_HORIZONS)
    return f"""
    WITH sv AS ({sv_sql}),
    b AS (
        SELECT series_id, valid_time, count(DISTINCT knowledge_time) AS n_vintages
        FROM sv GROUP BY series_id, valid_time
    ),
    f AS (
        SELECT series_id, valid_time, value FROM (
            SELECT series_id, valid_time, value,
                   row_number() OVER (PARTITION BY series_id, valid_time
                                      ORDER BY knowledge_time DESC, change_time DESC, value DESC) AS rn
            FROM sv
        ) t WHERE rn = 1
    ),
    {ctes}
    SELECT b.series_id, b.valid_time, f.value AS v_final, b.n_vintages, {sel}
    FROM b
    JOIN f ON f.series_id = b.series_id AND f.valid_time = b.valid_time
    {joins}
    """


# ---------------------------------------------------------------------------
# restatement audit: revision pressure per series
# ---------------------------------------------------------------------------


def restatements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per series: points, observations, revised points (>1 knowledge
    vintage), max vintages, and the mean first-knowledge lead in hours
    (positive = first estimate arrived BEFORE the valid hour started).

    Two-level aggregation: the first groupBy is keyed by the fine
    (series_id, valid_time) — partial combine collapses history before the
    shuffle; the per-series reduce then runs on |points|, not |rows|."""
    sv = bitemporal_frame(spark, sf_dir)
    per_point = sv.groupBy("series_id", "valid_time").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.count_distinct("knowledge_time").alias("n_vintages"),
        F.min("knowledge_time").alias("first_kt"),
    )
    lead_us = F.unix_micros("valid_time") - F.unix_micros("first_kt")
    per_series = per_point.groupBy("series_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("n_obs").alias("n_obs"),
        F.sum(F.when(F.col("n_vintages") > 1, 1).otherwise(0)).alias("n_revised_points"),
        F.max("n_vintages").alias("max_vintages"),
        F.sum(lead_us).alias("_lead_us"),
    )
    # exact integer µs sum → double division is deterministic cross-engine;
    # floor(x*1e6+0.5)/1e6 rounding (identical halfway mode in both engines)
    avg_h = F.col("_lead_us").cast("double") / F.col("n_points") / F.lit(3.6e9)
    return per_series.select(
        "series_id",
        "n_points",
        "n_obs",
        "n_revised_points",
        "max_vintages",
        (F.floor(avg_h * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("avg_first_lead_h"),
    )


def restatements_sql(sv_sql: str) -> str:
    return f"""
    WITH sv AS ({sv_sql}),
    per_point AS (
        SELECT series_id, valid_time,
               count(*) AS n_obs,
               count(DISTINCT knowledge_time) AS n_vintages,
               min(knowledge_time) AS first_kt
        FROM sv GROUP BY series_id, valid_time
    )
    SELECT series_id,
           count(*) AS n_points,
           -- CAST: integer sum() widens to HUGEINT in DuckDB; Spark emits
           -- bigint and the gate hash is type-sensitive.
           CAST(sum(n_obs) AS BIGINT) AS n_obs,
           CAST(sum(CASE WHEN n_vintages > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_revised_points,
           max(n_vintages) AS max_vintages,
           floor((CAST(sum(epoch_us(valid_time) - epoch_us(first_kt)) AS DOUBLE)
                  / count(*) / 3.6e9) * 1e6 + 0.5) / 1e6 AS avg_first_lead_h
    FROM per_point GROUP BY series_id
    """


# ---------------------------------------------------------------------------
# pinball (quantile) loss: probabilistic-forecast evaluation
# ---------------------------------------------------------------------------

#: evaluated forecast quantiles
PINBALL_QS = (0.1, 0.5, 0.9)


def pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss per (series, quantile) — THE evaluation
    metric for probabilistic energy forecasts (the reference's domain):
    each point's revision chain doubles as an empirical predictive
    distribution, its q-quantiles (exact linear interpolation — Spark
    ``percentile`` == DuckDB ``quantile_cont``, parity proven by
    ts_quantiles) are the quantile forecasts, and the final latest value is
    the outcome. pinball_q = max(q·(y−f), (q−1)·(y−f)).

    ONE fine-keyed groupBy computes all quantiles AND the final value
    (map-side-combinable), quantiles explode from the array (no extra
    pass), and the per-series reduce sums 1e-8-scaled integers — exact,
    order-free, bit-identical to the oracle."""
    sv = bitemporal_frame(spark, sf_dir)
    qs = F.array(*[F.lit(q) for q in PINBALL_QS])
    per_point = sv.groupBy("series_id", "valid_time").agg(
        F.percentile("value", qs).alias("fq"),
        F.max_by("value", F.struct("knowledge_time", "change_time", "value")).alias("y"),
    )
    z = per_point.select(
        "series_id",
        "y",
        F.explode(F.arrays_zip(qs.alias("q"), F.col("fq").alias("f"))).alias("e"),
    ).select("series_id", F.col("e.q").alias("q"), (F.col("y") - F.col("e.f")).alias("d"))
    pb = F.greatest(F.col("q") * F.col("d"), (F.col("q") - 1) * F.col("d"))
    pb8 = F.floor(pb * F.lit(1e8) + F.lit(0.5)).cast("long")
    out = (
        z.select("series_id", "q", pb8.alias("pb8"))
        .groupBy("series_id", "q")
        .agg(F.count(F.lit(1)).alias("n_points"), F.sum("pb8").alias("_s"))
    )
    mean6 = F.floor(F.col("_s").cast("double") / F.col("n_points") / F.lit(1e8) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return out.select("series_id", "q", "n_points", mean6.alias("mean_pinball"))


def pinball_loss_sql(sv_sql: str) -> str:
    per_q = "\nUNION ALL\n".join(
        f"SELECT series_id, {q} AS q, y - f[{i + 1}] AS d FROM per_point" for i, q in enumerate(PINBALL_QS)
    )
    return f"""
    WITH sv AS ({sv_sql}),
    fq AS (
        SELECT series_id, valid_time,
               quantile_cont(value, {list(PINBALL_QS)}) AS f
        FROM sv GROUP BY series_id, valid_time
    ),
    fin AS (
        SELECT series_id, valid_time, value AS y FROM (
            SELECT series_id, valid_time, value,
                   row_number() OVER (PARTITION BY series_id, valid_time
                                      ORDER BY knowledge_time DESC, change_time DESC, value DESC) AS rn
            FROM sv
        ) t WHERE rn = 1
    ),
    per_point AS (
        SELECT fq.series_id, fq.valid_time, fq.f, fin.y
        FROM fq JOIN fin ON fin.series_id = fq.series_id AND fin.valid_time = fq.valid_time
    ),
    z AS ({per_q}),
    pb AS (
        SELECT series_id, q,
               CAST(floor(greatest(q * d, (q - 1) * d) * 1e8 + 0.5) AS BIGINT) AS pb8
        FROM z
    )
    SELECT series_id, q, count(*) AS n_points,
           floor(CAST(sum(pb8) AS DOUBLE) / count(*) / 1e8 * 1e6 + 0.5) / 1e6 AS mean_pinball
    FROM pb GROUP BY series_id, q
    """


# ---------------------------------------------------------------------------
# supervised feature matrix: lags + calendar
# ---------------------------------------------------------------------------


def _floor_hours(ts_col: str):
    """FLOOR-division hour index of a timestamp column, exact in BIGINT.

    ``unix_micros - pmod(unix_micros, 3600000000)`` is an exact multiple of
    the divisor, so the truncating ``div`` equals floor division for any
    sign. The DuckDB twin is :func:`_floor_div_sql` — BOTH engines truncate
    toward zero on integers (Spark ``div``; DuckDB integer ``//``, verified
    on 1.0.0: ``-91 // 24 = -3``), so both need the same exact-multiple
    trick to get floor semantics pre-epoch."""
    us = f"unix_micros({ts_col})"
    return F.expr(f"({us} - pmod({us}, 3600000000)) div 3600000000")


def _floor_div_sql(num: str, den: int) -> str:
    """FLOOR integer division in DuckDB SQL. DuckDB's integer ``//``
    truncates toward zero (1.0.0: ``-91 // 24 = -3``, floor is -4), so:
    double-mod to a non-negative remainder, subtract, divide the exact
    multiple — on which truncation equals floor."""
    m = f"((({num}) % {den}) + {den}) % {den}"
    return f"((({num}) - {m}) // {den})"


#: floor-semantics day-of-week from the FLOOR hour index ``h`` (0 = Sunday):
#: floor-div h by 24 via the same exact-multiple trick, then pmod by 7.
_DOW_H = "pmod((h - pmod(h, 24)) div 24 + 4, 7)"

#: DuckDB twins over a FLOOR hour index ``h`` (both engines' native ops
#: truncate; see _floor_div_sql) — double-mod makes the residues
#: non-negative, _floor_div_sql makes the day index a true floor.
_DOW_H_SQL = f"((({_floor_div_sql('h', 24)} + 4) % 7) + 7) % 7"
_HOD_H_SQL = "((h % 24) + 24) % 24"

#: DuckDB FLOOR hour index of a timestamp expression.
_H_SQL = _floor_div_sql("epoch_us(valid_time)", 3600000000)


def calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-input matrix for an hourly forecaster: target ``y`` with
    1 h / 24 h / 168 h lags and integer calendar features.

    Lags are RANGE frames on an integer hour axis — exact time-shifted
    lookups on the SPARSE series (a missing hour yields NULL, never the
    wrong row, which a ROWS-offset ``lag`` would silently return). All
    three frames share one (series, hour) sort; no self-joins. Calendar
    fields are pure integer arithmetic on the hour index (epoch day 0 =
    Thursday ⇒ dow = (d + 4) % 7 with 0 = Sunday) — identical cross-engine,
    no timezone/locale functions involved. All divisions/mods use FLOOR
    semantics on both engines (Spark: pmod + exact-multiple div; DuckDB:
    ``//`` plus double-mod), so pre-1970 valid times can't make the
    engines diverge (Spark ``div``/``%`` truncate toward zero while
    DuckDB ``//`` floors — ADVICE r10)."""
    s = _hourly_series(spark, sf_dir).withColumn("h", _floor_hours("valid_time"))
    w = Window.partitionBy("series_id").orderBy("h")
    out = s.select(
        "series_id",
        "valid_time",
        F.expr("pmod(h, 24)").alias("hour_of_day"),
        F.expr(_DOW_H).alias("day_of_week"),
        F.expr(f"{_DOW_H} IN (0, 6)").alias("is_weekend"),
        F.max("value").over(w.rangeBetween(-1, -1)).alias("lag_1h"),
        F.max("value").over(w.rangeBetween(-24, -24)).alias("lag_24h"),
        F.max("value").over(w.rangeBetween(-168, -168)).alias("lag_168h"),
        F.col("value").alias("y"),
    )
    return out


CALENDAR_FEATURES_SQL = f"""
WITH s AS ({_HOURLY_SERIES_SQL}),
hx AS (SELECT *, {_H_SQL} AS h FROM s)
SELECT series_id, valid_time,
       {_HOD_H_SQL} AS hour_of_day,
       {_DOW_H_SQL} AS day_of_week,
       {_DOW_H_SQL} IN (0, 6) AS is_weekend,
       max(value) OVER (PARTITION BY series_id ORDER BY h
                        RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS lag_1h,
       max(value) OVER (PARTITION BY series_id ORDER BY h
                        RANGE BETWEEN 24 PRECEDING AND 24 PRECEDING) AS lag_24h,
       max(value) OVER (PARTITION BY series_id ORDER BY h
                        RANGE BETWEEN 168 PRECEDING AND 168 PRECEDING) AS lag_168h,
       value AS y
FROM hx
"""


# ---------------------------------------------------------------------------
# changepoint: two-window mean-shift contrast
# ---------------------------------------------------------------------------

#: observations per contrast window (trailing vs leading)
CHANGEPOINT_WIN = 24
#: flag when |post_mean - pre_mean| ≥ this
CHANGEPOINT_THRESHOLD = 12.0


def changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift candidates per series: at each observation, contrast the
    trailing-24 and leading-24 observation means; emit points where the
    shift magnitude clears the threshold and both windows are full.

    Window sums are exact DECIMAL(18,6) (the hourly values are round-6, so
    the decimal cast is lossless) ⇒ the means are `exact-integer / count`
    double divisions — deterministic across engines. Both frames ride one
    per-series sort; windows are observation-indexed (ROWS), which is the
    robust choice on a sparse series."""
    s = _hourly_series(spark, sf_dir)
    dv = F.col("value").cast("decimal(18,6)")
    w = Window.partitionBy("series_id").orderBy("valid_time")
    pre_w = w.rowsBetween(-CHANGEPOINT_WIN, -1)
    post_w = w.rowsBetween(0, CHANGEPOINT_WIN - 1)
    df = s.select(
        "series_id",
        "valid_time",
        F.sum(dv).over(pre_w).alias("_pre_sum"),
        F.count(F.lit(1)).over(pre_w).alias("_pre_n"),
        F.sum(dv).over(post_w).alias("_post_sum"),
        F.count(F.lit(1)).over(post_w).alias("_post_n"),
    )
    pre_mean = F.col("_pre_sum").cast("double") / F.col("_pre_n")
    post_mean = F.col("_post_sum").cast("double") / F.col("_post_n")
    shift = post_mean - pre_mean
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return (
        df.filter((F.col("_pre_n") == CHANGEPOINT_WIN) & (F.col("_post_n") == CHANGEPOINT_WIN))
        .filter(F.abs(shift) >= CHANGEPOINT_THRESHOLD)
        .select(
            "series_id",
            "valid_time",
            r6(pre_mean).alias("pre_mean"),
            r6(post_mean).alias("post_mean"),
            r6(shift).alias("mean_shift"),
        )
    )


CHANGEPOINT_SQL = f"""
WITH s AS ({_HOURLY_SERIES_SQL}),
win AS (
    SELECT series_id, valid_time,
           sum(CAST(value AS DECIMAL(18,6))) OVER pre  AS pre_sum,
           count(*) OVER pre  AS pre_n,
           sum(CAST(value AS DECIMAL(18,6))) OVER post AS post_sum,
           count(*) OVER post AS post_n
    FROM s
    WINDOW pre  AS (PARTITION BY series_id ORDER BY valid_time
                    ROWS BETWEEN {CHANGEPOINT_WIN} PRECEDING AND 1 PRECEDING),
           post AS (PARTITION BY series_id ORDER BY valid_time
                    ROWS BETWEEN CURRENT ROW AND {CHANGEPOINT_WIN - 1} FOLLOWING)
)
SELECT series_id, valid_time,
       floor((CAST(pre_sum AS DOUBLE) / pre_n) * 1e6 + 0.5) / 1e6 AS pre_mean,
       floor((CAST(post_sum AS DOUBLE) / post_n) * 1e6 + 0.5) / 1e6 AS post_mean,
       floor((CAST(post_sum AS DOUBLE) / post_n - CAST(pre_sum AS DOUBLE) / pre_n) * 1e6 + 0.5) / 1e6 AS mean_shift
FROM win
WHERE pre_n = {CHANGEPOINT_WIN} AND post_n = {CHANGEPOINT_WIN}
  AND abs(CAST(post_sum AS DOUBLE) / post_n - CAST(pre_sum AS DOUBLE) / pre_n) >= {CHANGEPOINT_THRESHOLD}
"""


def bt_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate wrapper: :func:`timedb_spark.operators.bitemporal.audit` over
    the deterministic events→series_values derivation."""
    from timedb_spark.operators import bitemporal

    return bitemporal.audit(bitemporal_frame(spark, sf_dir))


def bt_audit_sql(sv_sql: str) -> str:
    cents = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
    return f"""
WITH sv AS ({sv_sql}),
r AS (
    SELECT changed_by, series_id, change_time, {cents} AS c,
           lag({cents}) OVER (PARTITION BY series_id, valid_time
                              ORDER BY knowledge_time, change_time) AS prev
    FROM sv
)
SELECT changed_by,
       count(*) AS n_changes,
       count(DISTINCT series_id) AS n_series,
       CAST(sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_restatements,
       CASE WHEN sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) > 0
            THEN floor(CAST(sum(CASE WHEN prev IS NOT NULL THEN abs(c - prev) ELSE 0 END) AS DOUBLE)
                 / 100.0 / CAST(sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) * 1e6) / 1e6
            END AS mean_abs_restatement,
       min(change_time) AS first_change,
       max(change_time) AS last_change
FROM r GROUP BY changed_by
"""


def bt_knowledge_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate wrapper: :func:`timedb_spark.operators.bitemporal.knowledge_lag`
    over the deterministic events→series_values derivation."""
    from timedb_spark.operators import bitemporal

    return bitemporal.knowledge_lag(bitemporal_frame(spark, sf_dir))


def bt_knowledge_lag_sql(sv_sql: str) -> str:
    lag_us = "epoch_us(knowledge_time) - epoch_us(valid_time)"
    return f"""
WITH sv AS ({sv_sql}),
l AS (
    SELECT retention, {lag_us} AS lag_us,
           CAST({lag_us} AS DOUBLE) / 60000000.0 AS lag_min
    FROM sv
)
SELECT retention,
       count(*) AS n_rows,
       floor(min(lag_min) * 1e6) / 1e6 AS lag_min_min,
       floor(max(lag_min) * 1e6) / 1e6 AS lag_min_max,
       floor(CAST(sum(lag_us) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 60000000.0 * 1e6) / 1e6 AS lag_min_mean,
       floor(quantile_cont(lag_min, 0.5) * 1e6) / 1e6 AS lag_min_p50,
       floor(quantile_cont(lag_min, 0.9) * 1e6) / 1e6 AS lag_min_p90
FROM l GROUP BY retention
"""


def bt_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate wrapper: :func:`timedb_spark.operators.bitemporal.staleness`
    over the deterministic events→series_values derivation."""
    from timedb_spark.operators import bitemporal

    return bitemporal.staleness(bitemporal_frame(spark, sf_dir))


def bt_staleness_sql(sv_sql: str) -> str:
    return f"""
WITH sv AS ({sv_sql}),
per_series AS (
    SELECT retention, series_id, max(valid_time) AS vt_last
    FROM sv GROUP BY retention, series_id
),
hw AS (SELECT max(valid_time) AS vt_max FROM sv),
l AS (
    SELECT retention,
           CAST((epoch_us(vt_max) - epoch_us(vt_last)) // 3600000000 AS BIGINT) AS lag_h
    FROM per_series CROSS JOIN hw
)
SELECT retention,
       CASE WHEN lag_h < 24 THEN 'fresh'
            WHEN lag_h < 168 THEN 'recent'
            ELSE 'stale' END AS bucket,
       count(*) AS n_series,
       max(lag_h) AS max_lag_hours
FROM l GROUP BY 1, 2
"""


def bt_revision_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate wrapper: :func:`timedb_spark.operators.bitemporal.revision_latency`
    over the deterministic events→series_values derivation."""
    from timedb_spark.operators import bitemporal

    return bitemporal.revision_latency(bitemporal_frame(spark, sf_dir))


def bt_revision_latency_sql(sv_sql: str) -> str:
    return f"""
WITH sv AS ({sv_sql}),
r AS (
    SELECT retention,
           CAST(epoch_us(knowledge_time)
                - epoch_us(lag(knowledge_time) OVER (PARTITION BY series_id, valid_time
                                                     ORDER BY knowledge_time, change_time))
                AS DOUBLE) / 60000000.0 AS gap_min
    FROM sv
)
SELECT retention,
       count(*) AS n_revisions,
       floor(min(gap_min) * 1e6) / 1e6 AS gap_min_min,
       floor(quantile_cont(gap_min, 0.5) * 1e6) / 1e6 AS gap_min_p50,
       floor(quantile_cont(gap_min, 0.9) * 1e6) / 1e6 AS gap_min_p90,
       floor(max(gap_min) * 1e6) / 1e6 AS gap_min_max
FROM r WHERE gap_min IS NOT NULL
GROUP BY retention
"""


# ---------------------------------------------------------------------------
# PIT-correct feature retrieval: day-ahead features joined onto calendar ints
# ---------------------------------------------------------------------------

#: hour offsets of the PIT lag features (yesterday / last week, the two a
#: day-ahead energy forecaster always uses)
PIT_LAGS = (24, 168)


def pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training matrix for a day-ahead forecaster —
    the feature-store PIT join composed from the repo's own bitemporal
    reads (VERDICT r9 task #7's named composition: read_relative semantics
    joined onto ts_calendar_features).

    For every target (series, hour) the knowledge cutoff is the day-ahead
    auction close: **noon of the previous day** (``date_trunc('day', vt) -
    12h`` — the ref's days_ahead=1 / time_of_day=12:00 parameterization,
    timedb/read.py:461-527). Each lag feature is the value of the lagged
    hour **as known at the TARGET's cutoff** — not at the lagged hour's own
    cutoff, which is the classic feature-leakage bug this operator exists
    to prevent: a revision landing between the two cutoffs must be visible
    to the later target and invisible to the earlier one. The label ``y``
    is the realized value (final latest revision), what the trained model
    is scored against. Calendar fields are the pure integer forms of
    :func:`calendar_features` (no timezone/locale functions).

    Scale shape: one distinct over (series, hour) builds the target grid;
    the label is the store's latest-collapse (map-side-combined max_by);
    each lag is ONE equi-join of the revision set shifted by the lag onto
    the grid (join key (series_id, valid_time) — co-partitioned with the
    grid, so AQE reuses the exchange across lags) followed by a
    max_by-collapse keyed the same way. No window over the revision
    history, no cross join, no per-row Python; the revision history
    crosses the wire once per lag, already filtered to knowledge ≤ cutoff.
    """
    sv = bitemporal_frame(spark, sf_dir)
    cutoff = (F.date_trunc("day", F.col("valid_time")) - F.make_interval(hours=F.lit(12))).alias("cutoff")
    grid = sv.select("series_id", "valid_time").distinct().select("series_id", "valid_time", cutoff)

    from timedb_spark.operators import bitemporal

    y = bitemporal.latest(sv).withColumnRenamed("value", "y")
    out = grid.join(y, ["series_id", "valid_time"], "left")
    for lag in PIT_LAGS:
        rev = sv.select(
            "series_id",
            (F.col("valid_time") + F.make_interval(hours=F.lit(lag))).alias("valid_time"),
            "knowledge_time",
            "change_time",
            "value",
        )
        cand = (
            grid.join(rev, ["series_id", "valid_time"])
            .filter(F.col("knowledge_time") <= F.col("cutoff"))
            .groupBy("series_id", "valid_time")
            .agg(
                F.max_by("value", bt_kt_ct_order()).alias(f"lag_{lag}h_pit")
            )
        )
        out = out.join(cand, ["series_id", "valid_time"], "left")
    return out.withColumn("h", _floor_hours("valid_time")).select(
        "series_id",
        "valid_time",
        F.expr("pmod(h, 24)").alias("hour_of_day"),
        F.expr(_DOW_H).alias("day_of_week"),
        F.expr(f"{_DOW_H} IN (0, 6)").alias("is_weekend"),
        "y",
        *[f"lag_{lag}h_pit" for lag in PIT_LAGS],
    )


def pit_features_sql(sv_sql: str) -> str:
    """DuckDB twin of :func:`pit_features` — same grid, same per-target
    cutoff, same as-known-at-cutoff winner per lag via row_number."""
    lag_ctes = []
    lag_joins = []
    for lag in PIT_LAGS:
        lag_ctes.append(f"""
l{lag} AS (
    SELECT series_id, valid_time, value AS lag_{lag}h_pit FROM (
        SELECT g.series_id, g.valid_time, s.value,
               row_number() OVER (PARTITION BY g.series_id, g.valid_time
                                  ORDER BY s.knowledge_time DESC, s.change_time DESC) AS rn
        FROM grid g
        JOIN sv s ON s.series_id = g.series_id
                 AND s.valid_time = g.valid_time - to_hours({lag})
        WHERE s.knowledge_time <= g.cutoff
    ) t WHERE rn = 1
)""")
        lag_joins.append(
            f"LEFT JOIN l{lag} ON l{lag}.series_id = g.series_id AND l{lag}.valid_time = g.valid_time"
        )
    return f"""
WITH sv AS ({sv_sql}),
grid AS (
    SELECT DISTINCT series_id, valid_time,
           date_trunc('day', valid_time) - to_hours(12) AS cutoff,
           {_H_SQL} AS h
    FROM sv
),
y AS (
    SELECT series_id, valid_time, value AS y FROM (
        SELECT series_id, valid_time, value,
               row_number() OVER (PARTITION BY series_id, valid_time
                                  ORDER BY knowledge_time DESC, change_time DESC) AS rn
        FROM sv
    ) t WHERE rn = 1
),
{",".join(lag_ctes)}
SELECT g.series_id, g.valid_time,
       {_HOD_H_SQL} AS hour_of_day,
       {_DOW_H_SQL} AS day_of_week,
       {_DOW_H_SQL} IN (0, 6) AS is_weekend,
       y.y AS y,
       {", ".join(f"l{lag}.lag_{lag}h_pit AS lag_{lag}h_pit" for lag in PIT_LAGS)}
FROM grid g
LEFT JOIN y ON y.series_id = g.series_id AND y.valid_time = g.valid_time
{chr(10).join(lag_joins)}
"""


# ---------------------------------------------------------------------------
# PIT backtest over a materialized (bitemporal) rollup state
# ---------------------------------------------------------------------------


def rollup_pit_backtest(state: DataFrame, revisions: DataFrame, *, lag_hours: int = 24) -> DataFrame:
    """Score a day-ahead seasonal-naive forecast built from PIT-correct
    knowledge against a MATERIALIZED hourly rollup state — the leakage-free
    evaluation loop a TimeDB user runs over a continuous aggregate
    (read_relative's days_ahead=1 / time_of_day=12:00 cutoffs, ref
    timedb/read.py:461-527, replayed against the rollup).

    ``state`` is a bitemporal rollup read with partials (``series_id``,
    ``bucket``, decimal ``vsum``); ``revisions`` the raw bitemporal frame.
    For each state bucket the forecast is the ``lag_hours``-earlier
    bucket's latest-collapse sum using only revisions with
    ``knowledge_time`` ≤ the TARGET's cutoff (noon of its previous day).
    Scores per (series, day) stay exact — cent-integer ``err_cents`` /
    ``bias_cents`` (no float division); ``n_scored`` counts buckets whose
    lag source had ANY revision known by the cutoff, and unscored days
    coalesce to 0 rather than NULL (both engines).

    Cent rounding on a half-cent sum is round-half-AWAY-FROM-ZERO on both
    engines (ADVICE r11, premise checked empirically like the r11 floor
    advice): Spark ``F.round`` is java HALF_UP (2.5→3, -2.5→-3) and DuckDB
    1.0.0's decimal→BIGINT cast AND ``round()`` do the same — the oracle
    now spells the ``round(x, 0)`` explicitly and the tie is pinned
    cross-engine in tests/test_forecasting.py (exact half-cent sums built
    from 0.005-valued revisions run through BOTH engines).

    Scale shape: the state is the bounded side (one row per (series,
    hour)); the revision set crosses the wire ONCE through a
    co-partitioned equi-join on (series_id, bucket) after the lag shift,
    then a two-level max_by/sum collapse — no window over the revision
    history, no cross join, no per-row Python.
    """
    actual = state.select(
        "series_id", "bucket",
        F.round(F.col("vsum") * 100, 0).cast("long").alias("actual_cents"),
    )
    grid = actual.select(
        "series_id", "bucket",
        (F.date_trunc("day", "bucket") - F.make_interval(hours=F.lit(12))).alias("cutoff"),
    )
    rev = revisions.select(
        "series_id",
        (F.date_trunc("hour", "valid_time") + F.make_interval(hours=F.lit(lag_hours))).alias("bucket"),
        "valid_time", "knowledge_time", "change_time", "value",
    )
    fc = (
        grid.join(rev, ["series_id", "bucket"])
        .filter(F.col("knowledge_time") <= F.col("cutoff"))
        .groupBy("series_id", "bucket", "valid_time")
        .agg(F.max_by("value", bt_kt_ct_order()).alias("pit_v"))
        .groupBy("series_id", "bucket")
        .agg(
            F.round(F.sum(F.col("pit_v").cast("decimal(38,6)")) * 100, 0)
            .cast("long").alias("fc_cents")
        )
    )
    joined = actual.join(fc, ["series_id", "bucket"], "left")
    return joined.groupBy(
        "series_id", F.date_format("bucket", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.count("fc_cents").cast("long").alias("n_scored"),
        F.coalesce(
            F.sum(F.abs(F.col("fc_cents") - F.col("actual_cents"))), F.lit(0)
        ).cast("long").alias("err_cents"),
        F.coalesce(
            F.sum(F.col("fc_cents") - F.col("actual_cents")), F.lit(0)
        ).cast("long").alias("bias_cents"),
    )


# ---------------------------------------------------------------------------
# leakage-free forecasting dataset: PIT matrix + per-series temporal holdout
# ---------------------------------------------------------------------------


def pit_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two leakage defenses composed into one training-dataset gate
    (VERDICT r11 task #3's earned composition): the point-in-time-correct
    feature matrix (:func:`pit_features` — every lag as known at the
    TARGET's day-ahead cutoff, ref timedb/read.py:461-527) with a
    per-series TEMPORAL holdout over it — the last ⌈n/5⌉ PIT rows of each
    series (by valid_time) become ``split='test'``, mirroring
    ``sampling.train_split_temporal``'s contract (same 20% tail, same
    ⌈·⌉ cut, same minimum-observation floor) applied to the MATRIX rather
    than raw events: a random split over PIT rows would still train on the
    future even though each row's features are individually leak-free.

    Series with fewer than ``sampling._TSPLIT_MIN_OBS`` matrix rows are
    excluded (nothing to hold out), exactly as the event-level splitter
    drops them. Output is row-level — every matrix row carries its split
    label, so the oracle re-derives the full assignment, not just counts.

    Scale shape: :func:`pit_features`' own plan (grid + one equi-join per
    lag, no window over revisions) plus ONE shuffle on series_id for the
    two same-partitioned analytic windows (row_number + count share the
    exchange); the revision history is not re-scanned."""
    from timedb_spark.operators.sampling import (
        _TSPLIT_MIN_OBS,
        _TSPLIT_TEST_PCT_DEN,
        _TSPLIT_TEST_PCT_NUM,
    )

    feats = pit_features(spark, sf_dir)
    cols = feats.columns
    w = Window.partitionBy("series_id").orderBy("valid_time")
    wn = Window.partitionBy("series_id")
    d = (
        feats.withColumn("rn", F.row_number().over(w))
        .withColumn("n_obs", F.count(F.lit(1)).over(wn))
        .filter(F.col("n_obs") >= _TSPLIT_MIN_OBS)
    )
    n_test = F.ceil(
        F.col("n_obs") * _TSPLIT_TEST_PCT_NUM / _TSPLIT_TEST_PCT_DEN
    ).cast("long")
    return d.select(
        *cols,
        F.when(F.col("rn") > F.col("n_obs") - n_test, "test")
        .otherwise("train")
        .alias("split"),
    )


def pit_train_split_sql(sv_sql: str) -> str:
    """DuckDB twin of :func:`pit_train_split` — the :func:`pit_features_sql`
    matrix as a CTE, the same ⌈n/5⌉ temporal tail per series."""
    from timedb_spark.operators.sampling import (
        _TSPLIT_MIN_OBS,
        _TSPLIT_TEST_PCT_DEN,
        _TSPLIT_TEST_PCT_NUM,
    )

    return f"""
WITH pit AS ({pit_features_sql(sv_sql)}),
d AS (
    SELECT *,
           row_number() OVER (PARTITION BY series_id ORDER BY valid_time) AS rn,
           count(*) OVER (PARTITION BY series_id) AS n_obs
    FROM pit
)
SELECT series_id, valid_time, hour_of_day, day_of_week, is_weekend, y,
       {", ".join(f"lag_{lag}h_pit" for lag in PIT_LAGS)},
       CASE WHEN rn > n_obs - CAST(ceil(CAST(n_obs AS DOUBLE) * {_TSPLIT_TEST_PCT_NUM} / {_TSPLIT_TEST_PCT_DEN}) AS BIGINT)
            THEN 'test' ELSE 'train' END AS split
FROM d WHERE n_obs >= {_TSPLIT_MIN_OBS}
"""
