"""As-of join variants (SURVEY §2b): forward and tolerance-bounded forms.

All three directions use the same Spark-first shape as
``analytics.asof_join`` (the backward headliner): UNION the two sides
tagged by kind, one window pass per user carries the other side's latest
(or, scanned in reverse, next) row — a single shuffle on the key plus an
in-partition sort. The naive inequality join would be a broadcast-nested-
loop; the binned form (timeseries.range_join_events) is the equi-join
alternative when BOTH sides are large and the window's carry semantics
don't fit.

Domain note: the forward / tolerance queries join events to events
(next purchase; last click within 2 h) — the orders table ends decades
before the events stream starts, so order-based forward/tolerance joins
would be vacuously null/constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedb_spark.io.tables import load_table


def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the same user's NEXT purchase event (strictly later
    ts; earliest wins, event_id tiebreak). Reverse-time scan: ordered by
    t DESC, a running last-ignore-nulls of purchase payloads yields the
    earliest strictly-later purchase."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.struct(F.col("ts").alias("pt"), F.col("event_id").alias("pid"), F.col("value").alias("pv")).alias("p"),
        F.lit(None).cast("long").alias("event_id"),
    )
    probes = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("struct<pt:timestamp,pid:long,pv:double>").alias("p"),
        "event_id",
    )
    # Scan order (t DESC): the carried `last` is the most recently scanned
    # purchase = the earliest strictly-later one.
    # - strict ">": at equal t the probe (kind 0) scans FIRST (kind ASC), so
    #   same-instant purchases stay out of its frame;
    # - tiebreak: equal-(t) purchases scan in pid DESC order so the LAST
    #   scanned — the carried winner — is the smallest pid (oracle: ORDER BY
    #   ts ASC, event_id ASC).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("kind").asc(), F.col("p.pid").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = (
        purchases.unionByName(probes)
        .select("*", F.last("p", ignorenulls=True).over(w).alias("np"))
        .filter(F.col("kind") == 0)
    )
    return enriched.select(
        "event_id",
        "user_id",
        F.col("np.pid").alias("next_purchase_id"),
        F.col("np.pt").alias("next_purchase_ts"),
        F.col("np.pv").alias("next_purchase_value"),
    )


ASOF_FORWARD_SQL = """
WITH best AS (
    SELECT event_id, pid, pt, pv FROM (
        SELECT e.event_id, p.event_id AS pid, p.ts AS pt, p.value AS pv,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY p.ts ASC, p.event_id ASC) AS rn
        FROM events e JOIN events p
          ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts > e.ts
    ) t WHERE rn = 1
)
SELECT e.event_id, e.user_id,
       b.pid AS next_purchase_id, b.pt AS next_purchase_ts, b.pv AS next_purchase_value
FROM events e LEFT JOIN best b USING (event_id)
"""

_TOL_MINUTES = 120


def asof_tolerance_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the same user's most recent STRICTLY-earlier click
    within a 2-hour tolerance (latest wins, event_id tiebreak); NULL when the
    nearest click is older than the tolerance. Forward scan carries the last
    click struct; the tolerance is a post-filter on the carried timestamp —
    same single-shuffle cost as the unbounded backward join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.struct(F.col("ts").alias("ct"), F.col("event_id").alias("cid"), F.col("value").alias("cv")).alias("c"),
        F.lit(None).cast("long").alias("event_id"),
    )
    probes = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("struct<ct:timestamp,cid:long,cv:double>").alias("c"),
        "event_id",
    )
    # Scan order (t ASC): the carried `last` is the most recent earlier click.
    # - strict "<": at equal t the probe (kind 1) scans FIRST (kind DESC), so
    #   same-instant clicks stay out of its frame;
    # - tiebreak: equal-(t) clicks scan in cid DESC order so the carried
    #   winner is the smallest cid (oracle: ORDER BY ts DESC, event_id ASC).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("kind").desc(), F.col("c.cid").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lc = F.last("c", ignorenulls=True).over(w)
    enriched = clicks.unionByName(probes).select("*", lc.alias("lc")).filter(F.col("kind") == 1)
    within = F.unix_micros(F.col("t")) - F.unix_micros(F.col("lc.ct")) <= _TOL_MINUTES * 60 * 1_000_000
    keep = F.col("lc").isNotNull() & within
    return enriched.select(
        "event_id",
        "user_id",
        F.when(keep, F.col("lc.cid")).alias("last_click_id"),
        F.when(keep, F.col("lc.ct")).alias("last_click_ts"),
        F.when(keep, F.col("lc.cv")).alias("last_click_value"),
    )


ASOF_TOLERANCE_SQL = f"""
WITH best AS (
    SELECT event_id, cid, ct, cv FROM (
        SELECT e.event_id, c.event_id AS cid, c.ts AS ct, c.value AS cv,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY c.ts DESC, c.event_id ASC) AS rn
        FROM events e JOIN events c
          ON c.user_id = e.user_id AND c.event_type = 'click'
         AND c.ts < e.ts
         AND epoch_us(e.ts) - epoch_us(c.ts) <= CAST({_TOL_MINUTES} AS BIGINT) * 60 * 1000000
    ) t WHERE rn = 1
)
SELECT e.event_id, e.user_id,
       b.cid AS last_click_id, b.ct AS last_click_ts, b.cv AS last_click_value
FROM events e LEFT JOIN best b USING (event_id)
"""


def asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every non-purchase event: the same user's nearest purchase in
    EITHER direction by |Δt| (ties → the earlier purchase, then smallest
    event_id). pandas ``merge_asof(direction='nearest')`` analogue.

    Shape: ONE union + ONE hash partitioning on user_id, two in-partition
    window sorts (forward scan carries latest-≤, reverse scan carries
    earliest->), then an arithmetic argmin between the two carried structs.
    No inequality self-join anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.struct(F.col("ts").alias("pt"), F.col("event_id").alias("pid"), F.col("value").alias("pv")).alias("p"),
        F.lit(None).cast("long").alias("event_id"),
    )
    probes = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("struct<pt:timestamp,pid:long,pv:double>").alias("p"),
        "event_id",
    )
    u = purchases.unionByName(probes)
    # backward (≤): purchases scan first at equal t (kind asc); equal-t
    # purchases scan pid DESC so the carried winner is the smallest pid.
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("kind").asc(), F.col("p.pid").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward (strict >): probes scan first at equal t (kind asc on the
    # reversed scan), same smallest-pid tiebreak.
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("kind").asc(), F.col("p.pid").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = (
        u.select("*", F.last("p", ignorenulls=True).over(w_back).alias("bp"))
        .select("*", F.last("p", ignorenulls=True).over(w_fwd).alias("fp"))
        .filter(F.col("kind") == 1)
    )
    d_back = F.unix_micros("t") - F.unix_micros("bp.pt")
    d_fwd = F.unix_micros("fp.pt") - F.unix_micros("t")
    take_back = F.col("fp").isNull() | (F.col("bp").isNotNull() & (d_back <= d_fwd))
    best = F.when(take_back, F.col("bp")).otherwise(F.col("fp"))
    return enriched.select(
        "event_id",
        "user_id",
        best.pid.alias("nearest_purchase_id"),
        best.pt.alias("nearest_purchase_ts"),
        best.pv.alias("nearest_purchase_value"),
    )


ASOF_NEAREST_SQL = """
WITH cand AS (
    SELECT e.event_id AS eid, p.event_id AS pid, p.ts AS pt, p.value AS pv,
           abs(epoch_us(e.ts) - epoch_us(p.ts)) AS dist
    FROM events e JOIN events p
      ON p.user_id = e.user_id AND p.event_type = 'purchase'
    WHERE e.event_type <> 'purchase'
),
best AS (
    SELECT eid, pid, pt, pv FROM (
        SELECT *, row_number() OVER (PARTITION BY eid
                                     ORDER BY dist, pt, pid) AS rn
        FROM cand
    ) t WHERE rn = 1
)
SELECT e.event_id, e.user_id,
       b.pid AS nearest_purchase_id, b.pt AS nearest_purchase_ts,
       b.pv AS nearest_purchase_value
FROM events e LEFT JOIN best b ON b.eid = e.event_id
WHERE e.event_type <> 'purchase'
"""


_ATTR_DAYS = 7


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's revenue is credited
    to the same user's most recent click within a 7-day lookback; purchases
    with no in-window click count as organic. Output is the per-user report.

    Shape: the as-of carry (union + ONE window per user) resolves the
    attribution join without an inequality self-join; the per-user report is
    then a map-side-combined groupBy on the SAME user_id partitioning, so
    AQE can pipeline the two without a second full shuffle. Revenue sums are
    exact DECIMAL(18,2) (cross-engine bit-equal), surfaced as round-2
    doubles."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.struct(F.col("ts").alias("ct"), F.col("event_id").alias("cid")).alias("c"),
        F.lit(None).cast("double").alias("revenue"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("struct<ct:timestamp,cid:long>").alias("c"),
        F.col("value").alias("revenue"),
    )
    # same carry discipline as asof_tolerance_last_click: strict "<" via
    # kind DESC at equal t; smallest-cid tiebreak via cid DESC scan order.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("kind").desc(), F.col("c.cid").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lc = F.last("c", ignorenulls=True).over(w)
    touched = clicks.unionByName(purchases).select("*", lc.alias("lc")).filter(F.col("kind") == 1)
    within = (
        F.unix_micros(F.col("t")) - F.unix_micros(F.col("lc.ct"))
        <= F.lit(_ATTR_DAYS).cast("long") * 86400 * 1_000_000
    )
    attributed = F.col("lc").isNotNull() & within
    rev = F.col("revenue").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    return touched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(attributed.cast("int")).alias("n_attributed"),
        F.round(F.sum(F.when(attributed, rev).otherwise(zero)).cast("double"), 2).alias("attributed_revenue"),
        F.round(F.sum(F.when(~attributed, rev).otherwise(zero)).cast("double"), 2).alias("organic_revenue"),
    )


ATTRIBUTION_SQL = f"""
WITH purchases AS (
    SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
best AS (
    SELECT event_id, ct FROM (
        SELECT p.event_id, c.ts AS ct,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts DESC, c.event_id ASC) AS rn
        FROM purchases p JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click'
         AND c.ts < p.ts
         AND epoch_us(p.ts) - epoch_us(c.ts) <= CAST({_ATTR_DAYS} AS BIGINT) * 86400 * 1000000
    ) t WHERE rn = 1
)
SELECT p.user_id,
       count(*) AS n_purchases,
       -- CAST: integer sum() widens to HUGEINT in DuckDB; the gate hash is
       -- type-sensitive, Spark emits bigint.
       CAST(sum(CASE WHEN b.ct IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       round(CAST(sum(CASE WHEN b.ct IS NOT NULL
                           THEN CAST(p.value AS DECIMAL(18,2))
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS attributed_revenue,
       round(CAST(sum(CASE WHEN b.ct IS NULL
                           THEN CAST(p.value AS DECIMAL(18,2))
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS organic_revenue
FROM purchases p LEFT JOIN best b USING (event_id)
GROUP BY p.user_id
"""
