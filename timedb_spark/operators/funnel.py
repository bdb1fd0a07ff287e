"""Event-sequence funnel analysis (SURVEY §2b).

``events_funnel``: for every click, the user's earliest strictly-later view,
then the earliest purchase strictly after THAT view — both inside a 24 h
horizon from the click. The classic ordered-funnel query (ClickHouse
``windowFunnel``, Snowflake MATCH_RECOGNIZE territory) built from the same
single-shuffle union+window carry as the as-of joins:

  pass 1  reverse-time scan per user carries the next view onto each click
  pass 2  anchors (click, view_ts) union purchases; a second reverse scan
          carries the next purchase onto each anchor

Horizon gating happens AFTER the carry: the carried row is the earliest
candidate overall, so if it misses the horizon, every later candidate does
too — post-filtering is exact, no pair explosion ever materializes.

Scale: two shuffles on user_id + one join on click_id. The naive form is
two inequality self-joins (broadcast-nested-loop); this is two sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedb_spark.io.tables import load_table

_HORIZON_H = 24


def _carry_next(probes: DataFrame, targets: DataFrame, payload_t: str) -> DataFrame:
    """Union+reverse-scan: each probe row gains the target-side struct of the
    earliest strictly-later target (smallest event_id among ties)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("kind").asc(), F.col(payload_t).desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        probes.unionByName(targets)
        .select("*", F.last(payload_t, ignorenulls=True).over(w).alias("nxt"))
        .filter(F.col("kind") == 0)
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    horizon_us = _HORIZON_H * 3600 * 1_000_000

    def _targets(kind_name: str) -> DataFrame:
        return ev.filter(F.col("event_type") == kind_name).select(
            "user_id",
            F.col("ts").alias("t"),
            F.lit(1).alias("kind"),
            F.struct(F.col("ts").alias("nt"), F.col("event_id").alias("nid")).alias("p"),
            F.lit(None).cast("long").alias("click_id"),
            F.lit(None).cast("timestamp").alias("ct"),
        )

    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("struct<nt:timestamp,nid:long>").alias("p"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("ct"),
    )

    # pass 1: next view after the click, gated to the horizon
    p1 = _carry_next(clicks, _targets("view"), "p")
    in_h1 = F.unix_micros(F.col("nxt.nt")) - F.unix_micros(F.col("ct")) <= horizon_us
    step1 = p1.select(
        "user_id",
        "click_id",
        "ct",
        F.when(in_h1, F.col("nxt.nid")).alias("view_id"),
        F.when(in_h1, F.col("nxt.nt")).alias("view_ts"),
    )

    # pass 2: anchors at the view instant; next purchase, gated to the
    # horizon measured from the ORIGINAL click
    anchors = step1.filter(F.col("view_id").isNotNull()).select(
        "user_id",
        F.col("view_ts").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("struct<nt:timestamp,nid:long>").alias("p"),
        "click_id",
        "ct",
    )
    p2 = _carry_next(anchors, _targets("purchase"), "p")
    in_h2 = F.unix_micros(F.col("nxt.nt")) - F.unix_micros(F.col("ct")) <= horizon_us
    step2 = p2.select("click_id", F.when(in_h2, F.col("nxt.nid")).alias("purchase_id"))

    out = step1.join(step2, "click_id", "left")
    depth = (
        F.when(F.col("purchase_id").isNotNull(), 3).when(F.col("view_id").isNotNull(), 2).otherwise(1)
    )
    return out.select("click_id", "user_id", "view_id", "purchase_id", depth.alias("funnel_depth"))


EVENTS_FUNNEL_SQL = f"""
WITH clicks AS (
    SELECT event_id AS click_id, user_id, ts AS ct FROM events WHERE event_type = 'click'
),
v1 AS (
    SELECT click_id, user_id, ct, view_id, vt FROM (
        SELECT c.click_id, c.user_id, c.ct, v.event_id AS view_id, v.ts AS vt,
               row_number() OVER (PARTITION BY c.click_id ORDER BY v.ts, v.event_id) AS rn
        FROM clicks c JOIN events v
          ON v.user_id = c.user_id AND v.event_type = 'view'
         AND v.ts > c.ct
         AND epoch_us(v.ts) - epoch_us(c.ct) <= CAST({_HORIZON_H} AS BIGINT) * 3600 * 1000000
    ) t WHERE rn = 1
),
p1 AS (
    SELECT click_id, purchase_id FROM (
        SELECT v1.click_id, p.event_id AS purchase_id,
               row_number() OVER (PARTITION BY v1.click_id ORDER BY p.ts, p.event_id) AS rn
        FROM v1 JOIN events p
          ON p.user_id = v1.user_id AND p.event_type = 'purchase'
         AND p.ts > v1.vt
         AND epoch_us(p.ts) - epoch_us(v1.ct) <= CAST({_HORIZON_H} AS BIGINT) * 3600 * 1000000
    ) t WHERE rn = 1
)
SELECT c.click_id, c.user_id, v1.view_id, p1.purchase_id,
       CASE WHEN p1.purchase_id IS NOT NULL THEN 3
            WHEN v1.view_id IS NOT NULL THEN 2
            ELSE 1 END AS funnel_depth
FROM clicks c
LEFT JOIN v1 ON v1.click_id = c.click_id
LEFT JOIN p1 ON p1.click_id = c.click_id
"""
