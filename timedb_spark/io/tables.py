"""Testdata loaders + the deterministic events → bitemporal derivation.

The driver's correctness gate runs each Spark query and its DuckDB oracle
side-by-side over the same TPC-H-ish parquet tables. The bitemporal
operators need a ``series_values``-shaped input, so we derive one from the
``events`` table with arithmetic that is expressible identically in both
engines. ``BITEMPORAL_ORACLE_SQL`` is the DuckDB-side twin of
:func:`bitemporal_frame` — keep the two in lockstep.

Derivation (see SURVEY.md §4): each event becomes one observed revision of
series ``user_id`` for the hour bucket of ``ts``; the knowledge time lags
``ts`` by ``event_id % 4`` hours (so several knowledge vintages exist per
(series, hour)), and the write/correction time is the event time itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from timedb_spark.session import ensure_package_shipped

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's gate builds its OWN session (unknown cwd, package not
    # necessarily on the workers' path) — every query path starts here, so
    # this is the choke point that guarantees workers can import the
    # package's applyInPandas/mapInPandas functions (pickled by reference).
    ensure_package_shipped(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts has shipped as either INT64 TIMESTAMP(NANOS) (arrives as
        # raw ns under nanosAsLong — truncate to µs with *integer* division;
        # ns exceed 2^53 so float division would lose precision) or plain
        # TIMESTAMP(MICROS)/NTZ. Normalize both to session-UTC timestamp.
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TABLE_NAMES}


#: event_type → retention tier (arbitrary but fixed; exercises tier pruning).
_RETENTION_CASE = {
    "click": "short",
    "view": "short",
    "purchase": "long",
    "signup": "forever",
    "error": "medium",
}


def bitemporal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → series_values-shaped frame (deterministic, oracle-mirrored)."""
    ev = load_table(spark, sf_dir, "events")
    ret = F.when(F.col("event_type") == "click", "short")
    for k, v in _RETENTION_CASE.items():
        if k != "click":
            ret = ret.when(F.col("event_type") == k, v)
    ret = ret.otherwise("medium")
    ts = F.col("ts").cast("timestamp")  # NTZ parquet → session-UTC timestamp
    return ev.select(
        F.col("user_id").alias("series_id"),
        F.date_trunc("hour", ts).alias("valid_time"),
        (ts - F.make_interval(hours=(F.col("event_id") % 4).cast("int"))).alias("knowledge_time"),
        ts.alias("change_time"),
        F.col("value"),
        ret.alias("retention"),
        F.col("event_type").alias("changed_by"),
        F.col("props").alias("annotation"),
    )


def interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`bitemporal_frame` plus a bounded validity interval — the
    reference's ``valid_time_end`` column (DDL: series_values.valid_time_end)
    made non-degenerate: each observation is valid for 1–3 hours
    (1 + event_id % 3), so intervals from neighbouring hours genuinely
    overlap and an instant query must arbitrate."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    vt = F.date_trunc("hour", ts)
    return ev.select(
        F.col("user_id").alias("series_id"),
        vt.alias("valid_time"),
        (vt + F.make_interval(hours=(1 + F.col("event_id") % 3).cast("int"))).alias("valid_time_end"),
        (ts - F.make_interval(hours=(F.col("event_id") % 4).cast("int"))).alias("knowledge_time"),
        ts.alias("change_time"),
        F.col("value"),
    )


#: DuckDB twin of :func:`interval_frame`.
INTERVAL_ORACLE_SQL = """
SELECT
    user_id                                              AS series_id,
    date_trunc('hour', ts)                               AS valid_time,
    date_trunc('hour', ts) + to_hours(1 + event_id % 3)  AS valid_time_end,
    ts - to_hours(event_id % 4)                          AS knowledge_time,
    ts                                                   AS change_time,
    value                                                AS value
FROM events
"""


#: DuckDB twin of :func:`bitemporal_frame` — used as a CTE in oracle SQL.
BITEMPORAL_ORACLE_SQL = """
SELECT
    user_id                                AS series_id,
    date_trunc('hour', ts)                 AS valid_time,
    ts - to_hours(event_id % 4)            AS knowledge_time,
    ts                                     AS change_time,
    value                                  AS value,
    CASE event_type
        WHEN 'click'    THEN 'short'
        WHEN 'view'     THEN 'short'
        WHEN 'purchase' THEN 'long'
        WHEN 'signup'   THEN 'forever'
        ELSE 'medium'
    END                                    AS retention,
    event_type                             AS changed_by,
    props                                  AS annotation
FROM events
"""
