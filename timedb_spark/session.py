"""Tuned SparkSession builder.

One place to encode the cluster-facing defaults so every entry point
(tests, bench, driver contract) runs with the same engine posture:
AQE on (runtime coalescing + skew-join handling), UTC session timezone
(the reference stores everything tz-aware UTC; timedb/read.py:31), and
Arrow enabled for the few Pandas-UDF paths.

``spark.sql.shuffle.partitions`` defaults to the local core count; on a
real cluster AQE coalesces the 200-ish default anyway, but sizing it
explicitly keeps local runs from creating 200 tiny tasks per shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "timedb_spark", *, extra_conf: dict[str, str] | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet ns-timestamps in the testdata must not silently truncate.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # Spark's legacy INT96 timestamps carry NO parquet min/max statistics
        # — they'd silently void the store's row-group zone maps on
        # valid_time (the sparse primary index). INT64 micros restores them.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # INT64 TIMESTAMP(NANOS) parquet (events.ts) is otherwise unreadable;
        # read as long ns and convert at the loader (io.tables.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
