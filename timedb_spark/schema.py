"""Canonical schemas and vocabulary for the bitemporal store.

Mirrors the reference's unified ``series_values`` table and its retention
vocabulary (ref: timedb/sql/ch_create_tables.sql, timedb/write.py:35-46),
re-expressed as Spark types. ``valid_time_end``'s sentinel default and the
NaN-as-null value sentinel follow the reference exactly so round-trip
semantics match.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import types as T

RETENTION_TIERS: frozenset[str] = frozenset({"short", "medium", "long", "forever"})
"""Valid retention tier names (ref: timedb/write.py:35)."""

DEFAULT_RETENTION = "forever"

#: TTL days per tier (ref DDL multiIf: short=180, medium=1095, long=1825).
RETENTION_TTL_DAYS: dict[str, int] = {"short": 180, "medium": 1095, "long": 1825}

#: ``valid_time_end`` sentinel (ref DDL DEFAULT toDateTime64('2200-01-01')).
VALID_TIME_END_SENTINEL = datetime(2200, 1, 1, tzinfo=timezone.utc)

# Column order mirrors _SERIES_VALUES_COLUMNS (ref: timedb/write.py:22-33)
# plus the derived partition column ``vt_month`` (ref partitions by
# (retention, toYYYYMM(valid_time)); we materialize the month as a column so
# parquet directory partitioning prunes identically).
SERIES_VALUES_FIELDS = [
    ("series_id", T.LongType()),
    ("valid_time", T.TimestampType()),
    ("knowledge_time", T.TimestampType()),
    ("change_time", T.TimestampType()),
    ("value", T.DoubleType()),
    ("valid_time_end", T.TimestampType()),
    ("run_id", T.LongType()),
    ("changed_by", T.StringType()),
    ("annotation", T.StringType()),
    ("retention", T.StringType()),
]

SERIES_VALUES_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in SERIES_VALUES_FIELDS])

RUN_SERIES_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType(), True),
        T.StructField("run_id", T.LongType(), True),
        T.StructField("first_seen", T.TimestampType(), True),
    ]
)
