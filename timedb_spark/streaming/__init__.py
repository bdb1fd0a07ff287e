"""Structured Streaming operators (SURVEY §2e).

Streaming twins of the batch surface: the tumbling-window events
aggregation and the stateful latest-per-series read. Both are built for
real streams (watermarks bound state; ``applyInPandasWithState`` holds one
small dict per key-group) but tested with file sources +
``trigger(availableNow=True)`` so results are deterministic and comparable
to their batch oracles.
"""

import uuid

from pyspark.sql import DataFrame

from timedb_spark.streaming.windows import stream_events_window, windowed_events_agg
from timedb_spark.streaming.state import stream_latest_state
from timedb_spark.streaming.dedup import stream_dedup
from timedb_spark.streaming.sessions import stream_sessionize
from timedb_spark.streaming.funnel import stream_funnel

__all__ = [
    "stream_events_window",
    "windowed_events_agg",
    "stream_latest_state",
    "stream_dedup",
    "stream_sessionize",
    "stream_funnel",
    "run_available_now",
]


def run_available_now(stream_df: DataFrame, output_mode: str, timeout_s: int = 600) -> DataFrame:
    """Drain a stream deterministically: ``trigger(availableNow)`` into a
    memory sink, block until done, return the sink as a batch DataFrame.

    The bridge that lets streaming operators answer batch-style correctness
    questions (and the driver's oracle gate): same code path as production,
    bounded input."""
    spark = stream_df.sparkSession
    name = "drain_" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return spark.table(name)
