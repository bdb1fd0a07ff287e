"""Stateful latest-per-series streaming read — the streaming twin of
``operators.bitemporal.latest``.

Each ``(series_id, valid_time)`` key keeps ONE small state tuple: the
winning ``(knowledge_time, change_time, value)`` so far (argmax by
``(kt, ct)``, exactly the batch ``max_by`` semantics). Every micro-batch
emits the keys whose winner changed (update mode).

Scale posture: state size is O(#live (series,hour) keys) × ~32 bytes — a
bounded hot-state cache, not a history; the full history lives in the
store, this operator serves the "current state, now" query that a batch
read would answer with a full-scan collapse.

Throughput note: ``applyInPandasWithState`` invokes Python once per key per
micro-batch, so wall time scales with distinct keys touched, not rows —
per-batch argmax is vectorized, but the per-key call overhead dominates
when nearly every key appears in every batch (the synthetic-test worst
case). On a real feed where a micro-batch touches a small fraction of live
series, the same code is state-bound, not overhead-bound.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType()),
        T.StructField("valid_time", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("knowledge_time", T.TimestampType()),
        T.StructField("change_time", T.TimestampType()),
    ]
)

# state: winning (kt, ct) as epoch-µs longs + value (µs longs: GroupState
# round-trips primitives losslessly; no tz ambiguity).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("kt_us", T.LongType()),
        T.StructField("ct_us", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _us(ts: Any) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _update_latest(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    best = state.get if state.exists else None  # (kt_us, ct_us, value)
    changed = False
    for pdf in pdfs:
        if not len(pdf):
            continue
        # vectorized argmax of (kt, ct): lexsort keys are (secondary, primary)
        kt = pdf["knowledge_time"].values.astype("datetime64[us]").astype("int64")
        ct = pdf["change_time"].values.astype("datetime64[us]").astype("int64")
        i = int(np.lexsort((ct, kt))[-1])
        cand = (int(kt[i]), int(ct[i]), float(pdf["value"].iloc[i]))
        if best is None or cand[:2] > best[:2]:
            best = cand
            changed = True
    if changed and best is not None:
        state.update(best)
        sid, vt = key
        yield pd.DataFrame(
            {
                "series_id": [int(sid)],
                "valid_time": [pd.Timestamp(vt)],
                "value": [best[2]],
                "knowledge_time": [pd.Timestamp(best[0] * 1000)],
                "change_time": [pd.Timestamp(best[1] * 1000)],
            }
        )


def stream_latest_state(sv_stream: DataFrame) -> DataFrame:
    """``series_values``-shaped stream → per-(series, valid_time) latest
    state, emitted on change. Update output mode."""
    return sv_stream.groupBy("series_id", "valid_time").applyInPandasWithState(
        _update_latest,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
