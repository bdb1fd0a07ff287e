"""Streaming ordered funnel — the streaming twin of
``operators.funnel.events_funnel`` (ClickHouse ``windowFunnel`` over an
unbounded feed).

Semantics (identical to the batch op): for every click, the user's earliest
strictly-later view, then the earliest purchase strictly after THAT view —
both within a 24 h horizon measured from the click. Per-user state holds
open funnels in two stages (click-awaiting-view, click+view-awaiting-
purchase) as parallel µs arrays:

* a **view** promotes every stage-1 click it strictly follows within the
  horizon (a view can serve many clicks — matches are not consumed);
* a **purchase** completes every stage-2 funnel it strictly follows within
  the horizon → emit depth 3 immediately;
* the **event-time timer** at ``click + horizon`` finalizes what remains:
  depth 1 (never viewed in time) or depth 2 (viewed, never purchased in
  time). Out-of-horizon candidates are deliberately NOT matched *or*
  finalized early — they sit until the timer, which keeps the drain
  contract a pure predicate (below) instead of data-arrival-dependent.

State is bounded by the horizon: every entry dies at ``ct + 24 h``, so
per-user state is O(clicks in the last 24 h) regardless of feed length.

Drain contract (full SQL oracle): one availableNow drain emits exactly
  depth-3 funnels ∪ {depth-1/2 funnels whose click + horizon fell behind
  the final watermark (ms floor)}.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_HORIZON_US = 24 * 3600 * 1_000_000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("click_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("view_id", T.LongType()),
        T.StructField("purchase_id", T.LongType()),
        T.StructField("funnel_depth", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("s1_ct", T.ArrayType(T.LongType())),
        T.StructField("s1_cid", T.ArrayType(T.LongType())),
        T.StructField("s2_ct", T.ArrayType(T.LongType())),
        T.StructField("s2_cid", T.ArrayType(T.LongType())),
        T.StructField("s2_vid", T.ArrayType(T.LongType())),
        T.StructField("s2_vt", T.ArrayType(T.LongType())),
    ]
)


def _update_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    (user_id,) = key
    wm_ms = max(state.getCurrentWatermarkMs(), 0)
    if state.exists:
        s1_ct, s1_cid, s2_ct, s2_cid, s2_vid, s2_vt = (list(a) for a in state.get)
    else:
        s1_ct, s1_cid, s2_ct, s2_cid, s2_vid, s2_vt = [], [], [], [], [], []
    out: list[tuple] = []  # (click_id, view_id, purchase_id, depth)

    if not state.hasTimedOut:
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
            order = np.lexsort((pdf["event_id"].values, pdf["ts"].values))
            ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")[order]
            etype = pdf["event_type"].values[order]
            eid = pdf["event_id"].values[order]
            for i in range(len(ts_us)):
                t, typ, e = int(ts_us[i]), etype[i], int(eid[i])
                if typ == "click":
                    s1_ct.append(t)
                    s1_cid.append(e)
                elif typ == "view":
                    keep_ct, keep_cid = [], []
                    for ct, cid in zip(s1_ct, s1_cid):
                        if ct < t and t - ct <= _HORIZON_US:
                            s2_ct.append(ct)
                            s2_cid.append(cid)
                            s2_vid.append(e)
                            s2_vt.append(t)
                        else:
                            keep_ct.append(ct)
                            keep_cid.append(cid)
                    s1_ct, s1_cid = keep_ct, keep_cid
                elif typ == "purchase":
                    keep = []
                    for j in range(len(s2_ct)):
                        if s2_vt[j] < t and t - s2_ct[j] <= _HORIZON_US:
                            out.append((s2_cid[j], s2_vid[j], e, 3))
                        else:
                            keep.append(j)
                    s2_ct = [s2_ct[j] for j in keep]
                    s2_cid = [s2_cid[j] for j in keep]
                    s2_vid = [s2_vid[j] for j in keep]
                    s2_vt = [s2_vt[j] for j in keep]

    # expire everything whose click+horizon fell behind the watermark
    def _deadline_ms(ct: int) -> int:
        return (ct + _HORIZON_US) // 1000 + 1

    keep = [i for i, ct in enumerate(s1_ct) if _deadline_ms(ct) > wm_ms]
    for i, ct in enumerate(s1_ct):
        if _deadline_ms(ct) <= wm_ms:
            out.append((s1_cid[i], None, None, 1))
    s1_ct = [s1_ct[i] for i in keep]
    s1_cid = [s1_cid[i] for i in keep]

    keep = [i for i, ct in enumerate(s2_ct) if _deadline_ms(ct) > wm_ms]
    for i, ct in enumerate(s2_ct):
        if _deadline_ms(ct) <= wm_ms:
            out.append((s2_cid[i], s2_vid[i], None, 2))
    s2_ct = [s2_ct[i] for i in keep]
    s2_cid = [s2_cid[i] for i in keep]
    s2_vid = [s2_vid[i] for i in keep]
    s2_vt = [s2_vt[i] for i in keep]

    if s1_ct or s2_ct:
        state.update((s1_ct, s1_cid, s2_ct, s2_cid, s2_vid, s2_vt))
        state.setTimeoutTimestamp(min(_deadline_ms(ct) for ct in s1_ct + s2_ct))
    else:
        state.remove()

    if out:
        yield pd.DataFrame(
            {
                "click_id": [r[0] for r in out],
                "user_id": [int(user_id)] * len(out),
                "view_id": pd.array([r[1] for r in out], dtype="Int64"),
                "purchase_id": pd.array([r[2] for r in out], dtype="Int64"),
                "funnel_depth": [r[3] for r in out],
            }
        )


def stream_funnel(events_stream: DataFrame, *, delay: str = "0 seconds") -> DataFrame:
    """events-shaped stream → completed/finalized funnels, append mode."""
    return (
        events_stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
