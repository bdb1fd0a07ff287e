"""Stream-stream interval join: clicks joined to same-user purchases that
follow within a bounded horizon.

The canonical two-stream correlation (conversion matching): both sides are
watermarked and the join predicate carries an event-time RANGE, so the
state store can evict a click once the purchase-side watermark passes
click_ts + horizon, and a purchase once the click-side watermark passes it
— bounded state on both sides, which is what distinguishes a production
stream-stream join from an unbounded buffer.

Determinism: an INNER time-bounded join emits every matching pair exactly
once regardless of micro-batch slicing (watermarks only bound STATE for an
inner join, never results), so one availableNow drain equals the batch
interval join bit-for-bit — the full-oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_HORIZON_HOURS = 2


def stream_click_purchase_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Inner interval join: each click paired with every same-user purchase
    in ``(click_ts, click_ts + horizon]``. Works on batch AND streaming
    frames (the Structured Streaming contract); on streams both sides carry
    watermarks so join state is evicted as event time advances."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", "1 hour")
        p = p.withWatermark("purchase_ts", "1 hour")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {JOIN_HORIZON_HOURS} HOURS"))
    )
    return c.join(p, cond, "inner").select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


STREAM_JOIN_SQL = f"""
SELECT c.event_id AS click_id,
       c.user_id,
       c.ts AS click_ts,
       p.event_id AS purchase_id,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts > c.ts
 AND epoch_us(p.ts) - epoch_us(c.ts) <= CAST({JOIN_HORIZON_HOURS} AS BIGINT) * 3600 * 1000000
"""
