"""Watermarked stream-stream INTERVAL join — the low-latency path of the
batch bounded-interval range join (operators/temporal.promo_attribution):
signup events open per-user attribution windows, purchase events arriving
inside a window join to it, both sides unbounded streams.

This is the one join shape Structured Streaming supports that batch Spark
has no native operator for: the engine keys state by the equi-column
(user_id) and uses the TIME-RANGE condition plus both watermarks to bound
how long each side's rows are retained — a signup is dropped from state
once the purchase-side watermark passes ``w_start + window + delay``, so
state is O(windows open within the watermark horizon), not O(stream).
The batch operator is the replay/backfill path over the same events; this
module is the same semantics with bounded state.

Emission: inner stream-stream joins emit each match as it is found (the
watermark bounds state retention, not emission), so the output is the
full pre-dedup match set — the batch op's last-touch row_number pick is a
downstream batch concern (foreachBatch or replay), because a streaming
"latest opener" could be contradicted by a later-arriving signup.

Reference parity: the reference's follower polls and re-queries ranges
per block (etl.py poll loop); this joins the two event classes
continuously with exactly-once state, no re-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTR_WINDOW = "6 hours"  # = operators.temporal.ATTR_WINDOW_US


def attribution_stream(
    signups: DataFrame,
    purchases: DataFrame,
    window: str = ATTR_WINDOW,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """All (purchase, promo) attribution pairs: purchases joined to every
    signup of the same user whose ``[ts, ts + window)`` interval contains
    the purchase timestamp.

    Both inputs are streaming DataFrames with events-shaped columns
    (event_id, ts, user_id, value).  Output columns match the batch
    operator's pre-dedup join surface.
    """
    promos = signups.withWatermark("ts", watermark_delay).select(
        F.col("event_id").alias("promo_id"),
        F.col("user_id").alias("promo_user"),
        F.col("ts").alias("w_start"),
    )
    probes = purchases.withWatermark("ts", watermark_delay).select(
        "event_id", "user_id", F.col("ts").alias("p_ts"), "value"
    )
    cond = (
        (probes.user_id == promos.promo_user)
        & (probes.p_ts >= promos.w_start)
        & (probes.p_ts < promos.w_start + F.expr(f"INTERVAL {window}"))
    )
    return probes.join(promos, cond, "inner").select(
        "event_id",
        "user_id",
        "promo_id",
        (F.unix_micros("p_ts") - F.unix_micros("w_start"))
        .cast("bigint")
        .alias("delay_us"),
        F.col("value").cast("double").alias("value"),
    )
