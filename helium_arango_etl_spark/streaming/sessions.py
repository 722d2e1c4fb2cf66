"""Streaming sessionization via Spark's native ``session_window`` — the
event-time gap-session analog of the batch lag/gap operator
(operators/temporal.sessionize).

Semantics: per-user sessions close when no event arrives within the gap;
with a watermark, a session emits exactly once (append mode) when the
watermark passes session_end + gap — the streaming "session is final"
contract, matching how the batch form's sessions are immutable once the
next event is more than GAP away.

Scale: state is one open session per active user (merged in-place by the
session-window state store), bounded by the watermark — O(active users),
not O(events).  The batch operator is the replay/backfill path; this is
the low-latency path over the same events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_GAP = "6 hours"  # = operators.temporal.SESSION_GAP_US


def session_stream(
    events_stream: DataFrame,
    gap: str = SESSION_GAP,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Per-user gap sessions over the event stream: bounds + event count +
    value sum per closed session."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
