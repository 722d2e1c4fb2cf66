"""Event-time windowed aggregation with watermark — the Structured-Streaming
surface the reference's polling loop never had (its only windows are the
5-day retention L3 and per-day grouping E2/D2; SURVEY §2.L notes event-time
windows as the idiomatic extension the `events` table demonstrates).

Semantics: tumbling windows over event time; the watermark bounds state and
defines when late rows are dropped.  In append mode a window emits exactly
once, when the watermark passes its end — so downstream sinks see each
window as an immutable fact, the streaming analog of the reference's
"chunk is final once imported" cursor advance (L5).

Scale: state per (window, event_type) only; watermark-driven eviction keeps
state bounded regardless of stream length — the property the reference
approximates with its witness retention delete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events_stream: DataFrame,
    window_duration: str = "1 day",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time windows per event_type: count + value sum."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
