"""Streaming deduplication with bounded state.

The reference gets at-most-once inserts by keyed upserts into the store
(``onDuplicate='ignore'`` — SURVEY §2 A6): every duplicate still crosses
the wire and costs a store round-trip.  The streaming-native form drops
duplicates IN the pipeline with watermark-bounded state:
``dropDuplicatesWithinWatermark`` keeps each key only until the watermark
passes its event time + delay, so state is O(keys-per-watermark-window)
regardless of stream length — the same bounded-state property as the
windowed aggregation (streaming/windows.py), applied to identity instead
of aggregation.

Guarantee: a duplicate arriving within the watermark delay of the
original is dropped; one arriving later than the delay may pass (by then
its state is gone) — exactly the replay window a chain follower needs,
where re-served blocks arrive seconds after the original, not days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_event_stream(
    events_stream: DataFrame, watermark_delay: str = "1 hour"
) -> DataFrame:
    """Exactly-once event delivery within the watermark: first arrival of
    each event_id wins; replays within ``watermark_delay`` are dropped."""
    return events_stream.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
