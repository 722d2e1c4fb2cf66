"""Streaming OHLC — the candlestick rollup (operators/temporal.ohlc_daily)
maintained incrementally across micro-batches.

OHLC partials merge associatively: open = the value at the MIN order key,
close = at the MAX, high/low/volume = max/min/sum — so per-batch
(type, day) partial rows fold into durable VersionedState by one more
min_by/max_by pass, and the served candles are BIT-EQUAL to the batch
operator at any point (same zero-padded (µs, event_id) keys).  Same
durability contract as streaming/decay + cms: replayed batch_ids skip,
restarts resume from the committed table.  State is O(types × days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .state import VersionedState

DAY_US = 86_400 * 1_000_000
_KEY = (
    "concat(lpad(cast(us as string), 20, '0'),"
    " lpad(cast(event_id as string), 10, '0'))"
)


def batch_partials(events: DataFrame) -> DataFrame:
    """Fold one micro-batch to per-(type, day) OHLC partial rows,
    carrying the open/close ORDER KEYS so later merges stay exact."""
    ev = events.select(
        "event_type",
        F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"),
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
    ).withColumn("k", F.expr(_KEY))
    return ev.groupBy("event_type", "day").agg(
        F.min("k").alias("open_k"),
        F.expr("min_by(cents, k)").alias("open_c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.max("k").alias("close_k"),
        F.expr("max_by(cents, k)").alias("close_c"),
        F.count(F.lit(1)).cast("bigint").alias("volume"),
    )


def merge_partials(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    if state is None:
        return delta
    return (
        state.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.min("open_k").alias("open_k"),
            F.expr("min_by(open_c, open_k)").alias("open_c"),
            F.max("high_c").alias("high_c"),
            F.min("low_c").alias("low_c"),
            F.max("close_k").alias("close_k"),
            F.expr("max_by(close_c, close_k)").alias("close_c"),
            F.sum("volume").cast("bigint").alias("volume"),
        )
    )


def merge_batch(
    spark: SparkSession, state_path: str, batch_events: DataFrame, batch_id: int
) -> bool:
    """Idempotently merge one micro-batch (replayed batch_ids skipped)."""
    store = VersionedState(spark, state_path)
    if (last := store.last_batch_id()) is not None and batch_id <= last:
        return False
    return store.commit(
        merge_partials(store.read(), batch_partials(batch_events)), batch_id
    )


def run_ohlc_stream(
    events_stream: DataFrame, spark: SparkSession, state_path: str, checkpoint: str
):
    """foreachBatch ingest into the versioned OHLC partial state."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(spark, state_path, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def candles_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Serve the candles — projecting away the merge keys yields exactly
    the batch operator's output schema."""
    state = VersionedState(spark, state_path).read()
    if state is None:
        raise FileNotFoundError(f"no committed OHLC state at {state_path}")
    return state.select(
        "event_type", "day", "open_c", "high_c", "low_c", "close_c", "volume"
    )
