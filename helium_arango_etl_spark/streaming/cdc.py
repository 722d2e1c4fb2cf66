"""Streaming CDC snapshot maintenance — the incremental form of
``operators/temporal.cdc_apply`` over a change stream.

Last-write-wins state is mergeable with O(keys) size: per user the
state row keeps the (us, event_id)-max change's op and value plus the
running change count — merging a new micro-batch is the SAME keyed
max_by/sum aggregation as folding the full history, so the streamed
snapshot is BIT-EQUAL to the batch twin, not approximately equal.
This is the property that makes CDC compaction O(delta) at 100 TB:
yesterday's snapshot + today's changelog merge in one keyed agg over
keys-touched-today.

Durability: same VersionedState contract as streaming/decay + psi —
replayed batch_ids skip, a restarted process resumes from the committed
snapshot table (VERDICT r3 #6 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import CDC_OPS
from .state import VersionedState


def batch_cdc_state(events: DataFrame) -> DataFrame:
    """Fold one micro-batch of raw events to its per-user CDC state
    delta — exact integers, control messages ('view') dropped first."""
    return (
        events.filter(F.col("event_type") != "view")
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
            F.expr(CDC_OPS).alias("op"),
            F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
        )
        .groupBy("user_id")
        .agg(
            F.expr("max_by(op, struct(us, event_id))").alias("op"),
            F.expr("max_by(cents, struct(us, event_id))").alias("cents"),
            F.expr("max_by(event_id, struct(us, event_id))").alias("last_event_id"),
            F.max("us").alias("last_us"),
            F.count(F.lit(1)).cast("bigint").alias("n_changes"),
        )
    )


def merge_cdc_state(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Merge a state delta into the snapshot: last-write-wins by the
    total (us, event_id) order, change counts add."""
    if state is None:
        return delta
    return (
        state.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.expr("max_by(op, struct(last_us, last_event_id))").alias("op"),
            F.expr("max_by(cents, struct(last_us, last_event_id))").alias("cents"),
            F.expr("max_by(last_event_id, struct(last_us, last_event_id))").alias(
                "last_event_id"
            ),
            F.max("last_us").alias("last_us"),
            F.sum("n_changes").cast("bigint").alias("n_changes"),
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
        merge_cdc_state(store.read(), batch_cdc_state(batch_events)), batch_id
    )


def run_cdc_stream(
    events_stream: DataFrame, spark: SparkSession, state_path: str, checkpoint: str
):
    """foreachBatch ingest into the versioned per-user snapshot state."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(spark, state_path, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def snapshot_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Serve the current snapshot (tombstoned keys excluded) with the
    batch twin's exact column contract."""
    state = VersionedState(spark, state_path).read()
    if state is None:
        raise FileNotFoundError(f"no committed cdc state at {state_path}")
    return state.filter(F.col("op") != "D").select(
        "user_id",
        F.col("op").alias("final_op"),
        F.col("cents").alias("last_value_cents"),
        "n_changes",
        "last_us",
    )
