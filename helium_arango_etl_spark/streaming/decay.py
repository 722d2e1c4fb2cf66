"""Streaming time-decayed engagement — the day-bucketed form of
``operators/rangeops.decayed_user_engagement`` maintained incrementally
over an event stream.

Exact-decay state would need every event's timestamp; bucketing
contributions to integer DAYS makes the state mergeable and bounded —
(user, day) cent sums, exact bigints, merged by addition — while the
decay factor 2^(-(anchor_day - day)/7) depends only on integer day
deltas, so the streamed score is BIT-EQUAL to the batch twin
(``decayed_engagement_daily``), not approximately equal.  Same
VersionedState durability contract as streaming/quantiles + cms: replayed
batch_ids skip, restarts resume from the committed table.

State size: O(users x active days), independent of event volume; a
production deployment ages out days older than ~10 half-lives (factor
< 1e-3) with the same partition-drop retention as io.apply_retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rangeops import DECAY_HL_US
from .state import VersionedState

DAY_US = 86_400 * 1_000_000
# half-life in DAYS for the bucketed form (DECAY_HL_US is 7 days)
DECAY_HL_DAYS = DECAY_HL_US // DAY_US


def batch_day_sums(events: DataFrame) -> DataFrame:
    """Fold one micro-batch to its (user_id, day, cents, n_events,
    last_us) delta — exact integers only."""
    return (
        events.select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
        )
        .withColumn("day", F.expr(f"us div {DAY_US}"))
        .groupBy("user_id", "day")
        .agg(
            F.sum("cents").alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("us").alias("last_us"),
        )
    )


def merge_day_sums(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    if state is None:
        return delta
    return (
        state.unionByName(delta)
        .groupBy("user_id", "day")
        .agg(
            F.sum("cents").alias("cents"),
            F.sum("n_events").alias("n_events"),
            F.max("last_us").alias("last_us"),
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
        merge_day_sums(store.read(), batch_day_sums(batch_events)), batch_id
    )


def run_decay_stream(
    events_stream: DataFrame, spark: SparkSession, state_path: str, checkpoint: str
):
    """foreachBatch ingest into the versioned (user, day) state."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(spark, state_path, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def scores_from_day_sums(day_sums: DataFrame) -> DataFrame:
    """Decayed score per user from a (user, day, cents, ...) table: each
    day's cents decay by 2^(-(anchor_day - day)/HL_DAYS), every term
    rounds to integer micro-dollars before the exact-bigint per-user
    sum — identical arithmetic streamed or batch."""
    anchor = day_sums.agg(F.max("day").alias("anchor_day"))
    term = (
        "cast(round(cents * pow(2.0,"
        f" -(cast(anchor_day - day as double) / {DECAY_HL_DAYS})) * 10000) as bigint)"
    )
    return (
        day_sums.crossJoin(F.broadcast(anchor))
        .select("user_id", "n_events", "last_us", F.expr(term).alias("tm"))
        .groupBy("user_id")
        .agg(
            F.round(F.sum("tm") / 1e6, 6).alias("decayed_value"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.max("last_us").alias("last_seen_us"),
        )
        .select("user_id", "decayed_value", "n_events", "last_seen_us")
    )


def scores_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Serve per-user decayed scores from the committed state."""
    state = VersionedState(spark, state_path).read()
    if state is None:
        raise FileNotFoundError(f"no committed decay state at {state_path}")
    return scores_from_day_sums(state)
