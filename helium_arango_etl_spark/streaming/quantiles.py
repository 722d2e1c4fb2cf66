"""Streaming quantile rollup — the mergeable quantile sketch
(operators/sketch.value_quantile_sketch) maintained incrementally over an
event stream.

Each micro-batch folds to its own (group, octave, sub) bucket histogram —
a few dozen rows — and merges into the persisted state table by cell-wise
addition (the mergeability property tests/test_temporal.py pins for the
batch form).  State is O(groups × ~70 buckets) FOREVER, regardless of
stream length: this is the quantile a 100 TB/day stream can actually
afford, where any exact form would buffer unbounded value multisets.

Durability contract (ADVICE r3): foreachBatch is at-least-once — a batch
whose state write succeeded but whose checkpoint commit didn't is
REPLAYED with the same batch_id on restart.  State therefore lives in a
:class:`..streaming.state.VersionedState`: replayed batches are skipped
(idempotent merge) and each merge writes a fresh versioned directory
committed by an atomic pointer rename, never overwriting the version
being read.

Quantile estimates are derived from the state table on demand (a
cheap read over bucket rows), not per batch — separating the O(batch)
ingest path from the O(buckets) query path, the standard
sketch-serving split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .state import VersionedState

# Bucketing mirrors operators/sketch.value_quantile_sketch exactly —
# including the b=0 underflow bucket for cents < 1 (zero/negative
# values), so streamed estimates stay bit-identical to the batch sketch.
_BUCKET_B = "CASE WHEN c >= 1 THEN length(bin(c)) ELSE 0 END"
_BUCKET_SUB = (
    "CASE WHEN b = 0 THEN CAST(0 AS BIGINT)"
    " WHEN b >= 3 THEN shiftright(c, b - 3) & 3"
    " ELSE shiftleft(c, 3 - b) & 3 END"
)
_BUCKET_UB = (
    "CASE WHEN b = 0 THEN CAST(0 AS BIGINT)"
    " WHEN b >= 3 THEN shiftleft(5 + sub, b - 3) - 1"
    " ELSE shiftright(4 + sub, 3 - b) END"
)


def batch_buckets(df: DataFrame) -> DataFrame:
    """Fold a (event_type, value) micro-batch to its bucket histogram —
    the same integer bucketing as the batch sketch (cents, bit-length
    octave, 2 sub-bits, b=0 underflow for cents < 1)."""
    return (
        df.withColumn("c", F.expr("cast(floor(value * 100) as bigint)"))
        .withColumn("b", F.expr(_BUCKET_B))
        .withColumn("sub", F.expr(_BUCKET_SUB))
        .groupBy("event_type", "b", "sub")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_buckets(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Cell-wise add a batch histogram into the persisted state table."""
    if state is None:
        return delta
    return (
        state.unionByName(delta)
        .groupBy("event_type", "b", "sub")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """The current committed bucket table, or None before the first merge."""
    return VersionedState(spark, state_path).read()


def merge_batch(
    spark: SparkSession, state_path: str, batch_df: DataFrame, batch_id: int
) -> bool:
    """Idempotently merge one micro-batch into the versioned state.

    Returns False (no-op) when batch_id was already merged — the
    at-least-once replay case (see streaming/state.py).
    """
    store = VersionedState(spark, state_path)
    if (last := store.last_batch_id()) is not None and batch_id <= last:
        return False
    delta = batch_buckets(batch_df.select("event_type", "value"))
    return store.commit(merge_buckets(store.read(), delta), batch_id)


def run_quantile_stream(
    events_stream: DataFrame, spark: SparkSession, state_path: str, checkpoint: str
):
    """foreachBatch ingest: fold each micro-batch and merge into the
    versioned parquet state.  The merge reads O(buckets) rows, never the
    stream history, and replayed batches are skipped (idempotent)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(spark, state_path, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def quantiles_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Serve p50/p90/p99 estimates from the committed bucket table —
    identical formula to the batch sketch's final stage (underflow
    bucket reports ub = 0 cents, i.e. an estimate of 0.0)."""
    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no committed quantile state at {state_path}")
    buckets = state.withColumn("ub", F.expr(_BUCKET_UB))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("b", "sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = buckets.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("event_type"))
    )
    est = [
        F.round(
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"cast(ceiling({q} * n) as bigint)"),
                    F.col("ub"),
                )
            )
            / 100.0,
            2,
        ).alias(f"est_p{int(q * 100)}")
        for q in (0.5, 0.9, 0.99)
    ]
    return cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        *est,
    )
