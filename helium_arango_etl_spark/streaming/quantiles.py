"""Streaming quantile rollup — the mergeable quantile sketch
(operators/sketch.value_quantile_sketch) maintained incrementally over an
event stream.

Each micro-batch folds to its own (group, octave, sub) bucket histogram —
a few dozen rows — and merges into the persisted state table by cell-wise
addition (the mergeability property tests/test_temporal.py pins for the
batch form).  State is O(groups × ~70 buckets) FOREVER, regardless of
stream length: this is the quantile a 100 TB/day stream can actually
afford, where any exact form would buffer unbounded value multisets.

Quantile estimates are derived from the state table on demand (a
cheap read over bucket rows), not per batch — separating the O(batch)
ingest path from the O(buckets) query path, the standard
sketch-serving split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def batch_buckets(df: DataFrame) -> DataFrame:
    """Fold a (event_type, value) micro-batch to its bucket histogram —
    the same integer bucketing as the batch sketch (cents, bit-length
    octave, 2 sub-bits)."""
    return (
        df.withColumn("c", F.expr("cast(floor(value * 100) as bigint)"))
        .filter(F.col("c") >= 1)
        .withColumn("b", F.expr("length(bin(c))"))
        .withColumn(
            "sub",
            F.expr(
                "CASE WHEN b >= 3 THEN shiftright(c, b - 3) & 3"
                " ELSE shiftleft(c, 3 - b) & 3 END"
            ),
        )
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


def run_quantile_stream(
    events_stream: DataFrame, spark: SparkSession, state_path: str, checkpoint: str
):
    """foreachBatch ingest: fold each micro-batch and merge into the
    parquet state table.  The merge reads O(buckets) rows, never the
    stream history."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_buckets(batch_df.select("event_type", "value"))
        try:
            state = spark.read.parquet(state_path)
        except Exception:
            state = None
        merged = merge_buckets(state, delta).localCheckpoint()
        merged.write.mode("overwrite").parquet(state_path)

    return (
        events_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def quantiles_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Serve p50/p90/p99 estimates from the persisted bucket table —
    identical formula to the batch sketch's final stage."""
    buckets = spark.read.parquet(state_path).withColumn(
        "ub",
        F.expr(
            "CASE WHEN b >= 3 THEN shiftleft(5 + sub, b - 3) - 1"
            " ELSE shiftright(4 + sub, 3 - b) END"
        ),
    )
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
