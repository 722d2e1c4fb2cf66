"""Streaming CDC snapshot: the per-user state accumulated through the
real streaming path must serve a snapshot BIT-EQUAL to the batch twin
(`cdc_apply`), the merge must be idempotent under at-least-once replay,
and a restarted process must resume from the committed state."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.registry import QUERIES
from helium_arango_etl_spark.streaming.cdc import (
    merge_batch,
    run_cdc_stream,
    snapshot_from_state,
)
from helium_arango_etl_spark.streaming.state import VersionedState


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_cdc_equals_batch(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")

    src_dir = str(tmp_path / "src")
    ordered = events.withColumn("b", F.ntile(3).over(Window.orderBy("event_id")))
    for i in range(1, 4):
        ordered.filter(F.col("b") == i).drop("b").coalesce(1).write.mode(
            "append" if i > 1 else "overwrite"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    state = str(tmp_path / "state")
    q = run_cdc_stream(stream, spark, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert _rows(snapshot_from_state(spark, state)) == _rows(
        QUERIES["cdc_apply"](spark, sf_dir)
    )


def test_cdc_merge_idempotent_and_restartable(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    # split by time halves so later batches OVERWRITE earlier state (the
    # interesting CDC case), not just disjoint keys
    mid = events.agg(F.expr("percentile(event_id, 0.5)")).collect()[0][0]
    first = events.filter(F.col("event_id") <= mid)
    second = events.filter(F.col("event_id") > mid)
    state = str(tmp_path / "state")

    assert merge_batch(spark, state, first, 0) is True
    after_first = _rows(VersionedState(spark, state).read())
    # at-least-once replay of batch 0 is a no-op
    assert merge_batch(spark, state, first, 0) is False
    assert _rows(VersionedState(spark, state).read()) == after_first

    # a "restarted" process (fresh handle) continues from committed state
    assert merge_batch(spark, state, second, 1) is True
    assert _rows(snapshot_from_state(spark, state)) == _rows(
        QUERIES["cdc_apply"](spark, sf_dir)
    )
