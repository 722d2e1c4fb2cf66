"""Streaming decayed engagement: the (user, day) state accumulated
through the real streaming path must equal the one-pass batch fold, the
served scores must equal the batch twin (`decayed_engagement_daily`)
bit-for-bit, and the merge must be idempotent under at-least-once
replay and stable across a restart."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.registry import QUERIES
from helium_arango_etl_spark.streaming.decay import (
    batch_day_sums,
    merge_batch,
    run_decay_stream,
    scores_from_state,
)
from helium_arango_etl_spark.streaming.state import VersionedState


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_decay_equals_batch(spark, sf_dir, tmp_path):
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
    q = run_decay_stream(stream, spark, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # streamed (user, day) state == one-pass batch fold, cell for cell
    assert _rows(VersionedState(spark, state).read()) == _rows(
        batch_day_sums(events)
    )

    # served scores == the batch twin, bit for bit
    assert _rows(scores_from_state(spark, state)) == _rows(
        QUERIES["decayed_engagement_daily"](spark, sf_dir)
    )


def test_decay_merge_idempotent_and_restartable(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    first, second = events.filter("event_id % 2 = 0"), events.filter("event_id % 2 = 1")
    state = str(tmp_path / "state")

    assert merge_batch(spark, state, first, 0) is True
    after_first = _rows(VersionedState(spark, state).read())
    # at-least-once replay of batch 0 is a no-op
    assert merge_batch(spark, state, first, 0) is False
    assert _rows(VersionedState(spark, state).read()) == after_first

    # a "restarted" process (fresh VersionedState handle) continues from
    # the committed table rather than re-admitting from scratch
    assert merge_batch(spark, state, second, 1) is True
    assert _rows(VersionedState(spark, state).read()) == _rows(
        batch_day_sums(events)
    )
    assert _rows(scores_from_state(spark, state)) == _rows(
        QUERIES["decayed_engagement_daily"](spark, sf_dir)
    )
