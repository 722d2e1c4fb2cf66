"""Streaming OHLC: partials accumulated through the real streaming path
must serve candles bit-equal to the batch operator, and the merge must
be idempotent under replay and stable across a restart."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.registry import QUERIES
from helium_arango_etl_spark.streaming.ohlc import (
    batch_partials,
    candles_from_state,
    merge_batch,
    run_ohlc_stream,
)
from helium_arango_etl_spark.streaming.state import VersionedState


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_ohlc_equals_batch(spark, sf_dir, tmp_path):
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
    q = run_ohlc_stream(stream, spark, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert _rows(candles_from_state(spark, state)) == _rows(
        QUERIES["ohlc_daily"](spark, sf_dir)
    )


def test_ohlc_merge_idempotent_and_restartable(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    first, second = events.filter("event_id % 2 = 0"), events.filter("event_id % 2 = 1")
    state = str(tmp_path / "state")

    assert merge_batch(spark, state, first, 0) is True
    after_first = _rows(VersionedState(spark, state).read())
    assert merge_batch(spark, state, first, 0) is False  # replay no-op
    assert _rows(VersionedState(spark, state).read()) == after_first

    assert merge_batch(spark, state, second, 1) is True
    assert _rows(candles_from_state(spark, state)) == _rows(
        QUERIES["ohlc_daily"](spark, sf_dir)
    )
    # the merged partial table equals the one-pass fold too
    assert _rows(VersionedState(spark, state).read()) == _rows(
        batch_partials(events)
    )
