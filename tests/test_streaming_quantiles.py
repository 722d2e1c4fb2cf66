"""Streaming quantile sketch: the state table maintained across
micro-batches must yield IDENTICAL estimates to the one-pass batch
sketch — mergeability exercised through the actual streaming path —
and the merge must be idempotent under foreachBatch's at-least-once
replay (ADVICE r3)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.registry import QUERIES
from helium_arango_etl_spark.streaming.quantiles import (
    merge_batch,
    quantiles_from_state,
    read_state,
    run_quantile_stream,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_sketch_equals_batch(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    src_dir = str(tmp_path / "src")
    ordered = ev.withColumn("bucket", F.ntile(4).over(Window.orderBy("event_id")))
    for i in range(1, 5):
        ordered.filter(F.col("bucket") == i).drop("bucket").coalesce(1).write.mode(
            "append" if i > 1 else "overwrite"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    state = str(tmp_path / "state")
    q = run_quantile_stream(stream, spark, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # state stays bucket-sized, not stream-sized
    n_state = read_state(spark, state).count()
    assert n_state < 500, n_state

    streamed = {
        r["event_type"]: (r["n"], r["n_buckets"], r["est_p50"], r["est_p90"], r["est_p99"])
        for r in quantiles_from_state(spark, state).collect()
    }
    batch = {
        r["event_type"]: (r["n"], r["n_buckets"], r["est_p50"], r["est_p90"], r["est_p99"])
        for r in QUERIES["value_quantile_sketch"](spark, sf_dir).collect()
    }
    assert streamed == batch


def test_merge_is_idempotent_on_replay(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-merged
    batch_id must be a no-op (no double counting), and a later batch_id
    must still merge.  Mirrors a crash between state write and
    checkpoint commit followed by a restart replaying the last batch."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    half_a = ev.filter(F.expr("pmod(hash(value), 2) = 0"))
    half_b = ev.filter(F.expr("pmod(hash(value), 2) = 1"))
    state = str(tmp_path / "state")
    (tmp_path / "state").mkdir()

    assert merge_batch(spark, state, half_a, batch_id=0) is True
    after_first = _rows(read_state(spark, state))

    # replayed batch (same id) and a stale id: both skipped, state untouched
    assert merge_batch(spark, state, half_a, batch_id=0) is False
    assert merge_batch(spark, state, half_b, batch_id=0) is False
    assert _rows(read_state(spark, state)) == after_first

    # the next batch id merges; totals equal the one-shot histogram
    assert merge_batch(spark, state, half_b, batch_id=1) is True
    from helium_arango_etl_spark.streaming.quantiles import batch_buckets

    assert _rows(read_state(spark, state)) == _rows(batch_buckets(ev))


def test_underflow_values_are_counted_not_dropped(spark, sf_dir, tmp_path):
    """Zero/negative values land in the b=0 underflow bucket: they count
    toward n and rank positions (estimate 0.0 when a percentile falls
    in the underflow mass) instead of being silently excluded."""
    rows = [("t", 0.0)] * 60 + [("t", -3.5)] * 10 + [("t", 5.0)] * 30
    df = spark.createDataFrame(rows, "event_type string, value double")
    state = str(tmp_path / "state")
    (tmp_path / "state").mkdir()
    assert merge_batch(spark, state, df, batch_id=0)
    got = quantiles_from_state(spark, state).collect()[0]
    assert got["n"] == 100
    assert got["est_p50"] == 0.0  # 70% of mass is sub-cent
    assert got["est_p90"] > 0.0  # p90 falls in the real-valued tail
