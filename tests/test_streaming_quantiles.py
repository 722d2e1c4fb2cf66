"""Streaming quantile sketch: the state table maintained across
micro-batches must yield IDENTICAL estimates to the one-pass batch
sketch — mergeability exercised through the actual streaming path."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.registry import QUERIES
from helium_arango_etl_spark.streaming.quantiles import (
    quantiles_from_state,
    run_quantile_stream,
)


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
    n_state = spark.read.parquet(state).count()
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
