"""Watermarked tumbling-window aggregation: append-mode emissions must
exactly match the batch computation for every window the watermark has
closed, and open windows must not emit."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.streaming.windows import windowed_event_stats

WATERMARK = "1 hour"


def test_windowed_stats_match_batch_for_closed_windows(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")

    # 3 time-ordered files -> 3 micro-batches; watermark advances per batch
    src_dir = str(tmp_path / "stream_src")
    ordered = ev.orderBy("ts").withColumn("bucket", F.ntile(3).over(Window.orderBy("ts")))
    for i in range(1, 4):
        ordered.filter(F.col("bucket") == i).drop("bucket").coalesce(1).write.mode(
            "append" if i > 1 else "overwrite"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        windowed_event_stats(stream, watermark_delay=WATERMARK)
        .writeStream.format("memory")
        .queryName("windowed_stats_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM windowed_stats_test").collect()
    # windows closed by the final watermark (max event time - delay)
    max_ts = ev.agg(F.max("ts")).first()[0]
    watermark_ts = max_ts - dt.timedelta(hours=1)

    batch = (
        ev.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    expected = {
        (r["window_start"], r["window_end"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
        if r["window_end"] <= watermark_ts
    }
    got = {
        (r["window_start"], r["window_end"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in emitted
    }
    assert len(expected) > 0  # the test must actually close some windows
    for key, vals in expected.items():
        assert key in got, key
        assert got[key][0] == vals[0], key
        assert abs(got[key][1] - float(vals[1])) < 1e-4, key
    # no window emits twice (append-mode exactly-once per window)
    assert len(emitted) == len(got)
    # open windows (end beyond watermark) must not have emitted
    for key in got:
        assert key[1] <= watermark_ts, f"open window emitted: {key}"
