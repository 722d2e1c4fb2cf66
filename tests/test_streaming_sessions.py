"""Streaming session_window: closed sessions emitted in append mode must
exactly match the batch session_window computation, and still-open
sessions must not emit."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.streaming.sessions import SESSION_GAP, session_stream

WATERMARK = "1 hour"


def test_sessions_match_batch_for_closed_sessions(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")

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
        session_stream(stream, watermark_delay=WATERMARK)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM sessions_test").collect()
    max_ts = ev.agg(F.max("ts")).first()[0]
    watermark_ts = max_ts - dt.timedelta(hours=1)

    batch = (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
        if r["session_end"] <= watermark_ts
    }
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["total_value"])
        for r in emitted
    }
    assert len(expected) > 0
    for key, vals in expected.items():
        assert key in got, key
        assert got[key][0] == vals[0], key
        assert abs(got[key][1] - float(vals[1])) < 1e-4, key
    assert len(emitted) == len(got)
    for key in got:
        assert key[2] <= watermark_ts, f"open session emitted: {key}"
