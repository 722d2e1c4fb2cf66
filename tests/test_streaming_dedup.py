"""Watermarked streaming dedup: replayed events inside the watermark must
be dropped; every original must survive exactly once."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.streaming.dedup import dedup_event_stream


def test_stream_dedup_drops_replays_within_watermark(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")

    # 2 time-ordered batches, then a third batch REPLAYING half of batch 2
    # (same event_ids, same timestamps — the chain-follower re-serve case)
    src_dir = str(tmp_path / "dedup_src")
    ordered = ev.orderBy("ts").withColumn("bucket", F.ntile(2).over(Window.orderBy("ts")))
    for i in range(1, 3):
        ordered.filter(F.col("bucket") == i).drop("bucket").coalesce(1).write.mode(
            "append" if i > 1 else "overwrite"
        ).parquet(src_dir)
    replay = ordered.filter((F.col("bucket") == 2) & (F.col("event_id") % 2 == 0)).drop(
        "bucket"
    )
    n_replayed = replay.count()
    assert n_replayed > 0
    replay.coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        dedup_event_stream(stream, watermark_delay="10 days")
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT event_id FROM dedup_stream_test").collect()
    ids = [r.event_id for r in out]
    assert len(ids) == len(set(ids)), "a replayed event_id was emitted twice"
    assert set(ids) == {r.event_id for r in ev.collect()}, "an original event was lost"
