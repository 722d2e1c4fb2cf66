"""Stream-stream interval join: the streaming attribution pairs must
exactly equal the batch range join's pre-dedup match set, and the
last-touch batch pick (promo_attribution) must be a subset of them."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.operators.temporal import ATTR_WINDOW_US
from helium_arango_etl_spark.registry import QUERIES
from helium_arango_etl_spark.streaming.range_join import attribution_stream


def test_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    # time-ordered files so event time advances across micro-batches
    src_dir = str(tmp_path / "stream_src")
    ordered = ev.orderBy("ts").withColumn(
        "bucket", F.ntile(3).over(Window.orderBy("ts"))
    )
    for i in range(1, 4):
        ordered.filter(F.col("bucket") == i).drop("bucket").coalesce(1).write.mode(
            "append" if i > 1 else "overwrite"
        ).parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema

    def stream_of(event_type):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .filter(F.col("event_type") == event_type)
        )

    q = (
        attribution_stream(stream_of("signup"), stream_of("purchase"))
        .writeStream.format("memory")
        .queryName("attr_pairs_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["event_id"], r["promo_id"], r["delay_us"], r["value"])
        for r in spark.sql("SELECT * FROM attr_pairs_test").collect()
    }

    promos = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("promo_id"),
        F.col("user_id").alias("promo_user"),
        F.unix_micros("ts").alias("w_start"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "value"
    )
    expected = {
        (r["event_id"], r["promo_id"], r["delay_us"], r["value"])
        for r in probes.join(
            promos,
            (probes.user_id == promos.promo_user)
            & (probes.us >= promos.w_start)
            & (probes.us < promos.w_start + ATTR_WINDOW_US),
        )
        .select(
            "event_id",
            "promo_id",
            (F.col("us") - F.col("w_start")).cast("bigint").alias("delay_us"),
            F.col("value").cast("double").alias("value"),
        )
        .collect()
    }

    assert len(expected) > 0
    assert got == expected

    # the batch last-touch pick is one pair per purchase, drawn from this set
    last_touch = {
        (r["event_id"], r["promo_id"], r["delay_us"], r["value"])
        for r in QUERIES["promo_attribution"](spark, sf_dir).collect()
    }
    assert last_touch <= got
    purchase_ids = {e for e, _, _, _ in got}
    assert len(last_touch) == len({e for e, _, _, _ in last_touch})
    assert {e for e, _, _, _ in last_touch} == purchase_ids
