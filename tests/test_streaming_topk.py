"""Space-Saving streaming heavy hitters: cross-batch state, the
estimate/error guarantees, and exactness when capacity covers the key
domain."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.streaming import topk
from helium_arango_etl_spark.streaming.topk import heavy_hitters


def _run_stream(spark, tmp_path, ev, capacity=None):
    src_dir = str(tmp_path / "stream_src")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src_dir)
    assert (
        len([f for f in os.listdir(src_dir) if f.endswith(".parquet")]) == 3
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        heavy_hitters(stream, capacity=capacity)
        .writeStream.format("memory")
        .queryName("topk_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update-mode memory sink accumulates every batch's emission; the
    # CURRENT table is the max-batch_seq slice per group
    out = spark.sql(
        """SELECT * FROM topk_test t
           WHERE batch_seq = (SELECT max(batch_seq) FROM topk_test
                              WHERE event_type = t.event_type)"""
    )
    return out.toPandas()


def test_space_saving_guarantees(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    final = _run_stream(spark, tmp_path, ev)
    truth = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .toPandas()
    )
    tmap = {
        (r.event_type, r.user_id): r.true_count
        for r in truth.itertuples()
    }
    totals = truth.groupby("event_type").true_count.sum().to_dict()
    assert len(final)
    for r in final.itertuples():
        true = tmap.get((r.event_type, r.user_id), 0)
        # overestimate-only, bounded by the recorded error
        assert r.est_count >= true
        assert r.est_count - r.max_error <= true
        assert r.est_count <= totals[r.event_type]
    # per group at most CAPACITY rows survive
    assert final.groupby("event_type").size().max() <= topk.CAPACITY


def test_exact_when_capacity_covers_domain(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    n_users = ev.select("user_id").distinct().count()
    final = _run_stream(spark, tmp_path, ev, capacity=n_users + 1)
    truth = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .toPandas()
    )
    tmap = {
        (r.event_type, r.user_id): r.true_count
        for r in truth.itertuples()
    }
    assert len(final) == len(tmap)
    for r in final.itertuples():
        assert r.est_count == tmap[(r.event_type, r.user_id)]
        assert r.max_error == 0
