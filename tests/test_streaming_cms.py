"""Streaming CMS: counters accumulated across micro-batches must equal
the one-pass batch sketch (mergeability through the real streaming
path), estimates must match operators/sketch.cms_token_counts, and the
merge must be idempotent under at-least-once replay."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.registry import QUERIES
from helium_arango_etl_spark.streaming.cms import (
    batch_counters,
    estimates_from_state,
    merge_batch,
    run_cms_stream,
)
from helium_arango_etl_spark.streaming.state import VersionedState


def test_streamed_cms_equals_batch(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")

    src_dir = str(tmp_path / "src")
    ordered = docs.withColumn("b", F.ntile(3).over(Window.orderBy("doc_id")))
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
    q = run_cms_stream(stream, spark, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # streamed counter table == one-pass counter table, cell for cell
    streamed = sorted(map(tuple, VersionedState(spark, state).read().collect()))
    one_pass = sorted(map(tuple, batch_counters(docs).collect()))
    assert streamed == one_pass

    # served estimates == the batch sketch's estimates for every token
    tokens = (
        QUERIES["cms_token_counts"](spark, sf_dir)
        .select("token", "cms_estimate")
        .collect()
    )
    served = {
        r["token"]: r["cms_estimate"]
        for r in estimates_from_state(
            spark, state, spark.createDataFrame([(t["token"],) for t in tokens], "token string")
        ).collect()
    }
    for t in tokens:
        assert served[t["token"]] == t["cms_estimate"], t["token"]

    # unseen token estimates 0 (all-cells-missing path)
    unseen = estimates_from_state(
        spark, state, spark.createDataFrame([("zzz-never-seen",)], "token string")
    ).collect()[0]
    assert unseen["cms_estimate"] >= 0  # CMS may collide, never negative


def test_cms_merge_idempotent(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    state = str(tmp_path / "state")
    assert merge_batch(spark, state, docs.limit(50), 0) is True
    before = sorted(map(tuple, VersionedState(spark, state).read().collect()))
    assert merge_batch(spark, state, docs.limit(50), 0) is False
    assert sorted(map(tuple, VersionedState(spark, state).read().collect())) == before
