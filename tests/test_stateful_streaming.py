"""applyInPandasWithState: per-account running balance must accumulate
across micro-batches and converge to the batch aggregate."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.streaming.stateful import running_balance


def test_running_balance_accumulates_across_batches(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("user_id", "value", "ts")

    # split events into 3 files -> 3 micro-batches (maxFilesPerTrigger=1)
    src_dir = str(tmp_path / "stream_src")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src_dir)
    n_files = len([f for f in os.listdir(src_dir) if f.endswith(".parquet")])
    assert n_files == 3

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        running_balance(stream)
        .writeStream.format("memory")
        .queryName("running_balance_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    updates = spark.sql("SELECT * FROM running_balance_test")
    # one update row per (user, batch-with-activity); at least one user must
    # appear in >1 batch or the cross-batch claim is untested
    per_user_updates = updates.groupBy("user_id").count()
    assert per_user_updates.filter(F.col("count") > 1).count() > 0

    # final state per user = the update with the highest n_events
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        updates.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    expected = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        (F.unix_micros(F.max("ts"))).alias("last_ts_micros"),
    )
    got = {r["user_id"]: r for r in final.collect()}
    for r in expected.collect():
        g = got[r["user_id"]]
        assert g["n_events"] == r["n_events"], r["user_id"]
        assert abs(g["total_value"] - float(r["total_value"])) < 1e-4, r["user_id"]
        assert g["last_ts_micros"] == r["last_ts_micros"], r["user_id"]


def test_versioned_state_crash_between_write_and_pointer_swap(spark, tmp_path):
    """Exactly-once under the worst crash point: the next version's parquet
    directory is fully written but the process dies BEFORE the atomic
    ``_LATEST`` pointer swap.  A restarted reader must still see the last
    COMMITTED version, the replayed batch must recommit cleanly over the
    orphan directory, and retention pruning must eventually remove it."""
    from helium_arango_etl_spark.streaming.state import VersionedState

    path = str(tmp_path / "state")
    st = VersionedState(spark, path)

    def df_of(vals):
        return spark.createDataFrame([(v,) for v in vals], "x int")

    assert st.commit(df_of([1]), batch_id=1)
    assert st.commit(df_of([2]), batch_id=2)

    # crash emulation: v3 parquet lands, pointer swap never happens
    orphan_dir = st._version_dir(3)
    df_of([99]).write.mode("overwrite").parquet(orphan_dir)
    assert os.path.isdir(orphan_dir)

    # restart: a fresh instance must ignore the orphan entirely
    st2 = VersionedState(spark, path)
    assert st2.last_batch_id() == 2
    assert [r["x"] for r in st2.read().collect()] == [2]

    # the replayed batch 3 recommits OVER the orphan (overwrite mode),
    # so the poisoned content never becomes visible
    assert st2.commit(df_of([3]), batch_id=3)
    assert st2.last_batch_id() == 3
    assert [r["x"] for r in st2.read().collect()] == [3]

    # a replay of an already-committed batch is a no-op after the recovery
    assert not st2.commit(df_of([42]), batch_id=3)
    assert [r["x"] for r in st2.read().collect()] == [3]

    # retention: two more commits prune everything older than v{n-1}
    assert st2.commit(df_of([4]), batch_id=4)
    assert st2.commit(df_of([5]), batch_id=5)
    assert not os.path.isdir(st2._version_dir(1))
    assert not os.path.isdir(st2._version_dir(2))
    assert not os.path.isdir(st2._version_dir(3))
    assert os.path.isdir(st2._version_dir(4))  # kept for in-flight readers
    assert [r["x"] for r in st2.read().collect()] == [5]
