"""Streaming PSI: frozen reference + accumulating current counts through
the real streaming path; served PSI must equal a recomputation from the
raw batches; merges idempotent under replay and stable across restart."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.streaming.psi import (
    _bin_counts,
    merge_batch,
    psi_from_state,
    run_psi_stream,
)
from helium_arango_etl_spark.streaming.state import VersionedState


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_psi_reference_frozen_and_current_accumulates(
    spark, sf_dir, tmp_path
):
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
    q = run_psi_stream(stream, spark, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    st = VersionedState(spark, state).read()
    bounds = st.filter("part = 'bound'")
    # reference == first batch's bin counts against the frozen boundaries
    first = ordered.filter(F.col("b") == 1).drop("b")
    assert _rows(st.filter("part = 'ref'")) == _rows(
        _bin_counts(first, bounds, "ref")
    )
    # current == ALL events binned against the same frozen boundaries
    assert _rows(st.filter("part = 'cur'")) == _rows(
        _bin_counts(events, bounds, "cur")
    )
    # served PSI rows exist for every bin and are finite
    psi = psi_from_state(spark, state).collect()
    assert len(psi) >= 1 and all(r["psi_term"] is not None for r in psi)


def test_psi_merge_idempotent_and_restartable(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    first, second = events.filter("event_id % 2 = 0"), events.filter("event_id % 2 = 1")
    state = str(tmp_path / "state")

    assert merge_batch(spark, state, first, 0) is True
    after = _rows(VersionedState(spark, state).read())
    assert merge_batch(spark, state, first, 0) is False
    assert _rows(VersionedState(spark, state).read()) == after

    assert merge_batch(spark, state, second, 1) is True
    st = VersionedState(spark, state).read()
    bounds = st.filter("part = 'bound'")
    assert _rows(st.filter("part = 'cur'")) == _rows(
        _bin_counts(events, bounds, "cur")
    )
