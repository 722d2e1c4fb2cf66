"""Streaming follower tests (L1/L4/L5): the availableNow stream must produce
exactly the batch backfill's payments table, and a checkpointed re-run must
be a no-op."""

from __future__ import annotations

from helium_arango_etl_spark.plans.sync import build_payments, read_collection
from helium_arango_etl_spark.streaming.follower import evict_witnesses, follow_payments


def _hash(df):
    cols = sorted(df.columns)
    return sorted(str(tuple(str(r[c]) for c in cols)) for r in df.collect())


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    follow_payments(spark, sf_dir, out, ckpt)  # availableNow backfill
    streamed = read_collection(spark, out, "payments")
    batch = build_payments(spark, sf_dir).dropDuplicates(["_key"])
    assert _hash(streamed) == _hash(batch)


def test_checkpointed_rerun_is_noop(spark, sf_dir, tmp_path):
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    follow_payments(spark, sf_dir, out, ckpt)
    h1 = _hash(read_collection(spark, out, "payments"))
    follow_payments(spark, sf_dir, out, ckpt)  # same checkpoint: no new files
    h2 = _hash(read_collection(spark, out, "payments"))
    assert h1 == h2


def test_retention_eviction(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    from helium_arango_etl_spark.plans.sync import build_witnesses, sync_inventories

    out = str(tmp_path / "store")
    sync_inventories(spark, sf_dir, out)
    before = read_collection(spark, out, "witnesses")
    cutoff = before.agg(F.expr("percentile(unix_timestamp(time), 0.5)")).first()[0]
    import datetime

    cutoff_ts = datetime.datetime.utcfromtimestamp(cutoff)
    n_keep = before.filter(F.col("time") >= F.lit(cutoff_ts)).count()
    evict_witnesses(spark, out, cutoff_ts)
    after = read_collection(spark, out, "witnesses")
    assert after.count() == n_keep > 0
