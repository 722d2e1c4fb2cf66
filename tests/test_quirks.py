"""Quirk-pinning tests (SURVEY.md §5 item 5): the reference's deliberate
oddities are reproduced consciously, so a future "fix" must change a test."""

from __future__ import annotations

from pyspark.sql import functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.operators.relational import (
    payment_shape_dispatch,
    payment_v2_exploded,
)


def test_payment_v2_first_payee_quirk(spark, sf_dir):
    """payment_v2 dispatch takes payments[0] ONLY (blockchain_queries.py:
    253-257) — the exploded variant must surface strictly more rows."""
    n_events = read_table(spark, sf_dir, "events").count()
    n_odd = read_table(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 1).count()

    dispatch = payment_shape_dispatch(spark, sf_dir)
    exploded = payment_v2_exploded(spark, sf_dir)

    assert dispatch.count() == n_events  # one row per tx, tail dropped
    assert exploded.count() == n_events + n_odd  # v2 txs fan out to 2 rows

    # the dropped tail rows are exactly the payment_idx=1 rows
    tail = exploded.filter(F.col("payment_idx") == 1)
    assert tail.count() == n_odd
    # and the surviving dispatch rows agree with the exploded idx=0 rows
    head = exploded.filter(F.col("payment_idx") == 0).drop("payment_idx")
    assert dispatch.exceptAll(head).count() == 0


def test_strict_window_seam_quirk(spark, sf_dir):
    """B2: both time bounds strict — a row exactly at a chunk seam is
    skipped (blockchain_queries.py:174).  Pinned by construction: filtering
    (a, b) then (b, c) loses rows with ts == b vs one (a, c) pass."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
    seam = ev.agg(F.max("ts")).first()[0]
    lo = ev.agg(F.min("ts")).first()[0]
    one_pass = ev.filter((F.col("ts") > F.lit(lo)) & (F.col("ts") < F.lit(seam))).count()
    left = ev.filter((F.col("ts") > F.lit(lo)) & (F.col("ts") < F.lit(seam)))
    right = ev.filter((F.col("ts") > F.lit(seam)) & (F.col("ts") < F.lit(seam)))
    assert left.count() + right.count() == one_pass  # seam row (ts==seam) lost by both chunks
    assert ev.filter(F.col("ts") == F.lit(seam)).count() >= 1
