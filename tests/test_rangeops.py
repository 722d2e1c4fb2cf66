"""Banded range join + quantile surfaces: the band trick must equal the
naive inequality join, keep an equi-join plan (no nested loop), and the
approx scale path must track the exact quantiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.operators.rangeops import (
    WINDOW_DAYS,
    block_activity_7d,
    price_quantiles,
)

from .test_plan_quality import plan_of


def test_band_join_equals_naive_inequality_join(spark, sf_dir):
    fast = {
        r.height: (r.n_shipments, r.total_value)
        for r in block_activity_7d(spark, sf_dir).collect()
    }
    li = read_table(spark, sf_dir, "lineitem").select("l_shipdate", "l_orderkey", "l_extendedprice")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    naive = {
        r.o_orderkey: (r.n, r.v)
        for r in orders.join(
            li,
            (li.l_shipdate >= orders.o_orderdate)
            & (li.l_shipdate < orders.o_orderdate + F.expr(f"INTERVAL {WINDOW_DAYS} DAYS")),
            "left",
        )
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("v"),
        )
        .collect()
    }
    assert fast == naive


def test_band_join_plan_has_no_nested_loop(spark, sf_dir):
    """The whole point of banding: the plan must be a keyed join, never
    BroadcastNestedLoopJoin/CartesianProduct (what the naive inequality
    join plans as, which cannot scale fact-fact)."""
    plan = plan_of(block_activity_7d(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_every_block_keeps_a_row(spark, sf_dir):
    n_blocks = read_table(spark, sf_dir, "orders").count()
    out = block_activity_7d(spark, sf_dir)
    assert out.count() == n_blocks
    assert out.filter(F.col("n_shipments") == 0).count() >= 0  # zero rows allowed, never dropped


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """approx_percentile (t-digest, the 100 TB path) must land within 5%
    of the exact values — engine-specific, so tolerance-banded here
    instead of oracled."""
    exact = {r.l_returnflag: (r.p50, r.p90, r.p99) for r in price_quantiles(spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem")
    approx = {
        r.l_returnflag: (r.a50, r.a90, r.a99)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("a50"),
            F.expr("approx_percentile(l_extendedprice, 0.9, 1000)").alias("a90"),
            F.expr("approx_percentile(l_extendedprice, 0.99, 1000)").alias("a99"),
        )
        .collect()
    }
    for flag, ex in exact.items():
        for e, a in zip(ex, approx[flag]):
            assert abs(a - e) / e < 0.05, (flag, e, a)


def test_skyline_equals_naive_dominance(spark, sf_dir):
    """The one-pass RANGE-window skyline must equal the O(n²) pairwise
    dominance definition exactly (computed in numpy per group)."""
    import numpy as np

    from helium_arango_etl_spark.registry import QUERIES

    out = QUERIES["price_quantity_skyline"](spark, sf_dir).collect()
    from helium_arango_etl_spark.io import read_table
    from pyspark.sql import functions as F

    rows = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("price_c"),
            F.expr("cast(l_quantity as bigint)").alias("qty"),
        )
        .collect()
    )
    expect = set()
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r)
    for flag, grp in by_flag.items():
        p = np.array([g["price_c"] for g in grp])
        q = np.array([g["qty"] for g in grp])
        for i, g in enumerate(grp):
            dominated = (
                (p <= p[i]) & (q >= q[i]) & ((p < p[i]) | (q > q[i]))
            ).any()
            if not dominated:
                expect.add((flag, g["l_orderkey"], g["l_linenumber"]))
    got = {(r["l_returnflag"], r["l_orderkey"], r["l_linenumber"]) for r in out}
    assert got == expect
