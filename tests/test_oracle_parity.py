"""Every registered (query, oracle) pair must match exactly at sf0.001 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from helium_arango_etl_spark.registry import ORACLE, QUERIES

from .parity import assert_parity, check_driver_safe


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_parity(spark, sf_dir, name):
    assert name in QUERIES, f"oracle {name} has no spark query"
    assert_parity(spark, QUERIES[name], ORACLE[name], sf_dir, name=name)


def test_every_query_runs_and_is_driver_safe(spark, sf_dir):
    """Rows-only queries skip the oracle compare but still pass through the
    driver's pandas canonicalizer — lint every registry output surface for
    the cell types that crash or hash-diverge there (CORRECTNESS_r01:
    image_features/audio_features err'd on list cells)."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
        check_driver_safe(df.limit(50).toPandas(), name=name)
