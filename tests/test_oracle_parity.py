"""Every registered (query, oracle) pair must match exactly at sf0.001 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from helium_arango_etl_spark.registry import ORACLE, QUERIES

from .parity import assert_parity


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_parity(spark, sf_dir, name):
    assert name in QUERIES, f"oracle {name} has no spark query"
    assert_parity(spark, QUERIES[name], ORACLE[name], sf_dir, name=name)


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
