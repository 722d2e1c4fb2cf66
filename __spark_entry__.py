"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7 Step 1) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``helium_arango_etl_spark.registry`` (one entry per implemented operator in
SURVEY.md §2; oracle SQL omitted only for non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from helium_arango_etl_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from helium_arango_etl_spark.operators.relational import rewards_5d

    return rewards_5d(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(registry.ORACLE)
