"""SparkSession factory tuned for this engine.

Defaults chosen for correctness-at-scale first, local testing second:

- AQE on (runtime join-strategy selection, shuffle coalescing, skew-join
  splitting) — replaces the reference's hand-rolled process-level
  parallelism (arango_queries.py:322-349 time-slicing, :184-208 city
  chunking) with Spark's own planner.
- Arrow on — every Python crossing (applyInPandas graph metrics) is
  vectorized, never row-at-a-time.
- Session timezone pinned to UTC — the reference stores unix seconds and
  timezone-aware timestamps (blockchain_tables.py:123, 196); pinning avoids
  local-tz drift between engines and between executors.
- ``spark.sql.shuffle.partitions`` kept modest for local[{N}] test runs; on a
  real cluster AQE's coalescing makes the static number mostly irrelevant,
  but we still set initialPartitionNum high so AQE can split heavy stages.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "helium-arango-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_for_scale(spark: SparkSession, target_bytes: int) -> None:
    """Adjust partition sizing for a known input volume.

    At 100 TB the defaults that matter are max partition bytes (scan split
    size) and the AQE advisory target; both keep per-task memory bounded so
    shuffles spill predictably instead of OOMing.
    """
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    parts = max(32, target_bytes // (128 * 1024 * 1024))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", str(parts))
