"""The reference's polling follower (etl.py:132-149) re-expressed as
Structured Streaming.

Mapping (SURVEY.md §2.L):
- L1 bounded backfill          -> ``trigger(availableNow=True)`` one-shot stream
- L2 poll every 1200 s         -> ``trigger(processingTime='1200 seconds')``
- L3 5-day witness retention   -> recompute filter per refresh (apply_retention);
                                  in a true stream: withWatermark + state TTL
- L4 idempotent re-sync        -> content-hash keys + first-write-wins merge in
                                  ``foreachBatch``
- L5 sync-height cursor        -> the stream checkpoint (exactly-once source
                                  tracking for free)

The micro-batch sink is the same ``merge_ignore`` plan the batch backfill
uses — streaming and batch share one code path, which is the point of the
Spark rewrite: the reference implements this machinery by hand (cursor
advance, chunk loops, multiprocessing); here it is configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import arango_id, content_key


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.  ``ts`` is normalized
    schema-adaptively (epoch-nanos long or native timestamp — same
    convention as io.read_table)."""
    from ..io import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    return normalize_event_ts(stream)


def payments_from_stream(events: DataFrame) -> DataFrame:
    """The same payment-edge extraction the batch plan uses
    (plans.sync.build_payments), applied to a streaming DataFrame —
    identical column logic, no code fork."""
    fields = F.from_json(F.col("props"), "k INT")
    return events.filter(F.col("event_type").isin("purchase", "signup")).select(
        content_key(F.col("event_id"), F.col("user_id"), fields["k"]).alias("_key"),
        arango_id("accounts", F.col("user_id")).alias("_from"),
        arango_id("accounts", F.pmod(F.col("user_id") * 7 + fields["k"], F.lit(1000))).alias("_to"),
        fields["k"].alias("amount"),
        F.col("ts").alias("time"),
    )


def follow_payments(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    processing_time: str | None = None,
) -> None:
    """Run the follower: stream events -> payment edges -> idempotent merge
    per micro-batch.  ``processing_time=None`` runs availableNow (bounded
    backfill, L1); a value like '1200 seconds' reproduces the reference's
    poll cadence (L2)."""
    from ..plans.sync import _write_merged

    os.makedirs(out_dir, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _write_merged(batch_df.sparkSession, out_dir, "payments", batch_df, "ignore")

    writer = payments_from_stream(_events_stream(spark, sf_dir)).writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is None:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:
        writer.trigger(processingTime=processing_time).start()


def evict_witnesses(spark: SparkSession, out_dir: str, cutoff) -> None:
    """L3 retention: rewrite the witnesses collection keeping rows at/after
    the cutoff (reference: AQL remove, arango_queries.py:90-99)."""
    import shutil
    import tempfile

    from ..io import apply_retention

    path = os.path.join(out_dir, "witnesses")
    df = apply_retention(spark.read.parquet(path), "time", cutoff)
    staging = tempfile.mkdtemp(prefix="witnesses_", dir=out_dir)
    df.write.mode("overwrite").parquet(os.path.join(staging, "data"))
    shutil.rmtree(path)
    shutil.move(os.path.join(staging, "data"), path)
    shutil.rmtree(staging, ignore_errors=True)
