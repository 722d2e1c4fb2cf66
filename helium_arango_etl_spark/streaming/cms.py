"""Streaming count-min token counter — the mergeable CMS
(operators/sketch.cms_token_counts) maintained incrementally over a
document stream, the heavy-hitters telemetry a 100 TB/day ingest keeps
instead of an unbounded exact token table.

Each micro-batch folds its tokens to the CMS_D x CMS_W counter table (a
few hundred rows, regardless of batch size) and merges into the durable
state by cell-wise addition — CMS's defining mergeability.  State lives
in a :class:`.state.VersionedState`, so replayed batches are skipped and
a restarted stream resumes from the committed counters (same durability
contract as streaming/quantiles.py).

Estimates are served on demand: a query-side token list hashes to its
cells and takes the min across rows — never touching the stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import CMS_CELL_EXPR, CMS_D
from ..operators.textops import TOKS
from .state import VersionedState


def batch_counters(docs: DataFrame) -> DataFrame:
    """Fold one micro-batch of documents to its (d, cell, cnt) counter
    delta: tokenize, count per token (map-side combine), then scatter
    each token's count into its CMS_D cells."""
    toks = (
        docs.select(F.explode(F.expr(TOKS)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("d")
    return (
        toks.select("token", "n", d)
        .withColumn("cell", F.expr(CMS_CELL_EXPR))
        .groupBy("d", "cell")
        .agg(F.sum("n").alias("cnt"))
    )


def merge_counters(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Cell-wise add a batch delta into the counter table."""
    if state is None:
        return delta
    return (
        state.unionByName(delta).groupBy("d", "cell").agg(F.sum("cnt").alias("cnt"))
    )


def merge_batch(
    spark: SparkSession, state_path: str, batch_docs: DataFrame, batch_id: int
) -> bool:
    """Idempotently merge one micro-batch (replayed batch_ids skipped)."""
    store = VersionedState(spark, state_path)
    if (last := store.last_batch_id()) is not None and batch_id <= last:
        return False
    return store.commit(merge_counters(store.read(), batch_counters(batch_docs)), batch_id)


def run_cms_stream(
    docs_stream: DataFrame, spark: SparkSession, state_path: str, checkpoint: str
):
    """foreachBatch ingest into the versioned CMS counter state."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(spark, state_path, batch_df, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def estimates_from_state(
    spark: SparkSession, state_path: str, tokens: DataFrame
) -> DataFrame:
    """Serve per-token count estimates from the committed counters:
    hash each queried token to its CMS_D cells, join the (tiny,
    broadcast) counter table, min across rows.  Missing cells count 0
    (token never seen).  `tokens` needs a single `token` column."""
    state = VersionedState(spark, state_path).read()
    if state is None:
        raise FileNotFoundError(f"no committed CMS state at {state_path}")
    d = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("d")
    cells = tokens.select("token", d).withColumn("cell", F.expr(CMS_CELL_EXPR))
    return (
        cells.join(F.broadcast(state), ["d", "cell"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cms_estimate"))
    )
