"""Streaming PSI drift monitor — the distributional complement of the
CUSUM rate detector, maintained incrementally.

The FIRST committed micro-batch freezes the reference: its decile
boundaries and bin counts persist in the state (rows tagged 'bound' /
'ref').  Every later batch bins its values against those frozen
boundaries and merges into the accumulating 'cur' counts.  Serving
computes PSI(cur || ref) per bin with the exact-integer-ratio ln
discipline shared with the batch `psi_drift`.  State is 'bound' + 'ref'
+ 'cur' rows — O(bins), regardless of stream length; same VersionedState
durability contract (replayed batch_ids skip, restarts resume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rangeops import WOE_BINS
from .state import VersionedState


def _cents(events: DataFrame) -> DataFrame:
    return events.select(
        F.expr("cast(floor(value * 100) as bigint)").alias("cents")
    )


def _boundaries(events: DataFrame) -> DataFrame:
    qs = ", ".join(str(i / WOE_BINS) for i in range(1, WOE_BINS))
    return (
        _cents(events)
        .agg(F.expr(f"percentile(cents, array({qs}))").alias("bs"))
        .select(
            F.posexplode(
                F.expr("transform(bs, x -> cast(round(x * 100) as bigint))")
            ).alias("bin", "n")
        )
        .select(F.lit("bound").alias("part"), (F.col("bin") + 1).alias("bin"), "n")
    )


def _bin_counts(events: DataFrame, bounds: DataFrame, part: str) -> DataFrame:
    """Bin value-cents against frozen centi-cent boundaries."""
    barr = bounds.orderBy("bin").agg(
        F.expr("transform(sort_array(collect_list(struct(bin, n))), s -> s.n)")
        .alias("bs")
    )
    bin_expr = "1 + " + " + ".join(
        f"IF(cents * 100 > element_at(bs, {i}), 1, 0)" for i in range(1, WOE_BINS)
    )
    return (
        _cents(events)
        .crossJoin(F.broadcast(barr))
        .select(F.expr(bin_expr).cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit(part).alias("part"), "bin", "n")
    )


def merge_batch(
    spark: SparkSession, state_path: str, batch_events: DataFrame, batch_id: int
) -> bool:
    """Idempotently merge one micro-batch (replayed batch_ids skipped).
    The first commit freezes boundaries + reference counts."""
    store = VersionedState(spark, state_path)
    if (last := store.last_batch_id()) is not None and batch_id <= last:
        return False
    state = store.read()
    if state is None:
        bounds = _boundaries(batch_events)
        counts = _bin_counts(batch_events, bounds, "ref")
        cur = counts.withColumn("part", F.lit("cur"))
        return store.commit(bounds.unionByName(counts).unionByName(cur), batch_id)
    bounds = state.filter(F.col("part") == "bound")
    keep = state.filter(F.col("part") != "cur")
    cur = (
        state.filter(F.col("part") == "cur")
        .unionByName(_bin_counts(batch_events, bounds, "cur"))
        .groupBy("part", "bin")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    return store.commit(keep.unionByName(cur), batch_id)


def run_psi_stream(
    events_stream: DataFrame, spark: SparkSession, state_path: str, checkpoint: str
):
    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(spark, state_path, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def psi_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """PSI(cur || ref) per bin — the exact-integer-ratio ln discipline of
    the batch `psi_drift`."""
    state = VersionedState(spark, state_path).read()
    if state is None:
        raise FileNotFoundError(f"no committed PSI state at {state_path}")
    b = WOE_BINS
    ref = state.filter(F.col("part") == "ref").select(
        "bin", F.col("n").alias("n_a")
    )
    cur = state.filter(F.col("part") == "cur").select(
        "bin", F.col("n").alias("n_b")
    )
    j = ref.join(cur, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    tot = j.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    ratio = (
        f"(2 * n_a + 1) * (2 * tb + {b})"
        f" / cast((2 * ta + {b}) * (2 * n_b + 1) as double)"
    )
    pa = f"(2 * n_a + 1) / cast(2 * ta + {b} as double)"
    pb = f"(2 * n_b + 1) / cast(2 * tb + {b} as double)"
    return (
        j.crossJoin(F.broadcast(tot))
        .withColumn(
            "lr_micro", F.expr(f"cast(round(ln({ratio}) * 1000000) as bigint)")
        )
        .select(
            "bin",
            "n_a",
            "n_b",
            F.round(F.expr(f"({pa} - {pb}) * (lr_micro / 1e6)"), 6).alias("psi_term"),
        )
    )
