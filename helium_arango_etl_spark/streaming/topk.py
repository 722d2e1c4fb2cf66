"""Streaming heavy hitters via the Space-Saving sketch
(Metwally, Agrawal & El Abbadi 2005) over ``applyInPandasWithState``.

The batch engine answers "top users by activity" exactly
(`topk_accounts`, F4); a stream cannot hold per-user counts for an
unbounded key domain.  Space-Saving keeps a CAPACITY-bounded counter
table per group: an unseen key evicts the current minimum counter and
INHERITS its count (recording that inherited amount as the entry's
error bound).  Guarantees: every true count ≤ its estimate, and
estimate − error ≤ true count; any key with true frequency >
N/capacity is guaranteed present — the classic heavy-hitter contract
with O(capacity) state per group, independent of stream length.

State layout per group (event_type): three parallel arrays
(keys, counts, errors) — flat Arrow-serializable state, no maps.
Per-batch work: fold the micro-batch's pre-aggregated counts into the
table (pure-Python over O(capacity + batch-distinct) items, Arrow in
and out — never row-at-a-time over the raw stream).

At 100 TB scale this is the standard two-level design: per-partition
Space-Saving tables are THEMSELVES mergeable (merge = fold one table's
(key, count, error) entries into the other), so a cluster runs one
table per shuffle partition and folds into the per-group table —
identical contract, parallel state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CAPACITY = 8  # counters kept per group

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("est_count", LongType()),
        StructField("max_error", LongType()),
        StructField("rank", LongType()),
        # which fold produced this row: consumers (and tests) read the
        # CURRENT table as the rows with the group's max batch_seq —
        # update-mode sinks accumulate every batch's emission
        StructField("batch_seq", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errors", ArrayType(LongType())),
        StructField("n_batches", LongType()),
    ]
)


def _space_saving_fold(
    table: dict[int, tuple[int, int]], key: int, inc: int, capacity: int
) -> None:
    """Fold one (key, count) increment into a space-saving table of
    {key: (count, error)} with at most `capacity` entries."""
    if key in table:
        c, e = table[key]
        table[key] = (c + inc, e)
    elif len(table) < capacity:
        table[key] = (inc, 0)
    else:
        # evict the minimum counter; deterministic tie-break on key so
        # replays/checkpoint recoveries reproduce the same table
        evict = min(table, key=lambda k: (table[k][0], k))
        min_c, _ = table[evict]
        del table[evict]
        table[key] = (min_c + inc, min_c)


def _make_fold(capacity: int):
    """Build the fold with capacity CAPTURED in the closure — executors
    deserialize the closure, so the value travels with the plan (a
    module global would re-resolve to the import-time default on the
    worker)."""

    def _fold_topk(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        return _fold_topk_impl(key, pdfs, state, capacity)

    return _fold_topk


def _fold_topk_impl(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    capacity: int,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        ks, cs, es, seq = state.get
        table = {int(k): (int(c), int(e)) for k, c, e in zip(ks, cs, es)}
        seq = int(seq)
    else:
        table = {}
        seq = 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        # pre-aggregate the batch (vectorized), then fold the distinct
        # keys in deterministic order
        batch = pdf.groupby("user_id").size().sort_index()
        for uid, inc in batch.items():
            _space_saving_fold(table, int(uid), int(inc), capacity)
    items = sorted(table.items(), key=lambda kv: (-kv[1][0], kv[0]))
    seq += 1
    state.update(
        (
            [k for k, _ in items],
            [c for _, (c, _) in items],
            [e for _, (_, e) in items],
            seq,
        )
    )
    yield pd.DataFrame(
        [
            (key[0], k, c, e, i + 1, seq)
            for i, (k, (c, e)) in enumerate(items)
        ],
        columns=[
            "event_type",
            "user_id",
            "est_count",
            "max_error",
            "rank",
            "batch_seq",
        ],
    )


def heavy_hitters(
    events_stream: DataFrame,
    timeout: str = GroupStateTimeout.NoTimeout,
    capacity: int | None = None,
) -> DataFrame:
    """Per-event-type streaming heavy hitters: capacity-bounded
    Space-Saving counters maintained across micro-batches, emitting the
    current ranked estimate table after each batch."""
    return (
        events_stream.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _make_fold(CAPACITY if capacity is None else capacity),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
