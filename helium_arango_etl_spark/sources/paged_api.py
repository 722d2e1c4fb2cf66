"""Custom PySpark DataSource: a partition-parallel PAGED-API reader.

The reference ingests by paginating a source in fixed-size batches from
a single cursor (BatchQueryGetter._update_slice,
/root/reference/src/blockchain_queries.py:57-70 — slice_start/slice_end
advance one batch at a time, strictly serially).  That design caps
ingest at one connection's throughput.  This source is the Spark-native
re-expression: the driver plans the key-range ONCE into N
InputPartitions (the reference's K1 time/height-domain decomposition,
SURVEY §2), and every executor fetches ITS page range in parallel —
reader parallelism is partition planning, not a faster loop.

The transport here is a deterministic synthetic page generator (this
container has no network), but the partition planning, option plumbing,
schema contract, and per-partition iteration are the real DataSource V2
surface — point ``_fetch_page`` at a real HTTP/DB client and nothing
else changes.

Usage::

    spark.dataSource.register(PagedApiDataSource)
    df = (spark.read.format("paged_api")
          .option("start_height", 0).option("end_height", 100_000)
          .option("page_size", 1000).option("num_partitions", 32)
          .load())
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("height", LongType(), False),
        StructField("block_hash", StringType(), False),
        StructField("time", LongType(), False),
        StructField("n_transactions", LongType(), False),
    ]
)


def _fetch_page(start: int, end: int):
    """One 'API page' of blocks [start, end) — deterministic synthetic
    content (md5-derived fields), standing in for the HTTP GET.  This is
    the ONLY function a real deployment replaces."""
    for h in range(start, end):
        d = hashlib.md5(f"block|{h}".encode()).hexdigest()
        yield (h, d, 1_600_000_000 + 60 * h, int(d[:4], 16) % 500)


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int
    page_size: int


class _PagedApiReader(DataSourceReader):
    def __init__(self, options):
        self.start = int(options.get("start_height", 0))
        self.end = int(options.get("end_height", 10_000))
        self.page_size = int(options.get("page_size", 1000))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self):
        """Plan the height range into contiguous per-executor slices —
        the K1 decomposition done ONCE at plan time."""
        total = max(0, self.end - self.start)
        n = max(1, min(self.num_partitions, total or 1))
        step = -(-total // n) if total else 1
        return [
            _RangePartition(s, min(s + step, self.end), self.page_size)
            for s in range(self.start, self.end, step)
        ] or [_RangePartition(self.start, self.end, self.page_size)]

    def read(self, partition: _RangePartition):
        """Each executor pages through ITS slice only — the reference's
        serial batch loop, run once per partition in parallel."""
        s = partition.start
        while s < partition.end:
            e = min(s + partition.page_size, partition.end)
            yield from _fetch_page(s, e)
            s = e


# ---------- streaming half: the follower poll loop as a stream source ----------
#
# The reference follows the chain tip by polling in a while loop
# (/root/reference/src/etl.py poll cadence, L1/L2 in SURVEY §2) and
# re-querying [cursor, tip) each wake.  As a Spark streaming source the
# same contract is declarative: the OFFSET is the cursor, each microbatch
# reads [offset, min(offset + max_batch, tip)), and exactly-once restart
# comes from the checkpoint instead of a hand-rolled cursor table.

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class _PagedApiStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.start = int(options.get("start_height", 0))
        self.tip = int(options.get("tip_height", 5_000))
        self.max_batch = int(options.get("max_blocks_per_batch", 1_000))

    def initialOffset(self):
        return {"height": self.start}

    def read(self, start):
        # rows are returned MATERIALIZED: the simple-reader protocol
        # pickles the prefetched batch through the driver cache, and a
        # generator cannot cross that boundary
        s = int(start["height"])
        e = min(s + self.max_batch, self.tip)
        if e <= s:
            return iter([]), {"height": s}
        return iter(list(_fetch_page(s, e))), {"height": e}

    def readBetweenOffsets(self, start, end):
        # replay path after restart: offsets fully determine the rows
        return iter(list(_fetch_page(int(start["height"]), int(end["height"]))))


class PagedApiDataSource(DataSource):
    """spark.read.format("paged_api") / spark.readStream.format("paged_api").

    Batch half: partition-parallel page fetch (module docstring).
    Streaming half: the reference's follower poll loop (etl.py cursor +
    poll cadence, SURVEY §2 L1/L2) as a checkpointed stream source —
    the OFFSET is the cursor, each microbatch reads
    [offset, min(offset + max_blocks_per_batch, tip_height)), and
    exactly-once restart comes from the checkpoint, not a hand-rolled
    cursor table.  Offsets fully determine rows, so replay is exact.
    """

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _PagedApiReader(self.options)

    def simpleStreamReader(self, schema):
        return _PagedApiStreamReader(self.options)


