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


class PagedApiDataSource(DataSource):
    """spark.read.format("paged_api") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _PagedApiReader(self.options)
