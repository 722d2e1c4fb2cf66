"""Custom DataSource (paged_api): partition planning, determinism,
parallel-read equivalence with the serial page loop."""

from __future__ import annotations

from helium_arango_etl_spark.sources.paged_api import (
    PagedApiDataSource,
    _fetch_page,
    _PagedApiReader,
)


def _read(spark, **opts):
    spark.dataSource.register(PagedApiDataSource)
    r = spark.read.format("paged_api")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partition_planning_covers_range_disjointly():
    rdr = _PagedApiReader(
        {"start_height": 0, "end_height": 10_000, "num_partitions": 7}
    )
    parts = rdr.partitions()
    assert len(parts) == 7
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 10_000
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2  # contiguous, disjoint


def test_parallel_read_equals_serial_pages(spark):
    df = _read(
        spark, start_height=100, end_height=2_100, page_size=256,
        num_partitions=5,
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(_fetch_page(100, 2_100))
    assert got == want
    assert df.rdd.getNumPartitions() == 5


def test_deterministic_across_reads(spark):
    a = sorted(map(tuple, _read(spark, end_height=500).collect()))
    b = sorted(map(tuple, _read(spark, end_height=500).collect()))
    assert a == b and len(a) == 500
