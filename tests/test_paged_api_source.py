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


def test_stream_reader_matches_batch_and_is_exactly_once(spark, tmp_path):
    """The streaming half must deliver exactly the batch rows for the
    same height range (offsets fully determine content).  availableNow
    drains one prefetched microbatch per run, so the poll loop is
    REPEATED availableNow runs over one checkpoint — which also proves
    exactly-once across restarts: re-running after the tip is reached
    appends nothing."""
    from helium_arango_etl_spark.sources.paged_api import PagedApiDataSource

    try:
        spark.dataSource.register(PagedApiDataSource)
    except Exception:
        pass  # already registered by the batch test in this session
    tip = 2_500
    out = str(tmp_path / "blocks")
    ckpt = str(tmp_path / "ckpt")

    def drain_once():
        stream = (
            spark.readStream.format("paged_api")
            .option("start_height", 0)
            .option("tip_height", tip)
            .option("max_blocks_per_batch", 1_000)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).count()

    counts = [drain_once() for _ in range(5)]
    assert counts[-1] == tip
    assert counts[-2] == tip  # idempotent once drained: restart adds nothing
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    batch = sorted(
        map(
            tuple,
            spark.read.format("paged_api")
            .option("start_height", 0)
            .option("end_height", tip)
            .load()
            .collect(),
        )
    )
    assert got == batch  # streaming == batch for the same range
