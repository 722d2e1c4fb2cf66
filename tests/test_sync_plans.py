"""Pipeline-level golden + idempotency tests (SURVEY.md §5.3-5.4): the
reference's core operational guarantee is that re-syncs and chunked
backfills converge to identical collections (content-hash keys +
upsert/ignore sinks, etl.py:143-147)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helium_arango_etl_spark.plans.sync import (
    backfill_payments,
    build_hotspots,
    build_payments,
    read_collection,
    sync_inventories,
)


def _table_hash(df):
    cols = sorted(df.columns)
    return sorted(
        str(tuple(str(r[c]) for c in cols)) for r in df.collect()
    )


def test_full_sync_and_rerun_identical(spark, sf_dir, tmp_path):
    out = str(tmp_path / "store")
    sync_inventories(spark, sf_dir, out)
    first = {n: _table_hash(read_collection(spark, out, n)) for n in ("accounts", "hotspots", "cities", "balances", "witnesses")}
    sync_inventories(spark, sf_dir, out)  # re-run: upsert/ignore must be no-ops
    second = {n: _table_hash(read_collection(spark, out, n)) for n in first}
    assert first == second


def test_backfill_chunking_equivalence(spark, sf_dir, tmp_path):
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    backfill_payments(spark, sf_dir, one, n_chunks=1)
    backfill_payments(spark, sf_dir, many, n_chunks=4)
    h1 = _table_hash(read_collection(spark, one, "payments"))
    h4 = _table_hash(read_collection(spark, many, "payments"))
    assert h1 == h4
    # and re-running the chunked backfill changes nothing (first-write-wins)
    backfill_payments(spark, sf_dir, many, n_chunks=3)
    assert _table_hash(read_collection(spark, many, "payments")) == h4


def test_backfill_covers_unbounded_build(spark, sf_dir, tmp_path):
    out = str(tmp_path / "store")
    backfill_payments(spark, sf_dir, out, n_chunks=2)
    stored = read_collection(spark, out, "payments")
    direct = build_payments(spark, sf_dir)  # no bounds
    assert stored.count() == direct.dropDuplicates(["_key"]).count()


def test_hotspots_nested_shape(spark, sf_dir):
    hs = build_hotspots(spark, sf_dir)
    schema = {f.name: f.dataType.simpleString() for f in hs.schema.fields}
    assert schema["location_details"].startswith("struct<city_key:string")
    assert schema["geo_location"] == "struct<type:string,coordinates:array<double>>"
    row = hs.filter(F.col("location_details.city_key").isNotNull()).first()
    assert row["geo_location"]["type"] == "Point"
    assert len(row["geo_location"]["coordinates"]) == 2
    # analytics columns null-initialized (reference H15)
    assert row["pagerank"] is None and row["hub_score"] is None


def test_witnesses_keep_latest_unique_pairs(spark, sf_dir):
    from helium_arango_etl_spark.plans.sync import build_witnesses

    w = build_witnesses(spark, sf_dir)
    assert w.count() == w.select("_key").distinct().count()
    assert w.filter(~F.col("_from").startswith("hotspots/")).count() == 0


def test_merge_array_append(spark):
    """A8: upsert-with-array-append (the reference's deprecated AQL form)."""
    from helium_arango_etl_spark.io import merge_array_append

    old = spark.createDataFrame(
        [("a", [1, 2]), ("b", [3])], ["_key", "daily_balances"]
    )
    new = spark.createDataFrame(
        [("b", [4, 5]), ("c", [6])], ["_key", "daily_balances"]
    )
    got = {
        r["_key"]: r["daily_balances"]
        for r in merge_array_append(old, new).collect()
    }
    assert got == {"a": [1, 2], "b": [3, 4, 5], "c": [6]}


def test_partitioned_retention_drop(spark, sf_dir, tmp_path):
    """A7/L3 at scale: partition-drop retention equals the row-level filter
    without reading or rewriting surviving data."""
    import pyspark.sql.functions as F

    from helium_arango_etl_spark.io import (
        apply_retention_partitioned,
        write_keyed_partitioned,
    )
    from helium_arango_etl_spark.plans.sync import build_witnesses

    wit = build_witnesses(spark, sf_dir).withColumn(
        "edge_date", F.date_format("time", "yyyy-MM-dd")
    )
    path = str(tmp_path / "witnesses_part")
    write_keyed_partitioned(wit, path, "edge_date")

    dates = sorted(r["edge_date"] for r in wit.select("edge_date").distinct().collect())
    assert len(dates) >= 3
    cutoff = dates[len(dates) // 2]
    expected = wit.filter(F.col("edge_date") >= cutoff)

    dropped = apply_retention_partitioned(path, "edge_date", cutoff)
    assert dropped == sum(1 for d in dates if d < cutoff) > 0

    kept = spark.read.parquet(path)
    assert kept.count() == expected.count()
    assert sorted(r["_key"] for r in kept.select("_key").collect()) == sorted(
        r["_key"] for r in expected.select("_key").collect()
    )


def test_compact_parquet_reduces_files_preserving_rows(spark, sf_dir, tmp_path):
    """Compaction must hit the computed file count, preserve content
    exactly, and not lose rows on the repartition (under-split) path."""
    from helium_arango_etl_spark.io import compact_parquet, read_table

    src = str(tmp_path / "frag")
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.repartition(37).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "compact")
    n_files = compact_parquet(spark, src, out, target_rows=ev.count() // 3 + 1)
    assert n_files == 3
    import os

    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(parts) == 3
    before = {r["event_id"] for r in ev.collect()}
    after = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert before == after
