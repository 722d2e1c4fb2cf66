"""JDBC partitioned-read source: option plumbing verified without a live
database (the container has none) — the reader wiring is exercised against
a stub, the option builder against its contract."""

from __future__ import annotations

import pytest

from helium_arango_etl_spark.io import jdbc_scan_options, read_jdbc_table

URL = "jdbc:postgresql://db:5432/blockchain"


def test_partitioned_scan_options_complete():
    opts = jdbc_scan_options(
        URL,
        "rewards",
        partition_column="block",
        lower_bound=100,
        upper_bound=1_000_000,
        num_partitions=256,
    )
    assert opts["url"] == URL and opts["dbtable"] == "rewards"
    assert opts["partitionColumn"] == "block"
    assert opts["lowerBound"] == "100" and opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "256"
    assert opts["fetchsize"] == "10000"


def test_unpartitioned_scan_has_no_partition_keys():
    opts = jdbc_scan_options(URL, "blocks")
    assert "partitionColumn" not in opts and "numPartitions" not in opts


def test_incomplete_partition_spec_raises():
    """Spark silently degrades to a single-connection scan when the spec is
    partial — the builder must refuse instead."""
    with pytest.raises(ValueError, match="ALL of"):
        jdbc_scan_options(URL, "rewards", partition_column="block", lower_bound=1)


def test_extra_options_pass_through():
    opts = jdbc_scan_options(URL, "blocks", pushDownPredicate=True, queryTimeout=30)
    assert opts["pushDownPredicate"] == "True" and opts["queryTimeout"] == "30"


class _StubReader:
    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def options(self, **kw):
        self.opts.update(kw)
        return self

    def load(self):
        return ("loaded", self.fmt, dict(self.opts))


class _StubSpark:
    def __init__(self):
        self.read = _StubReader()


def test_read_jdbc_table_wires_reader():
    result, fmt, opts = read_jdbc_table(
        _StubSpark(),
        URL,
        "rewards",
        partition_column="block",
        lower_bound=0,
        upper_bound=500,
        num_partitions=8,
    )
    assert result == "loaded" and fmt == "jdbc"
    assert opts["numPartitions"] == "8" and opts["dbtable"] == "rewards"


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    """documents written as JSONL and read back with the explicit schema
    must equal the parquet scan row-for-row; the read plan must carry the
    supplied schema (no inference pass) and prune to requested columns."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.io import read_jsonl_table, read_table, write_jsonl

    docs = read_table(spark, sf_dir, "documents")
    p = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, p)
    back = read_jsonl_table(spark, p, docs.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))

    # pruned projection: the scan's ReadSchema carries only doc_id
    import io as _io
    import re
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        back.select("doc_id").explain("formatted")
    plan = buf.getvalue()
    widths = [
        len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)", plan)
    ]
    assert widths and max(widths) == 1, plan

    # malformed line is PERMISSIVE-null, not a job failure
    (tmp_path / "docs_jsonl" / "bad.json").write_text('{"doc_id": "not-a-number"}\n')
    n = read_jsonl_table(spark, p, docs.schema).filter(F.col("doc_id").isNull()).count()
    assert n >= 1


def test_csv_roundtrip_schema_and_malformed(spark, sf_dir, tmp_path):
    """CSV source: explicit-schema read, header handling, roundtrip
    equality, and PERMISSIVE malformed handling (io.read_csv_table)."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.io import read_csv_table, read_table, write_csv

    src = read_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_csv")
    write_csv(src, path)
    back = read_csv_table(spark, path, src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    # malformed rows: a line with a non-numeric key under an INT column
    bad = tmp_path / "bad.csv"
    bad.write_text("r_regionkey,r_name\nnotanint,EUROPE\n7,ASIA\n")
    schema = "r_regionkey BIGINT, r_name STRING"
    got = read_csv_table(spark, str(bad), schema)
    rows = got.collect()
    assert len(rows) == 2  # PERMISSIVE keeps the malformed row as nulls
    assert sorted(r.r_regionkey for r in rows if r.r_regionkey is not None) == [7]
