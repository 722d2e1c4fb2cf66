"""Local emulation of the driver's Spark-vs-DuckDB oracle compare.

Mirrors the contract in __spark_entry__.py: run the Spark plan and the oracle
SQL on the same parquet tables, sort columns by name, sort rows, compare
values.  Stricter than the driver (exact equality after canonicalization) so
passing here implies passing the driver's value-hash.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from helium_arango_etl_spark.io import TABLES


def _canon(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def assert_parity(spark, query_fn, sql: str, sf_dir: str, name: str = "?"):
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = run_oracle(sql, sf_dir)
    assert sorted(s_cols) == sorted(c for c in d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), f"{name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}"
    s_set, d_set = _rowset(s_cols, s_rows), _rowset(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_set, d_set)):
        assert a == b, f"{name}: first differing row {i}:\n  spark ={a}\n  duckdb={b}"
