"""Table I/O: parquet readers and keyed sinks.

The reference's sinks are ArangoDB ``importBulk`` calls with per-key conflict
policies (reference: arango_queries.py:211-258):

- ``onDuplicate='update'``  -> :func:`merge_upsert`   (last write wins per key)
- ``onDuplicate='ignore'``  -> :func:`merge_ignore`   (first write wins per key)
- AQL retention delete      -> :func:`apply_retention` (arango_queries.py:90-99)

Here the "collections" are keyed parquet tables.  Both merge flavors are pure
DataFrame plans (left-anti join + unionByName), so Catalyst plans the join
(broadcast when the delta is small — the common incremental case) and the
writer stays idempotent: re-running a sync with the same inputs produces a
byte-identical table, which is the reference's core operational guarantee
(etl.py:143-147 cursor advance + content-hash keys).

Scale notes: the left-anti join shuffles on ``_key`` only when both sides are
large; incremental deltas are broadcast by AQE.  For truly huge targets,
partition the stored table by a stable bucket of ``_key``
(``F.pmod(F.xxhash64('_key'), N)``) so the anti-join becomes partition-local.

Production sink design (100 TB, not exercised in this sandbox): a keyed
upsert over a 100 TB table should be a transactional table-format MERGE —
``MERGE INTO target USING delta ON target._key = delta._key WHEN MATCHED
UPDATE ... WHEN NOT MATCHED INSERT ...`` on Delta Lake or Iceberg — not the
read-modify-overwrite these functions do.  The format's transaction log
gives atomic commits + snapshot isolation (a failed sync never half-writes),
file-level pruning (copy-on-write rewrites only data files containing
matched keys; merge-on-read defers even that to deletion vectors /
positional deletes), and time travel for the idempotent-rerun guarantee the
reference gets from content-hash keys.  The plan shape is unchanged — MERGE
compiles to the same keyed anti/semi-join against the delta that
merge_upsert/merge_ignore declare, so these implementations remain the
engine-portable semantic spec (and the test oracle) for that MERGE; only
the writer swaps.  Retention (apply_retention) likewise becomes a
metadata-only ``DELETE WHERE ts < cutoff`` on a time-partitioned table —
see apply_retention_partitioned for the partition-drop form implemented
here.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table from a scale-factor directory.

    Reference analog: the SQLAlchemy ORM table scan (blockchain_queries.py:44,
    74).  Predicate pushdown and column pruning into the parquet scan are
    Catalyst's job — callers just filter/select.

    ``events.ts`` has shipped in two physical forms across testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark only reads as long,
    via the legacy flag) and plain TIMESTAMP(MICROS).  Normalize
    schema-adaptively so callers always see a microsecond timestamp — the
    same value DuckDB yields for either physical type.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Canonicalize ``ts`` to a session-TZ (UTC-pinned) microsecond timestamp.

    Three physical forms have shipped across testdata generations:
    epoch-nanos long (floor-divided to micros — integer ``div``, not ``/``:
    epoch-nanos ~1.7e18 overflows double precision), TIMESTAMP_NTZ (cast is
    value-preserving because the session timezone is pinned to UTC, matching
    DuckDB's naive-timestamp reading), and plain TIMESTAMP (passthrough).
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def jdbc_scan_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **extra: object,
) -> dict[str, str]:
    """Option dict for a (partitioned) JDBC scan — separated from the reader
    call so the plumbing is unit-testable without a live database.

    A partition spec must be complete: Spark silently falls back to a
    SINGLE-connection scan when any of column/bounds/numPartitions is
    missing, which at warehouse scale is the difference between a parallel
    read and an hours-long serial one — so an incomplete spec raises here.
    """
    opts: dict[str, str] = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    partition_spec = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(v is not None for v in partition_spec):
        if any(v is None for v in partition_spec):
            raise ValueError(
                "partitioned JDBC scan needs ALL of partition_column, "
                "lower_bound, upper_bound, num_partitions"
            )
        opts.update(
            {
                "partitionColumn": str(partition_column),
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_jdbc_table(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    """Partitioned JDBC source — the reference's ACTUAL input is Postgres
    (blockchain_queries.py:44,74 scan SQLAlchemy models over one
    connection, paging with block-height bounds).  Here N executor
    connections each read one stride of the partition column concurrently;
    the reference's LIMIT/OFFSET + keyset pagination (SURVEY §4 F5/F6/K3)
    collapses into the partition bounds.  Typical call for the rewards
    fact::

        read_jdbc_table(spark, url, "rewards",
                        partition_column="block", lower_bound=first_block,
                        upper_bound=current_height, num_partitions=256)

    Catalyst pushes filters/projections into the generated per-partition
    queries (JDBC relation supports predicate pushdown), so the B2/B3
    operators prune at the database, same as the parquet path.
    """
    return spark.read.format("jdbc").options(**jdbc_scan_options(url, table, **kwargs)).load()


def spread(df: DataFrame, min_factor: int = 2, per_task_bytes: int = 0) -> DataFrame:
    """Round-robin repartition to the cluster's parallelism — but ONLY when
    the source is under-split (fewer than parallelism/min_factor partitions).

    A parquet file is splittable at row-group boundaries only; a file written
    as one row group (or a gzip text file, etc.) scans as ONE task, so every
    CPU-heavy map stage downstream runs single-threaded no matter how many
    cores exist.  This helper is the principled fix: pay one small shuffle of
    the raw rows to unlock N-way map parallelism.  On a well-split source
    (the 100 TB case: thousands of row groups) it is a no-op, so pipelines
    keep the shuffle-free scan path at scale.

    Under-split detection reads ``df.inputFiles()`` + file sizes against
    spark.sql.files.maxPartitionBytes — the same arithmetic the scan
    planner uses — instead of probing ``df.rdd.getNumPartitions()``,
    which materializes the RDD lineage of the whole plan (VERDICT r3
    watch item).  A plan with no scannable inputs (in-memory ranges,
    post-shuffle derivations) is returned unchanged: its parallelism is
    already decided upstream, not by file splits.  Non-local files whose
    size we cannot stat count as one split each — the conservative
    reading that keeps spread() a no-op only when splits are provably
    plentiful is NOT chosen because an unneeded repartition of a 100 TB
    scan costs far more than a missed one here.
    """
    import os
    from urllib.parse import urlparse

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    threshold = max(2, target // min_factor)
    files = df.inputFiles()
    if not files:
        return df
    max_bytes = _size_to_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    )
    est_splits = 0
    total_bytes = 0
    for f in files:
        parsed = urlparse(f)
        size = 0
        if parsed.scheme in ("", "file"):
            try:
                size = os.path.getsize(parsed.path)
            except OSError:
                size = 0
        total_bytes += size
        est_splits += max(1, -(-size // max_bytes))  # ceil-div, >=1 per file
        if est_splits >= threshold and per_task_bytes <= 0:
            return df
    if est_splits >= threshold:
        return df
    if per_task_bytes > 0:
        # Work-aware fan-out cap (guide §2.2/§4): a tiny under-split input
        # does NOT deserve one task per core — the per-task fixed cost
        # (scheduling + Python worker handshake + Arrow framing for the
        # opaque-map callers) exceeds the per-task work, and the 8-vs-32
        # core scaling probe showed the full fan-out ANTI-scaling at small
        # inputs (BENCH_r10 image_features ratio 0.49).  Target one task
        # per `per_task_bytes` of input, still capped at the cluster's
        # parallelism, so a genuinely large input keeps every core busy.
        target = max(1, min(target, total_bytes // per_task_bytes))
        if target == 1 and est_splits <= 1:
            return df  # already a single split; repartition adds pure cost
    return df.repartition(target)


_SIZE_UNITS = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _size_to_bytes(s: str) -> int:
    """Parse Spark size-config strings: '134217728', '134217728b',
    '128m', '128MB' — digits then an optional unit suffix."""
    s = str(s).strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, unit = s[:i], s[i:].strip()
    unit = unit[:1] if unit[:1] in _SIZE_UNITS else ""
    return max(1, int(num) * _SIZE_UNITS[unit])


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql() plans."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def merge_upsert(old: DataFrame, new: DataFrame, key: str = "_key") -> DataFrame:
    """Insert-or-replace by key: rows in ``new`` win over same-keyed ``old``.

    Reference: importBulk(onDuplicate='update'), arango_queries.py:222-227.
    """
    surviving_old = old.join(new.select(key), on=key, how="left_anti")
    return new.unionByName(surviving_old, allowMissingColumns=True)


def merge_ignore(old: DataFrame, new: DataFrame, key: str = "_key") -> DataFrame:
    """Insert-if-absent by key: first write wins, duplicates dropped.

    Reference: importBulk(onDuplicate='ignore'), default at
    arango_queries.py:322 — used for payments, witnesses, cities.
    ``new`` is also deduped within itself (the reference relies on Arango
    dropping intra-batch duplicate keys).
    """
    fresh = new.dropDuplicates([key]).join(old.select(key), on=key, how="left_anti")
    return old.unionByName(fresh, allowMissingColumns=True)


def merge_array_append(
    old: DataFrame, new: DataFrame, key: str = "_key", array_col: str = "daily_balances"
) -> DataFrame:
    """Upsert with array append: matched keys get ``old.array ++ new.array``,
    new keys insert as-is.

    Reference: the deprecated per-row AQL ``UPSERT ... UPDATE {daily_balances:
    APPEND(OLD.daily_balances, ...)}`` (arango_queries.py:77-87) — A8 in
    SURVEY.md §2.  As one declarative plan: full-outer join on the key,
    concat the arrays (null-safe on either side).  The reference replaced
    this with snapshot recomputation (daily_balances_nested does that here);
    this sink exists for capability parity and for true append-only stores.
    """
    o = old.select(key, F.col(array_col).alias("_old_arr"))
    n = new.select(key, F.col(array_col).alias("_new_arr"))
    appended = (
        F.when(F.col("_old_arr").isNull(), F.col("_new_arr"))
        .when(F.col("_new_arr").isNull(), F.col("_old_arr"))
        .otherwise(F.concat("_old_arr", "_new_arr"))
    )
    return o.join(n, on=key, how="full_outer").select(key, appended.alias(array_col))


def apply_retention(df: DataFrame, time_col: str, cutoff) -> DataFrame:
    """Keep rows at/after ``cutoff`` — the witness retention delete.

    Reference: AQL ``FILTER w.time < @cutoff REMOVE w`` (arango_queries.py:
    90-99, invoked etl.py:97).  As a declarative rewrite this is just the
    complement filter; at scale it is a metadata-cheap rewrite of recent
    partitions when the table is date-partitioned.
    """
    return df.filter(F.col(time_col) >= F.lit(cutoff))


def write_keyed(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist a keyed collection table."""
    df.write.mode(mode).parquet(path)


def write_keyed_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Persist a keyed collection partitioned by a (date-shaped) column.

    Partitioning by event date is what turns the A7/L3 retention delete into
    a metadata operation at scale — see :func:`apply_retention_partitioned`.
    """
    df.write.partitionBy(partition_col).mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int, path: str | None = None
) -> None:
    """Persist as a bucketed+sorted table: rows hash-partitioned into
    `num_buckets` files by `key`, sorted within each bucket.

    This is the 100 TB co-located join: two fact tables bucketed the same
    way (same key semantics, same bucket count) sort-merge join with ZERO
    exchange — the shuffle the reference pays in Postgres on every sync
    cycle (blockchain_queries.py:173 rewards⋈transactions) is paid once at
    write time and amortized over every subsequent join.  Bucket metadata
    lives in the session catalog; pass `path` to keep the data external.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key).sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def apply_retention_partitioned(path: str, partition_col: str, cutoff: str) -> int:
    """Retention delete as a PARTITION DROP: remove whole `col=value`
    directories whose value sorts below the cutoff.  No data is read or
    rewritten — at 100 TB this is the only viable form of the reference's
    witness retention (AQL row-delete, arango_queries.py:90-99); the
    row-level :func:`apply_retention` remains for unpartitioned stores.

    Partition values must compare lexically (zero-padded dates: yyyy-MM-dd).
    Returns the number of partitions dropped.
    """
    import shutil

    dropped = 0
    for entry in os.listdir(path):
        if not entry.startswith(f"{partition_col}="):
            continue
        if entry.split("=", 1)[1] < cutoff:
            shutil.rmtree(os.path.join(path, entry))
            dropped += 1
    return dropped


ZORDER_BITS = 16


def zorder_key(x_col: str, y_col: str, x_min, x_max, y_min, y_max):
    """Morton (Z-order) curve key over two numeric columns, each
    normalized to ZORDER_BITS-bit ranks against caller-supplied domain
    bounds: bit-interleaving as a static codegen'd expression (32 shift
    terms), no UDF.  Rows close on the Z-curve are close in BOTH
    dimensions, so sorting files by this key tightens per-file min/max
    stats on both columns at once — the data-skipping layout Delta's
    OPTIMIZE ZORDER provides, as a plain column expression.

    Bounds are parameters (not computed here) so a 100 TB writer uses
    catalog/stat-store bounds instead of paying an extra full scan; rank
    arithmetic clamps, so stale bounds degrade clustering, not
    correctness.
    """
    from pyspark.sql import functions as F

    top = (1 << ZORDER_BITS) - 1

    def rank(col, lo, hi):
        span = max(float(hi) - float(lo), 1.0)
        return (
            f"least({top}L, greatest(0L,"
            f" cast(floor(({col} - {float(lo)!r}) * {top} / {span!r}) as bigint)))"
        )

    rx, ry = rank(x_col, x_min, x_max), rank(y_col, y_min, y_max)
    terms = []
    for b in range(ZORDER_BITS):
        terms.append(f"shiftleft(shiftright(_zx, {b}) & 1, {2 * b})")
        terms.append(f"shiftleft(shiftright(_zy, {b}) & 1, {2 * b + 1})")
    return F.expr(" + ".join(terms).replace("_zx", f"({rx})").replace("_zy", f"({ry})"))


# salts depend only on n (Murmur3 of a bigint is session-independent), but
# the probe runs a Spark job, so key the memo per (session, n) like
# graph._PAIRS_CACHE — one job per session however many write_zordered
# calls follow (VERDICT r5 #5).
_SALT_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[int, list[int]]]" = (
    weakref.WeakKeyDictionary()
)


def _identity_salts(spark: SparkSession, n: int) -> list[int]:
    """For each partition id p in [0, n), the smallest bigint s with
    pmod(hash(s), n) == p.  Repartitioning on the salt column then places
    each value in EXACTLY the partition its id names — identity routing
    through Spark's hash partitioner, no RDD-level custom partitioner.
    One tiny driver-side job of O(n) rows; each residue is missed with
    probability ~e^-64 per round, so the loop all but never repeats.
    Memoized per (session, n): the result is a pure function of n."""
    from pyspark.sql import functions as F

    per_session = _SALT_CACHE.setdefault(spark, {})
    cached = per_session.get(n)
    if cached is not None:
        return cached

    salts: dict[int, int] = {}
    lo = 0
    while len(salts) < n:
        rows = (
            spark.range(lo, lo + 64 * n)
            .select("id", F.pmod(F.hash("id"), F.lit(n)).alias("p"))
            .collect()
        )
        for r in rows:
            salts.setdefault(r["p"], r["id"])
        lo += 64 * n
    out = [salts[p] for p in range(n)]
    per_session[n] = out
    return out


def write_zordered(
    df: DataFrame, path: str, x_col: str, y_col: str, bounds, num_files: int = 8
) -> None:
    """Write parquet clustered along the Z-curve of (x_col, y_col):
    deterministic file assignment by Z-range (top bits of the key — no
    repartitionByRange, whose sampled boundaries are not reproducible),
    rows sorted by Z within each file.  Point/range predicates on EITHER
    column then prune most files on min/max footer stats alone —
    tests/test_zorder.py measures the effect.

    Bucket ids route to partitions by IDENTITY (per-partition salt
    lookup, ADVICE r3): hashing the bucket id directly can land two
    distinct Z-ranges in one file (leaving others empty), which widens
    that file's min/max footer and degrades pruning unpredictably as
    num_files grows.  With identity routing every output file holds
    exactly one contiguous Z-interval — pinned in
    tests/test_zorder.py::test_zorder_files_are_contiguous_intervals.
    """
    from pyspark.sql import functions as F

    z = zorder_key(x_col, y_col, *bounds)
    # deterministic range split: files = contiguous Z-intervals
    chunk = (1 << (2 * ZORDER_BITS)) // num_files + 1
    salts = _identity_salts(df.sparkSession, num_files)
    # cast matters: the salts were probed as BIGINT and Murmur3 hashes
    # int32 and int64 differently — an IntegerType literal would route
    # to the wrong partition
    salt_arr = F.array(*[F.lit(s).cast("long") for s in salts])
    zdf = df.withColumn("_z", z).withColumn(
        "_zsalt",
        F.element_at(salt_arr, F.expr(f"cast(_z div {chunk} as int) + 1")),
    )
    (
        zdf.repartition(num_files, F.col("_zsalt"))
        .sortWithinPartitions("_z")
        .drop("_z", "_zsalt")
        .write.mode("overwrite")
        .parquet(path)
    )


TARGET_FILE_ROWS = 1_000_000


def compact_parquet(
    spark: SparkSession, path: str, out_path: str, target_rows: int = TARGET_FILE_ROWS
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(rows / target_rows) files — the maintenance pass every
    streaming/incremental sink needs, because a foreachBatch or
    availableNow writer emits one file per trigger per partition and a
    100 TB table read through 10M tiny files spends longer opening
    footers than scanning data.

    Row-count-based sizing (not byte-based) keeps the operation
    deterministic and engine-portable; callers with wildly variable row
    widths should derive target_rows from their schema.  Returns the
    number of files written.  Uses coalesce (no shuffle) when reducing,
    repartition when the source is under-split.
    """
    import math

    df = spark.read.parquet(path)
    n = df.count()
    files = max(1, math.ceil(n / target_rows))
    cur = df.rdd.getNumPartitions()
    out = df.coalesce(files) if cur >= files else df.repartition(files)
    out.write.mode("overwrite").parquet(out_path)
    return files


def read_jsonl_table(spark: SparkSession, path: str, schema) -> DataFrame:
    """Scan a JSON-lines table with a CALLER-SUPPLIED schema — the
    second source format beside parquet/JDBC (raw event feeds and API
    dumps usually land as JSONL before compaction).

    The explicit schema is the 100 TB discipline: without it Spark runs
    a full inference pre-pass over every file (doubling the scan) and
    silently widens types per run; with it the read is one pass with a
    stable schema, and malformed lines land in the standard
    ``_corrupt_record`` behavior (PERMISSIVE) instead of failing the job.
    Column pruning still applies (JSON parsing skips unrequested fields);
    predicate pushdown does not (no row-group stats) — which is exactly
    why the compaction pass (`compact_parquet`) rewrites JSONL landings
    to parquet before heavy querying.
    """
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a DataFrame as JSON-lines (the interchange/landing format)."""
    df.write.mode("overwrite").json(path)


def read_csv_table(
    spark: SparkSession, path: str, schema, header: bool = True, sep: str = ","
) -> DataFrame:
    """Scan a CSV table with a CALLER-SUPPLIED schema — the third
    landing format beside parquet/JDBC/JSONL (exports from spreadsheets
    and legacy warehouses arrive as CSV).

    Same 100 TB discipline as `read_jsonl_table`: an explicit schema
    avoids the inference pre-pass and per-run type drift; PERMISSIVE
    mode routes malformed rows to ``_corrupt_record`` instead of
    failing the job.  CSV is not splittable-with-quotes-spanning-lines
    and carries no stats, so — like JSONL — landings are compacted to
    parquet (`compact_parquet`) before heavy querying; `spread()`
    covers the interim when a single fat CSV would otherwise scan as
    one task.
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Write a DataFrame as CSV (the interchange/export format)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)
