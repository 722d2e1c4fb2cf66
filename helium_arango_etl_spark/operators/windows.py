"""Window-function operators — SURVEY.md §2.E: the reference's three
windows-in-disguise, expressed as real window functions.

The reference implements these with serial Python loops / self-joins /
ORDER-BY-dependent insert semantics; window functions are the shuffle-safe,
distributed form (one hash shuffle on the partition key, then a local sort —
no O(n) driver-side list scans like blockchain_queries.py:269-287).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table


def keep_latest_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: keep the most recent edge per (src,dst) pair.

    Reference: `ORDER BY time DESC` + first-occurrence-wins dedup via an
    in-memory list (blockchain_queries.py:268-287) and via
    onDuplicate='ignore' ordering (295-296).  Here: row_number over a
    (user_id, event_type) window ordered by ts DESC with event_id DESC as a
    deterministic tiebreak (the reference's outcome is insertion-order-
    dependent on ties; ours is pinned).
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "event_id", "value")
    )


def last_balance_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: last balance snapshot per account per calendar day — the query the
    reference *disabled* as "not an efficient query yet" (etl.py:74-75); its
    SQL form is a group-wise-max self-join (blockchain_queries.py:329-336).

    Window row_number form: one shuffle on (user_id, day), no self-join, no
    second scan of the fact — the headline perf win over the reference.
    """
    ev = read_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("balance_date")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.select("user_id", "ts", "event_id", day)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "balance_date", F.col("event_id").alias("balance"))
    )


def groupwise_max_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: the reference's *literal* group-wise-max self-join form
    (`JOIN (SELECT MAX(time) ... GROUP BY DATE(timestamp))`,
    blockchain_queries.py:329-336), kept alongside the window rewrite so the
    oracle pins both semantics.  Output aggregated per (user, day, max_ts) to
    stay deterministic if two events share the max timestamp.
    """
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_id").alias("e")
    per_day_max = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("m_user_id"), F.to_date("ts").alias("balance_date"))
        .agg(F.max("ts").alias("max_ts"))
        .alias("m")
    )
    return (
        ev.join(
            per_day_max,
            (F.col("e.user_id") == F.col("m.m_user_id")) & (F.col("e.ts") == F.col("m.max_ts")),
        )
        .groupBy(F.col("e.user_id"), F.col("m.balance_date"), F.col("m.max_ts"))
        .agg(F.max("event_id").alias("balance"))
    )


def daily_balances_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: nest per-account daily balances into a date-ordered array
    (reference builds `daily_balances` lists row-by-row in Python,
    blockchain_queries.py:350-360; order from SQL ORDER BY at :337).

    collect_list + array_sort gives a deterministic array without a global
    sort; the struct field order (date first) makes array_sort's lexicographic
    struct comparison equal date-ordering.
    """
    per_day = last_balance_per_day(spark, sf_dir)
    return per_day.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("balance_date").alias("date"), F.col("balance")))
        ).alias("daily_balances")
    )


def daily_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-comparable rendering of :func:`daily_balances_nested`: the
    nested array serialized to a canonical string (arrays of structs hash
    differently across engines; a 'date:balance;...' string does not)."""
    nested = daily_balances_nested(spark, sf_dir)
    rendered = F.array_join(
        F.transform(
            F.col("daily_balances"),
            lambda x: F.concat_ws(":", F.date_format(x["date"], "yyyy-MM-dd"), x["balance"].cast("string")),
        ),
        ";",
    )
    return nested.select("user_id", rendered.alias("daily_balances"))


def normalize_by_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 + H12: per-group metric normalization (value ÷ group mean, nan→0).

    Reference: per-city centrality ÷ statistics.mean of the city's values
    (arango_queries.py:165-174) — a window avg here, computed in the same
    shuffle as the grouping.  Rounded to 6dp so double summation order cannot
    produce cross-engine hash drift.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    mean = F.avg("value").over(w)
    norm = F.col("value") / mean
    # an all-zero group has mean 0: the reference's nan->0 rule (H12)
    # maps its 0/0 rows to 0.0, but under ANSI the division itself
    # throws first -- branch BEFORE dividing (degenerate sweep, round 8)
    return ev.select(
        "event_id",
        "event_type",
        F.when(mean == 0, F.lit(0.0))
        .otherwise(F.round(F.nanvl(norm, F.lit(0.0)), 6))
        .alias("value_normalized"),
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by account balance per nation: the grouped top-k
    every leaderboard/sampling stage needs, as one rank window.

    Scale shape: ONE shuffle on the group key; the (c_acctbal DESC,
    c_custkey) ordering is total, so row_number is deterministic.  For
    extreme k or heavy groups, the same query runs as a per-partition
    partial top-k + re-rank (Spark's TakeOrderedAndProject generalization);
    at k=3 the window is already map-side cheap.
    """
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("rk").cast("bigint").alias("rk"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
    )


TRAILING_US = 7 * 86400 * 1_000_000  # 7 days in microseconds


def user_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event, the user's trailing-7-day value sum (inclusive of the
    current event) — a RANGE-framed event-time window, the per-row rolling
    feature a behavioral model reads.

    Scale shape: one shuffle on user_id; the RANGE frame is evaluated
    with a sliding two-pointer over each key's sorted events (Spark's
    bounded-range window), never a self-join.  Sum in DECIMAL then one
    final double cast (the rewards_5d pattern) so accumulation order
    cannot drift the hash.
    """
    from ..io import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(ts)"))
        .rangeBetween(-TRAILING_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_value"),
    )


def balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance decile assignment (ntile(10) semantics, ties broken
    by key — fully deterministic), plus each account's exact percent_rank.

    Scale shape (two-level, the missing_blocks/height_asof bucket family —
    no full-table single-partition window anywhere): rows bucket by
    floor(acctbal) (monotone in the sort key, so bucket order == global
    order); row_number runs per bucket, and the global rank closes with a
    cumulative-count carry over the per-bucket summary — the only
    unpartitioned window consumes one row per distinct floor(acctbal).
    ntile(10) and percent_rank are then pure arithmetic on (rank, n):
    the order key is unique, so rank == row_number and
    percent_rank == (r−1)/(n−1); ntile's uneven groups (first n%10 tiles
    get one extra row) are reproduced with integer ceil-division.
    Pinned against the one-window oracle SQL (registry) and by a plan
    test (tests/test_plan_quality.py)."""
    from ..io import read_table

    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    b = cust.withColumn("wb", F.floor(F.col("c_acctbal").cast("double")).cast("bigint"))
    w_local = Window.partitionBy("wb").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    local = b.withColumn("lr", F.row_number().over(w_local))
    summary = b.groupBy("wb").agg(F.count(F.lit(1)).alias("cnt"))
    w_carry = Window.orderBy("wb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = summary.select(
        "wb", F.coalesce(F.sum("cnt").over(w_carry), F.lit(0)).alias("off")
    )
    totals = summary.agg(F.sum("cnt").alias("n"))
    # ntile(10): first (n % 10) tiles hold (n div 10 + 1) rows; integer
    # ceil-division keeps the arithmetic exact at any n (no double
    # rounding); r = off + lr is the global 1-based rank (order key is
    # unique, so rank == row_number)
    decile = F.expr(
        "CASE WHEN (off + lr) <= (n % 10) * (n div 10 + 1)"
        "     THEN (off + lr + n div 10) div (n div 10 + 1)"
        "     ELSE n % 10 + (off + lr - (n % 10) * (n div 10 + 1) + n div 10 - 1)"
        "                    div greatest(n div 10, 1) END"
    )
    pct = F.expr(
        "CASE WHEN n > 1 THEN round(cast(off + lr - 1 AS double) / (n - 1), 6)"
        "     ELSE 0.0 END"
    )
    return (
        local.join(F.broadcast(offsets), "wb")
        .join(F.broadcast(totals))
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            decile.cast("bigint").alias("decile"),
            pct.alias("pct_rank"),
        )
    )


def balance_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with last-observation-carried-forward: densify each
    user's daily balance series over the GLOBAL date spine, carrying the
    last known balance across days with no events — the time-series
    completion every BI layer needs before windowed math (a sparse series
    silently skews moving averages).  Days before a user's first
    observation stay NULL (no back-fill — that would fabricate history).

    Scale shape: the spine is one sequence() off a 1-row min/max
    aggregate, cross-joined BROADCAST against the (small) user dim;
    the carry is last(ignorenulls) over a per-user window sorted by day
    — one keyed shuffle, and the spine explode is |users| × |days| rows,
    which is the OUTPUT size (unavoidable by definition of densify).
    """
    per_day = last_balance_per_day(spark, sf_dir)
    bounds = per_day.agg(
        F.min("balance_date").alias("d0"), F.max("balance_date").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("balance_date")
    )
    users = per_day.select("user_id").distinct()
    dense = users.crossJoin(F.broadcast(spine))
    w = (
        Window.partitionBy("user_id")
        .orderBy("balance_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(per_day, ["user_id", "balance_date"], "left")
        .withColumn("balance", F.last("balance", ignorenulls=True).over(w))
        .select(
            "user_id",
            "balance_date",
            "balance",
            F.col("balance").isNotNull().alias("has_value"),
        )
    )
